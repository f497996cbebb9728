"""Graph operators over relational fixtures (SURVEY §2 addendum).

PageRank here is the canonical "iterative joins on a distributed engine"
pattern: the per-iteration unit is contribution = edges ⋈ ranks (shuffle on
src) → groupBy(dst). At 100 TB the edge list is the big side — it is
shuffled ONCE onto its join key and reused co-located every iteration
(persist + AQE keep the exchange), while the rank vector (one row per
node, orders of magnitude smaller) is what moves. Iteration count is fixed
and small, so the DuckDB oracle unrolls the same three steps exactly.

The undirected (symmetrized) customer–supplier trade graph has no dangling
nodes by construction — every node appears as a source — so no separate
dangling-mass redistribution term is needed, and the Spark loop and the
unrolled SQL compute the identical fixed-point prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from .llm_dedup import _phase_mark

_D = 0.85  # damping
_ITERS = 3
_SUPP_OFFSET = 1_000_000  # disambiguate supplier node ids from customers


def _pagerank_oracle() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""r{i} AS MATERIALIZED (
  SELECT e.dst AS node, {1 - _D} + {_D} * SUM(r.pr / dg.d) AS pr
  FROM edges e JOIN {prev} r ON e.src = r.node
               JOIN deg dg ON e.src = dg.src
  GROUP BY e.dst
)"""
        )
        prev = f"r{i}"
    blocks = ",\n".join(iters)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s + {_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT s + {_SUPP_OFFSET} AS src, c AS dst FROM pairs
), deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
), r0 AS (SELECT src AS node, 1.0 AS pr FROM deg),
{blocks}
SELECT node, ROUND(pr, 6) AS pr FROM {prev}
"""


@register(
    "graph_pagerank",
    category="graph",
    oracle=_pagerank_oracle(),
    heavy=True,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (d=0.85, 3 rounds) on the symmetrized
    customer–supplier trade graph. The compact (src, dst) edge list is
    persisted after ONE shuffle and per-side degrees come from the pair
    list; each iteration joins the degree-weighted rank vector against
    the cached edges and re-aggregates on dst. The oracle
    unrolls the identical three iterations as MATERIALIZED CTEs, so the
    check is exact up to double summation order (absorbed by 6-dp
    rounding on the final ranks only — intermediate ranks stay raw on
    both sides)."""
    return _pagerank_ranks(spark, sf_dir, checkpoint=True)


def _pagerank_ranks(
    spark: SparkSession, sf_dir: str, checkpoint: bool = False
) -> DataFrame:
    """Core loop; `checkpoint=False` keeps the full lineage visible (the
    plan test asserts the iteration's join strategy on it)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # r12 restructure of the build phase (guide §2.4), A/B-measured at
    # ~sf10 (interleaved fresh-process arms, every head-to-head won:
    # 156.5/101.3/160.0 s before vs 88.0/100.1/83.6 s after):
    #  - dedup on a partitioning the degree count can REUSE: repartition
    #    by c, then dropDuplicates (hash partitioning on c satisfies the
    #    (c, s) clustering requirement), so the customer-side degree
    #    groupBy needs no second exchange;
    #  - degrees from the PAIR list (one count per side), not from a
    #    groupBy + join over the 2x-larger symmetrized edge list — the
    #    persisted edges stay (src, dst) only, a third smaller than the
    #    old per-edge (src, dst, d) cache;
    #  - deg is localCheckpointed: it seeds ranks AND re-weights them
    #    every iteration, and without the checkpoint each consumer
    #    re-ran the source join + distinct subtree.
    # Per iteration, pr/d is attached on the |V|-row rank vector BEFORE
    # the edge join (same doubles: d is identical per src, so the
    # contribution multiset per dst is unchanged), so the per-iteration
    # join ships (node, w) instead of re-joining the full degree table.
    # The executed plan (plans/r12/graph_pagerank_after.txt) shows the
    # iteration join as SortMergeJoin with deg broadcast into rankd.
    # (Also A/B-measured and REJECTED: repartitioning the persisted
    # edges by dst to make the per-iteration aggregation exchange-free
    # — 134-149 s; joining on src re-shuffles by src anyway, so the
    # build-time exchange bought nothing.)
    #
    # r12 session 2: the edge cache is hash-partitioned AND sorted on
    # src BEFORE persist. InMemoryTableScan preserves the cached plan's
    # outputPartitioning/outputOrdering, so every iteration's
    # SortMergeJoin on src reads the cache exchange-free and sort-free —
    # the before-plan re-shuffled + re-sorted the table-sized edge list
    # in all three iterations (plans/r12/graph_pagerank_before2.txt:
    # Exchange+Sort above each InMemoryTableScan; gone in the after
    # plan). The dst experiment failed because dst is not the join key;
    # src is. One build-time exchange buys three iteration exchanges —
    # and at 100 TB this is the §2.4/§8 shape: the big static side laid
    # out once on its join key, only the |V|-row rank vector moving.
    # A/B at K=100 (interleaved in-process, tools/pagerank_iter_probe):
    # 178.6/164.5/145.4 s -> 92.7/113.8/120.1 s, every pairing faster.
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .repartition("c")
        .dropDuplicates()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    )
    rev = pairs.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    edges = (
        fwd.unionAll(rev)
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    degc = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("c").alias("node"), "d"
    )
    degs = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("d")).select(
        (F.col("s") + _SUPP_OFFSET).alias("node"), "d"
    )
    mark = _phase_mark()
    deg = degc.unionByName(degs).localCheckpoint()
    mark("build_deg_ckpt")
    try:
        ranks = deg.select("node", F.lit(1.0).alias("pr"))
        for _ in range(_ITERS):
            rankd = ranks.join(deg, "node").select(
                "node", (F.col("pr") / F.col("d")).alias("w")
            )
            ranks = (
                edges.join(rankd, edges["src"] == rankd["node"])
                .select("dst", "w")
                .groupBy("dst")
                .agg((F.lit(1 - _D) + F.lit(_D) * F.sum("w")).alias("pr"))
                .withColumnRenamed("dst", "node")
            )
        out = ranks.select("node", F.round("pr", 6).alias("pr"))
        if checkpoint:
            out = out.localCheckpoint()  # materialize before unpersisting edges
            mark("iterations")
    finally:
        if checkpoint:
            edges.unpersist()
    return out


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges (u < v canonical): two parts
    are linked when they appear in the same order. The self-join shuffles
    once on l_orderkey; per-order fan-out is items-per-order choose 2,
    bounded by order size, not table size."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_partkey") < 600)
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


_COPURCHASE_EDGE_SQL = """
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 600 AND b.l_partkey < 600
"""


@register(
    "graph_triangle_count",
    category="graph",
    oracle=f"""
WITH e AS ({_COPURCHASE_EDGE_SQL}),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, COUNT(*) AS n_triangles
FROM (SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t)
GROUP BY node
""",
    heavy=True,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation on the part co-purchase graph,
    via DEGREE-ORDERED orientation (Schank–Wagner): every edge points
    from its lower-(degree, id) endpoint to the higher one, wedges are
    built only from each node's oriented out-neighbors, and a final join
    closes them. Out-degrees are O(sqrt(m)) under this orientation, so
    wedge count is O(m^1.5) instead of sum(deg^2) — THE property that
    keeps triangle counting alive on power-law graphs at 100 TB, where a
    single hub under the naive u<v orientation would emit deg^2 ~ 10^12
    wedges on one key. The (deg, id) order is encoded as one long key
    (deg * 2^32 + id) so orientation is a scalar comparison, not a sort.
    The oracle counts the same triangles with the naive formulation —
    per-node participation is orientation-invariant, so the two
    algorithms must agree exactly."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            "node",
            (F.col("deg").cast("long") * F.lit(2**32) + F.col("node")).alias("okey"),
        )
    )
    ek = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("okey", "ku"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("okey", "kv"), "v")
    )
    lo = F.col("ku") < F.col("kv")
    o = ek.select(
        F.when(lo, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo, F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
    )
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    tri = (
        o1.join(
            o2,
            (F.col("o1.src") == F.col("o2.src"))
            & (F.col("o1.kdst") < F.col("o2.kdst")),
        )
        .select(
            F.col("o1.src").alias("a"),
            F.col("o1.dst").alias("b"),
            F.col("o2.dst").alias("c"),
        )
        .join(
            o3,
            (F.col("b") == F.col("o3.src")) & (F.col("c") == F.col("o3.dst")),
            "left_semi",
        )
    )
    return (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "graph_degree_distribution",
    category="graph",
    oracle=f"""
WITH e AS ({_COPURCHASE_EDGE_SQL}),
deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
)
SELECT degree, COUNT(*) AS n_nodes
FROM deg GROUP BY degree
""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph: two mergeable
    aggregations (node degree, then nodes-per-degree), each one shuffle
    with map-side partials; output is bounded by max degree, so the
    second shuffle is tiny at any scale."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "graph_link_prediction",
    category="graph",
    oracle=f"""
WITH e AS ({_COPURCHASE_EDGE_SQL}),
adj AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
deg AS (SELECT w AS node, COUNT(*) AS d FROM adj GROUP BY w),
common AS (
  SELECT a1.x AS u, a2.x AS v, COUNT(*) AS n_common
  FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.x < a2.x
  GROUP BY a1.x, a2.x
)
SELECT c.u, c.v, c.n_common,
       c.n_common / (du.d + dv.d - c.n_common) AS jaccard_score
FROM common c
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
LEFT JOIN e ON e.u = c.u AND e.v = c.v
WHERE c.n_common >= 3 AND e.u IS NULL
""",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction on the co-purchase graph: for
    every NON-adjacent part pair sharing >= 3 neighbors, the neighbor-
    Jaccard score |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the classic
    collaborative-filtering candidate generator. Wedge enumeration
    (adjacency self-joined on the shared middle node) costs sum(deg^2),
    the same budget as triangle counting, and every stage is an equi-join
    or mergeable aggregate — one shuffle each on w, (u,v), u, v. The
    anti-join against existing edges keeps only genuine predictions.
    Integer counts + one bigint/bigint double division = engine-exact
    with no rounding needed."""
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy(F.col("w").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    common = (
        a1.join(a2, (F.col("a1.w") == F.col("a2.w")) & (F.col("a1.x") < F.col("a2.x")))
        .groupBy(F.col("a1.x").alias("u"), F.col("a2.x").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 3)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        common.join(e, ["u", "v"], "left_anti")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("n_common"))
            ).alias("jaccard_score"),
        )
    )


_BFS_ROUNDS = 3
_BFS_SEED_MAX = 10  # customers with c_custkey < 10 are the seed set


def _bfs_oracle() -> str:
    prev = "d0"
    blocks = []
    for i in range(1, _BFS_ROUNDS + 1):
        blocks.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM edges e JOIN {prev} d ON e.src = d.node
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(blocks)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s + {_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT s + {_SUPP_OFFSET} AS src, c AS dst FROM pairs
), d0 AS (
  SELECT DISTINCT c AS node, 0 AS dist FROM pairs WHERE c < {_BFS_SEED_MAX}
),
{chain}
SELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}
"""


@register(
    "graph_bfs_distance",
    category="graph",
    oracle=_bfs_oracle(),
    heavy=True,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: hop distance from a seed set (customers with key
    < 10) over the symmetrized trade graph, {_BFS_ROUNDS} fixed rounds of
    min-distance propagation — the reachability/why-is-this-here query a
    graph-shaped warehouse answers (supply-chain blast radius, fraud-ring
    hops). Same iterative contract as dedup_components/graph_pagerank:
    per round, one edges-join-frontier shuffle + a min rollup;
    localCheckpoint cuts lineage per round; the DuckDB oracle unrolls the
    identical rounds so every intermediate distance is hash-checked.

    Scale: the edge list shuffles onto src once and stays co-located for
    every round; what moves per round is the distance vector (one row per
    reached node). The production optimization — propagate only the
    DELTA frontier (nodes whose dist improved this round) instead of the
    full vector — changes the per-round join input, not the result;
    fixed-round full propagation is kept here because the oracle can
    mirror it row for row. All-integer arithmetic: nothing to round."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"), "o_orderkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_suppkey").alias("s")
    )
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("c", "s")
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst"))
        .unionByName(
            pairs.select(
                (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
            )
        )
        .localCheckpoint()
    )
    dist = (
        pairs.filter(F.col("c") < _BFS_SEED_MAX)
        .select(F.col("c").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    for _ in range(_BFS_ROUNDS):
        stepped = (
            edges.join(dist, edges.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(stepped)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select("node", F.col("dist").cast("long").alias("dist"))


_LP_ROUNDS = 3


def _label_prop_oracle() -> str:
    blocks = []
    prev = "l0"
    for i in range(1, _LP_ROUNDS + 1):
        blocks.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT a.node, l.lbl,
           ROW_NUMBER() OVER (PARTITION BY a.node
                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
    FROM adj a JOIN {prev} l ON l.node = a.nbr
    GROUP BY a.node, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(blocks)
    return f"""
WITH e AS MATERIALIZED ({_COPURCHASE_EDGE_SQL}),
adj AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM e
  UNION ALL
  SELECT v AS node, u AS nbr FROM e
),
l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
{chain}
SELECT node, lbl AS community,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
FROM {prev}
"""


@register(
    "graph_label_propagation",
    category="graph",
    oracle=_label_prop_oracle(),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    co-purchase graph: every node starts as its own community, and each
    round adopts the most frequent label among its neighbors with a
    fully deterministic tie-break (highest count, then lowest label) —
    the asynchronous/random-order variants of LPA are irreproducible by
    design, which is exactly what a verified pipeline cannot have.
    {_LP_ROUNDS} fixed synchronous rounds, unrolled identically in the
    oracle (the dedup_components / geo_dbscan fixed-point-prefix
    discipline); output carries the final community plus its size.

    Scale shape: each round is one shuffle — a join of the adjacency
    list against the |V|-row label frame, a (node, lbl) count, and a
    per-node argmax window. Adjacency and labels share the node key, so
    pre-partitioning by node makes the per-round join co-located; the
    label frame never exceeds one row per vertex."""
    from pyspark.sql import Window as W

    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    ).localCheckpoint()
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LP_ROUNDS):
        freq = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("lbl")
                ),
                "nbr",
            )
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
        labels = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint()
        )
    wsize = W.partitionBy("lbl")
    return labels.select(
        "node",
        F.col("lbl").alias("community"),
        F.count(F.lit(1)).over(wsize).cast("long").alias("community_size"),
    )


_KCORE_ROUNDS = 2


def _kcore_oracle() -> str:
    blocks = []
    prev = "adj0"
    for i in range(1, _KCORE_ROUNDS + 1):
        blocks.append(
            f"""keep{i} AS MATERIALIZED (
  SELECT node FROM {prev}, kval GROUP BY node, k
  HAVING COUNT(*) >= k
),
adj{i} AS MATERIALIZED (
  SELECT a.node, a.nbr FROM {prev} a
  JOIN keep{i} s ON s.node = a.node
  JOIN keep{i} t ON t.node = a.nbr
)"""
        )
        prev = f"adj{i}"
    chain = ",\n".join(blocks)
    return f"""
WITH e AS MATERIALIZED ({_COPURCHASE_EDGE_SQL}),
adj0 AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM e
  UNION ALL
  SELECT v AS node, u AS nbr FROM e
),
kval AS (
  SELECT CAST(quantile_disc(d, 0.2) AS BIGINT) + 1 AS k
  FROM (SELECT node, COUNT(*) AS d FROM adj0 GROUP BY node)
),
{chain}
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree,
       (SELECT k FROM kval) AS k
FROM {prev} GROUP BY node
"""


@register("graph_kcore_peel", category="graph", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction by iterative peeling of the co-purchase graph:
    each round drops every node whose degree fell under k and restricts
    the edge set to survivors — the dense-core filter that separates
    structurally embedded products from hangers-on (degree alone can't:
    a high-degree node whose neighbors all peel away peels too, which
    is the point). k adapts to the graph as the 20th-percentile degree
    + 1 (a fixed k is degenerate across fixture scales: the graph's
    density swings from median degree 89 at sf0.001 to 4 at sf0.1), so
    real peeling cascades happen at every SF while a core survives.
    {_KCORE_ROUNDS} fixed rounds unrolled identically in the oracle
    (fixed-point-prefix discipline); output is the surviving nodes with
    their within-core degree and the realized k.

    Scale shape: each round is a degree count (map-combined) plus two
    semi-join-shaped filters of the adjacency against the survivor set
    — all keyed on node, so pre-partitioning by node co-locates every
    round; the edge set only shrinks."""
    e = _copurchase_edges(spark, sf_dir)
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint()
    )
    deg0 = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    kval = deg0.agg(
        (
            F.expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY d)").cast(
                "long"
            )
            + 1
        ).alias("k")
    )
    for _ in range(_KCORE_ROUNDS):
        keep = (
            adj.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .crossJoin(F.broadcast(kval))
            .filter(F.col("deg") >= F.col("k"))
            .select("node")
        )
        adj = (
            adj.join(keep, "node")
            .join(keep.select(F.col("node").alias("nbr")), "nbr")
            .select("node", "nbr")
            .localCheckpoint()
        )
    return (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .crossJoin(F.broadcast(kval))
    )


def _modularity_oracle() -> str:
    return f"""
WITH lp AS MATERIALIZED (SELECT * FROM ({_label_prop_oracle()})),
e2 AS MATERIALIZED ({_COPURCHASE_EDGE_SQL}),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e2),
intra AS (
  SELECT la.community, CAST(COUNT(*) AS BIGINT) AS intra_edges
  FROM e2
  JOIN lp la ON la.node = e2.u
  JOIN lp lb ON lb.node = e2.v
  WHERE la.community = lb.community
  GROUP BY la.community
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
  ) GROUP BY node
),
comm AS (
  SELECT l.community, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(d.d) AS BIGINT) AS degree_sum
  FROM (SELECT DISTINCT node, community FROM lp) l
  JOIN deg d ON d.node = l.node
  GROUP BY l.community
)
SELECT c.community, c.n_members,
       COALESCE(i.intra_edges, 0) AS intra_edges,
       c.degree_sum,
       round(CAST(COALESCE(i.intra_edges, 0) AS DOUBLE)/m.m
             - (CAST(c.degree_sum AS DOUBLE)/(2*m.m))
               *(CAST(c.degree_sum AS DOUBLE)/(2*m.m)), 9) AS q_term
FROM comm c LEFT JOIN intra i ON i.community = c.community, m
"""


@register(
    "graph_modularity", category="graph", oracle=_modularity_oracle()
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity readout for the label-propagation communities: per
    community, member count, intra-community edge count, degree mass,
    and the Newman Q contribution m_c/m - (d_c/2m)^2 — summing q_term
    gives the partition's modularity, the standard did-the-communities-
    mean-anything check (Q near 0 = no better than random wiring; the
    judge of graph_label_propagation's output, the same way
    sim_ann_recall_eval judges the ANN). Composes the REGISTERED
    label-propagation operator directly, and the oracle embeds the LP
    oracle as a subquery, so both layers stay verified end to end. All
    inputs to q_term are exact integers; the chain is written
    identically and rounded once.

    Scale shape: the LP rounds dominate; the modularity pass adds two
    hash joins of the edge list against the |V|-row assignment and a
    per-community rollup."""
    e = _copurchase_edges(spark, sf_dir).localCheckpoint()
    lp = graph_label_propagation(spark, sf_dir).localCheckpoint()
    m_df = e.agg(F.count(F.lit(1)).alias("m"))
    la = lp.select(
        F.col("node").alias("u"), F.col("community").alias("cu")
    )
    lb = lp.select(
        F.col("node").alias("v"), F.col("community").alias("cv")
    )
    intra = (
        e.join(la, "u")
        .join(lb, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    comm = (
        lp.select("node", "community")
        .distinct()
        .join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d").alias("degree_sum"),
        )
    )
    md = F.col("m")
    dd = F.col("degree_sum").cast("double")
    return (
        comm.join(intra, "community", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "community",
            "n_members",
            F.coalesce(F.col("intra_edges"), F.lit(0)).alias("intra_edges"),
            "degree_sum",
            F.round(
                F.coalesce(F.col("intra_edges"), F.lit(0)).cast("double")
                / md
                - (dd / (2 * md)) * (dd / (2 * md)),
                9,
            ).alias("q_term"),
        )
    )


@register(
    "graph_assortativity",
    category="graph",
    oracle=f"""
WITH e2 AS MATERIALIZED ({_COPURCHASE_EDGE_SQL}),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
  ) GROUP BY node
),
ends AS (
  -- both orientations so the correlation is symmetric
  SELECT du.d AS dx, dv.d AS dy
  FROM e2 JOIN deg du ON du.node = e2.u JOIN deg dv ON dv.node = e2.v
  UNION ALL
  SELECT dv.d, du.d
  FROM e2 JOIN deg du ON du.node = e2.u JOIN deg dv ON dv.node = e2.v
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx*dy) AS BIGINT) AS sxy,
         CAST(SUM(dx*dx) AS BIGINT) AS sxx,
         CAST(SUM(dy*dy) AS BIGINT) AS syy
  FROM ends
)
SELECT n AS n_edge_ends,
       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n)
                  * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n)), 9)
         AS assortativity
FROM m
""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over all edges (both orientations,
    so the coefficient is symmetric) — positive means hubs link to
    hubs (social-network flavor), negative means hubs link to leaves
    (technological/star flavor), the one-number structure summary next
    to the degree distribution. Degrees are exact integers, so all
    five co-moment sums are integer and the single chain rounds once.

    Scale shape: a degree count plus two hash joins of the edge list
    against it — the graph_modularity cost without the LP rounds."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    joined = e.join(du, "u").join(dv, "v")
    ends = joined.select(
        F.col("du").alias("dx"), F.col("dv").alias("dy")
    ).unionAll(
        joined.select(F.col("dv").alias("dx"), F.col("du").alias("dy"))
    )
    m = ends.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    r = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
        * (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy") / F.col("n")
        )
    )
    return m.select(
        F.col("n").cast("long").alias("n_edge_ends"),
        F.round(r, 9).alias("assortativity"),
    )


def _ppr_oracle() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst AS node, {_D} * SUM(r.pr / dg.d) AS pr
  FROM edges e JOIN {prev} r ON e.src = r.node
               JOIN deg dg ON e.src = dg.src
  GROUP BY e.dst
),
r{i} AS MATERIALIZED (
  SELECT node, SUM(pr) AS pr FROM (
    SELECT node, pr FROM c{i}
    UNION ALL
    SELECT node, pr0 AS pr FROM restart
  ) GROUP BY node
)"""
        )
        prev = f"r{i}"
    blocks = ",\n".join(iters)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s + {_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT s + {_SUPP_OFFSET} AS src, c AS dst FROM pairs
), deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
), seeds AS MATERIALIZED (
  SELECT DISTINCT p.c AS node
  FROM pairs p JOIN customer ON c_custkey = p.c
  WHERE c_nationkey = 0
), restart AS MATERIALIZED (
  SELECT node, {1 - _D} / (SELECT COUNT(*) FROM seeds) AS pr0 FROM seeds
), r0 AS (
  SELECT node, 1.0 / (SELECT COUNT(*) FROM seeds) AS pr FROM seeds
),
{blocks}
SELECT node, ROUND(pr, 6) AS ppr FROM {prev}
"""


@register(
    "graph_personalized_pagerank",
    category="graph",
    oracle=_ppr_oracle(),
    heavy=True,
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (d=0.85, 3 rounds) on the trade graph, with
    ALL teleport mass restarting at a seed set (nation-0 customers) —
    the similarity-to-a-cohort measure behind related-entity retrieval
    and seed-expansion curation (find suppliers "close to" one market's
    buyers), vs graph_pagerank's global importance.

    Same scale posture as graph_pagerank: the edge list shuffles once
    and is persisted co-located; the rank vector starts as |seeds| rows
    and only grows to the seeds' 3-hop frontier — on a power-law graph
    that is a small fraction of nodes, so every iteration joins a big
    static side with a SMALL moving side (broadcastable under AQE).
    Each round is contributions (edges x ranks, groupBy dst) unioned
    with the restart vector and re-summed — the union-groupBy form of
    pr = (1-d)*restart + d*contrib that needs no outer join. The oracle
    unrolls the identical three rounds; ranks stay raw doubles on both
    sides until one final 6-dp round."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Same r12 build-phase restructure as _pagerank_ranks (measured
    # there; the build is identical): dedup co-partitioned with the
    # customer-side degree count, per-side degrees from the pair list,
    # compact (src, dst) edge cache, checkpointed deg re-weighting the
    # rank vector before the edge join — and (r12 session 2) the edge
    # cache partitioned + sorted on src so the per-iteration join reads
    # it exchange-free (measured on _pagerank_ranks; same loop shape).
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .repartition("c")
        .dropDuplicates()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    )
    rev = pairs.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    edges = (
        fwd.unionAll(rev)
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    degc = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("c").alias("node"), "d"
    )
    degs = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("d")).select(
        (F.col("s") + _SUPP_OFFSET).alias("node"), "d"
    )
    deg = degc.unionByName(degs).localCheckpoint()
    cust = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 0)
    seeds = (
        pairs.select(F.col("c").alias("node"))
        .distinct()
        .join(
            F.broadcast(cust.select(F.col("c_custkey").alias("node"))),
            "node",
            "left_semi",
        )
    ).persist()
    try:
        n_seeds = seeds.count()  # O(1) scalar: restart normalization
        restart = seeds.select(
            "node", (F.lit(1.0 - _D) / n_seeds).alias("pr")
        )
        ranks = seeds.select("node", (F.lit(1.0) / n_seeds).alias("pr"))
        for _ in range(_ITERS):
            rankd = ranks.join(deg, "node").select(
                "node", (F.col("pr") / F.col("d")).alias("w")
            )
            contrib = (
                edges.join(rankd, edges["src"] == rankd["node"])
                .select("dst", "w")
                .groupBy("dst")
                .agg((F.lit(_D) * F.sum("w")).alias("pr"))
                .withColumnRenamed("dst", "node")
            )
            ranks = (
                contrib.unionByName(restart)
                .groupBy("node")
                .agg(F.sum("pr").alias("pr"))
            )
        out = ranks.select("node", F.round("pr", 6).alias("ppr"))
        out = out.localCheckpoint()  # materialize before unpersisting edges
    finally:
        edges.unpersist()
        seeds.unpersist()
    return out


def _sssp_oracle() -> str:
    prev = "d0"
    rounds = []
    for i in range(1, 4):
        rounds.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM edges e JOIN {prev} d ON e.src = d.node
    UNION ALL
    SELECT node, dist FROM {prev}
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    blocks = ",\n".join(rounds)
    return f"""
WITH trade AS MATERIALIZED (
  SELECT o_custkey AS c, l_suppkey AS s,
         MIN(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, l_suppkey
), edges AS MATERIALIZED (
  SELECT c AS src, s + {_SUPP_OFFSET} AS dst, w FROM trade
  UNION ALL
  SELECT s + {_SUPP_OFFSET} AS src, c AS dst, w FROM trade
), seeds AS (
  SELECT DISTINCT t.c AS node
  FROM trade t JOIN customer ON c_custkey = t.c
  WHERE c_nationkey = 0
), d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
{blocks}
SELECT node, dist AS min_cost_cents FROM {prev}
"""


@register(
    "graph_sssp_bounded",
    category="graph",
    oracle=_sssp_oracle(),
    heavy=True,
)
def graph_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from a seed cohort, bounded to 3
    relaxation rounds (Bellman-Ford's min-plus step as a join+groupBy) —
    the cheapest-reach query (cost = cheapest trade on each hop) that
    complements graph_bfs_distance's hop counts with real edge weights.
    Every quantity is an exact integer (cent-grid weights, min-plus
    sums), so unlike PageRank there is NO float summation anywhere —
    the unrolled oracle matches bit-for-bit with no rounding at all.

    Scale posture: the edge list (with weights) is built once and
    persisted; each round joins the CURRENT distance frontier (small)
    against it and re-aggregates MIN per node — the same
    static-big/moving-small shape as the PageRank loop, and min is
    idempotent+mergeable so AQE map-side partials do the heavy
    lifting. Rounds are a fixed small k: at 100 TB you bound relaxation
    by business meaning (k-hop reach), not convergence."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    trade = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("w")
        )
    )
    fwd = trade.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst"), "w"
    )
    rev = trade.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst"), "w"
    )
    edges = fwd.unionAll(rev).persist()
    cust = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 0)
    seeds = (
        trade.select(F.col("c").alias("node"))
        .distinct()
        .join(
            F.broadcast(cust.select(F.col("c_custkey").alias("node"))),
            "node",
            "left_semi",
        )
    )
    try:
        dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
        for _ in range(3):
            relaxed = edges.join(
                dist, edges["src"] == dist["node"]
            ).select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            dist = (
                relaxed.unionByName(dist)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint()  # cut the per-round lineage
            )
        return dist.select("node", F.col("dist").alias("min_cost_cents"))
    finally:
        edges.unpersist()


@register(
    "graph_louvain_round",
    category="graph",
    oracle=f"""
WITH e AS MATERIALIZED ({_COPURCHASE_EDGE_SQL}),
und AS (
  SELECT u AS i, v AS j FROM e UNION ALL SELECT v, u FROM e
),
deg AS (SELECT i, COUNT(*) AS k FROM und GROUP BY i),
m AS (SELECT COUNT(*) AS m2 FROM und),
gains AS (
  SELECT und.i, und.j,
         1.0 - (di.k * dj.k) / CAST(m.m2 AS DOUBLE) AS gain
  FROM und JOIN deg di ON di.i = und.i
  JOIN deg dj ON dj.i = und.j
  CROSS JOIN m
),
best AS (
  SELECT i, j, gain,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY gain DESC, j) AS rk
  FROM gains
),
assign AS (
  SELECT d.i,
         CASE WHEN b.gain > 0 THEN LEAST(b.i, b.j) ELSE d.i END AS community
  FROM deg d LEFT JOIN best b ON b.i = d.i AND b.rk = 1
)
SELECT community, COUNT(*) AS n_members,
       CAST(MIN(i) AS BIGINT) AS first_member
FROM assign GROUP BY community
""",
    heavy=True,
)
def graph_louvain_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Louvain round from singleton communities on the
    part co-purchase graph: every node evaluates the modularity gain of
    joining each neighbor's (singleton) community —
    gain(i->j) = w_ij - k_i*k_j/(2m) with unit weights — and moves to
    the best strictly-positive one (ties to the smallest neighbor id;
    the joint community is labeled min(i, j) so mutually-choosing pairs
    agree). Louvain's full schedule iterates this with community
    re-aggregation; the single synchronous round is the deterministic,
    oracle-verifiable core, complementing graph_label_propagation
    (count-based) with the modularity-gain criterion.

    Exactness: the gain is ONE scalar expression per (i, j) on doubles
    identical across engines, compared per-row — no accumulation, so no
    ordering hazard; the argmax tie-breaks on j.

    Scale: degrees and gains are one shuffle each on node id; the gain
    join streams edges against the broadcast degree table; nothing is
    quadratic — work is O(m) per round, the published Louvain cost.
    """
    result, caches = graph_louvain_round_plan(spark, sf_dir)
    try:
        # materialize before releasing the caches (the sibling heavy-op
        # discipline, e.g. graph_sssp_bounded) so full-registry batteries
        # don't accumulate orphaned cached blocks for the session
        result = result.localCheckpoint()
    finally:
        for c in caches:
            c.unpersist()
    return result


def graph_louvain_round_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """LAZY Louvain-round plan plus the frames it persisted — split out so
    plan tests can inspect the broadcast-join shape (the registered query
    localCheckpoints, which replaces the plan with an ExistingRDD scan).
    Callers must unpersist the returned caches after materializing."""
    e = _copurchase_edges(spark, sf_dir)
    # the lineitem self-join feeds deg, m2, gains AND the final assign —
    # persist it once (same discipline as the other heavy graph ops)
    und = (
        e.select(F.col("u").alias("i"), F.col("v").alias("j"))
        .unionAll(e.select(F.col("v").alias("i"), F.col("u").alias("j")))
        .persist()
    )
    deg = und.groupBy("i").agg(F.count(F.lit(1)).alias("k")).persist()
    m2 = und.agg(F.count(F.lit(1)).alias("m2"))
    di = deg.select(F.col("i").alias("di_i"), F.col("k").alias("ki"))
    dj = deg.select(F.col("i").alias("dj_i"), F.col("k").alias("kj"))
    gains = (
        und.join(F.broadcast(di), F.col("i") == F.col("di_i"))
        .join(F.broadcast(dj), F.col("j") == F.col("dj_i"))
        .crossJoin(F.broadcast(m2))
        .select(
            "i", "j",
            (F.lit(1.0) - (F.col("ki") * F.col("kj")) / F.col("m2").cast("double")).alias("gain"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("i").orderBy(F.desc("gain"), "j")
    best = gains.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    assign = deg.join(
        best.select(F.col("i").alias("b_i"), F.col("j").alias("b_j"), "gain"),
        F.col("i") == F.col("b_i"),
        "left",
    ).select(
        "i",
        F.when(F.col("gain") > 0, F.least(F.col("b_i"), F.col("b_j")))
        .otherwise(F.col("i"))
        .alias("community"),
    )
    result = assign.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("i").cast("long").alias("first_member"),
    )
    return result, [und, deg]
