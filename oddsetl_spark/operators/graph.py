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
    customer–supplier trade graph. The edge list (with out-degree
    attached) is persisted after ONE shuffle; each iteration joins the
    small rank vector against it and re-aggregates on dst. The oracle
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
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    )
    rev = pairs.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    edges = fwd.unionAll(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edged = edges.join(deg, "src").persist()
    try:
        ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
        for _ in range(_ITERS):
            ranks = (
                edged.join(ranks, edged["src"] == ranks["node"])
                .select("dst", (F.col("pr") / F.col("d")).alias("w"))
                .groupBy("dst")
                .agg((F.lit(1 - _D) + F.lit(_D) * F.sum("w")).alias("pr"))
                .withColumnRenamed("dst", "node")
            )
        out = ranks.select("node", F.round("pr", 6).alias("pr"))
        if checkpoint:
            out = out.localCheckpoint()  # materialize before unpersisting edges
    finally:
        if checkpoint:
            edged.unpersist()
    return out
