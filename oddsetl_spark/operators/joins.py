"""SURVEY.md §2.C — join operators.

Scale strategy per join (the part that matters at 100 TB):
- dim joins broadcast explicitly (region/nation always; supplier/part/customer
  at bench scale) — zero shuffle of the fact side;
- fact-fact joins shuffle on the join key (sort-merge); AQE handles skew;
- theta/band joins get a BINNED variant that turns O(n*m) nested-loop into
  an equi-join on range buckets + refine — the only formulation that
  survives a 100x scale-up;
- as-of join is union-tag + last(ignoreNulls) window — one shuffle, no
  per-row probe;
- skew variant salts the hot key explicitly (alternative to AQE skew split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import dsum, lsum, scaled_group_sums, sql_dsum, sql_lsum


@register(
    "join_inner_equi",
    category="joins",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 250000
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_totalprice") > 250000)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "join_left_outer",
    category="joins",
    oracle="""
SELECT c.c_custkey, c.c_name, e.event_id, e.event_type
FROM customer c LEFT JOIN events e
  ON c.c_custkey = e.user_id AND e.event_type = 'purchase' AND e.event_id < 100
WHERE c.c_custkey < 300
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with an ON-clause filter on the right side (classic
    outer-join semantics trap: the filter must NOT become a WHERE)."""
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    cond = (
        (c.c_custkey == e.user_id)
        & (e.event_type == "purchase")
        & (e.event_id < 100)
    )
    return (
        c.filter(F.col("c_custkey") < 300)
        .join(e, cond, "left")
        .select("c_custkey", "c_name", "event_id", "event_type")
    )


@register(
    "join_right_outer",
    category="joins",
    oracle="""
SELECT e.event_id, e.user_id, c.c_name
FROM events e RIGHT JOIN customer c ON e.user_id = c.c_custkey AND e.value > 480
WHERE c.c_custkey < 200
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    cond = (e.user_id == c.c_custkey) & (e.value > 480)
    return (
        e.join(c.filter(F.col("c_custkey") < 200), cond, "right")
        .select("event_id", "user_id", "c_name")
    )


@register(
    "join_full_outer",
    category="joins",
    oracle="""
WITH a AS (SELECT user_id, COUNT(*) AS n_click FROM events WHERE event_type='click' GROUP BY user_id),
     b AS (SELECT user_id, COUNT(*) AS n_purchase FROM events WHERE event_type='purchase' GROUP BY user_id)
SELECT COALESCE(a.user_id, b.user_id) AS user_id, a.n_click, b.n_purchase
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_click"))
        .alias("a")
    )
    b = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchase"))
        .alias("b")
    )
    return a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full").select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        "n_click",
        "n_purchase",
    )


@register(
    "join_left_semi",
    category="joins",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — semi join never duplicates the left side."""
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error")
    return c.join(err, c.c_custkey == err.user_id, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    category="joins",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — customers with no events (events cover only low keys)."""
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast_star",
    category="joins",
    oracle=f"""
SELECT n.n_name,
       {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o    ON o.o_custkey = c.c_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star. Dims are broadcast explicitly so the
    only shuffles are the two fact-fact exchanges (orders⋈lineitem) and
    the final agg — the right plan at any scale where dims fit in memory.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    od = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    asia = F.broadcast(
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
               n.n_regionkey == r.r_regionkey)
    )
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(c), od.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(asia, s.s_nationkey == F.col("n_nationkey"))
    )
    # ~5 nation groups aggregate 100 TB of rows: two-phase scaled-long sums
    # (long partials per join-output partition, decimal merge) keep the hot
    # adds primitive while staying exact and overflow-safe
    return scaled_group_sums(
        joined,
        keys=["n_name"],
        sums={"revenue": F.col("l_extendedprice") * (1 - F.col("l_discount"))},
    )


@register(
    "join_sort_merge",
    category="joins",
    oracle=f"""
SELECT o.o_orderstatus,
       COUNT(*) AS n_lines,
       {sql_dsum('l.l_quantity')} AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join forced to sort-merge — the 100 TB fact-fact path."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.hint("merge")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity")).alias("total_qty"),
        )
    )


@register(
    "join_cross",
    category="joins",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_theta_band",
    category="joins",
    oracle="""
SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
       a.s_acctbal AS a_bal, b.s_acctbal AS b_bal
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND b.s_acctbal BETWEEN a.s_acctbal - 10 AND a.s_acctbal + 10
""",
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band theta-join (±10 on acctbal) — BroadcastNestedLoop baseline.
    Only viable when one side broadcasts; see join_range_binned for scale."""
    s = table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    cond = (
        (F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        & (F.col("b.s_acctbal") >= F.col("a.s_acctbal") - 10)
        & (F.col("b.s_acctbal") <= F.col("a.s_acctbal") + 10)
    )
    return a.join(b, cond).select(
        F.col("a.s_suppkey").alias("a_key"),
        F.col("b.s_suppkey").alias("b_key"),
        F.col("a.s_acctbal").alias("a_bal"),
        F.col("b.s_acctbal").alias("b_bal"),
    )


@register(
    "join_range_binned",
    category="joins",
    oracle="""
SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
       a.s_acctbal AS a_bal, b.s_acctbal AS b_bal
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND b.s_acctbal BETWEEN a.s_acctbal - 10 AND a.s_acctbal + 10
""",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same band join, scale formulation: bin both sides on floor(bal/10),
    equi-join on bin in {-1,0,+1} offsets, refine exact predicate.
    Turns the nested loop into a shuffled equi-join — survives 100x scale
    because work is proportional to matching bins, not |A|x|B|.
    """
    s = table(spark, sf_dir, "supplier")
    width = 10
    a = s.select(
        F.col("s_suppkey").alias("a_key"),
        F.col("s_acctbal").alias("a_bal"),
        F.floor(F.col("s_acctbal") / width).alias("a_bin"),
    )
    # Replicate the probe side into the 3 adjacent bins (explode, not loop).
    b = s.select(
        F.col("s_suppkey").alias("b_key"),
        F.col("s_acctbal").alias("b_bal"),
        F.explode(
            F.array(
                F.floor(F.col("s_acctbal") / width) - 1,
                F.floor(F.col("s_acctbal") / width),
                F.floor(F.col("s_acctbal") / width) + 1,
            )
        ).alias("a_bin"),
    )
    return (
        a.join(b, "a_bin")
        .filter(
            (F.col("a_key") < F.col("b_key"))
            & (F.col("b_bal") >= F.col("a_bal") - width)
            & (F.col("b_bal") <= F.col("a_bal") + width)
        )
        .select("a_key", "b_key", "a_bal", "b_bal")
    )


@register(
    "join_asof",
    category="joins",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, o.o_orderkey, o.o_orderdate
FROM events e
ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
WHERE e.event_id < 2000
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event -> latest order of the same customer at ts.

    Spark has no native ASOF; this is the union-tag formulation: union both
    sides on a common (key, time) axis, one window sort per key, propagate
    the last order seen with last(ignoreNulls). ONE shuffle on user_id —
    no per-row probing, no crossJoin — the formulation that scales.

    Tie semantics: DuckDB ASOF takes o_orderdate <= ts; orders sort before
    the event at equal timestamps (is_order=1 first via secondary key).
    DuckDB's choice among BUILD rows tied on the asof key is unspecified,
    so both sides pre-dedup orders to max(o_orderkey) per
    (o_custkey, o_orderdate) — the fixtures contain duplicate pairs.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    ev = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    # Orders first at equal t (desc on is_order) so "<= ts" includes ties.
    w = (
        W.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = ev.unionByName(od)
    matched = unioned.select(
        "is_order",
        "event_id",
        F.col("k").alias("user_id"),
        "ts",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("o_orderdate"),
    )
    return matched.filter(F.col("is_order") == 0).select(
        "event_id", "user_id", "ts", "o_orderkey", "o_orderdate"
    )


@register(
    "join_interval_overlap",
    category="joins",
    oracle="""
SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id
FROM events s JOIN events p
  ON s.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <  CAST(s.ts AS TIMESTAMP) + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 1h after a signup, same user. The equi
    key (user_id) carries the shuffle; the range predicate is a post-join
    filter — no nested loop, scales with per-user event counts."""
    e = table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").alias("s")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("s.ts"))
        & (F.col("p.ts") < F.col("s.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return s.join(p, cond).select(
        F.col("s.event_id").alias("signup_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("s.user_id").alias("user_id"),
    )


@register(
    "join_self",
    category="joins",
    oracle="""
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE a.vec_id < 100 AND b.vec_id < 100
""",
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases (same-label vector pairs)."""
    em = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    a = em.alias("a")
    b = em.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.col("a.label").alias("label"),
        )
    )


@register(
    "join_skew_salted",
    category="joins",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dsum('o.o_totalprice')} AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: salt the (potentially hot) fact key into 16
    buckets and replicate the dim side across all salts, so one hot customer
    spreads over 16 tasks instead of stalling one. Same answer as the plain
    join — verified by the oracle. At 100 TB this is the manual fallback
    when AQE skew-split isn't enough (single-key hotspots).
    """
    n_salt = 16
    o = table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt)).cast("int")
    )
    c = table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@register(
    "join3_topk_revenue",
    category="joins",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def join3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (BASELINE.md's q3 row): customer⋈orders⋈lineitem,
    segment + date filters, revenue agg, top-10. Filters sit on raw scan
    columns (pushed to parquet); customer is the small probe side and is
    broadcast so only the orders⋈lineitem join shuffles — at 100 TB both
    big sides hash-partition on orderkey and AQE handles skew."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # single-phase scaled-long sum: per-ORDER revenue is tiny, so
            # the long never overflows — and the sum stays primitive codegen
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "join_runtime_bloomfilter",
    category="joins",
    oracle=f"""
SELECT o.o_orderkey, {sql_dsum('l.l_quantity')} AS total_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderkey
""",
)
def join_runtime_bloomfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning: the selective build side
    (URGENT orders) injects a bloom_filter_agg subquery whose
    might_contain() predicate prunes the probe scan BEFORE the shuffle —
    at 100 TB this cuts the shuffled fact volume by the build side's
    selectivity without any manual semi-join. Broadcast is disabled for
    the demo so the SMJ path (the at-scale shape) is what gets pruned.

    The plan is MATERIALIZED (localCheckpoint) while the overrides are in
    force, and the saved confs are restored in a finally block — so a
    caller that builds several query DataFrames before collecting any
    never executes a sibling query with broadcast joins disabled (the
    opt_cbo_join_reorder conf-scoping pattern)."""
    # Build FIRST: table() -> pin_session resets these confs to defaults;
    # the optimizer reads them at execution, so set overrides after build.
    df = _bloom_join(spark, sf_dir)
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_OVERRIDES}
    for k, v in _BLOOM_OVERRIDES.items():
        spark.conf.set(k, v)
    try:
        # execute (localCheckpoint) while the bloom/SMJ confs hold
        return df.localCheckpoint()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_BLOOM_OVERRIDES = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-checkpointed bloom-join plan — tests inspect this under their
    own conf scope (the registered query checkpoints, which hides the
    join plan behind the checkpoint scan)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )


@register(
    "join_null_safe",
    category="joins",
    oracle="""
WITH a AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'F') AS k, o_totalprice
  FROM orders WHERE o_orderkey < 2000
),
b AS (
  SELECT NULLIF(o_orderstatus, 'F') AS k, COUNT(*) AS n_b
  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 6000
  GROUP BY 1
)
SELECT a.o_orderkey, a.k, a.o_totalprice, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other, unlike plain = which drops them — the semantic needed when
    joining on nullable business keys (e.g. optional dimension codes).
    Spark plans <=> as a regular hash join (NULL hashes to a bucket like
    any value), so the scale shape is identical to join_inner_equi; the
    only difference is the key comparator."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k"),
        "o_totalprice",
    )
    b = (
        o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 6000))
        .select(F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(
        "o_orderkey", a.k.alias("k"), "o_totalprice", "n_b"
    )


@register(
    "join_fuzzy_levenshtein",
    category="joins",
    oracle="""
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 500),
variants AS (
  SELECT c_custkey, c_name,
         substr(c_name, 1, CAST(t.i AS INT) - 1) || substr(c_name, CAST(t.i AS INT) + 1) AS v
  FROM c, UNNEST(range(1, length(c_name) + 2)) AS t(i)
)
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM variants a JOIN variants b ON a.v = b.v AND a.c_custkey < b.c_custkey
GROUP BY 1, 2, 3
HAVING dist <= 1
""",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (edit distance <= 1) via SymSpell deletion-
    neighborhood blocking: every name emits its length+1 one-character-
    deletion variants (plus itself); any lev<=1 pair MUST share a variant,
    so candidates come from an equi-join on the variant string and exact
    levenshtein refines them. Work scales with variant-bucket collision
    lists, never n² — the same inverted-index shape as dedup_ngram_jaccard.
    All JVM-side: sequence/transform/explode build variants, one shuffle
    on the variant key."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select("c_custkey", "c_name")
    )
    variants = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "transform(sequence(1, length(c_name) + 1),"
                " i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)))"
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = a.join(
        b,
        (F.col("a.v") == F.col("b.v")) & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        F.levenshtein("a.c_name", "b.c_name").alias("dist"),
    )
    return cand.filter(F.col("dist") <= 1).distinct()


@register(
    "join_asof_forward",
    category="joins",
    oracle="""
WITH b AS (
  SELECT o_custkey, o_orderdate, MIN(o_orderkey) AS nxt_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
       b.nxt_orderkey, b.o_orderdate AS nxt_date,
       CAST(DATE_DIFF('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
         AS days_to_next
FROM orders a
ASOF LEFT JOIN b
  ON a.o_custkey = b.o_custkey AND b.o_orderdate > a.o_orderdate
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (strict) as-of self-join: each order finds the customer's
    NEXT order — the time-to-next-event query behind churn and
    reorder-interval analyses. Same union-tag single-shuffle formulation
    as join_asof but looking AHEAD: build rows sort BEFORE probe rows at
    equal time, so a first(ignoreNulls) over (1 FOLLOWING, UNBOUNDED
    FOLLOWING) sees strictly-later builds only — strict '>' semantics
    without a second pass. Build side pre-deduped to min(o_orderkey) per
    (custkey, date) to pin DuckDB's unspecified tie choice."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    b = o.groupBy("o_custkey", "o_orderdate").agg(
        F.min("o_orderkey").alias("nxt_orderkey")
    )
    probe = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("tag"),
        "o_orderkey",
        F.lit(None).cast("long").alias("nxt_orderkey"),
    )
    build = b.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "nxt_orderkey",
    )
    w = (
        W.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("tag").asc(), F.col("o_orderkey").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    u = probe.unionByName(build)
    matched = u.select(
        "tag",
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        F.col("t").alias("o_orderdate"),
        F.first("nxt_orderkey", ignorenulls=True).over(w).alias("nxt_orderkey"),
        F.first(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("nxt_date"),
    )
    return matched.filter(F.col("tag") == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "nxt_orderkey",
        "nxt_date",
        F.datediff(F.col("nxt_date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_next"),
    )


@register(
    "join_asof_nearest",
    category="joins",
    oracle="""
WITH bb AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS bkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
fb AS (
  SELECT o_custkey, o_orderdate, MIN(o_orderkey) AS fkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
p AS (SELECT o_orderkey, o_custkey, o_orderdate FROM orders),
pb AS (
  SELECT p.o_orderkey, p.o_custkey, p.o_orderdate,
         b.o_orderdate AS prev_date, b.bkey AS prev_key
  FROM p ASOF LEFT JOIN bb b
    ON p.o_custkey = b.o_custkey AND b.o_orderdate < p.o_orderdate
),
pf AS (
  SELECT p.o_orderkey, f.o_orderdate AS next_date, f.fkey AS next_key
  FROM p ASOF LEFT JOIN fb f
    ON p.o_custkey = f.o_custkey AND f.o_orderdate > p.o_orderdate
)
SELECT pb.o_orderkey, pb.o_custkey, pb.o_orderdate,
       CASE
         WHEN prev_date IS NULL AND next_date IS NULL THEN NULL
         WHEN next_date IS NULL THEN 'prev'
         WHEN prev_date IS NULL THEN 'next'
         WHEN DATE_DIFF('day', prev_date, pb.o_orderdate)
              <= DATE_DIFF('day', pb.o_orderdate, next_date) THEN 'prev'
         ELSE 'next' END AS nearest_dir,
       CASE
         WHEN prev_date IS NULL AND next_date IS NULL THEN NULL
         WHEN next_date IS NULL THEN prev_key
         WHEN prev_date IS NULL THEN next_key
         WHEN DATE_DIFF('day', prev_date, pb.o_orderdate)
              <= DATE_DIFF('day', pb.o_orderdate, next_date) THEN prev_key
         ELSE next_key END AS nearest_key,
       CAST(LEAST(DATE_DIFF('day', prev_date, pb.o_orderdate),
                  DATE_DIFF('day', pb.o_orderdate, next_date)) AS BIGINT)
         AS gap_days
FROM pb JOIN pf USING (o_orderkey)
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (either direction, strict): each order finds the
    customer's closest OTHER order day, backward or forward, ties to
    backward — the direction='nearest' mode of pandas merge_asof,
    completing the backward (join_asof) / forward (join_asof_forward)
    family. One union, ONE hash exchange on the key, and two window
    passes whose tie-orders differ (probes-first vs builds-first at
    equal time) so 'strictly earlier' and 'strictly later' both fall out
    of frame bounds — no second shuffle, the same partitioning serves
    both sorts."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    bb = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("bkey"), F.min("o_orderkey").alias("fkey")
    )
    probe = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("tag"),
        "o_orderkey",
        F.lit(None).cast("long").alias("bkey"),
        F.lit(None).cast("long").alias("fkey"),
    )
    build = bb.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "bkey",
        "fkey",
    )
    u = probe.unionByName(build)
    # backward-strict: probes sort BEFORE same-t builds (tag desc), frame
    # (-inf, -1] then contains only strictly-earlier builds.
    wb = (
        W.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("tag").desc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # forward-strict: builds sort BEFORE same-t probes (tag asc), frame
    # [1, +inf) then contains only strictly-later builds.
    wf = (
        W.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("tag").asc(), F.col("o_orderkey").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    bt = F.when(F.col("tag") == 0, F.col("t"))
    m = u.select(
        "tag",
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        F.col("t").alias("o_orderdate"),
        F.last(bt, ignorenulls=True).over(wb).alias("prev_date"),
        F.last(F.when(F.col("tag") == 0, F.col("bkey")), ignorenulls=True)
        .over(wb)
        .alias("prev_key"),
        F.first(bt, ignorenulls=True).over(wf).alias("next_date"),
        F.first(F.when(F.col("tag") == 0, F.col("fkey")), ignorenulls=True)
        .over(wf)
        .alias("next_key"),
    ).filter(F.col("tag") == 1)
    prev_gap = F.datediff(F.col("o_orderdate"), F.col("prev_date"))
    next_gap = F.datediff(F.col("next_date"), F.col("o_orderdate"))
    prefer_prev = F.col("next_date").isNull() | (
        F.col("prev_date").isNotNull() & (prev_gap <= next_gap)
    )
    no_match = F.col("prev_date").isNull() & F.col("next_date").isNull()
    return m.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(no_match, F.lit(None).cast("string"))
        .when(prefer_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
        .alias("nearest_dir"),
        F.when(no_match, F.lit(None).cast("long"))
        .when(prefer_prev, F.col("prev_key"))
        .otherwise(F.col("next_key"))
        .alias("nearest_key"),
        F.least(prev_gap, next_gap).cast("long").alias("gap_days"),
    )


@register(
    "join_asof_tolerance",
    category="joins",
    oracle="""
WITH b AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS prev_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
m AS (
  SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
         b.prev_orderkey, b.o_orderdate AS prev_date
  FROM orders a
  ASOF LEFT JOIN b
    ON a.o_custkey = b.o_custkey AND b.o_orderdate < a.o_orderdate
)
SELECT o_orderkey, o_custkey, o_orderdate,
       CASE WHEN prev_date >= o_orderdate - INTERVAL 365 DAY
            THEN prev_orderkey END AS prev_orderkey,
       CASE WHEN prev_date >= o_orderdate - INTERVAL 365 DAY
            THEN prev_date END AS prev_date,
       prev_date IS NOT NULL
         AND prev_date < o_orderdate - INTERVAL 365 DAY AS dropped_stale
FROM m
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof's
    `tolerance`): each order finds the customer's PREVIOUS order, but
    the match only counts if it landed within 365 days — older matches
    drop to NULL with a dropped_stale audit flag, the semantics feature
    pipelines need so a point-in-time feature can't silently ride a
    value from years ago. Same union-tag single-shuffle formulation as
    join_asof, looking strictly backward (probe rows sort before build
    rows at equal time), with the tolerance as a post-predicate on the
    propagated match — zero extra plan cost. Completes the asof
    family: backward / forward / nearest / tolerance."""
    o = table(spark, sf_dir, "orders")
    b = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("prev_orderkey")
    )
    probe = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_build"),
        "o_orderkey",
        F.col("o_orderdate").alias("probe_date"),
        F.lit(None).cast("long").alias("prev_orderkey"),
        F.lit(None).cast("timestamp").alias("prev_date"),
    )
    build = b.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_build"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("probe_date"),
        "prev_orderkey",
        F.col("o_orderdate").alias("prev_date"),
    )
    # Strict '<': probe rows sort BEFORE builds at equal t, so the
    # last(ignoreNulls) up to the current row sees earlier builds only.
    w = (
        W.partitionBy("k")
        .orderBy(
            F.col("t").asc(),
            F.col("is_build").asc(),
            F.col("prev_orderkey").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        probe.unionByName(build)
        .select(
            "is_build",
            "o_orderkey",
            F.col("k").alias("o_custkey"),
            F.col("probe_date").alias("o_orderdate"),
            F.last("prev_orderkey", ignorenulls=True)
            .over(w)
            .alias("m_orderkey"),
            F.last("prev_date", ignorenulls=True).over(w).alias("m_date"),
        )
        .filter(F.col("is_build") == 0)
    )
    fresh = F.col("m_date") >= F.col("o_orderdate") - F.expr(
        "INTERVAL 365 DAYS"
    )
    return matched.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(fresh, F.col("m_orderkey")).alias("prev_orderkey"),
        F.when(fresh, F.col("m_date")).alias("prev_date"),
        (F.col("m_date").isNotNull() & ~fresh).alias("dropped_stale"),
    )


@register(
    "join_fuzzy_blocked",
    category="joins",
    oracle="""
WITH names AS (
  SELECT p_name AS name, MIN(p_partkey) AS name_id
  FROM part GROUP BY p_name
),
dirty AS (
  SELECT name_id + 500000 AS dirty_id,
         substr(name, 1, 5) || substr(name, 7) AS dirty_name
  FROM names WHERE name_id % 3 = 0
),
cand AS (
  SELECT n.name_id, d.dirty_id, n.name, d.dirty_name,
         levenshtein(n.name, d.dirty_name) AS dist
  FROM names n JOIN dirty d
    ON substr(n.name, 1, 4) = substr(d.dirty_name, 1, 4)
)
SELECT name_id, dirty_id, name, dirty_name, CAST(dist AS INT) AS dist
FROM cand WHERE dist <= 2
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (edit-distance join) with BLOCKING — the
    record-linkage primitive behind dedupe/merge of dirty catalogs: a
    'dirty' side is manufactured by dropping one character from every
    third distinct part name, then matched back with levenshtein <= 2,
    but ONLY within blocks sharing a 4-char name prefix. The block join
    is an ordinary equi-join, so the quadratic edit-distance work is
    confined to per-block candidate sets (work ~ sum of block_left x
    block_right, never |L| x |R|) — the same sum-of-buckets-squared
    budget every LSH operator here runs on; at 100 TB the block key
    graduates to q-gram or phonetic buckets, the plan shape is
    unchanged. Both engines implement unit-cost Levenshtein, so
    distances hash-match exactly."""
    p = table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.min("p_partkey").alias("name_id")
    )
    dirty = names.filter(F.col("name_id") % 3 == 0).select(
        (F.col("name_id") + 500000).alias("dirty_id"),
        F.concat(
            F.substring("name", 1, 5), F.expr("substr(name, 7)")
        ).alias("dirty_name"),
    )
    cand = names.join(
        dirty,
        F.substring("name", 1, 4) == F.substring("dirty_name", 1, 4),
    ).select(
        "name_id",
        "dirty_id",
        "name",
        "dirty_name",
        F.levenshtein("name", "dirty_name").alias("dist"),
    )
    return cand.filter(F.col("dist") <= 2)


# --- user-space Bloom filter membership -----------------------------------

_BLOOM_M = 8192  # bit positions
_BLOOM_K = 3  # hash functions


def _bloom_sql_pos(i: int, expr: str) -> str:
    return (
        f"('0x' || substr(md5(concat('{i}:', CAST({expr} AS VARCHAR))), 1, 15))"
        f"::BIGINT % {_BLOOM_M}"
    )


@register(
    "join_bloom_membership",
    category="joins",
    oracle=f"""
WITH build AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT pos FROM build, LATERAL (
    VALUES ({_bloom_sql_pos(0, "c_custkey")}),
           ({_bloom_sql_pos(1, "c_custkey")}),
           ({_bloom_sql_pos(2, "c_custkey")})
  ) AS h(pos)
),
probe AS (SELECT DISTINCT o_custkey FROM orders),
probe_bits AS (
  SELECT o_custkey, pos FROM probe, LATERAL (
    VALUES ({_bloom_sql_pos(0, "o_custkey")}),
           ({_bloom_sql_pos(1, "o_custkey")}),
           ({_bloom_sql_pos(2, "o_custkey")})
  ) AS h(pos)
),
classified AS (
  SELECT p.o_custkey,
         (COUNT(b.pos) = {_BLOOM_K}) AS bloom_pos,
         MAX(CASE WHEN m.c_custkey IS NOT NULL THEN 1 ELSE 0 END) = 1
           AS is_member
  FROM probe_bits p
  LEFT JOIN bits b ON b.pos = p.pos
  LEFT JOIN build m ON m.c_custkey = p.o_custkey
  GROUP BY p.o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
         AS bloom_positive,
       CAST(SUM(CASE WHEN bloom_pos AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS false_positive,
       CAST(SUM(CASE WHEN is_member AND NOT bloom_pos THEN 1 ELSE 0 END)
            AS BIGINT) AS missed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set
FROM classified
""",
)
def join_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-space Bloom-filter membership pruning — the pattern behind
    join_runtime_bloomfilter, built explicitly so the filter itself is
    portable (e.g. shipped to another system) and its error is measured.

    Build side: BUILDING-segment customer keys hash into k=3
    positions of an m=8192-bit filter with the cross-engine md5
    family (see dedup_minhash_det). The bit set is <= k x |build| rows of
    a single int — broadcast-sized by construction no matter how large
    the probe side grows. Probe: distinct order custkeys re-derive their
    k positions and broadcast-join the bit set; a key is bloom-positive
    iff all k positions hit. The exact membership twin (broadcast semi
    join on the same dim) classifies every probe key so the output
    reports the measured false-positive count next to the filter's fill —
    missed MUST be 0 (no false negatives, asserted by the oracle match).
    At 100 TB the probe side never shuffles: both joins broadcast the
    tiny build artifacts."""
    cust = table(spark, sf_dir, "customer")
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )

    def _pos(i: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), col.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        )

    def _positions(df: DataFrame, key: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.explode(
                F.array(*[_pos(i, F.col(key)) for i in range(_BLOOM_K)])
            ).alias("pos"),
        )

    bits = _positions(build, "c_custkey").select("pos").distinct()
    probe = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    probe_bits = _positions(probe, "o_custkey")
    hit = probe_bits.join(
        F.broadcast(bits), "pos", "left"
    ).groupBy("o_custkey").agg(
        (F.count(bits["pos"]) == _BLOOM_K).alias("bloom_pos")
    )
    classified = hit.join(
        F.broadcast(build),
        hit["o_custkey"] == build["c_custkey"],
        "left",
    ).select(
        "o_custkey",
        "bloom_pos",
        F.col("c_custkey").isNotNull().alias("is_member"),
    )
    n_bits = bits.count()  # O(1) scalar: filter fill, reported as a column
    return classified.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(F.when(F.col("bloom_pos"), 1).otherwise(0))
        .cast("long")
        .alias("bloom_positive"),
        F.sum(F.when(F.col("bloom_pos") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("false_positive"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_pos"), 1).otherwise(0))
        .cast("long")
        .alias("missed"),
        F.lit(n_bits).cast("long").alias("bits_set"),
    )
