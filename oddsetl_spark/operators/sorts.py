"""SURVEY.md §2.F — sorts / limits / top-k.

Global sort = range-partition exchange + per-partition sort. Top-k compiles
to TakeOrderedAndProject (per-partition heap + driver merge) — O(k) memory,
no global sort: THE pattern for top-k at 100 TB. LIMIT/OFFSET on sorted
output needs a unique tiebreaker or the result set isn't well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import dsum, sql_dsum


@register(
    "sort_multikey",
    category="sorts",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       NULLIF(s_name, 'Supplier#3') AS maybe_name
FROM supplier
ORDER BY s_nationkey ASC NULLS LAST, s_acctbal DESC, s_suppkey
""",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort, mixed directions, NULLS placement. The value
    hash is order-insensitive, so correctness rides on the same row SET plus
    the sort executing (exercised for plan shape in test_plans)."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.nullif(F.col("s_name"), F.lit("Supplier#3")).alias("maybe_name"),
    ).orderBy(
        F.asc_nulls_last("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey")
    )


@register(
    "limit_offset",
    category="sorts",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET over a totally-ordered (tie-broken) sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@register(
    "topk_global",
    category="sorts",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by revenue — agg then TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "sort_within_partitions",
    category="sorts",
    oracle="""
SELECT l_suppkey, l_shipdate, l_orderkey FROM lineitem
""",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (no exchange) — the write-optimization pattern:
    repartition by a key then sortWithinPartitions for clustered output files
    (parquet min/max stats become selective).

    sortWithinPartitions is a pure reordering, so the ROW SET equals the
    input projection exactly; the driver's value hash is order-insensitive,
    which makes a plain SELECT the exact oracle. The layout property itself
    (zero adjacent-pair sort violations inside every partition) is asserted
    distributed-side in tests/test_properties.py::test_sort_within_partitions_layout,
    so upgrading to a SQL oracle loses no coverage."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_shipdate")
        .select("l_suppkey", "l_shipdate", "l_orderkey")
    )


def sort_within_partitions_layout_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed layout verification for sort_within_partitions: per
    partition, count rows and adjacent-pair sort violations (must be 0).
    Returns 8 summary rows instead of shipping the whole sorted table to
    the driver. pid/idx are projected BEFORE the window exchange, so both
    are evaluated map-side in the sorted stage (an expression inside the
    window spec could legally be computed post-shuffle). Exercised by
    tests/test_properties.py."""
    sorted_parts = sort_within_partitions(spark, sf_dir)
    w = W.partitionBy("pid").orderBy("idx")
    flagged = sorted_parts.withColumn("pid", F.spark_partition_id()).withColumn(
        "idx", F.monotonically_increasing_id()
    ).withColumn(
        "viol",
        (
            (F.lag("l_suppkey").over(w) > F.col("l_suppkey"))
            | (
                (F.lag("l_suppkey").over(w) == F.col("l_suppkey"))
                & (F.lag("l_shipdate").over(w) > F.col("l_shipdate"))
            )
        ).cast("int"),
    )
    return flagged.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce(F.col("viol"), F.lit(0))).alias("sort_violations"),
    )


@register(
    "sort_total_order_range",
    category="sorts",
    oracle="""
WITH s AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS global_rank
  FROM orders
)
SELECT o_orderkey, o_totalprice, global_rank
FROM s WHERE global_rank % 1000 = 1
""",
)
def sort_total_order_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total order WITHOUT a single-task sort: repartitionByRange
    assigns contiguous key ranges to partitions (RangePartitioning
    exchange), each partition sorts locally, and the global rank =
    partition-local position + the (broadcast) cumulative count of all
    earlier range partitions. Local positions come from
    monotonically_increasing_id() — (partition << 33 | row-position), a
    pure projection on the already-sorted partitions — so the ONLY
    full-table exchange in the plan is the range partitioner itself
    (plan-asserted; a window over spark_partition_id would re-shuffle
    everything a second time). Global ranks are boundary-independent, so
    the result is deterministic wherever the range sampler cuts. This is
    how a 100 TB ORDER BY runs; the anti-pattern it replaces is
    Window.orderBy with no partitionBy (every row through ONE task).
    Emits every 1000th rank as the verification spine; the oracle ranks
    with a plain (single-threaded) window."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranged = o.repartitionByRange(
        8, F.desc("o_totalprice"), F.asc("o_orderkey")
    ).sortWithinPartitions(F.desc("o_totalprice"), F.asc("o_orderkey"))
    mid = F.monotonically_increasing_id()
    local = ranged.select(
        "o_orderkey",
        "o_totalprice",
        F.shiftright(mid, 33).cast("int").alias("pid"),
        (mid.bitwiseAND(F.lit((1 << 33) - 1)) + 1).alias("local_rank"),
    )
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    wcum = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(wcum), F.lit(0)).alias("offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("local_rank") + F.col("offset")).alias("global_rank"),
        )
        .filter((F.col("global_rank") % 1000) == 1)
    )


@register(
    "sort_pareto_skyline",
    category="sorts",
    oracle="""
WITH pts AS (
  SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS size_,
         CAST(MIN(p_partkey) AS BIGINT) AS sample_part
  FROM part
  GROUP BY p_retailprice, p_size
),
flagged AS (
  SELECT price, size_, sample_part,
         CAST(COALESCE(MAX(size_) OVER (ORDER BY price, size_ DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              AS BIGINT) AS best_size_before
  FROM pts
)
SELECT price, size_ AS size, sample_part
FROM flagged
WHERE size_ > best_size_before
""",
)
def sort_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) over parts: minimize retail price,
    maximize size — the multi-criteria shortlist query (no frontier
    point is beaten on both axes at once), the classic database
    operator behind "cheapest sufficient option" product pickers. The
    2-D case collapses to ONE sorted pass: order by (price asc, size
    desc) and keep rows whose size strictly beats the running best —
    no pairwise dominance join. Distinct (price, size) pairs first
    (exact-duplicate points share a frontier slot, represented by
    their min part key) make the frontier and the tie semantics
    deterministic.

    Scale shape: the sort is the range-partitioned total order
    sort_total_order_range already demonstrates; the running max then
    needs only per-range partials merged by the two-pass prefix
    pattern — agg_skyline_pareto (aggregates.py) implements exactly
    that decomposition (range partitions + broadcast prefix max) with
    >=/> dominance ties. Beyond 2-D, skylines need the block-nested or
    divide-and-conquer join — this is the dimension where the
    one-pass trick is the honest special case."""
    from pyspark.sql import Window as W

    p = table(spark, sf_dir, "part")
    pts = p.groupBy(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size_"),
    ).agg(F.min("p_partkey").alias("sample_part"))
    w = W.orderBy(F.asc("price"), F.desc("size_")).rowsBetween(
        W.unboundedPreceding, -1
    )
    flagged = pts.select(
        "price",
        "size_",
        "sample_part",
        F.coalesce(F.max("size_").over(w), F.lit(-1)).alias(
            "best_size_before"
        ),
    )
    return flagged.filter(
        F.col("size_") > F.col("best_size_before")
    ).select("price", F.col("size_").alias("size"), "sample_part")
