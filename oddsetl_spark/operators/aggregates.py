"""SURVEY.md §2.D — aggregation operators.

Reference provenance: the reference repo is a 2-line stub
(/root/reference/README.md:1-2); this inventory is the declared surface of
SURVEY.md §2.D. All plans are plain DataFrame groupBy/agg so Catalyst plans
partial (map-side) + final HashAggregate with an exchange between — the
shape that scales: combiner runs before the shuffle, so shuffled bytes are
O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from ._helpers import (
    davg,
    dsum,
    lng,
    lsum,
    ntile_expr,
    scaled_group_sums,
    sql_davg,
    sql_dsum,
    sql_lavg,
    sql_lsum,
    with_global_rank,
)


@register(
    "agg_groupby_multi",
    category="agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_lsum('l_quantity')} AS sum_qty,
       {sql_lsum('l_extendedprice')} AS sum_base_price,
       {sql_lsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_lavg('l_quantity')} AS avg_qty,
       {sql_lavg('l_extendedprice')} AS avg_price,
       {sql_lavg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship. Scan -> pushed filter -> 2-key hash agg.

    Exact sums use the scaled-long two-phase path (_helpers.py): per-row
    floor(x*1e6+0.5) longs summed map-side per partition (primitive
    codegen adds, ~3x faster than decimal buffers), partials merged as
    decimal — bit-identical to the DuckDB oracle, overflow-safe at 100 TB.

    Scale: phase 1 collapses 100 TB of lineitem to |groups| x |partitions|
    partial rows before the only real shuffle; phase 2 is noise.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return scaled_group_sums(
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        ),
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": charge,
        },
        avgs={
            "avg_qty": F.col("l_quantity"),
            "avg_price": F.col("l_extendedprice"),
            "avg_disc": F.col("l_discount"),
        },
        count_alias="count_order",
    )


@register(
    "agg_global",
    category="agg",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_davg('l_extendedprice')} AS avg_price,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-group aggregate — partial agg per partition, single final reduce."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "agg_count_distinct",
    category="agg",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — Spark expands to a two-phase agg (distinct then count),
    shuffling (event_type, user_id) pairs; scales as long as per-key distinct
    cardinality fits a partition (it does: user ids)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def agg_approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: HLL++ approx distinct alone, no exact twin.
    Engine-specific estimates — exercised directly by pytest."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register(
    "agg_approx_distinct",
    category="agg",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path (no distinct expansion,
    mergeable sketches). HLL register values are engine-specific, so the
    ESTIMATE can never hash-match an oracle; what CAN is the error bound
    itself: emit the exact distinct count alongside a flag asserting the
    estimate lands within max(5%, 2) of it (rsd=0.02 -> 5% ~ 2.5 sigma;
    HLL merge is register-wise max, order-insensitive, so the estimate is
    deterministic per dataset and the flag cannot flap). The exact twin
    column exists solely to make the driver check self-verifying — the
    production shape is agg_approx_distinct_raw (no exact scan)."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("n_users"),
    )
    tol = F.greatest(F.col("n_users") * 0.05, F.lit(2.0))
    return agg.select(
        "event_type",
        "n_users",
        (F.abs(F.col("approx_users") - F.col("n_users")) <= tol).alias(
            "approx_within_5pct"
        ),
    )


@register(
    "agg_filtered",
    category="agg",
    oracle=f"""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value
FROM events
GROUP BY user_id
""",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot shape)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("purchase_value"),
    )


@register(
    "agg_rollup",
    category="agg",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_lsum('o_totalprice')} AS total_price,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id (Spark's bit order matches
    GROUPING(a)*2+GROUPING(b)). Totals ride the scaled-long grid: the
    grand-total decimal sum crossed 2^53 at the ~sf3 probe, where the
    decimal->double cast double-rounds differently across engines."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        lsum(F.col("o_totalprice")).alias("total_price"),
        F.grouping_id().alias("gid"),
    )


@register(
    "agg_cube",
    category="agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       {sql_lsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "lineitem")
    # scaled-long totals: the cube's grand row crosses 2^53 by ~sf6
    return o.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        lsum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "agg_grouping_sets",
    category="agg",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_lsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (DataFrame API has no direct form)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS BIGINT))
                    AS DOUBLE)/1000000 AS total_price
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_stats",
    category="agg",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
       ROUND(var_samp(l_quantity), 6) AS var_qty,
       ROUND(stddev_pop(l_quantity), 6) AS sdp_qty,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-family statistics. Both engines use numerically-stable
    single-pass algorithms whose results differ only in trailing ulps;
    rounding to 6 (values O(10)) / 4 (values O(1e4)) absorbs that.
    Skew/kurtosis are separate (agg_skew_kurtosis) — definitions differ."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qty_price"),
    )


@register(
    "agg_skew_kurtosis",
    category="agg",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,0))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(30,0))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(30,0))) AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
             / POW(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skew_qty,
       ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n) - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / POW(s2/n - (s1/n)*(s1/n), 2) - 3, 6) AS kurt_qty
FROM m
""",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness / excess kurtosis (Spark's definitions). DuckDB's
    built-ins apply sample-bias correction, so the oracle recomputes Spark's
    population formulas from exact decimal raw moments (l_quantity is
    integer-valued => moments are exact integers on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


@register(
    "agg_percentiles",
    category="agg",
    oracle="""
SELECT l_returnflag,
       ROUND(median(l_quantity), 6) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
       ROUND(quantile_cont(l_quantity, 0.90), 6) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + continuous percentiles (linear interpolation on both
    engines). See agg_approx_percentile for the sketch-based scale path."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("p25_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.90)), 6).alias("p90_qty"),
    )


def agg_approx_percentile_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: GK-sketch percentiles alone, one pass, no
    exact twin. Sketch cutpoints are engine- and merge-order-specific —
    exercised directly by pytest."""
    li = table(spark, sf_dir, "lineitem")
    ap = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    return li.groupBy("l_returnflag").agg(
        F.element_at(ap, 1).alias("approx_p50"),
        F.element_at(ap, 2).alias("approx_p95"),
    )


@register(
    "agg_approx_percentile",
    category="agg",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch, accuracy=10000) — mergeable,
    bounded-memory: the percentile path at 100 TB. The returned cutpoints
    are sketch-state-specific (GK merge is even merge-ORDER-dependent, so
    the raw values could legitimately vary between two correct runs); the
    thing that is guaranteed — and therefore the thing the oracle checks —
    is the RANK bound: a value returned for quantile p has rank within
    eps*n = n/10000 of p*n. The flags assert it with a 10x slack margin
    (0.001), so any valid sketch passes and an implementation bug fails.
    Rank of the returned cutpoint is computed distributed: one broadcast
    join of the 3 per-group cutpoint rows back onto lineitem, then a
    conditional count — no sort, no window."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    cuts = agg_approx_percentile_raw(spark, sf_dir)
    joined = li.join(F.broadcast(cuts), "l_returnflag")
    agg = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_extendedprice") < F.col("approx_p50")).cast("long")).alias("lt50"),
        F.sum((F.col("l_extendedprice") <= F.col("approx_p50")).cast("long")).alias("le50"),
        F.sum((F.col("l_extendedprice") < F.col("approx_p95")).cast("long")).alias("lt95"),
        F.sum((F.col("l_extendedprice") <= F.col("approx_p95")).cast("long")).alias("le95"),
    )
    slack = F.col("n") * 0.001 + 1

    def rank_ok(lt, le, p):
        # the cutpoint's rank interval [lt+1, le] must intersect
        # [p*n - slack, p*n + slack]
        return (F.col(lt) + 1 <= F.col("n") * p + slack) & (
            F.col(le) >= F.col("n") * p - slack
        )

    return agg.select(
        "l_returnflag",
        "n",
        rank_ok("lt50", "le50", 0.5).alias("p50_rank_ok"),
        rank_ok("lt95", "le95", 0.95).alias("p95_rank_ok"),
    )


@register(
    "agg_minby_maxby_firstlast",
    category="agg",
    oracle="""
SELECT event_type,
       arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS max_value_event,
       arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS min_value_event,
       arg_min(user_id, event_id) AS first_user,
       arg_max(user_id, event_id) AS last_user
FROM events
GROUP BY event_type
""",
)
def agg_minby_maxby_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax + deterministic first/last. Ordering keys are made
    unique (value has 2 decimals -> value*100 integer, composed with
    event_id) because min_by/max_by tie-breaking is engine-arbitrary;
    first/last are expressed as arg_min/arg_max over event_id, the
    deterministic equivalent of first/last in arrival order."""
    e = table(spark, sf_dir, "events")
    vkey = (
        F.round(F.col("value") * 100).cast("bigint") * F.lit(10000000)
        + F.col("event_id")
    )
    return e.groupBy("event_type").agg(
        F.max_by("event_id", vkey).alias("max_value_event"),
        F.min_by("event_id", vkey).alias("min_value_event"),
        F.min_by("user_id", F.col("event_id")).alias("first_user"),
        F.max_by("user_id", F.col("event_id")).alias("last_user"),
    )


@register(
    "agg_collect",
    category="agg",
    oracle="""
WITH d AS (SELECT DISTINCT user_id, event_type FROM events WHERE user_id < 20)
SELECT user_id, array_to_string(list(event_type ORDER BY event_type), '|') AS types
FROM d GROUP BY user_id
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array agg — collect_set + sort_array for deterministic contents,
    serialized via array_join (driver canonicalizer cannot sort list
    cells)."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias(
                "types"
            )
        )
    )


@register(
    "agg_pivot",
    category="agg",
    oracle=f"""
SELECT n.n_name,
       {sql_lsum("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END")} AS F,
       {sql_lsum("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END")} AS O,
       {sql_lsum("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE 0 END")} AS P
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot wide by order status; explicit value list avoids the extra
    distinct-values job (mandatory at scale)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(lsum(F.col("o_totalprice")))  # scaled-long: 2^53-safe totals
        .na.fill(0.0)
    )


@register(
    "agg_histogram",
    category="agg",
    oracle="""
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 400000.0 THEN 21
            ELSE CAST(FLOOR(o_totalprice * 20 / 400000.0) AS BIGINT) + 1 END
         AS bucket,
       COUNT(*) AS n,
       round(MIN(o_totalprice), 2) AS lo,
       round(MAX(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — the single-pass
    distribution profile (20 equal buckets over the price range, overflow
    bucket 21). One partial-aggregated shuffle of at most 22 groups
    regardless of input size."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(400000.0), F.lit(20)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def agg_sketch_rollup_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: per-day HLL/Theta partials rolled up with
    union aggs, no exact twin — exercised directly by pytest."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("hll"),
        F.theta_sketch_agg("user_id").alias("theta"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias(
                "hll_users"
            ),
            F.theta_sketch_estimate(F.theta_union_agg(F.col("theta"))).alias(
                "theta_users"
            ),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .select("event_type", "hll_users", "theta_users", "n_partials")
    )


@register(
    "agg_sketch_rollup",
    category="agg",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_partials,
       COUNT(DISTINCT user_id) AS n_users,
       TRUE AS hll_ok, TRUE AS theta_ok
FROM events GROUP BY event_type
""",
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL + Theta, built into
    Spark 4): build ONE sketch per (event_type, day) partial, then roll the
    partials up to per-event_type distinct-user estimates with
    hll_union_agg / theta_union_agg — never touching the raw rows again.

    This is THE 100 TB distinct-count architecture: daily partials are
    computed incrementally as data lands (one pass each), and any rollup
    window (7d, 30d, all-time) is a cheap merge of kilobyte sketches
    instead of a full re-scan. Sketch binaries are engine-specific, so the
    driver check verifies what IS invariant: the number of merged partials
    (exact: distinct days per type), the exact distinct count, and flags
    asserting each estimate within max(5%, 3) of exact (HLL lgK=12 rsd
    ~1.6%; Theta default k=4096 is EXACT below 4096 uniques — both
    order-insensitive, hence deterministic per dataset). Merge
    associativity (rollup == direct sketch) is pytest-asserted on the raw
    variant."""
    e = table(spark, sf_dir, "events")
    est = agg_sketch_rollup_raw(spark, sf_dir)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    tol = F.greatest(F.col("n_users") * 0.05, F.lit(3.0))
    return est.join(exact, "event_type").select(
        "event_type",
        "n_partials",
        "n_users",
        (F.abs(F.col("hll_users") - F.col("n_users")) <= tol).alias("hll_ok"),
        (F.abs(F.col("theta_users") - F.col("n_users")) <= tol).alias(
            "theta_ok"
        ),
    )


@register(
    "agg_string_agg",
    category="agg",
    oracle="""
SELECT o_orderstatus,
       string_agg(o_orderpriority, '|' ORDER BY o_orderpriority, o_orderkey)
         AS priorities,
       COUNT(*) AS n
FROM orders
WHERE o_orderkey < 300
GROUP BY o_orderstatus
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg): concatenate group
    members under an explicit deterministic order — the report-feed
    primitive. Spark 4's listagg carries WITHIN GROUP ordering; the
    explicit (value, key) order makes both engines emit the identical
    string (an unordered listagg is execution-order-dependent and could
    never hash-match)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "listagg(o_orderpriority, '|') "
            "WITHIN GROUP (ORDER BY o_orderpriority, o_orderkey)"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_boolean",
    category="agg",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_quantity > 45) AS any_large,
       COUNT(*) FILTER (WHERE l_discount = 0) AS n_zero_discount
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any a.k.a. bool_and/bool_or) + filtered
    count — data-quality assertion rollups as single-pass aggregations."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_quantity") > 45).alias("any_large"),
        F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_discount"),
    )


@register(
    "agg_grouping_id",
    category="agg",
    oracle="""
SELECT COALESCE(l_returnflag, '(all)') AS rf,
       COALESCE(l_linestatus, '(all)') AS ls,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id() disambiguate real NULL keys from rollup
    subtotal rows — without them a rollup over nullable keys is
    ambiguous. gid doubles as the aggregation-level selector when a
    downstream consumer wants only one stratum of the rollup."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("ls"),
            "gid",
            "n",
        )
    )


@register(
    "agg_time_rollup",
    category="agg",
    oracle="""
SELECT COALESCE(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE), DATE '1970-01-01') AS week,
       COALESCE(CAST(date_trunc('day',  CAST(ts AS TIMESTAMP)) AS DATE), DATE '1970-01-01') AS day,
       COALESCE(date_trunc('hour', CAST(ts AS TIMESTAMP)), TIMESTAMP '1970-01-01') AS hour,
       GROUPING(date_trunc('week', CAST(ts AS TIMESTAMP))) * 4
         + GROUPING(date_trunc('day', CAST(ts AS TIMESTAMP))) * 2
         + GROUPING(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS gid,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         /1000000 AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('week', CAST(ts AS TIMESTAMP)),
                 date_trunc('day',  CAST(ts AS TIMESTAMP)),
                 date_trunc('hour', CAST(ts AS TIMESTAMP)))
""",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: hour, day, week and
    grand-total aggregates of the event stream in ONE pass via ROLLUP on
    the truncation hierarchy (hour ⊂ day ⊂ week). One shuffle; Spark
    expands the rollup map-side, so partial aggregation still applies —
    at 100 TB this replaces three separate scans with one. grouping_id
    labels the stratum; sentinel epoch values stand in for the NULLs of
    super-aggregate rows (both engines agree on the coalesce). sum_value
    uses the scaled-long grid (lsum): the earlier DECIMAL(30,12) sum's
    grand-total row crossed 2^53 at the 10x (~sf1) probe, where the
    decimal->double cast double-rounds differently across engines;
    BIGINT->DOUBLE then /1e6 is the same two correctly-rounded ops on
    both sides at any magnitude (long headroom to ~9e12 total value)."""
    e = table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    epoch_d = F.lit("1970-01-01").cast("date")
    epoch_t = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return (
        e.rollup(week.alias("w"), day.alias("d"), hour.alias("h"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            lsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("w").cast("date"), epoch_d).alias("week"),
            F.coalesce(F.col("d").cast("date"), epoch_d).alias("day"),
            F.coalesce(F.col("h"), epoch_t).alias("hour"),
            "gid",
            "n_events",
            "sum_value",
        )
    )


@register(
    "agg_mode_argmax",
    category="agg",
    oracle="""
WITH counts AS (
  SELECT c.c_nationkey, c.c_mktsegment, COUNT(*) AS n
  FROM customer c GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment AS modal_segment, n
FROM counts
QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                           ORDER BY n DESC, c_mktsegment) = 1
""",
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value per group): count, then
    argmax with an explicit lexicographic tiebreak. Spark's mode() picks
    an ARBITRARY value on ties, so this two-step count+rank is the form
    that hash-matches across engines and re-runs — the difference matters
    exactly when it is invisible (tied groups). Two shuffles, both on
    grouped keys with map-side partials; the rank window partitions on
    the outer group so parallelism survives any group-count scale."""
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("modal_segment"), "n")
    )


@register(
    "agg_weighted_avg",
    category="agg",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR((l_extendedprice * l_quantity)*1000000 + 0.5)
                     AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(FLOOR(l_quantity*1000000 + 0.5) AS BIGINT))
                AS DOUBLE) AS wavg_price,
       {sql_dsum('l_quantity')} AS total_weight,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (quantity-weighted price) from two exact sums —
    the mergeable-partials formulation: sum(w*x)/sum(w) composes across
    partitions and batches (unlike a naive avg of per-row ratios), which
    is what makes it incremental-maintenance-safe at 100 TB.

    The ratio divides the RAW scaled-long sums (the scales cancel):
    BIGINT -> DOUBLE is one correctly-rounded cast that both engines
    perform identically at ANY magnitude, whereas casting a DECIMAL sum
    above 2^53 to double diverges by an ulp across engines (DuckDB's
    int128 path double-rounds) — measured at the 10x (~sf1) probe on the
    6e11-cent numerator. total_weight stays the decimal dsum (its
    magnitude is < 2^53 through ~sf100). One shuffle, map-side partials,
    final division in scalar double."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(lng(F.col("l_extendedprice") * F.col("l_quantity"))).cast(
                "double"
            )
            / F.sum(lng(F.col("l_quantity"))).cast("double")
        ).alias("wavg_price"),
        dsum(F.col("l_quantity")).alias("total_weight"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_regression",
    category="agg",
    oracle="""
SELECT l_returnflag,
       regr_count(l_extendedprice, l_quantity) AS n,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
       ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS via the SQL-standard regr_* aggregates (price ~
    quantity): slope, intercept, R², means — single-pass mergeable
    moment sums, so one shuffle with map-side partials and incremental-
    merge-safe partials at any scale. Both engines run the same stable
    single-pass covariance updates; rounding absorbs trailing-ulp
    divergence (precision per column scaled to its magnitude)."""
    li = table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@register(
    "agg_bitmap_distinct",
    category="agg",
    oracle="""
SELECT c_mktsegment,
       bit_count(bit_or(1::BIGINT << c_nationkey)) AS n_nations_bitmap,
       COUNT(DISTINCT c_nationkey) AS n_nations_exact
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count of a SMALL-domain key via a single-long
    bitmap: bit_count(bit_or(1 << key)). Unlike count(distinct) — whose
    distributed form needs a second shuffle or an expand — the bitmap is
    a plain mergeable aggregate: map-side partial OR, one shuffle, and
    the partials are 8 bytes regardless of group size. This is the
    segment-tree/rollup-friendly distinct the incremental-maintenance
    path wants (OR is idempotent and associative); domain must fit the
    word (nationkey < 64). The exact count(distinct) column proves
    equality."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bit_count(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), c_nationkey)"))
        ).alias("n_nations_bitmap"),
        F.countDistinct("c_nationkey").alias("n_nations_exact"),
    )


@register(
    "agg_entropy",
    category="agg",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type
), u AS (
  SELECT user_id,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list(cnt ORDER BY cnt) AS cl
  FROM c GROUP BY user_id
)
SELECT user_id, total, n_types,
       ROUND(-list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
           list_transform(cl, x -> (CAST(x AS DOUBLE) / total)
                                   * ln(CAST(x AS DOUBLE) / total))),
         (a, b) -> a + b), 9) AS entropy
FROM u
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    mixture-diversity metric a curation pipeline reports per domain /
    source shard. Two mergeable aggregations (count per (user, type),
    then per-user); the float part is a fold over the SORTED count list
    via the higher-order aggregate(), so double summation order is fixed
    and engine-independent — a plain SUM of p*ln(p) would be partial-
    aggregation-order dependent. ln() may differ by an ulp between
    libms, absorbed by 9-dp rounding; counts and totals stay exact
    integers."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    per_user = counts.groupBy("user_id").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_types"),
        F.sort_array(F.collect_list("cnt")).alias("cl"),
    )
    total = F.col("total").cast("double")
    ent = -F.aggregate(
        F.col("cl"),
        F.lit(0.0),
        lambda acc, x: acc + (x.cast("double") / total) * F.log(x.cast("double") / total),
    )
    return per_user.select(
        "user_id", "total", "n_types", F.round(ent, 9).alias("entropy")
    )


@register(
    "agg_pearson_corr",
    category="agg",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))
                * CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))
                * CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))
                * CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_qty_price
FROM s
""",
)
def agg_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation WITHOUT the engine's corr() — corr()
    accumulates co-moments in doubles whose partial-merge order differs
    across engines and cluster layouts. Here the five co-moment sums are
    exact decimals (mergeable, order-insensitive) and the coefficient is
    a scalar double chain — deterministic on any partitioning, which is
    what an incremental/cluster-reordered 100 TB aggregation needs. One
    shuffle, map-side partials. Co-moment scale is 6: the inputs carry at
    most cents, and scale 12 made the squared-term sums overflow DuckDB's
    HUGEINT accumulator at sf0.1 (38-digit cap; scale 6 leaves ~10 digits
    of row-count headroom — enough for 10^10 rows per group)."""
    li = table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(30,6)")
    dy = F.col("l_extendedprice").cast("decimal(30,6)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return s.select(
        "l_returnflag", "n", F.round(corr, 9).alias("corr_qty_price")
    )


@register(
    "agg_percentile_disc",
    category="agg",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5)  AS p50,
       quantile_disc(l_extendedprice, 0.9)  AS p90,
       quantile_disc(l_extendedprice, 0.99) AS p99,
       MIN(l_extendedprice) AS p_min,
       MAX(l_extendedprice) AS p_max
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (smallest value whose cumulative distribution
    reaches p — always an actual data value, never an interpolation), the
    SQL-standard WITHIN GROUP form added in Spark 3.4. Discrete selection
    sidesteps interpolation-arithmetic drift entirely, so results are
    exact with no rounding. Exact percentiles sort per group (bounded by
    group size); the declared scale path for a 100 TB stream stays
    approx_percentile's mergeable sketch (agg_approx_percentile /
    curate_quality_buckets_approx)."""
    li = table(spark, sf_dir, "lineitem")

    def pd_(p: float):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_extendedprice)"
        )

    return li.groupBy("l_returnflag").agg(
        pd_(0.5).alias("p50"),
        pd_(0.9).alias("p90"),
        pd_(0.99).alias("p99"),
        F.min("l_extendedprice").alias("p_min"),
        F.max("l_extendedprice").alias("p_max"),
    )


@register(
    "agg_bitmap_bucket_distinct",
    category="agg",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY o_orderstatus
""",
)
def agg_bitmap_bucket_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct over an UNBOUNDED key domain via Spark 3.5's
    bucketed bitmaps: keys hash to (bucket, bit-position), per-bucket
    bitmaps build with a mergeable bitmap_construct_agg (map-side OR
    partials, fixed 4KB state per bucket), and distinct = sum of
    bitmap_count over buckets. Generalizes agg_bitmap_distinct's
    single-long trick (domain < 64) to any domain — the exact-distinct
    formulation that survives incremental 100 TB rollups, because bucket
    bitmaps OR associatively where COUNT(DISTINCT) partials cannot
    merge. Verified against plain COUNT(DISTINCT)."""
    o = table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderstatus", F.expr("bitmap_bucket_number(o_custkey)").alias("bucket")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_custs")
    )


@register(
    "obs_metrics_audit",
    category="agg",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("l_quantity")} AS sum_qty,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
""",
)
def obs_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe(): named metrics (row count,
    exact-decimal quantity sum, returned-row count) are accumulated ON the
    executors DURING the pass — the production pattern for ETL audit
    counters (row-count reconciliation, dq thresholds) without a second
    scan of the input. The observed values are then surfaced as a 1-row
    DataFrame so the audit itself is hash-checked against an SQL twin.

    Scale: observe() piggybacks on whatever action runs anyway — its
    metrics are AccumulatorV2-style partial aggregates merged at the
    driver, adding zero shuffles and zero extra scans (the count() here IS
    the pipeline's action). The 1-row createDataFrame is a scalar driver
    product, same class as a count."""
    from pyspark.sql import Observation
    from pyspark.sql import types as T

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")
    )
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
    )
    observed.count()  # the pipeline's action; metrics ride along
    m = obs.get
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_qty", T.DoubleType()),
            T.StructField("n_returned", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["n_returned"])], schema
    )


def _ols2_oracle() -> str:
    det = (
        "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2))"
    )
    det0 = (
        "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y))"
    )
    det1 = (
        "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2))"
    )
    det2 = (
        "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2))"
    )
    return f"""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))
                * CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s11,
         CAST(SUM(CAST(l_discount AS DECIMAL(30,6))
                * CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))
                * CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))
                * CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(l_discount AS DECIMAL(30,6))
                * CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS s2y
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND({det0} / {det}, 6) AS intercept,
       ROUND({det1} / {det}, 6) AS beta_qty,
       ROUND({det2} / {det}, 6) AS beta_discount
FROM s
""".replace("{det}", det)


@register(
    "agg_multivar_regression",
    category="agg",
    oracle=_ols2_oracle(),
)
def agg_multivar_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price ~ quantity + discount) fit in CLOSED FORM
    from mergeable sufficient statistics — the distributed-ML pattern
    that generalizes: nine exact-decimal moment sums (one shuffle,
    map-side partials, incremental-merge safe) feed Cramer's rule on the
    3x3 normal equations as a scalar double chain. No iteration, no
    driver-side solver, no MLlib — at 100 TB the fit costs exactly one
    aggregation pass, and partial sums from yesterday's data merge with
    today's delta for free. Co-moment scale 6 per the agg_pearson_corr
    overflow analysis. Identical expression trees on both engines =>
    identical IEEE doubles; ROUND(6) guards the division chain's last
    ulp."""
    li = table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(30,6)")  # noqa: E731
    x1, x2, y = d("l_quantity"), d("l_discount"), d("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        F.sum(x2 * x2).cast("double").alias("s22"),
        F.sum(x1 * x2).cast("double").alias("s12"),
        F.sum(x1 * y).cast("double").alias("s1y"),
        F.sum(x2 * y).cast("double").alias("s2y"),
    )
    n = F.col("n")
    s1, s2, sy = F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(det0 / det, 6).alias("intercept"),
        F.round(det1 / det, 6).alias("beta_qty"),
        F.round(det2 / det, 6).alias("beta_discount"),
    )


@register(
    "agg_histogram_equidepth",
    category="agg",
    oracle="""
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM (
  SELECT l_extendedprice,
         NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bucket
  FROM lineitem
)
GROUP BY bucket
""",
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of extendedprice: 10 buckets of
    equal row count with their [lo, hi] value bounds — the histogram
    shape a cost-based optimizer keeps for selectivity estimation
    (agg_histogram's width_bucket twin covers the equi-WIDTH shape; skew
    makes equi-width useless on heavy-tailed money columns, which is why
    CBO stats use equi-depth). The bucketing is determinized with the
    full unique key so equal prices split identically on both engines.

    Exact NTILE without the single-task global window: global rank comes
    from the range-partition + broadcast-offsets decomposition
    (sort_total_order_range's pattern — repartitionByRange assigns
    contiguous key ranges, each partition sorts locally,
    monotonically_increasing_id yields the local position, and the rank
    offset is the broadcast cumulative count of earlier ranges). The
    bucket is then pure arithmetic on (rank, n): NTILE(k) gives the
    first n%k buckets ceil(n/k) rows and the rest floor(n/k). The ONLY
    full-data exchange in the plan is the range partitioner — the window
    that remains runs over the ~32-row per-partition counts, not the
    data (plan-asserted in test_plans). At 100 TB the approximate twin
    is approx_percentile's mergeable sketch at the 10 cut points."""
    li = table(spark, sf_dir, "lineitem")
    keys = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    ranked = with_global_rank(li.select(*keys), keys, ["l_extendedprice"])
    return (
        ranked.select("l_extendedprice", ntile_expr(10).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


@register(
    "agg_benford_first_digit",
    category="agg",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders
),
counted AS (
  SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit
),
tot AS (SELECT SUM(n_obs) AS n FROM counted)
SELECT c.digit,
       CAST(c.n_obs AS BIGINT) AS n_obs,
       round(log10(1.0 + 1.0 / c.digit), 9) AS benford_p,
       round(c.n_obs * 1.0 / t.n - log10(1.0 + 1.0 / c.digit), 9)
         AS deviation
FROM counted c, tot t
""",
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed share per
    leading digit vs Benford's log10(1 + 1/d) expectation — the
    fabricated-amounts screen financial DQ pipelines run (organic
    multiplicative amounts follow Benford; invented ones don't). First
    digit comes from floor -> BIGINT -> string, never log10-of-value
    (log10(1000) can land a hair under 3 and misbin an entire decade);
    the expectation/deviation chain is scalar IEEE rounded to 9. One
    narrow pass + a 9-row aggregate, with the total via a tiny
    cross-joined scalar."""
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    counted = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = counted.agg(F.sum("n_obs").alias("n"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9)
    return counted.crossJoin(tot).select(
        "digit",
        "n_obs",
        benford.alias("benford_p"),
        F.round(
            F.col("n_obs") * 1.0 / F.col("n")
            - F.log10(1.0 + 1.0 / F.col("digit")),
            9,
        ).alias("deviation"),
    )


@register(
    "agg_weighted_median",
    category="agg",
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(30,6)))
           OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cum_w,
         SUM(CAST(l_quantity AS DECIMAL(30,6)))
           OVER (PARTITION BY l_returnflag) AS tot_w
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median,
       CAST(MIN(tot_w) AS DOUBLE) AS total_weight
FROM w
WHERE cum_w * 2 >= tot_w
GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per flag: the smallest value whose
    cumulative weight reaches half the total — the robust center under
    sample weights (plain median treats a 50-unit line like a 1-unit
    line). Weights accumulate in exact DECIMAL over a fully-tiebroken
    ordering, and the `cum*2 >= tot` comparison is integer-exact in
    decimal — no floating threshold to straddle. One partitioned sort +
    one rollup; the 100 TB approximate twin is a weighted
    approx_percentile (replicate-by-rounded-weight into the sketch)."""
    li = table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    qty = F.col("l_quantity").cast("decimal(30,6)")
    w_cum = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w_all = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(qty).over(w_cum).alias("cum_w"),
        F.sum(qty).over(w_all).alias("tot_w"),
    )
    return (
        ranked.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.min("tot_w").cast("double").alias("total_weight"),
        )
    )


@register(
    "agg_abtest_ztest",
    category="agg",
    oracle="""
WITH assign AS (
  SELECT user_id, user_id % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arm AS (
  SELECT variant, COUNT(*) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted,
         SUM(converted) * 1.0 / COUNT(*) AS rate
  FROM assign GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
         MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
         MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
         MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
  FROM arm
)
SELECT a.variant, CAST(a.n_users AS BIGINT) AS n_users, a.n_converted,
       round(a.rate, 9) AS rate,
       round((w.c1 * 1.0 / w.n1 - w.c0 * 1.0 / w.n0)
             / nullif(sqrt(((w.c0 + w.c1) * 1.0 / (w.n0 + w.n1))
                           * (1.0 - (w.c0 + w.c1) * 1.0 / (w.n0 + w.n1))
                           * (1.0 / w.n0 + 1.0 / w.n1)), 0.0), 6) AS z_stat
FROM arm a, wide w
""",
)
def agg_abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per variant (user_id % 2 as the stand-in
    assignment), users, conversions (any purchase event) and rate, plus
    the pooled two-proportion z-statistic — the whole experimentation
    dashboard row in one query. Every input to the z formula is an exact
    integer count; the statistic is a scalar IEEE chain rounded once at
    the edge, so it hash-matches. Plan: one user_id rollup (conversion is
    MAX over the user's events — mergeable), one 2-row arm aggregate, and
    a 1-row cross join carrying the pooled terms; at 100 TB the cost is
    the single user rollup you already pay for any per-user metric."""
    e = table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    arm = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        (F.sum("converted") * 1.0 / F.count(F.lit(1))).alias("rate"),
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    pooled = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    # nullif guards the degenerate 0%/100% arms (pooled variance 0): the
    # statistic is undefined there, and ANSI mode rightly refuses 0/0
    z = (
        F.col("c1") * 1.0 / F.col("n1") - F.col("c0") * 1.0 / F.col("n0")
    ) / F.nullif(
        F.sqrt(
            pooled * (1.0 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        ),
        F.lit(0.0),
    )
    return arm.crossJoin(wide).select(
        "variant",
        "n_users",
        "n_converted",
        F.round("rate", 9).alias("rate"),
        F.round(z, 6).alias("z_stat"),
    )


@register(
    "agg_chi2_independence",
    category="agg",
    oracle="""
WITH obs AS (
  SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
         COUNT(*) AS n
  FROM events GROUP BY event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1
),
margins AS (
  SELECT o.event_type, o.dow, o.n,
         SUM(o.n) OVER (PARTITION BY o.event_type) AS row_n,
         SUM(o.n) OVER (PARTITION BY o.dow) AS col_n,
         SUM(o.n) OVER () AS tot_n
  FROM obs o
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
       round(row_n * 1.0 * col_n / tot_n, 9) AS expected,
       round(pow(n - row_n * 1.0 * col_n / tot_n, 2)
             / (row_n * 1.0 * col_n / tot_n), 9) AS chi2_term
FROM margins
""",
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for event type vs day-of-week: per
    contingency cell, observed count, expected count under independence
    (row x col / total) and the cell's chi2 contribution — the
    seasonality/independence check behind "is this metric shifted on
    weekends" questions; summing chi2_term gives the test statistic. All
    margins come from windows over the TINY contingency table (|types| x
    7 rows), so the only real work is the one groupBy over the events —
    everything after operates on a broadcast-size result. Expected/chi2
    are IEEE chains over exact integer counts, rounded at the edge.
    DuckDB's dayofweek is 0-based (Sunday=0) vs Spark's 1-based — the
    oracle shifts by one, same as fn_datetime."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    obs = e.groupBy(
        "event_type", F.dayofweek(F.col("ts")).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_n = F.sum("n").over(W.partitionBy("event_type"))
    col_n = F.sum("n").over(W.partitionBy("dow"))
    tot_n = F.sum("n").over(W.partitionBy())
    expected = row_n * 1.0 * col_n / tot_n
    return obs.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        "n",
        F.round(expected, 9).alias("expected"),
        F.round(F.pow(F.col("n") - expected, 2) / expected, 9).alias(
            "chi2_term"
        ),
    )


@register(
    "agg_seasonal_decompose",
    category="agg",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS y_l
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, y_l,
         CAST(SUM(y_l) OVER w AS BIGINT) AS t7,
         COUNT(*) OVER w AS cnt
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT day, y_l, t7, cnt,
         CASE WHEN cnt = 7 THEN 7*y_l - t7 END AS detr7,
         dayofweek(day) + 1 AS dow
  FROM win
),
season AS (
  SELECT dow, CAST(SUM(detr7) AS BIGINT) AS s_l,
         CAST(COUNT(detr7) AS BIGINT) AS n_dow
  FROM detr WHERE detr7 IS NOT NULL GROUP BY dow
),
grid AS (
  SELECT d.day, d.y_l, d.cnt,
         (d.t7 - ((d.t7 % 7) + 7) % 7) / 7 AS trend_l,
         (s.s_l - ((s.s_l % (7*s.n_dow)) + 7*s.n_dow) % (7*s.n_dow))
           / (7*s.n_dow) AS seasonal_l
  FROM detr d LEFT JOIN season s ON s.dow = d.dow
)
SELECT day,
       CAST(y_l AS DOUBLE)/1000000 AS y,
       CASE WHEN cnt = 7 THEN CAST(trend_l AS DOUBLE)/1000000 END AS trend,
       CAST(seasonal_l AS DOUBLE)/1000000 AS seasonal,
       CASE WHEN cnt = 7
            THEN CAST(y_l - trend_l - seasonal_l AS DOUBLE)/1000000
       END AS resid
FROM grid
""",
)
def agg_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition of daily order revenue:
    trend = centered 7-row moving average (NULL where the window is not
    full, i.e. the 3 edge days), seasonal = per-day-of-week mean of the
    detrended series, residual = y - trend - seasonal. The standard
    pre-forecasting / anomaly-baseline readout.

    Exactness: daily revenue is an exact scaled-long sum; the windowed
    trend numerator (t7) and the detrended values (7*y - t7) stay in
    exact LONG arithmetic, and the trend/seasonal divisions are FLOOR
    divisions on the micro-unit grid (portable positive-modulo floor —
    Spark's div truncates while DuckDB's // floors on negatives), so
    every output is an exact 6-decimal dyadic value and no double is
    ever rounded. (round(double) itself diverges between engines:
    Spark rounds the shortest decimal repr, DuckDB the exact binary
    expansion — measured on this very query at 1/7 multiples.)

    Scale shape: the one real pass is the daily groupBy over orders
    (map-side combined). Everything after — the 7-row window, the
    7-group seasonal mean, the dow join — operates on the daily series,
    whose length is bounded by the CALENDAR (~2.5k rows for 7 years),
    not by the data; the single-partition window over it is free, and
    the 7-row seasonal table broadcasts."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(lng(F.col("o_totalprice"))).alias("y_l"))
    w = W.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "y_l",
        F.sum("y_l").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    detr = win.select(
        "day",
        "y_l",
        "t7",
        "cnt",
        F.when(F.col("cnt") == 7, 7 * F.col("y_l") - F.col("t7")).alias(
            "detr7"
        ),
        F.dayofweek("day").alias("dow"),
    )
    season = (
        detr.filter(F.col("detr7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("detr7").alias("s_l"),
            F.count("detr7").alias("n_dow"),
        )
    )
    def floor_div(x, d):
        # portable floor division for signed longs: both engines' native
        # integer ops disagree on negatives (Spark div truncates, DuckDB
        # // floors), so the floor is spelled out via the positive modulo
        return (x - ((x % d) + d) % d) / d

    t_l = floor_div(F.col("t7"), F.lit(7))
    s_den = 7 * F.col("n_dow")
    s_l = floor_div(F.col("s_l"), s_den)
    full = F.col("cnt") == 7
    return detr.join(F.broadcast(season), "dow", "left").select(
        "day",
        (F.col("y_l").cast("double") / 1000000).alias("y"),
        F.when(full, t_l.cast("double") / 1000000).alias("trend"),
        (s_l.cast("double") / 1000000).alias("seasonal"),
        F.when(
            full, (F.col("y_l") - t_l - s_l).cast("double") / 1000000
        ).alias("resid"),
    )


@register(
    "agg_welch_ttest",
    category="agg",
    oracle="""
WITH assign AS (
  SELECT user_id % 2 AS variant, value FROM events
),
arm AS (
  SELECT variant, COUNT(*) AS n,
         CAST(SUM(CAST((value) AS DECIMAL(30,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST((value*value) AS DECIMAL(30,6))) AS DOUBLE) AS s2
  FROM assign GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
         MAX(CASE WHEN variant = 0 THEN s END) AS s0,
         MAX(CASE WHEN variant = 0 THEN s2 END) AS s20,
         MAX(CASE WHEN variant = 1 THEN n END) AS n1,
         MAX(CASE WHEN variant = 1 THEN s END) AS s1,
         MAX(CASE WHEN variant = 1 THEN s2 END) AS s21
  FROM arm
),
terms AS (
  SELECT n0, n1,
         ((s20 - s0*s0/n0)/(n0-1))/n0 AS se0,
         ((s21 - s1*s1/n1)/(n1-1))/n1 AS se1,
         s1/n1 - s0/n0 AS diff
  FROM wide
)
SELECT a.variant, CAST(a.n AS BIGINT) AS n_events,
       round(a.s/a.n, 9) AS mean_value,
       round((a.s2 - a.s*a.s/a.n)/(a.n-1), 6) AS var_value,
       round(t.diff / sqrt(t.se0 + t.se1), 6) AS t_stat,
       round(pow(t.se0 + t.se1, 2)
             / (pow(t.se0, 2)/(t.n0-1) + pow(t.se1, 2)/(t.n1-1)), 3)
         AS welch_df
FROM arm a, terms t
""",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean event value between the
    two experiment arms (user_id % 2): per arm n/mean/sample-variance,
    plus the t-statistic and the Welch-Satterthwaite effective degrees
    of freedom — the continuous-metric companion to agg_abtest_ztest's
    proportion test. Sums and sums-of-squares are exact decimal
    aggregations (order-insensitive), so t and df are scalar IEEE chains
    over identical doubles, written in the same operation order on both
    engines and rounded once at the edge.

    Scale shape: one groupBy over events producing two partial-merged
    rows; the wide pivot and the test arithmetic run on a 2-row/1-row
    frame. The same mergeable (n, sum, sumsq) triple serves any number
    of arms or metrics at 100 TB."""
    e = table(spark, sf_dir, "events")
    assign = e.select(
        (F.col("user_id") % 2).alias("variant"), F.col("value")
    )
    v = F.col("value")
    arm = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(v).alias("s"),
        dsum(v * v).alias("s2"),
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("variant") == 0, F.col("s2"))).alias("s20"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("variant") == 1, F.col("s2"))).alias("s21"),
    )
    se0 = (
        (F.col("s20") - F.col("s0") * F.col("s0") / F.col("n0"))
        / (F.col("n0") - 1)
    ) / F.col("n0")
    se1 = (
        (F.col("s21") - F.col("s1") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
    ) / F.col("n1")
    terms = wide.select(
        "n0",
        "n1",
        se0.alias("se0"),
        se1.alias("se1"),
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias("diff"),
    )
    t_stat = F.col("diff") / F.sqrt(F.col("se0") + F.col("se1"))
    welch_df = F.pow(F.col("se0") + F.col("se1"), 2) / (
        F.pow(F.col("se0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("se1"), 2) / (F.col("n1") - 1)
    )
    return arm.crossJoin(terms).select(
        "variant",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("s") / F.col("n"), 9).alias("mean_value"),
        F.round(
            (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            6,
        ).alias("var_value"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(welch_df, 3).alias("welch_df"),
    )


@register(
    "agg_ks_test",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT user_id % 2 AS variant,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
grid AS (
  SELECT cents,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1
  FROM pts GROUP BY cents
),
cum AS (
  SELECT cents,
         CAST(SUM(g0) OVER w AS BIGINT) AS c0,
         CAST(SUM(g1) OVER w AS BIGINT) AS c1,
         CAST(SUM(g0) OVER () AS BIGINT) AS n0,
         CAST(SUM(g1) OVER () AS BIGINT) AS n1
  FROM grid
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
scored AS (
  SELECT cents, n0, n1, abs(c0*n1 - c1*n0) AS diff_l,
         MAX(abs(c0*n1 - c1*n0)) OVER () AS max_l
  FROM cum
)
SELECT n0, n1,
       round(CAST(max_l AS DOUBLE) / n0 / n1, 9) AS d_stat,
       CAST(MIN(cents) AS DOUBLE) / 100 AS ks_location
FROM scored WHERE diff_l = max_l
GROUP BY n0, n1, max_l
""",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on event value between the
    experiment arms (user_id % 2): D = max |F0(x) - F1(x)| plus the
    location where the empirical CDFs diverge most (minimum such x for
    determinism) — the distribution-level drift test that PSI
    approximates with bins and the t-test reduces to means. The entire
    comparison runs in INTEGER arithmetic: values snap to their exact
    cent grid, CDF gaps compare as |c0*n1 - c1*n0| (cross-multiplied,
    no division), and the single division happens once at the edge.

    Scale shape: one groupBy onto the value grid (map-side combined),
    then windows over the GRID (bounded by the value domain, ~56k cells,
    not by row count) — the same support-not-data cardinality argument
    as the histogram family. The cross-multiplied counts need longs up
    to n0*n1; beyond ~3e9 rows per arm the comparison column upgrades
    to DECIMAL(38,0) with identical semantics."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 2).alias("variant"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    grid = pts.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("g0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("g1"),
    )
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    cum = grid.select(
        "cents",
        F.sum("g0").over(w).alias("c0"),
        F.sum("g1").over(w).alias("c1"),
        F.sum("g0").over(wall).alias("n0"),
        F.sum("g1").over(wall).alias("n1"),
    )
    diff_l = F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))
    scored = cum.select(
        "cents",
        "n0",
        "n1",
        diff_l.alias("diff_l"),
        F.max(diff_l).over(wall).alias("max_l"),
    )
    return (
        scored.filter(F.col("diff_l") == F.col("max_l"))
        .groupBy("n0", "n1", "max_l")
        .agg(
            (F.min("cents").cast("double") / 100).alias("ks_location"),
        )
        .select(
            "n0",
            "n1",
            F.round(
                F.col("max_l").cast("double") / F.col("n0") / F.col("n1"), 9
            ).alias("d_stat"),
            "ks_location",
        )
    )


@register(
    "agg_mann_whitney",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT user_id % 2 AS variant,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
grid AS (
  SELECT cents,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1
  FROM pts GROUP BY cents
),
ranked AS (
  SELECT g0, g1, g0 + g1 AS g,
         CAST(COALESCE(SUM(g0 + g1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_prev
  FROM grid
),
tot AS (
  SELECT CAST(SUM(g0) AS BIGINT) AS n0, CAST(SUM(g1) AS BIGINT) AS n1,
         CAST(SUM(g1*(2*cum_prev + g + 1)) AS BIGINT) AS r1_x2,
         CAST(SUM(g*g*g - g) AS BIGINT) AS tie_term
  FROM ranked
)
SELECT n0, n1,
       (CAST(r1_x2 - n1*(n1+1) AS DOUBLE))/2 AS u_stat,
       round(((CAST(r1_x2 - n1*(n1+1) AS DOUBLE))/2 - n0*n1/2.0)
             / sqrt(n0*n1*((n0+n1+1)
                           - CAST(tie_term AS DOUBLE)/(n0+n1)/(n0+n1-1))
                    /12.0), 6) AS z_stat,
       tie_term
FROM tot
""",
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on event value between the experiment
    arms — the nonparametric companion to agg_welch_ttest (no normality
    assumption), with EXACT tie handling: values snap to the cent grid,
    tied observations take average ranks carried as doubled integers
    (2*rank is always whole), and the tie-corrected normal
    approximation's variance uses the exact sum of (t^3 - t) over tie
    groups. Everything before the final z chain is integer arithmetic.

    Scale shape: one groupBy onto the value grid, a prefix-sum window
    over the bounded grid (support-cardinality, not row count), and a
    single total row — the same shape as agg_ks_test, sharing the grid
    aggregation if both run."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 2).alias("variant"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    grid = pts.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("g0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("g1"),
    )
    wprev = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    g = F.col("g0") + F.col("g1")
    ranked = grid.select(
        "g0",
        "g1",
        g.alias("g"),
        F.coalesce(F.sum(g).over(wprev), F.lit(0)).alias("cum_prev"),
    )
    tot = ranked.agg(
        F.sum("g0").alias("n0"),
        F.sum("g1").alias("n1"),
        F.sum(
            F.col("g1") * (2 * F.col("cum_prev") + F.col("g") + 1)
        ).alias("r1_x2"),
        F.sum(
            F.col("g") * F.col("g") * F.col("g") - F.col("g")
        ).alias("tie_term"),
    )
    u = (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).cast(
        "double"
    ) / 2
    n = F.col("n0") + F.col("n1")
    var = (
        F.col("n0")
        * F.col("n1")
        * ((n + 1) - F.col("tie_term").cast("double") / n / (n - 1))
        / 12.0
    )
    z = (u - F.col("n0") * F.col("n1") / 2.0) / F.sqrt(var)
    return tot.select(
        "n0",
        "n1",
        u.alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
        "tie_term",
    )


@register(
    "agg_auc_roc",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
grid AS (
  SELECT cents,
         CAST(SUM(1 - label) AS BIGINT) AS g0,
         CAST(SUM(label) AS BIGINT) AS g1
  FROM pts GROUP BY cents
),
ranked AS (
  SELECT g0, g1, g0 + g1 AS g,
         CAST(COALESCE(SUM(g0 + g1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_prev
  FROM grid
),
tot AS (
  SELECT CAST(SUM(g0) AS BIGINT) AS n_neg, CAST(SUM(g1) AS BIGINT) AS n_pos,
         CAST(SUM(g1*(2*cum_prev + g + 1)) AS BIGINT) AS r1_x2
  FROM ranked
)
SELECT n_pos, n_neg,
       round((CAST(r1_x2 - n_pos*(n_pos+1) AS DOUBLE))/2/n_pos/n_neg, 9)
         AS auc
FROM tot
""",
)
def agg_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of "event value predicts a purchase": the
    probability a random positive outscores a random negative, computed
    from the rank-sum identity AUC = U/(n_pos*n_neg) with average ranks
    for ties (doubled-integer ranks on the cent grid — the
    agg_mann_whitney machinery re-derived as the model-evaluation
    metric). No threshold sweep, no curve materialization: the rank
    form IS the integral, and it is exact, not trapezoidal.

    Scale shape: one groupBy onto the score grid + a prefix window over
    the grid (support-bounded). This is how AUC on 1e12 scored rows is
    actually computable — histogram the scores, never sort the rows."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    pts = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    grid = pts.groupBy("cents").agg(
        F.sum(1 - F.col("label")).cast("long").alias("g0"),
        F.sum("label").cast("long").alias("g1"),
    )
    wprev = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    g = F.col("g0") + F.col("g1")
    ranked = grid.select(
        "g0",
        "g1",
        g.alias("g"),
        F.coalesce(F.sum(g).over(wprev), F.lit(0)).alias("cum_prev"),
    )
    tot = ranked.agg(
        F.sum("g0").alias("n_neg"),
        F.sum("g1").alias("n_pos"),
        F.sum(
            F.col("g1") * (2 * F.col("cum_prev") + F.col("g") + 1)
        ).alias("r1_x2"),
    )
    auc = (
        (F.col("r1_x2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
            "double"
        )
        / 2
        / F.col("n_pos")
        / F.col("n_neg")
    )
    return tot.select(
        "n_pos", "n_neg", F.round(auc, 9).alias("auc")
    )


@register(
    "agg_confusion_matrix",
    category="agg",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS pred
  FROM events
),
cm AS (
  SELECT CAST(SUM(label*pred) AS BIGINT) AS tp,
         CAST(SUM((1-label)*pred) AS BIGINT) AS fp,
         CAST(SUM(label*(1-pred)) AS BIGINT) AS fn,
         CAST(SUM((1-label)*(1-pred)) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       round(tp*1.0/(tp+fp), 9) AS precision_,
       round(tp*1.0/(tp+fn), 9) AS recall_,
       round(2.0*tp/(2*tp+fp+fn), 9) AS f1,
       round((tp+tn)*1.0/(tp+fp+fn+tn), 9) AS accuracy
FROM cm
""",
)
def agg_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation readout for the thresholded rule
    "value > 50 predicts purchase": full confusion matrix plus
    precision / recall / F1 / accuracy — the companion to agg_auc_roc
    (which evaluates the ranking; this evaluates one operating point).
    The four cells are one pass of exact integer indicator sums
    (map-side combined, mergeable across any partitioning); the derived
    ratios are single divisions over exact integers, rounded once.
    F1 uses the 2tp/(2tp+fp+fn) form — one division, no nested
    precision/recall doubles."""
    e = table(spark, sf_dir, "events")
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    pred = F.when(F.col("value") > 50, 1).otherwise(0)
    cm = e.select(label.alias("label"), pred.alias("pred")).agg(
        F.sum(F.col("label") * F.col("pred")).cast("long").alias("tp"),
        F.sum((1 - F.col("label")) * F.col("pred")).cast("long").alias("fp"),
        F.sum(F.col("label") * (1 - F.col("pred"))).cast("long").alias("fn"),
        F.sum((1 - F.col("label")) * (1 - F.col("pred")))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp * 1.0 / (tp + fp), 9).alias("precision_"),
        F.round(tp * 1.0 / (tp + fn), 9).alias("recall_"),
        F.round(2.0 * tp / (2 * tp + fp + fn), 9).alias("f1"),
        F.round((tp + tn) * 1.0 / (tp + fp + fn + tn), 9).alias("accuracy"),
    )


@register(
    "agg_calibration_bins",
    category="agg",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT CAST(MAX(cents) AS BIGINT) AS max_c FROM scored),
binned AS (
  SELECT CAST(LEAST(FLOOR(cents*10/max_c), 9) AS BIGINT) AS bin,
         label, cents, max_c
  FROM scored, mx
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       round(CAST(SUM(cents) AS DOUBLE)/COUNT(*)/max_c, 9) AS mean_score,
       round(SUM(label)*1.0/COUNT(*), 9) AS empirical_rate
FROM binned GROUP BY bin, max_c
""",
)
def agg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability table for the pseudo-score value/max:
    ten equal-width score bins, each reporting mean predicted score vs
    the empirical positive rate — the reliability-diagram input that
    says WHERE a scorer is over- or under-confident (AUC can be high
    while calibration is garbage; you need both). Bin edges come from
    integer arithmetic on the cent grid (cents*10/max floor-divided,
    clamped to bin 9), the mean score is an exact integer sum divided
    once, and rates are single divisions rounded at the edge.

    Scale shape: the max is a 1-row broadcast aggregate; binning and
    the rollup are one map-combined pass — the mergeable (n, n_pos,
    sum_score) triple per bin recomputes calibration incrementally as
    data lands."""
    e = table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    mx = scored.agg(F.max("cents").alias("max_c"))
    binned = scored.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor(F.col("cents") * 10 / F.col("max_c")).cast("long"),
            F.lit(9),
        ).alias("bin"),
        "label",
        "cents",
        "max_c",
    )
    return binned.groupBy("bin", "max_c").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
        F.round(
            F.sum("cents").cast("double") / F.count(F.lit(1)) / F.col("max_c"),
            9,
        ).alias("mean_score"),
        F.round(F.sum("label") * 1.0 / F.count(F.lit(1)), 9).alias(
            "empirical_rate"
        ),
    ).drop("max_c")


@register(
    "agg_mutual_information",
    category="agg",
    oracle="""
WITH obs AS (
  SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
         COUNT(*) AS n
  FROM events GROUP BY event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1
),
margins AS (
  SELECT event_type, dow, n,
         SUM(n) OVER (PARTITION BY event_type) AS row_n,
         SUM(n) OVER (PARTITION BY dow) AS col_n,
         SUM(n) OVER () AS tot_n
  FROM obs
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
       round(ln(n*1.0*tot_n/row_n/col_n), 9) AS pmi,
       round(n*1.0/tot_n * round(ln(n*1.0*tot_n/row_n/col_n), 9), 12)
         AS mi_term
FROM margins
""",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information per contingency cell (event type x
    day of week) plus each cell's contribution to the mutual
    information I(X;Y) = sum of mi_term — the information-theoretic
    sibling of agg_chi2_independence (chi2 asks IF the variables are
    dependent; MI measures HOW MUCH in nats, and per-cell PMI is the
    collocation/association score used for feature screening). The ln
    argument is a ratio of exact integer counts computed in an
    identical scalar chain; ln is rounded to 9 BEFORE the weighted term
    (the bigram-LM discipline), so both outputs sit on a deterministic
    grid.

    Scale shape: identical to chi2 — one groupBy over events, windows
    over the |types| x 7 contingency table."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek(F.col("ts")).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_n = F.sum("n").over(W.partitionBy("event_type"))
    col_n = F.sum("n").over(W.partitionBy("dow"))
    tot_n = F.sum("n").over(W.partitionBy())
    pmi = F.round(F.log(F.col("n") * 1.0 * tot_n / row_n / col_n), 9)
    return obs.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        "n",
        pmi.alias("pmi"),
        F.round(F.col("n") * 1.0 / tot_n * pmi, 12).alias("mi_term"),
    )


@register(
    "agg_dp_noisy_count",
    category="agg",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events GROUP BY event_type
),
seeded AS (
  SELECT event_type, true_count,
         (CAST(('0x' || substr(md5('dp-v1|' || event_type), 1, 15))
               AS BIGINT) % 1000000 + 0.5) / 1000000.0 AS u
  FROM counts
)
SELECT event_type, true_count,
       round(CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END
             * ln(1 - 2*abs(u - 0.5)) * -1.0, 6) AS noise,
       round(true_count + CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END
             * ln(1 - 2*abs(u - 0.5)) * -1.0, 6) AS noisy_count,
       1.0 AS epsilon
FROM seeded
""",
)
def agg_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts (epsilon=1) with SEEDED Laplace
    noise: the uniform draw comes from md5 of a release-tag + group key
    (inverse-CDF transform, scale b = 1/epsilon = 1), so the exact same
    release is reproducible on any engine, cluster layout or rerun —
    the property an auditable DP release pipeline needs, and the reason
    this hash-matches where an RNG-based mechanism would be rows-only.
    true_count rides along for the fixture demonstration; a production
    release would drop it (and rotate the release tag per epoch, which
    is exactly where the privacy accounting hooks in).

    Scale shape: one map-combined count; the noise is a per-group
    scalar expression over the |groups|-row result."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp-v1|"), F.col("event_type"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000000
        + 0.5
    ) / 1000000.0
    sgn = F.when(u >= 0.5, -1.0).otherwise(1.0)
    noise = sgn * F.log(1 - 2 * F.abs(u - 0.5)) * -1.0
    return counts.select(
        "event_type",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.lit(1.0).alias("epsilon"),
    )


@register(
    "agg_crosstab",
    category="agg",
    oracle="""
SELECT event_type AS event_type_dow,
       CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS "1",
       CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS "2",
       CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS "3",
       CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS "4",
       CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS "5",
       CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS "6",
       CAST(SUM(CASE WHEN dow = 7 THEN 1 ELSE 0 END) AS BIGINT) AS "7"
FROM (SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow
      FROM events)
GROUP BY event_type
""",
)
def agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameStatFunctions crosstab — the native contingency-table
    API (df.stat.crosstab), here event type x day of week; the raw
    count matrix that agg_chi2_independence and agg_mutual_information
    derive their statistics from, exposed as the wide pivot a
    spreadsheet-shaped consumer expects. Spark implements it as one
    pivot aggregation; the oracle spells the same table as conditional
    sums. Column set is fixed (the 7 weekdays), so the wide schema is
    stable — the caveat with crosstab at scale is cardinality of the
    PIVOTED column, which a calendar dimension bounds by construction.

    Scale shape: a single map-combined groupBy-pivot; never use
    crosstab on an unbounded value domain (the schema explodes) —
    that's what the long-form contingency queries are for."""
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.dayofweek("ts").alias("dow"))
        .stat.crosstab("event_type", "dow")
    )


@register(
    "sql_group_by_all",
    category="agg",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100 AS revenue
FROM orders
GROUP BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 GROUP BY ALL: every non-aggregate select item becomes a
    grouping key implicitly — the DuckDB-originated convenience that
    kills the maintain-the-key-list-twice bug in wide rollups (add a
    column to SELECT, forget to add it to GROUP BY, get a silent
    analysis error or — worse, with ordinals — a wrong grouping). Both
    engines support the identical text, so the oracle IS the query.
    Resolves at analysis time to a plain hash aggregate: zero runtime
    difference from the explicit form."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM orders
        GROUP BY ALL
        """
    )


def _cov_oracle() -> str:
    pairs = [
        ("quantity", "quantity"),
        ("quantity", "price"),
        ("quantity", "discount"),
        ("price", "price"),
        ("price", "discount"),
        ("discount", "discount"),
    ]
    sel = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS var_a, '{b}' AS var_b,
       round((s_{a[0]}{b[0]} - s_{a[0]}*s_{b[0]}/n)/(n-1), 9) AS cov,
       round((s_{a[0]}{b[0]} - s_{a[0]}*s_{b[0]}/n)
             / sqrt((s_{a[0]}{a[0]} - s_{a[0]}*s_{a[0]}/n)
                    * (s_{b[0]}{b[0]} - s_{b[0]}*s_{b[0]}/n)), 9) AS corr
FROM m"""
        for a, b in pairs
    )
    def ds(expr):
        return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
    return f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {ds('l_quantity')} AS s_q,
         {ds('l_extendedprice')} AS s_p,
         {ds('l_discount')} AS s_d,
         {ds('l_quantity*l_quantity')} AS s_qq,
         {ds('l_quantity*l_extendedprice')} AS s_qp,
         {ds('l_quantity*l_discount')} AS s_qd,
         {ds('l_extendedprice*l_extendedprice')} AS s_pp,
         {ds('l_extendedprice*l_discount')} AS s_pd,
         {ds('l_discount*l_discount')} AS s_dd
  FROM lineitem
)
{sel}
"""


@register("agg_covariance_matrix", category="agg", oracle=_cov_oracle())
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full covariance + correlation matrix over three lineitem measures
    (quantity, price, discount) in ONE pass: ten exact decimal moment
    sums (n, three first moments, six second moments) feed every
    cov/corr cell in closed form — the mergeable-sufficient-statistics
    pattern (agg_multivar_regression's Gramian, down a rank) that
    computes an entire d x d matrix at 100 TB for the cost of a single
    scan, with O(d^2) state per partition. Cells emit in long form
    (var_a, var_b, cov, corr), diagonal included (corr = 1 up to the
    rounded chain). Unlike covar_samp/corr built-ins, the decimal sums
    are partition-order independent, so the matrix hash-matches."""
    li = table(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q).alias("s_q"),
        dsum(p).alias("s_p"),
        dsum(d).alias("s_d"),
        dsum(q * q).alias("s_qq"),
        dsum(q * p).alias("s_qp"),
        dsum(q * d).alias("s_qd"),
        dsum(p * p).alias("s_pp"),
        dsum(p * d).alias("s_pd"),
        dsum(d * d).alias("s_dd"),
    )
    names = {"q": "quantity", "p": "price", "d": "discount"}
    outs = []
    for a, b in (("q", "q"), ("q", "p"), ("q", "d"), ("p", "p"), ("p", "d"), ("d", "d")):
        n = F.col("n")
        sab = F.col(f"s_{a}{b}")
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        saa, sbb = F.col(f"s_{a}{a}"), F.col(f"s_{b}{b}")
        cov = (sab - sa * sb / n) / (n - 1)
        corr = (sab - sa * sb / n) / F.sqrt(
            (saa - sa * sa / n) * (sbb - sb * sb / n)
        )
        outs.append(
            m.select(
                F.lit(names[a]).alias("var_a"),
                F.lit(names[b]).alias("var_b"),
                F.round(cov, 9).alias("cov"),
                F.round(corr, 9).alias("corr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register(
    "agg_share_of_parent",
    category="agg",
    oracle="""
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       CAST(rev_c AS DOUBLE)/100 AS revenue,
       round(CAST(rev_c AS DOUBLE)
             / CAST(SUM(rev_c) OVER (PARTITION BY region) AS DOUBLE), 9)
         AS pct_of_region,
       round(CAST(rev_c AS DOUBLE)
             / CAST(SUM(rev_c) OVER () AS DOUBLE), 9) AS pct_of_total
FROM nat
""",
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent rollup: revenue by (region, nation) with each
    nation's percentage of its region and of the grand total — the
    percent-of-parent columns every BI drill-down shows next to the
    absolute number. Revenue aggregates as exact cents; the two share
    denominators are window sums over the ALREADY-AGGREGATED frame
    (|nations| rows), so the percentages cost nothing beyond the one
    fact rollup, and the exact-integer numerators make the divisions
    engine-identical before the single edge rounding.

    Scale shape: one shuffle for the fact rollup (dims broadcast);
    the share windows touch 25 rows regardless of fact size."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev_c")
        )
    )
    wreg = W.partitionBy("region")
    wall = W.partitionBy()
    return nat.select(
        "region",
        "nation",
        (F.col("rev_c").cast("double") / 100).alias("revenue"),
        F.round(
            F.col("rev_c").cast("double")
            / F.sum("rev_c").over(wreg).cast("double"),
            9,
        ).alias("pct_of_region"),
        F.round(
            F.col("rev_c").cast("double")
            / F.sum("rev_c").over(wall).cast("double"),
            9,
        ).alias("pct_of_total"),
    )


@register(
    "agg_runs_test",
    category="agg",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
med AS (SELECT median(y_c) AS m FROM daily),
signed AS (
  SELECT day, y_c > m AS above FROM daily, med WHERE y_c <> m
),
runs AS (
  SELECT above,
         LAG(above) OVER (ORDER BY day) AS prev
  FROM signed
),
tot AS (
  SELECT CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND above <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM runs
)
SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
       round((r - (1 + 2.0*n1*n2/(n1+n2)))
             / sqrt(2.0*n1*n2*(2.0*n1*n2 - n1 - n2)
                    / ((n1+n2)*1.0*(n1+n2)*(n1+n2-1))), 6) AS z_stat
FROM tot
""",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for serial randomness of daily revenue:
    days classify above/below the median (ties excluded, standard
    practice), runs count as 1 + sign changes in day order, and the
    normal approximation's z says whether the sequence clusters or
    alternates more than chance — the go/no-go check before trusting
    i.i.d.-assuming statistics on a time series (the sequential
    complement to agg_ks_test's distribution comparison). All inputs to
    the z chain are exact integers (cent-grid daily sums, a .5-grid
    median, integer run counts), the chain is written identically on
    both engines and rounded once.

    Scale shape: one daily groupBy; the median, lag and totals operate
    on the calendar-bounded series."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    med = daily.agg(F.expr("percentile(y_c, 0.5)").alias("m"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y_c") != F.col("m"))
        .select("day", (F.col("y_c") > F.col("m")).alias("above"))
    )
    runs = signed.select(
        "above", F.lag("above").over(W.orderBy("day")).alias("prev")
    )
    tot = runs.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("above") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    n = n1 + n2
    e_r = 1 + 2.0 * n1 * n2 / n
    v_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (n * 1.0 * n * (n - 1))
    )
    return tot.select(
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        F.round((r - e_r) / F.sqrt(v_r), 6).alias("z_stat"),
    )


@register(
    "agg_expected_calibration_error",
    category="agg",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT CAST(MAX(cents) AS BIGINT) AS max_c FROM scored),
binned AS (
  SELECT CAST(LEAST(FLOOR(cents*10/max_c), 9) AS BIGINT) AS bin,
         label, cents, max_c
  FROM scored, mx
),
bins AS (
  SELECT bin, max_c,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(SUM(cents) AS BIGINT) AS sum_c
  FROM binned GROUP BY bin, max_c
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM bins)
SELECT t.n_total,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       round(CAST(SUM(CAST(round(
               n * abs(CAST(sum_c AS DOUBLE)/n/max_c
                       - CAST(n_pos AS DOUBLE)/n), 9)
             AS DECIMAL(30,9))) AS DOUBLE) / t.n_total, 9) AS ece
FROM bins, tot t
GROUP BY t.n_total
""",
)
def agg_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected Calibration Error — the one-number summary of
    agg_calibration_bins' reliability table: the bin-weighted mean of
    |mean predicted score - empirical rate|, the metric that says in a
    single figure how much a scorer's confidence can be trusted. Each
    bin's term (count times the absolute gap of two exact-integer-sum
    ratios) rounds to the 9-decimal grid before the exact decimal sum,
    then one division by N.

    Scale shape: identical to the calibration table — one
    map-combined pass onto ten bins, then arithmetic on ten rows."""
    e = table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    mx = scored.agg(F.max("cents").alias("max_c"))
    binned = scored.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor(F.col("cents") * 10 / F.col("max_c")).cast("long"),
            F.lit(9),
        ).alias("bin"),
        "label",
        "cents",
        "max_c",
    )
    bins = binned.groupBy("bin", "max_c").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum("cents").cast("long").alias("sum_c"),
    )
    term = F.round(
        F.col("n")
        * F.abs(
            F.col("sum_c").cast("double") / F.col("n") / F.col("max_c")
            - F.col("n_pos").cast("double") / F.col("n")
        ),
        9,
    ).cast("decimal(30,9)")
    return bins.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(term).cast("double").alias("_ece_sum"),
    ).select(
        "n_total",
        "n_bins",
        F.round(F.col("_ece_sum") / F.col("n_total"), 9).alias("ece"),
    )


@register(
    "agg_generalized_means",
    category="agg",
    oracle="""
WITH pos AS (
  SELECT event_type, value FROM events WHERE value > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*), 9) AS mean_arith,
       round(exp(CAST(SUM(CAST(round(ln(value), 9) AS DECIMAL(30,9)))
                 AS DOUBLE) / COUNT(*)), 6) AS mean_geom,
       round(COUNT(*)
             / CAST(SUM(CAST(round(1.0/value, 9) AS DECIMAL(30,9)))
               AS DOUBLE), 6) AS mean_harm
FROM pos
GROUP BY event_type
""",
)
def agg_generalized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean means per event type (positive values only, as
    geometric/harmonic require): arithmetic for totals, geometric for
    multiplicative quantities (growth factors, ratios), harmonic for
    rates (the right average for per-unit costs) — with the AM >= GM
    >= HM ordering as a built-in sanity invariant. Geometric runs as
    exp of the mean of 9-decimal-rounded logs, harmonic over rounded
    reciprocals, both through exact decimal sums (the bigram-LM
    discipline), so every mean hash-matches.

    Scale shape: one map-combined groupBy; all three means are
    mergeable (count + one decimal sum each)."""
    e = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_arith"),
        F.round(
            F.exp(
                F.sum(
                    F.round(F.log("value"), 9).cast("decimal(30,9)")
                ).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("mean_geom"),
        F.round(
            F.count(F.lit(1))
            / F.sum(
                F.round(1.0 / F.col("value"), 9).cast("decimal(30,9)")
            ).cast("double"),
            6,
        ).alias("mean_harm"),
    )


@register(
    "agg_power_analysis",
    category="agg",
    oracle="""
WITH arm AS (
  SELECT user_id % 2 AS variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST((value) AS DECIMAL(30,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST((value*value) AS DECIMAL(30,6))) AS DOUBLE) AS s2
  FROM events GROUP BY user_id % 2
),
pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         (SUM(s2) - SUM(s)*SUM(s)/SUM(n))/(SUM(n) - 1) AS var_pooled,
         SUM(s)/SUM(n) AS mean_all
  FROM arm
)
SELECT n_total,
       round(var_pooled, 6) AS var_pooled,
       round(mean_all, 9) AS mean_all,
       CAST(CEIL(2 * var_pooled * (1.959964 + 0.841621)*(1.959964 + 0.841621)
            / ((0.02*mean_all)*(0.02*mean_all))) AS BIGINT)
         AS n_per_arm_mde2pct,
       CAST(CEIL(2 * var_pooled * (1.959964 + 0.841621)*(1.959964 + 0.841621)
            / ((0.05*mean_all)*(0.05*mean_all))) AS BIGINT)
         AS n_per_arm_mde5pct
FROM pooled
""",
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the per-arm sample size needed to
    detect a 2% (and 5%) relative lift on mean event value at
    alpha=0.05 two-sided, power=0.80 — the closed form
    n = 2 sigma^2 (z_{a/2} + z_beta)^2 / delta^2 with the z constants
    as literals (1.959964, 0.841621) and sigma^2/mean measured from
    the data itself. This is the design-side companion to the readout
    tests (z/t/U): "how long must this experiment run" answered from
    the same mergeable (n, sum, sumsq) moments. The ceiling lands on
    an exact integer from an identical double chain, so even the
    sample-size recommendation hash-matches.

    Scale shape: one map-combined pass; everything after is arithmetic
    on a two-row frame."""
    e = table(spark, sf_dir, "events")
    v = F.col("value")
    arm = e.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(v).alias("s"),
        dsum(v * v).alias("s2"),
    )
    pooled = arm.agg(
        F.sum("n").alias("n_total"),
        (
            (F.sum("s2") - F.sum("s") * F.sum("s") / F.sum("n"))
            / (F.sum("n") - 1)
        ).alias("var_pooled"),
        (F.sum("s") / F.sum("n")).alias("mean_all"),
    )
    z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)

    def n_for(mde):
        delta = mde * F.col("mean_all")
        return F.ceil(
            2 * F.col("var_pooled") * z2 / (delta * delta)
        ).cast("long")

    return pooled.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.round("var_pooled", 6).alias("var_pooled"),
        F.round("mean_all", 9).alias("mean_all"),
        n_for(0.02).alias("n_per_arm_mde2pct"),
        n_for(0.05).alias("n_per_arm_mde5pct"),
    )


def _acf_oracle() -> str:
    def ds(expr, scale=6):
        return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
    lag_blocks = []
    for k in (1, 2, 7, 14):
        lag_blocks.append(
            f"""SELECT {k} AS lag_k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(({ds('a.y*b.y', 4)} - {ds('a.y', 2)}*{ds('b.y', 2)}/COUNT(*))
             / sqrt(({ds('a.y*a.y', 4)} - {ds('a.y', 2)}*{ds('a.y', 2)}
                     /COUNT(*))
                  * ({ds('b.y*b.y', 4)} - {ds('b.y', 2)}*{ds('b.y', 2)}
                     /COUNT(*))), 9) AS acf
FROM daily a JOIN daily b ON b.rn = a.rn + {k}"""
        )
    sel = "\nUNION ALL\n".join(lag_blocks)
    return f"""
WITH d0 AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
daily AS MATERIALIZED (
  SELECT CAST(y_c AS DOUBLE)/100 AS y,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM d0
)
{sel}
"""


@register("agg_acf", category="agg", oracle=_acf_oracle())
def agg_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1, 2, 7 and 14
    — the seasonality detector read directly: a spike at lag 7 is the
    weekly cycle agg_seasonal_decompose removes, lag 1 is persistence,
    lag 14 confirms the cycle. Each lag is a Pearson correlation over
    the (y_t, y_{t-k}) pairs from five exact decimal co-moment sums
    (the agg_pearson_corr discipline; daily values are exact cent-grid
    doubles so the per-row products sit on the 1e-4 grid), rounded
    once.

    Scale shape: one daily groupBy; each lag joins the
    calendar-bounded series to itself on a row-number offset — four
    tiny joins, no data-sized work after the rollup."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("y_c")
        )
        .select(
            (F.col("y_c").cast("double") / 100).alias("y"),
            F.row_number().over(W.orderBy("day")).alias("rn"),
        )
        .localCheckpoint()
    )
    a = daily.select(F.col("y").alias("ya"), F.col("rn").alias("ra"))
    b = daily.select(F.col("y").alias("yb"), F.col("rn").alias("rb"))

    def dsc(col, scale):
        return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")

    outs = []
    for k in (1, 2, 7, 14):
        pairs = a.join(b, F.col("rb") == F.col("ra") + k)
        stats = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            dsc(F.col("ya"), 2).alias("sa"),
            dsc(F.col("yb"), 2).alias("sb"),
            dsc(F.col("ya") * F.col("yb"), 4).alias("sab"),
            dsc(F.col("ya") * F.col("ya"), 4).alias("saa"),
            dsc(F.col("yb") * F.col("yb"), 4).alias("sbb"),
        )
        acf = (
            F.col("sab") - F.col("sa") * F.col("sb") / F.col("n")
        ) / F.sqrt(
            (F.col("saa") - F.col("sa") * F.col("sa") / F.col("n"))
            * (F.col("sbb") - F.col("sb") * F.col("sb") / F.col("n"))
        )
        outs.append(
            stats.select(
                F.lit(k).alias("lag_k"),
                F.col("n").cast("long").alias("n_pairs"),
                F.round(acf, 9).alias("acf"),
            )
        )
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionAll(o_)
    return out


@register(
    "sql_lateral_column_alias",
    category="agg",
    oracle="""
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
       cents // 100 AS whole_dollars,
       whole_dollars % 1000 AS dollars_mod_k,
       CASE WHEN dollars_mod_k < 500 THEN 'low' ELSE 'high' END AS band
FROM orders
WHERE o_orderkey < 3000
""",
)
def sql_lateral_column_alias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing an
    alias defined EARLIER IN THE SAME SELECT — the feature that kills
    the copy-the-expression-four-times pattern in derived-column
    chains (cents -> dollars -> band here, each step reading the
    previous alias). DuckDB supports the same lateral references, so
    the oracle is near-identical text; the one dialect delta is
    integer division (// in DuckDB, div in Spark SQL). Resolves at
    analysis time to the same expanded projection — zero runtime
    cost.

    Scale shape: pure narrow projection."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
               cents div 100 AS whole_dollars,
               whole_dollars % 1000 AS dollars_mod_k,
               CASE WHEN dollars_mod_k < 500 THEN 'low' ELSE 'high' END
                 AS band
        FROM orders
        WHERE o_orderkey < 3000
        """
    )


@register(
    "agg_robust_means",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events
),
grid AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS g FROM pts GROUP BY cents
),
cum AS (
  SELECT cents, g,
         CAST(COALESCE(SUM(g) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_n,
         CAST(SUM(g) OVER () AS BIGINT) AS n
  FROM grid
),
k AS (SELECT n, n // 20 AS k FROM (SELECT DISTINCT n FROM cum)),
clipped AS (
  SELECT c.cents, c.g, c.before_n, k.n, k.k,
         GREATEST(LEAST(c.before_n + c.g, k.n - k.k) - GREATEST(c.before_n, k.k), 0)
           AS kept_g
  FROM cum c, k
),
cuts AS (
  SELECT MIN(CASE WHEN before_n + g > k THEN cents END) AS lo_cut,
         MIN(CASE WHEN before_n + g >= n - k THEN cents END) AS hi_cut
  FROM clipped
)
SELECT c.n,
       round(CAST(SUM(c.kept_g * c.cents) AS DOUBLE)
             / SUM(c.kept_g) / 100, 9) AS trimmed_mean,
       round(CAST(SUM(c.g * LEAST(GREATEST(c.cents, t.lo_cut), t.hi_cut))
                  AS DOUBLE) / c.n / 100, 9) AS winsorized_mean,
       CAST(t.lo_cut AS DOUBLE)/100 AS lo_cut,
       CAST(t.hi_cut AS DOUBLE)/100 AS hi_cut
FROM clipped c, cuts t
GROUP BY c.n, t.lo_cut, t.hi_cut
""",
)
def agg_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust central tendency: the 5%-trimmed mean (drop the k = n/20
    smallest and largest observations) and the winsorized mean (clamp
    them to the cut values instead) over event value — the outlier-
    resistant means that sit between the mean and the median in
    efficiency, computed EXACTLY on the cent grid: cumulative counts
    locate how much of each grid cell survives the trim (partial cells
    handled by the clamped-interval overlap), cut values are the
    order statistics at ranks k+1 and n-k, and every sum is integer.
    One division per output.

    Scale shape: the agg_ks_test shape — one groupBy onto the value
    grid, prefix sums over the bounded support, never a row sort."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    grid = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
    ).groupBy("cents").agg(F.count(F.lit(1)).alias("g"))
    wprev = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    wall = W.partitionBy()
    cum = grid.select(
        "cents",
        "g",
        F.coalesce(F.sum("g").over(wprev), F.lit(0)).alias("before_n"),
        F.sum("g").over(wall).alias("n"),
    )
    k = F.floor(F.col("n") / 20).cast("long")
    kept = F.greatest(
        F.least(F.col("before_n") + F.col("g"), F.col("n") - k)
        - F.greatest(F.col("before_n"), k),
        F.lit(0),
    )
    clipped = cum.select(
        "cents", "g", "before_n", "n", k.alias("k"), kept.alias("kept_g")
    ).localCheckpoint()
    cuts = clipped.agg(
        F.min(
            F.when(
                F.col("before_n") + F.col("g") > F.col("k"), F.col("cents")
            )
        ).alias("lo_cut"),
        F.min(
            F.when(
                F.col("before_n") + F.col("g") >= F.col("n") - F.col("k"),
                F.col("cents"),
            )
        ).alias("hi_cut"),
    )
    return (
        clipped.crossJoin(F.broadcast(cuts))
        .groupBy("n", "lo_cut", "hi_cut")
        .agg(
            F.round(
                F.sum(F.col("kept_g") * F.col("cents")).cast("double")
                / F.sum("kept_g")
                / 100,
                9,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(
                    F.col("g")
                    * F.least(
                        F.greatest(F.col("cents"), F.col("lo_cut")),
                        F.col("hi_cut"),
                    )
                ).cast("double")
                / F.first("n")
                / 100,
                9,
            ).alias("winsorized_mean"),
        )
        .select(
            "n",
            "trimmed_mean",
            "winsorized_mean",
            (F.col("lo_cut").cast("double") / 100).alias("lo_cut"),
            (F.col("hi_cut").cast("double") / 100).alias("hi_cut"),
        )
    )


@register(
    "agg_cohens_kappa",
    category="agg",
    oracle="""
WITH rated AS (
  SELECT CASE WHEN value > 50 THEN 1 ELSE 0 END AS rater_a,
         CASE WHEN value > 45 THEN 1 ELSE 0 END AS rater_b
  FROM events
),
cm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rater_a*rater_b) AS BIGINT) AS both_pos,
         CAST(SUM((1-rater_a)*(1-rater_b)) AS BIGINT) AS both_neg,
         CAST(SUM(rater_a) AS BIGINT) AS a_pos,
         CAST(SUM(rater_b) AS BIGINT) AS b_pos
  FROM rated
)
SELECT n, both_pos, both_neg,
       round((both_pos + both_neg) * 1.0 / n, 9) AS p_observed,
       round((CAST(a_pos AS DOUBLE)*b_pos
              + CAST(n - a_pos AS DOUBLE)*(n - b_pos))
             / (CAST(n AS DOUBLE)*n), 9) AS p_expected,
       round(((both_pos + both_neg) * 1.0 / n
              - (CAST(a_pos AS DOUBLE)*b_pos
                 + CAST(n - a_pos AS DOUBLE)*(n - b_pos))
                / (CAST(n AS DOUBLE)*n))
             / (1.0 - (CAST(a_pos AS DOUBLE)*b_pos
                       + CAST(n - a_pos AS DOUBLE)*(n - b_pos))
                      / (CAST(n AS DOUBLE)*n)), 9) AS kappa
FROM cm
""",
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two labeling rules (two nearby value
    thresholds standing in for two annotators): chance-corrected
    agreement (po - pe)/(1 - pe) — the metric that exposes how much of
    raw agreement is luck, which matters every time LLM-judge labels
    or crowd annotations gate a training set (raw agreement between
    imbalanced raters is inflated; kappa is not). All inputs are exact
    integer indicator sums; po/pe/kappa are identical chains rounded
    once.

    Scale shape: one map-combined pass; arithmetic on a one-row
    frame. Extends to weighted kappa by swapping the indicator sums
    for a category-pair matrix — same plan."""
    e = table(spark, sf_dir, "events")
    ra = F.when(F.col("value") > 50, 1).otherwise(0)
    rb = F.when(F.col("value") > 45, 1).otherwise(0)
    cm = e.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("both_pos"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("long")
        .alias("both_neg"),
        F.sum("ra").cast("long").alias("a_pos"),
        F.sum("rb").cast("long").alias("b_pos"),
    )
    n = F.col("n")
    po = (F.col("both_pos") + F.col("both_neg")) * 1.0 / n
    pe = (
        F.col("a_pos").cast("double") * F.col("b_pos")
        + (n - F.col("a_pos")).cast("double") * (n - F.col("b_pos"))
    ) / (n.cast("double") * n)
    return cm.select(
        "n",
        "both_pos",
        "both_neg",
        F.round(po, 9).alias("p_observed"),
        F.round(pe, 9).alias("p_expected"),
        F.round((po - pe) / (1.0 - pe), 9).alias("kappa"),
    )


@register(
    "agg_association_rules",
    category="agg",
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey < 600
),
n_orders AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets
),
item_n AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
  FROM baskets GROUP BY l_partkey
),
pair_n AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.ante, p.cons, p.c_ab,
       round(p.c_ab * 1.0 / n.n, 9) AS support,
       round(p.c_ab * 1.0 / ia.c, 9) AS confidence,
       round(p.c_ab * 1.0 * n.n / (ia.c * 1.0 * ic.c), 9) AS lift,
       rk
FROM (SELECT ante, cons, c_ab,
             ROW_NUMBER() OVER (ORDER BY c_ab DESC, ante, cons) AS rk
      FROM pair_n) p
JOIN item_n ia ON ia.l_partkey = p.ante
JOIN item_n ic ON ic.l_partkey = p.cons
JOIN n_orders n ON TRUE
WHERE rk <= 20
""",
)
def agg_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for the twenty most
    frequent co-purchased part pairs, support P(A,B), confidence
    P(B|A) and lift P(A,B)/(P(A)P(B)) — the classic market-basket
    readout (lift > 1 = genuinely associated, not just both popular;
    confidence is directional, which is why (ante, cons) pairs appear
    both ways). Counts are exact basket-level integers (DISTINCT
    per-order items first — multiplicity inside one order is not
    co-occurrence evidence); the three ratios round once.

    Scale shape: the pair join is the co-purchase inverted index the
    graph family already pays (per-order fan-out, bounded by basket
    size); item and basket counts are map-combined. A-priori's
    higher-order itemsets iterate this same join on the survivors."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 600)
    baskets = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    item_n = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("ante")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("cons")
    )
    pair_n = (
        a.join(b, "ok")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    # top-20 via orderBy().limit() -> TakeOrderedAndProject; the rank
    # window runs over the 20-row pool (a partitionless window over the
    # full co-occurrence pair table would single-task it at scale)
    ranked = (
        pair_n.orderBy(F.desc("c_ab"), F.asc("ante"), F.asc("cons"))
        .limit(20)
        .select(
            "ante",
            "cons",
            "c_ab",
            F.row_number()
            .over(W.orderBy(F.desc("c_ab"), F.asc("ante"), F.asc("cons")))
            .alias("rk"),
        )
    )
    ia = item_n.select(
        F.col("l_partkey").alias("ante"), F.col("c").alias("c_a")
    )
    ic = item_n.select(
        F.col("l_partkey").alias("cons"), F.col("c").alias("c_c")
    )
    return (
        ranked.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ante",
            "cons",
            "c_ab",
            F.round(F.col("c_ab") * 1.0 / F.col("n"), 9).alias("support"),
            F.round(F.col("c_ab") * 1.0 / F.col("c_a"), 9).alias(
                "confidence"
            ),
            F.round(
                F.col("c_ab")
                * 1.0
                * F.col("n")
                / (F.col("c_a") * 1.0 * F.col("c_c")),
                9,
            ).alias("lift"),
            "rk",
        )
    )


@register(
    "agg_revenue_concentration",
    category="agg",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev_c,
         ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(rev_c) OVER () AS BIGINT) AS total_c
  FROM per_cust
)
SELECT n AS n_customers,
       CAST(total_c AS DOUBLE)/100 AS total_revenue,
       round(CAST(SUM(CASE WHEN rnk <= (n + 99) // 100 THEN rev_c
                  ELSE 0 END) AS DOUBLE) / total_c, 9) AS top1pct_share,
       round(CAST(SUM(CASE WHEN rnk <= (n + 9) // 10 THEN rev_c
                  ELSE 0 END) AS DOUBLE) / total_c, 9) AS top10pct_share
FROM ranked
GROUP BY n, total_c
""",
)
def agg_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue concentration: the share of total revenue held by the
    top 1% and top 10% of customers (ceiling head counts, ties by key)
    — the Pareto readout behind key-account strategy and the
    skew-awareness twin of etl_skew_report (that one asks whether the
    JOIN will stall; this asks whether the BUSINESS is concentrated).
    Exact cent sums and integer rank cutoffs; two divisions at the
    edge.

    Scale shape: one per-customer rollup, then the exact global rank
    over the customer frame via the range-partition +
    broadcast-offsets decomposition (_helpers.with_global_rank) — no
    W.partitionBy() single-task window anywhere: at 10^9 customers the
    rank stage stays as parallel as the range partitioner. Head
    cutoffs and shares then fold into ONE mergeable global aggregate
    (map-side partials)."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("rev_c")
    )
    ranked = with_global_rank(
        per_cust, [F.desc("rev_c"), F.asc("o_custkey")], ["rev_c"]
    )
    k1 = F.expr("(_n + 99) div 100")
    k10 = F.expr("(_n + 9) div 10")
    return ranked.agg(
        F.max("_n").alias("n_customers"),
        F.sum("rev_c").alias("total_c"),
        F.sum(
            F.when(F.col("_rank") <= k1, F.col("rev_c")).otherwise(0)
        ).alias("top1"),
        F.sum(
            F.when(F.col("_rank") <= k10, F.col("rev_c")).otherwise(0)
        ).alias("top10"),
    ).select(
        F.col("n_customers").cast("long").alias("n_customers"),
        (F.col("total_c").cast("double") / 100).alias("total_revenue"),
        F.round(F.col("top1").cast("double") / F.col("total_c"), 9).alias(
            "top1pct_share"
        ),
        F.round(F.col("top10").cast("double") / F.col("total_c"), 9).alias(
            "top10pct_share"
        ),
    )


@register(
    "agg_spearman_corr",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p
  FROM lineitem
),
qgrid AS (
  SELECT q, CAST(COUNT(*) AS BIGINT) AS g,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_n
  FROM pts GROUP BY q
),
pgrid AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS g,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_n
  FROM pts GROUP BY p
),
ranked AS (
  -- doubled average ranks are exact integers even with ties
  SELECT (2*qg.before_n + qg.g + 1) AS rq2,
         (2*pg.before_n + pg.g + 1) AS rp2
  FROM pts t
  JOIN qgrid qg ON qg.q = t.q
  JOIN pgrid pg ON pg.p = t.p
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rq2) AS BIGINT) AS sx,
         CAST(SUM(rp2) AS BIGINT) AS sy,
         CAST(SUM(CAST(rq2 AS DECIMAL(38,0))*rp2) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(rq2 AS DECIMAL(38,0))*rq2) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(rp2 AS DECIMAL(38,0))*rp2) AS DECIMAL(38,0)) AS syy
  FROM ranked
)
SELECT n,
       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n)
                  * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n)), 9)
         AS spearman_rho
FROM m
""",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price: Pearson
    on average ranks, which measures MONOTONE association (robust to
    outliers and nonlinearity, where agg_pearson_corr sees only
    linear). Ranks come from grid cumulative counts carried as DOUBLED
    integers (exact even under ties — the agg_mann_whitney machinery
    turned correlation), co-moment sums run as exact decimals (rank
    products pass 2^63 at sf0.1; values stay well under the 15-digit
    double-exact range after the final cast because the CENTERED
    moments are small), and one chain rounds once.

    Scale shape: two grid rollups (support-bounded), two broadcast
    joins back to the rows, one co-moment pass — never a row sort."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("p"),
    )

    def grid(col):
        wprev = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        return (
            pts.groupBy(col)
            .agg(F.count(F.lit(1)).alias("g"))
            .select(
                col,
                "g",
                F.coalesce(F.sum("g").over(wprev), F.lit(0)).alias(
                    "before_n"
                ),
            )
        )

    qg = grid("q").select(
        "q", (2 * F.col("before_n") + F.col("g") + 1).alias("rq2")
    )
    pg = grid("p").select(
        "p", (2 * F.col("before_n") + F.col("g") + 1).alias("rp2")
    )
    ranked = pts.join(F.broadcast(qg), "q").join(F.broadcast(pg), "p")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rq2").alias("sx"),
        F.sum("rp2").alias("sy"),
        F.sum(F.col("rq2").cast("decimal(38,0)") * F.col("rp2")).alias(
            "sxy"
        ),
        F.sum(F.col("rq2").cast("decimal(38,0)") * F.col("rq2")).alias(
            "sxx"
        ),
        F.sum(F.col("rp2").cast("decimal(38,0)") * F.col("rp2")).alias(
            "syy"
        ),
    )
    n = F.col("n")
    rho = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy") / n
    ) / F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / n
        )
        * (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy") / n
        )
    )
    return m.select(
        n.cast("long").alias("n"), F.round(rho, 9).alias("spearman_rho")
    )


@register(
    "agg_kruskal_wallis",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT event_type AS grp,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
grid AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS g,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_n
  FROM pts GROUP BY cents
),
ranked AS (
  SELECT t.grp, (2*gr.before_n + gr.g + 1) AS r2
  FROM pts t JOIN grid gr ON gr.cents = t.cents
),
per_grp AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(r2) AS BIGINT) AS r2_sum
  FROM ranked GROUP BY grp
),
ties AS (
  SELECT CAST(SUM(g*g*g - g) AS BIGINT) AS tie_term,
         CAST(SUM(g) AS BIGINT) AS n
  FROM grid
)
SELECT t.n AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       round((12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1))
              * SUM((CAST(p.r2_sum AS DOUBLE)/2)
                    * (CAST(p.r2_sum AS DOUBLE)/2) / p.n_j)
              - 3.0 * (t.n + 1))
             / (1.0 - CAST(t.tie_term AS DOUBLE)
                      / (CAST(t.n AS DOUBLE)*t.n*t.n - t.n)), 9)
         AS h_stat
FROM per_grp p, ties t
GROUP BY t.n, t.tie_term
""",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across all five event types: the k-sample
    generalization of the Mann-Whitney rank test (does ANY group's
    value distribution differ?), with the exact tie correction
    1 - sum(t^3-t)/(N^3-N). Ranks ride as doubled integers on the cent
    grid (the established rank machinery), per-group rank sums are
    exact, and H is one identical chain rounded once — the gatekeeper
    you run before k pairwise U tests inflate your false-positive
    rate.

    Scale shape: one grid rollup, one broadcast rank join, one
    per-group rollup — all support- or group-bounded."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    pts = e.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    wprev = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    grid = (
        pts.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("g"))
        .select(
            "cents",
            "g",
            F.coalesce(F.sum("g").over(wprev), F.lit(0)).alias("before_n"),
        )
        .localCheckpoint()
    )
    ranked = pts.join(
        F.broadcast(
            grid.select(
                "cents",
                (2 * F.col("before_n") + F.col("g") + 1).alias("r2"),
            )
        ),
        "cents",
    )
    per_grp = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"), F.sum("r2").alias("r2_sum")
    )
    ties = grid.agg(
        F.sum(
            F.col("g") * F.col("g") * F.col("g") - F.col("g")
        ).alias("tie_term"),
        F.sum("g").alias("n"),
    )
    nd = F.col("n").cast("double")
    h_raw = (
        12.0
        / (nd * (F.col("n") + 1))
        * F.sum(
            (F.col("r2_sum").cast("double") / 2)
            * (F.col("r2_sum").cast("double") / 2)
            / F.col("n_j")
        )
        - 3.0 * (F.col("n") + 1)
    )
    h = h_raw / (
        1.0
        - F.col("tie_term").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    )
    return (
        per_grp.crossJoin(F.broadcast(ties))
        .groupBy("n", "tie_term")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.round(h, 9).alias("h_stat"),
        )
        .select(
            F.col("n").cast("long").alias("n_total"),
            "n_groups",
            "h_stat",
        )
    )


@register(
    "agg_jensen_shannon",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT user_id % 2 AS variant,
         CAST(FLOOR(value*10 + 0.5) AS BIGINT) AS decile_cents
  FROM events
),
grid AS (
  SELECT decile_cents,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS g0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS g1
  FROM pts GROUP BY decile_cents
),
tot AS (
  SELECT CAST(SUM(g0) AS BIGINT) AS n0, CAST(SUM(g1) AS BIGINT) AS n1
  FROM grid
),
terms AS (
  SELECT
    CASE WHEN g.g0 > 0 THEN
      CAST(round((g.g0 * 1.0 / t.n0 / 2)
           * round(ln((g.g0 * 1.0 / t.n0)
                      / ((g.g0 * 1.0 / t.n0 + g.g1 * 1.0 / t.n1) / 2)), 9),
           12) AS DECIMAL(30,12))
    ELSE CAST(0 AS DECIMAL(30,12)) END AS term_p,
    CASE WHEN g.g1 > 0 THEN
      CAST(round((g.g1 * 1.0 / t.n1 / 2)
           * round(ln((g.g1 * 1.0 / t.n1)
                      / ((g.g0 * 1.0 / t.n0 + g.g1 * 1.0 / t.n1) / 2)), 9),
           12) AS DECIMAL(30,12))
    ELSE CAST(0 AS DECIMAL(30,12)) END AS term_q
  FROM grid g, tot t
)
SELECT (SELECT n0 FROM tot) AS n0, (SELECT n1 FROM tot) AS n1,
       round(CAST(SUM(term_p + term_q) AS DOUBLE), 9) AS jsd_nats
FROM terms
""",
)
def agg_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the two arms' value
    distributions on a decile-cent grid: the symmetric, bounded
    (<= ln 2) divergence that is defined even where one side has mass
    the other lacks — KL's infinity problem, PSI's smoothing hack,
    neither needed. Completes the drift toolkit: PSI (binned,
    interpretable bands), KS (max CDF gap + location), JSD (total
    distributional distance). Per-cell terms round ln to the 9-grid
    and the weighted product to the 12-grid before the exact decimal
    sum (the mutual-information discipline with a finer product grid,
    since weights here are tiny probabilities).

    Scale shape: one groupBy onto the grid, a 1-row total, per-cell
    scalar math — support-bounded like the rest of the family."""
    e = table(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 2).alias("variant"),
        F.floor(F.col("value") * 10 + 0.5).cast("long").alias(
            "decile_cents"
        ),
    )
    grid = pts.groupBy("decile_cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("g0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("g1"),
    )
    tot = grid.agg(
        F.sum("g0").alias("n0"), F.sum("g1").alias("n1")
    )
    j = grid.crossJoin(F.broadcast(tot))
    p = F.col("g0") * 1.0 / F.col("n0")
    q = F.col("g1") * 1.0 / F.col("n1")
    mmid = (p + q) / 2
    term_p = F.when(
        F.col("g0") > 0,
        F.round((p / 2) * F.round(F.log(p / mmid), 9), 12).cast(
            "decimal(30,12)"
        ),
    ).otherwise(F.lit(0).cast("decimal(30,12)"))
    term_q = F.when(
        F.col("g1") > 0,
        F.round((q / 2) * F.round(F.log(q / mmid), 9), 12).cast(
            "decimal(30,12)"
        ),
    ).otherwise(F.lit(0).cast("decimal(30,12)"))
    return j.agg(
        F.first("n0").alias("n0"),
        F.first("n1").alias("n1"),
        F.round(F.sum(term_p + term_q).cast("double"), 9).alias(
            "jsd_nats"
        ),
    )


@register(
    "agg_odds_ratio",
    category="agg",
    oracle="""
WITH cells AS (
  SELECT CAST(SUM(CASE WHEN user_id % 2 = 1
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN user_id % 2 = 1
                  AND event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                  AND event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM events
)
SELECT a, b, c, d,
       round(a * 1.0 * d / (b * 1.0 * c), 9) AS odds_ratio,
       round((a * 1.0 / (a + b)) / (c * 1.0 / (c + d)), 9)
         AS relative_risk,
       round(sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d), 9) AS log_or_se
FROM cells
""",
)
def agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk for the 2x2 exposure/outcome table
    (arm 1 as exposure, purchase as outcome), with the standard error
    of log-OR (sqrt of the reciprocal cell sums — exp(log OR +/-
    1.96 se) is the CI) — the epidemiology/experimentation readout
    that says effect SIZE where the z-test only says significance,
    and the reminder that OR and RR diverge off rare outcomes. Four
    exact integer cells; three identical chains rounded once.

    Scale shape: one map-combined pass, arithmetic on one row."""
    e = table(spark, sf_dir, "events")
    exp_ = F.col("user_id") % 2 == 1
    out_ = F.col("event_type") == "purchase"
    cells = e.agg(
        F.sum(F.when(exp_ & out_, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(exp_ & ~out_, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~exp_ & out_, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~exp_ & ~out_, 1).otherwise(0)).cast("long").alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(a * 1.0 * d / (b * 1.0 * c), 9).alias("odds_ratio"),
        F.round((a * 1.0 / (a + b)) / (c * 1.0 / (c + d)), 9).alias(
            "relative_risk"
        ),
        F.round(
            F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 9
        ).alias("log_or_se"),
    )


@register(
    "agg_wilcoxon_signed_rank",
    category="agg",
    oracle="""
WITH paired AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                    < TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT)
         - CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                      >= TIMESTAMP '2024-01-16 00:00:00'
                    THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS d
  FROM events GROUP BY user_id
),
nonzero AS (SELECT abs(d) AS ad, d > 0 AS pos FROM paired WHERE d <> 0),
grid AS (
  SELECT ad, CAST(COUNT(*) AS BIGINT) AS g,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_n
  FROM nonzero GROUP BY ad
),
ranked AS (
  SELECT n.pos, (2*gr.before_n + gr.g + 1) AS r2
  FROM nonzero n JOIN grid gr ON gr.ad = n.ad
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN pos THEN r2 ELSE 0 END) AS BIGINT) AS wplus2,
         (SELECT CAST(SUM(g*g*g - g) AS BIGINT) FROM grid) AS tie_term
  FROM ranked
)
SELECT n AS n_pairs,
       CAST(wplus2 AS DOUBLE)/2 AS w_plus,
       round((CAST(wplus2 AS DOUBLE)/2
              - CAST(n AS DOUBLE)*(n + 1)/4)
             / sqrt(CAST(n AS DOUBLE)*(n + 1)*(2*n + 1)/24
                    - CAST(tie_term AS DOUBLE)/48), 9) AS z_stat
FROM m
""",
)
def agg_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED data: each user's first-half
    vs second-half total event value (exact cent differences), signed
    ranks of |d| with average-rank ties carried as doubled integers,
    zero differences dropped per the standard treatment, and the
    tie-corrected normal approximation — the within-subject companion
    to Mann-Whitney's independent-samples test (pairing removes
    between-user variance, which is why A/A-to-A/B longitudinal
    designs use it). Everything before the z chain is integer.

    Scale shape: one per-user rollup, one |d|-grid pass, one rank
    join — group- and support-bounded throughout."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    half = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    paired = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("ts").cast("timestamp") < half, cents).otherwise(0))
            - F.sum(
                F.when(F.col("ts").cast("timestamp") >= half, cents).otherwise(0)
            )
        ).alias("d")
    )
    nonzero = paired.filter(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("ad"), (F.col("d") > 0).alias("pos")
    )
    wprev = W.orderBy("ad").rowsBetween(W.unboundedPreceding, -1)
    grid = (
        nonzero.groupBy("ad")
        .agg(F.count(F.lit(1)).alias("g"))
        .select(
            "ad",
            "g",
            F.coalesce(F.sum("g").over(wprev), F.lit(0)).alias("before_n"),
        )
        .localCheckpoint()
    )
    ranked = nonzero.join(
        F.broadcast(
            grid.select(
                "ad", (2 * F.col("before_n") + F.col("g") + 1).alias("r2")
            )
        ),
        "ad",
    )
    ties = grid.agg(
        F.sum(F.col("g") * F.col("g") * F.col("g") - F.col("g")).alias(
            "tie_term"
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pos"), F.col("r2")).otherwise(0)).alias(
            "wplus2"
        ),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    w_plus = F.col("wplus2").cast("double") / 2
    z = (w_plus - nd * (F.col("n") + 1) / 4) / F.sqrt(
        nd * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
        - F.col("tie_term").cast("double") / 48
    )
    return m.select(
        F.col("n").cast("long").alias("n_pairs"),
        w_plus.alias("w_plus"),
        F.round(z, 9).alias("z_stat"),
    )


@register(
    "agg_sketch_set_algebra",
    category="agg",
    oracle="""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM events) a
  JOIN (SELECT DISTINCT event_type FROM events) b
    ON a.event_type < b.event_type
)
SELECT p.type_a, p.type_b,
       (SELECT COUNT(*) FROM u x JOIN u y
         ON x.user_id = y.user_id
        WHERE x.event_type = p.type_a AND y.event_type = p.type_b)
         AS n_intersect,
       (SELECT COUNT(*) FROM u x
        WHERE x.event_type = p.type_a
          AND NOT EXISTS (SELECT 1 FROM u y
                          WHERE y.event_type = p.type_b
                            AND y.user_id = x.user_id))
         AS n_diff,
       TRUE AS intersect_ok, TRUE AS diff_ok
FROM pairs p
""",
)
def agg_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (Apache DataSketches, built into Spark 4):
    per-event-type user sketches combined with theta_intersection and
    theta_difference to estimate audience overlap ("users who click AND
    purchase") and exclusion — the segment-overlap workload that makes
    Theta strictly more useful than HLL (HLL unions only; Theta's KMV
    retention supports the full set algebra). One sketch per type is
    built ONCE and reused across all pairs — at 100 TB that is the whole
    point: pairwise overlaps of kilobyte sketches instead of pairwise
    self-joins of the raw fact table. Sketch binaries are
    engine-specific, so the driver check carries exact intersection /
    difference counts (the verification twin) plus flags asserting each
    estimate within max(10%, 5) — below the default k=4096 retained
    hashes Theta is exact, so on these fixtures the flags are tight."""
    e = table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    est = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("est_intersect"),
            F.theta_sketch_estimate(
                F.theta_difference("sk_a", "sk_b")
            ).alias("est_diff"),
        )
    )
    u = e.select("event_type", "user_id").distinct()
    ua = u.select(F.col("event_type").alias("type_a"), "user_id")
    ub = u.select(F.col("event_type").alias("type_b"), "user_id")
    exact_i = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_intersect"))
    )
    sizes = u.groupBy(F.col("event_type").alias("type_a")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    exact = (
        est.join(exact_i, ["type_a", "type_b"], "left")
        .join(sizes, "type_a")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_intersect", F.lit(0)).alias("n_intersect"),
            (F.col("n_a") - F.coalesce("n_intersect", F.lit(0))).alias("n_diff"),
            "est_intersect",
            "est_diff",
        )
    )
    tol_i = F.greatest(F.col("n_intersect") * 0.1, F.lit(5.0))
    tol_d = F.greatest(F.col("n_diff") * 0.1, F.lit(5.0))
    return exact.select(
        "type_a",
        "type_b",
        "n_intersect",
        "n_diff",
        (F.abs(F.col("est_intersect") - F.col("n_intersect")) <= tol_i).alias(
            "intersect_ok"
        ),
        (F.abs(F.col("est_diff") - F.col("n_diff")) <= tol_d).alias("diff_ok"),
    )


@register(
    "agg_pivot_multi",
    category="agg",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END")} AS F_total,
       CAST(COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F_n,
       {sql_dsum("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END")} AS O_total,
       CAST(COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O_n,
       {sql_dsum("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE 0 END")} AS P_total,
       CAST(COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P_n
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per pivot value (total AND count
    per status) — one shuffle produces the whole fan-out; the pivot
    value list stays explicit so no distinct-values pre-job runs (at
    scale that pre-job is a full extra scan). Spark names the columns
    <value>_<agg alias>; the oracle mirrors with CASE pairs."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    out = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            dsum(F.col("o_totalprice")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .na.fill(0)
    )
    return out


@register(
    "agg_wilson_ci",
    category="agg",
    oracle="""
WITH c AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT)
           AS k
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, n, k,
       round(k * 1.0 / n, 9) AS p_hat,
       round((k * 1.0 / n + 1.9208 / n
              - 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                            + 0.9604 / (n * n)))
             / (1 + 3.8416 / n), 9) AS ci_lo,
       round((k * 1.0 / n + 1.9208 / n
              + 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                            + 0.9604 / (n * n)))
             / (1 + 3.8416 / n), 9) AS ci_hi
FROM c
""",
)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for a per-group proportion
    (share of finalized orders by nation) — the interval that behaves at
    small n and p near 0/1 where the normal approximation fails, i.e.
    what an experiment-analysis layer should report instead of +-1.96*se.
    One join + one groupBy; the interval is closed-form scalar double
    math on exact integer (k, n) — every engine computes sqrt and the
    rational terms bit-identically from the same integers (no float
    aggregation anywhere), so 9-dp rounding is belt-and-braces.
    Constants: z=1.96, z^2=3.8416, z^2/2=1.9208, z^2/4=0.9604."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1))
            .cast("long")
            .alias("k"),
        )
    )
    p = F.col("k") * 1.0 / F.col("n")
    nn = F.col("n")
    half = 1.96 * F.sqrt(p * (1 - p) / nn + 0.9604 / (nn * nn))
    denom = 1 + 3.8416 / nn
    return counts.select(
        "n_name",
        "n",
        "k",
        F.round(p, 9).alias("p_hat"),
        F.round((p + 1.9208 / nn - half) / denom, 9).alias("ci_lo"),
        F.round((p + 1.9208 / nn + half) / denom, 9).alias("ci_hi"),
    )


@register(
    "agg_skyline_pareto",
    category="agg",
    oracle="""
WITH pts AS (
  SELECT c.c_custkey, c.c_acctbal AS bal,
         CAST(SUM(CAST(FLOOR(o.o_totalprice*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
)
SELECT p.c_custkey, p.bal, p.spend
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.bal >= p.bal AND q.spend >= p.spend
    AND (q.bal > p.bal OR q.spend > p.spend))
""",
)
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) operator — the classic "best tradeoffs"
    query: customers not dominated on (account balance, exact total
    spend), where q dominates p iff q is >= on both axes and > on at
    least one. The oracle is the textbook NOT EXISTS dominance test
    (quadratic — fine for DuckDB at fixture scale). Companion to
    sort_pareto_skyline (sorts.py), whose single-window form defers to
    this operator's decomposed running max as the scale path.

    The Spark plan uses the 2-D skyline reduction to a RUNNING MAX over
    the bal-descending order: p survives iff (a) its spend exceeds the
    max spend among all STRICTLY higher balances, and (b) its spend is
    the max within its own balance group (duplicated (bal, spend) points
    tie into the frontier together — neither dominates). The running max
    is decomposed scale-safely exactly like sort_total_order_range
    (sorts.py): per-balance group maxes are range-partitioned by bal
    desc, each partition computes a LOCAL running max, and the
    cross-partition prefix is a broadcast cummax over the per-partition
    maxes — no single-partition window anywhere; the only full exchange
    is the range partitioner over |distinct bal| rows.

    Exactness: spend is a scaled-long exact sum; everything after is
    comparisons and max — order-insensitive by construction.
    """
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pts = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", F.col("c_acctbal").alias("bal"))
        .agg(lsum(F.col("o_totalprice")).alias("spend"))
    )
    groups = pts.groupBy("bal").agg(F.max("spend").alias("gmax"))
    ranged = groups.repartitionByRange(8, F.desc("bal")).sortWithinPartitions(
        F.desc("bal")
    )
    mid = F.monotonically_increasing_id()
    local = ranged.select(
        "bal",
        "gmax",
        F.shiftright(mid, 33).cast("int").alias("pid"),
        F.max("gmax")
        .over(
            W.partitionBy(F.shiftright(mid, 33).cast("int"))
            .orderBy(F.desc("bal"))
            .rowsBetween(W.unboundedPreceding, -1)
        )
        .alias("lmax"),
    )
    pmax = local.groupBy("pid").agg(F.max("gmax").alias("pm"))
    wprev = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    prefix = pmax.select("pid", F.max("pm").over(wprev).alias("omax"))
    frontier = (
        local.join(F.broadcast(prefix), "pid")
        .select(
            "bal",
            "gmax",
            F.greatest(
                F.coalesce(F.col("lmax"), F.lit(float("-inf"))),
                F.coalesce(F.col("omax"), F.lit(float("-inf"))),
            ).alias("m1"),
        )
        .filter(F.col("gmax") > F.col("m1"))
        .select(F.col("bal").alias("f_bal"), F.col("gmax").alias("f_spend"))
    )
    return pts.join(
        F.broadcast(frontier),
        (F.col("bal") == F.col("f_bal")) & (F.col("spend") == F.col("f_spend")),
    ).select("c_custkey", "bal", "spend")


@register(
    "agg_skyline_3d",
    category="agg",
    oracle="""
WITH qv AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p_partkey, p_retailprice AS price, CAST(p_size AS BIGINT) AS psize,
         qty
  FROM part JOIN qv ON l_partkey = p_partkey
)
SELECT p.p_partkey, p.price, p.psize, p.qty
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price <= p.price AND q.psize >= p.psize AND q.qty >= p.qty
    AND (q.price < p.price OR q.psize > p.psize OR q.qty > p.qty))
""",
)
def agg_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D skyline — the dimension where the 2-D running-max trick
    (agg_skyline_pareto) stops working and the real distributed
    algorithm begins. Parts Pareto-optimal on (minimize retail price,
    maximize size, maximize total shipped quantity); oracle = textbook
    NOT EXISTS dominance.

    Algorithm (divide-and-conquer, the published distributed-skyline
    shape): skylines are DISTRIBUTIVE — the global skyline is a subset
    of the union of per-partition local skylines, because dominance is
    transitive (any dominator of a surviving point is itself dominated
    by some local-skyline point that also dominates the survivor). So:
    phase 1 computes each partition's local skyline inside mapInPandas
    (sort by a monotone order, scan keeping non-dominated — NO shuffle,
    state bounded by the local frontier); phase 2 refines the small
    candidate union with an exact dominance LEFT ANTI self-join
    (broadcast — frontier size is O(log^2 n) expected for independent
    dims, and the refine is exact regardless, so the result is provably
    partition-invariant even though each LOCAL skyline is not).

    Exactness: qty is an exact integer sum; all comparisons exact.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    qv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    pts = p.join(qv, p.p_partkey == qv.l_partkey).select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("psize"),
        "qty",
    )

    def _local_skyline(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        df = pd.concat(chunks, ignore_index=True)
        df = df.sort_values(
            ["price", "psize", "qty"], ascending=[True, False, False]
        ).reset_index(drop=True)
        kept_rows = []
        kp, ks, kq = [], [], []
        for row in df.itertuples(index=True):
            dominated = False
            for i in range(len(kp)):
                if (
                    kp[i] <= row.price
                    and ks[i] >= row.psize
                    and kq[i] >= row.qty
                    and (kp[i] < row.price or ks[i] > row.psize or kq[i] > row.qty)
                ):
                    dominated = True
                    break
            if not dominated:
                kp.append(row.price)
                ks.append(row.psize)
                kq.append(row.qty)
                kept_rows.append(row.Index)
        yield df.loc[kept_rows]

    cand = pts.mapInPandas(
        _local_skyline, "p_partkey long, price double, psize long, qty long"
    )
    dom = cand.select(
        F.col("price").alias("q_price"),
        F.col("psize").alias("q_psize"),
        F.col("qty").alias("q_qty"),
    )
    dominance = (
        (F.col("q_price") <= F.col("price"))
        & (F.col("q_psize") >= F.col("psize"))
        & (F.col("q_qty") >= F.col("qty"))
        & (
            (F.col("q_price") < F.col("price"))
            | (F.col("q_psize") > F.col("psize"))
            | (F.col("q_qty") > F.col("qty"))
        )
    )
    return cand.join(F.broadcast(dom), dominance, "left_anti")


@register(
    "agg_hll_sketch_union",
    category="agg",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
)
SELECT d, n_exact,
       TRUE AS day_est_ok,
       TRUE AS union_est_ok
FROM daily
""",
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 3.5+
    hll_sketch_agg / hll_union_agg): per-day distinct-user sketches are
    built once, then UNIONED across days for the global estimate — the
    store-small-sketches-not-raw-ids pattern that makes rolling distinct
    counts O(sketch bytes) instead of re-scanning history. Sketch binaries
    are engine-specific, so the driver-checked output follows the repo's
    approximate-operator contract: exact companions + bound flags —
    day_est_ok pins every per-day estimate within 5% of its exact count
    (rsd at lgK=12 is ~1.6%), union_est_ok pins the union estimate
    against the exact global distinct. A wrong merge (double counting,
    dropped register) flips a flag and hash-fails.

    Scale: sketches merge associatively map-side; the union row carries
    ~2 KB per day regardless of event volume.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    ).persist()  # feeds both the per-day rows and the union check
    union_check = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u_est")
    ).crossJoin(
        e.agg(F.countDistinct("user_id").alias("u_exact"))
    ).select(
        (
            F.abs(F.col("u_est") - F.col("u_exact"))
            <= 0.05 * F.col("u_exact")
        ).alias("union_est_ok")
    )
    result = (
        daily.select(
            "d",
            "n_exact",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("day_est_ok"),
        )
        .crossJoin(F.broadcast(union_check))
    )
    try:
        # one row per day — materialize, then release the sketch cache so
        # full-registry batteries don't accumulate cached blocks
        result = result.localCheckpoint()
    finally:
        daily.unpersist()
    return result


@register(
    "agg_sprt_sequential",
    category="agg",
    oracle="""
WITH seq AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS tts, event_id,
         CASE WHEN value > 50.0 THEN 405465 ELSE -133531 END AS inc
  FROM events
),
walk AS (
  SELECT event_type, event_id,
         SUM(inc) OVER (PARTITION BY event_type ORDER BY tts, event_id
                        ROWS UNBOUNDED PRECEDING) AS llr,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tts, event_id)
           AS n
  FROM seq
),
crossing AS (
  SELECT event_type, n, llr,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rk
  FROM walk WHERE llr >= 2944439 OR llr <= -2944439
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_at_decision,
       CAST(llr AS DOUBLE)/1000000 AS llr_at_decision,
       CASE WHEN llr >= 2944439 THEN 'accept_h1' ELSE 'accept_h0' END
         AS decision
FROM crossing WHERE rk = 1
""",
)
def agg_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test (Wald's SPRT) — always-valid
    sequential monitoring, the fixed-horizon z-test's (agg_abtest_ztest)
    streaming-era sibling: per event type, walk the events in time order
    accumulating the log-likelihood-ratio of 'value > 50' successes
    under H1 (p=0.3) vs H0 (p=0.2), and stop at the FIRST crossing of
    the alpha=beta=0.05 Wald boundaries, reporting the sample size and
    decision at that moment.

    Exactness: the two LLR increments and both boundaries are
    PRECOMPUTED literals on the 1e-6 grid (ln(1.5)=0.405465 etc.), so
    the running sum is integer arithmetic — cumulative double sums
    could disagree across engines' window accumulation orders; integer
    sums cannot. First-crossing selection is a rank over the (tiny)
    crossing set.

    Scale: one exchange on event_type; the walk is an ordered
    cumulative window per type. At 100 TB the same test runs per
    (experiment, variant) key — the partition IS the experiment unit,
    so no partition outgrows its cohort.
    """
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    inc = F.when(F.col("value") > 50.0, F.lit(405465)).otherwise(F.lit(-133531))
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    walk = e.select(
        "event_type", "ts", "event_id", inc.alias("inc")
    ).select(
        "event_type",
        F.sum("inc").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("llr"),
        F.row_number().over(w).alias("n"),
    )
    crossed = walk.filter(
        (F.col("llr") >= 2944439) | (F.col("llr") <= -2944439)
    )
    wf = W.partitionBy("event_type").orderBy("n")
    return (
        crossed.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_at_decision"),
            (F.col("llr").cast("double") / 1_000_000).alias("llr_at_decision"),
            F.when(F.col("llr") >= 2944439, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
    )


@register(
    "agg_diff_in_diff",
    category="agg",
    oracle="""
WITH cells AS (
  SELECT (user_id % 2 = 0) AS treated,
         (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15') AS post,
         CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS s,
         COUNT(*) AS n
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
m AS (
  SELECT
    MAX(CASE WHEN treated AND post THEN s/n END) AS tp,
    MAX(CASE WHEN treated AND NOT post THEN s/n END) AS tpre,
    MAX(CASE WHEN NOT treated AND post THEN s/n END) AS cp,
    MAX(CASE WHEN NOT treated AND NOT post THEN s/n END) AS cpre,
    MAX(CASE WHEN treated AND post THEN n END) AS n_tp,
    MAX(CASE WHEN treated AND NOT post THEN n END) AS n_tpre,
    MAX(CASE WHEN NOT treated AND post THEN n END) AS n_cp,
    MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_cpre
  FROM cells
)
SELECT tp - tpre AS treated_delta,
       cp - cpre AS control_delta,
       (tp - tpre) - (cp - cpre) AS did_effect,
       CAST(n_tp + n_tpre + n_cp + n_cpre AS BIGINT) AS n_total
FROM m
""",
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal estimator for
    natural experiments (a policy lands on 2024-01-15; even user ids are
    the treated group): effect = (treated post-pre delta) minus (control
    post-pre delta), removing both group-level baselines and common time
    trends. The 2x2 cell means use exact scaled-long sums divided by
    counts, then three scalar subtractions — bit-identical across
    engines; the pivot from cells to one row is MAX-of-disjoint-CASE.

    Scale: ONE pass over the filtered facts into 4 cells (map-side
    partials), then scalar math on a 1-row frame. Panel variants (per
    -cohort DiD) just add the cohort key to the groupBy.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # two-phase exact sums: 4 GLOBAL cells over the whole fact table is
    # exactly the low-cardinality case lsum's long accumulator cannot
    # carry at 100 TB (_helpers.py overflow bound) — scaled_group_sums
    # sums longs per partition and merges decimal partials
    cells = scaled_group_sums(
        e.select(
            (F.col("user_id") % 2 == 0).alias("treated"),
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp")).alias("post"),
            "value",
        ),
        keys=["treated", "post"],
        sums={"s": F.col("value")},
        count_alias="n",
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    m = cells.agg(
        (cell(True, True, "s") / cell(True, True, "n")).alias("tp"),
        (cell(True, False, "s") / cell(True, False, "n")).alias("tpre"),
        (cell(False, True, "s") / cell(False, True, "n")).alias("cp"),
        (cell(False, False, "s") / cell(False, False, "n")).alias("cpre"),
        (
            cell(True, True, "n")
            + cell(True, False, "n")
            + cell(False, True, "n")
            + cell(False, False, "n")
        ).cast("long").alias("n_total"),
    )
    return m.select(
        (F.col("tp") - F.col("tpre")).alias("treated_delta"),
        (F.col("cp") - F.col("cpre")).alias("control_delta"),
        ((F.col("tp") - F.col("tpre")) - (F.col("cp") - F.col("cpre"))).alias("did_effect"),
        "n_total",
    )


@register(
    "agg_cuped_adjustment",
    category="agg",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         (user_id % 2 = 0) AS treated,
         CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
              THEN CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) ELSE 0 END)
              AS DOUBLE)/1000000 AS x,
         CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
              THEN CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) ELSE 0 END)
              AS DOUBLE)/1000000 AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(x*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS sx,
         CAST(SUM(CAST(FLOOR(y*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS sy,
         CAST(SUM(CAST(FLOOR(x*x*1000 + 0.5) AS BIGINT)) AS DOUBLE)/1000 AS sxx,
         CAST(SUM(CAST(FLOOR(x*y*1000 + 0.5) AS BIGINT)) AS DOUBLE)/1000 AS sxy
  FROM per_user
),
theta AS (
  SELECT n, sx, sy,
         (sxy - sx*sy/n) / (sxx - sx*sx/n) AS th
  FROM mom
)
SELECT p.treated,
       COUNT(*) AS n_users,
       CAST(SUM(CAST(FLOOR(p.y*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000
         / COUNT(*) AS mean_y,
       CAST(SUM(CAST(FLOOR((p.y - t.th*(p.x - t.sx/t.n))*1000 + 0.5) AS BIGINT)) AS DOUBLE)/1000
         / COUNT(*) AS mean_y_cuped
FROM per_user p CROSS JOIN theta t
GROUP BY p.treated
""",
)
def agg_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the experimentation-platform staple:
    each user's post-period metric Y is adjusted by their PRE-period
    covariate X (Y' = Y - theta*(X - mean X), theta = cov(X,Y)/var(X)),
    shrinking variance without biasing the treatment contrast because
    X predates the experiment. Output: per-variant raw and
    CUPED-adjusted means.

    Exactness: per-user X/Y and all four moments are scaled-long exact
    sums (products x*x, x*y carry more decimals, so they round to the
    1e-3 grid — disclosed, identical on both engines); theta and the
    per-user adjustment are scalar double expressions, and the adjusted
    values re-enter an exact grid sum before the mean division.

    Scale: one pass to per-user rows, one tiny moment row broadcast
    back, one grouped pass for the variant means — no quadratic stage.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cut = F.lit("2024-01-15").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("ts") < cut, lng(F.col("value"))).otherwise(F.lit(0))).cast("double")
            / 1_000_000
        ).alias("x"),
        (
            F.sum(F.when(F.col("ts") >= cut, lng(F.col("value"))).otherwise(F.lit(0))).cast("double")
            / 1_000_000
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2 == 0).alias("treated"), "x", "y"
    )

    def g3(col):  # 1e-3 grid for the squared/product terms
        return F.sum(F.floor(col * 1_000 + F.lit(0.5)).cast("long")).cast("double") / 1_000

    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(lng(F.col("x"))).cast("double") / 1_000_000).alias("sx"),
        g3(F.col("x") * F.col("x")).alias("sxx"),
        g3(F.col("x") * F.col("y")).alias("sxy"),
        (F.sum(lng(F.col("y"))).cast("double") / 1_000_000).alias("sy"),
    ).select(
        "n", "sx",
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
         / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))).alias("th"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).select(
        "treated", "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("sx") / F.col("n"))).alias("y_adj"),
    )
    return adj.groupBy("treated").agg(
        F.count(F.lit(1)).alias("n_users"),
        ((F.sum(lng(F.col("y"))).cast("double") / 1_000_000) / F.count(F.lit(1))).alias("mean_y"),
        (g3(F.col("y_adj")) / F.count(F.lit(1))).alias("mean_y_cuped"),
    )
