"""SURVEY.md §2.E — window functions.

Each window spec = one shuffle on the partition key + per-partition sort.
Ordering keys always include a unique tiebreaker (orderkey/event_id) so
results are deterministic and oracle-matchable. Window sums of doubles use
the decimal discipline (see operators/_helpers.py).

Scale note: a window partitioned by a high-cardinality key (customer,
user) distributes evenly; the anti-pattern is an un-partitioned global
window (single task) — none here except where the data is one group by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import lng


@register(
    "win_ranking",
    category="windows",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 9) AS prnk,
       NTILE(4)       OVER w AS quartile
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_topk_per_group",
    category="windows",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. At scale this is the right top-k-per-group:
    rank is computed per partition after one shuffle; no global sort."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_lag_lead",
    category="windows",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       LAG(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts,
       LEAD(CAST(ts AS TIMESTAMP), 1) OVER w AS next_ts,
       LAG(value, 1, -1.0) OVER w AS prev_value
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults — NULLs manufactured at partition edges."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts", 1).over(w).alias("prev_ts"),
        F.lead("ts", 1).over(w).alias("next_ts"),
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
    )


@register(
    "win_running_sum",
    category="windows",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
            OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_qty
FROM lineitem
WHERE l_orderkey < 5000
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "win_sliding_avg",
    category="windows",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS sliding_avg
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
""",
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average ±3 rows (avg = exact decimal sum / count, so both
    engines do the identical double division)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 3)
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("sliding_avg"),
    )


@register(
    "win_range_frame",
    category="windows",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
            OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_within_5
FROM lineitem
WHERE l_orderkey < 2000
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering column (peers included by value)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = W.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count(F.lit(1)).over(w).alias("n_within_5"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).over(w)
        .cast("double")
        .alias("qty_within_5"),
    )


@register(
    "win_first_last_nth",
    category="windows",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS biggest_order,
       LAST_VALUE(o_orderkey)  OVER w AS smallest_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_biggest
FROM orders
WHERE o_custkey < 40
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over the FULL frame (the default running frame makes
    last_value useless — classic trap, pinned explicitly on both engines)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("biggest_order"),
        F.last("o_orderkey").over(w).alias("smallest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_biggest"),
    )


@register(
    "win_sessionize",
    category="windows",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM s
GROUP BY user_id, session_id
""",
)
def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared gap-based sessionization core (30-min): lag -> new-session
    flag -> running sum = session id -> per-session rollup.

    The gap compares microsecond-exact epochs (unix_micros), matching the
    DuckDB oracle's `> INTERVAL 30 MINUTE` exact-interval semantics — a
    cast('long') would truncate to seconds and diverge for gaps within 1 s
    of exactly 1800 s."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias(
            "is_new"
        ),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min): lag -> new-session flag ->
    running sum = session id -> per-session rollup. Two shuffles total
    (window + final agg share the user_id key, so AQE can reuse the
    exchange). This is the batch twin of stream_session_window."""
    return _sessionized(spark, sf_dir)


@register(
    "win_sessionize_stats",
    category="windows",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
),
sess AS (
  SELECT user_id, session_id,
         COUNT(*) AS n_events,
         MIN(ts) AS session_start,
         MAX(ts) AS session_end
  FROM s
  GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       MAX(n_events) AS max_session_events,
       MIN(session_start) AS first_start,
       MAX(session_end) AS last_end
FROM sess
GROUP BY user_id
""",
)
def win_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization rolled up to per-user stats. Computes strictly MORE
    than win_sessionize (same lag/cumsum/per-session agg plus one further
    user-level agg) but emits ~n_users rows instead of ~n_sessions — the
    driver-transfer shape a 100 TB report actually collects. This is the
    benchmarked sessionize variant (BASELINE 'sessionize events' row);
    win_sessionize keeps the per-session output as the row-level oracle."""
    return _sessionized(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.max("n_events").alias("max_session_events"),
        F.min("session_start").alias("first_start"),
        F.max("session_end").alias("last_end"),
    )


@register(
    "win_funnel_stages",
    category="windows",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id,
       v.t_view,
       c.t_click,
       p.t_purchase,
       1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS stage_reached
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
)
def win_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> later click -> later purchase)
    per user: the MATCH_RECOGNIZE-style sequential-pattern query, done as
    chained first-occurrence-after-anchor aggregations.

    Each stage is one filtered groupBy on user_id — at scale, three
    shuffles on the SAME key, which AQE + identical partitioning turn
    into co-located exchanges (no re-shuffle of the later stages'
    probe side after the first). Strictly-greater anchors make the result
    tie-deterministic on both engines.
    """
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNull(), 0).otherwise(1)
                + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
            ).alias("stage_reached"),
        )
    )


@register(
    "win_range_time_interval",
    category="windows",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       COUNT(*) OVER w AS n_prev_30m,
       CAST(SUM(CAST(value AS DECIMAL(30,12))) OVER w AS DOUBLE) AS sum_30m
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
""",
)
def win_range_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, rolling 30-minute trailing
    count/sum keyed by the TIMESTAMP itself (not row offsets) — the
    'activity in the last N minutes' feature. Rows with equal timestamps
    are frame-PEERS under RANGE on both engines, so ties are inherently
    deterministic; the decimal sum keeps the double aggregation
    order-insensitive."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    # unix_micros, not cast('long'): second truncation would silently
    # diverge from the oracle's exact INTERVAL semantics for events within
    # 1s of the frame edge (the win_sessionize lesson, ADVICE r1)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-1800 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_prev_30m"),
        F.sum(F.col("value").cast("decimal(30,12)"))
        .over(w)
        .cast("double")
        .alias("sum_30m"),
    )


@register(
    "win_cumulative_distinct",
    category="windows",
    oracle="""
WITH firsts AS (
  SELECT event_type, user_id,
         MIN(CAST(ts AS TIMESTAMP)) AS first_ts
  FROM events GROUP BY event_type, user_id
), daily AS (
  SELECT event_type, CAST(date_trunc('day', first_ts) AS DATE) AS day,
         COUNT(*) AS new_users
  FROM firsts GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
         AS distinct_users_to_date
FROM daily
""",
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over an ordered window — 'unique users to
    date per event type'. Neither Spark nor ANSI allows COUNT(DISTINCT)
    OVER, so this is the canonical rewrite: reduce each (type, user) to
    its FIRST appearance, roll first-appearances up to daily new-user
    counts, then a running sum per type. Two keyed shuffles ((type,user)
    then (type,day) — both high-cardinality and skew-free) replace an
    unbounded per-row distinct state; at 100 TB the first groupBy is the
    only pass over raw events and map-side partials shrink it to one row
    per (type,user)."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(F.min("ts").alias("first_ts"))
    daily = firsts.groupBy(
        "event_type", F.date_trunc("day", "first_ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = W.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("distinct_users_to_date"),
    )


@register(
    "win_zscore_outliers",
    category="windows",
    oracle="""
WITH s AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,12))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(30,12)) * CAST(value AS DECIMAL(30,12)))
              OVER w AS DOUBLE) AS sxx
  FROM events
  WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, value,
       ROUND((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS zscore
FROM s
WHERE n >= 5
  AND (sxx - sx * sx / n) / (n - 1) > 1e-12
  AND abs((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1))) > 2
""",
)
def win_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value against the
    mean/std of the SAME user's trailing 20 events (frame excludes the
    current row — self-exclusion avoids masking). Mean and variance come
    from exact decimal sums (sx, sxx), so the z-score is a chain of
    scalar IEEE double ops — bit-identical across engines — rather than
    an engine-specific Welford stddev. One shuffle on user_id; the rows
    frame is O(1) running state per partition at any scale."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    dv = v.cast("decimal(30,12)")
    s = e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dv).over(w).cast("double").alias("sx"),
        F.sum(dv * dv).over(w).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    z = (v - sx / n) / F.sqrt(var)
    return s.filter((n >= 5) & (var > 1e-12) & (F.abs(z) > 2)).select(
        "event_id", "user_id", "ts", "value", F.round(z, 6).alias("zscore")
    )


@register(
    "win_period_over_period",
    category="windows",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) AS revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT day, n, revenue,
       LAG(revenue, 1) OVER w AS prev_day,
       ROUND((revenue - LAG(revenue, 1) OVER w)
             / NULLIF(LAG(revenue, 1) OVER w, 0) * 100, 6) AS dod_pct,
       LAG(revenue, 7) OVER w AS prev_week,
       ROUND((revenue - LAG(revenue, 7) OVER w)
             / NULLIF(LAG(revenue, 7) OVER w, 0) * 100, 6) AS wow_pct
FROM daily
WINDOW w AS (ORDER BY day)
""",
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period deltas: daily purchase revenue with
    day-over-day and week-over-week percentage change via LAG(1)/LAG(7).
    The raw-event aggregation carries the only real shuffle (map-side
    partials); the lag window runs over the tiny daily frame — ordered
    but O(days), so the single-partition window is free at any raw-data
    scale. Revenue is a decimal-exact sum; the pct change is scalar
    double math rounded well above noise."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,12)")).cast("double").alias("revenue"),
    )
    w = W.orderBy("day")
    rev, p1, p7 = F.col("revenue"), F.lag("revenue", 1).over(w), F.lag("revenue", 7).over(w)
    return daily.select(
        "day",
        "n",
        "revenue",
        p1.alias("prev_day"),
        F.round((rev - p1) / F.nullif(p1, F.lit(0)) * 100, 6).alias("dod_pct"),
        p7.alias("prev_week"),
        F.round((rev - p7) / F.nullif(p7, F.lit(0)) * 100, 6).alias("wow_pct"),
    )


@register(
    "win_gaps_islands",
    category="windows",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), anchored AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM days
)
SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end,
       COUNT(*) AS n_days
FROM anchored
GROUP BY user_id, anchor
HAVING COUNT(*) >= 3
""",
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active DAYS per user
    (streak detection), via the anchor trick — day minus row_number() is
    constant within a consecutive run, so one window pass + one group-by
    finds every island with no self-join and no iteration. Both shuffles
    key on user_id (high cardinality, even); contrast with win_sessionize,
    which islands by time GAP rather than calendar adjacency."""
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn("anchor", F.date_sub("day", F.row_number().over(w)))
    return (
        anchored.groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= 3)
        .select("user_id", "island_start", "island_end", "n_days")
    )


@register(
    "win_moving_median",
    category="windows",
    oracle="""
SELECT event_id, user_id, ts, value,
       ROUND(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
FROM events
WHERE user_id < 150
""",
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median (robust rolling center, 7-row trailing frame) — the
    outlier-resistant twin of win_sliding_avg. Spark's exact `percentile`
    runs as a window aggregate over the rows frame: one shuffle on
    user_id, per-partition sort, O(frame) heap per row — no UDF, no
    collect_list+sort in Python. Interpolation at even frame sizes is the
    same midpoint-average in Spark percentile and DuckDB median; rounded
    at 6 dp, far above double noise."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med7"),
    )


@register(
    "win_ewma",
    category="windows",
    oracle="""
SELECT event_id, user_id, ts, value,
       list_reduce(
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         (acc, x) -> CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * acc
       ) AS ewma10
FROM events
WHERE user_id < 150
""",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.5) over each user's
    trailing 10 events. EWMA's recurrence (acc = a*x + (1-a)*acc) is not a
    mergeable window aggregate, and the closed-form sum of a*(1-a)^k * x_k
    overflows for deep partitions; instead the frame's values are gathered
    with collect_list over a bounded ROWS frame and folded JVM-side with
    the higher-order aggregate() — O(frame) per row, no Python, no state
    beyond the 10-row frame at any scale. DuckDB folds the identical list
    with list_reduce (seed = first element on both sides; both fold left
    to right), so the double chain is bit-identical: alpha=0.5 makes BOTH lambda products exact power-of-two
    scalings, so even fused-multiply-add contraction in either engine's
    codegen cannot change a single bit of the fold. Returned UNrounded:
    the dyadic fold results sit on exact decimal ties where the engines'
    round() directions diverge — bit-equality needs no rounding."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        ewma.alias("ewma10"),
    )


@register(
    "win_rolling_corr",
    category="windows",
    oracle="""
WITH lagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         LAG(value) OVER (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
  FROM events
  WHERE user_id < 150
),
s AS (
  SELECT event_id, user_id, ts, value, prev,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,12))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(prev  AS DECIMAL(30,12))) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(value AS DECIMAL(30,12)) * CAST(value AS DECIMAL(30,12)))
              OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(prev  AS DECIMAL(30,12)) * CAST(prev  AS DECIMAL(30,12)))
              OVER w AS DOUBLE) AS syy,
         CAST(SUM(CAST(value AS DECIMAL(30,12)) * CAST(prev  AS DECIMAL(30,12)))
              OVER w AS DOUBLE) AS sxy
  FROM lagged
  WHERE prev IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS corr20
FROM s
WHERE n >= 5
  AND n * sxx - sx * sx > 1e-9
  AND n * syy - sy * sy > 1e-9
""",
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lag-1 autocorrelation of each user's value series over a
    trailing 20-row frame — the signal-stability feature a time-series
    curation pass computes per entity. Same exact-decimal discipline as
    win_zscore_outliers: the five frame sums (sx, sy, sxx, syy, sxy)
    accumulate as DECIMAL(30,12) (order-insensitive, cluster-reorder
    safe), and Pearson r comes out of the n-scaled closed form as a
    chain of scalar IEEE double ops — bit-identical across engines,
    rounded at 6 dp. One shuffle on user_id serves BOTH the lag and the
    frame window (same partitioning); O(1) running state per row."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w0 = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lagged = e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w0).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    w = w0.rowsBetween(-19, 0)
    dx = F.col("value").cast("decimal(30,12)")
    dy = F.col("prev").cast("decimal(30,12)")
    s = lagged.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dx).over(w).cast("double").alias("sx"),
        F.sum(dy).over(w).cast("double").alias("sy"),
        F.sum(dx * dx).over(w).cast("double").alias("sxx"),
        F.sum(dy * dy).over(w).cast("double").alias("syy"),
        F.sum(dx * dy).over(w).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    corr = (n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary))
    return s.filter((n >= 5) & (varx > 1e-9) & (vary > 1e-9)).select(
        "event_id", "user_id", "ts", F.round(corr, 6).alias("corr20")
    )


@register(
    "win_mad_outliers",
    category="windows",
    oracle="""
WITH s AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         list_sort(list(value) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
           AS l
  FROM events
  WHERE user_id < 150
),
m AS (
  SELECT event_id, user_id, ts, value, l, len(l) AS n,
         CASE WHEN len(l) % 2 = 1 THEN l[(len(l) + 1) // 2]
              ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0 END AS med
  FROM s
),
d AS (
  SELECT event_id, user_id, ts, value, n, med,
         list_sort(list_transform(l, x -> abs(x - med))) AS dl
  FROM m
)
SELECT event_id, user_id, ts, value, med,
       CASE WHEN n % 2 = 1 THEN dl[(n + 1) // 2]
            ELSE (dl[n // 2] + dl[n // 2 + 1]) / 2.0 END AS mad
FROM d
WHERE n >= 7
  AND (CASE WHEN n % 2 = 1 THEN dl[(n + 1) // 2]
            ELSE (dl[n // 2] + dl[n // 2 + 1]) / 2.0 END) > 1e-12
  AND abs(value - med)
      > 3 * (CASE WHEN n % 2 = 1 THEN dl[(n + 1) // 2]
                  ELSE (dl[n // 2] + dl[n // 2 + 1]) / 2.0 END)
""",
)
def win_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling outliers: |x - median| > 3 * MAD over each user's
    trailing 15 events. The z-score's mean/std break down when the window
    itself contains outliers; median/MAD is the robust pair every
    anomaly pipeline reaches for next. The frame's values are gathered
    once (collect_list over a bounded ROWS frame) and BOTH medians come
    from explicit sorted-array midpoint formulas rather than engine
    median() — sorting, abs, and the midpoint (a+b)/2 are all exact
    double ops, so the result is bit-identical with NO rounding. O(frame
    log frame) per row, one shuffle on user_id."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-14, 0)
    )
    l = F.sort_array(F.collect_list("value").over(w))
    s = e.select("event_id", "user_id", "ts", "value", l.alias("l"))
    n = F.size("l")

    def _median(arr, m):
        return F.when(
            m % 2 == 1, F.element_at(arr, ((m + 1) / 2).cast("int"))
        ).otherwise(
            (
                F.element_at(arr, (m / 2).cast("int"))
                + F.element_at(arr, (m / 2 + 1).cast("int"))
            )
            / 2.0
        )

    m = s.select(
        "event_id", "user_id", "ts", "value", "l",
        n.alias("n"),
        _median(F.col("l"), n).alias("med"),
    )
    dl = F.sort_array(
        F.transform(F.col("l"), lambda x: F.abs(x - F.col("med")))
    )
    d = m.select(
        "event_id", "user_id", "ts", "value", "med", "n", dl.alias("dl")
    )
    mad = _median(F.col("dl"), F.col("n"))
    return d.filter(
        (F.col("n") >= 7)
        & (mad > 1e-12)
        & (F.abs(F.col("value") - F.col("med")) > 3 * mad)
    ).select("event_id", "user_id", "ts", "value", "med", mad.alias("mad"))


@register(
    "win_drawdown",
    category="windows",
    oracle="""
WITH s AS (
  SELECT user_id, value,
         MAX(value) OVER (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(peak) AS max_peak,
       MAX(peak - value) AS max_drawdown
FROM s GROUP BY user_id
""",
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: running peak minus current value,
    maximized — the canonical running-extreme window (finance drawdown,
    SLA worst-regression, watermark lag). Comparisons and one double
    subtraction only, so the result is bit-exact with no rounding and no
    decimal scaffolding. One shuffle on user_id; the running max is O(1)
    state per row at any scale, and the rollup is a mergeable
    aggregate."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    s = e.select(
        "user_id", "value", F.max("value").over(w).alias("peak")
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("peak").alias("max_peak"),
        F.max(F.col("peak") - F.col("value")).alias("max_drawdown"),
    )


@register(
    "win_ohlc_resample",
    category="windows",
    oracle="""
SELECT user_id,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(value, lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR),
                           20, '0') || lpad(CAST(event_id AS VARCHAR), 12, '0'))
         AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR),
                           20, '0') || lpad(CAST(event_id AS VARCHAR), 12, '0'))
         AS close
FROM events
WHERE user_id < 50
GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
""",
)
def win_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per user per hour, the open (first value by
    time), high, low, and close (last value by time) — the canonical
    timeseries downsample (candlesticks, sensor rollups). open/close use
    min_by/max_by over a zero-padded (epoch-micros, event_id) string key
    (lexicographic == numeric; DuckDB's arg_min rejects struct keys), so
    ties at the same microsecond resolve identically on both engines. One shuffle on the
    (user, bar) key with mergeable partials — min_by/max_by carry a
    single (key, value) pair per partial, so the bar never needs the
    row stream sorted (contrast the window formulation, which would
    total-sort every partition)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    tkey = F.format_string(
        "%020d%012d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("bar_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", tkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tkey).alias("close"),
        )
    )


@register(
    "win_markov_transitions",
    category="windows",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (
  SELECT prev_type, SUM(n) AS n_from FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.next_type,
       CAST(p.n AS BIGINT) AS n,
       round(p.n * 1.0 / t.n_from, 9) AS p_transition
FROM pairs p JOIN tot t ON t.prev_type = p.prev_type
""",
)
def win_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the user-journey model
    behind churn prediction and anomalous-session scoring. One lag over
    the (user, time, id) ordering — the same single user_id exchange the
    sessionize family reuses — then two tiny keyed rollups; probabilities
    are IEEE divisions of exact counts, rounded once at the edge. The
    matrix is |types|^2 rows regardless of data volume, so the result is
    broadcastable back onto the stream for per-transition surprise
    scoring at 100 TB."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.col("n_from"), 9).alias("p_transition"),
    )


@register(
    "win_cusum_changepoint",
    category="windows",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
cum AS (
  SELECT day, y_c,
         CAST(SUM(y_c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS run,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(SUM(y_c) OVER () AS BIGINT) AS total,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
scored AS (
  SELECT day, y_c, n, run*n - t*total AS c_l,
         MAX(abs(run*n - t*total)) OVER () AS max_l
  FROM cum
)
SELECT day,
       CAST(y_c AS DOUBLE)/100 AS y,
       CAST(c_l AS DOUBLE)/n/100 AS cusum,
       abs(c_l) = max_l
         AND day = MIN(CASE WHEN abs(c_l) = max_l THEN day END) OVER ()
         AS is_changepoint
FROM scored
""",
)
def win_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily order revenue: the running
    sum of deviations from the global mean, whose maximum absolute
    excursion marks the most likely level-shift day (the classic
    offline CUSUM estimator; the ops companion to etl_drift_psi and
    agg_ks_test, which test WHETHER distributions moved — this locates
    WHEN the level moved). Every comparison runs in integer arithmetic:
    daily revenue in exact cents, and the mean-deviation cumsum
    cross-multiplied by n (run*n - t*total) so no division happens
    before the argmax; the two edge divisions produce the same double
    on both engines by construction. Ties break to the earliest day.

    Scale shape: identical to agg_seasonal_decompose — one map-combined
    daily groupBy over orders, then windows over the calendar-bounded
    series. The cross-multiplied longs hold to ~9e18 / (n * daily
    cents), comfortable for decades of days; beyond that the compare
    column upgrades to DECIMAL(38,0)."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    wrun = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    cum = daily.select(
        "day",
        "y_c",
        F.sum("y_c").over(wrun).alias("run"),
        F.row_number().over(W.orderBy("day")).cast("long").alias("t"),
        F.sum("y_c").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    c_l = F.col("run") * F.col("n") - F.col("t") * F.col("total")
    scored = cum.select(
        "day",
        "y_c",
        "n",
        c_l.alias("c_l"),
        F.max(F.abs(c_l)).over(wall).alias("max_l"),
    )
    at_max = F.abs(F.col("c_l")) == F.col("max_l")
    first_max = F.min(F.when(at_max, F.col("day"))).over(wall)
    return scored.select(
        "day",
        (F.col("y_c").cast("double") / 100).alias("y"),
        (F.col("c_l").cast("double") / F.col("n") / 100).alias("cusum"),
        (at_max & (F.col("day") == first_max)).alias("is_changepoint"),
    )


@register(
    "win_bollinger_bands",
    category="windows",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
grid AS (
  SELECT day, y_c, CAST((y_c - y_c % 100)/100 AS BIGINT) AS y_d FROM daily
),
win AS (
  SELECT day, y_c,
         CAST(SUM(y_c) OVER w AS BIGINT) AS s,
         CAST(SUM(y_d) OVER w AS BIGINT) AS sd_sum,
         CAST(SUM(y_d*y_d) OVER w AS BIGINT) AS s2d,
         COUNT(*) OVER w AS cnt
  FROM grid
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
bands AS (
  SELECT day, y_c, cnt,
         CAST(s AS DOUBLE)/7/100 AS mid,
         2*sqrt((CAST(s2d AS DOUBLE)
                 - CAST(sd_sum AS DOUBLE)*CAST(sd_sum AS DOUBLE)/7)/6)
           AS band_w
  FROM win
)
SELECT day,
       CAST(y_c AS DOUBLE)/100 AS y,
       CASE WHEN cnt = 7 THEN mid END AS mid,
       CASE WHEN cnt = 7 THEN mid + band_w END AS upper_band,
       CASE WHEN cnt = 7 THEN mid - band_w END AS lower_band,
       CASE WHEN cnt = 7 THEN
         CAST(y_c AS DOUBLE)/100 > mid + band_w
         OR CAST(y_c AS DOUBLE)/100 < mid - band_w
       END AS is_breakout
FROM bands
""",
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily revenue: trailing 7-row mean +/- 2
    rolling standard deviations, with breakout flags where the day
    pierces a band — the volatility-envelope anomaly monitor (the
    rolling companion to win_zscore_outliers' global-stats z-scores).
    The window sums (cents and squared cents) stay exact LONGS — at the
    7-row frame the squared-cent sum holds to ~1e9-cent days, three
    orders above the fixture — and mean/sd/bands are one scalar IEEE
    chain written in the identical operation order on both engines;
    the breakout comparison therefore compares identical doubles.
    Bands are NULL until the frame fills (first 6 days).

    Scale shape: the one real pass is the daily groupBy; the window
    runs over the calendar-bounded series (agg_seasonal_decompose's
    argument). Beyond long range the window sums upgrade to
    DECIMAL(38,0) partials unchanged."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    grid = daily.select(
        "day",
        "y_c",
        ((F.col("y_c") - F.col("y_c") % 100) / 100)
        .cast("long")
        .alias("y_d"),
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    win = grid.select(
        "day",
        "y_c",
        F.sum("y_c").over(w).alias("s"),
        F.sum("y_d").over(w).alias("sd_sum"),
        F.sum(F.col("y_d") * F.col("y_d")).over(w).alias("s2d"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    y = F.col("y_c").cast("double") / 100
    mid = F.col("s").cast("double") / 7 / 100
    band_w = 2 * F.sqrt(
        (
            F.col("s2d").cast("double")
            - F.col("sd_sum").cast("double")
            * F.col("sd_sum").cast("double")
            / 7
        )
        / 6
    )
    full = F.col("cnt") == 7
    return win.select(
        "day",
        y.alias("y"),
        F.when(full, mid).alias("mid"),
        F.when(full, mid + band_w).alias("upper_band"),
        F.when(full, mid - band_w).alias("lower_band"),
        F.when(full, (y > mid + band_w) | (y < mid - band_w)).alias(
            "is_breakout"
        ),
    )


@register(
    "win_holt_linear",
    category="windows",
    oracle="""
WITH framed AS (
  SELECT event_id, user_id, ts, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
  FROM events
  WHERE user_id < 150
),
folded AS (
  -- state rides as [level, trend], NOT a struct: DuckDB's list_reduce
  -- mutates a struct accumulator field-by-field in declaration order,
  -- so a struct's second field would see the first already updated
  -- (measured); a list constructor evaluates atomically from old state
  SELECT event_id, user_id, ts, value,
         list_reduce(
           list_transform(vals, x -> [x, CAST(NULL AS DOUBLE)]),
           (acc, e) -> CASE WHEN acc[2] IS NULL THEN
               [e[1], e[1] - acc[1]]
             ELSE
               [CAST(0.5 AS DOUBLE)*e[1]
                  + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2]),
                CAST(0.5 AS DOUBLE)
                  *((CAST(0.5 AS DOUBLE)*e[1]
                     + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2])) - acc[1])
                  + CAST(0.5 AS DOUBLE)*acc[2]]
             END
         ) AS st
  FROM framed
)
SELECT event_id, user_id, ts, value,
       st[1] AS level, st[2] AS trend, st[1] + st[2] AS forecast
FROM folded
""",
)
def win_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double exponential) smoothing over each user's
    trailing 10 events: level and trend state evolve by the classic
    recurrence l' = a*x + (1-a)(l+b), b' = g*(l'-l) + (1-g)b with
    a = g = 0.5, plus the one-step-ahead forecast l+b — win_ewma's
    level-only fold upgraded to a STRUCT-state fold (the general
    pattern for any linear-recurrence feature: the accumulator is a
    struct, the lambda the transition). Initialization is the textbook
    l=x1, b=x2-x1, encoded as a NULL-trend sentinel state so the same
    one-pass fold handles it (the t=2 recurrence then reproduces l2=x2
    bit-exactly). alpha=0.5 keeps every multiply an exact power-of-two
    scaling (FMA-proof, the win_ewma argument); both engines fold left
    to right over the identical gathered frame, so results are
    bit-identical UNrounded. Single-event frames report level only
    (trend/forecast NULL).

    Scale shape: one shuffle on user_id, O(frame) fold per row, state
    bounded by the 10-row frame regardless of partition depth."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 150)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)

    def step(acc, e_):
        lp = F.lit(0.5) * e_["l"] + F.lit(0.5) * (acc["l"] + acc["b"])
        bp = F.lit(0.5) * (lp - acc["l"]) + F.lit(0.5) * acc["b"]
        return F.when(
            acc["b"].isNull(),
            F.struct(
                e_["l"].alias("l"), (e_["l"] - acc["l"]).alias("b")
            ),
        ).otherwise(F.struct(lp.alias("l"), bp.alias("b")))

    st = F.aggregate(
        F.slice(
            F.transform(
                vals,
                lambda x: F.struct(
                    x.alias("l"), F.lit(None).cast("double").alias("b")
                ),
            ),
            2,
            F.size(vals) - 1,
        ),
        F.struct(
            F.element_at(vals, 1).alias("l"),
            F.lit(None).cast("double").alias("b"),
        ),
        step,
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("forecast"),
    )


@register(
    "win_seasonal_anomaly",
    category="windows",
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
resid AS (
  SELECT d.day,
         d.y_l - (d.t7 - ((d.t7 % 7) + 7) % 7) / 7
           - (s.s_l - ((s.s_l % (7*s.n_dow)) + 7*s.n_dow) % (7*s.n_dow))
             / (7*s.n_dow) AS r_l
  FROM detr d JOIN season s ON s.dow = d.dow
  WHERE d.cnt = 7
),
m AS (SELECT median(abs(r_l)) AS mad FROM resid)
SELECT r.day,
       CAST(r.r_l AS DOUBLE)/1000000 AS resid,
       CAST(m.mad AS DOUBLE)/1000000 AS mad,
       abs(r.r_l) > 5*m.mad AS is_anomaly
FROM resid r, m
""",
)
def win_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the DESEASONALIZED daily series: residuals
    from the agg_seasonal_decompose pipeline (trend and day-of-week
    effect removed on the exact micro-unit grid) flagged where
    |residual| exceeds 5x the median absolute residual — the robust
    detector that doesn't fire every Saturday the way a raw z-score
    over seasonal data does, and isn't dragged by the outliers it
    hunts (median, not sigma). Residuals stay exact integers; the
    median of integers is at worst a .5 midpoint, so the 5xMAD
    comparison compares exact values on both engines.

    Scale shape: same as the decomposition — one daily groupBy, then
    calendar-bounded windows and a 7-row broadcast join; the MAD is a
    1-row aggregate over the residual series."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(lng(F.col("o_totalprice"))).alias("y_l")
    )
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
        return (x - ((x % d) + d) % d) / d

    t_l = floor_div(F.col("t7"), F.lit(7))
    s_den = 7 * F.col("n_dow")
    s_l = floor_div(F.col("s_l"), s_den)
    resid = (
        detr.filter(F.col("cnt") == 7)
        .join(F.broadcast(season), "dow")
        .select("day", (F.col("y_l") - t_l - s_l).alias("r_l"))
    )
    m = resid.agg(
        F.expr("percentile(abs(r_l), 0.5)").alias("mad")
    )
    return resid.crossJoin(F.broadcast(m)).select(
        "day",
        (F.col("r_l").cast("double") / 1000000).alias("resid"),
        (F.col("mad").cast("double") / 1000000).alias("mad"),
        (F.abs(F.col("r_l")) > 5 * F.col("mad")).alias("is_anomaly"),
    )


@register(
    "win_dau_wau_mau",
    category="windows",
    oracle="""
WITH user_days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
spine AS (SELECT DISTINCT day FROM user_days),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM user_days GROUP BY day
),
wau AS (
  SELECT s.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM spine s JOIN user_days u
    ON u.day BETWEEN s.day - 6 AND s.day
  GROUP BY s.day
),
mau AS (
  SELECT s.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM spine s JOIN user_days u
    ON u.day BETWEEN s.day - 27 AND s.day
  GROUP BY s.day
)
SELECT d.day, d.dau, w.wau, m.mau,
       round(CAST(d.dau AS DOUBLE) / m.mau, 9) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day JOIN mau m ON m.day = d.day
""",
)
def win_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user counts: DAU plus trailing-7-day WAU and
    trailing-28-day MAU per day, and the DAU/MAU stickiness ratio —
    the product-analytics headline row. Rolling DISTINCT does not
    decompose into window sums (a user active twice in the window must
    count once), so the formulation is the scalable one: dedup to
    user-days first (the big shrink — one pass over events), then a
    bounded range join of the day spine against user-days within the
    trailing window, exact distinct per day. Work is |user-days| x
    window-width rows, independent of raw event volume.

    Scale shape: the events-to-user-days dedup is the only pass over
    the fact table; everything after operates on |users| x |days|
    upper-bounded frames with exact integer counts and one edge
    division."""
    e = table(spark, sf_dir, "events")
    user_days = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct().localCheckpoint()
    spine = user_days.select("day").distinct()
    dau = user_days.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau")
    )

    def trailing_distinct(n_days, alias):
        s = spine.select(F.col("day").alias("s_day"))
        return (
            s.join(
                user_days,
                (F.col("day") >= F.date_sub(F.col("s_day"), n_days - 1))
                & (F.col("day") <= F.col("s_day")),
            )
            .select(F.col("s_day"), "user_id")
            .distinct()
            .groupBy(F.col("s_day").alias("day"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    wau = trailing_distinct(7, "wau")
    mau = trailing_distinct(28, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(
                F.col("dau").cast("double") / F.col("mau"), 9
            ).alias("stickiness"),
        )
    )


@register(
    "win_top_paths",
    category="windows",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
),
ranked AS (
  SELECT user_id, session_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rn
  FROM s
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3
  GROUP BY user_id, session_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions, rk
FROM (SELECT path, COUNT(*) AS c,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rk
      FROM paths GROUP BY path)
JOIN paths USING (path)
GROUP BY path, rk
HAVING rk <= 10
""",
)
def win_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the first three event types of every
    30-minute session, joined into a path string, ranked by frequency
    (top 10) — the "how do sessions start" readout behind onboarding
    and funnel design (win_markov_transitions gives the one-step
    chain; paths keep the actual ordered prefix). Path assembly uses
    ordered string aggregation (the agg_string_agg determinism
    discipline); ranking ties break on the path string.

    Scale shape: sessionization's user_id shuffle, a per-session
    window, then a path-frequency rollup whose cardinality is bounded
    by |event_types|^3, not by sessions."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag(F.col("ts")).over(w)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    ranked = sess.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number()
        .over(
            W.partitionBy("user_id", "session_id").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    # top-10 via orderBy().limit() -> TakeOrderedAndProject; the rank
    # window then runs over the 10-row pool (a partitionless window over
    # ALL distinct paths would funnel them through one task)
    wtop = W.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counts.orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
        .withColumn("rk", F.row_number().over(wtop))
        .select("path", "n_sessions", "rk")
    )


@register(
    "win_max_concurrency",
    category="windows",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
),
sessions AS (
  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM s GROUP BY user_id, session_id
),
sweep AS (
  SELECT s_start AS at_ts, 1 AS delta, user_id, session_id FROM sessions
  UNION ALL
  SELECT s_end, -1, user_id, session_id FROM sessions
),
running AS (
  SELECT at_ts, delta,
         CAST(SUM(delta) OVER (ORDER BY at_ts, delta DESC,
                               user_id, session_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS concurrent
  FROM sweep
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions) AS n_sessions,
       CAST(MAX(concurrent) AS BIGINT) AS max_concurrent,
       MIN(CASE WHEN concurrent = (SELECT MAX(concurrent) FROM running)
           THEN at_ts END) AS first_peak_ts
FROM running
""",
)
def win_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the +1/-1 interval sweep: every session
    contributes a start (+1) and end (-1) point, the ordered running
    sum is the number of simultaneously open sessions, and its maximum
    (with the earliest time it is reached) is the capacity-planning
    number — "how many concurrent users must we serve". Tie order puts
    starts before ends at the same instant (inclusive overlap), then
    stable keys, so the sweep is deterministic.

    Scale shape (round 6, upgraded from disclosure to implementation):
    the sweep's running sum is the two-pass prefix-sum — range-partition
    the +-1 points by sweep order, cumsum WITHIN each range partition
    (window partitioned by the range id), then add the broadcast
    cumulative delta totals of all earlier ranges. The only window over
    unbounded rows is partitioned; the offsets window runs over
    num_partitions rows. Identical integers to the single-window form
    (exact prefix sums), so the oracle is unchanged."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag(F.col("ts")).over(w)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    sessions = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    ).localCheckpoint()
    sweep = sessions.select(
        F.col("s_start").alias("at_ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_id",
    ).unionAll(
        sessions.select(
            F.col("s_end").alias("at_ts"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_id",
        )
    )
    order_cols = [
        F.asc("at_ts"),
        F.desc("delta"),
        F.asc("user_id"),
        F.asc("session_id"),
    ]
    # pinned: the totals branch and the cumsum join must see ONE
    # materialized range layout — repartitionByRange boundary sampling is
    # not stable across independent evaluations (see
    # _helpers.with_global_rank's consistency note)
    ranged = sweep.repartitionByRange(8, *order_cols).sortWithinPartitions(
        *order_cols
    ).localCheckpoint()
    local = ranged.select(
        "at_ts",
        "delta",
        "user_id",
        "session_id",
        F.shiftright(F.monotonically_increasing_id(), 33)
        .cast("int")
        .alias("_pid"),
    )
    wlocal = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    totals = local.groupBy("_pid").agg(F.sum("delta").alias("_pd"))
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_pd").over(woff), F.lit(0)).alias("_off")
    )
    running = (
        local.withColumn("_cum", F.sum("delta").over(wlocal))
        .join(F.broadcast(offsets), "_pid")
        .select("at_ts", (F.col("_cum") + F.col("_off")).alias("concurrent"))
    )
    n_sessions = sessions.count()
    peak = running.agg(F.max("concurrent").alias("mx"))
    return (
        running.crossJoin(F.broadcast(peak))
        .agg(
            F.max("concurrent").cast("long").alias("max_concurrent"),
            F.min(
                F.when(
                    F.col("concurrent") == F.col("mx"), F.col("at_ts")
                )
            ).alias("first_peak_ts"),
        )
        .select(
            F.lit(n_sessions).cast("long").alias("n_sessions"),
            "max_concurrent",
            "first_peak_ts",
        )
    )


@register(
    "win_rsi",
    category="windows",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
diffs AS (
  SELECT day, y_c,
         y_c - LAG(y_c) OVER (ORDER BY day) AS d
  FROM daily
),
gains AS (
  SELECT day, y_c,
         CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS BIGINT)
           AS gain_sum,
         CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS BIGINT)
           AS loss_sum,
         COUNT(d) OVER w AS n_d
  FROM diffs
  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(y_c AS DOUBLE)/100 AS y,
       CASE WHEN n_d = 14 THEN
         CASE WHEN loss_sum = 0 THEN 100.0
              ELSE 100.0 - 100.0/(1.0 + CAST(gain_sum AS DOUBLE)/loss_sum)
         END
       END AS rsi14
FROM gains
""",
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Relative Strength Index over daily revenue (Cutler's
    simple-average form — the Wilder-smoothed variant is a win_ewma
    style fold; the SMA form is the deterministic window one): RSI =
    100 - 100/(1 + sum(gains)/sum(losses)) over the trailing 14
    deltas, the bounded 0-100 momentum oscillator that completes the
    technical-indicator set (OHLC bars, Bollinger bands, drawdown).
    Gains and losses accumulate as exact cent LONGS; the one division
    chain is identical on both engines, the all-gain edge case pins to
    100 exactly, and warm-up rows (fewer than 14 deltas) stay NULL.

    Scale shape: one daily groupBy, then the calendar-bounded window
    (the agg_seasonal_decompose argument)."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    d = F.col("y_c") - F.lag("y_c").over(W.orderBy("day"))
    diffs = daily.select("day", "y_c", d.alias("d"))
    w = W.orderBy("day").rowsBetween(-13, 0)
    gains = diffs.select(
        "day",
        "y_c",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0))
        .over(w)
        .alias("gain_sum"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0))
        .over(w)
        .alias("loss_sum"),
        F.count("d").over(w).alias("n_d"),
    )
    rsi = F.when(F.col("loss_sum") == 0, 100.0).otherwise(
        100.0
        - 100.0
        / (1.0 + F.col("gain_sum").cast("double") / F.col("loss_sum"))
    )
    return gains.select(
        "day",
        (F.col("y_c").cast("double") / 100).alias("y"),
        F.when(F.col("n_d") == 14, rsi).alias("rsi14"),
    )


_MARKOV_POWER_ITERS = 3


def _markov_stationary_oracle() -> str:
    blocks = []
    prev = "pi0"
    for i in range(1, _MARKOV_POWER_ITERS + 1):
        blocks.append(
            f"""pi{i} AS (
  SELECT m.next_type AS state,
         CAST(SUM(CAST(round(p.prob * m.p, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS prob
  FROM {prev} p JOIN matrix m ON m.prev_type = p.state
  GROUP BY m.next_type
)"""
        )
        prev = f"pi{i}"
    chain = ",\n".join(blocks)
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (SELECT prev_type, SUM(n) AS n_from FROM pairs GROUP BY prev_type),
matrix AS MATERIALIZED (
  SELECT p.prev_type, p.next_type,
         round(p.n * 1.0 / t.n_from, 9) AS p
  FROM pairs p JOIN tot t ON t.prev_type = p.prev_type
),
pi0 AS (
  SELECT prev_type AS state, CAST(0.2 AS DOUBLE) AS prob
  FROM (SELECT DISTINCT prev_type FROM matrix)
),
{chain}
SELECT state, round(prob, 9) AS stationary_prob
FROM {prev}
"""


@register(
    "win_markov_stationary",
    category="windows",
    oracle=_markov_stationary_oracle(),
)
def win_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by power
    iteration: {_MARKOV_POWER_ITERS} unrolled steps of pi' = pi P from
    the uniform start over win_markov_transitions' matrix — the
    long-run where-do-users-spend-time distribution that the one-step
    matrix only implies. Each step rounds the products to the
    9-decimal grid before the exact decimal sum (the ln-discipline
    applied to matrix-vector multiplies), so the whole iteration is
    engine-identical; the fixed prefix is the dedup_components
    convergence discipline.

    Scale shape: the matrix is |types|^2 rows (broadcast-size) — the
    heavy pass is the one sequence window that builds it; each power
    step is a tiny join+rollup."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    matrix = pairs.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        F.round(F.col("n") * 1.0 / F.col("n_from"), 9).alias("p"),
    ).localCheckpoint()
    pi = matrix.select(F.col("prev_type").alias("state")).distinct().select(
        "state", F.lit(0.2).cast("double").alias("prob")
    )
    for _ in range(_MARKOV_POWER_ITERS):
        pi = (
            pi.join(
                matrix, F.col("prev_type") == F.col("state")
            )
            .groupBy(F.col("next_type").alias("new_state"))
            .agg(
                F.sum(
                    F.round(F.col("prob") * F.col("p"), 9).cast(
                        "decimal(30,9)"
                    )
                )
                .cast("double")
                .alias("new_prob")
            )
            .select(
                F.col("new_state").alias("state"),
                F.col("new_prob").alias("prob"),
            )
        )
    return pi.select("state", F.round("prob", 9).alias("stationary_prob"))


@register(
    "win_attribution_last_touch",
    category="windows",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END
           AS click_ts,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(click_ts IGNORE NULLS) OVER w AS last_click_ts,
         last_value(click_id IGNORE NULLS) OVER w AS last_click_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
       CASE WHEN last_click_ts >= ts - INTERVAL 60 MINUTE
            THEN last_click_id END AS attributed_click_id,
       last_click_ts IS NOT NULL
         AND last_click_ts >= ts - INTERVAL 60 MINUTE AS is_attributed
FROM carried
WHERE event_type = 'purchase'
""",
)
def win_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 60-minute lookback, else counts as organic —
    the simplest member of the attribution family and the
    revenue-accounting join every marketing pipeline runs (the
    windowed sibling of join_asof_tolerance: the carried click is a
    strictly-prior last_value IGNORE NULLS, the lookback a
    post-predicate). Clicks and purchases ride ONE window pass per
    user, no self-join; exact interval comparison on microsecond
    timestamps.

    Scale shape: one shuffle on user_id over only the click/purchase
    slice (pushdown on event_type), then per-row predicates."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias(
            "click_ts"
        ),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
    )
    fresh = F.col("last_click_ts") >= F.col("ts") - F.expr(
        "INTERVAL 60 MINUTES"
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("last_click_id")).alias(
            "attributed_click_id"
        ),
        (F.col("last_click_ts").isNotNull() & fresh).alias(
            "is_attributed"
        ),
    )


@register(
    "win_forecast_backtest",
    category="windows",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders GROUP BY 1
),
pred AS (
  SELECT day, y_c,
         LAG(y_c, 7) OVER (ORDER BY day) AS yhat_c
  FROM daily
),
scored AS (
  SELECT y_c, yhat_c, abs(y_c - yhat_c) AS ae
  FROM pred WHERE yhat_c IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       round(CAST(SUM(ae) AS DOUBLE) / COUNT(*) / 100, 9) AS mae,
       round(CAST(SUM(CAST(round(ae * 1.0 / y_c, 9) AS DECIMAL(30,9)))
             AS DOUBLE) / COUNT(*), 9) AS mape,
       round(CAST(SUM(CAST(round(2.0 * ae / (y_c + yhat_c), 9)
                      AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*), 9)
         AS smape
FROM scored
""",
)
def win_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the seasonal-naive baseline (predict today
    = same weekday last week): MAE, MAPE and sMAPE over the daily
    series — the yardstick every real forecaster must beat before it
    earns compute (Holt, the decomposition). Absolute errors are exact
    cent integers, so MAE is an integer sum with one division; the
    percentage errors round each ratio to the 9-decimal grid before
    the exact decimal sum (order-insensitive).

    Scale shape: one daily groupBy + a lag over the calendar-bounded
    series + one rollup row."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    pred = daily.select(
        "y_c", F.lag("y_c", 7).over(W.orderBy("day")).alias("yhat_c")
    ).filter(F.col("yhat_c").isNotNull())
    ae = F.abs(F.col("y_c") - F.col("yhat_c"))
    return pred.agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.round(F.sum(ae).cast("double") / F.count(F.lit(1)) / 100, 9).alias(
            "mae"
        ),
        F.round(
            F.sum(
                F.round(ae * 1.0 / F.col("y_c"), 9).cast("decimal(30,9)")
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mape"),
        F.round(
            F.sum(
                F.round(
                    2.0 * ae / (F.col("y_c") + F.col("yhat_c")), 9
                ).cast("decimal(30,9)")
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("smape"),
    )


@register(
    "win_churn_rate",
    category="windows",
    oracle="""
WITH monthly AS (
  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_custkey
  FROM orders
),
flagged AS (
  SELECT m.month, m.o_custkey,
         n.o_custkey IS NULL AS churned
  FROM monthly m
  LEFT JOIN monthly n
    ON n.o_custkey = m.o_custkey
   AND n.month = CAST(m.month + INTERVAL 1 MONTH AS DATE)
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned,
       round(SUM(CASE WHEN churned THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 9)
         AS churn_rate
FROM flagged
GROUP BY month
""",
)
def win_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly churn: customers active in month m with no order in
    m+1, as a count and rate per month — the retention KPI read from
    the activity matrix (curate_retention_cohort tracks cohorts
    forward; churn is the month-over-month complement). The
    formulation is a self anti-join of the deduped (month, customer)
    activity pairs against the next month — exact calendar arithmetic,
    integer counts, one rate division. The final month's 100% churn is
    the right-censoring artifact every churn dashboard truncates.

    Scale shape: the month-customer dedup is the one pass over orders;
    the self-join keys on (customer, month) — co-partitioned, no
    amplification beyond active months per customer."""
    o = table(spark, sf_dir, "orders")
    monthly = o.select(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("month"),
        "o_custkey",
    ).distinct().localCheckpoint()
    nxt = monthly.select(
        F.add_months(F.col("month"), -1).alias("month"),
        F.col("o_custkey").alias("n_custkey"),
    )
    flagged = monthly.join(
        nxt,
        (F.col("n_custkey") == F.col("o_custkey"))
        & (nxt["month"] == monthly["month"]),
        "left",
    )
    return flagged.groupBy(monthly["month"].alias("month")).agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("n_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_churned"),
        F.round(
            F.sum(F.when(F.col("n_custkey").isNull(), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            9,
        ).alias("churn_rate"),
    )


@register(
    "win_interval_union_length",
    category="windows",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
         epoch_us(CAST(ts AS TIMESTAMP))
           + least(60, greatest(1, CAST(floor(value) AS BIGINT))) * 60000000
           AS end_us
  FROM events
),
flagged AS (
  SELECT user_id, start_us, end_us, event_id,
         CASE WHEN max(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start_us > max(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_new
  FROM iv
),
isl AS (
  SELECT user_id, start_us, end_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY start_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
),
per_island AS (
  SELECT user_id, island_id,
         COUNT(*) AS n_iv, MAX(end_us) - MIN(start_us) AS cov
  FROM isl GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(cov) AS BIGINT) AS covered_us
FROM per_island
GROUP BY user_id
""",
)
def win_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered time of a user's overlapping activity intervals —
    the sweep-line union-of-intervals without any pairwise overlap join.

    Each event opens an interval [ts, ts + min(60, max(1, floor(value)))
    minutes]. The sweep is the classic three-window decomposition over ONE
    partition/order spec (user_id, start, event_id) — so one shuffle and
    one sort total, every frame support-bounded: (1) running max(end) over
    the PRECEDING rows marks an island break when the next start clears
    everything seen, (2) a running sum of break flags numbers the islands,
    (3) per-island max(end)-min(start) is the covered span. All arithmetic
    is integer microseconds (unix_micros), so the result hash-matches the
    oracle exactly — no float summation anywhere. At 100 TB this scales as
    sessionize does: per-user data shuffles once; nothing is quadratic in
    the number of overlapping intervals (the naive pairwise-overlap
    formulation is O(n^2) per user and unusable at scale)."""
    e = table(spark, sf_dir, "events")
    dur_min = F.least(
        F.lit(60), F.greatest(F.lit(1), F.floor(F.col("value")).cast("long"))
    )
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + dur_min * F.lit(60_000_000)).alias(
            "end_us"
        ),
    )
    w = W.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max_end = F.max("end_us").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "start_us",
        "end_us",
        "event_id",
        F.when(
            prev_max_end.isNull() | (F.col("start_us") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    isl = flagged.select(
        "user_id",
        "start_us",
        "end_us",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island_id"),
    )
    per_island = isl.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("end_us") - F.min("start_us")).alias("cov"),
    )
    return per_island.groupBy("user_id").agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("cov").cast("long").alias("covered_us"),
    )


@register(
    "win_time_weighted_avg",
    category="windows",
    oracle="""
WITH seg AS (
  SELECT user_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
           OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
           AS next_us
  FROM events
),
w AS (
  SELECT user_id,
         next_us - t_us AS dur_us,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_grid
  FROM seg WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       round(CAST(SUM(CAST(v_grid AS HUGEINT) * dur_us) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) / 1000000, 9) AS twap
FROM w GROUP BY user_id
""",
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    next one, so its weight is the segment duration — the correct
    average for irregularly-sampled state (sensor readings, prices,
    connection counts), where the row-weighted mean over-counts bursts.
    One window (lead over the user timeline, single shuffle) then one
    groupBy on the same key — the exchange is reused. The weighted sum
    runs entirely on exact integers: value on the 1e-6 grid x duration
    in microseconds, accumulated in DECIMAL(38)/HUGEINT (the products
    reach ~1e23 over multi-year spans — int64 overflows, which ANSI mode
    surfaces loudly), so cross-engine summation order cannot diverge;
    ONE double division at
    the end, 9-dp rounded. The last observation per user has no
    following segment and is excluded (standard left-closed TWAP)."""
    e = table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(t_us, "event_id")
    seg = e.select(
        "user_id",
        lng(F.col("value")).alias("v_grid"),
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("t_us")
    return (
        seg.select("user_id", "v_grid", dur.alias("dur_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("dur_us").cast("long").alias("span_us"),
            F.round(
                F.sum(
                    F.col("v_grid").cast("decimal(38,0)") * F.col("dur_us")
                ).cast("double")
                / F.sum("dur_us").cast("double")
                / 1e6,
                9,
            ).alias("twap"),
        )
    )


@register(
    "win_session_window_native",
    category="windows",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000 AS total_value
FROM s GROUP BY user_id, sid
""",
)
def win_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE session_window() in
    BATCH mode — the built-in that replaces the lag/cumsum decomposition
    (win_sessionize) with one groupBy whose key is the merged session
    interval. Native semantics pin two contracts the hand-rolled form
    must emulate: the session END is last_event + gap (not last event),
    and sessions merge transitively. The oracle recomputes with the
    lag/cumsum formulation and adds the +gap end — so this query
    hash-proves the two formulations equivalent on real data, which is
    exactly the regression you want pinned before swapping one for the
    other in a 100 TB pipeline (the native form aggregates in one pass
    with mergeable partial sessions instead of a window sort)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum(lng(F.col("value"))).cast("double") / 1e6).alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "win_burst_detection",
    category="windows",
    oracle="""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 21600000000 AS b FROM events
),
bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM ev),
spine AS (
  SELECT unnest(range(b0, b1 + 1)) AS b, event_type
  FROM bounds, (SELECT DISTINCT event_type FROM ev) t
),
cnt AS (SELECT event_type, b, count(*) AS c FROM ev GROUP BY 1, 2),
filled AS (
  SELECT s.b, s.event_type, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
  FROM spine s LEFT JOIN cnt c ON c.b = s.b AND c.event_type = s.event_type
),
scored AS (
  SELECT *, CAST(SUM(cnt) OVER w AS BIGINT) AS bsum, COUNT(*) OVER w AS nprev
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY b
               ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, make_timestamp(b * 21600000000) AS bucket_ts, cnt,
       CAST(bsum AS DOUBLE) / 8.0 AS baseline,
       cnt > 1.5 * (CAST(bsum AS DOUBLE) / 8.0) AS is_burst
FROM scored WHERE nprev = 8
""",
)
def win_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over the event stream — the disaster-monitoring
    alarm: per event type, a 6-hour bucket fires when its count exceeds
    1.5x the trailing 2-day (8-bucket) baseline. A dense bucket spine
    (generated from the stream's own bounds — no driver collect) gap
    -fills empty buckets with 0 so the trailing frame is truly 8
    CALENDAR buckets, not 8 observed ones; warm-up rows (fewer than 8
    trailing buckets) are excluded rather than diluted.

    Exactness: integer bucket ids (microseconds div), long counts,
    baseline = long-sum/8.0 — one deterministic double division per row.

    Scale: counts reduce map-side before the one shuffle; the window
    partitions by event type x contiguous time — at 100 TB the same op
    runs per (type, day-range) re-key so no partition exceeds the
    frame's reach, or moves to the streaming twin (stream_sliding_agg).
    """
    _B = 21_600_000_000
    e = table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"unix_micros(ts) div {_B}").alias("b")
    )
    bounds = e.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    types = e.select("event_type").distinct()
    spine = (
        bounds.select(F.explode(F.expr("sequence(b0, b1)")).alias("b"))
        .crossJoin(F.broadcast(types))
    )
    cnt = e.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("c"))
    full = spine.join(cnt, ["event_type", "b"], "left").select(
        "event_type", "b", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("cnt")
    )
    w = W.partitionBy("event_type").orderBy("b").rowsBetween(-8, -1)
    scored = full.select(
        "event_type", "b", "cnt",
        F.sum("cnt").over(w).alias("bsum"),
        F.count(F.lit(1)).over(w).alias("nprev"),
    )
    baseline = F.col("bsum").cast("double") / 8.0
    return scored.filter(F.col("nprev") == 8).select(
        "event_type",
        F.timestamp_micros(F.col("b") * _B).alias("bucket_ts"),
        "cnt",
        baseline.alias("baseline"),
        (F.col("cnt") > 1.5 * baseline).alias("is_burst"),
    )


@register(
    "win_event_pattern_match",
    category="windows",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(s, 'e[^s]*?p')) AS BIGINT) AS n_matches,
       len(regexp_extract_all(s, 'e[^s]*?p')) > 0 AS has_recovery
FROM seq
""",
)
def win_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (the MATCH_RECOGNIZE shape) emulated with
    ordered per-key sequence folding + regex: per user, the event-type
    sequence becomes a compact symbol string ((c)lick (e)rror (p)urchase
    (s)ignup (v)iew, ordered by ts with event_id tiebreak), and the
    pattern 'error, then purchase, with no signup between' = e[^s]*p is
    counted per user with the LAZY quantifier (each match ends at the
    FIRST qualifying purchase — the alert semantics of the streaming
    twin stream_cep_pattern_alert's state machine; leftmost
    non-overlapping scan is identical in Java regex and RE2, so the
    count hash-matches).

    Scale: ONE shuffle on user_id; the per-user string is bounded by the
    user's event count (array_sort on the collected (ts, id, sym)
    structs, then a codegen concat + regexp). At 100 TB the same fold
    runs per (user, session) after sessionize to bound string length —
    pattern semantics are intra-session anyway. This is the batch twin
    of what MATCH_RECOGNIZE/CEP engines do with NFAs; for the fixed
    regular pattern the regex scan IS the NFA.
    """
    e = table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    seq = (
        e.select("user_id", F.struct(F.col("ts"), F.col("event_id"), sym.alias("c")).alias("r"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("r")), lambda r: r["c"])
            ).alias("s")
        )
    )
    n = F.size(F.expr("regexp_extract_all(s, 'e[^s]*?p', 0)"))
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        n.cast("long").alias("n_matches"),
        (n > 0).alias("has_recovery"),
    )
