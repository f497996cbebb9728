"""ETL-floor composite operators (SURVEY §0: read → clean/transform →
join/aggregate → write). These are the pipeline verbs an "Open Disaster
Data Store ETL" runs on every load that the relational inventory doesn't
name directly: merge/upsert of a change batch, unpivot back to long form,
gap-filling resample of a time series, and data-quality profiling.

All pure DataFrame compositions — each one states its 100 TB shape in the
docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from ..session import scratch_dir
from ._helpers import dsum, lng, sql_dsum


@register(
    "etl_merge_upsert",
    category="etl",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey < 10000
),
changes AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       (o_orderkey % 7 = 0 AND o_orderkey < 12000) AS was_upserted
FROM (
  SELECT * FROM changes
  UNION ALL
  SELECT b.* FROM base b ANTI JOIN changes c USING (o_orderkey)
)
""",
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert of a change batch into a base snapshot: changed keys
    replace base rows, new keys append, untouched base rows pass through
    (what MERGE INTO does on a lakehouse table, expressed as
    anti-join + union so it runs on plain parquet).

    Scale: the anti join shuffles on the merge key — same partitioning a
    bucketed base table would give for free; the change batch is usually
    small enough to broadcast, making the merge a single map-side pass
    over the base."""
    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") < 10000).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    changes = (
        o.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 12000))
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
    )
    merged = changes.unionAll(
        base.join(F.broadcast(changes.select("o_orderkey")), "o_orderkey", "left_anti")
    )
    return merged.withColumn(
        "was_upserted",
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 12000),
    )


@register(
    "etl_unpivot",
    category="etl",
    oracle="""
WITH wide AS (
  SELECT o_custkey,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, status, n FROM wide
UNPIVOT (n FOR status IN (n_f AS 'F', n_o AS 'O', n_p AS 'P'))
""",
)
def etl_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) a wide conditional-count table back to long form via
    the native unpivot — the inverse of agg_pivot, a per-row expand with
    no shuffle of its own (only the upstream agg exchanges)."""
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_custkey").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )
    return wide.unpivot(
        ids=["o_custkey"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status",
        valueColumnName="n",
    ).withColumn(
        "status",
        F.upper(F.substring(F.col("status"), 3, 1)),
    )


@register(
    "etl_gapfill_resample",
    category="etl",
    oracle=f"""
WITH days AS (
  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS day
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (SELECT day, event_type FROM days CROSS JOIN types),
actual AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         event_type, COUNT(*) AS n, {sql_dsum("value")} AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT s.day, s.event_type,
       COALESCE(a.n, 0) AS n,
       COALESCE(a.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN actual a USING (day, event_type)
""",
)
def etl_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling daily resample: build a complete (day × event_type)
    spine with sequence()+explode, left-join the actual daily rollup,
    zero-fill the holes — the densification every downstream time-series
    consumer assumes.

    Scale: the spine is days × types (tiny, broadcast); the rollup is the
    only real shuffle and it partially aggregates before exchanging."""
    e = table(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    types = e.select("event_type").distinct()
    spine = days.crossJoin(types)
    actual = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
    return (
        spine.join(F.broadcast(actual), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "etl_dq_profile",
    category="etl",
    oracle="""
SELECT 'o_orderkey' AS col,
       COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_nonnull,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
""",
)
def etl_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (the post-load validation step of every ETL
    run): per column — row count, non-null count, distinct count,
    min/max as strings. One wide aggregate per column family, unioned;
    Spark computes all three profiles in one scan each with partial
    aggregation (COUNT DISTINCT rewrites to expand+two-phase agg)."""
    o = table(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(col)).alias("n_nonnull"),
            F.countDistinct(F.col(col)).alias("n_distinct"),
            F.min(F.col(col)).cast("string").alias("min_val"),
            F.max(F.col(col)).cast("string").alias("max_val"),
        )

    return (
        profile("o_orderkey")
        .unionAll(profile("o_orderstatus"))
        .unionAll(profile("o_totalprice"))
    )


@register(
    "etl_locf_fill",
    category="etl",
    oracle=f"""
WITH days AS (
  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS day
),
users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
spine AS (SELECT day, user_id FROM days CROSS JOIN users),
daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         user_id, {sql_dsum("value")} AS day_value
  FROM events WHERE user_id < 20 GROUP BY 1, 2
)
SELECT s.day, s.user_id,
       last_value(d.day_value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.day
               ROWS UNBOUNDED PRECEDING) AS filled_value
FROM spine s LEFT JOIN daily d USING (day, user_id)
""",
)
def etl_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward) densification: complete
    (day x user) spine, left-join the daily rollup, then carry the last
    non-null value forward with last_value(ignoreNulls) over an ordered
    window — the standard sensor/metrics forward-fill. Complements the
    zero-fill of etl_gapfill_resample.

    Scale: one window pass partitioned by user — the spine join reuses
    the rollup's user partitioning; state per user is a single value."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    users = e.select("user_id").distinct()
    spine = days.crossJoin(users)
    daily = e.groupBy(F.col("ts").cast("date").alias("day"), "user_id").agg(
        dsum(F.col("value")).alias("day_value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return spine.join(F.broadcast(daily), ["day", "user_id"], "left").select(
        "day",
        "user_id",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "etl_scd2",
    category="etl",
    oracle="""
WITH src AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
  FROM orders WHERE o_custkey < 200
),
changed AS (
  SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
           LAG(o_orderpriority) OVER w AS prev_prio
    FROM src
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
  ) WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
)
SELECT o_custkey, o_orderpriority,
       CAST(o_orderdate AS DATE) AS effective_from,
       CAST(LEAD(o_orderdate) OVER w AS DATE) AS effective_to,
       ROW_NUMBER() OVER w AS version,
       LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM changed
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse a per-customer
    change log (orders ordered by date) into versioned rows with
    [effective_from, effective_to) validity ranges and an is_current flag.
    Change detection = lag() over the business key; validity = lead() over
    the surviving change rows. (Reference exposes SCD-style history tables
    via its ETL layer; here it is two window passes over one partitioning.)

    Scale: both windows partition by the dimension key — ONE shuffle,
    reused by the second window (same partitioning). State per key is one
    row; no join, no driver loop. At 100 TB the change log arrives
    pre-bucketed by key and the shuffle disappears entirely."""
    from pyspark.sql import Window as W

    src = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w_log = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changed = (
        src.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn("prev_prio", F.lag("o_orderpriority").over(w_log))
        .filter(
            F.col("prev_prio").isNull()
            | (F.col("prev_prio") != F.col("o_orderpriority"))
        )
    )
    # o_orderkey tiebreaks same-date changes so lead()/row_number() are
    # engine-deterministic
    w_ver = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changed.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("effective_from"),
        F.lead("o_orderdate").over(w_ver).cast("date").alias("effective_to"),
        F.row_number().over(w_ver).alias("version"),
        F.lead("o_orderdate").over(w_ver).isNull().alias("is_current"),
    )


@register(
    "etl_cdc_apply",
    category="etl",
    oracle="""
WITH log AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         CASE event_type WHEN 'signup' THEN 'I'
                         WHEN 'error'  THEN 'D'
                         ELSE 'U' END AS op
  FROM events
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
), stats AS (
  SELECT user_id, COUNT(*) AS n_ops, MIN(ts) AS first_seen, MAX(ts) AS last_seen
  FROM log GROUP BY user_id
)
SELECT r.user_id, r.value AS last_value, r.op AS last_op,
       s.n_ops, s.first_seen, s.last_seen
FROM ranked r JOIN stats s ON r.user_id = s.user_id
WHERE r.rn = 1 AND r.op <> 'D'
""",
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: the event stream read as an I/U/D
    change-log (signup=insert, error=delete, rest=upsert), reduced to the
    final table state by last-writer-wins per key — a key whose latest op
    is a delete vanishes. One shuffle on user_id serves both the
    row_number and the per-key stats (same partitioning, no second
    exchange); at 100 TB this is the standard log-compaction reduce that
    turns a CDC firehose into a snapshot, and the windowed formulation
    beats a groupBy(max_by) only when multiple columns ride along — here
    both run map-side partials first."""
    from pyspark.sql import Window as W

    log = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = log.withColumn("rn", F.row_number().over(w))
    stats = log.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .join(stats, "user_id")
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("op").alias("last_op"),
            "n_ops",
            "first_seen",
            "last_seen",
        )
    )


@register(
    "etl_incremental_agg_merge",
    category="etl",
    oracle="""
SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def etl_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance by MERGEABLE PARTIAL
    STATE: the stream is split at a mid-day cutoff into a 'base' batch
    (already aggregated) and a 'delta' batch; each reduces to
    (count, decimal-sum) state per (type, day); union of states +
    re-aggregation yields EXACTLY the full recompute — which is what the
    oracle computes, so the hash-match proves the merge algebra, not just
    the query. The cutoff lands mid-day (2024-01-15 12:00) so the
    boundary day genuinely merges rows from both batches. This is the
    100 TB pattern: never re-scan history — keep additive state per
    grain, fold each new batch in. Decimal sums (not doubles) make the
    state merge associative and order-free."""
    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 12:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,12)")).alias("sum_state"),
        )

    base = partial(e.filter(F.col("ts") < cutoff))
    delta = partial(e.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_state").cast("double").alias("sum_value"),
        )
    )


@register(
    "etl_snapshot_diff",
    category="etl",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 5 <> 0
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.05
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       old.price AS old_price, new.price AS new_price,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'deleted'
            ELSE 'changed' END AS change_type
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.price <> new.price
""",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: given yesterday's and today's keyed
    snapshots, emit added / deleted / changed rows (the audit step of
    every load into a store without CDC). One full outer shuffle join on
    the key; 'unchanged' rows — the overwhelming majority at scale — are
    filtered before the sink so output ∝ churn, not table size. The two
    snapshots here are deterministic fixture derivations (key-residue
    membership, +5% price on open orders); real use passes two paths.
    Double prices compare bit-exactly: the same IEEE multiply runs on
    both sides, no rounding step to diverge."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice") * 1.05)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    j = old.alias("a").join(
        new.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    a_key, b_key = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    a_price, b_price = F.col("a.price"), F.col("b.price")
    return j.filter(
        a_key.isNull() | b_key.isNull() | (a_price != b_price)
    ).select(
        F.coalesce(a_key, b_key).alias("o_orderkey"),
        a_price.alias("old_price"),
        b_price.alias("new_price"),
        F.when(a_key.isNull(), "added")
        .when(b_key.isNull(), "deleted")
        .otherwise("changed")
        .alias("change_type"),
    )


@register(
    "etl_compaction",
    category="etl",
    heavy=True,
    oracle="""
SELECT event_type, COUNT(*) AS n_rows,
       8 AS files_before, 1 AS files_after
FROM events
GROUP BY event_type
""",
)
def etl_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming sink
    needs: a fragmented partitioned table (8 writer tasks × each
    partition value = 8 small files per partition) is rewritten with the
    shuffle keyed ON the partition column, so every value lands in
    exactly one task and writes exactly one file. File counts are read
    from the filesystem (metadata, not data) and verified against the
    deterministic before/after law; row counts prove the rewrite lost
    nothing. At scale the same job targets a size budget with
    repartitionByRange(partition, bucket) instead of one file per
    value."""
    import os

    e = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    frag_dir = scratch_dir("frag")
    comp_dir = scratch_dir("comp")
    # fragment: spread every event_type across 8 round-robin tasks
    e.repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(
        frag_dir
    )
    frag = spark.read.parquet(frag_dir)
    n_types = frag.select("event_type").distinct().count()
    # compact: key the shuffle on the partition column -> 1 file per value
    frag.repartition(n_types, "event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(comp_dir)

    def files_per_partition(root: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for entry in os.listdir(root):
            if entry.startswith("event_type="):
                val = entry.split("=", 1)[1]
                out[val] = sum(
                    1
                    for f in os.listdir(os.path.join(root, entry))
                    if f.endswith(".parquet")
                )
        return out

    before, after = files_per_partition(frag_dir), files_per_partition(comp_dir)
    counts = (
        spark.read.parquet(comp_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    stats = spark.createDataFrame(
        [(t, before[t], after[t]) for t in sorted(before)],
        "event_type string, files_before int, files_after int",
    )
    return counts.join(F.broadcast(stats), "event_type").select(
        "event_type", "n_rows", "files_before", "files_after"
    )


@register(
    "etl_backfill_dynamic_overwrite",
    category="etl",
    heavy=True,
    oracle=f"""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       COUNT(*) AS n_rows,
       {sql_dsum("CASE WHEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) "
                  "BETWEEN DATE '2024-01-05' AND DATE '2024-01-07' "
                  "THEN value * 2 ELSE value END")} AS sum_value,
       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
         NOT BETWEEN DATE '2024-01-05' AND DATE '2024-01-07' AS files_untouched
FROM events
GROUP BY 1
""",
)
def etl_backfill_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition backfill with DYNAMIC partition overwrite — the
    idempotent correction job a daily-partitioned lake runs when three
    days of data arrive wrong: rewrite ONLY the affected day partitions
    in place (value doubled here), leave every other partition's files
    physically untouched. `files_untouched` is measured from the
    FILESYSTEM (per-partition file listings before vs after), so the
    oracle's day-range law also proves Spark's dynamic overwrite touched
    exactly the targeted partitions — a full-table overwrite or a static
    overwrite (which drops the other partitions) would fail the hash.
    At 100 TB this is the difference between rewriting 3 partitions and
    rewriting the table."""
    import os

    lo, hi = "2024-01-05", "2024-01-07"
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "value",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    )
    base = scratch_dir("backfill")
    e.repartition(4, "day").write.mode("overwrite").partitionBy("day").parquet(base)

    def listing(root: str) -> dict[str, frozenset]:
        out: dict[str, frozenset] = {}
        for entry in os.listdir(root):
            if entry.startswith("day="):
                out[entry] = frozenset(
                    f
                    for f in os.listdir(os.path.join(root, entry))
                    if f.endswith(".parquet")
                )
        return out

    before = listing(base)
    corrected = (
        spark.read.parquet(base)
        .filter(F.col("day").between(lo, hi))
        .withColumn("value", F.col("value") * 2)
    )
    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        corrected.repartition(4, "day").write.mode("overwrite").partitionBy(
            "day"
        ).parquet(base)
    finally:
        spark.conf.set(key, saved) if saved is not None else spark.conf.unset(key)
    after = listing(base)
    untouched = spark.createDataFrame(
        [(d.split("=", 1)[1], before[d] == after.get(d)) for d in sorted(before)],
        "day_str string, files_untouched boolean",
    ).select(F.col("day_str").cast("date").alias("day"), "files_untouched")
    agg = (
        spark.read.parquet(base)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum(F.col("value")).alias("sum_value"))
    )
    return agg.join(F.broadcast(untouched), "day").select(
        "day", "n_rows", "sum_value", "files_untouched"
    )


def _temporal_scd2_oracle() -> str:
    from ..registry import get as _get

    return f"""
WITH dim AS ({_get("etl_scd2").oracle}),
facts AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
  FROM events WHERE user_id < 200
)
SELECT f.event_id, f.user_id, f.event_date,
       d.o_orderpriority AS prio_at_event, d.version
FROM facts f
LEFT JOIN dim d
  ON d.o_custkey = f.user_id
 AND d.effective_from <= f.event_date
 AND (d.effective_to IS NULL OR f.event_date < d.effective_to)
"""


@register(
    "join_temporal_scd2",
    category="etl",
    oracle=_temporal_scd2_oracle(),
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) join: enrich each event with the SCD2
    dimension version valid AT the event's date — the lookup every
    warehouse does when late-arriving facts must see the dimension as it
    was, not as it is. Composes etl_scd2's versioned output (its oracle is
    inlined verbatim, so validity ranges are hash-checked end to end)
    with a half-open [effective_from, effective_to) range predicate.

    Scale: the dimension side is versions-per-key — orders of magnitude
    smaller than the fact stream — so it is BROADCAST and the range
    predicate evaluates map-side with zero fact shuffle. For a dimension
    too big to broadcast, bin the validity intervals by date the way
    join_range_binned does and equi-join on (key, bin). Left join keeps
    facts that precede the first version (NULL dimension columns) —
    dropping them silently is the classic temporal-join bug."""
    from ..registry import get as _get

    dim = _get("etl_scd2").fn(spark, sf_dir)
    facts = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("event_id", "user_id", F.col("ts").cast("date").alias("event_date"))
    )
    d = F.broadcast(dim).alias("d")
    f_ = facts.alias("f")
    return f_.join(
        d,
        (F.col("d.o_custkey") == F.col("f.user_id"))
        & (F.col("d.effective_from") <= F.col("f.event_date"))
        & (
            F.col("d.effective_to").isNull()
            | (F.col("f.event_date") < F.col("d.effective_to"))
        ),
        "left",
    ).select(
        "f.event_id",
        "f.user_id",
        "f.event_date",
        F.col("d.o_orderpriority").alias("prio_at_event"),
        "d.version",
    )


@register(
    "etl_expectations_quarantine",
    category="etl",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 3 = 1 THEN TIMESTAMP '2099-01-01 00:00:00'
              ELSE CAST(o_orderdate AS TIMESTAMP) END AS o_orderdate,
         CASE WHEN o_orderkey % 3 = 2 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus2
  FROM orders WHERE o_orderkey % 97 = 0
),
unioned AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus2, o_totalprice, o_orderdate
  FROM dirty
),
checked AS (
  SELECT *,
         CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END AS v_price,
         CASE WHEN o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'
              THEN 1 ELSE 0 END AS v_date,
         CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END
           AS v_status
  FROM unioned
)
SELECT o_orderkey,
       concat_ws('|',
         CASE WHEN v_price = 1 THEN 'positive_price' END,
         CASE WHEN v_date = 1 THEN 'date_in_range' END,
         CASE WHEN v_status = 1 THEN 'valid_status' END) AS violated,
       CAST(v_price + v_date + v_status AS BIGINT) AS n_violated
FROM checked
WHERE v_price + v_date + v_status > 0
""",
)
def etl_expectations_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-expectations gate with quarantine: a rule stack (price > 0,
    date in range, status in domain) evaluates per row and violating rows
    land in a quarantine table carrying the '|'-joined list of failed
    rules — the auditable reject-reason contract of dbt tests / DLT
    expectations. The fixture orders are clean, so a deterministic dirty
    batch is manufactured (1 in 97 orders re-keyed +1e9 with one of three
    corruptions by key mod 3) — same manufactured-defect pattern the
    dedup family uses.

    Scale: rules are pure per-row expressions — zero shuffles, evaluated
    in one whole-stage-codegen pass at scan time; at 100 TB the pass/
    quarantine split writes two partitioned sinks from one scan. Rule
    verdicts compare raw values (no rounding edge): violations are
    structural, not numeric-tolerance."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    k = F.col("o_orderkey")
    dirty = o.filter(k % 97 == 0).select(
        (k + 1000000000).alias("o_orderkey"),
        "o_custkey",
        F.when(k % 3 == 2, "X").otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(k % 3 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 3 == 1, F.lit("2099-01-01 00:00:00").cast("timestamp"))
        .otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
    )
    unioned = o.unionByName(dirty)
    v_price = F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
    v_date = F.when(
        F.col("o_orderdate") >= F.lit("2002-01-01 00:00:00").cast("timestamp"), 1
    ).otherwise(0)
    v_status = F.when(
        ~F.col("o_orderstatus").isin("O", "F", "P"), 1
    ).otherwise(0)
    checked = unioned.select(
        "o_orderkey",
        v_price.alias("v_price"),
        v_date.alias("v_date"),
        v_status.alias("v_status"),
    )
    return (
        checked.filter(
            F.col("v_price") + F.col("v_date") + F.col("v_status") > 0
        )
        .select(
            "o_orderkey",
            F.concat_ws(
                "|",
                F.when(F.col("v_price") == 1, "positive_price"),
                F.when(F.col("v_date") == 1, "date_in_range"),
                F.when(F.col("v_status") == 1, "valid_status"),
            ).alias("violated"),
            (F.col("v_price") + F.col("v_date") + F.col("v_status"))
            .cast("long")
            .alias("n_violated"),
        )
    )


@register(
    "etl_referential_integrity",
    category="etl",
    oracle="""
SELECT relationship, n_child_rows, n_orphans
FROM (
  SELECT 'lineitem->orders' AS relationship,
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child_rows,
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_orphans
  UNION ALL
  SELECT 'orders->customer',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT)
  UNION ALL
  SELECT 'lineitem->part',
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey))
              AS BIGINT)
  UNION ALL
  SELECT 'lineitem->supplier',
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                 WHERE s.s_suppkey = l.l_suppkey))
              AS BIGINT)
)
""",
)
def etl_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per FK
    relationship, child row count and orphan count (children whose parent
    key has no match) — the load-validation report every warehouse runs
    after ingest, and the one that catches partial loads and
    out-of-order arrivals. Each orphan count is a LEFT ANTI join: the
    parent key column (only) is the build side, so small dims broadcast
    and the fact-side scans stay map-side; counts are tiny aggregates
    unioned into one result. Zero rows expected on the clean fixtures —
    the audit proving a negative IS the artifact."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")

    def audit(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        total = child.agg(F.count(F.lit(1)).alias("n_child_rows"))
        orphans = (
            child.join(
                parent.select(pk), child[ck] == parent[pk], "left_anti"
            ).agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relationship"), "n_child_rows", "n_orphans"
        )

    return (
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("lineitem->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(
            audit("lineitem->supplier", li, "l_suppkey", s, "s_suppkey")
        )
    )


@register(
    "etl_surrogate_keys",
    category="etl",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) AS BIGINT) AS segment_sk,
       CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment, c_custkey) AS BIGINT)
         AS customer_sk
FROM customer WHERE c_custkey < 500
""",
)
def etl_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key assignment — the dimension-load step
    that replaces business keys with dense integers: DENSE_RANK over the
    sorted dimension value for the segment SK, ROW_NUMBER over the full
    unique ordering for the row SK. Determinism is the whole point:
    monotonically_increasing_id() (the tempting shortcut) is
    partition-layout-dependent and changes across runs and engines; a
    rank over a total order is reproducible anywhere, which is what makes
    reloads idempotent and cross-system joins stable.

    Scale shape (round 6): the row SK comes from _helpers.with_global_rank
    — range-partition + local positions + broadcast cumulative offsets —
    so NO partitionless window ever touches the dimension rows (the
    earlier ROW_NUMBER()-over-total-order form funneled the whole dim
    through one task); the segment SK is a rank over the DISTINCT
    segment values (a bounded handful), broadcast back. Values are
    identical to the oracle's DENSE_RANK/ROW_NUMBER by construction."""
    from pyspark.sql import Window as W

    from ._helpers import with_global_rank

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    seg = (
        c.select("c_mktsegment")
        .distinct()
        .withColumn(
            "segment_sk",
            F.row_number().over(W.orderBy("c_mktsegment")).cast("long"),
        )
    )
    ranked = with_global_rank(
        c.join(F.broadcast(seg), "c_mktsegment"),
        order_cols=[F.asc("c_mktsegment"), F.asc("c_custkey")],
        payload_cols=["c_custkey", "c_mktsegment", "segment_sk"],
        num_partitions=8,
        rank_alias="customer_sk",
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        "segment_sk",
        F.col("customer_sk").cast("long").alias("customer_sk"),
    )


@register(
    "etl_scd3",
    category="etl",
    oracle="""
WITH src AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
  FROM orders WHERE o_custkey < 200
),
changed AS (
  SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
           LAG(o_orderpriority) OVER w AS prev_prio
    FROM src
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
  ) WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
)
SELECT o_custkey,
       o_orderpriority AS current_priority,
       prev_prio AS previous_priority,
       CAST(o_orderdate AS DATE) AS changed_on
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC)
              AS rn
  FROM changed
) WHERE rn = 1
""",
)
def etl_scd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 3: ONE row per key carrying the
    current attribute value, the immediately-previous value, and when it
    changed — the limited-history variant used when only 'what was it
    before' matters (vs type 2's full version history in etl_scd2 and
    type 1's overwrite in etl_merge_upsert; this completes the SCD
    family). Change detection reuses the type-2 lag-over-key pass; the
    dimension row is then the LAST change per key (row_number desc).
    Both windows share the o_custkey exchange — one shuffle total, same
    as etl_scd2."""
    from pyspark.sql import Window as W

    src = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w_log = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changed = (
        src.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn("prev_prio", F.lag("o_orderpriority").over(w_log))
        .filter(
            F.col("prev_prio").isNull()
            | (F.col("prev_prio") != F.col("o_orderpriority"))
        )
    )
    w_last = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        changed.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("current_priority"),
            F.col("prev_prio").alias("previous_priority"),
            F.col("o_orderdate").cast("date").alias("changed_on"),
        )
    )


@register(
    "etl_drift_psi",
    category="etl",
    oracle="""
WITH b AS (SELECT MIN(CAST(ts AS TIMESTAMP)) AS lo,
                  MAX(CAST(ts AS TIMESTAMP)) AS hi FROM events),
cfg AS (SELECT make_timestamp(epoch_us(lo)
                              + (epoch_us(hi) - epoch_us(lo)) // 2) AS split
        FROM b),
binned AS (
  SELECT CASE WHEN CAST(ts AS TIMESTAMP) < (SELECT split FROM cfg)
              THEN 'baseline' ELSE 'current' END AS period,
         LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
  FROM events
),
counts AS (
  SELECT bin,
         SUM(CASE WHEN period = 'baseline' THEN 1 ELSE 0 END) AS n_base,
         SUM(CASE WHEN period = 'current' THEN 1 ELSE 0 END) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM counts)
SELECT c.bin,
       CAST(c.n_base AS BIGINT) AS n_base,
       CAST(c.n_cur AS BIGINT) AS n_cur,
       CASE WHEN c.n_base > 0 AND c.n_cur > 0
            THEN round((c.n_cur * 1.0 / t.tc - c.n_base * 1.0 / t.tb)
                       * ln((c.n_cur * 1.0 / t.tc)
                            / (c.n_base * 1.0 / t.tb)), 9)
       END AS psi_term
FROM counts c, tot t
""",
)
def etl_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index for the event value distribution,
    baseline (first half of the timeline) vs current (second half): per
    fixed-width bin, both counts and the PSI term
    (p_cur - p_base) * ln(p_cur / p_base) — summing gives the drift
    score monitoring pipelines alarm on (rule of thumb: > 0.2 = shifted).
    Fixed bins (floor(value/50), capped at 9) keep the binning
    deterministic and mergeable — no quantile estimation inside the
    monitor; the time split reuses stream_watermark_late's floor-micros
    bisection. One narrow pass + a 10-row rollup; the scalar total ride
    along as a cross-joined 1-row aggregate."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("timestamp")).alias("lo"),
        F.max(F.col("ts").cast("timestamp")).alias("hi"),
    ).collect()[0]
    import datetime as _dt

    half_us = (
        (bounds["hi"] - bounds["lo"]) // _dt.timedelta(microseconds=1)
    ) // 2
    split = bounds["lo"] + _dt.timedelta(microseconds=half_us)
    period = F.when(
        F.col("ts").cast("timestamp") < F.lit(split), "baseline"
    ).otherwise("current")
    bin_ = F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9))
    counts = (
        e.select(period.alias("period"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("period") == "baseline", 1).otherwise(0)).alias(
                "n_base"
            ),
            F.sum(F.when(F.col("period") == "current", 1).otherwise(0)).alias(
                "n_cur"
            ),
        )
    )
    tot = counts.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    p_base = F.col("n_base") * 1.0 / F.col("tb")
    p_cur = F.col("n_cur") * 1.0 / F.col("tc")
    # empty-bin terms are undefined (ln 0): NULL them out, matching the
    # standard skip-or-smooth practice, identically on both engines
    term = F.when(
        (F.col("n_base") > 0) & (F.col("n_cur") > 0),
        F.round((p_cur - p_base) * F.log(p_cur / p_base), 9),
    )
    return counts.crossJoin(tot).select(
        "bin",
        F.col("n_base").cast("long").alias("n_base"),
        F.col("n_cur").cast("long").alias("n_cur"),
        term.alias("psi_term"),
    )


@register(
    "etl_data_vault",
    category="etl",
    oracle="""
SELECT o_orderkey,
       md5('O|' || CAST(o_orderkey AS VARCHAR)) AS hub_order_hk,
       md5('C|' || CAST(o_custkey AS VARCHAR)) AS hub_customer_hk,
       md5('L|' || CAST(o_orderkey AS VARCHAR) || '|'
                || CAST(o_custkey AS VARCHAR)) AS link_hk,
       md5(o_orderstatus || '|' || o_orderpriority || '|'
           || CAST(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                   AS VARCHAR)) AS sat_hashdiff,
       o_custkey % 10 >= 7 AS hub_customer_is_new
FROM orders
WHERE o_orderkey % 5 = 0
""",
)
def etl_data_vault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Vault 2.0 key minting for the order feed: deterministic hash
    keys for the order hub, customer hub and order-customer link
    (md5 over a type-tagged business key — the DV discipline that makes
    keys stable across sources, loads and clusters, no sequence
    generator anywhere), plus the satellite HASHDIFF over the
    descriptive payload (status, priority, price-in-cents) that drives
    change detection on subsequent loads. hub_customer_is_new stands in
    for the anti-join against the existing hub (a deterministic 30%
    modulo slice plays the not-yet-loaded set on the static fixture).

    The price enters the hashdiff as exact integer cents (floor half-up
    on the 2-decimal money grid) — hashing a raw double's string repr
    would couple the key to engine float formatting.

    Scale shape: pure narrow per-row expressions — zero shuffles, whole
    stage codegen, pushdown-friendly; at 100 TB each structure writes
    from the same single scan, and incremental loads anti-join on the
    hash key, which is uniform by construction (no skew)."""
    o = table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey").cast("string")
    ck = F.col("o_custkey").cast("string")
    cents = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast("string")
    )
    return o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.md5(F.concat(F.lit("O|"), ok)).alias("hub_order_hk"),
        F.md5(F.concat(F.lit("C|"), ck)).alias("hub_customer_hk"),
        F.md5(F.concat(F.lit("L|"), ok, F.lit("|"), ck)).alias("link_hk"),
        F.md5(
            F.concat(
                F.col("o_orderstatus"),
                F.lit("|"),
                F.col("o_orderpriority"),
                F.lit("|"),
                cents,
            )
        ).alias("sat_hashdiff"),
        (F.col("o_custkey") % 10 >= 7).alias("hub_customer_is_new"),
    )


@register(
    "etl_late_arriving_dimension",
    category="etl",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 13 <> 0
),
joined AS (
  SELECT o.o_orderstatus,
         COALESCE(d.c_custkey, -1) AS dim_key,
         COALESCE(d.c_mktsegment, 'UNKNOWN') AS mktsegment,
         d.c_custkey IS NULL AS is_late,
         o.o_totalprice
  FROM orders o LEFT JOIN dim d ON d.c_custkey = o.o_custkey
)
SELECT o_orderstatus, mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100 AS revenue
FROM joined
GROUP BY o_orderstatus, mktsegment
""",
)
def etl_late_arriving_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension handling: facts whose dimension member has
    not landed yet (a deterministic 1-in-13 slice of customers plays the
    not-yet-loaded set) are routed to the UNKNOWN member (-1 surrogate)
    instead of being dropped or stalling the load — the inferred-member
    pattern every warehouse needs under out-of-order ingestion. Output
    is the reconciliation readout per (status, segment): order counts,
    how many ride the unknown member awaiting re-pointing, and exact
    cent-grid revenue — so the backfill job that later re-points
    surrogates has its audit baseline.

    Scale shape: one broadcast left join (dimension side is the small
    one by definition) + one map-combined rollup; the unknown-member
    routing is a COALESCE projection, costing nothing. The later
    reconciliation pass is the same join filtered to is_late — at
    100 TB that filter prunes to the quarantined fraction."""
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 != 0)
        .select("c_custkey", "c_mktsegment")
    )
    o = table(spark, sf_dir, "orders")
    joined = o.join(
        F.broadcast(dim), F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "o_orderstatus",
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias(
            "mktsegment"
        ),
        F.col("c_custkey").isNull().alias("is_late"),
        "o_totalprice",
    )
    return joined.groupBy("o_orderstatus", "mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).cast("double")
            / 100
        ).alias("revenue"),
    )


@register(
    "etl_denormalize_wide",
    category="etl",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
            AS BIGINT) AS revenue_e4,
       o.o_orderpriority,
       c.c_name, c.c_mktsegment,
       cn.n_name AS cust_nation, cr.r_name AS cust_region,
       p.p_brand, p.p_type,
       s.s_name, sn.n_name AS supp_nation
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region cr ON cr.r_regionkey = cn.n_regionkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE l.l_orderkey % 97 = 0
""",
)
def etl_denormalize_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-Wide-Table denormalization of the full snowflake: lineitem
    enriched through SEVEN joins (orders, customer, customer-nation,
    customer-region, part, supplier, supplier-nation — nation joined
    twice under different roles), the standard pre-materialization that
    turns the normalized star into the flat table BI/feature pipelines
    scan. Revenue rides as an exact 1e-4-grid integer so the wide row
    is hash-checkable without float formatting. The %97 key filter
    keeps the verified sample bounded while every join still exercises
    its full dimension side.

    Scale shape: ONE real shuffle (orders join lineitem on orderkey; at
    100 TB co-partition or bucket both on orderkey and it vanishes
    too); every dimension side — customer included at fixture ratios —
    broadcasts, and the key filter pushes to the lineitem scan, so the
    fact table is read once, pruned at the source. The role-separated
    nation joins broadcast the same 25-row table twice rather than
    forcing a shared alias through the plan."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cr = r.select(
        F.col("r_regionkey").alias("cr_key"),
        F.col("r_name").alias("cust_region"),
    )
    revenue = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(cr), F.col("cr_key") == F.col("cn_regionkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            revenue.alias("revenue_e4"),
            "o_orderpriority",
            "c_name",
            "c_mktsegment",
            "cust_nation",
            "cust_region",
            "p_brand",
            "p_type",
            "s_name",
            "supp_nation",
        )
    )


@register(
    "etl_write_audit_publish",
    category="etl",
    oracle="""
WITH staged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
),
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bad_price
  FROM staged
)
SELECT s.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(s.o_totalprice*100 + 0.5) AS BIGINT))
            AS DOUBLE)/100 AS revenue,
       a.n_rows AS audited_rows,
       a.n_rows = a.n_keys AND a.n_bad_price = 0 AS audit_passed
FROM staged s, audit a
GROUP BY s.o_orderstatus, a.n_rows, a.n_keys, a.n_bad_price
""",
)
def etl_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish: the 1995 order slice is STAGED to a
    non-published path, the audit gate runs against the staged files
    (row count = key count, no non-positive prices), and only a passing
    audit atomically PROMOTES the staging directory to the published
    path (os.replace — one metadata op, readers never see a partial
    table). The returned readout queries the PUBLISHED data and carries
    the audit verdict — the lakehouse pattern that turns "we validate
    after load" into "unvalidated data is unreachable". A failing audit
    would leave the previous publication untouched (staging discarded),
    which the FS layout makes structurally true rather than
    convention.

    Scale shape: one filtered scan to stage (pushdown on the date),
    audit + readout scan the staged/published parquet; the promote is
    O(1) regardless of data size. On object stores the rename becomes
    a catalog pointer swap — same contract."""
    import os
    import shutil

    root = scratch_dir("wap")
    staging = os.path.join(root, "_staging")
    published = os.path.join(root, "published")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    o.write.mode("overwrite").parquet(staging)

    staged = spark.read.parquet(staging)
    audit = staged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_bad_price"
        ),
    ).collect()[0]
    passed = audit["n_rows"] == audit["n_keys"] and audit["n_bad_price"] == 0
    if passed:
        os.replace(staging, published)
    else:  # discard the staging dir; prior publication stays untouched
        shutil.rmtree(staging, ignore_errors=True)
        raise AssertionError(f"audit failed: {audit}")

    pub = spark.read.parquet(published)
    return pub.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).cast("double")
            / 100
        ).alias("revenue"),
        F.lit(int(audit["n_rows"])).alias("audited_rows"),
        F.lit(bool(passed)).alias("audit_passed"),
    )


@register(
    "etl_dead_letter_replay",
    category="etl",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey,
         CASE WHEN o_orderkey % 3 = 2 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 3 = 1
              THEN TIMESTAMP '2099-01-01 00:00:00'
              ELSE CAST(o_orderdate AS TIMESTAMP) END AS o_orderdate
  FROM orders WHERE o_orderkey % 97 = 0
),
fixed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'O'
              ELSE o_orderstatus END AS o_orderstatus,
         abs(o_totalprice) AS o_totalprice,
         CASE WHEN o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'
              THEN TIMESTAMP '1998-12-31 00:00:00'
              ELSE o_orderdate END AS o_orderdate,
         CASE WHEN o_totalprice <= 0 THEN 'positive_price'
              WHEN o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'
                THEN 'date_in_range'
              ELSE 'valid_status' END AS original_rule
  FROM dirty
)
SELECT original_rule,
       CAST(COUNT(*) AS BIGINT) AS n_replayed,
       CAST(SUM(CASE WHEN o_totalprice > 0
                 AND o_orderdate < TIMESTAMP '2002-01-01 00:00:00'
                 AND o_orderstatus IN ('O','F','P')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered
FROM fixed
GROUP BY original_rule
""",
)
def etl_dead_letter_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter replay: the quarantined batch from the expectations
    gate (same manufactured 1-in-97 corruptions as
    etl_expectations_quarantine) runs through deterministic REPAIRS —
    clamp negative prices, re-domain invalid statuses, floor future
    dates — and re-validates against the full rule stack, reporting
    per original failure rule how many rows recovered. This is the
    second half of the DLQ contract: quarantine without replay is a
    data graveyard; replay closes the loop and its recovered-count
    readout is the fix's regression test.

    Scale shape: the replay touches only the quarantined fraction
    (pushdown on the dead-letter partition at 100 TB); repairs are
    per-row expressions and the readout one map-combined rollup."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dirty = o.filter(k % 97 == 0).select(
        (k + 1000000000).alias("o_orderkey"),
        F.when(k % 3 == 2, "X").otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(k % 3 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(
            k % 3 == 1, F.lit("2099-01-01 00:00:00").cast("timestamp")
        )
        .otherwise(F.col("o_orderdate").cast("timestamp"))
        .alias("o_orderdate"),
    )
    future = F.lit("2002-01-01 00:00:00").cast("timestamp")
    rule = (
        F.when(F.col("o_totalprice") <= 0, "positive_price")
        .when(F.col("o_orderdate") >= future, "date_in_range")
        .otherwise("valid_status")
    )
    fixed = dirty.select(
        "o_orderkey",
        F.when(
            ~F.col("o_orderstatus").isin("O", "F", "P"), "O"
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.abs(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(
            F.col("o_orderdate") >= future,
            F.lit("1998-12-31 00:00:00").cast("timestamp"),
        )
        .otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
        rule.alias("original_rule"),
    )
    ok = (
        (F.col("o_totalprice") > 0)
        & (F.col("o_orderdate") < future)
        & F.col("o_orderstatus").isin("O", "F", "P")
    )
    return fixed.groupBy("original_rule").agg(
        F.count(F.lit(1)).alias("n_replayed"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_recovered"),
    )


_FRESH_SLA_SEC = 70


@register(
    "etl_freshness_sla",
    category="etl",
    oracle=f"""
WITH feeds AS (
  SELECT event_type, max(CAST(ts AS TIMESTAMP)) AS last_seen,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
),
ref AS (SELECT max(last_seen) AS watermark FROM feeds)
SELECT f.event_type, f.last_seen, f.n_events, r.watermark,
       CAST(FLOOR(date_diff('microsecond', f.last_seen, r.watermark)
                  / 1000000) AS BIGINT) AS lag_seconds,
       FLOOR(date_diff('microsecond', f.last_seen, r.watermark)
             / 1000000) > {_FRESH_SLA_SEC} AS sla_breach
FROM feeds f, ref r
""",
)
def etl_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA monitor: per feed (event type standing in for
    a source feed), the last-seen timestamp, its lag behind the
    freshest feed's watermark, and the SLA verdict (breach beyond
    {_FRESH_SLA_SEC}s) — the first dashboard an on-call looks at, and
    the gate an orchestrator checks before running downstream jobs
    that assume complete inputs. Lags compare as exact second
    integers; the fixture feeds realize both verdicts at every SF.

    Scale shape: one map-combined max/count per feed — at 100 TB this
    reads the partition-level max statistics, not the data — and a
    1-row watermark broadcast."""
    e = table(spark, sf_dir, "events")
    feeds = e.groupBy("event_type").agg(
        F.max(F.col("ts").cast("timestamp")).alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ref = feeds.agg(F.max("last_seen").alias("watermark"))
    # whole seconds of elapsed time: microsecond diff floored — DuckDB's
    # date_diff('second') counts boundary CROSSINGS while Spark truncates
    # the interval, an off-by-one on sub-second offsets (measured)
    lag = F.floor(
        F.timestamp_diff("MICROSECOND", F.col("last_seen"), F.col("watermark"))
        / 1000000
    ).cast("long")
    return feeds.crossJoin(F.broadcast(ref)).select(
        "event_type",
        "last_seen",
        "n_events",
        "watermark",
        lag.alias("lag_seconds"),
        (lag > _FRESH_SLA_SEC).alias("sla_breach"),
    )


@register(
    "etl_interpolate_linear",
    category="etl",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS y_c
  FROM orders WHERE o_custkey < 50 GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                (SELECT max(day) FROM daily),
                                INTERVAL 1 DAY))::DATE AS day
),
joined AS (
  SELECT s.day, d.y_c FROM spine s LEFT JOIN daily d ON d.day = s.day
),
bounded AS (
  SELECT day, y_c,
         last_value(y_c IGNORE NULLS) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN y_c IS NOT NULL THEN day END IGNORE NULLS)
           OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
         first_value(y_c IGNORE NULLS) OVER (ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN y_c IS NOT NULL THEN day END IGNORE NULLS)
           OVER (ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM joined
)
SELECT day,
       CAST(CASE WHEN y_c IS NOT NULL THEN y_c
            WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
            ELSE prev_v + ((next_v - prev_v)*date_diff('day', prev_d, day)
                 - (((next_v - prev_v)*date_diff('day', prev_d, day))
                    % date_diff('day', prev_d, next_d)
                    + date_diff('day', prev_d, next_d))
                   % date_diff('day', prev_d, next_d))
                 / date_diff('day', prev_d, next_d)
       END AS DOUBLE)/100 AS value,
       y_c IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
         AS is_interpolated
FROM bounded
""",
)
def etl_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing days in the revenue series — the
    third member of the densification family (gap-fill zero-fills,
    LOCF carries forward; interpolation draws the line between the
    bracketing known values, the right call for continuous measures).
    The interpolated value stays on the exact cent grid via the
    portable positive-modulo floor division (the
    agg_seasonal_decompose machinery — both engines' native integer
    ops disagree on negative slopes); days outside the known range
    remain NULL, flagged rows carry is_interpolated.

    Scale shape: one daily groupBy, a calendar spine join, and two
    IGNORE NULLS window passes over the calendar-bounded series."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("y_c")
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = spine.join(daily, "day", "left")
    wprev = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    wnext = W.orderBy("day").rowsBetween(0, W.unboundedFollowing)
    known_day = F.when(F.col("y_c").isNotNull(), F.col("day"))
    b = joined.select(
        "day",
        "y_c",
        F.last("y_c", ignorenulls=True).over(wprev).alias("prev_v"),
        F.last(known_day, ignorenulls=True).over(wprev).alias("prev_d"),
        F.first("y_c", ignorenulls=True).over(wnext).alias("next_v"),
        F.first(known_day, ignorenulls=True).over(wnext).alias("next_d"),
    )
    num = (F.col("next_v") - F.col("prev_v")) * F.datediff(
        F.col("day"), F.col("prev_d")
    )
    den = F.datediff(F.col("next_d"), F.col("prev_d"))
    interp_c = F.col("prev_v") + (num - ((num % den) + den) % den) / den
    value_c = F.when(F.col("y_c").isNotNull(), F.col("y_c")).otherwise(
        F.when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            interp_c,
        )
    )
    return b.select(
        "day",
        (value_c.cast("double") / 100).alias("value"),
        (
            F.col("y_c").isNull()
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        ).alias("is_interpolated"),
    )


@register(
    "etl_schema_drift_detect",
    category="etl",
    oracle="""
WITH old_cols AS (
  SELECT * FROM (VALUES
    ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
    ('o_orderstatus', 'string'), ('o_totalprice', 'double'),
    ('o_orderdate', 'timestamp')) AS t(col_name, col_type)
),
new_cols AS (
  SELECT * FROM (VALUES
    ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
    ('o_orderstatus', 'string'), ('o_totalprice', 'decimal(18,2)'),
    ('o_orderpriority', 'string'), ('ingest_ts', 'timestamp'))
    AS t(col_name, col_type)
)
SELECT COALESCE(o.col_name, n.col_name) AS col_name,
       CASE WHEN o.col_name IS NULL THEN 'added'
            WHEN n.col_name IS NULL THEN 'removed'
            WHEN o.col_type <> n.col_type THEN 'type_changed'
            ELSE 'unchanged' END AS drift,
       o.col_type AS old_type, n.col_type AS new_type
FROM old_cols o FULL OUTER JOIN new_cols n ON n.col_name = o.col_name
""",
)
def etl_schema_drift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift report between two snapshot schemas: added /
    removed / type-changed / unchanged per column, from a full outer
    join of the two (name, type) sets — the diff a contract-enforcing
    ingest runs BEFORE loading (etl_schema_evolution handles the read
    mechanics; this is the decision input for whether evolution is
    allowed: additive changes pass, type changes page someone). The
    two schemas are materialized as real parquet writes and read back
    via the catalog (StructType), so the comparison exercises the
    actual schema plumbing, not literals.

    Scale shape: schema metadata only — O(columns), zero data scan;
    the report is the same at any table size."""

    base = table(spark, sf_dir, "orders").limit(10)
    old_df = base.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    new_df = base.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        "o_orderpriority",
        F.current_timestamp().alias("ingest_ts"),
    )
    d_old = scratch_dir("drift_old")
    d_new = scratch_dir("drift_new")
    old_df.write.mode("overwrite").parquet(d_old)
    new_df.write.mode("overwrite").parquet(d_new)
    os_ = [
        (f.name, f.dataType.simpleString())
        for f in spark.read.parquet(d_old).schema.fields
    ]
    ns_ = [
        (f.name, f.dataType.simpleString())
        for f in spark.read.parquet(d_new).schema.fields
    ]
    o = spark.createDataFrame(os_, ["col_name", "old_type"])
    n = spark.createDataFrame(ns_, ["n_col_name", "new_type"])
    j = o.join(
        n, F.col("col_name") == F.col("n_col_name"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("col_name"), F.col("n_col_name")).alias(
            "col_name"
        ),
        F.when(F.col("col_name").isNull(), "added")
        .when(F.col("n_col_name").isNull(), "removed")
        .when(F.col("old_type") != F.col("new_type"), "type_changed")
        .otherwise("unchanged")
        .alias("drift"),
        "old_type",
        "new_type",
    )


@register(
    "etl_skew_report",
    category="etl",
    oracle="""
WITH per_key AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT CAST(MAX(n) AS BIGINT) AS max_n,
         CAST(SUM(n) AS BIGINT) AS total_n,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM per_key
)
SELECT p.o_custkey, p.n,
       round(p.n * 1.0 * s.n_keys / s.total_n, 6) AS skew_factor,
       s.n_keys, rnk
FROM (SELECT o_custkey, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey) AS rnk
      FROM per_key) p
JOIN stats s ON TRUE
WHERE rnk <= 10
""",
)
def etl_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the ten heaviest o_custkey values with
    each key's skew factor (its row count over the mean per-key count)
    — the diagnostic that decides BEFORE a big join whether to salt
    (join_skew_salted), let AQE split, or broadcast the other side. A
    skew factor near 1 everywhere means hash partitioning will balance;
    a 100x head key is the straggler that stalls a 1000-executor
    stage. Exact integer counts, one rounded ratio.

    Scale shape: one map-combined count per key + a top-10 over the
    per-key frame — at 100 TB this is the cheap pre-flight you run on
    the join column, and its output is broadcast-size by construction."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    stats = per_key.agg(
        F.sum("n").alias("total_n"), F.count(F.lit(1)).alias("n_keys")
    )
    # top-10 via orderBy().limit() -> TakeOrderedAndProject; the rank
    # window runs over the 10-row pool only (a partitionless window over
    # ALL distinct keys is the single-task hazard this report exists to
    # catch in other people's jobs)
    ranked = (
        per_key.orderBy(F.desc("n"), F.asc("o_custkey"))
        .limit(10)
        .select(
            "o_custkey",
            "n",
            F.row_number()
            .over(W.orderBy(F.desc("n"), F.asc("o_custkey")))
            .alias("rnk"),
        )
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        "o_custkey",
        "n",
        F.round(
            F.col("n") * 1.0 * F.col("n_keys") / F.col("total_n"), 6
        ).alias("skew_factor"),
        "n_keys",
        "rnk",
    )


@register(
    "etl_drill_across",
    category="etl",
    oracle="""
WITH fact_orders AS (
  SELECT c.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT))
              AS DOUBLE)/100 AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment
),
fact_events AS (
  SELECT c.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active_users
  FROM events e JOIN customer c ON c.c_custkey = e.user_id
  GROUP BY c.c_mktsegment
)
SELECT o.c_mktsegment, o.n_orders, o.revenue,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.n_active_users, 0) AS n_active_users,
       round(COALESCE(e.n_events, 0) * 1.0 / o.n_orders, 9)
         AS events_per_order
FROM fact_orders o LEFT JOIN fact_events e
  ON e.c_mktsegment = o.c_mktsegment
""",
)
def etl_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-across over two fact tables at different grains: order
    revenue and event activity, each rolled up SEPARATELY to the
    conformed customer dimension (market segment) and then joined on
    it — the Kimball multi-fact pattern that replaces the wrong
    instinct of joining facts to facts directly (orders x events on
    customer would fan out rows and double-count both measures; the
    per-fact rollup makes each measure additive before the join).
    Exact cent revenue, integer counts, one edge ratio.

    Scale shape: two independent fact rollups (each one shuffle, dims
    broadcast) joined on a |segments|-row frame — the join cost is
    nothing; the discipline is WHERE the join happens."""
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    fact_orders = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                ).cast("double")
                / 100
            ).alias("revenue"),
        )
    )
    fact_events = (
        e.join(F.broadcast(c), F.col("c_custkey") == F.col("user_id"))
        .groupBy(F.col("c_mktsegment").alias("e_seg"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_active_users"),
        )
    )
    return (
        fact_orders.join(
            fact_events,
            F.col("e_seg") == F.col("c_mktsegment"),
            "left",
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "revenue",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("n_active_users"), F.lit(0)).alias(
                "n_active_users"
            ),
            F.round(
                F.coalesce(F.col("n_events"), F.lit(0))
                * 1.0
                / F.col("n_orders"),
                9,
            ).alias("events_per_order"),
        )
    )


_RV_SHARDS = 5


def _rendezvous_oracle() -> str:
    def hrw(nshards):
        alts = ", ".join(
            f"ROW(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) "
            f"|| '|shard{k}'), 1, 15)) AS BIGINT), {k})"
            for k in range(nshards)
        )
        return (
            f"list_reduce([{alts}], "
            "(a, b) -> CASE WHEN b[1] > a[1] THEN b ELSE a END)[2]"
        )
    return f"""
WITH assigned AS (
  SELECT doc_id,
         CAST({hrw(_RV_SHARDS)} AS BIGINT) AS shard,
         CAST({hrw(_RV_SHARDS + 1)} AS BIGINT) AS shard_plus1
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN shard <> shard_plus1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved_on_expand
FROM assigned
GROUP BY shard
"""


@register(
    "etl_rendezvous_sharding",
    category="etl",
    oracle=_rendezvous_oracle(),
)
def etl_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment for media
    blobs: every doc hashes once per shard and lands on the max —
    deterministic, coordination-free, and MINIMALLY disruptive under
    topology change, which the query itself demonstrates: the
    n_moved_on_expand column re-runs the assignment with a sixth shard
    and counts per-shard departures — only docs whose new-shard hash
    wins move (~1/6 of each shard), where mod-N hashing would reshuffle
    ~5/6 of everything. The md5-derived weights compare as exact
    integers on both engines.

    Scale shape: pure per-row hashing, zero shuffles for assignment;
    the rollup is map-combined. This is how the multimodal payload
    store picks a blob server without a lookup table."""
    d = table(spark, sf_dir, "documents")

    def hrw(nshards):
        pairs = F.array(
            *[
                F.struct(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("doc_id").cast("string"),
                                    F.lit(f"|shard{k}"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("w"),
                    F.lit(k).alias("k"),
                )
                for k in range(nshards)
            ]
        )
        best = F.aggregate(
            pairs,
            F.struct(
                F.lit(-1).cast("long").alias("w"),
                F.lit(-1).alias("k"),
            ),
            lambda a, b: F.when(b["w"] > a["w"], b).otherwise(a),
        )
        return best["k"].cast("long")

    assigned = d.select(
        "doc_id",
        hrw(_RV_SHARDS).alias("shard"),
        hrw(_RV_SHARDS + 1).alias("shard_plus1"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("shard") != F.col("shard_plus1"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_moved_on_expand"),
    )


@register(
    "etl_currency_normalize",
    category="etl",
    oracle="""
WITH rates AS (
  SELECT n_nationkey, n_name,
         1.0 + (n_nationkey % 7) / 10.0 AS rate_to_base
  FROM nation
),
converted AS (
  SELECT r.n_name AS nation, rg.r_name AS region,
         CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS local_cents,
         CAST(FLOOR(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)
                    * r.rate_to_base + 0.5) AS BIGINT) AS base_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN rates r ON r.n_nationkey = c.c_nationkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region rg ON rg.r_regionkey = n.n_regionkey
)
SELECT region, nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(local_cents) AS DOUBLE)/100 AS revenue_local,
       CAST(SUM(base_cents) AS DOUBLE)/100 AS revenue_base
FROM converted
GROUP BY region, nation
""",
)
def etl_currency_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-currency normalization: order totals convert to the base
    currency through a broadcast per-nation rate table (synthetic
    deterministic rates), with the conversion applied PER ROW on the
    exact cent grid and re-floored to base cents BEFORE aggregation —
    the finance-ETL discipline that makes the converted total equal
    the sum of converted line amounts (converting the aggregate
    instead fails reconciliation whenever rates differ within a
    group). Per (region, nation): order count and revenue in both
    currencies, all integer sums.

    Scale shape: one fact scan, broadcast rate/dim joins, one
    map-combined rollup; a dated-rate table would join on (nation,
    date range) — the join_temporal_scd2 shape."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rates = n.select(
        "n_nationkey",
        F.col("n_name").alias("nation"),
        (1.0 + (F.col("n_nationkey") % 7) / 10.0).alias("rate_to_base"),
        "n_regionkey",
    )
    local_cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    converted = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(rates),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", F.col("r_name").alias("region"))),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select(
            "region",
            "nation",
            local_cents.alias("local_cents"),
            F.floor(local_cents * F.col("rate_to_base") + 0.5)
            .cast("long")
            .alias("base_cents"),
        )
    )
    return converted.groupBy("region", "nation").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("local_cents").cast("double") / 100).alias("revenue_local"),
        (F.sum("base_cents").cast("double") / 100).alias("revenue_base"),
    )


@register(
    "etl_gdpr_erasure",
    category="etl",
    oracle="""
WITH erase AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0
),
audit AS (
  SELECT 'customer' AS table_name,
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_before,
         CAST((SELECT COUNT(*) FROM customer
               WHERE c_custkey IN (SELECT c_custkey FROM erase))
              AS BIGINT) AS n_erased
  UNION ALL
  SELECT 'orders',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM erase))
              AS BIGINT)
)
SELECT table_name, n_before, n_erased,
       n_before - n_erased AS n_after,
       CAST(0 AS BIGINT) AS n_remaining_for_subjects
FROM audit
""",
)
def etl_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure: every row belonging to the data subjects (a
    deterministic 1-in-37 customer slice plays the request queue) is
    removed from BOTH the dimension and the fact table by anti-join
    rewrite to new parquet, and the audit row per table carries
    before/erased/after counts plus the re-verification that ZERO rows
    for those subjects remain in the rewritten data — the erasure
    certificate a DPO files, computed from the actual rewritten files,
    not from the plan. Completes the privacy ladder: mask
    (rowops_column_masking), generalize (curate_k_anonymity), perturb
    (agg_dp_noisy_count), erase (here).

    Scale shape: one broadcast anti-join per table + partitioned
    rewrite; at 100 TB erasure rewrites only the partitions whose
    min/max key ranges intersect the subject set."""
    import os

    from ..session import scratch_dir

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    erase = c.filter(F.col("c_custkey") % 37 == 0).select(
        F.col("c_custkey").alias("erase_key")
    )
    out_root = scratch_dir("gdpr")
    audits = []
    for name, df, key in (
        ("customer", c, "c_custkey"),
        ("orders", o, "o_custkey"),
    ):
        n_before = df.count()
        kept = df.join(
            F.broadcast(erase),
            F.col(key) == F.col("erase_key"),
            "left_anti",
        )
        path = os.path.join(out_root, name)
        kept.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        n_after = back.count()
        n_remaining = back.join(
            F.broadcast(erase),
            F.col(key) == F.col("erase_key"),
            "left_semi",
        ).count()
        audits.append(
            (name, n_before, n_before - n_after, n_after, n_remaining)
        )
    return spark.createDataFrame(
        audits,
        "table_name string, n_before long, n_erased long, "
        "n_after long, n_remaining_for_subjects long",
    )


def _bitemporal_oracle() -> str:
    from ..registry import get as _get

    return f"""
WITH dim AS ({_get("etl_scd2").oracle}),
orig AS (
  SELECT o_custkey, o_orderpriority, version, effective_from, effective_to,
         effective_from + INTERVAL 7 DAY AS tx_from,
         CASE WHEN version = 2 THEN effective_from + INTERVAL 37 DAY END
           AS tx_to,
         FALSE AS is_correction
  FROM dim
),
corr AS (
  SELECT o_custkey, o_orderpriority || '*' AS o_orderpriority, version,
         effective_from, effective_to,
         effective_from + INTERVAL 37 DAY AS tx_from,
         CAST(NULL AS TIMESTAMP) AS tx_to,
         TRUE AS is_correction
  FROM dim WHERE version = 2
),
bt AS (SELECT * FROM orig UNION ALL SELECT * FROM corr)
SELECT t.asof_tx, b.o_custkey, b.o_orderpriority AS prio_at_v, b.version,
       b.is_correction
FROM bt b
CROSS JOIN (VALUES (DATE '1997-06-01'), (DATE '1999-01-01')) AS t(asof_tx)
WHERE b.tx_from <= t.asof_tx
  AND (b.tx_to IS NULL OR t.asof_tx < b.tx_to)
  AND b.effective_from <= DATE '1997-06-15'
  AND (b.effective_to IS NULL OR DATE '1997-06-15' < b.effective_to)
"""


@register(
    "etl_bitemporal_asof",
    category="etl",
    oracle=_bitemporal_oracle(),
)
def etl_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of query: VALID time (when the fact was true in the
    world) x TRANSACTION time (when the warehouse learned it) — the
    join_temporal_scd2 lookup extended with the second axis auditors and
    reproducible-training-set builders need ("what did we BELIEVE on
    June 1 about the state on June 15?").

    The bitemporal dimension composes etl_scd2's valid-time versions
    (oracle inlined verbatim, so validity ranges stay hash-checked) with
    a deterministic transaction-time overlay: every version is recorded
    7 days after it became effective, and version-2 rows get a later
    correction (recorded at +37 days, '*'-suffixed) that supersedes the
    original record via disjoint [tx_from, tx_to) windows. Two as-of
    transaction times straddle the corrections, so the same valid-time
    question returns DIFFERENT answers — the pre-correction row at the
    early tx time, the corrected row at the late one — which is exactly
    the property the oracle pins. Both axes filter with half-open
    ranges; per (tx, key) at most one row survives (valid ranges
    partition time per key; tx windows are disjoint by construction).
    Scale: the dim is versions-per-key small — the pattern broadcasts
    against a fact stream exactly like join_temporal_scd2; asserting the
    dim-state logic needs no fact side."""
    from ..registry import get as _get

    dim = _get("etl_scd2").fn(spark, sf_dir)
    orig = dim.select(
        "o_custkey",
        "o_orderpriority",
        "version",
        "effective_from",
        "effective_to",
        F.date_add("effective_from", 7).alias("tx_from"),
        F.when(
            F.col("version") == 2, F.date_add("effective_from", 37)
        ).alias("tx_to"),
        F.lit(False).alias("is_correction"),
    )
    corr = dim.filter(F.col("version") == 2).select(
        "o_custkey",
        F.concat(F.col("o_orderpriority"), F.lit("*")).alias(
            "o_orderpriority"
        ),
        "version",
        "effective_from",
        "effective_to",
        F.date_add("effective_from", 37).alias("tx_from"),
        F.lit(None).cast("date").alias("tx_to"),
        F.lit(True).alias("is_correction"),
    )
    bt = orig.unionByName(corr)
    txs = spark.range(1).select(
        F.explode(
            F.array(
                F.to_date(F.lit("1997-06-01")), F.to_date(F.lit("1999-01-01"))
            )
        ).alias("asof_tx")
    )
    v = F.to_date(F.lit("1997-06-15"))
    return (
        bt.crossJoin(F.broadcast(txs))
        .filter(
            (F.col("tx_from") <= F.col("asof_tx"))
            & (F.col("tx_to").isNull() | (F.col("asof_tx") < F.col("tx_to")))
            & (F.col("effective_from") <= v)
            & (F.col("effective_to").isNull() | (v < F.col("effective_to")))
        )
        .select(
            "asof_tx",
            "o_custkey",
            F.col("o_orderpriority").alias("prio_at_v"),
            "version",
            "is_correction",
        )
    )


@register(
    "etl_recon_tolerance",
    category="etl",
    oracle="""
WITH src AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 20000
),
tgt AS (
  SELECT o_orderkey,
         o_totalprice
           + CASE WHEN o_orderkey % 11 = 0 THEN 100.0
                  WHEN o_orderkey % 5 = 0 THEN 0.005
                  ELSE 0.0 END AS o_totalprice
  FROM orders
  WHERE o_orderkey < 20000 AND o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_totalprice
  FROM orders WHERE o_orderkey < 20000 AND o_orderkey % 89 = 0
),
joined AS (
  SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         s.o_totalprice AS src_price, t.o_totalprice AS tgt_price
  FROM src s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN src_price IS NULL THEN 'missing_src'
            WHEN tgt_price IS NULL THEN 'missing_tgt'
            WHEN src_price = tgt_price THEN 'equal'
            WHEN abs(CAST(FLOOR(src_price*1000 + 0.5) AS BIGINT)
                     - CAST(FLOOR(tgt_price*1000 + 0.5) AS BIGINT)) <= 10
              THEN 'within_tol'
            ELSE 'drift' END AS status,
       CAST(FLOOR(src_price*1000 + 0.5) AS BIGINT) AS src_milli,
       CAST(FLOOR(tgt_price*1000 + 0.5) AS BIGINT) AS tgt_milli
FROM joined
""",
)
def etl_recon_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-target reconciliation with a value tolerance — the
    migration/replication audit that classifies every key as equal /
    within_tol / drift / missing on either side, instead of a bare
    count(*) comparison that hides compensating errors. One full outer
    join on the key (both sides shuffle once; at 100 TB pre-bucketed
    replicas co-locate and the exchange disappears). The tolerance
    compare happens on the exact milli-unit integer grid
    (|floor(1000x+.5) diff| <= 10 ≡ within 1 cent) so engines agree
    bit-for-bit — a raw double abs(a-b) <= 0.01 flips on
    representation error at the boundary, and prices are REPORTED on the
    same grid (a round(x, 2) display would diverge on exact .xx5 halves:
    Spark rounds the shortest repr, DuckDB the binary expansion). The target is a deterministic
    perturbation of the source: sub-tolerance noise (key%5), real drift
    (key%11, precedence-tested), dropped keys (%97) and alien keys
    (%89 shifted) — every classification path is exercised and
    hash-pinned."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    src = o.select("o_orderkey", "o_totalprice")
    tgt = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            (
                F.col("o_totalprice")
                + F.when(F.col("o_orderkey") % 11 == 0, 100.0)
                .when(F.col("o_orderkey") % 5 == 0, 0.005)
                .otherwise(0.0)
            ).alias("o_totalprice"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 89 == 0).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    s, t = src.alias("s"), tgt.alias("t")
    joined = s.join(
        t, F.col("s.o_orderkey") == F.col("t.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.col("s.o_totalprice").alias("src_price"),
        F.col("t.o_totalprice").alias("tgt_price"),
    )
    grid = lambda c: F.floor(c * 1000 + 0.5).cast("long")  # noqa: E731
    return joined.select(
        "o_orderkey",
        F.when(F.col("src_price").isNull(), "missing_src")
        .when(F.col("tgt_price").isNull(), "missing_tgt")
        .when(F.col("src_price") == F.col("tgt_price"), "equal")
        .when(
            F.abs(grid(F.col("src_price")) - grid(F.col("tgt_price"))) <= 10,
            "within_tol",
        )
        .otherwise("drift")
        .alias("status"),
        grid(F.col("src_price")).alias("src_milli"),
        grid(F.col("tgt_price")).alias("tgt_milli"),
    )


@register(
    "etl_rfm_features",
    category="etl",
    oracle="""
WITH cutoff AS (SELECT TIMESTAMP '1999-01-01 00:00:00' AS t),
w AS (
  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS d, o_totalprice
  FROM orders, cutoff WHERE CAST(o_orderdate AS TIMESTAMP) < cutoff.t
)
SELECT o_custkey,
       CAST(date_diff('day', MAX(d), (SELECT t FROM cutoff)) AS BIGINT)
         AS recency_days,
       CAST(COUNT(*) AS BIGINT) AS frequency,
       CAST(SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000 AS monetary,
       CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS tenure_days
FROM w GROUP BY o_custkey
""",
)
def etl_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM feature engineering as-of a training cutoff — the
    leakage-safe feature block every churn/LTV model starts from:
    Recency (days from last order to the cutoff), Frequency (orders in
    the window), Monetary (exact-grid revenue), plus tenure. The cutoff
    filter makes the features reproducible AS OF a date (no peeking
    past it — the bug curate_leakage_safe_split exists to catch at the
    split level). One groupBy on the entity key; day arithmetic on
    exact date differences, money on the 1e-6 grid — hash-exact."""
    cutoff = "1999-01-01 00:00:00"
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .select("o_custkey", "o_orderdate", "o_totalprice")
    )
    return o.groupBy("o_custkey").agg(
        F.datediff(F.lit(cutoff).cast("timestamp"), F.max("o_orderdate"))
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "monetary"
        ),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("long")
        .alias("tenure_days"),
    )


@register(
    "etl_bridge_allocation",
    category="etl",
    oracle="""
WITH lines AS (
  SELECT l_orderkey, l_partkey,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS line_cents
  FROM lineitem
),
order_tot AS (
  SELECT l_orderkey, CAST(SUM(line_cents) AS BIGINT) AS order_sum_cents
  FROM lines GROUP BY l_orderkey
),
alloc AS (
  SELECT l.l_partkey,
         CAST(FLOOR(
           CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)
           * l.line_cents * 1.0 / t.order_sum_cents) AS BIGINT) AS alloc_cents
  FROM lines l
  JOIN order_tot t ON t.l_orderkey = l.l_orderkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(a.alloc_cents) AS BIGINT) AS allocated_cents
FROM alloc a JOIN part p ON p.p_partkey = a.l_partkey
GROUP BY p.p_brand
""",
)
def etl_bridge_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball bridge-table allocation: spread an order-level measure
    (o_totalprice) across its line items by each line's value share,
    then roll the allocated measure up a DIFFERENT hierarchy (part
    brand) — the many-to-many fact pattern (order <-bridge-> parts)
    that naive joins double-count. Allocation factors are computed as
    exact integer arithmetic: cents-grid numerators multiply inside
    double's 2^53 exact-integer range (5e14 max here) and one IEEE
    division + floor is bit-identical across engines, so the rolled-up
    cents hash-match with no rounding slack. Shapes: line->order-total
    is one groupBy reusing the join key; orders broadcast-join by key;
    brand rollup is the only second shuffle."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("line_cents"),
    )
    order_tot = li.groupBy("l_orderkey").agg(
        F.sum("line_cents").cast("long").alias("order_sum_cents")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("o_cents"),
    )
    alloc = (
        li.join(order_tot, "l_orderkey")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_partkey",
            F.floor(
                F.col("o_cents")
                * F.col("line_cents")
                * F.lit(1.0)
                / F.col("order_sum_cents")
            )
            .cast("long")
            .alias("alloc_cents"),
        )
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        alloc.join(F.broadcast(p), alloc["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("alloc_cents").cast("long").alias("allocated_cents"),
        )
    )


@register(
    "etl_incremental_join_mv",
    category="etl",
    oracle="""
WITH a1 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
),
b1 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0 THEN 'REASSIGNED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
)
SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
FROM a1 JOIN b1 ON o_custkey = c_custkey
""",
)
def etl_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view by delta rules (the
    DBToaster/IVM classic the aggregate MV op doesn't cover): a
    materialized V0 = A0 JOIN B0 is advanced to V2 by applying ONLY the
    signed deltas — first the A side against the OLD B
    (V1 = V0 + dA+ JOIN B0 - dA- JOIN B0), then the B side against the
    NEW A (V2 = V1 + A1 JOIN dB+ - A1 JOIN dB-) — the asymmetric
    old/new pairing that makes sequential application exact without the
    dA JOIN dB cross term. The oracle is the full recompute
    A1 JOIN B1, so any IVM soundness bug (missed retraction, double
    -applied delta, wrong-side pairing) hash-fails.

    Deltas here: A loses every 5th order and reprices every 7th
    (update = retraction + insertion in the signed algebra); B
    reassigns every 4th customer's segment.

    Scale: each delta join touches |delta| x matching rows, never the
    full V; the except/union steps are bag-exact on rows unique by
    orderkey. At 100 TB, V0 and the deltas would be bucketed on
    o_custkey so all five joins and the bag difference reuse one
    partitioning.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a0 = o
    a1 = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    b0 = c
    b1 = c.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 4 == 0, F.lit("REASSIGNED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"]

    def jn(a, b):
        return a.join(F.broadcast(b), a.o_custkey == b.c_custkey).select(*cols)

    v0 = jn(a0, b0)
    da_plus = a1.exceptAll(a0)
    da_minus = a0.exceptAll(a1)
    v1 = v0.unionAll(jn(da_plus, b0)).exceptAll(jn(da_minus, b0))
    db_plus = b1.exceptAll(b0)
    db_minus = b0.exceptAll(b1)
    v2 = v1.unionAll(jn(a1, db_plus)).exceptAll(jn(a1, db_minus))
    return v2


@register(
    "etl_merkle_range_diff",
    category="etl",
    oracle="""
WITH a AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
),
b AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
),
da AS (
  SELECT o_orderkey // 256 AS range_id,
         md5(string_agg(md5(o_orderkey || '|' || o_custkey || '|' ||
                            CAST(o_totalprice AS VARCHAR)), ''
                        ORDER BY o_orderkey)) AS digest,
         COUNT(*) AS n
  FROM a GROUP BY 1
),
db AS (
  SELECT o_orderkey // 256 AS range_id,
         md5(string_agg(md5(o_orderkey || '|' || o_custkey || '|' ||
                            CAST(o_totalprice AS VARCHAR)), ''
                        ORDER BY o_orderkey)) AS digest,
         COUNT(*) AS n
  FROM b GROUP BY 1
)
SELECT COALESCE(da.range_id, db.range_id) AS range_id,
       da.n AS n_source, db.n AS n_target
FROM da FULL JOIN db ON da.range_id = db.range_id
WHERE da.digest IS DISTINCT FROM db.digest
""",
)
def etl_merkle_range_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy reconciliation (the Dynamo/Cassandra Merkle-tree
    idea, one level deep): both table versions hash every row, fold the
    row hashes into ONE digest per contiguous key range (md5 of the
    key-ordered concatenation), and a full outer join on range id
    reports exactly the ranges whose digests differ — the ranges a
    repair job must re-transfer. Rows compare by VALUE, so a repriced
    row flags its range even though the key set is unchanged, and a
    deleted row flags via both digest and count.

    The target diverges from the source by deleting every 13th order
    and repricing every 17th; doubles render through DuckDB-compatible
    shortest-repr casts so row hashes agree cross-engine.

    Scale: row hashing is map-side; each range digest folds a BOUNDED
    range (256 keys) via sorted collect within the range's group — one
    shuffle on range_id; the diff join carries |ranges| rows, ~1/256th
    of the table. A production tree adds levels (ranges of ranges) to
    binary-search huge tables in O(log) round trips; one level is the
    verifiable core.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = o.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 17 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )

    def digests(df):
        rh = F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderkey"),
                F.col("o_custkey"),
                F.col("o_totalprice").cast("string"),
            )
        )
        return (
            df.select(
                (F.col("o_orderkey") / 256).cast("long").alias("range_id"),
                F.struct(F.col("o_orderkey"), rh.alias("h")).alias("r"),
            )
            .groupBy("range_id")
            .agg(
                F.md5(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_sort(F.collect_list("r")),
                            lambda r: r["h"],
                        ),
                    )
                ).alias("digest"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    da = digests(o).select(
        F.col("range_id").alias("a_rid"), F.col("digest").alias("a_d"),
        F.col("n").alias("n_source"),
    )
    db = digests(b).select(
        F.col("range_id").alias("b_rid"), F.col("digest").alias("b_d"),
        F.col("n").alias("n_target"),
    )
    return (
        da.join(db, da.a_rid == db.b_rid, "full")
        .filter(
            ~(F.col("a_d") == F.col("b_d"))
            | F.col("a_d").isNull()
            | F.col("b_d").isNull()
        )
        .select(
            F.coalesce(F.col("a_rid"), F.col("b_rid")).alias("range_id"),
            "n_source",
            "n_target",
        )
    )
