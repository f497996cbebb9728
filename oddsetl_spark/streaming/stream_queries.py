"""SURVEY.md §2.I — Structured Streaming over the events table.

Every query drains a finite staged replay (`availableNow`) through the
foreachBatch parquet harness in runner.py and returns the materialized
table, so the driver's batch oracle applies. Windowed aggregations that
must hash-match use COMPLETE output mode (emission independent of the
final watermark position); append-mode watermark semantics are exercised
by `stream_watermark_late`, which is an engine-asserted rows check by
design (SURVEY §2.I). `stream_chained_windows` (stacked stateful
operators, append-only) still hash-matches because its oracle mirrors
the final-watermark emission bound.

At 100 TB the same plans run unbounded: swap the staged dir for the live
landing path, drop availableNow, and keep the watermark/output-mode
choices — state sizing is bounded by watermark eviction (append queries)
or by key cardinality (user_id / event_id), never by stream length.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..operators._helpers import dsum, lng, sql_dsum
from ..registry import register
from ..session import pin_session, scratch_dir
from .runner import read_events_stream, run_to_table, stage_events

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

_EVENTS_SQL = (
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events"
)


@register(
    "source_stream_file",
    category="sources",
    oracle=_EVENTS_SQL,
)
def source_stream_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source: explicit schema, pass-through, append mode.
    The floor of every streaming pipeline — proves the staged replay is
    lossless before any stateful operator builds on it."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="srcfile")
    s = read_events_stream(spark, staged).select(*_EVENT_COLS)
    return run_to_table(s, mode="append", tag="srcfile")


@register(
    "stream_tumbling_counts",
    category="streaming",
    oracle=f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window count/sum per event_type. COMPLETE mode so
    every window is emitted regardless of the final watermark (the
    watermark still bounds state for late data)."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="tumble")
    s = (
        read_events_stream(spark, staged)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_to_table(s, mode="complete", tag="tumble")


@register(
    "stream_sliding_agg",
    category="streaming",
    oracle=f"""
SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
         - off * INTERVAL 15 MINUTE AS window_start,
       time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
         - off * INTERVAL 15 MINUTE + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off) offs
GROUP BY 1, 2, 3
""",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes (each event lands in exactly
    4 windows; the oracle materializes that expansion with unnest)."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="slide")
    s = (
        read_events_stream(spark, staged)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_to_table(s, mode="complete", tag="slide")


@register(
    "stream_session_window",
    category="streaming",
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
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven session windows (30-min gap) per user via the native
    session_window operator. COMPLETE mode (no watermark requirement);
    the oracle is the gap-and-cumsum batch twin of win_sessionize with
    Spark's end = last_event + gap convention."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="sess")
    s = (
        read_events_stream(spark, staged)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return run_to_table(s, mode="complete", tag="sess")


@register(
    "stream_watermark_late",
    category="streaming",
    oracle="""
WITH b AS (SELECT MIN(CAST(ts AS TIMESTAMP)) AS lo,
                  MAX(CAST(ts AS TIMESTAMP)) AS hi FROM events),
cfg AS (SELECT make_timestamp(epoch_us(lo)
                              + (epoch_us(hi) - epoch_us(lo)) // 2) AS split,
               hi - INTERVAL 1 HOUR AS wm FROM b)
SELECT window_start, window_end, n FROM (
  SELECT date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
         date_trunc('hour', CAST(e.ts AS TIMESTAMP)) + INTERVAL 1 HOUR
           AS window_end,
         COUNT(*) AS n
  FROM events e, cfg WHERE CAST(e.ts AS TIMESTAMP) >= cfg.split
  GROUP BY 1, 2
) w WHERE window_end <= (SELECT wm FROM cfg)
""",
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data drop semantics across a restart: run 1 drains the SECOND
    half of the timeline (watermark advances to max(ts)-1h and is
    persisted in the commit log); run 2 restarts from the same checkpoint
    with the first half staged — every one of those rows is now late and
    must be dropped by the append-mode aggregation.

    Full SQL oracle (upgraded from rows-only): the staged replay is
    deterministic, so the CUMULATIVE append-mode output after run 2 is
    exactly the hourly windows of the on-time half whose window_end <=
    the final watermark (max ts - 1h) — late rows neither create windows
    nor advance the watermark, and the held-back last-hour windows are
    never emitted. (wm lands mid-window on this data, so the <= boundary
    is unambiguous.) The in-engine assertions below stay as defense in
    depth. Split uses floor-micros so both engines bisect identically."""
    pin_session(spark)
    e = table(spark, sf_dir, "events")
    bounds = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    import datetime as _dt

    half_us = ((bounds["hi"] - bounds["lo"]) // _dt.timedelta(microseconds=1)) // 2
    split = bounds["lo"] + _dt.timedelta(microseconds=half_us)

    staged = scratch_dir("late_in")
    out_dir = scratch_dir("late_out")
    ckpt = scratch_dir("late_ckpt")

    def _stage_half(df: DataFrame, fname: str) -> None:
        tmp = scratch_dir("late_half")
        # Stage ts as TimestampType (micros) — read_events_stream probes the
        # staged files and picks the matching streaming schema.
        df.select(*_EVENT_COLS).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(staged, fname))

    def _windowed() -> DataFrame:
        return (
            read_events_stream(spark, staged)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "n",
            )
        )

    # Run 1: only the second half of the timeline exists.
    _stage_half(e.filter(F.col("ts") >= F.lit(split)), "a-ontime.parquet")
    run_to_table(_windowed(), mode="append", tag="late", out=out_dir, ckpt=ckpt)
    # Run 2: restart from the same checkpoint; the early half arrives late.
    _stage_half(e.filter(F.col("ts") < F.lit(split)), "b-late.parquet")
    out = run_to_table(_windowed(), mode="append", tag="late", out=out_dir, ckpt=ckpt)

    n_ontime = e.filter(F.col("ts") >= F.lit(split)).count()
    stats = out.agg(
        F.min("window_start").alias("lo"), F.sum("n").alias("total")
    ).collect()[0]
    assert stats["total"] is not None and stats["total"] <= n_ontime, (
        f"late rows leaked past the watermark: emitted {stats['total']} > "
        f"{n_ontime} on-time rows"
    )
    assert stats["lo"] >= split.replace(minute=0, second=0, microsecond=0), (
        f"window {stats['lo']} predates the split {split} — late data was accepted"
    )
    return out


@register(
    "stream_dedup_stateful",
    category="streaming",
    oracle=_EVENTS_SQL,
)
def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup on event_id: the input stages the events file TWICE
    (every row duplicated); dropDuplicatesWithinWatermark emits each
    event exactly once, so the result equals the original table."""
    pin_session(spark)
    staged = stage_events(sf_dir, copies=2, tag="dedup")
    s = (
        read_events_stream(spark, staged)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(*_EVENT_COLS)
    )
    return run_to_table(s, mode="append", tag="dedup")


@register(
    "stream_static_join",
    category="streaming",
    oracle="""
SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id, e.event_type,
       e.value, c.c_name, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension: stateless per micro-batch, the dim is
    (re)broadcast per batch — the enrichment join every landing pipeline
    runs. No watermark needed for an inner stream-static join."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="sjoin")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    s = (
        read_events_stream(spark, staged)
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"), "inner")
        .select(
            "event_id", "ts", "user_id", "event_type", "value",
            "c_name", "c_mktsegment",
        )
    )
    return run_to_table(s, mode="append", tag="sjoin")


@register(
    "stream_stream_join",
    category="streaming",
    oracle="""
SELECT c.event_id AS click_id, c.user_id,
       CAST(c.ts AS TIMESTAMP) AS click_ts,
       p.event_id AS purchase_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and a time
    band (purchase within 1h after a click by the same user). The band is
    what lets Spark evict join state at scale; with the finite replay the
    emitted matches equal the batch interval join."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="ssjoin")
    clicks = (
        read_events_stream(spark, staged)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, staged)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
    return run_to_table(joined, mode="append", tag="ssjoin")


@register(
    "stream_stateful_custom",
    category="streaming",
    oracle="""
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id
""",
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful per-user running count, update-mode emission per
    micro-batch. Prefers the Spark 4.x transformWithStateInPandas state
    API (ValueState per key); that API's state protocol needs
    google.protobuf, which this container lacks, so it is gated behind an
    import-try with applyInPandasWithState (Spark 3.4+ GroupState) as the
    equivalent fallback. The single-file replay is one micro-batch, so
    the emitted running totals equal the batch group-by twin."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="stateful")
    grouped = read_events_stream(spark, staged).groupBy("user_id")
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    try:
        from google.protobuf import descriptor  # noqa: F401 — TWS state protocol dep

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if has_protobuf:
        # transformWithState requires the RocksDB state store provider.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

        class RunningCount(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._n = handle.getValueState(
                    "n", T.StructType([T.StructField("n", T.LongType())])
                )

            def handleInputRows(self, key, rows, timerValues):
                n = sum(len(pdf) for pdf in rows)
                prev = self._n.get()
                total = (prev[0] if prev else 0) + n
                self._n.update((total,))
                yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

            def close(self) -> None:
                pass

        s = grouped.transformWithStateInPandas(
            statefulProcessor=RunningCount(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def running_count(key, pdfs, state: GroupState):
            n = sum(len(pdf) for pdf in pdfs)
            prev = state.get[0] if state.exists else 0
            total = prev + n
            state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        s = grouped.applyInPandasWithState(
            running_count,
            outputStructType=out_schema,
            stateStructType=T.StructType([T.StructField("n", T.LongType())]),
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return run_to_table(s, mode="update", tag="stateful")


@register(
    "stream_upsert_foreachbatch",
    category="streaming",
    oracle="""
WITH latest AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       event_type AS last_event_type, value AS last_value
FROM latest WHERE rn = 1
""",
)
def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC landing pattern: each micro-batch MERGEs into a keyed state
    table ('current row per user', last event wins) via foreachBatch —
    reduce the batch to one row per key, anti-join the existing table,
    overwrite. This is how a stream maintains an upsert table on plain
    parquet (a lakehouse MERGE INTO per batch, minus the format).

    The ts-desc/event_id-desc tiebreak makes the winner deterministic, so
    the final table equals the batch row_number()=1 twin regardless of
    how the replay is batched."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="upsert")
    state_dir = scratch_dir("upsert_state")
    ckpt = scratch_dir("upsert_ckpt")

    from pyspark.sql import Window as W

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        w = W.partitionBy("user_id").orderBy(
            F.desc("last_ts"), F.desc("last_event_id")
        )
        incoming = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        try:
            current = sp.read.parquet(state_dir)
            merged = incoming.unionByName(
                current.join(
                    incoming.select("user_id"), "user_id", "left_anti"
                )
            )
        except Exception:  # first batch: no state yet
            merged = incoming
        # Rewrite via a staging dir: the plan reads state_dir, so an
        # in-place overwrite would race its own scan.
        tmp = scratch_dir("upsert_tmp")
        merged.write.mode("overwrite").parquet(tmp)
        sp.read.parquet(tmp).write.mode("overwrite").parquet(state_dir)

    s = read_events_stream(spark, staged).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )
    q = (
        s.writeStream.foreachBatch(merge_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_dir)


@register(
    "stream_topk_per_window",
    category="streaming",
    oracle=f"""
WITH c AS (
  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
         time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
           + INTERVAL 1 HOUR AS window_end,
         event_type,
         COUNT(*) AS n,
         {{dsum}} AS sum_value
  FROM events
  GROUP BY 1, 2, 3
)
SELECT window_start, window_end, event_type, n, sum_value, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY window_start
           ORDER BY n DESC, event_type) AS rk
  FROM c
) WHERE rk <= 3
""".format(dsum=sql_dsum("value")),
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 1-hour tumbling window: a COMPLETE-mode
    streaming aggregation (counts per window x type) whose per-window
    ranking runs on the materialized micro-batch output — the standard
    "trending topics" layout. Ranking inside the continuous query would
    need complete-mode re-sorting of all history every batch; ranking the
    landed table keeps streaming state bounded to the window x type
    aggregates (watermark-evicted at scale) and makes the rank a cheap
    batch window over ~n_windows * n_types rows."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="topkwin")
    s = (
        read_events_stream(spark, staged)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    landed = run_to_table(s, mode="complete", tag="topkwin")
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    )
    return landed.withColumn("rk", rk).filter(F.col("rk") <= 3)


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@register(
    "stream_rocksdb_state",
    category="streaming",
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       {sql_dsum("value")} AS sum_value
FROM events
GROUP BY user_id
""",
)
def stream_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming aggregation with the RocksDB state store
    provider — the production backend when state exceeds executor heap
    (per-key state lives on local SSD with changelog checkpointing; the
    default HDFS-backed provider keeps the whole map on-heap). Same plan,
    same results: ONLY the state backend swaps, which is exactly the
    property this query pins by hash-matching the batch oracle.

    The provider conf is scoped save -> run -> restore-in-finally; the
    stream drains completely (availableNow) inside the scope, so sibling
    streaming queries keep their default provider.
    """
    pin_session(spark)
    staged = stage_events(sf_dir, tag="rocksdb")
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        s = (
            read_events_stream(spark, staged)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("event_id").alias("first_event_id"),
                F.max("event_id").alias("last_event_id"),
                dsum(F.col("value")).alias("sum_value"),
            )
        )
        return run_to_table(s, mode="complete", tag="rocksdb")
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


@register(
    "stream_chained_windows",
    category="streaming",
    oracle="""
WITH wm AS (
  SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR AS w FROM events
),
hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT time_bucket(INTERVAL 6 HOUR, h) AS window_start,
       time_bucket(INTERVAL 6 HOUR, h) + INTERVAL 6 HOUR AS window_end,
       event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_hours
FROM hourly
GROUP BY 1, 2, 3
HAVING time_bucket(INTERVAL 6 HOUR, h) + INTERVAL 6 HOUR <= (SELECT w FROM wm)
""",
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained streaming window aggregations (multiple stateful operators,
    Spark 3.4+): hourly counts per event_type roll up into 6-hour windows
    via window(window_time(...)) — the pre-aggregation cascade that keeps
    level-2 state tiny (it sees one row per finalized hourly window, not
    raw events). Append mode is mandatory for stacked stateful operators;
    emitted set = 6h windows closed at the final watermark (max ts - 1h),
    which the oracle mirrors with its HAVING bound. Chained counts stay
    integer-exact, so the hash check is exact despite two stateful
    stages."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="chain")
    hourly = (
        read_events_stream(spark, staged)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    six = (
        hourly.groupBy(
            F.window(F.window_time("window"), "6 hours"), "event_type"
        )
        .agg(F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_hours"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_hours",
        )
    )
    return run_to_table(six, mode="append", tag="chain")


@register(
    "stream_scd2_foreachbatch",
    category="streaming",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev
  FROM events
),
chg AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM seq WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to
FROM chg
""",
)
def stream_scd2_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SCD2 maintenance: each micro-batch folds into a
    type-2 history of every user's current event_type — consecutive
    same-type events collapse, each change closes the open version at
    the change timestamp and opens a new one — via foreachBatch over a
    TIME-ORDERED 4-file replay (maxFilesPerTrigger=1, files split at
    ts quartiles, because incremental SCD2 is only well-defined for
    in-order arrival; late data needs the join_temporal_scd2 repair
    path). The cross-batch stitch is the hard part a batch SCD2 never
    faces: a batch's first event per user must compare against the
    STATE's open version, and a batch that changes nothing must leave
    the open version open. The deterministic replay makes the final
    history equal the full-sequence batch twin, which is exactly what
    the oracle checks.

    Scale shape: per batch, one window over the batch (small), a keyed
    join against the open slice of state (one row per user), and a
    keyed rewrite — the same MERGE cost any streaming upsert pays;
    history grows only by changed rows."""
    pin_session(spark)
    staged = scd2_stage(spark, sf_dir)
    state_dir = scratch_dir("scd2stream_state")
    ckpt = scratch_dir("scd2stream_ckpt")
    q = scd2_start(spark, staged, state_dir, ckpt)
    q.awaitTermination()
    return scd2_read_state(spark, state_dir).select(
        "user_id", "event_type", "valid_from", "valid_to"
    )


def scd2_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as 4 time-ordered files (ts-quartile split)."""
    from pyspark.sql import Window as W

    src = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    staged = scratch_dir("scd2stream_in")
    ranked = src.withColumn(
        "qt",
        F.ntile(4).over(W.orderBy("ts", "event_id")),
    )
    for i in range(1, 5):
        ranked.filter(F.col("qt") == i).drop("qt").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, f"part-{i:04d}"))
    return staged


def scd2_latest_version(state_dir: str) -> int | None:
    """Highest COMMITTED state version (marker present), or None."""
    marker_dir = state_dir + "_markers"
    if not os.path.isdir(marker_dir):
        return None
    ids = [
        int(f.split("_")[1])
        for f in os.listdir(marker_dir)
        if f.startswith("applied_")
    ]
    return max(ids) if ids else None


def scd2_read_state(spark, state_dir: str):
    v = scd2_latest_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{v:06d}"))


def scd2_start(spark, staged: str, state_dir: str, ckpt: str):
    """Start the SCD2-maintaining stream; returns the StreamingQuery.

    merge_batch is IDEMPOTENT under batch re-delivery AND crash-safe
    under mid-batch interruption: state is WRITE-ONCE per batch
    (version dir v{batchId}, never overwritten in place) and a marker
    file is the commit point — readers only ever see the highest
    MARKED version, so a stop() that lands anywhere inside a batch
    leaves either "not applied" (the replay rewrites the version
    cleanly) or "fully applied" (the marker skips the replay). The
    original in-place state overwrite had a delete-then-write window
    that a mid-batch stop could truncate (caught by the restart
    test)."""
    from pyspark.sql import Window as W

    marker_dir = state_dir + "_markers"
    os.makedirs(marker_dir, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"applied_{batch_id}")
        if os.path.exists(marker):
            return
        sp = batch_df.sparkSession
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        b = batch_df.withColumn("prev", F.lag("event_type").over(w))
        hist = scd2_read_state(sp, state_dir)
        has_state = hist is not None
        if has_state:
            open_v = hist.filter(F.col("valid_to").isNull()).select(
                "user_id", F.col("event_type").alias("open_type")
            )
            b = b.join(open_v, "user_id", "left")
        else:
            b = b.withColumn("open_type", F.lit(None).cast("string"))
        is_change = F.when(
            F.col("prev").isNotNull(), F.col("prev") != F.col("event_type")
        ).otherwise(
            F.col("open_type").isNull()
            | (F.col("open_type") != F.col("event_type"))
        )
        changes = b.filter(is_change).select(
            "user_id", "event_type", F.col("ts").alias("valid_from"),
            "event_id",
        )
        wv = W.partitionBy("user_id").orderBy("valid_from", "event_id")
        new_versions = changes.select(
            "user_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wv).alias("valid_to"),
        )
        first_change = changes.groupBy("user_id").agg(
            F.min("valid_from").alias("close_at")
        )
        if has_state:
            closed = hist.filter(F.col("valid_to").isNotNull())
            opens = hist.filter(F.col("valid_to").isNull()).join(
                first_change, "user_id", "left"
            )
            still_open = opens.filter(F.col("close_at").isNull()).select(
                "user_id", "event_type", "valid_from", "valid_to"
            )
            now_closed = opens.filter(F.col("close_at").isNotNull()).select(
                "user_id",
                "event_type",
                "valid_from",
                F.col("close_at").alias("valid_to"),
            )
            merged = closed.unionByName(still_open).unionByName(
                now_closed
            ).unionByName(new_versions)
        else:
            merged = new_versions
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id:06d}")
        )
        open(marker, "w").close()

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(staged, "part-*"))
    )
    return (
        s.writeStream.foreachBatch(merge_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "stream_acid_sink",
    category="streaming",
    oracle=f"""
SELECT event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       5 AS n_versions
FROM events GROUP BY event_type
""",
)
def stream_acid_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE streaming ingestion into the ACID manifest-log table:
    a 4-batch replay (event_id%4 file split, maxFilesPerTrigger=1) lands
    each micro-batch as one atomic commit whose op field carries the
    BATCH ID — the Delta-style txn marker. foreachBatch is
    at-least-once (Spark re-delivers a batch whose sink ran but whose
    checkpoint offset write was lost), so before committing batch b the
    sink scans the log for op == "batch-b" and no-ops on a hit: the
    commit and the idempotence marker are the SAME atomic manifest
    publish, which is what upgrades at-least-once delivery to
    exactly-once table state. The query then runs the WHOLE stream a
    second time against a FRESH checkpoint (every batch re-delivers) —
    the markers must no-op all four, leaving exactly 5 manifests
    (create + 4 batches) and precisely one copy of every event, which
    the oracle checks against the raw events table.

    Scale: each batch pays one append commit (tiny manifest) — no read
    of existing data; the log scan is O(commits) driver-side JSON."""
    from ..sources.acid_table import AcidTable

    pin_session(spark)
    staged = scratch_dir("acidsink_in")
    src = table(spark, sf_dir, "events")
    for i in range(4):
        src.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, f"part-{i:04d}"))
    root = scratch_dir("acid_stream_tbl")
    t = AcidTable.create(spark, src.limit(0).coalesce(1), root)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tb = AcidTable(root)
        marker = f"batch-{batch_id}"
        if any(m["op"] == marker for m in tb.history()):
            return  # re-delivered batch: already committed exactly once
        version = tb.latest_version() + 1
        add = tb._write_files(batch_df, f"commit-{version:05d}-{marker}")
        tb.commit(version, marker, add=add, remove=[])

    schema = src.schema

    def run(ckpt: str) -> None:
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(staged, "part-*"))
        )
        q = (
            s.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(scratch_dir("acidsink_ckpt1"))
    # full re-delivery: fresh checkpoint, same staged input, same table
    run(scratch_dir("acidsink_ckpt2"))
    n_versions = len(t.versions())
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            F.lit(n_versions).alias("n_versions"),
        )
    )


@register(
    "stream_outer_join_timeout",
    category="streaming",
    oracle="""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(ts AS TIMESTAMP) AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
bound AS (
  SELECT least((SELECT MAX(click_ts) FROM clicks),
               (SELECT MAX(purchase_ts) FROM purchases))
         - INTERVAL 2 HOUR AS evict
)
SELECT c.click_id, c.user_id, c.click_ts, p.purchase_id, p.purchase_ts
FROM clicks c
LEFT JOIN purchases p
  ON p.user_id = c.user_id
 AND p.purchase_ts >= c.click_ts
 AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
WHERE p.purchase_id IS NOT NULL
   OR c.click_ts < (SELECT evict FROM bound)
""",
)
def stream_outer_join_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: clicks that never see a purchase
    within their 1-hour band must STILL emit (purchase columns NULL) —
    but only once the watermark proves no match can arrive. This is the
    semantics gap between an inner stream join (silently drops) and the
    attribution pipelines that need "click, unconverted" rows.

    The NULL-emission set is exactly watermark-determined, and the
    oracle pins it: the global watermark is the MIN across both inputs'
    (max event time - 1h delay) — multipleWatermarkPolicy=min, the
    default — and an unmatched click emits iff its join window is fully
    below that final watermark, i.e. click_ts + 1h band < min(max_click,
    max_purchase) - 1h. Clicks inside the final 2h frontier stay held in
    state when the finite replay drains — the oracle's WHERE reproduces
    the cut, so a leak in either direction (early NULLs, or matched rows
    double-emitted as NULL) hash-fails. The final no-data micro-batch
    (noDataMicroBatches=true) is what flushes the evictions. At 100 TB
    the band bounds state exactly as in stream_stream_join; the outer
    emission adds no extra state, only the eviction-time emit."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="soj")
    clicks = (
        read_events_stream(spark, staged)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, staged)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "left_outer",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
    return run_to_table(joined, mode="append", tag="soj")


def two_sink_land(
    batch_df: DataFrame,
    batch_id: int,
    agg_dir: str,
    audit_dir: str,
    marks_dir: str,
    crash_before_marker: bool = False,
) -> None:
    """One micro-batch of the two-sink txn protocol: write both sinks
    under idempotent batch-id subdirs, then publish with a single marker
    rename. `crash_before_marker` is the fault-injection hook for
    tests/test_stream_recovery.py — it returns after the sink writes but
    BEFORE the marker, modeling a crash in the torn window."""
    batch_df.persist()
    try:
        # idempotent per-batch subdirs: a replay overwrites, not appends
        batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lng(F.col("value"))).alias("v_grid"),
        ).write.mode("overwrite").parquet(
            os.path.join(agg_dir, f"batch-{batch_id:05d}")
        )
        batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lng(F.col("value"))).alias("v_grid"),
        ).write.mode("overwrite").parquet(
            os.path.join(audit_dir, f"batch-{batch_id:05d}")
        )
    finally:
        batch_df.unpersist()
    if crash_before_marker:
        return
    # both sinks landed: publish the batch atomically (one rename)
    tmp = os.path.join(marks_dir, f"._tmp-{batch_id:05d}")
    open(tmp, "w").close()
    os.replace(tmp, os.path.join(marks_dir, f"batch-{batch_id:05d}"))


@register(
    "stream_two_sink_txn",
    category="streaming",
    oracle="""
WITH agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS total_value
  FROM events GROUP BY event_type
),
audit AS (
  SELECT 'audit' AS sink, CAST(NULL AS VARCHAR) AS event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS total_value
  FROM events
)
SELECT 'agg' AS sink, event_type, n, total_value FROM agg
UNION ALL
SELECT sink, event_type, n, total_value FROM audit
""",
)
def stream_two_sink_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once fan-out of ONE stream into TWO sinks (a per-type
    rollup table and a row-count audit table) — the consistency problem
    foreachBatch leaves to the user: Spark guarantees at-least-once batch
    REPLAY, not multi-sink atomicity, so a crash between the two writes
    must not let one sink run ahead of the other. The landing protocol is
    the txn-id pattern: each sink writes its batch under a
    batch-{id}-named subdir (idempotent: a replayed batch OVERWRITES its
    own subdir, never appends a duplicate), and a marker file commits the
    batch only after BOTH sinks landed; readers union exactly the marked
    batch dirs. Deterministic end-to-end, so both sinks hash-match their
    relational twins — an unmarked (torn) batch or a double-applied
    replay diverges on counts. At 100 TB each batch-dir write is ordinary
    distributed parquet; the marker is one rename."""
    pin_session(spark)
    staged = stage_events(sf_dir, tag="twosink")
    root = scratch_dir("twosink_out")
    ckpt = scratch_dir("twosink_ckpt")
    agg_dir = os.path.join(root, "agg")
    audit_dir = os.path.join(root, "audit")
    marks_dir = os.path.join(root, "_commits")
    for d in (agg_dir, audit_dir, marks_dir):
        os.makedirs(d, exist_ok=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        two_sink_land(batch_df, batch_id, agg_dir, audit_dir, marks_dir)

    s = read_events_stream(spark, staged).select("event_type", "value")
    q = (
        s.writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    committed = sorted(
        f for f in os.listdir(marks_dir) if f.startswith("batch-")
    )
    agg_parts = [os.path.join(agg_dir, b) for b in committed]
    audit_parts = [os.path.join(audit_dir, b) for b in committed]
    agg = (
        spark.read.parquet(*agg_parts)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            (F.sum("v_grid").cast("double") / 1e6).alias("total_value"),
        )
        .select(F.lit("agg").alias("sink"), "event_type", "n", "total_value")
    )
    audit = (
        spark.read.parquet(*audit_parts)
        .agg(
            F.sum("n").cast("long").alias("n"),
            (F.sum("v_grid").cast("double") / 1e6).alias("total_value"),
        )
        .select(
            F.lit("audit").alias("sink"),
            F.lit(None).cast("string").alias("event_type"),
            "n",
            "total_value",
        )
    )
    return agg.unionByName(audit)


@register(
    "stream_cep_pattern_alert",
    category="streaming",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(s, 'e[^s]*?p')) AS BIGINT) AS n_alerts
FROM seq
WHERE len(regexp_extract_all(s, 'e[^s]*?p')) > 0
""",
)
def stream_cep_pattern_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CEP (complex event processing): a per-user state machine
    over the live event stream — ARM on 'error', DISARM on 'signup',
    ALERT (and re-arm-from-scratch) when a 'purchase' arrives while
    armed. The state machine is provably equivalent to the LAZY
    non-overlapping regex e[^s]*?p (each match ends at the FIRST
    qualifying purchase and the scan restarts after it — exactly the
    alert-at-first-purchase semantics; the greedy form would span
    multiple purchases into one match), so the oracle IS the batch
    regex count — a true stream-vs-batch differential, sharing
    win_event_pattern_match's sequence construction.

    State = (armed flag, alert count) per user via
    applyInPandasWithState (GroupState); rows are sorted by (ts,
    event_id) within each micro-batch before the scan — cross-batch
    order holds because the file source lands batches in event-time
    order (the production norm for append-only event streams; the
    single-file replay used here is the one-batch case). Update-mode
    emission per batch lands as appends; the final per-user MAX
    collapses re-emissions — the count is monotone, so max = latest —
    making the result correct under any micro-batch split.

    Scale: state is two scalars per user — far below the windowed-join
    state classes; alerts emit incrementally with no retention of raw
    events.
    """
    pin_session(spark)
    staged = stage_events(sf_dir, tag="cep")
    stream = read_events_stream(spark, staged)
    return cep_alerts(stream, tag="cep")


def cep_alerts(stream: DataFrame, tag: str) -> DataFrame:
    """The CEP pipeline over any events stream (shared with the
    multi-batch replay test): per-user (armed, count) state machine,
    update-mode emission, per-user MAX collapse of the appended rows."""
    grouped = stream.groupBy("user_id")
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_alerts", T.LongType()),
        ]
    )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def cep(key, pdfs, state: GroupState):
        armed, n_alerts = (state.get if state.exists else (False, 0))
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for sym in pdf["event_type"].str[0]:
            if sym == "s":
                armed = False
            elif sym == "e":
                armed = True
            elif sym == "p" and armed:
                n_alerts += 1
                armed = False
        state.update((bool(armed), int(n_alerts)))
        if n_alerts > 0:
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_alerts": [int(n_alerts)]}
            )

    s = grouped.applyInPandasWithState(
        cep,
        outputStructType=out_schema,
        stateStructType=T.StructType(
            [
                T.StructField("armed", T.BooleanType()),
                T.StructField("n", T.LongType()),
            ]
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    landed = run_to_table(s, mode="update", tag=tag)
    return landed.groupBy("user_id").agg(F.max("n_alerts").alias("n_alerts"))
