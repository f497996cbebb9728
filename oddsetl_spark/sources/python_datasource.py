"""Spark 4 Python DataSource API (SURVEY §2.A addendum): a custom batch
source implemented in pure Python — the extension point for feeds Spark has
no built-in connector for (the reference's "open disaster data store" REST
feeds would land through exactly this interface, with `partitions()`
mapping to paginated API shards).

The demo source generates a deterministic synthetic sensor feed: every
value is a pure function of the global row id, so the DuckDB twin can
reproduce it with generate_series arithmetic and the driver's hash compare
applies to a from-scratch connector.

Scale shape: `partitions()` returns K independent splits; each executor
core pulls its own split through `read()` (Arrow-batched back to the JVM).
Nothing is driver-materialized — the same contract a production REST/queue
connector needs (split by shard/page/offset-range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (  # noqa: F401 — used inside factories
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..registry import register

_N_ROWS = 20000
_N_PARTS = 8
_MULT = 2654435761  # Knuth multiplicative hash (same constant as curation)


def make_sensor_source():
    """Build the BATCH sensor DataSource dynamically so cloudpickle
    serializes it BY VALUE — same reason as make_tick_source below: the
    planner-side python worker cannot import this package when the
    driver loaded it from a non-sys.path repo dir (the external driver
    does exactly that), so a module-level class pickled by reference
    dies with ModuleNotFoundError there."""
    import numpy as _np  # noqa: F401 — early-fail if absent on driver
    from pyspark.sql.datasource import (
        DataSource as _DS,
        DataSourceReader as _DSR,
        InputPartition as _IP,
    )

    mult = 2654435761

    class _Part(_IP):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _Reader(_DSR):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 0))
            self.n_parts = int(options.get("n_parts", 1))

        def partitions(self):
            if self.n_rows <= 0 or self.n_parts <= 0:
                return []
            step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
            return [
                _Part(lo, min(lo + step, self.n_rows))
                for lo in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            i = np.arange(partition.start, partition.end, dtype=np.int64)
            yield pa.record_batch(
                [
                    pa.array(i),
                    pa.array((i % 50).astype(np.int32)),
                    pa.array(i * 15),
                    pa.array(((i * mult) % 1000000) / 1000.0),
                ],
                names=["reading_id", "sensor_id", "ts_offset_s", "reading"],
            )

    class SensorDataSource(_DS):
        """`spark.read.format("oddsetl_sensors")` — deterministic feed."""

        @classmethod
        def name(cls) -> str:
            return "oddsetl_sensors"

        def schema(self) -> str:
            return "reading_id bigint, sensor_id int, ts_offset_s bigint, reading double"

        def reader(self, schema):
            return _Reader(self.options)

    return SensorDataSource


@register(
    "source_python_datasource",
    category="sources",
    oracle=f"""
SELECT i AS reading_id,
       CAST(i % 50 AS INT) AS sensor_id,
       i * 15 AS ts_offset_s,
       ((i * {_MULT}) % 1000000) / 1000.0 AS reading
FROM generate_series(0, {_N_ROWS - 1}) AS t(i)
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource read: register the class, read through the
    format name, project straight off the Arrow batches. The class is
    built by-value (make_sensor_source) and the session pins the package
    zip first — the by-reference/foreign-cwd failure make_tick_source's
    docstring describes applies to the batch planner worker too."""
    from ..session import pin_session

    pin_session(spark)
    spark.dataSource.register(make_sensor_source())
    return (
        spark.read.format("oddsetl_sensors")
        .option("n_rows", _N_ROWS)
        .option("n_parts", _N_PARTS)
        .load()
    )


# ---------------------------------------------------------------------------
# Streaming Python DataSource (Spark 4): the live-feed half of the connector
# story. A production REST/queue poller implements exactly this contract —
# initialOffset/latestOffset describe the feed cursor, partitions() shards
# the uncommitted range, read() pulls one shard. The demo feed is
# deterministic (every field a pure function of the global row id), so the
# windowed aggregation over it is hash-checked against a DuckDB twin — a
# from-scratch custom STREAMING connector with a full SQL oracle.
# ---------------------------------------------------------------------------

_TICKS_TOTAL = 10000
_TICKS_CHUNK = 2000  # rows released per microbatch -> 5-batch replay

# The simulated EXTERNAL feed tail lives in a FILE under feed_id (a
# directory the query owns). It must live outside the reader instance AND
# outside this Python process: pyspark runs streaming offset management in
# a dedicated worker process per query, so on restart a fresh process
# re-imports this module — a per-instance cursor (or even a module-global
# dict) restarts at 0, hands Spark latestOffset < committed offset, and
# double-processes the early feed (measured: 16k rows consumed of a 10k
# feed, tests/test_stream_recovery.py). A real connector gets monotonicity
# for free because the queue/API tail only moves forward; the tail file is
# that external system for the synthetic feed.


def make_tick_source():
    """Build the streaming tick DataSource class DYNAMICALLY so cloudpickle
    serializes it BY VALUE. Spark runs streaming offset management in a
    dedicated python worker (python_streaming_source_runner) that does NOT
    see sc.addPyFile includes — a module-level class is pickled by
    reference to `oddsetl_spark` and dies there with ModuleNotFoundError
    when the driver process imported the package from a non-sys.path repo
    dir (the external driver does exactly that). Locally-defined classes
    carry their code in the pickle; every constant below is a closure
    literal, so nothing references this module at unpickle time."""
    total_default = 10000
    chunk_default = 2000  # rows released per microbatch -> 5-batch replay
    mult = 2654435761

    class _TickPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class TickStreamReader(DataSourceStreamReader):
        """Offsets are {"offset": n} cursors over the global row id. Each
        latestOffset() call releases `chunk` more rows of the feed (via
        the tail file above) until it is drained, so
        processAllAvailable() sees a genuine multi-batch stream (5
        batches), not one bulk load — and a stop/restart against the same
        checkpoint and feed_id resumes exactly at the committed offset
        (tests/test_stream_recovery.py asserts no loss, no reprocessing)."""

        def __init__(self, options):
            self.total = int(options.get("n_rows", total_default))
            self.chunk = int(options.get("chunk", chunk_default))
            self.feed_id = options.get("feed_id", "default")

        def initialOffset(self):
            return {"offset": 0}

        def latestOffset(self):
            import os

            os.makedirs(self.feed_id, exist_ok=True)
            path = os.path.join(self.feed_id, "feed_tail")
            try:
                with open(path) as f:
                    cur = int(f.read())
            except (FileNotFoundError, ValueError):
                # only "feed not started" (or a torn write, healed by the
                # atomic replace below) may reset the cursor; any OTHER
                # OSError (fd exhaustion, EIO) must SURFACE — treating it
                # as 0 would rewind the monotonic tail below Spark's
                # committed offset and double-process the early feed
                cur = 0
            new = min(cur + self.chunk, self.total)
            if new > cur:  # the tail only ever moves forward
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(new))
                os.replace(tmp, path)
            return {"offset": new}

        def partitions(self, start, end):
            lo, hi = start["offset"], end["offset"]
            mid = (lo + hi) // 2
            parts = [_TickPartition(lo, mid), _TickPartition(mid, hi)]
            return [p for p in parts if p.end > p.start]

        def read(self, partition):
            # Arrow batch, same as the batch reader: the per-row tuple
            # path crosses the Python boundary per record and tripled the
            # replay's wall time.
            import numpy as np
            import pyarrow as pa

            i = np.arange(partition.start, partition.end, dtype=np.int64)
            yield pa.record_batch(
                [
                    pa.array(i),
                    pa.array((i % 50).astype(np.int32)),
                    pa.array(i * 15),
                    pa.array(((i * mult) % 1000000) / 1000.0),
                ],
                names=["tick_id", "sensor_id", "ts_offset_s", "reading"],
            )

        def commit(self, end):
            pass

    class TickStreamDataSource(DataSource):
        """`spark.readStream.format("oddsetl_ticks")` — deterministic feed."""

        @classmethod
        def name(cls) -> str:
            return "oddsetl_ticks"

        def schema(self) -> str:
            return (
                "tick_id bigint, sensor_id int, "
                "ts_offset_s bigint, reading double"
            )

        def streamReader(self, schema):
            return TickStreamReader(self.options)

    return TickStreamDataSource


@register(
    "stream_python_datasource",
    category="streaming",
    heavy=True,
    oracle=f"""
SELECT epoch_ms((i * 15 // 3600) * 3600 * 1000) AS window_start,
       CAST(i % 50 AS INT) AS sensor_id,
       COUNT(*) AS n_ticks,
       CAST(SUM(CAST(((i * {_MULT}) % 1000000) / 1000.0
                AS DECIMAL(30,6))) AS DOUBLE) AS sum_reading
FROM generate_series(0, {_TICKS_TOTAL - 1}) AS t(i)
GROUP BY 1, 2
""",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING Python DataSource end to end: the tick feed is
    read through readStream, event time derives from the feed's offset
    clock, and a watermarked 1-hour tumbling count/sum per sensor runs in
    complete mode until the feed drains (5 microbatches via
    processAllAvailable — latestOffset releases 2000 rows per trigger).
    This is the architecture slot for the reference's live REST feeds:
    swap read() for an HTTP page fetch and the offset cursor for the API's
    page token; everything downstream (watermark, windows, sink) is
    unchanged. Deterministic feed => full SQL oracle, unlike typical
    connector demos."""

    from pyspark.sql import functions as F

    from ..session import pin_session, scratch_dir

    pin_session(spark)
    spark.dataSource.register(make_tick_source())
    out = scratch_dir("ticks_out")
    # fresh feed per invocation (keyed by this run's checkpoint dir) so
    # every run replays the full 5-batch stream from tick 0
    ckpt = scratch_dir("ticks_ckpt")
    s = (
        spark.readStream.format("oddsetl_ticks")
        .option("feed_id", ckpt)
        # the oracle is built from these module constants; options cross
        # the pickle boundary as plain data, so the feed and the oracle
        # cannot silently desync
        .option("n_rows", _TICKS_TOTAL)
        .option("chunk", _TICKS_CHUNK)
        .load()
        .withColumn("ts", F.timestamp_seconds(F.col("ts_offset_s")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "sensor_id")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("reading").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_reading"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "sensor_id",
            "n_ticks",
            "sum_reading",
        )
    )
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        s.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out)


def make_jsonl_sink():
    """Custom batch WRITER (the other half of the connector contract),
    built dynamically for by-value pickling like make_tick_source — the
    planner-side python worker cannot import this package from a
    foreign-cwd driver. Each task writes its partition as one jsonl part
    file and returns the file name as its commit message; commit()
    publishes a manifest only after every task reported success — the
    minimal two-phase commit a real external sink (object store, API
    batch endpoint) needs for exactly-once output on task retry."""
    from pyspark.sql.datasource import (
        DataSource as _DS,
        DataSourceWriter as _DSW,
        WriterCommitMessage as _WCM,
    )

    class _Committed(_WCM):
        def __init__(self, attempt: str, fname: str, n_rows: int):
            self.attempt = attempt
            self.fname = fname
            self.n_rows = n_rows

    class JsonlWriter(_DSW):
        def __init__(self, options):
            self.path = options.get("path")

        def write(self, iterator):
            import json
            import os
            from pyspark import TaskContext

            tc = TaskContext.get()
            pid = tc.partitionId()
            # attempt-UNIQUE temp name (partition id alone is not: a
            # speculative/zombie attempt racing a retry would truncate
            # the other's in-progress file); the final name appears only
            # when the job-level commit renames the winners
            fname = f"part-{pid:05d}.jsonl"
            attempt = f".{fname}.attempt-{tc.taskAttemptId()}"
            n = 0
            with open(os.path.join(self.path, attempt), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _Committed(attempt, fname, n)

        def commit(self, messages):
            import json
            import os

            # phase 2: promote exactly the reported attempts, then
            # publish the manifest — a job that dies before commit()
            # leaves only dot-hidden attempt files and no manifest, so
            # readers (which trust the manifest) see nothing
            for m in messages:
                os.replace(
                    os.path.join(self.path, m.attempt),
                    os.path.join(self.path, m.fname),
                )
            manifest = {
                "files": sorted(m.fname for m in messages),
                "rows": sum(m.n_rows for m in messages),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f)

        def abort(self, messages):
            import glob
            import os

            # drop every attempt file (failed jobs leave no debris; the
            # sweep also catches attempts whose task never reported)
            for p in glob.glob(os.path.join(self.path, ".*.attempt-*")):
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass

    class JsonlSinkDataSource(_DS):
        @classmethod
        def name(cls) -> str:
            return "oddsetl_jsonl_sink"

        def writer(self, schema, overwrite):
            return JsonlWriter(self.options)

    return JsonlSinkDataSource


@register(
    "sink_python_datasource",
    category="sources",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey < 400
""",
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER round-trip: customers flow through
    the jsonl sink (per-task part files + two-phase manifest commit) and
    are read back with an explicit schema — proving the writer half of
    the connector contract end to end, including that the manifest's row
    count equals the data read back. Doubles survive because json.dumps
    emits shortest-round-trip decimals, the same exactness contract as
    the built-in CSV/JSON sinks."""
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..io import table as _table
    from ..session import pin_session, scratch_dir

    pin_session(spark)
    spark.dataSource.register(make_jsonl_sink())
    out = scratch_dir("pysink")
    c = _table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    c.coalesce(4).write.format("oddsetl_jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(
        [os.path.join(out, fn) for fn in manifest["files"]]
    )
    n_back = back.count()
    if n_back != manifest["rows"]:  # contract check — must survive -O
        raise AssertionError(
            f"manifest row count mismatch: {n_back} != {manifest['rows']}"
        )
    return back
