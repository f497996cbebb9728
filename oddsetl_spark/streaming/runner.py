"""Structured Streaming verification substrate (SURVEY.md §2.I).

Every streaming query runs FINITE and DETERMINISTIC:

- input is a staging directory of parquet files copied from the fixture
  (file order forced via mtime when multi-batch replay matters);
- `trigger(availableNow=True)` drains all staged input then stops;
- the sink is `foreachBatch` appending (append/update mode) or
  overwriting (complete mode) a parquet staging dir — the same pattern a
  100 TB deployment uses to land micro-batches on a table, and unlike the
  memory sink it never collects results onto the driver;
- the materialized table is read back as a batch DataFrame and compared
  to a DuckDB batch twin (where semantics are deterministic) or to an
  engine-side assertion (late-data semantics).

Spark runs no-data micro-batches after the last file (default
`spark.sql.streaming.noDataMicroBatches.enabled=true`), so append-mode
aggregations DO flush windows closed by the final watermark.
"""

from __future__ import annotations

import os
import shutil

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import scratch_dir

# Streaming file sources require an explicit schema (no inference pass at
# plan time). The fixture's ts physical type has changed across fixture
# generations (TIMESTAMP(NANOS) read as long nanos under
# spark.sql.legacy.parquet.nanosAsLong vs plain TIMESTAMP(MICROS)), so
# read_events_stream probes the staged files with a batch read and picks
# the matching schema — both normalize to microsecond TimestampType,
# exactly like io.table() does for batch.
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stage_events(sf_dir: str, copies: int = 1, tag: str = "stream") -> str:
    """Copy events.parquet into a fresh dir `copies` times (dedup inputs
    stage it twice). Copies get ASCENDING mtimes so a multi-batch replay
    (maxFilesPerTrigger) triggers them in a deterministic order — Spark's
    file source sorts by timestamp, and shutil.copy alone would stamp
    near-identical 'now' mtimes whose ties make batch order (and thus
    watermark progression) nondeterministic. Returns the staging dir."""
    d = scratch_dir(f"{tag}_in")
    src = os.path.join(sf_dir, "events.parquet")
    for i in range(copies):
        dst = os.path.join(d, f"part-{i:04d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def read_events_stream(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan over a staged events dir, ts normalized to µs."""
    from ..session import pin_session

    pin_session(spark)
    ts_physical = dict(spark.read.parquet(staged_dir).dtypes).get("ts")
    nanos = ts_physical == "bigint"  # legacy TIMESTAMP(NANOS) fixture
    schema = _events_schema(T.LongType() if nanos else T.TimestampType())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(staged_dir)
    if nanos:
        from ..io import normalize_ts_nanos

        df = normalize_ts_nanos(df)
    return df


# State-store partition count for the finite replays. The number of state
# partitions is fixed per checkpoint at first plan time, so it must be a
# deliberate sizing decision: one state dir + provider per partition is pure
# overhead when the replay holds ~1e4-1e5 keys (measured: 32 -> 8 partitions
# cuts stream-stream join replay ~25% at sf0.01). A production deployment
# sizes this to expected key cardinality / executor count instead.
STREAM_STATE_PARTITIONS = 8


def run_to_table(
    stream_df: DataFrame,
    mode: str = "append",
    tag: str = "out",
    out: str | None = None,
    ckpt: str | None = None,
) -> DataFrame:
    """Drain a finite stream through foreachBatch into parquet; return the
    materialized table as a batch DataFrame.

    append/update -> batches land with mode=append (update streams here
    are restricted to queries whose update output is append-equivalent);
    complete -> each batch overwrites, so the last batch is the answer.

    Pass the same `ckpt` (and `out`) across calls to model a restart:
    offsets AND the event-time watermark are restored from the commit log,
    so a second run drops data that arrived late relative to run 1.
    """
    spark = stream_df.sparkSession
    out = out or scratch_dir(tag)
    ckpt = ckpt or scratch_dir(f"{tag}_ckpt")
    write_mode = "overwrite" if mode == "complete" else "append"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(out)

    # Scope shuffle/state partitions to the replay size; the conf is read at
    # start() (state partition count binds to the fresh checkpoint there) and
    # restored afterwards so sibling batch queries keep the session default.
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            stream_df.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    try:
        return spark.read.parquet(out)
    except AnalysisException:
        # No batch produced rows (the sink dir was never created) — an
        # empty frame with the stream's schema. Anything else (a wrong
        # path wired in, unreadable files) must surface, not read as
        # "the query emitted nothing".
        if os.path.isdir(out):
            raise
        return spark.createDataFrame([], stream_df.schema)
