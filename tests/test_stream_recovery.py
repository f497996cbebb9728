"""Streaming restart/recovery: a stopped query resumed against the same
checkpoint must lose nothing and reprocess nothing.

This is the exactly-once contract of the custom streaming Python
DataSource (stream_python_datasource): offsets live in the checkpoint,
the feed tail lives outside the reader instance, and the restarted reader
must hand Spark a latestOffset >= the committed offset. A per-instance
cursor fails this test by double-processing the early feed (measured 16k
rows consumed of a 10k feed before the fix).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

import oddsetl_spark  # noqa: F401
from oddsetl_spark.sources.python_datasource import make_tick_source

_TOTAL = 10000


def _build(spark, feed_id: str):
    return (
        spark.readStream.format("oddsetl_ticks")
        .option("feed_id", feed_id)
        .load()
        .groupBy((F.col("tick_id") % 10).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tick_id").alias("s"))
    )


def test_restart_resumes_at_committed_offset(spark):
    spark.dataSource.register(make_tick_source())
    out = tempfile.mkdtemp(prefix="oddsetl_restart_out_")
    ckpt = tempfile.mkdtemp(prefix="oddsetl_restart_ckpt_")

    def sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(out)

    # phase 1: consume a few microbatches, then stop mid-feed
    q = (
        _build(spark, ckpt)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.2)
    q.stop()

    # phase 2: restart from the checkpoint and drain the feed
    q2 = (
        _build(spark, ckpt)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    n_total, s_total = (
        spark.read.parquet(out).agg(F.sum("n"), F.sum("s")).collect()[0]
    )
    assert n_total == _TOTAL, f"lost/duplicated rows: {n_total} != {_TOTAL}"
    assert s_total == _TOTAL * (_TOTAL - 1) // 2, f"corrupted sum: {s_total}"
