"""Cross-process streaming restart worker (driven by
tests/test_stream_recovery.py::test_restart_across_processes_exactly_once).

Each invocation is a FRESH driver process (own JVM, own SparkSession)
running the stream_acid_sink micro-batch shape against a shared staged
input, ACID table root, and checkpoint dir:

  phase 1: consume with maxFilesPerTrigger=1; the foreachBatch sink
    COMMITS the batch to the manifest log, then raises an injected crash
    for batch `crash_after` — the commit landed but Spark never recorded
    the batch in the checkpoint commit log, which is exactly the
    at-least-once window foreachBatch exposes. Exits 17 on the injected
    crash (anything else is a real failure).
  phase 2: resume against the SAME checkpoint in a new process; Spark
    re-delivers the crashed batch under the same batch id, the
    op=="batch-N" txn marker must no-op it, and the remaining batches
    drain (availableNow). Exits 0.

The parent test asserts exactly-once table state across the kill/resume:
one manifest per batch, no event duplicated or lost.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    phase, staged, root, ckpt = sys.argv[1:5]
    crash_after = int(sys.argv[5]) if len(sys.argv) > 5 else -1
    mode = sys.argv[6] if len(sys.argv) > 6 else "acid"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from oddsetl_spark.session import get_spark, pin_session
    from oddsetl_spark.sources.acid_table import AcidTable

    # Pin the shuffle width through the env escape hatch, not conf.set:
    # session.size_shuffle_partitions (called by every io.table()) would
    # silently clobber a programmatic pin on the next table load, but
    # honors ODDSETL_SHUFFLE_PARTITIONS (r10 ADVICE).
    os.environ.setdefault("ODDSETL_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("restart-worker")
    pin_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    if mode.startswith("neardup"):
        # Streaming near-dup dedup recovery: state/verdict dirs are
        # write-once per batch with a commit marker. "neardup" crashes
        # AFTER the marker (re-delivery must no-op); "neardup-early"
        # crashes between the state write and the verdict/marker writes
        # (re-delivery must rewrite both, idempotently). "neardup-rocks"
        # runs the late-crash shape with the RocksDB state store
        # provider pinned — foreachBatch itself keeps no keyed state,
        # but the checkpoint/commit-log recovery path must behave
        # identically under the 100 TB provider (the last
        # provider x operator composition gap, r9 verdict item 6).
        from oddsetl_spark.streaming.stream_neardup import neardup_start

        if "rocks" in mode:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )

        state_dir, out_dir, marker_dir = (
            os.path.join(root, d) for d in ("state", "out", "markers")
        )
        for d in (state_dir, out_dir, marker_dir):
            os.makedirs(d, exist_ok=True)
        # "neardup-compact": run with state compaction every 2nd batch
        # and crash phase 1 INSIDE the compaction (fold committed,
        # source partitions not dropped) — the resumed process must
        # complete the pending fold before the next batch reads state.
        crash_point = (
            "compact" if "compact" in mode
            else "early" if "early" in mode
            else "late"
        )
        q = neardup_start(
            spark, staged, state_dir, out_dir, marker_dir, ckpt,
            crash_batch=crash_after if phase == "1" else -1,
            crash_point=crash_point,
            compact_every=2 if "compact" in mode else 0,
        )
        try:
            q.awaitTermination()
            code = 0
        except Exception as exc:  # noqa: BLE001
            code = 17 if "injected crash" in str(exc) else 1
            if code == 1:
                print(f"worker failure: {exc}", file=sys.stderr)
        spark.stop()
        sys.exit(code)

    schema = spark.read.parquet(os.path.join(staged, "part-0000")).schema

    if mode in ("stateful", "stateful-rocks"):
        # STATE-STORE recovery across processes: a complete-mode keyed
        # aggregation whose running state must survive the kill — if the
        # restarted process lost state, the final snapshot would count
        # only post-restart files and the parent's compare fails.
        # "stateful-rocks" runs the same shape on the RocksDB provider
        # (keyed state on local disk, the 100 TB backend): the restarted
        # process must REBUILD its store from the checkpoint's SST
        # snapshot + changelog, not from heap it no longer has.
        from pyspark.sql import functions as F

        if mode == "stateful-rocks":
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )

        def state_sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(root)
            if phase == "1" and batch_id == crash_after:
                raise RuntimeError(
                    "injected crash: snapshot written, state commit for "
                    "this batch not yet durable"
                )

        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(staged, "part-*"))
        )
        agg = s.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum")
        )
        q = (
            agg.writeStream.foreachBatch(state_sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            code = 0
        except Exception as exc:
            code = 17 if "injected crash" in str(exc) else 1
            if code == 1:
                print(f"worker failure: {exc}", file=sys.stderr)
        spark.stop()
        sys.exit(code)

    def sink(batch_df, batch_id):
        tb = AcidTable(root)
        marker = f"batch-{batch_id}"
        if any(m["op"] == marker for m in tb.history()):
            return  # re-delivered batch: already committed exactly once
        version = tb.latest_version() + 1
        add = tb._write_files(batch_df, f"commit-{version:05d}-{marker}")
        tb.commit(version, marker, add=add, remove=[])
        if phase == "1" and batch_id == crash_after:
            raise RuntimeError(
                "injected crash: table commit landed, checkpoint offset "
                "not yet recorded"
            )

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
    try:
        q.awaitTermination()
        code = 0
    except Exception as exc:  # StreamingQueryException wraps the sink error
        code = 17 if "injected crash" in str(exc) else 1
        if code == 1:
            print(f"worker failure: {exc}", file=sys.stderr)
    spark.stop()
    sys.exit(code)


if __name__ == "__main__":
    main()
