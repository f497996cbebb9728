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

import pytest

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
    from oddsetl_spark.session import scratch_dir

    out = scratch_dir("restart_out")
    ckpt = scratch_dir("restart_ckpt")

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


def test_scd2_stream_restart_and_redelivery(spark):
    """The streaming SCD2 maintainer must survive (1) a stop/restart
    mid-replay — the restarted query resumes from the checkpoint and
    the final history equals the batch twin — and (2) batch
    RE-DELIVERY: re-invoking merge semantics for an already-applied
    batch must be a no-op (the applied-batch marker), else a retried
    batch re-appends its change versions."""
    import os
    import tempfile

    from oddsetl_spark.streaming.stream_queries import (
        scd2_read_state,
        scd2_stage,
        scd2_start,
    )
    from .harness import SF_DIRS
    import os as _os

    sf_dir = SF_DIRS[_os.environ.get("ODDSETL_TEST_SF", "0.001")]
    from oddsetl_spark.session import scratch_dir

    staged = scd2_stage(spark, sf_dir)
    state_dir = scratch_dir("scd2rt_state")
    ckpt = scratch_dir("scd2rt_ckpt")

    # phase 1: stop after the first committed batch
    q = scd2_start(spark, staged, state_dir, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        time.sleep(0.2)
        applied = os.listdir(state_dir + "_markers")
        if applied:
            break
    else:
        q.stop()
        pytest.fail("no batch committed within 120s")
    q.stop()
    q.awaitTermination()
    n_applied_phase1 = len(os.listdir(state_dir + "_markers"))

    # phase 2: restart from the same checkpoint; availableNow finishes
    q2 = scd2_start(spark, staged, state_dir, ckpt)
    q2.awaitTermination()
    assert len(os.listdir(state_dir + "_markers")) == 4, "4 batches total"
    assert n_applied_phase1 < 4, "phase 1 must have stopped mid-replay"

    got = scd2_read_state(spark, state_dir)
    from oddsetl_spark import registry

    want = registry.get("stream_scd2_foreachbatch").fn(spark, sf_dir)
    g = sorted(tuple(str(v) for v in r) for r in got.select(*sorted(got.columns)).collect())
    w = sorted(tuple(str(v) for v in r) for r in want.select(*sorted(want.columns)).collect())
    assert g == w, f"restarted history diverges: {len(g)} vs {len(w)} rows"

    # phase 3: simulate a re-delivered batch — marker must no-op it.
    # Re-run the full stream against the SAME state but a FRESH
    # checkpoint: every batch re-delivers; markers must skip them all.
    ckpt2 = scratch_dir("scd2rt_ckpt2")
    q3 = scd2_start(spark, staged, state_dir, ckpt2)
    q3.awaitTermination()
    again = scd2_read_state(spark, state_dir)
    a = sorted(tuple(str(v) for v in r) for r in again.select(*sorted(again.columns)).collect())
    assert a == g, "re-delivered batches mutated the history"


def test_two_sink_torn_batch_invisible_and_healed(spark):
    """Fault injection on the two-sink txn protocol: a crash between the
    sink writes and the marker leaves BOTH sinks' batch dirs invisible to
    readers (no torn reads); the replayed batch overwrites idempotently
    and publishes exactly once."""
    import os

    from pyspark.sql import functions as F

    from oddsetl_spark.io import table
    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_queries import two_sink_land

    root = scratch_dir("twosink_fault")
    agg_dir = os.path.join(root, "agg")
    audit_dir = os.path.join(root, "audit")
    marks_dir = os.path.join(root, "_commits")
    for d in (agg_dir, audit_dir, marks_dir):
        os.makedirs(d, exist_ok=True)

    batch = (
        table(spark, "/root/testdata/sf0.001", "events")
        .select("event_type", "value")
        .limit(500)
    )
    # batch 0 commits cleanly; batch 1 crashes before the marker
    two_sink_land(batch, 0, agg_dir, audit_dir, marks_dir)
    two_sink_land(batch, 1, agg_dir, audit_dir, marks_dir,
                  crash_before_marker=True)

    committed = sorted(
        f for f in os.listdir(marks_dir) if f.startswith("batch-")
    )
    assert committed == ["batch-00000"], committed
    # torn batch's data files exist on disk but are not readable state
    assert os.path.isdir(os.path.join(agg_dir, "batch-00001"))
    visible = spark.read.parquet(
        *[os.path.join(agg_dir, b) for b in committed]
    )
    n_batch = batch.count()
    assert visible.agg(F.sum("n")).collect()[0][0] == n_batch

    # replay of the crashed batch heals: same dirs overwritten, one marker
    two_sink_land(batch, 1, agg_dir, audit_dir, marks_dir)
    committed2 = sorted(
        f for f in os.listdir(marks_dir) if f.startswith("batch-")
    )
    assert committed2 == ["batch-00000", "batch-00001"]
    healed = spark.read.parquet(
        *[os.path.join(agg_dir, b) for b in committed2]
    )
    assert healed.agg(F.sum("n")).collect()[0][0] == 2 * n_batch, (
        "replay must not double-append within a batch dir"
    )


def test_cep_alerts_invariant_under_microbatch_split(spark):
    """The CEP state machine must produce the same per-user alert counts
    whether the stream arrives as ONE micro-batch or as FOUR time-ordered
    ones (maxFilesPerTrigger=1 over time-split files) — the cross-batch
    state carry (armed flag persisting across batch boundaries) and the
    update-mode MAX collapse are exactly what this exercises."""
    import os

    from pyspark.sql import functions as F

    from oddsetl_spark.io import table
    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.runner import read_events_stream
    from oddsetl_spark.streaming.stream_queries import (
        cep_alerts,
        stream_cep_pattern_alert,
    )

    from .harness import SF_DIRS

    sf_dir = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]
    e = table(spark, sf_dir, "events")

    # time-split the stream into 4 files in event-time order, mtimes
    # ascending so the file source triggers them oldest-first
    staged = scratch_dir("cep_split_in")
    bounds = e.agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    ).collect()[0]
    span = (bounds["t1"] - bounds["t0"]) / 4
    for i in range(4):
        lo = bounds["t0"] + i * span
        hi = bounds["t0"] + (i + 1) * span
        part = e.filter(
            (F.col("ts") >= lo)
            & ((F.col("ts") < hi) if i < 3 else (F.col("ts") <= bounds["t1"]))
        )
        path = os.path.join(staged, f"part-{i:04d}.parquet")
        part.coalesce(1).write.mode("overwrite").parquet(path + "_dir")
        # single data file per trigger unit: move it up under a flat name
        files = [
            f
            for f in os.listdir(path + "_dir")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
        os.rename(os.path.join(path + "_dir", files[0]), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = read_events_stream(spark, staged, max_files_per_trigger=1)
    multi = {
        r["user_id"]: r["n_alerts"]
        for r in cep_alerts(stream, tag="cep_split").collect()
    }

    # the stated invariant, tested directly: the ONE-micro-batch run is
    # the registered query itself (already oracle-verified against the
    # batch regex twin)
    expect = {
        r["user_id"]: r["n_alerts"]
        for r in stream_cep_pattern_alert(spark, sf_dir).collect()
    }
    assert multi == expect, (
        f"multi-batch CEP diverged: {len(multi)} vs {len(expect)} users"
    )


def test_restart_across_processes_exactly_once(spark):
    """Kill/resume across TWO driver processes: phase 1 (fresh process,
    own JVM) commits batches to the ACID table and crashes AFTER the
    table commit of batch 1 but BEFORE Spark records it in the
    checkpoint commit log — the exact at-least-once window foreachBatch
    exposes. Phase 2 (another fresh process) resumes against the same
    checkpoint: Spark re-delivers batch 1 under the same id, the
    op=="batch-N" txn marker must no-op it, and the rest drains. Final
    table state must be exactly-once: one manifest per batch, event set
    identical to the staged input."""
    import os
    import subprocess
    import sys

    from oddsetl_spark.io import table
    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.sources.acid_table import AcidTable
    from .harness import SF_DIRS

    sf_dir = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]
    src = table(spark, sf_dir, "events")
    staged = scratch_dir("xproc_in")
    for i in range(4):
        src.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, f"part-{i:04d}"))
    root = scratch_dir("xproc_tbl")
    t = AcidTable.create(spark, src.limit(0).coalesce(1), root)
    ckpt = scratch_dir("xproc_ckpt")

    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "stream_restart_worker.py",
    )

    # phase 1: crash injected after the table commit of batch 1
    r1 = subprocess.run(
        [sys.executable, worker, "1", staged, root, ckpt, "1"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r1.returncode == 17, (
        f"phase 1 must die on the injected crash: rc={r1.returncode}\n"
        f"{r1.stderr[-2000:]}"
    )
    ops_after_crash = [m["op"] for m in t.history()]
    assert "batch-1" in ops_after_crash, (
        f"crashed batch's commit must already be in the log: {ops_after_crash}"
    )

    # phase 2: fresh process resumes the same checkpoint and drains
    r2 = subprocess.run(
        [sys.executable, worker, "2", staged, root, ckpt],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, f"phase 2 failed: {r2.stderr[-2000:]}"

    # exactly-once: create + one commit per batch, nothing duplicated
    ops = [m["op"] for m in t.history()]
    assert sorted(o for o in ops if o.startswith("batch-")) == [
        "batch-0",
        "batch-1",
        "batch-2",
        "batch-3",
    ], f"re-delivered batch must be deduped by its txn marker: {ops}"
    assert len(t.versions()) == 5

    got = t.read(spark)
    assert got.count() == src.count(), "events lost or duplicated"
    g = got.agg(F.sum("event_id")).collect()[0][0]
    w = src.agg(F.sum("event_id")).collect()[0][0]
    assert g == w, "event id sum diverges after kill/resume"


def test_stateful_restart_across_processes_recovers_state(spark):
    """STATE-STORE recovery across two driver processes: phase 1 runs a
    complete-mode keyed aggregation (count + id-sum per event_type) with
    maxFilesPerTrigger=1 and crashes after batch 1's snapshot write;
    phase 2 resumes the same checkpoint in a fresh process and drains.
    The final snapshot must equal the batch aggregate of ALL staged
    input — a lost state store would count only post-restart files."""
    import os
    import subprocess
    import sys

    from oddsetl_spark.io import table
    from oddsetl_spark.session import scratch_dir
    from .harness import SF_DIRS

    sf_dir = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]
    src = table(spark, sf_dir, "events")
    staged = scratch_dir("xproc_state_in")
    for i in range(4):
        src.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, f"part-{i:04d}"))
    out = scratch_dir("xproc_state_out")
    ckpt = scratch_dir("xproc_state_ckpt")

    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "stream_restart_worker.py",
    )
    r1 = subprocess.run(
        [sys.executable, worker, "1", staged, out, ckpt, "1", "stateful"],
        capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 17, (
        f"phase 1 must die on the injected crash: rc={r1.returncode}\n"
        f"{r1.stderr[-2000:]}"
    )
    r2 = subprocess.run(
        [sys.executable, worker, "2", staged, out, ckpt, "-1", "stateful"],
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, f"phase 2 failed: {r2.stderr[-2000:]}"

    got = {
        r["event_type"]: (r["n"], r["id_sum"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["id_sum"])
        for r in src.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum"))
        .collect()
    }
    assert got == want, (
        f"state lost across restart: {len(got)} keys vs {len(want)}"
    )


def test_rocksdb_state_restart_across_processes(spark):
    """Compose the two r8 proofs (provider equivalence + cross-process
    restart): kill the driver AFTER batch 1's snapshot write with KEYED
    STATE IN ROCKSDB, resume in a fresh process, and require

    - zero loss: the final complete-mode snapshot equals the batch
      aggregate of ALL staged input (state for batches 0-1 must have been
      rebuilt from the checkpoint's SST snapshot + changelog — the heap
      it lived in is gone with the killed JVM);
    - no over-reprocessing: phase 2 records commits only for the
      re-delivered crashed batch and later ones (batch 0's commit is
      phase 1's, untouched);
    - SST engagement on BOTH sides of the kill: phase 1 leaves SST
      artifacts in the checkpoint, and phase 2 adds state versions on
      top of them rather than starting a fresh lineage."""
    import os
    import subprocess
    import sys

    from oddsetl_spark.io import table
    from oddsetl_spark.session import scratch_dir
    from .harness import SF_DIRS

    sf_dir = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]
    src = table(spark, sf_dir, "events")
    staged = scratch_dir("xproc_rocks_in")
    for i in range(4):
        src.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, f"part-{i:04d}"))
    out = scratch_dir("xproc_rocks_out")
    ckpt = scratch_dir("xproc_rocks_ckpt")

    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "stream_restart_worker.py",
    )

    def ssts(root):
        return sorted(
            os.path.join(d, f)[len(root):]
            for d, _dirs, files in os.walk(root)
            for f in files
            if f.endswith(".sst")
        )

    def committed(root):
        cdir = os.path.join(root, "commits")
        return sorted(
            int(f) for f in os.listdir(cdir) if not f.startswith(".")
        ) if os.path.isdir(cdir) else []

    r1 = subprocess.run(
        [sys.executable, worker, "1", staged, out, ckpt, "1",
         "stateful-rocks"],
        capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 17, (
        f"phase 1 must die on the injected crash: rc={r1.returncode}\n"
        f"{r1.stderr[-2000:]}"
    )
    sst_phase1 = ssts(ckpt)
    assert sst_phase1, "RocksDB never engaged in phase 1 (no SSTs)"
    commits_phase1 = committed(ckpt)
    assert commits_phase1 == [0], (
        f"crash landed after batch 1's snapshot but before its commit "
        f"record; checkpoint commits: {commits_phase1}"
    )

    r2 = subprocess.run(
        [sys.executable, worker, "2", staged, out, ckpt, "-1",
         "stateful-rocks"],
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, f"phase 2 failed: {r2.stderr[-2000:]}"

    # no over-reprocessing: phase 2 appended commits 1..3 on top of
    # phase 1's batch 0 — a fresh lineage would have re-run batch 0 too
    assert committed(ckpt) == [0, 1, 2, 3], committed(ckpt)
    # SST reuse: phase 2 extended the SST lineage, not replaced it
    sst_phase2 = ssts(ckpt)
    assert len(sst_phase2) > len(sst_phase1), (
        f"phase 2 added no SSTs: {len(sst_phase1)} -> {len(sst_phase2)}"
    )

    got = {
        r["event_type"]: (r["n"], r["id_sum"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["id_sum"])
        for r in src.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum"))
        .collect()
    }
    assert got == want, (
        f"state lost across RocksDB restart: {got} vs {want}"
    )


def test_rocksdb_state_store_provider_equivalent(spark):
    """The RocksDB state store — the backend whose keyed state spills to
    local disk instead of living on the executor heap, i.e. the one a
    100 TB deployment runs — must produce byte-identical results to the
    default HDFS-backed provider on the same stateful replay, and must
    actually engage (SST artifacts in the checkpoint)."""
    import os

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.runner import (
        read_events_stream,
        run_to_table,
        stage_events,
    )
    from .harness import SF_DIRS

    sf_dir = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]

    def run(provider: str | None, tag: str):
        key = "spark.sql.streaming.stateStore.providerClass"
        saved = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            staged = stage_events(sf_dir, tag=tag)
            s = read_events_stream(spark, staged)
            agg = s.groupBy("user_id", "event_type").agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
            )
            ckpt = scratch_dir(f"{tag}_ckpt")
            out = run_to_table(agg, mode="complete", tag=f"{tag}_out", ckpt=ckpt)
            rows = sorted(
                (r["user_id"], r["event_type"], r["n"], round(r["s"], 6))
                for r in out.collect()
            )
            return rows, ckpt
        finally:
            if saved is not None:
                spark.conf.set(key, saved)
            elif provider:
                spark.conf.unset(key)

    base, _ = run(None, "ss_hdfs")
    rocks, ckpt = run(
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
        "ss_rocks",
    )
    assert rocks == base, (
        f"provider changed results: {len(rocks)} vs {len(base)} keys"
    )
    found = any(
        "SSTs" in dirs or any(f.endswith(".sst") for f in files)
        for _, dirs, files in os.walk(ckpt)
    )
    assert found, "RocksDB provider never engaged (no SST artifacts)"
