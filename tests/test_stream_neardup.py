"""Semantic invariants of stream_neardup_minhash beyond the SQL oracle:
the verdict graph must be internally consistent with the arrival-order
state semantics (blockers strictly earlier, state blockers actually
kept, within-batch blockers actually same-batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oddsetl_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def test_neardup_verdict_invariants(spark):
    df = (
        registry.get("stream_neardup_minhash")
        .fn(spark, SF_DIR)
        .localCheckpoint()
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == df.count(), "doc_id must be unique"
    n_by = df.groupBy("verdict").count().collect()
    counts = {r["verdict"]: r["count"] for r in n_by}
    # the twin-augmented corpus guarantees near-dup pressure: state drops
    # must exist (twins arrive in later quartiles than their originals)
    assert counts.get("dropped_state", 0) > 0
    assert counts.get("kept", 0) > 0
    for r in rows.values():
        if r["verdict"] == "kept":
            assert r["dup_of"] is None
            continue
        blocker = rows[r["dup_of"]]
        # arrival order == id order: every blocker is strictly earlier
        assert r["dup_of"] < r["doc_id"]
        if r["verdict"] == "dropped_state":
            assert blocker["batch_id"] < r["batch_id"]
            # state blockers are KEPT signatures by construction
            assert blocker["verdict"] == "kept"
        else:  # dropped_batch
            assert blocker["batch_id"] == r["batch_id"]


import pytest


@pytest.mark.parametrize("mode", ["neardup", "neardup-early", "neardup-rocks"])
def test_neardup_restart_across_processes(spark, mode):
    """Kill/resume across two driver processes: phase 1 crashes inside
    batch 2 — either AFTER the commit marker ("neardup": the
    at-least-once window, re-delivery must no-op) or BETWEEN the state
    write and the verdict/marker writes ("neardup-early": re-delivery
    must rewrite both dirs idempotently). Phase 2 resumes the same
    checkpoint in a fresh process; the final verdicts must equal a
    clean single-process run's, with exactly one marker/state/out dir
    per batch. "neardup-rocks" repeats the late-crash shape under the
    RocksDB state store provider (r9 verdict item 6: the last
    provider x operator composition gap)."""
    import os
    import subprocess
    import sys

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        neardup_read_verdicts,
    )

    staged = _stage_neardup(spark, SF_DIR)
    root = scratch_dir(f"neardup_xproc_{mode.replace('-', '')}")
    ckpt = os.path.join(root, "ckpt")
    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "stream_restart_worker.py",
    )
    r1 = subprocess.run(
        [sys.executable, worker, "1", staged, root, ckpt, "2", mode],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r1.returncode == 17, (
        f"phase 1 must die on the injected crash: rc={r1.returncode}\n"
        f"{r1.stderr[-2000:]}"
    )
    marker_dir = os.path.join(root, "markers")
    markers = sorted(os.listdir(marker_dir))
    if mode == "neardup-early":
        assert "applied_2" not in markers, markers  # crash beat the marker
    else:  # late-crash modes (heap + rocksdb providers)
        assert "applied_2" in markers, markers  # marker landed pre-crash
    r2 = subprocess.run(
        [sys.executable, worker, "2", staged, root, ckpt, "-1", mode],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r2.returncode == 0, f"phase 2 failed: {r2.stderr[-2000:]}"
    assert sorted(os.listdir(marker_dir)) == [
        f"applied_{i}" for i in range(1, 5)
    ]
    got = sorted(
        map(tuple, neardup_read_verdicts(spark, os.path.join(root, "out")).collect())
    )
    clean = sorted(
        map(
            tuple,
            registry.get("stream_neardup_minhash").fn(spark, SF_DIR).collect(),
        )
    )
    assert got == clean, (
        f"kill/resume changed the verdicts: {len(got)} vs {len(clean)} rows"
    )


def test_neardup_batches_cover_corpus(spark):
    from oddsetl_spark.operators.llm_dedup import _corpus

    df = registry.get("stream_neardup_minhash").fn(spark, SF_DIR)
    n_corpus = _corpus(spark, SF_DIR).count()
    assert df.count() == n_corpus, "every arriving doc gets a verdict"
    batches = sorted(
        r["batch_id"] for r in df.select("batch_id").distinct().collect()
    )
    assert batches == [1, 2, 3, 4]
    # quartile split: batch sizes equal within ntile's +/-1
    sizes = [
        r["count"]
        for r in df.groupBy("batch_id").count().orderBy("batch_id").collect()
    ]
    assert max(sizes) - min(sizes) <= 1
    # dedup is effective on the twin-staged corpus: at most ~40% survives
    kept = df.filter(F.col("verdict") == "kept").count()
    assert kept < 0.45 * n_corpus, (kept, n_corpus)


def test_neardup_rejects_out_of_order_batch(spark):
    """The ordered-arrival guard must be a real raise, not a stripped
    assert: delivering staged batch 1 after batch 2's marker has landed
    (an mtime tie in the file source could reorder delivery) aborts the
    stream instead of silently applying state-dedup against the wrong
    prefix — which would only surface later as an oracle mismatch."""
    import os

    import pytest as _pytest

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        ensure_state_tables,
        neardup_batch_fn,
    )

    staged = _stage_neardup(spark, SF_DIR)
    state_dir = scratch_dir("nd_ooo_state")
    marker_dir = scratch_dir("nd_ooo_markers")
    ensure_state_tables(spark, state_dir)
    fn = neardup_batch_fn(state_dir, scratch_dir("nd_ooo_out"), marker_dir)
    # simulate batch 2 already applied, then batch 1 arriving late
    open(os.path.join(marker_dir, "applied_2"), "w").close()
    b1 = spark.read.parquet(os.path.join(staged, "part-0001"))
    with _pytest.raises(RuntimeError, match="out-of-order arrival"):
        fn(b1, 0)
    # and a multi-batch delivery (maxFilesPerTrigger violated) raises too
    b12 = spark.read.parquet(
        os.path.join(staged, "part-0001"), os.path.join(staged, "part-0002")
    )
    with _pytest.raises(RuntimeError, match="multiple staged batches"):
        fn(b12, 1)
