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


@pytest.mark.parametrize(
    "mode",
    ["neardup", "neardup-early", "neardup-rocks", "neardup-compact"],
)
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
    provider x operator composition gap). "neardup-compact" (r11) runs
    with state compaction every 2nd batch and crashes INSIDE the
    compaction — fold committed, source partitions not dropped, state
    transiently duplicated on disk — so the resumed process must
    complete the pending fold (through a fresh catalog + MSCK
    re-registration) before batch 3 reads state."""
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
    else:  # late-crash modes (heap + rocksdb providers) + compact
        assert "applied_2" in markers, markers  # marker landed pre-crash
    if mode == "neardup-compact":
        # the crash window left the pending intent + the duplicated state
        assert "compact_pending" in markers, markers
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


def test_neardup_rejects_reordered_ahead_batch(spark):
    """The r10 guard only caught a SMALLER id arriving after a larger
    one — by then the reordered-AHEAD batch had already deduped against
    state missing its predecessor and durably committed wrong verdicts.
    Contiguity at apply time rejects the ahead batch BEFORE it commits:
    batch 3 when applied=[1] must raise (expected next id is 2), and
    batch 2 arriving first of all must raise (expected id is 1)."""
    import os

    import pytest as _pytest

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        ensure_state_tables,
        neardup_batch_fn,
    )

    staged = _stage_neardup(spark, SF_DIR)
    state_dir = scratch_dir("nd_ahead_state")
    marker_dir = scratch_dir("nd_ahead_markers")
    out_dir = scratch_dir("nd_ahead_out")
    ensure_state_tables(spark, state_dir)
    fn = neardup_batch_fn(state_dir, out_dir, marker_dir)
    # nothing applied yet: the first delivery must be batch 1
    b2 = spark.read.parquet(os.path.join(staged, "part-0002"))
    with _pytest.raises(RuntimeError, match="out-of-order arrival"):
        fn(b2, 0)
    assert not os.listdir(out_dir), "ahead batch must not commit verdicts"
    # batch 1 applied, batch 3 skips ahead of 2: reject before commit
    open(os.path.join(marker_dir, "applied_1"), "w").close()
    b3 = spark.read.parquet(os.path.join(staged, "part-0003"))
    with _pytest.raises(RuntimeError, match="out-of-order arrival"):
        fn(b3, 1)
    assert not os.listdir(out_dir), "ahead batch must not commit verdicts"
    assert sorted(os.listdir(marker_dir)) == ["applied_1"], (
        "ahead batch must not write a marker"
    )


def test_compacted_stream_matches_plain(spark):
    """State compaction (fold committed per-batch partitions into
    batch=0) must be invisible in the results: the compacted variant's
    verdicts equal the plain stream's row for row, while the state
    tables end with the folded layout — only partitions {0} + the
    final batch, and O(buckets) files instead of O(batches x buckets)."""
    import os

    from oddsetl_spark.streaming.stream_neardup import _STATE_BUCKETS

    plain = sorted(
        tuple(r)
        for r in registry.get("stream_neardup_minhash")
        .fn(spark, SF_DIR)
        .collect()
    )
    compacted_df = registry.get("stream_neardup_compacted").fn(spark, SF_DIR)
    compacted = sorted(tuple(r) for r in compacted_df.collect())
    assert compacted == plain
    # the compacted run's state tables: compact_every=2 over 4 batches
    # folds after batch 2 and after batch 4, so every per-batch source
    # partition is gone and only the fold remains
    state_dirs = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("nd_state_bands_neardupc_state")
    ]
    assert state_dirs, "compacted run must have registered state tables"
    bands_tbl = state_dirs[-1]
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {bands_tbl}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    ).replace("file:", "")
    parts = sorted(d for d in os.listdir(loc) if d.startswith("batch="))
    assert parts == ["batch=0"], parts
    n_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(loc)
    )
    assert n_files <= _STATE_BUCKETS, (
        f"fold must bound files at O(buckets): {n_files} > {_STATE_BUCKETS}"
    )


def test_compaction_crash_recovery(spark):
    """A compaction that crashes between its fold commit and its
    source-partition drops leaves the state transiently DUPLICATED on
    disk (fold in batch=0 + originals in batch=1..n) plus a pending
    intent marker. The next batch must complete the drops before
    reading state — otherwise the probe would double-count — and the
    final verdicts must equal a clean run's."""
    import os

    import pytest as _pytest

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        _state_tbl_names,
        compact_state,
        ensure_state_tables,
        neardup_batch_fn,
        neardup_read_verdicts,
    )

    staged = _stage_neardup(spark, SF_DIR)
    state_dir = scratch_dir("nd_crec_state")
    marker_dir = scratch_dir("nd_crec_markers")
    out_dir = scratch_dir("nd_crec_out")
    ensure_state_tables(spark, state_dir)
    fn = neardup_batch_fn(state_dir, out_dir, marker_dir)
    for n in (1, 2):
        fn(spark.read.parquet(os.path.join(staged, f"part-{n:04d}")), n)
    with _pytest.raises(RuntimeError, match="injected crash: fold"):
        compact_state(spark, state_dir, marker_dir, crash_after_fold=True)
    bands_tbl, _ = _state_tbl_names(state_dir)
    # the crash window: fold committed AND originals still present
    parts = {
        r["batch"]
        for r in spark.table(bands_tbl).select("batch").distinct().collect()
    }
    assert parts == {0, 1, 2}, parts
    assert os.path.exists(os.path.join(marker_dir, "compact_pending"))
    # batches 3 and 4 recover the pending fold, then apply normally
    for n in (3, 4):
        fn(spark.read.parquet(os.path.join(staged, f"part-{n:04d}")), n)
    assert not os.path.exists(os.path.join(marker_dir, "compact_pending"))
    parts = {
        r["batch"]
        for r in spark.table(bands_tbl).select("batch").distinct().collect()
    }
    assert parts == {0, 3, 4}, parts
    got = sorted(
        tuple(r) for r in neardup_read_verdicts(spark, out_dir).collect()
    )
    clean = sorted(
        tuple(r)
        for r in registry.get("stream_neardup_minhash")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert got == clean


def test_compaction_crash_after_last_batch_recovers(spark):
    """A compaction that crashes AFTER the LAST batch has no future
    'next batch' to piggyback recovery on, and every redelivered batch
    already has its applied marker (r11 ADVICE: the old code returned
    at the marker BEFORE the pending check, so the intent and the
    duplicated fold+original partitions persisted forever). Both
    recovery paths must clear it: a redelivered already-applied batch,
    and a resumed stream with nothing to redeliver (neardup_start)."""
    import os

    import pytest as _pytest

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        _state_tbl_names,
        compact_state,
        neardup_batch_fn,
        neardup_read_verdicts,
        neardup_start,
    )

    staged = _stage_neardup(spark, SF_DIR)
    state_dir = scratch_dir("nd_last_state")
    marker_dir = scratch_dir("nd_last_markers")
    out_dir = scratch_dir("nd_last_out")
    ckpt = scratch_dir("nd_last_ckpt")
    # consume the whole stream through the real streaming path so the
    # checkpoint records every batch as committed
    q = neardup_start(spark, staged, state_dir, out_dir, marker_dir, ckpt)
    q.awaitTermination()
    with _pytest.raises(RuntimeError, match="injected crash: fold"):
        compact_state(spark, state_dir, marker_dir, crash_after_fold=True)
    bands_tbl, _ = _state_tbl_names(state_dir)
    pending = os.path.join(marker_dir, "compact_pending")
    assert os.path.exists(pending)

    # Path 1: an at-least-once REDELIVERY of an already-applied batch
    # must recover the pending fold before its marker short-circuit.
    fn = neardup_batch_fn(state_dir, out_dir, marker_dir)
    fn(spark.read.parquet(os.path.join(staged, "part-0004")), 99)
    assert not os.path.exists(pending), "redelivered batch must recover"
    parts = {
        r["batch"]
        for r in spark.table(bands_tbl).select("batch").distinct().collect()
    }
    assert parts == {0}, parts

    # Path 2: a RESUMED stream with a consumed checkpoint redelivers
    # nothing (availableNow), so neardup_start itself must recover.
    with _pytest.raises(RuntimeError, match="injected crash: fold"):
        compact_state(spark, state_dir, marker_dir, crash_after_fold=True)
    assert os.path.exists(pending)
    q2 = neardup_start(spark, staged, state_dir, out_dir, marker_dir, ckpt)
    q2.awaitTermination()
    assert not os.path.exists(pending), "resumed stream must recover"
    parts = {
        r["batch"]
        for r in spark.table(bands_tbl).select("batch").distinct().collect()
    }
    assert parts == {0}, parts
    # verdicts untouched by either recovery
    got = sorted(
        tuple(r) for r in neardup_read_verdicts(spark, out_dir).collect()
    )
    clean = sorted(
        tuple(r)
        for r in registry.get("stream_neardup_minhash")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert got == clean


def test_dynamic_overwrite_conf_restored(spark):
    """partitionOverwriteMode=dynamic is scoped to the state writes
    (r11 ADVICE: it used to leak session-wide, silently changing
    overwrite-insertInto semantics for unrelated queries): both the
    per-batch write and the compaction fold must restore the caller's
    prior value — even when the fold crashes mid-way."""
    import os

    import pytest as _pytest

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _stage_neardup,
        compact_state,
        ensure_state_tables,
        neardup_batch_fn,
    )

    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        staged = _stage_neardup(spark, SF_DIR)
        state_dir = scratch_dir("nd_conf_state")
        marker_dir = scratch_dir("nd_conf_markers")
        out_dir = scratch_dir("nd_conf_out")
        ensure_state_tables(spark, state_dir)
        fn = neardup_batch_fn(state_dir, out_dir, marker_dir)
        for n in (1, 2):
            fn(spark.read.parquet(os.path.join(staged, f"part-{n:04d}")), n)
        assert spark.conf.get(key) == "static", "batch write leaked conf"
        with _pytest.raises(RuntimeError, match="injected crash: fold"):
            compact_state(spark, state_dir, marker_dir, crash_after_fold=True)
        assert spark.conf.get(key) == "static", "crashed fold leaked conf"
        compact_state(spark, state_dir, marker_dir)
        assert spark.conf.get(key) == "static", "compaction leaked conf"
    finally:
        if saved is not None:
            spark.conf.set(key, saved)
        else:
            spark.conf.unset(key)
