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
