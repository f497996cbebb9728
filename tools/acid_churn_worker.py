"""Multi-process MVCC churn worker (driven by
tests/test_acid_table.py::test_reader_consistency_under_writer_and_vacuum_churn).

Three roles hammer one AcidTable from separate OS processes. The table's
data path is engine-agnostic (parquet files + the manifest log), so the
workers use pyarrow directly — no Spark session, maximum iteration rate.

  writer <n_ops>: alternates APPEND commits (one 100-row parquet file)
    with MERGE commits (two oldest active files rewritten into one —
    creating unreferenced files for vacuum to reclaim). Every commit's
    op string encodes the expected total row count ("rows=N"), making
    every version self-describing.
  reader <n_reads>: loop — pick the LATEST version, resolve its file
    set through active_files (which enforces the vacuum horizon), count
    rows with pyarrow, and compare against the op string's rows=N. A
    torn snapshot (missing file / wrong count) is a consistency
    violation; a refused pre-horizon read is NOT (the reader retries on
    the newer latest — the documented racing-reader contract of
    version-based retention).
  vacuumer <n_vacs>: loop — vacuum(retain_from_version=latest-3,
    grace_seconds=0.5): three versions of retention slack for in-flight
    readers, plus the documented concurrent-writer grace window (a
    zero-grace vacuum reclaims a racing writer's just-landed data file
    before its manifest publishes — observed live when this test first
    ran with the default 0).

Exit 0 on success. reader prints "READS <ok> <retried>"; vacuumer
prints "DELETED <n>"; writer prints "WROTE <n>".
"""

from __future__ import annotations

import os
import sys
import time


def _write_file(path: str, n: int, base: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": list(range(base, base + n))}), path
    )


def main() -> None:
    role, root, n_iter = sys.argv[1], sys.argv[2], int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from oddsetl_spark.sources.acid_table import AcidTable, CommitConflictError

    t = AcidTable(root)

    if role == "writer":
        import json

        import pyarrow.parquet as pq

        os.makedirs(t.data_dir, exist_ok=True)
        done = 0
        seq = 0
        while done < n_iter:
            v = t.latest_version()
            m = json.load(open(t._manifest_path(v)))
            total = int(m["op"].split("rows=")[1])
            active, _s, _d = t._fold_state(v)
            merge = done % 3 == 2 and len(active) >= 2
            try:
                if merge:
                    a, b = sorted(active)[:2]
                    na = pq.read_table(os.path.join(root, a)).num_rows
                    nb = pq.read_table(os.path.join(root, b)).num_rows
                    out = f"data/merge-{os.getpid()}-{seq}.parquet"
                    seq += 1
                    _write_file(os.path.join(root, out), na + nb, 0)
                    t.commit(
                        v + 1, f"merge rows={total}",
                        add=[out], remove=[a, b],
                    )
                else:
                    out = f"data/append-{os.getpid()}-{seq}.parquet"
                    seq += 1
                    _write_file(os.path.join(root, out), 100, total)
                    t.commit(
                        v + 1, f"append rows={total + 100}",
                        add=[out], remove=[],
                    )
                done += 1
                time.sleep(0.025)  # keep churn running long enough for
                # the vacuumer's grace-aged files to appear mid-run
            except CommitConflictError:
                continue  # rebase: another writer claimed the slot
        print(f"WROTE {done}", flush=True)

    elif role == "reader":
        import json

        import pyarrow.parquet as pq

        ok = retried = 0
        while ok < n_iter:
            v = t.latest_version()
            m = json.load(open(t._manifest_path(v)))
            want = int(m["op"].split("rows=")[1])
            try:
                files = t.active_files(v)
                got = sum(pq.read_table(f).num_rows for f in files)
            except (ValueError, FileNotFoundError, OSError):
                # pre-horizon refusal or a racing vacuum beat this read:
                # the documented retry path, NOT a torn result
                retried += 1
                if retried > 50 * n_iter:
                    raise
                continue
            assert got == want, (
                f"TORN SNAPSHOT at v{v}: counted {got}, manifest says {want}"
            )
            ok += 1
        print(f"READS {ok} {retried}", flush=True)

    elif role == "vacuumer":
        deleted = 0
        for _ in range(n_iter):
            latest = t.latest_version()
            deleted += len(
                t.vacuum(retain_from_version=max(0, latest - 3),
                         grace_seconds=0.5)
            )
            time.sleep(0.05)
        print(f"DELETED {deleted}", flush=True)

    else:
        raise SystemExit(f"unknown role {role}")


if __name__ == "__main__":
    main()
