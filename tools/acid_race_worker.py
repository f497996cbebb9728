"""Multi-process ACID commit-race worker (driven by
tests/test_acid_table.py::test_commit_race_multiprocess_linearizes).

Each invocation is an independent OS process hammering the SAME table's
manifest log with append commits through the real put-if-absent protocol
(AcidTable.commit: temp write + fsync + os.link claim). On
CommitConflictError it rebases — re-reads latest_version and retries the
next slot — exactly what a real concurrent writer does. Pure log-layer
(synthetic file paths, no parquet): maximum contention, which is the
point.

Args: root writer_id n_commits
Prints one line: DONE <writer_id> <n_commits> <n_conflicts>
Exit 0 on success; any exception is a protocol failure.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    root, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from oddsetl_spark.sources.acid_table import AcidTable, CommitConflictError

    t = AcidTable(root)
    conflicts = 0
    for seq in range(n):
        while True:
            next_v = t.latest_version() + 1
            try:
                t.commit(
                    next_v,
                    f"w{wid}-c{seq}",
                    add=[f"data/w{wid}-{seq}/part-00.parquet"],
                    remove=[],
                )
                break
            except CommitConflictError:
                conflicts += 1  # racer won this slot — rebase and retry
    print(f"DONE {wid} {n} {conflicts}", flush=True)


if __name__ == "__main__":
    main()
