"""ACID commit-log depth probe: prove checkpointed snapshot folds stay
O(tail), not O(commits).

`table_log_checkpoint` demonstrates the mechanic at 12 commits; this
probe measures the CURVATURE at depth: build logs of N commits (each a
realistic append manifest carrying a few files + per-file stats), then
time `_fold_state(head)`:

- scratch fold (no checkpoint on disk) — must grow ~linearly with N
  (it opens every manifest);
- checkpointed fold (checkpoint at N - TAIL) — must stay ~flat in N
  (seeds from the checkpoint, replays only TAIL manifests).

This is a pure log-layer probe: manifests are committed through the real
`AcidTable.commit` / `checkpoint` / `_fold_state` code paths (atomic
link publish, JSON manifests, checkpoint files), with synthetic file
names — fold cost depends only on the log, never on data bytes, so no
parquet needs to exist. On a streaming table with years of commits this
curve is the difference between opening a million manifests per query
plan and opening a handful.

Usage: python tools/acid_log_probe.py [N ...]   (default 25 50 100 200)
Prints one JSON line: {"probe": "acid_log_fold", "tail": TAIL,
"depths": {N: {"scratch_ms": .., "ckpt_ms": .., "manifests_opened":
{"scratch": N+1, "ckpt": TAIL}}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oddsetl_spark.sources.acid_table import AcidTable  # noqa: E402

BASE = "/tmp/oddsetl_acid_log_probe"
TAIL = 5  # manifests behind the checkpoint (fixed, depth-independent)
FILES_PER_COMMIT = 4  # realistic small-append shape
REPS = 5  # median-of-REPS per timing


def build_log(n_commits: int) -> AcidTable:
    root = os.path.join(BASE, f"depth_{n_commits}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    t = AcidTable(root)
    for v in range(n_commits):
        add = [f"data/commit-{v:05d}/part-{i:02d}.parquet"
               for i in range(FILES_PER_COMMIT)]
        stats = {
            f: {"k": [v * FILES_PER_COMMIT + i, v * FILES_PER_COMMIT + i + 1]}
            for i, f in enumerate(add)
        }
        t.commit(v, "append", add=add, remove=[], stats=stats)
    return t


def median_ms(fn, reps: int = REPS) -> float:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append((time.perf_counter() - t0) * 1000)
    return round(sorted(runs)[reps // 2], 3)


def main() -> None:
    depths = [int(a) for a in sys.argv[1:]] or [25, 50, 100, 200]
    out: dict[str, dict] = {}
    for n in depths:
        t = build_log(n)
        head = t.latest_version()
        scratch_ms = median_ms(lambda: t._fold_state(head))
        active_scratch = t._fold_state(head)[0]
        ckpt_v = t.checkpoint(head - TAIL)
        ckpt_ms = median_ms(lambda: t._fold_state(head))
        active_ckpt = t._fold_state(head)[0]
        assert active_scratch == active_ckpt, (
            f"checkpointed fold diverged at depth {n}"
        )
        out[str(n)] = {
            "scratch_ms": scratch_ms,
            "ckpt_ms": ckpt_ms,
            "manifests_opened": {"scratch": head + 1, "ckpt": TAIL},
            "ckpt_version": ckpt_v,
            "active_files": len(active_ckpt),
        }
    shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps({"probe": "acid_log_fold", "tail": TAIL, "depths": out}))


if __name__ == "__main__":
    main()
