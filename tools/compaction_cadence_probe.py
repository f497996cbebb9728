"""Many-batch small-file microbench for streaming-state compaction
cadence (r11 verdict item 5): drive N micro-batches through
neardup_batch_fn under three maintenance policies —

  none       — never compact (the O(batches x buckets) file wall)
  every2     — the old fixed every-2nd-batch demo cadence
  threshold  — compact when state_file_count > --files-over (the
               production rule; see _COMPACT_FILES_DEFAULT's derivation)

and record, per policy: per-batch apply walls, the state file count
after every batch, where folds fired, and a standalone state-side probe
(band-collision join against the last batch's bands, cold listing,
median-of-3) over the final state. The threshold derivation's constants
(probe ms/file, fold cost, files/batch) come from the `none` vs
post-fold probe numbers this tool prints.

Usage: python tools/compaction_cadence_probe.py [n_batches] [sf_dir]
         [--files-over N]
Defaults: 48 batches, /root/testdata/sf0.01, threshold 3072.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oddsetl_spark.session import get_spark, scratch_dir  # noqa: E402
from oddsetl_spark.streaming.stream_neardup import (  # noqa: E402
    _band_collisions,
    _bands_of,
    _stage_neardup,
    _state_tbl_names,
    ensure_state_tables,
    neardup_batch_fn,
    state_file_count,
)


def run_policy(
    spark, staged: str, n_batches: int, policy: str, files_over: int
) -> dict:
    state_dir = scratch_dir(f"ccp_{policy}_state")
    out_dir = scratch_dir(f"ccp_{policy}_out")
    marker_dir = scratch_dir(f"ccp_{policy}_markers")
    ensure_state_tables(spark, state_dir)
    fn = neardup_batch_fn(
        state_dir,
        out_dir,
        marker_dir,
        compact_every=2 if policy == "every2" else 0,
        compact_files_over=files_over if policy == "threshold" else 0,
    )
    walls, files, folds = [], [], []
    prev_parts: set[int] = set()
    bands_tbl, _ = _state_tbl_names(state_dir)
    for n in range(1, n_batches + 1):
        bdf = spark.read.parquet(os.path.join(staged, f"part-{n:04d}"))
        t0 = time.perf_counter()
        fn(bdf, n)
        walls.append(round(time.perf_counter() - t0, 3))
        files.append(state_file_count(state_dir))
        parts = {
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(state_dir, "bands"))
            if d.startswith("batch=")
        }
        if 0 in parts and not prev_parts <= parts:
            folds.append(n)  # some per-batch partitions vanished: a fold
        prev_parts = parts
    # Standalone state probe: cold listing (refresh), then the co-located
    # band-collision join against the LAST batch's bands, median-of-3 —
    # the per-batch cost a long-running stream pays forever.
    spark.catalog.refreshTable(bands_tbl)
    probe_bands = _bands_of(
        spark.read.parquet(os.path.join(staged, f"part-{n_batches:04d}"))
    ).localCheckpoint()
    state_bands = spark.table(bands_tbl).drop("batch")
    runs = []
    for _ in range(3):
        spark.catalog.refreshTable(bands_tbl)
        t0 = time.perf_counter()
        _band_collisions(state_bands, probe_bands).count()
        runs.append(round(time.perf_counter() - t0, 3))
    return {
        "apply_walls_s": walls,
        "apply_sum_s": round(sum(walls), 1),
        "files_after_each_batch": files,
        "final_files": files[-1],
        "folds_at_batches": folds,
        "probe_runs_s": runs,
        "probe_median_s": sorted(runs)[1],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 48
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    files_over = 3072
    if "--files-over" in sys.argv:
        files_over = int(sys.argv[sys.argv.index("--files-over") + 1])
    spark = get_spark("compaction-cadence-probe")
    spark.sparkContext.setLogLevel("ERROR")
    staged = _stage_neardup(spark, sf_dir, n_batches=n_batches)
    out = {
        "n_batches": n_batches,
        "sf_dir": sf_dir,
        "files_over": files_over,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    for policy in ("none", "every2", "threshold"):
        out[policy] = run_policy(spark, staged, n_batches, policy, files_over)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
