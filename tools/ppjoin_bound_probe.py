"""Measure the pair join's candidate volume: pairs entering the
set-intersect verify stage, plus end-to-end wall (warm), at ~sf1 and
~sf10 stagings.

This was the instrument for the r10 NEGATIVE result on the PPJoin
accumulated-overlap bound (aggregate all prefix matches per pair,
filter on m + min(nA-pa*, nB-pb*) >= alpha — sound, subsumes the
per-match positional filter): candidates dropped only 1.5% at ~sf1
(1,177,696 -> 1,160,219; cand/pair 7.3 -> 7.2) while the pre-agg join
volume tripled and the ~sf10 wall went 100 -> 127 s. Reverted; the
per-match filter + distinct remains production (SCALING.md round 10).

Production reference points (per-match positional filter):
  ~sf1  candidates 1.18M (7.3/pair), pair join ~8 s warm
  ~sf10 candidates 11.8M (7.3/pair), pair join ~104 s warm
        (verify stage 26 s of that — the wall is the linear
        index-build, not the candidate volume)

Usage: python tools/ppjoin_bound_probe.py [sf_dir ...]
Default: the K=10 and K=100 low-dup stagings (staged on demand).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oddsetl_spark.operators.llm_dedup import _jaccard_pairs_tau  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402
from tools.stage_sf1 import stage  # noqa: E402


def main() -> None:
    spark = get_spark("ppjoin-bound-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = sys.argv[1:] or [stage(10, "low-dup"), stage(100, "low-dup")]
    for d in dirs:
        n_cand = _jaccard_pairs_tau(spark, d, candidates_only=True).count()
        n_pairs = _jaccard_pairs_tau(spark, d).count()  # warm-up + truth
        t0 = time.perf_counter()
        _jaccard_pairs_tau(spark, d).count()
        wall = time.perf_counter() - t0
        print(
            f"{d}: candidates={n_cand:,} pairs={n_pairs:,} "
            f"(cand/pair {n_cand / max(n_pairs, 1):.2f}) warm={wall:.1f}s"
        )


if __name__ == "__main__":
    main()
