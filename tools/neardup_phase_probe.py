"""Decompose stream_neardup_minhash wall time into its two phases —
staging (signature/shingle precompute + per-batch files) vs the stream
replay (4 foreachBatch applies) — at an arbitrary staged scale.

The registered query's one timed number hides which phase moves; the
optimization rounds need the split before touching either (guide §1).

Usage: [K=100] python tools/neardup_phase_probe.py
  K: stage_sf1 copy count (default: use $SPARK_GRAFT_SF_DIR directly,
     or /root/testdata/sf0.1)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import oddsetl_spark  # noqa: F401,E402
from oddsetl_spark.session import get_spark, scratch_dir  # noqa: E402
from oddsetl_spark.streaming.stream_neardup import (  # noqa: E402
    _stage_neardup,
    neardup_read_verdicts,
    neardup_start,
)


def main() -> None:
    k = os.environ.get("K")
    if k:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from stage_sf1 import stage as _stage_sf1

        spark = get_spark("neardup-phase-probe")
        sf_dir = _stage_sf1(int(k), "low-dup")
    else:
        spark = get_spark("neardup-phase-probe")
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.setJobDescription("neardup probe: staging")
    t0 = time.perf_counter()
    staged = _stage_neardup(spark, sf_dir)
    t_stage = time.perf_counter() - t0
    sizes = {
        d: sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(staged, d))
            for f in fs
        )
        // (1 << 20)
        for d in sorted(os.listdir(staged))
    }
    print(f"staged batch MiB: {sizes}")

    spark.sparkContext.setJobDescription("neardup probe: stream replay")
    t0 = time.perf_counter()
    q = neardup_start(
        spark,
        staged,
        scratch_dir("npp_state"),
        out_dir := scratch_dir("npp_out"),
        scratch_dir("npp_markers"),
        scratch_dir("npp_ckpt"),
    )
    q.awaitTermination()
    t_stream = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = neardup_read_verdicts(spark, out_dir).count()
    t_read = time.perf_counter() - t0
    print(
        f"staging {t_stage:.1f}s  stream {t_stream:.1f}s  "
        f"read+count {t_read:.1f}s  verdicts {n}  "
        f"loadavg {os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
