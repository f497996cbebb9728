"""Isolate ONE registered query on ONE data dir in a fresh process:
warm-up + N timed runs (collect, same action as bench.py), wall times to
stdout. Usage:
    python tools/isolate_probe.py <sf_dir> <query> [n_runs=3]
Honors $SPARK_GRAFT_CPUS like bench.py; set ODDSETL_DEDUP_TIMING=1 /
ODDSETL_NEARDUP_TIMING=1 for the in-operator phase marks."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import oddsetl_spark  # noqa: E402,F401
from oddsetl_spark import registry  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("oddsetl-isolate")
    fn = registry.all_queries()[name].fn
    spark.sparkContext.setJobDescription(f"isolate warmup: {name}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    print(f"{name} warmup={time.perf_counter() - t0:.2f}", flush=True)
    for i in range(n_runs):
        spark.sparkContext.setJobDescription(f"isolate run{i}: {name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        print(f"{name} run{i}={time.perf_counter() - t0:.2f}", flush=True)


if __name__ == "__main__":
    main()
