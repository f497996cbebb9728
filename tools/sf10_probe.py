"""~sf10 headliner probe: one decade beyond the bench's ~sf1 series.

Stages K=100 low-dup copies of sf0.1 (lineitem 60M rows, documents
499,200 / corpus ~1.5M distinct texts, embeddings 200k) — the same
staging recipe as bench.py's sf1 block, 10x — and times the headline
queries warm. Together with the sf0.1 / ~sf1 bench series this gives
three decades of the same plans on fixed cores: per-query sec must grow
~10x decade-over-decade (linear work, fixed parallelism) for the
100 TB claim to hold; super-linear growth flags the operator.

Collect-heavy rows (win_sessionize at ~9.5M session rows) are timed with
the noop-sink exec twin only, like the bench series.

Known staging caveat at K=100: the low-dup embedding mutation rotates
copy i by i % 64 dims, so copies 64..99 repeat rotations of copies
0..35 — ~36% of vectors acquire one exact twin. Fine for timing
(work only grows), disclosed here for reading the sim_* rows.

Usage: python tools/sf10_probe.py [query ...]   (default: bench set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import oddsetl_spark as o  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402
from tools.stage_sf1 import stage  # noqa: E402

COLLECT = [
    "agg_groupby_multi",
    "join3_topk_revenue",
    "join_broadcast_star",
    "win_sessionize_stats",
    "sim_cosine_topk",
    "text_token_count",
    "dedup_minhash_det",
    "sim_ann_ivf",
    "sim_lsh_whitened",
    "dedup_components",
    "graph_pagerank",
    "table_stats_skipping",
]
EXEC_ONLY = ["win_topk_per_group", "win_sessionize"]


def main() -> None:
    queries = sys.argv[1:] or COLLECT + EXEC_ONLY
    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = stage(100, "low-dup")
    print(f"staged: {sf_dir}")
    for q in queries:
        fn = o.registry.get(q).fn
        try:
            if q in EXEC_ONLY:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                print(f"{q:28s} {time.time() - t0:7.2f}s (exec)")
            else:
                fn(spark, sf_dir).count()  # warm
                t0 = time.time()
                fn(spark, sf_dir).collect()
                print(f"{q:28s} {time.time() - t0:7.2f}s")
        except Exception as exc:  # noqa: BLE001
            print(f"{q:28s} FAIL {type(exc).__name__}: {str(exc)[:160]}")


if __name__ == "__main__":
    main()
