"""Scale-linearity probe: demonstrate that headline plans scale ~linearly
in rows on fixed cores — the local-mode proxy for "the plan survives a
100x scale-up" (per-core work and shuffle volume grow linearly; no
super-linear stage like an all-pairs join or a single-partition window).

Method: materialize sf0.1 fact tables multiplied K times (union of K
shifted copies written to /tmp parquet — key offsets preserve join
selectivity and group cardinality per copy), run each headline query warm
at K in {1, 4, 10}, and report seconds plus the normalized sec/K ratio.
A flat sec/K column = linear scaling; growth flags a scale hazard.

Usage: python tools/scale_probe.py [K ...]   (default 1 4 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import oddsetl_spark as o  # noqa: E402
from oddsetl_spark.io import TABLES  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/oddsetl_scale_probe"

# Facts are multiplied; dims stay fixed (a 100 TB deployment grows facts,
# not region/nation). Key columns shifted per copy keep per-copy join
# fan-outs and group counts identical to sf0.1's.
FACT_SHIFT = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

QUERIES = [
    "agg_groupby_multi",
    "join3_topk_revenue",
    "join_broadcast_star",
    "win_topk_per_group",
    "win_sessionize_stats",
    "text_token_count",
    # round-3 additions: the bucketed dedup paths and the end-to-end
    # funnel are exactly the operators whose scale behavior needs proof
    "dedup_minhash_det",
    "dedup_simhash_det",
    "curate_pipeline_funnel",
    "sim_cosine_topk",
    "emb_matryoshka_eval",
    # round-3 continuation: rank statistics on the value grid, the
    # seven-join denormalization, iterative label propagation, and the
    # calendar-bounded daily-series windows (cost must stay FLAT in K,
    # not merely linear — the series length is fixed by the calendar)
    "agg_ks_test",
    "agg_auc_roc",
    "etl_denormalize_wide",
    "graph_label_propagation",
    "win_bollinger_bands",
    # round-4 risk set: the de-windowed exact-rank operators (global NTILE
    # replaced by range-partition + broadcast offsets), the re-bucketed
    # prefix-sum packer, banded MinHash-LSH, and iterative components —
    # the five operators VERDICT r3 flagged for empirical curvature proof
    "agg_histogram_equidepth",
    "curate_quality_ntile",
    "agg_revenue_concentration",
    "curate_pack_chunks",
    "dedup_minhash_lsh",
    "dedup_components",
    # round-4 continuation additions: the sweep-line interval union (one
    # window exchange), the hashed span inverted index, the CMS build
    # (fixed d*w cells regardless of K), Bloom membership (broadcast bit
    # set), and personalized PageRank (persisted edges, moving ranks)
    "win_interval_union_length",
    "dedup_substring_spans",
    "text_cms_heavy_hitters",
    "join_bloom_membership",
    "graph_personalized_pagerank",
    # round-4 disaster-domain batch: blocked spatiotemporal join (work ~
    # co-located pairs; replication multiplies same-cell density), the
    # scatter-sum raster (output bounded by occupied cells), the bit
    # -packed scan + per-query top-k, and the calendar-bounded burst spine
    "geo_spatiotemporal_join",
    "geo_kde_heatmap",
    "sim_binary_quantize_rerank",
    "win_burst_detection",
    # skylines (range-decomposed running max; D&C local skylines whose
    # candidate union must stay frontier-sized) and the per-user regex
    # fold (string length bounded by per-user events)
    "agg_skyline_pareto",
    "agg_skyline_3d",
    "win_event_pattern_match",
    # final-wave heavies: the m^2-free Louvain gain join and the
    # range-digest fold (bounded 256-key groups)
    "graph_louvain_round",
    "etl_merkle_range_diff",
    # round 5: the tree-merged Gramian fold — driver payload tracks
    # partition count, not rows, so sec/K must stay flat
    "emb_pca_project",
    # round 6: density-adaptive hyperplane LSH — planes ladder must keep
    # the bucket join sub-quadratic (see tools/lsh_density_probe.py for
    # the candidate-count companion probe) — and the reworked IVF
    # headliner (scaled-long distances, broadcast-candidate rerank)
    "sim_lsh_approx",
    "sim_ann_ivf",
    # round 6: keep-best now rides the contracted component machinery —
    # its pair-finding must stay linear in DISTINCT texts under
    # duplicate-heavy replication (was >120 s at K=10 uncontracted)
    "curate_dedup_keep_best",
    # round 8: the whitened-orthonormal LSH — bucket volume must stay
    # ~uniform-linear in K (see tools/lsh_density_probe.py companion)
    "sim_lsh_whitened",
]


def stage(spark, k: int) -> str:
    out = f"{BASE}/k{k}"
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in FACT_SHIFT and k > 1:
            copies = []
            for i in range(k):
                c = src
                for col, span in FACT_SHIFT[t].items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * span))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    only = os.environ.get("ODDSETL_PROBE_QUERIES")
    queries = (
        [q.strip() for q in only.split(",") if q.strip()] if only else QUERIES
    )
    unknown = [q for q in queries if q not in o.registry.all_queries()]
    assert not unknown, f"unknown probe queries: {unknown}"
    spark = get_spark("scale-probe")
    results: dict[str, dict[int, float]] = {q: {} for q in queries}
    for k in ks:
        sf_dir = stage(spark, k)
        for q in queries:
            fn = o.registry.get(q).fn
            fn(spark, sf_dir).count()  # warm: file listing, codegen
            t0 = time.time()
            fn(spark, sf_dir).collect()
            results[q][k] = round(time.time() - t0, 3)
    print(f"\n{'query':28s}" + "".join(f"  K={k:<3d}" for k in ks) + "   sec/K ratio (last/first, ideal ~1 after fixed cost)")
    for q in queries:
        r = results[q]
        per_k = [r[k] / k for k in ks]
        ratio = per_k[-1] / per_k[0]
        print(
            f"{q:28s}"
            + "".join(f"  {r[k]:5.2f}" for k in ks)
            + f"   {ratio:5.2f}"
        )
    with open("/tmp/scale_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
