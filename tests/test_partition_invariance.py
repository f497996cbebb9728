"""Partition-count invariance: a distributed query's RESULT must not
depend on how the data is split.

This is the correctness property that actually matters at 100 TB: on a
1000-executor cluster every knob below differs from local[32] — shuffle
width, input split sizes, AQE coalescing decisions — and any query whose
output drifts under those knobs (order-sensitive double sums, first()
without ordering, limit without sort) is silently wrong at scale even
though its single-configuration oracle diff passes. Here a representative
query per shuffle-using family runs under the default layout and again
under a deliberately hostile one (5 shuffle partitions via the
ODDSETL_SHUFFLE_PARTITIONS pin override + 64 KB input splits so every
scan fans out into many tiny tasks), asserting bit-identical canonical
results.
"""

from __future__ import annotations

import os

import pytest

import oddsetl_spark  # noqa: F401 — populates the registry
from oddsetl_spark import registry

from .harness import SF_DIRS, _rows_canon

SF_DIR = SF_DIRS[os.environ.get("ODDSETL_TEST_SF", "0.001")]

# One representative per shuffle-shape family: hash agg, window, join+topk,
# iterative dedup, multi-stage funnel, broadcast+window similarity,
# window-chain SCD, set op with duplicate accounting, explode+join TF-IDF,
# exact percentiles (full sort).
INVARIANCE_SET = [
    "agg_groupby_multi",
    "win_sessionize_stats",
    "join3_topk_revenue",
    "dedup_minhash_det",
    "curate_pipeline_funnel",
    "sim_cosine_topk",
    "etl_scd2",
    "set_except_all",
    "text_tfidf_topterms",
    "agg_percentiles",
    # iterative propagation, closed-form sufficient statistics, broadcast
    # range join, and executor-side observe() counters each have their own
    # ways to depend on layout — pin them too
    "graph_bfs_distance",
    "agg_multivar_regression",
    "join_temporal_scd2",
    "obs_metrics_audit",
    # round-3 additions with layout-sensitive shapes: rank statistics over
    # the value grid, synchronous label propagation (per-round argmax),
    # a Python mapInPandas stage feeding a window, and the struct-state
    # sequential fold
    "agg_ks_test",
    "graph_label_propagation",
    "mm_video_scene_cut",
    "win_holt_linear",
    # continuation additions: rank statistics with grid joins, the
    # user-day range joins, and the streaming SCD2 replay
    "agg_spearman_corr",
    "agg_robust_means",
    "win_dau_wau_mau",
    "stream_scd2_foreachbatch",
    # round-4 additions: the ACID layer's COW merge + log replay, the
    # de-windowed exact global rank, and the contracted components must
    # all be bit-identical under hostile partitioning
    "table_merge_acid",
    "table_time_travel",
    "agg_histogram_equidepth",
    "dedup_components",
    # round-4 continuation: the sweep-line island windows, the hashed span
    # inverted index, driver-looped BPE merges (argmax must not depend on
    # partial-agg layout), the watermark-pinned stream outer join, and the
    # DV read path (broadcast anti-join over positions)
    "win_interval_union_length",
    "dedup_substring_spans",
    "text_bpe_train",
    "stream_outer_join_timeout",
    "table_deletion_vectors",
    # raw-double rank sums rounded only at the end: pin that 6-dp rounding
    # keeps absorbing layout effects for both PageRank variants
    "graph_pagerank",
    "graph_personalized_pagerank",
    # native session merge, min-plus relaxation rounds, the double-shuffle
    # bridge allocation, and hash-thinning sampling must not depend on
    # layout either
    "win_session_window_native",
    "graph_sssp_bounded",
    "etl_bridge_allocation",
    "curate_domain_resample",
    # disaster-domain batch: cell/bucket-exploded blocked joins, the
    # scatter-sum raster, the bit-packed signature fold + per-query rank,
    # and the spine-gap-filled trailing frame
    "geo_spatiotemporal_join",
    "geo_kde_heatmap",
    "sim_binary_quantize_rerank",
    "win_burst_detection",
    # skyline: local ranks come from monotonically_increasing_id over
    # range partitions — the FRONTIER must be boundary-independent
    "agg_skyline_pareto",
    # pattern match: collect_list arrives in partition order — array_sort
    # must fully canonicalize it before the regex fold
    "win_event_pattern_match",
    # 3-D skyline: LOCAL skylines differ per layout by construction; the
    # exact dominance refine must make the FINAL frontier invariant
    "agg_skyline_3d",
    # streaming CEP: in-batch sort + monotone-count max collapse must make
    # the alert counts independent of micro-batch layout
    "stream_cep_pattern_alert",
    # join-view IVM: exceptAll bag differences must be layout-independent
    "etl_incremental_join_mv",
    # late additions: collect-order canonicalization (merkle), the
    # integer LLR walk, the 2x2 two-phase cells, the persisted-edge
    # argmax, and the reverse-cumsum life table
    "etl_merkle_range_diff",
    "agg_sprt_sequential",
    "agg_diff_in_diff",
    "graph_louvain_round",
    "curate_kaplan_meier",
    # round 5: the PCA Gramian fold now tree-merges on spark_partition_id
    # mod isqrt(P) — the contract output (count + tolerance flags) must
    # stay invariant when the layout (and therefore the merge grouping
    # AND float fold order) changes under it
    "emb_pca_project",
    # round 6: the reworked IVF (scaled-long sqdist partials + min-struct
    # assignment are exact integer math, so layout must not move any
    # nearest-centroid tie) and the density-adaptive LSH (the planes
    # ladder reads a COUNT — layout-independent — and bucket signs are
    # per-row expressions)
    "sim_ann_ivf",
    "sim_lsh_approx",
    # round 6 de-windowing: both build on range-partition + offset
    # decompositions whose sampled range boundaries MOVE under layout
    # changes — ranks and prefix sums must not (exact integer arithmetic
    # over a total order)
    "etl_surrogate_keys",
    "win_max_concurrency",
    # round 8: the whitened-rotation LSH derives its planes from the
    # tree-merged Gramian fold (float accumulation order moves with the
    # layout) — the contract output (exact counts + bound flags with
    # wide margins) must stay invariant under re-partitioning
    "sim_lsh_whitened",
    # round 9: the ANALYZE-backed CBO profile — statistics change the
    # PLAN (build side), never the result; the catalog landing +
    # conf-restore must hold under any layout
    "opt_cbo_stats_profile",
]


def _canon_result(spark, name: str):
    df = registry.get(name).fn(spark, SF_DIR)
    return df.columns, _rows_canon(df.collect(), df.columns)


@pytest.mark.parametrize("name", INVARIANCE_SET)
def test_partition_invariance(spark, name):
    baseline_cols, baseline = _canon_result(spark, name)
    old_split = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    os.environ["ODDSETL_SHUFFLE_PARTITIONS"] = "5"
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        hostile_cols, hostile = _canon_result(spark, name)
    finally:
        del os.environ["ODDSETL_SHUFFLE_PARTITIONS"]
        if old_split is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)
    assert sorted(hostile_cols) == sorted(baseline_cols)
    assert hostile == baseline, (
        f"{name}: result depends on partitioning "
        f"({len(baseline)} vs {len(hostile)} rows)"
    )
