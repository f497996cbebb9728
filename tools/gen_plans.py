import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import oddsetl_spark
from oddsetl_spark import registry
from oddsetl_spark.session import get_spark

spark = get_spark("plans")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

HEADLINE = ["agg_groupby_multi", "join3_topk_revenue", "join_broadcast_star",
            "win_topk_per_group", "win_sessionize", "sim_cosine_topk",
            "text_token_count", "dedup_minhash_lsh", "join_range_binned",
            "sink_bucketed_join", "join_runtime_bloomfilter",
            "join_dynamic_partition_pruning", "geo_grid_join",
            "win_sessionize_stats", "dedup_embedding_cosine",
            "curate_contamination", "mm_kmeans_iterate", "opt_zorder_cluster",
            "text_bigram_lm_score", "win_funnel_stages", "sim_ann_pq",
            "curate_semdedup", "graph_triangle_count", "text_heavy_hitters",
            "sim_maxsim_multivec", "win_ewma", "graph_link_prediction",
            "text_chunk_sliding", "sort_total_order_range",
            "dedup_minhash_det", "curate_pipeline_funnel",
            "join_temporal_scd2", "emb_matryoshka_eval",
            "etl_expectations_quarantine", "scan_file_lineage",
            "etl_denormalize_wide", "sim_ivf_pq", "agg_ks_test",
            "dedup_incremental_batch", "win_dau_wau_mau",
            # round-4: de-windowed exact ranks, contracted components,
            # and the ACID layer's heavy queries
            "agg_histogram_equidepth", "curate_quality_ntile",
            "agg_revenue_concentration", "curate_pack_chunks",
            "dedup_components", "table_merge_acid", "table_zorder_skipping",
            "agg_sketch_set_algebra",
            # round-4 continuation
            "win_interval_union_length", "join_bloom_membership",
            "dedup_substring_spans", "text_cms_heavy_hitters",
            "graph_personalized_pagerank", "table_deletion_vectors",
            "win_time_weighted_avg", "dedup_candidate_eval",
            "text_bpe_train", "curate_decision_stump",
            "graph_sssp_bounded", "win_session_window_native",
            "etl_bridge_allocation", "curate_contamination_embedding",
            "stream_two_sink_txn",
            # round-4 second continuation: TPC-H representatives + the
            # disaster-domain batch
            "tpch_q03", "tpch_q08", "tpch_q17", "tpch_q21",
            "geo_spatiotemporal_join", "geo_kde_heatmap",
            "sim_binary_quantize_rerank", "win_burst_detection",
            "etl_incremental_join_mv", "etl_merkle_range_diff",
            "graph_louvain_round", "agg_skyline_3d",
            "agg_sprt_sequential", "curate_kaplan_meier",
            # round 5: the tree-merged distributed PCA
            "emb_pca_project",
            # round 6: the reworked IVF headliner and the density-adaptive
            # hyperplane LSH
            "sim_ann_ivf", "sim_lsh_approx",
            # round 8: the whitened-orthonormal rotation contract query
            "sim_lsh_whitened",
            # round 9: the (shingle, size_bin)-keyed prefix join
            "dedup_jaccard_length_binned",
            # round 10: the collision-proof string-keyed prefix join
            "dedup_jaccard_string_index"]

NOTES = {
    "dedup_jaccard_length_binned": "prefix join keyed on (shingle, "
        "size_bin): probe side explodes over the ~2 bins covering its "
        "exact ratio window; size-incompatible postings never meet.",
    "dedup_jaccard_string_index": "the same prefix similarity join with "
        "STRING shingle keys instead of xxhash64 — the registered "
        "fallback the in-pipeline collision guard directs to past the "
        "64-bit birthday bound (~1e12 distinct shingles at 100 TB); "
        "identical pair set (test_string_index_matches_hashed), the "
        "join key is just wider.",
    "sim_lsh_whitened": "data-dependent planes from the tree-merged "
        "Gramian fold (no corpus shuffle); bucket exprs are JVM literal "
        "folds; contract columns computed on a 500-vector a-side sample.",
    "sim_ann_ivf": "scaled-long sqdist feeds min-struct assignment (hash "
        "aggs, no window sort); candidates broadcast INTO the corpus-side "
        "rerank join — the scan never shuffles.",
    "sim_lsh_approx": "planes-per-table from the corpus-count ladder; "
        "bucket join volume ~ n*target occupancy, refine touches "
        "candidates only.",
    "win_interval_union_length": "one (user_id) exchange feeds both sweep "
        "windows AND the island agg; frames support-bounded.",
    "join_bloom_membership": "bit set and dim broadcast twice; probe side "
        "aggregates without a shuffle join.",
    "dedup_substring_spans": "span text hashed to int64 BEFORE the "
        "inverted-index shuffle; join back co-partitioned on the hash.",
    "text_cms_heavy_hitters": "sketch is a 64-cell hash aggregate "
        "(map-side combined); probes broadcast-join it.",
    "graph_personalized_pagerank": "edges persisted once; each round joins "
        "the small moving rank vector and re-aggregates on dst.",
    "table_deletion_vectors": "DV read path: scan + broadcast anti-join on "
        "(file_name, row_index); base never shuffles.",
    "win_time_weighted_avg": "lead window and the TWAP agg share one "
        "(user_id) exchange; weighted sums in DECIMAL(38).",
    "dedup_candidate_eval": "banding candidates and exact truth are two "
        "independent equi-join pipelines; scoreboard is three counts.",
    "text_bpe_train": "per-iteration pair counts map-side combine on the "
        "word table; merge applied as a narrow array fold.",
    "curate_decision_stump": "7-row threshold grid broadcast; one pass of "
        "conditional partial aggs; argmax window over 7 rows.",
    "graph_sssp_bounded": "persisted weighted edges; 3 min-plus rounds of "
        "frontier-join + MIN re-aggregate; all-integer, no rounding.",
    "win_session_window_native": "one aggregation pass with mergeable "
        "partial sessions; no window sort anywhere.",
    "etl_bridge_allocation": "line->order-total groupBy reuses the join "
        "key; orders join by key; brand rollup is the only second shuffle.",
    "curate_contamination_embedding": "bench set broadcast; corpus scans "
        "once with map-side MAX per vector.",
    "stream_two_sink_txn": "per-batch idempotent subdir writes x2 + one "
        "marker rename; readers union only marked batches.",
    "etl_denormalize_wide": "seven joins, every dimension side broadcast "
        "(7 BroadcastHashJoins, zero SMJ); key filter pushed to the fact scan.",
    "sim_ivf_pq": "codes join candidates on vec_id; probes and 128-entry LUTs "
        "broadcast; scoring is integer sums over probed lists only.",
    "agg_ks_test": "one exchange onto the cent grid; every window after runs "
        "over the bounded support, not the row count.",
    "dedup_incremental_batch": "exact anti-join then batch-shingles x corpus "
        "inverted index; no corpus-vs-corpus stage anywhere.",
    "win_dau_wau_mau": "events dedup to user-days once; range joins expand "
        "user-days x window width, independent of event volume.",
    "agg_groupby_multi": "Q1 flagship: pushed shipdate filter, 7-col ReadSchema, "
        "partial HashAggregate before the single exchange on the 2 grouping keys.",
    "join3_topk_revenue": "Q3 shape: filtered customer broadcast; orders⋈lineitem "
        "shuffles on orderkey; top-10 is TakeOrderedAndProject (no global sort).",
    "join_broadcast_star": "Q5-shape star: every dim join is BroadcastHashJoin; "
        "the only exchange belongs to the final aggregate.",
    "win_topk_per_group": "single exchange on o_custkey feeds sort+rank+filter; "
        "rank filter prunes before any further stage.",
    "win_sessionize": "both window passes share the user_id exchange, and the "
        "final session agg reuses it too (HashPartitioning(user_id) satisfies "
        "the (user_id, session_id) clustering) — ONE shuffle total.",
    "sim_cosine_topk": "query vectors broadcast; corpus never shuffles until the "
        "tiny ranked result.",
    "text_token_count": "explode+agg with partial aggregation before the exchange.",
    "dedup_minhash_lsh": "signatures via ONE pass groupBy(min) over (doc,shingle); "
        "banding join is equi (no all-pairs).",
    "join_range_binned": "theta band rewritten as equi-join on bin keys + refine "
        "filter — BroadcastHashJoin/SortMergeJoin, never nested loop.",
    "sink_bucketed_join": "both sides bucketed+sorted on the key: SortMergeJoin "
        "with ZERO Exchange (Bucketed: true, SelectedBucketsCount in the scans).",
    "join_runtime_bloomfilter": "bloom_filter_agg subquery from the selective side; "
        "might_contain() prunes the probe scan before the shuffle.",
    "join_dynamic_partition_pruning": "dynamicpruning#N subquery turns the dim "
        "result into PartitionFilters on the fact scan at runtime.",
    "geo_grid_join": "spatial proximity as equi-join on exploded cell ring + "
        "exact haversine refine — no all-pairs distance scan.",
    "win_sessionize_stats": "same sessionize pipeline as win_sessionize plus a "
        "per-user rollup: the collected result is ~n_users rows, not ~n_sessions.",
    "dedup_embedding_cosine": "block-grid exact all-pairs: pack 512-vector "
        "blocks, replicate A-blocks across grid cells via a bare-block-id "
        "theta join (the only nested-loop build is K longs), equi-join the "
        "B-block data, per-cell numpy matmul in mapInPandas. No packed "
        "vectors in any driver-side broadcast build; the b-side equi join "
        "is size-based (broadcast here, SortMergeJoin at scale).",
    "curate_contamination": "benchmark shingle set built small and BROADCAST; "
        "the training corpus side is a map-side BroadcastHashJoin + one "
        "uniform doc_id rollup — the corpus never shuffles on the shingle key.",
    "mm_kmeans_iterate": "per Lloyd round: broadcast k*d centroids joined "
        "map-side, argmin via one vec_id window, centroid means via one "
        "(c_id,pos) exchange; localCheckpoint caps plan depth per round.",
    "opt_zorder_cluster": "Morton z-value is a pure codegen projection "
        "(no UDF, no shuffle); single exchange for the z-bucket rollup.",
    "text_bigram_lm_score": "bigram model tables broadcast back onto the corpus "
        "bigrams; the only exchanges are the model-count rollups and the "
        "final per-doc aggregation.",
    "win_funnel_stages": "three same-key (user_id) aggregations; later "
        "stages join stage anchors on the identical key so exchanges "
        "co-locate instead of re-partitioning.",
    "sim_ann_pq": "codebook (16x64 values) and query LUTs (5x8x16) both "
        "BROADCAST; the corpus is encoded by map-side broadcast joins and "
        "the ADC scan is a broadcast-join projection + small grouped sum — "
        "the corpus never shuffles at full width, only (q,vec) partials.",
    "curate_semdedup": "assignment subtree lineage-cut once "
        "(localCheckpoint) and reused by all three consumers; the pairwise "
        "prune is a SortMergeJoin keyed on cluster — per-cluster local "
        "work, the SemDeDup scale contract (sum of c_i^2, never n^2).",
    "graph_triangle_count": "degree-ordered orientation: oriented edges "
        "close wedges with hash equi-joins only (no nested loop) — "
        "O(m^1.5) wedges instead of sum(deg^2), the hub-proof budget.",
    "text_heavy_hitters": "Misra-Gries candidates via MapInPandas (no "
        "shuffle), then a BROADCAST LeftSemi prunes the token stream "
        "BEFORE the count exchange — the shuffle carries candidates only.",
    "sim_maxsim_multivec": "tiny query side broadcast into the deliberate "
        "product (BroadcastNestedLoopJoin); per-(q_vec,d_doc) maxes reduce "
        "in a partial HashAggregate before the only exchange.",
    "win_ewma": "higher-order aggregate() fold inside the projection over "
        "ONE user_id window exchange — no Python eval, no second shuffle.",
    "agg_histogram_equidepth": "exact NTILE without a global window: ONE "
        "rangepartitioning exchange, local sort, broadcast per-partition "
        "offsets; the only Window runs over the ~32 count rows (_pn).",
    "curate_quality_ntile": "same range-partition + broadcast-offset "
        "decomposition; no single-task window anywhere in the plan.",
    "agg_revenue_concentration": "per-customer rollup then the distributed "
        "exact rank; head-share cutoffs fold into one mergeable aggregate.",
    "curate_pack_chunks": "distributed prefix sum: <=256 key-range buckets, "
        "base offsets broadcast, intra-bucket running sum partitioned by "
        "bucket — the packer that survives any corpus size.",
    "dedup_components": "exact-dup contraction first (distinct texts only "
        "enter the inverted-index pair join), then min-label rounds on the "
        "contracted graph with localCheckpoint lineage cuts.",
    "table_merge_acid": "copy-on-write MERGE: one base scan finds affected "
        "files via _metadata.file_path + broadcast semi-join; rewrite "
        "touches those files only, the rest carry by reference.",
    "table_zorder_skipping": "Morton-interleaved repartitionByRange write; "
        "2-D predicate prunes files from manifest stats on the driver "
        "before any parquet footer opens.",
    "agg_sketch_set_algebra": "one Theta sketch per segment, reused across "
        "all pair combinations; overlap estimates are kilobyte sketch ops, "
        "the raw fact table is scanned exactly once per side.",
    "graph_link_prediction": "wedge self-join on the shared neighbor plus "
        "anti/degree joins — every stage an equi-join or mergeable "
        "aggregate; no nested loop anywhere.",
    "text_chunk_sliding": "pure narrow array ops (split/sequence/explode/"
        "slice): the plan has NO exchange at all.",
    "sort_total_order_range": "distributed ORDER BY: ONE full-table "
        "rangepartitioning exchange (second consumer is a ReusedExchange); "
        "local ranks are a monotonic-id projection, offsets broadcast.",
    "dedup_minhash_det": "conformance twin of dedup_minhash_lsh: same "
        "per-doc array signatures (no explode), same banding equi-join — "
        "only the hash expressions differ (md5-derived, engine-agnostic), "
        "so the plan shape must match the xxhash64 variant's.",
    "curate_pipeline_funnel": "per-row gates (wc, lang) run inside the "
        "scan's codegen stage; exact dedup is a window min (one hash "
        "exchange, no join); the shingle self-join sees only gated "
        "survivors; benchmark shingles BROADCAST; all six stage counts "
        "union into one job.",
    "join_temporal_scd2": "SCD2 dim = two same-key windows over ONE "
        "exchange, then BROADCAST into the fact side: the range predicate "
        "evaluates map-side and facts never shuffle.",
    "emb_matryoshka_eval": "both rankings broadcast the 10-vector query "
        "side; the corpus scans twice (full-dim, prefix) without ever "
        "shuffling; the overlap join carries only (q_id, vec_id) pairs.",
    "etl_expectations_quarantine": "the whole rule stack is codegen "
        "projection + filter over the union — ZERO exchanges.",
    "scan_file_lineage": "_metadata.file_name comes from the scan itself; "
        "the only exchange carries n_files rows.",
    "tpch_q03": "customer broadcasts after the segment filter; both date "
        "filters pushed to the scans; top-10 is TakeOrderedAndProject.",
    "tpch_q08": "six dims broadcast; lineitem-orders is the single "
        "sort-merge exchange; the share ratio divides two raw long sums.",
    "tpch_q17": "the correlated avg decorrelates to a per-part groupBy "
        "re-joined on partkey; part dim broadcasts into the probe.",
    "tpch_q21": "decorrelated EXISTS/NOT-EXISTS: two rollups on the same "
        "orderkey partitioning replace the canonical triple self-join.",
    "geo_spatiotemporal_join": "45x (3x5x3) bucket explode rides the hazard side; "
        "the candidate join is a pure 3-key equi-join; refine in codegen.",
    "geo_kde_heatmap": "9x scatter explode map-side on a narrow (i,j) "
        "projection; ONE cell-key exchange of long partials.",
    "sim_binary_quantize_rerank": "two aggregate() bit-folds in the scan "
        "stage; queries broadcast; per-query rank over 16-byte codes.",
    "win_burst_detection": "spine from the stream's own bounds (no "
        "collect); counts partial-agg before the one exchange.",
    "etl_incremental_join_mv": "five delta joins broadcast the dim side; "
        "bag differences ride exceptAll on the view columns.",
    "etl_merkle_range_diff": "row hashes map-side; ONE exchange per side "
        "on range_id; the diff join carries ~n/256 rows.",
    "graph_louvain_round": "persisted edge list; gains stream edges "
        "against broadcast degrees; argmax is a per-node window.",
    "agg_skyline_3d": "local skylines inside mapInPandas (no shuffle); "
        "the dominance refine is a broadcast anti-join over the tiny "
        "candidate union.",
    "agg_sprt_sequential": "integer LLR walk per event_type partition; "
        "first crossing via rank over the crossing subset.",
    "curate_kaplan_meier": "per-user lifetimes -> bounded day grid; "
        "at-risk counts from a reverse cumsum over the grid, not "
        "per-(user, day) rows.",
    "emb_pca_project": "partial Gramians per partition (mapInPandas), "
        "ONE tree-merge exchange on pmod(partition_id, sqrt(P)), driver "
        "folds O(sqrt(P)) rows; projection is a broadcast-literal "
        "zip_with fold — the corpus itself never shuffles.",
}

out = ["# PLANS — final physical plans of the headline queries (sf0.1, AQE final)",
       "",
       "Generated by tools/gen_plans.py from the registered queries; regenerate",
       "after operator changes. Each plan is the ADAPTIVE FINAL plan (collected",
       "first so AQE re-optimization has happened). What to look for per query",
       "is noted above each block; `tests/test_plans.py` asserts the load-",
       "bearing properties so they cannot regress silently.",
       ""]

def _plan_for(name: str) -> str:
    from oddsetl_spark.plans.report import executed_plan

    if name == "join_runtime_bloomfilter":
        # The registered query localCheckpoints (conf scoping), which hides
        # the join plan — render the un-checkpointed builder under the same
        # overrides, like tests/test_plans.py does.
        from oddsetl_spark.operators.joins import _BLOOM_OVERRIDES, _bloom_join

        df = _bloom_join(spark, sf)
        saved = {k: spark.conf.get(k, None) for k in _BLOOM_OVERRIDES}
        for k, v in _BLOOM_OVERRIDES.items():
            spark.conf.set(k, v)
        try:
            return executed_plan(df)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    if name == "graph_louvain_round":
        # The registered query localCheckpoints (cache hygiene), which
        # hides the join plan — render the lazy twin like the test does.
        from oddsetl_spark.operators.graph import graph_louvain_round_plan

        df, caches = graph_louvain_round_plan(spark, sf)
        try:
            return executed_plan(df)
        finally:
            for c in caches:
                c.unpersist()
    return executed_plan(registry.get(name).fn(spark, sf))


for name in HEADLINE:
    plan = _plan_for(name)
    # trim trailing whitespace noise
    plan = "\n".join(line.rstrip() for line in plan.splitlines() if line.strip())
    out.append(f"## {name}")
    out.append("")
    out.append(NOTES[name])
    out.append("")
    out.append("```")
    out.append(plan)
    out.append("```")
    out.append("")

# CBO profile (r9): live A/B plan diff at ~sf1 — ANALYZE statistics flip
# a real broadcast decision (build side at the default threshold; SMJ ->
# BHJ with fewer materialized shuffles at 5MB). Asserted while rendered.
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from cbo_plan_diff import section_lines  # noqa: E402

out.append("## CBO profile (plans/cbo.py, ~sf1 catalog tables)")
out.append("")
out.append(
    "ANALYZE-backed statistics vs file-size guesses on the same catalog "
    "tables (tools/cbo_plan_diff.py; locked by test_plans.py::"
    "test_cbo_profile_flips_broadcast_decision). Without column stats "
    "the 2%-filtered lineitem looks full-size, so the optimizer "
    "broadcasts the WRONG side at the default threshold and falls to "
    "SortMergeJoin — both sides shuffled — when no full table fits "
    "under it; statistics fix the static plan before any I/O, where AQE "
    "can only repair it after the probe side's map-side shuffle write."
)
out.append("")
out.append("```")
out.extend(line.rstrip() for line in section_lines(spark))
out.append("```")
out.append("")

# Streaming near-dup state probe (r10 shape, rendered r11): the state
# side of the band-collision probe is a table bucketed by (band_id,
# band_key), so the probe plan shows "Bucketed: true" and exactly ONE
# band-key exchange — the arriving batch's. Rendered both on per-batch
# partitions and AFTER compact_state folds them into batch=0 (the fold
# goes through the same bucketed insertInto, so the plan must not
# change). Locked by test_plans.py::
# test_stream_neardup_state_probe_is_colocated and
# ::test_stream_neardup_probe_colocated_after_compaction.


def _neardup_state_plans() -> list[str]:
    import os

    from pyspark.sql import functions as F

    from oddsetl_spark.session import scratch_dir
    from oddsetl_spark.streaming.stream_neardup import (
        _band_collisions,
        compact_state,
        ensure_state_tables,
    )

    state_dir = scratch_dir("plansnd")
    marker_dir = scratch_dir("plansnd_markers")
    bands_tbl, _ = ensure_state_tables(spark, state_dir)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for n in (1, 2):
        spark.range(2000).select(
            (F.col("id") % 16).cast("int").alias("band_id"),
            ((F.col("id") + n) % 97).cast("string").alias("band_key"),
            (F.col("id") + n * 10_000).alias("doc_id"),
            F.lit(n).cast("int").alias("batch"),
        ).write.mode("overwrite").insertInto(bands_tbl)
        open(os.path.join(marker_dir, f"applied_{n}"), "w").close()
    probe = spark.range(100).select(
        (F.col("id") % 16).cast("int").alias("band_id"),
        (F.col("id") % 97).cast("string").alias("band_key"),
        (F.col("id") + 50_000).alias("doc_id"),
    )

    def _probe_plan() -> str:
        state = spark.table(bands_tbl).filter(F.col("batch") < 3).drop("batch")
        j = _band_collisions(state.hint("merge"), probe)
        j.collect()
        full = j._jdf.queryExecution().executedPlan().toString()
        plan = full.split("== Initial Plan ==")[0]
        assert "Bucketed: true" in plan
        assert plan.count("Exchange hashpartitioning(band_id") == 1
        return "\n".join(
            line.rstrip() for line in plan.splitlines() if line.strip()
        )

    lines = ["### per-batch partitions (as written by the stream)", "",
             "```", _probe_plan(), "```", ""]
    compact_state(spark, state_dir, marker_dir)
    lines += ["### after compact_state (fold into batch=0)", "",
              "```", _probe_plan(), "```", ""]
    return lines


out.append("## stream_neardup state probe (bucketed, co-located)")
out.append("")
out.append(
    "The kept-signature state lives in tables bucketed by (band_id, "
    "band_key) / (doc_id); a micro-batch's probe join scans the state "
    "with NO exchange (the one band-key exchange below is the small "
    "arriving batch's). compact_state's fold preserves the layout — "
    "same plan before and after. Forced to SMJ so AQE's broadcast of "
    "the tiny demo batch can't mask the bucketing."
)
out.append("")
out.extend(_neardup_state_plans())

with open("/root/repo/PLANS.md", "w") as f:
    f.write("\n".join(out))
print("wrote PLANS.md", sum(len(x) for x in out))
