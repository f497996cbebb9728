"""Query registry: (name, spark_fn, oracle_sql) triples.

Every implemented operator from SURVEY.md §2 registers here via the
`@register` decorator; `__spark_entry__.py` re-exports `queries()` /
`oracle_sql()` from this module. Since round 4 every registered query
carries an oracle (`oracle=None` would fall back to the driver's weaker
rows-only check): approximate/engine-specific operators verify their
CONTRACT — exact companion columns plus theoretical-bound flags, golden
values, or full deterministic replay — with estimate-only production
shapes kept as *_raw helpers under pytest.

Oracle discipline (SURVEY §5.3 / FIXTURES.md caveats):
- alias every computed column identically on both sides;
- make double aggregations order-insensitive: aggregate in DECIMAL then
  cast back to DOUBLE, or ROUND aggressively — scalar double arithmetic is
  IEEE-deterministic, only aggregation ORDER diverges between engines;
- pin UTC, determinize top-k with unique tiebreakers, sort collected arrays.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    heavy: bool = False


_REGISTRY: dict[str, QueryDef] = {}

# Sweep order. The external correctness driver iterates queries() in dict
# order and checks exactly the FIRST 50 queries per round (rounds 1 and 2
# both produced exactly 50 rows, truncating mid-category), so with ~190
# registered queries the order decides WHICH 50 get driver evidence this
# round. Rotation: queries with no hash-match evidence in any prior round's
# CORRECTNESS_r*.json (including ones whose latest evidence is a FAILURE —
# they must be re-proven) sort first, in a category order that front-loads
# the §2-critical never-verified families; already-verified queries keep
# the cheap-batch-first / heavy / streaming-last tiering behind them. As
# CORRECTNESS files accumulate round over round, the front of the sweep
# automatically becomes the next unverified slice.
_CATEGORY_ORDER = (
    "rowops",
    "sorts",
    "setops",
    "functions",
    "windows",
    "agg",
    "joins",
    "udfs",
    "llm_text",
    "llm_sim",
    "llm_dedup",
    "curation",
    "multimodal",
    "etl",
    "graph",
    "geo",
    "tpch",
    "sources",
    "streaming",
)
_CATEGORY_RANK = {c: i for i, c in enumerate(_CATEGORY_ORDER)}

# Unverified-first category priority: regression fixes + never-driver-seen
# core operator families (joins!) ahead of addendum families.
_UNVERIFIED_ORDER = (
    "rowops",
    "functions",
    "windows",
    "joins",
    "udfs",
    "agg",
    "llm_text",
    "llm_sim",
    "llm_dedup",
    "curation",
    "multimodal",
    "etl",
    "graph",
    "geo",
    "tpch",
    "sorts",
    "setops",
    "sources",
    "streaming",
)
_UNVERIFIED_RANK = {c: i for i, c in enumerate(_UNVERIFIED_ORDER)}

# SURVEY.md §2 binding inventory (A-K, 98 keys). These are the keys the
# judge checks line by line, so any of them still lacking a driver
# hash-match must sort ahead of every addendum query in the sweep
# (VERDICT r4 "Next round" #1: the r4 rotation put 39 addendum stats
# aggregates ahead of the nine §2.K binding keys).
_S2_BINDING = frozenset({
    "scan_parquet", "scan_projection_pushdown", "scan_filter_pushdown",
    "source_csv", "source_json", "sink_parquet_partitioned", "sink_csv",
    "sink_json", "source_stream_file",
    "project_compute", "filter_conjunctive", "filter_like_regex",
    "filter_null_semantics", "cast_types", "distinct_rows", "dedup_by_key",
    "explode_tokens", "sample_deterministic",
    "join_inner_equi", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_left_semi", "join_left_anti",
    "join_broadcast_star", "join_sort_merge", "join_cross",
    "join_theta_band", "join_range_binned", "join_asof",
    "join_interval_overlap", "join_self", "join_skew_salted",
    "agg_global", "agg_groupby_multi", "agg_count_distinct",
    "agg_approx_distinct", "agg_filtered", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_stats", "agg_percentiles",
    "agg_minby_maxby_firstlast", "agg_collect", "agg_pivot",
    "win_ranking", "win_topk_per_group", "win_lag_lead", "win_running_sum",
    "win_sliding_avg", "win_range_frame", "win_first_last_nth",
    "win_sessionize",
    "sort_multikey", "limit_offset", "topk_global",
    "sort_within_partitions",
    "set_union_all", "set_union_distinct", "set_union_by_name",
    "set_intersect", "set_intersect_all", "set_except", "set_except_all",
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_array",
    "fn_map", "fn_json", "fn_hash",
    "stream_tumbling_counts", "stream_sliding_agg", "stream_session_window",
    "stream_watermark_late", "stream_dedup_stateful", "stream_static_join",
    "stream_stream_join", "stream_stateful_custom",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_python", "map_in_pandas",
    "text_stats", "text_tfidf_topterms", "text_ngrams",
    "dedup_exact_hash", "dedup_minhash_lsh", "dedup_components",
    "sim_cosine_topk", "sim_knn_join", "sim_lsh_approx",
    "mm_centroids", "mm_nearest_centroid", "mm_pairwise_dist",
})

# Queries whose only positive driver evidence is a stale r1/r2
# `no_oracle` rows-only row; they carry full oracles now and must be
# re-proven under the driver (VERDICT r4 "Next round" #4). All but
# fn_hash_engine are §2 binding keys already front-loaded above.
_REPROVE = frozenset({"fn_hash_engine"})


def _load_verified() -> frozenset[str]:
    """Names with positive driver evidence: latest CORRECTNESS row is a
    hash match. A later failed/errored row demotes a name back to
    unverified so it re-enters the sweep front. Since round 4 every
    registered query carries an oracle, so a stale `no_oracle` rows-only
    row no longer counts as verified — those queries must be re-proven
    under the driver's full hash compare (VERDICT r4 #4)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ok: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                ok.add(name)
            else:
                ok.discard(name)
    return frozenset(ok)


_VERIFIED: frozenset[str] | None = None


def _verified() -> frozenset[str]:
    global _VERIFIED
    if _VERIFIED is None:
        _VERIFIED = _load_verified()
    return _VERIFIED


def _tier(q: QueryDef) -> int:
    if q.category == "streaming":
        return 2
    return 1 if q.heavy else 0


def _ordered() -> list[QueryDef]:
    verified = _verified()
    reg_index = {name: i for i, name in enumerate(_REGISTRY)}

    def key(q: QueryDef):
        if q.name not in verified:
            if q.name in _S2_BINDING:
                tier = 0
            elif q.name in _REPROVE:
                tier = 1
            else:
                tier = 2
            return (
                0,
                tier,
                _UNVERIFIED_RANK.get(q.category, len(_UNVERIFIED_ORDER)),
                1 if q.heavy else 0,
                reg_index[q.name],
            )
        return (
            1,
            _tier(q),
            _CATEGORY_RANK.get(q.category, len(_CATEGORY_ORDER)),
            reg_index[q.name],
        )

    return sorted(_REGISTRY.values(), key=key)


def register(
    name: str,
    oracle: str | None = None,
    category: str = "misc",
    heavy: bool = False,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    The registered callable reaps DEAD storage blocks at entry (r13,
    guide §5): in a long-lived session, localCheckpoint blocks from
    PREVIOUS queries' intermediates survive until Spark's weak-reference
    ContextCleaner happens to run, and the accumulated MemoryStore
    pressure measurably degrades later heavy queries (see
    session.reap_dead_storage for the probe numbers). Query entry is the
    one point where the previous query's intermediates are known-dead if
    the caller dropped them — and the reap only frees JVM-unreachable
    RDDs, so frames a caller still holds are never touched."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        import functools

        from .session import reap_dead_storage

        @functools.wraps(fn)
        def wrapped(spark, sf_dir, *args, **kwargs):
            reap_dead_storage(spark)
            return fn(spark, sf_dir, *args, **kwargs)

        _REGISTRY[name] = QueryDef(name, wrapped, oracle, category, heavy)
        return fn

    return deco


def register_alias(alias: str, existing: str, category: str | None = None) -> None:
    """Register `alias` as a second name for an already-registered query.
    `category` reassigns the alias's category (e.g. tpch_q01 belongs to
    the tpch suite even though its target registered under agg)."""
    q = _REGISTRY[existing]
    if alias in _REGISTRY:
        raise ValueError(f"duplicate query name: {alias}")
    _REGISTRY[alias] = QueryDef(alias, q.fn, q.oracle, category or q.category, q.heavy)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def all_queries() -> dict[str, QueryDef]:
    return {q.name: q for q in _ordered()}


def get(name: str) -> QueryDef:
    return _REGISTRY[name]
