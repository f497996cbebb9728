"""The exact-dup-contraction twin oracles == the registered full-graph
oracles, on data WITH real duplicate classes.

This is the equivalence that makes the duplicate-heavy ~sf1 sweep
(tools/dup_heavy_sweep.py, SCALING.md round 9) trustworthy: the twin
contracts identical-content rows, runs the registered CTE chain over
representatives, and expands back by membership — so it must reproduce
the full-graph oracle bit-for-bit, including the closed-form
within-class terms (jaccard/containment exactly 1.0, all-bands MinHash
collisions, self-dot cosine) and the 10-round min-label state.

The K=3 verbatim staging gives every document/vector 3 identical copies,
so every expansion term fires (19,260 expanded pairs vs 1,640 at base);
plain sf0.001 covers the degenerate all-singleton-classes case.
"""

from __future__ import annotations

import pytest

from oddsetl_spark.operators.dedup_twin_oracles import twin_oracle_sql
from tests.harness import _rows_canon, duck_con


def _registered_oracles():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    return entry.oracle_sql()


@pytest.fixture(scope="module")
def dup_heavy_dir(spark):
    from tools.stage_sf1 import stage

    return stage(3, "standard", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracles():
    return _registered_oracles()


def _check(sf_dir: str, name: str, full_sql: str, twin_sql: str) -> None:
    con = duck_con(sf_dir)
    try:
        r = con.execute(full_sql)
        r_cols = [d[0] for d in r.description]
        r_rows = r.fetchall()
        t = con.execute(twin_sql)
        t_cols = [d[0] for d in t.description]
        t_rows = t.fetchall()
    finally:
        con.close()
    assert sorted(r_cols) == sorted(t_cols)
    assert len(r_rows) == len(t_rows), (name, len(r_rows), len(t_rows))
    assert _rows_canon(r_rows, r_cols) == _rows_canon(t_rows, t_cols), name


@pytest.mark.parametrize("name", sorted(twin_oracle_sql()))
def test_twin_matches_full_on_dup_heavy(name, dup_heavy_dir, oracles):
    twin = twin_oracle_sql()[name]
    _check(dup_heavy_dir, name, oracles[name], twin)


@pytest.mark.parametrize("name", sorted(twin_oracle_sql()))
def test_twin_matches_full_on_singletons(name, oracles):
    twin = twin_oracle_sql()[name]
    _check("/root/testdata/sf0.001", name, oracles[name], twin)


# --- randomized equivalence: twin == full on GENERATED corpora --------------
#
# The staged K=3 fixture exercises every expansion term, but only one
# duplicate geometry (uniform 3-member classes). These properties feed the
# twins corpora with RANDOM duplicate structure — classes of mixed sizes,
# docs below the shingle width, near-dup chains — and require bit-equality
# with the full-graph oracle. Pure DuckDB (the equivalence is a property of
# the SQL, not of Spark), so examples are cheap.

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["flood", "levee", "storm", "surge", "river", "dam", "rain",
          "wind", "alert", "zone", "crest", "basin"]

_doc = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=12
).map(" ".join)

_corpora = st.lists(
    st.tuples(_doc, st.integers(min_value=1, max_value=4)),
    min_size=1,
    max_size=25,
)

_RANDOM_KEYS = [
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_components",
    "dedup_cluster_size_histogram",
    "dedup_candidate_eval",
    "curate_dedup_keep_best",
    "curate_leakage_safe_split",
    "dedup_incremental_batch",
    # The chained streaming replay's twin (r11): random class sizes make
    # exact-dup classes SPAN batch boundaries — the geometry where the
    # within-class expansion must interact correctly with the
    # batch/state verdict chain (a kept earlier copy state-drops a later
    # one; two copies in one batch drop within-batch).
    "stream_neardup_minhash",
]


@given(corpus=_corpora)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_twin_matches_full_on_random_corpora(corpus, oracles):
    """For any documents table — including multi-size exact-dup classes
    and sub-shingle-width docs — every contraction twin must reproduce
    its full-graph oracle bit-for-bit."""
    rows = []
    doc_id = 0
    for text, copies in corpus:
        for _ in range(copies):
            rows.append((doc_id, text))
            doc_id += 1
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twins = twin_oracle_sql()
    try:
        for name in _RANDOM_KEYS:
            r = con.execute(oracles[name])
            r_cols = [d[0] for d in r.description]
            r_rows = r.fetchall()
            t = con.execute(twins[name])
            t_cols = [d[0] for d in t.description]
            t_rows = t.fetchall()
            assert sorted(r_cols) == sorted(t_cols), name
            assert _rows_canon(r_rows, r_cols) == _rows_canon(t_rows, t_cols), (
                name,
                len(r_rows),
                len(t_rows),
                rows,
            )
    finally:
        con.close()


def test_contraction_skip_matches_forced_contraction(spark):
    """The r12-session-3 data-adaptive fast path (skip the exact-dup
    contraction semi-join when every text is distinct) must be a pure
    no-op: on an all-unique corpus, doc_components with the skip active
    (default) and with the semi-join forced must emit identical
    (doc_id, component) rows."""
    from oddsetl_spark.operators.llm_dedup import doc_components

    sf_dir = "/root/testdata/sf0.001"
    fast = sorted(
        (r.doc_id, r.component)
        for r in doc_components(spark, sf_dir).collect()
    )
    forced = sorted(
        (r.doc_id, r.component)
        for r in doc_components(
            spark, sf_dir, _force_contraction=True
        ).collect()
    )
    assert fast, "expected non-empty components on the twin-clique corpus"
    assert fast == forced
