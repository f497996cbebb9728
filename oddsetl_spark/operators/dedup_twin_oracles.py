"""Exact-dup-CONTRACTION twin oracles for the pair-graph query family.

Purpose: differential verification of the dedup/curation pair-graph
queries on DUPLICATE-HEAVY data, where the registered full-graph DuckDB
oracles are quadratic in duplicate-group size (every verbatim copy
multiplies posting lists, so the inverted-index self-join pays K^2 per
content pair — a verification-harness cost, not an engine cost; the
Spark sides are either contracted already (doc_components) or banded).

Each twin computes the SAME result as its registered oracle, for ANY
input, by a lossless contraction:

  1. contract: group corpus rows by exact TEXT (classes); keep the class
     representative rep = MIN(doc_id) and size csz. Every pair metric
     here (shingle Jaccard, containment, MinHash signature, embedding
     dot) is a function of CONTENT alone, so all members of a class have
     identical metrics and identical neighbor sets.
  2. compute the registered oracle's CTE chain over the representatives
     only (the `corpus` CTE is rebound to one row per class — the
     downstream SQL text is UNCHANGED, byte for byte, so the arithmetic
     producing each metric value is the identical expression on the
     identical integers -> bit-identical doubles).
  3. expand: rep-level pairs fan back out over class membership; the
     within-class pairs the rep graph cannot see are appended in closed
     form (identical texts have Jaccard/containment exactly 1.0 and
     always share every MinHash band; they pair at all iff the class has
     >= 1 shingle, i.e. the rep appears in `sizes`).

Label-propagation equivalence (components / keep_best / leakage_split):
the registered oracles run exactly `_CC_ROUNDS` min-label rounds, so the
twin must match even if propagation has NOT converged. It does, exactly:
min-label satisfies lab_t(v) = min{id(u) : dist(v, u) <= t} (BFS-min
recurrence). In the full graph every member of class A reaches every
member of a rep-distance-r class in exactly r hops (cross-class edges
connect ALL member pairs), and each class's minimum id IS its rep, so
full lab_t(x in A) = min{rep_D : repdist(A, D) <= t} — precisely the
contracted lab_t(rep_A), at the SAME round count. Classes with csz >= 2
and >= 1 shingle form internal cliques; a (rep, rep) self-loop row makes
them propagation nodes without changing any distance.

Used by tools/dup_heavy_sweep.py (the duplicate-heavy ~sf1 sweep) and
locked against the registered full-graph oracles by
tests/test_dedup_twin_oracles.py on fixtures WITH real duplicate classes
(K=3 verbatim staging), where the expansion terms are all exercised.
"""

from __future__ import annotations

from .llm_dedup import (
    _CC_ROUNDS,
    _COSINE_TAU,
    _JACCARD_TAU,
    _SQL_CORPUS,
    _SQL_DOT,
    _det_cand_ctes,
    _min_label_rounds_sql,
)

_CONTAINMENT_TAU = 0.9  # literal in dedup_shingle_containment's oracle

# The registered corpus CTE chain with `corpus` rebound to one row per
# distinct text: corpus0 = the original 3-variant union, cls/mem = the
# contraction and its membership, corpus = representatives. Everything
# downstream (shingled/sizes/pairs/jac and any per-key CTEs) is the
# registered SQL text unchanged.
_CONTRACTED_CORPUS = _SQL_CORPUS.replace("corpus AS (", "corpus0 AS (", 1).replace(
    "shingled AS MATERIALIZED (",
    """cls AS MATERIALIZED (
  SELECT text, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS csz
  FROM corpus0 GROUP BY text
),
mem AS MATERIALIZED (
  -- IS NOT DISTINCT FROM: the twin variants of sub-shingle-width docs
  -- come out of list_slice as NULL text, GROUP BY puts them in one
  -- class, and a plain equality join would silently DROP them from the
  -- membership (caught by the randomized twin-equivalence property)
  SELECT c.rep, d.doc_id FROM corpus0 d
  JOIN cls c ON d.text IS NOT DISTINCT FROM c.text
),
corpus AS (SELECT rep AS doc_id, text FROM cls),
shingled AS MATERIALIZED (""",
    1,
)

# Within-class expanded pairs that exist in the full graph: identical
# texts pair iff they share >= 1 shingle, i.e. the class rep is in
# `sizes` (docs shorter than the shingle width produce no pairs at all).
_SELFPAIR = """
selfpair AS (
  SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b
  FROM cls c
  JOIN sizes s ON s.doc_id = c.rep
  JOIN mem m1 ON m1.rep = c.rep
  JOIN mem m2 ON m2.rep = c.rep AND m1.doc_id < m2.doc_id
)"""

# Rep-graph edges for label propagation, plus (rep, rep) self-loops that
# register csz>=2 shingled classes as nodes (their members form cliques
# in the full graph even without a cross-class neighbor).
_REP_EDGES = f"""
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT c.rep, c.rep FROM cls c
  JOIN sizes s ON s.doc_id = c.rep
  WHERE c.csz >= 2
),
lab0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM edges)
{_min_label_rounds_sql(_CC_ROUNDS)}"""

_PAIR_EXPANSION = f"""
SELECT LEAST(ma.doc_id, mb.doc_id) AS doc_a,
       GREATEST(ma.doc_id, mb.doc_id) AS doc_b,
       round(j.jaccard, 9) AS jaccard
FROM jac j
JOIN mem ma ON ma.rep = j.doc_a
JOIN mem mb ON mb.rep = j.doc_b
WHERE j.jaccard >= {_JACCARD_TAU}
UNION ALL
SELECT doc_a, doc_b, CAST(1.0 AS DOUBLE) FROM selfpair
"""

_COMPONENTS_CORE = f"""
SELECT component,
       CAST(SUM(csz) AS BIGINT) AS n_members,
       MIN(node) AS rep
FROM (SELECT l.node, l.lbl AS component, c.csz
      FROM lab{_CC_ROUNDS} l JOIN cls c ON c.rep = l.node)
GROUP BY component
"""


def twin_oracle_sql() -> dict[str, str]:
    """Contraction-twin oracle SQL, keyed by registered query name."""
    dot_ab = _SQL_DOT.format(a="a.emb", b="b.emb")
    dot_self = _SQL_DOT.format(a="emb", b="emb")
    twins: dict[str, str] = {}

    twins["dedup_ngram_jaccard"] = f"""
WITH {_CONTRACTED_CORPUS},
{_SELFPAIR}
{_PAIR_EXPANSION}
"""

    # Same target output: the exact pair set (banding recall is 100% and
    # deterministic — see the registered docstring; within-class pairs
    # always collide in every band because identical texts have
    # identical signatures).
    twins["dedup_minhash_lsh"] = twins["dedup_ngram_jaccard"]

    # The length-binned prefix join returns the identical pair set
    # (test_length_binned_pairs_match_unbinned), so it shares the twin.
    twins["dedup_jaccard_length_binned"] = twins["dedup_ngram_jaccard"]
    # ...as is the string-keyed fallback (same output, different join-key
    # representation; locked by test_string_index_matches_hashed).
    twins["dedup_jaccard_string_index"] = twins["dedup_ngram_jaccard"]

    # Containment: the contained side is decided by shingle-set sizes
    # (content-level); on equal sizes the registered rule attributes
    # doc_a — the smaller id — so the expansion maps it to LEAST.
    twins["dedup_shingle_containment"] = f"""
WITH {_CONTRACTED_CORPUS},
{_SELFPAIR}
SELECT LEAST(ma.doc_id, mb.doc_id) AS doc_a,
       GREATEST(ma.doc_id, mb.doc_id) AS doc_b,
       ROUND(CAST(p.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 9)
         AS containment,
       CASE WHEN sa.n_sh = sb.n_sh THEN LEAST(ma.doc_id, mb.doc_id)
            WHEN sa.n_sh < sb.n_sh THEN ma.doc_id
            ELSE mb.doc_id END AS contained_doc
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
JOIN mem ma ON ma.rep = p.doc_a
JOIN mem mb ON mb.rep = p.doc_b
WHERE CAST(p.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh)
      >= {_CONTAINMENT_TAU}
UNION ALL
SELECT doc_a, doc_b, CAST(1.0 AS DOUBLE), doc_a FROM selfpair
"""

    twins["dedup_components"] = f"""
WITH {_CONTRACTED_CORPUS},
{_REP_EDGES}
{_COMPONENTS_CORE}
"""

    twins["dedup_cluster_size_histogram"] = f"""
SELECT n_members,
       COUNT(*) AS n_clusters,
       CAST(SUM(n_members) AS BIGINT) AS n_docs
FROM (
WITH {_CONTRACTED_CORPUS},
{_REP_EDGES}
{_COMPONENTS_CORE}
)
GROUP BY n_members
"""

    # quality = length(text) is content-level, so every member of a
    # class scores identically; kept_doc = MIN over best-scoring members
    # = MIN rep over best-scoring classes, which the member-level window
    # below reproduces directly.
    twins["curate_dedup_keep_best"] = f"""
WITH {_CONTRACTED_CORPUS},
{_REP_EDGES},
dlab AS (
  SELECT m.doc_id, length(c.text) AS quality,
         COALESCE(l.lbl, m.doc_id) AS component
  FROM mem m
  JOIN cls c ON c.rep = m.rep
  LEFT JOIN lab{_CC_ROUNDS} l ON l.node = m.rep
)
SELECT component,
       COUNT(*) AS n_members,
       MAX(quality) AS best_quality,
       MIN(doc_id) FILTER (WHERE is_best) AS kept_doc
FROM (
  SELECT *,
         quality = MAX(quality) OVER (PARTITION BY component) AS is_best
  FROM dlab
)
GROUP BY component
"""

    twins["curate_leakage_safe_split"] = f"""
WITH {_CONTRACTED_CORPUS},
{_REP_EDGES}
SELECT m.doc_id,
       COALESCE(l.lbl, m.doc_id) AS cluster_label,
       CASE WHEN ('0x' || substr(md5(CAST(COALESCE(l.lbl, m.doc_id)
                                          AS VARCHAR)), 1, 15))::BIGINT
                 % 10 < 9
            THEN 'train' ELSE 'test' END AS split
FROM mem m LEFT JOIN lab{_CC_ROUNDS} l ON l.node = m.rep
"""

    # Scoreboard counts expand in closed form: a rep-level pair of
    # classes (A, B) stands for csz_A * csz_B member pairs; every
    # shingled class with csz >= 2 contributes C(csz, 2) within-class
    # pairs to truth AND candidates AND tp (identical texts: jaccard
    # exactly 1 and band keys equal in every band).
    twins["dedup_candidate_eval"] = f"""
WITH {_CONTRACTED_CORPUS},
{_det_cand_ctes()},
truth AS (
  SELECT doc_a, doc_b FROM jac WHERE jaccard >= {_JACCARD_TAU}
),
selfw AS (
  SELECT CAST(COALESCE(SUM(c.csz * (c.csz - 1) / 2), 0) AS BIGINT) AS w
  FROM cls c JOIN sizes s ON s.doc_id = c.rep
  WHERE c.csz >= 2
),
m AS (
  SELECT
    (SELECT CAST(COALESCE(SUM(ca.csz * cb.csz), 0) AS BIGINT)
       FROM truth t JOIN cls ca ON ca.rep = t.doc_a
                    JOIN cls cb ON cb.rep = t.doc_b)
      + (SELECT w FROM selfw) AS n_truth,
    (SELECT CAST(COALESCE(SUM(ca.csz * cb.csz), 0) AS BIGINT)
       FROM cand c JOIN cls ca ON ca.rep = c.doc_a
                   JOIN cls cb ON cb.rep = c.doc_b)
      + (SELECT w FROM selfw) AS n_candidates,
    (SELECT CAST(COALESCE(SUM(ca.csz * cb.csz), 0) AS BIGINT)
       FROM cand c JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
                   JOIN cls ca ON ca.rep = c.doc_a
                   JOIN cls cb ON cb.rep = c.doc_b)
      + (SELECT w FROM selfw) AS tp
)
SELECT n_truth, n_candidates, tp,
       n_candidates - tp AS fp,
       n_truth - tp AS fn,
       round(tp * 1.0 / n_candidates, 9) AS precision,
       round(tp * 1.0 / n_truth, 9) AS recall
FROM m
"""

    # Embedding contraction groups by the exact DOUBLE[] value; the
    # rep-level dot is the identical fold on identical lists, and a
    # class's self-dot (its within-class pair value) is the same fold of
    # the vector with itself — NOT assumed to be 1.0 (the norm is only
    # float-close to 1), computed and filtered like any pair.
    twins["dedup_embedding_cosine"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ecls AS MATERIALIZED (
  SELECT emb, MIN(vec_id) AS rep, CAST(COUNT(*) AS BIGINT) AS csz
  FROM e GROUP BY emb
),
emem AS MATERIALIZED (
  SELECT c.rep, v.vec_id, v.label FROM e v
  JOIN ecls c ON v.emb IS NOT DISTINCT FROM c.emb
),
rp AS MATERIALIZED (
  SELECT a.rep AS rep_a, b.rep AS rep_b,
         {dot_ab} AS cosine
  FROM ecls a JOIN ecls b ON a.rep < b.rep
  WHERE {dot_ab} >= {_COSINE_TAU}
),
sp AS (
  SELECT rep, {dot_self} AS cosine FROM ecls
  WHERE csz >= 2 AND {dot_self} >= {_COSINE_TAU}
)
SELECT LEAST(ma.vec_id, mb.vec_id) AS vec_a,
       GREATEST(ma.vec_id, mb.vec_id) AS vec_b,
       CASE WHEN ma.vec_id < mb.vec_id THEN ma.label ELSE mb.label END
         AS label_a,
       CASE WHEN ma.vec_id < mb.vec_id THEN mb.label ELSE ma.label END
         AS label_b,
       p.cosine
FROM rp p
JOIN emem ma ON ma.rep = p.rep_a
JOIN emem mb ON mb.rep = p.rep_b
UNION ALL
SELECT m1.vec_id, m2.vec_id, m1.label, m2.label, s.cosine
FROM sp s
JOIN emem m1 ON m1.rep = s.rep
JOIN emem m2 ON m2.rep = s.rep AND m1.vec_id < m2.vec_id
"""

    # Incremental batch: both corpora contract independently. Exact
    # verdicts, the best near-dup match (max jaccard, min doc_id
    # tie-break — the min member of an argmax class IS its rep), and the
    # jaccard value are all class-level, so the per-new-doc output is
    # its class verdict fanned out over new-batch membership.
    twins["dedup_incremental_batch"] = f"""
WITH old0 AS MATERIALIZED (
  SELECT doc_id, lower(text) AS text FROM documents
),
newb0 AS MATERIALIZED (
  SELECT doc_id + 100000 AS new_id,
         array_to_string(list_slice(string_split(lower(text), ' '), 3,
                         len(string_split(lower(text), ' '))), ' ') AS text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 300000, lower(text)
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 400000,
         array_to_string(list_reverse(string_split(lower(text), ' ')), ' ')
  FROM documents WHERE doc_id % 11 = 0
),
ocls AS MATERIALIZED (
  SELECT text, MIN(doc_id) AS rep FROM old0 GROUP BY text
),
ncls AS MATERIALIZED (
  SELECT text, MIN(new_id) AS nrep FROM newb0 GROUP BY text
),
nmem AS MATERIALIZED (
  SELECT c.nrep, n.new_id FROM newb0 n
  JOIN ncls c ON n.text IS NOT DISTINCT FROM c.text
),
exact AS MATERIALIZED (
  SELECT n.nrep, CAST(MIN(o.rep) AS BIGINT) AS dup_of
  FROM ncls n JOIN ocls o ON md5(n.text) = md5(o.text)
  GROUP BY n.nrep
),
surv AS MATERIALIZED (
  SELECT nrep, text FROM ncls WHERE nrep NOT IN (SELECT nrep FROM exact)
),
sh_new AS MATERIALIZED (
  SELECT nrep,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM surv
),
sh_old AS MATERIALIZED (
  SELECT rep,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM ocls
),
na AS (SELECT nrep, COUNT(*) AS n_new FROM sh_new GROUP BY nrep),
nb AS (SELECT rep, COUNT(*) AS n_old FROM sh_old GROUP BY rep),
rpairs AS MATERIALIZED (
  SELECT n.nrep, o.rep, COUNT(*) AS n_common
  FROM sh_new n JOIN sh_old o ON n.shingle = o.shingle
  GROUP BY n.nrep, o.rep
),
rjac AS MATERIALIZED (
  SELECT p.nrep, p.rep,
         CAST(p.n_common AS DOUBLE)
           / (na.n_new + nb.n_old - p.n_common) AS jaccard
  FROM rpairs p
  JOIN na ON na.nrep = p.nrep
  JOIN nb ON nb.rep = p.rep
),
near AS MATERIALIZED (
  SELECT nrep, rep AS dup_of, jaccard
  FROM (SELECT nrep, rep, jaccard,
               ROW_NUMBER() OVER (PARTITION BY nrep
                                  ORDER BY jaccard DESC, rep) AS rn
        FROM rjac WHERE jaccard >= {_JACCARD_TAU})
  WHERE rn = 1
)
SELECT m.new_id,
       CASE WHEN e.nrep IS NOT NULL THEN 'dropped_exact'
            WHEN nr.nrep IS NOT NULL THEN 'dropped_neardup'
            ELSE 'kept' END AS verdict,
       COALESCE(e.dup_of, nr.dup_of) AS dup_of,
       round(nr.jaccard, 9) AS jaccard
FROM nmem m
LEFT JOIN exact e ON e.nrep = m.nrep
LEFT JOIN near nr ON nr.nrep = m.nrep
"""

    # The chained 4-batch streaming replay (r10 SCALING: its full oracle
    # out-spilled the disk on exact-twin staging — every copy collides
    # in ALL bands across every chained stage). The twin rebinds only
    # `verified`: rep-level jac pairs (banding recall on >= tau pairs is
    # 100% and deterministic — same argument the dedup_minhash_lsh twin
    # already relies on) expanded over class membership, plus the
    # within-class pairs in closed form (identical shingled texts pair
    # at exactly jaccard 1.0). The verdict chain downstream — bat,
    # dropb, k1, d2..dN, the final CASE — is the registered oracle's
    # text byte-for-byte via the shared _neardup_chain_sql builder;
    # `corpus0` (the pre-contraction corpus, byte-identical to the
    # registered `corpus` CTE) feeds the batch roster so ntile sees the
    # full doc set. Doc-level `verified` stays canonical (doc_a < doc_b,
    # no duplicates): each doc pair arises from exactly one class pair,
    # and LEAST/GREATEST canonicalizes member interleaving.
    from ..streaming.stream_neardup import _neardup_chain_sql

    twins["stream_neardup_minhash"] = f"""
WITH {_CONTRACTED_CORPUS},
{_SELFPAIR},
verified AS MATERIALIZED (
  SELECT LEAST(ma.doc_id, mb.doc_id) AS doc_a,
         GREATEST(ma.doc_id, mb.doc_id) AS doc_b
  FROM jac j
  JOIN mem ma ON ma.rep = j.doc_a
  JOIN mem mb ON mb.rep = j.doc_b
  WHERE j.jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT doc_a, doc_b FROM selfpair
),
{_neardup_chain_sql("corpus0")}"""

    # The compacted variant commits to IDENTICAL verdicts (its registered
    # oracle is the same chained replay), so it shares the twin.
    twins["stream_neardup_compacted"] = twins["stream_neardup_minhash"]

    return twins
