"""Deduplication operators for LLM data pipelines (SURVEY.md §2.K).

The fixture corpus has no exact duplicates (FIXTURES.md), so the near-dup
operators run over an AUGMENTED corpus: each document unioned with two
perturbed twins (first 2 / first 4 tokens dropped, doc_id + 100000/200000).
That manufactures a known near-dup structure — (d, t1, t2) cliques — making
every stage verifiable: exact Jaccard pairs are SQL-checkable, MinHash/LSH
recall is measurable against them, and connected components have a known
answer (500 3-cliques).

Scale design:
- exact dedup: one hash shuffle, keep-first by row_number;
- n-gram Jaccard: inverted-index self-join on shingle (work ~ sum of
  per-shingle doc-list squares — bounded for natural text, no n^2 scan);
- MinHash: 64 seeded hash mins computed as 64 agg columns in ONE pass over
  (doc, shingle) — no 64x row blowup; LSH banding turns candidate gen into
  an equi-join; exact Jaccard refine touches ONLY candidate pairs
  (array_intersect over per-doc shingle sets), never the full
  inverted-index pair space;
- SimHash: 16-bit signature from per-token hash bits, banded for
  hamming<=3 candidate gen (pigeonhole over 4 bands);
- components: iterative min-label propagation with localCheckpoint per
  round (lineage cut), O(log n) rounds.
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ..session import input_bytes

_JACCARD_TAU = 0.8


def _phase_mark():
    """Measurement hook (guide §1): ODDSETL_DEDUP_TIMING=1 prints wall
    time between the eager materialization boundaries (localCheckpoints)
    of the dedup pipelines to stderr, so the heavy rows decompose below
    the query level. Returns a `mark(label)` closure; zero cost unset."""
    if os.environ.get("ODDSETL_DEDUP_TIMING") != "1":
        return lambda label: None
    t0 = [time.perf_counter()]

    def mark(label: str) -> None:
        import sys as _sys

        now = time.perf_counter()
        print(f"DEDUP_TIMING {label}={now - t0[0]:.2f}", file=_sys.stderr)
        t0[0] = now

    return mark

# Source-bytes threshold above which the LARGE intermediate checkpoints
# (exploded shingle-hash tables, per-doc signature/shingle-set frames)
# are localCheckpointed DISK_ONLY instead of the default deserialized
# MEMORY_AND_DISK. Root cause of the ~sf30 default-heap OOM (r12,
# reproduced with the stack in SCALING.md): a ~13 GB checkpoint cached
# as DESERIALIZED rows cannot fit a 16 GB heap, spills, and then every
# consumer read tries to RE-PROMOTE the disk blocks into memory
# (BlockManager.maybeCacheDiskValuesInMemory) across 32 concurrent
# tasks — the heap dies in the deserializer, not in any operator. Below
# the threshold the default level keeps the warm-cache wall times; at or
# above it the checkpoint streams from local disk with zero heap
# footprint, which is the only shape that survives arbitrary scale.
_DISK_CKPT_BYTES = 2 << 30


def _big_ckpt_level(sf_dir: str | None):
    """StorageLevel for a LARGE localCheckpoint (DISK_ONLY past the
    input-size threshold), or None = pyspark's default level."""
    if sf_dir and input_bytes(sf_dir) >= _DISK_CKPT_BYTES:
        from pyspark.storagelevel import StorageLevel

        return StorageLevel.DISK_ONLY
    return None

# DuckDB twin of the augmented corpus (lowercased; twins drop 2/4 tokens).
_SQL_CORPUS = """
corpus AS (
  SELECT doc_id, lower(text) AS text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_slice(string_split(lower(text), ' '), 3,
                         len(string_split(lower(text), ' '))), ' ')
  FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(list_slice(string_split(lower(text), ' '), 5,
                         len(string_split(lower(text), ' '))), ' ')
  FROM documents
),
shingled AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM corpus
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b,
         CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common) AS jaccard
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + 2 perturbed twins per doc (known near-dup cliques).

    r12 session 3 (guide §2.3 "project before the exchange", §3.3
    "explode after the join/exchange"): the old shape unioned three
    projections of the SAME scan and repartitioned the union — three
    parquet scans of documents, and every doc's full text crossed the
    width exchange three times (once per variant). Now the BASE rows
    cross once and the two twins are exploded from an inline array
    AFTER the exchange, so the scan runs once and the exchange carries
    a third of the bytes; the twin texts are the identical
    array_join(slice(split(...))) expressions, so the row set is
    byte-identical (locked by the same oracles). The repartition keeps
    the expensive downstream shingle explode + signature stages running
    wide, not at the source file's few-split parallelism."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.lower(F.col("text")).alias("text"))
        .repartition(32)
    )
    toks = F.split(F.col("text"), " ")

    def twin_text(drop: int):
        return F.array_join(F.slice(toks, drop + 1, F.size(toks)), " ")

    variants = F.array(
        F.struct(F.col("doc_id"), F.col("text")),
        F.struct(
            (F.col("doc_id") + 100000).alias("doc_id"),
            twin_text(2).alias("text"),
        ),
        F.struct(
            (F.col("doc_id") + 200000).alias("doc_id"),
            twin_text(4).alias("text"),
        ),
    )
    return d.select(F.explode(variants).alias("v")).select(
        "v.doc_id", "v.text"
    )


def _shingles(df: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) with DISTINCT k-word shingles per doc.

    The token split is PROJECTED before the shingle transform: referencing
    the raw split expression inside the lambda re-evaluates the split for
    every element_at (O(n^2) splits per doc — measured 10x slower at
    sf0.1); a projection boundary makes it once-per-row."""
    t = df.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    tc = F.col("toks")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tc) - (k - 1), F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tc, i + j) for j in range(k)]
            ),
        )
    )
    return t.filter(F.size(tc) >= k).select(
        "doc_id", F.explode(sh).alias("shingle")
    )


def _jaccard_pairs(
    spark: SparkSession, sf_dir: str, corpus: DataFrame | None = None
) -> DataFrame:
    """Exact near-dup pairs via shingle inverted-index join (over the
    augmented corpus, or an explicit `corpus` frame)."""
    sh = _shingles(corpus if corpus is not None else _corpus(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def _jaccard_pairs_tau(
    spark: SparkSession,
    sf_dir: str,
    corpus: DataFrame | None = None,
    tau: float = _JACCARD_TAU,
    length_binned: bool = False,
    use_string_index: bool = False,
    candidates_only: bool = False,
) -> DataFrame:
    """EXACT jaccard >= tau pairs via PREFIX-FILTERED inverted index —
    identical output to `_jaccard_pairs(...).filter(jaccard >= tau)`
    (locked by test_prefix_filtered_pairs_match_full_index), at a
    fraction of the join volume.

    The full index self-joins EVERY shingle posting list (sum over
    shingles of C(df, 2) intermediate pairs); at high tau almost all of
    that volume is pairs that cannot possibly reach the threshold. The
    prefix principle (Chaudhuri/Bayardo, the PPJoin family) prunes them
    WITHOUT approximation: order each doc's shingles by global rarity
    (document frequency asc, shingle asc as the deterministic
    tie-break); any B with J(A, B) >= tau must share >= ceil(tau*|A|)
    shingles with A, so if A and B have NO common shingle among their
    first |A| - ceil(tau*|A|) + 1 rarest (likewise B), the overlap
    bound is violated — joining PREFIXES only (22% of postings at
    tau=0.8) finds every qualifying pair. Candidates then verify with
    the exact set intersection (shingle sets are per-doc distinct), and
    the final jaccard expression/filter are the same shapes as the full
    index's, so values are bit-identical.

    The one materialized intermediate (r12) is the PER-DOC frame
    (doc_id, rarity-sorted hashed shingle array, n_sh): the prefix join
    sides slice it and the exact-Jaccard verify intersects it, so the
    postings cross the doc_id exchange exactly once. The STRING shingle
    table stays lazy: caching exploded ~25-byte shingle strings on-heap
    is what exhausted the default 16 GB local JVM at ~sf30 (r11: ~200M
    exploded rows; the compact long-array checkpoint is ~4x smaller and
    removes the string churn from every downstream stage). Cost: the
    explode pipeline runs twice (per-doc agg job + vocabulary job)
    instead of once-plus-cache — measured wall-neutral at sf10 and the
    difference between OOM and green at sf30 on default heap.

    Threshold arithmetic is float-slop-safe in the CONSERVATIVE
    direction: ceil(tau*n - 1e-9) can only round DOWN off-by-ulp
    products (0.8*35 = 28.000000000000004), lengthening the prefix —
    never shortening it — and the size-ratio prune keeps any pair
    within 1e-9 of feasible. The exact >= tau verify still decides
    membership.

    Scale shape: one shuffle to rank shingles by df, one prefix
    self-join (bounded postings), one candidate-side set-intersect
    verify — the standard exact-similarity-join layout for corpus-scale
    dedup.

    `length_binned=True` adds the documented 100 TB refinement: the
    prefix join keys on (shingle, size_bin) instead of shingle alone,
    with geometric bins of ratio 1/tau. The probe side expands each
    prefix entry to every bin intersecting its EXACT ratio-prune window
    [ceil(tau*n - 1e-9), floor(n/tau + 1e-9)] (typically 2 bins at
    tau=0.8), so size-incompatible postings never meet in the hash
    join at all, instead of meeting and dying in the ratio post-filter.
    Losslessness needs no float reasoning: the build side's bin and the
    probe side's bin range run the IDENTICAL floor(ln(n)/ln(1/tau))
    expression, and any partner size inside the window maps into the
    probed bin range by monotonicity — the candidate set (and hence the
    output) is identical, locked by
    test_length_binned_pairs_match_unbinned.

    Measured (tools/prefix_bin_probe.py): the intermediate match volume
    drops exactly 1.83x at BOTH sf0.1 and ~sf1 (11.53M -> 6.32M at
    ~sf1), but wall time is neutral-to-slightly-worse locally (10.5 ->
    11.7 s at ~sf1): this corpus's per-shingle posting lists are short,
    so the probe-side 2x row expansion offsets the saved matches.
    Binning pays when posting lists are LONG — df grows with corpus
    size while the per-doc bin fan-out stays ~2, so the saved matches
    grow ~linearly with corpus size at fixed join cost overhead. Hence
    OFF by default at bench scale, and the documented switch for the
    100 TB regime — with its losslessness already locked, flipping it
    is a config change, not a correctness event."""
    mark = _phase_mark()
    sh = _shingles(corpus if corpus is not None else _corpus(spark, sf_dir))
    lvl = _big_ckpt_level(sf_dir)
    if use_string_index:
        # string keys ARE the index: the one checkpoint must hold them
        sh = sh.localCheckpoint(storageLevel=lvl)
    # INT-HASHED index (r9 ~sf10 fix): every shuffle downstream of the
    # vocabulary build — the df join, the doc_id window, the prefix
    # self-join, and the collect_set/verify arrays — carries xxhash64
    # longs instead of ~25-byte shingle strings (3x the bytes plus
    # object overhead; at K=100 the string-array verify shuffle alone
    # was ~90 GB and GC-killed the stage). EXACTNESS is guarded, not
    # assumed: the vocabulary (one row per distinct shingle string, the
    # only string-keyed shuffle left) is checked for hash collisions
    # and the query FAILS LOUD on any — so downstream, hash identity
    # provably IS string identity: df per hash, common-hash counts, and
    # set sizes are bit-identical to the string formulation. (Same
    # discipline as dedup_substring_spans' pre-shuffle span hashing,
    # which relies on width; here the guard makes it unconditional.)
    #
    # r10 (ADVICE): the guard is IN-PIPELINE, not a separate blocking
    # count() job — the hash-keyed vocabulary carries a per-hash
    # distinct-shingle count, and raise_error fires inside the same
    # localCheckpoint job that builds it, so repeated callers
    # (doc_components / keep_best / leakage_split) pay zero extra
    # passes over the shingle table. And the advertised fallback EXISTS:
    # `use_string_index=True` keeps the join keys as shingle strings
    # (collision-free by identity; the pre-r9 formulation, same output —
    # locked by test_string_index_matches_hashed) for corpora past the
    # xxhash64 birthday bound (~1e12 distinct shingles at 100 TB, where
    # dozens of collisions are statistically expected).
    if use_string_index:
        vmap = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .select(F.col("shingle").alias("h"), "df")
            .localCheckpoint(storageLevel=lvl)
        )
        shh = sh.select("doc_id", F.col("shingle").alias("h"))
    else:
        # ONE aggregation keyed on the long hash replaces the old
        # groupBy(string) + regroup-by-h pair (r12 session 3, guide §2.4
        # "remove shuffles outright" / §2.3 narrower keys): df per hash
        # is the posting count per hash directly (identical to the old
        # sum-of-per-shingle-counts), and >1 distinct shingle in a
        # bucket ⟺ min(shingle) != max(shingle), so the collision guard
        # still fires inside the same checkpoint job — one exchange on
        # a long key instead of two passes with a string-keyed exchange.
        # Isolated alternating probe at K=100 (OPTIMIZATION_r12.md):
        # old {72.2, 18.5, 21.5, 15.9} vs new {24.3, 16.1, 26.7, 13.6} s
        # — 3/4 ordered pairings and the worst case to the new shape.
        vmap = (
            sh.groupBy(F.xxhash64("shingle").alias("h"))
            .agg(
                F.count(F.lit(1)).alias("df_sum"),
                F.min("shingle").alias("mn"),
                F.max("shingle").alias("mx"),
            )
            .select(
                "h",
                F.when(
                    F.col("mn") != F.col("mx"),
                    F.raise_error(
                        F.lit(
                            "xxhash64 shingle collision (>1 distinct "
                            "shingle in one hash bucket) — the int-hashed "
                            "inverted index would merge distinct shingles; "
                            "re-run with use_string_index=True"
                        )
                    ).cast("long"),
                )
                .otherwise(F.col("df_sum"))
                .alias("df"),
            )
            .localCheckpoint(storageLevel=lvl)
        )
        shh = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    mark("vmap_ckpt")
    ranked = shh.join(vmap, "h")
    # r12 (guide §2.4 remove shuffles outright): ONE groupBy(doc_id)
    # replaces BOTH the rank window and the verify-set aggregation. The
    # old shape shuffled the postings by doc_id twice — Exchange + Window
    # (row_number over (df, h)) re-computed on EACH prefix join side, and
    # a second Exchange + collect_set agg for the verify sets — plus a
    # separate shh checkpoint to share the postings between them. Now the
    # postings shuffle by doc_id ONCE into a sorted struct array
    # (array_sort on struct(df, h) is the window's (df asc, h asc) order
    # — both are binary comparisons, identical for longs and strings),
    # the prefix is a slice of that array (pos i+1 == row_number at rank
    # i+1 by construction), and the verify sets are the same array
    # projected to h. Output equality locked by
    # test_prefix_filtered_pairs_match_full_index and the twin oracles;
    # measured A/B + plan diff in OPTIMIZATION_r12.md (the per-doc agg
    # buffer is struct(df, h) — 2x the old collect_set entry — but the
    # window sort buffer it replaces held (doc_id, h, df) rows too, and
    # the ~sf30 DISK_ONLY checkpoint rule carries over unchanged).
    per_doc = (
        ranked.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("arr"))
        .select(
            "doc_id",
            F.transform("arr", lambda x: x["h"]).alias("sh_set"),
            F.size("arr").alias("n_sh"),
        )
        .localCheckpoint(storageLevel=lvl)
    )
    mark("per_doc_ckpt")
    plen = (
        F.col("n_sh")
        - F.ceil(F.col("n_sh") * F.lit(tau) - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        "doc_id",
        "n_sh",
        F.posexplode(F.slice("sh_set", F.lit(1), plen)),
    ).select(
        "doc_id",
        F.col("col").alias("h"),
        "n_sh",
        (F.col("pos") + 1).alias("pos"),
    )
    if length_binned:
        def _bin(c):  # identical expression on both sides => monotone map
            return F.floor(
                F.log(c.cast("double")) / F.lit(math.log(1.0 / tau))
            )

        lo = F.ceil(F.col("n_sh") * F.lit(tau) - F.lit(1e-9))
        hi = F.floor(F.col("n_sh") / F.lit(tau) + F.lit(1e-9))
        a = prefix.withColumn(
            "pbin", F.explode(F.sequence(_bin(lo), _bin(hi)))
        ).alias("a")
        b = prefix.withColumn("pbin", _bin(F.col("n_sh"))).alias("b")
        key = (F.col("a.h") == F.col("b.h")) & (
            F.col("a.pbin") == F.col("b.pbin")
        )
    else:
        a = prefix.alias("a")
        b = prefix.alias("b")
        key = F.col("a.h") == F.col("b.h")
    # Positional filter (PPJoin): J >= tau implies common >= alpha =
    # ceil(tau/(1+tau) * (nA+nB)); at a prefix match seen at ranks
    # (pA, pB), the overlap can be at most 1 + min(nA-pA, nB-pB). The
    # FIRST common shingle of a qualifying pair always passes (its
    # remaining-overlap bound >= the pair's true overlap >= alpha), so
    # keeping only passing matches loses no pair — it just stops the
    # verify stage from shipping shingle sets for pairs the positions
    # already refute (measured at K=100/~sf10: candidates 36.7M -> the
    # verify join was the GC-killing 90 GB stage; see SCALING.md r9).
    # Slop rounds alpha DOWN on off-by-ulp products — conservative.
    #
    # Measured NEGATIVE result (r10, tools/ppjoin_bound_probe.py): the
    # PPJoin accumulated-overlap bound — aggregate ALL prefix matches
    # per pair and filter on m + min(nA-pa*, nB-pb*) >= alpha, which is
    # sound and subsumes this per-match form — cut candidates only 1.5%
    # on this corpus (1.18M -> 1.16M at ~sf1, cand/pair 7.2 both ways)
    # while tripling the pre-agg join volume (~sf10 wall 100 -> 127 s).
    # The surviving non-pairs here share tightly-packed prefixes that
    # position accumulation cannot refute, so the per-match filter +
    # distinct stays the production shape. And further candidate
    # pruning is chasing the wrong stage: the ~sf10 decomposition
    # (SCALING.md r10) puts the set-intersect verify at 26 of 104 s —
    # the post-r9 wall is the LINEAR index-build (shingle/df/rank)
    # pipeline, which scales with partitions, not with cleverness.
    # cand/pair is 7.3 at BOTH ~sf1 and ~sf10 — scale-stable, so the
    # verify share does not grow with the decade.
    alpha = F.ceil(
        (F.col("a.n_sh") + F.col("b.n_sh")) * F.lit(tau / (1.0 + tau))
        - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            key
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio prune: J <= min/max, so max*tau <= min (+slop)
            & (F.col("a.n_sh") >= F.col("b.n_sh") * F.lit(tau) - F.lit(1e-9))
            & (F.col("b.n_sh") >= F.col("a.n_sh") * F.lit(tau) - F.lit(1e-9))
            & (
                1
                + F.least(
                    F.col("a.n_sh") - F.col("a.pos"),
                    F.col("b.n_sh") - F.col("b.pos"),
                )
                >= alpha
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if candidates_only:
        # instrumentation path (tools/ppjoin_bound_probe.py): the pair
        # set entering the set-intersect verify stage, pre-verification
        return cand
    # The verify sets are the SAME checkpointed per-doc array the prefix
    # was sliced from (r12): the former separate collect_set aggregation
    # — which r12 first de-duplicated across join sides (verify stage
    # 56.1 -> 20.5 s at K=100, tools A/B, fresh process; SHUFFLE_HASH
    # hint measured neutral at 57.7 s) — is now gone entirely, merged
    # into the per_doc groupBy above. `lvl` keeps the one remaining
    # checkpoint DISK_ONLY past the input-size threshold (~sf30 heap
    # story unchanged).
    sets = per_doc
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


@register(
    "dedup_exact_hash",
    category="llm_dedup",
    oracle="""
SELECT keep_id, norm_hash, n_dups
FROM (
  SELECT min(doc_id) AS keep_id, sha256(lower(trim(text))) AS norm_hash,
         COUNT(*) AS n_dups
  FROM (SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100)
  GROUP BY sha256(lower(trim(text)))
)
""",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text hash. The corpus has no natural exact
    dups, so 100 literal copies are unioned in; keep-one = min doc_id per
    hash. One shuffle on the 256-bit key — uniform by construction, no skew."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return (
        d.unionByName(dup)
        .select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "norm_hash", "n_dups")
    )


@register(
    "dedup_ngram_jaccard",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS}
SELECT doc_a, doc_b, round(jaccard, 9) AS jaccard
FROM jac WHERE jaccard >= {_JACCARD_TAU}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard near-dup pairs >= tau, via the
    shingle inverted index — the exact-but-scalable formulation (no O(n^2)
    pair scan; cost follows shingle collision lists)."""
    pairs = _jaccard_pairs_tau(spark, sf_dir)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard")
    )


@register(
    "dedup_jaccard_length_binned",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS}
SELECT doc_a, doc_b, round(jaccard, 9) AS jaccard
FROM jac WHERE jaccard >= {_JACCARD_TAU}
""",
)
def dedup_jaccard_length_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The length-binned prefix similarity join as a first-class query:
    the self-join keys on (shingle, size_bin) so size-incompatible
    postings never meet (see _jaccard_pairs_tau's length_binned note and
    tools/prefix_bin_probe.py — 1.83x intermediate-volume cut, identical
    output). Verified against the SAME full-graph oracle as
    dedup_ngram_jaccard, making the 100 TB switch a driver-checked
    config change rather than an untested branch."""
    pairs = _jaccard_pairs_tau(spark, sf_dir, length_binned=True)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard")
    )


@register(
    "dedup_jaccard_string_index",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS}
SELECT doc_a, doc_b, round(jaccard, 9) AS jaccard
FROM jac WHERE jaccard >= {_JACCARD_TAU}
""",
)
def dedup_jaccard_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-keyed prefix similarity join as a first-class query:
    the collision-proof fallback the xxhash64 vocabulary guard directs
    users to (use_string_index=True) for corpora past the 64-bit
    birthday bound (~1e12 distinct shingles, where the int-hashed index
    would fail loud). Join keys stay shingle strings — heavier shuffles,
    zero collision risk. Verified against the SAME full-graph oracle as
    dedup_ngram_jaccard, so the escape hatch is a driver-checked code
    path rather than an untested branch (r9 ADVICE item)."""
    pairs = _jaccard_pairs_tau(spark, sf_dir, use_string_index=True)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard")
    )


@register(
    "dedup_minhash_lsh",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS}
SELECT doc_a, doc_b, round(jaccard, 9) AS jaccard
FROM jac WHERE jaccard >= {_JACCARD_TAU}
""",
    heavy=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (64 seeded xxhash64 mins) + LSH banding (16 bands x 4 rows)
    -> candidate pairs -> exact Jaccard refine >= tau.

    The signature matrix is computed as 64 agg columns in one groupBy over
    (doc, shingle) — no row replication. Banding joins on (band_id, band
    hash): only same-bucket docs ever meet, so candidate count tracks true
    near-dup density instead of n^2. The exact-Jaccard refine then touches
    ONLY the candidate pairs — two hash joins onto per-doc shingle sets +
    array_intersect — instead of re-running the full inverted-index
    pair join (that full join is dedup_ngram_jaccard's job; at 100 TB it
    is exactly the stage LSH exists to avoid).

    Oracle: the exact inverted-index Jaccard pair set (same SQL as
    dedup_ngram_jaccard). The refine step makes precision exact by
    construction (every emitted pair carries true jaccard >= tau), so the
    oracle holds iff banding recall is 100% on this corpus — it is, and
    deterministically so (xxhash64 is a fixed function, so the candidate
    set cannot vary run-to-run): at 16 bands x 4 rows a j=0.8 pair is
    missed with p = (1-0.8^4)^16 ~ 2e-4 under a random hash draw, and the
    fixed draw misses none (verified at sf0.001 AND sf0.01: 1640/1628
    pairs, zero missed). A recall regression would hash-fail — which is
    precisely what the oracle is for. Cross-engine recall is additionally
    pytest-asserted.

    Band parameters (16x4 at threshold s ~ (1/16)^(1/4) ~ 0.5): see
    tools/lsh_band_sweep.py for the measured recall / candidate-count
    trade-off across (bands x rows) configs at a given SF.
    """
    return minhash_lsh_pairs(spark, sf_dir, n_bands=16, rows_per_band=4)


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int,
    rows_per_band: int,
    candidates_only: bool = False,
) -> DataFrame:
    """Parameterized MinHash-LSH core (the banding S-curve knobs).

    n_bands * rows_per_band signatures are generated; `candidates_only`
    returns the pre-refine candidate pairs (for measuring the candidate
    count a config pays for its recall)."""
    n_sig = n_bands * rows_per_band
    # Universal-hash permutation family: hash the shingle STRING once
    # (xxhash64), then derive the 64 signature hashes arithmetically as
    # g_i = (a_i*h31 + b_i) mod p  (p = 2^31-1, seeded constants). String
    # hashing 64x per row was the map-side bottleneck; post-hash integer
    # arithmetic is ~free. h31 < 2^31 and a_i < 2^31 keep every product
    # < 2^62: no bigint overflow under ANSI mode.
    import random

    rng = random.Random(0xC0FFEE)
    p = (1 << 31) - 1
    ab = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(n_sig)]
    # The per-doc shingle SET is computed as an array expression straight
    # off the corpus row — NO explode, NO shuffle, NO collect_list. (The
    # exploded inverted index is dedup_ngram_jaccard's tool; MinHash only
    # ever needs the per-row array.) This one-row-per-doc table is
    # materialized (localCheckpoint) and reused by banding AND the
    # candidate refine.
    k = 3
    tc = F.col("toks")
    sh_set = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tc) - (k - 1), F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tc, i + j) for j in range(k)]
            ),
        )
    )
    per_doc = (
        _corpus(spark, sf_dir)
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .filter(F.size(tc) >= k)
        .select("doc_id", sh_set.alias("sh_set"))
        .withColumn(
            "h31",
            F.transform(
                "sh_set", lambda s: F.shiftrightunsigned(F.xxhash64(s), 33)
            ),
        )
        .withColumn("n_sh", F.size("sh_set"))
        .localCheckpoint(storageLevel=_big_ckpt_level(sf_dir))
    )
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(p)

    sig = per_doc.select(
        "doc_id",
        *[
            F.array_min(F.transform("h31", perm(a, b))).alias(f"h{s}")
            for s, (a, b) in enumerate(ab)
        ],
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if candidates_only:
        return candidates
    sets = per_doc
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard"))
    )


def dedup_simhash_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (64-bit) near-dup candidates with hamming distance <= 3.

    Signature: per token, xxhash64 contributes +/-1 to each of 64 bit
    positions; signature bit = sign of the sum. The signature is kept as
    FOUR 16-bit band columns (sh0..sh3) — any pair at hamming <= 3 agrees
    exactly on >=1 band (pigeonhole over 4 bands), so candidate
    generation is an equi-join on (band_id, band_value) over a 65,536-key
    space, never all-pairs. (A 16-bit signature with 4-bit bands looks
    identical at toy scale but its 16-value band space degenerates to a
    quadratic self-join — at sf0.1 it produced 31M candidate pairs.)
    hamming = sum of per-band popcounts of XOR. Engine-specific hash =>
    rows-only; recall vs the manufactured twins is pytest-asserted."""
    c = _corpus(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    exploded = c.select("doc_id", F.explode(toks).alias("tok"))
    h = F.xxhash64("tok")
    bitsums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    bands = bitsums.select(
        "doc_id",
        *[
            sum(
                [
                    F.when(
                        F.col(f"b{16 * band + j}") > 0, F.lit(1 << j)
                    ).otherwise(F.lit(0))
                    for j in range(16)
                ],
                F.lit(0),
            ).alias(f"sh{band}")
            for band in range(4)
        ],
    )
    keyed = bands.select(
        "doc_id",
        "sh0",
        "sh1",
        "sh2",
        "sh3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band_id"),
                        F.col(f"sh{band}").alias("band_val"),
                    )
                    for band in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sh0", "sh1", "sh2", "sh3", "band.band_id", "band.band_val")
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.sh{band}").alias(f"a_sh{band}") for band in range(4)],
            *[F.col(f"b.sh{band}").alias(f"b_sh{band}") for band in range(4)],
        )
        .distinct()
    )
    hamming = sum(
        [
            F.bit_count(F.col(f"a_sh{band}").bitwiseXOR(F.col(f"b_sh{band}")))
            for band in range(4)
        ],
        F.lit(0),
    )
    return cand.filter(hamming <= 3).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


@register(
    "dedup_simhash",
    category="llm_dedup",
    oracle="""
SELECT 3 * COUNT(*) AS n_twin_pairs, TRUE AS twin_recall_ok,
       TRUE AS hamming_bound_ok
FROM documents
""",
    heavy=True,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection, driver-verifiable form. Unlike MinHash
    (whose refine step makes the pair set exactly the SQL-expressible
    jaccard>=tau set), SimHash's hamming<=3 pair set is irreducibly
    hash-function-specific — a token's xxhash64 bit pattern decides which
    twins land within 3 bits. So the oracle checks the operator's
    CONTRACT: every emitted pair is within the hamming bound (true by
    construction — a violation means the band-pigeonhole join is broken),
    and recall over the corpus's manufactured twin cliques (3 pairs per
    doc: doc/+100000/+200000) stays above the 0.6 floor measured for this
    fixed hash draw (0.69 at sf0.001, 0.67 at sf0.01 — deterministic:
    the signature is an order-insensitive integer sum of fixed hashes,
    so the flag cannot flap). n_twin_pairs is exact. The raw pair list
    with hamming distances is dedup_simhash_raw (pytest-exercised)."""
    pairs = dedup_simhash_raw(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    is_twin = (
        (F.col("doc_b") - F.col("doc_a") == 100000)
        | (F.col("doc_b") - F.col("doc_a") == 200000)
    ) & (F.col("doc_a") % 100000 == F.col("doc_b") % 100000)
    stats = pairs.agg(
        F.sum(is_twin.cast("long")).alias("n_twin_found"),
        F.max("hamming").alias("max_hamming"),
    )
    return n_docs.crossJoin(stats).select(
        (F.col("n_docs") * 3).alias("n_twin_pairs"),
        (
            F.col("n_twin_found")
            >= F.col("n_docs") * 3 * 0.6
        ).alias("twin_recall_ok"),
        (F.coalesce(F.col("max_hamming"), F.lit(0)) <= 3).alias(
            "hamming_bound_ok"
        ),
    )


_CC_ROUNDS = 10


def _min_label_rounds_sql(rounds: int) -> str:
    """Render the fixed min-label-propagation rounds as chained CTEs — the
    SAME update rule the Spark loop executes, so after the same number of
    rounds both engines hold identical labels (the recursive-CTE
    reachability oracle this replaces enumerated paths and blew up on
    clique-shaped duplicate clusters: 46s at sf0.1 vs <1s for the rounds
    form)."""
    out = []
    for t in range(1, rounds + 1):
        out.append(f""",
nbr{t} AS MATERIALIZED (
  SELECT e.a AS node, MIN(l.lbl) AS nbr_lbl
  FROM edges e JOIN lab{t - 1} l ON l.node = e.b
  GROUP BY e.a
),
lab{t} AS MATERIALIZED (
  SELECT l.node, LEAST(l.lbl, COALESCE(n.nbr_lbl, l.lbl)) AS lbl
  FROM lab{t - 1} l LEFT JOIN nbr{t} n ON l.node = n.node
)""")
    return "".join(out)



@register(
    "dedup_components",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS},
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= {_JACCARD_TAU}
),
lab0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM edges)
{_min_label_rounds_sql(_CC_ROUNDS)}
SELECT component, COUNT(*) AS n_members, MIN(node) AS rep
FROM (SELECT node, lbl AS component FROM lab{_CC_ROUNDS})
GROUP BY component
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters = connected components over the near-dup pair
    list, via iterative min-label propagation (converges in <= diameter
    rounds). Each round: join labels across edges, take min,
    localCheckpoint to cut lineage. Oracle: full-graph min-label rounds
    in DuckDB. The contracted machinery lives in doc_components (shared
    with curate_dedup_keep_best / curate_leakage_safe_split)."""
    expanded = doc_components(spark, sf_dir)
    return expanded.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"), F.min("doc_id").alias("rep")
    )


def doc_components(
    spark: SparkSession, sf_dir: str, _force_contraction: bool = False
) -> DataFrame:
    """(doc_id, component) over the near-dup pair graph for every doc in
    a cluster of size >= 2 (singletons are absent — callers left-join
    and coalesce component to doc_id). Results are IDENTICAL to
    full-graph min-label propagation (the oracles replay the full graph
    and hash-match).

    EXACT-DUP CONTRACTION FIRST (round-4 scale fix, probe-measured):
    jaccard is a function of the TEXT alone, so identical-text docs have
    identical neighbor sets — the pair graph restricted to one
    representative per distinct text is a lossless contraction, and
    components expand back by group membership with labels unchanged
    (each group's rep is its min doc_id, so the component min over reps
    IS the component min over docs). Without the contraction the shingle
    inverted-index self-join is QUADRATIC in duplicate-group size —
    tools/scale_probe.py measured sec/K ratio 4.3 (4.5 s -> 192 s at
    K=10, where every doc has 10 identical copies); contracted, the
    pair-finding cost depends on DISTINCT texts only. This is the
    standard corpus-pipeline ordering: exact dedup before near-dup."""
    # Checkpoint only the COMPACT (doc_id, md5-of-text) frame, never the
    # full-text corpus (r11): caching text rows on-heap is what OOM'd
    # the 16 GB local JVM at ~sf30 (4.5M docs on 0.5 GB/slot x 32
    # slots), and at 100 TB nobody can cache the corpus — the grouping
    # and membership only ever need the 32-byte key, and the rep-corpus
    # shingle pipeline re-derives the 3-variant union from the columnar
    # scan (one extra projection pass, measured wall-neutral at sf10).
    mark = _phase_mark()
    corpus = _corpus(spark, sf_dir)
    key = F.md5(F.col("text"))
    keyed = corpus.select("doc_id", key.alias("k")).localCheckpoint()
    groups = (
        keyed.groupBy("k")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("grp_n"))
        .localCheckpoint()
    )
    mark("contraction_ckpts")
    membership = keyed.join(groups.select("k", "rep_id"), "k").select(
        "doc_id", "rep_id"
    )
    # Data-adaptive no-op detection (r12 session 3, guide §1.2 "don't
    # compute things you throw away"): when every text is distinct
    # (max group size 1 — one scalar aggregate over the already-
    # checkpointed groups frame), every doc is its own rep and the
    # semi-join below would return the corpus unchanged — while
    # SHUFFLING THE FULL-TEXT CORPUS on doc_id once per downstream
    # pass (the pair pipeline re-derives its corpus lineage for the
    # vocabulary AND per-doc passes). Skip it outright in that case;
    # corpora with exact dups take the contraction exactly as before.
    if _force_contraction:
        all_unique = False  # test hook: exercise the semi-join branch
    else:
        all_unique = (
            groups.agg(F.max("grp_n").alias("mx")).collect()[0]["mx"] or 0
        ) <= 1
    rep_corpus = corpus if all_unique else corpus.join(
        groups.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    # Materialize the (expensive) pair list ONCE; both union branches
    # read the checkpoint instead of re-running the shingle self-join.
    edges_half = (
        _jaccard_pairs_tau(spark, sf_dir, corpus=rep_corpus)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    mark("pairs_ckpt")
    # The iterative phase works on the SPARSE pair graph (orders of
    # magnitude smaller than the corpus): coalesce to a few partitions so
    # per-round cost is dominated by the joins, not 32-task scheduling.
    edges = (
        edges_half.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(
            edges_half.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .coalesce(8)
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    labels = _propagate_min_labels(edges, labels, _CC_ROUNDS)
    mark("label_prop")
    # expand back: a group is in the full pair graph iff its rep has a
    # cross-group edge OR the group itself has >=2 identical members
    # (identity pairs, jaccard = 1); labels carry over unchanged
    rep_lbl = (
        groups.join(labels, groups.rep_id == labels.node, "left")
        .filter(F.col("node").isNotNull() | (F.col("grp_n") >= 2))
        .select("rep_id", F.coalesce("lbl", F.col("rep_id")).alias("lbl"))
    )
    return membership.join(rep_lbl, "rep_id").select(
        "doc_id", F.col("lbl").alias("component")
    )


def _propagate_min_labels(edges: DataFrame, labels: DataFrame, rounds: int) -> DataFrame:
    """Min-label propagation, the same update rule the oracle renders as
    chained CTEs. Convergence is detected with ONE scalar aggregate on the
    already-materialized labels: labels only ever decrease, so an
    unchanged exact sum means a fixed point (no per-round old-vs-new
    join). Early exit yields the identical result to running all rounds.

    NON-CONVERGENCE GUARD: a component whose min-label eccentricity
    exceeds `rounds` would otherwise silently return NON-components —
    and because the chained-CTE oracle replays the same truncated
    rounds, the hash compare would still pass (correctness theater).
    A fixed point is only PROVEN by a round that changes nothing, so
    when all `rounds` rounds changed the sum we run one extra proof
    round: unchanged -> converged exactly at the budget; changed ->
    raise rather than return wrong clusters."""
    prev_sum = None
    converged = False
    for _ in range(rounds + 1):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .coalesce(8)
            .localCheckpoint()
        )
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise ValueError(
            f"min-label propagation still changing after {rounds} rounds: "
            "a component's diameter exceeds the round budget, so the "
            "result would NOT be connected components (and the round-"
            "replaying oracle would not catch it) — raise _CC_ROUNDS or "
            "pre-contract the graph"
        )
    return labels


# DuckDB twin of the fold-based dot product used by llm_similarity (exact
# left-to-right fold => bit-identical doubles on both engines).
_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
    "(acc, x) -> acc + x)"
)

_COSINE_TAU = 0.35


@register(
    "dedup_embedding_cosine",
    category="llm_dedup",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       a.label AS label_a, b.label AS label_b,
       {_SQL_DOT.format(a='a.emb', b='b.emb')} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.emb', b='b.emb')} >= {_COSINE_TAU}
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors are L2-normalized
    (FIXTURES.md) so cosine == dot; emit ordered pairs with cosine >= tau.

    EXACT all-pairs, executed as a fully DISTRIBUTED BLOCK-GRID MATMUL —
    no driver-side materialization at any scale (the round-1 version
    collected the whole build side with toPandas; this is the block-grid
    design that replaces it):

    1. range-block by vec_id: blk = vec_id // BLOCK (a constant, so no
       count() pass and no driver data);
    2. pack each block into ONE row of parallel arrays (ids, matrix rows,
       labels) via sort_array(collect_list(struct(...)));
    3. self-join the K packed block rows on blk_a <= blk_b — the upper
       triangle of the (K x K) grid, K(K+1)/2 tiny rows;
    4. mapInPandas computes each cell's (BLOCK x BLOCK) dot block in numpy.

    Shuffle cost is one groupBy of the embeddings table plus ~K-fold
    replication of packed blocks across grid cells — at 100 TB you raise
    BLOCK so each cell's pair of blocks fits an executor core, and the
    grid parallelism (K^2/2 cells) spreads over the cluster. The
    hyperplane-bucketed prefilter of sim_lsh_approx is the approximate
    alternative when even the grid is too much work.

    Bit-exactness vs the DuckDB list_reduce twin: the dot accumulates
    SEQUENTIALLY over the 64 dims (acc = acc + a_d*b_d, vectorized across
    pairs, one IEEE float64 add/mul per dim in fold order) — NOT np.dot,
    whose pairwise summation reorders the adds. tau=0.35 sits at the
    ~99.9th percentile of the fixture's pair-cosine distribution (the
    synthetic corpus has no true near-dups)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .llm_similarity import _emb

    BLOCK = 512  # vectors per grid block (fixture-sized; raise at scale)
    tau = _COSINE_TAU

    e = _emb(spark, sf_dir)
    packed = (
        e.groupBy(F.floor(F.col("vec_id") / BLOCK).alias("blk"))
        .agg(
            F.sort_array(F.collect_list(F.struct("vec_id", "emb", "label"))).alias(
                "vs"
            )
        )
        .select(
            "blk",
            F.transform("vs", lambda v: v.vec_id).alias("ids"),
            F.transform("vs", lambda v: v.emb).alias("embs"),
            F.transform("vs", lambda v: v.label).alias("labels"),
        )
    )
    a = packed.select(
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("embs").alias("embs_a"),
        F.col("labels").alias("labels_a"),
    )
    b = packed.select(
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("embs").alias("embs_b"),
        F.col("labels").alias("labels_b"),
    )
    # Upper-triangle grid WITHOUT broadcasting vector data: replicate each
    # A-block across its row of cells by theta-joining against the bare
    # block-id list (K longs — the only broadcast), then shuffle-equi-join
    # the B-block data on blk_b. No packed vectors ever pass through a
    # driver-side broadcast build.
    blk_ids = packed.select(F.col("blk").alias("blk_b"))
    a_cells = a.join(F.broadcast(blk_ids), F.col("blk_a") <= F.col("blk_b"))
    cells = a_cells.join(b, "blk_b")
    # One grid cell per task: the matmul is the unit of work to spread.
    cells = cells.repartition(F.col("blk_a"), F.col("blk_b"))

    def cell_dots(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                a_ids = np.asarray(row.ids_a, dtype=np.int64)
                b_ids = np.asarray(row.ids_b, dtype=np.int64)
                a_mat = np.stack([np.asarray(v) for v in row.embs_a])
                b_mat = np.stack([np.asarray(v) for v in row.embs_b])
                a_lab = np.asarray(row.labels_a, dtype=np.int32)
                b_lab = np.asarray(row.labels_b, dtype=np.int32)
                # sequential fold over dims == Spark/DuckDB fold order
                acc = np.zeros((len(a_ids), len(b_ids)))
                for d in range(a_mat.shape[1]):
                    acc = acc + a_mat[:, d : d + 1] * b_mat[:, d]
                keep = acc >= tau
                if row.blk_a == row.blk_b:
                    keep &= a_ids[:, None] < b_ids[None, :]
                # range blocking: blk_a < blk_b implies every a_id < b_id
                ai, bi = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "vec_a": a_ids[ai],
                        "vec_b": b_ids[bi],
                        "label_a": a_lab[ai],
                        "label_b": b_lab[bi],
                        "cosine": acc[ai, bi],
                    }
                )

    return cells.mapInPandas(
        cell_dots,
        schema="vec_a long, vec_b long, label_a int, label_b int, cosine double",
    )


@register(
    "dedup_shingle_containment",
    category="llm_dedup",
    heavy=True,
    oracle=f"""
WITH {_SQL_CORPUS}
SELECT p.doc_a, p.doc_b,
       ROUND(CAST(p.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 9)
         AS containment,
       CASE WHEN sa.n_sh <= sb.n_sh THEN p.doc_a ELSE p.doc_b END
         AS contained_doc
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.9
""",
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT
    |A∩B| / min(|A|,|B|) — catches a document embedded inside a larger
    one (quote farms, boilerplate wrappers), where symmetric Jaccard
    dilutes below any usable threshold. Same inverted-index join shape
    as dedup_ngram_jaccard — cost follows shingle collision lists, never
    n² — only the denominator and the contained-side attribution differ.
    Tie on equal sizes attributes doc_a on both engines."""
    sh = _shingles(_corpus(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    cont = F.col("n_common").cast("double") / F.least("na", "nb")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(cont >= 0.9)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont, 9).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
        )
    )


def _cluster_histogram_oracle() -> str:
    from ..registry import get as _get

    return f"""
SELECT n_members,
       COUNT(*) AS n_clusters,
       CAST(SUM(n_members) AS BIGINT) AS n_docs
FROM ({_get("dedup_components").oracle})
GROUP BY n_members
"""


@register(
    "dedup_cluster_size_histogram",
    category="llm_dedup",
    oracle=_cluster_histogram_oracle(),
    heavy=True,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the one-page summary a dedup
    run reports (how many pairs, triples, giant clusters?) and the input
    to dedup-rate estimates (docs removed = n_docs - n_clusters). Runs
    the full components pipeline and adds one tiny aggregation; output
    is bounded by the largest cluster size. The oracle composes the
    components oracle verbatim, so the histogram is hash-checked
    end-to-end through the same 10-round min-label propagation."""
    from ..registry import get as _get

    comp = _get("dedup_components").fn(spark, sf_dir)
    return comp.groupBy("n_members").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n_members").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Deterministic cross-engine MinHash / SimHash.
#
# dedup_minhash_lsh / dedup_simhash hash with xxhash64, which only Spark
# implements — the driver can check them rows-only. These twins swap the
# base hash for md5 (identical in every engine: Spark conv(substr(md5,1,15),
# 16,10) == DuckDB ('0x'||substr(md5,1,15))::BIGINT, probed bit-equal) and
# keep everything else — one string hash per shingle, arithmetic permutation
# family, LSH banding equi-join, candidate-only exact refine — so the ENTIRE
# approximate pipeline (signatures, banding, candidate generation, estimated
# similarity, refined Jaccard) hash-matches a full SQL oracle. md5 costs
# roughly 2x xxhash64 per shingle; at scale you would run the xxhash64
# variant and keep this one as the cross-engine conformance harness.
# ---------------------------------------------------------------------------

_DET_P = 1_000_000_007  # 30-bit prime: a*h < 2^60 stays in int64 everywhere
_DET_BANDS = 8
_DET_ROWS = 2
_DET_K = _DET_BANDS * _DET_ROWS


def _det_seeds() -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, _DET_P), rng.randrange(0, _DET_P))
        for _ in range(_DET_K)
    ]


_DET_AB = _det_seeds()


def _det_cand_ctes() -> str:
    """The md5-family signature/banding/candidate CTE chain, shared by
    the det-MinHash pair oracle and the candidate-quality eval oracle
    (expects the _SQL_CORPUS CTEs in scope)."""
    sig_cols = ",\n         ".join(
        f"min(({a} * h + {b}) % {_DET_P}) AS s{i}"
        for i, (a, b) in enumerate(_DET_AB)
    )
    band_vals = ", ".join(f"({b})" for b in range(_DET_BANDS))
    band_key = "CASE band_id " + " ".join(
        f"WHEN {b} THEN concat(s{2 * b}, '|', s{2 * b + 1})"
        for b in range(_DET_BANDS)
    ) + " END"
    return f"""
hp AS MATERIALIZED (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_DET_P} AS h
  FROM shingled
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {sig_cols}
  FROM hp GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band_id, {band_key} AS band_key
  FROM sig CROSS JOIN (VALUES {band_vals}) AS t(band_id)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)"""


def _minhash_det_oracle() -> str:
    eq_sum = " + ".join(
        f"CAST(sa.s{i} = sb.s{i} AS INT)" for i in range(_DET_K)
    )
    return f"""
WITH {_SQL_CORPUS},
{_det_cand_ctes()}
SELECT c.doc_a, c.doc_b,
       ({eq_sum}) / 16.0 AS est_sim,
       round(j.jaccard, 9) AS jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= {_JACCARD_TAU}
"""


@register(
    "dedup_minhash_det",
    category="llm_dedup",
    oracle=_minhash_det_oracle(),
    heavy=True,
)
def dedup_minhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with an ENGINE-AGNOSTIC hash family —
    the fully-oracle-checked twin of dedup_minhash_lsh.

    Same plan shape as the xxhash64 variant: per-doc shingle SET as an
    array expression (no explode for signatures), ONE md5 per shingle
    reduced mod p, 16 signature mins derived arithmetically
    (g_i = (a_i*h + b_i) mod p, p = 1e9+7 so every product < 2^60),
    8 bands x 2 rows banding equi-join for candidates, exact-Jaccard
    refine touching only candidates. Every stage is deterministic and
    identical in DuckDB, so signatures, band collisions, estimated
    similarity (matching-signature fraction) and refined Jaccard all
    hash-match. est_sim divides by 16 (dyadic) — exact in IEEE double."""
    sig, cand = _det_sig_cand(spark, sf_dir)
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("sh_a"),
        F.col("n_sh").alias("na"),
        *[F.col(f"s{i}").alias(f"sa{i}") for i in range(_DET_K)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("sh_b"),
        F.col("n_sh").alias("nb"),
        *[F.col(f"s{i}").alias(f"sb{i}") for i in range(_DET_K)],
    )
    est = sum(
        [
            F.when(F.col(f"sa{i}") == F.col(f"sb{i}"), 1).otherwise(0)
            for i in range(_DET_K)
        ],
        F.lit(0),
    ) / F.lit(16.0)
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est_sim", est)
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b", "est_sim", F.round("jaccard", 9).alias("jaccard"))
    )


def _det_sig_cand(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared md5-family MinHash build: (signatures+shingle sets, LSH
    banding candidate pairs) — used by dedup_minhash_det and the
    candidate-quality eval."""
    mark = _phase_mark()
    k = 3
    tc = F.col("toks")
    sh_set = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tc) - (k - 1), F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tc, i + j) for j in range(k)]
            ),
        )
    )
    base_h = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _DET_P
    )
    def _perm(a: int, b: int):
        # closure factory: default-arg lambdas change the visible arity and
        # break pyspark's higher-order-function binding
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_DET_P)

    # signatures, shingle set and size in ONE row per doc: the refine then
    # touches candidates with two doc_id joins (est_sim + exact Jaccard
    # from the same build rows), not four.
    # r12 (guide §1.2 per-task work): the 16 array_min(transform(...))
    # minhash passes run BEFORE the checkpoint, so they run once — the
    # checkpoint previously held the per-shingle hash array `hp` and each
    # of the three sig consumers (bands, sig_a, sig_b) re-ran all 16
    # permutation passes over it; the checkpoint row also shrinks from
    # n_sh longs to 16.
    #
    # r13 (guide §2.3 "narrower types", §5): the checkpointed shingle set
    # holds xxhash64 LONGS, not the 3-gram strings — the refine only needs
    # set intersections, identical on the hashed sets absent a 64-bit
    # collision inside one compared pair (~1e-13/pair; the small-SF oracle
    # replays pin exactness where the driver checks). Same move as the
    # r12 streaming staged sets and the r9 pair-pipeline per-doc arrays.
    # n_sh is the STRING-set size, taken before hashing, so the Jaccard
    # denominator is byte-identical to the oracle's. The string form of
    # this checkpoint measured ~4x the bytes at K=100 and no longer fit
    # the default heap as deserialized rows: the refine stage then paid
    # BlockManager eviction/re-promotion churn with 3x run-to-run swings
    # (isolated probe: 179.5 vs 59.6 s on back-to-back identical runs) —
    # the same failure signature as the r11 ~sf30 OOM, one decade early.
    hp = F.transform("sh_set", base_h)
    sig = (
        _corpus(spark, sf_dir)
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .filter(F.size(tc) >= k)
        .select("doc_id", sh_set.alias("sh_set"))
        .withColumn("hp", hp)
        .select(
            "doc_id",
            F.transform("sh_set", lambda s: F.xxhash64(s)).alias("sh_set"),
            F.size("sh_set").alias("n_sh"),
            *[
                F.array_min(F.transform("hp", _perm(a, b))).alias(f"s{i}")
                for i, (a, b) in enumerate(_DET_AB)
            ],
        )
        .localCheckpoint(storageLevel=_big_ckpt_level(sf_dir))
    )
    mark("det_sig_ckpt")
    # band join on the raw signature pair (band_id, s_{2b}, s_{2b+1}):
    # same equality as the old concat_ws("|", ...) string key ("|" is
    # unambiguous between digit strings) without materializing and
    # shuffling a string per (doc, band) — r12, guide §2.3 narrower keys.
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"s{2 * b}").alias("k0"),
                        F.col(f"s{2 * b + 1}").alias("k1"),
                    )
                    for b in range(_DET_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.k0", "band.k1")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.k0") == F.col("b.k0"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return sig, cand


_SIM_BITS = 60  # 15 hex chars of md5 -> 60 usable bits, int64-safe
_SIM_BAND_BITS = 15  # 4 bands x 15 bits: hamming<=3 pigeonholes into >=1 band


def _simhash_det_oracle() -> str:
    bitsums = ",\n         ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(_SIM_BITS)
    )
    band_exprs = ",\n         ".join(
        "("
        + " + ".join(
            f"CASE WHEN b{_SIM_BAND_BITS * band + j} > 0 THEN {1 << j} ELSE 0 END"
            for j in range(_SIM_BAND_BITS)
        )
        + f") AS sh{band}"
        for band in range(4)
    )
    band_vals = ", ".join(f"({b})" for b in range(4))
    band_val = "CASE band_id " + " ".join(
        f"WHEN {b} THEN sh{b}" for b in range(4)
    ) + " END"
    hamming = " + ".join(
        f"bit_count(xor(a.sh{b}::BIGINT, b.sh{b}::BIGINT))" for b in range(4)
    )
    return f"""
WITH {_SQL_CORPUS},
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM corpus
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
),
bitsums AS MATERIALIZED (
  SELECT doc_id,
         {bitsums}
  FROM hashed GROUP BY doc_id
),
fp AS MATERIALIZED (
  SELECT doc_id,
         {band_exprs}
  FROM bitsums
),
keyed AS (
  SELECT doc_id, sh0, sh1, sh2, sh3, band_id, {band_val} AS band_val
  FROM fp CROSS JOIN (VALUES {band_vals}) AS t(band_id)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {hamming} AS hamming
  FROM keyed a JOIN keyed b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
FROM cand WHERE hamming <= 3
"""


@register(
    "dedup_simhash_det",
    category="llm_dedup",
    oracle=_simhash_det_oracle(),
    heavy=True,
)
def dedup_simhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (hamming <= 3) with an engine-agnostic
    hash — the fully-oracle-checked twin of dedup_simhash.

    60-bit signature (15 md5 hex chars — int64-safe, no sign-bit games):
    each token OCCURRENCE contributes +/-1 per bit position (multiset
    weighting, like dedup_simhash — a distinct-token variant collapsed on
    the fixtures' shared vocabulary and emitted 150x more candidate
    pairs); signature bit = sign of the sum (ties -> 0, same rule both
    engines). Kept as FOUR
    15-bit band columns; hamming <= 3 pairs must agree on >= 1 band
    (pigeonhole), so candidate generation is an equi-join over a 32,768-key
    band space. hamming = sum of per-band popcounts of XOR — bit_count and
    xor are exact in both engines, so the whole report hash-matches."""
    c = _corpus(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    exploded = c.select("doc_id", F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    bitsums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(_SIM_BITS)
        ]
    )
    bands = bitsums.select(
        "doc_id",
        *[
            sum(
                [
                    F.when(
                        F.col(f"b{_SIM_BAND_BITS * band + j}") > 0,
                        F.lit(1 << j),
                    ).otherwise(F.lit(0))
                    for j in range(_SIM_BAND_BITS)
                ],
                F.lit(0),
            ).alias(f"sh{band}")
            for band in range(4)
        ],
    )
    keyed = bands.select(
        "doc_id",
        "sh0",
        "sh1",
        "sh2",
        "sh3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band_id"),
                        F.col(f"sh{band}").alias("band_val"),
                    )
                    for band in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sh0", "sh1", "sh2", "sh3", "band.band_id", "band.band_val")
    a = keyed.alias("a")
    b = keyed.alias("b")
    hamming = sum(
        [
            F.bit_count(
                F.col(f"a.sh{band}").bitwiseXOR(F.col(f"b.sh{band}")).cast("long")
            )
            for band in range(4)
        ],
        F.lit(0),
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


_INC_TAU = 0.8


@register(
    "dedup_incremental_batch",
    category="llm_dedup",
    oracle=f"""
WITH old AS MATERIALIZED (
  SELECT doc_id, lower(text) AS text FROM documents
),
newb AS MATERIALIZED (
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
exact AS MATERIALIZED (
  SELECT n.new_id, CAST(MIN(o.doc_id) AS BIGINT) AS dup_of
  FROM newb n JOIN old o ON md5(n.text) = md5(o.text)
  GROUP BY n.new_id
),
surv AS MATERIALIZED (
  SELECT * FROM newb WHERE new_id NOT IN (SELECT new_id FROM exact)
),
sh_new AS MATERIALIZED (
  SELECT new_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM surv
),
sh_old AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM old
),
na AS (SELECT new_id, COUNT(*) AS n_new FROM sh_new GROUP BY new_id),
nb AS (SELECT doc_id, COUNT(*) AS n_old FROM sh_old GROUP BY doc_id),
pairs AS MATERIALIZED (
  SELECT n.new_id, o.doc_id, COUNT(*) AS n_common
  FROM sh_new n JOIN sh_old o ON n.shingle = o.shingle
  GROUP BY n.new_id, o.doc_id
),
jac AS MATERIALIZED (
  SELECT p.new_id, p.doc_id,
         CAST(p.n_common AS DOUBLE)
           / (na.n_new + nb.n_old - p.n_common) AS jaccard
  FROM pairs p
  JOIN na ON na.new_id = p.new_id
  JOIN nb ON nb.doc_id = p.doc_id
),
near AS MATERIALIZED (
  SELECT new_id, doc_id AS dup_of, jaccard
  FROM (SELECT new_id, doc_id, jaccard,
               ROW_NUMBER() OVER (PARTITION BY new_id
                                  ORDER BY jaccard DESC, doc_id) AS rn
        FROM jac WHERE jaccard >= {_INC_TAU})
  WHERE rn = 1
)
SELECT n.new_id,
       CASE WHEN e.new_id IS NOT NULL THEN 'dropped_exact'
            WHEN nr.new_id IS NOT NULL THEN 'dropped_neardup'
            ELSE 'kept' END AS verdict,
       COALESCE(e.dup_of, nr.dup_of) AS dup_of,
       round(nr.jaccard, 9) AS jaccard
FROM newb n
LEFT JOIN exact e ON e.new_id = n.new_id
LEFT JOIN near nr ON nr.new_id = n.new_id
""",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the shape that matters at 100 TB, where you
    never re-dedup the corpus, only the arriving batch against it. A
    manufactured ingest batch (verbatim resubmits, head-trimmed
    variants, token-reversed fresh content) checks against the existing
    corpus in two stages: exact (md5 content-key anti-join — the
    resubmits die here for the cost of a hash join) and near-dup
    (3-shingle inverted-index join of the SURVIVORS' shingles against
    the corpus index, exact Jaccard >= {_INC_TAU}) — the trimmed
    variants die here, the reversed docs survive, and every new doc
    gets a verdict row with its best corpus match. The corpus-side
    shingle index is exactly what a production pipeline keeps
    materialized between batches; per-batch cost tracks the BATCH's
    collision lists, not the corpus size.

    Scale shape: one hash join (exact), one inverted-index join
    bounded by batch shingles x collision lists (near), two window
    argmaxes on the pair lists. Nothing rescans corpus-vs-corpus."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    old = d.select("doc_id", F.lower(F.col("text")).alias("text"))
    toks = F.split(F.lower(F.col("text")), " ")
    newb = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("new_id"),
            F.array_join(
                F.expr("slice(split(lower(text), ' '), 3, "
                       "size(split(lower(text), ' ')))"),
                " ",
            ).alias("text"),
        )
        .unionAll(
            d.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 300000).alias("new_id"),
                F.lower(F.col("text")).alias("text"),
            )
        )
        .unionAll(
            d.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 400000).alias("new_id"),
                F.array_join(F.reverse(toks), " ").alias("text"),
            )
        )
        .localCheckpoint()
    )
    exact = (
        newb.alias("n")
        .join(
            old.alias("o"),
            F.md5(F.col("n.text")) == F.md5(F.col("o.text")),
        )
        .groupBy(F.col("n.new_id").alias("new_id"))
        .agg(F.min("o.doc_id").alias("dup_of"))
        .localCheckpoint()
    )
    surv = newb.join(exact.select("new_id"), "new_id", "left_anti")

    def shingles(df, idcol):
        # Same short-doc guard as _shingles: without the size>=3 filter a
        # 2-token doc makes sequence(1, 0) DESCEND to [1,0] and
        # element_at(t, 0) raises INVALID_INDEX_OF_ZERO under ANSI; the
        # DuckDB oracle's range(1, len-1) is just empty for those docs.
        t = F.split(F.col("text"), " ")
        return df.filter(F.size(t) >= 3).select(
            idcol,
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.size(t) - 2, F.lit(0))
                        ),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(t, i),
                            F.element_at(t, i + 1),
                            F.element_at(t, i + 2),
                        ),
                    )
                )
            ).alias("shingle"),
        )

    sh_new = shingles(surv, "new_id")
    sh_old = shingles(old, "doc_id")
    na = sh_new.groupBy("new_id").agg(F.count(F.lit(1)).alias("n_new"))
    nb = sh_old.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_old"))
    pairs = (
        sh_new.join(sh_old, "shingle")
        .groupBy("new_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (
        pairs.join(na, "new_id")
        .join(nb, "doc_id")
        .select(
            "new_id",
            "doc_id",
            (
                F.col("n_common").cast("double")
                / (F.col("n_new") + F.col("n_old") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    wbest = W.partitionBy("new_id").orderBy(
        F.desc("jaccard"), F.asc("doc_id")
    )
    near = (
        jac.filter(F.col("jaccard") >= _INC_TAU)
        .withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "new_id", F.col("doc_id").alias("n_dup_of"), "jaccard"
        )
    )
    e = exact.select("new_id", F.col("dup_of").alias("e_dup_of"))
    return (
        newb.select("new_id")
        .join(e, "new_id", "left")
        .join(near, "new_id", "left")
        .select(
            "new_id",
            F.when(F.col("e_dup_of").isNotNull(), "dropped_exact")
            .when(F.col("n_dup_of").isNotNull(), "dropped_neardup")
            .otherwise("kept")
            .alias("verdict"),
            F.coalesce(F.col("e_dup_of"), F.col("n_dup_of")).alias(
                "dup_of"
            ),
            F.round("jaccard", 9).alias("jaccard"),
        )
    )


@register(
    "dedup_lsh_s_curve",
    category="llm_dedup",
    oracle="""
WITH s_grid AS (
  SELECT CAST(i AS BIGINT) AS s_pct, i/100.0 AS s
  FROM (SELECT unnest(range(5, 100, 5)) AS i)
),
configs AS (
  SELECT * FROM (VALUES (16, 4), (32, 2), (8, 8)) AS t(bands, rows_per)
)
SELECT c.bands, c.rows_per, g.s_pct,
       round(1 - pow(1 - pow(g.s, c.rows_per), c.bands), 9)
         AS p_candidate,
       round(pow(1.0/c.bands, 1.0/c.rows_per), 9) AS threshold
FROM configs c, s_grid g
""",
)
def dedup_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH S-curve, tabulated: candidate probability
    1-(1-s^r)^b over a similarity grid for three (bands x rows)
    configurations, plus each config's threshold (1/b)^(1/r) — the
    tuning table behind dedup_minhash_lsh's 16x4 choice (threshold
    ~0.5) that tools/lsh_band_sweep.py measures empirically; this is
    the closed form those measurements are checked against. Pure
    pow-chain arithmetic over a literal grid, identical on both
    engines, rounded once.

    Scale shape: 57 rows of math — the point is the DESIGN artifact
    travels with the engine, versioned and queryable next to the
    operator it tunes."""
    grid = spark.range(5, 100, 5).select(
        F.col("id").alias("s_pct"), (F.col("id") / 100.0).alias("s")
    )
    configs = spark.createDataFrame(
        [(16, 4), (32, 2), (8, 8)], ["bands", "rows_per"]
    )
    return configs.crossJoin(grid).select(
        "bands",
        "rows_per",
        "s_pct",
        F.round(
            1
            - F.pow(
                1 - F.pow(F.col("s"), F.col("rows_per")), F.col("bands")
            ),
            9,
        ).alias("p_candidate"),
        F.round(
            F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per")), 9
        ).alias("threshold"),
    )


@register(
    "dedup_substring_spans",
    category="llm_dedup",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 8
),
spans AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
           AS h
  FROM tok, LATERAL unnest(range(1, len(t) - 6)) AS r(i)
),
shared AS (
  SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 9) AS dup_ratio
FROM spans s LEFT JOIN shared sh ON sh.h = s.h
GROUP BY s.doc_id
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring detection, the span-level complement of
    doc-level near-dup dedup (the approach of Lee et al., "Deduplicating
    Training Data Makes Language Models Better": memorization comes from
    repeated SPANS, which doc-level MinHash cannot see).

    Every 8-token window of every document is hashed once with the
    cross-engine md5-60bit family (the shuffle then carries one int64 per
    span instead of ~50 bytes of text — the same trick a suffix-array
    pipeline plays before sorting); an inverted index groupBy finds spans
    present in >1 distinct doc; a join back labels each doc's spans and
    rolls up the per-doc duplicated-span ratio. Work is linear in total
    span count, the only shuffles are the span-hash groupBy and the
    hash-keyed join back (co-partitioned, no re-exchange) — nothing is
    pairwise. At 100 TB, span filtering (count>1) happens at the
    aggregation, so the join-back side is only the genuinely shared tail.
    DuckDB replays the identical windows/hashes: exact hash-match."""
    d = table(spark, sf_dir, "documents")
    spans = _shingles(d.select("doc_id", "text"), k=8).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    shared = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    labeled = spans.join(shared.withColumnRenamed("h", "h2"),
                         F.col("h") == F.col("h2"), "left")
    return labeled.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.when(F.col("h2").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_spans"),
        F.round(
            F.sum(F.when(F.col("h2").isNotNull(), 1).otherwise(0))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            9,
        ).alias("dup_ratio"),
    )


@register(
    "dedup_candidate_eval",
    category="llm_dedup",
    oracle=f"""
WITH {_SQL_CORPUS},
{_det_cand_ctes()},
truth AS (
  SELECT doc_a, doc_b FROM jac WHERE jaccard >= {_JACCARD_TAU}
),
m AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
    (SELECT CAST(COUNT(*) AS BIGINT)
     FROM cand c JOIN truth t
       ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS tp
)
SELECT n_truth, n_candidates, tp,
       n_candidates - tp AS fp,
       n_truth - tp AS fn,
       round(tp * 1.0 / n_candidates, 9) AS precision,
       round(tp * 1.0 / n_truth, 9) AS recall
FROM m
""",
)
def dedup_candidate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality evaluation of the MinHash-LSH pipeline against
    EXACT ground truth: precision/recall of the banding candidate set vs
    the inverted-index exact-Jaccard pairs at tau=0.8 — the measurement
    that justifies (or indicts) a banding configuration before you run
    it over 100 TB, where a recall miss silently leaves duplicates in
    the training set. Reuses the shared md5-family build (_det_sig_cand)
    so the evaluated pipeline IS the production one, and the exact truth
    comes from the independent shingle inverted index — two different
    algorithms, one hash-checked scoreboard. Set sizes here: candidates
    carry band collisions (FPs die in the refine step; their count is
    the wasted-refine cost), truth-minus-candidates is the
    irrecoverable-FN count the S-curve predicts (dedup_lsh_s_curve)."""
    _, cand = _det_sig_cand(spark, sf_dir)
    cand = cand.persist()  # counted twice (scoreboard + tp semi-join)
    truth = (
        _jaccard_pairs_tau(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist()
    )
    try:
        tp_df = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
        n_truth = truth.count()  # O(1) scalars: the scoreboard
        n_cand = cand.count()
        tp = tp_df.count()
    finally:
        cand.unpersist()
        truth.unpersist()
    return spark.createDataFrame(
        [
            (
                n_truth,
                n_cand,
                tp,
                n_cand - tp,
                n_truth - tp,
                round(tp * 1.0 / n_cand, 9),
                round(tp * 1.0 / n_truth, 9),
            )
        ],
        "n_truth long, n_candidates long, tp long, fp long, fn long, "
        "precision double, recall double",
    )


@register(
    "dedup_substring_removal",
    category="llm_dedup",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 8
),
inst AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
           AS h
  FROM tok, LATERAL unnest(range(1, len(t) - 6)) AS r(i)
),
shared AS (
  SELECT h, MIN(doc_id) AS owner FROM (
    SELECT DISTINCT doc_id, h FROM inst
  ) GROUP BY h HAVING COUNT(*) > 1
),
covered AS (
  SELECT DISTINCT i.doc_id, p.p AS pos
  FROM inst i JOIN shared s ON s.h = i.h AND s.owner <> i.doc_id,
       LATERAL unnest(range(i.pos, i.pos + 8)) AS p(p)
),
cov_arr AS (
  SELECT doc_id, list_sort(list(pos)) AS cov FROM covered GROUP BY doc_id
),
cleaned AS (
  SELECT t.doc_id,
         CAST(len(t.t) AS BIGINT) AS n_before,
         CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed,
         list_transform(
           list_filter(range(1, len(t.t) + 1),
                       i -> NOT list_contains(coalesce(c.cov, []), i)),
           i -> t.t[i]) AS kept
  FROM tok t LEFT JOIN cov_arr c ON c.doc_id = t.doc_id
)
SELECT doc_id, n_before, n_removed,
       md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_hash
FROM cleaned
""",
)
def dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-span REMOVAL — the acting step of Lee et al.'s
    substring dedup, where dedup_substring_spans only detects: every
    8-token span occurring in more than one document keeps its FIRST
    occurrence (canonical owner = min doc_id) and is excised everywhere
    else; overlapping shared spans union their covered positions. The
    output carries the md5 of each cleaned document, so the oracle pins
    the exact post-removal TEXT, not just counts.

    Plan: span instances keep their positions (the detection op could
    drop them); ownership is one groupBy over distinct (doc, hash);
    non-owner instances explode to covered positions (bounded: 8x the
    duplicated-span instances, not 8x the corpus); the rebuild is a
    narrow per-row index filter over the original token array. Work
    stays proportional to total spans + duplicated coverage — nothing
    pairwise, same inverted-index shape as the detector."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 8)
    tc = F.col("t")
    spans = F.transform(
        F.sequence(F.lit(1), F.size(tc) - 7),
        lambda i: F.struct(
            i.alias("pos"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", *[F.element_at(tc, i + j) for j in range(8)]
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        ),
    )
    inst = tok.select(
        "doc_id", F.explode(spans).alias("s")
    ).select("doc_id", "s.pos", "s.h")
    shared = (
        inst.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.min("doc_id").alias("owner"), F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h", "owner")
    )
    covered = (
        inst.join(shared, "h")
        .filter(F.col("owner") != F.col("doc_id"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + 7)
            ).alias("pos"),
        )
        .distinct()
    )
    cov_arr = covered.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("cov")
    )
    joined = tok.join(cov_arr, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce(F.col("cov"), F.array().cast("array<bigint>")).alias(
            "cov"
        ),
    )
    kept = F.transform(
        F.filter(
            F.sequence(F.lit(1).cast("long"), F.size("t").cast("long")),
            lambda i: ~F.array_contains(F.col("cov"), i),
        ),
        lambda i: F.element_at(F.col("t"), i.cast("int")),
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("long").alias("n_before"),
        F.size("cov").cast("long").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("cleaned_hash"),
    )
