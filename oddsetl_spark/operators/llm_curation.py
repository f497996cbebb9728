"""Training-data curation operators: the end-to-end selection/cleaning steps
a pre-training corpus pipeline runs AFTER the per-signal building blocks in
llm_text/llm_dedup (SURVEY.md §2.K addendum — curation composites).

Design for 100 TB:
- stratified sampling and ntile bucketing each shuffle ONCE on their
  grouping key (lang / nothing), with the per-row hash or score computed
  map-side first;
- the contamination check broadcasts the benchmark shingle set (benchmarks
  are small by construction — a few thousand documents) so the 100 TB
  training side is a single map-side semi-join, no shuffle of the corpus;
- the funnel computes every stage flag in ONE pass over the corpus and
  aggregates 5 counters — not five separate scans;
- normalization/quantization is a pure per-row projection (embarrassingly
  parallel, no shuffle at all).

Oracle-exactness: deterministic integer hashing (Knuth multiplicative mod
2^32 — identical arithmetic on both engines), unique tiebreakers under
every window order, fold-based sums of squares evaluated left-to-right
sequentially on both engines (F.aggregate / list_reduce), floor(x+0.5)
instead of round() (engines disagree on banker's rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import ntile_expr, with_global_rank

# Knuth multiplicative hash: deterministic, engine-agnostic sampling order.
_HASH_MULT = 2654435761
_HASH_MOD = 1 << 32

_SAMPLE_FRAC = 0.2  # stratified sample keeps 20% of each language


@register(
    "curate_stratified_sample",
    category="curation",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, (doc_id * {_HASH_MULT}) % {_HASH_MOD} AS bucket,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
),
r AS (
  SELECT doc_id, lang, bucket, n_lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rn
  FROM h
)
SELECT doc_id, lang, bucket
FROM r WHERE rn <= CEIL(n_lang * {_SAMPLE_FRAC})
""",
)
def curate_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep the same FRACTION of every
    language stratum, selecting rows by a content-independent integer hash
    of the key (not rand()) so the sample is reproducible across runs,
    engines, and cluster layouts.

    Scale shape: one shuffle on `lang` (the stratum key) for the window;
    the hash is computed map-side. At 100 TB with few strata the window
    per-stratum is the skew risk — for huge strata switch to the
    threshold-on-hash formulation (keep bucket < frac * 2^32), which needs
    NO window and NO shuffle; the window variant is used here because it
    guarantees the exact per-stratum count.
    """
    d = table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") * F.lit(_HASH_MULT) % F.lit(_HASH_MOD)).alias("bucket"),
        F.count("*").over(W.partitionBy("lang")).alias("n_lang"),
    )
    rn = F.row_number().over(W.partitionBy("lang").orderBy("bucket", "doc_id"))
    return (
        h.withColumn("rn", rn)
        .filter(F.col("rn") <= F.ceil(F.col("n_lang") * F.lit(_SAMPLE_FRAC)))
        .select("doc_id", "lang", "bucket")
    )


@register(
    "curate_quality_ntile",
    category="curation",
    oracle="""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS avg_tok_len,
         length(text) AS n_char
  FROM documents
),
b AS (
  SELECT doc_id, n_char, avg_tok_len,
         NTILE(10) OVER (ORDER BY avg_tok_len, doc_id) AS bucket
  FROM q
)
SELECT bucket,
       COUNT(*) AS n_docs,
       MIN(avg_tok_len) AS min_score,
       MAX(avg_tok_len) AS max_score,
       CAST(SUM(CAST(n_char AS DECIMAL(30,0))) AS DOUBLE) / COUNT(*)
         AS avg_chars
FROM b GROUP BY bucket
""",
)
def curate_quality_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing by a quality signal (avg token length) — the
    "keep the top-N% of the corpus by quality" selection primitive.

    Exact NTILE WITHOUT the single-partition global window: global rank
    via the range-partition + broadcast-offsets decomposition
    (_helpers.with_global_rank — the sort_total_order_range pattern),
    then bucket = integer arithmetic on (rank, n) (_helpers.ntile_expr).
    The only full-data exchange is the range partitioner, so the exact
    variant now survives 100x itself; the one-pass sketch companion
    (curate_quality_buckets_approx) remains the cheaper-still scale
    path. The order carries doc_id as the unique tiebreaker so both
    engines bucket identically."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    q = d.select(
        "doc_id",
        (F.length("text").cast("double") / F.size(toks)).alias("avg_tok_len"),
        F.length("text").alias("n_char"),
    )
    b = with_global_rank(
        q,
        ["avg_tok_len", "doc_id"],
        ["avg_tok_len", "n_char"],
    ).select(
        "avg_tok_len", "n_char", ntile_expr(10).cast("int").alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("avg_tok_len").alias("min_score"),
        F.max("avg_tok_len").alias("max_score"),
        (
            F.sum(F.col("n_char").cast("decimal(30,0)")).cast("double")
            / F.count("*")
        ).alias("avg_chars"),
    )


@register(
    "curate_funnel",
    category="curation",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pass_lang,
         CASE WHEN lang = 'en' AND n_chars BETWEEN 80 AND 2000
              THEN 1 ELSE 0 END AS pass_len,
         CASE WHEN lang = 'en' AND n_chars BETWEEN 80 AND 2000
                   AND len(string_split(lower(text), ' ')) >= 12
              THEN 1 ELSE 0 END AS pass_tok,
         CASE WHEN lang = 'en' AND n_chars BETWEEN 80 AND 2000
                   AND len(string_split(lower(text), ' ')) >= 12
                   AND ROW_NUMBER() OVER (
                         PARTITION BY md5(lower(trim(text)))
                         ORDER BY doc_id) = 1
              THEN 1 ELSE 0 END AS pass_dedup
  FROM documents
)
SELECT 'total' AS stage, 0 AS stage_idx, COUNT(*) AS n_docs FROM f
UNION ALL
SELECT 'lang_en', 1, CAST(SUM(pass_lang) AS BIGINT) FROM f
UNION ALL
SELECT 'len_80_2000', 2, CAST(SUM(pass_len) AS BIGINT) FROM f
UNION ALL
SELECT 'min_12_tokens', 3, CAST(SUM(pass_tok) AS BIGINT) FROM f
UNION ALL
SELECT 'exact_dedup', 4, CAST(SUM(pass_dedup) AS BIGINT) FROM f
""",
)
def curate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: how many documents survive each successive filter
    (language -> length -> token floor -> exact dedup). The per-stage
    retention report every corpus-cleaning run publishes.

    ONE scan computes all stage flags as expressions; the only shuffle is
    the dedup window on the content hash (uniform md5 key — no skew), and
    the final rollup is 5 counters merged map-side. At 100 TB this is a
    single pass + one balanced shuffle, vs the naive 5 scans.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    base = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("p_lang"),
        F.col("n_chars").between(80, 2000).alias("p_len"),
        (F.size(toks) >= 12).alias("p_tok"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_key"),
    )
    first = F.row_number().over(
        W.partitionBy("content_key").orderBy("doc_id")
    )
    f = base.select(
        F.when(F.col("p_lang"), 1).otherwise(0).alias("pass_lang"),
        F.when(F.col("p_lang") & F.col("p_len"), 1).otherwise(0).alias("pass_len"),
        F.when(F.col("p_lang") & F.col("p_len") & F.col("p_tok"), 1)
        .otherwise(0)
        .alias("pass_tok"),
        F.when(
            F.col("p_lang") & F.col("p_len") & F.col("p_tok") & (first == 1), 1
        )
        .otherwise(0)
        .alias("pass_dedup"),
    )
    agg = f.agg(
        F.count("*").alias("total"),
        F.sum("pass_lang").alias("lang_en"),
        F.sum("pass_len").alias("len_80_2000"),
        F.sum("pass_tok").alias("min_12_tokens"),
        F.sum("pass_dedup").alias("exact_dedup"),
    )
    stages = ["total", "lang_en", "len_80_2000", "min_12_tokens", "exact_dedup"]
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("stage"),
                        F.lit(i).alias("stage_idx"),
                        F.col(s).alias("n_docs"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("s")
    ).select("s.stage", "s.stage_idx", "s.n_docs")


_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "curate_token_histogram",
    category="curation",
    oracle=f"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS token
  FROM documents
),
c AS (
  SELECT token, COUNT(*) AS n FROM t GROUP BY token
)
SELECT token, n
FROM c
ORDER BY n DESC, token
LIMIT 30
""",
)
def curate_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token histogram under a BPE-style regex pre-tokenizer (letter runs /
    digit runs / single punctuation) — the vocabulary-frequency profile
    step of tokenizer training.

    explode -> groupBy is one shuffle on the token key; map-side partial
    counts collapse the per-partition duplicates first, so shuffle volume
    follows DISTINCT token count per partition, not corpus token count.
    Top-30 via TakeOrderedAndProject (no global sort).
    """
    d = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), 0)
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(30)
    )


@register(
    "emb_normalize_quantize",
    category="curation",
    oracle="""
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt(list_reduce(
           list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           (acc, x) -> acc + x)) AS norm
  FROM embeddings
)
SELECT vec_id, label,
       floor(norm * 1000000 + 0.5) / 1000000 AS norm_6,
       array_to_string(
         list_transform(embedding,
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) / norm * 127 + 0.5)
                          AS BIGINT) AS VARCHAR)),
         ',') AS q_int8
FROM n
""",
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding and quantize to int8 (the standard
    pre-ANN compression step: 4x smaller than float32, recall loss <1% at
    64-128 dims). Pure per-row projection — no shuffle, embarrassingly
    parallel at any scale; stays entirely inside whole-stage codegen.

    Exactness: sum of squares folds left-to-right sequentially on BOTH
    engines (F.aggregate / list_reduce) -> bit-identical double; floor(x +
    0.5) instead of round() (HALF_UP vs banker's differs between engines);
    quantized vector serialized to a csv string (driver canonicalizer
    cannot sort list cells).
    """
    e = table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(xd, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("norm") * 127 + F.lit(0.5))
        .cast("long")
        .cast("string"),
    )
    return (
        e.withColumn("norm", norm)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("norm") * 1e6 + F.lit(0.5)) / 1e6).alias("norm_6"),
            F.array_join(q, ",").alias("q_int8"),
        )
    )


@register(
    "curate_contamination",
    category="curation",
    oracle="""
WITH bench AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> concat(string_split(lower(text), ' ')[i], ' ',
                       string_split(lower(text), ' ')[i+1], ' ',
                       string_split(lower(text), ' ')[i+2])))) AS shingle
  FROM documents WHERE doc_id % 23 = 0
),
train AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> concat(string_split(lower(text), ' ')[i], ' ',
                       string_split(lower(text), ' ')[i+1], ' ',
                       string_split(lower(text), ' ')[i+2])))) AS shingle
  FROM documents WHERE doc_id % 23 != 0
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hit
  FROM train t JOIN bench b ON t.shingle = b.shingle
  GROUP BY t.doc_id
)
SELECT h.doc_id, s.n_shingles, h.n_hit,
       floor(CAST(h.n_hit AS DOUBLE) / s.n_shingles * 1e9 + 0.5) / 1e9
         AS overlap_ratio,
       CAST(h.n_hit AS DOUBLE) / s.n_shingles >= 0.5 AS flagged
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
""",
)
def curate_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every training document, the
    fraction of its distinct word 3-grams that appear anywhere in the
    benchmark set (docs with doc_id % 23 == 0 stand in for the eval set).
    Docs with >= 50% shingle overlap are flagged for removal — the
    standard n-gram decontamination pass before pre-training.

    Scale shape: the benchmark shingle set is SMALL by construction (eval
    sets are thousands of docs, not billions) -> broadcast it; the 100 TB
    training side then does a map-side hash-join + per-doc count with NO
    shuffle of the corpus (the only shuffle is the per-doc hit rollup,
    keyed by doc_id — uniform). Never join shingle-to-shingle without the
    broadcast: that shuffles the full corpus inverted index.
    """
    # token split projected before the transform (once-per-row, not
    # once-per-element — see llm_dedup._shingles)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    tc = F.col("toks")
    k = 3
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tc) - (k - 1), F.lit(0))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tc, i),
                F.element_at(tc, i + 1),
                F.element_at(tc, i + 2),
            ),
        )
    )
    # The benchmark shingle set scans ONLY the benchmark slice (1/23 of
    # the corpus) — never filter the full exploded corpus to get the small
    # side. The training corpus is then a SINGLE pass: one explode, one
    # map-side broadcast LEFT join tagging bench membership, one doc_id
    # rollup computing size and hit count together.
    bench = (
        d.filter(F.col("doc_id") % 23 == 0)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
        .withColumn("is_bench", F.lit(1))
    )
    per_doc = (
        d.filter(F.col("doc_id") % 23 != 0)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("is_bench").alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
    )
    ratio = F.col("n_hit").cast("double") / F.col("n_shingles")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_hit",
        (F.floor(ratio * 1e9 + F.lit(0.5)) / 1e9).alias("overlap_ratio"),
        (ratio >= 0.5).alias("flagged"),
    )


_MIX_TEMP = 0.5  # temperature for mixture reweighting (w_d ~ n_d^T)
_MIX_TARGET_FRAC = 0.5  # sample down to half the corpus overall


@register(
    "curate_domain_mix",
    category="curation",
    oracle=f"""
WITH c AS (
  SELECT lang AS domain, COUNT(*) AS n_d FROM documents GROUP BY lang
),
w AS (
  SELECT domain, n_d, pow(CAST(n_d AS DOUBLE), {_MIX_TEMP}) AS w_d,
         (SELECT SUM(pow(CAST(n_d AS DOUBLE), {_MIX_TEMP})) FROM c) AS sum_w,
         (SELECT SUM(n_d) FROM c) AS n_total
  FROM c
),
f AS (
  SELECT domain, n_d,
         CAST(floor(LEAST(
           w_d / sum_w * ({_MIX_TARGET_FRAC} * n_total) / n_d, 1.0
         ) * {_HASH_MOD} + 0.5) AS BIGINT) AS keep_below
  FROM w
)
SELECT d.doc_id, d.lang AS domain, f.keep_below
FROM documents d JOIN f ON d.lang = f.domain
WHERE (d.doc_id * {_HASH_MULT}) % {_HASH_MOD} < f.keep_below
""",
)
def curate_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain-mixture resampling (the pretraining data
    recipe step): per-domain weights w_d ~ n_d^T (T={_MIX_TEMP}) flatten
    the natural distribution; each domain then keeps a deterministic
    hash-thresholded fraction sized so the total lands at the target
    corpus fraction — NO window, NO per-domain shuffle: the corpus pass is
    a map-side broadcast join against the (tiny) per-domain threshold
    table and an integer compare. This is the formulation that holds at
    100 TB where a per-domain row_number would serialize each domain
    through one partition.
    """
    d = table(spark, sf_dir, "documents")
    c = d.groupBy(F.col("lang").alias("domain")).agg(F.count("*").alias("n_d"))
    tot = c.agg(
        F.sum(F.pow(F.col("n_d").cast("double"), F.lit(_MIX_TEMP))).alias("sum_w"),
        F.sum("n_d").alias("n_total"),
    )
    f = (
        c.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            F.floor(
                F.least(
                    F.pow(F.col("n_d").cast("double"), F.lit(_MIX_TEMP))
                    / F.col("sum_w")
                    * (F.lit(_MIX_TARGET_FRAC) * F.col("n_total"))
                    / F.col("n_d"),
                    F.lit(1.0),
                )
                * _HASH_MOD
                + F.lit(0.5)
            )
            .cast("long")
            .alias("keep_below"),
        )
    )
    return (
        d.join(F.broadcast(f), d.lang == f.domain)
        .filter((F.col("doc_id") * _HASH_MULT) % _HASH_MOD < F.col("keep_below"))
        .select("doc_id", F.col("lang").alias("domain"), "keep_below")
    )


def _keep_best_oracle() -> str:
    from .llm_dedup import _CC_ROUNDS, _JACCARD_TAU, _SQL_CORPUS, _min_label_rounds_sql

    return f"""
WITH {_SQL_CORPUS},
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= {_JACCARD_TAU}
),
lab0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM edges)
{_min_label_rounds_sql(_CC_ROUNDS)},
docs AS (SELECT doc_id, length(text) AS quality FROM corpus),
labeled AS (
  SELECT d.doc_id, d.quality, COALESCE(l.lbl, d.doc_id) AS component
  FROM docs d LEFT JOIN lab{_CC_ROUNDS} l ON l.node = d.doc_id
)
SELECT component,
       COUNT(*) AS n_members,
       MAX(quality) AS best_quality,
       MIN(doc_id) FILTER (WHERE is_best) AS kept_doc
FROM (
  SELECT *,
         quality = MAX(quality) OVER (PARTITION BY component) AS is_best
  FROM labeled
)
GROUP BY component
"""


@register(
    "curate_dedup_keep_best",
    category="curation",
    oracle=_keep_best_oracle(),
    heavy=True,
)
def curate_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: cluster near-duplicates (jaccard
    pairs -> min-label components, the dedup_components machinery) and
    keep the BEST member of each cluster by a quality signal (longest
    text, ties to the smallest doc_id) — what a production corpus
    pipeline actually does with duplicate clusters, instead of keeping an
    arbitrary representative. Singleton documents are their own component
    (left join + coalesce, no explicit singleton pass).
    """
    from pyspark.sql import Window as W

    from .llm_dedup import _corpus, doc_components

    # contracted component machinery (exact-dup contraction before the
    # shingle self-join — without it the pair-finding is quadratic in
    # duplicate-group size; shared with dedup_components). Identical-text
    # docs share length(text), so the keep-best choice is unaffected by
    # where in a group the quality is read.
    comp = doc_components(spark, sf_dir).withColumnRenamed("doc_id", "c_doc")
    docs = _corpus(spark, sf_dir).select(
        "doc_id", F.length("text").alias("quality")
    )
    labeled = (
        docs.join(comp, docs.doc_id == comp.c_doc, "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    best = F.max("quality").over(W.partitionBy("component"))
    return (
        labeled.withColumn("is_best", F.col("quality") == best)
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("quality").alias("best_quality"),
            F.min(F.when(F.col("is_best"), F.col("doc_id"))).alias("kept_doc"),
        )
    )


def curate_quality_buckets_approx_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: sketch-cutpoint decile assignment with raw
    per-bucket populations and score ranges — exercised directly by the
    pytest that compares it to the exact NTILE baseline."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    q = d.select(
        "doc_id",
        (F.length("text").cast("double") / F.size(toks)).alias("avg_tok_len"),
    )
    cuts_row = q.agg(
        F.percentile_approx(
            "avg_tok_len", [i / 10.0 for i in range(1, 10)], 10000
        ).alias("cuts")
    ).collect()[0]
    cuts = list(cuts_row["cuts"])  # 9 scalars to the driver — not data
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + (F.col("avg_tok_len") > F.lit(float(c))).cast("int")
    return (
        q.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_tok_len").alias("min_score"),
            F.max("avg_tok_len").alias("max_score"),
        )
    )


@register(
    "curate_quality_buckets_approx",
    category="curation",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT CAST(t.bucket AS INT) AS bucket, n.n_total, TRUE AS count_ok
FROM UNNEST(range(1, 11)) AS t(bucket), n
""",
)
def curate_quality_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB companion to curate_quality_ntile: decile cutpoints from
    ONE approx_percentile pass (mergeable GK sketch, no global sort), then
    a map-side bucket assignment — no window, no single-partition
    bottleneck. Sketch cutpoints are engine- (and merge-order-) specific,
    so the oracle checks the guarantee instead of the state: all 10
    buckets exist and each holds n/10 docs within the sketch rank bound
    (eps=1e-4, asserted with a 100x slack margin of max(1% of n, 8)) —
    any valid sketch passes, a bucketing bug fails. n_total is exact.
    The raw populations/score ranges are
    curate_quality_buckets_approx_raw (pytest-compared to exact NTILE)."""
    raw = curate_quality_buckets_approx_raw(spark, sf_dir)
    n_total = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    tol = F.greatest(F.col("n_total") * 0.01, F.lit(8.0))
    return raw.crossJoin(F.broadcast(n_total)).select(
        "bucket",
        "n_total",
        (F.abs(F.col("n_docs") - F.col("n_total") / 10.0) <= tol).alias(
            "count_ok"
        ),
    )


@register(
    "curate_retention_cohort",
    category="curation",
    oracle="""
WITH cohorts AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS act_week
  FROM events
)
SELECT c.cohort_week,
       CAST(datediff('day', c.cohort_week, a.act_week) / 7 AS INT) AS week_offset,
       COUNT(*) AS n_users
FROM cohorts c JOIN activity a ON c.user_id = a.user_id
GROUP BY 1, 2
""",
)
def curate_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each subsequent week they were active — the standard retention
    triangle. Three keyed aggregations, all on user_id or
    (cohort, offset); the DISTINCT activity reduce collapses raw events
    map-side before the join, and the cohorts side joins on the same
    user_id partitioning (no extra shuffle). Weeks are Monday-aligned in
    both engines, so the day-difference is an exact multiple of 7."""
    e = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts").cast("date")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select("user_id", wk.alias("act_week")).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "curate_hash_sample_per_group",
    category="curation",
    oracle="""
SELECT event_type, event_id, user_id, md5(CAST(event_id AS VARCHAR)) AS h
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) <= 100
""",
)
def curate_hash_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-group sampling by hash order: the 100 events per
    type whose md5(event_id) sorts lowest. Unlike rand()-based sampling
    this is engine- and run-independent (md5 is bit-identical everywhere)
    — the property a 100 TB curation pipeline needs so a re-run selects
    the SAME sample. One shuffle on event_type; at scale swap the full
    sort for a per-partition top-k (window over high-cardinality strata
    keeps partitions parallel — here 5 types is the demo grain)."""
    e = table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    w = W.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        e.select("event_type", "event_id", "user_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )


@register(
    "curate_pack_chunks",
    category="curation",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), off AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off
  FROM t
)
SELECT doc_id, n_tokens, start_off,
       start_off // 256 AS first_chunk,
       (start_off + n_tokens - 1) // 256 AS last_chunk,
       (start_off + n_tokens - 1) // 256 - start_off // 256 + 1 AS n_chunks
FROM off
""",
)
def curate_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents laid end-to-end in
    doc_id order, cut into 256-token training chunks; each doc learns its
    global token offset and the chunk range it spans (boundary docs span
    two). The offsets come from a DISTRIBUTED prefix sum — per-bucket
    token totals, a cumulative base over the (tiny) bucket frame, then an
    intra-bucket running sum partitioned by bucket — so no stage ever
    runs a single-partition window over the full corpus; this is the
    shape that packs 100 TB. Buckets are sized FROM THE KEY RANGE (at
    most 256 contiguous doc_id strata, from one O(1) min/max scalar
    read), not a fixed id/100 width — a fixed width would grow the
    base-offset frame as n/100 (a 10^7-row single-task window at 10^9
    docs), while 256 keeps it O(parallelism) at any n. The oracle
    computes the same offsets with one global window, proving the
    two-pass decomposition exact."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    bounds = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    lo, hi = int(bounds[0]), int(bounds[1])
    width = max(1, (hi - lo + 256) // 256)
    bucketed = d.withColumn("bucket", F.expr(f"(doc_id - {lo}) div {width}"))
    totals = bucketed.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    wb = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    bases = totals.select(
        "bucket", F.coalesce(F.sum("bucket_total").over(wb), F.lit(0)).alias("base")
    )
    wi = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = (
        bucketed.join(F.broadcast(bases), "bucket")
        .withColumn(
            "start_off",
            F.col("base") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0)),
        )
    )
    first = (F.col("start_off") / 256).cast("bigint")
    last = ((F.col("start_off") + F.col("n_tokens") - 1) / 256).cast("bigint")
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_off",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


@register(
    "curate_train_split",
    category="curation",
    oracle="""
WITH tagged AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 61
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS bucket
  FROM documents
), labeled AS (
  SELECT source, n_tokens,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM tagged
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY source), 6)
         AS frac_of_source
FROM labeled GROUP BY source, split
""",
)
def curate_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split: each doc's split is
    a pure function of md5(doc_id) (80/10/10), so ANY engine, run, or
    partitioning assigns the same document to the same split — the
    reproducibility property rand()-splits lose on retry or scale-out.
    Reported per source stratum with within-source fractions to audit
    the stratification. One aggregation shuffle on (source, split); the
    fraction window runs over the tiny aggregated frame."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 61 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    labeled = d.select(
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    agg = labeled.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    ws = W.partitionBy("source")
    return agg.select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(ws), 6).alias(
            "frac_of_source"
        ),
    )


_GOPHER_STOPS = "('the','a','of','and','to','in','is','on')"


@register(
    "curate_gopher_rules",
    category="curation",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS wc,
         length(replace(text, ' ', '')) * 1.0 / len(toks) AS mwl,
         len(list_filter(toks, t -> t IN {_GOPHER_STOPS})) * 1.0
           / len(toks) AS stop_ratio,
         len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_ratio
  FROM t
)
SELECT doc_id, wc,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(uniq_ratio, 6) AS uniq_ratio,
       concat_ws('|',
         CASE WHEN wc < 24 THEN 'too_short' END,
         CASE WHEN wc > 88 THEN 'too_long' END,
         CASE WHEN mwl < 4.3 THEN 'short_words' END,
         CASE WHEN stop_ratio < 0.03 THEN 'low_stopword' END,
         CASE WHEN uniq_ratio < 0.35 THEN 'low_diversity' END) AS failed_rules,
       (wc >= 24 AND wc <= 88 AND mwl >= 4.3
        AND stop_ratio >= 0.03 AND uniq_ratio >= 0.35) AS keep
FROM m
""",
)
def curate_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality gate (Gopher-style rule stack): word
    count bounds, mean word length, stopword density, and unique-token
    diversity, each a named rule; emits per-doc metrics, the '|'-joined
    list of failed rules (the auditable drop reason every curation
    pipeline owes its users), and the keep verdict. Pure per-row
    projection — zero shuffles; every metric is a built-in expression
    over ONE projected token split (inline splits re-evaluate per lambda
    element — measured 10x). Thresholds compare RAW doubles on both
    engines (identical int/int IEEE divisions), so rule flags can't
    straddle a rounding edge; only the reported metrics are rounded."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", "text", F.split("text", " ").alias("toks"))
    wc = F.size("toks")
    m = t.select(
        "doc_id",
        wc.alias("wc"),
        (F.length(F.regexp_replace("text", " ", "")) * 1.0 / wc).alias("mwl"),
        (
            F.expr(f"size(filter(toks, t -> t IN {_GOPHER_STOPS}))") * 1.0 / wc
        ).alias("stop_ratio"),
        (F.size(F.array_distinct("toks")) * 1.0 / wc).alias("uniq_ratio"),
    )
    mwl, stp, unq = F.col("mwl"), F.col("stop_ratio"), F.col("uniq_ratio")
    w = F.col("wc")
    return m.select(
        "doc_id",
        "wc",
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(stp, 6).alias("stop_ratio"),
        F.round(unq, 6).alias("uniq_ratio"),
        F.concat_ws(
            "|",
            F.when(w < 24, "too_short"),
            F.when(w > 88, "too_long"),
            F.when(mwl < 4.3, "short_words"),
            F.when(stp < 0.03, "low_stopword"),
            F.when(unq < 0.35, "low_diversity"),
        ).alias("failed_rules"),
        (
            (w >= 24) & (w <= 88) & (mwl >= 4.3) & (stp >= 0.03) & (unq >= 0.35)
        ).alias("keep"),
    )


# --- semantic dedup (SemDeDup-style: cluster, then prune within cluster) ---

_SEMDEDUP_TAU = 0.35  # same cosine threshold as dedup_embedding_cosine

_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ex AS (
  SELECT label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
cent AS (
  SELECT label AS c_label, pos,
         CAST(SUM(CAST(val AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS cval
  FROM ex GROUP BY label, pos
),
vex AS (
  SELECT vec_id, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
vdists AS (
  SELECT v.vec_id, c.c_label,
         CAST(SUM(CAST((v.val - c.cval) * (v.val - c.cval)
                       AS DECIMAL(30,18))) AS DOUBLE) AS sqdist
  FROM vex v JOIN cent c ON v.pos = c.pos
  GROUP BY v.vec_id, c.c_label
),
assign AS (
  SELECT vec_id, c_label AS cluster
  FROM (SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM vdists)
  WHERE rn = 1
),
m AS (
  SELECT a.vec_id, a.cluster, e.emb
  FROM assign a JOIN e ON e.vec_id = a.vec_id
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {{DOT}} >= {_SEMDEDUP_TAU}
)
SELECT m.cluster, m.vec_id, (d.vec_id IS NULL) AS kept
FROM m LEFT JOIN drops d ON d.vec_id = m.vec_id
"""


def _semdedup_oracle() -> str:
    from .llm_similarity import _SQL_DOT

    return _SEMDEDUP_SQL.replace("{DOT}", _SQL_DOT.format(a="a.emb", b="b.emb"))


@register(
    "curate_semdedup",
    category="curation",
    oracle=_semdedup_oracle(),
)
def curate_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the embedding space, then drop any vector whose cosine to a
    LOWER-ID member of the SAME cluster exceeds tau — the greedy keep-first
    rule, made deterministic by the vec_id order.

    Clustering here is the nearest-label-centroid assignment (exact
    decimal means => engine-identical; production swaps in k-means, which
    only weakens the oracle to rows+recall, not the shape). Pairwise
    cosine runs ONLY within a cluster: work is sum of c_i^2 over cluster
    sizes instead of n^2 — the entire point of SemDeDup at 100 TB, where
    clusters are partition keys: each cluster's prune is partition-local
    (no cross-cluster shuffle), and cluster size is capped by splitting
    oversized clusters on a secondary hash. Output: every vector with its
    cluster and kept/dropped verdict.
    """
    from .llm_similarity import _dot, _emb

    e = _emb(spark, sf_dir)
    ex = e.select("label", F.posexplode("emb").alias("pos", "val"))
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cval")
    )
    vex = e.select("vec_id", F.posexplode("emb").alias("pos", "val"))
    vdists = (
        vex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(
            F.sum(
                (
                    (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
                ).cast("decimal(30,18)")
            )
            .cast("double")
            .alias("sqdist")
        )
    )
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy("sqdist", "c_label")
    )
    assign = (
        vdists.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_label").alias("cluster"))
    )
    # The assignment subtree feeds three consumers (both pairwise sides +
    # the final verdict join): cut it once instead of recomputing the
    # centroid/argmin pipeline 3x (same lineage-cut pattern as
    # dedup_components).
    m = assign.join(e.select("vec_id", "emb"), "vec_id").localCheckpoint(eager=False)
    a = m.alias("a")
    b = m.alias("b")
    drops = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(_dot(F.col("a.emb"), F.col("b.emb")) >= _SEMDEDUP_TAU)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return m.join(drops.withColumn("dropped", F.lit(True)), "vec_id", "left").select(
        "cluster", "vec_id", F.col("dropped").isNull().alias("kept")
    )


@register(
    "curate_source_gini",
    category="curation",
    oracle="""
WITH tc AS (
  SELECT source, doc_id,
         len(string_split(lower(text), ' ')) AS ntok
  FROM documents
),
r AS (
  SELECT source, ntok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY ntok, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM tc
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       CAST(SUM((2 * r - n - 1) * ntok) AS BIGINT)
         / CAST(MAX(n) * SUM(ntok) AS DOUBLE) AS gini
FROM r GROUP BY source
""",
)
def curate_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count Gini coefficient per source — the concentration metric
    a data-mix report pairs with entropy: is a source's token mass spread
    evenly across its documents or locked up in a few giants? Uses the
    SCALABLE closed form sum((2*rank - n - 1) * x) / (n * sum(x)) over a
    rank window (one shuffle) instead of collecting per-group lists —
    tokens counts are integers so every sum is exact; rank ties
    contribute identical totals under any tiebreak, so the statistic is
    deterministic. The single double division at the end is engine-exact
    (bigint/bigint), no rounding."""
    d = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("ntok"),
    )
    w = W.partitionBy("source").orderBy("ntok", "doc_id")
    r = d.select(
        "source",
        "ntok",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"),
    )
    return r.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.sum("ntok").alias("total_tokens"),
        (
            F.sum((2 * F.col("r") - F.col("n") - 1) * F.col("ntok"))
            / (F.max("n") * F.sum("ntok")).cast("double")
        ).alias("gini"),
    )


@register(
    "curate_url_canonical_dedup",
    category="curation",
    oracle="""
WITH raw AS (
  SELECT c_custkey,
         unnest([
           concat('https://', lower(c_mktsegment), '.example.org/c/',
                  c_custkey, '?id=', c_custkey),
           concat('HTTPS://', upper(lower(c_mktsegment)), '.EXAMPLE.ORG/c/',
                  c_custkey, '?id=', c_custkey, '&utm_source=feed#section-2'),
           concat('https://', lower(c_mktsegment), '.example.org/c/',
                  c_custkey, '/?id=', c_custkey)
         ]) AS url
  FROM customer WHERE c_custkey <= 1000
),
canon AS (
  SELECT c_custkey, url,
         regexp_replace(
           regexp_replace(
             concat(
               lower(regexp_extract(regexp_replace(url, '#.*', ''),
                                    '^[a-zA-Z]+://[^/?]+')),
               substr(regexp_replace(url, '#.*', ''),
                      length(regexp_extract(regexp_replace(url, '#.*', ''),
                                            '^[a-zA-Z]+://[^/?]+')) + 1)
             ),
             '&utm_[a-z_]+=[^&#]*', '', 'g'),
           '/\\?', '?') AS canonical_url
  FROM raw
)
SELECT canonical_url,
       COUNT(*) AS n_raw,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       MIN(c_custkey) AS keep_key
FROM canon GROUP BY canonical_url
""",
)
def curate_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — step 1 of every web-crawl corpus
    pipeline: scheme/host lowercased (path case preserved), fragment
    dropped, utm_* tracking params stripped, trailing slash before the
    query removed; then keep-one per canonical form. Three deterministic
    raw variants per key (mixed case, tracking+fragment, trailing slash)
    must collapse to ONE canonical URL each — the groupBy proves the
    chain. Pure regexp/codegen row work then one shuffle on the
    canonical key. Regex subtleties pinned: DuckDB regexp_replace needs
    the 'g' flag where multiple matches are possible, and RE2 has no
    lookahead, so the trailing-slash rule is the literal '/?' -> '?'
    rewrite."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    seg = F.lower(F.col("c_mktsegment"))
    key = F.col("c_custkey").cast("string")
    v0 = F.concat(
        F.lit("https://"), seg, F.lit(".example.org/c/"), key, F.lit("?id="), key
    )
    v1 = F.concat(
        F.lit("HTTPS://"),
        F.upper(seg),
        F.lit(".EXAMPLE.ORG/c/"),
        key,
        F.lit("?id="),
        key,
        F.lit("&utm_source=feed#section-2"),
    )
    v2 = F.concat(
        F.lit("https://"), seg, F.lit(".example.org/c/"), key, F.lit("/?id="), key
    )
    raw = c.select(
        "c_custkey", F.explode(F.array(v0, v1, v2)).alias("url")
    )
    no_frag = F.regexp_replace(F.col("url"), "#.*", "")
    head = F.regexp_extract(no_frag, "^[a-zA-Z]+://[^/?]+", 0)
    rebuilt = F.concat(
        F.lower(head), F.substring(no_frag, F.length(head) + 1, F.lit(1 << 20))
    )
    canonical = F.regexp_replace(
        F.regexp_replace(rebuilt, "&utm_[a-z_]+=[^&#]*", ""), "/\\?", "?"
    )
    canon = raw.select("c_custkey", "url", canonical.alias("canonical_url"))
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("c_custkey").alias("keep_key"),
    )


_FUNNEL_ORACLE = """
WITH base AS (SELECT doc_id, lower(text) AS text, lang FROM documents),
corpus AS (
  SELECT doc_id, text, lang FROM base
  UNION ALL
  SELECT doc_id + 300000, text, lang FROM base WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_slice(string_split(text, ' '), 3,
                         len(string_split(text, ' '))), ' '),
         lang
  FROM base
),
q AS (SELECT * FROM corpus WHERE len(string_split(text, ' ')) >= 25),
l AS (SELECT * FROM q WHERE lang = 'en'),
ex AS MATERIALIZED (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
    FROM l
  ) WHERE doc_id = keep_id
),
sh AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM ex
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS nc
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
drops AS (
  SELECT DISTINCT p.db AS doc_id
  FROM p JOIN sizes sa ON sa.doc_id = p.da
         JOIN sizes sb ON sb.doc_id = p.db
  WHERE p.nc * 1.0 / (sa.n_sh + sb.n_sh - p.nc) >= 0.8
),
nd AS MATERIALIZED (
  SELECT ex.doc_id, ex.text FROM ex
  WHERE ex.doc_id NOT IN (SELECT doc_id FROM drops)
),
bsh AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])))) AS shingle
  FROM base WHERE doc_id % 23 = 0
),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_hit
  FROM sh s JOIN bsh b ON s.shingle = b.shingle
  WHERE s.doc_id IN (SELECT doc_id FROM nd)
  GROUP BY s.doc_id
),
dc AS (
  SELECT nd.doc_id FROM nd
  JOIN sizes z ON z.doc_id = nd.doc_id
  LEFT JOIN hits h ON h.doc_id = nd.doc_id
  WHERE COALESCE(h.n_hit, 0) * 1.0 / z.n_sh < 0.5
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
       CAST(n_docs AS BIGINT) AS n_docs
FROM (
  SELECT 0 AS stage_idx, 'ingest' AS stage,
         (SELECT COUNT(*) FROM corpus) AS n_docs
  UNION ALL SELECT 1, 'quality_wc', (SELECT COUNT(*) FROM q)
  UNION ALL SELECT 2, 'lang_en', (SELECT COUNT(*) FROM l)
  UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM ex)
  UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM nd)
  UNION ALL SELECT 5, 'decontam', (SELECT COUNT(*) FROM dc)
)
"""


@register(
    "curate_pipeline_funnel",
    category="curation",
    oracle=_FUNNEL_ORACLE,
    heavy=True,
)
def curate_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline, end to end, as ONE hash-checked query:
    ingest (docs + manufactured exact copies + near-dup twins) -> quality
    gate (word-count floor) -> language filter -> exact dedup (keep-min
    per md5) -> near-dup removal (3-shingle Jaccard >= 0.8, drop the
    higher doc_id of each pair) -> benchmark decontamination (drop docs
    sharing >= 50% of shingles with the doc_id%23 eval slice). Returns the
    survivor count after every stage — the funnel report a data-curation
    run publishes.

    Stage order matters and is the cheap-first production order: per-row
    gates (quality, lang) cut the corpus BEFORE any pairwise work, the
    hash dedup's single uniform shuffle runs before the shingle join, and
    decontamination broadcasts the small benchmark shingle set against
    only the surviving docs. The near-dup stage here is the EXACT
    inverted-index formulation so the funnel is fully SQL-checkable; at
    100 TB swap in the minhash stage (dedup_minhash_det) — the keep rule
    (drop higher id of each qualifying pair) is identical. Exact dedup
    uses a window min per hash, not a join. All six counts are computed
    in one DataFrame union — no driver-side counting."""
    from .llm_dedup import _shingles

    base = table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text"), "lang"
    )
    toks = F.split(F.col("text"), " ")
    corpus = (
        base.unionByName(
            base.filter(F.col("doc_id") < 100).select(
                (F.col("doc_id") + 300000).alias("doc_id"), "text", "lang"
            )
        ).unionByName(
            base.select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.array_join(F.slice(toks, 3, F.size(toks)), " ").alias("text"),
                "lang",
            )
        )
    )
    q = corpus.filter(F.size(F.split(F.col("text"), " ")) >= 25)
    l_en = q.filter(F.col("lang") == "en")
    w_hash = W.partitionBy(F.md5(F.col("text")))
    ex = (
        l_en.withColumn("keep_id", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
        .localCheckpoint()
    )
    sh = _shingles(ex)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    drops = (
        pairs.join(sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb")), "db")
        .filter(
            F.col("nc") * 1.0 / (F.col("na") + F.col("nb") - F.col("nc")) >= 0.8
        )
        .select(F.col("db").alias("doc_id"))
        .distinct()
    )
    nd = ex.join(drops, "doc_id", "left_anti").localCheckpoint()
    bench_sh = (
        _shingles(base.filter(F.col("doc_id") % 23 == 0).select("doc_id", "text"))
        .select("shingle")
        .distinct()
    )
    nd_sh = sh.join(nd.select("doc_id"), "doc_id", "left_semi")
    hits = (
        nd_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    dc = (
        nd.join(sizes, "doc_id")
        .join(hits, "doc_id", "left")
        .filter(
            F.coalesce(F.col("n_hit"), F.lit(0)) * 1.0 / F.col("n_sh") < 0.5
        )
        .select("doc_id")
    )

    def stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n_docs"),
        )

    return (
        stage(0, "ingest", corpus)
        .unionByName(stage(1, "quality_wc", q))
        .unionByName(stage(2, "lang_en", l_en))
        .unionByName(stage(3, "exact_dedup", ex))
        .unionByName(stage(4, "near_dedup", nd))
        .unionByName(stage(5, "decontam", dc))
    )


@register(
    "curate_dataset_card",
    category="curation",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       SUM(len(string_split(text, ' '))) * 1.0 / COUNT(*) AS mean_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) * 1.0
         / COUNT(*) AS pct_en,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS BIGINT) * 1.0 / COUNT(*)
         AS dup_rate
FROM (SELECT source, text, lang FROM documents
      UNION ALL
      SELECT source, text, lang FROM documents WHERE doc_id % 11 = 0)
GROUP BY source
""",
)
def curate_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the datasheet table a curation run
    publishes alongside the data: document and token counts, mean length,
    language spread, English share, and exact-duplicate rate
    (1 - distinct-hash/docs; a 1-in-11 duplicated slice is unioned in so
    the rate is nonzero and checkable). Every ratio is an IEEE division of
    exact integers — no order-sensitive float aggregation anywhere, so the
    card hash-matches.

    Scale: one pass, one shuffle on the (low-cardinality) source key;
    token counts are size(split()) projections computed map-side, and
    the two COUNT(DISTINCT)s rewrite to expand + two-level aggregation
    under the same key — no per-group state beyond the distinct sets.
    At 100 TB, swap exact COUNT(DISTINCT md5) for approx_count_distinct
    and the card costs one scan."""
    d = table(spark, sf_dir, "documents").select("source", "text", "lang")
    dup = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("source", "text", "lang")
    )
    u = d.unionByName(dup)
    wc = F.size(F.split(F.col("text"), " "))
    n = F.count(F.lit(1))
    return (
        u.select("source", "lang", F.md5(F.col("text")).alias("h"), wc.alias("wc"))
        .groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("wc").alias("n_tokens"),
            (F.sum("wc") * 1.0 / n).alias("mean_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            (
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long")
                * 1.0
                / n
            ).alias("pct_en"),
            (1.0 - F.countDistinct("h").cast("long") * 1.0 / n).alias("dup_rate"),
        )
    )


def _leakage_safe_split_oracle() -> str:
    from .llm_dedup import (
        _CC_ROUNDS,
        _JACCARD_TAU,
        _SQL_CORPUS,
        _min_label_rounds_sql,
    )

    return f"""
WITH {_SQL_CORPUS},
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= {_JACCARD_TAU}
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= {_JACCARD_TAU}
),
lab0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM edges)
{_min_label_rounds_sql(_CC_ROUNDS)}
SELECT c.doc_id,
       COALESCE(l.lbl, c.doc_id) AS cluster_label,
       CASE WHEN ('0x' || substr(md5(CAST(COALESCE(l.lbl, c.doc_id)
                                         AS VARCHAR)), 1, 15))::BIGINT
                 % 10 < 9
            THEN 'train' ELSE 'test' END AS split
FROM corpus c LEFT JOIN lab{_CC_ROUNDS} l ON l.node = c.doc_id
"""


@register(
    "curate_leakage_safe_split",
    category="curation",
    oracle=_leakage_safe_split_oracle(),
    heavy=True,
)
def curate_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: the split unit is the NEAR-DUP
    CLUSTER (connected component of Jaccard>=tau pairs), never the
    document — a doc-level random split puts one twin in train and the
    other in test, silently inflating eval scores (the classic benchmark
    contamination-by-duplication bug). Singleton docs are their own
    cluster; the 90/10 assignment hashes the CLUSTER label through the
    deterministic md5 bucket (same cross-engine primitive as
    sample_hash_bucket), so every member of a cluster lands on the same
    side by construction, and the split is reproducible on any engine or
    cluster layout. Composes the components machinery (same rounds, same
    update rule) with one md5 per cluster — at 100 TB the split costs
    one broadcast-join of cluster labels after the dedup you were
    already running."""
    from pyspark.sql import functions as _F

    from .llm_dedup import _corpus, doc_components

    # contracted component machinery (shared with dedup_components —
    # exact-dup contraction keeps the pair-finding linear in DISTINCT
    # texts instead of quadratic in duplicate-group size)
    comp = doc_components(spark, sf_dir).withColumnRenamed("doc_id", "c_doc")
    docs = _corpus(spark, sf_dir).select("doc_id")
    lbl = _F.coalesce(_F.col("component"), _F.col("doc_id"))
    bucket = (
        _F.conv(_F.substring(_F.md5(lbl.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 10
    )
    return (
        docs.join(comp, docs.doc_id == comp.c_doc, "left")
        .select(
            "doc_id",
            lbl.alias("cluster_label"),
            _F.when(bucket < 9, "train").otherwise("test").alias("split"),
        )
    )


@register(
    "curate_survival_curve",
    category="curation",
    oracle="""
WITH life AS (
  SELECT user_id,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
           AS lifetime_days
  FROM events GROUP BY user_id
),
tot AS (SELECT COUNT(*) AS n_users FROM life)
SELECT k.k AS day_offset,
       CAST(COUNT(l.user_id) AS BIGINT) AS n_surviving,
       round(COUNT(l.user_id) * 1.0 / (SELECT n_users FROM tot), 9)
         AS survival
FROM generate_series(0, 14) AS k(k)
LEFT JOIN life l ON l.lifetime_days >= k.k
GROUP BY k.k
""",
)
def curate_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime survival curve S(k): the share of users still active
    k or more days after their first event (lifetime = last minus first
    activity date) for k = 0..14 — the retention summary behind churn
    dashboards, here as one hash-checked query. Lifetimes are integer day
    differences (no timezone/rounding edge with the session pinned UTC);
    the survival share is an IEEE division of exact counts. Plan: one
    user_id rollup for lifetimes, then a 15-row spine joined with an
    inequality — the spine side is constant-size, so the join broadcasts
    and the curve costs one aggregation pass regardless of user count."""
    e = table(spark, sf_dir, "events")
    life = e.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("lifetime_days")
    )
    total = life.count()
    spine = spark.range(0, 15).select(F.col("id").alias("day_offset"))
    return (
        F.broadcast(spine)
        .join(life, life.lifetime_days >= spine.day_offset, "left")
        .groupBy("day_offset")
        .agg(
            F.count("user_id").alias("n_surviving"),
            F.round(F.count("user_id") * 1.0 / F.lit(total), 9).alias(
                "survival"
            ),
        )
    )


_K_ANON = 6


@register(
    "curate_k_anonymity",
    category="curation",
    oracle=f"""
WITH classes AS (
  SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(FLOOR(c_acctbal/2000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment, c_nationkey, bal_band, class_size,
       class_size < {_K_ANON} AS is_suppressed,
       CAST(SUM(CASE WHEN class_size < {_K_ANON} THEN class_size ELSE 0 END)
            OVER () AS BIGINT) AS n_rows_suppressed,
       CAST(SUM(class_size) OVER () AS BIGINT) AS n_rows_total
FROM classes
""",
)
def curate_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (market
    segment, nation, account-balance band): every equivalence class
    with fewer than k={_K_ANON} members is marked for suppression —
    the re-identification gate a privacy review runs before a dataset
    leaves the building (the structural companion to text_pii_scrub,
    which removes direct identifiers; quasi-identifiers re-identify by
    JOINING, which only class-size bounds prevent). Each row carries
    the global suppressed/total tallies so the publish decision (e.g.
    "suppress <2% of rows, else generalize the bands wider") reads off
    the same result. 605 of 623 classes fail at sf0.01 and 3 of 750 at
    sf0.1 — the generalization pressure is visible at every scale.

    Scale shape: one map-combined groupBy over the quasi-identifier
    tuple; the windows run over the CLASS table (bounded by the
    quasi-identifier domain, not row count). Generalizing = coarsening
    the band expression — same plan."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    wall = W.partitionBy()
    suppressed = F.col("class_size") < _K_ANON
    return classes.select(
        "c_mktsegment",
        "c_nationkey",
        "bal_band",
        "class_size",
        suppressed.alias("is_suppressed"),
        F.sum(F.when(suppressed, F.col("class_size")).otherwise(0))
        .over(wall)
        .cast("long")
        .alias("n_rows_suppressed"),
        F.sum("class_size").over(wall).cast("long").alias("n_rows_total"),
    )


_SOURCE_CAP = 5


@register(
    "curate_source_cap",
    category="curation",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('cap-v1|' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {_SOURCE_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk > {_SOURCE_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_capped,
       min(CASE WHEN rk <= {_SOURCE_CAP}
           THEN md5('cap-v1|' || CAST(doc_id AS VARCHAR)) END)
         AS first_kept_hash
FROM ranked
GROUP BY source
""",
)
def curate_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping: every source keeps at most
    {_SOURCE_CAP} documents, selected by md5-of-(release-tag + id)
    order — the anti-domination guard that stops one crawler dump from
    swamping the mixture (curate_domain_mix reweights smoothly; the cap
    is the hard ceiling you also want). Hash-order selection makes the
    kept set stable across runs, engines and cluster layouts, and
    growable: raising the cap keeps every previously-kept doc (the
    sample_hash_bucket property, per source). The readout reports
    kept/capped per source plus the first kept hash as a selection
    fingerprint.

    Scale shape: one window rank per source partition (the shuffle you
    pay for any per-source operation) and a map-combined rollup."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap-v1|"), F.col("doc_id").cast("string")))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(h, F.col("doc_id"))
    )
    ranked = d.select("doc_id", "source", h.alias("h"), rk.alias("rk"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rk") <= _SOURCE_CAP, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rk") > _SOURCE_CAP, 1).otherwise(0))
        .cast("long")
        .alias("n_capped"),
        F.min(
            F.when(F.col("rk") <= _SOURCE_CAP, F.col("h"))
        ).alias("first_kept_hash"),
    )


@register(
    "curate_source_similarity",
    category="curation",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, t
),
totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.t, a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb
  FROM counts a
  JOIN counts b ON b.t = a.t AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
),
terms AS (
  SELECT source_a, source_b,
         CAST(round(CASE WHEN ca*nb <= cb*na
                    THEN CAST(ca AS DOUBLE)/na
                    ELSE CAST(cb AS DOUBLE)/nb END, 9)
              AS DECIMAL(30,9)) AS term
  FROM pairs
),
sims AS (
  SELECT source_a, source_b,
         CAST(SUM(term) AS DOUBLE) AS hist_intersection
  FROM terms GROUP BY source_a, source_b
)
SELECT source_a, source_b, hist_intersection, rn
FROM (SELECT source_a, source_b, hist_intersection,
             ROW_NUMBER() OVER (ORDER BY hist_intersection DESC,
                                source_a, source_b) AS rn
      FROM sims)
WHERE rn <= 15
""",
)
def curate_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional similarity between sources: histogram
    intersection sum(min(p_a(t), p_b(t))) over the shared vocabulary —
    1.0 means identical token distributions, and a suspiciously high
    pair flags the same crawl ingested twice under different names
    (dedup finds duplicate DOCUMENTS; this finds duplicate SOURCES).
    Top-15 most-similar pairs. The min picks by exact integer
    cross-multiplication (ca*nb vs cb*na — no double compare), each
    chosen fraction rounds to the 9-decimal grid before the exact
    decimal sum.

    Scale shape: token counts are one map-combined pass; the pair join
    is an inverted-index join on the token (work tracks shared-vocab
    collision lists, |sources|^2 only in the worst all-shared case),
    and the rollup emits one row per source pair."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    a = counts.select(
        F.col("source").alias("source_a"), "t", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("source_b"),
        F.col("t").alias("tb"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("t") == F.col("tb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("source_a"),
                    F.col("n").alias("na"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("source_b"),
                    F.col("n").alias("nb"),
                )
            ),
            "source_b",
        )
    )
    term = F.round(
        F.when(
            F.col("ca") * F.col("nb") <= F.col("cb") * F.col("na"),
            F.col("ca").cast("double") / F.col("na"),
        ).otherwise(F.col("cb").cast("double") / F.col("nb")),
        9,
    ).cast("decimal(30,9)")
    sims = pairs.groupBy("source_a", "source_b").agg(
        F.sum(term).cast("double").alias("hist_intersection")
    )
    wtop = W.orderBy(
        F.desc("hist_intersection"), F.asc("source_a"), F.asc("source_b")
    )
    return (
        sims.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 15)
        .select("source_a", "source_b", "hist_intersection", "rn")
    )


_TE_SMOOTH = 20


@register(
    "curate_target_encoding_loo",
    category="curation",
    oracle=f"""
WITH labeled AS (
  SELECT event_id, event_type,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS target
  FROM events
),
grp AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(target) AS BIGINT) AS sum_cat
  FROM labeled GROUP BY event_type
),
prior AS (
  SELECT CAST(SUM(sum_cat) AS BIGINT) AS s_all,
         CAST(SUM(n_cat) AS BIGINT) AS n_all
  FROM grp
)
SELECT l.event_id, l.event_type, CAST(l.target AS BIGINT) AS target,
       round((g.sum_cat - l.target
              + {_TE_SMOOTH} * (CAST(p.s_all AS DOUBLE)/p.n_all))
             / (g.n_cat - 1 + {_TE_SMOOTH}), 9) AS te_loo
FROM labeled l
JOIN grp g ON g.event_type = l.event_type, prior p
WHERE l.event_id < 3000
""",
)
def curate_target_encoding_loo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leakage-safe target encoding: each row's categorical feature
    (event type) becomes the smoothed LEAVE-ONE-OUT target mean —
    (sum - own_target + m*prior)/(n - 1 + m), m={_TE_SMOOTH} — the
    encoding that lets a model use high-cardinality categoricals
    without memorizing its own label (naive per-category means leak
    the row's target into its own feature; LOO subtracts it, smoothing
    shrinks rare categories toward the prior). All numerators are
    exact integers plus one prior ratio in an identical chain,
    rounded once.

    Scale shape: one map-combined group pass + a broadcast join back —
    the same cost as any categorical aggregate; no per-row windows."""
    e = table(spark, sf_dir, "events")
    labeled = e.select(
        "event_id",
        "event_type",
        F.when(F.col("value") > 50, 1).otherwise(0).alias("target"),
    )
    grp = labeled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum("target").alias("sum_cat"),
    )
    prior = grp.agg(
        F.sum("sum_cat").alias("s_all"), F.sum("n_cat").alias("n_all")
    )
    te = (
        F.col("sum_cat")
        - F.col("target")
        + _TE_SMOOTH * (F.col("s_all").cast("double") / F.col("n_all"))
    ) / (F.col("n_cat") - 1 + _TE_SMOOTH)
    return (
        labeled.filter(F.col("event_id") < 3000)
        .join(F.broadcast(grp), "event_type")
        .crossJoin(F.broadcast(prior))
        .select(
            "event_id",
            "event_type",
            F.col("target").cast("long").alias("target"),
            F.round(te, 9).alias("te_loo"),
        )
    )


_KFOLD = 5


@register(
    "curate_kfold_assign",
    category="curation",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || substr(md5('kfold-v1|'
              || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % {_KFOLD} AS BIGINT) AS fold
  FROM documents
)
SELECT fold, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assigned
GROUP BY fold, source
""",
)
def curate_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k={_KFOLD}) by hashed doc id
    with the per-(fold, source) census — the cross-validation split
    that is reproducible across runs, engines and cluster layouts
    (curate_train_split's md5 discipline, generalized to k folds), and
    whose census is the balance check: roughly equal fold sizes AND
    every source represented in every fold, so no fold trains blind to
    a domain. A release-tagged seed rotates folds between experiments
    without touching data.

    Scale shape: a narrow hash projection + one map-combined census;
    fold membership never materializes a shuffle (the fold column IS
    the partition filter downstream)."""
    d = table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kfold-v1|"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _KFOLD
    )
    return (
        d.select("doc_id", "source", fold.alias("fold"))
        .groupBy("fold", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "curate_decision_stump",
    category="curation",
    oracle="""
WITH labeled AS (
  SELECT o_totalprice AS x,
         CASE WHEN (o_totalprice > 200000.0) <> (o_orderkey % 7 = 0)
              THEN 1 ELSE 0 END AS y
  FROM orders
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS k
  FROM labeled
),
grid AS (SELECT unnest([50000.0, 100000.0, 150000.0, 200000.0,
                        250000.0, 300000.0, 350000.0]) AS thr),
splits AS (
  SELECT g.thr,
         CAST(COUNT(CASE WHEN l.x <= g.thr THEN 1 END) AS BIGINT) AS n_le,
         CAST(SUM(CASE WHEN l.x <= g.thr THEN l.y ELSE 0 END) AS BIGINT)
           AS k_le
  FROM labeled l CROSS JOIN grid g
  GROUP BY g.thr
),
gains AS (
  SELECT thr, n_le, k_le, t.n - n_le AS n_gt, t.k - k_le AS k_gt,
         round(
           (CASE WHEN t.k IN (0, t.n) THEN 0.0 ELSE
             -((t.k*1.0/t.n) * ln(t.k*1.0/t.n)
               + ((t.n-t.k)*1.0/t.n) * ln((t.n-t.k)*1.0/t.n)) END)
           - (n_le*1.0/t.n) *
             (CASE WHEN n_le = 0 OR k_le IN (0, n_le) THEN 0.0 ELSE
               -((k_le*1.0/n_le) * ln(k_le*1.0/n_le)
                 + ((n_le-k_le)*1.0/n_le) * ln((n_le-k_le)*1.0/n_le)) END)
           - ((t.n-n_le)*1.0/t.n) *
             (CASE WHEN t.n-n_le = 0 OR t.k-k_le IN (0, t.n-n_le)
               THEN 0.0 ELSE
               -(((t.k-k_le)*1.0/(t.n-n_le)) * ln((t.k-k_le)*1.0/(t.n-n_le))
                 + ((t.n-n_le-(t.k-k_le))*1.0/(t.n-n_le))
                   * ln((t.n-n_le-(t.k-k_le))*1.0/(t.n-n_le))) END)
         , 9) AS gain
  FROM splits, tot t
)
SELECT thr, n_le, k_le, n_gt, k_gt, gain,
       ROW_NUMBER() OVER (ORDER BY gain DESC, thr) = 1 AS is_best
FROM gains
""",
)
def curate_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump (1R) split finder: best single threshold on a
    numeric feature by information gain — the quality-classifier
    bootstrap a curation pipeline runs before any real model exists
    (and the exact inner loop of a distributed tree learner's split
    evaluation). The label is a noisy threshold function of the feature
    (price>200k XOR key%7) so a genuine optimum exists at thr=200000.

    Shape that scales: the candidate grid (7 thresholds) cross-joins as
    a BROADCAST against the labeled rows and one map-side-combined
    groupBy(threshold) produces every split's sufficient statistics
    (n_le, k_le) in a single pass — the shuffle carries |grid| x
    n_partitions partial rows, never the data. Gains are closed-form
    scalar doubles from exact integer counts (fixed evaluation order,
    0*ln0 guarded); ln() ulp noise is absorbed by 9-dp rounding and the
    winner is chosen on the ROUNDED gain with a threshold tiebreak, so
    the argmax is engine-stable."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    labeled = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(
            (F.col("o_totalprice") > 200000.0)
            != (F.col("o_orderkey") % 7 == 0),
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    tot = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("k"),
    )
    grid = spark.createDataFrame(
        [(float(t),) for t in (50000, 100000, 150000, 200000, 250000, 300000, 350000)],
        "thr double",
    )
    splits = (
        labeled.crossJoin(F.broadcast(grid))
        .groupBy("thr")
        .agg(
            F.count(F.when(F.col("x") <= F.col("thr"), 1))
            .cast("long")
            .alias("n_le"),
            F.sum(F.when(F.col("x") <= F.col("thr"), F.col("y")).otherwise(0))
            .cast("long")
            .alias("k_le"),
        )
        .crossJoin(F.broadcast(tot))
    )

    def ent(k, n):
        p = k * 1.0 / n
        q = (n - k) * 1.0 / n
        return F.when((k == 0) | (k == n) | (n == 0), 0.0).otherwise(
            -(p * F.log(p) + q * F.log(q))
        )

    n, k = F.col("n"), F.col("k")
    n_le, k_le = F.col("n_le"), F.col("k_le")
    n_gt, k_gt = n - n_le, k - k_le
    gain = F.round(
        ent(k, n)
        - (n_le * 1.0 / n) * ent(k_le, n_le)
        - (n_gt * 1.0 / n) * ent(k_gt, n_gt),
        9,
    )
    gains = splits.select(
        "thr",
        "n_le",
        "k_le",
        n_gt.alias("n_gt"),
        k_gt.alias("k_gt"),
        gain.alias("gain"),
    )
    w = W.orderBy(F.col("gain").desc(), F.col("thr"))
    # partition-less window over exactly |grid| = 7 rows — bounded, not a
    # data-sized global window
    return gains.select(
        "*", (F.row_number().over(w) == 1).alias("is_best")
    )


@register(
    "curate_domain_resample",
    category="curation",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_before) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM counts
),
keep_p AS (
  SELECT c.source, c.n_before,
         least(1.0, (t.n * 1.0 / t.n_sources) / c.n_before) AS p_keep
  FROM counts c, tot t
),
kept AS (
  SELECT d.source, COUNT(*) AS n_after
  FROM documents d JOIN keep_p k ON k.source = d.source
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
        / 1152921504606846976.0 < k.p_keep
  GROUP BY d.source
)
SELECT k.source, k.n_before,
       CAST(coalesce(kt.n_after, 0) AS BIGINT) AS n_after,
       round(k.p_keep, 9) AS p_keep
FROM keep_p k LEFT JOIN kept kt ON kt.source = k.source
""",
)
def curate_domain_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing by deterministic hash thinning: each source
    keeps documents with probability p = min(1, target_share /
    current_share) (target = uniform), decided by the doc's OWN md5
    uniform draw — no RNG state, no sampling seed to ship, and the same
    doc survives on every engine, every partition layout, and every
    re-run (the growable-sample property sample_hash_bucket demonstrates,
    applied to the curation act itself). Where curate_domain_mix REPORTS
    skew and curate_source_cap clips hard counts, this op executes a
    proportional downsample toward the target mix in one broadcast join +
    map-side filter — at 100 TB the decision is a per-row hash compare,
    nothing shuffles but the tiny per-source rate table. The md5-60bit /
    2^60 uniform divides by a power of two, so the double compare is
    exact in both engines."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    tot = counts.agg(
        F.sum("n_before").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    keep_p = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_before",
        F.least(
            F.lit(1.0),
            (F.col("n") * 1.0 / F.col("n_sources")) / F.col("n_before"),
        ).alias("p_keep"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    kept = (
        d.join(F.broadcast(keep_p), "source")
        .filter(u < F.col("p_keep"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_after"))
    )
    return keep_p.join(kept, "source", "left").select(
        "source",
        "n_before",
        F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
        F.round("p_keep", 9).alias("p_keep"),
    )


@register(
    "curate_kaplan_meier",
    category="curation",
    oracle="""
WITH bounds AS (
  SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 DAY AS cutoff FROM events
),
life AS (
  SELECT user_id,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
           AS t,
         MAX(CAST(ts AS TIMESTAMP)) > (SELECT cutoff FROM bounds) AS censored
  FROM events GROUP BY user_id
),
grid AS (
  SELECT unnest(range(0, (SELECT MAX(t) FROM life) + 1)) AS t
),
tbl AS (
  SELECT g.t,
         (SELECT COUNT(*) FROM life l WHERE l.t >= g.t) AS n_at_risk,
         (SELECT COUNT(*) FROM life l
          WHERE l.t = g.t AND NOT l.censored) AS d_events,
         (SELECT COUNT(*) FROM life l
          WHERE l.t = g.t AND l.censored) AS n_censored
  FROM grid g
)
SELECT CAST(t AS BIGINT) AS t, n_at_risk, d_events, n_censored,
       CAST(d_events AS DOUBLE) / n_at_risk AS hazard
FROM tbl WHERE n_at_risk > 0
""",
)
def curate_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier life table WITH right-censoring — the estimator
    curate_survival_curve's naive retention curve silently gets wrong:
    users whose last event falls inside the final 3 days of the
    observation window are CENSORED (still alive at cutoff), not
    churned, so they contribute to the at-risk denominators up to their
    censoring day but never to the death counts. Output per lifetime
    day: n_at_risk, d_events (uncensored exits), n_censored, and the
    discrete hazard d/n — the (1 - hazard) factors whose running
    product is the KM survival estimate (the product itself is left to
    the consumer: a cumulative double product has no cross-engine
    -deterministic formulation, while every life-table column here is
    exact integers + one scalar division).

    Scale: one pass to per-user lifetimes; the day grid joins the tiny
    lifetime histogram, and at-risk counts come from a reverse
    cumulative sum over the grid — no per-(user, day) blowup.
    """
    e = table(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("cutoff")
    )
    life = (
        e.groupBy("user_id")
        .agg(
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("t"),
            F.max("ts").alias("last_ts"),
        )
        .crossJoin(F.broadcast(cutoff))
        .select(
            "user_id", "t", (F.col("last_ts") > F.col("cutoff")).alias("censored")
        )
    )
    hist = life.groupBy("t").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d_events"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("n_censored"),
    )
    grid = life.agg(F.max("t").alias("tmax")).select(
        F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
    )
    filled = grid.join(hist, "t", "left").select(
        "t",
        F.coalesce(F.col("d_events"), F.lit(0)).cast("long").alias("d_events"),
        F.coalesce(F.col("n_censored"), F.lit(0)).cast("long").alias("n_censored"),
    )
    # n_at_risk(t) = users exiting at any day >= t: reverse running sum
    # over the bounded day grid (observation window, not data volume)
    wrev = W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, W.currentRow)
    tbl = filled.select(
        "t", "d_events", "n_censored",
        F.sum(F.col("d_events") + F.col("n_censored")).over(wrev).alias("n_at_risk"),
    )
    return tbl.filter(F.col("n_at_risk") > 0).select(
        F.col("t").cast("long").alias("t"),
        "n_at_risk",
        "d_events",
        "n_censored",
        (F.col("d_events").cast("double") / F.col("n_at_risk")).alias("hazard"),
    )
