"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.K +
BASELINE.json north-star: language-ID, quality scoring, token counting,
fingerprinting, TF-IDF, n-grams).

All pure built-in DataFrame expressions (no UDFs): tokenization via split,
n-grams via transform(sequence), folds via aggregate — each is a narrow
per-row transform that scales embarrassingly (no shuffle until the final
rollup), which is exactly what a 100 TB document pipeline needs.

Oracle-exactness notes:
- doc-level ratios are plain double arithmetic (IEEE-identical per row);
- TF-IDF rounds idf to 9 decimals FIRST, making tf*idf products exact
  decimals -> decimal sums are exact on both engines;
- the fingerprint fold uses modular arithmetic inside aggregate/list_reduce
  (both fold left-to-right sequentially -> identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

_LANG_MARKERS = {
    "en": ("join", "filter", "scan", "sort"),
    "es": ("hash", "merge", "index", "query"),
    "de": ("window", "group", "order", "limit"),
}


def _toks(col):
    return F.split(F.lower(col), " ")


@register(
    "text_stats",
    category="llm_text",
    oracle="""
WITH d AS (
  SELECT lang,
         length(text) AS n_char,
         len(string_split(lower(text), ' ')) AS n_tok,
         len(list_distinct(string_split(lower(text), ' '))) AS n_uniq
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_char AS DECIMAL(30,0))) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(CAST(n_tok  AS DECIMAL(30,0))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(CAST(CAST(n_uniq AS DOUBLE) / n_tok AS DECIMAL(30,12))) AS DOUBLE)
         / COUNT(*) AS avg_uniq_ratio,
       MIN(n_tok) AS min_tokens,
       MAX(n_tok) AS max_tokens
FROM d GROUP BY lang
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (char/token counts, uniqueness)."""
    d = table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    per_doc = d.select(
        "lang",
        F.length("text").alias("n_char"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    ratio = F.col("n_uniq").cast("double") / F.col("n_tok")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("n_char").cast("decimal(30,0)")).cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum(F.col("n_tok").cast("decimal(30,0)")).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum(ratio.cast("decimal(30,12)")).cast("double") / F.count(F.lit(1))).alias("avg_uniq_ratio"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
    )


@register(
    "text_token_count",
    category="llm_text",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
       length(text) AS n_bytes
FROM documents
WHERE doc_id < 200
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + a BPE-ish regex segmentation
    (letters / digits / single punctuation)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("bpe_ish_tokens"),
        F.length("text").alias("n_bytes"),
    )


@register(
    "text_quality_score",
    category="llm_text",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text,
         length(text) AS n_char,
         string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, n_char,
       len(toks) AS n_tok,
       CAST(n_char AS DOUBLE) / len(toks) AS avg_tok_len,
       CAST(len(list_intersect(list_distinct(toks),
            {list(_STOPWORDS)})) AS DOUBLE) / len(list_distinct(toks)) AS stop_ratio,
       CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE)
         / length(text) AS punct_ratio
FROM d
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, average token length, stopword ratio,
    punctuation density — the standard pre-training corpus filters."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = _toks(F.col("text"))
    uniq = F.array_distinct(toks)
    stop_lits = F.array(*[F.lit(s) for s in _STOPWORDS])
    return d.select(
        "doc_id",
        F.length("text").alias("n_char"),
        F.size(toks).alias("n_tok"),
        (F.length("text").cast("double") / F.size(toks)).alias("avg_tok_len"),
        (
            F.size(F.array_intersect(uniq, stop_lits)).cast("double") / F.size(uniq)
        ).alias("stop_ratio"),
        (
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[^a-z0-9 ]"), 0)).cast("double")
            / F.length("text")
        ).alias("punct_ratio"),
    )


@register(
    "text_lang_id",
    category="llm_text",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS true_lang,
         len(list_intersect(list_distinct(string_split(lower(text),' ')),
             {list(_LANG_MARKERS['en'])})) AS s_en,
         len(list_intersect(list_distinct(string_split(lower(text),' ')),
             {list(_LANG_MARKERS['es'])})) AS s_es,
         len(list_intersect(list_distinct(string_split(lower(text),' ')),
             {list(_LANG_MARKERS['de'])})) AS s_de
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, true_lang, s_en, s_es, s_de,
       CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS pred_lang
FROM scored
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (n-gram-style scoring with a
    deterministic argmax tie-break order en > es > de)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    uniq = F.array_distinct(_toks(F.col("text")))
    scores = {
        lang: F.size(
            F.array_intersect(uniq, F.array(*[F.lit(m) for m in marks]))
        ).alias(f"s_{lang}")
        for lang, marks in _LANG_MARKERS.items()
    }
    scored = d.select("doc_id", F.col("lang").alias("true_lang"), *scores.values())
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")), "en"
        )
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
    )
    return scored.withColumn("pred_lang", pred)


@register(
    "text_fingerprint",
    category="llm_text",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(lower(text), ' '),
                          t -> CAST(length(t) + 7 * ascii(t) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
FROM documents
WHERE doc_id < 300
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint (Rabin-Karp style) over token features.
    aggregate() and list_reduce() both fold left-to-right; modulus keeps the
    accumulator in bigint range under ANSI overflow checking."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = _toks(F.col("text"))
    feats = F.transform(
        toks, lambda t: (F.length(t) + 7 * F.ascii(t)).cast("bigint")
    )
    fp = F.aggregate(
        feats,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_ngrams",
    category="llm_text",
    oracle="""
WITH t AS (
  SELECT string_split(lower(text), ' ') AS toks FROM documents
),
big AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
  FROM t
)
SELECT bigram, COUNT(*) AS n
FROM big
GROUP BY bigram
HAVING COUNT(*) >= 3
""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams with counts (>=3). transform(sequence) builds the n-gram
    windows inline — one narrow pass, then a single count shuffle."""
    # split projected once per row (see llm_dedup._shingles: an inline
    # split re-evaluates per element_at)
    d = table(spark, sf_dir, "documents").select(_toks(F.col("text")).alias("toks"))
    tc = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(tc) - 1),
        lambda i: F.concat(
            F.element_at(tc, i), F.lit(" "), F.element_at(tc, i + 1)
        ),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )


@register(
    "text_tfidf_topterms",
    category="llm_text",
    oracle="""
WITH tf AS (
  SELECT d.lang, d.doc_id, t.term, COUNT(*) AS tf
  FROM (SELECT lang, doc_id, string_split(lower(text),' ') AS toks FROM documents) d,
       UNNEST(d.toks) AS t(term)
  GROUP BY d.lang, d.doc_id, t.term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (
  SELECT term, round(ln((n.n_docs + 1.0) / (df.df + 1.0)), 9) AS idf
  FROM df, n
),
scores AS (
  SELECT tf.lang, tf.term,
         CAST(SUM(CAST(tf.tf * idf.idf AS DECIMAL(30,9))) AS DOUBLE) AS score
  FROM tf JOIN idf USING (term)
  GROUP BY tf.lang, tf.term
)
SELECT lang, term, score, rn
FROM (
  SELECT lang, term, score,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rn
  FROM scores
)
WHERE rn <= 5
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (lang, term), top-5 terms per language — pure DataFrame
    (explode -> two aggregations -> broadcast idf join -> window). idf is
    rounded to 9 decimals before multiplying so tf*idf is an exact decimal:
    the score sums are then bit-identical across engines."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.explode(_toks(F.col("text"))).alias("term"))
    tf = toks.groupBy("lang", "doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    idf = df.select(
        "term",
        F.round(F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 9).alias("idf"),
    )
    scores = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("lang", "term")
        .agg(
            F.sum((F.col("tf") * F.col("idf")).cast("decimal(30,9)"))
            .cast("double")
            .alias("score")
        )
    )
    w = W.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "term", "score", "rn")
    )


# RE2-safe patterns (no lookaround/backrefs) so Spark's Java regex and
# DuckDB's RE2 compile them identically.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "(\\+?[0-9]{1,3}[-. ])?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "text_pii_scrub",
    category="llm_text",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' contact user' || doc_id || '@example.com or 555-867-5309'
                      ELSE '' END AS text
  FROM documents WHERE doc_id < 200
),
scrubbed AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_PII_SSN}', '[SSN]', 'g'),
             '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g') AS clean_text
  FROM seeded
)
SELECT doc_id,
       length(clean_text) AS n_chars,
       length(clean_text) - length(replace(clean_text, '[EMAIL]', ''))
         >= 7 AS had_email,
       length(clean_text) - length(replace(clean_text, '[PHONE]', ''))
         >= 7 AS had_phone
FROM scrubbed
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (the pre-training cleaning step): redact emails,
    phone numbers, and SSN-shaped strings with chained regexp_replace.
    The corpus has no natural PII, so docs with doc_id%5==0 are seeded
    with a synthetic email + phone — making redaction VERIFIABLE (flag
    columns prove seeded docs were scrubbed and others untouched).
    Patterns are RE2-safe so Spark (Java regex) and DuckDB (RE2) agree.

    Scale: stateless per-row projection — fully parallel, codegen'd,
    no shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 555-867-5309"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_SSN, "[SSN]"),
            _PII_EMAIL,
            "[EMAIL]",
        ),
        _PII_PHONE,
        "[PHONE]",
    )
    scrubbed = seeded.select("doc_id", clean.alias("clean_text"))
    return scrubbed.select(
        "doc_id",
        F.length("clean_text").alias("n_chars"),
        (
            F.length("clean_text")
            - F.length(F.replace(F.col("clean_text"), F.lit("[EMAIL]"), F.lit("")))
            >= 7
        ).alias("had_email"),
        (
            F.length("clean_text")
            - F.length(F.replace(F.col("clean_text"), F.lit("[PHONE]"), F.lit("")))
            >= 7
        ).alias("had_phone"),
    )


@register(
    "text_bigram_lm",
    category="llm_text",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
big AS (
  SELECT doc_id,
         string_split(lower(text), ' ')[i] AS w1,
         string_split(lower(text), ' ')[i + 1] AS w2
  FROM documents,
       unnest(range(1, len(string_split(lower(text), ' ')))) AS r(i)
),
uni_c AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
big_c AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
vocab AS (SELECT COUNT(DISTINCT w1) AS v FROM (
            SELECT w1 FROM big UNION ALL SELECT w2 FROM big)),
scored AS (
  SELECT b.doc_id,
         round(ln(CAST(bc.c2 + 1 AS DOUBLE) / (uc.c1 + vocab.v)), 9) AS logp
  FROM big b
  JOIN big_c bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
  JOIN uni_c uc ON b.w1 = uc.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(logp AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*)
         AS avg_logp
FROM scored GROUP BY doc_id
""",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-1 smoothing: train token
    bigram/unigram counts over the corpus, then score every document by
    its mean log-probability — the KenLM-style fluency filter used to
    rank pre-training text (low avg_logp = boilerplate/gibberish).

    Scale shape: counts are two explode+groupBy passes (map-side partial
    combine); scoring joins each doc's bigrams against the model on the
    bigram key. At 100 TB the model tables are the small side (vocab^eps,
    not corpus-sized) -> broadcastable; the corpus side stays a single
    scan. ln() rounded to 9 decimals BEFORE the decimal sum makes the
    per-doc mean order-insensitive and bit-identical on both engines
    (the tfidf discipline).
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    tc = F.col("toks")
    big = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tc) - 1),
                    lambda i: F.struct(
                        F.element_at(tc, i).alias("w1"),
                        F.element_at(tc, i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .localCheckpoint()
    )
    uni_c = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    big_c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    v = (
        big.select(F.col("w1").alias("w"))
        .unionAll(big.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
    )
    logp = F.round(
        F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))), 9
    )
    scored = (
        big.join(F.broadcast(big_c), ["w1", "w2"])
        .join(F.broadcast(uni_c), "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", logp.alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("logp").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_logp"),
    )


@register(
    "text_repetition_score",
    category="llm_text",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id < 300
), tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS trigram
  FROM t
), per_doc AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tri,
         COUNT(DISTINCT trigram) AS n_uniq, MAX(cnt) AS max_rep
  FROM (SELECT doc_id, trigram, COUNT(*) AS cnt FROM tri GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT doc_id, n_tri, n_uniq,
       ROUND(1.0 - n_uniq * 1.0 / n_tri, 9) AS rep_ratio,
       max_rep
FROM per_doc
WHERE n_tri >= 3
""",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scoring — the boilerplate/degenerate-text
    quality signal: fraction of repeated trigrams per doc plus the
    hottest trigram's count. Trigram explode -> (doc, trigram) counts ->
    per-doc rollup: two shuffles, both keyed on doc_id-led keys, both
    with map-side partials; nothing is quadratic in document length.
    The token array is PROJECTED once before the trigram transform
    (inline split expressions re-evaluate per element — measured 10x on
    shingle explodes)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = d.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    tri = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))"
            )
        ).alias("trigram"),
    )
    counts = tri.groupBy("doc_id", "trigram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tri"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("cnt").alias("max_rep"),
    )
    return per_doc.filter(F.col("n_tri") >= 3).select(
        "doc_id",
        "n_tri",
        "n_uniq",
        F.round(1.0 - F.col("n_uniq") * 1.0 / F.col("n_tri"), 9).alias("rep_ratio"),
        "max_rep",
    )


@register(
    "text_chunk_sliding",
    category="llm_text",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id < 400
), c AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) > 32 THEN (len(toks) - 32 + 15) // 16 + 1
              ELSE 1 END AS nc
  FROM d
)
SELECT doc_id, t.i AS chunk_id,
       array_to_string(toks[t.i*16+1 : t.i*16+32], ' ') AS chunk_text,
       len(toks[t.i*16+1 : t.i*16+32]) AS n_tok
FROM c, UNNEST(range(0, c.nc)) AS t(i)
""",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    32-token chunks with stride 16 (the standard pretraining/RAG windowing
    step). Everything is narrow, per-row array arithmetic — split once,
    sequence() over the chunk count, explode, slice — so the operator is
    embarrassingly parallel with NO shuffle at any scale; output rows ∝
    input tokens / stride. The last chunk is allowed short (slice clamps
    identically in both engines); chunk count = ceil((n-32)/16)+1 in exact
    integer arithmetic."""
    C, S = 32, 16
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", _toks(F.col("text")).alias("toks"))
    )
    nc = F.expr(
        f"CASE WHEN size(toks) > {C} THEN (size(toks) - {C} + {S - 1}) DIV {S} + 1 "
        "ELSE 1 END"
    )
    e = d.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_id")
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * S + 1, C)
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tok"),
    )


@register(
    "text_heavy_hitters",
    category="llm_text",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS total FROM tok)
SELECT token, COUNT(*) AS n, (SELECT total FROM tot) AS total
FROM tok GROUP BY token
HAVING COUNT(*) >= (SELECT total FROM tot) / 256.0
""",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter tokens (frequency >= 1/256 of the stream) via
    the scalable two-pass pattern: pass 1 runs Misra–Gries with K=256
    counters per partition inside mapInPandas — NO shuffle, O(K) state —
    and the union of per-partition summaries is a guaranteed superset of
    every global heavy hitter (pigeonhole: a token with global share
    >= 1/256 has share > 1/(K+1) in some partition). Pass 2 broadcasts
    the candidate set, semi-joins BEFORE the count shuffle, and applies
    the exact threshold — so the shuffle carries only candidate tokens,
    not the full vocabulary. At 100 TB with a billion-key vocabulary the
    exact one-pass groupBy shuffles everything; this shuffles K x
    n_partitions candidates. Final output is exact and deterministic
    regardless of partitioning (extra candidates die at the HAVING)."""
    d = table(spark, sf_dir, "documents").select(_toks(F.col("text")).alias("toks"))
    K = 256

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["toks"]:
                for t in toks:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < K:
                        counters[t] = 1
                    else:
                        for k2 in list(counters):
                            counters[k2] -= 1
                            if counters[k2] == 0:
                                del counters[k2]
        yield pd.DataFrame({"token": list(counters.keys())})

    cands = d.mapInPandas(mg, "token string").distinct()
    toks = d.select(F.explode("toks").alias("token"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    counts = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.col("total") / F.lit(256.0))
        .select("token", "n", "total")
    )


@register(
    "text_tokenizer_fertility",
    category="llm_text",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_tokens,
       SUM(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9 ]'))) * 1.0
         / SUM(len(string_split(text, ' '))) AS fertility
FROM documents
GROUP BY lang
""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens emitted per whitespace
    word under the BPE-ish regex segmentation — the metric multilingual
    pipelines track because a high-fertility language pays more
    compute/context per word (and signals the tokenizer under-serves it).
    The ratio is an IEEE division of two exact integer sums, so the
    per-language report hash-matches. One explode-free pass (sizes of
    split/extract arrays), one shuffle on the tiny lang key."""
    d = table(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " "))
    toks = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
        )
    )
    return (
        d.select("lang", words.alias("w"), toks.alias("t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("t").alias("n_tokens"),
            (F.sum("t") * 1.0 / F.sum("w")).alias("fertility"),
        )
    )


@register(
    "text_oov_rate",
    category="llm_text",
    oracle="""
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
    FROM toks GROUP BY tok
  ) WHERE rn <= 1000
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 9) AS oov_rate
FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.source
""",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage per source: the share of token occurrences
    falling outside the corpus's top-1000 vocabulary (frequency-ranked,
    token-string tiebreak so the cut is deterministic) — the OOV metric
    that decides whether a tokenizer/vocab under-serves a source before
    training on it. Two passes over the exploded tokens: a token-count
    rollup to build the (tiny, bounded) vocab, then a BROADCAST left
    join tagging membership with a per-source rollup — the corpus never
    shuffles on the token key for the tagging pass. The rate is an IEEE
    division of exact counts."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    # top-1000 vocab cut via orderBy().limit() — TakeOrderedAndProject
    # (distributed per-partition heaps) instead of a partitionless
    # row_number window that would sort the WHOLE vocabulary through one
    # task; membership tagging needs no rank column at all
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                9,
            ).alias("oov_rate"),
        )
    )


_RAKE_STOPS = "the|a|of|and|in|to|is|for|on|with"


@register(
    "text_rake_keywords",
    category="llm_text",
    oracle=f"""
WITH ph AS (
  SELECT doc_id, trim(p) AS phrase
  FROM (SELECT doc_id,
               unnest(string_split(
                 regexp_replace(lower(text),
                                '\\b({_RAKE_STOPS})\\b', '|', 'g'),
                 '|')) AS p
        FROM documents)
  WHERE trim(p) <> ''
),
pw AS (
  SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS w,
         len(string_split(phrase, ' ')) AS plen
  FROM ph
),
ws AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM pw GROUP BY doc_id, w
),
dpw AS (
  SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS w
  FROM (SELECT DISTINCT doc_id, phrase FROM ph)
),
scored AS (
  SELECT d.doc_id, d.phrase,
         CAST(SUM(CAST(FLOOR((s.deg * 1000000000) / s.freq) AS BIGINT))
              AS DOUBLE) / 1000000000 AS rake_score
  FROM dpw d JOIN ws s ON s.doc_id = d.doc_id AND s.w = d.w
  GROUP BY d.doc_id, d.phrase
)
SELECT doc_id, phrase, rake_score, rn
FROM (SELECT doc_id, phrase, rake_score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY rake_score DESC, phrase) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are the
    maximal token runs between stopwords, each word scores
    degree/frequency within its document (degree = summed length of the
    phrases it appears in — words that ride in long phrases rank above
    merely frequent ones), and a phrase scores the sum of its member
    word scores; top-3 phrases per document. Word scores live on an
    exact 1e-9 integer grid (floor of deg*1e9/freq — denominators are
    small so the double division sits >=1/freq away from any integer
    boundary, making the floor engine-identical), so the phrase sum is
    a LONG sum and no double is ever rounded.

    Scale shape: phrase splitting is a narrow regexp pass; the two
    aggregations key on (doc_id, word) and (doc_id, phrase) — both
    partition-local once documents are the partitioning unit, which
    a repartition(doc_id) before the explodes guarantees at cluster
    scale. No corpus-wide state at all (RAKE is per-document), so the
    operator is embarrassingly parallel over documents."""
    d = table(spark, sf_dir, "documents")
    ph = (
        d.select(
            "doc_id",
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.lower(F.col("text")),
                        f"\\b({_RAKE_STOPS})\\b",
                        "|",
                    ),
                    "\\|",
                )
            ).alias("p"),
        )
        .select("doc_id", F.trim(F.col("p")).alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    toks = F.split(F.col("phrase"), " ")
    pw = ph.select(
        "doc_id",
        "phrase",
        F.explode(toks).alias("w"),
        F.size(toks).cast("long").alias("plen"),
    )
    ws = pw.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    dpw = ph.distinct().select(
        "doc_id", "phrase", F.explode(toks).alias("w")
    )
    score_grid = F.floor(
        (F.col("deg") * 1000000000) / F.col("freq")
    ).cast("long")
    scored = (
        dpw.join(ws, ["doc_id", "w"])
        .groupBy("doc_id", "phrase")
        .agg(
            (F.sum(score_grid).cast("double") / 1000000000).alias(
                "rake_score"
            )
        )
    )
    wtop = W.partitionBy("doc_id").orderBy(
        F.desc("rake_score"), F.asc("phrase")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "phrase", "rake_score", "rn")
    )


_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "sim_bm25_topk",
    category="llm_text",
    oracle=f"""
WITH terms AS (SELECT unnest(['join', 'hash']) AS term),
docs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM docs
),
tf AS (
  SELECT d.doc_id, t.term, d.dl,
         CAST(len(list_filter(d.toks, x -> x = t.term)) AS BIGINT) AS tf
  FROM docs d, terms t
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf WHERE tf > 0 GROUP BY term
),
scored_terms AS (
  SELECT f.doc_id, f.term,
         round(
           round(ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1), 9)
           * (f.tf * ({_BM25_K1} + 1))
             / (f.tf + {_BM25_K1}
                * (1 - {_BM25_B}
                   + {_BM25_B} * f.dl
                     / (CAST(s.total_len AS DOUBLE) / s.n_docs))),
           9) AS term_score
  FROM tf f JOIN df d ON d.term = f.term, stats s
  WHERE f.tf > 0
),
scores AS (
  SELECT doc_id,
         CAST(SUM(CAST(term_score AS DECIMAL(30,9))) AS DOUBLE) AS bm25
  FROM scored_terms GROUP BY doc_id
)
SELECT doc_id, bm25, rn
FROM (SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
      FROM scores)
WHERE rn <= 10
""",
)
def sim_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1={_BM25_K1}, b={_BM25_B}), top-10 docs
    for the query terms ('join', 'hash') — the ranking function behind
    every serious lexical search stack, completing the retrieval
    ladder: TF-IDF (feature weights) -> BM25 (query-time ranking) ->
    hybrid RRF (fusion with the dense side). Saturation (k1) caps
    repeated-term credit and length normalization (b) stops long docs
    winning on bulk — the two behaviors plain TF-IDF lacks. idf is
    rounded to the 9-decimal grid, each doc-term score rounded once
    more before the exact decimal sum (the tfidf discipline), so the
    ranking hash-matches.

    Scale shape: corpus stats (N, avgdl) are a 1-row broadcast; term
    frequencies come from one narrow pass over documents (the terms
    table is the broadcast side of the explode-free list_filter);
    at 100 TB the tf pass reads an inverted index instead of raw text,
    same shape."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    docs = d.select(
        "doc_id", "toks", F.size("toks").cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    terms = spark.createDataFrame(
        [("join",), ("hash",)], ["term"]
    )
    tf = docs.crossJoin(F.broadcast(terms)).select(
        "doc_id",
        "term",
        "dl",
        F.size(
            F.filter(F.col("toks"), lambda x: x == F.col("term"))
        )
        .cast("long")
        .alias("tf"),
    )
    df_ = (
        tf.filter(F.col("tf") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1
        ),
        9,
    )
    frac = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
    )
    scored_terms = (
        tf.filter(F.col("tf") > 0)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", F.round(idf * frac, 9).alias("term_score")
        )
    )
    scores = scored_terms.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(30,9)"))
        .cast("double")
        .alias("bm25")
    )
    # top-10 via orderBy().limit() -> TakeOrderedAndProject (distributed
    # per-partition heaps); the rank window then runs over the 10-row
    # pool only — a partitionless window over ALL scored docs would
    # funnel the corpus through one task (same pattern as sim_hybrid_rrf)
    wtop = W.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scores.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
        .withColumn("rn", F.row_number().over(wtop))
        .select("doc_id", "bm25", "rn")
    )


@register(
    "text_zipf_fit",
    category="llm_text",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
),
freq AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY t
),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, t) AS rank
  FROM freq
),
pts AS (
  SELECT round(ln(rank), 9) AS x, round(ln(f), 9) AS y
  FROM ranked WHERE rank <= 50
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(30,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(30,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x*y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(x*x, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(y*y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS syy
  FROM pts
)
SELECT n AS n_tokens,
       round((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS zipf_slope,
       round((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n, 6) AS intercept,
       round(pow(n*sxy - sx*sy, 2)
             / ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
FROM sums
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of log-frequency
    on log-rank for the top-50 tokens gives the Zipf exponent (natural
    text sits near -1; a flat slope flags templated/synthetic text, a
    cliff flags boilerplate domination) plus R^2 for how law-like the
    distribution is — the corpus-level health check next to
    curate_token_histogram's raw counts. Logs round to the 9-decimal
    grid before exact decimal sums (the regression discipline), ranks
    tie-break by token, so the fit hash-matches.

    Scale shape: one explode+groupBy for frequencies (map-combined),
    a top-50 window, then a 50-row closed form."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # top-50 via orderBy().limit() -> TakeOrderedAndProject; the rank
    # window runs over the 50-row pool only (a partitionless window over
    # the full vocabulary would sort it through one task)
    ranked = (
        freq.orderBy(F.desc("f"), F.asc("t"))
        .limit(50)
        .select(
            "f",
            F.row_number()
            .over(W.orderBy(F.desc("f"), F.asc("t")))
            .alias("rank"),
        )
    )
    pts = ranked.select(
        F.round(F.log("rank"), 9).alias("x"),
        F.round(F.log("f"), 9).alias("y"),
    )

    def dsum9(c):
        return F.sum(c.cast("decimal(30,9)")).cast("double")

    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        dsum9(F.col("x")).alias("sx"),
        dsum9(F.col("y")).alias("sy"),
        dsum9(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
        dsum9(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
        dsum9(F.round(F.col("y") * F.col("y"), 9)).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        n.cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "text_novelty_rate",
    category="llm_text",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> concat(string_split(lower(text), ' ')[i], ' ',
                       string_split(lower(text), ' ')[i+1], ' ',
                       string_split(lower(text), ' ')[i+2])))) AS shingle
  FROM documents
),
first_seen AS (
  SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS first_doc
  FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 9) AS novelty_rate
FROM sh s JOIN first_seen f ON f.shingle = s.shingle
GROUP BY s.doc_id
""",
)
def text_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-gram
    shingles whose FIRST appearance in the corpus (by doc_id order) is
    this doc — the marginal-information curve behind "is more data
    from this source still teaching the model anything": novelty
    falling toward zero across a source's ingestion order is the
    empirical case for dedup/capping, measured at n-gram granularity
    rather than whole-doc (a doc can be 30% novel — whole-doc dedup is
    blind to that). First-appearance attribution is an exact MIN per
    shingle; rates are one division over integer counts.

    Scale shape: the shingle explode + two keyed aggregations — the
    inverted-index shape every dedup operator here already pays; at
    100 TB first_seen is the incremental state dedup_incremental_batch
    keeps between batches."""
    d = table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    # Short-doc guard (same as llm_dedup._shingles): a <3-token doc would
    # make sequence(1, 0) descend and element_at(t, 0) raise under ANSI;
    # the oracle's range(1, len-1) is empty for those docs, so filtering
    # them out keeps both sides aligned.
    sh = d.filter(F.size(t) >= 3).select(
        "doc_id",
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
    ).localCheckpoint()
    first_seen = sh.groupBy("shingle").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
            F.round(
                F.sum(
                    F.when(
                        F.col("first_doc") == F.col("doc_id"), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                9,
            ).alias("novelty_rate"),
        )
    )


@register(
    "text_vocab_richness",
    category="llm_text",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, t
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(COUNT(*) * 1.0 / SUM(c), 9) AS type_token_ratio,
       round(1.0 - CAST(SUM(c*(c-1)) AS DOUBLE)
             / (SUM(c) * (SUM(c) - 1)), 9) AS simpson_diversity
FROM counts
GROUP BY source
""",
)
def text_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per source: token count, vocabulary size,
    hapax legomena (once-only words — a live vocabulary keeps minting
    them; their absence flags templated text), type-token ratio, and
    the unbiased Simpson diversity 1 - sum(c(c-1))/(N(N-1)) — the
    probability two random tokens differ. The corpus-linguistics
    health panel next to text_zipf_fit's law fit, all from one
    (source, token) count: every statistic is integer sums and one
    division, so it hash-matches without any rounding discipline
    beyond the edge.

    Scale shape: one map-combined (source, token) count; the panel
    aggregates |vocab| rows per source."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("c"), 9).alias(
            "type_token_ratio"
        ),
        F.round(
            1.0
            - F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
            / (F.sum("c") * (F.sum("c") - 1)),
            9,
        ).alias("simpson_diversity"),
    )


@register(
    "text_bigram_lm_score",
    category="llm_text",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents
),
bg AS (
  SELECT doc_id, u.b['w1'] AS w1, u.b['w2'] AS w2
  FROM t, UNNEST([{'w1': s[i], 'w2': s[i + 1]} for i in range(1, len(s))]) AS u(b)
  WHERE len(s) >= 2
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
v AS (SELECT COUNT(DISTINCT u.tok) AS vsize
      FROM t, UNNEST(s) AS u(tok)),
scored AS (
  SELECT bg.doc_id,
         CAST(FLOOR(ln((c12.c12 + 1.0) / (c1.c1 + v.vsize)) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000 AS avg_logprob
FROM scored GROUP BY doc_id
""",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality scoring (the CCNet/Gopher filtering idea): train
    a bigram language model on the corpus itself — c(w1,w2), history
    counts c(w1), vocabulary V — and score every document by its mean
    add-1-smoothed bigram log-probability. Low scorers are boilerplate /
    gibberish relative to the corpus distribution; this is the
    model-based quality axis the rule-based scores (text_quality_score,
    gopher rules) cannot see.

    Exactness discipline: each bigram's log-prob is QUANTIZED map-side
    to the 1e-6 grid (floor half-up -> LONG) before the per-doc sum, so
    the aggregation is order-insensitive exact integer math and a
    cross-libm last-ulp wobble in ln() cannot surface (it would need to
    move the value across a grid midpoint, ~1e-10 odds per term). The
    two count joins are the inverted-index shape: c12/c1 are broadcast-
    size at any corpus (vocabulary-bounded), the bigram stream shuffles
    once per join key. V rides along as a broadcast scalar row."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    t = d.select("doc_id", toks.alias("s")).filter(F.size(toks) >= 2)
    sc = F.col("s")
    bg = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(sc) - 1),
                lambda i: F.struct(
                    F.element_at(sc, i).alias("w1"),
                    F.element_at(sc, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vdf = (
        d.select(F.explode(toks).alias("tok"))
        .agg(F.count_distinct("tok").alias("vsize"))
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vdf))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vsize")))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("q").cast("double") / F.count(F.lit(1)) / 1000000).alias(
            "avg_logprob"
        ),
    )


def _cms_sql_bucket(j: int, expr: str) -> str:
    return (
        f"('0x' || substr(md5(concat('{j}:', {expr})), 1, 15))::BIGINT % 16"
    )


@register(
    "text_cms_heavy_hitters",
    category="llm_text",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS total FROM tok),
cells AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cell
  FROM (
    SELECT token, j,
           CASE j WHEN 0 THEN {_cms_sql_bucket(0, "token")}
                  WHEN 1 THEN {_cms_sql_bucket(1, "token")}
                  WHEN 2 THEN {_cms_sql_bucket(2, "token")}
                  ELSE {_cms_sql_bucket(3, "token")} END AS bucket
    FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(j)
  ) GROUP BY j, bucket
),
heavy AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM tok GROUP BY token
  HAVING COUNT(*) >= (SELECT total FROM tot) / 256.0
),
est AS (
  SELECT h.token, h.exact_n, MIN(c.cell) AS cms_est
  FROM heavy h
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(j)
  JOIN cells c
    ON c.j = d.j
   AND c.bucket = CASE d.j WHEN 0 THEN {_cms_sql_bucket(0, "h.token")}
                           WHEN 1 THEN {_cms_sql_bucket(1, "h.token")}
                           WHEN 2 THEN {_cms_sql_bucket(2, "h.token")}
                           ELSE {_cms_sql_bucket(3, "h.token")} END
  GROUP BY h.token, h.exact_n
)
SELECT token, exact_n, cms_est,
       CAST(cms_est - exact_n AS BIGINT) AS overestimate
FROM est
""",
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows x w=16 buckets) with its error measured
    against exact counts — the streaming-sketch completion of the sketch
    family (HLL distinct, Theta set algebra, equi-depth histograms).
    w=16 is sized to the fixtures' 31-token vocabulary so bucket
    collisions — the error CMS trades for fixed memory — actually occur
    and the overestimate column is non-trivial; production would size
    w ~ e/eps (e.g. 2^20 cells for eps ~ 2.7e-6 of stream mass).

    Sketch build: each token occurrence maps to one bucket per row via the
    cross-engine md5 family; the whole sketch is the groupBy(j, bucket)
    count — at most d*w = 64 cells regardless of stream size, reached by
    a map-side-combining shuffle of at most d*w partials per task (THE
    point of CMS at 100 TB: fixed memory, one pass, mergeable across
    executors/days by cell-wise addition). Query: heavy tokens (exact
    share >= 1/256, computed as the verification twin) re-derive their d
    bucket coordinates and broadcast-join the tiny sketch; the estimate
    is the min over rows. CMS guarantees cms_est >= exact_n (every
    oracle-matched row re-proves it) and the reported overestimate
    column shows the collision error at w=16 directly."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_toks(F.col("text"))).alias("token"))
    )

    def bucket(j: int, col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 15),
                16,
                10,
            ).cast("long")
            % 16
        )

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            bucket(j, F.col("token")).alias("bucket"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("jb")
        )
        .select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )
    total = toks.count()  # O(1) scalar: the heavy-hitter threshold
    heavy = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .filter(F.col("exact_n") >= total / 256.0)
    )
    probes = heavy.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("token")).alias("bucket"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("jb"),
    ).select("token", "exact_n", "jb.j", "jb.bucket")
    est = (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias(
            "overestimate"
        ),
    )


@register(
    "text_kwic_concordance",
    category="llm_text",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
hits AS (
  SELECT doc_id, i AS pos, len(t) AS n_toks, t
  FROM tok, LATERAL unnest(range(1, len(t) + 1)) AS r(i)
  WHERE t[i] = 'join'
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       coalesce(array_to_string(t[greatest(pos - 2, 1):pos - 1], ' '), '')
         AS left_ctx,
       coalesce(array_to_string(t[pos + 1:least(pos + 2, n_toks)], ' '), '')
         AS right_ctx
FROM hits
""",
)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance for a target token ('join'): every
    occurrence with its 2-token left/right context — the corpus-inspection
    view linguists and data-curation debuggers pull when deciding whether
    a filter term is safe ("is 'join' a SQL keyword or a verb here?").
    Pure per-row array work: split once, posexplode, slice the SAME array
    for context — zero shuffle, zero self-join (the naive formulation
    joins tokens to tokens on (doc, pos +- k): a shuffle of the whole
    corpus per context side). 1-based positions keep the slicing identical
    to the SQL twin's list indexing."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    hit = d.select(
        "doc_id",
        F.size("t").alias("n_toks"),
        "t",
        F.posexplode("t").alias("pos0", "tok"),
    ).filter(F.col("tok") == "join")
    p = F.col("pos0") + 1  # 1-based
    lo = F.greatest(p - 2, F.lit(1))
    return hit.select(
        "doc_id",
        p.cast("long").alias("pos"),
        F.concat_ws(" ", F.slice("t", lo, p - lo)).alias("left_ctx"),
        F.concat_ws(
            " ",
            F.slice("t", p + 1, F.least(p + 2, F.col("n_toks")) - p),
        ).alias("right_ctx"),
    )


def _bpe_merge_cte(i: int) -> str:
    return f"""
p{i} AS (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w{i-1}, LATERAL unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT word, freq,
         list_reduce(
           list_prepend([CAST('' AS VARCHAR)], list_transform(syms, c -> [c])),
           (acc, e) -> CASE
              WHEN acc[-1] = b.l AND e[1] = b.r
                THEN acc[1:len(acc)-1] || [acc[-1] || e[1]]
              ELSE acc || e END
         )[2:] AS syms
  FROM w{i-1}, b{i} AS b
)"""


@register(
    "text_bpe_train",
    category="llm_text",
    oracle=f"""
WITH words AS (
  SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
  GROUP BY t
),
w0 AS (SELECT word, freq, split(word, '') AS syms FROM words),
{_bpe_merge_cte(1)},
{_bpe_merge_cte(2)},
{_bpe_merge_cte(3)}
SELECT 1 AS step, b1.l, b1.r, b1.cnt AS pair_count,
       (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM w1)
         AS corpus_symbols
FROM b1
UNION ALL
SELECT 2, b2.l, b2.r, b2.cnt,
       (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM w2) FROM b2
UNION ALL
SELECT 3, b3.l, b3.r, b3.cnt,
       (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM w3) FROM b3
""",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge training, 3 iterations — the tokenizer-
    training primitive, run exactly the way HF tokenizers do it at scale:
    on the WORD-FREQUENCY table, not the raw corpus (the corpus collapses
    to |vocab| rows once, then every merge iteration is O(vocab), not
    O(corpus)). Per iteration: (1) adjacent-pair counts — zip_with the
    symbol list against its own tail, explode, one map-side-combined
    groupBy; (2) argmax pair with (count DESC, pair ASC) tiebreak — an
    O(1) driver scalar, the same documented fixpoint-control pattern as
    kmeans/pagerank; (3) apply the merge with a LEFT-TO-RIGHT
    NON-OVERLAPPING fold over each symbol list (array-accumulator
    aggregate(); a string replace would eat shared boundary characters
    and over-merge 'a a b' on pair (a,b)). The oracle unrolls the same
    three iterations with DuckDB's list_reduce (list-valued accumulator,
    '' sentinel) — merge choices, pair counts, AND the shrinking corpus
    symbol totals all hash-match."""
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_toks(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select("word", "freq", F.split(F.col("word"), "").alias("syms"))
        # materialize the word table ONCE: every iteration runs 3 actions
        # (pair count, argmax, symbol total) and without the cut each one
        # would re-run the corpus explode+groupBy
        .localCheckpoint()
    )
    rows = []
    cur = words
    for step in (1, 2, 3):
        pairs = (
            cur.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()[0]  # O(1) driver scalar: the argmax pair
        l, r = best["l"], best["r"]
        merged = cur.select(
            "word",
            "freq",
            F.slice(
                F.aggregate(
                    F.col("syms"),
                    F.array(F.lit("")),
                    lambda acc, x: F.when(
                        (F.element_at(acc, -1) == l) & (x == F.lit(r)),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.concat(F.element_at(acc, -1), x)),
                        ),
                    ).otherwise(F.concat(acc, F.array(x))),
                ),
                2,
                1_000_000,
            ).alias("syms"),
        ).localCheckpoint()  # cut lineage: next iteration re-reads rows, not the fold chain
        n_syms = merged.agg(
            F.sum(F.col("freq") * F.size("syms")).cast("long")
        ).collect()[0][0]
        rows.append((step, l, r, int(best["cnt"]), int(n_syms)))
        cur = merged
    return spark.createDataFrame(
        rows, "step int, l string, r string, pair_count long, corpus_symbols long"
    )
