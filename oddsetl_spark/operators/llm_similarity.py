"""Similarity search + multimodal-column operators (SURVEY.md §2.K).

Embeddings are FLOAT[64], L2-normalized (FIXTURES.md) => cosine == dot.

Oracle-exactness: dot products / squared distances are computed as
LEFT-TO-RIGHT FOLDS on both engines (Spark aggregate() over zip_with,
DuckDB list_reduce over list_zip) after exact float->double widening, so
the doubles are bit-identical — no rounding, no tolerance.

Scale design:
- brute-force top-k broadcasts the (small) query set and never shuffles
  the corpus: per-partition partial top-k via window over a repartitioned
  key would be the 1000-executor layout; at 100 TB switch to the bucketed
  sim_lsh_approx path (candidates only within a hyperplane bucket);
- centroid ops are (label,pos)-keyed aggregations — one shuffle of
  64 rows per vector, mergeable partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register

# DuckDB twin of the fold-based dot product (bit-identical to Spark's
# aggregate over zip_with).
# Exactness: every aggregation over raw embedding floats (centroid means,
# centroid distances) rides the FLOOR(x*1e12 + 0.5) scaled-long grid —
# floor of identical IEEE doubles is bit-identical on both engines, so no
# rounding-mode dependence exists anywhere in this module (a decimal CAST
# would round HALF_UP on Spark vs half-even on DuckDB at exact dyadic
# ties; embeddings, unlike the fixture's 2-decimal money columns, have
# 17-digit dyadic expansions where such ties are reachable). Helpers
# _lmean/_SQL_LMEAN below; distances inline the same grid.
# Overflow bound: |val| < 1 for the fixture embeddings, so a grid-scaled
# per-group sum caps at ~group_size * 1e12 — fine to ~10^6-row groups;
# ANSI mode (pinned in session.py) makes any larger group fail loud with
# ARITHMETIC_OVERFLOW, and the swap at that scale is the two-phase
# scaled_group_sums shape from _helpers.py.

_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
    "(acc, x) -> acc + x)"
)
_SQL_SQDIST = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
    "(acc, x) -> acc + x)"
)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l12(col):
    """Per-row exact 1e12-grid value as LONG — FLOOR(x*1e12 + 0.5) is
    bit-identical across engines on identical doubles (no decimal
    rounding-mode dependence), and long sums run in whole-stage codegen
    (decimal agg buffers don't — the r6 sim_ann_ivf lesson)."""
    return F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("long")


def _lmean(col, n=None):
    """Order-insensitive exact mean of a raw-float column on the 1e12
    grid, as double: long sum -> double, /1e12, /count — the same
    expression shape as the _SQL_LMEAN twin, so the result is
    bit-identical on both engines."""
    n = F.count(F.lit(1)) if n is None else F.lit(float(n))
    return F.sum(_l12(col)).cast("double") / F.lit(1e12) / n


def _sql_lmean(expr: str, n: str = "COUNT(*)") -> str:
    """DuckDB twin of _lmean."""
    return (
        f"CAST(SUM(CAST(FLOOR({expr} * 1000000000000 + 0.5) AS BIGINT)) "
        f"AS DOUBLE) / 1000000000000 / {n}"
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with exact float->double widening."""
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


@register(
    "sim_cosine_topk",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_SQL_DOT.format(a='q.q_emb', b='e.emb')} AS cosine
  FROM q JOIN e ON e.vec_id <> q.q_id
)
SELECT q_id, vec_id, cosine, rn
FROM (SELECT q_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 10
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for a query set: broadcast queries, one
    scan of the corpus, per-query window rank. The baseline ANN oracle."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _dot(F.col("q_emb"), F.col("emb")).alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cosine", "rn")
    )


@register(
    "sim_knn_join",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
a AS (SELECT vec_id AS a_id, emb AS a_emb FROM e WHERE vec_id < 50),
scored AS (
  SELECT a.a_id, e.vec_id AS b_id,
         {_SQL_DOT.format(a='a.a_emb', b='e.emb')} AS cosine
  FROM a JOIN e ON e.vec_id <> a.a_id
)
SELECT a_id, b_id, cosine, rn
FROM (SELECT a_id, b_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY a_id
                                ORDER BY cosine DESC, b_id) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join (k=5) A->corpus. Same broadcast + window shape; at 100 TB
    the A side partitions and each partition scans its broadcast block."""
    e = _emb(spark, sf_dir)
    a = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb")
    )
    scored = e.join(F.broadcast(a), F.col("vec_id") != F.col("a_id")).select(
        "a_id",
        F.col("vec_id").alias("b_id"),
        _dot(F.col("a_emb"), F.col("emb")).alias("cosine"),
    )
    w = W.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("b_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("a_id", "b_id", "cosine", "rn")
    )


_LSH_TABLES = 8
# Density-adaptive AND-amplification: planes per table p is the smallest
# value with expected bucket occupancy n / 2^p <= _LSH_TARGET_BUCKET,
# clamped to [MIN, MAX]. A FIXED p makes bucket occupancy grow O(n/2^p)
# and the within-bucket self-join quadratic in bucket size at corpus
# scale; the ladder keeps per-bucket work ~target^2 and total candidate
# volume ~n*target — linear in n. The ladder is integer threshold
# compares (no float log2 at power-of-two boundaries) and is replayed
# VERBATIM by the SQL oracle from the same COUNT(*). At a real 100 TB
# corpus, raise MAX (and tables, to hold recall) — or re-hash oversized
# buckets — rather than letting the clamp reintroduce the quadratic.
# r8: the residual above-uniform concentration this draw suffers (the
# sin planes are nearly collinear within a table, so raising p has
# diminishing returns) is SOLVED by sim_lsh_whitened below — whitened +
# per-table QR-orthonormalized planes measure exactly 1.00x uniform
# occupancy; this fixed draw is retained as the full-SQL-oracle default.
_LSH_MIN_PLANES, _LSH_MAX_PLANES, _LSH_TARGET_BUCKET = 3, 8, 64


def _lsh_planes_for(n: int, cap: int = _LSH_MAX_PLANES) -> int:
    p = _LSH_MIN_PLANES
    while p < cap and n > (_LSH_TARGET_BUCKET << p):
        p += 1
    return p


def _lsh_plane(t: int, j: int) -> list[float]:
    """Hyperplane weights sin((t*MAX_PLANES+j)*131 + d*17), computed ONCE
    in Python and embedded as identical double literals in BOTH the Spark
    plan and the DuckDB oracle — no cross-libm sin() divergence can
    change a bucket sign. Seeded by MAX_PLANES so the plane draw for
    (t, j) is stable regardless of the adaptive planes-per-table count."""
    import math

    return [
        math.sin(float((t * _LSH_MAX_PLANES + j) * 131 + d * 17))
        for d in range(64)
    ]


# Whitened-path plane cap (r9): with per-table QR-orthonormalized planes
# every extra bit is independent, so raising p past the fixed draw's
# clamp finally shrinks buckets instead of wasting redundant planes (the
# r8 probe showed K=20 candidate volume doubling purely as n/2^8 — the
# clamp, not the rotation, was the only residual growth). Rungs extend
# to p=12: expected occupancy n/2^p stays <= TARGET up to n ~ 262k, and
# past that the documented 100 TB move is more tables / re-hash, same as
# the fixed draw. The fixed-draw cap stays 8 — its near-collinear sin
# planes make p>8 useless there, and its full-SQL oracle replays the
# 8-plane ladder verbatim.
_LSH_MAX_PLANES_WHITENED = 12


def _lsh_plane_w(t: int, j: int) -> list[float]:
    """Whitened-path raw plane draw — stride 16 >= MAX_PLANES_WHITENED
    keeps the (t, j) sin seeds distinct across tables up to p=12 (the
    fixed draw's stride of 8 would alias table t's plane 8+ onto table
    t+1's plane 0, making adjacent tables share bits). Raw collinearity
    doesn't matter here: the per-table QR orthonormalizes whatever it
    gets, the draw only needs to be deterministic and full-rank."""
    import math

    return [
        math.sin(float((t * 16 + j) * 131 + d * 17)) for d in range(64)
    ]


def _lsh_planes_sql_case() -> str:
    """The planes ladder as a SQL CASE over COUNT(*) — same integer
    thresholds as _lsh_planes_for."""
    whens = "\n    ".join(
        f"WHEN n <= {_LSH_TARGET_BUCKET << p} THEN {p}"
        for p in range(_LSH_MIN_PLANES, _LSH_MAX_PLANES)
    )
    return f"CASE {whens}\n    ELSE {_LSH_MAX_PLANES} END"


def _lsh_oracle() -> str:
    """Full SQL replay of sim_lsh_approx: same plane literals, same
    density ladder (np.p from COUNT(*)), same bucket arithmetic with
    planes j >= p masked out, same candidate join, same sequential-fold
    dot product (_SQL_DOT) in the refine — every stage is deterministic
    IEEE double arithmetic shared verbatim across engines."""
    plane_rows = ",\n".join(
        "({t}, {p})".format(
            t=t,
            p=", ".join(
                "["
                + ", ".join(repr(w) for w in _lsh_plane(t, j))
                + "]::DOUBLE[]"
                for j in range(_LSH_MAX_PLANES)
            ),
        )
        for t in range(_LSH_TABLES)
    )
    bucket = " + ".join(
        f"(CASE WHEN {j} < np.p AND {_SQL_DOT.format(a='e.emb', b=f'p.p{j}')} > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(_LSH_MAX_PLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
np AS (
  SELECT {_lsh_planes_sql_case()} AS p
  FROM (SELECT COUNT(*) AS n FROM e)
),
p(table_id, {', '.join(f'p{j}' for j in range(_LSH_MAX_PLANES))}) AS (VALUES
{plane_rows}),
b AS (
  SELECT e.vec_id, p.table_id, {bucket} AS bucket
  FROM e CROSS JOIN p CROSS JOIN np
),
cand AS (
  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
  FROM b x JOIN b y
    ON x.table_id = y.table_id AND x.bucket = y.bucket
   AND x.vec_id < y.vec_id
)
SELECT c.a_id, c.b_id,
       {_SQL_DOT.format(a='ea.emb', b='eb.emb')} AS cosine
FROM cand c
JOIN e ea ON ea.vec_id = c.a_id
JOIN e eb ON eb.vec_id = c.b_id
WHERE {_SQL_DOT.format(a='ea.emb', b='eb.emb')} >= 0.3
"""


@register("sim_lsh_approx", category="llm_sim", oracle=_lsh_oracle(), heavy=True)
def sim_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate similarity join at scale: random-hyperplane (SimHash)
    LSH with OR-amplification — L=8 hash tables, planes-per-table p
    DENSITY-ADAPTIVE via _lsh_planes_for (expected bucket occupancy
    n / 2^p <= 64, integer threshold ladder). Candidates = pairs sharing
    a bucket in ANY table, then refined by exact cosine. AND within a
    table keeps buckets bounded as the corpus grows (fixed p made the
    within-bucket self-join quadratic in n/2^p); OR across tables
    recovers recall (P[candidate] = 1-(1-s^p)^8). The corpus count is
    ONE scalar aggregate, and the oracle derives the identical p from
    COUNT(*) in SQL, so the full pipeline stays hash-match replayable.

    Hyperplane h_j dimension d weight = sin(j*131 + d*17) — computed in
    PYTHON once (_lsh_plane) and shared as identical double literals with
    the DuckDB oracle, which replays the whole pipeline (bucket signs,
    candidate join, cosine refine) in exact IEEE arithmetic: this is a
    FULL SQL oracle on an approximate operator, possible because the
    "randomness" is a fixed deterministic draw. Work is sum of per-bucket
    squares instead of n^2: the path that survives 100x corpus growth.
    Recall vs sim_cosine_topk additionally asserted in tests.
    """
    e = _emb(spark, sf_dir)
    # density ladder: one scalar count, mirrored by the oracle's COUNT(*)
    n_tables = _LSH_TABLES
    planes_per_table = _lsh_planes_for(e.count())
    buckets = []
    for t in range(n_tables):
        planes = [
            F.array(*[F.lit(w) for w in _lsh_plane(t, j)])
            for j in range(planes_per_table)
        ]
        bucket = sum(
            [
                F.when(_dot(F.col("emb"), planes[j]) > 0, F.lit(1 << j)).otherwise(
                    F.lit(0)
                )
                for j in range(planes_per_table)
            ],
            F.lit(0),
        )
        buckets.append(
            F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket"))
        )
    b = e.select(
        "vec_id", "emb", F.explode(F.array(*buckets)).alias("tb")
    ).select("vec_id", "emb", "tb.table_id", "tb.bucket")
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("a_id"),
            F.col("y.vec_id").alias("b_id"),
        )
        .distinct()
        .join(e.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb")), "a_id")
        .join(e.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb")), "b_id")
        .select(
            "a_id",
            "b_id",
            _dot(F.col("a_emb"), F.col("b_emb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


def _lsh_whitened_tables(e: DataFrame):
    """Data-dependent LSH rotation: ZCA-whiten the fixed sin-draw planes
    and QR-orthonormalize them WITHIN each table.

    Why: the r6 density probe traced sim_lsh_approx's residual
    super-linear candidate growth (59x over 10x data; SCALING.md round-6
    section) to bucket concentration ~4-18x above uniform. Measured root
    cause (r8): the sin-draw planes are nearly COLLINEAR within a table
    (|cos| up to 0.96 between planes), so nominal-p buckets carry far
    fewer effective bits; whitening alone barely helps (3.88x -> 3.86x
    concentration at sf0.1). Whitening + per-table QR orthonormalization
    makes the bits independent AND variance-equalized: measured bucket
    concentration is EXACTLY 1.00x uniform at K=1/4/10/20 copies
    (candidates/n 250 -> 250 -> 312 -> 625, the residual growth being
    purely the p<=8 ladder clamp, vs 970 -> 11,400 for the fixed draw).

    Mechanics: the corpus mean/covariance come from the same tree-merged
    exact Gramian partials as emb_pca_project (one Arrow pass + one
    sqrt(P)-key merge — no corpus shuffle, driver payload O(sqrt(P)*d^2));
    W = V diag(1/sqrt(max(eig, 1e-12))) V' (symmetric ZCA, so
    sign(h . W(x-mean)) = sign((W h) . x - (W h) . mean) and the data
    never needs transforming); per table, Q = qr((P W)') with a
    deterministic sign convention. Buckets hash sign(emb . q_j > mean . q_j)
    — still pure JVM literal-array folds, zero Python in the bucket path.

    The rotation is data-dependent, so the fixed-draw full-SQL-oracle
    replay of sim_lsh_approx is not available — sim_lsh_whitened
    verifies a CONTRACT (exact truth columns + bound flags, the
    emb_pca_project posture) and pytest pins near-dup recall.

    Returns (n, p, mean ndarray, W ndarray, tables) where tables[t] is a
    list of (weights list[d], threshold float) per plane."""
    import numpy as np

    parts = gram_merged_partials(e).collect()
    n = sum(r["n"] for r in parts)
    if not parts or n == 0:
        raise ValueError(
            "lsh_whitened: embeddings input is empty — a covariance "
            "whitening needs at least one vector"
        )
    d = len(parts[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in sorted(parts, key=lambda r: r["pid"]):
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, V = np.linalg.eigh(cov)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(evals, 1e-12))) @ V.T
    p = _lsh_planes_for(n, _LSH_MAX_PLANES_WHITENED)
    tables = []
    for t in range(_LSH_TABLES):
        P = np.stack([_lsh_plane_w(t, j) for j in range(p)])
        Q, _ = np.linalg.qr((P @ W).T)  # d x p, orthonormal columns
        planes = []
        for j in range(p):
            q = Q[:, j]
            nz = q[np.abs(q) > 1e-12]
            if len(nz) and nz[0] < 0:  # deterministic sign (LAPACK-free)
                q = -q
            planes.append((q.tolist(), float(mean @ q)))
        tables.append(planes)
    return n, p, mean, W, tables


def _lsh_bucket_structs(tables):
    """Per-table bucket expressions from (weights, threshold) planes."""
    structs = []
    for t, planes in enumerate(tables):
        bucket = F.lit(0)
        for j, (w, th) in enumerate(planes):
            arr = F.array(*[F.lit(float(x)) for x in w])
            bucket = bucket + F.when(
                _dot(F.col("emb"), arr) > F.lit(th), F.lit(1 << j)
            ).otherwise(F.lit(0))
        structs.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return structs


def sim_lsh_whitened_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production shape of the whitened-rotation LSH similarity join:
    same candidate-join + exact-cosine refine as sim_lsh_approx, with
    the balanced data-dependent planes of _lsh_whitened_tables. Pytest
    pins its recall in the near-dup band; the registered contract twin
    is sim_lsh_whitened."""
    e = _emb(spark, sf_dir)
    _n, _p, _mean, _W, tables = _lsh_whitened_tables(e)
    b = e.select(
        "vec_id", "emb", F.explode(F.array(*_lsh_bucket_structs(tables))).alias("tb")
    ).select("vec_id", "tb.table_id", "tb.bucket")
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a_id"), F.col("y.vec_id").alias("b_id"))
        .distinct()
        .join(e.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb")), "a_id")
        .join(e.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb")), "b_id")
        .select("a_id", "b_id", _dot(F.col("a_emb"), F.col("b_emb")).alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )


@register(
    "sim_lsh_whitened",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
a AS (SELECT vec_id AS a_id, emb AS a_emb FROM e WHERE vec_id < 500)
SELECT (SELECT COUNT(*) FROM e) AS n_vecs,
       (SELECT COUNT(*) FROM a JOIN e b ON b.vec_id > a.a_id
         WHERE {_SQL_DOT.format(a='a.a_emb', b='b.emb')} >= 0.3)
         AS n_true_pairs,
       TRUE AS recall_floor_ok,
       TRUE AS bucket_balance_ok
""",
    heavy=True,
)
def sim_lsh_whitened(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract twin of sim_lsh_whitened_raw (the data-dependent rotation
    makes a full SQL replay impossible — emb_pca_project posture):

    - n_vecs, n_true_pairs: exact, hash-matched against DuckDB (truth =
      pairs with a-side vec_id < 500 and exact cosine >= 0.3 — the
      sampled a-side keeps the exact twin O(500 * n), not O(n^2), at any
      scale factor).
    - recall_floor_ok: candidate recall over the truth sample >= 0.5 x
      the independent-table SimHash expectation
      mean(1 - (1 - s^p)^L) with s = 1 - theta_whitened/pi per truth
      pair — a THEORY-ANCHORED floor that self-adapts to the density
      ladder's p at any corpus size (measured ratio 0.67 at sf0.01,
      0.79 at sf0.1; the 0.5 factor absorbs table non-independence).
    - bucket_balance_ok: pre-refine candidate volume (sum over buckets
      of C(occ, 2) — the exact bucket-join work) <= 2 x the
      perfectly-uniform expectation L * n^2 / 2^(p+1). Measured 1.00x
      at K=1/4/10/20 (the fixed draw runs 3.9-18x, quadratic past the
      clamp — SCALING.md round-8 section).
    """
    import numpy as np

    e = _emb(spark, sf_dir).localCheckpoint()  # one layout for all branches
    n, p, mean, W, tables = _lsh_whitened_tables(e)

    # ONE Arrow pass computes everything per-vector the contract needs:
    # whitened coords (theory angles), all 8 tables' bucket ids (one
    # batched numpy matmul against the QR planes), and the truth-pair
    # PREFILTER against the <=500 broadcast anchors. The r8 shape paid
    # two constants this kills: three separately-analyzed giant literal
    # folds (8 tables x p 64-literal arrays per branch) and a 500 x n
    # broadcast nested loop evaluating an interpreted 64-element fold per
    # pair — together ~13-18 s at sf0.1 on 2,000 vectors, i.e. pure
    # fixed cost. Buckets here are numpy-evaluated where the production
    # twin (sim_lsh_whitened_raw) folds JVM literals; last-ulp boundary
    # flips between the two summation orders are possible and harmless —
    # the flags they feed are 2x-bounded measurements, not hash-matched
    # values. The prefilter margin 1e-9 dominates the <=1e-13 gap between
    # numpy's pairwise sums and the sequential fold, so no true pair can
    # be dropped; MEMBERSHIP is still decided by the exact fold below,
    # bit-identical to the oracle's list_reduce.
    Q = np.stack(
        [[w for (w, _th) in planes] for planes in tables]
    )  # tables x p x d
    TH = np.array([[th for (_w, th) in planes] for planes in tables])
    bits = 1 << np.arange(Q.shape[1], dtype=np.int64)
    anchor_rows = (
        e.filter(F.col("vec_id") < 500).select("vec_id", "emb").collect()
    )  # <=500 x 64 doubles — O(1) driver payload by design
    a_ids = np.array([r["vec_id"] for r in anchor_rows], dtype=np.int64)
    A = (
        np.array([r["emb"] for r in anchor_rows], dtype=np.float64)
        if anchor_rows
        else np.zeros((0, 64))
    )
    Wb, mb = W, mean

    def per_vec(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            XW = (X - mb) @ Wb
            buckets = np.stack(
                [(X @ Q[t].T > TH[t]) @ bits for t in range(len(Q))],
                axis=1,
            )
            D = X @ A.T  # batch x n_anchors prefilter dots
            vid = pdf["vec_id"].to_numpy()
            near = [
                a_ids[(D[i] >= 0.3 - 1e-9) & (a_ids < vid[i])].tolist()
                for i in range(len(vid))
            ]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "xw": list(map(list, XW)),
                    "buckets": list(map(list, buckets)),
                    "near": near,
                }
            )

    narrow = (
        e.select("vec_id", "emb")
        .mapInPandas(
            per_vec,
            "vec_id long, xw array<double>, buckets array<long>, "
            "near array<long>",
        )
        .localCheckpoint()  # buckets/xw/prefilter computed exactly once
    )

    # pre-refine bucket-join volume (no join materialized)
    occ = (
        narrow.select(F.posexplode("buckets").alias("table_id", "bucket"))
        .groupBy("table_id", "bucket")
        .count()
    )
    occ_agg = occ.agg(
        F.sum((F.col("count") * (F.col("count") - 1) / 2).cast("long")).alias("c")
    )
    uniform = _LSH_TABLES * n * n / float(1 << (p + 1))

    # candidates restricted to the truth sample's a-side, refined exact
    emb_a = e.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"))
    emb_b = e.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"))
    b = narrow.select(
        "vec_id", F.posexplode("buckets").alias("table_id", "bucket")
    )
    x = b.filter(F.col("vec_id") < 500).alias("x")
    y = b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a_id"), F.col("y.vec_id").alias("b_id"))
        .distinct()
        .join(emb_a, "a_id")
        .join(emb_b, "b_id")
        .filter(_dot(F.col("a_emb"), F.col("b_emb")) >= 0.3)
    )

    # truth sample: numpy-prefiltered pairs, membership decided by the
    # exact sequential fold; then the per-pair whitened-angle collision
    # expectation (pure JVM math on the few thousand surviving pairs)
    pairs = (
        narrow.select(
            F.col("vec_id").alias("b_id"), F.explode("near").alias("a_id")
        )
        .join(emb_a, "a_id")
        .join(emb_b, "b_id")
        .filter(_dot(F.col("a_emb"), F.col("b_emb")) >= 0.3)
        .select("a_id", "b_id")
    )
    px = (
        pairs.join(
            narrow.select(F.col("vec_id").alias("a_id"), F.col("xw").alias("xa")),
            "a_id",
        )
        .join(
            narrow.select(F.col("vec_id").alias("b_id"), F.col("xw").alias("xb")),
            "b_id",
        )
    )
    sim = 1 - F.acos(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(-1.0),
                _dot(F.col("xa"), F.col("xb"))
                / F.sqrt(_dot(F.col("xa"), F.col("xa")))
                / F.sqrt(_dot(F.col("xb"), F.col("xb"))),
            ),
        )
    ) / F.lit(float(np.pi))
    prob = 1 - F.pow(1 - F.pow(sim, F.lit(p)), F.lit(_LSH_TABLES))
    px_agg = px.agg(
        F.count(F.lit(1)).alias("n_true"), F.avg(prob).alias("expected_recall")
    )

    # r12 (guide §2.6 overlap independent jobs): the three scoreboard
    # actions — bucket-volume agg, refined-candidate count, truth-pair
    # expectation agg — are independent reads of the two checkpointed
    # frames, but ran sequentially; each one's stage tail left the other
    # 31 cores idle. Submit them from a small thread pool so the next
    # job's tasks back-fill the current job's tail (measured at the k100
    # staging: 8.2 s -> see OPTIMIZATION_r12.md).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_pre = pool.submit(lambda: occ_agg.collect()[0]["c"])
        f_cand = pool.submit(cand.count)
        f_px = pool.submit(lambda: px_agg.collect()[0])
        pre_cand = int(f_pre.result() or 0)
        n_cand_true = f_cand.result()
        row = f_px.result()
    n_true, expected = int(row["n_true"]), float(row["expected_recall"] or 0.0)

    # Vacuously true when the truth sample has zero near pairs — the
    # oracle hard-codes TRUE, and "no pairs to recall" is not a miss.
    recall_ok = n_true == 0 or (n_cand_true / n_true) >= 0.5 * expected
    balance_ok = pre_cand <= 2.0 * uniform
    return e.sparkSession.createDataFrame(
        [(n, n_true, bool(recall_ok), bool(balance_ok))],
        "n_vecs long, n_true_pairs long, recall_floor_ok boolean, "
        "bucket_balance_ok boolean",
    )


def _ivf_assign_probes(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared IVF coarse-quantizer build: per-label centroids (exact
    1e12-grid means), centroid-distance table, nearest-list assignment
    and nprobe=2 query probes.

    The exactness discipline: BOTH the centroid means and the
    vector-to-centroid sqdist ride the 1e12 SCALED-LONG grid this
    repo's PQ operators established (sim_ann_pq ADC pattern): per-term
    double math, FLOOR(x*1e12+0.5) to a BIGINT, exact integer sum —
    sqdist terms are <= 4e12 and 64 of them sum well under 2^63. Long
    sums run in whole-stage codegen; the earlier DECIMAL(30,18)
    per-term sum over the same n*64*nlist joined rows was the
    pipeline's hot spot (~2 s of the 2.7 s at sf0.1 — decimal agg
    updates don't codegen), a zip_with decimal fold was slower still
    (interpreted BigDecimal per element), and the decimal CAST's
    HALF_UP-vs-half-even tie divergence is gone by construction."""
    ex = e.select("label", F.posexplode("emb").alias("pos", "val"))
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        _lmean(F.col("val")).alias("cval")
    )
    vex = e.select("vec_id", F.posexplode("emb").alias("pos", "val"))
    vdists = (
        vex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(
            F.sum(
                F.floor(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                    * F.lit(1e12)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("sqdist")
        )
    )
    # Nearest-centroid assignment as min(struct(sqdist, c_label)) — a
    # partial-aggregable hash agg (map-side combine, no per-key sort).
    # Struct ordering is lexicographic by field, so this is exactly the
    # oracle's ROW_NUMBER() ... ORDER BY sqdist, c_label = 1 row; the
    # window formulation measured ~2 s slower at sf0.1.
    assign = (
        vdists.groupBy("vec_id")
        .agg(F.min(F.struct("sqdist", "c_label")).alias("m"))
        .select("vec_id", F.col("m.c_label").alias("list_id"))
    )
    w = W.partitionBy("vec_id").orderBy(F.asc("sqdist"), F.asc("c_label"))
    probes = (
        vdists.filter(F.col("vec_id") < 5)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("q_id"), F.col("c_label").alias("list_id"))
    )
    return assign, probes


@register(
    "sim_ann_ivf",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ex AS (
  SELECT label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
cent AS (
  SELECT label AS c_label, pos,
         CAST(SUM(CAST(FLOOR(val * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000 / COUNT(*) AS cval
  FROM ex GROUP BY label, pos
),
vex AS (
  SELECT vec_id, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
vdists AS (
  SELECT v.vec_id, c.c_label,
         SUM(CAST(FLOOR((v.val - c.cval) * (v.val - c.cval)
                        * 1000000000000 + 0.5) AS BIGINT)) AS sqdist
  FROM vex v JOIN cent c ON v.pos = c.pos
  GROUP BY v.vec_id, c.c_label
),
assign AS (
  SELECT vec_id, c_label AS list_id
  FROM (SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM vdists)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS q_id, c_label AS list_id
  FROM (SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM vdists WHERE vec_id < 5)
  WHERE rn <= 2
),
q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 5),
scored AS (
  SELECT p.q_id, a.vec_id,
         {_SQL_DOT.format(a='q.q_emb', b='e.emb')} AS cosine
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.q_id
  JOIN q ON q.q_id = p.q_id
  JOIN e ON e.vec_id = a.vec_id
)
SELECT q_id, vec_id, cosine, rn
FROM (SELECT q_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 10
""",
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor, top-10 per query.

    Build: coarse quantizer = per-label centroids (exact 1e12-grid sums =>
    deterministic, engine-identical — in production this is k-means, which
    would make the op rows-only-checkable; label centroids keep a full SQL
    oracle). Every vector is assigned to its nearest centroid's inverted
    list (see _ivf_assign_probes for the shuffle-free distance build).
    Query: probe the nprobe=2 nearest lists and score exact cosine ONLY
    against their members — the corpus scan that brute-force
    sim_cosine_topk does is replaced by a scan of ~nprobe/nlist of the
    data. The candidate set (probed-list members + their query vector) is
    broadcast INTO the corpus-side join, so the scan never shuffles; at
    100 TB the corpus is PARTITIONED BY list_id at build time, so the
    probe becomes partition pruning with the same plan shape. Recall vs
    the exact oracle is asserted in tests."""
    e = _emb(spark, sf_dir)
    assign, probes = _ivf_assign_probes(e)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    # Broadcast only the (q_id, vec_id) candidate pairs into the corpus
    # scan, then attach each query's vector from a SECOND tiny broadcast
    # (|q| rows) — duplicating the 64-double q_emb into every candidate
    # row would multiply the broadcast payload ~60x for nothing. The
    # candidate set is ~n*nprobe/nlist*|q| ids; past Spark's broadcast
    # ceiling you partition the corpus BY list_id at build time and the
    # probe becomes partition pruning + a shuffle-free semi-join, same
    # plan shape.
    cand = (
        assign.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    scored = (
        e.select("vec_id", "emb")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "vec_id", _dot(F.col("q_emb"), F.col("emb")).alias("cosine")
        )
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cosine", "rn")
    )


@register(
    "mm_centroids",
    category="llm_sim",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ex AS (
  SELECT label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
)
SELECT label, pos,
       round(CAST(SUM(CAST(FLOOR(val * 1000000000000 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000000000 / COUNT(*), 6)
         AS centroid_val
FROM ex GROUP BY label, pos
""",
)
def mm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids of the embedding column as (label, pos, value)
    rows — posexplode -> keyed avg (exact 1e12-grid long sums — float
    inputs are dyadic, so a raw decimal cast could hit exact rounding
    ties where the engines' tie rules differ; the grid cannot). The canonical
    'aggregate a vector column' shape: partial sums merge associatively,
    so 1000 executors each reduce their shard before one 640-row shuffle."""
    e = _emb(spark, sf_dir)
    ex = e.select("label", F.posexplode("emb").alias("pos", "val"))
    return ex.groupBy("label", "pos").agg(
        F.round(_lmean(F.col("val")), 6).alias("centroid_val")
    )


@register(
    "mm_nearest_centroid",
    category="llm_sim",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ex AS (
  SELECT label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
cent AS (
  SELECT label AS c_label, pos,
         CAST(SUM(CAST(FLOOR(val * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000 / COUNT(*) AS cval
  FROM ex GROUP BY label, pos
),
vex AS (
  SELECT vec_id, label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
dists AS (
  SELECT v.vec_id, v.label AS true_label, c.c_label,
         SUM(CAST(FLOOR((v.val - c.cval) * (v.val - c.cval)
                        * 1000000000000 + 0.5) AS BIGINT)) AS sqdist
  FROM vex v JOIN cent c ON v.pos = c.pos
  GROUP BY v.vec_id, v.label, c.c_label
),
assigned AS (
  SELECT vec_id, true_label, c_label AS assigned_label
  FROM (SELECT vec_id, true_label, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM dists)
  WHERE rn = 1
)
SELECT true_label, assigned_label, COUNT(*) AS n
FROM assigned GROUP BY true_label, assigned_label
""",
)
def mm_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each vector to its nearest label centroid; output the
    confusion matrix vs true labels. Distances accumulate through exact
    1e12-grid long sums keyed on dimension position, so assignment is
    deterministic and engine-identical."""
    e = _emb(spark, sf_dir)
    ex = e.select("label", F.posexplode("emb").alias("pos", "val"))
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        _lmean(F.col("val")).alias("cval")
    )
    vex = e.select("vec_id", "label", F.posexplode("emb").alias("pos", "val"))
    dists = (
        vex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", F.col("label").alias("true_label"), "c_label")
        .agg(
            F.sum(
                _l12((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
            ).alias("sqdist")
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.asc("sqdist"), F.asc("c_label"))
    assigned = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "true_label", F.col("c_label").alias("assigned_label"))
    )
    return assigned.groupBy("true_label", "assigned_label").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "mm_pairwise_dist",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       sqrt({_SQL_SQDIST.format(a='a.emb', b='b.emb')}) AS l2_dist,
       {_SQL_DOT.format(a='a.emb', b='b.emb')} AS cosine
FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 200
""",
)
def mm_pairwise_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 + cosine between consecutive vector pairs — array-column math via
    zip_with/aggregate folds (exact twin of DuckDB list_reduce)."""
    e = _emb(spark, sf_dir)
    a = e.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb")
    )
    b = e.select((F.col("vec_id") - 1).alias("a_id"), F.col("emb").alias("b_emb"),
                 F.col("vec_id").alias("b_id"))
    return a.join(b, "a_id").select(
        "a_id",
        "b_id",
        F.sqrt(_sqdist(F.col("a_emb"), F.col("b_emb"))).alias("l2_dist"),
        _dot(F.col("a_emb"), F.col("b_emb")).alias("cosine"),
    )


def gram_merged_partials(e: DataFrame) -> DataFrame:
    """LAZY tree-merged Gramian partials of `e`'s `emb` column: each
    partition emits ONE (n, column-sum, X'X) row via mapInPandas, then
    one applyInPandas merge level on `pmod(spark_partition_id, isqrt(P))`
    reduces them to O(sqrt(P)) rows for the driver fold. Split out so
    plan tests can assert the single-merge-exchange shape (the caller
    collects eagerly)."""
    import math

    import numpy as np

    def gram_partials(it):
        import pandas as pd

        # Accumulate across Arrow batches so each PARTITION emits exactly
        # one row, tagged with its spark_partition_id — a UNIQUE fold key,
        # so downstream sorts have no ties and the float accumulation
        # order is bit-reproducible for a fixed layout (sorting on
        # (n, s[0]) could tie two partials and reorder nondeterministically).
        n = 0
        pid = -1
        s_ = g_ = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            n += len(X)
            if s_ is None:
                s_ = X.sum(axis=0)
                g_ = X.T @ X
            else:
                s_ += X.sum(axis=0)
                g_ += X.T @ X
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "n": [n],
                    "s": [s_.tolist()],
                    "g": [g_.ravel().tolist()],
                }
            )

    partials = (
        e.select("emb")
        .withColumn("pid", F.spark_partition_id())
        .mapInPandas(gram_partials, "pid long, n long, s array<double>, g array<double>")
    )

    def merge_partials(pdf):
        import pandas as pd

        # pid is unique per input row (one partial per source partition),
        # so this sort is a total order — deterministic fold, no ties.
        pdf = pdf.sort_values("pid", kind="mergesort")
        d_ = len(pdf["s"].iloc[0])
        s_ = np.zeros(d_)
        g_ = np.zeros(d_ * d_)
        for sv, gv in zip(pdf["s"], pdf["g"]):
            s_ += np.asarray(sv)
            g_ += np.asarray(gv)
        return pd.DataFrame(
            {
                "pid": [int(pdf["pid"].min())],
                "n": [int(pdf["n"].sum())],
                "s": [s_.tolist()],
                "g": [g_.tolist()],
            }
        )

    n_parts = e.rdd.getNumPartitions()
    fan_in = max(1, math.isqrt(max(1, n_parts)))
    return (
        partials.groupBy(F.pmod(F.col("pid"), F.lit(fan_in)).alias("mk"))
        .applyInPandas(
            merge_partials, "pid long, n long, s array<double>, g array<double>"
        )
    )


def emb_pca_project_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection to 2 components via the partial-Gramian
    pattern: each partition emits ONE row holding its (d x d) Gramian
    X'X, column sum, and count (a few KB regardless of partition size);
    the driver merges the partials in deterministic partition order,
    eigendecomposes the d x d covariance (d=64 — trivially driver-sized),
    and the projection runs as a broadcast-literal zip_with/aggregate fold
    back on the executors.

    This is the canonical way to do PCA at 100 TB on Spark: the ONLY data
    that ever moves is num_partitions * (d^2 + d + 1) doubles — no shuffle
    of the corpus, no driver materialization of rows. The partials go
    through ONE distributed tree-merge level (sqrt(P) keys) before the
    driver fold, so driver payload is O(sqrt(P) * d^2), not O(P * d^2):
    at 800k scan partitions / d=64 that is ~30 MB instead of ~26 GB, and
    each executor-side merge group holds only ~sqrt(P) few-KB partials.
    Eigen-decomposition is not SQL-expressible -> contract oracle; the
    algebraic invariants (component orthonormality, per-component
    projected variance == eigenvalue, variance ordering) are asserted in
    pytest.
    """
    import numpy as np

    e = _emb(spark, sf_dir)
    parts = gram_merged_partials(e).collect()
    n = sum(r["n"] for r in parts)
    if not parts or n == 0:
        raise ValueError(
            "emb_pca_project: embeddings input is empty — a covariance "
            "decomposition needs at least one vector"
        )
    d = len(parts[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    # group-min pids are distinct across merge groups -> total order
    for r in sorted(parts, key=lambda r: r["pid"]):
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = []
    for i in (d - 1, d - 2):  # top-2 eigenvectors
        v = evecs[:, i]
        nz = v[np.abs(v) > 1e-12]
        if len(nz) and nz[0] < 0:  # deterministic sign
            v = -v
        comps.append(v)

    def proj(vec_lit, mean_lit):
        centered = F.zip_with(F.col("emb"), mean_lit, lambda x, m: x - m)
        return F.aggregate(
            F.zip_with(centered, vec_lit, lambda x, v: x * v),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    mean_lit = F.array(*[F.lit(float(v)) for v in mean])
    v1 = F.array(*[F.lit(float(v)) for v in comps[0]])
    v2 = F.array(*[F.lit(float(v)) for v in comps[1]])
    return e.select(
        "vec_id",
        "label",
        proj(v1, mean_lit).alias("pc1"),
        proj(v2, mean_lit).alias("pc2"),
    )


@register(
    "emb_pca_project",
    category="llm_sim",
    oracle="""
SELECT COUNT(*) AS n_vecs, TRUE AS centered_ok, TRUE AS var_order_ok,
       TRUE AS decorrelated_ok
FROM embeddings
""",
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable PCA: eigendecomposition is not SQL-expressible
    (and eigenvector signs/last-ulp values are LAPACK-build-specific), so
    the oracle checks the algebraic CONTRACT of a correct projection over
    the full output, distributed: projections of centered data have ~zero
    mean (|mean| < 1e-6), the first component carries at least as much
    variance as the second (eigenvalue ordering), and the two components
    are uncorrelated (|corr| < 1e-6) — any correct eigensolver passes,
    a projection bug fails. n_vecs is exact. The per-point projection
    rows are emb_pca_project_raw (pytest asserts orthonormality and
    variance==eigenvalue there)."""
    pcs = emb_pca_project_raw(spark, sf_dir)
    stats = pcs.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg("pc1").alias("m1"),
        F.avg("pc2").alias("m2"),
        F.var_pop("pc1").alias("v1"),
        F.var_pop("pc2").alias("v2"),
        F.corr("pc1", "pc2").alias("c12"),
    )
    return stats.select(
        "n_vecs",
        ((F.abs(F.col("m1")) < 1e-6) & (F.abs(F.col("m2")) < 1e-6)).alias(
            "centered_ok"
        ),
        (F.col("v1") >= F.col("v2")).alias("var_order_ok"),
        (F.abs(F.coalesce(F.col("c12"), F.lit(0.0))) < 1e-6).alias(
            "decorrelated_ok"
        ),
    )


def _kmeans_oracle(iters: int) -> str:
    """Render the k-means Lloyd iterations as chained CTEs — the SAME loop
    emits the Spark plan (mm_kmeans_iterate), so both engines execute
    identical per-iteration arithmetic."""
    sql = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
vex AS (
  SELECT vec_id, label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
cent0 AS (
  SELECT vec_id AS c_id, pos, val AS cval FROM vex WHERE vec_id < 4
)"""
    for t in range(1, iters + 1):
        sql += f""",
dists{t} AS (
  SELECT v.vec_id, v.label, c.c_id,
         SUM(CAST(FLOOR((v.val - c.cval) * (v.val - c.cval)
                        * 1000000000000 + 0.5) AS BIGINT)) AS sqdist
  FROM vex v JOIN cent{t - 1} c ON v.pos = c.pos
  GROUP BY v.vec_id, v.label, c.c_id
),
asg{t} AS (
  SELECT vec_id, label, c_id
  FROM (SELECT vec_id, label, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_id) AS rn
        FROM dists{t})
  WHERE rn = 1
)"""
        if t < iters:  # the final assignment is the answer — mirror the
            # Spark loop, which also skips the last centroid recompute
            sql += f""",
cent{t} AS (
  SELECT a.c_id, v.pos,
         CAST(SUM(CAST(FLOOR(v.val * 1000000000000 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000000000 / COUNT(*) AS cval
  FROM vex v JOIN asg{t} a ON v.vec_id = a.vec_id
  GROUP BY a.c_id, v.pos
)"""
    sql += f"""
SELECT c_id AS cluster, label, COUNT(*) AS n_vecs
FROM asg{iters}
GROUP BY c_id, label
"""
    return sql


_KMEANS_ITERS = 3


@register(
    "mm_kmeans_iterate",
    category="llm_sim",
    oracle=_kmeans_oracle(_KMEANS_ITERS),
    heavy=True,
)
def mm_kmeans_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means (Lloyd) on the embedding table: k=4, seeded from
    vec_id < 4, a fixed 3 iterations — the canonical DataFrame iterative
    algorithm. Each iteration: broadcast the k x d centroid table, assign
    via grid-exact argmin, recompute centroids as grid-exact means.

    Scale shape per iteration: the corpus-side work is ONE map-side
    broadcast join + two keyed shuffles (vec_id rollup for distances,
    (c_id, pos) rollup for new centroids); centroids (k*d rows) are
    localCheckpoint-ed every round — the iterative-lineage cut that keeps
    plan depth constant (same discipline as dedup_components). The fixed
    iteration count keeps it oracle-expressible (3 chained CTE rounds
    rendered by the same Python loop that drives the Spark side).
    """
    e = _emb(spark, sf_dir)
    vex = e.select(
        "vec_id", "label", F.posexplode("emb").alias("pos", "val")
    ).localCheckpoint()
    cent = (
        vex.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("c_id"), "pos", F.col("val").alias("cval"))
        .localCheckpoint()
    )
    asg = None
    for it in range(_KMEANS_ITERS):
        dists = (
            vex.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "label", "c_id")
            .agg(
                F.sum(
                    _l12(
                        (F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval"))
                    )
                ).alias("sqdist")
            )
        )
        w = W.partitionBy("vec_id").orderBy(F.asc("sqdist"), F.asc("c_id"))
        asg = (
            dists.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "label", "c_id")
        )
        if it < _KMEANS_ITERS - 1:  # final assignment is the answer
            cent = (
                vex.join(asg.select("vec_id", "c_id"), "vec_id")
                .groupBy("c_id", "pos")
                .agg(_lmean(F.col("val")).alias("cval"))
                .localCheckpoint()
            )
    return asg.groupBy(F.col("c_id").alias("cluster"), "label").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )


@register(
    "sim_hybrid_rrf",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0),
vec_ranked AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY {_SQL_DOT.format(a='e.emb', b='q.q_emb')} DESC,
                            vec_id) AS vrank
  FROM e, q WHERE vec_id <> 0
  QUALIFY vrank <= 50
),
lex_ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY len(list_filter(string_split(text, ' '),
                                                     t -> t IN ('join', 'hash'))) DESC,
                            doc_id) AS lrank
  FROM documents WHERE doc_id <> 0
  QUALIFY lrank <= 50
)
, fused AS (
  SELECT COALESCE(v.doc_id, l.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / (60 + v.vrank), 0.0)
             + COALESCE(1.0 / (60 + l.lrank), 0.0), 9) AS rrf,
         v.vrank, l.lrank
  FROM vec_ranked v FULL OUTER JOIN lex_ranked l ON v.doc_id = l.doc_id
)
SELECT doc_id, rrf, vrank, lrank FROM fused
QUALIFY ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) <= 20
""",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a dense ranking
    (cosine to query vec 0) and a lexical ranking (query-term frequency in
    text) are fused as sum of 1/(60+rank) — the standard RRF that needs
    no score calibration between modalities. Each ranking is its own
    top-50 (window with unique tiebreak), the fusion is a full outer join
    on doc_id, final top-20 re-ranked on the fused score. At scale the
    two rankings run as independent scans (dense side broadcast-query,
    lexical side predicate-pushed) and the fusion joins two 50-row
    frames — driver never sees the corpus. ROUND(9) pins the one
    float-sum to well above double noise."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    # top-50 via orderBy().limit() -> TakeOrderedAndProject (distributed
    # per-partition heaps); the rank window then runs over the 50-row
    # pool only — a partitionless window over the CORPUS would funnel
    # every row through one task, the classic plan-killer
    wv = W.orderBy(F.desc("cos"), F.asc("doc_id"))
    vec_ranked = (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            _dot(F.col("emb"), F.col("q_emb")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(50)
        .withColumn("vrank", F.row_number().over(wv))
        .select("doc_id", "vrank")
    )
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") != 0)
    hits = F.size(
        F.filter(F.split("text", " "), lambda t: t.isin("join", "hash"))
    )
    wl = W.orderBy(F.desc("hits"), F.asc("doc_id"))
    lex_ranked = (
        d.select("doc_id", hits.alias("hits"))
        .orderBy(F.desc("hits"), F.asc("doc_id"))
        .limit(50)
        .withColumn("lrank", F.row_number().over(wl))
        .select("doc_id", "lrank")
    )
    fused = (
        vec_ranked.join(lex_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("vrank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("lrank")), F.lit(0.0)),
                9,
            ).alias("rrf"),
            "vrank",
            "lrank",
        )
    )
    wf = W.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return fused.withColumn("rn", F.row_number().over(wf)).filter(F.col("rn") <= 20).drop("rn")


# --- product-quantization ANN (asymmetric distance computation) ---

# PQ layout: dim 64 -> M=8 subspaces x 8 dims; K=16 codewords per subspace
# (4-bit codes -> 8 codes/vector = 4 bytes vs 256 bytes raw float32: 64x
# compression of the scan set). Codebooks are the subvectors of the first
# K vectors (k-means with zero Lloyd rounds from real points) so the whole
# operator stays exactly SQL-expressible; production trains codebooks with
# sampled Lloyd iterations, which only weakens the oracle to rows+recall.
_PQ_M = 8
_PQ_K = 16
_PQ_D = 8  # dims per subspace

_PQ_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
ex AS (
  SELECT vec_id, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
sx AS (
  SELECT vec_id, pos // {_PQ_D} AS sub, pos % {_PQ_D} AS spos, val FROM ex
),
cb AS (
  SELECT vec_id AS j, sub, spos, val AS cval FROM sx WHERE vec_id < {_PQ_K}
),
cdist AS (
  SELECT s.vec_id, s.sub, c.j,
         SUM(CAST(FLOOR((s.val - c.cval) * (s.val - c.cval) * 1000000000000
                        + 0.5) AS BIGINT)) AS sqdist
  FROM sx s JOIN cb c ON s.sub = c.sub AND s.spos = c.spos
  GROUP BY s.vec_id, s.sub, c.j
),
codes AS (
  SELECT vec_id, sub, j AS code
  FROM (SELECT vec_id, sub, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY sqdist, j) AS rn
        FROM cdist)
  WHERE rn = 1
),
lut AS (
  SELECT s.vec_id AS q_id, s.sub, c.j,
         SUM(CAST(FLOOR(s.val * c.cval * 1000000000000 + 0.5)
                  AS BIGINT)) AS part
  FROM sx s JOIN cb c ON s.sub = c.sub AND s.spos = c.spos
  WHERE s.vec_id < 5
  GROUP BY s.vec_id, s.sub, c.j
),
scored AS (
  SELECT l.q_id, k.vec_id,
         CAST(SUM(l.part) AS DOUBLE) / 1000000000000 AS adc_score
  FROM codes k
  JOIN lut l ON l.sub = k.sub AND l.j = k.code
  WHERE k.vec_id <> l.q_id
  GROUP BY l.q_id, k.vec_id
)
SELECT q_id, vec_id, adc_score, rn
FROM (SELECT q_id, vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY adc_score DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 10
"""


@register("sim_ann_pq", category="llm_sim", oracle=_PQ_SQL)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, top-10 per query by asymmetric distance.

    Build: each vector's 64 dims split into M=8 subspaces; per subspace
    the nearest of K=16 codewords (argmin exact-decimal sqdist) becomes a
    4-bit code — the corpus a query scans is 8 codes/vector, not 64
    floats (64x smaller, cache-resident at scan time). Query: precompute
    the dot-product lookup table LUT[sub, codeword] for each query (M*K
    = 128 doubles, broadcast), then score = sum over subspaces of
    LUT[sub, code] — table adds only, no float multiply per corpus row.

    At 100 TB: codes live columnar next to the id (4 bytes/vec), LUTs for
    a query batch broadcast to every executor, and the scan is an
    embarrassingly parallel projection + per-partition partial top-k
    (TakeOrderedAndProject) — no shuffle of the corpus, ever; compose
    with the IVF lists (sim_ann_ivf) to prune which partitions scan.
    Recall vs exact brute force is asserted in tests; the ADC ranking
    itself hash-matches the SQL oracle exactly (scaled-long 1e12-grid
    sums — see operators/_helpers.py — because a DECIMAL(38,18)->DOUBLE
    cast is 1-ulp engine-divergent, measured here).
    """
    e = _emb(spark, sf_dir).select("vec_id", "emb")
    sx = e.select(
        "vec_id", F.posexplode("emb").alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") / _PQ_D).cast("int").alias("sub"),
        (F.col("pos") % _PQ_D).alias("spos"),
        "val",
    )
    cb = sx.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("j"), "sub", "spos", F.col("val").alias("cval")
    )
    cdist = (
        sx.join(F.broadcast(cb), ["sub", "spos"])
        .groupBy("vec_id", "sub", "j")
        .agg(
            F.sum(
                F.floor(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                    * F.lit(1e12)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("sqdist")
        )
    )
    # min-struct nearest-codeword: exact (sqdist, j) ordering,
    # partial-aggregable hash agg, no window sort
    codes = (
        cdist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("sqdist", "j")).alias("m"))
        .select("vec_id", "sub", F.col("m.j").alias("code"))
    )
    lut = (
        sx.filter(F.col("vec_id") < 5)
        .join(F.broadcast(cb), ["sub", "spos"])
        .groupBy(F.col("vec_id").alias("q_id"), "sub", "j")
        .agg(
            F.sum(
                F.floor(
                    F.col("val") * F.col("cval") * F.lit(1e12) + F.lit(0.5)
                ).cast("long")
            ).alias("part")
        )
    )
    scored = (
        codes.alias("k")
        .join(
            F.broadcast(lut).alias("l"),
            (F.col("k.sub") == F.col("l.sub")) & (F.col("k.code") == F.col("l.j")),
        )
        .filter(F.col("k.vec_id") != F.col("l.q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            (F.sum("part").cast("double") / F.lit(1e12)).alias("adc_score")
        )
    )
    return (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.desc("adc_score"), "vec_id")
            ),
        )
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "adc_score", "rn")
    )


_IVFPQ_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
ex AS (
  SELECT label, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
cent AS (
  SELECT label AS c_label, pos,
         CAST(SUM(CAST(FLOOR(val * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000 / COUNT(*) AS cval
  FROM ex GROUP BY label, pos
),
vex AS (
  SELECT vec_id, unnest(emb) AS val, unnest(range(len(emb))) AS pos FROM e
),
vdists AS (
  SELECT v.vec_id, c.c_label,
         SUM(CAST(FLOOR((v.val - c.cval) * (v.val - c.cval)
                        * 1000000000000 + 0.5) AS BIGINT)) AS sqdist
  FROM vex v JOIN cent c ON v.pos = c.pos
  GROUP BY v.vec_id, c.c_label
),
assign AS (
  SELECT vec_id, c_label AS list_id
  FROM (SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM vdists)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS q_id, c_label AS list_id
  FROM (SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sqdist, c_label) AS rn
        FROM vdists WHERE vec_id < 5)
  WHERE rn <= 2
),
sx AS (
  SELECT vec_id, pos // {_PQ_D} AS sub, pos % {_PQ_D} AS spos, val
  FROM vex
),
cb AS (
  SELECT vec_id AS j, sub, spos, val AS cval FROM sx WHERE vec_id < {_PQ_K}
),
cdist AS (
  SELECT s.vec_id, s.sub, c.j,
         SUM(CAST(FLOOR((s.val - c.cval) * (s.val - c.cval) * 1000000000000
                        + 0.5) AS BIGINT)) AS sqdist
  FROM sx s JOIN cb c ON s.sub = c.sub AND s.spos = c.spos
  GROUP BY s.vec_id, s.sub, c.j
),
codes AS (
  SELECT vec_id, sub, j AS code
  FROM (SELECT vec_id, sub, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY sqdist, j) AS rn
        FROM cdist)
  WHERE rn = 1
),
lut AS (
  SELECT s.vec_id AS q_id, s.sub, c.j,
         SUM(CAST(FLOOR(s.val * c.cval * 1000000000000 + 0.5)
                  AS BIGINT)) AS part
  FROM sx s JOIN cb c ON s.sub = c.sub AND s.spos = c.spos
  WHERE s.vec_id < 5
  GROUP BY s.vec_id, s.sub, c.j
),
scored AS (
  SELECT l.q_id, k.vec_id,
         CAST(SUM(l.part) AS DOUBLE) / 1000000000000 AS adc_score
  FROM codes k
  JOIN assign a ON a.vec_id = k.vec_id
  JOIN probes p ON p.list_id = a.list_id
  JOIN lut l ON l.q_id = p.q_id AND l.sub = k.sub AND l.j = k.code
  WHERE k.vec_id <> l.q_id
  GROUP BY l.q_id, k.vec_id
)
SELECT q_id, vec_id, adc_score, rn
FROM (SELECT q_id, vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY adc_score DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 10
"""


@register("sim_ivf_pq", category="llm_sim", oracle=_IVFPQ_SQL, heavy=True)
def sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite index (the FAISS IVFPQ production shape): the
    coarse quantizer prunes WHICH vectors a query scores (nprobe=2 of
    the per-label centroid lists, exactly sim_ann_ivf's build), and
    product quantization compresses HOW each survivor is scored
    (8x4-bit codes + per-query ADC lookup table, exactly sim_ann_pq's
    build). Candidates = members of the probed lists only; score = sum
    over subspaces of LUT[sub, code] — no full-corpus scan AND no
    full-width float math on the scanned fraction.

    At 100 TB: codes are partitioned by list_id at build time, a query
    broadcasts its 128-entry LUT to the probed partitions only, and the
    per-partition work is integer table adds + a partial top-k — the
    two pruning levers (which partitions, how many bytes per row)
    compose multiplicatively. Both sub-builds reuse the exactness
    discipline their standalone operators established (grid-exact centroid
    sums, 1e12 scaled-long ADC grid), so the composite still
    hash-matches its full SQL oracle."""
    e = _emb(spark, sf_dir)
    # --- coarse quantizer: exactly sim_ann_ivf's shuffle-free build ---
    assign, probes = _ivf_assign_probes(e)
    vex = e.select("vec_id", F.posexplode("emb").alias("pos", "val"))
    # --- PQ codes + per-query LUTs (sim_ann_pq build) ---
    sx = vex.select(
        "vec_id",
        (F.col("pos") / _PQ_D).cast("int").alias("sub"),
        (F.col("pos") % _PQ_D).alias("spos"),
        "val",
    )
    cb = sx.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("j"), "sub", "spos", F.col("val").alias("cval")
    )
    cdist = (
        sx.join(F.broadcast(cb), ["sub", "spos"])
        .groupBy("vec_id", "sub", "j")
        .agg(
            F.sum(
                F.floor(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                    * F.lit(1e12)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("sqdist")
        )
    )
    # min-struct nearest-codeword: exact (sqdist, j) ordering,
    # partial-aggregable hash agg, no window sort
    codes = (
        cdist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("sqdist", "j")).alias("m"))
        .select("vec_id", "sub", F.col("m.j").alias("code"))
    )
    lut = (
        sx.filter(F.col("vec_id") < 5)
        .join(F.broadcast(cb), ["sub", "spos"])
        .groupBy(F.col("vec_id").alias("q_id"), "sub", "j")
        .agg(
            F.sum(
                F.floor(
                    F.col("val") * F.col("cval") * F.lit(1e12) + F.lit(0.5)
                ).cast("long")
            ).alias("part")
        )
    )
    # --- probe-pruned ADC scoring ---
    cand = (
        assign.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    lut_r = lut.select(
        F.col("q_id").alias("l_q_id"),
        F.col("sub").alias("l_sub"),
        F.col("j").alias("l_j"),
        "part",
    )
    scored = (
        codes.join(cand, "vec_id")
        .join(
            F.broadcast(lut_r),
            (F.col("l_q_id") == F.col("q_id"))
            & (F.col("l_sub") == F.col("sub"))
            & (F.col("l_j") == F.col("code")),
        )
        .groupBy("q_id", "vec_id")
        .agg(
            (F.sum("part").cast("double") / F.lit(1e12)).alias("adc_score")
        )
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "adc_score", "rn")
    )


@register(
    "sim_maxsim_multivec",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, vec_id // 4 AS doc
           FROM embeddings),
q AS (SELECT doc AS q_doc, vec_id AS q_vec_id, emb AS q_emb FROM e WHERE doc < 2),
d AS (SELECT doc AS d_doc, vec_id, emb FROM e WHERE doc >= 2),
dots AS (
  SELECT q.q_doc, q.q_vec_id, d.d_doc,
         MAX({_SQL_DOT.format(a='q.q_emb', b='d.emb')}) AS m
  FROM q, d
  GROUP BY q.q_doc, q.q_vec_id, d.d_doc
),
scored AS (
  SELECT q_doc, d_doc,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(m ORDER BY q_vec_id)),
                     (a, b) -> a + b) AS score
  FROM dots GROUP BY q_doc, d_doc
)
SELECT q_doc, d_doc, score, rn
FROM (SELECT q_doc, d_doc, score,
             ROW_NUMBER() OVER (PARTITION BY q_doc
                                ORDER BY score DESC, d_doc) AS rn
      FROM scored)
WHERE rn <= 10
""",
)
def sim_maxsim_multivec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval: documents are
    multi-vector (4 token-vectors each, carved from consecutive vec_ids),
    and score(q, d) = sum over q's vectors of the MAX dot product against
    d's vectors. The query side (a handful of vectors) broadcasts; the
    corpus is scanned ONCE with per-(q_vec, d_doc) maxes reduced
    map-side, so the shuffle carries |q_vecs| * n_docs maxes, not the
    full dot-product cross product. MAX is float-order-exact; the final
    per-(q,d) sum folds over the q_vec_id-SORTED max list, fixing the
    one order-sensitive float reduction. At 100 TB the same plan holds:
    broadcast stays |query| and both aggregations are mergeable
    partials."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        F.expr("vec_id DIV 4").alias("doc"),
    )
    q = e.filter(F.col("doc") < 2).select(
        F.col("doc").alias("q_doc"),
        F.col("vec_id").alias("q_vec_id"),
        F.col("emb").alias("q_emb"),
    )
    d = e.filter(F.col("doc") >= 2).select(
        F.col("doc").alias("d_doc"), "vec_id", "emb"
    )
    dots = (
        d.crossJoin(F.broadcast(q))
        .select(
            "q_doc",
            "q_vec_id",
            "d_doc",
            _dot(F.col("q_emb"), F.col("emb")).alias("dot"),
        )
        .groupBy("q_doc", "q_vec_id", "d_doc")
        .agg(F.max("dot").alias("m"))
    )
    scored = dots.groupBy("q_doc", "d_doc").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("q_vec_id", "m"))),
            F.lit(0.0),
            lambda acc, s: acc + s["m"],
        ).alias("score")
    )
    w = W.partitionBy("q_doc").orderBy(F.desc("score"), F.asc("d_doc"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_doc", "d_doc", "score", "rn")
    )


def _ann_recall_oracle() -> str:
    from ..registry import get as _get

    exact_sql = _get("sim_cosine_topk").oracle
    ivf_sql = _get("sim_ann_ivf").oracle
    return f"""
WITH exact AS (SELECT q_id, vec_id FROM ({exact_sql})),
approx AS (SELECT q_id, vec_id FROM ({ivf_sql})),
hits AS (
  SELECT e.q_id, COUNT(a.vec_id) AS n_hit
  FROM exact e
  LEFT JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY e.q_id
)
SELECT q_id, n_hit, n_hit / 10.0 AS recall_at_10 FROM hits
"""


@register(
    "sim_ann_recall_eval",
    category="llm_sim",
    oracle=_ann_recall_oracle(),
    heavy=True,
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 report for the IVF index against the exact brute-force
    baseline — the index-quality gate an embedding pipeline runs after
    every rebuild. Both sides are deterministic operators with their own
    SQL oracles, so even this EVALUATION query hash-matches end to end
    (the oracle composes both queries' oracles verbatim). The join is
    |queries| x k rows — negligible next to either input — so the eval
    adds no scale risk on top of its inputs."""
    exact = sim_cosine_topk(spark, sf_dir).select("q_id", "vec_id")
    approx = sim_ann_ivf(spark, sf_dir).select(
        "q_id", F.col("vec_id").alias("a_vec"), F.lit(1).alias("hit")
    )
    joined = exact.join(
        approx,
        (exact.q_id == approx.q_id) & (exact.vec_id == approx.a_vec),
        "left",
    ).select(exact.q_id, "hit")
    return joined.groupBy("q_id").agg(
        F.count("hit").alias("n_hit"),
        (F.count("hit") / F.lit(10.0)).alias("recall_at_10"),
    )


_MAT_DIMS = 16  # truncated prefix length (of 64) under evaluation


@register(
    "emb_matryoshka_eval",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
t AS (
  SELECT vec_id, list_slice(emb, 1, {_MAT_DIMS}) AS temb,
         sqrt({_SQL_DOT.format(a="list_slice(emb, 1, " + str(_MAT_DIMS) + ")",
                               b="list_slice(emb, 1, " + str(_MAT_DIMS) + ")")})
           AS tnorm
  FROM e
),
q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 10),
qt AS (SELECT vec_id AS q_id, temb AS q_temb, tnorm AS q_tnorm
       FROM t WHERE vec_id < 10),
full_rank AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id)
           AS rn
  FROM (SELECT q.q_id, e.vec_id,
               {_SQL_DOT.format(a='q.q_emb', b='e.emb')} AS cosine
        FROM q JOIN e ON e.vec_id <> q.q_id)
),
trunc_rank AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id)
           AS rn
  FROM (SELECT qt.q_id, t.vec_id,
               {_SQL_DOT.format(a='qt.q_temb', b='t.temb')}
                 / (qt.q_tnorm * t.tnorm) AS cosine
        FROM qt JOIN t ON t.vec_id <> qt.q_id)
)
SELECT f.q_id,
       CAST(COUNT(tr.vec_id) AS BIGINT) AS n_overlap,
       COUNT(tr.vec_id) / 10.0 AS recall_at_10
FROM (SELECT * FROM full_rank WHERE rn <= 10) f
LEFT JOIN (SELECT * FROM trunc_rank WHERE rn <= 10) tr
  ON tr.q_id = f.q_id AND tr.vec_id = f.vec_id
GROUP BY f.q_id
""",
)
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation: recall@10 of cosine
    top-10 under a 16-dim prefix of the 64-dim embedding vs the
    full-dim top-10 — the measurement that decides whether an embedding
    column can be stored/scanned at 1/4 width (a 4x scan-volume saving at
    100 TB). Full-dim vectors are L2-normalized so cosine == dot; the
    truncated prefix is NOT normalized, so its cosine divides by both
    fold-computed norms (sqrt and divide are single IEEE ops — exact
    cross-engine). Both rankings and the overlap report hash-match;
    recall divides by 10 only after integer counting. Plan shape is two
    broadcast-query corpus scans + windows + a q_id-grouped join —
    identical scale behavior to sim_cosine_topk."""
    e = _emb(spark, sf_dir).select("vec_id", "emb")
    temb = F.slice(F.col("emb"), 1, _MAT_DIMS)
    t = e.select(
        "vec_id",
        temb.alias("temb"),
        F.sqrt(_dot(temb, temb)).alias("tnorm"),
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    qt = t.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("temb").alias("q_temb"),
        F.col("tnorm").alias("q_tnorm"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    full_top = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _dot(F.col("q_emb"), F.col("emb")).alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id")
    )
    trunc_top = (
        t.join(F.broadcast(qt), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                _dot(F.col("q_temb"), F.col("temb"))
                / (F.col("q_tnorm") * F.col("tnorm"))
            ).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", F.col("vec_id").alias("t_vec"))
    )
    joined = full_top.join(
        trunc_top,
        (full_top.q_id == trunc_top.q_id) & (full_top.vec_id == trunc_top.t_vec),
        "left",
    ).select(full_top.q_id, "t_vec")
    return joined.groupBy("q_id").agg(
        F.count("t_vec").cast("long").alias("n_overlap"),
        (F.count("t_vec") / F.lit(10.0)).alias("recall_at_10"),
    )


@register(
    "sim_hard_negative_mining",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
      FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label AS neg_label,
         {_SQL_DOT.format(a='q.q_emb', b='e.emb')} AS cosine
  FROM q JOIN e ON e.vec_id <> q.q_id AND e.label <> q.q_label
)
SELECT q_id, q_label, vec_id, neg_label, cosine, rn
FROM (SELECT q_id, q_label, vec_id, neg_label, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-5 most-similar vectors carrying a DIFFERENT label — the
    near-misses that make embedding models actually learn, versus the
    uninformative random negatives in-batch sampling yields. Exactly
    sim_cosine_topk's broadcast-query / one-corpus-scan / window-rank
    plan with the label anti-predicate pushed into the join, so the
    corpus rows sharing the anchor's label are dropped BEFORE the dot
    product is computed, not filtered after.

    Scale shape: at 100 TB this composes with the ANN operators the
    same way retrieval does (mine from the IVF-probed lists instead of
    the full corpus); the exact formulation here is the recall oracle
    for that composition."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    scored = e.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("q_id"))
        & (F.col("label") != F.col("q_label")),
    ).select(
        "q_id",
        "q_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        _dot(F.col("q_emb"), F.col("emb")).alias("cosine"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "q_label", "vec_id", "neg_label", "cosine", "rn")
    )


@register(
    "sim_rocchio_prf",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 3),
pass1 AS (
  SELECT q_id, vec_id
  FROM (SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY {_SQL_DOT.format(a='q.q_emb', b='e.emb')} DESC,
                          e.vec_id) AS rn
        FROM q JOIN e ON e.vec_id <> q.q_id)
  WHERE rn <= 10
),
fbx AS (
  SELECT p.q_id, unnest(e.emb) AS val,
         unnest(range(len(e.emb))) AS pos
  FROM pass1 p JOIN e ON e.vec_id = p.vec_id
),
cent AS (
  SELECT q_id, pos,
         CAST(SUM(CAST(FLOOR(val * 1000000000000 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000000000 / 10 AS cval
  FROM fbx GROUP BY q_id, pos
),
qx AS (
  SELECT q_id, unnest(q_emb) AS qval,
         unnest(range(len(q_emb))) AS pos
  FROM q
),
q2 AS (
  SELECT c.q_id,
         array_agg(0.5*x.qval + 0.5*c.cval ORDER BY c.pos) AS q2_emb
  FROM cent c JOIN qx x ON x.q_id = c.q_id AND x.pos = c.pos
  GROUP BY c.q_id
),
scored AS (
  SELECT q2.q_id, e.vec_id,
         {_SQL_DOT.format(a='q2.q2_emb', b='e.emb')} AS score
  FROM q2 JOIN e ON e.vec_id <> q2.q_id
)
SELECT q_id, vec_id, score, rn
FROM (SELECT q_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 10
""",
)
def sim_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio): the first-pass exact top-10
    acts as the assumed-relevant set, the query moves halfway toward
    its centroid (q' = 0.5 q + 0.5 centroid — exact 1e12-grid per-dim
    means), and the corpus is re-ranked against the expanded query —
    the classic recall-boosting second pass of retrieval stacks. The
    expanded query is rebuilt as an ORDERED array (sort_array over
    (pos, val) structs / array_agg ORDER BY pos), so the final dot
    product runs the same sequential fold as sim_cosine_topk and both
    passes hash-match end to end.

    Scale shape: two broadcast-query corpus scans (the feedback
    centroid is |q| x d — driver-free, broadcast back); at 100 TB the
    second pass composes with IVF probing exactly like the first."""
    e = _emb(spark, sf_dir).select("vec_id", "emb")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    w1 = W.partitionBy("q_id").orderBy(F.desc("s"), F.asc("vec_id"))
    pass1 = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", _dot(F.col("q_emb"), F.col("emb")).alias("s")
        )
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id")
    )
    fbx = pass1.join(e, "vec_id").select(
        "q_id", F.posexplode("emb").alias("pos", "val")
    )
    cent = fbx.groupBy("q_id", "pos").agg(
        (
            F.sum(_l12(F.col("val"))).cast("double") / F.lit(1e12) / 10
        ).alias("cval")
    )
    qx = q.select("q_id", F.posexplode("q_emb").alias("pos", "qval"))
    q2 = (
        cent.join(qx, ["q_id", "pos"])
        .groupBy("q_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (
                                0.5 * F.col("qval") + 0.5 * F.col("cval")
                            ).alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ).alias("q2_emb")
        )
    )
    scored = e.join(
        F.broadcast(q2), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id", "vec_id", _dot(F.col("q2_emb"), F.col("emb")).alias("score")
    )
    w2 = W.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "score", "rn")
    )


_MMR_LAMBDA = 0.5
_MMR_POOL = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    steps = []
    for k in range(2, _MMR_K + 1):
        prev = f"sel{k - 1}"
        steps.append(
            f"""sel{k} AS (
  SELECT vec_id, rel, step FROM {prev}
  UNION ALL
  SELECT vec_id, rel, {k} AS step FROM (
    SELECT c.vec_id, c.rel,
           {_MMR_LAMBDA}*c.rel - {1 - _MMR_LAMBDA}*MAX(m.sim) AS mmr
    FROM cand c
    JOIN simmat m ON m.a = c.vec_id
                 AND m.b IN (SELECT vec_id FROM {prev})
    WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
    GROUP BY c.vec_id, c.rel
    ORDER BY mmr DESC, c.vec_id LIMIT 1)
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vec_id, rel, emb
  FROM (SELECT e.vec_id, e.emb,
               {_SQL_DOT.format(a='q.q_emb', b='e.emb')} AS rel,
               ROW_NUMBER() OVER (
                 ORDER BY {_SQL_DOT.format(a='q.q_emb', b='e.emb')} DESC,
                          e.vec_id) AS rn
        FROM e, q WHERE e.vec_id <> 0)
  WHERE rn <= {_MMR_POOL}
),
simmat AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         {_SQL_DOT.format(a='a.emb', b='b.emb')} AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
sel1 AS (
  SELECT vec_id, rel, 1 AS step FROM cand
  ORDER BY rel DESC, vec_id LIMIT 1
),
{chain}
SELECT CAST(step AS BIGINT) AS step, vec_id, rel FROM sel{_MMR_K}
"""


@register("sim_mmr_diversify", category="llm_sim", oracle=_mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking: from the top-20
    relevance pool, greedily pick 5 results maximizing
    lambda*relevance - (1-lambda)*max-similarity-to-already-selected
    (lambda=0.5) — the diversification pass that stops a
    result page being five paraphrases of the same document. Greedy
    steps are unrolled (5 fixed picks, min-vec_id ties), and
    every score is a fold dot product over exact doubles, so the whole
    greedy trajectory hash-matches the unrolled-CTE oracle.

    Scale shape: the expensive part is the relevance pass (one corpus
    scan, exactly sim_cosine_topk's plan); everything after operates
    on the POOL — the 20x20 similarity matrix and
    the greedy loop never touch the corpus again, so MMR costs the
    same as plain top-k plus a constant."""
    e = _emb(spark, sf_dir).select("vec_id", "emb")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb")
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "emb", _dot(F.col("q_emb"), F.col("emb")).alias("rel")
        )
        # TakeOrderedAndProject pool cut — never a partitionless window
        # over the corpus
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .select("vec_id", "rel", "emb")
        .localCheckpoint()
    )
    ca = cand.select(
        F.col("vec_id").alias("a"), F.col("emb").alias("a_emb")
    )
    cb = cand.select(
        F.col("vec_id").alias("b"), F.col("emb").alias("b_emb")
    )
    simmat = (
        ca.join(cb, F.col("a") != F.col("b"))
        .select("a", "b", _dot(F.col("a_emb"), F.col("b_emb")).alias("sim"))
        .localCheckpoint()
    )
    sel = (
        cand.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select("vec_id", "rel", F.lit(1).alias("step"))
    )
    for k in range(2, _MMR_K + 1):
        rem = cand.join(
            sel.select("vec_id"), "vec_id", "left_anti"
        ).select("vec_id", "rel")
        maxsim = (
            simmat.join(
                sel.select(F.col("vec_id").alias("b")), "b"
            )
            .groupBy(F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("max_sim"))
        )
        pick = (
            rem.join(maxsim, "vec_id")
            .select(
                "vec_id",
                "rel",
                (
                    _MMR_LAMBDA * F.col("rel")
                    - (1 - _MMR_LAMBDA) * F.col("max_sim")
                ).alias("mmr"),
            )
            .orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "rel", F.lit(k).alias("step"))
        )
        sel = sel.unionAll(pick).localCheckpoint()
    return sel.select(
        F.col("step").cast("long").alias("step"), "vec_id", "rel"
    )


@register(
    "sim_ndcg_eval",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
      FROM e WHERE vec_id < 5),
ranked AS (
  SELECT q.q_id, q.q_label, e.label,
         ROW_NUMBER() OVER (PARTITION BY q.q_id
           ORDER BY {_SQL_DOT.format(a='q.q_emb', b='e.emb')} DESC,
                    e.vec_id) AS rn
  FROM q JOIN e ON e.vec_id <> q.q_id
),
topk AS (
  SELECT q_id,
         CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel,
         CAST(SUM(CASE WHEN label = q_label
              THEN CAST(round(1.0/log2(rn + 1), 9) AS DECIMAL(30,9))
              ELSE CAST(0 AS DECIMAL(30,9)) END) AS DOUBLE) AS dcg
  FROM ranked WHERE rn <= 10 GROUP BY q_id
),
ideal AS (
  SELECT i, CAST(round(1.0/log2(i + 1), 9) AS DECIMAL(30,9)) AS gain
  FROM (SELECT unnest(range(1, 11)) AS i)
)
SELECT t.q_id, t.n_rel, round(t.dcg, 9) AS dcg,
       round(CASE WHEN t.n_rel = 0 THEN 0.0
             ELSE t.dcg / CAST((SELECT SUM(gain) FROM ideal
                                WHERE i <= t.n_rel) AS DOUBLE) END, 9)
         AS ndcg
FROM topk t
""",
)
def sim_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the exact cosine ranking against same-label binary
    relevance: per query, the discounted cumulative gain of relevant
    hits in the top 10, normalized by the ideal DCG for that many
    relevant items — the position-aware retrieval metric that recall@k
    (sim_ann_recall_eval) is blind to: finding a relevant doc at rank 1
    and at rank 10 are the same recall but very different NDCG. Gains
    1/log2(rank+1) round to the 9-decimal grid before exact decimal
    sums, so even the evaluation metric hash-matches.

    Scale shape: one broadcast-query corpus scan for the ranking (the
    sim_cosine_topk plan); gains and the ideal table operate on 10
    rows per query."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    ranked = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "label",
            "vec_id",
            _dot(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
    )
    gain = F.round(1.0 / F.log2(F.col("rn") + 1), 9).cast("decimal(30,9)")
    rel = F.col("label") == F.col("q_label")
    topk = ranked.groupBy("q_id").agg(
        F.sum(F.when(rel, 1).otherwise(0)).cast("long").alias("n_rel"),
        F.sum(F.when(rel, gain).otherwise(F.lit(0).cast("decimal(30,9)")))
        .cast("double")
        .alias("dcg"),
    )
    ideal = spark.range(1, 11).select(
        F.col("id").alias("i"),
        F.round(1.0 / F.log2(F.col("id") + 1), 9)
        .cast("decimal(30,9)")
        .alias("gain"),
    )
    # running ideal-DCG per cutoff, broadcast (10 rows)
    widcg = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    idcg = ideal.select(
        "i", F.sum("gain").over(widcg).cast("double").alias("idcg")
    )
    return (
        topk.join(
            F.broadcast(idcg), F.col("n_rel") == F.col("i"), "left"
        )
        .select(
            "q_id",
            "n_rel",
            F.round("dcg", 9).alias("dcg"),
            F.round(
                F.when(F.col("n_rel") == 0, 0.0).otherwise(
                    F.col("dcg") / F.col("idcg")
                ),
                9,
            ).alias("ndcg"),
        )
    )


@register(
    "curate_contamination_embedding",
    category="curation",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
bench AS (
  SELECT emb AS b_emb FROM e WHERE label = 0
  UNION ALL
  SELECT emb FROM e WHERE label <> 0 AND vec_id % 40 = 1
),
corpus AS (SELECT vec_id, label, emb FROM e WHERE label <> 0),
scored AS (
  SELECT c.vec_id, c.label,
         MAX({_SQL_DOT.format(a='c.emb', b='b.b_emb')}) AS max_sim
  FROM corpus c CROSS JOIN bench b GROUP BY c.vec_id, c.label
)
SELECT vec_id, label, round(max_sim, 9) AS max_sim,
       max_sim >= 0.99 AS contaminated
FROM scored
""",
)
def curate_contamination_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of curate_contamination's n-gram overlap check: score
    every corpus vector's MAX cosine against the benchmark embedding
    set and flag near-verbatim leaks (tau=0.99 catches the planted
    copies; paraphrase-level contamination shows up as the continuous
    max_sim column for a human threshold sweep). The bench set is the
    label-0 cluster plus verbatim copies of a slice of the corpus
    (vec_id % 40 = 1) — the planted leaks every decontam test needs to
    prove it actually fires. Shape: bench broadcasts (benchmarks are
    small by definition), the corpus scans ONCE with a map-side MAX per
    vector — no shuffle of the corpus, the same posture as
    sim_cosine_topk; the fixed left-to-right array fold keeps each dot
    product bit-identical across engines."""
    e = _emb(spark, sf_dir)
    bench = (
        e.filter(F.col("label") == 0)
        .select(F.col("emb").alias("b_emb"))
        .unionAll(
            e.filter((F.col("label") != 0) & (F.col("vec_id") % 40 == 1))
            .select(F.col("emb").alias("b_emb"))
        )
    )
    corpus = e.filter(F.col("label") != 0).select("vec_id", "label", "emb")
    scored = (
        corpus.crossJoin(F.broadcast(bench))
        .groupBy("vec_id", "label")
        .agg(F.max(_dot(F.col("emb"), F.col("b_emb"))).alias("max_sim"))
    )
    return scored.select(
        "vec_id",
        "label",
        F.round("max_sim", 9).alias("max_sim"),
        (F.col("max_sim") >= 0.99).alias("contaminated"),
    )


_BQ_SPARK_LO = (
    "aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
    "(CASE WHEN element_at(emb, i + 1) > 0D THEN shiftleft(1L, i) ELSE 0L END))"
)
_BQ_SPARK_HI = (
    "aggregate(sequence(32, 63), 0L, (acc, i) -> acc + "
    "(CASE WHEN element_at(emb, i + 1) > 0D THEN shiftleft(1L, i - 32) ELSE 0L END))"
)
_BQ_SQL_LO = (
    "CAST(list_sum(list_transform(range(0, 32), i -> "
    "CASE WHEN emb[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT)"
)
_BQ_SQL_HI = (
    "CAST(list_sum(list_transform(range(32, 64), i -> "
    "CASE WHEN emb[i+1] > 0 THEN (1::BIGINT << (i - 32)) ELSE 0 END)) AS BIGINT)"
)


@register(
    "sim_binary_quantize_rerank",
    category="llm_sim",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sig AS (
  SELECT vec_id, emb, {_BQ_SQL_LO} AS lo, {_BQ_SQL_HI} AS hi FROM e
),
q AS (
  SELECT vec_id AS q_id, emb AS q_emb, lo AS q_lo, hi AS q_hi
  FROM sig WHERE vec_id < 8
),
scored AS (
  SELECT q_id, s.vec_id,
         CAST(bit_count(xor(s.lo, q_lo)) + bit_count(xor(s.hi, q_hi)) AS INTEGER)
           AS hamming,
         {_SQL_DOT.format(a='q_emb', b='s.emb')} AS cosine
  FROM q JOIN sig s ON s.vec_id <> q.q_id
)
SELECT q_id, vec_id, hamming, cosine, rn
FROM (SELECT q_id, vec_id, hamming, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY hamming, vec_id) AS rn
      FROM scored)
WHERE rn <= 15
""",
)
def sim_binary_quantize_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization ANN — the 64x-compression production trick:
    pack each unit vector's 64 sign bits into two 32-bit halves (two
    BIGINTs; one 64-bit word would overflow DuckDB's left shift), rank
    candidates per query by exact Hamming distance
    (bit_count(xor(lo)) + bit_count(xor(hi)) — popcount instructions, no
    float math), keep the 15 closest codes, and carry the exact cosine
    for reranking. For L2-normalized vectors Hamming on sign bits is a
    monotone proxy for angular distance, so the candidate set has high
    recall at 1/32 the memory traffic of the float scan.

    Scale: signatures are computed in one narrow map (two aggregate()
    folds in whole-stage codegen); the broadcast-queries + corpus-scan +
    per-query top-k shape matches sim_cosine_topk, but the scan compares
    16 bytes per vector instead of 512 — the scan IS the cost at 100 TB.
    Deterministic: (hamming, vec_id) is a total order.
    """
    sig = _emb(spark, sf_dir).select(
        "vec_id", "emb",
        F.expr(_BQ_SPARK_LO).alias("lo"),
        F.expr(_BQ_SPARK_HI).alias("hi"),
    )
    q = sig.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    scored = sig.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        (
            F.bit_count(F.expr("lo ^ q_lo")) + F.bit_count(F.expr("hi ^ q_hi"))
        ).alias("hamming"),
        _dot(F.col("q_emb"), F.col("emb")).alias("cosine"),
    )
    w = W.partitionBy("q_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("q_id", "vec_id", "hamming", "cosine", "rn")
    )
