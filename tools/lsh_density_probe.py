"""Candidate-volume probe for the density-adaptive SimHash LSH
(sim_lsh_approx): measure the pre-refine candidate pair count — the
quantity that actually drives the within-bucket self-join's work — at
K multiples of the sf0.1 embeddings, with the adaptive planes ladder
versus the old fixed p=3.

Candidates are counted WITHOUT materializing the join: the bucket join
produces exactly sum over (table, bucket) of C(occupancy, 2) ordered
pairs, so one groupBy suffices at any scale.

Note the K copies are SHIFTED-ID DUPLICATES of the same vectors (the
scale_probe staging rule): identical vectors agree on every hyperplane
sign, so no plane count can separate them — the duplicate-driven floor
(x K^2 per distinct-vector bucket group) is genuine near-dup output,
not index inefficiency. The adaptive win shows in the DISTINCT-vector
occupancy term, which the fixed-p index lets grow linearly with corpus
size (quadratic candidates) and the ladder holds at ~target.

Caveats the numbers carry:
- "cand_fixed3" evaluates p=3 under the CURRENT plane seeding
  (t*MAX_PLANES+j); the pre-round-6 operator drew planes with t*3+j, so
  this is an apples-to-apples p comparison on one draw, not a bit-replay
  of the old operator (statistically equivalent, same family).
- Raising p trades MODERATE-similarity recall for bucket size: with
  L=8 fixed, P[candidate] = 1-(1-s^p)^8 collapses at s~0.6 (cosine 0.3)
  for large p while staying high in the near-dup band (s >= 0.85). The
  recall table below quantifies it; holding fixed-s recall while
  shrinking buckets requires L ~ (1/s)^p tables — exponential, the
  fundamental LSH trade. The ladder's design point is near-dup dedup.

Usage: python tools/lsh_density_probe.py [K ...]   (default 1 4 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oddsetl_spark.operators.llm_similarity import (  # noqa: E402
    _LSH_MAX_PLANES_WHITENED,
    _LSH_TABLES,
    _dot,
    _lsh_plane,
    _lsh_planes_for,
)
from oddsetl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def bucketed(e, planes_per_table):
    buckets = []
    for t in range(_LSH_TABLES):
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
        buckets.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return e.select(F.explode(F.array(*buckets)).alias("tb")).select(
        "tb.table_id", "tb.bucket"
    )


def candidate_count(e, planes_per_table) -> int:
    occ = bucketed(e, planes_per_table).groupBy("table_id", "bucket").count()
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]
    return int(row["pairs"])


def whitened_candidate_count(e) -> int:
    """Same bucket-join volume under the r8 whitened + per-table
    QR-orthonormalized planes (sim_lsh_whitened)."""
    from oddsetl_spark.operators.llm_similarity import (
        _lsh_bucket_structs,
        _lsh_whitened_tables,
    )

    _n, _p, _m, _W, tables = _lsh_whitened_tables(e)
    occ = (
        e.select(F.explode(F.array(*_lsh_bucket_structs(tables))).alias("tb"))
        .groupBy("tb.table_id", "tb.bucket")
        .count()
    )
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]
    return int(row["pairs"])


def _rotate(col, i: int, d: int = 64):
    """Rotate an array<double> by i positions — distinct vectors with the
    same norm and coordinate distribution as the originals."""
    i = i % d
    if i == 0:
        return col
    return F.concat(F.slice(col, i + 1, d - i), F.slice(col, 1, i))


def recall_table() -> None:
    """Recall vs planes-per-table on the raw sf0.1 embeddings (n=2000,
    numpy replay of the exact plane draws): candidate recall for true
    pairs at cosine >= 0.3 (moderate similarity) and >= 0.8 (near-dup
    band), L=8 tables throughout."""
    import duckdb
    import numpy as np

    E = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SRC}/embeddings.parquet') "
        "ORDER BY vec_id"
    ).fetchnumpy()
    X = np.stack(E["embedding"]).astype(np.float64)
    n = len(X)
    cos = X @ X.T
    iu = np.triu_indices(n, 1)
    truth = {
        tau: set(zip(*[a[cos[iu] >= tau] for a in iu])) for tau in (0.3, 0.8)
    }
    print(f"\n-- recall vs p at n={n}, L={_LSH_TABLES} --")
    print(f"{'p':>2} {'recall>=0.3':>12} {'recall>=0.8':>12} {'candidates':>11}")
    for p in (3, 5, 8):
        cand: set = set()
        tot = 0
        for t in range(_LSH_TABLES):
            P = np.stack([_lsh_plane(t, j) for j in range(p)])
            sig = ((X @ P.T) > 0).astype(np.int64) @ (1 << np.arange(p))
            for b in np.unique(sig):
                idx = np.where(sig == b)[0]
                tot += len(idx) * (len(idx) - 1) // 2
                for i in range(len(idx)):
                    for j in range(i + 1, len(idx)):
                        cand.add((idx[i], idx[j]))
        def rec(tau):
            if not truth[tau]:  # fixture has no pairs that similar
                return "   (no pairs)"
            return f"{len(truth[tau] & cand) / len(truth[tau]):>13.3f}"

        print(f"{p:>2} {rec(0.3):>12} {rec(0.8):>12} {tot:>11,}")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    recall_table()
    spark = get_spark("lsh-density-probe")
    base = spark.read.parquet(f"{SRC}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n0 = base.count()
    for mode in ("duplicate", "rotated"):
        print(f"\n-- {mode} copies --")
        print(f"{'K':>3} {'n':>7} {'p':>2} {'pw':>2}  {'cand_adaptive':>14} "
              f"{'cand_whitened':>13} {'cand_fixed3':>12}  "
              f"{'adapt/n':>8} {'whit/n':>7} {'fixed/n':>8}  sec")
        for k in ks:
            e = base
            for i in range(1, k):
                c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
                if mode == "rotated":
                    c = c.withColumn("emb", _rotate(F.col("emb"), i))
                e = e.unionByName(c)
            e = e.localCheckpoint()
            n = n0 * k
            p = _lsh_planes_for(n)
            pw = _lsh_planes_for(n, _LSH_MAX_PLANES_WHITENED)
            t0 = time.time()
            ca = candidate_count(e, p)
            cw = whitened_candidate_count(e)
            cf = candidate_count(e, 3)
            print(
                f"{k:>3} {n:>7} {p:>2} {pw:>2}  {ca:>14,} {cw:>13,} {cf:>12,}  "
                f"{ca / n:>8.1f} {cw / n:>7.1f} {cf / n:>8.1f}  "
                f"{time.time() - t0:.1f}"
            )


if __name__ == "__main__":
    main()
