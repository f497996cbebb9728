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

Usage: python tools/lsh_density_probe.py [K ...]   (default 1 4 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oddsetl_spark.operators.llm_similarity import (  # noqa: E402
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


def _rotate(col, i: int, d: int = 64):
    """Rotate an array<double> by i positions — distinct vectors with the
    same norm and coordinate distribution as the originals."""
    i = i % d
    if i == 0:
        return col
    return F.concat(F.slice(col, i + 1, d - i), F.slice(col, 1, i))


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("lsh-density-probe")
    base = spark.read.parquet(f"{SRC}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n0 = base.count()
    for mode in ("duplicate", "rotated"):
        print(f"\n-- {mode} copies --")
        print(f"{'K':>3} {'n':>7} {'p':>2}  {'cand_adaptive':>14} "
              f"{'cand_fixed3':>12}  {'adapt/n':>8} {'fixed/n':>8}  sec")
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
            t0 = time.time()
            ca = candidate_count(e, p)
            cf = candidate_count(e, 3)
            print(
                f"{k:>3} {n:>7} {p:>2}  {ca:>14,} {cf:>12,}  "
                f"{ca / n:>8.1f} {cf / n:>8.1f}  {time.time() - t0:.1f}"
            )


if __name__ == "__main__":
    main()
