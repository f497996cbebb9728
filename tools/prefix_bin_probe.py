"""Measure the length-binned prefix join against the plain prefix join.

The prefix-filtered exact similarity join (llm_dedup._jaccard_pairs_tau)
keys its self-join on shingle alone; the size-ratio prune runs as a join
post-filter, so size-incompatible postings still MEET in the hash join
before dying. `length_binned=True` moves that prune into the join key
(geometric size bins of ratio 1/tau; the probe side expands to the bins
covering its exact ratio window), so incompatible postings never meet.

This probe reports, per dataset:
  - prefix-join match volume (pre-distinct) for both variants — the
    intermediate-pair count the binning exists to cut;
  - end-to-end wall time of the full pair query (median of 3, warm);
  - output pair count (must be identical — the ratio post-filter is
    retained, so the candidate set is provably unchanged).

Usage: python tools/prefix_bin_probe.py [sf_dir ...]
Default: sf0.1 and the K=10 low-dup ~sf1 staging (staged on demand).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from oddsetl_spark.operators.llm_dedup import (  # noqa: E402
    _JACCARD_TAU,
    _corpus,
    _jaccard_pairs_tau,
    _shingles,
)
from oddsetl_spark.session import get_spark  # noqa: E402


def _prefix_frame(spark, sf_dir: str, tau: float):
    sh = _shingles(_corpus(spark, sf_dir)).localCheckpoint()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "shingle")
    pos = sh.join(dfreq, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("n_sh"),
    )
    return pos.filter(
        F.col("pos")
        <= F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(tau) - F.lit(1e-9)) + 1
    ).select("doc_id", "shingle", "n_sh")


def match_volume(spark, sf_dir: str, tau: float, binned: bool) -> int:
    """Pre-distinct prefix-join match count (the intermediate volume)."""
    prefix = _prefix_frame(spark, sf_dir, tau).localCheckpoint()
    if binned:
        def _bin(c):
            return F.floor(F.log(c.cast("double")) / F.lit(math.log(1.0 / tau)))

        lo = F.ceil(F.col("n_sh") * F.lit(tau) - F.lit(1e-9))
        hi = F.floor(F.col("n_sh") / F.lit(tau) + F.lit(1e-9))
        a = prefix.withColumn(
            "pbin", F.explode(F.sequence(_bin(lo), _bin(hi)))
        ).alias("a")
        b = prefix.withColumn("pbin", _bin(F.col("n_sh"))).alias("b")
        key = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col("a.pbin") == F.col("b.pbin")
        )
    else:
        a, b = prefix.alias("a"), prefix.alias("b")
        key = F.col("a.shingle") == F.col("b.shingle")
    return a.join(b, key & (F.col("a.doc_id") < F.col("b.doc_id"))).count()


def main() -> None:
    dirs = sys.argv[1:]
    spark = get_spark("prefix-bin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not dirs:
        from tools.stage_sf1 import stage

        dirs = ["/root/testdata/sf0.1", stage(10, "low-dup")]
    tau = _JACCARD_TAU
    for sf_dir in dirs:
        vol_plain = match_volume(spark, sf_dir, tau, binned=False)
        vol_bin = match_volume(spark, sf_dir, tau, binned=True)
        rows = {}
        times = {}
        for label, flag in (("plain", False), ("binned", True)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = _jaccard_pairs_tau(
                    spark, sf_dir, length_binned=flag
                ).count()
                runs.append(time.perf_counter() - t0)
            rows[label] = n
            times[label] = sorted(runs)[1]
        assert rows["plain"] == rows["binned"], rows
        print(
            f"{sf_dir}: match volume {vol_plain:,} -> {vol_bin:,} "
            f"({vol_plain / max(vol_bin, 1):.2f}x cut), "
            f"wall {times['plain']:.1f}s -> {times['binned']:.1f}s, "
            f"pairs {rows['plain']:,} (identical)"
        )


if __name__ == "__main__":
    main()
