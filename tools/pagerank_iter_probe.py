"""A/B probe: does caching the pagerank edge list ALREADY partitioned and
sorted on src remove the per-iteration Exchange+Sort (guide §2.4)?

plans/r12/graph_pagerank_after.txt shows each of the 3 iteration
SortMergeJoins re-shuffling + re-sorting the persisted edges by src
(Exchange+Sort above every InMemoryTableScan). InMemoryTableScanExec
preserves the cached plan's outputPartitioning AND outputOrdering, so
`repartition("src").sortWithinPartitions("src")` before persist should
make all three iteration joins exchange-free and sort-free on the edge
side — the rank vector (small) shuffles to match instead. This is the
100 TB shape: the table-sized side laid out once, the small side moving.

The r12 session A/B-tested and REJECTED the dst variant (the join on
src re-shuffled anyway); src is the join key, so the reuse actually
fires here — this probe measures it.

Usage: K=100 ITERS=3 python tools/pagerank_iter_probe.py
Alternates arm order per iteration (A,B / B,A) like tools/bench_ab.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oddsetl_spark  # noqa: F401,E402
from pyspark.sql import functions as F  # noqa: E402

from oddsetl_spark.io import table  # noqa: E402
from oddsetl_spark.operators.graph import (  # noqa: E402
    _D,
    _ITERS,
    _SUPP_OFFSET,
    _pagerank_ranks,
)
from oddsetl_spark.session import get_spark  # noqa: E402
from stage_sf1 import stage as _stage_sf1  # noqa: E402


def _ranks_src_partitioned(spark, sf_dir):
    """Candidate: identical to _pagerank_ranks(checkpoint=True) except the
    edge cache is hash-partitioned + sorted on src before persist."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .repartition("c")
        .dropDuplicates()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    )
    rev = pairs.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    edges = (
        fwd.unionAll(rev)
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    degc = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("c").alias("node"), "d"
    )
    degs = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("d")).select(
        (F.col("s") + _SUPP_OFFSET).alias("node"), "d"
    )
    deg = degc.unionByName(degs).localCheckpoint()
    try:
        ranks = deg.select("node", F.lit(1.0).alias("pr"))
        for _ in range(_ITERS):
            rankd = ranks.join(deg, "node").select(
                "node", (F.col("pr") / F.col("d")).alias("w")
            )
            ranks = (
                edges.join(rankd, edges["src"] == rankd["node"])
                .select("dst", "w")
                .groupBy("dst")
                .agg((F.lit(1 - _D) + F.lit(_D) * F.sum("w")).alias("pr"))
                .withColumnRenamed("dst", "node")
            )
        out = ranks.select("node", F.round("pr", 6).alias("pr"))
        out = out.localCheckpoint()
    finally:
        edges.unpersist()
    return out


def main() -> None:
    k = int(os.environ.get("K", "100"))
    iters = int(os.environ.get("ITERS", "3"))
    spark = get_spark("pagerank-iter-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _stage_sf1(k, "low-dup")

    arms = {
        "current": lambda: _pagerank_ranks(spark, sf_dir, checkpoint=True),
        "src_part": lambda: _ranks_src_partitioned(spark, sf_dir),
    }
    # one warm-up each (JIT / listing), then interleaved timed runs
    results: dict[str, list[float]] = {a: [] for a in arms}
    for name, fn in arms.items():
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn().collect()
    order = list(arms)
    for i in range(iters):
        seq = order if i % 2 == 0 else order[::-1]
        for name in seq:
            spark.sparkContext.setJobDescription(f"timed {name} iter{i}")
            t0 = time.perf_counter()
            arms[name]().collect()
            results[name].append(round(time.perf_counter() - t0, 2))
        print(json.dumps({a: results[a] for a in order}), flush=True)
    print(
        json.dumps(
            {
                "k": k,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "runs": results,
                "medians": {
                    a: sorted(v)[len(v) // 2] for a, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
