"""Skew-join probe: measure salted vs AQE-skew-split vs naive shuffle
join under a single-key hotspot (~sf1 row counts).

`join_skew_salted` claims salting beats a naive shuffle join when one key
dominates; this probe measures it instead of asserting it. Synthetic fact
(spark.range — exact control of the skew fraction, no fixture mutation):
N rows, ONE hot key holding `HOT_FRAC` of them, the rest uniform over
`N_KEYS`; dim = one row per key. The join is forced onto the shuffle path
(autoBroadcastJoinThreshold=-1) because a broadcastable dim side never
suffers join skew in the first place — the probe isolates the strategy
difference, which on a 100 TB fact vs a too-big-to-broadcast dim is the
real decision.

Variants (fresh plan per timing run — reused DataFrames would reuse
shuffle outputs and time nothing):
  naive  — sort-merge shuffle join, AQE skew split OFF: the hot key's
           partition serializes ~HOT_FRAC of the join on one task.
  aqe    — AQE skewJoin ON with thresholds scaled to the probe size
           (defaults fire at 256 MB partitions; local[32] at this N
           never reaches that, exactly like a modest-skew production
           partition under the default config).
  salted — the operator's strategy: fact salt = pmod(xxhash64(unique
           row key), 16), dim exploded across all 16 salts; the hot key
           spreads over 16 tasks unconditionally.

Usage: python tools/skew_probe.py [N_ROWS] (default 20_000_000)
Prints one JSON line:
  {"probe": "skew_join", "n_rows": N, "hot_frac": 0.2,
   "timings_s": {"naive": .., "aqe": .., "salted": ..},
   "hot_rows": .., "check": "..."}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

N_KEYS = 100_000
HOT_KEY = 42
HOT_FRAC = 0.2
N_SALT = 16
REPS = 3


def build(spark: SparkSession, n_rows: int):
    """Fresh logical plans each call (no shuffle reuse across timings)."""
    fact = spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % int(1 / HOT_FRAC) == 0, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("custkey"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("c_custkey"),
        F.pmod(F.col("id"), F.lit(5)).alias("segment"),
    )
    return fact, dim


def run_naive(spark, n_rows):
    fact, dim = build(spark, n_rows)
    return (
        fact.join(dim, fact.custkey == dim.c_custkey)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )


def run_salted(spark, n_rows):
    fact, dim = build(spark, n_rows)
    f = fact.withColumn(
        "salt", F.pmod(F.xxhash64("row_id"), F.lit(N_SALT)).cast("int")
    )
    d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return (
        f.join(d, (f.custkey == d.c_custkey) & (f.salt == d.salt))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )


def timed(fn, reps=REPS):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn().collect()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[reps // 2], 3), sorted(
        (r["segment"], r["n"]) for r in rows
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # force the shuffle-join path: a broadcastable dim never skews
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    out, answers = {}, {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["naive"], answers["naive"] = timed(lambda: run_naive(spark, n_rows))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # scale the split thresholds to probe size (defaults: 256MB/64MB)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    out["aqe"], answers["aqe"] = timed(lambda: run_naive(spark, n_rows))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["salted"], answers["salted"] = timed(lambda: run_salted(spark, n_rows))

    check = (
        "identical"
        if answers["naive"] == answers["aqe"] == answers["salted"]
        else "DIVERGED"
    )
    print(
        json.dumps(
            {
                "probe": "skew_join",
                "n_rows": n_rows,
                "n_keys": N_KEYS,
                "hot_frac": HOT_FRAC,
                "n_salt": N_SALT,
                "timings_s": out,
                "check": check,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
