"""Worst-case probe for the exact-sum two-phase pre-aggregate
(`_helpers.scaled_group_sums`): its phase-1 exchange carries
|groups| x |partitions| partial rows, which equals standard partial-agg
output — UNLESS group cardinality approaches row count, where partials
stop compressing and the extra phase pays full freight (VERDICT r5
item 7). Measure the two-phase long-partials path against a single-stage
DECIMAL(30,6) sum across group cardinalities at sf0.1, warm, noop sink
(no driver transfer). Both formulations are exact, so a switch between
them can never change results — this probe decides whether a
high-cardinality escape hatch is worth having.

Usage: python tools/decimal_preagg_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oddsetl_spark.io import table  # noqa: E402
from oddsetl_spark.operators._helpers import dec, scaled_group_sums  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"

# group-key expressions spanning the cardinality range at sf0.1
# (lambdas: Column construction needs an active SparkContext)
KEYS = [
    ("returnflag (3)", lambda: F.col("l_returnflag")),
    ("suppkey (~1.5k)", lambda: F.col("l_suppkey")),
    ("orderkey (150k)", lambda: F.col("l_orderkey")),
    ("orderkey*10+line (600k, ~unique)",
     lambda: F.col("l_orderkey") * 10 + F.col("l_linenumber")),
]


def main() -> None:
    spark = get_spark("decimal-preagg-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    li = table(spark, SF, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def run(df):
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return sorted(runs)[1]

    print(f"{'group key':36s} {'two-phase':>10} {'single':>8} {'ratio':>6}")
    for tag, key in KEYS:
        base = li.select(key().alias("k"), expr.alias("x"))
        two = scaled_group_sums(base, ["k"], {"s": F.col("x")})
        one = base.groupBy("k").agg(F.sum(dec(F.col("x"))).cast("double").alias("s"))
        t2, t1 = run(two), run(one)
        print(f"{tag:36s} {t2:>10.3f} {t1:>8.3f} {t2 / t1:>6.2f}")


if __name__ == "__main__":
    main()
