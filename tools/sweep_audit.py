"""Time every registered query the way the external driver does: Spark query
(collect) + DuckDB oracle, in registration order, at a given SF. Prints one
line per query (spark_s, oracle_s) and a sorted summary of the heaviest, so
we can keep the full 139-query sweep inside the driver's time budget.

Usage: python tools/sweep_audit.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oddsetl_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402
from tests.harness import duck_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    timings = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        err = None
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            t_spark = time.time() - t0
            t1 = time.time()
            if name in oracles:
                con = duck_con(sf_dir)
                try:
                    con.execute(oracles[name]).fetchall()
                finally:
                    con.close()
            t_oracle = time.time() - t1
        except Exception as e:  # noqa: BLE001
            t_spark = time.time() - t0
            t_oracle = 0.0
            err = f"{type(e).__name__}: {e}"
            rows = []
        timings[name] = {
            "spark_s": round(t_spark, 3),
            "oracle_s": round(t_oracle, 3),
            "rows": len(rows),
            "err": err,
        }
        print(
            f"{name:36s} spark={t_spark:7.2f}s oracle={t_oracle:6.2f}s "
            f"rows={len(rows):7d}" + (f" ERR {err}" if err else ""),
            flush=True,
        )
    total = time.time() - t_all
    print(f"\nTOTAL {total:.1f}s for {len(qs)} queries")
    heavy = sorted(
        timings.items(), key=lambda kv: -(kv[1]["spark_s"] + kv[1]["oracle_s"])
    )[:15]
    print("heaviest:")
    for name, t in heavy:
        print(f"  {name:36s} {t['spark_s'] + t['oracle_s']:7.2f}s")
    with open("/tmp/sweep_audit.json", "w") as f:
        json.dump({"total_s": total, "timings": timings}, f, indent=1)


if __name__ == "__main__":
    main()
