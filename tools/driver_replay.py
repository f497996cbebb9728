"""Full driver-contract replay: load `__spark_entry__` by file path (the way
the external driver does), from whatever cwd this is launched in, and run
EVERY registered query + its oracle through the same order-insensitive
value compare the pytest suite uses (including the pandas-path twin that
mimics the driver's canonicalizer). Prints one line per query and a final
summary. Run from a foreign cwd to exercise the sys.path shim:

    cd /tmp && python /root/repo/tools/driver_replay.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import importlib.util
import sys
import time

REPO = "/root/repo"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query names: narrow the replay
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from oddsetl_spark.session import get_spark
    from tests.harness import compare, duck_con

    spark = get_spark()
    qs = entry.queries()
    if only:
        unknown = only - set(qs)
        assert not unknown, f"unknown queries: {sorted(unknown)}"
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entry.oracle_sql()
    ok_sql = ok_rows = 0
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                con = duck_con(sf_dir)
                try:
                    compare(df, con, oracles[name])
                finally:
                    con.close()
                ok_sql += 1
                print(f"{name:38s} sql-match")
            else:
                n = df.count()
                assert n >= 0
                ok_rows += 1
                print(f"{name:38s} rows-only n={n}")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"{type(exc).__name__}: {exc}"))
            print(f"{name:38s} FAIL {type(exc).__name__}")
    print(
        f"\nREPLAY {len(qs)} queries in {time.time() - t0:.1f}s: "
        f"{ok_sql} sql-match, {ok_rows} rows-only, {len(failures)} FAIL"
    )
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:500]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
