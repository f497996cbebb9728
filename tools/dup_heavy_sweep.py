"""Duplicate-heavy ~sf1 differential sweep for the pair-graph family.

Closes the residual verification shape from SCALING.md round 6: the 16
queries whose full-graph DuckDB oracles are quadratic in duplicate-group
size are verified on the DUPLICATE-HEAVY staging (verbatim shifted
copies) via exact-dup-CONTRACTION twin oracles
(oddsetl_spark/operators/dedup_twin_oracles.py) — same result set,
linear oracle cost. Queries whose registered oracles are already
output-proportional on that shape replay as-is.

Modes:
  --selfcheck [sf_dir ...]  twin SQL == registered SQL, DuckDB vs DuckDB
                            (run on a dup-heavy staged dir to exercise
                            the expansion terms; tiny dirs are fine)
  --sweep sf_dir [keys...]  Spark query vs (twin | registered) oracle
                            via the harness compare, timed per query

Run from the repo root or anywhere (path shim below).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oddsetl_spark.operators.dedup_twin_oracles import twin_oracle_sql  # noqa: E402

# Oracles that stay registered on the dup-heavy sweep: their DuckDB cost
# is output-proportional (no posting-list self-join), so duplicates cost
# what the output costs.
AS_IS = [
    "dedup_simhash",
    "dedup_lsh_s_curve",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "sim_lsh_approx",
    "geo_spatiotemporal_join",
]


def _entry():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    return entry


def selfcheck(sf_dirs: list[str]) -> int:
    """Twin oracle == registered full-graph oracle, both in DuckDB."""
    from tests.harness import _rows_canon, duck_con

    entry = _entry()
    registered = entry.oracle_sql()
    twins = twin_oracle_sql()
    fails = 0
    for sf_dir in sf_dirs:
        con = duck_con(sf_dir)
        for name, twin_sql in twins.items():
            t0 = time.time()
            try:
                r = con.execute(registered[name])
                r_cols = [d[0] for d in r.description]
                r_rows = r.fetchall()
                t = con.execute(twin_sql)
                t_cols = [d[0] for d in t.description]
                t_rows = t.fetchall()
                assert sorted(r_cols) == sorted(t_cols), (
                    f"schema {sorted(r_cols)} vs {sorted(t_cols)}"
                )
                assert len(r_rows) == len(t_rows), (
                    f"rows {len(r_rows)} vs {len(t_rows)}"
                )
                rc = _rows_canon(r_rows, r_cols)
                tc = _rows_canon(t_rows, t_cols)
                assert rc == tc, next(
                    f"first diff: {a} vs {b}"
                    for a, b in zip(rc, tc)
                    if a != b
                )
                print(
                    f"{os.path.basename(sf_dir):28s} {name:32s} "
                    f"TWIN==FULL n={len(r_rows)} {time.time() - t0:.1f}s"
                )
            except Exception as exc:  # noqa: BLE001
                fails += 1
                print(
                    f"{os.path.basename(sf_dir):28s} {name:32s} "
                    f"FAIL {type(exc).__name__}: {exc}"
                )
        con.close()
    return fails


def sweep(sf_dir: str, only: set[str]) -> int:
    """Spark result vs contraction-twin (or registered) oracle."""
    from oddsetl_spark.session import get_spark
    from tests.harness import compare, duck_con

    entry = _entry()
    qs = entry.queries()
    registered = entry.oracle_sql()
    twins = twin_oracle_sql()
    names = list(twins) + AS_IS
    if only:
        names = [n for n in names if n in only]
    spark = get_spark()
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            con = duck_con(sf_dir)
            try:
                compare(df, con, twins.get(name) or registered[name])
            finally:
                con.close()
            kind = "twin" if name in twins else "registered"
            print(f"{name:32s} sql-match ({kind}) {time.time() - t0:.1f}s")
        except Exception as exc:  # noqa: BLE001
            fails += 1
            msg = str(exc).split("\n")[0][:200]
            print(
                f"{name:32s} FAIL {type(exc).__name__}: {msg} "
                f"{time.time() - t0:.1f}s"
            )
    return fails


def main() -> None:
    args = sys.argv[1:]
    assert args and args[0] in ("--selfcheck", "--sweep"), __doc__
    t0 = time.time()
    if args[0] == "--selfcheck":
        dirs = args[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
        fails = selfcheck(dirs)
    else:
        fails = sweep(args[1], set(args[2:]))
    print(f"TOTAL {time.time() - t0:.1f}s fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
