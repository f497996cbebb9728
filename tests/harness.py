"""In-repo differential oracle harness, mimicking the driver's t2 check:
row-count + schema (sorted column names) + order-insensitive value compare
between a Spark DataFrame and DuckDB running the oracle SQL on the same
parquet fixtures. Exact equality — queries are designed so values are
bit-identical on both engines (see operators/_helpers.py).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from oddsetl_spark.io import TABLES

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # `<t>.parquet` is a flat file in the driver fixtures, but the
        # parallel staging writer (tools/stage_sf1.py) emits a DIRECTORY
        # of part files — glob it so DuckDB sees the same rows Spark does.
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{src}')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"B:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "F:nan"
        return f"F:{v!r}"
    if isinstance(v, Decimal):
        return f"F:{float(v)!r}"
    if isinstance(v, int):
        return f"I:{v}"
    if isinstance(v, _dt.datetime):
        return f"T:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(v[k])}" for k in sorted(v)) + "}"
    return f"S:{v}"


def _rows_canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _pandas_path_canon(v) -> str:
    """Canonicalize a duckdb-.df() cell the way the external driver's pandas
    canonicalizer sees it. Intolerant of float-vs-int (DuckDB HUGEINT ->
    float64 drift, the round-2 gate failure class); tolerant of date vs
    midnight timestamp (empirically driver-tolerated)."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return f"{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_pandas_path_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}={_pandas_path_canon(v[k])}" for k in sorted(v))
            + "}"
        )
    return f"S:{v}"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"schema mismatch:\n  spark: {sorted(s_cols)}\n  duck:  {sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc = _rows_canon(s_rows, s_cols)
    dc = _rows_canon(d_rows, d_cols)
    if sc != dc:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark: {a}\n    duck:  {b}" for i, a, b in diffs
        )
        raise AssertionError(
            f"value mismatch ({len([1 for a, b in zip(sc, dc) if a != b])} rows differ, "
            f"cols sorted={sorted(s_cols)}):\n{msg}"
        )

    # Pandas-path twin of the value check: re-fetch the oracle through
    # duckdb's .df() (the conversion the external driver uses) and compare
    # against the SAME collected Spark rows. Catches engine type-mapping
    # drift the fetchall() path hides — e.g. SUM(int) -> HUGEINT -> float64
    # ("201.0" vs "201"), the round-2 driver gate failure class.
    # Pandas promotes int columns containing NULLs to float64 on BOTH
    # engines' conversion paths (the driver's spark side is pandas too), so
    # ints in any nullable column are canonicalized as floats symmetrically
    # (fn_try's parsed column: NULL-bearing bigint).
    import numpy as np
    import pandas as pd

    pdf = con.execute(sql).df()
    pdf = pdf[sorted(pdf.columns)]
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])

    def _isnull(v):
        return v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v))

    d_tuples = list(pdf.itertuples(index=False, name=None))
    s_tuples = [tuple(r[i] for i in order) for r in s_rows]
    nullable = [
        any(_isnull(t[c]) for t in s_tuples) or any(_isnull(t[c]) for t in d_tuples)
        for c in range(len(pdf.columns))
    ]

    def _cell(v, c):
        if (
            nullable[c]
            and isinstance(v, (int, np.integer))
            and not isinstance(v, bool)
        ):
            return _pandas_path_canon(float(v))
        return _pandas_path_canon(v)

    dp = sorted(
        tuple(_cell(v, c) for c, v in enumerate(row)) for row in d_tuples
    )
    sp = sorted(
        tuple(_cell(v, c) for c, v in enumerate(row)) for row in s_tuples
    )
    if sp != dp:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sp, dp)) if a != b][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark: {a}\n    duck(.df): {b}" for i, a, b in diffs
        )
        raise AssertionError(
            f"pandas-path mismatch (driver canonicalizer would fail; "
            f"cols sorted={sorted(s_cols)}):\n{msg}"
        )


def run_one(spark, name: str, sf_dir: str) -> str:
    """Run one registered query differentially; returns 'sql' or 'rows'."""
    from oddsetl_spark import registry

    q = registry.get(name)
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = df.count()
        assert n >= 0
        return "rows"
    con = duck_con(sf_dir)
    try:
        compare(df, con, q.oracle)
    finally:
        con.close()
    return "sql"
