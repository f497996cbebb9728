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
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
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
