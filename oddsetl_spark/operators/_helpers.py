"""Shared oracle-exactness helpers.

The driver hash-compares Spark vs DuckDB values exactly, so every double
aggregation must be ORDER-INSENSITIVE. Scalar IEEE double arithmetic
(+ - * /) is deterministic given identical inputs; only the order of an
aggregation's additions diverges between engines. Discipline:

  per-row double math  ->  cast to DECIMAL  ->  exact SUM  ->  cast DOUBLE

Both engines then produce bit-identical doubles. `dsum`/`davg` implement
the Spark side; oracle SQL uses the textual twins below.

Tie-rounding caveat: the cast scale must be >= the exact decimal precision
of the expression, else the cast itself hits genuine decimal ties where
Spark rounds HALF_UP and DuckDB half-even. Fixture money columns carry <=2
decimals (measured), so products of up to three of them carry <=6 — the
default scale. Expressions with more decimal factors must widen the scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 100 TB-scale sums of money-magnitude values.
_PREC = 38


def dec(col: Column, scale: int = 6) -> Column:
    """Deterministic double->decimal cast (per-row, order-free)."""
    return col.cast(f"decimal(30,{scale})")


def dsum(col: Column, scale: int = 6) -> Column:
    """Order-insensitive SUM of a double expression, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, double division."""
    return F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB twin of davg()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE) / COUNT(*)"
