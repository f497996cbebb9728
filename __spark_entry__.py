"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the oddsetl_spark package: the registry in
oddsetl_spark/registry.py holds one (query_fn, oracle_sql) pair per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oddsetl_spark  # noqa: E402 — populates the registry on import
from oddsetl_spark import registry  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return registry.get("agg_groupby_multi").fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-verifiable query."""
    return registry.oracle_sql()
