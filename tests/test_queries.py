"""Differential test: every registered query vs its DuckDB oracle.

Runs at sf0.001 by default for speed (set ODDSETL_TEST_SF=0.01 to match the
driver's correctness scale exactly).
"""

from __future__ import annotations

import os

import pytest

import oddsetl_spark  # noqa: F401 — populates the registry
from oddsetl_spark import registry

from .harness import SF_DIRS, run_one

SF = os.environ.get("ODDSETL_TEST_SF", "0.001")
SF_DIR = SF_DIRS[SF]

ALL = sorted(registry.all_queries())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, name):
    run_one(spark, name, SF_DIR)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
