"""Fixture-contract guard: the driver regenerates /root/testdata between
rounds, and physical-type drift has already broken the engine once
(events.ts moved from TIMESTAMP(NANOS) to plain TIMESTAMP(MICROS), which
Spark 4 reads as TIMESTAMP_NTZ by default — every unix_micros query and
the whole bench run failed at the driver while repo tests stayed green).

These tests pin the LOGICAL schema the engine normalizes every fixture
table to, via io.table(), plus the raw-parquet physical reality. If a
future regeneration changes a type again, this fails immediately with the
table/column named, instead of 50 queries failing downstream.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from oddsetl_spark.io import TABLES, table

from .harness import SF_DIRS

SF_DIR = SF_DIRS["0.001"]

# Logical dtypes AFTER io.table() normalization (what every operator codes
# against). Physical drift in the parquet must be absorbed by io.table /
# session pins, never leaked to operators.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_logical_schema_pinned(spark, name):
    got = dict(table(spark, SF_DIR, name).dtypes)
    exp = EXPECTED[name]
    for col, typ in exp.items():
        assert col in got, f"{name}.{col} missing from fixture (cols: {sorted(got)})"
        assert got[col] == typ, (
            f"{name}.{col} normalized to {got[col]!r}, engine expects {typ!r} — "
            "fixture physical type drifted; absorb it in io.table()/session pins"
        )


def test_no_timestamp_ntz_leaks(spark):
    """No table may expose TIMESTAMP_NTZ after normalization — epoch
    functions (unix_micros etc.) reject it and the DuckDB oracle parity
    assumes plain TIMESTAMP under a UTC session."""
    for name in TABLES:
        for col, typ in table(spark, SF_DIR, name).dtypes:
            assert "ntz" not in typ, f"{name}.{col} leaked {typ}"


def test_raw_parquet_inventory():
    """Every declared table exists at every fixture scale we test."""
    for sf_dir in SF_DIRS.values():
        if not os.path.isdir(sf_dir):
            continue
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            assert os.path.exists(path), f"missing fixture {path}"
            assert pq.read_schema(path).names, f"unreadable fixture {path}"
