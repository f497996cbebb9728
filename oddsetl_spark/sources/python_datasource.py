"""Spark 4 Python DataSource API (SURVEY §2.A addendum): a custom batch
source implemented in pure Python — the extension point for feeds Spark has
no built-in connector for (the reference's "open disaster data store" REST
feeds would land through exactly this interface, with `partitions()`
mapping to paginated API shards).

The demo source generates a deterministic synthetic sensor feed: every
value is a pure function of the global row id, so the DuckDB twin can
reproduce it with generate_series arithmetic and the driver's hash compare
applies to a from-scratch connector.

Scale shape: `partitions()` returns K independent splits; each executor
core pulls its own split through `read()` (Arrow-batched back to the JVM).
Nothing is driver-materialized — the same contract a production REST/queue
connector needs (split by shard/page/offset-range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import register

_N_ROWS = 20000
_N_PARTS = 8
_MULT = 2654435761  # Knuth multiplicative hash (same constant as curation)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", _N_ROWS))
        self.n_parts = int(options.get("n_parts", _N_PARTS))

    def partitions(self):
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        # Yield ONE Arrow batch per split (vectorized numpy) instead of
        # per-row tuples: the row path crosses the Python/Arrow boundary
        # per record and dominated the scan (4.9s -> ~1s for 20k rows).
        import numpy as np
        import pyarrow as pa

        i = np.arange(partition.start, partition.end, dtype=np.int64)
        yield pa.record_batch(
            [
                pa.array(i),
                pa.array((i % 50).astype(np.int32)),
                pa.array(i * 15),
                pa.array(((i * _MULT) % 1000000) / 1000.0),
            ],
            names=["reading_id", "sensor_id", "ts_offset_s", "reading"],
        )


class SensorDataSource(DataSource):
    """`spark.read.format("oddsetl_sensors")` — deterministic feed."""

    @classmethod
    def name(cls) -> str:
        return "oddsetl_sensors"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id int, ts_offset_s bigint, reading double"

    def reader(self, schema):
        return SensorReader(self.options)


@register(
    "source_python_datasource",
    category="sources",
    oracle=f"""
SELECT i AS reading_id,
       CAST(i % 50 AS INT) AS sensor_id,
       i * 15 AS ts_offset_s,
       ((i * {_MULT}) % 1000000) / 1000.0 AS reading
FROM generate_series(0, {_N_ROWS - 1}) AS t(i)
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource read: register the class, read through the
    format name, project straight off the Arrow batches."""
    spark.dataSource.register(SensorDataSource)
    return (
        spark.read.format("oddsetl_sensors")
        .option("n_rows", _N_ROWS)
        .option("n_parts", _N_PARTS)
        .load()
    )
