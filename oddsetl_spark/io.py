"""Table loading over the fixture parquet layout.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

Scans go through `spark.read.parquet` so Catalyst's vectorized reader,
predicate pushdown, and column pruning all apply; operators must filter /
select on raw columns early so pushdown reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import pin_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (region/nation are
# fixed-size; supplier/part/customer are broadcastable at bench scale but NOT
# assumed broadcastable at 100 TB — operators choose per-join).
FIXED_DIMS = ("region", "nation")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins session confs first."""
    pin_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}
