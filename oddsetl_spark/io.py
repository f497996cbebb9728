"""Table loading over the fixture parquet layout.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

Scans go through `spark.read.parquet` so Catalyst's vectorized reader,
predicate pushdown, and column pruning all apply; operators must filter /
select on raw columns early so pushdown reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import pin_session, size_shuffle_partitions

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


# Analyzed-DataFrame cache: spark.read.parquet re-reads the file footer for
# schema on EVERY call (~80 ms/table via py4j), so a 6-table star query spent
# as long building its plan as executing it. Fixture tables are immutable and
# DataFrames are immutable plan handles, so reusing one per (session, dir,
# table) is pure catalog-metadata caching — no shuffle/result reuse, exactly
# what a real engine's catalog does. Keyed by applicationId so an external
# driver session gets its own entries.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_ts_nanos(df):
    """Nanosecond-epoch ts (legacy TIMESTAMP(NANOS) fixture read as bigint)
    -> microsecond TimestampType. ONE definition shared by the batch
    reader and the streaming source — the two must reduce identically or
    stream-vs-batch oracle parity breaks. The reduction is integer FLOOR
    division (DuckDB's TIMESTAMP_NS -> TIMESTAMP cast floors; Spark's
    `div` truncates toward zero, which differs for pre-epoch values with
    sub-microsecond nanos — and float division would lose precision on
    ns-epoch int64 magnitudes past 2^53)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "ts",
        F.timestamp_micros(
            F.expr(
                "(ts div 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
            )
        ),
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins session confs first.

    events.ts is parquet TIMESTAMP(NANOS): read as long nanoseconds
    (nanosAsLong) and floor-truncate to a microsecond TimestampType —
    exactly DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) semantics, so both
    engines see identical values. Oracle SQL must CAST(ts AS TIMESTAMP)
    wherever events.ts is compared or output.
    """
    pin_session(spark)
    # Input-sized shuffle width (SCALING.md r9 measured rule): partitions
    # grow with the bytes under sf_dir; a no-op below ~2 GiB on 32 cores.
    size_shuffle_partitions(spark, sf_dir)
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # evict plans cached for OTHER (stopped) sessions: appIds never
    # repeat, so stale entries can only leak JVM references
    for k in [k for k in _TABLE_CACHE if k[0] != app]:
        del _TABLE_CACHE[k]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        df = normalize_ts_nanos(df)
    # Belt-and-braces vs the inferTimestampNTZ pin: if a caller's session read
    # the fixture as TIMESTAMP_NTZ anyway, normalize to TimestampType (session
    # tz is UTC, so values are identical) so epoch functions keep resolving.
    ntz_cols = [c for c, t in dtypes.items() if t == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}
