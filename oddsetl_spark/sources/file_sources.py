"""SURVEY.md §2.A — scans, file sources, and sinks.

Scans rely on the vectorized parquet reader + pushdown (plan-asserted in
tests/test_plans.py). CSV/JSON sources use EXPLICIT schemas (inferSchema
never appears on a verified path — schema inference is a full extra pass
at 100 TB). Sinks write to fresh temp dirs and verify by reading back.

Round-trip exactness: Spark writes doubles in shortest-round-trip form and
timestamps in ISO-8601 with microseconds, so parquet->csv->read and
parquet->json->read reproduce bit-identical values; the oracle compares
the round-tripped result against the ORIGINAL parquet via DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..registry import register
from ..operators.geo import _SQL_LAT as _GEO_SQL_LAT
from ..operators.geo import _SQL_LON as _GEO_SQL_LON
from ..operators.geo import _lat as _geo_lat
from ..operators.geo import _lon as _geo_lon
from ..session import scratch_dir


def _tmpdir(tag: str) -> str:
    return scratch_dir(tag)


@register(
    "scan_parquet",
    category="sources",
    oracle="SELECT * FROM lineitem WHERE l_orderkey < 3000",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain parquet scan, schema from the footer (no DDL)."""
    return table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)


@register(
    "scan_projection_pushdown",
    category="sources",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-of-11 column scan — ReadSchema must shrink (plan-asserted)."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "scan_filter_pushdown",
    category="sources",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
""",
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed to parquet row groups (PushedFilters asserted)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


@register(
    "source_csv",
    category="sources",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: parquet -> csv (header) -> read with explicit schema.
    Oracle compares against the original parquet — proves losslessness."""
    out = _tmpdir("csv")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(_CUSTOMER_SCHEMA).option("header", True).csv(out)


@register(
    "source_json",
    category="sources",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON round-trip with explicit schema (no inference pass)."""
    out = _tmpdir("json")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").json(out)
    return spark.read.schema(_CUSTOMER_SCHEMA).json(out)


@register(
    "sink_parquet_partitioned",
    category="sources",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write + read-back aggregation. Partition
    values come back from directory names — the layout that enables
    partition pruning on read (the 100 TB table layout)."""
    out = _tmpdir("pqpart")
    li = table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag", "l_linestatus").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "sink_csv",
    category="sources",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _tmpdir("sinkcsv")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    o.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("o_orderkey long, o_orderstatus string").option(
        "header", True
    ).csv(out)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "sink_json",
    category="sources",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _tmpdir("sinkjson")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    o.write.mode("overwrite").json(out)
    back = spark.read.schema("o_orderkey long, o_orderstatus string").json(out)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "sink_bucketed_join",
    category="sources",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, COUNT(*) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey < 20000
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table layout: write orders and lineitem bucketed+sorted on
    the join key (external tables, explicit path), then join the two
    bucketed tables. Spark reads the bucket spec from the catalog and
    plans a SortMergeJoin with NO Exchange on either side — the
    co-located-join layout that makes repeated 100 TB fact-fact joins
    shuffle-free (asserted in tests/test_plans.py).
    """
    n_buckets = 8
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        df = table(spark, sf_dir, name).filter(F.col(key) < 20000)
        (
            df.write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", _tmpdir(f"bkt_{name}"))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    # merge hint = the honest 100 TB shape (neither fact side broadcasts);
    # with both tables bucketed on the key the SMJ needs NO shuffle.
    o = spark.table("bkt_orders").hint("merge")
    li = spark.table("bkt_lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "scan_partition_pruning",
    category="sources",
    oracle="""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS event_day,
       event_type, COUNT(*) AS n
FROM events
WHERE CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
      BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
GROUP BY 1, 2
""",
)
def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning: land events Hive-partitioned by day, read
    back with a day predicate — the filter resolves against directory
    names only (PartitionFilters, plan-asserted), so 3 of 30 day
    partitions are listed and the other 27 are never opened. This is THE
    100 TB access pattern: partition by the dominant filter column."""
    from ..io import table as _t

    out = _tmpdir("pqdays")
    e = _t(spark, sf_dir, "events").withColumn(
        "event_day", F.col("ts").cast("date")
    )
    e.write.mode("overwrite").partitionBy("event_day").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("event_day").between("2024-01-10", "2024-01-12")
        )
        .groupBy("event_day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_dynamic_partition_pruning",
    category="sources",
    oracle="""
WITH dim AS (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1 HAVING COUNT(*) >= 100
)
SELECT f.order_year, COUNT(*) AS n, dim.n_orders
FROM (SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderkey
      FROM orders) f
JOIN dim ON f.order_year = dim.order_year
GROUP BY f.order_year, dim.n_orders
""",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is partitioned on
    order_year; the dim side is filtered on an ATTRIBUTE (yearly order
    count), so the surviving years are only known at runtime — Spark
    broadcasts the dim result into a dynamicpruning#N subquery that
    prunes fact partitions before the scan (plan-asserted). At 100 TB
    this is what keeps a date-partitioned fact from being fully scanned
    when joined to a filtered calendar/dim table."""
    from ..io import table as _t

    out = _tmpdir("dppfact")
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.select("o_orderkey", "order_year").write.mode("overwrite").partitionBy(
        "order_year"
    ).parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        o.groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 100)
        .select(F.col("order_year").alias("dim_year"), "n_orders")
    )
    return (
        fact.join(F.broadcast(dim), fact.order_year == dim.dim_year)
        .groupBy("order_year", "n_orders")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("order_year", "n", "n_orders")
    )


@register(
    "cache_hot_dim",
    category="sources",
    oracle="""
WITH geo AS (
  SELECT n_nationkey, n_name, r_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT g.r_name, COUNT(*) AS n_customers, COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer c JOIN geo g ON c.c_nationkey = g.n_nationkey
GROUP BY g.r_name
""",
)
def cache_hot_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit caching of a hot joined dimension: nation⋈region is built
    once, .cache()d, and materialized; downstream queries read the
    InMemoryTableScan (plan-asserted) instead of re-joining — the
    hot-dimension pattern for dashboards that hit the same dim tree
    thousands of times. (Storage level MEMORY_AND_DISK default; at
    cluster scale the cache shards across executors.)"""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    geo = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .cache()
    )
    geo.count()  # materialize the cache before the consumer query
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(geo), c.c_nationkey == geo.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@register(
    "opt_cbo_join_reorder",
    category="sources",
    oracle="""
SELECT n.n_name, COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_totalprice > 100000 AND n.n_regionkey = 1
GROUP BY n.n_name
""",
)
def opt_cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based optimization with ANALYZE statistics: land the three
    join inputs as catalog tables, COMPUTE STATISTICS FOR ALL COLUMNS,
    enable CBO + star-schema join reordering, and run the join written in
    a deliberately bad textual order (fact x fact-sized first, the
    selective nation dim last). With rowCount + NDV stats the optimizer
    reorders so the selective dim applies early and picks broadcast sides
    from TRUE sizes, not file-size guesses — on a 100 TB warehouse, stats
    maintained by ANALYZE (or a table format's metadata) are what keep
    multi-join plans from exploding. The result is materialized
    (localCheckpoint) while CBO is on, then the session confs are
    restored so sibling queries keep their default plans."""
    for name in ("orders", "customer", "nation"):
        tbl = f"cbo_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        table(spark, sf_dir, name).write.option("path", _tmpdir(tbl)).mode(
            "overwrite"
        ).saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        out = spark.sql(
            """
            SELECT n.n_name, COUNT(*) AS n_orders
            FROM cbo_orders o
            JOIN cbo_customer c ON o.o_custkey = c.c_custkey
            JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_totalprice > 100000 AND n.n_regionkey = 1
            GROUP BY n.n_name
            """
        ).localCheckpoint()  # materialize under CBO before confs revert
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@register(
    "opt_cbo_stats_profile",
    category="sources",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_lines
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_quantity > 49
GROUP BY o.o_orderpriority
""",
)
def opt_cbo_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE-backed CBO session profile (plans/cbo.py) as a
    registered query: land orders+lineitem as catalog tables with full
    column statistics and run a selective fact-filter join under
    cost-based optimization. With stats, FilterEstimation sees the
    ~2%-selective l_quantity predicate and the optimizer builds the hash
    side on the FILTERED fact instead of blind file-size guesses — the
    decision measured at ~sf1 in PLANS.md ("CBO profile": build-side
    flip at the default threshold, SortMergeJoin -> BroadcastHashJoin
    with 3 -> 1 materialized shuffles at 5MB) and plan-locked by
    test_plans.py::test_cbo_profile_flips_broadcast_decision. The result
    is materialized inside the profile (localCheckpoint) so the CBO plan
    executes before the session confs are restored."""
    from ..plans.cbo import cbo_profile

    with cbo_profile(spark, sf_dir, ("orders", "lineitem")) as cat:
        return spark.sql(
            f"""
            SELECT o.o_orderpriority, COUNT(*) AS n_lines
            FROM {cat['orders']} o
            JOIN {cat['lineitem']} l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity > 49
            GROUP BY o.o_orderpriority
            """
        ).localCheckpoint()


# --- Z-order clustering ---------------------------------------------------
# The bit-interleave is unrolled in Python once and rendered into BOTH the
# Spark expression and the DuckDB oracle, so the two engines execute the
# same arithmetic (floor-divide + mod instead of shifts: Spark's
# shiftleft/shiftright only take literal shift amounts, and double
# arithmetic on values < 2^20 is exact on both engines).

_Z_BITS = 8


def _z_terms_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(CAST(floor({x} / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}")
        terms.append(f"(CAST(floor({y} / {1 << i}) AS BIGINT) % 2) * {2 << (2 * i)}")
    return " + ".join(terms)


def _z_col(x, y):
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + (F.floor(x / (1 << i)).cast("long") % 2) * (1 << (2 * i))
        z = z + (F.floor(y / (1 << i)).cast("long") % 2) * (2 << (2 * i))
    return z


@register(
    "opt_zorder_cluster",
    category="sources",
    oracle=f"""
WITH g AS (
  SELECT l_quantity AS q,
         CAST(floor(l_extendedprice / 1000) AS BIGINT) AS p,
         {_z_terms_sql("l_quantity", "CAST(floor(l_extendedprice / 1000) AS BIGINT)")} AS z
  FROM lineitem
)
SELECT CAST(floor(z / 1024) AS BIGINT) AS z_bucket,
       COUNT(*) AS n,
       MIN(q) AS min_q, MAX(q) AS max_q,
       MIN(p) AS min_p, MAX(p) AS max_p
FROM g GROUP BY 1
""",
)
def opt_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of a fact table on two dimensions:
    interleave the bits of (quantity, price-bucket) into one z-value and
    range-bucket it. Rows inside a z-bucket are close in BOTH dimensions,
    so per-file min/max stats stay narrow on each dimension at once — the
    multi-dimensional file-skipping layout (Delta/Iceberg OPTIMIZE ZORDER)
    that single-column range partitioning cannot give you.

    The per-bucket (min,max) of each dimension IS the verification: the
    oracle confirms every z-bucket spans a narrow q-range and p-range. At
    100 TB the same z expression feeds repartitionByRange(z) before the
    write, turning these buckets into files; the z computation itself is
    a pure map-side codegen expression.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.floor(F.col("l_extendedprice") / 1000).cast("long")
    g = li.select(
        q.alias("q"), p.alias("p"), _z_col(q, p).alias("z")
    )
    return (
        g.groupBy(F.floor(F.col("z") / 1024).cast("long").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.min("p").alias("min_p"),
            F.max("p").alias("max_p"),
        )
    )


@register(
    "etl_schema_evolution",
    category="sources",
    oracle="""
WITH unioned AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_clerk_region
  FROM orders WHERE o_orderkey < 3000
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority AS o_clerk_region
  FROM orders WHERE o_orderkey >= 3000 AND o_orderkey < 6000
)
SELECT COALESCE(o_clerk_region, 'unknown') AS region,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
FROM unioned GROUP BY 1
""",
)
def etl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a landed parquet table: an early batch lacks a
    column a later batch added; `mergeSchema` reconciles the footers at
    read time (missing columns -> NULL) — the standard additive-evolution
    contract of a parquet lake. At 100 TB, merge-on-read of footers is
    why additive evolution is free while renames/type-changes need a
    rewrite."""
    out = _tmpdir("schevo")
    o = table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(out + "/b=1")
    o.filter((F.col("o_orderkey") >= 3000) & (F.col("o_orderkey") < 6000)).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("o_clerk_region"),
    ).write.mode("overwrite").parquet(out + "/b=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        out + "/b=1", out + "/b=2"
    )
    return back.groupBy(
        F.coalesce(F.col("o_clerk_region"), F.lit("unknown")).alias("region")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "source_json_corrupt_records",
    category="sources",
    oracle="""
SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_id END AS event_id,
       CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS user_id,
       CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type,
       CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
       event_id % 7 = 0 AS is_corrupt,
       CASE WHEN event_id % 7 = 0
            THEN CAST(LENGTH('{"event_id": ' || CAST(event_id AS VARCHAR)
                             || ', "oops"') AS BIGINT)
       END AS corrupt_len
FROM events
""",
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingestion with corrupt-record capture — the
    ingestion-robustness contract: every 7th event is written as a
    deliberately malformed NDJSON line; the read schema carries a
    _corrupt column, so bad lines surface as (all-null fields + raw
    line) instead of failing the job or being silently dropped. The
    oracle reconstructs the exact expected outcome per row — valid rows
    round-trip bit-exactly (Jackson double round-trip is lossless),
    corrupt rows null out with the malformed line's length — proving no
    row was lost in either direction. At scale this is the dead-letter
    pattern: filter is_corrupt to a quarantine sink, continue the
    pipeline on the rest."""
    out = _tmpdir("jsoncorrupt")
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    line = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(
            F.lit('{"event_id": '),
            F.col("event_id").cast("string"),
            F.lit(', "oops"'),
        ),
    ).otherwise(F.to_json(F.struct("event_id", "user_id", "event_type", "value")))
    e.select(line.alias("value")).write.mode("overwrite").text(out)
    schema = (
        "event_id long, user_id long, event_type string, value double, "
        "_corrupt string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
        F.length("_corrupt").cast("long").alias("corrupt_len"),
    )


@register(
    "source_orc",
    category="sources",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the second columnar format Spark ships natively
    (vectorized reader, predicate pushdown, same pruning machinery as
    parquet). Oracle compares against the ORIGINAL parquet: losslessness
    across the format boundary."""
    out = _tmpdir("orc")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").orc(out)
    return spark.read.schema(_CUSTOMER_SCHEMA).orc(out)


@register(
    "source_xml",
    category="sources",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip (spark-xml graduated into Spark 4 core): write each
    customer as a <customer> row element, read back with an explicit
    schema and rowTag. Doubles survive because Spark writes
    shortest-round-trip decimal text — same exactness contract as the
    CSV/JSON round-trips."""
    out = _tmpdir("xml")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("rowTag", "customer").format("xml").save(out)
    return (
        spark.read.schema(_CUSTOMER_SCHEMA)
        .option("rowTag", "customer")
        .format("xml")
        .load(out)
    )


@register(
    "scan_file_lineage",
    category="sources",
    oracle="""
SELECT 'orders.parquet' AS file_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
""",
)
def scan_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level lineage via the hidden `_metadata` scan column: per input
    file, its row count and key min/max — the zone-map / small-files /
    provenance report every table-maintenance job starts from (compaction
    targets, skipped-file debugging, "which file produced this bad row").
    `_metadata.file_name` is populated by the scan itself — no filesystem
    listing round-trip, no UDF — so at 100 TB this is one normal scan with
    a tiny (n_files-row) aggregate behind it. The DuckDB twin exploits the
    fixture layout invariant (one file per table, pinned by
    test_fixture_contract) to name the file literally; on a multi-file
    table it would read with filename=true + parse_filename."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@register(
    "source_text_roundtrip",
    category="sources",
    oracle="""
SELECT length(text) AS line_len, CAST(COUNT(*) AS BIGINT) AS n_lines,
       min(md5(text)) AS min_md5
FROM documents
GROUP BY length(text)
""",
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text format round trip: document bodies written as a .txt
    corpus (one document per line — the fixture texts carry no
    newlines, measured by the fixture-contract test) and read back with
    the text source, verified by a per-length rollup with md5
    fingerprints — the lossless-ingest proof for the rawest format an
    LLM corpus arrives in. Completes the format matrix
    (parquet/csv/json/orc/xml/text).

    Scale shape: text read is splittable by line, so a 100 TB corpus
    parallelizes by byte ranges; the rollup is map-combined."""
    out = _tmpdir("sinktext")
    d = table(spark, sf_dir, "documents").select("text")
    d.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    return back.groupBy(
        F.length("value").alias("line_len")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min(F.md5(F.col("value"))).alias("min_md5"),
    )


@register(
    "sink_parquet_bloom_filter",
    category="sources",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (42, 777, 1337)
""",
)
def sink_parquet_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom-filter write path: land orders with bloom filters
    (parquet.bloom.filter.enabled; this parquet-mr build ignores the
    per-column '#col' suffix, so the filter applies to the written
    projection and expected NDV sizes the bitsets) plus small row
    groups, then read back with an IN-list predicate.
    At 100 TB this is the needle-in-haystack lever parquet offers beyond
    min/max stats: high-cardinality point predicates skip row groups
    whose bloom says "definitely absent", where min/max ranges are too
    wide to prune anything. Correctness of the round trip is the oracle;
    the bloom bytes actually landing in the footer is pinned by
    test_parquet_bloom_filter_bytes (file-size delta vs a bloom-less
    write of identical data and layout)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = scratch_dir("bloom_sink")
    (
        o.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "20000")
        .option("parquet.block.size", str(1 << 20))
        .parquet(out)
    )
    return spark.read.parquet(out).filter(
        F.col("o_custkey").isin(42, 777, 1337)
    )

@register(
    "source_geojson",
    category="sources",
    oracle=f"""
SELECT c_custkey AS site_id,
       c_mktsegment AS segment,
       {_GEO_SQL_LON.format(k='c_custkey')} AS lon,
       {_GEO_SQL_LAT.format(k='c_custkey')} AS lat
FROM customer
""",
)
def source_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON Feature round-trip — the lingua franca of open disaster
    -data feeds: serialize each site as an RFC 7946 Feature (Point
    geometry, [lon, lat] coordinate order, properties bag), land as
    newline-delimited JSON, read back with an EXPLICIT nested schema
    (struct geometry/coordinates array + properties struct — no
    inference pass), and extract the coordinates and properties. The
    oracle reconstructs the same values straight from the base columns,
    so the whole serialize -> parse -> extract path must be lossless
    (doubles survive because Spark writes shortest round-trip reprs).

    Scale: both directions are narrow per-row projections; the nested
    schema prunes to the accessed fields at the scan.
    """
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lon = _geo_lon(k)
    lat = _geo_lat(k)
    features = c.select(
        F.to_json(
            F.struct(
                F.lit("Feature").alias("type"),
                F.struct(
                    F.lit("Point").alias("type"),
                    F.array(lon, lat).alias("coordinates"),
                ).alias("geometry"),
                F.struct(
                    F.col("c_custkey").alias("site_id"),
                    F.col("c_mktsegment").alias("segment"),
                ).alias("properties"),
            )
        ).alias("feature")
    )
    out = _tmpdir("geojson")
    features.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField(
                "geometry",
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField(
                            "coordinates", T.ArrayType(T.DoubleType())
                        ),
                    ]
                ),
            ),
            T.StructField(
                "properties",
                T.StructType(
                    [
                        T.StructField("site_id", T.LongType()),
                        T.StructField("segment", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.select(
        F.col("properties.site_id").alias("site_id"),
        F.col("properties.segment").alias("segment"),
        F.element_at("geometry.coordinates", 1).alias("lon"),
        F.element_at("geometry.coordinates", 2).alias("lat"),
    )
