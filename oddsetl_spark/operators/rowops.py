"""SURVEY.md §2.B — projection / filter / row-level operators.

All expressions use raw columns so Catalyst pushes predicates and pruning
into the parquet scan (verified by plan-shape tests in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import dsum, sql_davg, sql_dsum


@register(
    "project_compute",
    category="rowops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
       CAST(l_quantity * 2 AS DOUBLE) AS double_qty,
       l_extendedprice + l_tax AS price_plus_tax
FROM lineitem
WHERE l_orderkey < 1000
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection — scalar double math is IEEE-identical per row."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * 2).alias("double_qty"),
        (F.col("l_extendedprice") + F.col("l_tax")).alias("price_plus_tax"),
    )


@register(
    "filter_conjunctive",
    category="rowops",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_totalprice BETWEEN 50000 AND 200000)
  AND (o_orderstatus IN ('F', 'O'))
  AND NOT (o_orderpriority = '5-LOW' OR o_orderpriority = '4-NOT SPECIFIED')
""",
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + BETWEEN + IN, all pushable predicates."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").isin("F", "O")
        & ~((F.col("o_orderpriority") == "5-LOW") | (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_like_regex",
    category="rowops",
    oracle="""
SELECT p_partkey, p_name, p_type, p_brand
FROM part
WHERE p_type LIKE '%ECONOMY%'
   OR regexp_matches(p_brand, '^Brand#1[0-9]$')
""",
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and RLIKE predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ECONOMY%") | F.col("p_brand").rlike("^Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@register(
    "filter_null_semantics",
    category="rowops",
    oracle="""
WITH e AS (
  SELECT event_id,
         NULLIF(event_type, 'error') AS et,
         CASE WHEN value > 100 THEN value END AS big_value
  FROM events
)
SELECT
  COUNT(*) AS n_total,
  COUNT(et) AS n_et_not_null,
  CAST(SUM(CASE WHEN et IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_et_null,
  COUNT(big_value) AS n_big,
  COALESCE(MIN(CASE WHEN et IS NULL THEN event_id END), -1) AS first_null_id
FROM e
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL over manufactured NULLs (fixtures have none)."""
    e = table(spark, sf_dir, "events")
    withn = e.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("et"),
        F.when(F.col("value") > 100, F.col("value")).alias("big_value"),
    )
    return withn.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("et").alias("n_et_not_null"),
        F.sum(F.when(F.col("et").isNull(), 1).otherwise(0)).alias("n_et_null"),
        F.count("big_value").alias("n_big"),
        F.coalesce(
            F.min(F.when(F.col("et").isNull(), F.col("event_id"))), F.lit(-1)
        ).alias("first_null_id"),
    )


@register(
    "cast_types",
    category="rowops",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int
FROM orders
WHERE o_orderkey < 500
""",
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix: ts->date, double->decimal->string, int->string, double->bigint.

    Spark CAST(double AS bigint) truncates toward zero while DuckDB rounds,
    so both sides go through FLOOR to pin the semantics.
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_int"),
    )


@register(
    "distinct_rows",
    category="rowops",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-03-01 00:00:00'
""",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate on all columns; partial dedup before shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1995-03-01 00:00:00").cast("timestamp"))
        .select("l_returnflag", "l_linestatus", "l_shipdate")
        .distinct()
    )


@register(
    "dedup_by_key",
    category="rowops",
    oracle="""
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-key, deterministic via row_number (oracle-matchable,
    unlike dropDuplicates' arbitrary row). Scale: single shuffle on the key;
    at 100 TB prefer this over dropDuplicates for reproducibility anyway.
    """
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "explode_tokens",
    category="rowops",
    oracle="""
SELECT d.doc_id, t.token
FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
WHERE d.doc_id < 50 AND t.token <> ''
""",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral unnest of a split array (tokenization primitive)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )


def sample_deterministic_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: the seeded Bernoulli sample rows themselves.
    Reproducibility (same seed -> identical row set) is pytest-asserted."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@register(
    "sample_deterministic",
    category="rowops",
    oracle="""
SELECT COUNT(*) AS n_total, TRUE AS frac_ok, TRUE AS seed_stable_ok
FROM lineitem
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample. WHICH rows are drawn is engine-RNG-specific
    (can never hash-match an oracle); what the oracle CAN verify is the
    sampling contract: the draw count lands within 4 binomial sigma of
    fraction*n, and the seed makes the draw reproducible (two independent
    sample operators with the same seed in ONE plan draw identical
    counts). The seeded draw is deterministic per dataset, so the flags
    cannot flap. Exact n_total anchors the check to the real table. The
    sampled rows themselves are sample_deterministic_raw; hash-bucket
    sampling (fully oracle-checkable) is sample_hash_bucket."""
    li = table(spark, sf_dir, "lineitem")
    s1 = sample_deterministic_raw(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    s2 = sample_deterministic_raw(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_again")
    )
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    sigma = F.sqrt(F.col("n_total") * 0.1 * 0.9)
    return total.crossJoin(s1).crossJoin(s2).select(
        "n_total",
        (
            F.abs(F.col("n_sampled") - F.col("n_total") * 0.1) <= sigma * 4 + 1
        ).alias("frac_ok"),
        (F.col("n_sampled") == F.col("n_again")).alias("seed_stable_ok"),
    )


_SQL_CTE_SUBQUERY = """
WITH big_spenders AS (
  SELECT o_custkey, {dsum} AS spent
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, b.spent
FROM customer c
JOIN big_spenders b ON b.o_custkey = c.c_custkey
WHERE EXISTS (SELECT 1 FROM events e
              WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase')
  AND b.spent > (SELECT {davg} FROM orders)
"""


@register(
    "sql_cte_subqueries",
    category="rowops",
    oracle=_SQL_CTE_SUBQUERY.format(
        dsum=sql_dsum("o_totalprice"), davg=sql_davg("o_totalprice")
    ),
)
def sql_cte_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry path (SURVEY §3, ANTLR parser -> same Catalyst
    stages): CTE + correlated EXISTS + uncorrelated scalar subquery in one
    statement. Catalyst decorrelates the EXISTS to a left-semi join and
    turns the scalar subquery into a one-row broadcast — identical
    physical machinery to the DataFrame formulations, proving the two
    front-ends converge."""
    for t in ("customer", "orders", "events"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        _SQL_CTE_SUBQUERY.format(
            dsum=sql_dsum("o_totalprice"), davg=sql_davg("o_totalprice")
        )
    )


_SQL_RECURSIVE = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('1995-12-01' AS DATE)
)
SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
FROM months
LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
GROUP BY m
"""


@register("sql_recursive_cte", category="rowops", oracle=_SQL_RECURSIVE)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x WITH RECURSIVE): generate a 12-month
    calendar spine by recursion, left-join monthly order counts — the
    same statement runs verbatim on DuckDB. Complements the iterative
    driver-loop pattern of dedup_components with engine-native recursion
    (UnionLoop in the physical plan)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_RECURSIVE)


_SQL_LATERAL = """
SELECT o.o_orderkey, o.o_totalprice, t.l_linenumber, t.l_extendedprice
FROM orders o,
LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem
         WHERE l_orderkey = o.o_orderkey
         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
WHERE o.o_orderkey < 2000
"""


@register("sql_lateral_topk", category="rowops", oracle=_SQL_LATERAL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — 'top 2 line
    items per order' phrased as a lateral join (Spark 4 + DuckDB run the
    identical statement). Catalyst decorrelates the per-row subquery into
    a joined window-rank plan, so execution is ONE shuffle on the join
    key, not an O(orders) re-scan of lineitem — the plan a naive
    nested-loop reading would suggest. The unique l_linenumber tiebreak
    makes the LIMIT deterministic."""
    for t in ("orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_LATERAL)


_SQL_NULL_TRAP = """
WITH sub AS (
  SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END AS ck
  FROM orders
)
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT ck FROM sub)) AS n_not_in,
  (SELECT COUNT(*) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.ck = c.c_custkey))
    AS n_not_exists,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey IN (SELECT ck FROM sub)) AS n_in,
  (SELECT COUNT(*) FROM customer c
   WHERE EXISTS (SELECT 1 FROM sub s WHERE s.ck = c.c_custkey)) AS n_exists
"""


@register("sql_exists_null_trap", category="rowops", oracle=_SQL_NULL_TRAP)
def sql_exists_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI three-valued logic where it bites: the subquery contains one
    NULL, so NOT IN returns 0 rows (x <> NULL is UNKNOWN for every x)
    while NOT EXISTS performs the intended anti-join — the single most
    common silent-wrong-answer bug in analytics SQL. The IDENTICAL
    statement runs on both engines and must agree cell-for-cell. Scale
    note: Spark compiles NOT IN to a null-aware anti join that supports
    ONLY broadcast of the subquery side — on a 100 TB right side it
    fails outright, which is itself an argument for writing NOT EXISTS
    (plain anti-join, any strategy)."""
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_NULL_TRAP)


@register(
    "sql_parameterized",
    category="rowops",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice >= 250000.0 AND o_orderstatus = 'O'
""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized spark.sql (Spark 3.4+ named-parameter binding): the
    injection-safe front door for templated analytics — parameters bind
    as typed literals in the parser, not string concatenation, so a
    malicious or odd value can never change the statement shape. The
    oracle is the same query with the literals inlined."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        """,
        args={"min_price": 250000.0, "status": "O"},
    )


@register(
    "sql_date_spine",
    category="rowops",
    oracle="""
WITH months AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1996-12-01',
                                INTERVAL 1 MONTH))::DATE AS month_start
)
SELECT m.month_start,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 END), 0)
            AS BIGINT) AS n_rows_joined
FROM months m
LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month_start
GROUP BY m.month_start
""",
)
def sql_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine via sequence() + explode — the SCALABLE spine
    generator (a pure narrow expression evaluated in parallel), joined
    with monthly order counts so empty months surface as zero rows.
    Complements sql_recursive_cte, which builds the same spine with
    engine recursion: recursion iterates on the driver-side loop state,
    sequence() is data-parallel from the first task — at 100 TB you
    generate spines with sequence, and keep recursion for genuinely
    recursive structure (hierarchies, reachability)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    j = months.join(
        o,
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        == F.col("month_start"),
        "left",
    )
    return j.groupBy("month_start").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderkey").isNotNull(), 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_rows_joined"),
    )


@register(
    "sample_hash_bucket",
    category="rowops",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
            % 100 AS BIGINT) AS bucket
FROM orders
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
      % 100 < 5
""",
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% hash-bucket sample — the reproducible twin of
    sample_deterministic (whose Bernoulli RNG is engine-specific and thus
    rows-only). Bucketing on md5(key) % 100 gives the properties a training
    pipeline actually wants from a sample: stable across runs, engines and
    cluster sizes; growable (bucket < 10 is a strict superset of
    bucket < 5); and join-consistent (the same keys are sampled in every
    table that hashes the same key). Pure narrow map — no shuffle, fully
    pushable; md5 parity with DuckDB is bit-exact (same primitive as
    dedup_minhash_det)."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        bucket.alias("bucket"),
    ).filter(F.col("bucket") < 5)


@register(
    "rowops_column_masking",
    category="rowops",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 50 = 0 THEN c_name
            ELSE concat('Customer#', repeat('*', 9)) END AS name_masked,
       concat(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8), '@masked')
         AS contact_token,
       CAST(FLOOR(c_acctbal/1000) AS BIGINT)*1000 AS acctbal_band,
       c_mktsegment
FROM customer
""",
)
def rowops_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic column masking — the governance projection a
    policy-enforcing view applies before analysts see the table:
    names redact to a fixed-shape mask except for an allow-listed
    slice (the deterministic stand-in for a role predicate), contact
    identity is replaced by a STABLE pseudonymous token (md5 prefix —
    joinable across tables, unlinkable to the identity; tokenization,
    not suppression), and exact balances coarsen to 1000-unit bands
    (the k-anonymity generalization move, see curate_k_anonymity).
    Masking is row-independent, so the policy composes with any
    downstream query unchanged.

    Scale shape: pure narrow projection, zero shuffles, fully
    pushdown-compatible — the mask costs nothing at any scale, which
    is why policy views are the right enforcement point."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 50 == 0, F.col("c_name"))
        .otherwise(F.concat(F.lit("Customer#"), F.lit("*" * 9)))
        .alias("name_masked"),
        F.concat(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
            F.lit("@masked"),
        ).alias("contact_token"),
        (F.floor(F.col("c_acctbal") / 1000).cast("long") * 1000).alias(
            "acctbal_band"
        ),
        "c_mktsegment",
    )
