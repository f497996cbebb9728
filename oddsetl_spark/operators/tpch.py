"""TPC-H analytics suite (Q1-Q22) over the fixture star schema.

The fixtures are TPC-H-like but not TPC-H-complete: there is no partsupp
table, and several canonical columns are absent (l_commitdate,
l_receiptdate, l_shipmode, l_shipinstruct, o_shippriority, o_clerk,
p_container, p_mfgr, c_phone/address, all comment columns). Queries whose
canonical text needs a missing table/column are implemented as
SHAPE-PRESERVING adaptations: the join graph, subquery structure
(correlated EXISTS / NOT EXISTS, scalar subqueries, HAVING thresholds,
nested aggregation), and aggregate discipline are the canonical ones, with
the missing predicate replaced by an equivalent one over existing columns.
Every adaptation is disclosed in the docstring. Date constants are shifted
into the fixtures' 1995-2001 range.

Scale posture (100 TB lineitem):
- region/nation/supplier/part/customer are dimension tables -> broadcast;
  only lineitem<->orders joins shuffle (sort-merge on the key, AQE skew).
- All money aggregations use the scaled-long exact path (_helpers.py) so
  the DuckDB oracle hash-matches bit-for-bit AND partial aggregation
  stays in primitive whole-stage-codegen adds.
- Global top-k (Q3/Q10/Q18) is orderBy().limit(k) -> Spark plans
  TakeOrderedAndProject: per-partition heap top-k merged on the driver,
  never a single-partition window.
- Correlated EXISTS/NOT EXISTS compile to left-semi / left-anti joins;
  per-group correlated scalars (Q17's 0.2*avg) are a groupBy + re-join,
  touching each fact row twice, never once per (row, group) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register, register_alias
from ._helpers import (
    lng,
    lsum,
    scaled_group_sums,
    sql_lavg,
    sql_lsum,
)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# Q1 is the repo flagship, registered as agg_groupby_multi
# (aggregates.py) with the identical canonical text; alias it so the
# suite is addressable as tpch_q01..q22. Registered at import time in
# _register_q01_alias() below (after aggregates import ordering).


@register(
    "tpch_q02",
    category="tpch",
    oracle="""
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
),
mc AS (
  SELECT l_partkey AS mpk, MIN(unit_cost) AS min_cost
  FROM cost GROUP BY l_partkey
)
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_brand,
       c.unit_cost AS supply_cost
FROM cost c
JOIN mc ON c.l_partkey = mc.mpk AND c.unit_cost = mc.min_cost
JOIN eu_supp s ON c.l_suppkey = s.s_suppkey
JOIN part p ON p.p_partkey = c.l_partkey
WHERE p.p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
""",
)
def tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier — ADAPTED: no partsupp table, so
    ps_supplycost is replaced by the supplier's observed unit price
    MIN(l_extendedprice/l_quantity) from lineitem; part filter widened to
    p_size 10-20 (fixture part table is small). Canonical shape kept:
    per-(part,supplier) cost table, correlated min-cost scalar subquery
    re-expressed as groupBy + equi-join on (part, cost), region-filtered
    supplier dimension.

    Scale: eu_supp and part are broadcast; the only shuffle is the
    (partkey, suppkey) groupBy of lineitem. The min==cost equality join
    is exact: the min of a set of IEEE doubles is bitwise one of them.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    mc = cost.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    pf = p.filter((F.col("p_size").between(10, 20)) & (F.col("p_type") == "LARGE"))
    return (
        cost.join(mc, (cost.l_partkey == mc.mpk) & (cost.unit_cost == mc.min_cost))
        .join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(pf), cost.l_partkey == pf.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("unit_cost").alias("supply_cost"),
        )
    )


@register(
    "tpch_q03",
    category="tpch",
    oracle=f"""
SELECT l_orderkey,
       {sql_lsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority — canonical text minus o_shippriority (column
    absent; constant anyway in the canonical data). Top-10 orders by
    revenue for BUILDING customers, orders before / ships after the date.

    Scale: customer is broadcast after its segment filter; orders joins
    lineitem sort-merge on the key with both date filters pushed to the
    scans. The top-10 is orderBy().limit(10) -> TakeOrderedAndProject
    (per-partition heaps, no global sort shuffle); l_orderkey tiebreak
    makes the cut deterministic.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q04",
    category="tpch",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
GROUP BY o_orderpriority
""",
)
def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking — ADAPTED lateness predicate: the
    canonical l_commitdate < l_receiptdate columns are absent, so "late"
    is l_shipdate > o_orderdate + 45 days. The correlated EXISTS shape is
    kept and compiles to a LEFT SEMI join with the extra non-equi
    condition attached to the join.

    Scale: the quarter filter prunes orders before the semi-join; the
    semi-join shuffles on orderkey only (no row multiplication — semi
    output is bounded by orders).
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q05",
    category="tpch",
    oracle=f"""
SELECT n_name, {sql_lsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume — canonical: revenue by supplier nation
    for orders where customer and supplier share an ASIA nation.

    Scale: supplier/nation/region broadcast; customer broadcasts at
    fixture scale and would bucket-join at 100 TB; the lineitem-orders
    join is the only big shuffle. Revenue via scaled_group_sums (25
    nations -> tiny final merge).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return scaled_group_sums(
        j,
        keys=["n_name"],
        sums={"revenue": F.col("l_extendedprice") * (1 - F.col("l_discount"))},
    )


@register(
    "tpch_q06",
    category="tpch",
    oracle=f"""
SELECT {sql_lsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue change — canonical. Pure scan-filter-sum; all
    three predicates push to the parquet scan, the sum partials complete
    map-side (scaled-long path), and the shuffle carries one row per
    partition.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return scaled_group_sums(
        li, keys=[], sums={"revenue": F.col("l_extendedprice") * F.col("l_discount")}
    )


@register(
    "tpch_q07",
    category="tpch",
    oracle=f"""
SELECT supp_region, cust_region, l_year,
       {sql_lsum('volume')} AS revenue
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
      OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_region, cust_region, l_year
""",
)
def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping — ADAPTED granularity: the canonical two-NATION
    pair is empty at fixture supplier cardinality, so the pair is lifted
    one level to regions (ASIA<->EUROPE both directions); the disjunctive
    pair predicate, dual nation/region joins, and per-year rollup are the
    canonical shape.

    Scale: all four dim joins broadcast; lineitem-orders sort-merge is
    the one shuffle; 2x2xyears groups via scaled_group_sums.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_regionkey").alias("srk"))
    n2 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    r1 = r.select(F.col("r_regionkey").alias("srk2"), F.col("r_name").alias("supp_region"))
    r2 = r.select(F.col("r_regionkey").alias("crk2"), F.col("r_name").alias("cust_region"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("snk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r1), F.col("srk") == F.col("srk2"))
        .join(F.broadcast(r2), F.col("crk") == F.col("crk2"))
        .filter(
            ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
            | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
    )
    return scaled_group_sums(
        j,
        keys=["supp_region", "cust_region", "l_year"],
        sums={"revenue": F.col("l_extendedprice") * (1 - F.col("l_discount"))},
    )


@register(
    "tpch_q08",
    category="tpch",
    oracle="""
SELECT o_year,
       CAST(SUM(CAST(FLOOR(nation_volume*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(FLOOR(volume*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         CASE WHEN n2.n_name = 'NATION_3'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS nation_volume
  FROM part JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
""",
)
def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share — canonical (nation renamed to the
    fixture's NATION_3): the share of AMERICA-region STANDARD-part volume
    supplied by NATION_3 suppliers, per order year.

    Exactness: numerator and denominator are both scaled-long exact sums;
    the final ratio is ONE double division of bit-identical operands on
    both engines. Scale: dims broadcast, one fact shuffle, 2 group rows.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    n2 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("snk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.when(F.col("supp_nation") == "NATION_3", vol)
            .otherwise(F.lit(0.0))
            .alias("nation_volume"),
        )
    )
    sums = j.groupBy("o_year").agg(
        F.sum(lng(F.col("nation_volume"))).alias("_num"),
        F.sum(lng(F.col("volume"))).alias("_den"),
    )
    # Divide the RAW long sums (scales cancel) — the oracle does the same
    # single division, so the doubles are bit-identical; unscaling each
    # side first would round twice and drift a ulp.
    return sums.select(
        "o_year",
        (F.col("_num").cast("double") / F.col("_den").cast("double")).alias("mkt_share"),
    )


@register(
    "tpch_q09",
    category="tpch",
    oracle=f"""
SELECT n_name AS nation, o_year, {sql_lsum('amount')} AS sum_profit
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.4 * p_retailprice * l_quantity AS amount
  FROM part JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY n_name, o_year
""",
)
def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit — ADAPTED cost basis: no partsupp, so
    ps_supplycost is replaced by 0.4 * p_retailprice (a fixed-margin cost
    proxy from the part dimension); part filter is p_name LIKE '%red%'
    (fixture names are 'adjective noun'). Join graph, per-(nation, year)
    rollup, and profit expression shape are canonical.

    Exactness: amount has <= 6 decimals (price*qty*0.4 has 3; the scaled
    -long grid at 1e6 holds both terms exactly). Scale: part/supplier/
    nation broadcast; lineitem-orders is the shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return scaled_group_sums(
        j, keys=["nation", "o_year"], sums={"sum_profit": F.col("amount")}
    )


@register(
    "tpch_q10",
    category="tpch",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_lsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting — canonical minus the absent
    c_address/c_phone/c_comment output columns. Top-20 customers by
    revenue lost to returns in a quarter.

    Scale: quarter + returnflag filters push to the scans; customer and
    nation broadcast; TakeOrderedAndProject top-20 with c_custkey
    tiebreak (custkey is the group key -> fully deterministic cut).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q11",
    category="tpch",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey, {sql_lsum('l_extendedprice * l_quantity')} AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7', 'NATION_8', 'NATION_9')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value
FROM pv
WHERE value > (SELECT CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 FROM pv) * 0.002
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock identification — ADAPTED: no partsupp, so a
    part's held value is SUM(l_extendedprice * l_quantity) shipped by
    suppliers of a nation group (5 fixture nations stand in for GERMANY).
    The canonical scalar-subquery HAVING threshold (value > fraction of
    the national total) is kept, with the fraction at 0.002.

    Exactness: per-part values are exact scaled sums; the global total
    re-aggregates those exact values on the same grid, and the threshold
    compare is scalar double arithmetic. Scale: the per-part groupBy is
    the shuffle; the global total is a broadcast one-row cross join, not
    a driver collect.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7", "NATION_8", "NATION_9")
    )
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(lsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = pv.agg(lsum(F.col("value")).alias("_total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_total") * 0.002)
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "tpch_q12",
    category="tpch",
    oracle="""
SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority — ADAPTED: l_shipmode and the
    commit/receipt dates are absent, so the grouping column is
    l_linestatus and "late" is shipped >30 days after order date. The
    canonical urgent/non-urgent CASE counting and year window are kept.

    Scale: one sort-merge join on orderkey with the year filter pushed;
    the lateness predicate is evaluated post-join (it references both
    sides); 2 group rows out.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    category="tpch",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution — ADAPTED filter: the
    canonical o_comment NOT LIKE '%special%requests%' is absent, so the
    excluded class is priority '4-NOT SPECIFIED'. The two-level shape is
    canonical: LEFT JOIN with the filter IN the join condition (so
    zero-order customers survive with count 0), then the histogram.

    Scale: first groupBy shuffles on custkey (or none if the join
    broadcasts customer); the histogram aggregates ~50 distinct counts.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14",
    category="tpch",
    oracle="""
SELECT 100.00 *
       CAST(SUM(CAST(FLOOR(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
     / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect — canonical (p_type = 'PROMO' exactly; the
    fixture type is a single word, not 'PROMO BURNISHED...'). Share of
    one month's revenue from promo parts.

    Exactness: both sums on the scaled-long grid; ratio and *100 are
    scalar double ops. The unscale divisions cancel, so the Spark side
    divides the raw long sums directly — bit-identical to the oracle's
    unscaled-then-divided doubles? No: it mirrors the oracle exactly by
    casting each long sum to double first, then dividing (same two
    operands, same one division).

    Scale: month filter pushed; part broadcast; single-row output.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    sums = j.agg(
        F.sum(lng(promo)).alias("_np"),
        F.sum(lng(disc_price)).alias("_nd"),
    )
    return sums.select(
        (
            F.lit(100.00)
            * F.col("_np").cast("double")
            / F.col("_nd").cast("double")
        ).alias("promo_revenue")
    )


@register(
    "tpch_q15",
    category="tpch",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_lsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier — canonical: the supplier(s) with max quarterly
    revenue, via a revenue view + scalar MAX subquery.

    Exactness: per-supplier revenue is an exact scaled sum; MAX of exact
    doubles is bitwise one of them, so the equality join is safe.
    Scale: per-suppkey groupBy is the shuffle; the max is a broadcast
    one-row cross join; supplier dim broadcast.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16",
    category="tpch",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship — ADAPTED: no partsupp, so the
    part-supplier pairs come from lineitem; the canonical NOT IN
    complaint-supplier exclusion (comment LIKE) is replaced by negative
    account balance. Brand exclusion, size IN-list, and
    COUNT(DISTINCT supplier) per (brand, type, size) are canonical.

    Scale: part broadcast; the NOT IN compiles to a broadcast left-anti
    join (supplier is a dim; the subquery is provably non-null so no
    null-semantics nested loop); count-distinct shuffles on the group
    keys with partial dedup map-side.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    category="tpch",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS apk,
         0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
           AS qty_limit
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       / 1000000 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN pa ON apk = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_limit
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue — canonical minus the absent
    p_container predicate (brand filter only). Revenue/7 from lines below
    20% of the part's average quantity; the correlated scalar avg is
    decorrelated into a per-part groupBy + re-join.

    Exactness: l_quantity is integral (measured), so SUM(BIGINT)/COUNT is
    an exact double; 0.2* and the < compare are scalar. The outer sum is
    scaled-long exact. Scale: the per-part agg shuffles lineitem once;
    at 100 TB the re-join is sort-merge on partkey; part broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("apk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_limit")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("apk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return j.agg((lsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))


@register(
    "tpch_q18",
    category="tpch",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers — canonical with threshold 250 (sized
    to the fixture's ~4 lines/order so the answer is non-empty; canonical
    300 selects nothing). IN-subquery over a HAVING aggregate ->
    left-semi join against the qualifying orderkey set.

    Exactness: integral quantities summed as longs, cast to double at
    the end (canonical output is a sum column). Scale: the HAVING
    pre-agg shuffles lineitem on orderkey; the semi-join reuses that
    partitioning; customer broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bok"),
                li.l_orderkey == F.col("_bok"), "inner")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"))
    )


@register(
    "tpch_q19",
    category="tpch",
    oracle=f"""
SELECT {sql_lsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 20
       AND p_size BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30
       AND p_size BETWEEN 1 AND 25)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 40
       AND p_size BETWEEN 1 AND 35)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue (disjunctive predicates) — ADAPTED ranges:
    p_container and l_shipmode/l_shipinstruct are absent, so each of the
    three OR branches keeps its canonical brand + quantity-band + size
    -band conjunction (bands widened for fixture cardinality). The point
    of Q19 — a disjunction of multi-table conjunctions evaluated on a
    single equi-join, not three scans — is preserved.

    Scale: ONE broadcast hash join on partkey; the disjunction is a
    post-join filter in whole-stage codegen; single-row exact sum out.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 20)
            & F.col("p_size").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 30)
            & F.col("p_size").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 40)
            & F.col("p_size").between(1, 35)
        )
    )
    return scaled_group_sums(
        j, keys=[], sums={"revenue": F.col("l_extendedprice") * (1 - F.col("l_discount"))}
    )


@register(
    "tpch_q20",
    category="tpch",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS sq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
),
tot AS (
  SELECT l_partkey AS tpk, SUM(CAST(l_quantity AS BIGINT)) AS tq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN shipped ON l_suppkey = s_suppkey
JOIN tot ON tpk = l_partkey
WHERE sq * 2 > tq
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion — ADAPTED: no partsupp availqty, so a
    supplier qualifies if it shipped MORE THAN HALF of some PROMO part's
    1997 volume (dominant supplier; canonical: availqty > half the year's
    shipments). The nested-aggregation + semi-join-to-supplier shape is
    canonical; the threshold compare is integer (sq*2 > tq), exact.

    Scale: two lineitem aggregations (one filtered by broadcast part),
    joined on partkey — both reuse the same hash partitioning; DISTINCT
    supplier output is bounded by the supplier dim.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sq"))
    )
    tot = li.groupBy(F.col("l_partkey").alias("tpk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("tq")
    )
    return (
        shipped.join(tot, shipped.l_partkey == F.col("tpk"))
        .filter(F.col("sq") * 2 > F.col("tq"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "tpch_q21",
    category="tpch",
    oracle="""
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
flagged AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supp,
         SUM(is_late) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM per GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp >= 2 AND n_late = 1
  AND n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
GROUP BY s_name
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting — ADAPTED lateness (shipped
    >60 days after order date; receipt/commit dates absent) and a nation
    GROUP standing in for SAUDI ARABIA. The canonical correlated
    EXISTS (another supplier contributed) / NOT EXISTS (no OTHER supplier
    was late) pair is decorrelated into one per-(order, supplier) rollup
    + one per-order rollup: the order qualifies iff n_supp >= 2 and
    exactly one supplier was late — bitwise the same predicate, with the
    late supplier recovered by MAX over the single-element set.

    Scale: the canonical form self-joins lineitem twice; this form
    aggregates it twice on the same orderkey partitioning — strictly less
    shuffle volume, no row blowup on multi-line orders.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    flagged = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        flagged.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22",
    category="tpch",
    oracle=f"""
WITH active AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
  FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
),
avg_bal AS (
  SELECT {sql_lavg('c_acctbal')} AS ab
  FROM active WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(FLOOR(c_acctbal*1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       / 1000000 AS totacctbal
FROM active, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = active.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity — ADAPTED: c_phone is absent, so the
    country code is c_nationkey % 5 (codes 0-2 selected); "no orders"
    would be empty (every fixture customer has orders), so the anti
    condition is "no orders since 2000-01-01" — a lapsed-customer NOT
    EXISTS with the same left-anti compilation. Scalar-subquery average
    balance threshold is canonical.

    Exactness: the average is an exact scaled sum / count; the threshold
    compare and %-arithmetic are scalar. Scale: the anti-join shuffles
    the date-filtered orders projection on custkey; avg is a broadcast
    one-row cross join.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 5).alias("cntrycode")
    ).filter(F.col("cntrycode").isin(0, 1, 2))
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (lsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            lsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


def _register_q01_alias() -> None:
    # agg_groupby_multi (aggregates.py) IS canonical Q1; operators/__init__
    # imports aggregates before tpch, so the alias target exists here.
    register_alias("tpch_q01", "agg_groupby_multi", category="tpch")


_register_q01_alias()
