"""SURVEY.md §2.G — set operations.

UNION ALL is a zero-shuffle concat; the DISTINCT/INTERSECT/EXCEPT family
all hash-aggregate on the full row — Spark plans partial distinct before
the exchange, so shuffled volume is bounded by distinct cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


def _clickers(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "click").select("user_id")


def _viewers(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "view").select("user_id")


@register(
    "set_union_all",
    category="setops",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
UNION ALL
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _clickers(spark, sf_dir).unionAll(_viewers(spark, sf_dir))


@register(
    "set_union_distinct",
    category="setops",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _clickers(spark, sf_dir).union(_viewers(spark, sf_dir)).distinct()


@register(
    "set_union_by_name",
    category="setops",
    oracle="""
SELECT c_custkey AS entity_id, c_acctbal AS balance, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey AS entity_id, s_acctbal AS balance, 'supplier' AS kind FROM supplier
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union (column order differs between inputs)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("balance"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    category="setops",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    return _clickers(spark, sf_dir).intersect(p)


@register(
    "set_intersect_all",
    category="setops",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect (multiplicity = min of the two sides)."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


@register(
    "set_except",
    category="setops",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 80
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewers with no high-value purchase. The right side is narrowed to
    value > 80 because on the fixtures every user has every event type —
    a bare viewers-minus-purchasers EXCEPT is empty at all SFs, which
    would make the differential check trivially true (2/13/84 rows at
    sf0.001/0.01/0.1 with the narrowing)."""
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id")
    p = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 80)
    ).select("user_id")
    return v.subtract(p)


@register(
    "set_except_all",
    category="setops",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity = left count - right count, floor 0)."""
    o = table(spark, sf_dir, "orders")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return op.exceptAll(f)


@register(
    "set_symmetric_diff",
    category="setops",
    oracle="""
(SELECT user_id FROM events WHERE event_type = 'click' AND value > 95
 EXCEPT
 SELECT user_id FROM events WHERE event_type = 'view' AND value > 95)
UNION ALL
(SELECT user_id FROM events WHERE event_type = 'view' AND value > 95
 EXCEPT
 SELECT user_id FROM events WHERE event_type = 'click' AND value > 95)
""",
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference (users in exactly one of two cohorts) as the
    union of the two directed EXCEPTs — the cohort-drift set a monitoring
    job diffs between snapshots. High-value cohorts (value > 95) keep the
    memberships sparse enough to actually differ at every fixture scale. The two halves are disjoint by
    construction, so UNION ALL (no final distinct shuffle) is correct;
    each EXCEPT hash-aggregates to distinct cardinality before its
    exchange."""
    e = table(spark, sf_dir, "events").filter(F.col("value") > 95)
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.subtract(b).unionAll(b.subtract(a))
