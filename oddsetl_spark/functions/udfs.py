"""SURVEY.md §2.J — UDF / UDAF / UDTF surface.

UDFs are the deliberate slow path: each query here demonstrates one rung
of the ladder (row-at-a-time Python -> Arrow-vectorized Pandas -> grouped
UDAF -> table function -> partition-wise mapInPandas) with the built-in
equivalent expressed in the oracle. Production operators in this repo
never use these in a hot loop — they exist for semantics Spark can't
express natively (and as the pattern for the multimodal decode stubs in
streaming/multimodal.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..registry import register


@register(
    "udf_python_scalar",
    category="udfs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'XL'
            WHEN o_totalprice > 150000 THEN 'L'
            ELSE 'S' END AS band
FROM orders WHERE o_orderkey < 2000
""",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (serde per row — benchmark foil for the
    pandas variant; never use this shape in a hot path)."""

    @F.udf(T.StringType())
    def band(price: float) -> str:
        if price > 300000:
            return "XL"
        if price > 150000:
            return "L"
        return "S"

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select("o_orderkey", band("o_totalprice").alias("band"))


@register(
    "udf_pandas_scalar",
    category="udfs",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice * 1.1 + ln(o_totalprice), 6) AS adjusted
FROM orders WHERE o_orderkey < 2000
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF — the acceptable Python path (~10-100x
    the row-at-a-time throughput). numpy's ln matches libm/JVM to the last
    ulp only sometimes -> round(6) on both sides."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def adjust(s: pd.Series) -> pd.Series:
        return s * 1.1 + np.log(s)

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey", F.round(adjust("o_totalprice"), 6).alias("adjusted")
    )


@register(
    "udaf_pandas_grouped",
    category="udfs",
    oracle="""
SELECT l_returnflag,
       round(exp(avg(ln(l_quantity))), 6) AS geo_mean_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (geometric mean) as a GROUPED_AGG pandas UDF — partial
    results are NOT mergeable here, so Spark shuffles full groups; the
    built-in twin exp(avg(ln)) in the oracle is what you'd write at scale."""
    import numpy as np

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def geo_mean(s: pd.Series) -> float:
        return float(np.exp(np.mean(np.log(s))))

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(geo_mean("l_quantity"), 6).alias("geo_mean_qty")
    )


@register(
    "udtf_python",
    category="udfs",
    oracle="""
SELECT doc_id, token, CAST(pos AS INT) AS pos
FROM (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS token,
         unnest(range(len(string_split(lower(text), ' ')))) AS pos
  FROM documents WHERE doc_id < 30
)
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: text -> (token, pos) rows (lateral join), the
    user-extensible unnest. Oracle twin is the built-in explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.lower().split(" ")):
                yield tok, i

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize", Tokenize)
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM udtf_docs d, LATERAL tokenize(d.text) t"
    )


@register(
    "map_in_pandas",
    category="udfs",
    oracle="""
SELECT o_orderkey,
       o_totalprice,
       LEAST(o_totalprice / 1000.0, 500.0) AS score
FROM orders
""",
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise Arrow batch map (the batch-scoring shape: load a
    model once per partition, score each batch). pandas division and
    clip are plain IEEE double ops, so the SQL twin is exact — upgraded
    from the original rows-only check (round 3)."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["o_orderkey", "o_totalprice"]].copy()
            out["score"] = (out["o_totalprice"] / 1000.0).clip(upper=500.0)
            yield out

    o = table(spark, sf_dir, "orders")
    return o.mapInPandas(score, schema="o_orderkey long, o_totalprice double, score double")


@register(
    "map_in_arrow",
    category="udfs",
    oracle="""
SELECT o_orderkey,
       o_totalprice,
       LEAST(o_totalprice / 1000.0, 500.0) AS score
FROM orders
""",
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise RAW Arrow batch map (mapInArrow): like mapInPandas
    but without the pandas conversion on either side — the zero-copy path
    for numpy/Arrow-native batch scoring (pandas round-trips cost ~2x on
    wide numeric batches). Deterministic IEEE arithmetic -> exact SQL
    twin, unlike map_in_pandas' rows-only check."""
    import pyarrow as pa

    def score(batches):
        for batch in batches:
            t = batch.to_pydict()
            import numpy as np

            price = np.asarray(t["o_totalprice"])
            yield pa.record_batch(
                [
                    pa.array(t["o_orderkey"]),
                    pa.array(price),
                    pa.array(np.minimum(price / 1000.0, 500.0)),
                ],
                names=["o_orderkey", "o_totalprice", "score"],
            )

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInArrow(
        score, schema="o_orderkey long, o_totalprice double, score double"
    )


@register(
    "udf_arrow_scalar",
    category="udfs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / (l_quantity + 1.0) AS unit_score
FROM lineitem WHERE l_orderkey < 4000
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python scalar UDF (Spark 4 `useArrow=True`): the
    function body is still row-at-a-time Python, but serialization is
    Arrow-batched instead of pickled row tuples — measured 1.5-2x over
    the legacy path, and the upgrade is one flag, no rewrite. Sits
    between udf_python_scalar (legacy pickling, the §2.J baseline demo)
    and udf_pandas_scalar (vectorized body, the real fast path) to
    complete the UDF performance ladder. Python float division IS IEEE
    double division, so the SQL twin matches bit-for-bit."""

    @F.udf("double", useArrow=True)
    def unit_score(price: float, qty: float) -> float:
        return price / (qty + 1.0)

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 4000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        unit_score(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "unit_score"
        ),
    )


@register(
    "udf_cogrouped_map",
    category="udfs",
    oracle="""
WITH ev AS (
  SELECT user_id AS uid, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events WHERE user_id < 100 GROUP BY user_id
),
od AS (
  SELECT o_custkey AS uid, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_custkey < 100 GROUP BY o_custkey
)
SELECT COALESCE(ev.uid, od.uid) AS user_id,
       COALESCE(ev.n_events, 0) AS n_events,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(ev.value_cents, 0) AS value_cents
FROM ev FULL OUTER JOIN od ON od.uid = ev.uid
""",
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas API (groupBy...cogroup(...).applyInPandas) —
    the last rung of the pandas-function ladder: BOTH sides of a keyed
    pair arrive as per-key pandas frames in one Python call, the shape
    custom per-entity reconciliation (asof merges, interleaved
    event/transaction logic) needs when a plain join can't express it.
    The function here computes the per-user event/order reconciliation
    row — deliberately also SQL-expressible so the cogroup machinery
    itself (key routing, empty-side handling: users with events but no
    orders arrive with an EMPTY right frame, and vice versa) is
    hash-verified. Values snap to exact cents inside pandas so the
    Python stage emits integers only.

    Scale shape: cogroup shuffles both sides on the key once — the
    same exchange a join would pay — then runs embarrassingly parallel
    per key; Arrow moves the per-key frames."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select("user_id", "value")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(F.col("o_custkey").alias("user_id"), "o_orderkey")
    )

    def reconcile(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        uid = ev["user_id"].iloc[0] if len(ev) else od["user_id"].iloc[0]
        cents = (
            int((ev["value"] * 100 + 0.5).apply(float).apply(int).sum())
            if len(ev)
            else 0
        )
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [len(ev)],
                "n_orders": [len(od)],
                "value_cents": [cents],
            }
        )

    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            schema=(
                "user_id long, n_events long, n_orders long, "
                "value_cents long"
            ),
        )
    )


@register(
    "udtf_table_arg",
    category="udfs",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       min(CAST(ts AS TIMESTAMP)) AS first_ts,
       max(CAST(ts AS TIMESTAMP)) AS last_ts
FROM events
WHERE user_id < 40
GROUP BY user_id
""",
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF over a TABLE argument: the function
    receives WHOLE ROWS of a relation, PARTITION BY routes each key's
    rows to one eval stream in arrival order, and terminate() emits the
    per-partition summary — the SQL-surface twin of
    applyInPandasWithState for bounded per-key state machines, callable
    by analysts as a plain table function. State here is O(1) per key
    (counts, distinct-type set, ts bounds), shuffled once on user_id by
    the PARTITION BY clause. The oracle is the equivalent relational
    aggregate, so a partition-routing bug (rows of one user split across
    eval streams) double-counts and hash-fails."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id: bigint, n_events: bigint, n_types: bigint, "
        "first_ts: timestamp, last_ts: timestamp"
    ))
    class UserSummary:
        def __init__(self):
            self._uid = None
            self._n = 0
            self._types = set()
            self._lo = None
            self._hi = None

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            self._types.add(row["event_type"])
            ts = row["ts"]
            if self._lo is None or ts < self._lo:
                self._lo = ts
            if self._hi is None or ts > self._hi:
                self._hi = ts

        def terminate(self):
            if self._uid is not None:
                yield (
                    self._uid,
                    self._n,
                    len(self._types),
                    self._lo,
                    self._hi,
                )

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    e.createOrReplaceTempView("udtf_events")
    spark.udtf.register("user_summary", UserSummary)
    return spark.sql(
        "SELECT * FROM user_summary(TABLE(udtf_events) PARTITION BY user_id)"
    )
