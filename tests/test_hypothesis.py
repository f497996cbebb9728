"""Property-based tests (SURVEY §5.2) — algebraic invariants over
GENERATED data, complementing the fixture-based invariants in
test_properties.py. Each property runs few examples (a Spark job per
example) but explores the input space the fixtures can't.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import oddsetl_spark  # noqa: F401
from oddsetl_spark.operators._helpers import dsum

_FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# money-like doubles: two decimals, magnitudes up to 1e6
_money = st.integers(min_value=-10**8, max_value=10**8).map(lambda c: c / 100.0)


@given(vals=st.lists(_money, min_size=1, max_size=200))
@_FAST
def test_dsum_is_order_and_partitioning_insensitive(spark, vals):
    """The core oracle discipline: dsum (decimal-cast exact sum) must give
    bit-identical doubles for ANY row order and ANY partitioning — this
    is what makes Spark-vs-DuckDB hash comparison possible, and what
    makes results stable under cluster reordering at 100 TB."""
    rows = [(v,) for v in vals]

    def total(data, parts):
        df = spark.createDataFrame(data, "x double").repartition(parts)
        return df.agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]

    fwd = total(rows, 1)
    rev = total(list(reversed(rows)), 7)
    assert fwd == rev  # exact equality, not approx
    # and both equal the exact decimal reference computed driver-side
    ref = float(sum(Decimal(str(v)).quantize(Decimal("0.000001")) for v in vals))
    assert fwd == ref


@given(
    left=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    right=st.lists(st.integers(0, 30), max_size=60),
)
@_FAST
def test_semi_anti_partition_generated(spark, left, right):
    """left_semi(L,R) and left_anti(L,R) partition L exactly, for any
    multisets of keys (null-free)."""
    ldf = spark.createDataFrame([(k, i) for i, k in enumerate(left)], "k int, i int")
    rdf = spark.createDataFrame([(k,) for k in right] or [(None,)], "k int").filter(
        F.col("k").isNotNull()
    )
    semi = ldf.join(rdf, "k", "left_semi")
    anti = ldf.join(rdf, "k", "left_anti")
    assert semi.count() + anti.count() == ldf.count()
    both = semi.select("i").intersect(anti.select("i"))
    assert both.count() == 0


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=80)
)
@_FAST
def test_sessionize_gap_invariant_generated(spark, gaps):
    """Gap-based sessionization over one user's cumulative event times:
    the number of sessions must equal 1 + count(gaps > 30min), and
    session event counts must sum to the event count."""
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    e = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(ts)], "user_id int, event_id int, sec long"
    ).select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"))

    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    sess = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_new"),
        )
        .select(
            "user_id",
            F.sum("is_new")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .count()
    )
    n_sessions = sess.count()
    expected = 1 + sum(1 for g in gaps[1:] if g > 1800)
    assert n_sessions == expected
    assert sess.agg(F.sum("count")).collect()[0][0] == len(ts)


@given(
    n=st.integers(min_value=1, max_value=500),
    k=st.integers(min_value=1, max_value=12),
)
@_FAST
def test_ntile_expr_matches_native_ntile(spark, n, k):
    """The distributed-rank NTILE arithmetic (_helpers.ntile_expr) must
    reproduce Spark's native NTILE(k) for ANY (n, k): first n%k buckets
    get ceil(n/k) rows, the rest floor(n/k) — this is the formula the
    three de-windowed exact-rank operators stand on."""
    from pyspark.sql import Window as W

    from oddsetl_spark.operators._helpers import ntile_expr

    df = spark.range(1, n + 1).select(
        F.col("id").alias("_rank"), F.lit(n).alias("_n")
    )
    ours = {
        r["_rank"]: r["b"]
        for r in df.select("_rank", ntile_expr(k).cast("int").alias("b")).collect()
    }
    native = {
        r["id"]: r["b"]
        for r in spark.range(1, n + 1)
        .select("id", F.ntile(k).over(W.orderBy("id")).alias("b"))
        .collect()
    }
    assert ours == native


@given(
    iv=st.lists(
        st.tuples(
            st.integers(0, 500),  # start
            st.integers(1, 80),  # duration
        ),
        min_size=1,
        max_size=60,
    )
)
@_FAST
def test_interval_union_matches_bruteforce(spark, iv):
    """The sweep-line decomposition (running-max-end island detection)
    must equal a brute-force point-set union for ARBITRARY interval
    layouts — nested intervals, duplicates, exact-touch boundaries."""
    rows = [
        (1, i, s, s + d) for i, (s, d) in enumerate(iv)
    ]  # (user, id, start, end)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start_us long, end_us long"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max = F.max("end_us").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = df.select(
        "user_id",
        "start_us",
        "end_us",
        F.when(prev_max.isNull() | (F.col("start_us") > prev_max), 1)
        .otherwise(0)
        .alias("is_new"),
        "event_id",
    )
    isl = flagged.select(
        "user_id",
        "start_us",
        "end_us",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island"),
    )
    got = (
        isl.groupBy("user_id", "island")
        .agg((F.max("end_us") - F.min("start_us")).alias("cov"))
        .agg(F.sum("cov").alias("total"))
        .collect()[0]["total"]
    )
    # brute force: union of half-open integer point sets
    points = set()
    for s, d in iv:
        points.update(range(s, s + d))
    assert got == len(points), f"sweep {got} != brute {len(points)}"


@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 9), st.integers(0, 9), st.integers(1, 100)
        ),
        min_size=1,
        max_size=25,
    ),
    seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
)
@_FAST
def test_bounded_sssp_matches_bruteforce(spark, edges, seeds):
    """The min-plus relaxation rounds must equal brute-force enumeration
    of all <=3-edge paths from the seed set on arbitrary small graphs
    (self-loops, parallel edges, disconnected nodes included)."""
    und = [(u, v, w) for u, v, w in edges] + [
        (v, u, w) for u, v, w in edges
    ]
    df = spark.createDataFrame(und, "src long, dst long, w long")
    dist = spark.createDataFrame(
        [(s, 0) for s in sorted(seeds)], "node long, dist long"
    )
    for _ in range(3):
        relaxed = df.join(dist, df["src"] == dist["node"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            relaxed.unionByName(dist)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    got = {r["node"]: r["dist"] for r in dist.collect()}
    # brute force: BFS over path lengths 0..3
    best = {s: 0 for s in seeds}
    frontier = dict(best)
    for _ in range(3):
        nxt = {}
        for u, d in frontier.items():
            for a, b, w in und:
                if a == u:
                    nd = d + w
                    if nd < nxt.get(b, float("inf")):
                        nxt[b] = nd
        for n, d in nxt.items():
            if d < best.get(n, float("inf")):
                best[n] = d
        frontier = nxt
    assert got == best, f"{got} != {best}"


@given(
    us=st.integers(min_value=0, max_value=4_102_444_800_000_000),  # ..2100
)
@settings(max_examples=300, deadline=None)
def test_hive_dir_timestamp_parse_roundtrip_generated(us):
    """parse_hive_dir_value must round-trip EVERY microsecond timestamp
    through Spark's dir-name rendering (isoformat with trailing
    fractional zeros trimmed, colons hive-escaped) to the exact padded
    isoformat the stats compare uses — across the whole input space, not
    just the fixture's values. Pure driver-side property (no Spark job),
    so it can afford many examples."""
    import datetime

    from pyspark.sql import types as T

    from oddsetl_spark.sources.acid_table import parse_hive_dir_value

    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
    want = dt.isoformat(sep=" ")  # pads micros to 6 digits when nonzero
    # Spark renders dir values with trailing fractional zeros trimmed
    # (and no fraction at all for whole seconds), colons %-escaped.
    rendered = dt.isoformat(sep=" ")
    if "." in rendered:
        rendered = rendered.rstrip("0").rstrip(".")
    rendered = rendered.replace(":", "%3A")
    got = parse_hive_dir_value(rendered, T.TimestampType(), "ts")
    assert got == want, (rendered, got, want)
