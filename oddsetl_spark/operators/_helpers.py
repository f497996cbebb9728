"""Shared oracle-exactness helpers.

The driver hash-compares Spark vs DuckDB values exactly, so every double
aggregation must be ORDER-INSENSITIVE. Scalar IEEE double arithmetic
(+ - * /) is deterministic given identical inputs; only the order of an
aggregation's additions diverges between engines. Discipline:

  per-row double math  ->  cast to DECIMAL  ->  exact SUM  ->  cast DOUBLE

Both engines then produce bit-identical doubles. `dsum`/`davg` implement
the Spark side; oracle SQL uses the textual twins below.

Tie-rounding caveat: the cast scale must be >= the exact decimal precision
of the expression, else the cast itself hits genuine decimal ties where
Spark rounds HALF_UP and DuckDB half-even. Fixture money columns carry <=2
decimals (measured), so products of up to three of them carry <=6 — the
default scale. Expressions with more decimal factors must widen the scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def dec(col: Column, scale: int = 6) -> Column:
    """Deterministic double->decimal cast (per-row, order-free)."""
    return col.cast(f"decimal(30,{scale})")


def dsum(col: Column, scale: int = 6) -> Column:
    """Order-insensitive SUM of a double expression, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, double division."""
    return F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB twin of davg()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE) / COUNT(*)"


# ---------------------------------------------------------------------------
# Scaled-long exact sums — the fast path for money-grade doubles.
#
# Fixture money columns carry <= 2 true decimals, products of three <= 6,
# so floor(x*1e6 + 0.5) recovers the exact 6-decimal grid value as a LONG.
# Long sums run as primitive whole-stage-codegen adds (~3x faster than
# Spark's BigDecimal sum buffer) and are order-insensitive by exactness.
#
# Overflow discipline at 100 TB: a single global long sum of 1e11-scaled
# values caps at ~9.2e12 money units — too tight for a petabyte fact
# table. `scaled_group_sums` therefore sums LONGS only within a source
# partition (<= ~5e17 for 5M-row partitions: 10x headroom), then merges
# the per-partition partials as DECIMAL(38,0) — the decimal work touches
# only |groups| x |partitions| rows, which is noise at any scale.
# ---------------------------------------------------------------------------

_SCALE_POW = 1_000_000.0


def lng(col: Column) -> Column:
    """Per-row exact 6-decimal grid value as LONG (floor half-up — engines
    agree bit-for-bit because the double input is IEEE-identical)."""
    return F.floor(col * F.lit(_SCALE_POW) + F.lit(0.5)).cast("long")


def sql_lsum(expr: str) -> str:
    """DuckDB twin of a scaled-long exact sum, unscaled back to DOUBLE."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr})*1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
        "/1000000"
    )


def sql_lavg(expr: str) -> str:
    """DuckDB twin of a scaled-long exact average."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr})*1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
        "/1000000/COUNT(*)"
    )


def scaled_group_sums(
    df,
    keys: list[str],
    sums: dict[str, Column],
    avgs: dict[str, Column] | None = None,
    count_alias: str | None = None,
):
    """Two-phase exact group sums: long partials per (keys, partition),
    decimal merge per keys. `sums`/`avgs` map output alias -> double
    expression; `count_alias` optionally emits COUNT(*).

    Phase 1 completes entirely map-side (partition id is constant within
    a partition) — ONE real shuffle of tiny partial rows, same as a plain
    groupBy. Phase 2's decimal adds see |groups| x |partitions| rows."""
    avgs = avgs or {}
    overlap = sums.keys() & avgs.keys()
    if overlap:
        raise ValueError(
            f"scaled_group_sums: aliases in BOTH sums and avgs: {sorted(overlap)}"
        )
    exprs = {**sums, **avgs}
    part = df.groupBy(*keys, F.spark_partition_id().alias("_pid")).agg(
        *[F.sum(lng(c)).alias(f"_s_{a}") for a, c in exprs.items()],
        F.count(F.lit(1)).alias("_c"),
    )
    unscale = F.lit(_SCALE_POW)
    n_rows = F.sum("_c")
    out = [
        *[
            (F.sum(F.col(f"_s_{a}").cast("decimal(38,0)")).cast("double") / unscale).alias(a)
            for a in sums
        ],
        *[
            (
                F.sum(F.col(f"_s_{a}").cast("decimal(38,0)")).cast("double")
                / unscale
                / n_rows
            ).alias(a)
            for a in avgs
        ],
    ]
    if count_alias:
        out.append(n_rows.alias(count_alias))
    return part.groupBy(*keys).agg(*out)


def lsum(col: Column) -> Column:
    """Single-phase scaled-long exact sum -> double. Overflow bound: the
    PER-GROUP scaled sum must fit a long (~9.2e12 money units) — right for
    high-cardinality keys with small groups (e.g. per-order revenue);
    low-cardinality/global sums at scale belong in scaled_group_sums.

    Overflow is FAIL-LOUD, not silent: pin_session pins
    spark.sql.ansi.enabled=true (the Spark 4 default), under which a long
    SUM that crosses 2^63 raises ARITHMETIC_OVERFLOW (MathUtils.addExact
    in the codegen'd agg) instead of wrapping. So rollup/cube/pivot grand
    totals that ride lsum cannot go silently wrong at large scale factors
    — they abort with a clear error telling the caller to move that query
    to scaled_group_sums. Locked by test_lsum_overflow_raises."""
    return F.sum(lng(col)).cast("double") / F.lit(_SCALE_POW)


# ---------------------------------------------------------------------------
# Exact global rank / NTILE without a single-task window.
#
# Window.orderBy with no partitionBy funnels EVERY row through one task —
# the classic 100 TB plan-killer. The decomposition below (the same
# pattern sorts.sort_total_order_range demonstrates) is exact and fully
# distributed: repartitionByRange assigns contiguous key ranges, each
# partition sorts locally, monotonically_increasing_id reads off the
# local position ((pid << 33) | pos), and the global rank adds the
# broadcast cumulative count of earlier ranges. The only full-data
# exchange is the range partitioner; the one window that remains runs
# over the per-partition COUNTS (num_partitions rows).
# ---------------------------------------------------------------------------


def with_global_rank(
    df,
    order_cols: list,
    payload_cols: list[str],
    num_partitions: int = 32,
    rank_alias: str = "_rank",
    total_alias: str = "_n",
    pin: bool = True,
):
    """df -> (payload_cols..., rank_alias, total_alias) with the exact
    1-based global rank under ORDER BY order_cols (which must be a total
    order — include a unique tiebreaker) and the total row count.
    `pin=False` skips the localCheckpoint (plan tests only — see the
    consistency comment below; production callers must keep the pin).

    Fault-tolerance trade of the pin: localCheckpoint blocks are
    NON-REPLICATED executor-local storage, so losing an executor after
    the checkpoint makes downstream stages unrecomputable and FAILS the
    job (a clean retry, never wrong ranks). On a long-lived production
    cluster where executor churn is routine, swap the pin for
    df.checkpoint(eager=True) against a replicated checkpoint dir, or
    persist(StorageLevel.MEMORY_AND_DISK_2) — same single-evaluation
    guarantee, survivable lineage. We keep localCheckpoint here because
    the bench/test environment is single-JVM (no executor loss exists)
    and the eager pin costs ~2.6 s/call less than a replicated
    checkpoint. Callers whose plans provably get ReusedExchange could
    run pin=False, but the reuse is an optimizer accident that AQE can
    undo per-run — only safe under a plan assertion like
    tests/test_plans.py's single-range-exchange locks."""
    from pyspark.sql import Window as W

    ranged = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # ONE materialized evaluation of the ranged layout: the counts branch
    # and the rank join below would otherwise evaluate repartitionByRange
    # INDEPENDENTLY, and its boundary sampling is not stable across
    # evaluations (AQE can re-plan the upstream partitioning per run) —
    # observed at the 10x (~sf1) probe as ranks exceeding n (a transient
    # 11th NTILE bucket: offsets from one layout, local ranks from
    # another). Catalyst reuses the exchange for SOME callers (identical
    # subtrees -> ReusedExchange, e.g. agg_histogram_equidepth) but not
    # others (curate_quality_ntile, etl_surrogate_keys evaluated it
    # twice); the pin makes single-evaluation a guarantee instead of an
    # optimizer accident. Plan tests assert the decomposition on the
    # pre-pin plan via pin=False.
    if pin:
        ranged = ranged.localCheckpoint()
    mid = F.monotonically_increasing_id()
    local = ranged.select(
        *payload_cols,
        F.shiftright(mid, 33).cast("int").alias("_pid"),
        (mid.bitwiseAND(F.lit((1 << 33) - 1)) + 1).alias("_local_rank"),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    wcum = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("_pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # monotonically_increasing_id keeps the record position in the low 33
    # bits; a range partition past 2^33 rows would overflow into the pid
    # bits and corrupt ranks SILENTLY — fail loudly instead (the check
    # rides the tiny offsets frame: assert_true is NULL on success)
    guard = F.coalesce(
        F.assert_true(
            F.col("_pn") < F.lit(1 << 33),
            F.lit("range partition exceeds 2^33 rows — raise num_partitions"),
        ).cast("long"),
        F.lit(0),
    )
    offsets = counts.select(
        "_pid",
        (F.coalesce(F.sum("_pn").over(wcum), F.lit(0)) + guard).alias("_offset"),
        F.sum("_pn").over(wall).alias(total_alias),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *payload_cols,
        (F.col("_local_rank") + F.col("_offset")).alias(rank_alias),
        total_alias,
    )


def ntile_expr(k: int, rank_col: str = "_rank", total_col: str = "_n") -> Column:
    """Exact NTILE(k) from (global rank, total): the first n%k buckets get
    ceil(n/k) rows, the rest floor(n/k). Integer `div` arithmetic — no
    double rounding at any n."""
    return F.expr(
        f"CASE WHEN {rank_col} <= ({total_col} % {k}) * (({total_col} div {k}) + 1) "
        f"THEN ({rank_col} - 1) div (({total_col} div {k}) + 1) + 1 "
        f"ELSE ({total_col} % {k}) + "
        f"({rank_col} - ({total_col} % {k}) * (({total_col} div {k}) + 1) - 1) "
        f"div ({total_col} div {k}) + 1 END"
    )
