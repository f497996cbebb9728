"""ANALYZE-backed CBO session profile (SURVEY §4 addendum, round 9).

`opt_cbo_join_reorder` demonstrates cost-based join reordering on
catalog tables inside one registered query; this module generalizes it
into a reusable SESSION PROFILE: land any fixture tables as catalog
tables once, `ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS`, and run
arbitrary SQL under CBO with true rowCount/NDV/min-max statistics.

Why it matters at 100 TB: without statistics Spark estimates a filtered
scan at the FULL file size (`SizeInBytesOnlyStatsPlanVisitor` passes the
child's sizeInBytes through filters), so a 2-4%-selective predicate on a
fact table still looks like terabytes and JoinSelection refuses to
broadcast it — every join against it shuffles the OTHER side too. With
column stats, `FilterEstimation` interpolates selectivity from min/max
(uniformity assumption; histograms refine it), the filtered side's
estimate collapses to its true few MB, and the static plan broadcasts
it — zero exchange on the probe side. AQE can rescue the decision at
runtime, but only AFTER the probe side's map-side shuffle write has
happened; statistics fix the plan BEFORE any I/O. Measured plan-diff at
~sf1 lives in PLANS.md ("CBO profile"); tools/cbo_plan_diff.py
regenerates it, tests/test_plans.py locks the flip.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

from ..io import table
from ..session import scratch_dir

_CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


def land_stats_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...],
    prefix: str = "prof",
) -> dict[str, str]:
    """Land fixture tables as catalog tables with full column statistics
    and return {fixture_name: catalog_name}. Idempotent per (session,
    prefix): a table already in the catalog is reused — ANALYZE is a
    once-per-dataset cost, exactly like a warehouse's stats refresh, so
    callers may invoke this on every query without re-paying it."""
    out: dict[str, str] = {}
    for name in tables:
        cat = f"{prefix}_{name}"
        if not spark.catalog.tableExists(cat):
            table(spark, sf_dir, name).write.option(
                "path", scratch_dir(f"cbo_{cat}")
            ).mode("overwrite").saveAsTable(cat)
            spark.sql(
                f"ANALYZE TABLE {cat} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
        out[name] = cat
    return out


@contextmanager
def cbo_profile(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...],
    prefix: str = "prof",
) -> Iterator[dict[str, str]]:
    """Run a block under the ANALYZE-backed CBO profile: catalog tables
    with column stats + cost-based optimization and join reordering on.
    Yields {fixture_name: catalog_name}; session confs are restored on
    exit (results consumed inside the block keep their CBO plans — use
    localCheckpoint/collect before leaving if the plan must not be
    re-derived under default confs, the opt_cbo_join_reorder pattern)."""
    cat = land_stats_tables(spark, sf_dir, tables, prefix)
    saved = {k: spark.conf.get(k, None) for k in _CBO_CONFS}
    try:
        for k, v in _CBO_CONFS.items():
            spark.conf.set(k, v)
        yield cat
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
