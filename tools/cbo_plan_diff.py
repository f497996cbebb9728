"""CBO-profile plan diff at ~sf1 (VERDICT r8 item 8, PLANS.md "CBO
profile" section).

Demonstrates REAL broadcast decisions flipped by ANALYZE statistics on
a multi-join aggregate at ~sf1 (K=10 low-dup staging, lineitem ~6M
rows; same catalog tables both runs, only the optimizer mode flips).
The predicate `l_quantity > 49` keeps ~2% of lineitem (~122k rows,
~1.9 MB) but without column stats Spark estimates the filtered scan at
the FULL table size (13.9 MiB measured), so:

- scenario A (default 10 MB broadcast threshold): without stats the
  optimizer broadcasts the WRONG side — the unfiltered 1.5M-row orders
  table (BuildLeft), a hash table 12x bigger than needed and a side
  that stops being broadcastable long before 100 TB. With stats it
  builds on the filtered fact (BuildRight, 122k rows). Measured ~2.5x
  warm-time difference at sf1.
- scenario B (5 MB threshold — the same decision a 100 TB deployment
  faces where NO full table fits under the limit): without stats
  neither side looks broadcastable -> SortMergeJoin, BOTH sides
  exchange (the 1.5M-row probe side pays a map-side shuffle write AQE
  cannot un-spend). With stats the filtered side's true 1.9 MB
  estimate wins -> BroadcastHashJoin, zero shuffle exchanges.

Usage: python tools/cbo_plan_diff.py   (stages ~sf1 on first run)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from oddsetl_spark.plans.cbo import land_stats_tables  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402
from stage_sf1 import stage as stage_sf1  # noqa: E402

QUERY = """
SELECT o.o_orderpriority, COUNT(*) AS n_lines
FROM {orders} o JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE l.l_quantity > 49
GROUP BY o.o_orderpriority
"""


def section_lines(spark) -> list[str]:
    """Run the A/B plan diff and return report lines (asserting the
    flips hold) — used by main() and by tools/gen_plans.py to render the
    PLANS.md "CBO profile" section from live plans, not prose."""
    lines: list[str] = []
    sf1 = stage_sf1(10, "low-dup")
    cat = land_stats_tables(spark, sf1, ("orders", "lineitem"), prefix="cbosf1")
    q = QUERY.format(orders=cat["orders"], lineitem=cat["lineitem"])

    def run(cbo: bool):
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled"):
            spark.conf.set(k, str(cbo).lower())
        df = spark.sql(q)
        # sparkPlan() = the static join selection (pre-EnsureRequirements,
        # so exchange nodes aren't inserted yet); materialized shuffles
        # are counted from the AQE-final executed plan instead — each
        # ShuffleQueryStage is a map-side shuffle write that actually
        # happened, even where AQE then demoted the SMJ to a broadcast.
        static = df._jdf.queryExecution().sparkPlan().toString()
        df.collect()  # warm
        t0 = time.perf_counter()
        df2 = spark.sql(q)
        df2.collect()
        wall = time.perf_counter() - t0
        executed = df2._jdf.queryExecution().executedPlan().toString()
        n_shuffles = executed.count("ShuffleQueryStage")
        joins = [
            line.strip() for line in static.splitlines() if "Join" in line
        ]
        return static, joins, wall, n_shuffles

    est = {}
    for cbo in (False, True):
        spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        est[cbo] = (
            spark.sql(
                f"SELECT l_orderkey FROM {cat['lineitem']} WHERE l_quantity > 49"
            )
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
    lines.append(f"filtered-lineitem estimate  CBO off: {est[False]}")
    lines.append(f"filtered-lineitem estimate  CBO on : {est[True]}")

    for tag, thresh in (("A: default 10MB", None), ("B: 5MB", str(5 * 1024 * 1024))):
        if thresh is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        off_static, off_joins, off_wall, off_sh = run(False)
        on_static, on_joins, on_wall, on_sh = run(True)
        lines.append(f"\n== scenario {tag} ==")
        lines.append(
            f"-- static join nodes, CBO OFF ({off_wall:.2f}s warm, "
            f"{off_sh} materialized shuffles) --"
        )
        lines.extend("   " + line[:120] for line in off_joins)
        lines.append(
            f"-- static join nodes, CBO ON  ({on_wall:.2f}s warm, "
            f"{on_sh} materialized shuffles) --"
        )
        lines.extend("   " + line[:120] for line in on_joins)
        if thresh is None:
            assert any(
                "BroadcastHashJoin" in j and "BuildLeft" in j for j in off_joins
            ), off_static
            assert any(
                "BroadcastHashJoin" in j and "BuildRight" in j for j in on_joins
            ), on_static
            lines.append(
                "   -> stats flip the BUILD side from the unfiltered 1.5M-row"
                " orders to the 122k-row filtered fact"
            )
        else:
            assert any("SortMergeJoin" in j for j in off_joins), off_static
            assert any("BroadcastHashJoin" in j for j in on_joins), on_static
            assert off_sh > on_sh, (off_sh, on_sh)
            lines.append(
                f"   -> materialized shuffles {off_sh} (off) -> {on_sh} (on):"
                " the probe-side shuffle write is what statistics save"
            )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    return lines


def main() -> None:
    spark = get_spark("cbo-plan-diff")
    spark.sparkContext.setLogLevel("ERROR")
    print("\n".join(section_lines(spark)))


if __name__ == "__main__":
    main()
