"""Physical-plan inspection helpers (SURVEY §4 / §5.2).

Used by tests/test_plans.py to assert load-bearing plan shapes and by
tools/gen_plans.py to render PLANS.md. Centralizes the two things that
are easy to get wrong: (1) AQE only finalizes the plan after an action,
so run the query before reading the plan; (2) streaming DataFrames can't
be batch-executed, so inspect their logical plan instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """AQE-final physical plan string (runs the query first)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Only the '== Final Plan ==' section (drops the AQE initial plan)."""
    return executed_plan(df).split("== Initial Plan ==")[0]


def logical_plan(df: DataFrame) -> str:
    """Unanalyzed logical plan — the only inspectable plan for streaming
    DataFrames before start()."""
    return df._jdf.queryExecution().logical().toString()


def assert_plan(plan: str, contains: tuple[str, ...] = (), absent: tuple[str, ...] = ()) -> None:
    for s in contains:
        assert s in plan, f"expected {s!r} in plan:\n{plan}"
    for s in absent:
        assert s not in plan, f"unexpected {s!r} in plan:\n{plan}"
