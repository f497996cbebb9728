"""Query registry: (name, spark_fn, oracle_sql) triples.

Every implemented operator from SURVEY.md §2 registers here via the
`@register` decorator; `__spark_entry__.py` re-exports `queries()` /
`oracle_sql()` from this module. Queries with `oracle=None` are verified
by the driver's weaker rows-only check (declared up front in SURVEY §2).

Oracle discipline (SURVEY §5.3 / FIXTURES.md caveats):
- alias every computed column identically on both sides;
- make double aggregations order-insensitive: aggregate in DECIMAL then
  cast back to DOUBLE, or ROUND aggressively — scalar double arithmetic is
  IEEE-deterministic, only aggregation ORDER diverges between engines;
- pin UTC, determinize top-k with unique tiebreakers, sort collected arrays.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, category: str = "misc"):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, category)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


def all_queries() -> dict[str, QueryDef]:
    return dict(_REGISTRY)


def get(name: str) -> QueryDef:
    return _REGISTRY[name]
