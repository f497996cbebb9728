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
    heavy: bool = False


_REGISTRY: dict[str, QueryDef] = {}

# Sweep order. The external correctness driver iterates queries() in dict
# order under a fixed time budget — round 1's sweep truncated after 50
# queries because the streaming replays (each a full availableNow run +
# foreachBatch materialization, seconds each at sf0.01) registered early.
# Emit cheap, high-yield batch categories first; queries flagged heavy=True
# (multi-second batch ops at sf0.01) after all light batch queries; the
# streaming replays last. Stable within each tier (registration order).
_CATEGORY_ORDER = (
    "rowops",
    "sorts",
    "setops",
    "functions",
    "windows",
    "agg",
    "joins",
    "udfs",
    "llm_text",
    "llm_sim",
    "llm_dedup",
    "curation",
    "multimodal",
    "etl",
    "graph",
    "geo",
    "sources",
    "streaming",
)
_CATEGORY_RANK = {c: i for i, c in enumerate(_CATEGORY_ORDER)}


def _tier(q: QueryDef) -> int:
    if q.category == "streaming":
        return 2
    return 1 if q.heavy else 0


def _ordered() -> list[QueryDef]:
    order = list(_REGISTRY.values())  # registration order (dicts are ordered)
    return sorted(
        order,
        key=lambda q: (_tier(q), _CATEGORY_RANK.get(q.category, len(_CATEGORY_ORDER))),
    )


def register(
    name: str,
    oracle: str | None = None,
    category: str = "misc",
    heavy: bool = False,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, category, heavy)
        return fn

    return deco


def register_alias(alias: str, existing: str) -> None:
    """Register `alias` as a second name for an already-registered query."""
    q = _REGISTRY[existing]
    if alias in _REGISTRY:
        raise ValueError(f"duplicate query name: {alias}")
    _REGISTRY[alias] = QueryDef(alias, q.fn, q.oracle, q.category, q.heavy)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def all_queries() -> dict[str, QueryDef]:
    return {q.name: q for q in _ordered()}


def get(name: str) -> QueryDef:
    return _REGISTRY[name]
