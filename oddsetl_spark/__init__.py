"""oddsetl_spark — a PySpark-native analytics engine.

Importing this package populates the query registry (each operator module
registers its queries on import). `registry.queries()` / `registry.oracle_sql()`
are the driver-facing surface, re-exported by /root/repo/__spark_entry__.py.
"""

from __future__ import annotations

from . import registry  # noqa: F401
from .io import TABLES, load_tables, table  # noqa: F401
from .session import get_spark, pin_session  # noqa: F401

# Operator modules register queries on import — keep this list in sync with
# SURVEY.md §2 categories.
from .functions import scalar_functions, udfs  # noqa: F401,E402
from .sources import acid_table, file_sources, python_datasource  # noqa: F401,E402
from .streaming import stream_neardup, stream_queries  # noqa: F401,E402
from .operators import (  # noqa: F401,E402
    aggregates,
    etl,
    geo,
    graph,
    joins,
    llm_curation,
    llm_dedup,
    llm_similarity,
    llm_text,
    multimodal,
    rowops,
    setops,
    sorts,
    tpch,
    windows,
)

__all__ = [
    "registry",
    "TABLES",
    "load_tables",
    "table",
    "get_spark",
    "pin_session",
]
