"""Single source of truth mapping SURVEY.md §2 operator IDs to
implementations and DuckDB oracle SQL.

Every operator module registers itself via the ``register`` decorator; the
key IS the §2 contract ID.  ``queries()`` / ``oracle_sql()`` are what
``__spark_entry__.py`` re-exports to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under the §2 contract id ``qid``.

    ``oracle`` is the ANSI-SQL DuckDB-runnable equivalent; ``None`` marks a
    rows-only operator (non-SQL-expressible — the driver records a weaker
    check, SURVEY.md §2 oracle column).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate query id {qid!r}")
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLES[qid] = oracle.strip()
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module exactly once (imports populate the
    registries via the decorator)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid circular imports at package
    # import time; each module's import registers its queries.
    from migbq_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        control,
        joins,
        macros,
        multimodal,
        pipeline,
        relational,
        sorting,
        sources,
        textsim,
        timeseries,
        training,
        windows,
    )
    from migbq_spark.functions import udfs  # noqa: F401
    from migbq_spark.streaming import batch_equiv, structured  # noqa: F401

    _LOADED = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)
