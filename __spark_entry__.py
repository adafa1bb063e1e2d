"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine registry (``migbq_spark.registry``): the
operator IDs are SURVEY.md §2's contract IDs, one ``queries()`` entry per
implemented operator with a matching DuckDB ``oracle_sql()`` string for
every hash-checked operator.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from migbq_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY §2 `agg_groupby_sum`) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["agg_groupby_sum"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per hash-checked query id; rows-only
    operators are intentionally absent (SURVEY.md §2 oracle column)."""
    return registry.oracle_sql()
