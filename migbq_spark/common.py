"""Shared expression helpers enforcing the cross-engine determinism rules
(SURVEY.md §7.4): DECIMAL-before-aggregation for money doubles, identical
aliasing on both engine sides, unique window tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Canonical money/decimal type used before any SUM/AVG over double money
#: columns — Spark and DuckDB disagree in the last ulp of a raw
#: SUM(double) (different add order), decimal addition is exact.
DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    """CAST(col AS DECIMAL(18,2)) — apply before aggregating money doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def as_dec(col: Column) -> Column:
    """Cast a computed aggregate back to DECIMAL(18,2) so both engines
    render the same scale (intermediate decimal arithmetic widens scale
    differently across engines)."""
    return col.cast(DEC)
