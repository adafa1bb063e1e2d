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


def cents(col: str | Column) -> Column:
    """Per-row DECIMAL(18,2) rounding semantics, materialized as a scaled
    int64 (value × 100).  The decimal cast fixes the rounding (HALF_UP,
    identical to the oracle's CAST); the ×100 → long conversion is exact
    because the value has exactly 2 decimal digits after the cast."""
    return (dec(col) * 100).cast("long")


def scaled_sum_agg(df, group_cols, measures, count_alias: str | None = None):
    """Exact decimal SUM via two-level scaled-int64 accumulation — the
    strategy columnar engines (DuckDB, ClickHouse) use internally for
    decimal aggregation, expressed declaratively.

    ``measures`` is a list of ``(alias, long_expr, scale)`` where
    ``long_expr`` is the measure as an int64 scaled by 10^scale (build it
    from :func:`cents`; products of cents compose — cents×cents has
    scale 4).  Level 1 sums the int64s per (group, input partition):
    long addition, no BigDecimal boxing.  Level 2 merges the per-partition
    partials as DECIMAL(38) — exact, order-independent — and rescales.

    Numerically IDENTICAL to ``SUM(CAST(x AS DECIMAL))``: decimal
    arithmetic is integer arithmetic on unscaled values, and every step
    here (int64 partial sum, decimal merge, division by 10^scale with
    result scale ≥ needed) is exact.  The TERMINAL type is DOUBLE — one
    correctly-rounded conversion of the exact decimal — because the
    driver's hash compares pandas frames, where DuckDB's ``.df()``
    renders DECIMAL as float64 ("5.0") while a Spark Decimal renders
    "5.00"; emitting double on both sides makes the hash
    representation-stable (r1 VERDICT item 1).

    Overflow bound (the reason for two levels): a level-1 partial is
    bounded by rows-per-partition × max-row-value.  At 128 MB scan
    partitions (≲4 M rows) a scale-6 money measure (≤1e11 per row) sums
    to ≲4e17 — 20× inside int64.  The level-2 merge is DECIMAL(38,0), so
    TOTAL magnitude is unbounded by int64 — this survives 100 TB where a
    single-level long sum would overflow.  The level-1 exchange carries
    only |groups| × |partitions| rows.
    """
    pid = F.spark_partition_id().alias("_pid")
    partial = [F.sum(expr).alias(f"_{alias}") for alias, expr, _ in measures]
    if count_alias is not None:
        partial.append(F.count(F.lit(1)).alias("_cnt"))
    level1 = df.groupBy(*group_cols, pid).agg(*partial)
    final = [
        (F.sum(F.col(f"_{alias}").cast("decimal(38,0)")) / (10**scale))
        .cast(f"decimal(38,{scale})")
        .cast("double")
        .alias(alias)
        for alias, _, scale in measures
    ]
    if count_alias is not None:
        final.append(F.sum("_cnt").alias(count_alias))
    return level1.groupBy(*group_cols).agg(*final)
