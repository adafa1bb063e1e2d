"""Sort / limit / top-k / set operators — SURVEY.md §2.F.

Scale notes (100 TB): `topk_global` compiles to TakeOrderedAndProject —
per-partition heaps + a driver merge of k rows, never a global sort.
`sort_multi_key` materializes its observable rank with a single global
window; at scale a rank like this is computed per-partition after a
range-partitioned sort (Spark's SortExec) — the declared form lets
Catalyst choose.  Set ops are shuffles on the full row; EXCEPT/INTERSECT
deduplicate, UNION ALL is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.registry import register


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 under a total order (tiebreak o_orderkey) —
    TakeOrderedAndProject, no global sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderdate ASC, o_totalprice DESC,
                              o_orderkey ASC) AS rn
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort made observable: the order is materialized as a
    row_number rank column (a bare ORDER BY is invisible to an
    order-insensitive hash)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.orderBy(
        F.asc("o_orderdate"), F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey", "o_orderdate", "o_totalprice", F.row_number().over(w).alias("rn")
    )


_SLICE_A = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000"
_SLICE_B = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 140000"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    a = o.filter(F.col("o_totalprice") > 150000).select(cols)
    b = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 140000)
    ).select(cols)
    return a, b


@register("set_union_all", oracle=f"{_SLICE_A} UNION ALL {_SLICE_B}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates preserved)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@register("set_union_distinct", oracle=f"{_SLICE_A} UNION {_SLICE_B}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(p)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    # subtract == SQL EXCEPT (distinct); exceptAll().distinct() would keep
    # values that appear on both sides with higher left multiplicity.
    return f.subtract(p)


@register(
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag difference with multiplicities — the
    form migbq's duplicate-PK accounting actually needs: how many
    EXTRA copies exist, not just which keys).  Spark plans this as one
    aggregation over tagged counts — linear, one shuffle."""
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    return views.exceptAll(clicks)


@register(
    "range_partition_boundaries",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, NTILE(32) OVER (ORDER BY o_orderkey) AS bucket
        FROM orders
    )
    SELECT bucket, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi,
           COUNT(*) AS n
    FROM t GROUP BY bucket
    """,
)
def range_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-partition boundary computation: NTILE(32) over
    the PK yields 32 equal-row buckets whose [lo, hi] bounds are the
    split points `repartitionByRange` / migbq's PK sweep want — an
    EXACT version of Spark's sampled RangePartitioner (deterministic,
    so hash-checkable; the sampled one is not).  Equal-ROW buckets beat
    equal-WIDTH strides when PKs have gaps or hot ranges — every
    partition gets the same row budget.

    Scale (100 TB): computing exact ntiles needs a global sort of the
    KEY COLUMN ONLY (pruned scan) — acceptable for planning-time
    boundary jobs; at extreme sizes swap in `approx_percentile` over
    the key for sampled-but-mergeable boundaries."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    w = Window.orderBy("o_orderkey")
    return (
        o.withColumn("bucket", F.ntile(32).over(w))
        .groupBy("bucket")
        .agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (bag intersection: each key kept
    min(count_left, count_right) times) — completes the bag-semantics
    set family with `set_except_all`/`set_union_all`.  The multiplicity
    form matters for event accounting: "how many view events have a
    paired click event per user", not just which users have both.

    Scale (100 TB): Spark plans intersectAll as one aggregation over
    tagged per-side counts plus a generate — linear, one shuffle on the
    key, no join."""
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    return views.intersectAll(clicks)
