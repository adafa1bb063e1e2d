"""Metadata / validation control plane — SURVEY.md §2.I: migbq's ops
surface re-expressed as queries.

Reference parity: migbq keeps per-table progress (last migrated PK, row
counts) and a per-range job log in a peewee/sqlite metadata DB
(`[pub:H migbq/MigrationMetadataManager.py]`); `migbq check` reconciles
source-vs-destination per-day counts and re-enqueues mismatched or
unfinished ranges (`[pub:H migbq/migbq.py check]`, SURVEY §3.1 EP3).
Here the "source" and "job log" are derived from the events/orders
tables so the operators are self-contained and oracle-checkable.

Scale notes (100 TB): progress rollups and reconciliations are
small-output aggregations over the PK/day — partial aggregation makes
them scan-bound; the FULL OUTER join joins two already-aggregated sides
(tiny), so AQE turns it into a broadcast join automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.common import dec
from migbq_spark.registry import register


@register(
    "meta_progress_log",
    oracle="""
    SELECT event_type AS table_name,
           MAX(event_id) AS last_pk,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def meta_progress_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """migbq's per-table progress rollup (last migrated PK, row count,
    checksum-ish sum), emulated with event_type as the table axis."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("table_name")).agg(
        F.max("event_id").alias("last_pk"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("value")).cast("decimal(38,2)").alias("sum_value"),
    )


@register(
    "check_count_reconcile",
    oracle="""
    SELECT COALESCE(s.d, t.d) AS order_day,
           COALESCE(s.n_src, 0) AS n_src,
           COALESCE(t.n_dst, 0) AS n_dst,
           COALESCE(s.n_src, 0) - COALESCE(t.n_dst, 0) AS diff,
           (COALESCE(s.n_src, 0) <> COALESCE(t.n_dst, 0)) AS mismatch
    FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_src
          FROM orders GROUP BY CAST(o_orderdate AS DATE)) s
    FULL OUTER JOIN
         (SELECT CAST(o.o_orderdate AS DATE) AS d, COUNT(*) AS n_dst
          FROM orders o
          WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
          GROUP BY CAST(o.o_orderdate AS DATE)) t
    ON s.d = t.d
    """,
)
def check_count_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """migbq `check`: per-day source counts vs per-day destination counts,
    FULL OUTER joined with mismatch rows flagged.  "Destination" here =
    orders that made it into lineitem (semi join), so at sf the fixture
    genuinely exercises both the matched and mismatched branches."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    src = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_src")
    )
    dst = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_dst"))
    )
    j = src.join(dst, "d", "full")
    n_src = F.coalesce("n_src", F.lit(0))
    n_dst = F.coalesce("n_dst", F.lit(0))
    return j.select(
        F.col("d").alias("order_day"),
        n_src.alias("n_src"),
        n_dst.alias("n_dst"),
        (n_src - n_dst).alias("diff"),
        (n_src != n_dst).alias("mismatch"),
    )


@register(
    "retry_missing_ranges",
    oracle="""
    SELECT DISTINCT o_orderkey // 100 AS range_id
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM orders d
                      WHERE d.o_orderkey // 100 = orders.o_orderkey // 100
                        AND d.o_orderstatus = 'F')
    """,
)
def retry_missing_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """migbq's re-queue scan: PK ranges (stride 100) that were attempted
    (have rows) but have no completed ('F') record → left_anti join of the
    range log against the done log."""
    o = load(spark, sf_dir, "orders")
    ranges = o.select(F.expr("o_orderkey div 100").alias("range_id")).distinct()
    done = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.expr("o_orderkey div 100").alias("range_id"))
        .distinct()
    )
    return ranges.join(done, "range_id", "left_anti")


@register(
    "merge_upsert_latest",
    oracle="""
    WITH m AS (SELECT MAX(event_id) AS mx FROM events),
    base AS (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
               'base' AS src
        FROM events, m WHERE event_id <= mx / 2
    ),
    delta AS (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
               'delta' AS src
        FROM events, m WHERE event_id > mx / 2
    ),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
    SELECT user_id, event_type, event_id, src
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM unioned)
    WHERE rn = 1
    """,
)
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE/upsert: apply a delta batch onto a base snapshot,
    keeping the latest version per merge key (user_id, event_type) —
    latest by (ts, event_id), so a delta row replaces any older base row
    for its key, exactly BigQuery's dedup-rewrite that migbq's retry
    repair performs (`win_rownum_dedup` pushed to BQ — SURVEY.md §3.1
    EP3), expressed engine-side.

    The base/delta split point is computed in-query (max(event_id)/2,
    the `incremental_delta` convention) so the fixture is sf-independent.

    Scale (100 TB): union + window is the merge-on-read formulation; a
    format with MERGE INTO (Delta/Iceberg) does the same logically but
    rewrites only matched files.  One shuffle on the merge key; AQE
    handles hot keys.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    mx = ev.agg(F.max("event_id").alias("mx"))
    tagged = ev.crossJoin(F.broadcast(mx)).withColumn(
        "src",
        F.when(F.col("event_id") <= F.col("mx") / 2, "base").otherwise("delta"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "src")
    )
