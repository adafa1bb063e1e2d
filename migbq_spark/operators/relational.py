"""Projection / filter / scalar-function operators — SURVEY.md §2.B.

Reference parity: `filter_pred` is migbq's WHERE-clause assembly and
`project_cast_typemap` its MSSQL→BigQuery type map applied as a cast
projection (`[pub:H migbq/MsSqlDatasource.py, migbq/BigQueryForwarder.py]`,
SURVEY §1.1); the rest is the engine's scalar-function surface.

Scale notes (100 TB): everything here is a narrow projection/filter —
Catalyst pushes the predicates and the column list into the parquet scan
(PushedFilters / ReadSchema), so these run at scan speed with no shuffle
and stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.common import DEC
from migbq_spark.registry import register

#: events.value dollars -> exact int64 cents (r12 SQL-surface batch).
_CENTS_EV = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive comparison+equality predicates, pushed to the scan."""
    return (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "O"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "project_cast_typemap",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
           CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice_dec,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderstatus AS VARCHAR) AS status_str
    FROM orders
    """,
)
def project_cast_typemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §1.1 MSSQL→BigQuery type map as a cast projection
    (int→BIGINT, money→DECIMAL(18,2), datetime→DATE, varchar→STRING)."""
    o = load(spark, sf_dir, "orders")
    # the DEC cast applies the type-map's 2-dp rounding; terminal double
    # is the driver-hash-stable rendering (DuckDB .df() emits float64)
    return o.select(
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.col("o_totalprice").cast(DEC).cast("double").alias("totalprice_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderstatus").cast("string").alias("status_str"),
    )


@register(
    "cond_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
                ELSE 'low' END AS prio_bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
    FROM orders
    """,
)
def cond_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling / value mapping during forwarding (CASE/COALESCE/NULLIF),
    the shape migbq applies when normalizing values for the BQ load."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("low")
        .alias("prio_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


@register(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_up,
           LOWER(p_name) AS name_lo,
           SUBSTRING(p_type, 1, 5) AS type_pfx,
           LENGTH(p_name) AS name_len,
           TRIM(p_name) AS name_trim,
           p_brand || '#' || p_type AS brand_type,
           (p_name LIKE '%a%') AS has_a
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_name").alias("name_lo"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@register(
    "regexp_extract_json",
    oracle="""
    SELECT event_id,
           regexp_extract(props, '"k": (\\d+)', 1) AS k_str,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_int
    FROM events
    """,
)
def regexp_extract_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract `k` from the events.props JSON payload via regex — the
    hash-matched form; `get_json_object` (JSON-path) is the idiomatic Spark
    form, exercised in `json_path_extract` (rows-only)."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1)
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    )


@register(
    "json_path_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def json_path_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction (idiomatic Spark `get_json_object`).
    Upgraded from rows-only to hash-mode in r3: DuckDB's bundled json
    extension computes the identical integer, so the path form is
    value-hash-checkable after all."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS o_year,
           EXTRACT(month FROM o_orderdate) AS o_month,
           EXTRACT(day FROM o_orderdate) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface. Spark `datediff(end, start)` ≡ DuckDB
    `date_diff('day', start, end)` — argument order differs (SURVEY §7.4)."""
    o = load(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(od, 30).alias("due_date"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_epoch0"
        ),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT event_id,
           round(value, 1) AS val_round,
           abs(value - 100) AS val_abs,
           ceil(value) AS val_ceil,
           floor(value) AS val_floor,
           event_id % 7 AS id_mod,
           pow(2, event_id % 10) AS id_pow
    FROM events
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round("value", 1).alias("val_round"),
        F.abs(F.col("value") - 100).alias("val_abs"),
        F.ceil("value").cast("double").alias("val_ceil"),
        F.floor("value").cast("double").alias("val_floor"),
        (F.col("event_id") % 7).alias("id_mod"),
        F.pow(F.lit(2), F.col("event_id") % 10).alias("id_pow"),
    )


@register(
    "str_funcs2",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_head,
           lpad(p_brand, 12, '*') AS brand_l,
           rpad(p_brand, 12, '-') AS brand_r,
           reverse(p_name) AS name_rev,
           translate(p_name, 'ae', '43') AS name_leet
    FROM part
    """,
)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string surface: split_part / lpad / rpad / reverse /
    translate — identical names and semantics on both engines.
    Row-local, codegen'd, shuffle-free."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad("p_brand", 12, "*").alias("brand_l"),
        F.rpad("p_brand", 12, "-").alias("brand_r"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_name", "ae", "43").alias("name_leet"),
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, the inverse of `pivot_event_counts`): part
    metrics melted into (metric, val) rows via `stack` — a generator
    expression, zero shuffles, output is 2× input rows with no
    arithmetic (exact parity)."""
    p = load(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'retailprice', CAST(p_retailprice AS DOUBLE),"
        " 'size', CAST(p_size AS DOUBLE)) AS (metric, val)",
    )


@register(
    "explode_outer_tokens",
    oracle="""
    SELECT d.doc_id, u.t AS long_token
    FROM documents d
    LEFT JOIN LATERAL (
        SELECT unnest(list_filter(string_split(d.text, ' '),
                                  x -> length(x) > 6)) AS t
    ) u ON true
    """,
)
def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode: docs with NO long tokens still emit one
    row (long_token = NULL) — `explode_outer` is the LEFT-JOIN-LATERAL
    of generators, and the distinction matters whenever downstream
    counts must not silently drop token-less documents.  The fixture is
    genuinely mixed (~20% of docs have no token > 6 chars)."""
    d = load(spark, sf_dir, "documents")
    long_toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 6)
    return d.select(
        "doc_id", F.explode_outer(long_toks).alias("long_token")
    )


@register(
    "map_roundtrip_audit",
    oracle="""
    SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type) t
    GROUP BY event_type
    """,
)
def map_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round trip, hash-checked: per-user activity profiles are
    packed into a map<event_type, count> (entries SORTED before
    map_from_entries — bare collect_list order is partition-dependent),
    then exploded back with map_entries and re-aggregated; the result
    must equal the direct per-type counts.  This is the
    deterministic-map-construction pattern (`map_funcs` alone is
    rows-only precisely because unordered maps don't hash stably).

    Scale (100 TB): the map packing is one user-keyed aggregation; maps
    stay bounded by the type vocabulary per key."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    packed = per_user.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("profile")
    )
    unpacked = packed.select(
        F.explode(F.map_entries("profile")).alias("kv")
    ).select(
        F.col("kv.key").alias("event_type"), F.col("kv.value").alias("cnt")
    )
    return unpacked.groupBy("event_type").agg(F.sum("cnt").alias("n"))


# ------------------------------------------------ props_variant_extract

@register(
    "props_variant_extract",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(k) AS INT) AS k_min,
           CAST(MAX(k) AS INT) AS k_max,
           ROUND(SUM(k) * 1.0 / COUNT(*), 4) AS k_avg,
           CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over_50
    FROM x GROUP BY event_type
    """,
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-TYPE semi-structured extraction (Spark 4's new VARIANT
    column type, the Snowflake/Delta-style answer to schema-on-read
    JSON): `parse_json` turns the props string into a binary VARIANT
    once, `variant_get` then extracts typed paths WITHOUT re-parsing —
    at 100 TB the parse-once/extract-many split is the whole game,
    because get_json_object re-parses the string per extraction while
    a VARIANT is a parsed binary the executor walks directly.
    Complements `json_path_extract` (string get_json_object) and
    `regexp_extract_json` with the modern typed path.

    The rollup (per event type: count, min/max/avg and a threshold
    count over the extracted int) proves the extracted values feed
    ordinary typed aggregation.

    Determinism: extraction yields exact ints; avg is one division of
    exact integer sums behind ROUND(·,4).

    Scale (100 TB): parse + extract are row-local JVM expressions
    (whole-stage codegen'd, no Python); the rollup collapses map-side
    to |types| rows."""
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.sum("k") * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
            "k_avg"
        ),
        F.sum(F.when(F.col("k") > 50, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_50"),
    )


# --------------------------------------------- group_by_all_syntax (r11)

@register(
    "group_by_all_syntax",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def group_by_all_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 3.4+ / DuckDB dialect
    convergence): the analyst shorthand that groups by every
    non-aggregate select item and orders by the full output row —
    the oracle runs the IDENTICAL text on DuckDB, which originated
    the syntax, so this row pins that both engines resolve ALL to
    the same column set.

    Determinism: exact decimal totals; ORDER BY ALL is a total order
    over the whole row.

    Scale (100 TB): resolves at ANALYSIS time to the ordinary
    grouped plan — partial+final hash agg, one exchange on the two
    status columns; the sugar costs nothing physical."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("mq_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(38,2)) AS DOUBLE) AS total
        FROM mq_gba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ------------------------------------------ values_inline_dim_join (r11)

@register(
    "values_inline_dim_join",
    oracle="""
    SELECT w.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * w.weight)
                AS DECIMAL(38,2)) AS weighted_total
    FROM orders o
    JOIN (VALUES ('1-URGENT', 3, 'hot'),
                 ('2-HIGH', 2, 'hot'),
                 ('3-MEDIUM', 1, 'warm'),
                 ('4-NOT SPECIFIED', 1, 'warm'),
                 ('5-LOW', 0, 'cold')) AS w(prio, weight, tier)
      ON o.o_orderpriority = w.prio
    GROUP BY w.tier
    ORDER BY w.tier
    """,
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES inline table constructor as a JOINED dimension — the
    "lookup table in the query text" idiom (priority → weight/tier)
    every migration script uses before the dim table exists.  The
    oracle runs the identical VALUES text on DuckDB.

    Determinism: the inline dim is literal; weighted totals are
    exact decimal x integer products.

    Scale (100 TB): a VALUES relation is a LocalRelation — Catalyst
    folds it into a broadcast build side automatically (5 rows), so
    the fact scan joins map-side with no exchange."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("mq_vals_orders")
    return spark.sql(
        """
        SELECT w.tier,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))
                             * w.weight)
                         AS DECIMAL(38,2)) AS DOUBLE) AS weighted_total
        FROM mq_vals_orders o
        JOIN (VALUES ('1-URGENT', 3, 'hot'),
                     ('2-HIGH', 2, 'hot'),
                     ('3-MEDIUM', 1, 'warm'),
                     ('4-NOT SPECIFIED', 1, 'warm'),
                     ('5-LOW', 0, 'cold')) AS w(prio, weight, tier)
          ON o.o_orderpriority = w.prio
        GROUP BY w.tier
        ORDER BY w.tier
        """
    )


# --------------------------------------------- listagg_sorted_groups (r12)

@register(
    "listagg_sorted_groups",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_rich,
           STRING_AGG(c.c_name, ',' ORDER BY c.c_name) AS names_csv
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9900
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def listagg_sorted_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED STRING AGGREGATION (SQL:2023 LISTAGG / DuckDB
    STRING_AGG ... ORDER BY): the names of each nation's richest
    customers (acctbal > 9900) as one deterministic comma-joined
    string.  Spark expresses the ordered aggregate as
    array_join(array_sort(collect_list(...))) — collect_list order is
    partition-nondeterministic, so the EXPLICIT array_sort is what
    makes the result well-defined (and hash-stable), the exact pitfall
    this operator documents.

    Determinism: group sets are exact; the join order inside the
    string is lexicographic by construction on both engines.

    Scale (100 TB): the acctbal filter pushes to the scan; the nation
    dim broadcasts; per-group lists are selectivity-bounded (document
    the bound when reusing — an unfiltered listagg over a fact table
    is a driver-killer, not an operator)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rich"),
            F.array_join(
                F.array_sort(F.collect_list("c_name")), ","
            ).alias("names_csv"),
        )
        .orderBy("n_name")
    )


# --------------------------------------- win_first_last_ignore_nulls (r12)

@register(
    "win_first_last_ignore_nulls",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'view' THEN NULL
                    ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT) END AS nv
        FROM events
    ),
    w AS (
        SELECT user_id,
               FIRST_VALUE(nv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS first_nn,
               LAST_VALUE(nv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS last_nn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events
        FROM s
    )
    SELECT DISTINCT user_id, first_nn, last_nn,
           CAST(n_events AS BIGINT) AS n_events
    FROM w ORDER BY user_id
    """,
)
def win_first_last_ignore_nulls(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with IGNORE NULLS (SQL:2008 T618) over
    each user's event timeline: the first and last non-null cents
    value (views carry NULL) — the null-skipping window surface that
    LOCF/carry-forward pipelines build on (`locf_impute` is the
    bounded-frame cousin).  Spark spells it F.first/F.last(...,
    ignorenulls=True) over an unbounded frame; DuckDB spells it
    FIRST_VALUE(x IGNORE NULLS).

    Determinism: (ts, event_id) is a unique order key, so first/last
    are well-defined; all outputs exact int64.

    Scale (100 TB): ONE user-partitioned window (both functions +
    the count share the same partitioning — one shuffle) followed by
    a distinct that collapses user-locally."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(
            F.expr(_CENTS_EV)
        ).alias("nv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("user_id")
    return (
        s.select(
            "user_id",
            F.first("nv", ignorenulls=True).over(w).alias("first_nn"),
            F.last("nv", ignorenulls=True).over(w).alias("last_nn"),
            F.count(F.lit(1)).over(wc).cast("bigint").alias("n_events"),
        )
        .distinct()
        .orderBy("user_id")
    )


# ------------------------------------------- try_arith_null_safety (r12)

@register(
    "try_arith_null_safety",
    oracle="""
    WITH s AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents,
               o_custkey % 7 AS k,
               TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                             THEN CAST(o_orderkey AS VARCHAR)
                             ELSE o_orderstatus END AS INT) AS tc
        FROM orders
    ),
    q AS (
        SELECT CAST(cents AS DOUBLE) / NULLIF(k, 0) AS qd, tc FROM s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN qd IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_null,
           CAST(SUM(CASE WHEN tc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cast_null,
           CAST(SUM(CAST(FLOOR(qd * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_q2
    FROM q
    """,
)
def try_arith_null_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-SAFE ARITHMETIC surface: Spark 3.2+ `try_divide` (NULL on
    division by zero instead of the ANSI error) and `TRY_CAST` (NULL
    on malformed input), mirrored in the oracle by the portable
    x / NULLIF(d, 0) and DuckDB TRY_CAST idioms — the null-safety
    contract an ingestion engine needs when ANSI mode is ON (this
    engine's sessions run Spark 4 defaults, ansi=true; `mcnemar_test`
    hit exactly this error class before its NULLIF guard).

    Determinism: quotients floor-quantized to int64 centi-units per
    row before the sum (budget: |q|*100 <= 6e9 per row -> sum safe to
    ~1e9 rows; re-quantize coarser past that); NULL counters exact.

    Scale (100 TB): narrow projection + one aggregation, no shuffle
    beyond the final rollup; stays in whole-stage codegen (try_*
    are JVM expressions, not UDFs)."""
    o = load(spark, sf_dir, "orders")
    s = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        (F.col("o_custkey") % 7).alias("k"),
        F.expr(
            "TRY_CAST(CASE WHEN o_orderkey % 3 = 0"
            " THEN CAST(o_orderkey AS STRING)"
            " ELSE o_orderstatus END AS INT)"
        ).alias("tc"),
    )
    q = s.select(
        F.try_divide(
            F.col("cents").cast("double"), F.nullif(F.col("k"), F.lit(0))
        ).alias("qd"),
        "tc",
    )
    return q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("qd").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_null"),
        F.sum(F.when(F.col("tc").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_cast_null"),
        F.sum(F.floor(F.col("qd") * F.lit(100.0)).cast("bigint"))
        .cast("bigint")
        .alias("sum_q2"),
    )
