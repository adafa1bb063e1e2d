"""Behavioral-analytics macros over the events stream (§2.K extension
batch: funnel, transition, retention, histogram) — the product-analytics
workloads a warehouse fed by migbq-style ingestion actually runs
(migbq only landed the raw rows; these are the downstream queries the
landing enabled — SURVEY.md §3.1).

Scale notes (100 TB): every op here aggregates the fact table down to a
small result (per-user firsts, per-pair counts, per-cohort counts,
per-bucket counts) with map-side-combinable aggregations before any
join; user-keyed windows shuffle once on user_id and reuse that
partitioning across dependent stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.registry import register


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after_signup,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel: users who signed up, then clicked
    AFTER their first signup, then purchased AFTER that first
    qualifying click.  Each stage is a per-user MIN(ts) aggregation
    joined to the previous stage's anchor time — the ordered-sequence
    semantics `COUNT(DISTINCT CASE ...)` gets wrong (it ignores
    order).

    Timestamps are compared only WITHIN each engine (anchors come from
    the same table), so µs truncation cancels and the stage counts are
    exact.

    Scale (100 TB): three shuffles on user_id, each input shrinking
    (stage-k users ⊆ stage-k-1 users); the per-stage anchor tables are
    |users| rows, joined broadcast once cohorts are small.  A one-pass
    alternative per user is `sessionize`-style collect+scan, but the
    join form keeps everything JVM-side and combinable."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "sequence_next_event",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n_transitions
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def sequence_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition (first-order Markov) counts: for each user's
    time-ordered stream, count (event_type → next event_type) pairs —
    the input to behavior models and anomaly detection on sequence
    patterns.  `lead()` ORDER BY ends with event_id, so same-µs
    neighbors order identically in both engines.

    Scale (100 TB): one shuffle on user_id for the window, then the
    transition rollup collapses to |types|² rows map-side."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               date_trunc('week', f.first_day) AS cohort_week,
               CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE))
                          / 7.0) AS BIGINT) AS week_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, and
    for each cohort the distinct users still active k weeks after their
    own first day.  Offsets count from each USER's first day (floor of
    day-diff/7), not calendar-week subtraction, so a Sunday signup and
    Monday signup age consistently.

    Scale (100 TB): first_seen is one user-keyed aggregation; the join
    back is user-co-partitioned (same key, shuffle reused); DISTINCT
    collapses to |users|×|weeks| before the final tiny rollup."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("first_day")) / 7.0
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "histogram_fixed_width",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(value) AS DECIMAL(18,2)) AS lo,
           CAST(MAX(value) AS DECIMAL(18,2)) AS hi
    FROM events GROUP BY event_type, CAST(floor(value / 25.0) AS BIGINT)
    """,
)
def histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event_type (bucket = ⌊value/25⌋)
    with exact per-bucket min/max — distribution profiling for feature
    QA.  Bucketing divides by an exact binary-representable constant
    before floor, so both engines bucket identically; min/max pass
    values through (cast to DECIMAL for canonical rendering), no
    accumulation-order sensitivity.

    Scale (100 TB): pure map-side-combinable aggregation — partials
    are |types|×|buckets| per task; no window, no join."""
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25.0).cast("bigint")
    # decimal fixes the 2-dp rounding; terminal double is the
    # driver-hash-stable rendering (DuckDB .df() emits float64)
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").cast("decimal(18,2)").cast("double").alias("lo"),
        F.max("value").cast("decimal(18,2)").cast("double").alias("hi"),
    )


@register(
    "embed_label_centroid",
    oracle="""
    WITH pos AS (
        SELECT label, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    )
    SELECT label, i - 1 AS dim, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000)
                         AS BIGINT)) AS BIGINT) AS sum_scaled,
           ROUND(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000)
                          AS BIGINT)) / (COUNT(*) * 10000000.0), 4) + 0.0
               AS mean_comp
    FROM pos GROUP BY label, i
    """,
)
def embed_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, computed EXACTLY: each float32
    component is widened to double (exact), scaled by 1e7 and FLOORED
    to an integer, so the per-dimension sums are associative integer
    arithmetic — hash-checkable (a naive float SUM is
    accumulation-order-dependent; and float→DECIMAL casts disagree
    across engines: Spark goes through the float's shortest decimal
    string, DuckDB through the exact binary expansion — floor-of-scaled
    -double sidesteps both).  The rounded mean derives from the exact
    sum with ONE final IEEE division.  Centroids are the building block
    for k-means/IVF cell updates and label-prototype features.

    Scale (100 TB): posexplode multiplies rows by dim (×64) but each
    (label, dim) partial collapses map-side; the shuffle carries
    |labels|×64 integer accumulators per task, independent of corpus
    size.  The same scaled-int trick makes distributed k-means
    iterations reproducible run-to-run (cf. common.scaled_sum_agg)."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim", "comp")
    )
    scaled = F.floor(F.col("comp").cast("double") * 10000000).cast("bigint")
    summed = ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(scaled).alias("sum_scaled"),
    )
    return summed.select(
        "label",
        # posexplode pos is int32; DuckDB generate_series is BIGINT —
        # driver hashes pandas dtypes, so widen to match (r1 VERDICT)
        F.col("dim").cast("bigint").alias("dim"),
        "n_vecs",
        "sum_scaled",
        # + 0.0 canonicalizes IEEE -0.0 (DuckDB ROUND keeps the sign of a
        # tiny negative, Spark drops it; the driver hashes the rendering)
        (
            F.round(F.col("sum_scaled") / (F.col("n_vecs") * F.lit(10000000.0)), 4)
            + F.lit(0.0)
        ).alias("mean_comp"),
    )


@register(
    "profile_null_distinct",
    oracle="""
    WITH stacked AS (
        SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_status_nullable', NULLIF(o_orderstatus, 'P') FROM orders
    )
    SELECT col_name, COUNT(*) AS n_rows, COUNT(val) AS n_non_null,
           COUNT(DISTINCT val) AS n_distinct
    FROM stacked GROUP BY col_name
    """,
)
def profile_null_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling audit (row count / non-null / exact distinct per
    column) — the data-quality report run before a table is admitted to
    a training corpus, and the generalization of migbq's count-only
    `check`.  Columns are stacked to (col_name, val) rows so ONE
    aggregation pass profiles any number of columns — no per-column
    rescans; `NULLIF` derives a nullable column so the null branch is
    genuinely exercised.

    Scale (100 TB): stack is a row-local generator (×k columns, no
    shuffle); the profile is one groupBy whose partials collapse to
    |columns| rows map-side — except exact DISTINCT, which shuffles
    (col_name, val) pairs; swap `count_distinct` for
    `approx_count_distinct` when cardinalities make exactness
    unaffordable (see agg_approx_distinct)."""
    o = load(spark, sf_dir, "orders")
    stacked = o.select(
        F.expr(
            "stack(5,"
            " 'o_orderkey', cast(o_orderkey as string),"
            " 'o_custkey', cast(o_custkey as string),"
            " 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority,"
            " 'o_status_nullable', nullif(o_orderstatus, 'P')"
            ") as (col_name, val)"
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_non_null"),
        F.count_distinct("val").alias("n_distinct"),
    )


@register(
    "active_users_7d",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT days.d,
           COUNT(DISTINCT daily.user_id) AS wau
    FROM days JOIN daily
      ON daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the sliding DISTINCT
    that a plain window frame cannot compute (COUNT(DISTINCT) isn't
    frame-able): deduplicate to (day, user) grain first, then a
    day-grid range join re-counts each user's days into every window
    it falls in.

    Scale (100 TB): the (day,user) dedup collapses the fact table to
    |users|×|days| BEFORE the ×7 range-join fan-out, and the grid side
    is |days| rows — broadcast; so the expensive stage is bounded by
    active-pairs×7, independent of event volume.  (For approximate
    WAU at extreme user counts, per-day HLL sketches union across the
    window instead — see agg_approx_distinct.)"""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = F.broadcast(daily.select(F.col("d").alias("win_d")).distinct())
    return (
        days.join(
            daily,
            (F.col("d") >= F.date_sub("win_d", 6)) & (F.col("d") <= F.col("win_d")),
        )
        .groupBy(F.col("win_d").alias("d"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@register(
    "percent_change_wow",
    oracle="""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT wk, n_events,
           LAG(n_events) OVER (ORDER BY wk) AS prev_n,
           ROUND((n_events - LAG(n_events) OVER (ORDER BY wk)) * 100.0
                 / LAG(n_events) OVER (ORDER BY wk), 4) AS pct_change
    FROM weekly
    """,
)
def percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change of event volume: weekly rollup +
    lag, one IEEE division on exact integers, 4-dp rounded.  The wk key
    is unique so the unpartitioned lag is deterministic, and its input
    is the tiny weekly series, never the fact table.

    Scale (100 TB): the weekly rollup is map-side-combinable; the lag
    runs on |weeks| rows on one task — negligible at any scale."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy("wk")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "wk",
        "n_events",
        prev.alias("prev_n"),
        F.round((F.col("n_events") - prev) * 100.0 / prev, 4).alias(
            "pct_change"
        ),
    )


@register(
    "top_pairs_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def top_pairs_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users did both — the support counts feeding
    association rules / feature crosses.  Deduplicate to (user, type)
    grain FIRST, so the per-user self-join fans out |types-per-user|²,
    never |events-per-user|².

    Scale (100 TB): the dedup shuffles once per branch (AQE broadcasts
    the deduped side at small SF — observed in the plan; at scale the
    sort-merge path hash-partitions BOTH branches on user_id and
    ReuseExchange collapses the duplicated dedup subplan); fan-out is
    bounded by |types-per-user|², and the output collapses to |types|²
    rows map-side."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "user_path_string",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path,
           COUNT(*) AS n_steps
    FROM o WHERE rn <= 8
    GROUP BY user_id
    """,
)
def user_path_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User journey path: each user's first 8 events concatenated in
    time order ('view>click>purchase…') — the path-analysis input for
    funnel mining and sequence clustering.  Order is pinned end-to-end:
    an explicit row_number (ts, event_id) both truncates to 8 and
    drives the ordered aggregation (Spark: sort_array of (rn, type)
    structs then transform+concat; bare collect_list is
    partition-order-dependent and never hash-safe).

    Scale (100 TB): one shuffle on user_id; the 8-step cap bounds both
    state and output row width regardless of per-user volume."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 8)
    )
    return o.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
        ).alias("path"),
        F.count(F.lit(1)).alias("n_steps"),
    )


@register(
    "decile_lift_table",
    oracle="""
    WITH scored AS (
        SELECT value AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               NTILE(10) OVER (ORDER BY value DESC, event_id) AS decile
        FROM events
    ),
    base AS (SELECT AVG(y * 1.0) AS base_rate FROM scored)
    SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(AVG(y * 1.0), 4) AS pos_rate,
           ROUND(AVG(y * 1.0) / base.base_rate, 4) AS lift
    FROM scored, base GROUP BY decile, base.base_rate
    """,
)
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the standard model-evaluation report: rank
    all examples by score (here `value` proxies a model score, purchase
    is the positive label), split into 10 equal-count bins, and compare
    each bin's positive rate to the corpus base rate.  NTILE order
    carries the event_id tiebreak so bin assignment is deterministic;
    rates are integer-count ratios with one rounded division each.

    Scale (100 TB): exact global NTILE needs a total order — fine for
    eval sets (≤ millions of rows on one task); for full-corpus scoring
    swap in approx_percentile score boundaries (the
    quantile_bucket_features pattern) and keep this exact path for the
    held-out table."""
    e = load(spark, sf_dir, "events")
    w = Window.orderBy(F.desc("value"), "event_id")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.ntile(10).over(w).alias("decile"),
    )
    base = scored.agg(F.avg(F.col("y") * 1.0).alias("base_rate"))
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.round(F.avg(F.col("y") * 1.0), 4).alias("pos_rate"),
            F.avg(F.col("y") * 1.0).alias("_raw_rate"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            "decile",
            "n",
            "n_pos",
            "pos_rate",
            F.round(F.col("_raw_rate") / F.col("base_rate"), 4).alias("lift"),
        )
    )


@register(
    "seasonality_dow_hour",
    oracle="""
    SELECT isodow(CAST(ts AS TIMESTAMP)) - 1 AS weekday,
           hour(CAST(ts AS TIMESTAMP)) AS hr,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def seasonality_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: event volume and distinct actives on the
    (weekday × hour) grid — the traffic-shape matrix behind capacity
    planning and seasonally-adjusted anomaly baselines
    (anomaly_zscore_daily compares to a flat trailing window; this is
    the input for a weekday-aware one).  Weekday numbering is pinned
    cross-engine: Spark `weekday()` (0 = Monday) ≡ DuckDB isodow − 1 —
    bare `dayofweek` DISAGREES between engines (Sunday-1 vs Sunday-0).

    Scale (100 TB): pure map-side-combinable counts to a fixed 7×24
    grid; the exact DISTINCT shuffles (weekday, hr, user) triples —
    swap for HLL per cell at extreme user counts."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.weekday("ts").alias("weekday"), F.hour("ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "abc_pareto_class",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, revenue,
               SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum_rev,
               SUM(revenue) OVER () AS total_rev
        FROM rev
    ),
    classed AS (
        SELECT o_custkey, revenue,
               CASE WHEN CAST(cum_rev AS DOUBLE)
                         <= CAST(total_rev AS DOUBLE) * 0.8 THEN 'A'
                    WHEN CAST(cum_rev AS DOUBLE)
                         <= CAST(total_rev AS DOUBLE) * 0.95 THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked
    )
    SELECT abc, COUNT(*) AS n_customers,
           CAST(SUM(revenue) AS DECIMAL(38,2)) AS class_revenue
    FROM classed GROUP BY abc
    """,
)
def abc_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification: customers ranked by revenue, running
    cumulative share splits them into A (first 80% of revenue), B (to
    95%), C (tail) — the 80/20 segmentation behind tiering and
    retention spend.  The cumulative window runs over the per-customer
    ROLLUP (|customers| rows) with a custkey tiebreak; revenue sums are
    exact DECIMAL, class boundaries one double comparison each (same
    cum/total values both engines → same class).

    Scale (100 TB): the fact pass is one combinable aggregation; the
    ranked scan is |customers| rows — if even that is too large for one
    task, pre-bucket by revenue range and run the cumulative pass over
    bucket subtotals first (two-level Pareto)."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    w_cum = Window.orderBy(F.desc("revenue"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "o_custkey",
        "revenue",
        F.sum("revenue").over(w_cum).cast("double").alias("cum_rev"),
        F.sum("revenue").over(w_all).cast("double").alias("total_rev"),
    )
    abc = (
        F.when(F.col("cum_rev") <= F.col("total_rev") * 0.8, "A")
        .when(F.col("cum_rev") <= F.col("total_rev") * 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.select("revenue", abc.alias("abc"))
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("revenue").cast("decimal(38,2)").cast("double")
            .alias("class_revenue"),
        )
    )


@register(
    "distribution_drift",
    oracle="""
    WITH bounds AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events),
    tagged AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP))
                         <= (epoch_us(CAST(b.lo AS TIMESTAMP))
                             + epoch_us(CAST(b.hi AS TIMESTAMP))) // 2
                    THEN 'ref' ELSE 'cur' END AS win
        FROM events e, bounds b
    ),
    counts AS (
        SELECT event_type, win, COUNT(*) AS n FROM tagged GROUP BY 1, 2
    ),
    tot AS (SELECT win, SUM(n) AS total FROM counts GROUP BY win),
    shares AS (
        SELECT c.event_type, c.win, c.n * 1.0 / t.total AS share
        FROM counts c JOIN tot t USING (win)
    )
    SELECT r.event_type,
           ROUND(r.share, 4) AS ref_share,
           ROUND(c.share, 4) AS cur_share,
           ROUND(abs(c.share - r.share), 4) AS abs_drift
    FROM shares r JOIN shares c
      ON r.event_type = c.event_type AND r.win = 'ref' AND c.win = 'cur'
    """,
)
def distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report: the event-type mix of the data's
    second (current) half compared against its first (reference) half —
    per-category share delta, the ingredient of PSI/chi-square drift
    alarms a production pipeline runs before trusting new data.  The
    split point is derived in-query (midpoint of the time span, integer
    µs), so the check is sf-independent; shares are integer-count
    ratios, one rounded division each.

    Scale (100 TB): two combinable aggregations over one scan (window
    tag is row-local); the share join runs on |categories| rows."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.unix_micros("ts")
            <= F.expr("(lo + hi) div 2"),
            "ref",
        ).otherwise("cur").alias("win"),
    )
    counts = tagged.groupBy("event_type", "win").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("win").agg(F.sum("n").alias("total"))
    shares = counts.join(tot, "win").select(
        "event_type", "win", (F.col("n") * 1.0 / F.col("total")).alias("share")
    )
    r = shares.filter(F.col("win") == "ref").select(
        "event_type", F.col("share").alias("ref_share_raw")
    )
    c = shares.filter(F.col("win") == "cur").select(
        "event_type", F.col("share").alias("cur_share_raw")
    )
    return r.join(c, "event_type").select(
        "event_type",
        F.round("ref_share_raw", 4).alias("ref_share"),
        F.round("cur_share_raw", 4).alias("cur_share"),
        F.round(F.abs(F.col("cur_share_raw") - F.col("ref_share_raw")), 4).alias(
            "abs_drift"
        ),
    )


@register(
    "gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT revenue,
               ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i,
               COUNT(*) OVER () AS n
        FROM rev
    )
    SELECT MAX(n) AS n_customers,
           ROUND(2.0 * SUM(CAST(i AS DOUBLE) * CAST(revenue AS DOUBLE))
                 / (MAX(n) * SUM(CAST(revenue AS DOUBLE)))
                 - (MAX(n) + 1.0) / MAX(n), 4) AS gini
    FROM ranked
    """,
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration — the single-number
    inequality summary behind abc_pareto_class (G = 2·Σ i·xᵢ /(n·Σxᵢ)
    − (n+1)/n over ascending-sorted values): 0 = evenly spread,
    →1 = winner-takes-all.  Rank order carries the custkey tiebreak
    (ties in revenue don't change the sum, but pinned order is the
    house rule); the rank-weighted sum is a double reduction — the SUM
    accumulation order is engine-internal, but each addend is a product
    of identical doubles, and the 4-dp rounding absorbs reduction-order
    ulps (float-sensitive per SURVEY §7.4).

    Scale (100 TB): the rollup is combinable; the ranked pass is
    |customers| rows — pre-aggregate to revenue buckets first when even
    that is too large (bucket-Gini bounds the true one)."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    w = Window.orderBy("revenue", "o_custkey")
    ranked = rev.select(
        F.col("revenue").cast("double").alias("x"),
        F.row_number().over(w).cast("double").alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x"))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
    )


@register(
    "attribution_first_last",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, event_type,
               FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                           IGNORE NULLS) OVER w AS first_click_id,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS last_click_id
        FROM events WHERE event_type IN ('click', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, first_click_id, last_click_id
    FROM s WHERE event_type = 'purchase'
    """,
)
def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch AND last-touch attribution in ONE window pass: clicks
    and purchases interleave per user in time order; each purchase row
    reads the first and the most recent preceding click from carried
    window registers — the two attribution models marketers compare,
    computed without any self-join (the join_asof formulation does one
    anchor per pass; this does both at once and keeps purchases with no
    prior click, attributed NULL).

    Scale (100 TB): one shuffle on user_id; state per partition is two
    registers (first seen, last seen click id) — independent of
    per-user volume."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.first(click_id, ignorenulls=True).over(w).alias("first_click_id"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
    )
    return s.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "first_click_id",
        "last_click_id",
    )


@register(
    "pair_affinity_lift",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    singles AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ROUND((p.n_both * 1.0 / nu.n_users)
                 / ((sa.n * 1.0 / nu.n_users) * (sb.n * 1.0 / nu.n_users)),
                 4) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN nu
    """,
)
def pair_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift per event-type pair: P(A∧B) / (P(A)·P(B)) over
    the user population — the normalization that turns raw
    co-occurrence counts (top_pairs_cooccurrence) into an affinity
    signal (lift > 1 ⇒ the behaviors attract; ≈1 ⇒ independent).  All
    probabilities are integer-count ratios over the same user base;
    one rounded division chain per pair.

    Scale (100 TB): singles and the population count ride the same
    (user,type) dedup as the pair join; the lift join runs on |types|²
    rows — broadcast."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ev.agg(F.count_distinct("user_id").alias("n_users"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both") * 1.0 / F.col("n_users"))
                / (
                    (F.col("na") * 1.0 / F.col("n_users"))
                    * (F.col("nb") * 1.0 / F.col("n_users"))
                ),
                4,
            ).alias("lift"),
        )
    )


@register(
    "kl_divergence_drift",
    oracle="""
    WITH bounds AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events),
    tagged AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP))
                         <= (epoch_us(CAST(b.lo AS TIMESTAMP))
                             + epoch_us(CAST(b.hi AS TIMESTAMP))) // 2
                    THEN 'ref' ELSE 'cur' END AS win
        FROM events e, bounds b
    ),
    counts AS (
        SELECT event_type, win, COUNT(*) AS n FROM tagged GROUP BY 1, 2
    ),
    tot AS (SELECT win, SUM(n) AS total FROM counts GROUP BY win),
    shares AS (
        SELECT c.event_type, c.win, c.n * 1.0 / t.total AS share
        FROM counts c JOIN tot t USING (win)
    )
    SELECT ROUND(SUM(c.share * ln(c.share / r.share)), 4) AS kl_cur_ref,
           ROUND(SUM(r.share * ln(r.share / c.share)), 4) AS kl_ref_cur,
           COUNT(*) AS n_categories
    FROM shares r JOIN shares c
      ON r.event_type = c.event_type AND r.win = 'ref' AND c.win = 'cur'
    """,
)
def kl_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence between the current and reference halves of the
    event-type mix — the information-theoretic drift scalar that
    aggregates distribution_drift's per-category deltas into one
    alarm-able number (both directions reported; their average is the
    symmetrized form PSI approximates).  Shares are exact-count ratios;
    the Σ p·ln(p/q) reduction is 4-dp rounded (float-sensitive).  The
    category join is inner, so a category present in only one window
    (infinite KL) must be handled upstream by smoothing — with five
    always-present types the fixture never hits it.

    Scale (100 TB): identical cost profile to distribution_drift — two
    combinable counts over one scan plus a |categories|-row join."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.unix_micros("ts") <= F.expr("(lo + hi) div 2"), "ref"
        ).otherwise("cur").alias("win"),
    )
    counts = tagged.groupBy("event_type", "win").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("win").agg(F.sum("n").alias("total"))
    shares = counts.join(tot, "win").select(
        "event_type", "win", (F.col("n") * 1.0 / F.col("total")).alias("share")
    )
    r = shares.filter(F.col("win") == "ref").select(
        "event_type", F.col("share").alias("p_ref")
    )
    c = shares.filter(F.col("win") == "cur").select(
        "event_type", F.col("share").alias("p_cur")
    )
    j = r.join(c, "event_type")
    return j.agg(
        F.round(
            F.sum(F.col("p_cur") * F.log(F.col("p_cur") / F.col("p_ref"))), 4
        ).alias("kl_cur_ref"),
        F.round(
            F.sum(F.col("p_ref") * F.log(F.col("p_ref") / F.col("p_cur"))), 4
        ).alias("kl_ref_cur"),
        F.count(F.lit(1)).alias("n_categories"),
    )


@register(
    "dau_stickiness_jaccard",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    sizes AS (SELECT d, COUNT(*) AS n FROM daily GROUP BY d),
    overlap AS (
        SELECT a.d AS d_prev, b.d AS d_cur, COUNT(*) AS n_both
        FROM daily a JOIN daily b
          ON b.d = a.d + INTERVAL 1 DAY AND a.user_id = b.user_id
        GROUP BY a.d, b.d
    )
    SELECT o.d_cur AS d, sp.n AS n_prev, sc.n AS n_cur, o.n_both,
           ROUND(o.n_both * 1.0 / (sp.n + sc.n - o.n_both), 4)
               AS jaccard
    FROM overlap o
    JOIN sizes sp ON sp.d = o.d_prev
    JOIN sizes sc ON sc.d = o.d_cur
    """,
)
def dau_stickiness_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day stickiness: Jaccard similarity between consecutive
    days' active-user sets — the returning-vs-churning pulse a product
    team tracks daily (high ⇒ the same users return; low ⇒ the
    audience churns through).  Set sizes and intersections are exact
    integer counts from the (day, user) dedup; one rounded division
    per day pair.

    Scale (100 TB): the dedup collapses the fact table first; the
    adjacent-day self-join is co-partitioned on user_id (day shift is
    a join predicate, not a new key) and the size join runs on |days|
    rows — broadcast."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    sizes = daily.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("b.d") == F.date_add(F.col("a.d"), 1))
            & (F.col("a.user_id") == F.col("b.user_id")),
        )
        .groupBy(F.col("a.d").alias("d_prev"), F.col("b.d").alias("d_cur"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sp = sizes.select(F.col("d").alias("d_prev"), F.col("n").alias("n_prev"))
    sc = sizes.select(F.col("d").alias("d_cur"), F.col("n").alias("n_cur"))
    return (
        overlap.join(F.broadcast(sp), "d_prev")
        .join(F.broadcast(sc), "d_cur")
        .select(
            F.col("d_cur").alias("d"),
            "n_prev",
            "n_cur",
            "n_both",
            F.round(
                F.col("n_both")
                * 1.0
                / (F.col("n_prev") + F.col("n_cur") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


@register(
    "conversion_time_distribution",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_purchase
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s.t_signup
        GROUP BY e.user_id
    )
    SELECT CAST((p.t_purchase - s.t_signup) // 3600000000 // 24 AS BIGINT)
               AS days_to_convert,
           COUNT(*) AS n_users,
           MIN((p.t_purchase - s.t_signup) // 3600000000) AS min_hours,
           MAX((p.t_purchase - s.t_signup) // 3600000000) AS max_hours
    FROM p JOIN s ON p.user_id = s.user_id
    GROUP BY 1
    """,
)
def conversion_time_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: time from each user's first
    signup to their first subsequent purchase, bucketed by whole days —
    the funnel-velocity histogram that tells a growth team WHERE the
    lag sits (events_funnel counts who converts; this measures how
    fast).  All arithmetic is integer epoch-µs floor-divided to hours
    then days — exact in both engines.

    Scale (100 TB): two user-keyed anchor aggregations (second one
    join-filtered by the first, shuffle reused on user_id); the
    histogram collapses map-side to |day-buckets| rows."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.unix_micros("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_purchase"))
    )
    j = p.join(s, "user_id")
    hours = F.expr("(t_purchase - t_signup) div 3600000000")
    return j.groupBy(
        F.expr("(t_purchase - t_signup) div 3600000000 div 24").alias(
            "days_to_convert"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min(hours).alias("min_hours"),
        F.max(hours).alias("max_hours"),
    )


@register(
    "streak_longest_active_days",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS grp
        FROM daily
    ),
    streaks AS (
        SELECT user_id, grp, COUNT(*) AS len,
               MIN(d) AS streak_start
        FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           MIN(CASE WHEN len = ml THEN streak_start END) AS earliest_longest
    FROM (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS ml FROM streaks) t
    GROUP BY user_id
    """,
)
def streak_longest_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    engagement/gamification metric — via the date-minus-rank trick:
    within a user's distinct active days, consecutive dates share a
    constant (date − row_number), so one GROUP BY on that constant
    yields every streak without a lag-flag cascade (the OTHER
    gaps-and-islands formulation; sessionize_gaps shows the lag-based
    one).  Ties on streak length resolve to the earliest start date —
    deterministic.

    Scale (100 TB): the dedup and both windowed passes share one
    shuffle on user_id; arithmetic is date-integer exact."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = daily.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    wm = Window.partitionBy("user_id")
    t = streaks.withColumn("ml", F.max("len").over(wm))
    return t.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.min(
            F.when(F.col("len") == F.col("ml"), F.col("streak_start"))
        ).alias("earliest_longest"),
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice))))
                    AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM d)
    SELECT d.digit, COUNT(*) AS n_values,
           ROUND(COUNT(*) * 1.0 / tot.n, 4) AS observed_share,
           ROUND(log10(1.0 + 1.0 / d.digit), 4) AS benford_expected
    FROM d, tot GROUP BY d.digit, tot.n
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order amounts: observed
    leading-digit shares against the log₁₀(1+1/d) expectation — the
    classic anomaly/fraud smell test for any organically-generated
    monetary column (fabricated numbers over-sample middle digits).
    The digit is extracted arithmetically (⌊x/10^⌊log₁₀x⌋⌋), NEVER from
    the string rendering — engines format doubles differently; the
    log₁₀-floor is ulp-stable except exactly at powers of ten, which
    cent-valued prices don't hit.

    Scale (100 TB): row-local digit extraction + one combinable count
    to 9 buckets."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    d = o.select(digit.alias("digit"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_values",
            F.round(F.col("n_values") * 1.0 / F.col("n"), 4).alias(
                "observed_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias(
                "benford_expected"
            ),
        )
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
    base AS (
        SELECT o.o_custkey,
               date_diff('day', MAX(CAST(o.o_orderdate AS DATE)), a.mx)
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS monetary
        FROM orders o, anchor a
        GROUP BY o.o_custkey, a.mx
    ),
    scored AS (
        SELECT o_custkey,
               NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
               NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
               monetary
        FROM base
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary) AS DECIMAL(38,2)) AS segment_revenue
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — THE classic customer scoring: recency (days
    since last order, vs the dataset's own max-date anchor), frequency
    (order count) and monetary (exact DECIMAL revenue), each
    quartile-scored 1–4 (1 = best: most recent / most frequent /
    highest spend) with custkey tiebreaks making every NTILE
    deterministic; the rollup reports customers and revenue per (R,F,M)
    cell — the 64-segment map marketing actions target.

    Scale (100 TB): the base rollup is one combinable aggregation; the
    three NTILEs run over |customers| rows (single total order each —
    swap in approx-quantile score boundaries at extreme cardinality,
    cf. decile_lift_table); the segment rollup is 64 rows."""
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("mx"))
    base = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey", "mx")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = base.select(
        "o_custkey",
        "monetary",
        F.ntile(4).over(Window.orderBy("recency_days", "o_custkey")).alias(
            "r_score"
        ),
        F.ntile(4).over(
            Window.orderBy(F.desc("frequency"), "o_custkey")
        ).alias("f_score"),
        F.ntile(4).over(
            Window.orderBy(F.desc("monetary"), "o_custkey")
        ).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("decimal(38,2)").cast("double")
        .alias("segment_revenue"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
        SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_day
        FROM orders GROUP BY o_custkey
    ),
    rev AS (
        SELECT CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week,
               CAST(floor(date_diff('day', f.first_day,
                                    CAST(o.o_orderdate AS DATE)) / 7.0)
                    AS BIGINT) AS week_offset,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS revenue
        FROM orders o JOIN first_seen f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, revenue,
           CAST(SUM(revenue) OVER (PARTITION BY cohort_week
                                   ORDER BY week_offset
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW)
                AS DECIMAL(38,2)) AS cum_revenue
    FROM rev
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: revenue per (first-order-week cohort ×
    customer-anchored week offset) with the running cumulative — the
    lifetime-value trajectory that tells whether newer cohorts monetize
    faster (the revenue twin of retention_cohorts' activity triangle).
    All revenue arithmetic is exact DECIMAL; offsets are integer
    day-diffs; week_offset is unique within a cohort so the running
    sum needs no extra tiebreak.

    Scale (100 TB): first_seen and the revenue rollup share the
    customer-key shuffle; the cumulative window runs over the tiny
    (cohort × offset) grid."""
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_day")
    )
    rev = (
        o.join(first, "o_custkey")
        .groupBy(
            F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("o_orderdate"), F.col("first_day")) / 7.0
            ).alias("week_offset"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cumulate over the exact decimals; terminal double for driver hash
    return rev.select(
        "cohort_week",
        "week_offset",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("decimal(38,2)").cast("double")
        .alias("cum_revenue"),
    )


@register(
    "chi2_independence_dow",
    oracle="""
    WITH o AS (
        SELECT event_type, isodow(ts) - 1 AS dow,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM events GROUP BY event_type, isodow(ts) - 1
    ),
    tot AS (
        SELECT event_type, dow, obs,
               SUM(obs) OVER (PARTITION BY event_type) AS rt,
               SUM(obs) OVER (PARTITION BY dow) AS ct,
               SUM(obs) OVER () AS n,
               COUNT(DISTINCT event_type) OVER () AS nr,
               COUNT(DISTINCT dow) OVER () AS nc
        FROM o
    ),
    terms AS (
        SELECT nr, nc, n,
               CAST(FLOOR(CAST(obs * n - rt * ct AS DOUBLE)
                          * CAST(obs * n - rt * ct AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)
                             * CAST(ct AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS tq
        FROM tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((MAX(nr) - 1) * (MAX(nc) - 1) AS BIGINT) AS dof,
           ROUND(SUM(tq) / 1000000.0, 4) AS chi2,
           ROUND(sqrt(SUM(tq) / 1000000.0
                      / (MAX(n) * least(MAX(nr) - 1, MAX(nc) - 1))), 4)
               AS cramers_v
    FROM terms
    """,
)
def chi2_independence_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE TEST on the (event_type x weekday)
    contingency grid, with Cramer's V effect size — "does traffic
    composition depend on the day of week?", the categorical
    independence screen next to `seasonality_dow_hour` (which shows
    the grid) and the two-sample value tests (`ab_test_welch`,
    `mannwhitney_u_test`, `ks_test_two_sample`).  Weekday numbering is
    the repo-pinned cross-engine convention: Spark `weekday()` ≡
    DuckDB `isodow − 1` (0 = Monday).

    Determinism: observed/row/column/grand totals are exact integers;
    each cell's (O·N − R·C)²/(N·R·C) term is a fixed-order double
    expression over exactly-representable integers (|O·N − R·C| stays
    far below 2^53), quantized to integer micro-units per CELL so the
    cross-cell SUM is an integer — no float accumulation order can
    diverge between engines.

    Scale (100 TB): one partial-aggregated groupBy to the
    |types|x|weekdays| grid (35 rows); every total and the final sum
    are windows/aggregates over that tiny frame.  One scan."""
    ev = load(spark, sf_dir, "events")
    o = (
        ev.select("event_type", F.weekday("ts").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    tot = o.select(
        "obs",
        F.sum("obs").over(w_r).alias("rt"),
        F.sum("obs").over(w_c).alias("ct"),
        F.sum("obs").over(w_all).alias("n"),
        F.size(F.collect_set("event_type").over(w_all)).alias("nr"),
        F.size(F.collect_set("dow").over(w_all)).alias("nc"),
    )
    diff = (F.col("obs") * F.col("n") - F.col("rt") * F.col("ct")).cast(
        "double"
    )
    den = (
        F.col("n").cast("double")
        * F.col("rt").cast("double")
        * F.col("ct").cast("double")
    )
    tq = F.floor(diff * diff / den * F.lit(1000000.0)).cast("bigint")
    terms = tot.select("nr", "nc", "n", tq.alias("tq"))
    chi2 = F.sum("tq") / F.lit(1000000.0)
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        ((F.max("nr") - 1) * (F.max("nc") - 1)).cast("bigint").alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.max("n")
                    * F.least(F.max("nr") - 1, F.max("nc") - 1)
                )
            ),
            4,
        ).alias("cramers_v"),
    )


# ----------------------------------------------- kaplan_meier_retention

@register(
    "kaplan_meier_retention",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(MIN(ts) AS DATE) AS first_d,
               CAST(MAX(ts) AS DATE) AS last_d
        FROM events GROUP BY user_id
    ),
    obs AS (SELECT MAX(last_d) AS max_d FROM u),
    lt AS (
        SELECT user_id,
               datediff('day', first_d, last_d) AS t,
               last_d = obs.max_d AS censored
        FROM u CROSS JOIN obs
    ),
    tot AS (SELECT COUNT(*) AS n_users FROM lt),
    per_t AS (
        SELECT t,
               COUNT(*) AS n_at_t,
               CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_deaths
        FROM lt GROUP BY t
    ),
    risk AS (
        SELECT t, n_at_t, n_deaths,
               CAST(tot.n_users
                   - SUM(n_at_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   + n_at_t AS BIGINT) AS n_risk
        FROM per_t CROSS JOIN tot
    ),
    km AS (
        SELECT t, n_risk, n_deaths,
               exp(SUM(ln(1.0 - n_deaths * 1.0 / n_risk))
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) AS s
        FROM risk WHERE n_deaths >= 1
    )
    SELECT t AS t_days, n_risk, n_deaths, ROUND(s, 4) AS survival
    FROM km
    """,
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER SURVIVAL ESTIMATOR over user lifetimes — the
    censoring-correct retention curve `retention_cohorts` (raw day-N
    return rates) cannot give: a user still active on the final observed day is
    CENSORED (alive at window end, lifetime unknown), not counted as
    churned — the distinction that makes naive
    "days active" retention curves biased low near the corpus edge.
    S(t) = prod over death times u <= t of (1 - d_u/n_u), one row per
    death time with the at-risk count.

    Determinism: d_u/n_u are exact integer ratios; the log-sum runs
    over an ORDERED window (fixed accumulation order in both engines),
    and survival renders behind ROUND(-,4).

    Scale (100 TB): per-user first/last collapse map-side on user_id;
    lifetimes collapse to <= |days| rows; every window after runs on
    that tiny frame (single partition by design — same note as
    `cusum_drift_daily`).  The observation-end scalar broadcasts."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.max(F.to_date("ts")).alias("last_d"),
    ).localCheckpoint()
    obs = u.agg(F.max("last_d").alias("max_d"))
    lt = u.crossJoin(F.broadcast(obs)).select(
        F.datediff("last_d", "first_d").alias("t"),
        (F.col("last_d") == F.col("max_d")).alias("censored"),
    )
    per_t = lt.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("n_deaths"),
    )
    tot = lt.agg(F.count(F.lit(1)).alias("n_users"))
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_users") - F.sum("n_at_t").over(w_cum) + F.col("n_at_t"),
    )
    km = risk.filter(F.col("n_deaths") >= 1).withColumn(
        "s",
        F.exp(
            F.sum(
                F.log(
                    F.lit(1.0)
                    - F.col("n_deaths") * F.lit(1.0) / F.col("n_risk")
                )
            ).over(w_cum)
        ),
    )
    return km.select(
        F.col("t").alias("t_days"),
        "n_risk",
        "n_deaths",
        F.round("s", 4).alias("survival"),
    )


# ----------------------------------------------- pagerank_event_graph

@register(
    "pagerank_event_graph",
    oracle="""
    WITH seq AS (
        SELECT event_type AS u,
               lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS v
        FROM events
    ),
    edges AS (
        SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w
        FROM seq WHERE v IS NOT NULL GROUP BY u, v
    ),
    nodes AS (SELECT DISTINCT event_type AS t FROM events),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    outw AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY u),
    p0 AS (
        SELECT t, CAST(1000000000000 // nn.n AS BIGINT) AS p
        FROM nodes CROSS JOIN nn
    ),
    c1 AS (
        SELECT e.v AS t,
               CAST(SUM(CAST(FLOOR(p0.p * 1.0 * e.w / o.wout) AS BIGINT))
                    AS BIGINT) AS contrib
        FROM edges e JOIN p0 ON p0.t = e.u JOIN outw o ON o.u = e.u
        GROUP BY e.v
    ),
    d1 AS (
        SELECT CAST(COALESCE(SUM(p0.p), 0) AS BIGINT) AS dm
        FROM p0 LEFT JOIN outw o ON o.u = p0.t
        WHERE o.u IS NULL
    ),
    p1 AS (
        SELECT nodes.t,
               CAST(FLOOR(0.15 * 1000000000000.0 / nn.n
                    + 0.85 * (COALESCE(c1.contrib, 0) + d1.dm // nn.n))
                    AS BIGINT) AS p
        FROM nodes LEFT JOIN c1 ON c1.t = nodes.t
        CROSS JOIN nn CROSS JOIN d1
    ),
    c2 AS (
        SELECT e.v AS t,
               CAST(SUM(CAST(FLOOR(p1.p * 1.0 * e.w / o.wout) AS BIGINT))
                    AS BIGINT) AS contrib
        FROM edges e JOIN p1 ON p1.t = e.u JOIN outw o ON o.u = e.u
        GROUP BY e.v
    ),
    d2 AS (
        SELECT CAST(COALESCE(SUM(p1.p), 0) AS BIGINT) AS dm
        FROM p1 LEFT JOIN outw o ON o.u = p1.t
        WHERE o.u IS NULL
    ),
    p2 AS (
        SELECT nodes.t,
               CAST(FLOOR(0.15 * 1000000000000.0 / nn.n
                    + 0.85 * (COALESCE(c2.contrib, 0) + d2.dm // nn.n))
                    AS BIGINT) AS p
        FROM nodes LEFT JOIN c2 ON c2.t = nodes.t
        CROSS JOIN nn CROSS JOIN d2
    )
    SELECT p2.t AS event_type,
           CAST(COALESCE(o.wout, 0) AS BIGINT) AS w_out,
           ROUND(p1.p / 1000000000000.0, 6) AS pr_iter1,
           ROUND(p2.p / 1000000000000.0, 6) AS pr_iter2,
           CAST(ROW_NUMBER() OVER (ORDER BY p2.p DESC, p2.t) AS BIGINT)
               AS rnk
    FROM p2
    JOIN p1 ON p1.t = p2.t
    LEFT JOIN outw o ON o.u = p2.t
    """,
)
def pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK (2 unrolled power iterations, damping 0.85) over the
    event-type transition graph — "which state do user journeys
    accumulate in": the graph-centrality upgrade over raw
    `sequence_next_event` counts (in-degree mass weighted by the
    IMPORTANCE of the predecessor, not just its frequency).  Includes
    the textbook dangling-node correction (mass of out-degree-0 nodes
    redistributed uniformly each iteration).

    Determinism (the BM25 move, applied to an iterative algorithm):
    rank mass lives as int64 scaled 1e12; each per-edge transfer
    floor(p(u)·w/W(u)) is one fixed-order double expression over
    int64s — identical in both engines — floored back to int64, so
    every SUM is exact integer addition and iteration results are
    bit-stable at any parallelism.  Ranks order by the integer.

    Scale (100 TB): the corpus is touched ONCE (the lead() window on
    user_id + edge rollup — the `sequence_next_event` shape); both
    iterations are joins/aggregations on the |types|²-bounded edge
    table with |types|-row rank vectors and 1-row scalars broadcast.
    K more iterations = K more tiny joins, no corpus re-scans."""
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"),
        F.lead("event_type").over(w_seq).alias("v"),
    )
    edges = (
        seq.filter(F.col("v").isNotNull())
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    nodes = (
        ev.select(F.col("event_type").alias("t")).distinct().localCheckpoint()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outw = edges.groupBy("u").agg(F.sum("w").alias("wout"))
    scale = F.lit(1000000000000)
    p0 = nodes.crossJoin(F.broadcast(nn)).select(
        "t", F.expr("1000000000000 div n").alias("p")
    )

    def iterate(p: DataFrame) -> DataFrame:
        term = F.floor(
            F.col("p") * F.lit(1.0) * F.col("w") / F.col("wout")
        ).cast("bigint")
        c = (
            edges.join(p.withColumnRenamed("t", "u"), "u")
            .join(outw, "u")
            .groupBy("v")
            .agg(F.sum(term).alias("contrib"))
            .withColumnRenamed("v", "t")
        )
        dm = (
            p.join(outw.withColumnRenamed("u", "t"), "t", "left")
            .filter(F.col("wout").isNull())
            .agg(F.coalesce(F.sum("p"), F.lit(0)).alias("dm"))
        )
        return (
            nodes.join(c, "t", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dm))
            .select(
                "t",
                F.floor(
                    F.lit(0.15) * scale / F.col("n")
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0))
                        + F.expr("dm div n")
                    )
                )
                .cast("bigint")
                .alias("p"),
            )
        )

    p1 = iterate(p0).localCheckpoint()
    p2 = iterate(p1)
    w_rnk = Window.orderBy(F.desc("p2s"), "t")
    return (
        p2.withColumnRenamed("p", "p2s")
        .join(p1.withColumnRenamed("p", "p1s"), "t")
        .join(outw.withColumnRenamed("u", "t"), "t", "left")
        .select(
            F.col("t").alias("event_type"),
            F.coalesce(F.col("wout"), F.lit(0)).cast("bigint").alias("w_out"),
            F.round(F.col("p1s") / scale.cast("double"), 6).alias("pr_iter1"),
            F.round(F.col("p2s") / scale.cast("double"), 6).alias("pr_iter2"),
            F.row_number().over(w_rnk).cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------- ab_assignment_srm_check

@register(
    "ab_assignment_srm_check",
    oracle="""
    WITH assign AS (
        SELECT DISTINCT user_id,
               CAST(concat('0x', substr(md5('exp1:'
                    || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
                   AS variant
        FROM events
    ),
    counts AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM assign GROUP BY variant
    ),
    tot AS (SELECT SUM(n_users) AS n FROM counts),
    chi AS (
        SELECT SUM((n_users - tot.n / 2.0) * (n_users - tot.n / 2.0)
                   / (tot.n / 2.0)) AS chi2
        FROM counts CROSS JOIN tot
    )
    SELECT c.variant, c.n_users,
           ROUND(c.n_users * 1.0 / tot.n, 4) AS share,
           ROUND(chi.chi2, 4) AS srm_chi2,
           chi.chi2 > 3.841 AS srm_flag
    FROM counts c CROSS JOIN tot CROSS JOIN chi
    """,
)
def ab_assignment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B BUCKET ASSIGNMENT + SAMPLE-RATIO-MISMATCH check: users are
    deterministically hashed into two variants (md5 of a salted user
    id — the industry-standard sticky assignment that needs no
    assignment table, replayable by any engine), then the observed
    split is tested against the designed 50/50 with the 1-df chi-square
    SRM test (Fabijan et al. 2019: an SRM means the EXPERIMENT
    PLUMBING is broken and the metric readout — `ab_test_welch` here —
    must not be trusted).  The op is the gate in front of the t-test.

    Determinism: assignment is pure md5 bit math; counts exact; the
    chi-square is a fixed-order expression over exact counts behind
    ROUND(·,4); the flag compares against the fixed 3.841 critical
    value (alpha = 0.05, 1 df).

    Scale (100 TB): distinct users collapse map-side; everything after
    is |variants| rows + broadcast scalars.  The same salted-hash
    expression is what the exposure logger runs row-local at serve
    time."""
    ev = load(spark, sf_dir, "events")
    assign = ev.select(
        "user_id",
        (
            F.expr(
                "cast(conv(substr(md5(concat('exp1:', "
                "cast(user_id as string))), 1, 8), 16, 10) as bigint)"
            )
            % 2
        ).alias("variant"),
    ).distinct()
    # the 2-row counts frame feeds the total, the chi-square AND the
    # output — checkpoint it so the distinct-users scan runs once
    counts = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users")
    ).localCheckpoint()
    tot = counts.agg(F.sum("n_users").alias("n"))
    dev = F.col("n_users") - F.col("n") / F.lit(2.0)
    chi = (
        counts.crossJoin(F.broadcast(tot))
        .agg(F.sum(dev * dev / (F.col("n") / F.lit(2.0))).alias("chi2"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "variant",
            "n_users",
            F.round(F.col("n_users") * F.lit(1.0) / F.col("n"), 4).alias(
                "share"
            ),
            F.round("chi2", 4).alias("srm_chi2"),
            (F.col("chi2") > F.lit(3.841)).alias("srm_flag"),
        )
    )


# ------------------------------------------ sessionized_funnel_ordered

@register(
    "sessionized_funnel_ordered",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    f AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN LAG(us) OVER w IS NULL THEN 0
                    WHEN us - LAG(us) OVER w > 1800000000 THEN 1
                    ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
        SELECT user_id, event_type, us,
               CAST(SUM(brk) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM f
    ),
    s1 AS (
        SELECT user_id, session_id, MIN(us) AS t1
        FROM s WHERE event_type = 'view'
        GROUP BY user_id, session_id
    ),
    s2 AS (
        SELECT s.user_id, s.session_id, MIN(s.us) AS t2
        FROM s JOIN s1 ON s.user_id = s1.user_id
                      AND s.session_id = s1.session_id
        WHERE s.event_type = 'click' AND s.us > s1.t1
        GROUP BY s.user_id, s.session_id
    ),
    s3 AS (
        SELECT s.user_id, s.session_id, MIN(s.us) AS t3
        FROM s JOIN s2 ON s.user_id = s2.user_id
                      AND s.session_id = s2.session_id
        WHERE s.event_type = 'purchase' AND s.us > s2.t2
        GROUP BY s.user_id, s.session_id
    ),
    tot AS (
        SELECT COUNT(*) AS n_sessions
        FROM (SELECT DISTINCT user_id, session_id FROM s)
    )
    SELECT CAST(tot.n_sessions AS BIGINT) AS n_sessions,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
               AS n_view_click_purchase,
           ROUND((SELECT COUNT(*) FROM s2) * 1.0
                 / (SELECT COUNT(*) FROM s1), 4) AS click_rate,
           ROUND((SELECT COUNT(*) FROM s3) * 1.0
                 / (SELECT COUNT(*) FROM s2), 4) AS purchase_rate
    FROM tot
    """,
)
def sessionized_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICTLY-ORDERED FUNNEL WITHIN SESSION BOUNDARIES: view →
    click → purchase must happen in that order INSIDE one 30-minute
    session — the composition of `sessionize_gaps` (same gap rule)
    and `events_funnel` (same per-stage MIN-after-anchor chaining),
    and the metric product analytics actually reports ("in-session
    conversion"), which the lifetime-scoped funnel overstates by
    crediting a purchase weeks after the click.

    Determinism: gap arithmetic on exact epoch-microsecond integers
    with event_id tiebreak; stage anchors are MINs over exact
    integers with strict `>` chaining; counts exact, two rounded
    ratios.

    Scale (100 TB): one shuffle on user_id serves the session window;
    the three stage aggregations and their session-key joins reuse
    (user_id, session_id) partitioning — no second corpus shuffle;
    the final assembly is scalar."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    brk = F.when(F.lag("us").over(w).isNull(), 0).otherwise(
        F.when(
            F.col("us") - F.lag("us").over(w) > 1_800_000_000, 1
        ).otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (
        ev.withColumn("brk", brk)
        .withColumn("session_id", F.sum("brk").over(run))
        .select("user_id", "session_id", "event_type", "us")
    )
    # session frame is consumed by four plan branches — pin it so the
    # user_id shuffle + window run once (localCheckpoint lesson)
    s = s.localCheckpoint(eager=True)
    keys = ["user_id", "session_id"]
    s1 = (
        s.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        s.filter(F.col("event_type") == "click")
        .join(s1, keys)
        .filter(F.col("us") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        s.filter(F.col("event_type") == "purchase")
        .join(s2, keys)
        .filter(F.col("us") > F.col("t2"))
        .groupBy(*keys)
        .agg(F.min("us").alias("t3"))
    )
    tot = s.select(*keys).distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_view_click"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return (
        tot.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.col("n_view").cast("bigint").alias("n_view"),
            F.col("n_view_click").cast("bigint").alias("n_view_click"),
            F.col("n_view_click_purchase")
            .cast("bigint")
            .alias("n_view_click_purchase"),
            F.round(
                F.col("n_view_click") * F.lit(1.0) / F.col("n_view"), 4
            ).alias("click_rate"),
            F.round(
                F.col("n_view_click_purchase")
                * F.lit(1.0)
                / F.col("n_view_click"),
                4,
            ).alias("purchase_rate"),
        )
    )


# -------------------------------------------- mann_whitney_u_value (r11)

@register(
    "mann_whitney_u_value",
    oracle="""
    WITH s AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    freq AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(is_a) AS BIGINT) AS ca
        FROM s GROUP BY v
    ),
    ranked AS (
        SELECT v, c, ca,
               COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n_less
        FROM freq
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(c - ca) AS BIGINT) AS nb,
               CAST(SUM(ca * (2 * n_less + c + 1)) AS BIGINT) AS r2a
        FROM ranked
    )
    SELECT na, nb,
           CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
           ROUND(CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0, 1) AS u_a,
           ROUND(1.0 - CAST(r2a - na * (na + 1) AS DOUBLE)
                       / CAST(na AS DOUBLE) / nb, 6) AS rank_biserial,
           ROUND((CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0
                  - CAST(na AS DOUBLE) * nb / 2.0)
                 / SQRT(CAST(na AS DOUBLE) * nb * (na + nb + 1) / 12.0),
                 4) AS z_approx
    FROM tot
    """,
)
def mann_whitney_u_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–WHITNEY U (Wilcoxon rank-sum) between the click and
    purchase arms' values — the NON-parametric two-sample test next
    to `ab_test_welch`'s parametric one: compares RANKS, so it holds
    under the heavy-tailed value distributions where Welch's
    normality assumption breaks.  Mid-ranks come from the value
    FREQUENCY table (rank arithmetic on counts, never a per-row sort
    of the corpus): for tied value v, 2·midrank = 2·|{x<v}| + c_v +
    1, so 2·R_A accumulates exactly in int64 and U follows from
    2U_A = 2R_A − n_A(n_A+1).

    Determinism: values quantize to cents first; every rank term is
    an exact integer; z (no tie correction — documented) and the
    rank-biserial effect size are fixed-order double formulas behind
    ROUND.

    Scale (100 TB): one groupBy(v) collapse (Heaps-bounded distinct
    values), then the shared HIERARCHICAL two-phase prefix over the
    frequency rows (r11 VERDICT "Next round" #4 — the corpus is
    scanned once and NEVER globally sorted, and no single-partition
    WindowExec appears even over the frequency table).  The prefix
    algorithm lives in ``evalstats._rank_prefix`` (256-unit range
    buckets -> 1024-bucket super-buckets -> broadcast theta-join
    prefix; see its docstring) — this op originated the shape in r11
    and now imports the shared helper (r12 ADVICE dedup).  n_less =
    exact int64 sum of the three levels."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias(
            "is_a"
        ),
    )
    freq = s.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("is_a").cast("bigint").alias("ca"),
    )
    # The hierarchical two-phase prefix lives ONCE in
    # evalstats._rank_prefix (the whole r12 rank-statistics batch and
    # histogram_equi_depth share it); the original inline copy here was
    # flagged by the r12 ADVICE as drift-prone and removed.
    from migbq_spark.operators.evalstats import _rank_prefix

    ranked = _rank_prefix(freq, "v", ["c"]).select(
        "v", "c", "ca", F.col("c_lt").alias("n_less")
    )
    tot = ranked.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("nb"),
        F.sum(
            F.col("ca")
            * (F.lit(2) * F.col("n_less") + F.col("c") + F.lit(1))
        )
        .cast("bigint")
        .alias("r2a"),
    )
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    u2d = u2.cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    return tot.select(
        "na",
        "nb",
        u2.cast("bigint").alias("u2_a"),
        F.round(u2d / F.lit(2.0), 1).alias("u_a"),
        F.round(F.lit(1.0) - u2d / nad / F.col("nb"), 6).alias(
            "rank_biserial"
        ),
        F.round(
            (u2d / F.lit(2.0) - nad * nbd / F.lit(2.0))
            / F.sqrt(nad * nbd * (nad + nbd + 1) / F.lit(12.0)),
            4,
        ).alias("z_approx"),
    )


# ----------------------------------------- chi_square_independence (r11)

@register(
    "chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type, user_id % 4 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, user_id % 4
    ),
    rows_t AS (
        SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
        FROM cells GROUP BY event_type
    ),
    cols_t AS (
        SELECT bucket, CAST(SUM(o) AS BIGINT) AS col_n
        FROM cells GROUP BY bucket
    ),
    n_t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT CAST(FLOOR(
                   (CAST(n_t.n * c.o - rows_t.r * cols_t.col_n AS DOUBLE)
                    * CAST(n_t.n * c.o - rows_t.r * cols_t.col_n AS DOUBLE))
                   / (CAST(n_t.n AS DOUBLE) * rows_t.r * cols_t.col_n)
                   * 1000000.0) AS BIGINT) AS tq
        FROM cells c
        JOIN rows_t USING (event_type)
        JOIN cols_t USING (bucket)
        CROSS JOIN n_t
    )
    SELECT CAST((SELECT COUNT(*) FROM rows_t) AS BIGINT) AS n_rows_dim,
           CAST((SELECT COUNT(*) FROM cols_t) AS BIGINT) AS n_cols_dim,
           (SELECT n FROM n_t) AS n,
           ROUND(CAST(SUM(tq) AS DOUBLE) / 1000000.0, 4) AS chi2,
           ROUND(SQRT(CAST(SUM(tq) AS DOUBLE) / 1000000.0
                      / (SELECT n FROM n_t)
                      / LEAST((SELECT COUNT(*) FROM rows_t) - 1,
                              (SELECT COUNT(*) FROM cols_t) - 1)),
                 6) AS cramers_v
    FROM terms
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE TEST OF INDEPENDENCE (event_type x user-cohort
    contingency table) with Cramér's V effect size — the categorical
    counterpart of `anova_oneway_value`: does event mix differ across
    user cohorts.  The per-cell term uses the all-integer identity
    (n·o − r·c)²/(n·r·c) (o, r, c, n are exact counts), quantized to
    int64 micro-units BEFORE the cross-cell sum — the
    quantize-before-sum move, since 20 double terms summed in engine
    order would be order-sensitive.

    Determinism: exact counts; each term is a fixed sequence of IEEE
    ops on identical integers; floor-quantized; integer-summed.

    Scale (100 TB): the contingency collapse is one map-side-
    combinable groupBy to |types|x|cohorts| (= 20) rows; margins and
    the grand total derive FROM the cells (no second corpus scan);
    everything after runs on 20 rows."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    cells = cells.localCheckpoint(eager=True)
    rows_t = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    cols_t = cells.groupBy("bucket").agg(
        F.sum("o").cast("bigint").alias("col_n")
    )
    n_t = cells.agg(F.sum("o").cast("bigint").alias("n"))
    joined = (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "bucket")
        .crossJoin(F.broadcast(n_t))
    )
    # Explicit d*d (NOT F.pow(d, 2)): Java Math.pow permits 1 ulp of
    # error while DuckDB's pow is correctly rounded, and the result
    # feeds FLOOR(term*1e6) — a 1-ulp cross-engine difference could
    # flip a quantized term at a boundary.  Plain multiplication is
    # the identical IEEE operation on both engines (r11 ADVICE; the
    # ols_closed_form idiom).
    diff = (
        F.col("n") * F.col("o") - F.col("r") * F.col("col_n")
    ).cast("double")
    term = (diff * diff) / (
        F.col("n").cast("double")
        * F.col("r")
        * F.col("col_n")
    )
    terms = joined.select(
        F.floor(term * F.lit(1000000.0)).cast("bigint").alias("tq"),
        "n",
    )
    k_rows = rows_t.agg(F.count(F.lit(1)).cast("bigint").alias("kr"))
    k_cols = cols_t.agg(F.count(F.lit(1)).cast("bigint").alias("kc"))
    chi2q = terms.groupBy("n").agg(
        F.sum("tq").cast("bigint").alias("tqs")
    )
    out = chi2q.crossJoin(F.broadcast(k_rows)).crossJoin(
        F.broadcast(k_cols)
    )
    chi2 = F.col("tqs").cast("double") / F.lit(1000000.0)
    return out.select(
        F.col("kr").alias("n_rows_dim"),
        F.col("kc").alias("n_cols_dim"),
        "n",
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / F.col("n")
                / F.least(F.col("kr") - 1, F.col("kc") - 1)
            ),
            6,
        ).alias("cramers_v"),
    )


# ------------------------------------------ triangle_count_copurchase (r11)

@register(
    "triangle_count_copurchase",
    oracle="""
    WITH lines AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pair_occ AS (
        SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS w
        FROM lines a JOIN lines b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    ),
    edges AS (SELECT u, v FROM pair_occ WHERE w >= 2),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS wedges
        FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT stats.n_nodes, ne.n_edges, tri.t AS n_triangles,
           ROUND(CASE WHEN stats.wedges = 0 THEN 0.0
                      ELSE 3.0 * tri.t / stats.wedges END, 6)
               AS clustering_coeff
    FROM stats CROSS JOIN ne CROSS JOIN tri
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNT + global clustering coefficient on the part
    CO-PURCHASE graph (parts co-occurring in >= 2 orders) — the
    distributed-graph primitive missing between `pagerank_event_graph`
    (centrality) and `dup_cc_twostar` (connectivity): triangles
    measure local cohesion, the signal behind community detection and
    recommend-together.  Edges use the market-basket SUPPORT PRUNE
    (co-occurrence >= 2): raw co-occurrence pairs grow ~quadratic in
    basket size x orders, but REPEATED pairs stay sparse at any scale
    (random pairs rarely repeat), which is what bounds the triangle
    join — the same support-threshold bound every frequent-itemset
    miner applies before pair expansion.

    Counting uses the ordered-triple identity (u < v < w via the
    canonical u < v edge orientation): each triangle counted exactly
    once, no /6 correction, no direction duplicates.

    Determinism: exact integer counts end-to-end; one rounded ratio.

    Scale (100 TB): pairs are generated ROW-LOCALLY from each
    order's collected part set (C(basket, 2) per order,
    basket-bounded — the corpus self-join alternative pays a 2x
    sort-merge join that measured minutes at sf1); the support
    filter collapses the edge set BEFORE the triangle join; the
    wedge-closing join is edges-join-edges on node keys — the
    standard vertex-partitioned triangle algorithm, with the heaviest
    node's d^2 wedge fan bounded by the support prune."""
    li = load(spark, sf_dir, "lineitem")
    # Row-local pair generation (SCALE.md "row-local pre-aggregation
    # before the explode"): collect each order's distinct-part set
    # once and emit the C(basket, 2) ordered pairs INSIDE the row —
    # a lineitem self-join on orderkey computes the same pairs but
    # pays a 2x corpus sort-merge join that measured minutes at sf1;
    # this shape is one collect_set exchange + a basket-bounded
    # explode.
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    # The support count groups ~|occurrences| NEAR-UNIQUE pair keys
    # (Heaps-linear distinct pairs).  Two measured choices at sf10:
    # pack the ordered pair into ONE int64 (u << 32 | v — safe while
    # partkey < 2^31: u*2^32 overflows SIGNED int64 at 2^31, not
    # 2^32 (r11 ADVICE); partkeys are far below 2^31 at any shipped
    # sf — swap to the struct key if the part keyspace ever outgrows
    # it) so the aggregation runs on
    # fixed-width single-long rows (struct keys measured 260 s,
    # packed 24 s), and repartition-by-key FIRST so no map-side
    # partial agg builds hash maps that collapse nothing (the
    # bloom_m_sweep r11 lesson).
    pair_occ = (
        _pair_fan_df(baskets)
        .repartition("k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(
            F.expr("CAST(k div 4294967296 AS BIGINT)").alias("u"),
            F.expr("CAST(k % 4294967296 AS BIGINT)").alias("v"),
            "w",
        )
    )
    edges = pair_occ.filter(F.col("w") >= 2).select("u", "v")
    edges = edges.localCheckpoint(eager=True)  # reused 5x below
    e1 = edges.alias("e1")
    e2 = edges.select(
        F.col("u").alias("u2"), F.col("v").alias("v2")
    )
    e3 = edges.select(
        F.col("u").alias("u3"), F.col("v").alias("v3")
    )
    tri = (
        e1.join(e2, F.col("u2") == F.col("e1.v"))
        .join(
            e3,
            (F.col("u3") == F.col("e1.u"))
            & (F.col("v3") == F.col("v2")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2)
        .cast("bigint")
        .alias("wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.round(
                F.when(F.col("wedges") == 0, F.lit(0.0)).otherwise(
                    F.lit(3.0) * F.col("t") / F.col("wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


# --------------------------------------------- ols_closed_form (r11)

#: Shared Cramer's-rule formula text for the 2-feature OLS normal
#: equations — ONE source string rendered into BOTH the Spark
#: expression and the DuckDB oracle, so the IEEE evaluation tree is
#: identical by construction (all inputs are exact integer sums cast
#: to double once).
_OLS_DETS = """
    det0 AS (SELECT *,
        (n  * (sx11 * sx22 - sx12 * sx12)
       - sx1 * (sx1  * sx22 - sx12 * sx2)
       + sx2 * (sx1  * sx12 - sx11 * sx2)) AS det,
        (sy  * (sx11 * sx22 - sx12 * sx12)
       - sx1 * (sx1y * sx22 - sx12 * sx2y)
       + sx2 * (sx1y * sx12 - sx11 * sx2y)) AS det_b0,
        (n   * (sx1y * sx22 - sx12 * sx2y)
       - sy  * (sx1  * sx22 - sx12 * sx2)
       + sx2 * (sx1  * sx2y - sx1y * sx2)) AS det_b1,
        (n   * (sx11 * sx2y - sx1y * sx12)
       - sx1 * (sx1  * sx2y - sx1y * sx2)
       + sy  * (sx1  * sx12 - sx11 * sx2)) AS det_b2
    FROM sums)
"""


@register(
    "ols_closed_form",
    oracle=f"""
    WITH raw AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x2,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y
        FROM lineitem
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x1) AS DOUBLE) AS sx1,
               CAST(SUM(x2) AS DOUBLE) AS sx2,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x1 * x1) AS DOUBLE) AS sx11,
               CAST(SUM(x1 * x2) AS DOUBLE) AS sx12,
               CAST(SUM(x2 * x2) AS DOUBLE) AS sx22,
               CAST(SUM(x1 * y) AS DOUBLE) AS sx1y,
               CAST(SUM(x2 * y) AS DOUBLE) AS sx2y,
               CAST(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS syy
        FROM raw
    ),
    {_OLS_DETS}
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(det_b0 / det / 100.0, 4) AS intercept,
           ROUND(det_b1 / det / 100.0, 4) AS beta_quantity,
           ROUND(det_b2 / det, 4) AS beta_discount,
           ROUND(1.0 - (syy - (det_b0 / det) * sy
                            - (det_b1 / det) * sx1y
                            - (det_b2 / det) * sx2y)
                       / (syy - sy * sy / n), 6) AS r_squared
    FROM det0
    """,
)
def ols_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDINARY LEAST SQUARES by the closed-form normal equations:
    extendedprice ~ quantity + discount over lineitem, solved with
    Cramer's rule on the 3x3 Gram matrix — regression as ONE
    aggregation, the way it distributes (the sufficient statistics
    n, Σx, Σx², Σxy are map-side-combinable; no gradient loop, no
    driver iteration, no MLlib dependency).

    Determinism: every sufficient statistic is an exact integer sum
    (quantities integral, discount/price as cents; Σy² via
    DECIMAL(38,0) — it overflows int64 at sf0.1); the determinant
    arithmetic is ONE shared formula string rendered into both
    engines, so the IEEE tree is identical by construction; four
    rounded outputs.

    Scale (100 TB): one partial+final aggregation pass, 10 numeric
    accumulators; everything after runs on a single row.  K features
    mean K(K+3)/2 accumulators and a driver-side k x k solve — the
    standard big-data OLS decomposition."""
    li = load(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    sums = raw.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
        F.sum(
            F.col("y").cast("decimal(38,0)")
            * F.col("y").cast("decimal(38,0)")
        )
        .cast("double")
        .alias("syy"),
    )
    sums.createOrReplaceTempView("mq_ols_sums")
    return spark.sql(
        f"""
        WITH sums AS (SELECT * FROM mq_ols_sums),
        {_OLS_DETS}
        SELECT CAST(n AS BIGINT) AS n_rows,
               ROUND(det_b0 / det / 100.0, 4) AS intercept,
               ROUND(det_b1 / det / 100.0, 4) AS beta_quantity,
               ROUND(det_b2 / det, 4) AS beta_discount,
               ROUND(1.0 - (syy - (det_b0 / det) * sy
                                - (det_b1 / det) * sx1y
                                - (det_b2 / det) * sx2y)
                           / (syy - sy * sy / n), 6) AS r_squared
        FROM det0
        """
    )


# ------------------------------------------------ knn_eval_metrics (r11)

@register(
    "knn_eval_metrics",
    oracle="""
    WITH qv AS (
        SELECT vec_id AS q_id, label AS ql,
               CAST(FLOOR(CAST(u.v AS DOUBLE) * 10000000) AS BIGINT)
                   AS qq,
               u.p AS pos
        FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS p) u
        WHERE vec_id < 10
    ),
    cv AS (
        SELECT vec_id AS n_id, label AS nl,
               CAST(FLOOR(CAST(u.v AS DOUBLE) * 10000000) AS BIGINT)
                   AS cq,
               u.p AS pos
        FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS p) u
    ),
    sims AS (
        SELECT qv.q_id, qv.ql, cv.n_id, cv.nl,
               CAST(SUM(qv.qq * cv.cq) AS BIGINT) AS dq
        FROM qv JOIN cv ON qv.pos = cv.pos
        WHERE qv.q_id <> cv.n_id
        GROUP BY qv.q_id, qv.ql, cv.n_id, cv.nl
    ),
    ranked AS (
        SELECT q_id, ql,
               CASE WHEN nl = ql THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY dq DESC, n_id) AS i
        FROM sims
    ),
    w AS (SELECT i, CAST(FLOOR(wt * 1000000000.0) AS BIGINT) AS wq
          FROM (VALUES (1, 1.0),
                       (2, 1.0 / LOG2(3.0)),
                       (3, 1.0 / LOG2(4.0)),
                       (4, 1.0 / LOG2(5.0)),
                       (5, 1.0 / LOG2(6.0))) AS w(i, wt)),
    rcount AS (
        SELECT e.vec_id AS q_id,
               CAST(COUNT(*) AS BIGINT) AS r
        FROM embeddings e JOIN embeddings o
          ON o.label = e.label AND o.vec_id <> e.vec_id
        WHERE e.vec_id < 10
        GROUP BY e.vec_id
    ),
    ks AS (SELECT unnest([1, 3, 5]) AS k),
    perq AS (
        SELECT ks.k, r.q_id,
               CAST(SUM(r.rel) AS BIGINT) AS hits,
               CAST(SUM(r.rel * w.wq) AS BIGINT) * 1000000
                   // (SELECT CAST(SUM(w2.wq) AS BIGINT) FROM w w2
                       WHERE w2.i <= LEAST(ks.k, rcount.r)) AS ndcg_q
        FROM ranked r
        JOIN w ON w.i = r.i
        JOIN rcount ON rcount.q_id = r.q_id
        CROSS JOIN ks
        WHERE r.i <= ks.k
        GROUP BY ks.k, r.q_id, rcount.r
    )
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(CAST(SUM(hits) AS DOUBLE) / (COUNT(*) * k), 6)
               AS precision_at_k,
           ROUND(CAST(SUM(ndcg_q) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS ndcg_at_k
    FROM perq GROUP BY k ORDER BY k
    """,
)
def knn_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVAL EVALUATION METRICS — precision@k and NDCG@k of exact
    cosine retrieval with label-match relevance, k in {1, 3, 5}: the
    measurement half of the similarity-search family (`cosine_topk`
    retrieves, `ann_*` approximate; THIS op scores whether neighbors
    are semantically right).  Relevance = the neighbor shares the
    query's label; IDCG uses the ideal ranking of the query's FULL
    relevant set truncated at k (the textbook definition, not the
    within-top-k shortcut that inflates scores).

    Determinism: dot products are exact int64 sums of 1e7-floored
    component products (no float accumulation order); ranks tiebreak
    on n_id; the 5 discount weights are nano-quantized int64s from
    one shared table, so per-query DCG and IDCG are EXACT integer
    sums and NDCG is one integer division — no double accumulation
    anywhere before the final rounded means.

    Scale (100 TB): the candidate side streams once through a
    pos-join against the 10-query broadcast; ranks are one window
    per query partition; everything after runs on |queries| x k
    rows.  More queries -> same plan, larger broadcast."""
    emb = load(spark, sf_dir, "embeddings")
    def expl(df, idp, lblp, valp):
        return df.select(
            F.col("vec_id").alias(idp),
            F.col("label").alias(lblp),
            F.posexplode("embedding").alias("pos", "v"),
        ).select(
            idp, lblp, "pos",
            F.floor(F.col("v").cast("double") * 10000000)
            .cast("bigint")
            .alias(valp),
        )
    qv = expl(emb.filter(F.col("vec_id") < 10), "q_id", "ql", "qq")
    cv = expl(emb, "n_id", "nl", "cq")
    sims = (
        cv.join(F.broadcast(qv), "pos")
        .filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "ql", "n_id", "nl")
        .agg(F.sum(F.col("qq") * F.col("cq")).cast("bigint").alias("dq"))
    )
    ranked = sims.select(
        "q_id",
        "ql",
        F.when(F.col("nl") == F.col("ql"), 1).otherwise(0).alias("rel"),
        F.row_number()
        .over(Window.partitionBy("q_id").orderBy(F.desc("dq"), "n_id"))
        .alias("i"),
    )
    w = spark.range(1, 6).select(
        F.col("id").cast("int").alias("i"),
        F.floor(
            F.when(F.col("id") == 1, F.lit(1.0))
            .otherwise(F.lit(1.0) / F.log2(F.col("id") + F.lit(1.0)))
            * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("wq"),
    )
    e2 = emb.select(F.col("vec_id").alias("o_id"), F.col("label").alias("ol"))
    rcount = (
        emb.filter(F.col("vec_id") < 10)
        .join(
            e2,
            (F.col("ol") == F.col("label"))
            & (F.col("o_id") != F.col("vec_id")),
        )
        .groupBy(F.col("vec_id").alias("rq_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    ks = spark.createDataFrame([(1,), (3,), (5,)], "k int")
    perq = (
        ranked.join(F.broadcast(w), "i")
        .join(F.broadcast(rcount), F.col("rq_id") == F.col("q_id"))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("i") <= F.col("k"))
        .groupBy("k", "q_id", "r")
        .agg(
            F.sum("rel").cast("bigint").alias("hits"),
            F.sum(F.col("rel") * F.col("wq")).cast("bigint").alias("dcg_q"),
        )
    )
    # idcg = sum of nano-quantized weights for i <= least(k, r) —
    # truncated at r exactly as the oracle's scalar subquery (r >= 5
    # in this fixture so least(k, r) == k, but the guard stays exact);
    # dcg/idcg are exact ints, so ndcg_q is one integer division
    w2 = w.select(F.col("i").alias("wi"), F.col("wq").alias("wwq"))
    idcg = (
        perq.select("k", "r")
        .distinct()
        .join(
            F.broadcast(w2),
            F.col("wi") <= F.least(F.col("k"), F.col("r")),
        )
        .groupBy(F.col("k").alias("ik"), F.col("r").alias("ir"))
        .agg(F.sum("wwq").cast("bigint").alias("idcg_q"))
    )
    perq2 = perq.join(
        F.broadcast(idcg),
        (F.col("ik") == F.col("k")) & (F.col("ir") == F.col("r")),
    ).select(
        "k",
        "q_id",
        F.expr("CAST((dcg_q * 1000000) div idcg_q AS BIGINT)").alias(
            "ndcg_q"
        ),
        "hits",
    )
    return (
        perq2.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum("hits").cast("double")
                / (F.count(F.lit(1)) * F.col("k")),
                6,
            ).alias("precision_at_k"),
            F.round(
                F.sum("ndcg_q").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            ).alias("ndcg_at_k"),
        )
        .orderBy("k")
    )


# ------------------------------------- centroid_classifier_confusion (r11)

@register(
    "centroid_classifier_confusion",
    oracle="""
    WITH train AS (
        SELECT label, embedding FROM embeddings WHERE vec_id % 5 <> 0
    ),
    cent AS (
        SELECT label, u.p AS dim,
               CAST(SUM(CAST(FLOOR(CAST(u.v AS DOUBLE) * 10000000)
                             AS BIGINT)) AS BIGINT) AS s
        FROM train, LATERAL (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS p) u
        GROUP BY label, u.p
    ),
    nl AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n
        FROM train GROUP BY label
    ),
    test AS (
        SELECT vec_id, label AS true_label,
               CAST(FLOOR(CAST(u.v AS DOUBLE) * 10000000) AS BIGINT)
                   AS xq,
               u.p AS dim
        FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS p) u
        WHERE vec_id % 5 = 0
    ),
    scores AS (
        SELECT t.vec_id, t.true_label, c.label AS cand,
               CAST(SUM(CAST(t.xq AS DECIMAL(38,0)) * c.s) AS DOUBLE)
                   / nl.n AS score
        FROM test t
        JOIN cent c ON c.dim = t.dim
        JOIN nl ON nl.label = c.label
        GROUP BY t.vec_id, t.true_label, c.label, nl.n
    ),
    pred AS (
        SELECT vec_id, true_label, cand AS pred_label
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY score DESC, cand) AS rn FROM scores)
        WHERE rn = 1
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
)
def centroid_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-CENTROID CLASSIFIER with a held-out CONFUSION MATRIX:
    fit per-label mean embeddings on the 80% train split (vec_id % 5
    <> 0), classify the held-out 20% by highest centroid dot product,
    report the (true, predicted) cell counts — the evaluation loop
    every embedding pipeline runs before trusting labels, expressed
    as joins and aggregations (fit = ONE groupBy, predict = ONE
    broadcast join, evaluate = ONE count rollup; compare
    `embed_label_centroid`, which fits the same centroids but never
    scores them).

    Determinism: components quantize to 1e7-floored ints; each
    (vector, label) dot is an exact DECIMAL(38,0) integer sum; the
    only double is the per-candidate score (one IEEE division by the
    label count), and the argmax tiebreaks on label.

    Scale (100 TB): centroid sums are |labels| x |dims| rows
    (broadcastable at any corpus size); the test stream joins them
    map-side and never shuffles the corpus; the confusion rollup is
    |labels|^2 cells.  The train/test hash split is row-local."""
    emb = load(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 5 != 0)
    cent = (
        train.select(
            "label", F.posexplode("embedding").alias("dim0", "v")
        )
        .groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(
            F.sum(
                F.floor(F.col("v").cast("double") * 10000000).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("s")
        )
    )
    nl = train.groupBy(F.col("label").alias("nlab")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    test = (
        emb.filter(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            F.posexplode("embedding").alias("dim0", "v"),
        )
        .select(
            "vec_id",
            "true_label",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("v").cast("double") * 10000000)
            .cast("bigint")
            .alias("xq"),
        )
    )
    scores = (
        test.join(F.broadcast(cent), "dim")
        .join(F.broadcast(nl), F.col("nlab") == F.col("label"))
        .groupBy("vec_id", "true_label", F.col("label").alias("cand"), "n")
        .agg(
            (
                F.sum(F.col("xq").cast("decimal(38,0)") * F.col("s"))
                .cast("double")
                / F.col("n")
            ).alias("score")
        )
    )
    pred = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("score"), "cand"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("true_label", F.col("cand").alias("pred_label"))
    )
    return (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


# ---------------------------------------------- hits_hub_authority (r12)

#: Previous invocation's persisted edge table (see the cache-lifetime
#: note in hits_hub_authority's docstring) — at most one cached
#: relation lingers per session instead of one per call.
_HITS_EDGE_CACHE = None

@register(
    "hits_hub_authority",
    oracle="""
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    h1 AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS h FROM e GROUP BY c),
    a1 AS (
        SELECT e.p, CAST(SUM(h1.h) AS BIGINT) AS a
        FROM e JOIN h1 USING (c) GROUP BY e.p
    ),
    h2 AS (
        SELECT e.c, CAST(SUM(a1.a) AS BIGINT) AS h
        FROM e JOIN a1 USING (p) GROUP BY e.c
    ),
    a2 AS (
        SELECT e.p, CAST(SUM(h2.h) AS BIGINT) AS a
        FROM e JOIN h2 USING (c) GROUP BY e.p
    ),
    mx AS (SELECT CAST(MAX(a) AS BIGINT) AS m FROM a2)
    SELECT a2.p AS l_partkey, a2.a AS auth2,
           ROUND(CAST(a2.a AS DOUBLE) / mx.m, 6) AS auth_norm
    FROM a2 CROSS JOIN mx
    ORDER BY a2.a DESC, a2.p LIMIT 10
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) hubs-and-authorities, 2 unrolled
    iterations over the bipartite customer->part purchase graph
    (edges = DISTINCT (custkey, partkey) from orders x lineitem):
    authority(part) accumulates hub mass from every buying customer,
    hub(customer) accumulates authority mass back — the mutual-
    reinforcement ranking `pagerank_event_graph` can't express (it
    needs the bipartite double update).  Top-10 authorities reported.

    Determinism: with a_0 = 1 the UNNORMALIZED iterates stay exact
    int64 (a2 = sum over paths of degree products; budget ~ E *
    deg_max^2 — safe to ~1e6-degree graphs at 1e9 edges; normalize
    per-iteration in doubles past that); ties broken by partkey in
    the ORDER BY; the only double is the final max-normalized score.

    Scale (100 TB): edges distinct-collapse ONCE and persist
    DISK_ONLY (serialized, zero heap residency) for the four
    downstream aggregations — NOT localCheckpoint, whose
    heap-resident materialization of ~50M edges OOMed a 128 GiB JVM
    at sf10 (measured this round; the r11 triangle precedent
    checkpointed only 357k rows, which is the size class
    localCheckpoint is for), and NOT plain recomputation, which
    re-derives the orders x lineitem join four times (16 scans / 14
    sort-merge joins in the executed plan — exchange reuse does not
    fire across the four aggregation branches); each iteration is a
    map-side-combinable groupBy after an equi-join on the persisted
    edges.

    Cache lifetime (r12 ADVICE): the persisted edges CANNOT be
    unpersisted inside this function — the returned DataFrame is lazy
    and the four aggregation branches read the cache when the CALLER
    materializes it.  Instead each invocation unpersists the PREVIOUS
    invocation's edge cache (module-global handle below), bounding a
    long-lived multi-query session (bench, 380-query sweep,
    preflight, plan tests) to at most ONE lingering cached relation
    instead of one per call; session shutdown releases the last."""
    from pyspark import StorageLevel

    global _HITS_EDGE_CACHE
    if _HITS_EDGE_CACHE is not None:
        try:
            _HITS_EDGE_CACHE.unpersist()
        except Exception:
            pass  # previous session already stopped
        _HITS_EDGE_CACHE = None

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    ).persist(StorageLevel.DISK_ONLY)
    _HITS_EDGE_CACHE = e
    h1 = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("h"))
    a1 = (
        e.join(h1, "c")
        .groupBy("p")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    h2 = (
        e.join(a1, "p")
        .groupBy("c")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        e.join(h2, "c")
        .groupBy("p")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    mx = a2.agg(F.max("a").cast("bigint").alias("m"))
    return (
        a2.crossJoin(F.broadcast(mx))
        .select(
            F.col("p").alias("l_partkey"),
            F.col("a").alias("auth2"),
            F.round(F.col("a").cast("double") / F.col("m"), 6).alias(
                "auth_norm"
            ),
        )
        .orderBy(F.col("auth2").desc(), "l_partkey")
        .limit(10)
    )


# ------------------------------------------ degree_distribution_log2 (r12)

@register(
    "degree_distribution_log2",
    oracle="""
    WITH d AS (
        SELECT l.l_partkey AS p,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS deg
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_partkey
    )
    SELECT CAST(LENGTH(printf('%b', deg)) - 1 AS BIGINT)
               AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(deg) AS BIGINT) AS min_deg,
           CAST(MAX(deg) AS BIGINT) AS max_deg
    FROM d GROUP BY LENGTH(printf('%b', deg)) - 1
    ORDER BY log2_bucket
    """,
)
def degree_distribution_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE DISTRIBUTION of the customer->part purchase graph in
    log2 buckets — the power-law sanity check run before any graph
    algorithm (a heavy-tailed degree histogram predicts skew in
    `hits_hub_authority` / `pagerank_event_graph` shuffles and tells
    you which keys need salting).

    Determinism: floor(log2(deg)) is computed WITHOUT floating log —
    Spark `length(bin(deg)) - 1` vs DuckDB `length(printf('%b',
    deg)) - 1`, both exact bit-length arithmetic (Math.log-based log2
    returns 2.9999... for exact powers of two on some libm, flipping
    the bucket; the string length cannot).

    Scale (100 TB): one distinct-collapse groupBy (partial
    aggregation pushes the distinct map-side), then a <= 40-bucket
    rollup."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    d = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("l_partkey").alias("p"))
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("deg"))
    )
    return (
        d.groupBy(
            (F.length(F.expr("bin(deg)")) - 1)
            .cast("bigint")
            .alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.min("deg").cast("bigint").alias("min_deg"),
            F.max("deg").cast("bigint").alias("max_deg"),
        )
        .orderBy("log2_bucket")
    )


# -------------------------------------------- event_transition_matrix (r12)

@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    tr AS (
        SELECT prev, event_type AS nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    ),
    rt AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS r FROM tr GROUP BY prev),
    ct AS (SELECT nxt, CAST(SUM(c) AS BIGINT) AS cl FROM tr GROUP BY nxt),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tr)
    SELECT tr.prev, tr.nxt, tr.c,
           ROUND(CAST(tr.c AS DOUBLE) / rt.r, 6) AS p_next,
           ROUND(CAST(tr.c AS DOUBLE) * nt.n
                 / (CAST(rt.r AS DOUBLE) * ct.cl), 6) AS lift
    FROM tr JOIN rt USING (prev) JOIN ct USING (nxt) CROSS JOIN nt
    ORDER BY tr.prev, tr.nxt
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITION MATRIX over each user's event
    timeline: per (prev, next) pair the count, the row-conditional
    P(next|prev), and the LIFT against independence (observed /
    row-share x col-share) — the behavioral-flow summary
    `events_funnel` (one fixed path) and `pair_affinity_lift`
    (unordered co-occurrence) don't express: this is ORDERED
    adjacency.

    Determinism: transition counts exact int64 ((ts, event_id) is a
    unique order key); p_next and lift are single fixed trees over
    exact integers, ROUND(.,6).

    Scale (100 TB): ONE user-partitioned window (the LAG) is the only
    corpus-wide operation; the transition table is |types|^2-bounded
    and every margin derives from it."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    tr = seq.groupBy("prev", F.col("event_type").alias("nxt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tr = tr.localCheckpoint(eager=True)
    rt = tr.groupBy("prev").agg(F.sum("c").cast("bigint").alias("r"))
    ct = tr.groupBy("nxt").agg(F.sum("c").cast("bigint").alias("cl"))
    nt = tr.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        tr.join(F.broadcast(rt), "prev")
        .join(F.broadcast(ct), "nxt")
        .crossJoin(F.broadcast(nt))
        .select(
            "prev",
            "nxt",
            "c",
            F.round(F.col("c").cast("double") / F.col("r"), 6).alias(
                "p_next"
            ),
            F.round(
                F.col("c").cast("double")
                * F.col("n")
                / (F.col("r").cast("double") * F.col("cl")),
                6,
            ).alias("lift"),
        )
        .orderBy("prev", "nxt")
    )


# ---------------------------------------------- histogram_equi_depth (r12)

@register(
    "histogram_equi_depth",
    oracle="""
    WITH s AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events
    ),
    freq AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY v
    ),
    rk AS (
        SELECT v, c,
               COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) + c AS cum
        FROM freq
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq),
    bounds AS (
        SELECT k, MIN(v) AS b
        FROM rk CROSS JOIN nt
        CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k) ks
        WHERE rk.cum >= (nt.n * k + 9) // 10
        GROUP BY k
    ),
    bucketed AS (
        SELECT rk.v, rk.c,
               (SELECT COUNT(*) FROM bounds WHERE rk.v > bounds.b)
                   AS bucket
        FROM rk
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MIN(v) AS BIGINT) AS lo_cents,
           CAST(MAX(v) AS BIGINT) AS hi_cents
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH (quantile) HISTOGRAM, 10 buckets over the cents
    value — the optimizer-statistics shape (`histogram_fixed_width`
    splits the RANGE evenly; this splits the MASS evenly, which is
    what selectivity estimation and monitor dashboards use under
    skew).  The 9 interior boundaries are exact DISC percentiles
    (smallest v whose cumulative reaches ceil(k*n/10), the
    `percentile_disc_vs_cont` filter-then-MIN move); a value's bucket
    is the COUNT of boundaries strictly below it, so tie blocks land
    whole in one bucket (never split mid-value).

    Determinism: boundaries and bucket ids are exact integer
    selections; counts exact int64.

    Scale (100 TB): one groupBy(v) collapse; the cumsum rides
    `_rank_prefix`'s hierarchical shape via a per-bucket window in
    the frequency domain; boundaries broadcast (9 rows); bucket
    assignment is a broadcast-join count, not a sort."""
    from migbq_spark.operators.evalstats import _rank_prefix

    ev = load(spark, sf_dir, "events")
    s = ev.select(F.expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
    ).alias("v"))
    freq = s.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rk = _rank_prefix(freq, "v", ["c"]).withColumn(
        "cum", F.col("c_lt") + F.col("c")
    )
    nt = freq.agg(F.sum("c").cast("bigint").alias("n"))
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    bounds = (
        rk.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ks))
        .filter(
            F.col("cum")
            >= F.expr("CAST((n * k + 9) DIV 10 AS BIGINT)")
        )
        .groupBy("k")
        .agg(F.min("v").alias("b"))
    )
    bucketed = (
        rk.join(
            F.broadcast(bounds), F.col("v") > F.col("b"), "left"
        )
        .groupBy("v", "c")
        .agg(F.count(F.col("b")).cast("bigint").alias("bucket"))
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.min("v").cast("bigint").alias("lo_cents"),
            F.max("v").cast("bigint").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------ path_trigrams_topk (r12)

@register(
    "path_trigrams_topk",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               LAG(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS p1,
               LAG(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS p2
        FROM events
    )
    SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path3,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY path3 ORDER BY cnt DESC, path3 LIMIT 10
    """,
)
def path_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-10 THREE-STEP BEHAVIOR PATHS (event-type trigrams along
    each user's timeline) — the path-mining summary between
    `event_transition_matrix` (order 1) and `user_path_string` (the
    full per-user path): which exact 3-step flows dominate.

    Determinism: exact counts; ties broken by path text.

    Scale (100 TB): both LAGs share ONE user-partitioned window sort;
    trigram keys are |types|^3-bounded, so the count groupBy is
    map-side-combinable into a tiny table; top-10 is a bounded heap
    (TakeOrderedAndProject)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.select(
            F.concat_ws(
                " > ", F.col("p2"), F.col("p1"), F.col("event_type")
            ).alias("path3")
        )
        .groupBy("path3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "path3")
        .limit(10)
    )


# ------------------------------------------- r13 graph second wave
#
# All four ops below run on the SAME support-pruned part co-purchase
# graph as `triangle_count_copurchase` (parts co-occurring in >= 2
# orders, canonical u < v orientation): the support prune is what keeps
# every downstream join edge-bounded at any corpus scale (see the
# triangle op's docstring for the measured packed-key/repartition
# rationale).  The edge derivation is factored once here; each op
# localCheckpoints the ~edge-sized result only when it reuses it >= 2x
# (the r11/r12 checkpoint-size discipline).

#: DuckDB CTE fragment deriving the same pruned edge set (rendered into
#: every graph oracle below so both engines share one edge definition).
_COPURCHASE_EDGES_CTE = """
    lines AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pair_occ AS (
        SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS w
        FROM lines a JOIN lines b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    ),
    edges AS (SELECT u, v FROM pair_occ WHERE w >= 2),
    und AS (SELECT u AS src, v AS dst FROM edges
            UNION ALL SELECT v AS src, u AS dst FROM edges)
"""


def _pair_fan_kernel(batches):
    """C(basket, 2) ordered-pair fan as a vectorized Arrow kernel: for
    each batch of sorted-distinct part arrays ``ps``, emit every packed
    int64 pair key ``x * 2^32 + y`` (x < y — the arrays arrive sorted
    ascending, so column order IS the canonical order).  Value-identical
    to the codegen nested-transform explode it replaced (r15 session 5;
    guide §4.2: the JVM form allocated a boxed array-of-arrays per
    basket row — measured CPU 3.18 -> 2.39 s at sf0.1, 55.1 -> 31.2 s
    at sf1, identical edge sets).  Baskets are grouped BY LENGTH so the
    pair expansion is one 2-D fancy-index + triu per length group —
    no per-row Python loop; the length domain is basket-bounded (tens),
    so the group loop is O(distinct lengths) per batch."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        col = batch.column(0)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        if vals.dtype != np.int64:
            # a null part key would upcast to float64 and silently break
            # the exact packed-key arithmetic — fail loudly (the
            # _gram_partial_kernel ADVICE guard)
            raise ValueError(
                f"pair-fan kernel expects int64 part keys, got {vals.dtype}"
            )
        lens = offs[1:] - offs[:-1]
        starts = offs[:-1]
        out = []
        for n in np.unique(lens):
            if n < 2:
                continue
            group = starts[lens == n]
            idx = group[:, None] + np.arange(n)[None, :]
            mat = vals[idx]  # (n_baskets_of_len_n, n)
            iu, ju = np.triu_indices(int(n), k=1)
            out.append(
                (mat[:, iu] * np.int64(4294967296) + mat[:, ju]).ravel()
            )
        ks = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        yield pa.record_batch([pa.array(ks, type=pa.int64())], names=["k"])


def _pair_fan_df(baskets: DataFrame) -> DataFrame:
    """(k) packed int64 pair keys from a (o, ps) basket frame via
    `_pair_fan_kernel` — shared by `_copurchase_edges` and
    `triangle_count_copurchase`."""
    return baskets.select("ps").mapInArrow(_pair_fan_kernel, "k long")


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-pruned (co-occurrence >= 2) canonical u < v co-purchase
    edges — the triangle_count_copurchase derivation shared by the r13
    graph batch: row-local C(basket,2) pair fan (never a corpus
    self-join) via the vectorized `_pair_fan_kernel`, packed-int64 pair
    key, repartition-before-count (near-unique keys collapse nothing
    map-side)."""
    li = load(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pair_occ = (
        _pair_fan_df(baskets)
        .repartition("k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(
            F.expr("CAST(k div 4294967296 AS BIGINT)").alias("u"),
            F.expr("CAST(k % 4294967296 AS BIGINT)").alias("v"),
            "w",
        )
    )
    return pair_occ.filter(F.col("w") >= 2).select("u", "v")


# ------------------------------------------ clustering_coeff_per_node (r13)

@register(
    "clustering_coeff_per_node",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_n AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b AS node FROM tri
              UNION ALL SELECT c AS node FROM tri)
        GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    )
    SELECT deg.node AS l_partkey, deg.d AS degree,
           CAST(COALESCE(tri_n.tri, 0) AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN deg.d < 2 THEN 0.0
                      ELSE CAST(COALESCE(tri_n.tri, 0) AS DOUBLE)
                           / (deg.d * (deg.d - 1) / 2) END, 6)
               AS local_cc
    FROM deg LEFT JOIN tri_n USING (node)
    ORDER BY deg.d DESC, deg.node LIMIT 10
    """,
)
def clustering_coeff_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL (per-node) CLUSTERING COEFFICIENT for the top-10
    highest-degree parts in the co-purchase graph: triangles_at_node /
    C(degree, 2) (Watts & Strogatz 1998) — the node-level refinement
    of `triangle_count_copurchase`'s single global ratio: hubs with
    LOW local cc are bridges (their neighborhoods don't interconnect),
    hubs with high cc sit inside communities — the distinction
    recommend-together ranking actually needs.

    Determinism: exact integer triangle/degree counts; the ratio is
    one double behind ROUND(6); top-10 ordered by (degree DESC,
    partkey) — exact-int sort keys, no ties possible.

    Scale (100 TB): the support prune bounds the edge set; the
    triangle join is the standard edges-join-edges wedge closure (the
    triangle op's measured shape); each triangle explodes to its 3
    member nodes ROW-LOCALLY; the top-10 is a TakeOrderedAndProject
    bounded heap, never a global sort."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(
        eager=True
    )  # reused 4x: tri e1/e2/e3 + deg
    e1 = edges.alias("e1")
    e2 = edges.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
    e3 = edges.select(F.col("u").alias("u3"), F.col("v").alias("v3"))
    tri = (
        e1.join(e2, F.col("u2") == F.col("e1.v"))
        .join(
            e3,
            (F.col("u3") == F.col("e1.u")) & (F.col("v3") == F.col("v2")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
            F.col("v2").alias("c"),
        )
    )
    tri_n = (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    j = deg.join(tri_n, "node", "left").select(
        F.col("node").alias("l_partkey"),
        F.col("d").alias("degree"),
        F.coalesce("tri", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.round(
            F.when(F.col("d") < 2, F.lit(0.0)).otherwise(
                F.coalesce("tri", F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1) / 2)
            ),
            6,
        ).alias("local_cc"),
    )
    return j.orderBy(F.col("degree").desc(), "l_partkey").limit(10)


# --------------------------------------------- label_prop_communities (r13)

@register(
    "label_prop_communities",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    nodes AS (SELECT DISTINCT src AS node FROM und),
    l1 AS (
        SELECT n.node,
               LEAST(n.node, MIN(u.dst)) AS lbl
        FROM nodes n LEFT JOIN und u ON u.src = n.node
        GROUP BY n.node
    ),
    l2 AS (
        SELECT n.node,
               LEAST(MIN(o.lbl), MIN(nb.lbl)) AS lbl
        FROM nodes n
        JOIN l1 o ON o.node = n.node
        LEFT JOIN und u ON u.src = n.node
        LEFT JOIN l1 nb ON nb.node = u.dst
        GROUP BY n.node
    ),
    comm AS (
        SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz
        FROM l2 GROUP BY lbl
    )
    SELECT sz AS community_size,
           CAST(COUNT(*) AS BIGINT) AS n_communities
    FROM comm GROUP BY sz ORDER BY sz
    """,
)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN-LABEL PROPAGATION, 2 unrolled rounds, over the co-purchase
    graph (Raghavan et al. 2007 made deterministic by taking MIN
    instead of mode): every node adopts the smallest label in its
    closed neighborhood, twice — after round r each label has flooded
    its r-hop ball, so the round-2 community-size HISTOGRAM is a
    connectivity fingerprint strictly cheaper than full convergence
    (`dup_cc_twostar` is the run-to-fixpoint version, on a different
    graph).

    Determinism: min-propagation is order-free by construction; all
    counts exact int64.

    Scale (100 TB): each round is ONE equi-join of the node-label
    table with the undirected adjacency + a min-groupBy — the
    standard BSP/Pregel superstep expressed relationally; 2 rounds =
    2 joins, both partitioned on node, label table |V|-bounded."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(
        eager=True
    )  # reused: und x2 rounds + node set
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    l1 = (
        nodes.join(und, nodes["node"] == und["src"], "left")
        .groupBy("node")
        .agg(
            F.least(F.col("node"), F.min("dst")).alias("lbl")
        )
    )
    l2 = (
        nodes.join(und, nodes["node"] == und["src"], "left")
        .join(
            l1.select(F.col("node").alias("nb"), F.col("lbl").alias(
                "nb_lbl"
            )),
            F.col("dst") == F.col("nb"),
            "left",
        )
        .join(
            l1.select(F.col("node").alias("own"), F.col("lbl").alias(
                "own_lbl"
            )),
            F.col("node") == F.col("own"),
        )
        .groupBy("node")
        .agg(
            F.least(F.min("own_lbl"), F.min("nb_lbl")).alias("lbl")
        )
    )
    comm = l2.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return (
        comm.groupBy(F.col("sz").alias("community_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
        .orderBy("community_size")
    )


# -------------------------------------------------- kcore_peel_rounds (r13)

@register(
    "kcore_peel_rounds",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    deg1 AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM und GROUP BY src
    ),
    keep1 AS (SELECT node FROM deg1 WHERE d >= 3),
    e1 AS (
        SELECT e.u, e.v FROM edges e
        JOIN keep1 a ON a.node = e.u
        JOIN keep1 b ON b.node = e.v
    ),
    deg2 AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM e1 UNION ALL SELECT v AS node FROM e1)
        GROUP BY node
    ),
    keep2 AS (SELECT node FROM deg2 WHERE d >= 3),
    e2 AS (
        SELECT e.u, e.v FROM e1 e
        JOIN keep2 a ON a.node = e.u
        JOIN keep2 b ON b.node = e.v
    ),
    r AS (
        SELECT 1 AS round,
               (SELECT COUNT(*) FROM keep1) AS n_nodes,
               (SELECT COUNT(*) FROM e1) AS n_edges
        UNION ALL
        SELECT 2,
               (SELECT COUNT(*) FROM keep2),
               (SELECT COUNT(*) FROM e2)
    )
    SELECT CAST(round AS BIGINT) AS round,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges
    FROM r ORDER BY round
    """,
)
def kcore_peel_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-CORE PEELING, 2 unrolled rounds, on the co-purchase graph
    (Seidman 1983 / Matula & Beck 1983): drop nodes with degree < 3,
    recompute degrees on the induced subgraph, drop again — per-round
    surviving node and edge counts.  The k-core is the standard
    "dense nucleus" extraction before community detection or
    influence analysis; two rounds bound the fixpoint from above
    and measure how fast the periphery sheds (most shedding happens
    in round 1 on power-law graphs).

    Determinism: pure integer degree arithmetic and semijoins.

    Scale (100 TB): each round = one degree groupBy + two semijoins
    of the edge table against the |V|-bounded survivor set — the
    peel is edge-linear per round; the unrolled-2 form keeps the
    plan static (no iterative driver loop)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(
        eager=True
    )  # reused: deg1 + e1 build + counts
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg1 = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    keep1 = deg1.filter(F.col("d") >= 3).select("node")
    e1 = (
        edges.join(keep1.withColumnRenamed("node", "u"), "u", "semi")
        .join(keep1.withColumnRenamed("node", "v"), "v", "semi")
        .select("u", "v")
        .localCheckpoint(eager=True)  # reused: deg2 + e2 + count
    )
    deg2 = (
        e1.select(F.col("u").alias("node"))
        .unionAll(e1.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    keep2 = deg2.filter(F.col("d") >= 3).select("node")
    e2 = (
        e1.join(keep2.withColumnRenamed("node", "u"), "u", "semi")
        .join(keep2.withColumnRenamed("node", "v"), "v", "semi")
        .select("u", "v")
    )
    r1 = keep1.agg(
        F.lit(1).cast("bigint").alias("round"),
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
    ).crossJoin(
        F.broadcast(
            e1.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        )
    )
    r2 = keep2.agg(
        F.lit(2).cast("bigint").alias("round"),
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
    ).crossJoin(
        F.broadcast(
            e2.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        )
    )
    return r1.unionAll(r2).orderBy("round")


# --------------------------------------------- jaccard_node_similarity (r13)

@register(
    "jaccard_node_similarity",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM und GROUP BY src
    ),
    common AS (
        SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS inter
        FROM edges e
        JOIN und a ON a.src = e.u
        JOIN und b ON b.src = e.v AND b.dst = a.dst
        GROUP BY e.u, e.v
    )
    SELECT e.u, e.v,
           CAST(COALESCE(c.inter, 0) AS BIGINT) AS n_common,
           du.d AS deg_u, dv.d AS deg_v,
           ROUND(CAST(COALESCE(c.inter, 0) AS DOUBLE)
                 / (du.d + dv.d - COALESCE(c.inter, 0)), 6) AS jaccard
    FROM edges e
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
    LEFT JOIN common c ON c.u = e.u AND c.v = e.v
    ORDER BY jaccard DESC, e.u, e.v LIMIT 10
    """,
)
def jaccard_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEIGHBORHOOD JACCARD SIMILARITY for connected part pairs:
    |N(u) n N(v)| / |N(u) u N(v)| over the co-purchase graph, top-10
    — the structural-equivalence link predictor (Liben-Nowell &
    Kleinberg 2003): a connected pair whose neighborhoods also
    coincide is a substitutable/bundle pair, not just a co-purchase.
    Computed ONLY for existing edges, which is what keeps the wedge
    join bounded (all-pairs common-neighbor counting is the
    quadratic trap).

    Determinism: exact integer intersection/degree counts; jaccard
    is one double behind ROUND(6); the top-10 ORDER BY carries the
    (u, v) exact-int tiebreak after the score.

    Scale (100 TB): common counts come from ONE edges-join-adjacency-
    join-adjacency wedge closure grouped on the edge key (the
    triangle shape); degrees are a |V|-bounded rollup; the top-10 is
    a bounded heap."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(
        eager=True
    )  # reused: und (x2 sides) + common + output spine
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    a = und.select(F.col("src").alias("au"), F.col("dst").alias("w"))
    b = und.select(F.col("src").alias("bv"), F.col("dst").alias("w2"))
    common = (
        edges.join(a, F.col("au") == F.col("u"))
        .join(b, (F.col("bv") == F.col("v")) & (F.col("w2") == F.col("w")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    j = (
        edges.join(du, "u")
        .join(dv, "v")
        .join(common, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce("inter", F.lit(0))
            .cast("bigint")
            .alias("n_common"),
            "deg_u",
            "deg_v",
            F.round(
                F.coalesce("inter", F.lit(0)).cast("double")
                / (
                    F.col("deg_u")
                    + F.col("deg_v")
                    - F.coalesce("inter", F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.col("jaccard").desc(), "u", "v").limit(10)


# ---------------------------------------------------- k_anonymity_audit (r13)

@register(
    "k_anonymity_audit",
    oracle="""
    WITH q AS (
        SELECT user_id,
               event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 7 AS dow,
               CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    // 5000 AS BIGINT) AS value_band
        FROM events WHERE value IS NOT NULL
    ),
    cells AS (
        SELECT event_type, dow, value_band,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM q GROUP BY event_type, dow, value_band
    )
    SELECT CASE WHEN n_users >= 10 THEN 'k>=10'
                WHEN n_users >= 5 THEN '5<=k<10'
                WHEN n_users >= 2 THEN '2<=k<5'
                ELSE 'k=1 (re-identifiable)' END AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_rows) AS BIGINT) AS rows_covered,
           CAST(SUM(CASE WHEN n_users = 1 THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_at_risk
    FROM cells GROUP BY 1 ORDER BY 1
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY AUDIT over the quasi-identifier tuple (event_type,
    day-of-week, $50 value band) — the re-identification risk report
    (Sweeney 2002) run before any event-level data release: a cell
    whose quasi-identifiers isolate ONE user is re-identifiable by
    linkage even with the id column dropped.  Reports the cell-count
    and row-coverage histogram by k bucket plus the rows sitting in
    k=1 cells — the number a privacy review actually asks for.
    Complements `pii_scrub` (direct identifiers) with the
    quasi-identifier side.

    Determinism: dow via epoch-day % 7 (the house dayofweek split —
    engines disagree on week start); value bands in exact cents
    integer division; all counts exact.

    Scale (100 TB): one groupBy to the quasi-identifier cell table
    (bounded by |types| x 7 x |bands|), then a 4-bucket rollup —
    scan-dominated, two small shuffles."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        "user_id",
        "event_type",
        (
            F.floor(F.unix_micros("ts") / 86400000000).cast("bigint") % 7
        ).alias("dow"),
        F.expr(
            "CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS BIGINT)"
        ).alias("value_band"),
    )
    cells = q.groupBy("event_type", "dow", "value_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    bucket = (
        F.when(F.col("n_users") >= 10, "k>=10")
        .when(F.col("n_users") >= 5, "5<=k<10")
        .when(F.col("n_users") >= 2, "2<=k<5")
        .otherwise("k=1 (re-identifiable)")
    )
    return (
        cells.groupBy(bucket.alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n_rows").cast("bigint").alias("rows_covered"),
            F.sum(
                F.when(F.col("n_users") == 1, F.col("n_rows")).otherwise(0)
            )
            .cast("bigint")
            .alias("rows_at_risk"),
        )
        .orderBy("k_bucket")
    )


# ------------------------------------------ trailing_7d_distinct_exact (r13)

@register(
    "trailing_7d_distinct_exact",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    win AS (
        SELECT days.d, du.user_id
        FROM days JOIN du ON du.d > days.d - 7 AND du.d <= days.d
    )
    SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u7d
    FROM win GROUP BY d ORDER BY d
    """,
)
def trailing_7d_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day — the exact twin of
    `sliding_distinct_hll` (whose sketch this op calibrates) and of
    `active_users_7d` (which reports only the latest day): distinct
    counts are NOT window-mergeable, so the exact form re-derives each
    day's set from the day-user table via a bounded range join — the
    honest cost the HLL variant exists to avoid, made cheap by
    collapsing to (day, user) FIRST.

    Determinism: exact distinct counts end-to-end.

    Scale (100 TB): the corpus collapses map-side to |days| x |daily
    actives| (day, user) pairs; the range join fans each pair into at
    most 7 day-buckets (row-local bound), and the distinct-count
    aggregation shuffles on (day, user) — the fan is 7x the collapsed
    table, NOT 7x the corpus.  Past ~1e9 daily actives, switch to the
    HLL twin (documented trade; this op IS the calibration
    baseline)."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select(F.col("d").alias("day")).distinct()
    # equi-join form of the range join: fan each (d, user) row into the
    # <= 7 trailing day-buckets it contributes to, row-locally
    fan = du.select(
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(d, i))")
        ).alias("day"),
        "user_id",
    )
    win = fan.join(F.broadcast(days), "day", "semi")
    return (
        win.groupBy(F.col("day").alias("d"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("u7d"))
        .join(F.broadcast(days.withColumnRenamed("day", "d")), "d", "semi")
        .orderBy("d")
    )


# ---------------------------------------------- logistic_newton_step (r13)

@register(
    "logistic_newton_step",
    oracle=f"""
    WITH raw AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 7 AS x1,
               CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    // 100 AS BIGINT) AS x2,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(2 AS BIGINT)
                    ELSE CAST(-2 AS BIGINT) END AS y
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x1) AS DOUBLE) AS sx1,
               CAST(SUM(x2) AS DOUBLE) AS sx2,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x1 * x1) AS DOUBLE) AS sx11,
               CAST(SUM(x1 * x2) AS DOUBLE) AS sx12,
               CAST(SUM(x2 * x2) AS DOUBLE) AS sx22,
               CAST(SUM(x1 * y) AS DOUBLE) AS sx1y,
               CAST(SUM(x2 * y) AS DOUBLE) AS sx2y
        FROM raw
    ),
    {{dets}}
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(det_b0 / det, 6) AS beta0,
           ROUND(det_b1 / det, 6) AS beta_dow,
           ROUND(det_b2 / det, 6) AS beta_dollars
    FROM det0
    """.format(dets=_OLS_DETS),
)
def logistic_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE EXACT NEWTON STEP of logistic regression from the zero
    init, P(purchase | day-of-week, dollars), in closed form: at
    beta = 0 the IRLS weights are the constant 1/4 and the step
    collapses ALGEBRAICALLY to ordinary least squares of the signed
    response z = 2(2y-1) in {-2,+2} on the features —
    beta_1 = (X'WX)^-1 X'(y-p) = 2(X'X)^-1 X'(2y-1) — so the whole
    'iterative' ML fit becomes the `ols_closed_form` machinery
    (shared Cramer determinant formula `_OLS_DETS`, one string
    rendered into both engines) with an INTEGER response.  The
    standard warm start production IRLS then refines; at the zero
    init this step IS the exact maximizer direction.

    Determinism: all nine moments are exact int64 (budget: dollars^2
    <= 1e8 per row, the welch note); the three betas are one shared
    Cramer formula behind ROUND(6); dow via epoch-day % 7.

    Scale (100 TB): ONE map-side-combinable moments pass to a single
    9-register row; the solve is 3x3 Cramer arithmetic on that row —
    the `ols_closed_form` scale story with a classification
    response."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    raw = ev.select(
        (
            F.floor(F.unix_micros("ts") / 86400000000).cast("bigint") % 7
        ).alias("x1"),
        F.expr(
            "CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100 AS BIGINT)"
        ).alias("x2"),
        F.when(F.col("event_type") == "purchase", F.lit(2))
        .otherwise(F.lit(-2))
        .cast("bigint")
        .alias("y"),
    )
    sums = raw.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
    )
    sums.createOrReplaceTempView("mq_logit_sums")
    return spark.sql(
        f"""
        WITH sums AS (SELECT * FROM mq_logit_sums),
        {_OLS_DETS}
        SELECT CAST(n AS BIGINT) AS n_rows,
               ROUND(det_b0 / det, 6) AS beta0,
               ROUND(det_b1 / det, 6) AS beta_dow,
               ROUND(det_b2 / det, 6) AS beta_dollars
        FROM det0
        """
    )


# --------------------------------------------- adamic_adar_link_pred (r14)

@register(
    "adamic_adar_link_pred",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM und GROUP BY src),
    wed AS (
        SELECT a.dst AS u, b.dst AS v, a.src AS z
        FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst
    ),
    cand AS (
        SELECT w.u, w.v, w.z
        FROM wed w
        LEFT JOIN edges e ON e.u = w.u AND e.v = w.v
        WHERE e.u IS NULL
    ),
    sc AS (
        SELECT u, v,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               SUM(CAST(FLOOR(1e12 / LN(d.deg)) AS BIGINT)) AS q
        FROM cand JOIN deg d ON d.node = cand.z
        GROUP BY u, v
    )
    SELECT u, v, n_common, ROUND(q / 1e12, 6) AS adamic_adar
    FROM sc ORDER BY q DESC, u, v LIMIT 20
    """,
)
def adamic_adar_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC–ADAR LINK PREDICTION on the co-purchase graph: for every
    NON-edge pair sharing ≥1 common neighbor, score Σ_z 1/ln(deg z)
    (rare shared neighbors say more than hub ones — Adamic & Adar
    2003), top-20 predicted links.  The "what product pair SHOULD
    co-occur but doesn't yet" recommender primitive, completing the
    r13 graph wave (`jaccard_node_similarity` scores existing
    similarity; this predicts absent edges).

    Determinism: each center's 1/ln(deg) is floor-quantized to 1e-12
    units (int64; deg is a small-integer domain, so the ulp-at-floor
    risk is negligible) and the per-pair sum is exact integer; top-20
    orders by (q DESC, u, v) — a total order, tie-safe at the cut.

    Scale (100 TB): wedges enumerate per-center neighbor pairs —
    quadratic in DEGREE, which the support prune (w ≥ 2) bounds, the
    same budget `clustering_coeff_per_node`'s wedge closure already
    pays; the non-edge filter is one anti-join on the canonical edge
    set; top-20 is a bounded TakeOrderedAndProject heap."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    a = und.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    b = und.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    wed = a.join(b, "z").where(F.col("u") < F.col("v"))
    cand = wed.join(F.broadcast(edges), ["u", "v"], "left_anti")
    sc = (
        cand.join(F.broadcast(deg), cand["z"] == deg["node"])
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum(
                F.floor(F.lit(1e12) / F.log(F.col("deg"))).cast("bigint")
            ).alias("q"),
        )
    )
    return (
        sc.orderBy(F.desc("q"), "u", "v")
        .limit(20)
        .select(
            "u",
            "v",
            "n_common",
            F.round(F.col("q") / F.lit(1e12), 6).alias("adamic_adar"),
        )
    )


# -------------------------------------------- degree_assortativity (r14)

@register(
    "degree_assortativity",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_CTE},
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM und GROUP BY src),
    ends AS (
        SELECT da.deg AS du, db.deg AS dv
        FROM und
        JOIN deg da ON da.node = und.src
        JOIN deg db ON db.node = und.dst
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(du AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(dv AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(du AS HUGEINT) * dv) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(du AS HUGEINT) * du) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(dv AS HUGEINT) * dv) AS DOUBLE) AS syy
        FROM ends
    )
    SELECT n AS n_edge_ends,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                 6) AS assortativity
    FROM m
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the co-purchase graph:
    Pearson correlation of endpoint degrees over every directed edge
    end — positive means hubs link hubs (social-style), negative
    means hubs link leaves (dependency-style).  One scalar that says
    which scaling regime the graph's joins will hit: assortative
    graphs concentrate wedge work in hub-hub blocks, disassortative
    ones spread it.

    Determinism: degree products are exact int64 per row; all five
    sums land exactly in DECIMAL(38,0)/HUGEINT, each engine rounds
    the exact sums to double ONCE, then one shared Pearson tree,
    ROUND(6).

    Scale (100 TB): two broadcast degree joins onto the edge-end
    stream + ONE map-side moments pass to a 6-register row."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("du"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dv"))
    ends = und.join(F.broadcast(da), "src").join(F.broadcast(db), "dst")
    d38 = "decimal(38,0)"
    m = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("du").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("dv").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("du") * F.col("dv")).cast(d38))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("du") * F.col("du")).cast(d38))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("dv") * F.col("dv")).cast(d38))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_edge_ends"),
        F.round(r, 6).alias("assortativity"),
    )


# ------------------------------------------- markov_2nd_order_paths (r14)

@register(
    "markov_2nd_order_paths",
    oracle="""
    WITH lagged AS (
        SELECT user_id,
               LAG(event_type, 2) OVER w AS p2,
               LAG(event_type, 1) OVER w AS p1,
               event_type AS nxt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
        SELECT p2, p1, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM lagged WHERE p2 IS NOT NULL GROUP BY p2, p1, nxt
    ),
    ctx AS (SELECT p2, p1, CAST(SUM(c) AS BIGINT) AS cc
            FROM tri GROUP BY p2, p1),
    bi AS (
        SELECT p1, nxt, CAST(COUNT(*) AS BIGINT) AS bc
        FROM lagged WHERE p1 IS NOT NULL GROUP BY p1, nxt
    ),
    uni AS (SELECT p1, CAST(SUM(bc) AS BIGINT) AS uc FROM bi GROUP BY p1)
    SELECT t.p2, t.p1, t.nxt, t.c,
           ROUND(t.c * 1.0 / ctx.cc, 6) AS p_2nd,
           ROUND(bi.bc * 1.0 / uni.uc, 6) AS p_1st,
           ROUND((t.c * 1.0 / ctx.cc) / (bi.bc * 1.0 / uni.uc), 4)
               AS memory_lift
    FROM tri t
    JOIN ctx ON ctx.p2 = t.p2 AND ctx.p1 = t.p1
    JOIN bi ON bi.p1 = t.p1 AND bi.nxt = t.nxt
    JOIN uni ON uni.p1 = t.p1
    ORDER BY t.p2, t.p1, t.nxt
    """,
)
def markov_2nd_order_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND-ORDER MARKOV TRANSITIONS over per-user event paths:
    P(next | prev2, prev1) next to the first-order P(next | prev1)
    (`event_transition_matrix`), with `memory_lift` = their ratio —
    the direct test of whether user behavior has MEMORY beyond one
    step (lift far from 1 says a 1st-order funnel model is wrong).
    Ordering ties break on event_id (exact-int key, the house rule).

    Determinism: trigram/bigram/context counts are exact integers off
    deterministic windows; probabilities and lift are single divisions
    of those ints, ROUND(6)/ROUND(4).

    Scale (100 TB): the lag window partitions by user_id (parallel);
    counts collapse to ≤ |types|³ rows; every post-collapse join is
    type-domain-bounded (broadcast-size)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.col("event_type").alias("nxt"),
    )
    tri = (
        lagged.where(F.col("p2").isNotNull())
        .groupBy("p2", "p1", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ctx = tri.groupBy("p2", "p1").agg(
        F.sum("c").cast("bigint").alias("cc")
    )
    bi = (
        lagged.where(F.col("p1").isNotNull())
        .groupBy("p1", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bc"))
    )
    uni = bi.groupBy("p1").agg(F.sum("bc").cast("bigint").alias("uc"))
    j = (
        tri.join(F.broadcast(ctx), ["p2", "p1"])
        .join(F.broadcast(bi), ["p1", "nxt"])
        .join(F.broadcast(uni), "p1")
    )
    p2nd = F.col("c") * F.lit(1.0) / F.col("cc")
    p1st = F.col("bc") * F.lit(1.0) / F.col("uc")
    return j.select(
        "p2",
        "p1",
        "nxt",
        "c",
        F.round(p2nd, 6).alias("p_2nd"),
        F.round(p1st, 6).alias("p_1st"),
        F.round(p2nd / p1st, 4).alias("memory_lift"),
    ).orderBy("p2", "p1", "nxt")


# ------------------------------------------- concurrency_peak_daily (r14)

@register(
    "concurrency_peak_daily",
    oracle="""
    WITH sess AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               MIN(ts) AS t0, MAX(ts) AS t1
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    b AS (
        SELECT d, t0 AS t, 1 AS delta, user_id FROM sess
        UNION ALL
        SELECT d, t1 AS t, -1 AS delta, user_id FROM sess
    ),
    run AS (
        SELECT d, t, delta,
               SUM(delta) OVER (PARTITION BY d
                   ORDER BY t, delta DESC, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS conc
        FROM b
    ),
    pk AS (SELECT d, CAST(MAX(conc) AS BIGINT) AS peak
           FROM run GROUP BY d),
    ns AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_sessions
           FROM sess GROUP BY d)
    SELECT r.d, ns.n_sessions, pk.peak AS peak_concurrency,
           CAST(MIN(epoch_us(r.t)) AS BIGINT) AS first_peak_us
    FROM run r
    JOIN pk ON pk.d = r.d AND r.conc = pk.peak
    JOIN ns ON ns.d = r.d
    GROUP BY r.d, ns.n_sessions, pk.peak
    ORDER BY r.d
    """,
)
def concurrency_peak_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY PER DAY via the classic +1/−1 boundary sweep:
    each (user, day) contributes an active interval [first event, last
    event]; interleaving all starts (+1) and ends (−1) in time order
    and running-summing gives the concurrency curve, whose max is the
    day's peak load — the capacity-planning number
    `interval_union_duration` (total covered time) does not give.
    Starts sort BEFORE ends at the same instant (delta DESC), so
    single-event sessions still register; user_id completes the total
    order (tie-safe window).

    Determinism: pure integer running sums over a totally-ordered
    boundary stream; the peak instant is MIN(epoch micros) at the max
    — exact integer selection.

    Scale (100 TB): the session collapse is map-side; the sweep
    partitions BY DAY (parallel across days — never a global single
    partition); boundary rows = 2·sessions/day."""
    ev = load(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    b = sess.select(
        "d", F.col("t0").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sess.select(
            "d", F.col("t1").alias("t"), F.lit(-1).alias("delta"),
            "user_id",
        )
    )
    w = (
        Window.partitionBy("d")
        .orderBy(F.col("t"), F.desc("delta"), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = b.withColumn("conc", F.sum("delta").over(w))
    pk = run.groupBy("d").agg(
        F.max("conc").cast("bigint").alias("peak")
    )
    ns = sess.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return (
        run.join(F.broadcast(pk), "d")
        .where(F.col("conc") == F.col("peak"))
        .groupBy("d", "peak")
        .agg(F.min(F.unix_micros("t")).cast("bigint").alias("first_peak_us"))
        .join(F.broadcast(ns), "d")
        .select(
            "d",
            "n_sessions",
            F.col("peak").alias("peak_concurrency"),
            "first_peak_us",
        )
        .orderBy("d")
    )


# -------------------------------------- bipartite_type_projection (r14)

@register(
    "bipartite_type_projection",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM ut GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT ta, tb, n_shared, na.n AS n_a, nb.n AS n_b,
           ROUND(n_shared / SQRT(CAST(na.n AS DOUBLE) * nb.n), 6)
               AS cosine_w
    FROM pairs
    JOIN n1 na ON na.event_type = ta
    JOIN n1 nb ON nb.event_type = tb
    ORDER BY ta, tb
    """,
)
def bipartite_type_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED ONE-MODE PROJECTION of the user↔event-type bipartite
    graph onto event types: for each type pair, the shared-user count
    cosine-normalized by each type's audience size — the "which
    behaviors travel together" graph that segment design and funnel
    ordering read first (a high-cosine pair is one audience, not
    two).

    Determinism: shared/audience counts are exact integers off a
    distinct collapse; cosine is one sqrt+division tree from ints,
    ROUND(6).

    Scale (100 TB): the distinct (user, type) collapse is the only
    corpus-scale exchange; pair generation is a ROW-LOCAL
    C(types-per-user, 2) fan off collect_set (the in-row-fan rule —
    never a corpus self-join on user_id); the projection is
    type-domain-bounded (≤ |types|² rows)."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n1 = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_user = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("tps")
    ).filter(F.size("tps") >= 2)
    pairs = (
        per_user.select(
            F.explode(
                F.expr(
                    "flatten(transform(tps, (x, i) ->"
                    " transform(slice(tps, i + 2, size(tps) - i - 1),"
                    " y -> struct(x AS ta, y AS tb))))"
                )
            ).alias("p")
        )
        .select("p.ta", "p.tb")
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    na = n1.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    nb = n1.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "ta")
        .join(F.broadcast(nb), "tb")
        .select(
            "ta",
            "tb",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("cosine_w"),
        )
        .orderBy("ta", "tb")
    )


# --------------------------------------------- haversine_nearest_hub (r14)

@register(
    "haversine_nearest_hub",
    oracle="""
    WITH hubs AS (
        SELECT * FROM (VALUES
            (0, 40.7, -74.0), (1, 51.5, -0.1), (2, 35.7, 139.7),
            (3, -23.6, -46.6), (4, 28.6, 77.2)
        ) AS h(hub_id, hlat, hlon)
    ),
    cust AS (
        SELECT c_custkey,
               -60.0 + (c_custkey % 120) AS lat,
               -180.0 + ((c_custkey * 7) % 360) AS lon
        FROM customer
    ),
    d AS (
        SELECT c.c_custkey, h.hub_id,
               CAST(FLOOR(2 * 6371000.0 * ASIN(SQRT(
                   SIN(RADIANS(h.hlat - c.lat) / 2)
                     * SIN(RADIANS(h.hlat - c.lat) / 2)
                   + COS(RADIANS(c.lat)) * COS(RADIANS(h.hlat))
                     * SIN(RADIANS(h.hlon - c.lon) / 2)
                     * SIN(RADIANS(h.hlon - c.lon) / 2)))) AS BIGINT)
                   AS dist_m
        FROM cust c CROSS JOIN hubs h
    ),
    best AS (
        SELECT c_custkey, hub_id, dist_m,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                   ORDER BY dist_m, hub_id) AS rk
        FROM d
    )
    SELECT hub_id,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(dist_m) * 1.0 / COUNT(*) / 1000.0, 4) AS avg_km,
           CAST(MAX(dist_m) AS BIGINT) AS max_m
    FROM best WHERE rk = 1
    GROUP BY hub_id ORDER BY hub_id
    """,
)
def haversine_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOSPATIAL NEAREST-HUB ASSIGNMENT via the haversine great-circle
    formula: customers (coordinates synthesized deterministically from
    their keys — a real deployment reads lat/lon columns) assigned to
    the nearest of 5 literal hub cities, with per-hub load and
    distance profile — the logistics/serving-region primitive the
    engine's SQL surface had not yet covered (the math-function wave:
    RADIANS/SIN/COS/ASIN/SQRT composed into one tree).

    Determinism: the haversine tree is written identically in both
    engines and its result is floor-quantized to METERS before any
    comparison or sum — libm sin/cos may differ by an ulp between
    JVM and C++, which at earth scale is ~1e-6 m, far inside the
    quantum; nearest-hub ties break on hub_id.

    Scale (100 TB): the hub side is 5 literal rows (broadcast by
    construction); the per-customer argmin is a ROW_NUMBER over a
    5-row partition; per-hub aggregation is map-side."""
    c = load(spark, sf_dir, "customer")
    hubs = spark.createDataFrame(
        [(0, 40.7, -74.0), (1, 51.5, -0.1), (2, 35.7, 139.7),
         (3, -23.6, -46.6), (4, 28.6, 77.2)],
        "hub_id int, hlat double, hlon double",
    )
    cust = c.select(
        "c_custkey",
        (F.lit(-60.0) + (F.col("c_custkey") % 120)).alias("lat"),
        (F.lit(-180.0) + ((F.col("c_custkey") * 7) % 360)).alias("lon"),
    )
    d = cust.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        "hub_id",
        F.floor(
            F.lit(2.0)
            * F.lit(6371000.0)
            * F.asin(
                F.sqrt(
                    F.sin(F.radians(F.col("hlat") - F.col("lat")) / 2)
                    * F.sin(F.radians(F.col("hlat") - F.col("lat")) / 2)
                    + F.cos(F.radians(F.col("lat")))
                    * F.cos(F.radians(F.col("hlat")))
                    * F.sin(F.radians(F.col("hlon") - F.col("lon")) / 2)
                    * F.sin(F.radians(F.col("hlon") - F.col("lon")) / 2)
                )
            )
        )
        .cast("bigint")
        .alias("dist_m"),
    )
    wb = Window.partitionBy("c_custkey").orderBy("dist_m", "hub_id")
    best = d.withColumn("rk", F.row_number().over(wb)).where(
        F.col("rk") == 1
    )
    return (
        best.groupBy("hub_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum("dist_m")
                * F.lit(1.0)
                / F.count(F.lit(1))
                / F.lit(1000.0),
                4,
            ).alias("avg_km"),
            F.max("dist_m").cast("bigint").alias("max_m"),
        )
        .orderBy("hub_id")
    )


# -------------------------------------------- user_behavior_entropy (r14)

@register(
    "user_behavior_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    ),
    t AS (
        SELECT user_id, c,
               CAST(FLOOR(-1e12
                   * (c * 1.0 / SUM(c) OVER (PARTITION BY user_id))
                   * LOG2(c * 1.0 / SUM(c) OVER (PARTITION BY user_id)))
                   AS BIGINT) AS tq
        FROM c
    ),
    n AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(tq) AS BIGINT) AS h_q
          FROM t GROUP BY user_id),
    b AS (
        SELECT user_id, n,
               CAST(FLOOR(h_q / 5e11) AS BIGINT) AS bin
        FROM n
    )
    SELECT bin,
           ROUND(bin * 0.5, 1) AS entropy_bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS total_events,
           ROUND(SUM(n) * 1.0 / COUNT(*), 4) AS avg_events_per_user
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL-DIVERSITY SEGMENTATION: Shannon entropy of each
    user's event-type distribution, histogrammed in 0.5-bit bins —
    bin 0 is single-behavior users (bots, scripts), high bins are
    diverse engaged users; the one-number behavioral-breadth segment
    marketing and abuse teams both cut by (`bit_agg_flags` gives the
    SET of behaviors; entropy weighs their balance).

    Determinism: each −p·log2 p term floor-quantizes to 1e-12 units
    INSIDE the per-user window-sum (≤ |types| terms, exact int);
    binning is integer floor-division of the quantized entropy
    (5e11 = 0.5 bits); all histogram outputs integer.

    Scale (100 TB): one (user, type) collapse (map-side combinable),
    per-user totals via a window over ≤ |types| rows, then a
    ≤ ~7-bin histogram collapse."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wu = Window.partitionBy("user_id")
    p = F.col("c") * F.lit(1.0) / F.sum("c").over(wu)
    term_q = F.floor(F.lit(-1e12) * p * F.log2(p)).cast("bigint")
    n = (
        c.select("user_id", "c", term_q.alias("tq"))
        .groupBy("user_id")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sum("tq").cast("bigint").alias("h_q"),
        )
    )
    b = n.select(
        "n", F.floor(F.col("h_q") / F.lit(5e11)).cast("bigint").alias("bin")
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n").cast("bigint").alias("total_events"),
            F.round(
                F.sum("n") * F.lit(1.0) / F.count(F.lit(1)), 4
            ).alias("avg_events_per_user"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 0.5, 1).alias("entropy_bin_lo"),
            "n_users",
            "total_events",
            "avg_events_per_user",
        )
        .orderBy("bin")
    )
