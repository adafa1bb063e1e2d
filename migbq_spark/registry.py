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

#: Driver-graded window rotation (round 4).
#:
#: The driver's correctness harness grades only the FIRST 50 entries of
#: ``queries()`` each round.  Rounds 1-2 graded the import-order first 50
#: (aggregates + analytics + control head, all green in CORRECTNESS_r02);
#: round 3 graded joins + sources + windows + text/similarity + streaming
#: batch-equivalents + UDFs (all green in CORRECTNESS_r03).  Everything
#: previously graded remains permanently guarded by the driver-faithful
#: parity suite (tests/test_parity.py gates every hash query on
#: migbq_spark.testing.compare_driver), so — as directed by the r3
#: VERDICT ("Next round" items 1 and 8) — round 4 rotates onto the next
#: 50 never-driver-graded hash ids: the §2.I control tail, the TPC-H
#: macros, all §2.B relational ids (base + §2.K extensions living in
#: relational.py), all §2.F sorting ids, ``join_cross`` (the one §2.C id
#: without driver signal), ``mm_meta_audit``, the §2.K pipeline hash ids,
#: and the four newest r3/r4 operators (newest code = least soak time =
#: highest value of direct driver signal).  The remaining 45 hash ids are
#: pre-staged as R5_WINDOW below so every hash id has driver signal by
#: r5.  This is evidence-maximization across rounds, not failure-hiding:
#: nothing leaves the parity suite, and the rotation is stated here, in
#: SURVEY.md §2, and in the commit.
DRIVER_WINDOW: tuple[str, ...] = (
    # §2.I control tail (never graded)
    "compact_merge_on_read",
    "cdc_snapshot_diff",
    "table_checksum_md5",
    "checksum_incremental_update",
    "pk_gap_detection",
    "scd2_dimension_build",
    # TPC-H macros + vector HOF macro
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "tpch_q12_priority_split",
    "tpch_q18_large_volume",
    "vec_hof_norm",
    # §2.B relational (base 7 + the 5 §2.K ids implemented in relational.py)
    "filter_pred",
    "project_cast_typemap",
    "cond_case_coalesce",
    "str_funcs",
    "regexp_extract_json",
    "date_funcs",
    "math_funcs",
    "json_path_extract",
    "str_funcs2",
    "unpivot_stack",
    "explode_outer_tokens",
    "map_roundtrip_audit",
    # §2.F sorting / set ops (base 6 + 3 §2.K ids in sorting.py)
    "topk_global",
    "sort_multi_key",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "range_partition_boundaries",
    # the one §2.C id with no driver signal (r3 VERDICT item 8)
    "join_cross",
    # multimodal metadata audit
    "mm_meta_audit",
    # §2.K pipeline hash ids
    "dedup_minhash_portable",
    "near_dup_embedding",
    "lang_id_ngram",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "dup_cc_twostar",
    "contamination_overlap",
    "repeated_ngram_ratio",
    "cross_source_overlap",
    "heaps_law_vocab_growth",
    # newest r3/r4 operators — least soak time, grade them early
    "join_asof_forward",
    "sample_hash_bernoulli",
    "doc_token_entropy",
    "dedup_cross_source_cc",
)

#: Pre-staged round-5 window (r3 VERDICT "Next round" item 2): the 45
#: hash ids that will still lack driver signal after the r4 window above
#: lands — training/corpus-stats, all of timeseries, the remaining
#: streaming hash ids, and the control/UDTF stragglers.  Preflighted by
#: scripts/preflight.py alongside DRIVER_WINDOW (see PREFLIGHT_r04.md) so
#: the r5 rotation is a one-line swap.  New hash ids added in r4 (e.g.
#: ``dedup_simhash_portable``) are appended here as they land.
R5_WINDOW: tuple[str, ...] = (
    # §2.I / control stragglers
    "observe_progress_metrics",
    "recursive_pk_ranges",
    # §2.K training / sampling / corpus stats
    "pii_scrub",
    "train_test_split",
    "mix_weighted_sources",
    "ngram_jaccard",
    "dedup_keep_canonical",
    "agg_stats_moments",
    "agg_percentile",
    "pivot_event_counts",
    "win_percent_rank",
    "join_bucket_colocated",
    "stratified_sample_exact",
    "dup_connected_components",
    "tfidf_top_terms",
    "vocab_top_tokens",
    "features_order_wide",
    "class_balance_report",
    "ngram_lm_bigram_probs",
    "zipf_fit_slope",
    "entropy_by_source",
    "group_top_p_nucleus",
    # §2.K timeseries (all 14)
    "ts_gap_fill",
    "cum_new_users",
    "win_range_frame",
    "sessionize_gaps",
    "win_moving_avg",
    "locf_impute",
    "anomaly_zscore_daily",
    "anomaly_zscore_by_key",
    "interval_union_duration",
    "interarrival_histogram",
    "rolling_max_drawdown",
    "daily_autocorr_lag1",
    "control_chart_bands",
    "share_of_voice_7d",
    # windows / UDTF stragglers
    "win_ignore_nulls",
    "udtf_lateral_split",
    # streaming hash ids
    "stream_stateful_progress",
    "stream_stateful_rocksdb",
    "stream_foreach_batch_sink",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_stateful_tws",
    # new r4 hash ids
    "dedup_simhash_portable",
    "mm_decode_headers",
    "mm_audio_headers",
    "mm_video_headers",
    "stream_tws_liststate",
    "stream_tws_timers",
    "stream_tws_mapstate",
)


def _windowed(d: dict) -> dict:
    """Return ``d`` re-ordered so DRIVER_WINDOW ids come first (in window
    order), followed by every other id in module import order."""
    out = {k: d[k] for k in DRIVER_WINDOW if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


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

    # Fail LOUDLY if any DRIVER_WINDOW id is missing from the registry: a
    # typo or renamed operator would otherwise silently shrink the graded
    # window below 50 and let un-preflighted import-order queries slide
    # into the driver-graded slots (r3 ADVICE).
    missing = set(DRIVER_WINDOW) - set(QUERIES)
    if missing:
        raise RuntimeError(
            f"DRIVER_WINDOW ids not in registry: {sorted(missing)}"
        )
    missing_r5 = set(R5_WINDOW) - set(QUERIES)
    if missing_r5:
        raise RuntimeError(
            f"R5_WINDOW ids not in registry: {sorted(missing_r5)}"
        )
    overlap = set(DRIVER_WINDOW) & set(R5_WINDOW)
    if overlap:
        raise RuntimeError(
            f"ids staged in both windows: {sorted(overlap)}"
        )
    _LOADED = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _windowed(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _windowed(ORACLES)
