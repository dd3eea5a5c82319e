"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the ``docker_based_real_time_etl_project_spark``
package (see SURVEY.md §2 for the operator inventory each query
covers); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from docker_based_real_time_etl_project_spark.queries import REGISTRY  # noqa: E402

# The driver's correctness gate checks the first 50 entries in queries()
# iteration order. Round-4 window: (a) queries the driver has never
# seen (the round-4 analytics/time-series pack + q_join_cross), (b) the
# three r3 reds — all three were one root cause, the loader's hard-coded
# nanos shim corrupting events.ts after the testdata regenerated as
# timestamp[us]; the loader now sniffs the footer — re-verify, (c) every
# OTHER events-time query: their greens predate the us regeneration and
# were earned on nanos-era data, (d) the oldest (r1) greens, continuing
# the rotation cadence. Remaining r1 greens re-enter in r5.
_DRIVER_WINDOW_PRIORITY = [
    # (a) never driver-verified
    "q_funnel", "q_cohort_retention", "q_histogram",
    "q_gap_fill_interp", "q_twap", "q_join_asof_tol",
    "q_join_cross", "q_cdc_agg_incremental",
    "q_transition_matrix", "q_outliers_zscore", "q_stream_cdc_agg",
    "q_rolling_active_users", "q_stream_join_outer", "q_zorder_pruned_scan",
    # (b) r3 reds, root cause fixed (parquet timestamp-precision sniff)
    "q_gap_fill", "q_join_asof", "q_win_range_frame",
    # (c) events-time queries re-verifying on post-regeneration data
    "q_ohlcv_1h", "q_ticker_24h", "q_session_window", "q_rollup_cascade",
    "q_date_trunc_extract", "q_dedup_latest", "q_win_lag", "q_win_moving",
    "q_json_extract", "q_date_arith",
    "q_stream_ohlcv_1h", "q_stream_sliding_24h", "q_stream_session_window",
    "q_stream_stateful_totals", "q_stream_static_join",
    "q_stream_stream_join", "q_stream_dedup_latest",
    # (d) oldest greens (last verified r1), rotating back in
    # (q_dedup_minhash is rows-only by design — its oracled twin
    #  q_dedup_minhash_pairs carries the hash evidence — so the slot
    #  goes to q_str_funcs to keep the window 50/50 hash-checkable)
    "q_str_funcs", "q_agg_salted", "q_join_star", "q_join_left",
    "q_join_semi", "q_join_range", "q_filter_pred", "q_project_cast",
    "q_topk_orders", "q_agg_distinct", "q_rollup", "q_cube",
    "q_grouping_sets", "q_union_all",
    # (e) implementation changed this round -> must re-verify:
    # inverted-index postings rewrite (both), edge-touched propagation
    "q_ngram_jaccard", "q_dedup_clusters",
    # (still r1-green, rotate in r5: q_intersect, q_union_distinct, q_exists_subquery, q_scalar_subquery,
    #  q_pivot, q_null_handling, q_array_agg_sorted,
    #  q_percentiles, q_filtered_agg, q_math_round_pct,
    #  q_arr_elem, q_arr_explode, q_arr_zip, q_media_resize_meta,
    #  q_media_frame_sample, q_media_features, q_ngram_jaccard,
    #  q_udf_scalar, q_dedup_simhash, q_agg_approx_distinct,
    #  q_dedup_minhash rows-only)
]


def _ordered() -> list[str]:
    prio = [n for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prio)]
    return prio + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
