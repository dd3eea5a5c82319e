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
# iteration order. Round-3 window: (a) the 9 queries the driver has
# never seen, (b) the r2 red (q_corpus_mix, oracle dtype fixed), (c)
# every query whose implementation changed since its last green
# (clustering rewrite, asof struct-carry, range-frame microseconds,
# widened ANN recall contracts), (d) the new skew-stress join, (e) the
# oldest r1 greens so everything re-verifies on a cadence. The r2
# greens rotate behind and re-enter in later rounds.
_DRIVER_WINDOW_PRIORITY = [
    # (a) never driver-verified (added late in r2)
    "q_corpus_pipeline", "q_sequence_pack", "q_unpivot",
    "q_intersect_all", "q_except_all", "q_fuzzy_match",
    "q_shipping_priority", "q_local_supplier_volume", "q_source_orc",
    # (b) hash-FAIL in r2: bare SUM(doc_id) oracle returned HUGEINT;
    # now CAST ... AS BIGINT (same fix applied to the two latent copies
    # in q_corpus_pipeline / q_sequence_pack above)
    "q_corpus_mix",
    # (c) changed since last driver green -> must re-verify
    "q_dedup_clusters",    # clustering rewritten after its r1 green
    "q_join_asof",         # asof carry now struct-atomic
    "q_win_range_frame",   # frame now microsecond-exact
    "q_ann_lsh_recall", "q_ann_ivf_recall",  # 20-point + mean-recall row
    "q_cosine_topk",       # exact twin the recall contracts compare against
    # (d) new this round: skew stress, the deep TPC-H shape pack
    # (relational3), and the LLM training-data hygiene pack (llmprep)
    "q_join_skew_stress",
    "q_volume_shipping", "q_product_profit", "q_returned_items",
    "q_priority_lines", "q_promo_revenue", "q_large_orders",
    "q_disjunctive_pred", "q_quiet_customers", "q_win_ntile",
    "q_contamination", "q_repetition_ratio", "q_pii_scrub",
    # (e) oldest r1 greens, re-entering the window (S1 flows cycle first:
    # the flows feed every T-operator)
    "q_etl_poll_cycle",
    "q_cdc_materialize", "q_cdc_stream_upsert",
    "q_dedup_exact",
    "q_pricing_summary", "q_join_inner",
    # full-outer reconciliation join (added this round, never driver-seen)
    "q_join_full",
    # (f2) the TPC-H completion pack (relational5) — never driver-seen
    "q_priority_waiting", "q_market_share", "q_top_supplier",
    "q_supplier_cnt", "q_excess_shippers",
    # gap-filled bars (added this round, never driver-seen)
    "q_gap_fill",
    # exact-substring chunk dedup (added this round, never driver-seen)
    "q_chunk_dedup",
    # (f) the correlated-subquery pack (relational4) — never
    # driver-seen, so it outranks re-verifying stable r1 greens
    "q_max_acctbal_supplier", "q_important_parts", "q_cust_order_dist",
    "q_small_qty_revenue", "q_waiting_suppliers", "q_idle_customers",
    "q_lateral_topn",
    # (q_ngram_jaccard, q_join_cross,
    #  q_udf_scalar, q_media_resize_meta, q_media_frame_sample,
    #  q_project_cast, q_join_star,
    #  q_filter_pred, q_join_left, q_join_semi, q_join_range, q_agg_distinct, q_rollup, q_cube,
    #  q_grouping_sets, q_topk_orders, q_union_all, q_intersect,
    #  q_agg_salted, q_exists_subquery, q_scalar_subquery, q_pivot,
    #  q_null_handling, q_array_agg_sorted, q_percentiles,
    #  q_union_distinct, q_filtered_agg, q_arr_explode, q_str_funcs,
    #  q_math_round_pct, q_arr_elem, q_arr_zip, q_date_arith —
    #  stable r1 greens — rotate in r4)
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
