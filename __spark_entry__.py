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
# iteration order. Round-6 window, by staleness of driver evidence
# (computed from CORRECTNESS_r01..r05 — after r5 every registered
# query has at least one driver green, so rotation is purely
# oldest-first plus changed-first): (a) the 10 queries ADDED this round
# (subword packing, streaming corpus-gate capstone, bloom-prefiltered
# contamination, quality-policy cluster canonicalization, the corpus
# data card and PSI drift monitor each in batch and streaming form,
# the streaming top-k leaderboard completing the A1-A4 matrix, and
# token-budget corpus sizing on a distributed prefix-sum);
# (b)
# queries whose implementation changed this round — the
# connected-components convergence fold (q_dedup_clusters), the ANN
# recall contracts retuned to the 0.8 floor, and EVERY streaming
# query: all 14 ride the reworked session-materialization cache
# (parameter+fingerprint keys) and the as-of pair additionally got the
# masked-int64 carry; (c) all 17 remaining r2-era greens (text pack,
# UDF/UDTF pack, window pair, anti/salted joins, CMS sketch, media
# meta, embed norms); (d) 6 oldest r3-era rows led by the CDC pack
# (q_pricing_summary needs no slot: entry() smoke-runs it every round).
# After r6 no query's evidence is older than r3.
_DRIVER_WINDOW_PRIORITY = [
    # (a) new this round
    "q_sequence_pack_subword", "q_stream_corpus_gate", "q_contamination_bloom",
    "q_dedup_keep_best", "q_corpus_datacard", "q_corpus_drift",
    "q_stream_corpus_drift", "q_stream_corpus_datacard", "q_stream_win_rank", "q_token_budget",
    # (b) implementation changed this round
    "q_dedup_clusters", "q_ann_lsh_recall", "q_ann_ivf_recall",
    "q_stream_ohlcv_1h", "q_stream_sliding_24h", "q_stream_stateful_totals",
    "q_stream_session_window", "q_stream_dedup_latest",
    "q_stream_stream_join", "q_stream_static_join", "q_stream_join_outer",
    "q_stream_cdc_agg", "q_stream_contamination", "q_stream_join_asof",
    "q_stream_join_asof_tol", "q_stream_dedup_content",
    "q_stream_dedup_minhash_pairs",
    # (c) r2-era greens (oldest evidence in the registry)
    "q_embed_norms", "q_udaf_median", "q_media_meta_stats", "q_join_anti",
    "q_regexp_all", "q_join_salted", "q_heavy_hitters_cms",
    "q_text_tokenize", "q_doc_stats", "q_token_count", "q_lang_id",
    "q_quality_score", "q_fingerprint", "q_tfidf", "q_udtf_chunk",
    "q_win_rank", "q_win_distribution",
    # (d) oldest r3-era rows, CDC pack first
    "q_cdc_materialize", "q_cdc_stream_upsert", "q_dedup_exact",
    "q_etl_poll_cycle", "q_corpus_mix", "q_sequence_pack",
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
