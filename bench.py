#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with the ``noop`` sink so the full plan runs on
every partition (no driver-side collect skew) and timing reflects
distributed execution, not result transfer. The reference's configured
ceiling is ~2.6 rows/s (BASELINE.md); the meaningful comparison for the
engine is wall-seconds per analytical query at the same scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per pipeline shape (scan+agg, star join, window,
# streaming-analog aggs, dedup exact + minhash, ANN, text). Names must
# exist in the registry; bench fails loudly otherwise.
HEADLINE = [
    "q_pricing_summary",   # scan -> filter -> hash agg -> sort (TPC-H Q1 shape)
    "q_join_star",         # 5-way broadcast star join
    "q_join_inner",        # large-large shuffle join
    "q_join_range",        # non-equi range join
    "q_topk_orders",       # TakeOrderedAndProject
    "q_win_rank",          # partitioned window top-k
    "q_ohlcv_1h",          # tumbling-window OHLCV (A1)
    "q_ticker_24h",        # sliding 24h ticker stats (A2)
    "q_dedup_exact",       # exact dedup via hash agg
    "q_dedup_minhash",     # MinHash-LSH near-dup join
    "q_cosine_topk",       # brute-force cosine top-k
    "q_text_tokenize",     # split+explode word counts
    "q_agg_salted",        # skew-proof two-phase aggregation
    "q_udf_scalar",        # Arrow pandas-UDF scoring (Python slow path)
    "q_media_features",    # mapInPandas multimodal feature extraction
    "q_cdc_materialize",   # JSON envelope decode + changelog compaction
    # round 2 additions (the original 16 above are kept stable so
    # round-over-round comparison holds)
    "q_dedup_clusters",    # near-dup pairs -> connected components -> keep-one
    "q_stream_ohlcv_1h",   # 8-micro-batch streaming OHLCV (A1 as a stream)
    "q_join_asof",         # as-of join (union-and-carry-forward, 1 shuffle)
    "q_corpus_pipeline",   # capstone corpus prep: quality -> dedup -> split
    # round 3 additions
    "q_volume_shipping",   # deep 6-way TPC-H Q7 join tree
    "q_contamination",     # train/test 5-gram contamination (distinct-gram join)
    "q_market_share",      # 8-way TPC-H Q8 join tree, conditional share agg
    "q_chunk_dedup",       # ExactSubstr-shape chunk dedup (window + reassembly)
    # round 4 additions
    "q_funnel",            # stacked conditional-min windows, one exchange
    "q_gap_fill_interp",   # spine gapfill + linear interpolation frames
    "q_twap",              # time-weighted average, exact integer accumulation
    # round 5 additions
    "q_contamination_span",  # gaps-and-islands longest shared-gram run
    "q_split_leakage",       # near-dup pairs straddling splits (postings join)
    "q_domain_cap",          # per-source top-N window
    # round 6 additions
    "q_dedup_keep_best",     # clusters + quality-policy survivor window
    "q_corpus_datacard",     # per-source dataset card, one agg pass
    "q_corpus_drift",        # PSI drift monitor, 21-row histogram
    # round 7 additions
    "q_lm_perplexity",       # corpus-trained bigram LM, integer micro-unit scores
    "q_embed_feature_hash",  # signed feature hashing, one narrow groupBy
    "q_bollinger",           # integer-exact sliding mean/stddev bands
    "q_vwap",                # hourly VWAP, one hash aggregation
    "q_media_meta_decode",   # real PNG/WAV/APNG encode+parse via mapInPandas
    # round 8 additions
    "q_stream_rsi",          # vectorized integer indicator state fold
    "q_stream_rsi_ooo",      # watermark-delayed re-sort over shuffled arrival
    "q_lake_roundtrip",      # clustered lake write + partition-dir readback
    "q_lake_merge",          # copy-on-write MERGE, touched-partition rewrite
    "q_lake_time_travel",    # snapshot manifest time travel after a merge
    "q_tick_imbalance",      # tick-rule signed order-flow imbalance
    "q_volume_bars",         # OHLCV on a volume clock
    "q_cusum",               # CUSUM change-point alarms, closed form
    "q_kyle_lambda",         # OLS price impact, decimal cross terms
    "q_max_drawdown",        # path-dependent risk, closed form
    "q_realized_vol",        # daily realized variance, integer-exact
    "q_hll_rollup",          # mergeable HLL daily->monthly distinct rollup
    "q_sample_weighted",     # hash-ticket weighted Poisson sampling
    "q_embed_gram",          # distributed Gramian, row-side pair expansion
    # round 9 additions
    "q_lake_concurrent_merge",  # optimistic-CAS two-writer merge + rebase
    "q_lake_zorder_box",        # manifest-pruned 2-D box over z-lake
    "q_lake_point_lookup",      # per-file bloom-index point read
    "q_dedup_span_corpus",      # corpus-wide maximal duplicated spans
    "q_contamination_bloom",    # distributed bitmap build + expression probes
    # round 10 additions
    "q_lake_mor_delete",        # merge-on-read delete files + read anti-join
    "q_sessionize_attribution", # first/last-touch credit, one window pass
    "q_retention_curve",        # day-N retention, windowed denominator
    "q_ann_ivf_persisted",      # lake-persisted IVF index, probed-cell reads
    "q_lake_mor_merge",         # MoR upsert: O(changes) CDC-apply commit
    # round 10 session-3 additions
    "q_hierarchy_closure",      # pointer-jumping closure, O(log depth) rounds
    "q_join_interval_overlap",  # pure overlap join, adaptive-width buckets
    "q_ivm_minmax",             # MIN/MAX matview, dirty-group recompute
    "q_scd2_interval_join",     # SCD2 validity-interval fact enrichment
    "q_interval_concurrency",   # sweep-line peaks via two-phase prefix scan
    "q_lake_sync",              # diff-pruned sync-to-source commit
    "q_funnel_deadline",        # attribution-window funnel, one exchange
    "q_join_asof_forward",      # forward as-of, descending carry scan
    "q_join_window_agg",        # trailing-window aggregate attach
    "q_skyline",                # Pareto frontier via running-max windows
    # round 11 additions
    "q_bm25_topk",              # BM25 ranked retrieval, broadcast postings join
    "q_hybrid_rrf",             # sparse+dense reciprocal-rank fusion
    "q_pagerank",               # 5-iteration integer power method
    "q_itemset_pairs",          # per-basket pair mining with lift
    "q_fuzzy_join",             # ED-1 join via deletion-neighborhood blocks
    "q_pagerank_ppr",           # random-walk-with-restart proximity ranking
    # round 12 additions
    "q_bm25_index_persisted",   # maintained lake BM25 index, bucket-pruned reads
    "q_fuzzy_join_ed1_xlen",    # cross-length ED<=1, deletion-neighborhood blocks
    "q_bpe_train",              # 10-round BPE merge loop, vocab-sized per round
    "q_pagerank_weighted",      # (rank*w) DIV sum_w integer power method
    "q_label_propagation",      # 4-round LPA community detection
    "q_fuzzy_clusters",         # entity resolution: pairs -> components -> survivor
    "q_kmeans_lloyd",           # integer-exact Lloyd's, broadcast-K assignment
    # round 13 additions
    "q_dedup_semantic",         # SemDeDup: cluster -> in-cluster cosine -> survive
    "q_bpe_encode_unseen",      # tokenizer-apply: broadcast merge fold, one stage
    "q_sample_dsir",            # DSIR: two bigram LMs, integer log-ratio resample
    "q_dedup_semantic_text",    # text -> hash embed -> cluster -> cosine -> survive
    "q_lsh_index_persisted",    # maintained lake LSH index, bucketed self-join
    "q_dedup_semantic_keep",    # SemDeDup paper keep policy, centroid argmax
    "q_corpus_shard",           # token-balanced sharding via distributed scan
    # round 14 additions
    "q_corpus_pipeline_full",   # 8-stage capstone: quality->dedup3x->screen->
                                # DSIR->temperature->shard, persisted artifacts
    "q_dedup_span_remove",      # ExactSubstr removal: excise + reassemble text
]


def _plan_fingerprint(df) -> str:
    """Stable hash of the query's physical plan: expression ids,
    plan ids, file paths, and size statistics are normalized away so
    the fingerprint changes iff the plan SHAPE changes. Recorded per
    headline query so a timing blip is attributable in one look —
    same fingerprint as last round means noise, different means the
    planner picked a different strategy."""
    import hashlib
    import re

    from docker_based_real_time_etl_project_spark.plans import formatted_plan

    p = formatted_plan(df)
    p = re.sub(r"#\d+", "#x", p)
    p = re.sub(r"plan_id=\d+", "plan_id=x", p)
    p = re.sub(r"Location: [^\n]*", "Location: x", p)
    p = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", p)
    # localCheckpoint scans print session-unique RDD ids
    # (MapPartitionsRDD[65] at localCheckpoint...) — without this every
    # checkpoint-bearing plan got a fresh fingerprint each run and the
    # round-over-round diff was blind exactly where it matters most
    # (measurement fix, round 14; ~31 queries flapped r13 -> r14)
    p = re.sub(r"RDD\[\d+\]", "RDD[x]", p)
    # Data-derived scalar literals (corpus totals, derived K, bucket
    # counts — e.g. sampling_q embeds total//2 in the plan) are VALUES,
    # not shape: without this a fixture-size change reads as a plan
    # regression (measurement fix, round 15, ADVICE r14 low). 5+ digit
    # integers are always such scalars here; real shape constants
    # (partition counts, window sizes, agg arities) are all smaller.
    p = re.sub(r"\b\d{5,}\b", "NNN", p)
    # Lambda-variable numbering (x_1, x_3, ...) is allocated from a
    # session-global counter, so the SAME plan prints different
    # variable names depending on what ran earlier in the session.
    p = re.sub(r"\bx_\d+", "x_n", p)
    return hashlib.sha256(p.encode()).hexdigest()[:12]


# Fixed contention sentinel: a cheap, plan-stable query timed right
# after warmup and again after the full suite. Interpretation:
# drift (= last/first) substantially > 1 means the machine got busier
# WHILE the suite ran, so suite timings are contention-inflated noise,
# not plan regressions — r4 lost exactly that signal. drift <= 1 is
# normal (progressive C2/JIT warmup keeps speeding the JVM up across
# the suite even with a dedicated sentinel warmup). load_avg gives the
# absolute machine-business context for cross-round comparison.
SENTINEL = "q_topk_orders"


def _time_once(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.session import get_spark

    spark = get_spark("bench")
    sf = _sf_from_dir(SF_DIR)
    load_start = round(os.getloadavg()[0], 2)

    # Warm the JVM + parquet footers with one cheap pass.
    REGISTRY["q_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    _time_once(REGISTRY[SENTINEL].fn, spark)  # JIT the sentinel's own codegen
    sentinel_first = min(
        _time_once(REGISTRY[SENTINEL].fn, spark) for _ in range(3)
    )

    # Persisted-index BUILDS, timed separately (round-13 verdict #3:
    # build/serve conflation). Each build runs once per session via
    # materialize_once; forcing them here means (a) the one-time build
    # cost is its own auditable number, and (b) every q_*_persisted
    # headline entry below times pure SERVE — a serve regression can
    # no longer hide under build amortization, and the build artifact
    # (a per-decade cost at scale) can't inflate the headline total.
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        _lsh_index_snap,
    )
    from docker_based_real_time_etl_project_spark.queries.similarity_q import (
        _ivf_index_snap,
    )
    from docker_based_real_time_etl_project_spark.queries.text import (
        _bm25_index_snap,
    )

    index_builds: dict[str, float] = {}
    for bname, bfn in (
        ("lsh_index_build", _lsh_index_snap),
        ("bm25_index_build", _bm25_index_snap),
        ("ivf_index_build", _ivf_index_snap),
    ):
        t0 = time.perf_counter()
        bfn(spark, SF_DIR)
        index_builds[bname] = round(time.perf_counter() - t0, 3)

    # best-of-3: single-run timings at this scale carry ~30% scheduler/JIT
    # noise; the min is the reproducible cost of the plan, and n=3 makes
    # a round-over-round regression provable instead of arguable
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    plans: dict[str, str] = {}
    # Contention guard: when all 3 samples of one query land in a busy
    # window (observed this round: min-of-3 still 3-6x the idle cost,
    # spread >> the ~30% scheduler/JIT noise), the min is contaminated
    # too. A wide spread is the tell; re-sample after a short settle so
    # at least one sample gets a clean window. Budgeted so a fully
    # contended run can't spiral.
    extra_budget = 8
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        while (
            extra_budget > 0
            # sub-half-second queries: spread is absolute scheduler
            # noise, not a contended window — min-of-3 is already fine
            and min(runs) > 0.5
            and (max(runs) - min(runs)) / min(runs) > 0.8
            and len(runs) < 5
        ):
            extra_budget -= 1
            time.sleep(2.0)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        # the min is the reproducible plan cost; the raw samples make a
        # contention-vs-regression call auditable without a re-run
        timings[name] = min(runs)
        samples[name] = runs
        plans[name] = _plan_fingerprint(fn(spark, SF_DIR))

    sentinel_last = min(
        _time_once(REGISTRY[SENTINEL].fn, spark) for _ in range(3)
    )
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "plan_fingerprints": plans,
        "index_builds": index_builds,
        "sentinel": {
            "query": SENTINEL,
            "first": sentinel_first,
            "last": sentinel_last,
            "drift": round(
                sentinel_last / sentinel_first, 2
            ) if sentinel_first > 0 else None,
        },
        "load_avg": {"start": load_start, "end": round(os.getloadavg()[0], 2)},
        "sf": sf,
    }
    # The driver's BENCH_r{N}.json artifact truncates long stdout
    # lines, which has cost the front of the times dict before
    # (round-6 verdict item 7). Persist the complete object to a
    # local file too so no artifact truncation can hide a query.
    out = Path(__file__).resolve().parent / (
        f"BENCH_local_{os.environ.get('SPARK_GRAFT_ROUND', 'latest')}.json"
    )
    out.write_text(json.dumps(payload, indent=1))
    # Print a COMPACT single line: the driver's BENCH_r{N}.json captures
    # only a ~2000-char tail of stdout, so the full payload (~9 KB with
    # per-query samples + plan fingerprints) starts mid-JSON and parses
    # as null (rounds 6-10). Everything the driver needs fits in a few
    # hundred bytes; the complete object lives in the file written above.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": slowest,
        "sentinel_drift": payload["sentinel"]["drift"],
        "index_builds": index_builds,
        "full_payload": out.name,
    }
    print(json.dumps(compact))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


if __name__ == "__main__":
    main()
