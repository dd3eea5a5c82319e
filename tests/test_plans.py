"""Plan-shape invariants (SURVEY.md section 4 / the 100 TB design):
pushdown reaches the scan, projections prune columns, dims broadcast,
top-k avoids full sorts. A regression here is a performance bug even
when results stay correct.
"""

from __future__ import annotations

from docker_based_real_time_etl_project_spark.plans import (
    count_exchanges,
    formatted_plan,
    join_strategies,
    scan_infos,
)
from docker_based_real_time_etl_project_spark.queries import REGISTRY


def _q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_projection_prunes_scan(spark, sf_dir):
    """q_project_cast touches 4 of lineitem's 11 columns -- the scan
    must read exactly those."""
    scans = scan_infos(_q("q_project_cast", spark, sf_dir))
    assert len(scans) == 1
    assert sorted(scans[0].read_columns) == [
        "l_extendedprice", "l_linenumber", "l_orderkey", "l_quantity",
    ]


def test_filters_push_to_scan(spark, sf_dir):
    scans = scan_infos(_q("q_pricing_summary", spark, sf_dir))
    pushed = " ".join(scans[0].pushed_filters)
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed
    scans = scan_infos(_q("q_filter_pred", spark, sf_dir))
    pushed = " ".join(scans[0].pushed_filters)
    for frag in ("GreaterThanOrEqual(l_quantity", "GreaterThan(l_discount", "l_shipdate"):
        assert frag in pushed, pushed


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    js = join_strategies(_q("q_join_star", spark, sf_dir))
    assert js.get("BroadcastHashJoin", 0) >= 3  # customer/nation/region at minimum
    assert js.get("CartesianProduct", 0) == 0


def test_pricing_summary_single_shuffle(spark, sf_dir):
    """Partial aggregation map-side: exactly one hash exchange (the
    final agg), nothing else."""
    assert count_exchanges(_q("q_pricing_summary", spark, sf_dir)) == 1


def test_topk_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), not a global sort."""
    plan = formatted_plan(_q("q_topk_orders", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert count_exchanges(_q("q_topk_orders", spark, sf_dir)) == 0


def test_minhash_shuffles_are_bounded(spark, sf_dir):
    """The near-dup pipeline may shuffle for signatures, banding, dedup
    and the verify joins -- but the count must stay small and fixed (no
    accidental cartesian / resort)."""
    df = _q("q_dedup_minhash", spark, sf_dir)
    assert join_strategies(df).get("CartesianProduct", 0) == 0
    assert count_exchanges(df) <= 8


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    """The as-of join must stay in its carry-forward form: ONE exchange
    on the key, ZERO physical join nodes (a join node appearing means
    someone rewrote it into the O(|L|*|R|) pair formulation) — and,
    since both sides are predicates of the one events stream, ONE scan
    (the same-source tagged form; the two-scan union form is pinned on
    q_join_asof_tol in test_round4_query_plan_shapes)."""
    df = _q("q_join_asof", spark, sf_dir)
    assert count_exchanges(df) == 1
    assert join_strategies(df) == {}
    assert len(scan_infos(df)) == 1


def test_rollup_cascade_one_shuffle_per_level(spark, sf_dir):
    """1m -> 1h -> 1d: exactly one exchange per cascade level. More
    would mean a level re-reads raw rows instead of the bars below."""
    assert count_exchanges(_q("q_rollup_cascade", spark, sf_dir)) == 3


def test_session_window_single_shuffle(spark, sf_dir):
    assert count_exchanges(_q("q_session_window", spark, sf_dir)) == 1


def test_cms_probes_broadcast(spark, sf_dir):
    """The 40-row probe table must broadcast against the sketch; the
    sketch itself stays bounded (D*W rows) so every other exchange
    carries counters, not tokens."""
    df = _q("q_heavy_hitters_cms", spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies.get("BroadcastHashJoin", 0) >= 1
    assert strategies.get("SortMergeJoin", 0) == 0
    assert count_exchanges(df) <= 4


def test_hash_sampling_is_scan_only(spark, sf_dir):
    """Deterministic sampling must stay a pure filter: zero exchanges.
    (df.sample()-style RNG sampling was rejected for reproducibility;
    this pins that the hash form also costs nothing extra.)"""
    assert count_exchanges(_q("q_sample_split", spark, sf_dir)) == 0


def test_salted_join_stays_on_shuffle_path(spark, sf_dir):
    """The salted join exists precisely for the no-broadcast case; the
    demo query must exercise the shuffle path (a broadcast would make
    the salt moot) and produce no nested-loop fallback."""
    strategies = join_strategies(_q("q_join_salted", spark, sf_dir))
    assert strategies.get("BroadcastNestedLoopJoin", 0) == 0
    assert strategies.get("CartesianProduct", 0) == 0
    assert (
        strategies.get("SortMergeJoin", 0) + strategies.get("ShuffledHashJoin", 0) >= 1
    )


def test_shipping_priority_topk_and_broadcast(spark, sf_dir):
    """TPC-H Q3 shape: the selective customer dim must broadcast and the
    LIMIT 10 must ride TakeOrderedAndProject, not a global sort."""
    df = _q("q_shipping_priority", spark, sf_dir)
    assert join_strategies(df).get("BroadcastHashJoin", 0) >= 1
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_supplier_volume_dims_all_broadcast(spark, sf_dir):
    """TPC-H Q5 shape: the region->nation->supplier snowflake collapses
    via broadcasts; the fact side must not shuffle for any join (its
    single exchange is the final aggregate)."""
    df = _q("q_local_supplier_volume", spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies.get("BroadcastHashJoin", 0) == 3
    assert strategies.get("SortMergeJoin", 0) == 0


def test_range_frame_and_pack_single_shuffle(spark, sf_dir):
    """Time-RANGE frames and bucket-parallel packing each cost exactly
    one exchange (their partition key)."""
    assert count_exchanges(_q("q_win_range_frame", spark, sf_dir)) == 1
    assert count_exchanges(_q("q_sequence_pack", spark, sf_dir)) == 1


def test_tpch_pack_filters_reach_scans(spark, sf_dir):
    """The relational3 pack's selectivity lives or dies on pushdown:
    Q7's date window and nation IN-list, Q9's part-name pattern and
    Q10's returnflag must all appear as scan-level PushedFilters --
    at 100 TB these are partition/row-group skips, not row filters."""
    pushed = {
        tuple(sorted(s.read_columns)): " ".join(s.pushed_filters)
        for s in scan_infos(_q("q_volume_shipping", spark, sf_dir))
    }
    allf = " ".join(pushed.values())
    assert "GreaterThanOrEqual(l_shipdate" in allf
    assert "In(n_name" in allf

    allf = " ".join(
        " ".join(s.pushed_filters)
        for s in scan_infos(_q("q_product_profit", spark, sf_dir))
    )
    assert "StringContains(p_name" in allf

    allf = " ".join(
        " ".join(s.pushed_filters)
        for s in scan_infos(_q("q_returned_items", spark, sf_dir))
    )
    assert "EqualTo(l_returnflag" in allf


def test_disjunctive_pred_pushes_or_of_ands(spark, sf_dir):
    """Q19 shape: Catalyst must push the full OR-of-ANDs residual to
    the lineitem scan (quantity bounds per brand arm) and extract the
    common p_size lower bound to the part scan -- the whole point of
    registering the disjunctive query."""
    by_cols = {
        tuple(sorted(s.read_columns)): " ".join(s.pushed_filters)
        for s in scan_infos(_q("q_disjunctive_pred", spark, sf_dir))
    }
    li = next(v for k, v in by_cols.items() if "l_quantity" in str(k))
    part = next(v for k, v in by_cols.items() if "p_size" in str(k))
    assert "Or(Or(And(" in li
    assert "GreaterThanOrEqual(p_size" in part
    assert count_exchanges(_q("q_disjunctive_pred", spark, sf_dir)) == 1


def test_tpch_pack_single_final_exchange(spark, sf_dir):
    """Broadcast-collapsed join trees: at test SF every dim broadcasts,
    so the only exchange in Q7/Q9/Q12/Q14 is the final aggregate; Q10
    additionally rides TakeOrderedAndProject for its LIMIT 20; Q18's
    HAVING semi-join adds exactly one more (the inner per-order agg)."""
    for name in ("q_volume_shipping", "q_product_profit",
                 "q_priority_lines", "q_promo_revenue"):
        df = _q(name, spark, sf_dir)
        assert count_exchanges(df) == 1, name
        assert join_strategies(df).get("CartesianProduct", 0) == 0, name
    q10 = _q("q_returned_items", spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(q10)
    assert count_exchanges(_q("q_large_orders", spark, sf_dir)) == 2


def test_quiet_customers_scalar_broadcast_and_anti(spark, sf_dir):
    """Q22 shape: the scalar average joins as a 1-row broadcast
    nested-loop (constant-size, never a shuffle) and nothing degrades
    to a cartesian over real data."""
    strategies = join_strategies(_q("q_quiet_customers", spark, sf_dir))
    assert strategies.get("BroadcastNestedLoopJoin", 0) == 1
    assert strategies.get("CartesianProduct", 0) == 0


def test_llmprep_shuffle_inventory(spark, sf_dir):
    """Hygiene pack plan budget: contamination since round 15 reads
    both gram sides from pruned 8-byte-hash artifacts
    (train_gram_hashes / eval_gram_hashes) — no text scan, no explode,
    no in-plan xxhash64 — and its ONE semantic exchange carries
    per-doc count partials into the final aggregate (the r14 plan
    instead repartitioned raw document text into a per-query explode;
    that exchange was repartition-origin, so the count was 0, but it
    moved text where this moves 24-byte partials and re-ran the gram
    hashing per query). Repetition is 2 exchanges (bigram count,
    per-doc max) with no join; the PII audit is scan + one summary
    exchange; ntile windows cost exactly their partition exchange."""
    cont = _q("q_contamination", spark, sf_dir)
    assert count_exchanges(cont) <= 1
    assert count_exchanges(cont, include_repartition=True) <= 1
    assert join_strategies(cont).get("CartesianProduct", 0) == 0
    rep = _q("q_repetition_ratio", spark, sf_dir)
    assert count_exchanges(rep) == 2 and join_strategies(rep) == {}
    pii = _q("q_pii_scrub", spark, sf_dir)
    assert count_exchanges(pii) == 1 and join_strategies(pii) == {}
    ntile = _q("q_win_ntile", spark, sf_dir)
    assert count_exchanges(ntile) == 1 and join_strategies(ntile) == {}


def test_skew_stress_join_aqe_splits_hot_partition(spark, sf_dir):
    """The 'AQE handles skew' claim, executed: under skew-scaled
    thresholds (test SFs are tiny) the hot partition of the skewed
    join must be split -- the FINAL adaptive plan shows the skew-split
    SortMergeJoin and a skewed AQEShuffleRead. Needs a multi-mapper
    shuffle (mappers=8): skew split re-reads map-output ranges, so a
    single-map-task stage -- the test-SF scan -- cannot split, which is
    precisely the constraint that vanishes at scale."""
    from docker_based_real_time_etl_project_spark.queries.relational import skew_stress_join

    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1B",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        df = skew_stress_join(spark, sf_dir, mappers=8)
        df.collect()  # materialize so the adaptive plan is final
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decorrelation_pack_plan_shapes(spark, sf_dir):
    """relational4: each correlated subquery must decorrelate into a
    bounded join plan -- never a per-row re-execution and never a
    cartesian over real data.

    - Q2 shape: scalar-equals-per-group-MAX becomes one aggregate
      joined back (1 exchange total at test SF, dims broadcast).
    - Q11 shape: the global-scalar threshold joins as a single-row
      broadcast nested-loop; the two scans aggregate independently.
    - Q13 shape: two cascaded hash aggregates, nothing else.
    - Q21 shape: the chained EXISTS / NOT EXISTS plan as left-semi and
      left-anti joins.
    - Q22 shape: the NOT EXISTS is a left-anti join and the high-value
      order predicate reaches the orders scan as a pushed filter.
    """
    q2 = _q("q_max_acctbal_supplier", spark, sf_dir)
    assert count_exchanges(q2) == 1
    assert join_strategies(q2).get("CartesianProduct", 0) == 0

    q11 = _q("q_important_parts", spark, sf_dir)
    s11 = join_strategies(q11)
    assert s11.get("BroadcastNestedLoopJoin", 0) == 1  # 1-row threshold
    assert s11.get("CartesianProduct", 0) == 0
    assert count_exchanges(q11) == 2

    q13 = _q("q_cust_order_dist", spark, sf_dir)
    assert count_exchanges(q13) == 2
    assert join_strategies(q13).get("CartesianProduct", 0) == 0

    q21 = formatted_plan(_q("q_waiting_suppliers", spark, sf_dir))
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    assert "CartesianProduct" not in q21

    q22 = _q("q_idle_customers", spark, sf_dir)
    plan22 = formatted_plan(q22)
    assert "LeftAnti" in plan22 and "CartesianProduct" not in plan22
    assert any(
        any("o_totalprice" in f for f in s.pushed_filters)
        for s in scan_infos(q22)
    )


def test_small_qty_brand_filter_pushes_before_join(spark, sf_dir):
    """Q17 shape: the brand predicate must prune the part scan BEFORE
    the join (at 100 TB this is the difference between joining 1/25th
    of part and all of it); the whole decorrelated plan costs at most
    two exchanges."""
    df = _q("q_small_qty_revenue", spark, sf_dir)
    assert any(
        any("p_brand" in f for f in s.pushed_filters)
        for s in scan_infos(df)
    )
    assert count_exchanges(df) <= 2
    assert join_strategies(df).get("CartesianProduct", 0) == 0


def test_lateral_topn_rewrites_to_window(spark, sf_dir):
    """The LATERAL correlated LIMIT must decorrelate into a ranked
    window over the joined right side (one shuffle), not N sorted
    scans or a nested loop."""
    df = _q("q_lateral_topn", spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan
    assert count_exchanges(df) == 1
    strategies = join_strategies(df)
    assert strategies.get("CartesianProduct", 0) == 0
    assert strategies.get("BroadcastNestedLoopJoin", 0) == 0


def test_chunk_dedup_no_join_two_exchanges(spark, sf_dir):
    """ExactSubstr-shape chunk dedup must be window + aggregate only:
    one shuffle by chunk hash, one by doc for reassembly — never a
    doc-against-doc join; the scan reads just (doc_id, text)."""
    df = _q("q_chunk_dedup", spark, sf_dir)
    assert join_strategies(df) == {}
    assert count_exchanges(df) == 2
    scans = scan_infos(df)
    assert len(scans) == 1
    assert sorted(scans[0].read_columns) == ["doc_id", "text"]


def test_gap_fill_single_scan_no_join(spark, sf_dir):
    """Gap-fill must not re-scan events to look bars back up: the
    bucket->bar map rides the per-key row, so the plan is one scan,
    zero joins, two exchanges (bars agg + per-key fold; the fill
    window re-uses the per-key partitioning)."""
    df = _q("q_gap_fill", spark, sf_dir)
    assert join_strategies(df) == {}
    assert count_exchanges(df) == 2
    assert len(scan_infos(df)) == 1


def test_tpch_completion_pack_plan_shapes(spark, sf_dir):
    """relational5: Q4's rewritten EXISTS plans as a left-semi join;
    Q16's NOT IN plans as a broadcast LeftAnti (null-aware semantics);
    Q8's 8-way tree broadcasts every dim (one fact shuffle + the year
    agg); Q15's twice-referenced CTE and scalar MAX stay at three
    exchanges; Q20's nested IN is a semi join. No shape degrades to a
    cartesian."""
    q4 = formatted_plan(_q("q_priority_waiting", spark, sf_dir))
    assert "LeftSemi" in q4 and "CartesianProduct" not in q4

    q8 = _q("q_market_share", spark, sf_dir)
    s8 = join_strategies(q8)
    assert s8.get("BroadcastHashJoin", 0) >= 5
    assert s8.get("CartesianProduct", 0) == 0
    assert count_exchanges(q8) <= 3

    q15 = _q("q_top_supplier", spark, sf_dir)
    assert count_exchanges(q15) <= 3
    assert join_strategies(q15).get("CartesianProduct", 0) == 0

    q16 = formatted_plan(_q("q_supplier_cnt", spark, sf_dir))
    assert "LeftAnti" in q16 and "CartesianProduct" not in q16

    q20 = formatted_plan(_q("q_excess_shippers", spark, sf_dir))
    assert "LeftSemi" in q20 and "CartesianProduct" not in q20


def test_join_full_and_cross_plan_shapes(spark, sf_dir):
    """Full outer pre-aggregates both sides (one row per customer per
    side crosses the wire) and must stay a shuffle join — full outer
    cannot broadcast. The deliberate nation x region cross join must
    plan as a broadcast nested-loop with ZERO exchanges (both sides
    constant-bounded); any other cartesian in the surface is a
    failure."""
    full = _q("q_join_full", spark, sf_dir)
    sfull = join_strategies(full)
    assert "SortMergeJoin" in sfull or "ShuffledHashJoin" in sfull
    assert "BroadcastHashJoin" not in sfull
    assert count_exchanges(full) == 2

    cross = _q("q_join_cross", spark, sf_dir)
    assert join_strategies(cross) == {"BroadcastNestedLoopJoin": 1}
    assert count_exchanges(cross) == 0


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark, sf_dir):
    """Spark's runtime row-level filter must inject a bloom filter on
    the fact side of a selective dim join (the 100 TB shuffle-slimming
    path: fact rows that cannot match are dropped at the scan, before
    the exchange). Thresholds are production-scale gates, so the test
    lowers them to fire at testdata size; the assertion is that the
    engine's query shapes remain injection-ELIGIBLE (plain
    scan->filter->join patterns) — a refactor that breaks eligibility
    (e.g. an unconditional repartition wrapper on every read) shows up
    here as a missing might_contain."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"

        # the engine's OWN read path must stay eligible too — the session
        # re-chunk replaced the repartition wrapper that used to break
        # the scan->filter->join pattern the injection rule requires
        from docker_based_real_time_etl_project_spark.sources.parquet import load_table

        l2 = load_table(spark, sf_dir, "lineitem")
        o2 = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j2 = (
            l2.join(o2, l2.l_orderkey == o2.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan2 = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan2, "load_table path lost injection eligibility"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_round4_query_plan_shapes(spark, sf_dir):
    """Pin the scale claims of the round-4 surface as invariants:

    - q_funnel: three funnel stages share ONE user_id exchange (stacked
      windows collapse), one scan, zero joins — the self-join-free
      funnel. Second exchange is the final global agg.
    - q_gap_fill_interp: one scan, two exchanges — the spine is built
      from per-key scalars + map lookup, never a second fact scan, and
      the locf/interp frames reuse the spine's partitioning.
    - q_twap: one exchange total — the LEAD window and the final agg
      share the event_type partitioning.
    - q_join_asof_tol: ONE exchange and NO join node — the tolerance
      bound must stay a post-window predicate on the carried tuple, not
      become a join.
    - q_cdc_agg_incremental: one scan (the changelog is folded to
      deltas in-flight, no state-side rescan).
    """
    expect = {
        "q_funnel": (2, 1),
        "q_cohort_retention": (2, 1),
        "q_histogram": (2, 1),
        "q_gap_fill_interp": (2, 1),
        "q_twap": (1, 1),
        "q_cdc_agg_incremental": (2, 1),
        # user window -> pair agg -> tiny normalizing window
        "q_transition_matrix": (3, 1),
        # stats window and row filter share the key partitioning
        "q_outliers_zscore": (1, 1),
    }
    for name, (n_ex, n_scan) in expect.items():
        df = _q(name, spark, sf_dir)
        assert count_exchanges(df) <= n_ex, name
        assert len(scan_infos(df)) == n_scan, name
        assert join_strategies(df) == {}, f"{name}: unexpected join"

    tol = _q("q_join_asof_tol", spark, sf_dir)
    assert count_exchanges(tol) == 1
    assert join_strategies(tol) == {}, "asof tolerance must not plan a join"


def test_postings_joins_hash_key_not_gram_text(spark, sf_dir):
    """The exact postings joins must join and shuffle on
    xxhash64(gram) — 8 bytes — never the gram string, and the hot-gram
    df guard must not add a shuffle of its own: its window
    partitioning is the join's partitioning, so at runtime AQE reuses
    one exchange for both join sides (plus, no plan regrows a
    cartesian). Since round 7 the 3-gram postings join lives in the
    shared gram_pair_candidates artifact BUILD (one execution serves
    q_ngram_jaccard / q_containment / q_split_leakage / the cluster
    queries), so the join-shape pins run on the build plan; the
    consumers are pinned to column-pruned artifact reads below.
    q_contamination's 5-gram semi-join is unshared and keeps its
    direct pin."""
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        gram_pairs_build_df,
    )

    build = gram_pairs_build_df(spark, sf_dir)
    plan = formatted_plan(build)
    assert "xxhash64" in plan
    assert join_strategies(build).get("CartesianProduct", 0) == 0
    assert count_exchanges(build) <= 3

    # round 15: q_contamination's gram hashing moved into the shared
    # train/eval artifact builds — the query plan itself reads the two
    # pruned hash tables (no text column, no in-plan xxhash64) and
    # never grows a cartesian
    df = _q("q_contamination", spark, sf_dir)
    scans = scan_infos(df)
    assert all("text" not in s.read_columns for s in scans), scans
    assert any(sorted(s.read_columns) == ["doc_id", "gh"] for s in scans), scans
    assert join_strategies(df).get("CartesianProduct", 0) == 0
    assert count_exchanges(df) <= 3

    # consumers: no postings re-execution — a single pruned read of the
    # 5-integer-column artifact (plus, for split_leakage, the 2-column
    # ticket attaches), never the documents text
    for name, extra_scans in (("q_ngram_jaccard", 0), ("q_containment", 0),
                              ("q_split_leakage", 2)):
        cdf = _q(name, spark, sf_dir)
        scans = scan_infos(cdf)
        pair_scans = [s for s in scans if "shared" in s.read_columns]
        assert len(pair_scans) == 1 and len(scans) == 1 + extra_scans, name
        assert join_strategies(cdf).get("CartesianProduct", 0) == 0, name

    # the at-scale (no-broadcast) path: both postings sides of the
    # BUILD come from ONE materialized exchange
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = gram_pairs_build_df(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "isFinalPlan=true" in plan
        assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_round5_llmprep_plan_shapes(spark, sf_dir):
    """Scale pins for the round-5 LLM-prep additions:

    - q_domain_cap: ONE exchange (the source window), no joins — a
      per-source top-N must never become a global sort or a self-join.
    - q_contamination_span: the flag join + islands window + two
      aggregates stay within 5 exchanges, all on 8-byte or doc_id
      keys; no cartesian; the only scan is documents.
    - q_split_leakage: postings join (hash-keyed) + two ticket
      attaches; no cartesian anywhere.
    """
    cap = _q("q_domain_cap", spark, sf_dir)
    assert count_exchanges(cap) == 1
    assert join_strategies(cap) == {}
    assert len(scan_infos(cap)) == 1
    # the rank<=3 filter must push INTO the window as a per-partition
    # top-k heap (WindowGroupLimit) — map-side pre-prune BEFORE the
    # exchange, so at 100 TB the shuffle carries <=3 rows per
    # (source, mapper), not the corpus
    assert "WindowGroupLimit" in formatted_plan(cap)

    span = _q("q_contamination_span", spark, sf_dir)
    assert count_exchanges(span) <= 5
    assert join_strategies(span).get("CartesianProduct", 0) == 0
    assert "xxhash64" in formatted_plan(span)

    leak = _q("q_split_leakage", spark, sf_dir)
    assert join_strategies(leak).get("CartesianProduct", 0) == 0
    # the postings join moved into the shared gram_pair_candidates
    # artifact build (its xxhash64 key is pinned by
    # test_postings_joins_hash_key_not_gram_text); the final plan here
    # is the artifact read + two md5 ticket attaches
    assert "md5" in formatted_plan(leak)


def test_round6_corpus_ops_plan_shapes(spark, sf_dir):
    """Scale pins for the round-6 corpus additions:

    - q_corpus_datacard: ONE corpus scan feeding one hash aggregation
      (the two distinct-aggregates ride Expand, not extra scans); no
      joins — the per-source report must stay a single pass.
    - q_corpus_drift: ZERO table scans in the final plan — the 21-row
      bucket histogram is checkpointed after its single build pass, so
      totals, per-bucket scores, and the summary row all derive from
      the checkpoint, never from re-reading the corpus; every join is
      a broadcast of the 1-row totals.
    - q_dedup_keep_best: no cartesian anywhere; the postings join keys
      on xxhash64(gram), and the quality attach + survivor window add
      ordinary hash exchanges on doc/cluster keys only.
    """
    card = _q("q_corpus_datacard", spark, sf_dir)
    assert len(scan_infos(card)) == 1
    assert join_strategies(card) == {}
    p = formatted_plan(card)
    assert "Expand" in p  # two count-distincts in ONE aggregation pass

    drift = _q("q_corpus_drift", spark, sf_dir)
    assert len(scan_infos(drift)) == 0
    js = join_strategies(drift)
    assert js.get("CartesianProduct", 0) == 0
    assert all(k.startswith("Broadcast") for k in js), js

    keep = _q("q_dedup_keep_best", spark, sf_dir)
    assert join_strategies(keep).get("CartesianProduct", 0) == 0
    # the pair-generation + components fixpoint lives in the SHARED
    # session-materialized cluster artifact (round 7 — its postings
    # join is pinned by test_postings_joins_hash_key_not_gram_text at
    # build time), so the FINAL plan holds exactly two scans: the
    # 2-column cluster artifact and the quality attach (doc_id, text)
    # — column pruning must hold on both
    scans = sorted(tuple(s.read_columns) for s in scan_infos(keep))
    assert scans == [("doc_id", "cluster_rep"), ("doc_id", "text")]
    assert "Window" in formatted_plan(keep)


def test_token_budget_no_global_window(spark, sf_dir):
    """q_token_budget's running total must be the two-phase scan, never
    a global Window.orderBy(): the one Window in the plan is
    partitioned (its exchange hashes on the range-partition id), and
    the only SinglePartition exchange is the 1-row budget aggregate
    (which moves partial-agg rows, not the corpus)."""
    import re

    df = _q("q_token_budget", spark, sf_dir)
    p = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Window", p)) == 1
    assert "hashpartitioning(_pid" in p
    # round 14: the budget is a literal from the scan's driver offset
    # pass — NO SinglePartition exchange remains anywhere in the plan
    # (the old 1-row budget aggregate re-scanned the corpus lineage)
    assert p.count("SinglePartition") == 0


def test_bucketed_join_query_plan(spark, sf_dir):
    """q_join_bucketed's physical plan must prove the co-located
    layout paid off: both scans read Bucketed: true, the SortMergeJoin
    takes them with NO exchange on either input, and the single
    Exchange in the whole plan is the 5-row priority aggregation after
    the join — i.e. the fact-fact shuffle, the dominant cost at scale,
    is gone."""
    df = _q("q_join_bucketed", spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p
    assert p.count("Bucketed: true") == 2
    assert p.count("Exchange") == 1
    assert "Exchange hashpartitioning(o_orderpriority" in p


def test_microstructure_single_exchange(spark, sf_dir):
    """Every round-8 microstructure batch operator is ONE hash exchange
    on event_type: the lag / carry-forward / prefix-cumsum windows all
    share the key sort (Catalyst reuses it) and the final group-by's
    keys contain event_type, so ClusteredDistribution is already
    satisfied — no second shuffle, no SinglePartition anywhere."""
    for name in (
        "q_tick_imbalance",
        "q_volume_bars",
        "q_cusum",
        "q_roll_spread",
        "q_kyle_lambda",
        "q_autocorr",  # round 9: three LEADs share the one sort exchange
        "q_max_drawdown",  # round 9: running max + agg on the window key
        "q_realized_vol",  # round 9: per-(key,day) lag + same-key agg
    ):
        df = _q(name, spark, sf_dir)
        assert count_exchanges(df) == 1, name
        assert "SinglePartition" not in formatted_plan(df), name


def test_weighted_sample_is_pure_filter(spark, sf_dir):
    """q_sample_weighted must stay a per-row scan-side FILTER: zero
    exchanges, zero UDFs — the whole point of hash-ticket sampling is
    that membership costs nothing but the scan."""
    df = _q("q_sample_weighted", spark, sf_dir)
    assert count_exchanges(df) == 0
    p = formatted_plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bloom_point_lookup_pushes_in_filter(spark, sf_dir):
    """q_lake_point_lookup's scan must compose the full skipping stack:
    the manifest+bloom already pruned FILES, and the residual IN
    predicate still reaches the parquet scan (row-group skipping inside
    kept files) with columns pruned to exactly the projection."""
    df = _q("q_lake_point_lookup", spark, sf_dir)
    scans = scan_infos(df)
    assert scans, "expected a parquet scan"
    allf = " ".join(" ".join(s.pushed_filters) for s in scans)
    assert "In(o_orderkey" in allf
    for s in scans:
        assert sorted(s.read_columns) == ["o_orderkey", "o_totalprice"]


def test_attribution_single_window_pass(spark, sf_dir):
    """Both attribution models ride ONE window exchange on user_id
    (first_value + ignore-nulls last_value share the partitioning) and
    ONE aggregation exchange — the explode-unpivot keeps it to a
    single scan; a union of per-model groupBys would pay the window
    twice."""
    df = _q("q_sessionize_attribution", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == {}


def test_retention_curve_no_denominator_join(spark, sf_dir):
    """The cohort size comes from a window over the (tiny) per-cohort
    aggregate, not a self-join: min-ts window + distinct + count agg +
    constant-width window = 3 exchanges, zero joins."""
    df = _q("q_retention_curve", spark, sf_dir)
    assert count_exchanges(df) == 3
    assert join_strategies(df) == {}


def test_span_corpus_single_explode(spark, sf_dir):
    """The corpus-span dedup derives its gram explode ONCE (the
    round-10 sf10 spot found the first wiring re-exploded in five
    branches — 202 s at sf10, 57 s single-pass): one Generate node,
    two semantic exchanges (gh count window + doc islands window —
    both grouping levels reuse the doc partitioning; the
    compact-source spread repartition is input plumbing)."""
    df = _q("q_dedup_span_corpus", spark, sf_dir)
    plan = formatted_plan(df)
    # formatted mode shows each node twice (tree + detail header)
    assert plan.count("Generate") == 2
    assert count_exchanges(df) == 2
    assert count_exchanges(df, include_repartition=True) == 3


def test_interval_overlap_join_is_equi_on_bucket(spark, sf_dir):
    """The pure theta (overlap) join must NOT plan as a cartesian or
    broadcast-nested-loop: bucketization turns it into a hash equi-join
    on the bucket key with the exact overlap predicate as residual."""
    df = _q("q_join_interval_overlap", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0
    assert js.get("BroadcastHashJoin", 0) + js.get("SortMergeJoin", 0) + js.get(
        "ShuffledHashJoin", 0
    ) >= 1


def test_ivm_minmax_recompute_is_dirty_group_pruned(spark, sf_dir):
    """The MIN/MAX maintenance plan must semi/anti-join the broadcast
    dirty-group set (never rescan-all): two broadcast joins, zero
    cartesians."""
    df = _q("q_ivm_minmax", spark, sf_dir)
    plan = formatted_plan(df)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert js.get("BroadcastHashJoin", 0) >= 2


def test_bm25_is_postings_join_never_doc_x_query(spark, sf_dir):
    """BM25 must plan as a broadcast postings join: the query vocab
    (and the query-pruned df) broadcast into the (doc, word) postings
    -- never a doc x query cartesian, never a full-vocab shuffle join.
    The only cross is the broadcast single-row stats attach."""
    df = _q("q_bm25_topk", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    # two single-row attaches: n_docs x total_tokens inside stats, and
    # stats onto the postings -- both broadcast a 1-row side
    assert js.get("BroadcastNestedLoopJoin", 0) <= 2
    assert js.get("BroadcastHashJoin", 0) >= 2  # qterms->df, qstats->postings


def test_pagerank_topk_never_global_sort(spark, sf_dir):
    """The top-100 extraction must plan as TakeOrderedAndProject over
    the checkpointed final ranks — never a global sort — and the
    per-iteration join lineage is truncated (no cartesian anywhere)."""
    df = _q("q_pagerank", spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_fusion_plan(spark, sf_dir):
    """Hybrid fusion: the sparse arm keeps the BM25 broadcast postings
    shape, the dense arm's only cross is the broadcast 5-row query
    side (the exact-baseline contract), fusion is a full-outer join of
    two bounded lists — never an unbroadcast cartesian."""
    df = _q("q_hybrid_rrf", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    # probe-side cross + two 1-row stats attaches, all broadcast
    assert js.get("BroadcastNestedLoopJoin", 0) <= 3
    assert js.get("BroadcastHashJoin", 0) >= 2


def test_itemset_pairs_expand_per_basket(spark, sf_dir):
    """Pair candidates must come from the per-basket equi-join on the
    order key (bounded by each basket's item count) — never a global
    item x item cross; supports/lift attach by broadcast."""
    df = _q("q_itemset_pairs", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) <= 1  # 1-row n_orders attach


def test_fuzzy_join_blocks_never_all_pairs(spark, sf_dir):
    """The ED-1 join must ride the (position, deleted-variant) block
    equi-join with levenshtein as residual — an all-pairs plan shows
    up as a cartesian/BNLJ and is the O(n^2) the blocking exists to
    avoid."""
    df = _q("q_fuzzy_join", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0


def test_fuzzy_join_xlen_blocks_never_all_pairs(spark, sf_dir):
    """The cross-length ED<=1 and ED<=2 joins must ride the deletion-
    neighborhood-member block equi-join with levenshtein as residual —
    never a cartesian/BNLJ all-pairs plan — at both depths."""
    for name in ("q_fuzzy_join_ed1_xlen", "q_fuzzy_join_ed2"):
        df = _q(name, spark, sf_dir)
        js = join_strategies(df)
        assert js.get("CartesianProduct", 0) == 0, name
        assert js.get("BroadcastNestedLoopJoin", 0) == 0, name


def test_bm25_persisted_search_is_postings_join(spark, sf_dir):
    """The persisted-index search keeps the broadcast postings shape:
    query vocab and query-derived df broadcast into the bucket-pruned
    postings read — no cartesian, no 1-row cross attach (stats come
    from the manifest, not a plan node)."""
    df = _q("q_bm25_index_persisted", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0
    assert js.get("BroadcastHashJoin", 0) >= 2


def test_pagerank_weighted_topk_never_global_sort(spark, sf_dir):
    """Both weighted PageRank variants keep the global form's plan
    contract: TakeOrderedAndProject top-100 over checkpointed final
    ranks, no cartesian anywhere in the per-iteration lineage."""
    for name in ("q_pagerank_weighted", "q_pagerank_ppr_weighted"):
        df = _q(name, spark, sf_dir)
        plan = formatted_plan(df)
        assert "TakeOrdered" in plan, name
        assert "CartesianProduct" not in plan, name


def test_label_propagation_no_global_sort_no_cartesian(spark, sf_dir):
    """LPA keeps the Pregel plan contract: per-round argmax via
    max(struct) hash aggregation (no full-node-set window), top-100
    via TakeOrderedAndProject, no cartesian in the lineage."""
    df = _q("q_label_propagation", spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan


def test_phrase_search_is_postings_adjacency_join(spark, sf_dir):
    """Phrase search must filter positional postings to the phrases'
    words via broadcast BEFORE the adjacency equi-join on (doc_id,
    position) — never a cartesian/BNLJ, never a corpus scan per
    phrase."""
    df = _q("q_phrase_search", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0
    assert js.get("BroadcastHashJoin", 0) >= 2  # word filter + phrase attach


def test_bfs_levels_no_cartesian(spark, sf_dir):
    """BFS keeps the Pregel shape: per-round keyed joins only, no
    cartesian anywhere in the unrolled lineage."""
    df = _q("q_bfs_levels", spark, sf_dir)
    assert "CartesianProduct" not in formatted_plan(df)


def test_fuzzy_clusters_blocks_never_all_pairs(spark, sf_dir):
    """The entity-resolution pipeline's pair generation must stay a
    deletion-neighborhood block equi-join (no cartesian/BNLJ) all the
    way through the components fixpoint and survivor attach."""
    df = _q("q_fuzzy_clusters", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0


def test_kmeans_assignment_is_broadcast_k(spark, sf_dir):
    """Lloyd's assignment must broadcast the K-row centroid side into
    the vector table (the ivf_train shape) — the only BNLJ is that
    bounded broadcast cross, never an unbroadcast cartesian."""
    df = _q("q_kmeans_lloyd", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    # The final lineage is checkpoint-truncated, so the broadcast-K
    # shape must be pinned on the per-round assignment subplan itself:
    # exactly one BroadcastNestedLoopJoin (the bounded K-row cross),
    # zero cartesian — a regression to an unbroadcast K-join would
    # otherwise pass the truncated-plan cartesian check alone.
    from pyspark.sql import functions as F

    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _KM_K, _KM_Q, _km_assign,
    )
    from docker_based_real_time_etl_project_spark.queries.registry import table

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(ROUND(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))"
        ).alias("v"),
    )
    cents = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    rjs = join_strategies(_km_assign(e, cents))
    assert rjs.get("CartesianProduct", 0) == 0
    assert rjs.get("BroadcastNestedLoopJoin", 0) == 1, rjs


def test_semdedup_pairs_never_all_pairs(spark, sf_dir):
    """SemDeDup's candidate generation must stay a (cluster,
    sub-bucket) equi-self-join — no cartesian, no BNLJ anywhere in the
    pair plan (the k-means broadcast-K BNLJ is checkpoint-truncated
    upstream; the surviving plan is the bucketed join + residual)."""
    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _sd_corpus, _sd_pairs,
    )

    corpus = _sd_corpus(spark, sf_dir).localCheckpoint(eager=True)
    js = join_strategies(_sd_pairs(corpus))
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0


def test_semdedup_subsplit_bounds_bucket_size(spark, sf_dir):
    """The mega-cluster guard must actually engage and actually bound:
    at least one cluster exceeds _SD_CAP members and gets sub-split
    (n_sub > 1), and every (cid, sb) join bucket holds at most
    _SD_CAP rows EXACTLY — the round-14 distance-rank banding cuts
    bands of cap-many members, so unlike the old id-mod split there
    is no 2x slack. This pins the property that a skewed clustering
    pays more BUCKETS, never a bigger bucket."""
    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _SD_CAP, _sd_corpus, _sd_sub,
    )

    corpus = _sd_corpus(spark, sf_dir).localCheckpoint(eager=True)
    sub = _sd_sub(corpus)
    buckets = sub.groupBy("cid", "sb").count().collect()
    n_subs_per_cid = {}
    for r in buckets:
        assert r["count"] <= _SD_CAP, (r["cid"], r["sb"], r["count"])
        n_subs_per_cid[r["cid"]] = max(
            n_subs_per_cid.get(r["cid"], 0), r["sb"] + 1
        )
    assert any(n > 1 for n in n_subs_per_cid.values()), n_subs_per_cid


def test_semdedup_text_pairs_never_all_pairs(spark, sf_dir):
    """The text variant's candidate generation rides the same
    (cluster, sub-bucket) equi-self-join as q_dedup_semantic — no
    cartesian, no BNLJ in the pair plan. The feature-hash grid's
    bounded broadcast-16 cross lives upstream of the corpus
    checkpoint, so the pair plan must not show it either."""
    from pyspark.sql import functions as F

    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _sd_pairs, _sd_text_corpus,
    )

    # the query's own corpus construction — the SHARED helper, so the
    # pinned plan can never drift from what the query runs (ADVICE r13)
    corpus = _sd_text_corpus(spark, sf_dir).localCheckpoint(eager=True)
    js = join_strategies(_sd_pairs(corpus))
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0


def test_corpus_shard_no_global_window(spark, sf_dir):
    """q_corpus_shard's running offset rides the two-phase distributed
    scan (the q_token_budget discipline): the one Window is
    partitioned on the range-partition id, and the only
    SinglePartition exchange is the 1-row total aggregate."""
    import re

    df = _q("q_corpus_shard", spark, sf_dir)
    p = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Window", p)) == 1
    assert "hashpartitioning(_pid" in p
    # round 14: the shard total is a literal from the scan's driver
    # offset pass — no SinglePartition total aggregate remains
    assert p.count("SinglePartition") == 0


def test_bpe_unseen_apply_is_bounded(spark, sf_dir):
    """q_bpe_encode_unseen's merge APPLY must be one expression fold,
    not a per-merge job chain: the trained merge table reads from its
    materialized parquet (training truncated out), the only non-equi
    join is the 1-row broadcast merge-array cross, and the apply plan
    holds a bounded exchange count (word rollup + array agg + token
    rollup) that would not change if the merge list were 10k rows."""
    df = _q("q_bpe_encode_unseen", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) <= 1
    assert count_exchanges(df) <= 4


def test_corpus_pipeline_full_plan_shape(spark, sf_dir):
    """The round-14 capstone's stated shuffle budget, pinned: the
    composed 8-stage plan contains NO cartesian and NO BNLJ — the
    k-means broadcast-K assignment and the LSH banding live behind
    the persisted pair artifacts (parquet reads), so the pipeline
    plan itself is entirely equi-joins, windows, and hash
    aggregates. The only global single-partition window is the
    temperature stage's rate table (a per-source aggregate, <= a few
    rows)."""
    df = _q("q_corpus_pipeline_full", spark, sf_dir)
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    # round 14: the shard total is a literal from the prefix scan's
    # driver offset pass, so NO BNLJ remains — the plan is entirely
    # equi-joins, windows, and hash aggregates
    assert js.get("BroadcastNestedLoopJoin", 0) == 0, js


def test_corpus_pipeline_full_shares_pair_artifacts(spark, sf_dir):
    """q_corpus_pipeline_full consumes the SAME persisted pair
    artifacts as the standalone dedup queries — the fit/band/pair
    chains build once per (sf_dir, fingerprint) per session, never
    once per consumer (the sharing contract the round-13 verdict asks
    the capstone to honor)."""
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        BUILD_COUNTS,
    )

    REGISTRY["q_corpus_pipeline_full"].fn(spark, sf_dir).collect()
    REGISTRY["q_dedup_semantic_text"].fn(spark, sf_dir).collect()
    REGISTRY["q_dedup_minhash_pairs"].fn(spark, sf_dir).collect()
    for purpose in ("sd_text_pairs", "minhash_pairs", "dsir_cost"):
        counts = {
            k: v for k, v in BUILD_COUNTS.items()
            if k[0] == purpose and k[1] == sf_dir
        }
        assert counts, f"no build recorded for {purpose}"
        assert all(v == 1 for v in counts.values()), (purpose, counts)
