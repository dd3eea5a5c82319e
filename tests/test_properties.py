"""Property-based invariants (SURVEY.md 5.2 item 6) for the transform
and sketch operators, on hypothesis-generated literal frames: schema
and row-count preservation, null tolerance, sketch determinism and
bounds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators import transforms as tr
from docker_based_real_time_etl_project_spark.operators.dedup import (
    exact_jaccard,
    hamming64,
    shingles,
    simhash64,
)

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

num_str = st.from_regex(r"[0-9]{1,6}\.[0-9]{1,8}", fullmatch=True)
word = st.from_regex(r"[a-z]{1,8}", fullmatch=True)


@_slow
@given(rows=st.lists(st.tuples(num_str, num_str), min_size=1, max_size=20))
def test_rename_cast_preserve_rows(spark, rows):
    df = spark.createDataFrame(rows, "price string, qty string")
    out = tr.cast_columns(
        tr.rename(df, {"qty": "quantity"}), {"price": "double", "quantity": "double"}
    )
    assert out.columns == ["price", "quantity"]
    assert out.count() == len(rows)
    got = out.collect()
    for (ps, qs), r in zip(rows, got):
        assert abs(r.price - float(ps)) < 1e-9
        assert abs(r.quantity - float(qs)) < 1e-9


@_slow
@given(
    bids=st.lists(st.tuples(num_str, num_str), min_size=0, max_size=7),
    asks=st.lists(st.tuples(num_str, num_str), min_size=0, max_size=7),
)
def test_zip_positional_ragged(spark, bids, asks):
    """Pairing yields max(len) rows; the shorter side pads with null
    (the reference's short-book tolerance, etl.py:126-127)."""
    df = spark.createDataFrame(
        [([list(b) for b in bids], [list(a) for a in asks])],
        "bids array<array<string>>, asks array<array<string>>",
    )
    out = tr.zip_positional(df, "bids", "asks").collect()
    assert len(out) == max(len(bids), len(asks))
    for i, r in enumerate(out):
        assert (list(r.bid) if r.bid is not None else None) == (
            list(bids[i]) if i < len(bids) else None
        )


@_slow
@given(toks=st.lists(word, min_size=0, max_size=30))
def test_shingle_count(spark, toks):
    """k-shingle count = max(0, n_tokens - k + 1)."""
    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    n = df.select(F.size(shingles("text", 3)).alias("n")).collect()[0].n
    assert n == max(0, len(toks) - 2)


@_slow
@given(toks=st.lists(word, min_size=1, max_size=30))
def test_simhash_identical_and_bounds(spark, toks):
    """Identical texts simhash identically (hamming 0); hash fits 63
    bits non-negative."""
    text = " ".join(toks)
    df = spark.createDataFrame([(text, text)], "a string, b string")
    r = df.select(
        simhash64("a").alias("ha"),
        simhash64("b").alias("hb"),
        hamming64(simhash64("a"), simhash64("b")).alias("d"),
    ).collect()[0]
    assert r.ha == r.hb and r.d == 0
    assert 0 <= r.ha < (1 << 63)


@_slow
@given(
    a=st.lists(word, min_size=1, max_size=15),
    b=st.lists(word, min_size=1, max_size=15),
)
def test_jaccard_bounds_and_symmetry(spark, a, b):
    df = spark.createDataFrame(
        [(" ".join(a), " ".join(b))], "ta string, tb string"
    )
    ga = F.array_distinct(F.split("ta", " "))
    gb = F.array_distinct(F.split("tb", " "))
    r = df.select(
        exact_jaccard(ga, gb).alias("ab"), exact_jaccard(gb, ga).alias("ba")
    ).collect()[0]
    assert 0.0 <= r.ab <= 1.0
    assert abs(r.ab - r.ba) < 1e-12
    if set(a) == set(b):
        assert r.ab == 1.0


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    """The sketch's statistical contract: signature-agreement fraction
    estimates true Jaccard with stderr ~ 1/sqrt(64) ~ 0.125; mean |err|
    over real document pairs must stay well inside that."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures_agg,
    )
    from docker_based_real_time_etl_project_spark.sources.parquet import load_table

    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").limit(120)
    sh = d.select(
        F.col("doc_id").alias("_id"),
        F.array_distinct(shingles("text", 3)).alias("_sh"),
    ).withColumn("_rank", F.row_number().over(Window.orderBy("_id")))
    sigs = minhash_signatures_agg(sh.drop("_rank"), "_id", "_sh", 64)
    both = sh.join(sigs, "_id")
    a = both.select(F.col("_rank").alias("ia"), F.col("_sh").alias("sa"), F.col("sig").alias("ga"))
    b = both.select(F.col("_rank").alias("ib"), F.col("_sh").alias("sb"), F.col("sig").alias("gb"))
    # pair rank-adjacent docs: mix of similar (near-dup seeds) and unrelated
    pairs = a.join(b, a.ia + 1 == b.ib).select(
        exact_jaccard(F.col("sa"), F.col("sb")).alias("exact"),
        minhash_jaccard_estimate(F.col("ga"), F.col("gb")).alias("est"),
    )
    rows = pairs.collect()
    assert len(rows) > 50
    mae = sum(abs(r.exact - r.est) for r in rows) / len(rows)
    assert mae < 0.08, f"minhash estimator degraded: MAE={mae:.4f}"
    # and it NEVER misses a true near-duplicate badly: high-exact pairs
    # must estimate high
    for r in rows:
        if r.exact >= 0.6:
            assert r.est >= 0.35, (r.exact, r.est)


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=100),  # ts (small int domain forces ties)
            st.integers(min_value=0, max_value=1),    # side: 0=quote, 1=trade
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_join_matches_bruteforce(spark, events):
    """asof_join_backward == per-row brute force (latest right with
    ts <= left ts, max event_id tiebreak) on adversarial tiny inputs:
    shared timestamps, users with no quotes, quote-after-trade only."""
    from docker_based_real_time_etl_project_spark.operators.asof import asof_join_backward

    rows = [
        (i, int(u), float(ts), int(side)) for i, (u, ts, side) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, side long")
    left = df.filter(F.col("side") == 1).select(
        F.col("event_id").alias("trade_id"), "user_id", F.col("ts").alias("trade_ts")
    )
    right = df.filter(F.col("side") == 0).select(
        "user_id", "ts", F.col("event_id").alias("quote_id")
    )
    got = {
        (r.trade_id, r.quote_id)
        for r in asof_join_backward(
            left, right, on=["user_id"], left_ts="trade_ts", right_ts="ts",
            carry={"quote_id": "quote_id"}, right_tiebreak="quote_id",
        ).collect()
    }
    quotes = [r for r in rows if r[3] == 0]
    want = set()
    for tid, u, ts, side in rows:
        if side != 1:
            continue
        cand = [(q_ts, qid) for qid, qu, q_ts, _ in quotes if qu == u and q_ts <= ts]
        want.add((tid, max(cand)[1] if cand else None))
    assert got == want


def test_asof_carry_preserves_null_from_matched_row(spark):
    """The carried tuple must come from ONE right row: when the matched
    (latest) right row has a legitimately NULL carry value, the output
    is NULL — not that column spliced in from an older right row.
    (Regression: per-column last(ignorenulls=True) mixed rows.)"""
    from docker_based_real_time_etl_project_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10, 3.0)], "trade_id long, user_id long, ts double")
    right = spark.createDataFrame(
        [(10, 1.0, 5.0, 100), (10, 2.0, None, 200)],
        "user_id long, ts double, price double, quote_id long",
    )
    out = asof_join_backward(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        carry={"price": "price", "quote_id": "quote_id"}, right_tiebreak="quote_id",
    ).collect()
    assert len(out) == 1
    # matched row is quote_id=200 whose price is truly NULL
    assert out[0].quote_id == 200 and out[0].price is None


def test_asof_tolerance_drops_stale_matches(spark):
    """tolerance='1 hour': a match older than the bound nulls the whole
    carried tuple; a match inside the bound is unaffected; the bound is
    inclusive at exactly tolerance age."""
    from datetime import datetime

    from docker_based_real_time_etl_project_spark.operators.asof import asof_join_backward

    t = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 10, t), (2, 20, t), (3, 30, t)],
        "trade_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 11, 30, 0), 5.0, 100),  # 30 min old: keep
            (20, datetime(2024, 1, 1, 10, 0, 0), 6.0, 200),   # 2 h old: drop
            (30, datetime(2024, 1, 1, 11, 0, 0), 7.0, 300),   # exactly 1 h: keep
        ],
        "user_id long, ts timestamp, price double, quote_id long",
    )
    out = {
        r.trade_id: (r.quote_id, r.price)
        for r in asof_join_backward(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            carry={"price": "price", "quote_id": "quote_id"},
            right_tiebreak="quote_id", tolerance="1 HOUR",
        ).collect()
    }
    assert out[1] == (100, 5.0)
    assert out[2] == (None, None)
    assert out[3] == (300, 7.0)


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=100),  # ts (ties likely)
            st.integers(min_value=0, max_value=1),    # side: 0=quote, 1=trade
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_same_source_equals_general(spark, events):
    """asof_join_backward_same_source (one scan, tag from a predicate)
    must equal asof_join_backward over the two filtered sides — on
    adversarial tiny inputs with shared timestamps, quote-less users,
    and NULL-tolerance interplay off. Same tiebreak, same inclusivity."""
    from docker_based_real_time_etl_project_spark.operators.asof import (
        asof_join_backward, asof_join_backward_same_source,
    )

    rows = [
        (i, int(u), float(ts), int(side)) for i, (u, ts, side) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, side long")
    fused = {
        (r.event_id, r.quote_id)
        for r in asof_join_backward_same_source(
            df, on=["user_id"], ts_col="ts", is_left=F.col("side") == 1,
            carry={"event_id": "quote_id"}, right_tiebreak="event_id",
        ).collect()
    }
    left = df.filter(F.col("side") == 1).select(
        F.col("event_id").alias("trade_id"), "user_id", F.col("ts").alias("trade_ts")
    )
    right = df.filter(F.col("side") == 0).select(
        "user_id", "ts", F.col("event_id").alias("quote_id")
    )
    general = {
        (r.trade_id, r.quote_id)
        for r in asof_join_backward(
            left, right, on=["user_id"], left_ts="trade_ts", right_ts="ts",
            carry={"quote_id": "quote_id"}, right_tiebreak="quote_id",
        ).collect()
    }
    assert fused == general


@_slow
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    ),
    block=st.lists(st.integers(min_value=0, max_value=1), min_size=12, max_size=12),
)
def test_gram_postings_pairs_matches_bruteforce(spark, docs, block):
    """gram_postings_pairs == brute-force pairwise distinct-gram
    intersection on random tiny corpora (single-char 'grams' from a
    small alphabet force heavy gram sharing): every same-block pair
    with >= 1 shared distinct gram appears exactly once with the exact
    (n_a, n_b, shared) triple; no cross-block or self pairs. Cap
    disabled so the property is the uncapped exact contract (the cap's
    own semantics are pinned by the Zipf stress test)."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        gram_postings_pairs,
    )

    rows = [
        (i, str(block[i]), sorted(set(g)))
        for i, g in enumerate(docs)
    ]
    sh = spark.createDataFrame(
        rows, "doc_id long, source string, grams array<string>"
    )
    got = {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.shared)
        for r in gram_postings_pairs(sh, max_df=None).collect()
    }
    want = {}
    for i, (ia, ba, ga) in enumerate(rows):
        for ib, bb, gb in rows[i + 1:]:
            if ba != bb:
                continue
            shared = len(set(ga) & set(gb))
            if shared:
                want[(ia, ib)] = (len(ga), len(gb), shared)
    assert got == want


def test_connected_components_deep_chain(spark):
    """The label-propagation fixpoint on a graph DEEPER than the
    testdata's near-dup clusters (diameter ~2): a 9-node chain needs
    ~8 propagation rounds, so this pins both convergence-to-fixpoint
    and the folded old-rep convergence probe (rep != _old_rep inside
    the label agg) on a shape where early termination would be wrong.
    Also covers multiple components and isolated nodes rejoining."""
    from pyspark.sql import functions as F

    from docker_based_real_time_etl_project_spark.operators.dedup import (
        connected_components,
    )

    # chain 0-1-...-8, triangle 20-21-22, pair 30-31; 40,41 isolated
    edges = [(i, i + 1) for i in range(8)] + [
        (20, 21), (21, 22), (20, 22), (30, 31),
    ]
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(9)) + [20, 21, 22, 30, 31, 40, 41]],
        "id long",
    )
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.id: r.rep
        for r in connected_components(nodes, e).select("id", "rep").collect()
    }
    want = {i: 0 for i in range(9)}
    want.update({20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 40: 40, 41: 41})
    assert got == want


def test_connected_components_sorted_id_chain(spark):
    """Round-15 ADVICE fix: a chain whose ids INCREASE MONOTONICALLY
    along it is the adversarial layout for min-hook contraction —
    every round's supernode map is 'shift by 2', so one composition
    per round needs Θ(d/2) rounds and a 100-node sorted chain
    (plausible: sequential crawl doc_ids) blew past max_iter=20 and
    silently returned a single component split into many reps. The
    stall detector now doubles the per-round squaring depth, so this
    converges well inside the default budget — and the new latch
    raises instead of returning wrong labels if it ever cannot."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        connected_components,
    )

    n = 100
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r.id: r.rep
        for r in connected_components(nodes, e).select("id", "rep").collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_unconverged_raises(spark):
    """The convergence latch (round-15 ADVICE minimum): when max_iter
    is too small for the graph, the operator must raise — never
    return labels that silently split one component."""
    import pytest

    from docker_based_real_time_etl_project_spark.operators.dedup import (
        connected_components,
    )

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, e, max_iter=2).collect()


def test_keep_best_policy_overrides_min_id(spark, tmp_path):
    """q_dedup_keep_best must keep the QUALITY winner, not the min id:
    a cluster whose smallest-id member is junk (short, punct-heavy)
    and whose larger-id member is a clean 25-token doc must keep the
    larger id — the exact case where min-id canonicalization loses
    data quality. Ties fall back to longest, then smallest id."""
    import shutil

    from pyspark.sql import functions as F

    from docker_based_real_time_etl_project_spark.queries import REGISTRY

    clean_toks = [f"word{i}" for i in range(28)]        # 28 tokens, no punct
    clean = " ".join(clean_toks)                        # passes the gate
    junk = " ".join(clean_toks[:15])                    # 15-token truncation:
    # shares all 13 of its 3-grams with clean (J = 13/26 = 0.5 >= 0.3)
    # but FAILS the quality gate (n_tokens < 20) -- yet has the min id
    rows = [
        (1, "s", junk),
        (2, "s", clean),
        (3, "s", "totally unrelated words " + " ".join(f"z{i}" for i in range(30))),
    ]
    import pandas as pd

    sf = str(tmp_path / "kb")
    (tmp_path / "kb").mkdir()
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r.doc_id: (r.cluster_rep, r.is_kept)
        for r in REGISTRY["q_dedup_keep_best"].fn(spark, sf).collect()
    }
    # docs 1 and 2 cluster together (rep = min id = 1), but doc 2 is kept
    assert out[1][0] == out[2][0] == 1
    assert out[1][1] is False and out[2][1] is True
    assert out[3] == (3, True)
    shutil.rmtree(sf, ignore_errors=True)


def test_psi_scorer_invariants(spark):
    """psi_from_bucket_counts on literal histograms: identical slices
    give zero PSI in every bucket AND in the summary; a shifted
    histogram gives positive total PSI; the summary row always carries
    the slice totals. Pure function of 21-row inputs, so test it
    directly instead of through a corpus."""
    from docker_based_real_time_etl_project_spark.queries.llmprep_q import (
        psi_from_bucket_counts,
    )

    same = spark.createDataFrame(
        [(0, 40, 40), (1, 30, 30), (2, 30, 30)],
        "bucket long, n_ref long, n_cur long",
    )
    rows = {r.bucket: r for r in psi_from_bucket_counts(same).collect()}
    assert all(rows[b].psi_micro == 0 for b in (0, 1, 2, -1))
    assert rows[-1].n_ref == 100 and rows[-1].n_cur == 100

    shifted = spark.createDataFrame(
        [(0, 80, 20), (1, 10, 30), (2, 10, 50)],
        "bucket long, n_ref long, n_cur long",
    )
    srows = {r.bucket: r for r in psi_from_bucket_counts(shifted).collect()}
    # every bucket moved, so every contribution is strictly positive
    # ((p_cur - p_ref) and ln(p_cur/p_ref) always share sign)
    assert all(srows[b].psi_micro > 0 for b in (0, 1, 2))
    assert srows[-1].psi_micro == sum(srows[b].psi_micro for b in (0, 1, 2))
    assert srows[-1].psi_micro > 250000  # way past the 0.25 'drifted' bar


def test_ordered_prefix_sum_matches_sequential(spark):
    """The two-phase distributed scan == a sequential cumsum, on input
    with UNIQUE order keys (per-row cum is then fully determined)
    engineered to cross many range partitions with zero values (offset
    bookkeeping has to be exact at every partition boundary)."""
    import random

    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )

    rng = random.Random(7)
    rows = [(i, rng.choice([0, 1, 3, 40])) for i in range(997)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(df, ["k"], "v", num_partitions=32).collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_ordered_prefix_sum_duplicate_keys_and_nulls(spark):
    """With genuinely DUPLICATED order keys, per-row cum is
    tie-order-dependent (as in any ROWS window), so assert only the
    order-independent invariants: (a) the max cum within each key
    equals the sequential cumsum of per-key totals — ties can permute
    within the key but must all land before its closing total; (b) the
    global max equals the grand total. Also feeds an all-NULL-value
    key span wide enough to occupy entire range partitions: NULLs must
    count as 0 in the offsets (not poison the driver scan) and leading
    NULL rows get cum == their partition offset."""
    import random

    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )

    rng = random.Random(11)
    # ~5 rows per key over 60 keys, plus keys 100..119 carrying only NULLs
    rows = [(rng.randrange(60), rng.choice([0, 1, 7])) for _ in range(300)]
    rows += [(100 + i, None) for i in range(20) for _ in range(10)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    out = ordered_prefix_sum(df, ["k"], "v", num_partitions=32).collect()
    assert len(out) == len(rows)

    per_key_total: dict[int, int] = {}
    for k, v in rows:
        per_key_total[k] = per_key_total.get(k, 0) + (v or 0)
    acc, want_max = 0, {}
    for k in sorted(per_key_total):
        acc += per_key_total[k]
        want_max[k] = acc

    got_max: dict[int, int] = {}
    for r in out:
        got_max[r.k] = max(got_max.get(r.k, 0), r.cum)
    assert got_max == want_max
    assert max(r.cum for r in out) == sum(v for _, v in rows if v is not None)


def test_cluster_artifact_shared(spark, sf_dir):
    """The dedup query family must consume ONE session-materialized
    postings-pair artifact and ONE cluster artifact: running all five
    consumers (q_ngram_jaccard, q_containment, q_split_leakage,
    q_dedup_clusters, q_dedup_keep_best — the last twice) leaves the
    gram postings join and the components fixpoint each built exactly
    once for their (sf_dir, params, fingerprint) keys — the round-6
    perf-weak finding was keep_best silently re-paying the whole
    fixpoint. Also cross-checks that clusters and keep_best agree on
    the clustering itself."""
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        BUILD_COUNTS, table_fingerprint,
    )

    fp = table_fingerprint(sf_dir, "documents")
    ckey = ("dedup_clusters", sf_dir, 3, 0.3, fp)
    pkey = ("gram_pairs", sf_dir, 3, "source", fp)
    for q in ("q_ngram_jaccard", "q_containment", "q_split_leakage"):
        REGISTRY[q].fn(spark, sf_dir).count()
    clusters = {
        r.doc_id: r.cluster_rep
        for r in REGISTRY["q_dedup_clusters"].fn(spark, sf_dir).collect()
    }
    keep_best = {
        r.doc_id: r.cluster_rep
        for r in REGISTRY["q_dedup_keep_best"].fn(spark, sf_dir).collect()
    }
    REGISTRY["q_dedup_keep_best"].fn(spark, sf_dir).count()
    assert clusters == keep_best  # same artifact -> same clustering
    assert BUILD_COUNTS[ckey] == 1
    assert BUILD_COUNTS[pkey] == 1


def test_lm_perplexity_ranks_fluency(spark, tmp_path):
    """The bigram-LM score must order docs by corpus fluency: a doc
    made of the corpus's dominant bigram patterns scores LOWER
    (more predictable) than a doc of bigrams seen nowhere else, and
    the integer mean is exact (sum div count). Singleton-token docs
    produce no row."""
    import shutil

    import pandas as pd

    from docker_based_real_time_etl_project_spark.queries import REGISTRY

    common = "the cat sat on the mat " * 20           # dominant bigrams
    rows = [
        (1, "s", (common + "the cat sat on the mat").strip()),
        (2, "s", (common + "zq xv qqj kpl wvx mzz").strip()),  # rare tail
        (3, "s", "gibberish"),                         # 1 token -> no bigrams
    ]
    sf = str(tmp_path / "lm")
    (tmp_path / "lm").mkdir()
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        f"{sf}/documents.parquet"
    )
    out = {r.doc_id: r for r in REGISTRY["q_lm_perplexity"].fn(spark, sf).collect()}
    assert 3 not in out
    assert out[1].nll_micro < out[2].nll_micro
    assert out[1].n_bigrams == 6 * 21 - 1 and out[2].n_bigrams == 6 * 20 + 5
    shutil.rmtree(sf, ignore_errors=True)


def test_ewma_rsi_invariants(spark, tmp_path):
    """Literal-fixture invariants for the exchange analytics:
    a constant series has EWMA == the constant and RSI NULL (no
    movement -> gains+losses = 0); a strictly rising series pins
    RSI exactly at 100e6 (all gain, no loss) and its EWMA strictly
    below the last price (the fold lags a rising series)."""
    import datetime
    import shutil

    import pandas as pd

    from docker_based_real_time_etl_project_spark.queries import REGISTRY

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        ts = t0 + datetime.timedelta(minutes=i)
        rows.append((i, ts, 1, "flat", 5.00, "{}"))
        rows.append((100 + i, ts, 2, "up", 1.00 + i, "{}"))
    sf = str(tmp_path / "fin")
    (tmp_path / "fin").mkdir()
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(f"{sf}/events.parquet")

    ew = {r.event_type: r for r in REGISTRY["q_ewma"].fn(spark, sf).collect()}
    assert ew["flat"].ewma_micro == 5_000_000 and ew["flat"].n_events == 20
    assert ew["up"].ewma_micro < 20_000_000  # lags the last price (20.0)

    rsi = [r for r in REGISTRY["q_rsi"].fn(spark, sf).collect()]
    by = {}
    for r in rsi:
        by.setdefault(r.event_type, []).append(r.rsi_micro)
    assert all(v is None for v in by["flat"])
    assert all(v == 100_000_000 for v in by["up"])
    assert len(by["flat"]) == len(by["up"]) == 6  # rows 15..20
    shutil.rmtree(sf, ignore_errors=True)


def test_train_gram_artifact_shared(spark, sf_dir):
    """The contamination family must probe ONE session-materialized
    train-gram artifact (round-7 verdict item 5): running all four
    consumers — q_contamination, q_contamination_bloom,
    q_contamination_span, q_stream_contamination — leaves the distinct
    train-gram build executed exactly once for its (params,
    fingerprint) key, and the batch screen agrees with itself across
    consumers (bloom's prefilter must be invisible)."""
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        BUILD_COUNTS, table_fingerprint,
    )

    fp = table_fingerprint(sf_dir, "documents")
    key = ("train_grams", sf_dir, 5, 8000, fp)
    base = {
        (r.doc_id, r.n_grams, r.n_shared)
        for r in REGISTRY["q_contamination"].fn(spark, sf_dir).collect()
    }
    bloom = {
        (r.doc_id, r.n_grams, r.n_shared)
        for r in REGISTRY["q_contamination_bloom"].fn(spark, sf_dir).collect()
    }
    assert base == bloom
    REGISTRY["q_contamination_span"].fn(spark, sf_dir).count()
    REGISTRY["q_stream_contamination"].fn(spark, sf_dir).count()
    assert BUILD_COUNTS[key] == 1
    # round 15: the probe side is an artifact too — one eval-slice
    # explode shared by q_contamination, the bloom variant, and the
    # capstone's stage-5 screen
    assert BUILD_COUNTS[("eval_grams", sf_dir, 5, 9000, fp)] == 1


@given(
    vals=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    cut=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_mdd_fold_batch_split_invariance(vals, cut):
    """The streaming max-drawdown twin's correctness rests on ONE
    algebraic fact: folding a sequence in any batch split (carrying
    the running peak) and combining per-batch partials with
    sum/max/max equals the one-shot fold. Hypothesis cuts the
    sequence at arbitrary points."""
    import numpy as np

    from docker_based_real_time_etl_project_spark.streaming.stateful import (
        _mdd_fold,
    )

    arr = np.asarray(vals, np.int64)
    _, whole = _mdd_fold(None, arr)
    n_cuts = cut.draw(st.integers(0, min(4, len(vals) - 1)))
    cuts = sorted(
        cut.draw(
            st.lists(
                st.integers(1, len(vals) - 1) if len(vals) > 1 else st.nothing(),
                min_size=n_cuts, max_size=n_cuts,
            )
        )
    ) if len(vals) > 1 else []
    parts, peak = [], None
    for seg in np.split(arr, cuts):
        if len(seg):
            peak, row = _mdd_fold(peak, seg)
            parts.append(row)
    assert sum(p["n"] for p in parts) == whole["n"]
    assert max(p["dd"] for p in parts) == whole["dd"]
    assert max(p["pk"] for p in parts) == whole["pk"]


@given(
    ticks=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-10**4, 10**4)),
        min_size=1, max_size=60,
    ),
    cut=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_rv_fold_batch_split_invariance(ticks, cut):
    """Same invariance for the realized-variance fold: per-(day)
    partials under any batch split (carrying the last (day, cents)
    boundary tick) sum to the one-shot per-day totals. Days arrive
    sorted, as the re-sort buffer guarantees."""
    import numpy as np

    from docker_based_real_time_etl_project_spark.streaming.stateful import (
        _rv_fold,
    )

    ticks = sorted(ticks, key=lambda t: t[0])
    days = np.asarray([t[0] for t in ticks], np.int64)
    vals = np.asarray([t[1] for t in ticks], np.int64)

    def combine(rows):
        out = {}
        for r in rows:
            n, rv = out.get(r["day_ord"], (0, 0))
            out[r["day_ord"]] = (n + r["n"], rv + r["rv"])
        return {d: nr for d, nr in out.items() if nr[0] > 0}

    _, _, whole = _rv_fold(None, 0, days, vals)
    n_cuts = cut.draw(st.integers(0, min(4, len(ticks) - 1)))
    cuts = sorted(
        cut.draw(
            st.lists(
                st.integers(1, len(ticks) - 1) if len(ticks) > 1 else st.nothing(),
                min_size=n_cuts, max_size=n_cuts,
            )
        )
    ) if len(ticks) > 1 else []
    rows, last_day, last_c = [], None, 0
    for seg in np.split(np.arange(len(ticks)), cuts):
        if len(seg):
            last_day, last_c, part = _rv_fold(
                last_day, last_c, days[seg], vals[seg]
            )
            rows.extend(part)
    assert combine(rows) == combine(whole)


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=100),  # ts (ties forced)
            st.integers(min_value=0, max_value=1),    # side: 0=quote, 1=trade
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_forward_matches_bruteforce(spark, events):
    """asof_join_forward == per-row brute force (EARLIEST right with
    ts >= left ts, max event_id tiebreak among the minimal ts) on the
    same adversarial tiny inputs as the backward property."""
    from docker_based_real_time_etl_project_spark.operators.asof import (
        asof_join_forward,
    )

    rows = [
        (i, int(u), float(ts), int(side)) for i, (u, ts, side) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, side long")
    left = df.filter(F.col("side") == 1).select(
        F.col("event_id").alias("trade_id"), "user_id", F.col("ts").alias("trade_ts")
    )
    right = df.filter(F.col("side") == 0).select(
        "user_id", "ts", F.col("event_id").alias("quote_id")
    )
    got = {
        (r.trade_id, r.quote_id)
        for r in asof_join_forward(
            left, right, on=["user_id"], left_ts="trade_ts", right_ts="ts",
            carry={"quote_id": "quote_id"}, right_tiebreak="quote_id",
        ).collect()
    }
    quotes = [r for r in rows if r[3] == 0]
    want = set()
    for tid, u, ts, side in rows:
        if side != 1:
            continue
        cand = [(q_ts, -qid) for qid, qu, q_ts, _ in quotes if qu == u and q_ts >= ts]
        want.add((tid, -min(cand)[1] if cand else None))
    assert got == want


def test_asof_forward_tolerance_drops_distant_matches(spark):
    """The look-ahead bound nulls the whole carry tuple atomically
    when the next right row is beyond tolerance."""
    from docker_based_real_time_etl_project_spark.operators.asof import (
        asof_join_forward,
    )
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 1, t(0)), (2, 1, t(30))], "trade_id long, user_id long, trade_ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(40), 9, 5.0)], "user_id long, ts timestamp, quote_id long, v double"
    )
    out = {
        r.trade_id: (r.quote_id, r.qv)
        for r in asof_join_forward(
            left, right, on=["user_id"], left_ts="trade_ts", right_ts="ts",
            carry={"quote_id": "quote_id", "v": "qv"},
            right_tiebreak="quote_id", tolerance="15 MINUTES",
        ).collect()
    }
    assert out[1] == (None, None)   # next quote 40 min away > 15 min
    assert out[2] == (9, 5.0)       # 10 min away, within bound


@_slow
@given(
    names=st.lists(
        st.from_regex(r"[ab]{1,5}", fullmatch=True),
        min_size=2, max_size=12, unique=True,
    ),
    depth=st.sampled_from([1, 2]),
)
def test_deletion_neighborhood_blocking_is_complete(spark, names, depth):
    """The SymSpell intersection property, held on adversarial tiny
    alphabets (runs of repeated chars, cross-length edits): every pair
    within levenshtein <= depth must co-occupy at least one depth-k
    deletion-neighborhood member — the completeness claim the
    q_fuzzy_join_ed1_xlen / q_fuzzy_join_ed2 block joins rest on."""
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        _deletion_neighborhood,
    )

    df = spark.createDataFrame([(n,) for n in names], "nm string")
    v = df.select(
        "nm", F.explode(F.expr(_deletion_neighborhood(depth))).alias("v")
    )
    b = v.select(F.col("nm").alias("bnm"), "v")
    got = {
        (r["nm"], r["bnm"])
        for r in v.join(b, "v")
        .filter(
            (F.col("nm") != F.col("bnm"))
            & (F.levenshtein("nm", "bnm") <= depth)
        )
        .select("nm", "bnm")
        .distinct()
        .collect()
    }
    truth = {
        (r["nm"], r["bnm"])
        for r in df.crossJoin(b.select(F.col("bnm")).distinct())
        .filter(
            (F.col("nm") != F.col("bnm"))
            & (F.levenshtein("nm", "bnm") <= depth)
        )
        .collect()
    }
    assert got == truth
