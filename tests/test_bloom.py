"""Expression-level Bloom prefilter (operators.bloom): the python
bitmap builder and the Spark probe expression must stay in lockstep —
a drift between the two is a silent false-negative machine, which
would break the central no-false-negatives guarantee that lets
q_contamination_bloom keep an exact-oracle contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.bloom import (
    bloom_might_contain, bloom_size_bits, build_bloom_words, with_bloom_words,
)


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    rng = random.Random(7)
    members = [rng.getrandbits(64) - (1 << 63) for _ in range(2000)]
    others = [rng.getrandbits(64) - (1 << 63) for _ in range(20000)]
    others = [h for h in others if h not in set(members)]
    m_bits = bloom_size_bits(len(members))
    words = build_bloom_words(members, m_bits, k=4)

    df = spark.createDataFrame(
        [(h, True) for h in members] + [(h, False) for h in others],
        "gh long, is_member boolean",
    )
    got = with_bloom_words(df, spark, words).withColumn(
        "maybe", bloom_might_contain(F.col("gh"), F.col("_bloom_words"), m_bits, k=4)
    )
    # EVERY member must test positive through the Spark expression
    fn = got.filter(F.col("is_member") & ~F.col("maybe")).count()
    assert fn == 0, f"{fn} false negatives — python/expression arithmetic drifted"
    # false positives exist but stay near the designed ~0.24% rate
    fp = got.filter(~F.col("is_member") & F.col("maybe")).count()
    assert fp / len(others) < 0.02, f"FPR {fp / len(others):.4f} out of band"


def test_bloom_prefilter_is_selective_on_testdata(spark):
    """The prefilter must actually prefilter: on the sf0.001 corpus the
    measured probe-side hit rate is ~11%, so the bloom should pass
    well under half of the test gram rows (and never fewer than the
    true members)."""
    from docker_based_real_time_etl_project_spark.operators.dedup import shingles
    from docker_based_real_time_etl_project_spark.queries.registry import table
    from docker_based_real_time_etl_project_spark.queries.sampling_q import hash_ticket

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents").select(
        "doc_id",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.array_distinct(shingles("text", 5)).alias("grams"),
    )
    train_g = (
        d.filter(F.col("ticket") < 8000)
        .select(F.explode("grams").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    hashes = [r.gh for r in train_g.collect()]
    m_bits = bloom_size_bits(len(hashes))
    words = build_bloom_words(hashes, m_bits, k=4)
    test_g = (
        d.filter(F.col("ticket") >= 9000)
        .select(F.explode("grams").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
    )
    total = test_g.count()
    passed = (
        with_bloom_words(test_g, spark, words)
        .filter(bloom_might_contain(F.col("gh"), F.col("_bloom_words"), m_bits, k=4))
        .count()
    )
    true_hits = test_g.join(train_g, "gh", "left_semi").count()
    assert true_hits <= passed <= total * 0.5, (passed, true_hits, total)


def test_distributed_build_bit_identical(spark):
    """build_bloom_words_distributed must produce the EXACT bitmap the
    driver-side builder produces on the same keys — shared insert
    arithmetic + associative OR means any drift is a bug. Also the
    scale contract: the driver only ever receives m_bits/64 words,
    regardless of key count or partitioning."""
    from docker_based_real_time_etl_project_spark.operators.bloom import (
        build_bloom_words_distributed,
    )

    rng = random.Random(11)
    members = [rng.getrandbits(64) - (1 << 63) for _ in range(5000)]
    m_bits = bloom_size_bits(len(members))
    want = build_bloom_words(members, m_bits, k=4)
    df = spark.createDataFrame([(h,) for h in members], "gh long")
    # duplicate keys and odd partitioning must not change the bitmap
    noisy = df.union(df.limit(500)).repartition(13)
    got = build_bloom_words_distributed(noisy, "gh", m_bits, k=4)
    assert got == want
    # empty input -> all-zero bitmap, still the right length
    empty = spark.createDataFrame([], "gh long")
    zeros = build_bloom_words_distributed(empty, "gh", m_bits, k=4)
    assert zeros == [0] * (m_bits // 64)


def test_driver_probe_lockstep_with_expression_probe(spark):
    """lakesnap's driver-side membership probe (_bloom_maybe, used for
    sidecar file skipping) must agree with the expression probe
    bit-for-bit on the SAME bitmap — inserted keys always maybe=True
    (no false negatives), and arbitrary probes get identical verdicts
    from both implementations (so file skipping can never disagree
    with an in-plan prefilter)."""
    import random

    from docker_based_real_time_etl_project_spark.lakesnap import _bloom_maybe

    rng = random.Random(7)
    members = [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)]
    m_bits = bloom_size_bits(len(members))
    words = build_bloom_words(members, m_bits, k=4)
    probes = members[:100] + [rng.randint(-(2**63), 2**63 - 1) for _ in range(400)]
    df = spark.createDataFrame([(h,) for h in probes], "gh long")
    expr_verdicts = [
        r["maybe"]
        for r in with_bloom_words(df, spark, words)
        .withColumn(
            "maybe",
            bloom_might_contain(F.col("gh"), F.col("_bloom_words"), m_bits, k=4),
        )
        .orderBy("gh")
        .collect()
    ]
    py_verdicts = [
        _bloom_maybe(words, h, m_bits, 4) for h in sorted(probes)
    ]
    assert expr_verdicts == py_verdicts
    assert all(_bloom_maybe(words, h, m_bits, 4) for h in members)
