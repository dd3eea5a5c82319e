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
