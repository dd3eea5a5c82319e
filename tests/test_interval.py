"""operators/interval.py — the bucketized interval-overlap join with
adaptive width, stress-tested on a Zipf-skewed length distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.interval import (
    adaptive_bucket_s,
    interval_overlap_join,
)

_DAY = 86400


def _zipf_intervals(spark, n, name):
    """Deterministic Zipf-length intervals: rank-1 spans ~a year, the
    bulk spans minutes — the skewed regime where a max-length-derived
    bucket degrades toward per-bucket cartesian."""
    return spark.range(n).select(
        F.col("id").alias(f"{name}_id"),
        (F.col("id") * 7919 % (365 * _DAY)).alias(f"{name}_s"),
        (
            F.col("id") * 7919 % (365 * _DAY)
            + (F.lit(365 * _DAY) / (F.col("id") + 1)).cast("long")
        ).alias(f"{name}_e"),
    )


def test_zipf_lengths_match_brute_force(spark):
    a = _zipf_intervals(spark, 200, "a").localCheckpoint(eager=True)
    b = _zipf_intervals(spark, 173, "b").localCheckpoint(eager=True)
    got = (
        interval_overlap_join(a, b, ("a_s", "a_e"), ("b_s", "b_e"))
        .select("a_id", "b_id")
        .collect()
    )
    want = (
        a.crossJoin(b)
        .filter((F.col("b_s") <= F.col("a_e")) & (F.col("a_s") <= F.col("b_e")))
        .select("a_id", "b_id")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == len(set(map(tuple, got)))  # exactly-once guard


def test_adaptive_width_tracks_p99_not_max(spark):
    """One year-long interval must not set the width: P99 of these
    Zipf lengths is ~61d (rank-5 of 365d/(rank+1), duplicated across
    the two sides), a 6x cut under the 365d max — the long interval
    pays its own explode rows instead of everyone sharing year-wide
    buckets."""
    a = _zipf_intervals(spark, 500, "a")
    b = _zipf_intervals(spark, 500, "b")
    width = adaptive_bucket_s(a, b, ("a_s", "a_e"), ("b_s", "b_e"))
    assert width < 70 * _DAY < 365 * _DAY  # ~p99, not the max
    assert width >= 3600  # floor


def test_explicit_width_still_exact(spark):
    """Any width is correct — pin it by running the same join at a
    deliberately terrible 1-hour width and a huge 2-year width."""
    a = _zipf_intervals(spark, 80, "a").localCheckpoint(eager=True)
    b = _zipf_intervals(spark, 80, "b").localCheckpoint(eager=True)
    base = sorted(
        map(
            tuple,
            interval_overlap_join(
                a, b, ("a_s", "a_e"), ("b_s", "b_e"), bucket_s=7 * _DAY
            ).select("a_id", "b_id").collect(),
        )
    )
    for w in (3600, 730 * _DAY):
        got = sorted(
            map(
                tuple,
                interval_overlap_join(
                    a, b, ("a_s", "a_e"), ("b_s", "b_e"), bucket_s=w
                ).select("a_id", "b_id").collect(),
            )
        )
        assert got == base, f"width {w} changed the result set"
