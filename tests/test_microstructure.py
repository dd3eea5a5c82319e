"""Microstructure pack invariants beyond the DuckDB hash oracles
(tests/test_oracle_parity.py covers exact parity for all five):
structural properties that must hold at ANY scale, and the
batch==stream equivalence of the stateful twins."""

from __future__ import annotations

import pyspark.sql.functions as F

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.queries.microstructure_q import (
    BAR_VOLUME,
    CUSUM_H_CENTS,
)
from tests.conftest import SF_SMOKE


def test_tick_imbalance_identity(spark):
    """signed_vol == buy_vol - sell_vol on every row, and total signed
    trades never exceed total rows."""
    df = REGISTRY["q_tick_imbalance"].fn(spark, SF_SMOKE)
    bad = df.filter(
        F.col("signed_vol") != F.col("buy_vol") - F.col("sell_vol")
    ).count()
    assert bad == 0
    tot = df.agg(F.sum(F.col("n_buys") + F.col("n_sells"))).first()[0]
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert tot <= n_events


def test_volume_bars_conservation(spark):
    """Bars partition the stream: per key, Σ n_trades == row count and
    Σ bar_vol == Σ vol; bar ids are dense from 0."""
    df = REGISTRY["q_volume_bars"].fn(spark, SF_SMOKE)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
    )
    truth = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vol").alias("v")
    )
    got = df.groupBy("event_type").agg(
        F.sum("n_trades").alias("n"),
        F.sum("bar_vol").alias("v"),
        F.min("bar_id").alias("mn"),
        F.max("bar_id").alias("mx"),
        F.count(F.lit(1)).alias("n_bars"),
    )
    j = truth.join(got, "event_type")
    mism = j.filter(
        (truth["n"] != got["n"])
        | (truth["v"] != got["v"])
        | (F.col("mn") != 0)
        | (F.col("mx") != F.col("n_bars") - 1)
    ).count()
    assert mism == 0
    assert df.filter(F.col("bar_vol") <= 0).count() == 0


def test_cusum_alarms_exceed_threshold(spark):
    df = REGISTRY["q_cusum"].fn(spark, SF_SMOKE)
    assert df.count() > 0  # parameters produce alarms at smoke scale
    assert df.filter(F.col("s_value") <= CUSUM_H_CENTS).count() == 0


import pytest


# Defense-in-depth tier (round 15): every pair below is independently
# DuckDB-hash-oracled in test_oracle_parity — this 70 s sweep only
# adds the Spark==Spark cross-check against joint engine/oracle
# drift, so it runs in the evidence profile (`pytest -m slow`).
@pytest.mark.slow
def test_stream_twins_match_batch(spark):
    """The stateful twins reproduce the batch queries row-for-row (the
    hash oracle says the same thing vs DuckDB; this pins Spark==Spark
    so a joint engine/oracle drift cannot slip through)."""
    for batch_name, stream_name, keys in [
        ("q_tick_imbalance", "q_stream_tick_imbalance", ["event_type", "hour"]),
        ("q_cusum", "q_stream_cusum", ["event_type", "ts", "s_value"]),
        # and the shuffled-arrival twins: the re-sort buffer must make
        # disorder invisible for these order-DEFINED operators
        ("q_tick_imbalance", "q_stream_tick_imbalance_ooo", ["event_type", "hour"]),
        ("q_cusum", "q_stream_cusum_ooo", ["event_type", "ts", "s_value"]),
        ("q_volume_bars", "q_stream_volume_bars", ["event_type", "bar_id"]),
        ("q_volume_bars", "q_stream_volume_bars_ooo", ["event_type", "bar_id"]),
        ("q_roll_spread", "q_stream_roll_spread", ["event_type", "day"]),
        ("q_kyle_lambda", "q_stream_kyle_lambda", ["event_type"]),
    ]:
        b = REGISTRY[batch_name].fn(spark, SF_SMOKE)
        s = REGISTRY[stream_name].fn(spark, SF_SMOKE)
        assert b.exceptAll(s).count() == 0, f"{batch_name} - {stream_name}"
        assert s.exceptAll(b).count() == 0, f"{stream_name} - {batch_name}"
