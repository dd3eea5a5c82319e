"""Grain-cardinality stress for the round-8 microstructure twins
(same methodology as scripts/indicator_stress.py section B): the
tick-rule and CUSUM state machines on a synthetic 1000-key grain
(event_type x user_id%200). Contract: state rows = O(keys) exactly,
wall time flat-to-down as keys (and with them parallelism) grow.
Prints @@-prefixed lines for SCALE.md. Run idle, best-of-2."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.streaming_q import _stream
from docker_based_real_time_etl_project_spark.session import get_spark
from docker_based_real_time_etl_project_spark.streaming import pipelines
from docker_based_real_time_etl_project_spark.streaming.pipelines import run_to_memory
from docker_based_real_time_etl_project_spark.streaming.stateful import (
    cusum_stream,
    tick_imbalance_stream,
)

spark = get_spark("micro-stress")
K, H = 300, 20_000


def best_of(fn, n=2):
    runs, states = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 2))
        states.append(pipelines.LAST_PROGRESS.get("peak_state_rows", 0))
    return min(runs), runs, max(states)


def grained(sf_dir, n_sub):
    st = _stream(spark, sf_dir)
    if n_sub > 1:
        st = st.withColumn(
            "event_type",
            F.concat_ws("_", "event_type", (F.col("user_id") % n_sub).cast("string")),
        )
    return st


def tick(sf_dir, n_sub, parts):
    st = grained(sf_dir, n_sub).select(
        "event_type", "ts", "event_id", "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
    )
    return run_to_memory(
        tick_imbalance_stream(st), output_mode="append", state_partitions=parts
    )


def cusum(sf_dir, n_sub, parts):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if n_sub > 1:
        ev = ev.withColumn(
            "event_type",
            F.concat_ws("_", "event_type", (F.col("user_id") % n_sub).cast("string")),
        )
    targets = {
        r["event_type"]: r["t"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("sum(cast(round(value*100) as bigint)) div count(*)").alias("t"))
        .collect()
    }
    return run_to_memory(
        cusum_stream(grained(sf_dir, n_sub), targets, K, H),
        output_mode="append",
        state_partitions=parts,
    )


for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")):
    for opname, op in (("tick_imbalance", tick), ("cusum", cusum)):
        for n_sub, parts in ((1, 8), (200, 32)):
            keys = 5 * n_sub
            t, runs, st = best_of(lambda: op(sf_dir, n_sub, parts))
            print(
                f"@@ {label} {opname} keys={keys} partitions={parts}: "
                f"best={t} runs={runs} peak_state_rows={st}",
                flush=True,
            )
