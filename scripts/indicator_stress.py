"""Round-8 indicator-twin measurements for SCALE.md:

A) re-run the 10x growth spot for the four streaming indicator twins
   after the vectorized integer folds (round-7 verdict item 2's done
   criterion: the RSI/Bollinger wall ratios should drop toward the
   EWMA overhead floor);
B) grain-cardinality stress (verdict item 4): the same RSI/Bollinger
   state machines on a synthetic 1000-key grain (event_type x
   user_id%200) — state must be O(keys) and wall time flat-to-down as
   keys (and with them parallelism) grow, because more keys means the
   same rows spread over more, smaller per-key folds.

Prints `@@`-prefixed lines; numbers are pasted into SCALE.md tables.
Run idle, best-of-2, like scripts/scale_spot.py.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.queries.streaming_q import _stream
from docker_based_real_time_etl_project_spark.session import get_spark
from docker_based_real_time_etl_project_spark.streaming import pipelines
from docker_based_real_time_etl_project_spark.streaming.pipelines import run_to_memory
from docker_based_real_time_etl_project_spark.streaming.stateful import (
    bollinger_stream, rsi_stream,
)

spark = get_spark("indicator-stress")

TWINS = ["q_stream_ewma", "q_stream_rsi", "q_stream_vwap", "q_stream_bollinger"]


def best_of(fn, n=2):
    runs, states = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 2))
        states.append(pipelines.LAST_PROGRESS.get("peak_state_rows", 0))
    return min(runs), runs, max(states)


print("@@ === A) 10x growth re-run, vectorized folds ===", flush=True)
res = {}
for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")):
    for name in TWINS:
        t, runs, st = best_of(lambda: REGISTRY[name].fn(spark, sf_dir))
        res[(name, label)] = (t, st)
        print(f"@@ {label} {name}: best={t} runs={runs} peak_state={st}", flush=True)
for name in TWINS:
    a, sa = res[(name, "sf0.1")]
    b, sb = res[(name, "sf1")]
    print(
        f"@@ {name}: {a} -> {b} wall_ratio={round(b / a, 2)} "
        f"state {sa} -> {sb} state_ratio={round(sb / max(sa, 1), 2)}",
        flush=True,
    )

print("@@ === B) grain-cardinality stress (5 keys vs 1000 keys) ===", flush=True)


def grained(sf_dir, n_sub):
    st = _stream(spark, sf_dir)
    if n_sub > 1:
        st = st.withColumn(
            "event_type",
            F.concat_ws("_", "event_type", (F.col("user_id") % n_sub).cast("string")),
        )
    return st


for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")):
    for opname, op in (("rsi", rsi_stream), ("bollinger", bollinger_stream)):
        for n_sub, parts in ((1, 8), (200, 32)):
            keys = 5 * n_sub
            t, runs, st = best_of(
                lambda: run_to_memory(
                    op(grained(sf_dir, n_sub)),
                    output_mode="append",
                    state_partitions=parts,
                )
            )
            print(
                f"@@ {label} {opname} keys={keys} partitions={parts}: "
                f"best={t} runs={runs} peak_state_rows={st}",
                flush=True,
            )
