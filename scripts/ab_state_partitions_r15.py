#!/usr/bin/env python
"""Round-15: price the state-partition count of the availableNow
replay (the bench's slowest queries are the stateful streams, and
their cost is ~80% addBatch — per-batch tasks x per-task Arrow/Python
round-trip + state-store commit). state_partitions=8 was the round-12
right-sizing from 32; the key cardinality of the indicator streams is
5 (event_type), so up to 3 of 8 stores per batch are empty and every
batch pays 8 stateful tasks. This A/B times the rsi pair at
state_partitions 8 vs 5 alternating in ONE session. Results are
partition-count independent (exact-integer state machines) — proven
by the oracle gates, re-run after any change.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_state_partitions_r15.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from docker_based_real_time_etl_project_spark.queries.streaming_q import (  # noqa: E402
    _ooo_stream, _stream,
)
from docker_based_real_time_etl_project_spark.session import get_spark  # noqa: E402
from docker_based_real_time_etl_project_spark.streaming.pipelines import (  # noqa: E402
    run_to_memory,
)
from docker_based_real_time_etl_project_spark.streaming.stateful import (  # noqa: E402
    rsi_stream, rsi_stream_ooo,
)


def run(spark, which: str, sp: int) -> float:
    if which == "rsi":
        sdf = rsi_stream(_stream(spark, SF_DIR))
    else:
        st, delay = _ooo_stream(spark, SF_DIR)
        sdf = rsi_stream_ooo(st, watermark=delay)
    t0 = time.perf_counter()
    run_to_memory(sdf, output_mode="append", state_partitions=sp)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-state-partitions-r15")
    res: dict[str, list[float]] = {}
    for which in ("rsi", "ooo"):
        run(spark, which, 8)  # warm + materialize slices
    for i in range(n_pairs):
        for sp in (8, 5):
            for which in ("rsi", "ooo"):
                dt = run(spark, which, sp)
                res.setdefault(f"{which}_sp{sp}", []).append(dt)
                print(f"@@ pair {i} {which} sp={sp}: {dt}s", flush=True)
    print("@@ RESULTS", {k: (min(v), v) for k, v in sorted(res.items())}, flush=True)


if __name__ == "__main__":
    main()
