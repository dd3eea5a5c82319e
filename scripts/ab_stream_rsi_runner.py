#!/usr/bin/env python
"""Round-15 streaming-RSI A/B RUNNER: one process, one tree.

Usage: python ab_stream_rsi_runner.py <tree_path> <label>

Times q_stream_rsi and q_stream_rsi_ooo exactly the way bench.py does
(registered fn + noop sink, best-of-3 after a warmup run), and captures
the per-micro-batch ``durationMs`` breakdown from StreamingQuery
progress on a final instrumented drain. Emits one JSON line prefixed
``@@RESULT `` so the orchestrator can interleave many runs of two trees
and diff like for like. The tree under test is whatever repo path is
given — the r13 checkout and HEAD expose identical entry points for
these queries (their code is byte-identical across the two trees; the
A/B exists to prove the driver's regression flag is ambient, with a
controlled experiment instead of an assertion)."""
from __future__ import annotations

import json
import os
import sys
import time

TREE = sys.argv[1]
LABEL = sys.argv[2]
sys.path.insert(0, TREE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from docker_based_real_time_etl_project_spark.queries import REGISTRY  # noqa: E402
from docker_based_real_time_etl_project_spark.session import get_spark  # noqa: E402


def time_once(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def batch_profile(spark, which: str) -> list[dict]:
    """Drain the stream once with an explicit writeStream so
    recentProgress (per-batch durationMs) is readable."""
    import tempfile
    import uuid

    from docker_based_real_time_etl_project_spark.queries.streaming_q import (
        _ooo_stream, _stream,
    )
    from docker_based_real_time_etl_project_spark.streaming.stateful import (
        rsi_stream, rsi_stream_ooo,
    )

    if which == "rsi":
        sdf = rsi_stream(_stream(spark, SF_DIR))
    else:
        st, delay = _ooo_stream(spark, SF_DIR)
        sdf = rsi_stream_ooo(st, watermark=delay)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"prof_{uuid.uuid4().hex[:8]}")
            .outputMode("append")
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="ab_ckpt_", dir="/dev/shm"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        prog = []
        for p in (q.recentProgress or []):
            d = p.get("durationMs") or {}
            prog.append({
                "batchId": p.get("batchId"),
                "rows": p.get("numInputRows"),
                **{k: d.get(k) for k in (
                    "addBatch", "commitOffsets", "getBatch", "latestOffset",
                    "queryPlanning", "triggerExecution", "walCommit")},
            })
        return prog
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    spark = get_spark(f"ab-rsi-{LABEL}")
    # same warmup as bench.py
    REGISTRY["q_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    res: dict = {"label": LABEL, "tree": TREE}
    for name in ("q_stream_rsi", "q_stream_rsi_ooo"):
        fn = REGISTRY[name].fn
        time_once(fn, spark)  # warm (materializes slice dirs once)
        runs = [time_once(fn, spark) for _ in range(3)]
        res[name] = {"min": min(runs), "runs": runs}
    res["batches_rsi"] = batch_profile(spark, "rsi")
    res["batches_rsi_ooo"] = batch_profile(spark, "ooo")
    print("@@RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
