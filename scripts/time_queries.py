#!/usr/bin/env python
"""Warm best-of-N timing for a named subset of registry queries at
$SPARK_GRAFT_SF_DIR (default sf0.1), noop sink, one shared session.

Usage: python scripts/time_queries.py q_a q_b ... [--n 3]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.session import get_spark

    spark = get_spark("time-queries")
    # warm JVM/footers
    REGISTRY["q_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"TIMING {name} min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
