"""A/B the PQ/IVF literal-unroll vs transform-lambda nearest_centroids.

Times q_ann_pq and q_ann_pq_recall end-to-end (noop sink, bench
methodology) at sf0.001 plus the pure planning step (explain), in ONE
session, so the codebook-expression rewrite's planning-time claim is
measured, not asserted.  Run:  python scripts/ab_pq_plan_r15.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_pq_plan_r15")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from docker_based_real_time_etl_project_spark.queries import REGISTRY

    for name in ("q_ann_pq", "q_ann_pq_recall", "q_ann_ivf", "q_ann_ivf_recall"):
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        df.explain("formatted")
        t_plan = time.monotonic() - t0
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        print(
            f"{name}: build={t_build:.2f}s plan(explain)={t_plan:.2f}s "
            f"exec={min(runs):.2f}s runs={['%.2f' % r for r in runs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main()
    out = [l for l in buf.getvalue().splitlines() if l.startswith("q_")]
    print("\n".join(out))
