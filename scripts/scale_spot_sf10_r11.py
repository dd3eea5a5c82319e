"""Round-11 100x growth spots (round-10 verdict item 3): the session-3
operators that only had sf1 evidence, at /tmp/sf1 + /tmp/sf10
(generate with scripts/gen_sf1.py + gen_sf10.py).

  - q_join_asof_forward / q_join_window_agg  (union-and-carry scans —
    expect ~sort-bound)
  - q_skyline                                (sort + two running-max windows)
  - q_funnel_deadline / q_stream_funnel_deadline  (state O(users) claim)
  - q_sessionize_attribution / q_retention_curve  (one-window passes)
  - q_lake_sync                              (diff read ∝ table size —
    expect ~linear: the sync MUST rescan both sides to diff)
  - q_hierarchy_path                         (path carry doubles string
    payload per round)
  - q_hierarchy_closure                      (re-spot after the
    saturation fix removed the wasted composes)

Prints @@-prefixed lines for the SCALE.md table.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

import bench as B

QUERIES = [
    "q_join_asof_forward",
    "q_join_window_agg",
    "q_skyline",
    "q_funnel_deadline",
    "q_stream_funnel_deadline",
    "q_sessionize_attribution",
    "q_retention_curve",
    "q_lake_sync",
    "q_hierarchy_path",
    "q_hierarchy_closure",
]
SCALES = [
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/sf1", "sf1"),
    ("/tmp/sf10", "sf10"),
]

spark = get_spark("scale-spot-sf10-r11")

for sf_dir, label in SCALES:
    # warm the scan path once per scale so JIT/IO cold-start doesn't
    # land on the first measured query
    REGISTRY["q_pricing_summary"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        fp = B._plan_fingerprint(fn(spark, sf_dir))
        print(
            f"@@ {label} {name}: best={min(runs)} runs={runs} fp={fp[:12]}",
            flush=True,
        )
