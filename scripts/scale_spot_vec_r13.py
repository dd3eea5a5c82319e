"""Round-13 vector-workload decade spots (round-12 verdict item 5).

The embeddings fixture is fixed-size across the shipped SFs, so the
vector queries' decade rows in SCALE.md were vacuous. This script runs
them over the scale-honest vector fixtures from gen_vec_sf.py (20k /
200k vectors — true 10x/100x of the sf0.1 table) and, at vsf1, also
runs the full DuckDB hash-parity gate so the scale point is oracled,
not just timed.

Run: python scripts/gen_vec_sf.py && python scripts/scale_spot_vec_r13.py
Prints @@-prefixed lines for the SCALE.md table.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

QUERIES = [
    "q_kmeans_lloyd",
    "q_dedup_semantic",
    "q_ann_ivf_persisted",
]
SCALES = [
    ("/root/testdata/sf0.1", "sf0.1(2k vecs)"),
    ("/tmp/vsf1", "vsf1(20k vecs)"),
    ("/tmp/vsf10", "vsf10(200k vecs)"),
]

spark = get_spark("scale-spot-vec-r13")

for sf_dir, label in SCALES:
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"@@ {name} {label} {min(runs):.2f}s", flush=True)

# oracle gate at vsf1: the decade point must be CORRECT, not just fast
for name in QUERIES:
    r = check_query(spark, "/tmp/vsf1", name)
    print(f"@@ parity vsf1 {name} ok={r.ok} {r.detail if not r.ok else ''}",
          flush=True)
