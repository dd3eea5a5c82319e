"""Round-13 second decade-spot batch: the text/sampling additions over
the document-scaling fixtures (/tmp/sf1 = 50k docs, /tmp/sf10 = 500k),
with sf1 hash parity where the DuckDB truth is tractable (the LSH
index's all-pairs oracle is O(n^2) in DuckDB at 50k docs, so that row
records wall time only — its correctness lives in the 3-SF gates).

Run: python scripts/scale_spot_r13b.py   (after gen_sf1/gen_sf10)
Prints @@-prefixed lines for the SCALE.md table.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

TIMED = [
    "q_corpus_shard",
    "q_sample_dsir",
    "q_bpe_encode_unseen",
    "q_lsh_index_persisted",
]
PARITY_SF1 = ["q_corpus_shard", "q_sample_dsir", "q_bpe_encode_unseen"]
SCALES = [
    ("/tmp/sf1", "sf1(50k docs)"),
    ("/tmp/sf10", "sf10(500k docs)"),
]

spark = get_spark("scale-spot-r13b")

for sf_dir, label in SCALES:
    for name in TIMED:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"@@ {name} {label} {min(runs):.2f}s", flush=True)

for name in PARITY_SF1:
    r = check_query(spark, "/tmp/sf1", name)
    print(f"@@ parity sf1 {name} ok={r.ok} {r.detail if not r.ok else ''}",
          flush=True)
print("@@ all done", flush=True)
