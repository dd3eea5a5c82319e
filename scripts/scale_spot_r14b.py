"""Round-14 decade spots for the new queries: ExactSubstr removal and
the 8-stage capstone, over the document-scaling fixtures (sf1 = 50k
docs, sf10 = 500k docs). Warm best-of-2, noop sink. Prints @@-lines
for SCALE.md."""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

spark = get_spark("scale-spot-r14b")

for name, scales in (
    ("q_dedup_span_remove", ["/tmp/sf1", "/tmp/sf10"]),
    ("q_corpus_pipeline_full", ["/tmp/sf1", "/tmp/sf10"]),
):
    for sf_dir in scales:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"@@ {name} {sf_dir} {min(runs):.2f}s (runs {['%.1f' % r for r in runs]})",
              flush=True)
