"""Round-14 derived-parameter engagement spots (round-13 verdict #2).

K and the index bucket counts are now data-derived with floors at the
round-13 constants. This script proves BOTH halves of that contract
on the decade fixtures:

  1. the derivations ENGAGE (K=58 at vsf10's 200k-vector corpus;
     1024 LSH/BM25 buckets at sf10's 500k docs) — printed from the
     same functions the queries call;
  2. the engaged configuration is CORRECT — q_dedup_semantic runs the
     full DuckDB hash-parity gate at vsf10 (the oracle derives the
     identical K from COUNT(*), so this is a true end-to-end check of
     the derivation agreeing across engines), and timed spots show
     the per-decade cost.

Run: python scripts/scale_spot_r14.py   (needs /tmp/vsf10 + /tmp/sf10
from gen_vec_sf.py / gen_sf10.py). Prints @@-lines for SCALE.md.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.queries.dedup_q import _lsh_nb
from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
    _sd_k_for,
)
from docker_based_real_time_etl_project_spark.queries.materialize import (
    table_rows,
)
from docker_based_real_time_etl_project_spark.queries.text import _bm25_nb
from docker_based_real_time_etl_project_spark.session import get_spark

for sf in ("/root/testdata/sf0.1", "/tmp/vsf1", "/tmp/vsf10"):
    n = table_rows(sf, "embeddings")
    print(f"@@ derived K at {sf}: corpus={n + n//7 + n//21} "
          f"K={_sd_k_for(n + n//7 + n//21)}", flush=True)
for sf in ("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"):
    print(f"@@ derived NB at {sf}: docs={table_rows(sf, 'documents')} "
          f"lsh_nb={_lsh_nb(sf)} bm25_nb={_bm25_nb(sf)}", flush=True)

spark = get_spark("scale-spot-r14")

# engaged-K correctness: the full hash gate at the 200k-vector decade
r = check_query(spark, "/tmp/vsf10", "q_dedup_semantic")
print(f"@@ parity vsf10 q_dedup_semantic (K engaged) ok={r.ok} "
      f"{r.detail if not r.ok else ''}", flush=True)

# engaged-K cost: timed spots across the vector decades
for sf_dir, label in (("/tmp/vsf1", "vsf1(20k,K=8)"),
                      ("/tmp/vsf10", "vsf10(200k,K=58)")):
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        REGISTRY["q_dedup_semantic"].fn(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(f"@@ q_dedup_semantic {label} {min(runs):.2f}s", flush=True)
