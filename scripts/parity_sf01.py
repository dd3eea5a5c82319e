"""Full-registry oracle parity at sf0.1 -> PARITY_SF01_r{N}.json.

100x the unit-test scale: the same hash-equality gate the driver runs
at sf0.01, executed for EVERY registered query against DuckDB truth
at sf0.1. The all-pairs oracles (minhash pairs, ngram jaccard,
cluster closure) dominate first-run wall time — the quadratic cost
lives in the oracle, which is the point. Round 9: oracle results
costing >10 s are cached on disk keyed by (query, SQL digest, table
fingerprints) — see oracle.run_oracle — so warm sweeps skip the
quadratic truth recomputation entirely; the comparison itself always
runs fresh.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/PARITY_SF01_r7.json"
s = get_spark("parity-sf01")
res = {}
bad = 0
for n in sorted(REGISTRY):
    t0 = time.time()
    r = check_query(s, "/root/testdata/sf0.1", n)
    res[n] = {"ok": r.ok, "detail": str(r.detail)[:120], "sec": round(time.time() - t0, 1)}
    if not r.ok:
        bad += 1
        print(f"@@ FAIL {n}: {r.detail}", flush=True)
    json.dump(res, open(OUT, "w"), indent=0)
print(f"@@ done {len(res)} queries, {bad} failures", flush=True)
