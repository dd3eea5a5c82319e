"""Pre-validate the driver correctness window before the driver runs it.

Replays exactly what the driver's gate does — the first 50 entries of
``__spark_entry__.queries()`` at sf0.01, each hash-compared against its
DuckDB oracle — so a rotation that surfaces a stale/never-checked query
with a latent column-alias or hash mismatch fails HERE, not in
CORRECTNESS_r{N}.json. Writes PRECHECK_WINDOW.json (gitignored-or-not,
it's evidence either way).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.session import get_spark

sys.path.insert(0, "/root/repo")
import importlib

entry_mod = importlib.import_module("__spark_entry__")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/PRECHECK_WINDOW.json"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 50

window = list(entry_mod.queries())[:N]
s = get_spark("precheck-window")
res = {}
bad = 0
for n in window:
    t0 = time.time()
    r = check_query(s, SF_DIR, n)
    res[n] = {"ok": r.ok, "detail": str(r.detail)[:120], "sec": round(time.time() - t0, 1)}
    if not r.ok:
        bad += 1
        print(f"@@ FAIL {n}: {r.detail}", flush=True)
    json.dump(res, open(OUT, "w"), indent=0)
print(f"@@ done {len(res)} window queries at {SF_DIR}, {bad} failures", flush=True)
