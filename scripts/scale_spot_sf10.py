"""100x growth spot (round-10 verdict item 3): the sort-bound and lake
paths at /tmp/sf10 (generate with scripts/gen_sf1.py + gen_sf10.py).

Measures, at sf0.1 / sf1 / sf10 (1x / 10x / 100x the official parity
scale):
  - q_autocorr           (the steepest 10x ratio in round 9 — sort-bound)
  - q_token_budget       (two-phase prefix scan)
  - q_dedup_span_corpus  (postings + islands, the corpus-wide dedup)
  - q_lake_point_lookup  (expect ~constant files OPENED as the table
                          grows 34 -> 316 -> ~3160 files)
  - distributed bloom index build (snap_init with bloom_col on orders)
  - one optimistic-CAS two-writer race (conflict cost should be flat —
    a rebase is one manifest read, independent of table size)

Prints @@-prefixed lines for the SCALE.md table.
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

import bench as B

QUERIES = ["q_autocorr", "q_token_budget", "q_dedup_span_corpus"]
SCALES = [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1"), ("/tmp/sf10", "sf10")]

spark = get_spark("scale-spot-sf10")
results = {}

for sf_dir, label in SCALES:
    REGISTRY["q_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        fp = B._plan_fingerprint(fn(spark, sf_dir))
        results[(name, label)] = (min(runs), fp)
        print(f"@@ {label} {name}: best={min(runs)} runs={runs} fp={fp[:12]}", flush=True)

# --- lake point lookup: time + files-opened at each scale ---
from docker_based_real_time_etl_project_spark.queries.sources_q import (
    _POINT_KEYS,
    _orders_snap_bloom,
)
from docker_based_real_time_etl_project_spark.lakesnap import (
    snap_files,
    snap_point_files,
)

for sf_dir, label in SCALES:
    path = _orders_snap_bloom(spark, sf_dir)
    total = len(snap_files(path))
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        REGISTRY["q_lake_point_lookup"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 2))
    opened = len(snap_point_files(spark, path, list(_POINT_KEYS)))
    results[("q_lake_point_lookup", label)] = (min(runs), f"opened={opened}")
    print(f"@@ {label} q_lake_point_lookup: best={min(runs)} runs={runs} files_total={total} files_opened={opened}", flush=True)

# --- distributed bloom build: snap_init(bloom) wall on orders ---
from docker_based_real_time_etl_project_spark import lakesnap as LS
from docker_based_real_time_etl_project_spark.lakesnap import snap_init

for sf_dir, label in SCALES:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tempfile.mkdtemp(prefix=f"bloomscale_{label}_")
    t0 = time.perf_counter()
    snap_init(
        spark, orders, out, "o_orderpriority", sort_by=("o_orderkey",),
        target_rows_per_file=5_000, bloom_col="o_orderkey", bloom_bits=131072,
    )
    wall = round(time.perf_counter() - t0, 2)
    n_files = len(snap_files(out))
    print(
        f"@@ {label} bloom_build: init_wall={wall} files={n_files} "
        f"max_buffered_bitmaps={LS._LAST_MAX_BUFFERED_BITMAPS}",
        flush=True,
    )
    results[("bloom_build", label)] = (wall, f"files={n_files}")
    shutil.rmtree(out, ignore_errors=True)

# --- CAS race: loser's conflict handling cost at each scale ---
import pyspark.sql.functions as F

from docker_based_real_time_etl_project_spark.lakesnap import (
    snap_merge_concurrent,
)

for sf_dir, label in SCALES:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = tempfile.mkdtemp(prefix=f"casscale_{label}_")
    snap_init(spark, orders, path, "o_orderpriority", sort_by=("o_orderkey",), target_rows_per_file=100_000)

    def upd(part, mod, delta):
        return orders.filter(
            (F.col("o_orderpriority") == part) & (F.col("o_orderkey") % 1000 == mod)
        ).withColumn("o_totalprice", F.col("o_totalprice") + delta)

    t_rebase = {}

    def competing():
        v = snap_merge_concurrent(spark, path, upd("2-HIGH", 3, 11.0), key_cols=("o_orderkey",), writer_id="wB")
        assert v == 2
        t_rebase["start"] = time.perf_counter()

    t0 = time.perf_counter()
    v = snap_merge_concurrent(
        spark, path, upd("1-URGENT", 3, 7.0), key_cols=("o_orderkey",),
        writer_id="wA", _before_publish=competing,
    )
    total_wall = round(time.perf_counter() - t0, 2)
    rebase_wall = round(time.perf_counter() - t_rebase["start"], 3)
    assert v == 3
    print(
        f"@@ {label} cas_race: loser_total={total_wall} "
        f"conflict_handling(after competing commit, incl rebase CAS)={rebase_wall}",
        flush=True,
    )
    shutil.rmtree(path, ignore_errors=True)

print("@@ --- ratios vs sf0.1 (10x / 100x data) ---", flush=True)
for name in QUERIES + ["q_lake_point_lookup", "bloom_build"]:
    a = results[(name, "sf0.1")][0]
    b = results[(name, "sf1")][0]
    c = results[(name, "sf10")][0]
    extra = results[(name, "sf10")][1]
    print(f"@@ {name}: {a} -> {b} -> {c}  r10={round(b/a,2)} r100={round(c/a,2)}  [{extra}]", flush=True)
