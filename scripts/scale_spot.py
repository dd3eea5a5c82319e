import sys, time
sys.path.insert(0, "/root/repo")
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

QUERIES = ["q_market_share", "q_contamination", "q_split_leakage",
           "q_dedup_minhash", "q_dedup_clusters", "q_stream_ohlcv_1h"]

spark = get_spark("scale-spot")
import bench as B
results = {}
for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")):
    # warm parquet footers
    REGISTRY["q_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        fp = B._plan_fingerprint(fn(spark, sf_dir))
        results[(name, label)] = (min(runs), runs, fp)
        print(f"@@ {label} {name}: best={min(runs)} runs={runs} fp={fp[:12]}", flush=True)
print("@@ --- ratios (sf1/sf0.1, 10x data) ---")
for name in QUERIES:
    a, _, fpa = results[(name, "sf0.1")]
    b, _, fpb = results[(name, "sf1")]
    print(f"@@ {name}: {a} -> {b}  ratio={round(b/a,2)}  plan_same={fpa==fpb}", flush=True)
