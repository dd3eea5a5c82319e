"""Round-14 OPTIMIZATION decade spots: sf0.1 -> /tmp/sf1 growth for
the operators this round restructured (contraction CC, one-barrier
PageRank, shuffle-free Lloyd's assignment) — evidence that the new
shapes scale linearly, not just that they are faster locally.

Methodology identical to scripts/scale_spot.py: warm session, noop
sink, best-of-2 per (query, sf); /tmp/sf1 from scripts/gen_sf1.py
(lineitem/orders/documents/events 10x, embeddings fixed — so the
graph/fuzzy families grow 10x while the semantic family pins the
fixed-corpus overhead floor).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

QUERIES = [
    "q_label_propagation",   # contraction CC not used, Pregel rounds — edge 10x
    "q_pagerank",            # one-barrier iterations — edge 10x
    "q_pagerank_ppr",
    "q_bfs_levels",
    "q_fuzzy_clusters",      # contraction CC over ED-1 pair graph — vocab grows
    "q_dedup_clusters",      # contraction CC over minhash pair graph — docs 10x
    "q_corpus_shard",        # literal-total prefix scan — docs 10x
    "q_token_budget",
]

spark = get_spark("scale-spot-r14-opt")
REGISTRY["q_pricing_summary"].fn(spark, "/root/testdata/sf0.1").write.format(
    "noop"
).mode("overwrite").save()

for name in QUERIES:
    row = [name]
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        row.append(min(runs))
    print(
        f"SPOT {row[0]}: sf0.1={row[1]:.2f}s sf1={row[2]:.2f}s "
        f"ratio={row[2] / row[1]:.1f}x",
        flush=True,
    )
