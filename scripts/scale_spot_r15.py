"""Round-15 decade spots (r14 verdict #3 and #8): growth ratios for
the paths this and the previous optimization round restructured but
had not yet priced at scale — the SemDeDup family (+ its pair stage),
the capstone, the contamination screen, frontier BFS (vs the r14
full-vector 3.4x/decade), and the round-15 one-pass LSH/BM25 index
builds.

Document fixtures: sf0.1 (5k docs) -> /tmp/sf1 (50k docs, gen_sf1.py).
Vector fixtures: sf0.1 (2k vecs) -> /tmp/vsf1 (20k) -> /tmp/vsf10
(200k, gen_vec_sf.py). Methodology as every prior spot script: warm
session, noop sink, best-of-2 per (query, scale); vsf1 additionally
runs the full DuckDB hash-parity gate so the new q_dedup_semantic_keep
spot is oracled, not just timed (q_dedup_semantic/vsf1 was oracled in
round 13; the doc-fixture queries' shipped evidence is their 3-SF
gates).

Run: python scripts/gen_sf1.py && python scripts/gen_vec_sf.py &&
     python scripts/scale_spot_r15.py
Prints @@-prefixed lines for the SCALE.md table.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY
from docker_based_real_time_etl_project_spark.session import get_spark

DOC_QUERIES = [
    "q_contamination",
    "q_dedup_semantic_text",
    "q_corpus_pipeline_full",
    "q_bfs_levels",
    "q_label_propagation",
]
DOC_SCALES = [
    ("/root/testdata/sf0.1", "sf0.1(5k docs)"),
    ("/tmp/sf1", "sf1(50k docs)"),
]
VEC_QUERIES = ["q_dedup_semantic", "q_dedup_semantic_keep"]
VEC_SCALES = [
    ("/root/testdata/sf0.1", "sf0.1(2k vecs)"),
    ("/tmp/vsf1", "vsf1(20k vecs)"),
    ("/tmp/vsf10", "vsf10(200k vecs)"),
]

spark = get_spark("scale-spot-r15")


def best2(fn, sf_dir) -> float:
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


for sf_dir, label in DOC_SCALES:
    for name in DOC_QUERIES:
        print(f"@@ {name} {label} {best2(REGISTRY[name].fn, sf_dir):.2f}s",
              flush=True)
    # round-15 one-pass index builds: time the BUILD at each doc scale
    # (fresh output dir each call; the banding/postings pass is the
    # cost, the slice filters ride it)
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        _lsh_index_snap,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        _MATERIALIZATION_CACHE,
    )
    from docker_based_real_time_etl_project_spark.queries.text import (
        _bm25_index_snap,
    )

    for bname, bfn in (("lsh_index_build", _lsh_index_snap),
                       ("bm25_index_build", _bm25_index_snap)):
        runs = []
        for _ in range(2):
            # drop the session cache so each timing is a real build
            for k in [k for k in _MATERIALIZATION_CACHE
                      if k[1] == sf_dir and ("lsh_index" in k[0] or "bm25_index" in k[0])]:
                del _MATERIALIZATION_CACHE[k]
            t0 = time.perf_counter()
            bfn(spark, sf_dir)
            runs.append(time.perf_counter() - t0)
        print(f"@@ {bname} {label} {min(runs):.2f}s", flush=True)

for sf_dir, label in VEC_SCALES:
    for name in VEC_QUERIES:
        print(f"@@ {name} {label} {best2(REGISTRY[name].fn, sf_dir):.2f}s",
              flush=True)
    # the pair STAGE alone (fit + sub-split + in-expression expansion)
    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _sd_corpus, _sd_n_rows, _sd_pairs,
    )

    runs = []
    for _ in range(2):
        corpus = _sd_corpus(spark, sf_dir).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        _sd_pairs(corpus, n_rows=_sd_n_rows(sf_dir)).write.format(
            "noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(f"@@ sd_pair_stage {label} {min(runs):.2f}s", flush=True)

for name in VEC_QUERIES:
    r = check_query(spark, "/tmp/vsf1", name)
    print(f"@@ parity vsf1 {name} ok={r.ok} {r.detail if not r.ok else ''}",
          flush=True)
