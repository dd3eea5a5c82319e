#!/usr/bin/env python
"""Dump .explain('formatted') plans for the round-15 touched queries
into plans/r15/<query>_<suffix>.txt.

Usage: python dump_plans_r15.py <tree_path> <suffix>

Run once with the r14 tree (suffix 'before') and once with HEAD
(suffix 'after'); the judge checks plan claims against these files.
The serve-path queries (q_*_persisted) are included for the V#7
audit: their dumps must show the probed-bucket/cell partition pruning
on the index read.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

TREE = sys.argv[1]
SUFFIX = sys.argv[2]
sys.path.insert(0, TREE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path("/root/repo/plans/r15")

QUERIES = [
    "q_contamination", "q_contamination_bloom", "q_corpus_pipeline_full",
    "q_dedup_semantic", "q_dedup_semantic_keep", "q_dedup_semantic_text",
    "q_bfs_levels",
    "q_lsh_index_persisted", "q_bm25_index_persisted", "q_ann_ivf_persisted",
]


def main() -> None:
    from docker_based_real_time_etl_project_spark.plans import formatted_plan
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.session import get_spark

    spark = get_spark(f"dump-plans-r15-{SUFFIX}")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in QUERIES:
        df = REGISTRY[name].fn(spark, SF)
        (OUT / f"{name}_{SUFFIX}.txt").write_text(formatted_plan(df))
        print("@@ wrote", name, SUFFIX, flush=True)


if __name__ == "__main__":
    main()
