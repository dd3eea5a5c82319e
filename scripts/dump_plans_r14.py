#!/usr/bin/env python
"""Dump .explain('formatted') after-plans for the round-14 touched
queries into plans/r14/<query>_after.txt (the judge checks plan claims
against these), plus the per-round k-means assignment SUBPLAN
before/after pair — the final query plans are checkpoint-truncated, so
the per-round shape (where the round-14 Exchange removal lives) must
be captured from the subplan itself.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent.parent / "plans" / "r14"

QUERIES = [
    "q_bpe_train", "q_corpus_pipeline_full", "q_corpus_shard",
    "q_dedup_clusters", "q_dedup_semantic", "q_dedup_semantic_keep",
    "q_dedup_semantic_text", "q_dedup_span_remove", "q_fuzzy_clusters",
    "q_hierarchy_closure", "q_kmeans_lloyd", "q_label_propagation",
    "q_lake_merge", "q_pagerank", "q_pagerank_ppr", "q_pagerank_weighted",
    "q_token_budget",
]


def main() -> None:
    from docker_based_real_time_etl_project_spark.plans import formatted_plan
    from docker_based_real_time_etl_project_spark.queries import REGISTRY
    from docker_based_real_time_etl_project_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("dump-plans-r14")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in QUERIES:
        df = REGISTRY[name].fn(spark, SF)
        (OUT / f"{name}_after.txt").write_text(formatted_plan(df))
        print("wrote", name, flush=True)

    # k-means assignment subplan, before vs after: load the pre-round
    # embeddings_q from git and plan one assignment round from each.
    from docker_based_real_time_etl_project_spark.queries import (
        embeddings_q as new_eq,
    )
    from docker_based_real_time_etl_project_spark.queries.registry import table

    old_src = subprocess.run(
        ["git", "show",
         "455614d:docker_based_real_time_etl_project_spark/queries/embeddings_q.py"],
        capture_output=True, text=True, cwd=OUT.parent.parent, check=True,
    ).stdout
    old_path = "/tmp/_old_embeddings_q_r14.py"
    Path(old_path).write_text(old_src)
    spec = importlib.util.spec_from_file_location("_old_eq", old_path)
    old_eq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_eq)

    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(ROUND(CAST(x AS DOUBLE) * {new_eq._KM_Q}) AS BIGINT))"
        ).alias("v"),
    )
    cents = e.filter(F.col("vec_id") < new_eq._KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    (OUT / "subplan_km_assign_before.txt").write_text(
        formatted_plan(old_eq._km_assign(e, cents))
    )
    (OUT / "subplan_km_assign_after.txt").write_text(
        formatted_plan(new_eq._km_assign(e, cents))
    )
    # SemDeDup pair-generation subplan, before vs after (self-join ->
    # one-exchange in-expression expansion)
    corpus = new_eq._sd_corpus(spark, SF).localCheckpoint(eager=True)
    (OUT / "subplan_sd_pairs_before.txt").write_text(
        formatted_plan(old_eq._sd_pairs(corpus))
    )
    (OUT / "subplan_sd_pairs_after.txt").write_text(
        formatted_plan(new_eq._sd_pairs(corpus))
    )
    print("wrote subplans", flush=True)


if __name__ == "__main__":
    main()
