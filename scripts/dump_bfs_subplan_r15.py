#!/usr/bin/env python
"""q_bfs_levels' per-round checkpoints truncate the iteration out of
the final plan (the r14 pagerank situation), so the frontier-join
evidence is captured as a ROUND SUBPLAN pair: one BFS round's
neighbor-update DataFrame built exactly as the query builds it, with
the r14 full-vector d-side vs the r15 frontier-filtered d-side.
Writes plans/r15/subplan_bfs_round_{before,after}.txt.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.plans import formatted_plan
from docker_based_real_time_etl_project_spark.queries.graph_q import (
    _BFS_INF, _BFS_SEED,
)
from docker_based_real_time_etl_project_spark.queries.registry import table
from docker_based_real_time_etl_project_spark.session import get_spark

SF = "/root/testdata/sf0.1"
OUT = Path("/root/repo/plans/r15")

spark = get_spark("dump-bfs-subplan-r15")
o = table(spark, SF, "orders")
li = table(spark, SF, "lineitem")
e0 = (
    o.join(li, o.o_orderkey == li.l_orderkey)
    .select((F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"))
    .distinct()
)
e = (
    e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    .unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    .localCheckpoint(eager=True)
)
d = (
    e.select(F.col("src").alias("node")).distinct()
    .select("node",
            F.when(F.expr(_BFS_SEED), F.lit(0)).otherwise(F.lit(_BFS_INF))
            .cast("long").alias("dist"))
    .localCheckpoint(eager=True)
)


def nbr(d_side):
    return (
        e.join(d_side.withColumnRenamed("node", "src"), "src")
        .groupBy("dst").agg((F.min("dist") + 1).alias("nd"))
    )


(OUT / "subplan_bfs_round_before.txt").write_text(formatted_plan(nbr(d)))
(OUT / "subplan_bfs_round_after.txt").write_text(
    formatted_plan(nbr(d.filter(F.col("dist") == 0)))
)
print("@@ wrote bfs round subplans", flush=True)
