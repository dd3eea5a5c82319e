"""Similarity-search query surface: brute-force cosine top-k
(SQL-oracled -- exact math with stable rounding + tiebreak) and the
LSH-bucketed approximate variant (rows-only: bucketing is
seed/engine-specific even though the re-rank math is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.similarity import brute_force_topk, hyperplanes, lsh_topk
from docker_based_real_time_etl_project_spark.queries.registry import register, table

# fixed query set: every 100th vector -- deterministic, scales with corpus
_QUERY_IDS = (0, 100, 200, 300, 400)
_Q_SQL = "(" + ", ".join(str(i) for i in _QUERY_IDS) + ")"


def _query_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id").isin(list(_QUERY_IDS))).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


@register(
    "q_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id IN {_Q_SQL}),
    scored AS (
      SELECT q.q_id, v.vec_id,
             ROUND(list_dot_product(v.e, q.qe)
                   / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))),
                   6) AS cosine_sim
      FROM v, q
    ),
    ranked AS (
      SELECT q_id, vec_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    )
    SELECT q_id, vec_id, cosine_sim, rnk FROM ranked WHERE rnk <= 10
    """,
    tags=("similarity", "flagship"),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-10 cosine neighbors for 5 fixed query
    vectors. Query side broadcast; corpus scanned once; ranking on
    rounded cosine with vec_id tiebreak is cross-engine deterministic."""
    e = table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, _query_df(spark, sf_dir), k=10)


@register("q_ann_lsh", oracle=None, tags=("similarity", "approx"))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via 8-plane sign-LSH bucketing + exact re-rank
    within the matched bucket. Recall vs brute force is pytest-checked;
    rows-only here (bucket membership is seed-specific)."""
    e = table(spark, sf_dir, "embeddings")
    planes = hyperplanes(dim=64, n_planes=8, seed=42)
    return lsh_topk(e, _query_df(spark, sf_dir), planes, k=10)


_RECALL_GATE = 0.6  # matches the pytest gate in tests/test_scale_ops.py

_RECALL_ORACLE = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id IN {_Q_SQL}),
ranked AS (
  SELECT q.q_id, v.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.q_id
                            ORDER BY ROUND(list_dot_product(v.e, q.qe)
                                  / (sqrt(list_dot_product(v.e, v.e))
                                     * sqrt(list_dot_product(q.qe, q.qe))), 6) DESC,
                            v.vec_id) AS rnk
  FROM v, q
)
SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
FROM ranked WHERE rnk <= 10 GROUP BY q_id
"""


def _recall_df(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """(q_id, n_exact, recall_ok): per-query recall@10 of the approximate
    result vs exact brute force, collapsed to the >= gate boolean. The
    raw hit count is engine-specific (bucket/cell seeds), so only the
    gate verdict is exposed to the hash compare -- but the row goes RED
    in CORRECTNESS if recall ever collapses, which is the contract."""
    # approx/exact share lineage (same source DataFrames), so df-attribute
    # join conditions resolve trivially true -- rename the approx side
    # to fresh columns and join on unambiguous names instead
    a = approx.select(F.col("q_id").alias("a_qid"), F.col("vec_id").alias("a_vec"))
    hits = exact.select("q_id", "vec_id").join(
        a,
        (F.col("q_id") == F.col("a_qid")) & (F.col("vec_id") == F.col("a_vec")),
        "left_semi",
    )
    n_hits = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hit"))
    n_exact = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        n_exact.join(n_hits, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")
                >= F.lit(_RECALL_GATE)
            ).alias("recall_ok"),
        )
    )


@register("q_ann_lsh_recall", oracle=_RECALL_ORACLE, tags=("similarity", "approx"))
def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible recall contract for multi-table sign-LSH ANN:
    recall@10 vs the exact top-10 must clear the 0.6 gate for every
    query vector (measured >= 0.9 at test SFs with 3 planes x 12
    tables -- the synthetic corpus is near-random, so OR-amplification
    has to carry all of the recall; a single 8-plane table measured
    ~0.1). The oracle recomputes the exact side and expects
    recall_ok=TRUE rows."""
    from docker_based_real_time_etl_project_spark.operators.similarity import (
        lsh_tables, lsh_topk_multi,
    )

    e = table(spark, sf_dir, "embeddings")
    q = _query_df(spark, sf_dir)
    tables = lsh_tables(dim=64, n_planes=3, n_tables=12, seed=42)
    return _recall_df(lsh_topk_multi(e, q, tables, k=10), brute_force_topk(e, q, k=10))


@register("q_ann_ivf_recall", oracle=_RECALL_ORACLE, tags=("similarity", "approx"))
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible recall contract for IVF ANN (probe-4 of 8 cells;
    probe-2 measured 0.3-0.5 per-query on the unstructured corpus):
    recall@10 vs exact top-10 >= 0.6 per query, oracled like the LSH
    twin (measured >= 0.7 at test SFs)."""
    from docker_based_real_time_etl_project_spark.operators.similarity import ivf_topk, ivf_train

    e = table(spark, sf_dir, "embeddings")
    q = _query_df(spark, sf_dir)
    centroids = ivf_train(e, n_centroids=8, iters=3)
    return _recall_df(
        ivf_topk(e, q, centroids, n_probe=4, k=10), brute_force_topk(e, q, k=10)
    )


@register("q_ann_ivf", oracle=None, tags=("similarity", "approx"))
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer (8 cells, 3 Lloyd
    rounds), probe-2 search, exact re-rank inside probed cells. At scale
    the corpus is laid out partitioned by cell so each query reads
    n_probe partitions. Rows-only (cell boundaries are engine-side);
    recall vs brute force is pytest-gated."""
    from docker_based_real_time_etl_project_spark.operators.similarity import ivf_topk, ivf_train

    e = table(spark, sf_dir, "embeddings")
    centroids = ivf_train(e, n_centroids=8, iters=3)
    return ivf_topk(e, _query_df(spark, sf_dir), centroids, n_probe=2, k=10)
