"""Similarity search over embedding columns (north-star: ANN for a
training-data pipeline).

Baseline: brute-force cosine top-k -- a broadcast of the query
vector(s) and one linear scan with an expression-level dot product
(zip_with + aggregate, all codegen'd; no Python per row).

Scale path: random-hyperplane LSH -- sign-bit bucket per vector
(computed once, cheap), candidates only within matching buckets (plus
optional multi-probe), exact re-rank on the candidate set. Turns the
100 TB scan-per-query into a partition-pruned bucket lookup.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Expression-level dot product of two array columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small) query
    side, score every corpus vector, TakeOrderedAndProject per query.

    Deterministic: cosine rounded to 6 dp before ranking, ties broken
    by corpus id -- stable across engines and partitionings."""
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(query_df)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign is used)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id for a vector: bit i = sign(dot(v, plane_i)).
    Pure expression: the planes are literal arrays folded into the plan."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.shiftleft(F.when(dot(vec_col, plane) >= 0, 1).otherwise(0).cast("long"), i))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by sign-LSH, exact
    cosine re-rank within the matched bucket only.

    At scale the corpus side is written partitioned/bucketed by the LSH
    bucket id, so a query touches one bucket's files -- recall is traded
    via n_planes (fewer planes = bigger buckets = higher recall/cost).
    """
    from pyspark.sql import Window

    corpus = df.select(id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("_bucket"))
    queries = query_df.select(
        query_id_col, query_vec_col, lsh_bucket(F.col(query_vec_col), planes).alias("_qbucket")
    )
    scored = corpus.join(
        F.broadcast(queries), corpus._bucket == queries._qbucket
    ).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )
