"""Embedding-column operators beyond ANN search: per-label centroids
(the k-means E-step / per-class mean primitive that IVF training
builds on -- operators/similarity.py trains with the same shape) and
per-vector norms.

Scale shape: centroids are a long-format (label, dim) aggregation --
posexplode then one hash aggregate with map-side partials, so the
shuffle carries n_labels x dim partial rows per task, never vectors.
The wide embedding array itself is only read, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import register, table


@register(
    "q_embed_centroids",
    oracle="""
    WITH flat AS (
      SELECT label,
             unnest(embedding) AS v,
             unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / COUNT(*) AS centroid,
           COUNT(*) AS n_vecs
    FROM flat
    GROUP BY label, pos
    """,
    tags=("embedding",),
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, long format (label, dim, mean): posexplode +
    one hash aggregate. 10 labels x 64 dims -> 640 output rows
    regardless of corpus size.

    Accumulation is in integer NANO-units, not DECIMAL: full-precision
    floats are NOT exactly representable at scale 10, and Spark and
    DuckDB round the double->decimal cast differently (shortest-repr
    HALF_UP vs binary-value rounding), so the dsum idiom that is exact
    on 2-decimal money columns drifts here. round-to-integer agrees
    across engines, the bigint sum is exact and order-free, and the
    1e-9 quantization is far below float32 input precision."""
    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("v").cast("double") * 1e9).cast("bigint").alias("v_nano"),
    )
    return flat.groupBy("label", "pos").agg(
        (F.sum("v_nano").cast("double") / 1e9 / F.count(F.lit(1))).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@register(
    "q_embed_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
    tags=("embedding",),
)
def q_embed_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via expression-level fold (F.aggregate with a
    DOUBLE accumulator -- left-to-right over the array is a fixed order,
    so it is bit-deterministic and engine-portable, unlike a shuffled
    sum). The normalize step of every embedding pipeline; stays inside
    codegen, no Python."""
    e = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )
