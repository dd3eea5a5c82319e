"""Multimodal query surface: opaque-binary media columns with typed
metadata, exercised end-to-end through the real mapInPandas plumbing
on synthesized media derived deterministically from `documents`.

The oracles reproduce the *metadata algebra* (kind derivation, resize
scaling, frame-sampling cardinality) in SQL -- so the Arrow round-trip,
the 1:N mapInPandas explode, and the meta math are all hash-checked;
only the byte contents themselves (codec territory) stay rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
)
from docker_based_real_time_etl_project_spark.queries.registry import register, table

# synth_media's derivations, restated in DuckDB SQL
_KIND = "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"
_W = "CAST(doc_id % 8 * 64 + 64 AS INT)"
_H = "CAST(doc_id % 5 * 64 + 64 AS INT)"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_media_meta_stats",
    oracle=f"""
    SELECT {_KIND} AS kind,
           COUNT(*) AS n,
           AVG(CASE WHEN {_KIND} <> 'audio' THEN {_W} END) AS avg_width,
           CAST(SUM(CASE WHEN {_KIND} <> 'image' THEN (doc_id % 30 + 1) * 1000 ELSE 0 END) AS BIGINT) AS total_duration_ms,
           CAST(SUM(32) AS BIGINT) AS total_bytes  -- sha-256 payload = 32 bytes/row
    FROM documents
    GROUP BY 1
    """,
    tags=("multimodal",),
)
def q_media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata scan over the media table: per-kind counts, pixel
    dims, durations, payload bytes (sha-256 payload = 32 bytes each).
    Metadata-only pruning: the binary column never leaves the scan."""
    m = _media(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("total_duration_ms"),
        F.sum(F.octet_length("content")).alias("total_bytes"),
    )


@register(
    "q_media_resize_meta",
    oracle=f"""
    SELECT media_id,
           CAST(FLOOR(w * s) AS INT) AS width,
           CAST(FLOOR(h * s) AS INT) AS height
    FROM (
      SELECT doc_id AS media_id, {_W} AS w, {_H} AS h,
             LEAST(1.0, 256.0 / GREATEST({_W}, {_H})) AS s
      FROM documents WHERE doc_id % 3 = 0
    )
    """,
    tags=("multimodal",),
)
def q_media_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through mapInPandas (Arrow round-trip of the binary
    + struct columns): verified on the resized dimensions."""
    resized = resize_images(_media(spark, sf_dir), max_side=256)
    return resized.select(
        "media_id", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )


@register(
    "q_media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(g.i AS INT) AS frame_idx,
           CAST(g.i * 1000 AS BIGINT) AS frame_ms
    FROM documents, unnest(generate_series(0, CAST(doc_id % 30 AS BIGINT))) AS g(i)
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal",),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1:N mapInPandas explode, one row per
    1000 ms frame. The oracle pins the exact (media_id, frame_idx,
    frame_ms) set -- i.e. the output cardinality contract of the
    Arrow-side explode -- while frame bytes stay engine-side."""
    frames = sample_frames(_media(spark, sf_dir), every_ms=1000)
    return frames.select("media_id", "frame_idx", "frame_ms")


@register("q_media_features", oracle=None, tags=("multimodal",))
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extraction plumbing: binary -> 8-dim vector via
    mapInPandas (deterministic fake standing in for a model forward
    pass). Rows-only: the vector math is engine-side by design."""
    feats = decode_features(_media(spark, sf_dir), n_features=8)
    return feats.select(
        "media_id",
        "kind",
        F.size("features").alias("dim"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )
