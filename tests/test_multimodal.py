"""Multimodal plumbing: Arrow round-trips, 1:N frame explode, null
payloads, and the codec seam raising cleanly when fake=False.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
)
from docker_based_real_time_etl_project_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def test_media_schema_and_kinds(media):
    # names+types must match the declared contract (nullability is
    # derivation-dependent and not part of it)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # audio has no dims, image has no duration
    assert media.filter((F.col("kind") == "audio") & F.col("meta.width").isNotNull()).count() == 0
    assert media.filter((F.col("kind") == "image") & F.col("meta.duration_ms").isNotNull()).count() == 0


def test_features_shape_and_determinism(spark, media):
    f1 = decode_features(media, n_features=8)
    rows = {r.media_id: r.features for r in f1.collect()}
    assert all(len(v) == 8 for v in rows.values())
    # re-run: bit-identical (fake forward pass is deterministic)
    rows2 = {r.media_id: r.features for r in decode_features(media, 8).collect()}
    assert rows == rows2


def test_features_null_content(spark):
    df = spark.createDataFrame(
        [(1, "image", None, None)], schema=MEDIA_SCHEMA
    )
    feats = decode_features(df, n_features=4).collect()[0].features
    assert feats == [0.0, 0.0, 0.0, 0.0]


def test_resize_bounds_and_aspect(media):
    out = resize_images(media, max_side=256)
    bad = out.filter(
        (F.col("meta.width") > 256) | (F.col("meta.height") > 256)
    ).count()
    assert bad == 0
    # no upscaling: images already within bounds keep exact dims
    orig = media.filter(F.col("kind") == "image").select(
        "media_id", F.col("meta.width").alias("ow"), F.col("meta.height").alias("oh")
    )
    joined = out.select(
        "media_id", F.col("meta.width").alias("nw"), F.col("meta.height").alias("nh")
    ).join(orig, "media_id")
    assert joined.filter((F.col("nw") > F.col("ow")) | (F.col("nh") > F.col("oh"))).count() == 0
    unchanged = joined.filter((F.col("ow") <= 256) & (F.col("oh") <= 256))
    assert unchanged.filter((F.col("nw") != F.col("ow")) | (F.col("nh") != F.col("oh"))).count() == 0


def test_frame_sample_cardinality(media):
    frames = sample_frames(media, every_ms=1000)
    per = frames.groupBy("media_id").count()
    joined = media.filter(F.col("kind") == "video").join(per, "media_id", "left")
    # every video yields duration_ms/1000 frames
    bad = joined.filter(
        F.col("count") != (F.col("meta.duration_ms") / 1000).cast("long")
    ).count()
    assert bad == 0


def test_codec_seam_raises(spark, media):
    with pytest.raises(Exception) as ei:
        decode_features(media, fake=False).count()
    assert "codec" in str(ei.value) or "NotImplemented" in str(ei.value)
