"""Multimodal plumbing: Arrow round-trips, 1:N frame explode, null
payloads — and the REAL codec path (fake=False): genuine PNG/WAV/APNG
bytes decoded end-to-end, pixel/PCM/frame round-trips exact.
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


def test_real_media_decodes_end_to_end(spark, sf_dir):
    """The seam is CLOSED: genuine PNG/WAV/APNG bytes flow through
    extract_media_meta, decode_features(fake=False), and
    sample_frames(fake=False) with no NotImplementedError — and every
    frame payload is real zlib image data that decompresses to the
    exact scanline byte count (h * (w*3 + 1))."""
    import zlib

    from docker_based_real_time_etl_project_spark.operators.multimodal import (
        extract_media_meta,
        sample_frames,
        synth_real_media,
    )
    from docker_based_real_time_etl_project_spark.queries.registry import table

    docs = table(spark, sf_dir, "documents").limit(30)
    media = synth_real_media(docs, "doc_id")

    meta = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert len(meta) == 30
    for mid, r in meta.items():
        m = mid % 3
        if m == 0:
            assert r.mime == "image/png" and r.width == (mid % 8) * 16 + 16
        elif m == 1:
            assert r.mime == "audio/wav"
            assert r.sample_rate == 8000 + (mid % 3) * 4000
            assert r.duration_ms == (mid % 20 + 1) * 100
        else:
            assert r.mime == "image/apng"
            assert r.duration_ms == (mid % 5 + 2) * (mid % 4 + 1) * 100

    feats = decode_features(
        media.withColumn(
            "meta",
            F.lit(None).cast(
                "struct<mime:string,width:int,height:int,"
                "duration_ms:bigint,sample_rate:int>"
            ),
        ).select("media_id", "kind", "meta", "content"),
        n_features=8,
        fake=False,
    ).collect()
    assert all(len(r.features) == 8 for r in feats)
    # image features carry genuine pixel moments (mean strictly inside (0,1))
    img = [r for r in feats if r.kind == "image"]
    assert img and all(0.0 < r.features[0] < 1.0 for r in img)

    frames = sample_frames(
        media.withColumn(
            "meta",
            F.lit(None).cast(
                "struct<mime:string,width:int,height:int,"
                "duration_ms:bigint,sample_rate:int>"
            ),
        ).select("media_id", "kind", "meta", "content"),
        fake=False,
    ).collect()
    assert frames
    for r in frames:
        mid = r.media_id
        w, h = (mid % 4) * 8 + 8, (mid % 3) * 8 + 8
        assert len(zlib.decompress(bytes(r.frame))) == h * (w * 3 + 1)


def test_real_resize_reparses_exact_dims(spark, sf_dir):
    """resize_images(fake=False): output dims come from RE-PARSING the
    re-encoded bytes and must equal the integer-exact w*64//max
    target; untouched images (max side <= 64) keep original dims and
    round-trip pixels bit-exactly."""
    import numpy as np

    from docker_based_real_time_etl_project_spark.operators import mediacodec as mc
    from docker_based_real_time_etl_project_spark.operators.multimodal import (
        resize_images,
        synth_real_media,
    )
    from docker_based_real_time_etl_project_spark.queries.registry import table

    docs = table(spark, sf_dir, "documents").limit(30)
    media = synth_real_media(docs, "doc_id").withColumn(
        "meta",
        F.lit(None).cast(
            "struct<mime:string,width:int,height:int,"
            "duration_ms:bigint,sample_rate:int>"
        ),
    ).select("media_id", "kind", "meta", "content")
    out = resize_images(media, max_side=64, fake=False).collect()
    assert out
    for r in out:
        mid = r.media_id
        w, h = (mid % 8) * 16 + 16, (mid % 5) * 16 + 16
        m = max(w, h)
        ew, eh = (w, h) if m <= 64 else ((w * 64) // m, (h * 64) // m)
        assert (r.meta.width, r.meta.height) == (ew, eh)
        px = mc.png_decode(bytes(r.content))
        assert px.shape == (eh, ew, 3)


def test_codec_roundtrip_random_dims():
    """Property: PNG encode->decode is pixel-exact and parse-exact for
    arbitrary small dims; WAV encode->parse round-trips rate/duration;
    APNG frame walk returns every frame with its exact delay. Pure
    codec-level (no Spark) so it runs wide cheaply."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docker_based_real_time_etl_project_spark.operators import mediacodec as mc

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=10**6),
    )
    def png_case(w, h, seed):
        px = (
            (np.add.outer(np.arange(h), np.arange(w))[:, :, None]
             + np.arange(3) * 7 + seed) % 256
        ).astype(np.uint8)
        b = mc.png_encode(px)
        meta = mc.png_parse_meta(b)
        assert (meta["width"], meta["height"]) == (w, h)
        assert np.array_equal(mc.png_decode(b), px)

    png_case()

    @settings(max_examples=25, deadline=None)
    @given(
        rate=st.sampled_from([8000, 12000, 16000, 44100]),
        n=st.integers(min_value=1, max_value=5000),
    )
    def wav_case(rate, n):
        s = ((np.arange(n) * 13) % 4096 - 2048).astype("<i2")
        b = mc.wav_encode(s, rate)
        meta = mc.wav_parse_meta(b)
        assert meta["sample_rate"] == rate and meta["n_samples"] == n
        assert meta["duration_ms"] == n * 1000 // rate
        got, r2 = mc.wav_decode(b)
        assert r2 == rate and np.array_equal(got, s)

    wav_case()

    @settings(max_examples=10, deadline=None)
    @given(
        nf=st.integers(min_value=1, max_value=6),
        delays=st.lists(st.integers(min_value=10, max_value=2000), min_size=6, max_size=6),
    )
    def apng_case(nf, delays):
        px = (np.arange(8 * 6 * 3) % 256).astype(np.uint8).reshape(6, 8, 3)
        frames = [((px + f) % 256).astype(np.uint8) for f in range(nf)]
        b = mc.apng_encode(frames, delays[:nf])
        meta = mc.png_parse_meta(b)
        assert meta["n_frames"] == nf
        assert meta["duration_ms"] == sum(delays[:nf])
        walked = mc.apng_frames(b)
        assert [(i, d) for i, d, _ in walked] == list(enumerate(delays[:nf]))

    apng_case()


def test_codec_rejects_corrupt_bytes():
    """A real parser fails LOUDLY on garbage: wrong magic, truncated
    header, and bit-flipped container fields raise instead of
    returning fabricated metadata (the failure mode a carried-along
    fake can never exhibit)."""
    import numpy as np
    import pytest as _pytest

    from docker_based_real_time_etl_project_spark.operators import mediacodec as mc

    with _pytest.raises(ValueError):
        mc.png_parse_meta(b"not a png at all" * 4)
    with _pytest.raises(ValueError):
        mc.wav_parse_meta(b"RIFFxxxxNOPE" + b"\x00" * 32)
    with _pytest.raises(ValueError):
        mc.gif_parse_meta(b"JPEG????" + b"\x00" * 8)

    px = (np.arange(4 * 5 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    good = mc.png_encode(px)
    # corrupt the zlib stream: decode must fail, not hand back pixels
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    with _pytest.raises(Exception):
        mc.png_decode(bytes(bad))
    # unknown-mime sniff returns None rather than guessing
    assert mc.sniff_mime(b"\x00" * 64) is None
