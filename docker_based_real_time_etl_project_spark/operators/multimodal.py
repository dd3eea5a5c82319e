"""Multimodal column operators (north-star: image/audio/video columns
in a training-data pipeline).

Model: media is an opaque ``binary`` column plus a typed metadata
struct (mime, width/height/duration, sample rate...). All Spark-side
plumbing -- schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing -- is real and tested; only the codec calls
(image decode, audio decode, frame extraction) are stubbed behind
``_require_codec`` / deterministic fakes, because no media libraries
ship in this environment. Swapping in PIL/ffmpeg/torchaudio is a
one-function change per operator and does not alter any plan shape.

Scale notes: media rows are large and skewed, so every operator here
(a) processes Arrow record batches, never Python rows; (b) keeps
bytes out of shuffles -- feature extraction projects the binary away
before any wide transformation; (c) bounds batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than row
counts (set it low for 4K video, high for thumbnails).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("meta", MEDIA_META),
        T.StructField("content", T.BinaryType()),
    ]
)


def _require_codec(name: str):
    """The seam where a real codec plugs in. Everything below that calls
    this is exercising real Spark plumbing against the deterministic
    fake; a production deployment implements these three functions."""
    raise NotImplementedError(
        f"codec '{name}' not available in this environment; "
        "plug in PIL/ffmpeg/torchaudio here"
    )


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media rows from any table (tests/bench): the
    binary payload is a seeded byte pattern, metadata derives from the
    id. Shapes and sizes mimic thumbnails/short clips."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    w = (F.col(id_col) % 8 * 64 + 64).cast("int")
    h = (F.col(id_col) % 5 * 64 + 64).cast("int")
    meta = F.struct(
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
        F.when(kind != "audio", w).alias("width"),
        F.when(kind != "audio", h).alias("height"),
        F.when(kind != "image", (F.col(id_col) % 30 + 1) * 1000).alias("duration_ms"),
        F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
    )
    content = F.unhex(F.sha2(F.col(text_col).cast("binary"), 256))  # 32 raw bytes
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        meta.alias("meta"),
        content.alias("content"),
    )


def decode_features(df: DataFrame, n_features: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas: binary -> fixed-width
    float feature vector. Arrow ships whole record batches to Python;
    the output drops `content`, so downstream shuffles never carry
    bytes. `fake=False` is the production seam (NotImplementedError
    until a codec is plugged in)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                _require_codec("decode")  # pragma: no cover
            feats = [
                _fake_features(content, n_features) for content in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(extract, out_schema)


def _fake_features(content: bytes, n: int) -> list[float]:
    """Deterministic 'embedding' of the bytes: crc32 of n rolling slices,
    scaled to [0,1). Stands in for a model forward pass."""
    if content is None:
        return [0.0] * n
    return [
        (zlib.crc32(content[i::n]) % 10**6) / 10**6 for i in range(n)
    ]


def resize_images(df: DataFrame, max_side: int = 256, fake: bool = True) -> DataFrame:
    """Image resize via mapInPandas: new binary + updated meta. The fake
    keeps bytes (content hash) and rescales metadata exactly as a real
    resize would -- the tested contract is schema + meta math."""
    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                _require_codec("resize")  # pragma: no cover
            meta = pd.DataFrame(list(pdf["meta"]))
            scale = (max_side / meta[["width", "height"]].max(axis=1)).clip(upper=1.0)
            # floor, not round: floor(x) is engine-independent while
            # round-half ties differ between numpy (even) and SQL (up)
            meta["width"] = (meta["width"] * scale).apply(__import__("math").floor).astype("Int64")
            meta["height"] = (meta["height"] * scale).apply(__import__("math").floor).astype("Int64")
            pdf = pdf.copy()
            pdf["meta"] = meta.to_dict("records")
            yield pdf

    return df.filter(F.col("kind") == "image").mapInPandas(do_resize, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling via mapInPandas: one output row per sampled
    frame (1:N explode inside Arrow batches -- mapInPandas allows
    output cardinality != input, which applyInPandas-per-group would
    make awkward). Fake frames are content-hash-derived."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                _require_codec("frame_sample")  # pragma: no cover
            # vectorized 1:N expansion: per-row frame counts, then one
            # repeat for the row index and one cumsum-offset subtraction
            # for the within-row frame index — no per-row Python loop.
            # Only the sha256 stand-in for the codec touches rows.
            dur = np.array(
                [int((m or {}).get("duration_ms") or 0) for m in pdf["meta"]],
                dtype="int64",
            )
            n_frames = np.maximum(dur, 0) // every_ms + (
                np.maximum(dur, 0) % every_ms > 0
            )  # == len(range(0, dur, every_ms))
            total = int(n_frames.sum())
            rep = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(total) - starts
            contents = pdf["content"].to_numpy(dtype=object)[rep]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[rep],
                    "frame_idx": pd.array(frame_idx, dtype="int32"),
                    "frame_ms": pd.array(frame_idx * every_ms, dtype="int64"),
                    "frame": [
                        hashlib.sha256(bytes(c) + str(int(i)).encode()).digest()
                        for c, i in zip(contents, frame_idx)
                    ],
                }
            )

    return df.filter(F.col("kind") == "video").mapInPandas(frames, out_schema)
