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
    extract_media_meta,
    resize_images,
    sample_frames,
    synth_media,
    synth_real_media,
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


# ---------------------------------------------------------------------------
# REAL-bytes decode queries (round-7): synth_real_media writes genuine
# PNG / WAV / APNG files (operators.mediacodec, pure stdlib), the
# operators parse the ACTUAL bytes, and the oracle restates the
# synthesis parameter algebra in SQL — so a decoder that misreads one
# header field goes hash-red. No NotImplementedError seam remains.
# ---------------------------------------------------------------------------

_R_MIME = ("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' "
           "WHEN 1 THEN 'audio/wav' ELSE 'image/apng' END")
_R_W = "CAST(doc_id % 8 * 16 + 16 AS INT)"      # PNG width
_R_H = "CAST(doc_id % 5 * 16 + 16 AS INT)"      # PNG height
_R_VW = "CAST(doc_id % 4 * 8 + 8 AS INT)"       # APNG width
_R_VH = "CAST(doc_id % 3 * 8 + 8 AS INT)"       # APNG height
_R_NF = "(doc_id % 5 + 2)"                      # APNG frame count
_R_DELAY = "((doc_id % 4 + 1) * 100)"           # APNG per-frame delay ms


@register(
    "q_media_meta_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_R_MIME} AS mime,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN {_R_W} WHEN 2 THEN {_R_VW} END AS width,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN {_R_H} WHEN 2 THEN {_R_VH} END AS height,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 1 THEN CAST((doc_id % 20 + 1) * 100 AS BIGINT)
                WHEN 2 THEN CAST({_R_NF} * {_R_DELAY} AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 3 = 1
                THEN CAST(8000 + doc_id % 3 * 4000 AS INT) END AS sample_rate
    FROM documents
    """,
    tags=("multimodal", "decode"),
)
def q_media_meta_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata decode from GENUINE bytes: PNG IHDR dims, WAV fmt/data
    rate+duration, APNG acTL/fcTL frame timing — parsed from valid
    files by the stdlib codec, hash-checked against the synthesis
    algebra. This is the round-trip proof that the decoder reads what
    the encoder wrote, field by field."""
    media = synth_real_media(table(spark, sf_dir, "documents"), "doc_id")
    return extract_media_meta(media).select(
        "media_id", "mime", "width", "height", "duration_ms", "sample_rate"
    )


@register(
    "q_media_resize_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE WHEN GREATEST({_R_W}, {_R_H}) <= 64 THEN {_R_W}
                ELSE CAST({_R_W} * 64 // GREATEST({_R_W}, {_R_H}) AS INT)
           END AS width,
           CASE WHEN GREATEST({_R_W}, {_R_H}) <= 64 THEN {_R_H}
                ELSE CAST({_R_H} * 64 // GREATEST({_R_W}, {_R_H}) AS INT)
           END AS height
    FROM documents WHERE doc_id % 3 = 0
    """,
    tags=("multimodal", "decode"),
)
def q_media_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: PNG decode -> nearest-neighbor resample ->
    re-encode, with the checked dims RE-PARSED from the output bytes
    (not carried along), so the full decode/resample/encode/parse
    cycle must be self-consistent AND match the integer-exact target
    algebra (w*64//max) the oracle states."""
    media = synth_real_media(table(spark, sf_dir, "documents"), "doc_id")
    resized = resize_images(media.withColumn("meta", F.lit(None).cast(
        "struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>"
    )).select("media_id", "kind", "meta", "content"), max_side=64, fake=False)
    return resized.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "q_media_frame_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(g.i AS INT) AS frame_idx,
           CAST(g.i * {_R_DELAY} AS BIGINT) AS frame_ms
    FROM documents,
         unnest(generate_series(0, CAST({_R_NF} - 1 AS BIGINT))) AS g(i)
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal", "decode"),
)
def q_media_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame walk: one row per APNG frame found by the
    fcTL/IDAT/fdAT chunk parser, frame_ms accumulated from the actual
    stored per-frame delays. The oracle pins the exact
    (media_id, frame_idx, frame_ms) set from the synthesis algebra —
    a parser that drops frame 0 (the IDAT frame) or misreads a
    delay_den goes red. Frame payloads (genuine zlib image data) stay
    engine-side; tests assert they decompress."""
    media = synth_real_media(table(spark, sf_dir, "documents"), "doc_id")
    frames = sample_frames(media.withColumn("meta", F.lit(None).cast(
        "struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>"
    )).select("media_id", "kind", "meta", "content"), fake=False)
    return frames.select("media_id", "frame_idx", "frame_ms")


# ---------------------------------------------------------------------------
# binaryFile source: media arriving as FILES, not rows — the lake-ingest
# direction (crawl dumps, object-store buckets) where each blob is its
# own object and the engine's job is distributed listing + streaming the
# bytes into the decode path without ever collecting them.
# ---------------------------------------------------------------------------


def _media_files_dir(spark: SparkSession, sf_dir: str) -> str:
    """One genuine media FILE per selected doc (doc_id % 5 == 0),
    written from EXECUTORS via mapInPandas (no driver bytes), once per
    (sf_dir, data fingerprint). Models an object-store landing zone of
    crawled media blobs.

    LOCAL-MODE ASSUMPTION: executor tasks write into a driver-created
    local temp dir, which only lands in one place because local[*]
    executors share the driver filesystem. On a real cluster the
    landing zone must be a SHARED path (object store / DFS scratch
    root) — same mapInPandas write, different ``out``. The listing
    count is verified against the expected doc count after the write
    and fails loudly on any mismatch, so a mis-configured scratch path
    can't silently produce a partial directory."""
    import os
    import tempfile

    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="media_files_")
        media = synth_real_media(
            table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0),
            "doc_id",
        )

        def write(batches):
            import pandas as pd

            for pdf in batches:
                for mid, blob in zip(pdf["media_id"], pdf["content"]):
                    p = os.path.join(out, f"media_{int(mid):09d}.bin")
                    with open(p, "wb") as fh:
                        fh.write(bytes(blob))
                yield pd.DataFrame({"n": [len(pdf)]})

        expected = media.count()
        media.select("media_id", "content").mapInPandas(write, "n long").agg(
            F.sum("n")
        ).collect()
        written = len(
            [f for f in os.listdir(out) if f.startswith("media_")]
        )
        if written != expected:
            raise RuntimeError(
                f"media landing zone incomplete: {written}/{expected} files "
                f"in {out} — executors must share the landing path (use a "
                "shared scratch root on a real cluster)"
            )
        return out

    return materialize_once(
        ("media_files", sf_dir, 5, table_fingerprint(sf_dir, "documents")),
        build,
    )


@register(
    "q_source_binaryfile",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_R_MIME} AS mime,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN {_R_W} WHEN 2 THEN {_R_VW} END AS width,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN {_R_H} WHEN 2 THEN {_R_VH} END AS height,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 1 THEN CAST((doc_id % 20 + 1) * 100 AS BIGINT)
                WHEN 2 THEN CAST({_R_NF} * {_R_DELAY} AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 3 = 1
                THEN CAST(8000 + doc_id % 3 * 4000 AS INT) END AS sample_rate
    FROM documents WHERE doc_id % 5 = 0
    """,
    tags=("source", "multimodal", "decode"),
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's binaryFile SOURCE as the media-lake ingest path: genuine
    PNG/WAV/APNG files land in a directory (one blob per object, the
    object-store shape), ``spark.read.format("binaryFile")`` lists and
    reads them DISTRIBUTED (listing parallelized, each task streams its
    own files — no driver bytes), identity is recovered from the path,
    and the bytes flow into the same real-codec decode as the row-form
    queries. The oracle restates the synthesis algebra for the selected
    ids, so file round-trip + path parsing + header decode are all
    hash-checked. At 100 TB this is the pattern for crawled-media
    ingest: partition by listing, never collect, drop bytes at the
    earliest typed boundary."""
    d = _media_files_dir(spark, sf_dir)
    # load the DIRECTORY with a glob filter, not an expanded */.bin
    # glob: a 1000-path glob makes the file index launch a
    # 1000-task parallel-listing job (one stat per task — designed
    # for object stores, pure overhead here); a single directory
    # path is listed driver-side in one call
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    media = bf.select(
        F.regexp_extract(F.col("path"), r"media_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("media_id"),
        F.col("content"),
    ).withColumn(
        "kind",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("media_id") % 3 + 1).cast("int"),
        ),
    )
    return extract_media_meta(media).select(
        "media_id", "mime", "width", "height", "duration_ms", "sample_rate"
    )
