"""CDC query surface (M3): the events table is re-cast as a Debezium
changelog (key=user_id, op derived from event_type, lsn=event_id),
round-tripped through the real JSON envelope encode -> decode -> A4
materialization. The oracle reproduces only the *semantics* (last
non-delete image per key) in SQL -- the JSON envelope plumbing is
exercised on the Spark side and must land on the same state.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docker_based_real_time_etl_project_spark.cdc import (
    decode_envelope,
    encode_envelope,
    materialize_latest,
)
from docker_based_real_time_etl_project_spark.queries.registry import register, table

ROW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# last change per user wins (ms-truncated event time, event_id as the
# within-millisecond total order = Debezium's lsn); a winning 'error'
# (delete) removes the key
_ORACLE = """
SELECT user_id, value AS current_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY epoch_ms(ts) DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> Debezium-shaped JSON envelope strings."""
    ev = table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "d")
        .when(F.col("event_type") == "click", "u")
        .otherwise("c")
    )
    return encode_envelope(
        ev,
        row_cols=["user_id", "value"],
        op=op,
        ts_ms=F.unix_millis("ts"),
        lsn=F.col("event_id"),
        table="public.latest_values",
    )


@register("q_cdc_materialize", oracle=_ORACLE, tags=("cdc",))
def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+A4 batch: decode the JSON envelope stream and compact to
    current state (last non-delete image per user)."""
    changes = decode_envelope(_changelog(spark, sf_dir), ROW_SCHEMA)
    return materialize_latest(changes, ["user_id"]).select(
        "user_id", F.col("value").alias("current_value")
    )


@register("q_cdc_stream_upsert", oracle=_ORACLE, tags=("cdc", "streaming"))
def q_cdc_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+A4+S10 streaming: the same changelog replayed as a 4-batch
    stream through foreachBatch + the idempotent parquet upsert store;
    the final state hash-matches the batch oracle however the batches
    split."""
    import os

    from pyspark.sql import Window

    from docker_based_real_time_etl_project_spark.sinks import read_state, upsert_parquet_sink

    envelopes = _changelog(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="cdc_src_")
    # 4 deterministic micro-batches in envelope-string order -- i.e. NOT
    # in lsn order, so changes for a key may arrive across batches out of
    # order; the idempotent (ts_ms, lsn) merge must still converge
    envelopes.withColumn(
        "_bucket", F.ntile(4).over(Window.orderBy("value"))
    ).write.partitionBy("_bucket").mode("overwrite").parquet(src)

    state_dir = tempfile.mkdtemp(prefix="cdc_state_")
    stream = (
        spark.readStream.schema(T.StructType([T.StructField("value", T.StringType())]))
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    decoded = decode_envelope(stream, ROW_SCHEMA)
    q = (
        decoded.writeStream.foreachBatch(upsert_parquet_sink(state_dir, ["user_id"]))
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return read_state(spark, state_dir).select(
        "user_id", F.col("value").alias("current_value")
    )
