"""Kafka transport builders (SURVEY.md S7): the engine's reader/writer
option assembly for the Debezium topic layout
(``dbserver1.public.<table>``, schema-less JSON values).

No broker exists in this environment, so these builders are exercised
up to plan construction in tests; at runtime they require
``spark-sql-kafka-0-10`` on the classpath. The downstream operators
(cdc.decode_envelope etc.) consume the exact (key, value) string
columns these produce, and are fully tested against file-replayed
streams carrying identical payloads -- transport and semantics are
deliberately decoupled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOPIC_PREFIX = "dbserver1.public"  # debezium-config.json:10


def cdc_topics(tables: Sequence[str], prefix: str = TOPIC_PREFIX) -> str:
    """Topic subscription list for the whitelisted tables
    (cassandra-sink-config.json:6)."""
    return ",".join(f"{prefix}.{t}" for t in tables)


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """readStream builder for CDC topics; values surfaced as strings for
    from_json decode. Returns the DataStreamReader (call .load())."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        # backpressure: bound rows/micro-batch (replaces the reference's
        # fixed sleep pacing, etl.py:240)
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r


def as_kafka_records(df: DataFrame, key_col: str, value_cols: Sequence[str]) -> DataFrame:
    """Project a DataFrame into Kafka's (key, value) contract: key =
    string key column, value = JSON of the named columns (the shape the
    JsonConverter ships, docker-compose.yml:55-58)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )


def kafka_writer(df: DataFrame, bootstrap: str, topic: str):
    """writeStream builder for (key, value) records; caller adds
    checkpoint + trigger and start()s."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
