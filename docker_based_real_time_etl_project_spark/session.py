"""SparkSession factory.

Local-mode testing defaults that still express cluster-scale intent:
AQE on (skew joins, partition coalescing at runtime), shuffle
partitions sized to cores locally (on a 1000-executor cluster this is
overridden to ~2-3x total cores or left to AQE), UTC session timezone
so timestamp semantics match the DuckDB oracle and are deterministic
across hosts, Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "docker_based_real_time_etl_project_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Every config here is scale-motivated, not just local convenience:

    - ``spark.sql.adaptive.*``: AQE re-plans at runtime -- coalesces
      post-shuffle partitions, converts sort-merge to broadcast when a
      side turns out small, splits skewed partitions. Mandatory at
      100 TB where static planning guesses wrong.
    - ``spark.sql.shuffle.partitions``: locally = cores. On a cluster
      this is a floor; AQE coalesces down from a high initial number.
    - ``spark.sql.session.timeZone=UTC``: deterministic event-time
      bucketing (window/date_trunc edges) regardless of host tz.
    - Arrow: vectorized transfer for the few Pandas-UDF operators.
    - ``parquet.aggregatePushdown``: push MIN/MAX/COUNT to footers.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS), which Spark's
        # parquet reader otherwise rejects; read as long + convert in the
        # loader (ns -> us truncation, same as DuckDB's read of NS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
