"""Event-stream replay: turn the static ``events`` table into a file
stream whose micro-batches arrive in (rough) event-time order.

The reference's stream is Kafka topics fed by Debezium (SURVEY.md
S6-S8); tests have no broker, so the transport is swapped for Spark's
file source while every downstream operator (watermarks, windows,
state) is identical to what would run on ``readStream.format("kafka")``.
Slicing by time range (not hash) means later files carry later events,
so watermarks advance realistically and a held-back slice is genuinely
"late".
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.schemas import TESTDATA_SCHEMAS
from docker_based_real_time_etl_project_spark.sources.parquet import load_table


def slice_events_to_dir(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 8,
    out_dir: str | None = None,
    hold_back_range: tuple[int, int] | None = None,
) -> str:
    """Write ``events`` as `n_slices` time-ordered parquet files under a
    temp dir; returns the dir. ``hold_back_range=(lo, hi)`` skips those
    slice indexes (write them later to model late/out-of-order arrival).

    Slices are ntile(ts) ranges written one file each, named so the file
    source lists them in time order.
    """
    ev = load_table(spark, sf_dir, "events")
    out = out_dir or tempfile.mkdtemp(prefix="events_stream_")
    bounds = ev.selectExpr(
        f"percentile_approx(cast(ts as double), array({','.join(str((i + 1) / n_slices) for i in range(n_slices - 1))}), 10000) p"
    ).collect()[0]["p"]
    lo = None
    for i in range(n_slices):
        if hold_back_range and hold_back_range[0] <= i <= hold_back_range[1]:
            lo = bounds[i] if i < n_slices - 1 else None
            continue
        hi = bounds[i] if i < n_slices - 1 else None
        sl = ev
        if lo is not None:
            sl = sl.filter(F.col("ts").cast("double") > lo)
        if hi is not None:
            sl = sl.filter(F.col("ts").cast("double") <= hi)
        sl.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"slice={i:03d}"))
        lo = hi
    return out


def replay_events(
    spark: SparkSession, slices_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the sliced events with the declared schema
    (schema inference is disabled on streaming sources for good reason).
    ``maxFilesPerTrigger=1`` -> one slice per micro-batch, so an
    availableNow run still exercises multi-batch state transitions.
    """
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(slices_dir)
    )
