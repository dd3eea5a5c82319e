"""Structured Streaming half of the engine (SURVEY.md M2).

Replaces the reference's three moving parts with Spark-native ones:

- the 60 s poll loop (reference ``etl.py:207-240``) -> micro-batch
  triggers (``processingTime`` in production, ``availableNow`` in tests);
- the replication-slot/offset bookkeeping (``init-db.sql:59``,
  ``docker-compose.yml:52-54``) -> checkpointed source offsets;
- the sink batching/idempotence (``cassandra-sink-config.json:10-12``)
  -> ``foreachBatch`` + idempotent key-based writes.
"""

from docker_based_real_time_etl_project_spark.streaming.replay import (  # noqa: F401
    replay_events,
    slice_events_to_dir,
)
from docker_based_real_time_etl_project_spark.streaming.pipelines import (  # noqa: F401
    dedup_latest_stream,
    ohlcv_stream,
    run_to_memory,
    session_agg_stream,
    sliding_agg_stream,
)
from docker_based_real_time_etl_project_spark.streaming.stateful import (  # noqa: F401
    running_totals_stream,
)
