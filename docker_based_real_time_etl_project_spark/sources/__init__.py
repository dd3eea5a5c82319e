"""Sources and sinks: parquet testdata catalog, REST polling source,
Kafka transport, CDC envelope decode, JDBC/Cassandra sink adapters."""

from docker_based_real_time_etl_project_spark.sources.parquet import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
