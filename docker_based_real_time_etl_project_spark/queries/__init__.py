"""Query surface: importing this package populates the registry."""

from docker_based_real_time_etl_project_spark.queries import (  # noqa: F401
    analytics_q,
    cdc_q,
    dedup_q,
    embeddings_q,
    flows_q,
    functions_q,
    graph_q,
    llmprep_q,
    microstructure_q,
    multimodal_q,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    sampling_q,
    similarity_q,
    sketch_q,
    sources_q,
    streaming_q,
    text,
    timeseries_q,
    udtf_q,
    windows,
)
from docker_based_real_time_etl_project_spark.queries.registry import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
