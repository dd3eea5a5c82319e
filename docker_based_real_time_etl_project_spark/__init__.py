"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (GrayHut/docker-based-real-time-etl-project).

Built Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the CDC/streaming half, Pandas UDFs only where built-ins
cannot express the semantics. See SURVEY.md for the blueprint.

Layout:
    session     -- SparkSession factory tuned for local[32] and cluster scale
    schemas     -- declared StructTypes (never infer in production paths)
    sources     -- parquet/REST/Kafka/CDC sources, JDBC/Cassandra sink adapters
    operators   -- composable relational/window/dedup/similarity/text operators
    functions   -- reusable column expressions (cosine, tokenize, fingerprints)
    queries     -- the declared query surface (SURVEY.md section 2.4) + oracles
    streaming   -- micro-batch ingest, watermarking, stateful dedup
    plans       -- plan inspection / explain helpers
"""

__version__ = "0.1.0"
