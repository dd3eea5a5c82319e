"""Python UDTF surface (Spark 4): table function splitting documents
into fixed-size token chunks -- the LLM-pipeline "chunking" primitive
-- with the full chunk set SQL-oracled (1:N cardinality + content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import register, table

_CHUNK = 10  # tokens per chunk

_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(g.i AS INT) AS chunk_idx,
       array_to_string(toks[g.i*{_CHUNK}+1 : least((g.i+1)*{_CHUNK}, len(toks))], ' ') AS chunk,
       CAST(least({_CHUNK}, len(toks) - g.i*{_CHUNK}) AS INT) AS n_tokens
FROM t, unnest(generate_series(0, CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT) - 1)) AS g(i)
"""


@register("q_udtf_chunk", oracle=_ORACLE, tags=("udf", "text"))
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (lateral table function): one input document ->
    ceil(n/10) chunk rows. Exercises the UDTF registration + LATERAL
    join path; for bulk chunking prefer the pure-expression equivalent
    (sequence + transform, as in shingles()) -- this is API-surface
    coverage with an exact oracle, not the hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: int, chunk: string, n_tokens: int")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = (text or "").split(" ")
            for i in range(0, (len(toks) + _CHUNK - 1) // _CHUNK):
                part = toks[i * _CHUNK : (i + 1) * _CHUNK]
                yield doc_id, i, " ".join(part), len(part)

    spark.udtf.register("chunk_doc", ChunkDoc)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT c.* FROM documents_v, LATERAL chunk_doc(doc_id, text) AS c"
    )
