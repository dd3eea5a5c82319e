"""Scalar-function surface: string / math / array / JSON functions
(SURVEY.md 2.4 rows 'String fns' / 'Math fns' / 'Array fns' /
'Map/JSON fns'; reference transforms T6, T7, T12, T13).

All expressions are JVM built-ins inside whole-stage codegen; no
Python executes per row anywhere in this module.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import dsum, register, sql_dsum, table


@register(
    "q_str_funcs",
    oracle=r"""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           concat_ws('|', p_brand, p_type) AS brand_type,
           substring(p_name, 1, 5) AS name_prefix,
           CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    """,
    tags=("string",),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-adjacent string kernel: case, concat, substring, regexp capture
    group, length, replace."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "q_math_round_pct",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)), 2) AS VARCHAR) AS DOUBLE) AS net_price,
           CAST(CAST(ROUND(CAST(ABS(l_discount - l_tax) * 100 AS DECIMAL(25,10)), 4) AS VARCHAR) AS DOUBLE) AS pct_gap,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           l_extendedprice % 97 AS price_mod
    FROM lineitem
    """,
    tags=("math",),
)
def q_math_round_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel at the reference's DECIMAL(10,4)-percent semantics
    (init-db.sql:43): round/abs/ceil/floor/sqrt/modulo. sqrt is
    IEEE-exact; transcendentals are excluded from oracled outputs."""
    from docker_based_real_time_etl_project_spark.functions import dround

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        dround(F.abs(F.col("l_discount") - F.col("l_tax")) * 100, 4).alias("pct_gap"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        (F.col("l_extendedprice") % 97).alias("price_mod"),
    )


@register(
    "q_arr_elem",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS elem_sum
    FROM embeddings
    """,
    tags=("array",),
)
def q_arr_elem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: positional element access + size + a left-to-right fold
    (F.aggregate) over the array -- the kline-unpack primitive on the
    embeddings fixture."""
    e = table(spark, sf_dir, "embeddings")
    elem_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        F.round(elem_sum, 6).alias("elem_sum"),
    )


@register(
    "q_arr_explode",
    oracle="""
    SELECT e.vec_id, t.i AS pos, CAST(e.embedding[t.i] AS DOUBLE) AS val
    FROM embeddings e, generate_series(1, 64) AS t(i)
    WHERE e.label = 3
    """,
    tags=("array",),
)
def q_arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6/T7: array -> (pos, val) rows with 1-based rank -- the
    order-book depth-level explode."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("label") == 3)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val_f")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("val_f").cast("double").alias("val"),
    )


@register(
    "q_arr_zip",
    oracle="""
    SELECT e.vec_id, t.i AS depth,
           CAST(e.embedding[t.i] AS DOUBLE) AS bid,
           CAST(e.embedding[t.i + 1] AS DOUBLE) AS ask
    FROM embeddings e, generate_series(1, 5) AS t(i)
    """,
    tags=("array",),
)
def q_arr_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: positional zip of two parallel sequences (order-book bid/ask
    pairing, etl.py:128-134) -- here element i with element i+1 via
    arrays_zip of two slices + posexplode."""
    e = table(spark, sf_dir, "embeddings")
    zipped = F.arrays_zip(
        F.slice("embedding", 1, 5).alias("bid"), F.slice("embedding", 2, 5).alias("ask")
    )
    return e.select("vec_id", F.posexplode(zipped).alias("pos0", "pair")).select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("depth"),
        F.col("pair.bid").cast("double").alias("bid"),
        F.col("pair.ask").cast("double").alias("ask"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                 THEN 1 END) AS n_high
    FROM events
    GROUP BY event_type
    """,
    tags=("json",),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: JSON field extraction from the events.props payload string --
    the CDC-payload / Kafka-value decode primitive (integer sum, so no
    float-order concern)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


# ---------------------------------------------------------------------------
# q_udf_scalar: the Pandas-UDF slow path, held to the same hash bar
# ---------------------------------------------------------------------------

_UDF_ORACLE = """
WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0)
SELECT v.vec_id, v.label,
       list_dot_product(v.e, q.qe)
         / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS score
FROM v, q
"""


@register("q_udf_scalar", oracle=_UDF_ORACLE, tags=("udf", "similarity"))
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF scoring every embedding against
    a fixed query vector (similarity-scoring UDF, the north-star UDF
    shape). The kernel sums strictly left-to-right per element -- the
    same association order as F.aggregate and DuckDB's
    list_dot_product -- so the doubles are bit-identical cross-engine
    and the query hash-matches WITHOUT rounding. Demonstrates the rule:
    when Python is unavoidable, it runs on Arrow batches and must not
    invent its own float semantics (np.dot's SIMD reassociation would
    break the hash)."""
    from pyspark.sql.functions import pandas_udf

    e = table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    qnorm_sq = 0.0
    for x in qvec:
        qnorm_sq += x * x

    @pandas_udf("double")
    def cos_to_query(emb: pd.Series) -> pd.Series:
        import numpy as np

        # vectorize across ROWS, loop over the 64 dims: each row's
        # accumulation stays strictly left-to-right (the hash-exact
        # association), but the batch does 64 numpy ops instead of
        # n_rows x 64 Python ops (~100x)
        m = np.stack(emb.to_numpy())  # (n, 64) float64
        dot = np.zeros(len(m))
        nrm = np.zeros(len(m))
        for i in range(m.shape[1]):
            c = m[:, i]
            dot += c * qvec[i]
            nrm += c * c
        return pd.Series(dot / (np.sqrt(nrm) * np.sqrt(qnorm_sq)))

    return e.select(
        "vec_id", "label", cos_to_query(F.col("embedding").cast("array<double>")).alias("score")
    )


@register(
    "q_udaf_median",
    oracle="""
    SELECT event_type,
           MEDIAN(value) AS median_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("udf", "agg"),
)
def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (pandas GROUPED_AGG UDAF): exact per-group
    median. Completes the user-defined family next to the scalar UDF
    (q_udf_scalar), the UDTF (q_udtf_chunk), and the stateful map
    (q_stream_stateful_totals). Deterministic cross-engine: the median
    is order-free by definition (sort inside the kernel), and the
    even-count interpolation (mean of the two middles) matches DuckDB's
    MEDIAN. Scale note: a grouped-agg pandas UDAF materializes each
    group in memory on one executor -- right for bounded groups like
    these 5 event types; unbounded groups belong to the approx
    percentile sketch instead (q_percentiles_approx)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def exact_median(v: pd.Series) -> float:
        return float(v.sort_values(ignore_index=True).median())

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg(), so the row count is a (one-line) second UDAF
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        exact_median("value").alias("median_value"),
        n_rows("value").alias("n"),
    )
