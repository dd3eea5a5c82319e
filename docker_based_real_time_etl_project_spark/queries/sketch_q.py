"""Frequency-sketch surface: count-min heavy-hitter estimation.

A novel-sketch operator in the training-data-pipeline family (corpus
token frequency at 100 TB): the count-min sketch is a fixed-size
(D x W) counter table -- mergeable, one linear pass, shuffle bounded
by D*W regardless of corpus size -- queried here for the true top-10
tokens. Engine-side bucket hashes (xxhash64) are engine-specific, so
the driver-visible contract follows the recall-query pattern: emit
the deterministic truth columns plus a boolean bound gate the oracle
pins TRUE (estimate >= truth, always, by construction; estimate <=
truth + D*N/W with overwhelming probability at D=4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import register, table

CMS_WIDTH = 512
CMS_DEPTH = 4


def _tokens(d: DataFrame) -> DataFrame:
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )


def _bucket(word: Column, seed: Column) -> Column:
    return F.pmod(F.xxhash64(word, seed), F.lit(CMS_WIDTH))


@register(
    "q_heavy_hitters_cms",
    oracle="""
    SELECT word, true_cnt, TRUE AS within_bound
    FROM (
      SELECT word, COUNT(*) AS true_cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
      ORDER BY true_cnt DESC, word
      LIMIT 10)
    """,
    tags=("sketch", "text"),
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: build a 4x512 CMS over the token
    stream (one pass, map-side partials, shuffle <= 2048 counter rows),
    then point-query the true top-10 tokens and gate the estimates
    against the CMS error bound. The truth side (top-10 by exact count,
    word tiebreak) is fully deterministic and oracled; the estimates are
    engine-hash-specific so they feed only the gate."""
    seeds = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    toks = _tokens(table(spark, sf_dir, "documents"))

    truth = toks.groupBy("word").agg(F.count(F.lit(1)).alias("true_cnt"))
    top10 = truth.orderBy(F.col("true_cnt").desc(), "word").limit(10)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))

    cms = (
        toks.select("word", F.explode(seeds).alias("seed"))
        .select("seed", _bucket(F.col("word"), F.col("seed")).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_cnt"))
    )
    probes = (
        top10.select("word", "true_cnt", F.explode(seeds).alias("seed"))
        .withColumn("bucket", _bucket(F.col("word"), F.col("seed")))
    )
    est = (
        cms.join(F.broadcast(probes), ["seed", "bucket"])
        .groupBy("word", "true_cnt")
        .agg(F.min("bucket_cnt").alias("est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "word",
        "true_cnt",
        (
            (F.col("est") >= F.col("true_cnt"))
            & (
                F.col("est")
                <= F.col("true_cnt")
                + CMS_DEPTH * F.col("n_total") / F.lit(CMS_WIDTH)
            )
        ).alias("within_bound"),
    )
