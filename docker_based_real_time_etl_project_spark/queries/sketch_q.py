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


@register(
    "q_hll_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
               AS user_days,
           TRUE AS within_bounds
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "approx", "sketch", "scale"),
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE DISTINCT-COUNT ROLLUP (Apache DataSketches HLL via
    Spark's hll_sketch_agg / hll_union_agg): daily per-key sketches
    are built ONCE, then the monthly distinct-user estimate is
    assembled purely by UNIONING the daily sketches — the raw table is
    never rescanned. This is the capability exact COUNT(DISTINCT)
    fundamentally lacks (distinct counts don't add across days:
    sum(user_days) >= exact_users, also emitted to show the gap), and
    the reason a 100 TB continuous aggregate keeps a sketch tier: the
    merge tree moves O(days x 2^lgK) bytes instead of O(users).
    Sketch bytes are engine-internal, so the driver-visible contract
    follows the recall-query pattern: exact truth columns plus a
    relative-error bound gate the oracle pins TRUE (lgConfigK=14 ->
    ~0.8% standard error; the 5% gate is >6 sigma)."""
    d = table(spark, sf_dir, "events")
    daily = d.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count_distinct("user_id").alias("day_users"),
    )
    monthly = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("day_users").cast("bigint").alias("user_days"),
    )
    exact = d.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    j = monthly.join(exact, "event_type")
    ok = (
        F.abs(F.col("est") - F.col("exact_users"))
        <= F.greatest(F.col("exact_users") * 0.05, F.lit(1.0))
    )
    return j.select(
        "event_type", "exact_users", "user_days", ok.alias("within_bounds")
    )
