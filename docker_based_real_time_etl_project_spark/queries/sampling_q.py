"""Sampling / split surface for training-data pipelines.

Random sampling is useless at 100 TB if it is not reproducible: a
re-run must pick the SAME rows, a join of two sampled tables must
agree, and a train/val/test split must never leak across re-shards.
So every operator here derives its randomness from a content hash
(md5 -- bit-identical across engines and cluster sizes), never from
an RNG: sampling becomes a pure filter (scan-only, pushdown-friendly,
ZERO shuffles), and the sample is stable under repartitioning,
retries, and engine swaps. ``df.sample()``'s per-partition RNG
guarantees none of that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import register, table


def hash_ticket(key: Column, buckets: int = 10000) -> Column:
    """Deterministic uniform ticket in [0, buckets): the first 8 md5 hex
    digits of the key, as an integer, mod buckets. conv() and md5 are
    engine-portable; 8 hex digits (32 bits) keep conv exact."""
    return F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


def _sql_ticket(expr: str, buckets: int = 10000) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % {buckets}"
    )


@register(
    "q_sample_split",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             {_sql_ticket('doc_id')} AS ticket
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN ticket < 8000 THEN 'train'
                WHEN ticket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM t
    WHERE ticket < 2000 OR ticket >= 8000
    """,
    tags=("sampling",),
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% sample of the train split + full val/test
    splits, assigned by hash ticket on doc_id. A pure per-row filter:
    no shuffle, no RNG state, identical output at any parallelism --
    and any other table keyed by doc_id lands in the same split."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "source", "n_chars",
        hash_ticket(F.col("doc_id")).alias("ticket"),
    )
    return t.filter((F.col("ticket") < 2000) | (F.col("ticket") >= 8000)).select(
        "doc_id", "lang", "source", "n_chars",
        F.when(F.col("ticket") < 8000, "train")
        .when(F.col("ticket") < 9000, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, n_chars, rnk
    FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents)
    WHERE rnk <= 25
    """,
    tags=("sampling",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: 25 docs per language, chosen by
    hash order (a deterministic 'reservoir'). One shuffle on the
    stratum key; at scale the per-stratum sort is bounded by AQE
    skew-split like any top-k window."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
    )


@register(
    "q_corpus_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             {_sql_ticket('doc_id')} AS ticket
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source
      FROM t
      WHERE ticket < CASE
                       WHEN source IN ('src0', 'src1') THEN 10000
                       WHEN source IN ('src2', 'src3', 'src4', 'src5') THEN 5000
                       WHEN source IN ('src6', 'src7', 'src8', 'src9') THEN 2500
                       ELSE 1000 END
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(SUM(doc_id) AS BIGINT) AS doc_sum
    FROM kept
    GROUP BY source
    """,
    tags=("sampling",),
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-source keep rates (100% / 50% / 25%
    / 10% tiers) applied as hash-ticket filters -- the domain-
    reweighting step of a pretraining mix. Still scan-only per row;
    the aggregate here just summarizes the kept set (doc_sum pins the
    exact membership for the oracle)."""
    d = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin("src0", "src1"), 10000)
        .when(F.col("source").isin("src2", "src3", "src4", "src5"), 5000)
        .when(F.col("source").isin("src6", "src7", "src8", "src9"), 2500)
        .otherwise(1000)
    )
    kept = d.select(
        "doc_id", "source", hash_ticket(F.col("doc_id")).alias("ticket")
    ).filter(F.col("ticket") < rate)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum("doc_id").alias("doc_sum"),
    )


@register(
    "q_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             {_sql_ticket('doc_id', 16)} AS bucket
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tok, bucket,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / 512.0) AS BIGINT) AS bin
      FROM t
    )
    SELECT bucket, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY bucket, bin
    """,
    tags=("sampling", "text"),
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate documents in a
    deterministic order and split into ~512-token training sequences
    (each doc assigned to the bin where it STARTS -- the standard
    concat-then-chunk approximation). Packing is embarrassingly
    parallel across hash buckets: a global concat order would serialize
    the corpus through one partition, so each of the 16 ticket buckets
    packs independently (at scale: buckets ~ O(corpus/executor-memory),
    each a bounded window). Integer token counts + integer cumsum =
    exactly oracle-able."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        hash_ticket(F.col("doc_id"), 16).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = t.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512.0).cast("bigint"),
    )
    return packed.groupBy("bucket", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "q_sequence_pack_subword",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(COALESCE(list_sum(list_transform(
                      list_filter(string_split(text, ' '), w -> w <> ''),
                      w -> GREATEST(1, CAST(CEIL(strlen(w) / 4.0) AS BIGINT))
                  )), 0) AS BIGINT) AS n_tok,
             {_sql_ticket('doc_id', 16)} AS bucket
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tok, bucket,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / 1024.0) AS BIGINT) AS bin
      FROM t
    )
    SELECT bucket, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY bucket, bin
    """,
    tags=("sampling", "text", "llm"),
)
def q_sequence_pack_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sequence_pack with a SUBWORD token budget: whitespace tokens
    undercount what a trainer's tokenizer emits (a BPE splits long and
    rare words into several pieces), so packed lengths drift from the
    real sequence budget. The deterministic proxy counts
    max(1, ceil(bytes/4)) pieces per whitespace word — the ~4
    bytes-per-token rule of thumb for BPE vocabularies — as a pure
    integer expression (aggregate over the token array; no UDF, no
    tokenizer dependency), then packs 1024-piece bins exactly like the
    whitespace variant. Integer piece counts + integer cumsum keep the
    whole pipeline hash-oracle-able; swapping in a real tokenizer at
    deploy time only changes the per-word piece expression (an Arrow
    UDF), not the packing plan."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    n_sub = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.octet_length(w) / F.lit(4.0)).cast("bigint"),
        ),
    )
    t = d.select(
        "doc_id",
        n_sub.alias("n_tok"),
        hash_ticket(F.col("doc_id"), 16).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = t.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 1024.0).cast("bigint"),
    )
    return packed.groupBy("bucket", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "q_corpus_mix_temperature",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_sql_ticket('doc_id')} AS ticket
      FROM documents
    ),
    c AS (
      SELECT source, COUNT(*) AS n,
             CAST(ROUND(SQRT(COUNT(*)) * 1e6) AS BIGINT) AS w
      FROM t GROUP BY source
    ),
    g AS (
      SELECT source, n, w,
             SUM(w) OVER () AS tot_w, SUM(n) OVER () AS tot_n
      FROM c
    ),
    kept AS (
      SELECT t.doc_id, t.source
      FROM t JOIN g ON t.source = g.source
      WHERE CAST(ticket AS HUGEINT) * tot_w * n * 10
            < CAST(tot_n AS HUGEINT) * 4 * w * 10000
    )
    SELECT g.source, g.n AS n_total,
           COUNT(k.doc_id) AS n_kept,
           CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS doc_sum
    FROM g LEFT JOIN kept k ON g.source = k.source
    GROUP BY g.source, g.n
    """,
    tags=("sampling", "llm"),
)
def q_corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (multilingual/domain rebalancing,
    alpha = 0.5): per-source keep probability proportional to
    sqrt(n_source), normalized to a 40% total-document budget — small
    sources are upweighted relative to their share, the standard
    alpha-sampling used to keep head domains from drowning the tail.
    Rates are DERIVED FROM THE DATA in-plan (per-source counts + a
    10-row global window), unlike q_corpus_mix's fixed tiers.

    Exactness across engines: the keep decision is
    ``ticket * tot_w * n * 10 < tot_n * 4 * w * 10000`` — a pure
    integer cross-multiplication (weights pre-scaled to integers via
    ROUND(SQRT(n)*1e6), sums exact) — so there is NO float division or
    floor-of-rounded-quotient to diverge between engines; Spark runs it
    in DECIMAL(38,0), DuckDB in HUGEINT. Membership is a scan-side
    filter against a broadcast 10-row rate table: zero extra shuffles
    over the corpus at 100 TB."""
    DEC0 = "decimal(38,0)"
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", hash_ticket(F.col("doc_id")).alias("ticket")
    )
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "w", F.round(F.sqrt("n") * 1e6).cast("long")
    )
    g_win = Window.partitionBy()
    g = c.withColumn("tot_w", F.sum("w").over(g_win)).withColumn(
        "tot_n", F.sum("n").over(g_win)
    )
    joined = d.join(F.broadcast(g), "source")
    kept = joined.filter(
        F.col("ticket").cast(DEC0) * F.col("tot_w") * F.col("n") * 10
        < F.col("tot_n").cast(DEC0) * 4 * F.col("w") * 10000
    )
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("doc_sum")
    )
    return (
        g.select("source", F.col("n").alias("n_total"))
        .join(agg, "source", "left")
        .select(
            "source", "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("doc_sum", F.lit(0)).alias("doc_sum"),
        )
    )


@register(
    "q_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_sql_ticket('doc_id')} AS ticket,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS n_toks
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_toks) // 2 AS BIGINT) AS budget FROM t),
    c AS (
      SELECT doc_id, ticket, n_toks,
             CAST(SUM(n_toks) OVER (ORDER BY ticket, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, n_toks, cum_tokens
    FROM c CROSS JOIN tot
    WHERE cum_tokens - n_toks < budget
    """,
    tags=("sampling", "llm"),
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus sizing to an exact token budget ("give me the first N
    tokens"): take documents in deterministic hash-ticket order until
    the running token total reaches the budget (here: half the corpus,
    so the contract binds at every SF). A doc is admitted iff it STARTS
    before the budget line — the boundary doc may overrun, matching how
    trainers actually cut (then truncate in the packer).

    The running total is the distributed two-phase scan
    (operators.prefix.ordered_prefix_sum): range-partition on the order
    key, per-partition totals -> O(partitions) driver scan -> broadcast
    offsets + per-partition local window. NO single-partition global
    window anywhere — the naive Window.orderBy() form funnels the whole
    corpus through one task and is exactly what this operator exists to
    replace; the oracle's SQL window is that naive form, run where
    quadratic/sequential cost is acceptable (DuckDB, test scale)."""
    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint")
        .alias("n_toks"),
    )
    # The corpus total falls out of the prefix scan's driver offset
    # pass (exact Python ints — no 2^53 concern), so the budget is a
    # literal: the old 1-row aggregate re-ran the scan+tokenize
    # lineage a second time just to halve a number (round 14).
    c, total = ordered_prefix_sum(
        t, ["ticket", "doc_id"], "n_toks", out_col="cum_tokens",
        return_total=True,
    )
    return (
        c.filter(F.col("cum_tokens") - F.col("n_toks") < F.lit(total // 2))
        .select("doc_id", "n_toks", "cum_tokens")
    )


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             {_sql_ticket('doc_id')} AS ticket
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN n_chars >= 400 THEN CAST(1000000 AS BIGINT)
                ELSE CAST(1000000 * 400 // n_chars AS BIGINT) END AS inv_p_micro
    FROM t
    WHERE ticket * 400 < n_chars * 10000
    """,
    tags=("sampling", "llm"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED (importance) sampling, Poisson/Bernoulli form: each
    document is kept with probability min(1, n_chars/400) —
    length-proportional inclusion, the standard size-biased corpus
    sample — and carries its inverse-inclusion-probability correction
    (micro-units, ONE truncating integer division) so downstream
    aggregates stay unbiased (Horvitz-Thompson). Like every sampler
    here the coin is the md5 ticket, never an RNG: the comparison
    `ticket * W < w * buckets` is pure int64 arithmetic, so the sample
    is a deterministic per-row FILTER — scan-only, pushdown-friendly,
    zero shuffles, identical membership at any parallelism or engine,
    and any re-run or sibling table keyed by doc_id selects the exact
    same rows. The reservoir alternative (Efraimidis-Spirakis u^(1/w)
    top-k) needs a float pow whose last-ulp placement differs across
    engines; the Poisson form keeps weighted sampling inside the
    integer-exact discipline."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "source", "n_chars",
        hash_ticket(F.col("doc_id")).alias("ticket"),
    )
    return t.filter(F.col("ticket") * 400 < F.col("n_chars") * 10000).select(
        "doc_id", "lang", "source", "n_chars",
        F.when(F.col("n_chars") >= 400, F.lit(1000000))
        .otherwise(F.expr("1000000 * 400 div n_chars"))
        .cast("bigint")
        .alias("inv_p_micro"),
    )


# DSIR-style data selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw-corpus
# document by how much more likely a TARGET-domain n-gram LM finds it
# than the corpus LM, and resample with probability proportional to
# that likelihood ratio. Here the target slice is the hash-ticket top
# 10% (ticket >= 9000 — the q_contamination/benchmark convention) and
# both LMs are the q_lm_perplexity add-one-smoothed bigram machinery.
_DSIR_SHIFT = 30_000_000  # > max |cost_c - cost_t| in micro-units

# shared by q_sample_dsir and its streaming twin q_stream_dsir_gate:
# the two express the SAME selection, batch vs score-on-ingest, so
# they are held to the identical truth
_DSIR_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang, text, {_sql_ticket('doc_id')} AS ticket
      FROM documents
    ),
    wsr AS (
      SELECT doc_id, lang, ticket,
             list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM t
    ),
    bi AS (
      SELECT doc_id, ticket, p[1] AS a, p[2] AS b
      FROM (
        SELECT doc_id, ticket,
               unnest(list_transform(
                 generate_series(1, greatest(len(w) - 1, 0)),
                 i -> [w[i], w[i + 1]]
               )) AS p
        FROM wsr
      )
    ),
    unic AS (
      SELECT a, COUNT(*) AS c1 FROM (
        SELECT unnest(w) AS a FROM wsr WHERE ticket < 9000) GROUP BY a
    ),
    vocc AS (SELECT COUNT(*) AS v FROM unic),
    bic AS (
      SELECT a, b, COUNT(*) AS c2 FROM bi WHERE ticket < 9000 GROUP BY a, b
    ),
    unit AS (
      SELECT a, COUNT(*) AS c1 FROM (
        SELECT unnest(w) AS a FROM wsr WHERE ticket >= 9000) GROUP BY a
    ),
    voct AS (SELECT COUNT(*) AS v FROM unit),
    bit AS (
      SELECT a, b, COUNT(*) AS c2 FROM bi WHERE ticket >= 9000 GROUP BY a, b
    ),
    occ AS (
      SELECT doc_id, a, b, COUNT(*) AS n_occ
      FROM bi WHERE ticket < 9000 GROUP BY doc_id, a, b
    ),
    gram AS (SELECT DISTINCT a, b FROM occ),
    cost AS (
      SELECT g.a, g.b,
             CAST(ROUND(-ln((COALESCE(bc.c2, 0) + 1.0)
                            / (COALESCE(uc.c1, 0) + (SELECT v FROM vocc)))
                        * 1000000) AS BIGINT) AS cost_c,
             CAST(ROUND(-ln((COALESCE(bt.c2, 0) + 1.0)
                            / (COALESCE(ut.c1, 0) + (SELECT v FROM voct)))
                        * 1000000) AS BIGINT) AS cost_t
      FROM gram g
      LEFT JOIN bic bc ON g.a = bc.a AND g.b = bc.b
      LEFT JOIN unic uc ON g.a = uc.a
      LEFT JOIN bit bt ON g.a = bt.a AND g.b = bt.b
      LEFT JOIN unit ut ON g.a = ut.a
    ),
    sc AS (
      SELECT occ.doc_id,
             CAST(SUM(occ.n_occ) AS BIGINT) AS n_bigrams,
             CAST(SUM(occ.n_occ * (cost.cost_c - cost.cost_t
                                   + {_DSIR_SHIFT})) AS BIGINT) AS s
      FROM occ JOIN cost ON occ.a = cost.a AND occ.b = cost.b
      GROUP BY occ.doc_id
    ),
    r AS (
      SELECT doc_id, n_bigrams,
             CAST(s // n_bigrams - {_DSIR_SHIFT} AS BIGINT) AS ratio_micro
      FROM sc
    ),
    acc AS (
      SELECT doc_id, n_bigrams, ratio_micro,
             CAST(ROUND(exp(LEAST(ratio_micro, 0) / 1000000.0) * 1000000)
                  AS BIGINT) AS accept_micro
      FROM r
    )
    SELECT t.doc_id, t.lang, acc.n_bigrams, acc.ratio_micro, acc.accept_micro
    FROM acc JOIN t ON acc.doc_id = t.doc_id
    WHERE t.ticket * 100 < acc.accept_micro
    """


def _dsir_base(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(t, ws, bi): the ticketed documents, their word arrays, and the
    exploded (doc_id, ticket, a, b) bigram occurrences — shared by the
    batch selector and the LM-cost-table builder."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "text",
        hash_ticket(F.col("doc_id")).alias("ticket"),
    )
    ws = t.select(
        "doc_id", "lang", "ticket",
        F.filter(F.split("text", " "), lambda w: w != "").alias("w"),
    )
    bi = ws.select(
        "doc_id", "ticket",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"
                ),
            ).otherwise(
                F.expr("CAST(array() AS array<struct<a:string,b:string>>)")
            )
        ).alias("p"),
    ).select("doc_id", "ticket", "p.a", "p.b")
    return t, ws, bi


def _dsir_cost_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (a, b, cost_c, cost_t) likelihood-ratio table — both bigram
    LMs trained and snapped to micro-units, covering every distinct
    raw-slice bigram — materialized once per (sf_dir, fingerprint).
    This IS the artifact a production DSIR run persists and reuses
    across selection sweeps; the batch selector and the streaming
    ingest gate both consume it, so they cannot drift."""
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once, table_fingerprint,
    )

    def build() -> str:
        import tempfile

        out = tempfile.mkdtemp(prefix="dsir_cost_")
        _, ws, bi = _dsir_base(spark, sf_dir)

        def _lm(pred: str):
            uni = (
                ws.filter(F.expr(pred))
                .select(F.explode("w").alias("a"))
                .groupBy("a")
                .agg(F.count(F.lit(1)).alias("c1"))
            )
            voc = uni.agg(F.count(F.lit(1)).alias("v"))
            big = (
                bi.filter(F.expr(pred))
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("c2"))
            )
            return uni, voc, big

        unic, vocc, bic = _lm("ticket < 9000")
        unit, voct, bit_ = _lm("ticket >= 9000")
        gram = bi.filter("ticket < 9000").select("a", "b").distinct()
        (
            gram.join(bic, ["a", "b"], "left")
            .join(unic, "a", "left")
            .withColumnRenamed("c2", "c2c").withColumnRenamed("c1", "c1c")
            .join(bit_, ["a", "b"], "left")
            .join(unit, "a", "left")
            .withColumnRenamed("c2", "c2t").withColumnRenamed("c1", "c1t")
            .crossJoin(F.broadcast(vocc.withColumnRenamed("v", "vc")))
            .crossJoin(F.broadcast(voct.withColumnRenamed("v", "vt")))
            .select(
                "a", "b",
                F.round(
                    -F.log((F.coalesce("c2c", F.lit(0)) + 1.0)
                           / (F.coalesce("c1c", F.lit(0)) + F.col("vc")))
                    * 1e6
                ).cast("bigint").alias("cost_c"),
                F.round(
                    -F.log((F.coalesce("c2t", F.lit(0)) + 1.0)
                           / (F.coalesce("c1t", F.lit(0)) + F.col("vt")))
                    * 1e6
                ).cast("bigint").alias("cost_t"),
            )
            .write.mode("overwrite").parquet(out)
        )
        return out

    return spark.read.parquet(
        materialize_once(
            ("dsir_cost", sf_dir, _DSIR_SHIFT,
             table_fingerprint(sf_dir, "documents")),
            build,
        )
    )


@register(
    "q_sample_dsir",
    oracle=_DSIR_ORACLE,
    tags=("sampling", "llm", "text"),
)
def q_sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR IMPORTANCE RESAMPLING: select raw-corpus documents that
    look like the TARGET domain. Two add-one-smoothed bigram LMs train
    in-plan (target = ticket >= 9000 slice, corpus = the raw ticket <
    9000 slice — the q_lm_perplexity machinery twice), each distinct
    raw bigram's -ln P snaps to integer micro-units ONCE per LM
    (vocab-sized tables, ulp-stable), and a document's importance
    score is the MEAN per-bigram log-likelihood-ratio
    ln P_target - ln P_corpus = cost_c - cost_t — computed as one
    occurrence-weighted integer sum with a +30e6 shift so the integer
    division stays on positive operands (Spark `div` and DuckDB `//`
    agree there unconditionally). Acceptance probability
    min(1, exp(ratio)) snaps to micro-units once per doc (the one
    double op, ulp-absorbed by the snap), and the keep decision is the
    q_sample_weighted hash-ticket cross-multiplication
    ``ticket * 100 < accept_micro`` — pure int64, no RNG, no float
    division: identical membership at any parallelism or engine, and
    re-runs select the exact same rows (Horvitz-Thompson corrections
    can ride accept_micro directly).

    Scale: two vocab-sized LM tables + one corpus-linear (doc, bigram)
    rollup — the same shuffle budget as running perplexity scoring
    twice; nothing is all-pairs, the target slice is read once. At
    100 TB the LM cost table is the artifact a production DSIR run
    persists and reuses across selection sweeps — here it materializes
    once per (sf_dir, fingerprint) and the streaming ingest-gate twin
    consumes the identical file (_dsir_cost_table)."""
    t, _, bi = _dsir_base(spark, sf_dir)
    occ = (
        bi.filter("ticket < 9000")
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    cost = _dsir_cost_table(spark, sf_dir)
    sc = (
        occ.join(cost, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.col("n_occ")
                * (F.col("cost_c") - F.col("cost_t") + _DSIR_SHIFT)
            ).cast("bigint").alias("s"),
        )
    )
    acc = sc.select(
        "doc_id", "n_bigrams",
        (F.expr("s div n_bigrams") - _DSIR_SHIFT)
        .cast("bigint").alias("ratio_micro"),
    ).select(
        "doc_id", "n_bigrams", "ratio_micro",
        F.round(
            F.exp(F.least(F.col("ratio_micro"), F.lit(0)) / 1e6) * 1e6
        ).cast("bigint").alias("accept_micro"),
    )
    return (
        acc.join(t.select("doc_id", "lang", "ticket"), "doc_id")
        .filter(F.col("ticket") * 100 < F.col("accept_micro"))
        .select("doc_id", "lang", "n_bigrams", "ratio_micro", "accept_micro")
    )


_SHARD_N = 8


@register(
    "q_corpus_shard",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_sql_ticket('doc_id')} AS ticket,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_toks
      FROM documents
    ),
    t2 AS (SELECT * FROM t WHERE n_toks >= 1),
    c AS (
      SELECT doc_id, n_toks,
             SUM(n_toks) OVER (ORDER BY ticket, doc_id) AS cum
      FROM t2
    ),
    tot AS (SELECT SUM(n_toks) AS total FROM t2)
    SELECT CAST(((c.cum - c.n_toks) * {_SHARD_N}) // tot.total AS BIGINT)
             AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(c.n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(c.doc_id) AS BIGINT) AS doc_id_sum
    FROM c CROSS JOIN tot
    GROUP BY 1
    """,
    tags=("sampling", "llm", "scale"),
)
def q_corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-AND-SHARD — the last step of every training-data run:
    deterministically shuffle the corpus (order by the md5 ticket — no
    RNG, identical order at any parallelism or engine) and cut it into
    {_SHARD_N} TOKEN-BALANCED contiguous shards,
    shard = floor(start_offset * N / total_tokens) — each shard's
    token mass differs from ideal by at most one document, the balance
    a tfrecord/webdataset writer needs so no trainer rank starves.
    Emits the per-shard manifest (doc count, token mass, id checksum).

    Scale: the running offset comes from the two-phase distributed
    prefix scan (operators/prefix.py — range partition by the order
    key, O(partitions) driver offset pass, broadcast offsets; NO
    single-partition global window), the total is a 1-row broadcast,
    and the shard id is pure int64 arithmetic on exact token counts —
    the oracle's global window restates it directly. The same plan at
    100 TB writes each shard with partitionBy(shard_id) and never
    materializes a global sort."""
    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint")
        .alias("n_toks"),
    ).filter(F.col("n_toks") >= 1)
    # the grand total falls out of the prefix scan's driver offset
    # pass — the old 1-row crossJoin aggregate re-ran the whole corpus
    # scan+tokenize lineage a second time just to size the shards (r14)
    c, total = ordered_prefix_sum(
        t, ["ticket", "doc_id"], "n_toks", out_col="cum", return_total=True
    )
    return (
        c.select(
            "doc_id",
            "n_toks",
            F.expr(f"((cum - n_toks) * {_SHARD_N}) div {max(total, 1)}")
            .cast("bigint")
            .alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("doc_id_sum"),
        )
    )
