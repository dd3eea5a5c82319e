"""Training-data hygiene surface (round 3): test-set contamination
detection, repetition-ratio quality gating, and PII scrubbing.

These extend the north-star LLM-pipeline operators (SURVEY.md 2.4,
BASELINE.json) past dedup/sampling into the checks a pretraining
corpus actually ships through. All three are pure DataFrame work —
no Python in the hot path — and each reuses the engine's existing
primitives (hash-ticket splits from sampling_q, shingles from
operators.dedup) so split membership and n-gram definitions agree
across the whole pipeline.

Scale notes:

- Contamination joins DISTINCT n-grams, never documents: the shuffle
  carries (gram, doc_id) pairs whose volume is bounded by corpus
  token count, and the train side collapses to distinct grams before
  the join (at 100 TB: a bloom filter on train grams prunes the test
  explode before the shuffle; the exact join stays for the flagged
  remainder).
- Repetition ratio is explode -> two-level hash agg; partial
  aggregation collapses each doc's bigrams map-side, so the shuffle
  is one row per (doc, distinct bigram).
- PII scrub is scan-only regexp work inside codegen; zero shuffles
  before the tiny per-source summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.dedup import shingles, tokens
from docker_based_real_time_etl_project_spark.queries.registry import register, table
from docker_based_real_time_etl_project_spark.queries.sampling_q import (
    _sql_ticket, hash_ticket,
)

# DuckDB twin of operators.dedup.tokens / shingles(k): split on space,
# drop empties, then k-token sliding windows joined with spaces.
_SQL_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


def _sql_shingles(k: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({_SQL_TOKS}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({_SQL_TOKS}, i, i + {k - 1}), ' '))"
    )


# ---------------------------------------------------------------------------
# Test-set contamination: which test docs share 5-grams with train?
# ---------------------------------------------------------------------------

@register(
    "q_contamination",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             {_sql_ticket('doc_id')} AS ticket,
             unnest(list_distinct({_sql_shingles(5)})) AS g
      FROM documents
    ),
    train_g AS (SELECT DISTINCT g FROM grams WHERE ticket < 8000),
    test_g  AS (SELECT doc_id, g FROM grams WHERE ticket >= 9000),
    totals  AS (SELECT doc_id, COUNT(*) AS n_grams FROM test_g GROUP BY doc_id),
    shared  AS (
      SELECT doc_id, COUNT(*) AS n_shared
      FROM test_g WHERE g IN (SELECT g FROM train_g)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_grams,
           COALESCE(s.n_shared, 0) AS n_shared,
           COALESCE(s.n_shared, 0) / t.n_grams AS contamination
    FROM totals t
    LEFT JOIN shared s USING (doc_id)
    """,
    tags=("llm", "dedup", "text"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination scan: for every test-split document
    (hash-ticket split — same tickets as q_sample_split, so this IS
    the split the sampler would emit), the fraction of its distinct
    word 5-grams that also occur anywhere in the train split.

    Plan shape: one linear pass shingles both splits; train collapses
    to DISTINCT grams (map-side partials); the overlap is a gram-key
    join carrying only (gram-hash, doc_id); per-doc counts are a final
    small aggregate. Never joins document text against document text.

    Both the train-side distinct and the semi-join run on
    ``xxhash64(gram)`` — 8 bytes — instead of the ~40-60-byte 5-gram
    string, so the two widest shuffles in the plan carry longs, not
    text. A 64-bit collision would mark one test gram as contaminated
    when it is not; for a contamination SCREEN the expected error is
    ~(distinct train grams) * (test grams) / 2^64 — negligible.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.array_distinct(shingles("text", 5)).alias("grams"),
    )
    train_g = (
        d.filter(F.col("ticket") < 8000)
        .select(F.explode("grams").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    test_g = (
        d.filter(F.col("ticket") >= 9000)
        .select("doc_id", F.explode("grams").alias("g"))
        .select("doc_id", F.xxhash64("g").alias("gh"))
    )
    shared = test_g.join(train_g, "gh", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    totals = test_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) / F.col("n_grams")).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition-ratio quality gate (Gopher/MassiveText-style rules)
# ---------------------------------------------------------------------------

@register(
    "q_repetition_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ),
    big AS (
      SELECT doc_id,
             len(w) AS n_tok,
             len(list_distinct(w)) AS n_distinct,
             unnest(CASE WHEN len(w) < 2 THEN [CAST(NULL AS VARCHAR)]
                    ELSE list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i + 1]) END) AS bg
      FROM toks
    ),
    counts AS (
      SELECT doc_id, n_tok, n_distinct, bg, COUNT(bg) AS c
      FROM big GROUP BY doc_id, n_tok, n_distinct, bg
    ),
    top AS (
      SELECT doc_id, n_tok, n_distinct,
             MAX(CASE WHEN bg IS NOT NULL THEN c END) AS top_bigram_count
      FROM counts GROUP BY doc_id, n_tok, n_distinct
    )
    SELECT doc_id, n_tok, n_distinct,
           n_distinct / n_tok AS distinct_word_ratio,
           top_bigram_count,
           CASE WHEN n_tok > 1 THEN top_bigram_count / (n_tok - 1) END
             AS top_bigram_frac,
           (n_distinct / n_tok < 0.3)
             OR (CASE WHEN n_tok > 1 THEN top_bigram_count / (n_tok - 1) END > 0.18)
             AS flagged_repetitive
    FROM top
    """,
    tags=("llm", "text"),
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gate: per document, the distinct-word ratio
    and the share of bigrams taken by the single most frequent bigram
    (the MassiveText-style "top n-gram fraction" rule), plus the gate
    verdict. Documents of one token have no bigrams and are never
    flagged by the bigram rule (NULL frac, like the oracle's).

    Plan shape: bigrams via a pure-expression sliding zip (no UDF),
    explode, then (doc, bigram) hash count with map-side partials and
    a per-doc max — two narrow shuffles, both on doc_id.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("w")
    )
    n = F.size("w")
    bigrams = F.transform(
        F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)),
    )
    base = d.select(
        "doc_id",
        n.cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.explode_outer(bigrams).alias("bg"),
    )
    counts = base.groupBy("doc_id", "n_tok", "n_distinct", "bg").agg(
        F.count("bg").alias("c")
    )
    top = counts.groupBy("doc_id", "n_tok", "n_distinct").agg(
        F.max(F.when(F.col("bg").isNotNull(), F.col("c"))).alias("top_bigram_count")
    )
    dwr = F.col("n_distinct") / F.col("n_tok")
    tbf = F.when(
        F.col("n_tok") > 1, F.col("top_bigram_count") / (F.col("n_tok") - 1)
    )
    return top.select(
        "doc_id", "n_tok", "n_distinct",
        dwr.alias("distinct_word_ratio"),
        "top_bigram_count",
        tbf.alias("top_bigram_frac"),
        ((dwr < 0.3) | (tbf > 0.18)).alias("flagged_repetitive"),
    )


# ---------------------------------------------------------------------------
# PII scrub: mask long digit runs, summarize per source
# ---------------------------------------------------------------------------

@register(
    "q_pii_scrub",
    oracle="""
    WITH raws AS (
      SELECT 'customer' AS src, c_name AS raw FROM customer
      UNION ALL
      SELECT 'events' AS src, props AS raw FROM events
    ),
    masked AS (
      SELECT src, raw, regexp_replace(raw, '[0-9]{4,}', '####', 'g') AS clean
      FROM raws
    )
    SELECT src,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE clean <> raw) AS n_redacted,
           MIN(CASE WHEN clean <> raw THEN clean END) AS sample_clean
    FROM masked
    GROUP BY src
    """,
    tags=("llm", "text"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing pass: mask digit runs of 4+ (account /
    phone-number shaped substrings) across two heterogeneous string
    sources, and report how many rows were touched per source — the
    audit a redaction job emits. The events source is the negative
    control (its JSON carries only short numbers).

    Plan shape: regexp inside whole-stage codegen over a scan-only
    union; the summary shuffles 2 groups. Spark's regexp_replace is
    global by default; the oracle passes DuckDB's 'g' flag explicitly.
    """
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_name").alias("raw")
    )
    ev = table(spark, sf_dir, "events").select(
        F.lit("events").alias("src"), F.col("props").alias("raw")
    )
    masked = cust.unionByName(ev).withColumn(
        "clean", F.regexp_replace("raw", "[0-9]{4,}", "####")
    )
    touched = F.col("clean") != F.col("raw")
    return masked.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(touched, 1)).alias("n_redacted"),
        F.min(F.when(touched, F.col("clean"))).alias("sample_clean"),
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup at chunk granularity (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

_CHUNK = 10
_SQL_CHUNK_GRID = (
    f"list_transform(range(0, CAST(ceil(len(tl) / {_CHUNK}.0) AS INT)), "
    f"i -> array_to_string(list_slice(tl, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}), ' '))"
)


@register(
    "q_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS tl FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(tl) / {_CHUNK}.0) AS INT))) AS pos,
             unnest({_SQL_CHUNK_GRID}) AS chunk
      FROM toks WHERE len(tl) > 0
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
           COALESCE(array_to_string(list(chunk ORDER BY pos) FILTER (WHERE rn = 1), ' '),
                    '') AS clean_text
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "text"),
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication at chunk granularity: tile every
    document into non-overlapping 10-token chunks, keep only the
    corpus-globally FIRST occurrence of each repeated chunk (ordered
    by doc_id then position), and reassemble the surviving text — the
    bounded-memory approximation of suffix-array ExactSubstr dedup
    (Lee et al. 2022), which at 100 TB replaces an unbuildable global
    suffix array with a hash shuffle.

    Plan shape: one linear chunking pass (pure expressions), one
    shuffle partitioned BY CHUNK HASH (uniform — chunk text is
    high-entropy, so no skew), a per-chunk window whose partitions are
    the few duplicate occurrences, and one reassembly aggregate per
    doc. Never doc-against-doc; state per chunk is O(occurrences).
    """
    from docker_based_real_time_etl_project_spark.operators.dedup import token_chunks

    occ = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(token_chunks("text", _CHUNK)).alias("pos", "chunk"))
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = occ.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") == 1
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.when(kept, F.struct("pos", "chunk")))),
                lambda x: x.chunk,
            ),
        ).alias("clean_text"),
    )
