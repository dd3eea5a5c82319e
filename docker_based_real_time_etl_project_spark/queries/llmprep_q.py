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

# q_contamination_bloom's bitmap, built once per (sf_dir, fingerprint)
# per session — (m_bits, words). Pure function of the data.
_BLOOM_WORDS_CACHE: dict[tuple, tuple[int, list[int]]] = {}


def _sql_shingles(k: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({_SQL_TOKS}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({_SQL_TOKS}, i, i + {k - 1}), ' '))"
    )


# ---------------------------------------------------------------------------
# Test-set contamination: which test docs share 5-grams with train?
# ---------------------------------------------------------------------------

_CONTAM_ORACLE = f"""
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
    """


def eval_gram_hashes(
    spark: SparkSession, sf_dir: str, n: int = 5, ticket_ge: int = 9000
) -> DataFrame:
    """(doc_id, gh): each eval/test-split document's DISTINCT word
    ``n``-gram hashes — the probe-side twin of train_gram_hashes,
    added in round 15 (r14 verdict #4: q_contamination, its bloom
    variant, and the capstone's stage-5 screen each re-ran the
    eval-slice shingle+explode from raw text; the bloom variant even
    evaluated it twice per run, once per aggregate branch). One
    explode per session, shared by every consumer: q_contamination /
    q_contamination_bloom read it as the per-doc probe set, the
    capstone distincts away doc_id for its gram screen. 8-byte hash
    rows over ~10% of the corpus — at 100 TB this is the written
    "held-out gram table" a decontamination run keeps beside the
    train gram set."""
    import tempfile

    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once, table_fingerprint,
    )

    def build() -> str:
        from docker_based_real_time_etl_project_spark.operators.dedup import (
            spread_compact,
        )

        g_dir = tempfile.mkdtemp(prefix="eval_grams_")
        (
            spread_compact(table(spark, sf_dir, "documents"), "doc_id")
            .filter(hash_ticket(F.col("doc_id")) >= ticket_ge)
            .select(
                "doc_id",
                F.explode(F.array_distinct(shingles("text", n))).alias("g"),
            )
            .select("doc_id", F.xxhash64("g").alias("gh"))
            .write.mode("overwrite").parquet(g_dir)
        )
        return g_dir

    return spark.read.parquet(
        materialize_once(
            ("eval_grams", sf_dir, n, ticket_ge,
             table_fingerprint(sf_dir, "documents")),
            build,
        )
    )


@register(
    "q_contamination",
    oracle=_CONTAM_ORACLE,
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
    train_g = train_gram_hashes(spark, sf_dir)
    test_g = eval_gram_hashes(spark, sf_dir)
    # ONE pass over the test grams: a LEFT join against the DISTINCT
    # train set marks hits without fanning out, and a single per-doc
    # aggregate reads off both the total and the shared count — the
    # totals/semi-join two-branch form re-ran the test explode twice
    # (the round-10 sf10 profile's pattern; same fix as the span query)
    marked = test_g.join(train_g.withColumn("_hit", F.lit(1)), "gh", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_shared"),
    ).select(
        "doc_id",
        "n_grams",
        "n_shared",
        (F.col("n_shared") / F.col("n_grams")).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# Shared train-gram artifact: the contamination family's static side
# ---------------------------------------------------------------------------


def train_gram_hashes(
    spark: SparkSession, sf_dir: str, n: int = 5, ticket_lt: int = 8000
) -> DataFrame:
    """The DISTINCT train-split gram hash set (xxhash64 of word
    ``n``-grams, split by the same hash tickets as q_sample_split),
    materialized ONCE per session per (params, data-fingerprint) and
    shared by every contamination-family consumer — q_contamination,
    q_contamination_bloom, q_contamination_span, and the streaming
    ingest gate all probe this one artifact instead of re-exploding
    and re-distincting the train corpus per query (the same
    amortization contract as dedup_q.gram_pair_candidates; build count
    pinned by tests/test_properties.py::test_train_gram_artifact_shared).
    In production this is the written "train gram set" table every
    decontamination pipeline keeps next to the corpus snapshot; 8-byte
    hash rows, vocabulary-sized, partitioned by hash — the semi-join
    prunes with it without ever shuffling text."""
    import tempfile

    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once, table_fingerprint,
    )

    def build() -> str:
        from docker_based_real_time_etl_project_spark.operators.dedup import (
            spread_compact,
        )

        g_dir = tempfile.mkdtemp(prefix="train_grams_")
        (
            spread_compact(table(spark, sf_dir, "documents"), "doc_id")
            .filter(hash_ticket(F.col("doc_id")) < ticket_lt)
            .select(F.explode(F.array_distinct(shingles("text", n))).alias("g"))
            .select(F.xxhash64("g").alias("gh"))
            .distinct()
            .write.mode("overwrite").parquet(g_dir)
        )
        return g_dir

    return spark.read.parquet(
        materialize_once(
            ("train_grams", sf_dir, n, ticket_lt,
             table_fingerprint(sf_dir, "documents")),
            build,
        )
    )


@register(
    "q_contamination_bloom",
    oracle=_CONTAM_ORACLE,
    tags=("llm", "dedup", "text"),
)
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_contamination with a Bloom prefilter on the probe side — the
    production shape SCALE.md prescribes when the static side is a
    (small) benchmark suite: the train gram hashes fold into a bitmap
    once, and each test gram tests membership with pure expressions
    (operators.bloom — k getbit probes on a broadcast single-row
    array<long> bitmap, no UDF) BEFORE the semi-join. Measured 89% of test gram rows miss
    at this corpus, so ~89% of probe rows never reach the shuffle.
    Bloom filters have no false negatives, and the exact semi-join on
    the survivors removes the false positives — so this query keeps
    the IDENTICAL full hash oracle as q_contamination: the prefilter
    must be invisible in the result. n_grams per doc is counted
    BEFORE the prefilter (the denominator is a property of the doc,
    not of the filter).

    The bitmap build is DISTRIBUTED (operators.bloom
    .build_bloom_words_distributed): each partition OR-folds its gram
    hashes into a local bitmap, the partials tree-reduce with bit_or,
    and the driver collects only the finished bitmap — the object it
    must hold anyway to broadcast. No corpus-sized collect anywhere
    (round-8 verdict item 2); at 100 TB the build is one scan of the
    materialized train-gram parquet plus a partitions x bitmap-words
    shuffle.

    The bitmap is CACHED per (sf_dir, documents fingerprint) for the
    session — the "built ONCE and reused" production shape (a
    streaming ingest gate probing every batch, a benchmark suite
    screened against many corpus drops): the first call pays the
    distributed build (one scan of the train-gram artifact), every
    later call broadcasts the cached words. Same key policy as
    materialize_once; the bitmap is a pure function of the data."""
    from docker_based_real_time_etl_project_spark.operators.bloom import (
        bloom_might_contain, bloom_size_bits,
        build_bloom_words_distributed, with_bloom_words,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        table_fingerprint,
    )

    train_g = train_gram_hashes(spark, sf_dir)
    key = (sf_dir, table_fingerprint(sf_dir, "documents"))
    if key not in _BLOOM_WORDS_CACHE:
        m_bits = bloom_size_bits(train_g.count())
        _BLOOM_WORDS_CACHE[key] = (
            m_bits,
            build_bloom_words_distributed(train_g, "gh", m_bits, k=4),
        )
    m_bits, words = _BLOOM_WORDS_CACHE[key]
    # the two consumers below (prefilter branch + totals branch) each
    # scan the materialized probe set instead of re-exploding raw text
    test_g = eval_gram_hashes(spark, sf_dir)
    maybe = (
        with_bloom_words(test_g, spark, words)
        .filter(bloom_might_contain(F.col("gh"), F.col("_bloom_words"), m_bits, k=4))
        .drop("_bloom_words")
    )
    shared = maybe.join(train_g, "gh", "left_semi").groupBy("doc_id").agg(
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


# ---------------------------------------------------------------------------
# Per-domain document cap (boilerplate-farm guard)
# ---------------------------------------------------------------------------

@register(
    "q_domain_cap",
    oracle="""
    SELECT doc_id, source, n_chars, rnk FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 3
    """,
    tags=("llm", "sampling"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most N (=3 here) documents per
    source, preferring the longest (n_chars DESC, doc_id tiebreak) —
    the guard against a single boilerplate farm dominating a crawl
    slice (per-domain caps are standard crawl-curation practice;
    C4/RefinedWeb-style). One window over the source partitioning,
    rank filter inside the same stage: a single exchange, and at
    100 TB the per-source state is a 3-row heap per partition, never
    a sort of the whole corpus."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "source", "n_chars", "rnk")
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dup pairs straddling train/val/test
# ---------------------------------------------------------------------------

@register(
    "q_split_leakage",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
               i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
             )) AS grams
      FROM documents
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN t < 8000 THEN 'train'
                  WHEN t < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, {_sql_ticket('doc_id')} AS t FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(len(list_intersect(a.grams, b.grams))
                   / CAST(len(a.grams) + len(b.grams)
                          - len(list_intersect(a.grams, b.grams)) AS DOUBLE),
                   6) AS jaccard
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE ROUND(len(list_intersect(a.grams, b.grams))
            / CAST(len(a.grams) + len(b.grams)
                   - len(list_intersect(a.grams, b.grams)) AS DOUBLE), 6) >= 0.3
    )
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
    JOIN sp sa ON p.id_a = sa.doc_id
    JOIN sp sb ON p.id_b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
    tags=("llm", "dedup", "sampling"),
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs (exact 3-gram Jaccard
    >= 0.3, source-blocked — the same gram_postings_pairs machinery as
    q_ngram_jaccard) whose two documents landed in DIFFERENT
    train/val/test splits. A near-dup straddling train and test leaks
    evaluation data into training even after per-doc dedup 'passed' —
    this is the audit that says the split must be cluster-aware. The
    split comes from the SAME hash tickets as q_sample_split, so the
    audit checks the split the sampler would actually emit. The ticket
    attach is two hash joins of a 2-column doc->split table against
    the (small) pair list. Df-cap caveat as q_ngram_jaccard:
    guard-tested per SF in tests/test_testdata_contract.py. The
    postings join rides the session-materialized gram_pair_candidates
    artifact shared with the other pair consumers (exact integer
    columns, so this query's rounded-boundary filter is unchanged)."""
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        gram_pair_candidates,
    )

    d = table(spark, sf_dir, "documents")
    jac = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    )
    pairs = (
        gram_pair_candidates(spark, sf_dir)
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    t = hash_ticket(F.col("doc_id"))
    sp = d.select(
        "doc_id",
        F.when(t < 8000, "train").when(t < 9000, "val").otherwise("test").alias("split"),
    )
    return (
        pairs.join(sp.withColumnsRenamed({"doc_id": "id_a", "split": "split_a"}), "id_a")
        .join(sp.withColumnsRenamed({"doc_id": "id_b", "split": "split_b"}), "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Contamination span: longest run of consecutive shared 5-grams
# ---------------------------------------------------------------------------

@register(
    "q_contamination_span",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_ticket('doc_id')} AS ticket,
             {_sql_shingles(5)} AS gl
      FROM documents
    ),
    train_g AS (
      SELECT DISTINCT unnest(list_distinct(gl)) AS gram
      FROM g WHERE ticket < 8000
    ),
    test_pos AS (
      SELECT doc_id,
             unnest(range(1, len(gl) + 1)) AS pos,
             unnest(gl) AS gram
      FROM g WHERE ticket >= 9000
    ),
    flagged AS (
      SELECT doc_id, pos, gram IN (SELECT gram FROM train_g) AS shared
      FROM test_pos
    ),
    isl AS (
      SELECT doc_id,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM flagged WHERE shared
    ),
    spans AS (SELECT doc_id, COUNT(*) AS span FROM isl GROUP BY doc_id, grp),
    per_doc AS (
      SELECT doc_id, MAX(span) AS max_span,
             CAST(SUM(span) AS BIGINT) AS n_shared
      FROM spans GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM test_pos GROUP BY doc_id)
    SELECT t.doc_id, t.n_grams,
           COALESCE(p.max_span, 0) AS max_span,
           COALESCE(p.n_shared, 0) AS n_shared
    FROM totals t LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("llm", "dedup", "text"),
)
def q_contamination_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination SPAN metric: per test document, the longest run of
    CONSECUTIVE word 5-grams that also occur in the train split (plus
    the total shared-occurrence count). A 50-gram verbatim quote and
    50 scattered common phrases have the same q_contamination
    fraction; only the span metric separates them — spans are what
    ExactSubstr-style decontamination actually removes. Gaps-and-
    islands over gram positions: flag each occurrence via a hash join
    against the train gram set (xxhash64 keys, as q_contamination),
    then pos - row_number() within shared rows groups each
    consecutive run, and two small aggregates produce per-doc span
    stats. Shuffles: train distinct, the flag join, and the per-doc
    window — all on 8-byte keys."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        shingles("text", 5).alias("grams"),  # positional: NOT distinct
    )
    train_g = train_gram_hashes(spark, sf_dir).withColumn("hit", F.lit(1))
    test_pos = (
        d.filter(F.col("ticket") >= 9000)
        .select("doc_id", F.posexplode("grams").alias("pos", "g"))
        .select("doc_id", "pos", F.xxhash64("g").alias("gh"))
    )
    flagged = test_pos.join(train_g, "gh", "left")
    shared_rows = flagged.filter(F.col("hit").isNotNull())
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = shared_rows.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = isl.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("span"))
    per_doc = spans.groupBy("doc_id").agg(
        F.max("span").alias("max_span"), F.sum("span").alias("n_shared")
    )
    totals = test_pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("max_span", F.lit(0)).alias("max_span"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
    )


_DATACARD_ORACLE = """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 10000
                 AND length(replace(text, ' ', ''))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 2 AND 12
                 AND (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
                     / CAST(length(text) AS DOUBLE) < 0.2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           median(len(string_split(text, ' '))) AS median_tokens
    FROM documents
    GROUP BY source
    """


@register("q_corpus_datacard", oracle=_DATACARD_ORACLE, tags=("llm", "text"))
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card a corpus release publishes: volume
    (docs, tokens), quality-gate pass count (same gate as
    q_quality_score), exact-duplicate count (docs minus distinct
    content fingerprints), language spread, and median document
    length. One hash aggregation over the corpus — the fingerprints
    and per-doc token counts shuffle, never the text — with the two
    distinct-aggregates riding Spark's expand, so the report stays a
    single pass at any corpus size. Median is exact here (per-source
    groups); the approx-percentile sketch (q_percentiles_approx) is
    the documented swap when a single source holds billions of docs."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    avg_word_len = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ) / n_tokens.cast("double")
    punct_ratio = (
        F.length("text") - F.length(F.regexp_replace("text", r"[^a-z0-9 ]", ""))
    ) / F.length("text").cast("double")
    passes = F.when(
        n_tokens.between(20, 10000) & avg_word_len.between(2, 12) & (punct_ratio < 0.2),
        1,
    ).otherwise(0)
    per_doc = d.select(
        "source",
        "lang",
        n_tokens.alias("n_toks"),
        passes.alias("passes"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("passes").cast("bigint").alias("n_quality_pass"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.percentile("n_toks", 0.5).alias("median_tokens"),
    )


_DRIFT_BUCKETS = 21  # n_tokens // 10 capped at 20: fixed grid, fixed smoothing

_DRIFT_ORACLE = f"""
    WITH t AS (
      SELECT {{ticket}} AS ticket,
             len(string_split(text, ' ')) AS n_toks
      FROM documents
    ),
    b AS (
      SELECT LEAST(n_toks // 10, 20) AS bucket,
             CASE WHEN ticket < 5000 THEN 1 ELSE 0 END AS is_ref
      FROM t
    ),
    c0 AS (
      SELECT bucket,
             CAST(SUM(is_ref) AS BIGINT) AS n_ref,
             CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
      FROM b GROUP BY bucket
    ),
    grid AS (SELECT CAST(unnest(generate_series(0, 20)) AS BIGINT) AS bucket),
    c AS (
      SELECT g.bucket,
             COALESCE(n_ref, 0) AS n_ref,
             COALESCE(n_cur, 0) AS n_cur
      FROM grid g LEFT JOIN c0 ON g.bucket = c0.bucket
    ),
    tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
                   CAST(SUM(n_cur) AS BIGINT) AS tc FROM c),
    scored AS (
      SELECT bucket, n_ref, n_cur,
             CAST(ROUND(
               ((n_cur + 1.0) / (tc + {_DRIFT_BUCKETS})
                - (n_ref + 1.0) / (tr + {_DRIFT_BUCKETS}))
               * ln(((n_cur + 1.0) / (tc + {_DRIFT_BUCKETS}))
                    / ((n_ref + 1.0) / (tr + {_DRIFT_BUCKETS})))
               * 1000000) AS BIGINT) AS psi_micro
      FROM c CROSS JOIN tot
    )
    SELECT bucket, n_ref, n_cur, psi_micro FROM scored
    UNION ALL
    SELECT CAST(-1 AS BIGINT), tr, tc,
           (SELECT CAST(SUM(psi_micro) AS BIGINT) FROM scored)
    FROM tot
    """.replace("{ticket}", _sql_ticket("doc_id"))


def psi_from_bucket_counts(c: DataFrame) -> DataFrame:
    """(bucket, n_ref, n_cur) -> per-bucket PSI rows + the bucket=-1
    summary. Shared by the batch monitor and the streaming ingest
    monitor so both emit the identical contract: +1 Laplace smoothing
    over the fixed 21-bucket grid, ln ladder in integer micro-units.
    The input is densified against the full 0..20 grid first (missing
    buckets -> 0/0), so every bucket's smoothed term — including
    buckets empty in BOTH slices, whose term is nonzero whenever slice
    totals differ — contributes to the summed total: the "21-bucket
    grid" description is literal, and the output is always 22 rows.
    ``c`` must be tiny (<= grid size) and materialized — it feeds four
    consumers."""
    spark = c.sparkSession
    grid = spark.range(_DRIFT_BUCKETS).select(F.col("id").cast("bigint").alias("bucket"))
    c = grid.join(c, "bucket", "left").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
    )
    tot = c.agg(
        F.sum("n_ref").cast("bigint").alias("tr"),
        F.sum("n_cur").cast("bigint").alias("tc"),
    )
    nb = F.lit(_DRIFT_BUCKETS)
    p_cur = (F.col("n_cur") + 1.0) / (F.col("tc") + nb)
    p_ref = (F.col("n_ref") + 1.0) / (F.col("tr") + nb)
    scored = (
        c.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * 1000000.0)
            .cast("bigint")
            .alias("psi_micro"),
        )
    )
    summary = (
        scored.agg(F.sum("psi_micro").cast("bigint").alias("psi_micro"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.col("tr").alias("n_ref"),
            F.col("tc").alias("n_cur"),
            "psi_micro",
        )
    )
    return scored.unionByName(summary)


@register("q_corpus_drift", oracle=_DRIFT_ORACLE, tags=("llm", "monitor"))
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus slices (PSI over
    the token-count histogram): the check a continuously-ingesting
    training pipeline runs so a scraper regression or source mix shift
    is caught BEFORE a training run consumes the batch. Slices come
    from the same deterministic hash-ticket split the sampling ops use
    (ref = ticket < 5000, cur = rest); the histogram is a fixed
    21-bucket grid (n_tokens // 10 capped) with +1 Laplace smoothing
    so empty buckets stay finite, and the PSI contribution is emitted
    in integer micro-units (the ln ladder is the q_tfidf determinism
    pattern). One groupBy over bucket ids + a broadcast 1-row totals
    join — the corpus shuffles 21 rows, nothing else; a bucket=-1
    summary row carries slice totals and total PSI (industry reading:
    < 0.1 stable, > 0.25 drifted)."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    b = t.select(
        F.least(F.floor(F.col("n_toks") / 10), F.lit(20)).cast("bigint").alias("bucket"),
        F.when(F.col("ticket") < 5000, 1).otherwise(0).alias("is_ref"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("is_ref").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("n_cur"),
    )
    # the histogram is <= 21 rows but feeds FOUR downstream consumers
    # (totals, per-bucket scores, and both union branches): without a
    # checkpoint each one re-derives it from a full corpus scan — 5
    # table passes for a 21-row report. One pass, then everything
    # below runs on the checkpointed buckets.
    c = c.localCheckpoint(eager=True)
    return psi_from_bucket_counts(c)


@register(
    "q_bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
        SELECT w, COUNT(*) AS c FROM words WHERE length(w) >= 2 GROUP BY w
    ), idx AS (
        SELECT CAST(unnest(range(1, (SELECT MAX(length(w)) FROM wc))) AS INTEGER) AS i
    ), pairs AS (
        SELECT substr(w, i, 2) AS pair, c
        FROM wc JOIN idx ON i <= length(w) - 1
    ), agg AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS n_words
        FROM pairs GROUP BY pair
    )
    SELECT pair, n, n_words FROM agg ORDER BY n DESC, pair LIMIT 50
    """,
    tags=("llm-prep", "text", "tokenizer"),
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, round one: the top-50 adjacent
    character-pair frequencies over the corpus — the inner statistic
    every BPE/WordPiece trainer computes before each merge. Done the
    way SentencePiece does it at scale: the corpus first collapses to
    the DISTINCT-WORD frequency table (a vocabulary-sized rollup —
    Zipf makes |vocab| grow like sqrt(corpus), so the expensive text
    pass ends at the first groupBy), then pair generation runs per
    distinct word (transform over sequence(1, len-1), JVM-side, no
    UDF) weighted by the word's count. Two narrow shuffles — word
    rollup, pair rollup — both with map-side partial aggregation, then
    TakeOrderedAndProject for the top-k; nothing corpus-sized crosses
    the wire after the first exchange. Ties broken by pair text so the
    cut is deterministic at every parallelism."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


@register(
    "q_dedup_span_corpus",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_shingles(5)} AS gl FROM documents
    ),
    pos AS (
      SELECT doc_id,
             unnest(range(1, len(gl) + 1)) AS pos,
             unnest(gl) AS gram
      FROM g WHERE len(gl) > 0
    ),
    dup AS (SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) > 1),
    flagged AS (
      SELECT doc_id, pos FROM pos WHERE gram IN (SELECT gram FROM dup)
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, COUNT(*) AS span, MIN(pos) AS start
      FROM isl GROUP BY doc_id, grp
    ),
    best AS (
      SELECT doc_id, span AS max_span, start AS max_span_start
      FROM (
        SELECT doc_id, span, start,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY span DESC, start ASC
               ) AS rn
        FROM spans
      ) WHERE rn = 1
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(span) AS BIGINT) AS n_dup FROM spans GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM pos GROUP BY doc_id)
    SELECT t.doc_id, t.n_grams,
           COALESCE(b.max_span, 0) AS max_span,
           COALESCE(b.max_span_start, 0) AS max_span_start,
           COALESCE(p.n_dup, 0) AS n_dup
    FROM totals t
    LEFT JOIN best b USING (doc_id)
    LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("llm", "dedup", "text"),
)
def q_dedup_span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL DUPLICATED SPANS ACROSS THE CORPUS — the ExactSubstr
    deliverable of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), where q_contamination_span measured
    spans only against the train split: for EVERY document, the
    longest run of consecutive word 5-grams whose gram occurs more
    than once corpus-wide, that run's start position (the actionable
    removal coordinate), and the total duplicated-position count.
    A verbatim press-release body pasted into 40 pages shows up as one
    long span in each; 40 scattered idioms do not.

    Engine plan is postings-shaped end to end — never doc x doc, never
    suffix arrays: pos-explode to (doc_id, pos, gh=xxhash64(gram)),
    one count-by-gram aggregation finds duplicated grams (8-byte keys,
    map-side partial), a semi-join flags positions, and the
    gaps-and-islands window (pos - row_number per doc) reconstructs
    maximal runs; ties on span length break to the earliest start so
    the result is deterministic. The suffix-array construction the
    paper uses is a single-machine algorithm; the positional-gram
    islands form is the scale-out equivalent for fixed minimum match
    length (span >= 1 gram = 5 tokens), with every shuffle on
    (doc_id) or (gh). The oracle restates the identical islands
    algebra over the raw grams in DuckDB."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        spread_compact,
    )

    d = spread_compact(
        table(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", shingles("text", 5).alias("grams"))
    pos = (
        d.filter(F.size("grams") > 0)
        .select("doc_id", F.posexplode("grams").alias("pos0", "g"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.xxhash64("g").alias("gh"),
        )
    )
    # SINGLE-PASS shape (round-10 sf10 spot fix): the first wiring
    # derived `pos` in FIVE branches (dup agg, semi-join probe, spans,
    # per-doc, totals), so the 25M-gram explode ran five times — 202 s
    # at sf10. One explode now feeds one pipeline: duplicated-gram
    # flagging is a count window over gh (exchange 1), the islands
    # grouping key is pos minus the doc-ordered CUMULATIVE dup count
    # (exchange 2 — same (doc) partitioning also serves the two
    # grouping levels below, which need no further exchange since
    # doc_id prefixes their keys), non-dup rows fold into the same
    # aggregation under a NULL island. 112 s -> ~35 s at sf10, and
    # identical hashes (the algebra is unchanged, only the plan).
    wg = Window.partitionBy("gh")
    wd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = pos.withColumn(
        "dup", F.count(F.lit(1)).over(wg) > 1
    ).withColumn(
        "grp",
        F.when(
            F.col("dup"),
            F.col("pos")
            - F.count(F.when(F.col("dup"), F.lit(1))).over(wd),
        ),
    )
    spans = marked.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("n_pos"), F.min("pos").alias("start")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("n_pos").alias("n_grams"),
        F.sum(F.when(F.col("grp").isNotNull(), F.col("n_pos")))
        .alias("n_dup_raw"),
        F.max(
            F.when(
                F.col("grp").isNotNull(),
                F.struct(
                    F.col("n_pos").alias("s"),
                    (-F.col("start")).alias("ns"),
                ),
            )
        ).alias("b"),
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("b.s"), F.lit(0)).alias("max_span"),
        F.coalesce(-F.col("b.ns"), F.lit(0)).alias("max_span_start"),
        F.coalesce("n_dup_raw", F.lit(0)).alias("n_dup"),
    )


# ---- BPE tokenizer TRAINING loop -------------------------------------
# q_bpe_pair_counts computes round one's statistic; this is the real
# workload: N merge rounds, each picking the single best pair
# (count DESC, then left/right symbol text — a total, engine-free
# order), rewriting the vocabulary, and recounting. Words encode as
# '<sym><sym>...' so a merge is ONE string replace: the pattern
# '<x><y>' is anchored on both ends by the bracket delimiters (no
# symbol contains '<' or '>' — the corpus filter guarantees it), and
# replace()'s left-to-right non-overlapping scan IS greedy BPE merge
# semantics, including runs: '<a><a><a><a>' under (a,a) -> '<aa><aa>'.
_BPE_ROUNDS = 10
_BPE_WORD_RE = "^[a-z0-9]+$"


def _bpe_oracle(
    rounds: int, final: str = "merges", train_pred: str | None = None
) -> str:
    """The training loop unrolled as a MATERIALIZED CTE chain (the
    PageRank oracle discipline): v0 is the encoded distinct-word
    rollup; each round r materializes the pair counts (p{r}), the
    winning pair (b{r}), and the rewritten vocabulary (v{r}).
    ``final`` picks the projection: the merge table ("merges"), the
    exploded final-vocabulary token stats ("encode"), the UNSEEN-slice
    token stats under the trained merges ("encode_unseen"), or the
    per-document unseen tokenization ("encode_unseen_docs" — the
    streaming twin's shape). ``train_pred`` restricts the training
    corpus (the unseen modes hold out its complement)."""
    where_train = f"WHERE {train_pred}" if train_pred else ""
    ctes = [
        f"""base AS MATERIALIZED (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents {where_train})
      WHERE length(w) >= 2 AND regexp_matches(w, '{_BPE_WORD_RE}')
      GROUP BY w
    ),
    v0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS wstr, c FROM base
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"v{r - 1}"
        ctes.append(f"""p{r} AS MATERIALIZED (
      SELECT l[i] AS x, l[i + 1] AS y, CAST(SUM(c) AS BIGINT) AS n
      FROM (
        SELECT l, c, unnest(range(1, len(l))) AS i
        FROM (SELECT regexp_extract_all(wstr, '<([^>]*)>', 1) AS l, c
              FROM {prev})
      ) GROUP BY x, y
    ),
    b{r} AS MATERIALIZED (
      SELECT x, y, n FROM p{r} ORDER BY n DESC, x, y LIMIT 1
    ),
    v{r} AS MATERIALIZED (
      SELECT replace(wstr,
                     '<' || (SELECT x FROM b{r}) || '><'
                         || (SELECT y FROM b{r}) || '>',
                     '<' || (SELECT x FROM b{r})
                         || (SELECT y FROM b{r}) || '>') AS wstr, c
      FROM {prev}
    )""")
        ctes.append(
            f"m{r} AS (SELECT {r} AS round, x AS left_sym, y AS right_sym,"
            f" n AS pair_n FROM b{r})"
        )
    union = "\n      UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, rounds + 1))
    if final == "merges":
        tail = f"SELECT round, left_sym, right_sym, pair_n FROM ({union})"
    elif final == "encode":
        tail = f"""SELECT token,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           COUNT(*) AS n_vocab_positions
    FROM (
      SELECT unnest(regexp_extract_all(wstr, '<([^>]*)>', 1)) AS token, c
      FROM v{rounds})
    GROUP BY token"""
    elif final in ("encode_unseen", "encode_unseen_docs"):
        # the held-out slice is the complement of the training slice;
        # apply the b{r} winners IN ORDER to the unseen words — the
        # tokenizer-apply step, never re-training
        assert train_pred, "unseen modes need a train predicate"
        if final == "encode_unseen":
            ctes.append(f"""u0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS wstr, c FROM (
        SELECT w, COUNT(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents
          WHERE NOT ({train_pred}))
        WHERE length(w) >= 2 AND regexp_matches(w, '{_BPE_WORD_RE}')
        GROUP BY w)
    )""")
            sel_c = ", c"
        else:
            ctes.append(f"""u0 AS MATERIALIZED (
      SELECT doc_id, regexp_replace(w, '(.)', '<\\1>', 'g') AS wstr FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        WHERE NOT ({train_pred}))
      WHERE length(w) >= 2 AND regexp_matches(w, '{_BPE_WORD_RE}')
    )""")
            sel_c = ", doc_id"
        for r in range(1, rounds + 1):
            ctes.append(f"""u{r} AS MATERIALIZED (
      SELECT replace(wstr,
                     '<' || (SELECT x FROM b{r}) || '><'
                         || (SELECT y FROM b{r}) || '>',
                     '<' || (SELECT x FROM b{r})
                         || (SELECT y FROM b{r}) || '>') AS wstr{sel_c}
      FROM u{r - 1}
    )""")
        if final == "encode_unseen":
            tail = f"""SELECT token,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           COUNT(*) AS n_vocab_positions
    FROM (
      SELECT unnest(regexp_extract_all(wstr, '<([^>]*)>', 1)) AS token, c
      FROM u{rounds})
    GROUP BY token"""
        else:
            tail = f"""SELECT doc_id, COUNT(*) AS n_tokens,
           COUNT(DISTINCT t) AS n_distinct_tokens
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(wstr, '<([^>]*)>', 1)) AS t
      FROM u{rounds})
    GROUP BY doc_id"""
    else:
        raise ValueError(f"unknown final {final!r}")
    return "\n    WITH " + ",\n    ".join(ctes) + "\n    " + tail


@register(
    "q_bpe_train",
    oracle=_bpe_oracle(_BPE_ROUNDS),
    tags=("llm-prep", "text", "tokenizer", "iterative", "scale"),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZER TRAINING: {_BPE_ROUNDS} merge rounds over the
    corpus, returning the learned merge table (round, left symbol,
    right symbol, winning pair count) — the artifact a tokenizer ships.

    The loop is the SentencePiece shape: the corpus collapses ONCE to
    the distinct-word frequency rollup (vocabulary-sized — Zipf makes
    |vocab| ~ sqrt(corpus)), and every round after that is
    vocabulary-sized, never corpus-sized: count adjacent symbol pairs
    weighted by word multiplicity, pick the winner by the total
    (count DESC, symbol text) order, rewrite each word's encoding with
    one anchored string replace whose left-to-right non-overlapping
    scan is exactly greedy BPE (runs merge pairwise: aaaa -> aa aa).
    The winner extraction is a 1-row broadcast joined into the rewrite
    (the PageRank dangling-sum pattern: a bounded per-iteration
    action, never a corpus collect), and the vocabulary is
    localCheckpoint'ed per round so round r's plan starts from
    materialized state instead of r stacked replaces — per-round cost
    is O(|vocab|) regardless of r, pinned in tests/test_scale_ops.py.

    At 100 TB: the only corpus-sized work is the first word rollup
    (one shuffle with map-side combine); 10k merge rounds later the
    loop is still iterating over the same few-million-row vocabulary."""
    merges, _ = _bpe_train_loop(spark, sf_dir)
    return merges.select(
        "round",
        F.col("x").alias("left_sym"),
        F.col("y").alias("right_sym"),
        F.col("n").alias("pair_n"),
    )


def _bpe_train_loop(
    spark: SparkSession, sf_dir: str, train_pred: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """The shared training loop: returns (merge table with columns
    round/x/y/n, final encoded vocabulary wstr/c). The final
    vocabulary IS the corpus encoded under the learned merges — the
    trainer's rewrite state doubles as the encoder's output, which is
    why q_bpe_encode costs nothing beyond the training it already
    shares (and why the two queries can never disagree on merge
    application order). ``train_pred`` restricts the training corpus
    (the unseen-encode family trains on a slice and applies to the
    held-out complement)."""
    d = table(spark, sf_dir, "documents")
    if train_pred:
        d = d.filter(F.expr(train_pred))
    v = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(
            (F.length("w") >= 2) & F.col("w").rlike(_BPE_WORD_RE)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.regexp_replace("w", "(.)", "<$1>").alias("wstr"), "c"
        )
        .localCheckpoint(eager=True)
    )
    merges = None
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            v.select(
                F.expr("regexp_extract_all(wstr, '<([^>]*)>', 1)").alias("l"),
                "c",
            )
            .filter(F.size("l") >= 2)
            .select(
                F.expr(
                    "explode(transform(sequence(1, size(l) - 1), i -> "
                    "struct(element_at(l, i) AS x, element_at(l, i + 1) AS y)))"
                ).alias("p"),
                "c",
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("c").cast("bigint").alias("n"))
        )
        best = (
            pairs.orderBy(F.desc("n"), "x", "y")
            .limit(1)
            .withColumn("round", F.lit(r))
            .localCheckpoint(eager=True)
        )
        merges = best if merges is None else merges.unionByName(best)
        v = (
            v.crossJoin(F.broadcast(best.select("x", "y")))
            .select(
                F.expr(
                    "replace(wstr, concat('<', x, '><', y, '>'), "
                    "concat('<', x, y, '>'))"
                ).alias("wstr"),
                "c",
            )
            .localCheckpoint(eager=True)
        )
    return merges, v


@register(
    "q_bpe_encode",
    oracle=_bpe_oracle(_BPE_ROUNDS, final="encode"),
    tags=("llm-prep", "text", "tokenizer", "iterative", "scale"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING under the trained merges: the learned token
    vocabulary applied back to the corpus — per final token, its total
    weighted occurrence count (positions x word multiplicity) and its
    vocabulary position count. This is the tokenize step of the
    pipeline (token-budget accounting, vocabulary coverage audits) and
    it reuses the training loop's final rewrite state outright: after
    round N the vocabulary table already holds every distinct word in
    fully-merged form, so encoding is one explode + one
    vocabulary-sized rollup — the corpus is never re-tokenized.
    Deterministic: integer counts, token text as the tiebreak-free
    group key; the oracle unrolls the same chain and explodes v{N}."""
    _, v = _bpe_train_loop(spark, sf_dir)
    return (
        v.select(
            F.explode(
                F.expr("regexp_extract_all(wstr, '<([^>]*)>', 1)")
            ).alias("token"),
            "c",
        )
        .groupBy("token")
        .agg(
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_vocab_positions"),
        )
    )


# BPE tokenizer-APPLY: train on 90% of the corpus, tokenize the
# held-out 10% the trainer never saw — the production step every data
# pipeline runs (the trainer runs once; the apply step runs on every
# new document forever).
_BPE_TRAIN_PRED = "doc_id % 10 <> 7"


def _bpe_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge table trained on the _BPE_TRAIN_PRED slice,
    materialized once per (sf_dir, fingerprint): the training loop is
    10 Spark jobs, and both the batch and streaming unseen-encode
    queries consume the identical artifact — at 100 TB this is the
    tokenizer file shipped to every apply job."""
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once, table_fingerprint,
    )

    def build() -> str:
        import tempfile

        out = tempfile.mkdtemp(prefix="bpe_trained_merges_")
        merges, _ = _bpe_train_loop(spark, sf_dir, train_pred=_BPE_TRAIN_PRED)
        merges.select("round", "x", "y").write.mode("overwrite").parquet(out)
        return out

    return spark.read.parquet(
        materialize_once(
            ("bpe_trained_merges", sf_dir, _BPE_ROUNDS, _BPE_TRAIN_PRED,
             table_fingerprint(sf_dir, "documents")),
            build,
        )
    )


def _bpe_merge_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained merge list as ONE row holding the round-ordered
    array<struct<round,x,y>> — broadcastable into any apply join, and
    foldable with a single ``aggregate()`` expression (the merge list
    is vocabulary-training-rounds long: tiny by construction)."""
    return _bpe_trained_merges(spark, sf_dir).agg(
        F.expr("array_sort(collect_list(struct(round, x, y)))").alias("marr")
    )


# the in-order merge fold: greedy-BPE-apply N merges to one encoded
# word with one expression — each replace()'s left-to-right
# non-overlapping scan is the greedy merge pass, and the array fold
# applies the merges in training order (array_sort on round)
_BPE_APPLY = (
    "aggregate(marr, {w}, (acc, m) -> "
    "replace(acc, concat('<', m.x, '><', m.y, '>'), "
    "concat('<', m.x, m.y, '>')))"
)


@register(
    "q_bpe_encode_unseen",
    oracle=_bpe_oracle(
        _BPE_ROUNDS, final="encode_unseen", train_pred=_BPE_TRAIN_PRED
    ),
    tags=("llm-prep", "text", "tokenizer", "scale"),
)
def q_bpe_encode_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE OF UNSEEN TEXT: the merge table trained on the 90%
    slice (doc_id % 10 <> 7) is applied to the held-out 10% the
    trainer NEVER saw — the tokenizer-apply step, not a training-state
    replay (q_bpe_encode's gap, round-12 verdict item 3). The held-out
    docs collapse to their own distinct-word rollup, the broadcast
    merge array folds over each encoded word IN TRAINING ORDER with a
    single aggregate() expression (N sequential anchored replaces —
    greedy BPE apply), and one vocabulary-sized rollup emits per-token
    occurrence/position stats.

    Scale: the merge list is tiny (rounds rows) and broadcasts; apply
    cost is O(new-docs vocabulary) expression work with NO iteration
    over jobs — unlike training, applying 10k merges is still one
    stage. Oracled against the training chain unrolled THEN the merge
    winners re-applied step-by-step to the unseen rollup."""
    marr = _bpe_merge_array(spark, sf_dir)
    held = (
        table(spark, sf_dir, "documents")
        .filter(F.expr(f"NOT ({_BPE_TRAIN_PRED})"))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike(_BPE_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.regexp_replace("w", "(.)", "<$1>").alias("wstr"), "c")
    )
    enc = held.crossJoin(F.broadcast(marr)).select(
        F.expr(_BPE_APPLY.format(w="wstr")).alias("wstr"), "c"
    )
    return (
        enc.select(
            F.explode(
                F.expr("regexp_extract_all(wstr, '<([^>]*)>', 1)")
            ).alias("token"),
            "c",
        )
        .groupBy("token")
        .agg(
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_vocab_positions"),
        )
    )


# ---------------------------------------------------------------------------
# Round 14: the FULL corpus-pipeline capstone (verdict #6) — every stage
# a production training-data run executes, composed into one oracled plan
# ---------------------------------------------------------------------------


def _pipeline_full_oracle_sql() -> str:
    """q_corpus_pipeline_full's truth: the eight pipeline stages as one
    DuckDB WITH chain. The SemDeDup pair set comes from the SHARED
    _sd_pairs_sql machinery over the full corpus (the persisted-
    artifact semantics — centroids/pairs are fitted once per corpus
    snapshot, then restricted to survivors), exactly as the Spark plan
    consumes sd_text_pairs_artifact. The MinHash stage restricts
    FIRST and computes all-pairs Jaccard over exact-dedup survivors
    only — valid because J(a, b) >= 0.4 is a pairwise property, so
    full-corpus pairs with both endpoints surviving ARE the
    survivor-only pair set (and q_dedup_minhash_pairs proves the LSH
    artifact equals the all-pairs truth at every shipped SF). The
    DSIR cost table trains on the FULL raw/target slices (the
    persisted _dsir_cost_table artifact), never on survivors."""
    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        _SD_TEXT_CORPUS_CTES, _sd_pairs_sql,
    )
    from docker_based_real_time_etl_project_spark.queries.sampling_q import (
        _DSIR_SHIFT, _SHARD_N,
    )

    head = _sd_pairs_sql(_SD_TEXT_CORPUS_CTES)
    tkt = _sql_ticket("doc_id")
    return head + f""",
    pq_q AS MATERIALIZED (
      SELECT doc_id, lang, source, text, {tkt} AS ticket,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS n_toks
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 10000
        AND length(replace(text, ' ', ''))
            / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 2 AND 12
        AND (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
            / CAST(length(text) AS DOUBLE) < 0.2
    ),
    pq_ex AS MATERIALIZED (
      SELECT doc_id, lang, source, text, ticket, n_toks FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM pq_q) WHERE rn = 1
    ),
    pq_sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
               i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
             )) AS grams
      FROM pq_ex
    ),
    pq_mh AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pq_sh a JOIN pq_sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams))
            / CAST(len(a.grams) + len(b.grams)
                   - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.4
    ),
    pq_e1 AS (
      SELECT id_a AS src, id_b AS dst FROM pq_mh
      UNION SELECT id_b, id_a FROM pq_mh
    ),
    pq_r1(src, dst) AS (
      SELECT src, dst FROM pq_e1
      UNION
      SELECT r.src, e.dst FROM pq_r1 r JOIN pq_e1 e ON r.dst = e.src
    ),
    pq_rep1 AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS rep FROM pq_r1 GROUP BY src
    ),
    pq_s2 AS MATERIALIZED (
      SELECT e.* FROM pq_ex e LEFT JOIN pq_rep1 r ON e.doc_id = r.id
      WHERE r.id IS NULL OR r.rep = e.doc_id
    ),
    pq_pe AS (
      SELECT p.id_a, p.id_b FROM p
      JOIN pq_s2 x ON p.id_a = x.doc_id
      JOIN pq_s2 y ON p.id_b = y.doc_id
    ),
    pq_e2 AS (
      SELECT id_a AS src, id_b AS dst FROM pq_pe
      UNION SELECT id_b, id_a FROM pq_pe
    ),
    pq_r2(src, dst) AS (
      SELECT src, dst FROM pq_e2
      UNION
      SELECT r.src, e.dst FROM pq_r2 r JOIN pq_e2 e ON r.dst = e.src
    ),
    pq_rep2 AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS rep FROM pq_r2 GROUP BY src
    ),
    pq_s3 AS MATERIALIZED (
      SELECT s.* FROM pq_s2 s LEFT JOIN pq_rep2 r ON s.doc_id = r.id
      WHERE r.id IS NULL OR r.rep = s.doc_id
    ),
    pq_evg AS MATERIALIZED (
      SELECT DISTINCT g FROM (
        SELECT unnest(list_distinct({_sql_shingles(5)})) AS g
        FROM documents WHERE {tkt} >= 9000)
    ),
    pq_tg AS (
      SELECT doc_id, unnest(list_distinct({_sql_shingles(5)})) AS g
      FROM pq_s3 WHERE ticket < 9000
    ),
    pq_ct AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN g IN (SELECT g FROM pq_evg) THEN 1 ELSE 0 END)
               AS n_shared
      FROM pq_tg GROUP BY doc_id
    ),
    pq_s4 AS MATERIALIZED (
      SELECT s.* FROM pq_s3 s LEFT JOIN pq_ct c ON s.doc_id = c.doc_id
      WHERE s.ticket < 9000
        AND (c.doc_id IS NULL OR 10 * c.n_shared < c.n_grams)
    ),
    pq_wsr AS MATERIALIZED (
      SELECT doc_id, {tkt} AS tkt,
             list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM documents
    ),
    pq_bi AS MATERIALIZED (
      SELECT doc_id, tkt, p2[1] AS a, p2[2] AS b FROM (
        SELECT doc_id, tkt,
               unnest(list_transform(
                 generate_series(1, greatest(len(w) - 1, 0)),
                 i -> [w[i], w[i + 1]]
               )) AS p2
        FROM pq_wsr)
    ),
    pq_unic AS (
      SELECT a, COUNT(*) AS c1 FROM (
        SELECT unnest(w) AS a FROM pq_wsr WHERE tkt < 9000) GROUP BY a
    ),
    pq_vocc AS (SELECT COUNT(*) AS v FROM pq_unic),
    pq_bic AS (
      SELECT a, b, COUNT(*) AS c2 FROM pq_bi WHERE tkt < 9000 GROUP BY a, b
    ),
    pq_unit AS (
      SELECT a, COUNT(*) AS c1 FROM (
        SELECT unnest(w) AS a FROM pq_wsr WHERE tkt >= 9000) GROUP BY a
    ),
    pq_voct AS (SELECT COUNT(*) AS v FROM pq_unit),
    pq_bit AS (
      SELECT a, b, COUNT(*) AS c2 FROM pq_bi WHERE tkt >= 9000 GROUP BY a, b
    ),
    pq_gram AS (SELECT DISTINCT a, b FROM pq_bi WHERE tkt < 9000),
    pq_cost AS MATERIALIZED (
      SELECT g.a, g.b,
             CAST(ROUND(-ln((COALESCE(bc.c2, 0) + 1.0)
                            / (COALESCE(uc.c1, 0) + (SELECT v FROM pq_vocc)))
                        * 1000000) AS BIGINT) AS cost_c,
             CAST(ROUND(-ln((COALESCE(bt.c2, 0) + 1.0)
                            / (COALESCE(ut.c1, 0) + (SELECT v FROM pq_voct)))
                        * 1000000) AS BIGINT) AS cost_t
      FROM pq_gram g
      LEFT JOIN pq_bic bc ON g.a = bc.a AND g.b = bc.b
      LEFT JOIN pq_unic uc ON g.a = uc.a
      LEFT JOIN pq_bit bt ON g.a = bt.a AND g.b = bt.b
      LEFT JOIN pq_unit ut ON g.a = ut.a
    ),
    pq_occ AS (
      SELECT b.doc_id, b.a, b.b, COUNT(*) AS n_occ
      FROM pq_bi b JOIN pq_s4 s ON b.doc_id = s.doc_id
      GROUP BY b.doc_id, b.a, b.b
    ),
    pq_sc AS (
      SELECT o.doc_id,
             CAST(SUM(o.n_occ) AS BIGINT) AS n_bigrams,
             CAST(SUM(o.n_occ * (c.cost_c - c.cost_t + {_DSIR_SHIFT}))
                  AS BIGINT) AS s
      FROM pq_occ o JOIN pq_cost c ON o.a = c.a AND o.b = c.b
      GROUP BY o.doc_id
    ),
    pq_acc AS (
      SELECT doc_id,
             CAST(ROUND(exp(LEAST(CAST(s // n_bigrams - {_DSIR_SHIFT}
                                       AS BIGINT), 0) / 1000000.0)
                        * 1000000) AS BIGINT) AS accept_micro
      FROM pq_sc
    ),
    pq_s5 AS MATERIALIZED (
      SELECT s.* FROM pq_s4 s JOIN pq_acc a ON s.doc_id = a.doc_id
      WHERE s.ticket * 100 < a.accept_micro
    ),
    pq_cs AS (
      SELECT source, COUNT(*) AS n,
             CAST(ROUND(SQRT(COUNT(*)) * 1e6) AS BIGINT) AS w
      FROM pq_s5 GROUP BY source
    ),
    pq_gs AS (
      SELECT source, n, w,
             SUM(w) OVER () AS tot_w, SUM(n) OVER () AS tot_n
      FROM pq_cs
    ),
    pq_s6 AS MATERIALIZED (
      SELECT s.doc_id, s.ticket, s.n_toks
      FROM pq_s5 s JOIN pq_gs g ON s.source = g.source
      WHERE CAST(s.ticket AS HUGEINT) * g.tot_w * g.n * 10
            < CAST(g.tot_n AS HUGEINT) * 4 * g.w * 10000
    ),
    pq_t8 AS (SELECT doc_id, ticket, n_toks FROM pq_s6 WHERE n_toks >= 1),
    pq_tot AS (SELECT SUM(n_toks) AS total FROM pq_t8),
    pq_c8 AS (
      SELECT doc_id, n_toks,
             SUM(n_toks) OVER (ORDER BY ticket, doc_id) AS cum
      FROM pq_t8
    )
    SELECT CAST(((c.cum - c.n_toks) * {_SHARD_N}) // t.total AS BIGINT)
             AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(c.n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(c.doc_id) AS BIGINT) AS doc_id_sum
    FROM pq_c8 c CROSS JOIN pq_tot t
    GROUP BY 1
    """


@register(
    "q_corpus_pipeline_full",
    oracle=_pipeline_full_oracle_sql(),
    tags=("text", "pipeline", "llm", "dedup", "sampling", "scale"),
)
def q_corpus_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE FULL TRAINING-DATA PIPELINE CAPSTONE — every stage a
    production corpus run executes, composed into one oracled plan:

      1. quality gate      (token count / word length / punctuation —
                            q_corpus_pipeline's predicates, fused into
                            the scan)
      2. exact dedup       (min doc_id per content hash — one window
                            on md5(text))
      3. MinHash near-dup  (pairs from the PERSISTED
                            minhash_pairs_artifact restricted to
                            survivors -> connected components -> keep
                            min id; restriction is exact because
                            J >= 0.4 is pairwise)
      4. SemDeDup          (pairs from the PERSISTED
                            sd_text_pairs_artifact — the fitted
                            centroids/bands are per-corpus-snapshot
                            artifacts, shared verbatim with
                            q_dedup_semantic_text — restricted to
                            survivors -> components -> keep min id)
      5. contamination     (drop train candidates sharing >= 10% of
                            their distinct 5-grams with the held-out
                            eval slice; eval docs leave the pipeline
                            here — they are the screen, not the
                            product)
      6. DSIR selection    (the PERSISTED _dsir_cost_table — trained
                            on the full raw/target slices, never on
                            survivors — scores each survivor's
                            bigrams; integer hash-ticket keep)
      7. temperature mix   (alpha=0.5 per-source rates derived from
                            the surviving pool, integer
                            cross-multiplication keep)
      8. token-balanced shard (the q_corpus_shard two-phase
                            distributed prefix scan, 8 shards)

    Emits the per-shard manifest (docs, token mass, id checksum): any
    upstream deviation in ANY stage moves the hash.

    Shuffle budget (stated, pinned by test_plans): one scan of
    documents feeds stages 1-2 (filters in the scan, 1 exchange for
    the content-hash window); each dedup stage adds id-restriction
    joins on the bounded pair artifacts + a components fixpoint over
    pair-touched nodes only; contamination is one gram-hash join
    (8-byte keys); DSIR is one (doc, bigram) rollup + a cost-table
    join; temperature is a broadcast of the ~3-row rate table; the
    shard id rides the range-partitioned prefix scan — NO stage is
    corpus x corpus, no global single-task window, no collect beyond
    O(partitions)/O(sources) scalars.

    Reference parity: the reference's ETL chains row transforms into
    one flow (etl.py); this is the same composition discipline applied
    to the LLM-prep surface at 100 TB scale."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        connected_components,
    )
    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        minhash_pairs_artifact,
    )
    from docker_based_real_time_etl_project_spark.queries.embeddings_q import (
        sd_text_pairs_artifact,
    )
    from docker_based_real_time_etl_project_spark.queries.sampling_q import (
        _DSIR_SHIFT, _SHARD_N, _dsir_cost_table,
    )

    d = table(spark, sf_dir, "documents")

    # 1. quality gate (q_corpus_pipeline's exact predicates)
    n_tokens = F.size(F.split("text", " "))
    awl = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ) / n_tokens.cast("double")
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[^a-z0-9 ]", ""))
    ) / F.length("text").cast("double")
    q = d.select(
        "doc_id", "lang", "source", "text",
        hash_ticket(F.col("doc_id")).alias("ticket"),
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint").alias("n_toks"),
    ).filter(n_tokens.between(20, 10000) & awl.between(2, 12) & (punct < 0.2))

    # 2. exact dedup: min doc_id per content hash
    w = Window.partitionBy(
        F.md5(F.col("text").cast("binary"))
    ).orderBy("doc_id")
    s1 = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=True)
    )

    def _keep_cc_survivors(surv: DataFrame, pairs: DataFrame) -> DataFrame:
        """Restrict the full-corpus pair artifact to current survivors,
        run components, keep each component's min id (isolated nodes
        keep themselves). The keeper-ID set is checkpointed: it is the
        one narrow output every downstream stage re-reads (the next
        dedup stage touches survivors 4x — edge restriction twice,
        component nodes, final semi-join), and without the checkpoint
        each of those re-ran this stage's whole component fixpoint
        lineage (round 14)."""
        e = (
            pairs.select("id_a", "id_b")
            .join(surv.select(F.col("doc_id").alias("id_a")), "id_a", "left_semi")
            .join(surv.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
        )
        comp = connected_components(
            surv.select(F.col("doc_id").alias("id")), e,
            a_col="id_a", b_col="id_b",
        )
        keep = (
            comp.filter(F.col("id") == F.col("rep"))
            .select(F.col("id").alias("doc_id"))
            .localCheckpoint(eager=True)
        )
        return surv.join(keep, "doc_id", "left_semi")

    # 3. MinHash near-dup survivorship (persisted pair artifact)
    s2 = _keep_cc_survivors(s1, minhash_pairs_artifact(spark, sf_dir))
    # 4. SemDeDup survivorship (persisted fitted-pair artifact)
    s3 = _keep_cc_survivors(s2, sd_text_pairs_artifact(spark, sf_dir))

    # 5. contamination screen: train candidates vs the eval slice's
    # distinct 5-grams (8-byte gram hashes in both shuffles). The eval
    # gram set comes from the SHARED per-session artifact (one explode
    # serves this stage, q_contamination, and the bloom variant —
    # round-14 verdict #4), distincted here because the screen needs
    # the gram set, not per-doc rows.
    evg = eval_gram_hashes(spark, sf_dir).select("gh").distinct()
    tr = s3.filter(F.col("ticket") < 9000)
    tg = tr.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 5))).alias("g")
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    ct = (
        tg.join(evg.withColumn("_hit", F.lit(1)), "gh", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("_hit").alias("n_shared"))
    )
    bad = ct.filter(10 * F.col("n_shared") >= F.col("n_grams")).select("doc_id")
    s4 = tr.join(bad, "doc_id", "left_anti").localCheckpoint(eager=True)

    # 6. DSIR selection from the persisted LM cost table
    ws = s4.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("w")
    )
    bi = ws.select(
        "doc_id",
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
    ).select("doc_id", "p.a", "p.b")
    occ = bi.groupBy("doc_id", "a", "b").agg(F.count(F.lit(1)).alias("n_occ"))
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
        "doc_id",
        F.round(
            F.exp(
                F.least(
                    (F.expr("s div n_bigrams") - _DSIR_SHIFT).cast("bigint"),
                    F.lit(0),
                ) / 1e6
            ) * 1e6
        ).cast("bigint").alias("accept_micro"),
    )
    s5 = (
        s4.join(acc, "doc_id")
        .filter(F.col("ticket") * 100 < F.col("accept_micro"))
        .select("doc_id", "source", "ticket", "n_toks")
    )

    # 7. temperature mix (alpha = 0.5) over the surviving pool
    DEC0 = "decimal(38,0)"
    cs = s5.groupBy("source").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "w", F.round(F.sqrt("n") * 1e6).cast("long")
    )
    g_win = Window.partitionBy()
    gs = cs.withColumn("tot_w", F.sum("w").over(g_win)).withColumn(
        "tot_n", F.sum("n").over(g_win)
    )
    s6 = (
        s5.join(F.broadcast(gs), "source")
        .filter(
            F.col("ticket").cast(DEC0) * F.col("tot_w") * F.col("n") * 10
            < F.col("tot_n").cast(DEC0) * 4 * F.col("w") * 10000
        )
        .select("doc_id", "ticket", "n_toks")
    )

    # 8. token-balanced shard manifest (two-phase distributed scan).
    # The shard total falls out of the scan's driver offset pass — the
    # old 1-row crossJoin aggregate re-ran the whole stage-5/6/7
    # lineage a second time just to size the shards (round 14).
    t8 = s6.filter(F.col("n_toks") >= 1)
    c8, total = ordered_prefix_sum(
        t8, ["ticket", "doc_id"], "n_toks", out_col="cum", return_total=True
    )
    return (
        c8.select(
            "doc_id", "n_toks",
            F.expr(f"((cum - n_toks) * {_SHARD_N}) div {max(total, 1)}")
            .cast("bigint").alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("doc_id_sum"),
        )
    )


@register(
    "q_dedup_span_remove",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_shingles(5)} AS gl, {_SQL_TOKS} AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id,
             unnest(range(1, len(gl) + 1)) AS pos,
             unnest(gl) AS gram
      FROM g WHERE len(gl) > 0
    ),
    flagged AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                 PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM pos) WHERE rn > 1
    ),
    rem AS (
      SELECT DISTINCT doc_id, pos + t.d AS tpos
      FROM flagged, unnest(generate_series(0, 4)) AS t(d)
    ),
    tk AS (
      SELECT doc_id, unnest(range(1, len(w) + 1)) AS tpos, unnest(w) AS tok
      FROM g WHERE len(w) > 0
    ),
    keepw AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM tk t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.tpos = r.tpos
      WHERE r.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(array_agg(tok ORDER BY tpos), ' ') AS new_text
      FROM keepw GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks FROM g
    )
    SELECT b.doc_id, b.n_toks,
           CAST(b.n_toks - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(a.new_text, '') AS new_text
    FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id
    """,
    tags=("llm", "dedup", "text", "scale"),
)
def q_dedup_span_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTSUBSTR REMOVAL — the Lee et al. 2022 step
    q_dedup_span_corpus only reported: emit the corpus with duplicated
    spans EXCISED, keep-first-occurrence. For every corpus-duplicated
    word 5-gram, the occurrence with the smallest (doc_id, position)
    survives; every other occurrence's 5-token window is cut, cuts
    union per document (overlapping spans merge naturally at the
    token level), and the remaining tokens reassemble in order into
    the deduplicated text. Emits (doc_id, n_toks, n_removed,
    new_text) — the actual deliverable a training-data run writes
    back to the lake.

    Plan shape, postings end to end (never doc x doc, no suffix
    array): one gram explode -> a per-gram ROW_NUMBER window on
    xxhash64(gram) (8-byte keys; rank 1 = the kept occurrence), each
    other occurrence explodes into its 5 covered token positions
    (distinct per doc), one token explode anti-joins that removal
    set on (doc_id, tpos), and reassembly is the array_sort/
    collect_list idiom under the same doc_id partitioning.
    Determinism: token positions are unique per doc, so the sort and
    the join are total; text reassembly is exact, which is why the
    full new_text column can sit in the hash gate. The oracle
    restates the identical algebra over raw grams in DuckDB."""
    from docker_based_real_time_etl_project_spark.operators.dedup import (
        spread_compact,
    )

    return _span_remove(spread_compact(table(spark, sf_dir, "documents"), "doc_id"))


def _span_remove(docs: DataFrame) -> DataFrame:
    """The ExactSubstr-removal core over any (doc_id, text) frame —
    factored out so the literal-corpus unit test pins the keep-first
    excision semantics on a hand-checkable fixture."""
    from docker_based_real_time_etl_project_spark.operators.dedup import tokens

    d = docs.select(
        "doc_id",
        tokens("text").alias("w"),
        shingles("text", 5).alias("grams"),
    ).localCheckpoint(eager=True)
    pos = (
        d.filter(F.size("grams") > 0)
        .select("doc_id", F.posexplode("grams").alias("pos0", "g"))
        .select(
            "doc_id", (F.col("pos0") + 1).alias("pos"), F.xxhash64("g").alias("gh")
        )
    )
    wg = Window.partitionBy("gh").orderBy("doc_id", "pos")
    flagged = (
        pos.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos")
    )
    rem = flagged.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + 4)).alias("tpos"),
    ).distinct()
    tk = (
        d.filter(F.size("w") > 0)
        .select("doc_id", F.posexplode("w").alias("tpos0", "tok"))
        .select("doc_id", (F.col("tpos0") + 1).alias("tpos"), "tok")
    )
    keep = tk.join(rem, ["doc_id", "tpos"], "left_anti")
    agg = keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(tpos, tok))), x -> x.tok), ' ')"
        ).alias("new_text"),
    )
    base = d.select("doc_id", F.size("w").cast("bigint").alias("n_toks"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        (F.col("n_toks") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint").alias("n_removed"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )
