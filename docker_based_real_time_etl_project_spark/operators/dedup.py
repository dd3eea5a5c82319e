"""Deduplication operators (north-star: training-data pipeline dedup).

Exact dedup is a hash groupBy. Near-dup is sketch + LSH banding so the
candidate set is bucket-joined, never an O(n^2) cross join:

    shingle -> minhash signature -> band hashes -> self-join on
    (band_idx, band_hash) -> exact-Jaccard verify on candidates.

Everything is built-in expression work (higher-order functions on
arrays, xxhash64) -- no Python UDFs, so signatures compute inside
codegen and scale linearly; the only shuffle is the band-bucket join,
whose fan-in is controlled by (n_hashes, bands).

Cross-engine note: xxhash64/murmur are Spark-specific, so sketch
outputs are verified by rows-only checks and pytest invariants
(identical docs -> identical signature; jaccard monotonicity), not by
the DuckDB hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 as universal-hash modulus: hash values stay under
# 2^31 so a*h+b stays far inside long range under ANSI overflow checking
_PRIME = (1 << 31) - 1


def tokens(text_col: str | Column, sep: str = " ") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, sep), lambda w: w != "")


def spread_compact(df: DataFrame, key: str, max_bytes: int = 4 << 30) -> DataFrame:
    """Parallelism guard for CPU-heavy derivations (gram explode +
    hash) off a COMPACT source: parquet only splits at row-group
    boundaries, so a corpus packed into a handful of row groups runs
    its whole explode on a handful of cores no matter how many tasks
    the scan nominally has (measured: sf10 documents = one 70 MB file,
    5 row groups -> the 25M-gram explode ran ~5-wide, 202 s; spread,
    ~30 s). When the input is small enough that reshuffling it is
    cheap (< ``max_bytes`` total) and too few files exist to split on,
    hash-repartition by ``key`` to the session's parallelism BEFORE
    the expensive derivation. At 100 TB the corpus is thousands of
    files / row groups, the condition is false, and this is a no-op —
    never a blanket shuffle of big text."""
    spark = df.sparkSession
    try:
        from urllib.parse import unquote as _unq, urlparse as _up
        import os as _os

        files = df.inputFiles()
        total = sum(_os.path.getsize(_unq(_up(f).path)) for f in files)
    except Exception:
        return df
    cores = spark.sparkContext.defaultParallelism
    if files and len(files) < cores and total < max_bytes:
        return df.repartition(cores, key)
    return df


def shingles(text_col: str | Column, k: int = 3, sep: str = " ") -> Column:
    """k-token shingles as strings: sliding window over the token array
    via sequence + transform (pure expressions, no UDF)."""
    toks = tokens(text_col, sep)
    n = F.size(toks)
    # guard n < k explicitly: sequence(1, 0) is DESCENDING [1, 0] in
    # Spark, which would feed slice() a zero start and blow up
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def token_chunks(text_col: str | Column, size: int = 10, sep: str = " ") -> Column:
    """Non-overlapping ``size``-token chunks (last chunk may be short):
    the grid for exact-substring dedup at chunk granularity — the
    bounded-memory stand-in for suffix-array ExactSubstr (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better")."""
    toks = tokens(text_col, sep)
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(size)).cast("int")
    # same descending-sequence guard as shingles: n == 0 must yield []
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i * size + 1, size))
    )


def minhash_signature(shingle_col: Column, n_hashes: int = 64) -> Column:
    """MinHash signature: for seed i, min over shingles of the universal
    hash (a_i * h + b_i) mod P31 with h = xxhash64 folded into [0, P31).
    Empty shingle sets get sentinel P31 so they never collide with
    content.

    The base hash h is computed ONCE per shingle (inner transform), then
    the n_hashes permutations run over the pre-hashed longs -- n_hashes
    xxhash64 evaluations per shingle would otherwise dominate the linear
    pass (measured ~10x on the documents table)."""
    seeds = F.array(*[F.lit(i).cast("long") for i in range(n_hashes)])
    hashed = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME)))

    def one_hash(seed: Column) -> Column:
        a = seed * 2 + 1  # odd multiplier < 2^8
        b = F.pmod(seed * 0x9E3779B9, F.lit(_PRIME))
        return F.array_min(
            # a*h+b < 2^8 * 2^31 + 2^31 << 2^63: ANSI-safe
            F.transform(hashed, lambda h: F.pmod(a * h + b, F.lit(_PRIME)))
        )

    return F.transform(seeds, lambda seed: F.coalesce(one_hash(seed), F.lit(_PRIME).cast("long")))


def minhash_signatures_agg(
    df: DataFrame, id_col: str, shingle_col: str, n_hashes: int = 64
) -> DataFrame:
    """MinHash signatures via explode + 64 min-aggregates (the scalable
    formulation): one xxhash64 per shingle, then per-seed permutations as
    plain long arithmetic under partial (map-side) aggregation, so the
    shuffle carries only n_hashes longs per doc.

    This exists because the pure-expression :func:`minhash_signature`
    gets its shared shingle-hash subexpression re-inlined into every
    seed's lambda by CollapseProject (no CSE across higher-order
    lambdas), costing n_hashes x the hashing work -- measured 60x slower
    on the documents table. Empty docs survive via explode_outer ->
    all-null min -> sentinel.
    """
    ex = df.select(id_col, F.explode_outer(shingle_col).alias("_s")).select(
        id_col, F.pmod(F.xxhash64("_s"), F.lit(_PRIME)).alias("_h")
    )
    aggs = [
        F.min(
            F.pmod((2 * i + 1) * F.col("_h") + (i * 0x9E3779B9) % _PRIME, F.lit(_PRIME))
        ).alias(f"_m{i}")
        for i in range(n_hashes)
    ]
    sigs = ex.groupBy(id_col).agg(*aggs)
    sig = F.array(
        *[F.coalesce(F.col(f"_m{i}"), F.lit(_PRIME).cast("long")) for i in range(n_hashes)]
    )
    return sigs.select(id_col, sig.alias("sig"))


def band_hashes(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Split the signature into `bands` slices of `rows_per_band` and hash
    each slice -> array of (band_idx, band_hash) structs for the LSH
    bucket join."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig_col, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")))
            ).alias("band_hash"),
        ),
    )


def exact_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string-array columns (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# Posting lists are Zipf-distributed on a real corpus: a stop-gram shared
# by k documents makes k^2 candidate pairs in any inverted-index self-join.
# Grams whose document frequency exceeds this cap are dropped from the
# postings BEFORE the join (standard practice in ExactSubstr / suffix-array
# dedup pipelines). See SCALE.md "Hot-gram cap" for the exactness argument.
DEFAULT_MAX_GRAM_DF = 1000


def gram_postings_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    block_col: str | None = "source",
    grams_col: str = "grams",
    max_df: int | None = DEFAULT_MAX_GRAM_DF,
    size_ratio: float | None = None,
) -> DataFrame:
    """Exact near-dup candidate pairs by inverted-index postings join:
    ``(id_a, id_b, n_a, n_b, shared)`` for every pair of documents (in
    the same ``block_col`` block, ``id_a < id_b``) sharing at least one
    gram, where ``shared`` is the exact count of shared distinct grams
    (``grams_col`` must hold DISTINCT grams per doc). Any overlap
    measure — Jaccard ``shared/(n_a+n_b-shared)``, containment
    ``shared/n_a`` — is plain arithmetic on the result.

    The scale contract, in order of importance:

    1. Work is bounded by real gram co-occurrence (sum of df^2 over
       grams), never the per-block O(n^2) all-pairs space.
    2. The join key is ``xxhash64(gram)`` — 8 bytes — so the shuffle
       never carries gram text. Two distinct grams colliding at 64 bits
       would inflate ``shared`` for one pair by 1; at corpus scale the
       expected number of colliding gram pairs is ~(distinct grams)^2 /
       2^64 — negligible, and irrelevant to the final thresholded
       output unless a pair sits exactly at the threshold.
    3. ``max_df`` drops grams hotter than the cap from the postings (a
       window count over the SAME (block, gram-hash) partitioning the
       self-join shuffles on, so the guard rides the join's exchange —
       exchange-reused, not an extra shuffle). A stop-gram in k docs
       would otherwise emit k^2 pairs. With the cap, ``shared``
       undercounts by the number of shared HOT grams, so computed
       overlap is a lower bound; a qualifying pair is missed only if
       ALL its shared grams are hot — on real corpora near-dup pairs
       share many rare grams (their content), which is the standard
       exactness argument for df-capping. ``max_df=None`` disables.
       Callers registered against EXACT all-pairs oracles rely on the
       shipped corpora staying far below the cap — pinned with 10x
       headroom per SF by tests/test_testdata_contract.py::
       test_gram_df_below_postings_cap, so a hotter future corpus
       fails loudly there instead of silently undercounting.
    4. ``size_ratio`` (optional, e.g. the Jaccard threshold t): prunes
       pairs where min(n)/max(n) < t before the aggregate — Jaccard
       can never reach t across that size gap, so the filter is
       semantics-free for a >= t cut.
    """
    from pyspark.sql import Window

    block = [block_col] if block_col else []
    posts = sh.select(
        F.col(id_col).alias("_pid"),
        *block,
        F.size(grams_col).alias("_n"),
        F.explode(grams_col).alias("_g"),
    ).select("_pid", *block, "_n", F.xxhash64("_g").alias("_gh"))
    if max_df is not None:
        w = Window.partitionBy(*block, "_gh")
        posts = posts.withColumn("_df", F.count(F.lit(1)).over(w)).filter(
            F.col("_df") <= max_df
        ).drop("_df")
    pa = posts.select(
        *[F.col(c).alias(f"{c}_a") for c in block],
        F.col("_gh").alias("_gh_a"),
        F.col("_pid").alias("id_a"),
        F.col("_n").alias("n_a"),
    )
    pb = posts.select(
        *[F.col(c).alias(f"{c}_b") for c in block],
        F.col("_gh").alias("_gh_b"),
        F.col("_pid").alias("id_b"),
        F.col("_n").alias("n_b"),
    )
    cond = (pa["_gh_a"] == pb["_gh_b"]) & (pa["id_a"] < pb["id_b"])
    for c in block:
        cond = (pa[f"{c}_a"] == pb[f"{c}_b"]) & cond
    joined = pa.join(pb, cond)
    if size_ratio is not None:
        na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
        joined = joined.filter(F.least(na, nb) >= size_ratio * F.greatest(na, nb))
    return joined.groupBy("id_a", "id_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).alias("shared")
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    rows_per_band: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH.

    ``rows_per_band`` defaults to ``n_hashes // bands`` (all hashes
    used); passing fewer (e.g. 3 with 16 bands = 48 of 64 hashes)
    shifts the banding S-curve left — candidate recall RISES (per-pair
    detection at J: 1-(1-J^r)^b), spurious candidates rise modestly,
    and since every candidate is exact-Jaccard-verified the output is
    unchanged except for previously-MISSED true pairs. At the shipped
    corpora's minimum qualifying J of 0.8, r=4 leaves a 2.3e-4 per-pair
    miss (a ~6% chance of one red pair per fresh 256-pair corpus);
    r=3 cuts it to ~1.1e-5.

    Plan shape (the part that matters at 100 TB):
      1. one linear pass computes shingles + signature + band hashes;
      2. explode to (band_idx, band_hash, id, shingles) -- rows = docs*bands;
      3. self-join on the band bucket (shuffle on band hash -- uniform by
         construction, no skew);
      4. distinct candidate pairs, then exact-Jaccard verify (array
         intersect on the two shingle sets).
    Never materializes the n^2 pair space; candidates ~ docs * avg
    bucket size.

    Measured dead end (do not retry): folding the gram set into the
    signature aggregate (collect_set alongside the 64 mins) to spare
    the verify sides their re-shingling makes the WHOLE aggregate an
    ObjectHashAggregate — no whole-stage codegen for the 64-min hot
    path, every consumer pays it — and AQE does not reuse the wider
    exchange across the three consumers at bench scale: net +25%
    wall over the re-derivation this keeps (2.44s vs 1.95s at sf0.1).
    """
    if rows_per_band is None:
        rows_per_band = n_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"), F.array_distinct(shingles(text_col, k)).alias("_sh")
    )
    sigs = minhash_signatures_agg(sh, "_id", "_sh", n_hashes)
    buckets = sigs.select(
        "_id",
        F.explode(band_hashes(F.col("sig"), bands, rows_per_band)).alias("_b"),
    ).select(
        "_id", F.col("_b.band_idx").alias("_bi"), F.col("_b.band_hash").alias("_bh")
    )
    # candidate id pairs only -- dedup BEFORE shingle sets are re-attached,
    # so the band join shuffles narrow rows, never document content
    left = buckets.select("_bi", "_bh", F.col("_id").alias("id_a"))
    right = buckets.select(
        F.col("_bi").alias("_bi2"), F.col("_bh").alias("_bh2"), F.col("_id").alias("id_b")
    )
    pairs = (
        left.join(
            right,
            (left._bi == right._bi2) & (left._bh == right._bh2) & (left.id_a < right.id_b),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text_col: str | Column, sep: str = " ") -> Column:
    """63-bit SimHash over tokens: per bit, majority vote of token-hash
    bits (getbit takes a column position, unlike shiftright). The MSB-
    first fold acc*2+bit tops out at 2^63-1, staying ANSI-overflow-safe;
    bit 63 (sign) is intentionally unused."""
    toks = tokens(text_col, sep)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    bit_votes = F.transform(
        F.sequence(F.lit(62), F.lit(0), F.lit(-1)),  # msb first
        lambda i: F.when(
            F.size(F.filter(hashes, lambda h: F.getbit(h, i) == 1)) * 2 >= n,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        bit_votes,
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def exact_dedup(df: DataFrame, key_cols: list[str], order_cols: list[Column]) -> DataFrame:
    """Exact dedup keeping one deterministic representative per key
    (hash groupBy semantics; the T9 append-stream repair, SURVEY 2.4)."""
    from docker_based_real_time_etl_project_spark.operators.aggregates import latest_per_key

    return latest_per_key(df, key_cols, order_cols)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup pairs -> clusters by MIN-LABEL CONTRACTION: each round
    builds ONE supernode-level map m2 = m1∘m1, where m1 hooks every
    supernode to the min of itself and its smallest contracted
    neighbor and the composition compresses one pointer level, then
    applies that SAME map to both the node labels and the contracted
    edge set (relabel, drop self-loops, dedupe). Every node's label
    converges to the smallest id reachable from it — the identical
    fixpoint as plain min-label propagation (labels are monotone
    non-increasing, never leave the component, and termination means
    rep(a) == rep(b) across every original edge, i.e. labels are
    constant per component; the component's min node m always keeps
    rep(m) <= m, so that constant IS the minimum) — but in O(log d)
    rounds instead of O(d), and over an edge set that SHRINKS
    geometrically instead of being re-joined in full every round.
    Measured on the round-14 SemDeDup band-adjacency graph at sf0.1:
    14 propagation rounds over 5262 edges each became 4 contraction
    rounds over 5262 -> 720 -> 52 -> 2 edges; a 100k-node adversarial
    path converges in 12 rounds (verified against union-find). At
    100 TB the shrink matters as much as the round count: a near-dup
    chain through a hot shingle or an LSH band is exactly where
    diameter blows up, and per-round cost decays with the contraction
    instead of staying O(|E|).

    Iterative DataFrame algorithm done right for scale: per-round
    localCheckpoints truncate the exploding join lineage (else the
    plan doubles every round), and convergence detection is the
    contracted edge set running empty — a LIMIT-1 probe of the freshly
    checkpointed edges, not a labels-vs-labels diff job. The driver
    only steers; all data movement is joins/aggregates on the cluster.

    ADVERSARIAL ID LAYOUTS (round 15): one composition per round is
    Θ(d/2) rounds on a chain whose ids increase monotonically along
    it (each round's map is "shift by 2" — real for sequential crawl
    doc_ids), so with a fixed max_iter a long sorted chain could
    exit UNCONVERGED. Two fixes: (a) from round 2 on, the edge probe
    is a count, and when a round shrinks the edge set by less than a
    third the squaring depth per round DOUBLES (m <- m∘m applied
    ``depth`` times — shift 2^depth per round, so a stalled chain
    dies in O(log d) further rounds; deeper squarings are
    checkpointed every few levels to keep the plan bounded); normal
    geometric-shrink graphs never trigger it and pay exactly the
    round-14 cost. (b) if the loop still exhausts max_iter with
    edges remaining, raise instead of returning labels that silently
    split one component into many reps.
    """
    bidir = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    )
    # the edge list seeds the contraction chain -- checkpoint it once so
    # an expensive upstream pair-generation pipeline (LSH, all-pairs
    # verify) is not re-evaluated
    bidir = bidir.localCheckpoint(eager=True)
    # Iterate ONLY over nodes that touch an edge: an isolated node is its
    # own component by definition and never changes, so dragging the full
    # node set through every join/agg round multiplies each iteration by
    # |V|/|V_touched| for nothing. In a dedup graph the touched set is
    # the near-duplicate minority -- orders of magnitude smaller than the
    # corpus -- and that ratio IMPROVES at 100 TB. Isolated nodes rejoin
    # once, at the end, via a broadcastable left join.
    labels = bidir.select(F.col("src").alias("id")).distinct().withColumn(
        "rep", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    cedges = bidir  # round 1's contraction under identity labels is bidir itself
    depth = 1      # map squarings per round; doubles on stall (see docstring)
    prev_n = None
    converged = False
    # geometric-shrink graphs converge in <= ~5 rounds; until then the
    # probe stays the LIMIT-1 it always was (zero overhead on the hot
    # path, and round 0's bidir can be corpus-scale). A graph still
    # iterating past that is stalling — switch the probe to a count of
    # the (checkpointed, contracted) edges and start doubling depth
    _STALL_DETECT_FROM = 6
    for rnd in range(max_iter):
        if rnd < _STALL_DETECT_FROM:
            if cedges.filter(F.lit(True)).limit(1).isEmpty():
                converged = True
                break
        else:
            n_edges = cedges.count()
            if n_edges == 0:
                converged = True
                break
            if prev_n is None or 3 * n_edges > 2 * prev_n:
                # shrank < 1/3 (or just entered stall mode after 6
                # undistinguished rounds): the id-sorted-chain regime
                depth = min(depth * 2, 24)
            prev_n = n_edges
        # One SUPERNODE-level map per round, m2 = m1∘m1 where
        # m1(s) = min(s, smallest contracted neighbor of s): the same
        # map relabels BOTH the node labels and the contracted edges,
        # which is what keeps them consistent — a node's own label and
        # its label's role as a supernode id are different things, and
        # relabeling edges through the NODE map is subtly wrong (caught
        # by the deep-chain unit test). Supernodes absent from m1 have
        # no contracted edge this round and map to themselves
        # (left join + coalesce). m2 stays LAZY: its inputs are this
        # round's checkpointed cedges, so every consumer recomputes one
        # tiny hash agg + self-join over materialized data instead of
        # paying a dedicated per-round checkpoint job — the round-trip
        # count, not the duplicated agg, is what dominates an iterative
        # driver loop (measured: checkpointing m2 per round cost more
        # than it saved at every scale tried).
        m1 = (
            cedges.groupBy("src")
            .agg(F.min("dst").alias("_nb"))
            .select("src", F.least("src", "_nb").alias("_t"))
        )
        m2 = m1
        for j in range(depth):
            mb = m2.select(F.col("src").alias("_s2"), F.col("_t").alias("_t2"))
            m2 = (
                m2.join(mb, m2["_t"] == F.col("_s2"), "left")
                .select("src", F.coalesce("_t2", "_t").alias("_t"))
            )
            # depth 1 (the geometric-shrink common case) stays lazy as
            # before; deeper squarings double the lazy plan per level,
            # so checkpoint every second one to keep it bounded
            if depth > 1 and j % 2 == 1:
                m2 = m2.localCheckpoint(eager=True)
        # The node labels COMPOSE lazily: one small left join per round
        # chained onto the (checkpointed) m2 maps, materialized exactly
        # once after convergence. O(log d) joins of shrinking maps is a
        # flat, bounded plan — no per-round label materialization job.
        labels = labels.join(
            m2.select(F.col("src").alias(f"_ms{rnd}"), F.col("_t").alias(f"_mt{rnd}")),
            labels.rep == F.col(f"_ms{rnd}"),
            "left",
        ).select("id", F.coalesce(f"_mt{rnd}", "rep").alias("rep"))
        # contract: rewrite the edge set through the same supernode
        # map, drop intra-supernode loops and duplicate multi-edges —
        # the next round's join input shrinks geometrically toward
        # empty (= convergence: labels constant across every edge)
        ma = m2.select(F.col("src").alias("_sa"), F.col("_t").alias("_ta"))
        mb = m2.select(F.col("src").alias("_sb"), F.col("_t").alias("_tb"))
        cedges = (
            cedges.join(ma, cedges.src == F.col("_sa"), "left")
            .join(mb, cedges.dst == F.col("_sb"), "left")
            .select(
                F.coalesce("_ta", "src").alias("src"),
                F.coalesce("_tb", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    if not converged and not cedges.filter(F.lit(True)).limit(1).isEmpty():
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(contracted edges remain) — returning would silently split "
            "components; raise max_iter or inspect the edge graph"
        )
    # isolated nodes (touched no edge) are their own representatives.
    # labels is usually the far smaller side; AQE picks broadcast when it
    # fits and falls back to shuffle when the dup-graph is genuinely huge
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .withColumn("rep", F.coalesce("rep", F.col("id")))
    )


def minhash_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard from two MinHash signatures: the fraction of
    agreeing components (the estimator whose E[.] = true Jaccard).
    Used for cheap pre-filtering before the exact verify join at scale;
    its accuracy contract (stderr ~ 1/sqrt(n_hashes)) is pytest-gated."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v))
    return agree.cast("double") / F.size(sig_a)
