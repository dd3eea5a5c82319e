"""Similarity search over embedding columns (north-star: ANN for a
training-data pipeline).

Baseline: brute-force cosine top-k -- a broadcast of the query
vector(s) and one linear scan with an expression-level dot product
(zip_with + aggregate, all codegen'd; no Python per row).

Scale path: random-hyperplane LSH -- sign-bit bucket per vector
(computed once, cheap), candidates only within matching buckets (plus
optional multi-probe), exact re-rank on the candidate set. Turns the
100 TB scan-per-query into a partition-pruned bucket lookup.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Expression-level dot product of two array columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small) query
    side, score every corpus vector, TakeOrderedAndProject per query.

    Deterministic: cosine rounded to 6 dp before ranking, ties broken
    by corpus id -- stable across engines and partitionings."""
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(query_df)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign is used)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id for a vector: bit i = sign(dot(v, plane_i)).
    Pure expression: the planes are literal arrays folded into the plan."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.shiftleft(F.when(dot(vec_col, plane) >= 0, 1).otherwise(0).cast("long"), i))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by sign-LSH, exact
    cosine re-rank within the matched bucket only.

    At scale the corpus side is written partitioned/bucketed by the LSH
    bucket id, so a query touches one bucket's files -- recall is traded
    via n_planes (fewer planes = bigger buckets = higher recall/cost).
    """
    from pyspark.sql import Window

    corpus = df.select(id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("_bucket"))
    queries = query_df.select(
        query_id_col, query_vec_col, lsh_bucket(F.col(query_vec_col), planes).alias("_qbucket")
    )
    scored = corpus.join(
        F.broadcast(queries), corpus._bucket == queries._qbucket
    ).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )


def lsh_tables(
    dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic hyperplane sets for multi-table (OR-amplified) LSH."""
    return [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]


def lsh_candidates(
    df: DataFrame,
    query_df: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id) candidate pairs for multi-table sign-LSH: a
    candidate qualifies if it co-buckets with the query in ANY table
    (OR-amplification), deduped so re-rank scores each once. Exposed
    separately from the top-k so recall contracts can measure the
    CANDIDATE FRACTION — the quantity that distinguishes real ANN from
    recall-by-exhaustion (tests/test_ann_clustered.py)."""

    def bucket_arr(vcol: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"), lsh_bucket(vcol, planes).alias("b")
                )
                for t, planes in enumerate(tables)
            ]
        )

    corpus_b = df.select(
        F.col(id_col), F.explode(bucket_arr(F.col(vec_col))).alias("_tb")
    ).select(id_col, F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    query_b = query_df.select(
        F.col(query_id_col), F.explode(bucket_arr(F.col(query_vec_col))).alias("_tb")
    ).select(query_id_col, F.col("_tb.t").alias("_t2"), F.col("_tb.b").alias("_b2"))
    return (
        corpus_b.join(
            F.broadcast(query_b),
            (corpus_b._t == query_b._t2) & (corpus_b._b == query_b._b2),
        )
        .select(query_id_col, id_col)
        .distinct()
    )


def lsh_topk_multi(
    df: DataFrame,
    query_df: DataFrame,
    tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Multi-table sign-LSH ANN: candidates from lsh_candidates, then
    exact cosine re-rank. Single-table LSH on unstructured embeddings
    has catastrophic recall (one 8-plane table measured ~0.1 recall@10
    on the synthetic corpus); L tables of fewer planes trade candidate
    volume for recall the standard way: P(hit) = 1 - (1 - p^planes)^L.

    Plan shape for 100 TB: corpus explodes to docs x L (table, bucket)
    rows -- written out partitioned by (table, bucket) so a query reads
    L buckets' files; the candidate-id join carries ids only, vectors
    are re-attached afterward so wide embedding arrays never ride the
    bucket shuffle; dedup happens BEFORE re-rank so each candidate is
    scored once."""
    from pyspark.sql import Window

    cand = lsh_candidates(
        df, query_df, tables, id_col, vec_col, query_id_col, query_vec_col
    )
    scored = (
        cand.join(df.select(id_col, vec_col), id_col)
        .join(F.broadcast(query_df), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means cells + probe-N search
# ---------------------------------------------------------------------------

def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array columns (expression-level)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def nearest_centroids(vec_col: Column, centroids: list[list[float]], n: int = 1) -> Column:
    """Indexes of the n nearest centroids (ascending distance, index
    tiebreak): array of (dist, idx) structs -> array_sort (struct
    ordering is field-wise) -> slice -> idx projection. Pure expression,
    centroids folded into the plan as ONE literal array-of-arrays and
    scored by a single transform lambda — k centroids cost one l2_sq
    sub-tree in the plan, not k unrolled copies (a 16x16-code PQ encode
    otherwise carries 256 aggregate() trees and pays tens of seconds of
    analysis/codegen before the first row moves)."""
    cents = F.array(*[_lit_vec(c) for c in centroids])
    scored = F.transform(
        cents,
        lambda c, i: F.struct(l2_sq(vec_col, c).alias("d"), i.alias("i")),
    )
    return F.transform(F.slice(F.array_sort(scored), 1, n), lambda s: s["i"])


def ivf_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
    iters: int = 3,
) -> list[list[float]]:
    """Deterministic k-means-lite for the coarse quantizer: init = the
    n_centroids lowest-id vectors, then `iters` Lloyd rounds of
    assign (distributed) + mean (distributed agg). Only the centroid
    matrix (n_centroids x dim doubles) ever reaches the driver --
    index *training* is the one legitimately iterative, driver-steered
    step; assignment and search stay fully distributed."""
    init = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        cell = nearest_centroids(F.col(vec_col), centroids, 1)[0]
        means = (
            df.select(cell.alias("_cell"), F.col(vec_col).cast("array<double>").alias("v"))
            .groupBy("_cell")
            .agg(
                *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)],
            )
            .collect()
        )
        for r in means:
            centroids[r["_cell"]] = [r[f"m{i}"] for i in range(dim)]
    return centroids


def ivf_candidates(
    df: DataFrame,
    query_df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id) candidate pairs for IVF probe-N search: every
    corpus vector whose cell is among the query's n_probe nearest
    centroids. Companion to ivf_topk for candidate-fraction
    measurement in recall contracts."""
    corpus = df.select(
        id_col, nearest_centroids(F.col(vec_col), centroids, 1)[0].alias("_cell")
    )
    probes = query_df.select(
        query_id_col,
        F.explode(nearest_centroids(F.col(query_vec_col), centroids, n_probe)).alias(
            "_cell"
        ),
    )
    return corpus.join(F.broadcast(probes), "_cell").select(query_id_col, id_col)


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF search: corpus partitioned by nearest-centroid cell (at scale:
    written out partitioned by `_cell`, so a query scans n_probe cells'
    files, not the corpus); queries probe their n_probe nearest cells;
    exact cosine re-rank inside the probed cells."""
    from pyspark.sql import Window

    corpus = df.select(
        id_col, vec_col, nearest_centroids(F.col(vec_col), centroids, 1)[0].alias("_cell")
    )
    probes = query_df.select(
        query_id_col,
        query_vec_col,
        F.explode(nearest_centroids(F.col(query_vec_col), centroids, n_probe)).alias("_cell"),
    )
    scored = corpus.join(F.broadcast(probes), "_cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC): compressed-domain ANN
# ---------------------------------------------------------------------------
#
# At 100 TB of float32 embeddings, even IVF's probed-cell scan reads
# full vectors. PQ is the standard compression path (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
# split the dim-D vector into M subspaces, k-means each subspace to
# 2^b centroids, store each vector as M small codes (D=64 float32 =
# 256 bytes -> M=8 bytes: 32x). Search scores candidates in the
# COMPRESSED domain via per-query lookup tables (ADC: asymmetric
# distance computation), then exactly re-ranks a short candidate
# list from the original vectors.


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    sample: int = 2000,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks: m codebooks of n_codes
    sub-centroids each, trained on a bounded deterministic SAMPLE
    (the `sample` lowest xxhash64(id) tickets — corpus-size
    independent) with numpy Lloyd iterations on the driver. This is
    the standard PQ practice (FAISS trains codebooks on ~100k sampled
    vectors regardless of index size): codebook quality saturates at
    small sample sizes, the collect is O(sample x dim) — never
    O(corpus) — and a driver-side numpy loop iterates 10x faster than
    re-codegen'ing an m x n_codes literal-expression plan per Lloyd
    round. Encode and search stay fully distributed expressions."""
    import numpy as np

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .collect()
    )
    X = np.array([r.v for r in rows])
    dim = X.shape[1]
    sub = dim // m
    books = []
    for s in range(m):
        xs = X[:, s * sub : (s + 1) * sub]
        cents = xs[:n_codes].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): the 32x-compressed corpus
    representation. Pure expressions — at scale this is the one-time
    encode pass whose output is the stored index."""
    m = len(books)
    sub = len(books[0][0])
    codes = F.array(
        *[
            nearest_centroids(F.slice(F.col(vec_col), s * sub + 1, sub), books[s], 1)[0]
            for s in range(m)
        ]
    )
    return df.select(id_col, codes.alias("codes"))


def pq_topk(
    df: DataFrame,
    query_df: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """ADC search: score every code sequence against the query's
    per-subspace distance TABLE (array_sum of m element_at lookups —
    all codegen, zero Python, zero full-vector reads), take a
    `shortlist`-deep approximate top list per query, then exact cosine
    re-rank of only the shortlist. At scale the scan reads the m-byte
    codes column instead of the 4*D-byte vector column: the I/O is
    what shrinks 32x; the shortlist join re-reads original vectors for
    shortlist rows only."""
    from pyspark.sql import Window

    m = len(books)
    sub = len(books[0][0])

    # distance tables as plan literals: for each query row we need
    # d(q_sub_s, books[s][c]) — expressed as element_at over a literal
    # array per (s,), indexed by the corpus code. The query side is
    # tiny and broadcast, so compute the m x n_codes table as an
    # expression ON the query row (aggregate over the sub-slice).
    def table_for(s: int) -> Column:
        # one lambda over the literal codebook, not n_codes unrolled
        # l2_sq trees (see nearest_centroids): identical values, ~16x
        # smaller plan per subspace.
        cents = F.array(*[_lit_vec(c) for c in books[s]])
        return F.transform(
            cents,
            lambda c: l2_sq(F.slice(F.col(query_vec_col), s * sub + 1, sub), c),
        )

    q = query_df.select(
        query_id_col,
        query_vec_col,
        *[table_for(s).alias(f"_t{s}") for s in range(m)],
    )
    coded = pq_encode(df, books, id_col=id_col, vec_col=vec_col)
    adc = sum(
        F.element_at(F.col(f"_t{s}"), F.col("codes")[s] + 1) for s in range(m)
    )
    scored = coded.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, adc.alias("_adc")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_adc").asc(), F.col(id_col))
    short = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select(query_id_col, id_col)
    )
    rer = (
        short.join(df.select(id_col, vec_col), id_col)
        .join(F.broadcast(query_df), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        rer.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rnk")
    )
