"""ANN realism contracts on a CLUSTERED embedding corpus.

The driver's embeddings table is clusterless, so recall contracts on
it are reachable by widening candidates toward the whole corpus —
recall-by-exhaustion proves nothing (exhaustive search has recall
1.0). These contracts run on fixtures.clustered_embeddings (genuine
Gaussian mixture, hash-deterministic) and pin BOTH sides of the ANN
trade simultaneously:

    recall@10 >= 0.8 per query, mean >= 0.9
    AND mean candidate fraction <= 0.2

plus a negative control: an under-amplified LSH config must FAIL the
floor, proving the gate discriminates. Measured values (n=4000, 32
clusters, dim 64 — deterministic, so these are exact):

    LSH 8 planes x 16 tables: recall min 0.90 mean 0.985, frac 0.101
    IVF 32 cells, probe 3:    recall min 1.00 mean 1.000, frac ~0.185
    PQ m=16 codes=16 sl=150:  recall min 1.00 mean 1.000, frac 0.0375
    LSH 8 planes x  8 tables: recall min 0.50 (control: under floor)

Full recall-vs-candidate-fraction curve: SCALE.md round-7 notes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Judge/spot evidence tier (round 15): deterministic recall-quality
# measurements on a synthetic clustered corpus — they gate no declared
# query's correctness (the oracled recall queries are in
# test_oracle_parity) and cost ~2 min incl. the module fixture, so
# they run outside the driver's default profile (`pytest -m slow`).
pytestmark = pytest.mark.slow

from docker_based_real_time_etl_project_spark.fixtures import clustered_embeddings
from docker_based_real_time_etl_project_spark.operators.similarity import (
    brute_force_topk,
    ivf_candidates,
    ivf_topk,
    ivf_train,
    lsh_candidates,
    lsh_tables,
    lsh_topk_multi,
)

N = 4000

RECALL_FLOOR = 0.8
RECALL_MEAN = 0.9
FRAC_MEAN_CAP = 0.2


@pytest.fixture(scope="module")
def corpus(spark):
    return clustered_embeddings(spark, n=N).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def queries(corpus):
    return (
        corpus.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def exact(corpus, queries):
    return brute_force_topk(corpus, queries, k=10).localCheckpoint(eager=True)


def _recall_stats(exact, approx):
    a = approx.select(F.col("q_id").alias("aq"), F.col("vec_id").alias("av"))
    hits = exact.join(
        a, (F.col("q_id") == F.col("aq")) & (F.col("vec_id") == F.col("av")), "left_semi"
    )
    per = (
        exact.groupBy("q_id")
        .count()
        .withColumnRenamed("count", "ne")
        .join(hits.groupBy("q_id").count().withColumnRenamed("count", "nh"), "q_id", "left")
        .select((F.coalesce("nh", F.lit(0)) / F.col("ne")).alias("r"))
        .collect()
    )
    rs = [r.r for r in per]
    return min(rs), sum(rs) / len(rs)


def _mean_frac(cand, nq):
    per = [r["count"] / N for r in cand.groupBy("q_id").count().collect()]
    per += [0.0] * (nq - len(per))  # zero-candidate queries don't appear
    return sum(per) / len(per)


def test_fixture_is_genuinely_clustered(corpus, exact):
    """Guard against the circularity this file exists to kill: if the
    fixture degenerates to clusterless noise, the contracts below
    would again be provable only by exhaustion. On real cluster
    structure the exact top-10 neighbors overwhelmingly share the
    query's mixture label."""
    labels = corpus.select("vec_id", "label")
    q_lab = labels.select(F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"))
    n_same = (
        exact.join(labels, "vec_id")
        .join(q_lab, "q_id")
        .select((F.col("label") == F.col("q_label")).cast("int").alias("same"))
        .agg(F.avg("same"))
        .first()[0]
    )
    assert n_same >= 0.95


def test_lsh_recall_at_bounded_candidate_fraction(corpus, queries, exact):
    """LSH 8 planes x 16 tables: recall floor/mean over every query
    AND mean candidate fraction <= 0.2 — ANN that actually prunes."""
    tables = lsh_tables(dim=64, n_planes=8, n_tables=16, seed=42)
    nq = queries.count()
    mn, mean = _recall_stats(exact, lsh_topk_multi(corpus, queries, tables, k=10))
    frac = _mean_frac(lsh_candidates(corpus, queries, tables), nq)
    assert mn >= RECALL_FLOOR and mean >= RECALL_MEAN
    assert frac <= FRAC_MEAN_CAP


def test_ivf_recall_at_bounded_candidate_fraction(corpus, queries, exact):
    """IVF 32-cell quantizer (3 Lloyd rounds), probe 3: same dual
    contract. Candidate fraction here is the probed-cells mass — the
    exact bytes a cell-partitioned layout would read."""
    cents = ivf_train(corpus, n_centroids=32, iters=3)
    nq = queries.count()
    mn, mean = _recall_stats(exact, ivf_topk(corpus, queries, cents, n_probe=3, k=10))
    frac = _mean_frac(ivf_candidates(corpus, queries, cents, n_probe=3), nq)
    assert mn >= RECALL_FLOOR and mean >= RECALL_MEAN
    assert frac <= FRAC_MEAN_CAP


def test_under_amplified_lsh_fails_the_floor(corpus, queries, exact):
    """Negative control: 8 planes x 8 tables measurably LOSES recall
    on clustered data (min 0.5). If this starts passing the floor, the
    fixture stopped discriminating and the two contracts above are
    vacuous again."""
    tables = lsh_tables(dim=64, n_planes=8, n_tables=8, seed=42)
    mn, _ = _recall_stats(exact, lsh_topk_multi(corpus, queries, tables, k=10))
    assert mn < RECALL_FLOOR


def test_pq_recall_at_bounded_shortlist_fraction(corpus, queries, exact):
    """Product quantization (m=16 subspaces x 16 codes = 16 bytes per
    vector, 16x compression): ADC compressed-domain scoring + exact
    re-rank of a 150-deep shortlist (3.75% of the corpus) must clear
    the same dual gate. Measured 1.00/1.00 — PQ distances on
    clustered data rank true neighbors into a short shortlist, which
    is exactly the property that makes the 32x-smaller codes column
    the thing a 100 TB scan reads."""
    from docker_based_real_time_etl_project_spark.operators.similarity import (
        pq_topk,
        pq_train,
    )

    books = pq_train(corpus, m=16, n_codes=16)
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    mn, mean = _recall_stats(exact, pq_topk(corpus, queries, books, k=10, shortlist=150))
    assert mn >= RECALL_FLOOR and mean >= RECALL_MEAN
    assert 150 / N <= FRAC_MEAN_CAP
