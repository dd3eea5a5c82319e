"""PCA contract tests (q_embed_pca is rows-only — eigenvector sign is
arbitrary and eigh is not SQL-expressible — so the math is pinned
here; the distributed aggregate underneath, q_embed_gram, carries a
full hash oracle)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from docker_based_real_time_etl_project_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _proj_matrix(spark):
    rows = REGISTRY["q_embed_pca"].fn(spark, SF_SMOKE).collect()
    by_comp = {}
    eig = {}
    for r in rows:
        by_comp.setdefault(r["comp"], {})[r["vec_id"]] = r["proj"]
        eig[r["comp"]] = r["eigenvalue"]
    ids = sorted(next(iter(by_comp.values())))
    P = np.array([[by_comp[c][i] for i in ids] for c in sorted(by_comp)])
    lam = np.array([eig[c] for c in sorted(by_comp)])
    return P, lam


def test_projection_variance_equals_eigenvalue(spark):
    P, lam = _proj_matrix(spark)
    var = P.var(axis=1)  # population variance; projections are centered
    assert np.allclose(var, lam, rtol=1e-6)
    assert (np.diff(lam) <= 1e-12).all()  # descending


def test_components_decorrelated(spark):
    P, _ = _proj_matrix(spark)
    C = np.corrcoef(P)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-6


def test_topk_beats_raw_coordinates(spark):
    """PCA optimality (sanity form): explained variance of the top-k
    components is at least the total variance of the k highest-variance
    RAW coordinates."""
    P, lam = _proj_matrix(spark)
    emb = np.array(
        [
            r["embedding"]
            for r in REGISTRY["q_embed_pca"]
            .fn(spark, SF_SMOKE)
            .sparkSession.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .select("embedding")
            .collect()
        ]
    )
    raw_var = np.sort(emb.var(axis=0))[::-1]
    assert lam.sum() >= raw_var[: len(lam)].sum() - 1e-9
