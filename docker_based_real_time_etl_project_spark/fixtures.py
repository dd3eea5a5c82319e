"""Deterministic synthetic fixtures generated engine-side.

The driver's embeddings table is near-random (clusterless), which
makes ANN recall contracts weakly discriminating: any config reaching
0.8 recall there does so by widening candidates toward the whole
corpus (round-6 verdict, "weak on evidence, not design"). Real
embedding corpora are clustered — that is the entire reason IVF/LSH
beat brute force — so the discriminating contract is measured on a
corpus WITH cluster structure: recall stays high while the candidate
fraction stays small.

The generator is pure Spark expressions: pseudo-randomness derives
from xxhash64(vec_id, tag, dim) exactly like the sampling operators'
hash tickets (no Python RNG in executors, no seed state), so the same
call is bit-identical on any cluster at any parallelism, and the
fixture scales to any n without driver materialization. Gaussians
come from Box-Muller over two hash-uniforms; cluster centers are a
tiny driver-side literal table (n_clusters x dim floats) broadcast
into a zip_with add.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_uniform(tag: str, d: int) -> Column:
    """Uniform in (0, 1) derived from xxhash64(vec_id, tag, d): the
    +0.5 centering keeps it strictly inside the open interval so
    log/Box-Muller never see 0."""
    h = F.xxhash64(F.col("vec_id"), F.lit(tag), F.lit(d))
    return (F.pmod(h, F.lit(1000003)).cast("double") + 0.5) / 1000003.0


def _hash_gauss(tag: str, d: int) -> Column:
    """Standard normal via Box-Muller over two hash-uniforms."""
    u1 = _hash_uniform(tag + "_u1", d)
    u2 = _hash_uniform(tag + "_u2", d)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)


def clustered_embeddings(
    spark: SparkSession,
    n: int = 4000,
    dim: int = 64,
    n_clusters: int = 32,
    center_sigma: float = 1.0,
    noise_sigma: float = 0.5,
) -> DataFrame:
    """(vec_id, label, embedding float[dim]) with genuine Gaussian
    mixture structure: vector = center[label] + N(0, noise_sigma).

    Geometry at the defaults: centers ~ N(0, 1)^64 are ~sqrt(2*64)
    ≈ 11.3 apart while intra-cluster displacement is ~noise_sigma *
    sqrt(64) = 4 — clearly separated but with enough spread that a
    lazy quantizer or under-amplified LSH measurably loses recall,
    which is what the contract must be able to detect."""
    rows = []
    for c in range(n_clusters):
        rng = random.Random(7919 * (c + 1))
        rows.append((c, [rng.gauss(0.0, center_sigma) for _ in range(dim)]))
    centers = spark.createDataFrame(rows, "label int, _center array<double>")

    label = F.pmod(F.xxhash64(F.col("vec_id"), F.lit("cluster")), F.lit(n_clusters)).cast(
        "int"
    )
    noise = F.array(*[(_hash_gauss("g", d) * noise_sigma) for d in range(dim)])
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), label.alias("label"), noise.alias("_noise"))
        .join(F.broadcast(centers), "label")
        .select(
            "vec_id",
            "label",
            F.zip_with("_center", "_noise", lambda a, b: (a + b).cast("float")).alias(
                "embedding"
            ),
        )
    )
