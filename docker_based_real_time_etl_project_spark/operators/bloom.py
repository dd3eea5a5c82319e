"""Expression-level Bloom filter: a pre-shuffle membership prefilter
that stays entirely inside whole-stage codegen.

The pattern (the production path SCALE.md prescribes for the
contamination screen): the static side's 64-bit key hashes are folded
into a bitmap ONCE; the probe side tests membership with pure
expressions BEFORE the exact join, so ~(1 - hit_rate) of the probe
rows never reach the shuffle. Bloom filters have no false negatives
by construction, so the exact join on the survivors returns the same
rows as the exact join on everything — false positives are removed by
the join itself, which is why a query using this prefilter can keep a
full hash oracle.

Why not Spark's built-ins: `bloom_filter_agg`/`might_contain` are not
registered in the public SQL surface, and Catalyst's runtime bloom
injection does not fire for these join shapes at test scale. The
arithmetic here is Kirsch-Mitzenmacher double hashing — k probe
positions (h1 + i*h2) mod m derived from one xxhash64 — with every
intermediate kept below 2^63 so ANSI mode cannot overflow.

Scale note: the bitmap rides as a BROADCAST single-row array<long>
table (a plan literal is a measured dead end: PySpark's lit(list)
expands to a CreateArray with one py4j-built child per element —
131072 words took 53 s to even construct). The broadcast form is the
right call exactly when the static side is small — which a
contamination screen's benchmark suite genuinely is (even millions
of grams fold into a few MB of bitmap). For a static side where the
bitmap would not broadcast (billions of keys), the honest paths are
a broadcast-joined bucketed table or Catalyst's own runtime filter;
this operator documents that boundary rather than pretending one
mechanism covers both regimes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_P31 = (1 << 31) - 1
_MASK64 = (1 << 64) - 1


def _probe_params_py(h: int, m_bits: int) -> tuple[int, int]:
    """Python twin of the expression arithmetic below — MUST stay in
    lockstep with bloom_might_contain (pinned by unit test)."""
    h1 = h % _P31  # python % == Spark pmod for positive modulus
    h2 = ((h & _MASK64) >> 31) % _P31 * 2 + 1
    return h1 % m_bits, h2


def build_bloom_words(hashes, m_bits: int, k: int = 4) -> list[int]:
    """Fold 64-bit key hashes into an m_bits bitmap; returns the bitmap
    as m_bits/64 SIGNED longs (Spark's long domain). m_bits must be a
    multiple of 64. Vectorized: the same arithmetic as
    :func:`_probe_params_py` on uint64 numpy lanes (every intermediate
    < 2^34, so uint64 never wraps and the python/numpy paths agree —
    the lockstep test drives both)."""
    import numpy as np

    assert m_bits % 64 == 0
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    h = np.asarray(list(hashes), dtype=np.int64).view(np.uint64)
    if h.size:
        h1 = (h.view(np.int64) % np.int64(_P31)).view(np.uint64)
        h2 = (h >> np.uint64(31)) % np.uint64(_P31) * np.uint64(2) + np.uint64(1)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return [int(w) for w in words.view(np.int64)]


def bloom_size_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bitmap size >= bits_per_key * n_keys (min 4096).
    At 16 bits/key with k=4 probes the false-positive rate is ~0.24%."""
    m = 4096
    while m < bits_per_key * max(n_keys, 1):
        m *= 2
    return m


def bloom_might_contain(gh: Column, words_col: Column, m_bits: int, k: int = 4) -> Column:
    """Membership test of a 64-bit hash column against the bitmap held
    in ``words_col`` (an array<long> column — attach it with
    :func:`with_bloom_words`): k getbit probes, no UDF, fully
    codegen'd. True for every inserted key (no false negatives); true
    spuriously at the bitmap's FPR."""
    h1 = F.pmod(gh, F.lit(_P31))
    # unsigned top bits give a second independent 31-bit hash; *2+1
    # keeps it odd (full period mod the power-of-two m)
    h2 = F.pmod(F.shiftrightunsigned(gh, 31), F.lit(_P31)) * 2 + 1
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(words_col, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function("getbit", word, F.pmod(pos, F.lit(64)).cast("int"))
        cond = cond & (bit == 1)
    return cond


def with_bloom_words(df, spark, words: list[int], col_name: str = "_bloom_words"):
    """Attach the bitmap to every row of ``df`` as ``col_name`` via a
    broadcast crossJoin of a single-row table — one copy per executor,
    zero shuffle, and none of the py4j literal-construction cost."""
    bm = spark.createDataFrame([(words,)], f"{col_name} array<long>")
    return df.crossJoin(F.broadcast(bm))
