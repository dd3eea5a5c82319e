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

Scale note: the bitmap rides the plan as ONE array<long> literal.
That is the right call exactly when the static side is small — which
a contamination screen's benchmark suite genuinely is (even millions
of grams fold into a few MB of bitmap). For a static side where m
would not fit a plan literal (billions of keys), the honest paths are
a broadcast-joined bucketed table or Catalyst's own runtime filter,
not a giant literal; this operator documents that boundary rather
than pretending one mechanism covers both regimes.
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
    as m_bits/64 SIGNED longs (Spark's long literal domain). m_bits
    must be a multiple of 64."""
    assert m_bits % 64 == 0
    words = [0] * (m_bits // 64)
    for h in hashes:
        h1, h2 = _probe_params_py(int(h), m_bits)
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            words[pos >> 6] |= 1 << (pos & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_size_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bitmap size >= bits_per_key * n_keys (min 4096).
    At 16 bits/key with k=4 probes the false-positive rate is ~0.24%."""
    m = 4096
    while m < bits_per_key * max(n_keys, 1):
        m *= 2
    return m


def bloom_might_contain(gh: Column, words: list[int], k: int = 4) -> Column:
    """Membership test of a 64-bit hash column against the bitmap:
    k getbit probes on one array<long> literal — no UDF, no shuffle,
    fully codegen'd. True for every inserted key (no false negatives);
    true spuriously at the bitmap's FPR."""
    m_bits = len(words) * 64
    lit_words = F.lit(words)
    h1 = F.pmod(gh, F.lit(_P31))
    # unsigned top bits give a second independent 31-bit hash; *2+1
    # keeps it odd (full period mod the power-of-two m)
    h2 = F.pmod(F.shiftrightunsigned(gh, 31), F.lit(_P31)) * 2 + 1
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(lit_words, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function("getbit", word, F.pmod(pos, F.lit(64)).cast("int"))
        cond = cond & (bit == 1)
    return cond
