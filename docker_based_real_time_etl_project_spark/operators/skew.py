"""Skew mitigation: salted two-phase aggregation.

When a groupBy key is pathologically skewed (one symbol is 90% of the
trade stream -- the reference's single-symbol world is the degenerate
case), the single reducer owning the hot key becomes the stage's
straggler. Salting splits each key into `n_salts` sub-groups for a
first partial aggregate, then combines the partials in a second, tiny
aggregate. Exactness is preserved by doing both phases in
decimal (associative) -- the salted result hash-matches the unsalted
one, which is exactly what q_agg_salted's oracle asserts.

AQE's skew-join splitting covers *joins*; salting covers *aggregations*
(AQE does not split a skewed aggregation key) -- both are in the
engine's toolbox.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.functions import DEC, _dec_to_double


def with_salt(df: DataFrame, from_cols: Sequence[str], n_salts: int, name: str = "_salt") -> Column:
    """Deterministic salt in [0, n_salts) from high-cardinality columns
    (xxhash64 -- never rand(), which breaks retry idempotence: a
    recomputed task must salt identically)."""
    return df.withColumn(name, F.pmod(F.xxhash64(*from_cols), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    salt_from: Sequence[str],
    n_salts: int = 16,
    sum_name: str = "sum_value",
    count_name: str = "n",
) -> DataFrame:
    """Two-phase skew-proof sum+count per key. Phase 1 groups by
    (keys, salt) -- the hot key's rows spread over n_salts reducers;
    phase 2 combines n_salts partials per key. Decimal all the way, so
    the regrouping cannot change the result."""
    v = F.col(value) if isinstance(value, str) else value
    salted = with_salt(df, salt_from, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(v.cast(DEC)).alias("_psum"),
        F.count(F.lit(1)).alias("_pn"),
    )
    return partial.groupBy(*keys).agg(
        _dec_to_double(F.sum("_psum")).alias(sum_name),
        F.sum("_pn").alias(count_name),
    )


def salted_broadcast_free_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_from: Sequence[str] = (),
) -> DataFrame:
    """Skew-proof equi-join when the dim is too big to broadcast and a
    fact key is hot: the fact side gets a deterministic salt from its
    own high-cardinality columns; the dim side is exploded n_salts ways;
    the join runs on (key, salt), spreading the hot key's rows over
    n_salts reducers. Identical row multiset to the plain join (each
    fact row matches exactly the one dim replica carrying its salt).

    Cost: dim shuffles n_salts x -- worth it only when dim << fact and a
    key is genuinely hot; AQE's skew-join split is the first resort,
    this is the deterministic fallback for when AQE's split heuristics
    miss (e.g. pre-shuffled inputs or non-sort-merge plans).
    """
    if not salt_from:
        raise ValueError("salt_from must name high-cardinality fact columns")
    f = with_salt(fact, salt_from, n_salts)
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, [*on, "_salt"]).drop("_salt")
