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
