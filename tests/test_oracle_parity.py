"""The local twin of the driver's t2 gate: every SQL-oracled query must
hash-match DuckDB on the same parquet at sf0.001; rows-only queries
must at least execute."""

from __future__ import annotations

import pytest

from docker_based_real_time_etl_project_spark.oracle import check_query
from docker_based_real_time_etl_project_spark.queries import REGISTRY

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_parity(spark, sf_dir, name):
    res = check_query(spark, sf_dir, name)
    assert res.ok, f"{name}: {res.detail}"


def test_compare_is_dtype_strict():
    """Regression for the recurring HUGEINT oracle class: an integer
    Spark column vs a numerically-equal float oracle column must FAIL
    locally, because the driver's hash is dtype-sensitive. (The r1/r2
    comparator cast both sides to float and shipped the bug twice.)"""
    import pandas as pd

    from docker_based_real_time_etl_project_spark.oracle import compare

    s = pd.DataFrame({"k": ["a", "b"], "doc_sum": pd.array([3, 7], dtype="int64")})
    o = pd.DataFrame({"k": ["a", "b"], "doc_sum": [3.0, 7.0]})
    res = compare("dtype_strict_probe", s, o)
    assert not res.ok and "dtype class" in res.detail

    # same-class width differences still pass (int32 vs int64)
    o2 = pd.DataFrame({"k": ["a", "b"], "doc_sum": pd.array([3, 7], dtype="int32")})
    assert compare("dtype_width_probe", s, o2).ok
