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
