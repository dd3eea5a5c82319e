"""Query registry: the engine's declared query surface (SURVEY.md 2.4).

Each registered query is a named (spark, sf_dir) -> DataFrame callable
plus, when SQL-expressible, the equivalent DuckDB oracle SQL. The
driver hash-compares them at sf=0.01; ``tests/test_oracle_parity.py``
runs the same comparison at sf=0.001 in CI.

Determinism rules (SURVEY.md 7.3) enforced by convention here:

- **Exact sums:** floating-point sums are order-dependent and Spark's
  partial aggregation order is nondeterministic, so any SUM/AVG over a
  double is computed as ``SUM(CAST(x AS DECIMAL(25,10)))`` (exact,
  associative) and then cast to double. Per-row double arithmetic
  (a*b) IS bit-deterministic, so products are formed in double first,
  then decimal-summed. Helpers: :func:`dsum`, :func:`davg`.
- **No bare LIMIT:** every limit carries a total order with a unique
  key tiebreak.
- **No first/last without order:** min_by/max_by on a verified-unique
  ordering key.
- Timestamps in outputs are rendered with ``date_format`` (UTC) when
  hash stability across engines matters.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.sources.parquet import load_table

from docker_based_real_time_etl_project_spark.functions import (  # noqa: F401  (re-exported)
    DEC, davg, dround, dsum, sql_davg, sql_dround, sql_dsum,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    """One declared query: Spark implementation + optional DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the surface. ``oracle=None`` => the driver
    runs its weaker rows-only check (used for approx/hash-seeded/streaming
    operators whose exact output is engine-specific)."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
