"""Reusable column-expression helpers shared by operators and the
query surface.

Cross-engine determinism toolkit (SURVEY.md 7.3):

- :func:`dsum` / :func:`davg`: double sums are order-dependent and
  Spark's partial-aggregation order is nondeterministic; summing
  through DECIMAL(25,10) is exact and associative, then one cast back
  to double is bit-deterministic.
- :func:`dround`: ``round(double, n)`` disagrees across engines on
  true ``.XX5`` ties (Spark HALF_UPs the shortest decimal repr;
  DuckDB rounds the binary value). Casting to DECIMAL(25,10) first
  snaps the value to its true decimal before rounding, making the tie
  behavior identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-sum intermediate type: integral headroom for 1e12-scale totals,
# 10 decimal places so double inputs round-trip the hash comparison.
DEC = "decimal(25,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dec_to_double(c: Column) -> Column:
    """decimal -> double via the decimal's exact string form.

    DuckDB's direct DECIMAL(25,10)->DOUBLE cast divides the scaled i128
    by 10^10 in floating point and is off by 1 ulp once the scaled
    integer exceeds 2^53; Java's BigDecimal.doubleValue() is correctly
    rounded, so the two engines disagree on big sums. String->double
    parsing is correctly rounded in BOTH engines (Double.parseDouble /
    fast_float), so the string hop makes the final double bit-identical.
    """
    return c.cast("string").cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return _dec_to_double(F.sum(_c(col).cast(DEC)))


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    c = _c(col)
    return dsum(c) / F.count(c)


def dround(col: Column | str, scale: int) -> Column:
    """Tie-stable round of a double to `scale` digits, as double."""
    return _dec_to_double(F.round(_c(col).cast(DEC), scale))


def sql_dsum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"


def sql_dround(expr: str, scale: int) -> str:
    """DuckDB oracle twin of :func:`dround`."""
    return f"CAST(CAST(ROUND(CAST({expr} AS DECIMAL(25,10)), {scale}) AS VARCHAR) AS DOUBLE)"
