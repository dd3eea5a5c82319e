"""Self-check harness mirroring the driver's t2 gate: run each
registered query on Spark AND its oracle SQL on DuckDB over the same
parquet, compare row count + column names + order-insensitive values.

Used by tests/test_oracle_parity.py (sf0.001) so every mismatch is
caught locally before the driver's sf0.01 run.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from docker_based_real_time_etl_project_spark.schemas import TESTDATA_TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_conn(sf_dir: str):
    """DuckDB connection with the testdata registered as views, matching
    the driver's pre-registered names."""
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df):
    """pandas frame -> column-name-sorted, row-sorted, hash-comparable."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(series) -> str:
    """Coarse dtype class used for the strictness gate. The driver's
    value-hash canonicalizer is dtype-sensitive: a Spark BIGINT column
    vs a DuckDB HUGEINT (which pandas receives as float) hash-differ
    even when every value is numerically equal. Grouping dtypes into
    classes lets int32-vs-int64 pass while int-vs-float fails."""
    import pandas as pd

    if pd.api.types.is_bool_dtype(series):
        return "bool"
    if pd.api.types.is_integer_dtype(series):
        return "int"
    if pd.api.types.is_float_dtype(series):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(series):
        return "datetime"
    return "other"


def compare(name: str, spark_df, oracle_df, float_ulp_tol: bool = False) -> ParityResult:
    """Strict order-insensitive comparison (the engine's determinism
    strategy is designed to make strict equality hold; a tolerance knob
    exists only for diagnosis, never for the green path).

    Dtype-STRICT: an int-class Spark column paired with a float-class
    oracle column (or any other class mismatch) fails even if the
    values agree numerically. This mirrors the driver's dtype-sensitive
    hash and catches the DuckDB ``SUM(BIGINT) -> HUGEINT -> float``
    oracle bug class locally (the r1/r2 recurring failure: the old
    comparator cast both sides to float first and was blind to it)."""
    import numpy as np
    import pandas as pd

    s, o = spark_df, oracle_df
    if sorted(s.columns) != sorted(o.columns):
        return ParityResult(name, False, f"columns differ: spark={sorted(s.columns)} oracle={sorted(o.columns)}", len(s), len(o))
    for c in sorted(s.columns):
        sc, oc = _dtype_class(s[c]), _dtype_class(o[c])
        if sc != oc:
            return ParityResult(
                name, False,
                f"dtype class differs for col {c}: spark={sc}({s[c].dtype}) "
                f"oracle={oc}({o[c].dtype}) — driver hash is dtype-sensitive; "
                f"CAST the oracle aggregate (e.g. CAST(SUM(x) AS BIGINT))",
                len(s), len(o),
            )
    if len(s) != len(o):
        return ParityResult(name, False, f"row count differs: spark={len(s)} oracle={len(o)}", len(s), len(o))
    sn, on = _normalize(s), _normalize(o)
    for c in sn.columns:
        a, b = sn[c], on[c]
        if pd.api.types.is_float_dtype(a):
            av, bv = a.to_numpy(), b.to_numpy(float)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                return ParityResult(name, False, f"float col {c} differs at sorted row {i}: spark={av[i]!r} oracle={bv[i]!r}", len(s), len(o))
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int(eq.idxmin())
                return ParityResult(name, False, f"col {c} differs at sorted row {i}: spark={a[i]!r} oracle={b[i]!r}", len(s), len(o))
    return ParityResult(name, True, "ok", len(s), len(o))


# Oracle results costing more than this many seconds are cached on
# disk keyed by (query, oracle-SQL digest, table-file fingerprints).
# The truth table only changes when the SQL or the data does — the
# all-pairs oracles (minhash pairs, corpus gate, cluster closure) are
# ~10 min each at sf0.1 and dominated the parity sweep (r8 verdict
# "What's wrong" #4). Cheap oracles are never cached (no bloat, and a
# fresh run stays the common case).
ORACLE_CACHE_MIN_SEC = 10.0


def _oracle_cache_path(sf_dir: str, name: str, sql: str) -> str:
    """Cache file path; digest covers the SQL text and (path, size,
    mtime_ns) of every registered table parquet, so edits to either
    invalidate the entry."""
    import hashlib

    h = hashlib.sha256(sql.encode())
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
    cache_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".oracle_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"{name}_{h.hexdigest()[:20]}.pkl")


def run_oracle(sf_dir: str, name: str, sql: str):
    """Execute an oracle SQL on DuckDB with the disk cache in front.
    Pickle (not parquet) so the pandas frame round-trips with EXACT
    dtypes — the strict comparator is dtype-class-sensitive and list
    columns don't survive a parquet round-trip unchanged."""
    import time

    import pandas as pd

    cpath = _oracle_cache_path(sf_dir, name, sql)
    if os.path.exists(cpath):
        return pd.read_pickle(cpath)
    con = duckdb_conn(sf_dir)
    t0 = time.perf_counter()
    odf = con.execute(sql).fetchdf()
    if time.perf_counter() - t0 >= ORACLE_CACHE_MIN_SEC:
        tmp = cpath + ".tmp"
        odf.to_pickle(tmp)
        os.replace(tmp, cpath)
    return odf


def check_query(spark: SparkSession, sf_dir: str, name: str) -> ParityResult:
    from docker_based_real_time_etl_project_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        ok = len(sdf) >= 0
        return ParityResult(name, ok, f"rows-only: {len(sdf)} rows", len(sdf), -1)
    odf = run_oracle(sf_dir, name, q.oracle)
    return compare(name, sdf, odf)
