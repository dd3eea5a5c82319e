"""Guard the loader's assumptions about the driver-generated testdata.

The testdata is regenerated between rounds and its physical types have
changed before (events.ts shipped as parquet TIMESTAMP(NANOS) in early
rounds and as timestamp[us] later; the r3 correctness reds were a
hard-coded nanos shim silently dividing real microseconds by 1000).
These tests read ONLY footers and fail loudly on the next silent
physical-type change instead of letting every time-axis result drift.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyarrow.types as pa_types
import pytest

from docker_based_real_time_etl_project_spark.schemas import (
    TESTDATA_SCHEMAS, TESTDATA_TABLES,
)

SF_DIR = "/root/testdata/sf0.001"

# Spark type -> acceptable arrow physical classes in the footer.
# timestamp accepts any unit/tz: the loader sniffs ns (long-read shim)
# vs us/ms (direct read) per file, and NTZ-vs-LTZ is absorbed by the
# declared schema + pinned UTC session.
_OK = {
    "LongType": lambda t: pa_types.is_integer(t),
    "IntegerType": lambda t: pa_types.is_integer(t),
    "DoubleType": lambda t: pa_types.is_floating(t),
    "StringType": lambda t: pa_types.is_string(t) or pa_types.is_large_string(t),
    "BooleanType": lambda t: pa_types.is_boolean(t),
    "DateType": lambda t: pa_types.is_date(t),
    "TimestampType": lambda t: pa_types.is_timestamp(t),
    "TimestampNTZType": lambda t: pa_types.is_timestamp(t),
    "BinaryType": lambda t: pa_types.is_binary(t) or pa_types.is_large_binary(t),
}


def _leaf_ok(spark_type, arrow_type) -> bool:
    name = type(spark_type).__name__
    if name == "ArrayType":
        return (
            pa_types.is_list(arrow_type) or pa_types.is_large_list(arrow_type)
        ) and _leaf_ok(spark_type.elementType, arrow_type.value_type)
    check = _OK.get(name)
    return check(arrow_type) if check else True


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_declared_schema_matches_parquet_footer(name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in testdata")
    schema = TESTDATA_SCHEMAS.get(name)
    if schema is None:
        pytest.skip(f"{name} has no declared schema")
    arrow = pq.ParquetFile(path).schema_arrow
    footer_names = [f.name for f in arrow]
    for field in schema.fields:
        assert field.name in footer_names, (
            f"{name}.{field.name} declared but absent from parquet footer "
            f"(testdata regenerated with a different layout?)"
        )
        at = arrow.field(arrow.get_field_index(field.name)).type
        assert _leaf_ok(field.dataType, at), (
            f"{name}.{field.name}: declared {field.dataType} incompatible with "
            f"parquet physical {at} — update schemas.py/loader for the new "
            f"testdata generation"
        )


def test_nanos_sniff_tracks_footer():
    """The loader's ns-vs-us decision must agree with the footer for
    every column it special-cases (regression for the r3 time-axis
    corruption: the shim ran unconditionally)."""
    from docker_based_real_time_etl_project_spark.sources.parquet import (
        _MAYBE_NANOS_TS_COLS, _nanos_cols,
    )

    for tbl, cols in _MAYBE_NANOS_TS_COLS.items():
        path = os.path.join(SF_DIR, f"{tbl}.parquet")
        if not os.path.exists(path):
            continue
        arrow = pq.ParquetFile(path).schema_arrow
        expect = tuple(
            c
            for c in cols
            if pa_types.is_timestamp(arrow.field(arrow.get_field_index(c)).type)
            and arrow.field(arrow.get_field_index(c)).type.unit == "ns"
        )
        assert _nanos_cols(path, cols) == expect


def test_rechunk_cache_reuse_and_sizing(spark):
    """The session re-chunk must (a) serve repeat loads from the cached
    layout without re-writing, (b) keep tiny dims at a couple of files
    so their size statistics stay near truth, and (c) give big tables
    real scan parallelism."""
    import os

    from docker_based_real_time_etl_project_spark.sources import parquet as pq_src

    if not pq_src._RECHUNK:
        import pytest

        pytest.skip("rechunk disabled via env")
    sf = "/root/testdata/sf0.001"
    nation = pq_src.load_table(spark, sf, "nation")
    key = os.path.join(sf, "nation.parquet")
    assert key in pq_src._RECHUNK_CACHE
    cached_dir = pq_src._RECHUNK_CACHE[key]
    n_files = len([f for f in os.listdir(cached_dir) if f.endswith(".parquet")])
    assert n_files <= 4, "tiny dim exploded into many files — stats inflation"
    assert nation.count() == 25
    # repeat load: same cached dir, no second write
    again = pq_src.load_table(spark, sf, "nation")
    assert pq_src._RECHUNK_CACHE[key] == cached_dir
    assert again.rdd.getNumPartitions() == nation.rdd.getNumPartitions()

    li = pq_src.load_table(spark, sf, "lineitem")
    assert li.rdd.getNumPartitions() >= 2, "big table should scan in parallel"


def test_rechunk_preserves_rows_and_schema(spark):
    """Cached layout must be value-identical to a direct raw read
    (timestamps normalized identically, row multiset preserved)."""
    from docker_based_real_time_etl_project_spark.sources import parquet as pq_src

    sf = "/root/testdata/sf0.001"
    via_cache = pq_src.load_table(spark, sf, "events")
    raw = spark.read.parquet(f"{sf}/events.parquet")
    assert via_cache.count() == raw.count()
    a = {tuple(r) for r in via_cache.select("event_id", "ts", "value").collect()}
    b = {tuple(r) for r in raw.selectExpr(
        "event_id", "cast(ts as timestamp) ts", "value"
    ).collect()}
    assert a == b


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_gram_df_below_postings_cap(sf_dir):
    """The df-capped postings join (operators.dedup.gram_postings_pairs,
    DEFAULT_MAX_GRAM_DF) is registered against EXACT all-pairs oracles
    in q_ngram_jaccard / q_containment / q_dedup_clusters /
    q_split_leakage. Parity is exact only while no (source, gram) block
    df reaches the cap; this pins that invariant, with wide margin, at
    every shipped scale factor (k=3 grams are the hottest gram size any
    capped query uses — larger k only lowers df). If the testdata
    generator ever produces a hotter corpus, this fails BEFORE the
    driver's oracle compare silently diverges."""
    import duckdb

    from docker_based_real_time_etl_project_spark.operators.dedup import DEFAULT_MAX_GRAM_DF

    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("documents not in testdata")
    (max_df,) = duckdb.connect().execute(
        f"""
        WITH sh AS (
          SELECT doc_id, source,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
                   i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
                 )) AS grams
          FROM '{path}'
        )
        SELECT MAX(df) FROM (
          SELECT source, g, COUNT(*) AS df
          FROM (SELECT doc_id, source, unnest(grams) AS g FROM sh)
          GROUP BY source, g)
        """
    ).fetchone()
    assert max_df is not None
    # demand 10x headroom, not just "below": a corpus drifting toward the
    # cap deserves a loud look before it gets within rounding of wrong
    assert max_df * 10 <= DEFAULT_MAX_GRAM_DF, (
        f"max per-(source,gram) df {max_df} is within 10x of the postings "
        f"cap {DEFAULT_MAX_GRAM_DF}; exact-oracle parity is at risk"
    )
