"""Source-format parity: CSV and JSON ingest must produce bit-identical
results to the parquet path.

The reference ingests JSON (REST payloads); a user switching engines
also brings CSV dumps and JSONL exports. Policy at any scale:
schema-on-read with the DECLARED schema (schemas.py) -- inference is
a second full scan AND a correctness hazard (a column of '123's
infers int, then row 4 billion says 'abc') -- and an explicit
timestampFormat with microseconds, because the default second
granularity silently truncates event times.

Each query materializes a text-format copy of the table once per
(sf_dir, format) into a temp dir (the same write-once pattern the
streaming replay uses), reads it back through the declared schema,
and aggregates; the oracle runs the same aggregate on the parquet
table, so any reader/writer drift (doubles, timestamps, nulls)
breaks the hash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    dsum, register, sql_dsum, table,
)
from docker_based_real_time_etl_project_spark.schemas import TESTDATA_SCHEMAS

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_COPY_CACHE: dict[tuple[str, str, str], str] = {}


def _text_copy(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    """Write `name` as CSV/JSON once per session; return the dir."""
    key = (sf_dir, name, fmt)
    if key not in _COPY_CACHE:
        out = tempfile.mkdtemp(prefix=f"{name}_{fmt}_")
        w = table(spark, sf_dir, name).write.mode("overwrite").option(
            "timestampFormat", _TS_FMT
        )
        if fmt == "csv":
            w.option("header", "true").csv(out)
        else:
            w.json(out)
        _COPY_CACHE[key] = out
    return _COPY_CACHE[key]


def read_csv(spark: SparkSession, path: str, schema_name: str) -> DataFrame:
    """CSV with the declared schema: no inference pass, microsecond
    timestamps, FAILFAST so malformed rows surface instead of nulling."""
    return (
        spark.read.schema(TESTDATA_SCHEMAS[schema_name])
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema_name: str) -> DataFrame:
    return (
        spark.read.schema(TESTDATA_SCHEMAS[schema_name])
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .json(path)
    )


@register(
    "q_source_csv",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(MIN(l_shipdate) AS VARCHAR) AS min_ship,
           CAST(MAX(l_shipdate) AS VARCHAR) AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("source",),
)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem routed through a CSV round-trip, then aggregated: the
    hash only matches if doubles and timestamps survive text encoding
    exactly (Java shortest-repr doubles re-parse bit-identically)."""
    li = read_csv(spark, _text_copy(spark, sf_dir, "lineitem", "csv"), "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_quantity").alias("sum_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_ship"),
    )


@register(
    "q_source_json",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("source",),
)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events routed through a JSONL round-trip (the reference's native
    payload format), then aggregated; microsecond timestamps pin the
    timestampFormat handling."""
    ev = read_json(spark, _text_copy(spark, sf_dir, "events", "json"), "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.countDistinct("user_id").alias("n_users"),
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


@register(
    "q_source_orc",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
    tags=("source",),
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders routed through an ORC round-trip (the third columnar
    container after parquet; schema travels in-file so no declared-
    schema read needed), aggregates hash-matched against the parquet
    path. ORC's timestamp/double encodings must be lossless for this
    to hold."""
    key = (sf_dir, "orders", "orc")
    if key not in _COPY_CACHE:
        out = tempfile.mkdtemp(prefix="orders_orc_")
        table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
        _COPY_CACHE[key] = out
    o = read_orc(spark, _COPY_CACHE[key])
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_ZLAYOUT_CACHE: dict[str, tuple[str, object]] = {}


def _zordered_lineitem(spark: SparkSession, sf_dir: str):
    """lineitem clustered once per session on the (l_partkey, l_suppkey)
    Morton grid — the write-side OPTIMIZE pass a 100 TB table owner
    would schedule (operators/zorder.py); readers get 2-D box pruning
    from then on."""
    from docker_based_real_time_etl_project_spark.operators.zorder import fit_grid, zorder_write

    if sf_dir not in _ZLAYOUT_CACHE:
        li = table(spark, sf_dir, "lineitem")
        grid = fit_grid(li, "l_partkey", "l_suppkey", bits=3)
        out = tempfile.mkdtemp(prefix="lineitem_zorder_")
        zorder_write(li, out, grid)
        _ZLAYOUT_CACHE[sf_dir] = (out, grid)
    out, grid = _ZLAYOUT_CACHE[sf_dir]
    return spark.read.parquet(out), grid


@register(
    "q_zorder_pruned_scan",
    oracle=f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
               MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx
        FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem, b
    WHERE l_partkey BETWEEN pmn + (pmx - pmn) // 10 AND pmn + (pmx - pmn) // 4
      AND l_suppkey BETWEEN smn + (smx - smn) * 3 // 10 AND smn + (smx - smn) * 3 // 5
    GROUP BY l_returnflag
    """,
    tags=("source", "layout", "scale"),
)
def q_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box aggregate over the z-ordered lineitem copy: the bucket
    IN-list derived from grid math prunes the scan to the covered
    Morton cells (PartitionFilters — proven in tests/test_scale_ops.py)
    while the re-applied exact predicate keeps results layout-
    independent, so the oracle runs the SAME box on the unclustered
    table. The box bounds are derived from the table's own min/max with
    identical integer arithmetic on both sides, so the query is
    scale-factor-agnostic."""
    from docker_based_real_time_etl_project_spark.operators.zorder import zorder_box_scan

    zdf, grid = _zordered_lineitem(spark, sf_dir)
    lo1 = grid.min1 + (grid.max1 - grid.min1) // 10
    hi1 = grid.min1 + (grid.max1 - grid.min1) // 4
    lo2 = grid.min2 + (grid.max2 - grid.min2) * 3 // 10
    hi2 = grid.min2 + (grid.max2 - grid.min2) * 3 // 5
    return zorder_box_scan(zdf, grid, lo1, hi1, lo2, hi2).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # dsum, not a bigint cast: the repo-wide exact-decimal convention
        # for double columns (a truncating cast only agreed with DuckDB
        # because l_quantity happens to be integer-valued)
        dsum("l_quantity").alias("sum_qty"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


def _lake_copy(spark: SparkSession, sf_dir: str) -> str:
    """Clustered-lake copy of events, once per (sf_dir, data
    fingerprint): partition dirs on event_type, range-clustered and
    sorted on (ts, event_id), files capped at 20k rows. The layout
    contracts (pruning, row-group disjointness, file-size bound) are
    pinned in tests/test_lakewrite.py; this query pins that the WRITTEN
    BYTES are a faithful copy — any writer/reader drift (timestamp
    granularity, double rounding, partition-column re-typing) breaks
    the hash against the original parquet."""
    from docker_based_real_time_etl_project_spark.lakewrite import write_clustered
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_events_")
        write_clustered(
            table(spark, sf_dir, "events"),
            out,
            partition_by=("event_type",),
            sort_by=("ts", "event_id"),
            target_rows_per_file=20_000,
        )
        return out

    return materialize_once(
        ("lake_clustered_events", sf_dir, table_fingerprint(sf_dir, "events")),
        build,
    )


@register(
    "q_lake_roundtrip",
    oracle="""
    WITH b AS (
        SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(event_id) AS min_eid,
           MAX(event_id) AS max_eid
    FROM events, b
    WHERE epoch_us(ts) BETWEEN mn + (mx - mn) // 3 AND mn + (mx - mn) * 2 // 3
    GROUP BY event_type
    """,
    tags=("source", "sink", "layout", "scale"),
)
def q_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path parity: events written through the clustered lake
    writer (lakewrite.write_clustered — partition dirs + range
    clustering + file-size caps), read back through the partition-dir
    scan, middle-third time slice, per-type aggregate. The oracle runs
    the SAME slice on the ORIGINAL parquet, so the hash proves the
    optimized layout is byte-faithful: timestamps keep microseconds,
    doubles round-trip, the partition column survives its trip through
    directory names, no row is lost or duplicated by the range
    exchange + file rolling. Bounds derive from the table's own
    min/max with identical integer arithmetic on both sides, so the
    query is scale-factor-agnostic; the ts filter lands on the sorted
    column, i.e. at scale this scan row-group-skips 2/3 of the data."""
    d = spark.read.parquet(_lake_copy(spark, sf_dir))
    b = d.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    return (
        d.crossJoin(F.broadcast(b))
        .filter(
            F.unix_micros("ts").between(
                F.expr("mn + (mx - mn) div 3"), F.expr("mn + (mx - mn) * 2 div 3")
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_eid"),
            F.max("event_id").alias("max_eid"),
        )
    )


_BUCKETED_CACHE: dict[tuple, tuple[str, str]] = {}


def _clear_stale_table_location(spark: SparkSession, name: str) -> None:
    """Remove a managed-table warehouse directory that outlived its
    catalog entry. With the default in-memory catalog, table
    registrations die with the JVM but warehouse dirs persist on
    disk, so a FRESH session's saveAsTable hits
    LOCATION_ALREADY_EXISTS on a dir it cannot reuse (bucketing
    metadata lives only in the catalog). Safe to delete: an
    unregistered bucketed-table dir is unreadable as a bucketed
    table anyway."""
    if spark.catalog.tableExists(name):
        return  # registered: mode("overwrite") handles it atomically
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    loc = os.path.join(wh.path or wh.geturl(), name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """lineitem + orders saved as BUCKETED tables (8 buckets on the
    join key, sorted within) once per (sf_dir, data fingerprint) —
    the co-located layout that makes every later join on that key
    shuffle-free. Bucket files live in the session warehouse; table
    names carry the fingerprint so regenerated testdata rebuilds."""
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        table_fingerprint,
    )

    key = (sf_dir, table_fingerprint(sf_dir, "lineitem"), table_fingerprint(sf_dir, "orders"))
    if key not in _BUCKETED_CACHE:
        import hashlib

        # deterministic across processes (unlike hash()): the same
        # data snapshot reuses/overwrites the same warehouse tables
        # instead of littering a new pair per session
        tag = hashlib.md5(repr(key).encode()).hexdigest()[:8]
        li_name, o_name = f"li_bkt_{tag}", f"o_bkt_{tag}"
        _clear_stale_table_location(spark, li_name)
        _clear_stale_table_location(spark, o_name)
        (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
        (
            table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
        _BUCKETED_CACHE[key] = (li_name, o_name)
    return _BUCKETED_CACHE[key]


@register(
    "q_join_bucketed",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "layout", "scale"),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact-fact join: both sides stored bucketed on
    the join key (8 buckets, sorted), so the sort-merge join reads
    bucket i against bucket i with NO Exchange on either side — the
    plan shape is pinned in tests/test_plans.py (and
    test_scale_ops.py proves the mechanism in isolation). This is the
    100 TB strategy for a join repeated every batch cycle: pay the
    bucketed write once, skip the dominant shuffle forever. The merge
    hint forces the comparison path even where the optimizer would
    broadcast at test scale; results are layout-independent, so the
    oracle runs the plain join on the unbucketed tables."""
    li_name, o_name = _bucketed_pair(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    return (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


def _orders_lake(spark: SparkSession, sf_dir: str) -> str:
    """Pristine clustered-lake copy of orders (partition dirs on
    o_orderpriority, sorted on o_orderkey), once per (sf_dir, data
    fingerprint). q_lake_merge copies this artifact before mutating —
    the cached original is never written to twice."""
    from docker_based_real_time_etl_project_spark.lakewrite import write_clustered
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_orders_")
        write_clustered(
            table(spark, sf_dir, "orders"),
            out,
            partition_by=("o_orderpriority",),
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        return out

    return materialize_once(
        ("lake_clustered_orders", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


def _merge_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MERGE batch derived from orders itself so a SQL
    oracle can restate it exactly: key%97==0 rows are upserted with a
    +1000.00 price correction (unless also deleted), key%103==5 rows
    are deleted, and key%101==3 rows are re-inserted under key+2e9
    (guaranteed-new keys). Partition values are never changed — the
    CoW immutable-partition-key contract."""
    o = table(spark, sf_dir, "orders")
    upserts = (
        o.filter((F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 103 != 5))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("_delete", F.lit(False))
    )
    deletes = o.filter(F.col("o_orderkey") % 103 == 5).withColumn(
        "_delete", F.lit(True)
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 101 == 3)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(2_000_000_000))
        .withColumn("_delete", F.lit(False))
    )
    return upserts.unionByName(deletes).unionByName(inserts)


@register(
    "q_lake_merge",
    oracle=f"""
    WITH upd AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice,
               FALSE AS del
        FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 <> 5
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice, TRUE
        FROM orders WHERE o_orderkey % 103 = 5
        UNION ALL
        SELECT o_orderkey + 2000000000, o_orderpriority, o_totalprice, FALSE
        FROM orders WHERE o_orderkey % 101 = 3
    ), merged AS (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM upd WHERE NOT del
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           COUNT(*) FILTER (WHERE o_orderkey >= 2000000000) AS n_inserted
    FROM merged
    GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "cdc", "scale"),
)
def q_lake_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE INTO a plain-parquet lake — the Delta/Hudi
    upsert pattern with stock Spark (lakewrite.merge_upsert): a derived
    update batch (price-corrections + deletes + new keys) is merged
    into a partitioned clustered copy of orders via broadcast anti-join
    + dynamic partition overwrite, then the MUTATED LAKE is read back
    and aggregated per partition. The oracle restates the merge
    relationally over the original table, so the hash proves upsert
    (replaced, not duplicated), delete (gone), insert (present
    exactly once) and that untouched rows survived the rewrite
    byte-faithfully. I/O at scale ∝ touched partitions: see the
    mtime-pinned pruning proof in tests/test_lakewrite.py. Reference
    parity: this is the idempotent keyed-upsert delivery semantic of
    the Cassandra sink (cassandra-sink-config.json:19-20) re-expressed
    as a lake maintenance operator."""
    import shutil

    from docker_based_real_time_etl_project_spark.lakewrite import merge_upsert

    work = tempfile.mkdtemp(prefix="lake_merge_")
    shutil.rmtree(work)
    shutil.copytree(_orders_lake(spark, sf_dir), work)
    merge_upsert(
        spark,
        work,
        _merge_updates(spark, sf_dir),
        key_cols=("o_orderkey",),
        partition_col="o_orderpriority",
        delete_col="_delete",
        sort_by=("o_orderkey",),
        target_rows_per_file=20_000,
    )
    return (
        spark.read.parquet(work)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.sum(
                (F.col("o_orderkey") >= 2_000_000_000).cast("bigint")
            ).alias("n_inserted"),
        )
    )


def _evolved_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events written in TWO schema generations into one directory,
    once per (sf_dir, fingerprint): generation 1 (even event_id) has
    the original columns; generation 2 (odd event_id) adds a
    value_cents BIGINT the pipeline started emitting later. The
    mixed-footer directory is what any long-lived lake table looks
    like after a producer upgrade."""
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="events_evolved_")
        ev = table(spark, sf_dir, "events")
        ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(out)
        (
            ev.filter(F.col("event_id") % 2 == 1)
            .withColumn(
                "value_cents", F.round(F.col("value") * 100).cast("bigint")
            )
            .write.mode("append")
            .parquet(out)
        )
        return out

    return materialize_once(
        ("events_evolved", sf_dir, table_fingerprint(sf_dir, "events")), build
    )


@register(
    "q_source_evolved",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_evolved,
           CAST(SUM(CASE WHEN event_id % 2 = 1
                         THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT)
               AS cents_evolved,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents_all
    FROM events
    GROUP BY event_type
    """,
    tags=("source", "layout"),
)
def q_source_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ON READ: a directory whose parquet files carry
    two schema generations (a later producer added value_cents) is read
    with mergeSchema=true — the union schema comes back, pre-evolution
    rows surface NULL for the added column, and no rewrite of old files
    is needed. The aggregate proves the null back-fill is exact (the
    evolved-row cents sum counts only generation-2 rows) AND that the
    old column is intact across generations (cents_all recomputed from
    value matches the oracle over the original table). Scale policy:
    mergeSchema is a per-read footer union — at 100 TB pin the table
    schema in a catalog and pass it explicitly (schema-on-read, no
    footer sampling job); this query is the semantics contract either
    path must satisfy."""
    d = _evolved_dir(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value_cents").alias("n_evolved"),
        F.sum("value_cents").alias("cents_evolved"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents_all"),
    )


def _orders_snap(spark: SparkSession, sf_dir: str) -> str:
    """orders as a two-version SNAPSHOT table (lakesnap): v1 = the
    pristine table, v2 = the same deterministic MERGE batch
    q_lake_merge applies — so SQL oracles can restate both versions
    from the original parquet. Built once per (sf_dir, fingerprint)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_merge,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        snap_merge(
            spark,
            out,
            _merge_updates(spark, sf_dir),
            key_cols=("o_orderkey",),
            delete_col="_delete",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        return out

    return materialize_once(
        ("lake_snap_orders", sf_dir, table_fingerprint(sf_dir, "orders")), build
    )


_SNAP_MERGED_CTE = """
    upd AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice,
               FALSE AS del
        FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 <> 5
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice, TRUE
        FROM orders WHERE o_orderkey % 103 = 5
        UNION ALL
        SELECT o_orderkey + 2000000000, o_orderpriority, o_totalprice, FALSE
        FROM orders WHERE o_orderkey % 101 = 3
    ), merged AS (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM upd WHERE NOT del
    )
"""


@register(
    "q_lake_time_travel",
    oracle=f"""
    WITH {_SNAP_MERGED_CTE}
    SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM orders
    UNION ALL
    SELECT CAST(2 AS BIGINT), COUNT(*), {sql_dsum('o_totalprice')},
           MAX(o_orderkey)
    FROM merged
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL on the snapshot lake (lakesnap.py): orders receives
    a CoW MERGE (upserts + deletes + inserts), yet reading version 1
    afterwards returns the pre-merge table EXACTLY — data files are
    immutable, commits are atomic manifest swaps, so history stays
    readable until vacuumed. The query aggregates BOTH versions
    (rows, exact price total, max key); the oracle recomputes v1 from
    the original parquet and v2 from the relational restatement of
    the merge, so the hash proves the snapshot isolation property
    end-to-end, not just row counts. At scale the manifest read is
    O(files) metadata and the untouched partitions of v2 are the
    SAME bytes as v1 (carried manifest rows — pinned in
    tests/test_lakesnap.py)."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap(spark, sf_dir)
    outs = []
    for v in (1, 2):
        outs.append(
            snap_read(spark, path, v).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                dsum("o_totalprice").alias("total_price"),
                F.max("o_orderkey").alias("max_key"),
            ).select(F.lit(v).cast("bigint").alias("version"), "*")
        )
    return outs[0].unionByName(outs[1])


@register(
    "q_lake_version_diff",
    oracle="""
    SELECT 'update' AS change_type, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS old_cents,
           CAST(ROUND((o_totalprice + 1000.0) * 100) AS BIGINT) AS new_cents
    FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 <> 5
    UNION ALL
    SELECT 'delete', o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT), CAST(NULL AS BIGINT)
    FROM orders WHERE o_orderkey % 103 = 5
    UNION ALL
    SELECT 'insert', o_orderkey + 2000000000,
           CAST(NULL AS BIGINT), CAST(ROUND(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 3
    """,
    tags=("cdc", "layout", "scale", "lakesnap"),
)
def q_lake_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE FEED between two snapshot versions (Delta CDF / Iceberg
    changelog shape): full-outer join of v1 and v2 on the key with
    null-safe struct comparison yields exactly the merge batch's
    effect — every upsert as an update (old and new price), every
    tombstone as a delete, every new key as an insert. The oracle
    restates the change set relationally from the original table, so
    the hash proves the diff reconstructs the CDC stream that
    produced v2 — the audit/backfill primitive a versioned lake
    exists for."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_diff

    path = _orders_snap(spark, sf_dir)
    d = snap_diff(spark, path, 1, 2, key_cols=("o_orderkey",))
    return d.select(
        "change_type",
        "o_orderkey",
        F.round(F.col("_old.o_totalprice") * 100).cast("bigint").alias("old_cents"),
        F.round(F.col("_new.o_totalprice") * 100).cast("bigint").alias("new_cents"),
    )


@register(
    "q_lake_incremental_agg",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice,
               FALSE AS del
        FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 <> 5
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice, TRUE
        FROM orders WHERE o_orderkey % 103 = 5
        UNION ALL
        SELECT o_orderkey + 2000000000, o_orderpriority, o_totalprice, FALSE
        FROM orders WHERE o_orderkey % 101 = 3
    ), merged AS (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM upd WHERE NOT del
    )
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS VARCHAR)
                AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderpriority
    """,
    tags=("cdc", "layout", "scale", "lakesnap"),
)
def q_lake_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE from the snapshot change feed: a
    per-partition aggregate built on version 1 is rolled forward to
    version 2 by applying snap_diff's deltas — O(changes) work, the
    table is never rescanned — and must hash-match the oracle's DIRECT
    aggregation of the post-merge state. This is what the versioned
    lake's change feed is FOR: the q_cdc_agg_incremental pattern with
    the lake itself as the changelog source (Delta CDF -> incremental
    materialized view). Exactness: both paths sum through
    DECIMAL(25,10) — decimal addition is exact and commutative, so
    base + delta equals the direct sum bit-for-bit after the one
    string-hop cast to double."""
    from docker_based_real_time_etl_project_spark.functions import (
        DEC,
        _dec_to_double,
    )
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_diff,
        snap_read,
    )

    path = _orders_snap(spark, sf_dir)
    base = (
        snap_read(spark, path, 1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("t0"),
        )
    )
    ct = F.col("change_type")
    delta = (
        snap_diff(spark, path, 1, 2, key_cols=("o_orderkey",))
        .select(
            F.coalesce(
                F.col("_new.o_orderpriority"), F.col("_old.o_orderpriority")
            ).alias("o_orderpriority"),
            F.when(ct == "insert", 1).when(ct == "delete", -1).otherwise(0).alias(
                "dn"
            ),
            (
                F.coalesce(
                    F.col("_new.o_totalprice").cast(DEC), F.lit(0).cast(DEC)
                )
                - F.coalesce(
                    F.col("_old.o_totalprice").cast(DEC), F.lit(0).cast(DEC)
                )
            ).alias("dt"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("dn").alias("dn"), F.sum("dt").alias("dt"))
    )
    return base.join(delta, "o_orderpriority", "left").select(
        "o_orderpriority",
        (F.col("n0") + F.coalesce(F.col("dn"), F.lit(0))).cast("bigint").alias(
            "n_rows"
        ),
        _dec_to_double(
            F.col("t0") + F.coalesce(F.col("dt"), F.lit(0).cast(DEC))
        ).alias("total_price"),
    )


def _orders_snap_cas(spark: SparkSession, sf_dir: str) -> str:
    """orders as a snapshot table committed by TWO RACING WRITERS
    under the optimistic-CAS merge protocol: writer A pins v1 as its
    base and writes its merged files; before A's first publish
    attempt, writer B commits v2 (the deterministic seam — same
    conflict the threaded race produces, minus the timing
    dependence); A's CAS for v2 loses, it rebases over B's
    disjoint-partition commit without rewriting data, and lands v3.
    Both edits survive; history is the serial order B-then-A. Built
    once per (sf_dir, fingerprint)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_merge_concurrent,
        snap_versions,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_cas_orders_")
        orders = table(spark, sf_dir, "orders")
        snap_init(
            spark, orders, out, "o_orderpriority",
            sort_by=("o_orderkey",), target_rows_per_file=20_000,
        )
        upd_b = orders.filter(
            (F.col("o_orderpriority") == "2-HIGH")
            & (F.col("o_orderkey") % 13 == 1)
        ).withColumn("o_totalprice", F.col("o_totalprice") + 50.0)
        upd_a = (
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderkey") % 13 == 1)
                & (F.col("o_orderkey") % 29 != 2)
            )
            .withColumn("o_totalprice", F.col("o_totalprice") + 25.0)
            .withColumn("_delete", F.lit(False))
            .unionByName(
                orders.filter(
                    (F.col("o_orderpriority") == "1-URGENT")
                    & (F.col("o_orderkey") % 29 == 2)
                ).withColumn("_delete", F.lit(True))
            )
        )

        def commit_b() -> None:
            snap_merge_concurrent(
                spark, out, upd_b, key_cols=("o_orderkey",),
                sort_by=("o_orderkey",), writer_id="b",
            )

        v = snap_merge_concurrent(
            spark, out, upd_a, key_cols=("o_orderkey",),
            delete_col="_delete", sort_by=("o_orderkey",),
            writer_id="a", _before_publish=commit_b,
        )
        assert v == 3 and snap_versions(out) == [1, 2, 3]
        return out

    return materialize_once(
        ("lake_cas_orders", sf_dir, table_fingerprint(sf_dir, "orders")), build
    )


@register(
    "q_lake_concurrent_merge",
    oracle=f"""
    WITH v2 AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '2-HIGH' AND o_orderkey % 13 = 1
                    THEN o_totalprice + 50.0 ELSE o_totalprice END AS o_totalprice
        FROM orders
    ), v3 AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 13 = 1
                         AND o_orderkey % 29 <> 2
                    THEN o_totalprice + 25.0 ELSE o_totalprice END AS o_totalprice
        FROM v2
        WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 29 = 2)
    )
    SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price, MAX(o_orderkey) AS max_key
    FROM orders
    UNION ALL
    SELECT CAST(2 AS BIGINT), COUNT(*), {sql_dsum('o_totalprice')}, MAX(o_orderkey)
    FROM v2
    UNION ALL
    SELECT CAST(3 AS BIGINT), COUNT(*), {sql_dsum('o_totalprice')}, MAX(o_orderkey)
    FROM v3
    """,
    tags=("sink", "layout", "scale", "lakesnap", "concurrency"),
)
def q_lake_concurrent_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-WRITER optimistic concurrency on the snapshot lake
    (lakesnap.snap_merge_concurrent — the Delta/Iceberg commit
    protocol): two writers merge concurrently, the loser of the
    manifest CAS rebases over the winner's disjoint-partition commit
    WITHOUT rewriting data, and every version in the resulting
    history must equal its serial-execution restatement — which is
    exactly what the oracle computes (v1 = pristine, v2 = writer B
    applied, v3 = B then A, exact decimal sums). The conflict is
    injected deterministically (the same interleaving the threaded
    race test exercises nondeterministically) so the hash is stable.
    At 100 TB this is the protocol that lets N pipelines commit to
    one table: contention cost is manifest-sized (a JSON CAS +
    rebase), never data-sized, unless partitions genuinely overlap —
    in which case first-committer-wins forces a re-merge of only the
    overlapped partitions' files."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_cas(spark, sf_dir)
    outs = []
    for v in (1, 2, 3):
        outs.append(
            snap_read(spark, path, v).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                dsum("o_totalprice").alias("total_price"),
                F.max("o_orderkey").alias("max_key"),
            ).select(F.lit(v).cast("bigint").alias("version"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _lineitem_zsnap(spark: SparkSession, sf_dir: str) -> str:
    """lineitem as a Z-ORDERED snapshot table: v1 = the table clustered
    on the (l_partkey, l_suppkey) Morton grid (the grid rides in the
    manifest), v2 = a deterministic in-box quantity correction merged
    through the grid-derived zb. Built once per (sf_dir, fingerprint)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init_zorder,
        snap_merge,
        snap_zvalue,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_zsnap_li_")
        li = table(spark, sf_dir, "lineitem")
        snap_init_zorder(
            spark, li, out, "l_partkey", "l_suppkey", bits=3,
            sort_by=("l_orderkey",), target_rows_per_file=20_000,
        )
        upd = li.filter(F.col("l_orderkey") % 19 == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 500.0
        )
        upd = upd.withColumn("zb", snap_zvalue(out))
        snap_merge(
            spark, out, upd, key_cols=("l_orderkey", "l_linenumber"),
            sort_by=("l_orderkey",), target_rows_per_file=20_000,
        )
        return out

    return materialize_once(
        ("lake_zsnap_li", sf_dir, table_fingerprint(sf_dir, "lineitem")), build
    )


@register(
    "q_lake_zorder_box",
    oracle=f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
               MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx
        FROM lineitem
    ), v2 AS (
        SELECT l_returnflag, l_partkey, l_suppkey, l_extendedprice, l_discount,
               CASE WHEN l_orderkey % 19 = 0 THEN l_quantity + 500.0
                    ELSE l_quantity END AS l_quantity
        FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM v2, b
    WHERE l_partkey BETWEEN pmn + (pmx - pmn) // 10 AND pmn + (pmx - pmn) // 4
      AND l_suppkey BETWEEN smn AND smn + (smx - smn) // 5
    GROUP BY l_returnflag
    """,
    tags=("sink", "layout", "scale", "lakesnap", "zorder"),
)
def q_lake_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER AS A LAKE LAYOUT: the snapshot table's partition key is
    the Morton bucket of (l_partkey, l_suppkey) and the fitted grid
    rides in the manifest, so a 2-D box read enumerates its covered
    buckets driver-side and prunes FILES from the manifest alone — no
    directory listing, no footer reads (snap_box_files pins the
    skipped-file count in tests/test_lakesnap.py). The box aggregate
    runs against v2 — AFTER a merge whose update rows derived their
    buckets from the stored grid — so the hash also proves the grid
    survives commits and updates land in the right cells. The exact
    per-row predicate is re-applied post-pruning: layout changes bytes
    read, never results, which is why the oracle can restate the same
    box over the unclustered table. At 100 TB this is OPTIMIZE ZORDER
    + Iceberg metadata pruning for workloads that filter two
    dimensions at once (user x time, part x supplier)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        _snap_grid,
        snap_box_read,
    )

    path = _lineitem_zsnap(spark, sf_dir)
    g = _snap_grid(path)
    lo1 = g.min1 + (g.max1 - g.min1) // 10
    hi1 = g.min1 + (g.max1 - g.min1) // 4
    lo2, hi2 = g.min2, g.min2 + (g.max2 - g.min2) // 5
    return (
        snap_box_read(spark, path, lo1, hi1, lo2, hi2)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


def _orders_snap_evolved(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot table whose v2 merge ADDS a column (deterministic
    audit cents for updated keys) — the snapshot lake's additive schema
    evolution, built once per (sf_dir, fingerprint)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_merge,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_evo_orders_")
        orders = table(spark, sf_dir, "orders")
        snap_init(
            spark, orders, out, "o_orderpriority",
            sort_by=("o_orderkey",), target_rows_per_file=20_000,
        )
        upd = (
            orders.filter(F.col("o_orderkey") % 9 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
            .withColumn(
                "audit_cents",
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
            )
        )
        snap_merge(
            spark, out, upd, key_cols=("o_orderkey",),
            sort_by=("o_orderkey",), target_rows_per_file=20_000,
        )
        return out

    return materialize_once(
        ("lake_evo_orders", sf_dir, table_fingerprint(sf_dir, "orders")), build
    )


@register(
    "q_lake_schema_evolution",
    oracle=f"""
    WITH v2 AS (
        SELECT o_orderpriority,
               CASE WHEN o_orderkey % 9 = 1 THEN o_totalprice + 2.0
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderkey % 9 = 1
                    THEN CAST(ROUND((o_totalprice + 2.0) * 100) AS BIGINT)
               END AS audit_cents
        FROM orders
    )
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(COUNT(audit_cents) AS BIGINT) AS n_evolved,
           CAST(SUM(audit_cents) AS BIGINT) AS cents_evolved,
           {sql_dsum('o_totalprice')} AS total_price
    FROM v2 GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "scale", "lakesnap", "schema-evolution"),
)
def q_lake_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE SCHEMA EVOLUTION through a snapshot-lake MERGE (the
    Delta/Iceberg evolve-on-write default): the v2 update batch carries
    a NEW audit_cents column; untouched partitions' v1 files are
    carried forward UNREWRITTEN, yet the latest read surfaces the
    union schema with exact NULL back-fill for every pre-evolution row
    (the manifest records the evolved column order; reads union
    commits by name with missing columns allowed). The aggregate
    hash-proves three things at once: the back-fill is exact
    (n_evolved counts only updated rows), the new column's values are
    right (cents_evolved), and the old columns survived evolution
    (exact decimal total_price). q_source_evolved is the mergeSchema
    semantics contract for raw parquet dirs; this is the same contract
    on the versioned lake, where the manifest — not a footer-sampling
    job — carries the schema. Additive-only by design: a merge missing
    a base column is refused (tests/test_lakesnap.py)."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_evolved(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("audit_cents").cast("bigint").alias("n_evolved"),
        F.sum("audit_cents").alias("cents_evolved"),
        dsum("o_totalprice").alias("total_price"),
    )


_Z3_CACHE: dict[tuple, tuple[str, object]] = {}


def _zordered3_lineitem(spark: SparkSession, sf_dir: str):
    """lineitem clustered once per session on the 3-D
    (l_partkey, l_suppkey, l_quantity) Morton grid via
    write_clustered(layout='zorder') — bits=2, 64 buckets, the same
    partition budget as the 2-D default. Keyed on (sf_dir, table
    fingerprint) like the sibling caches, so a regenerated dataset
    never serves stale clustered data."""
    from docker_based_real_time_etl_project_spark.lakewrite import write_clustered
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        table_fingerprint,
    )

    key = (sf_dir, table_fingerprint(sf_dir, "lineitem"))
    if key not in _Z3_CACHE:
        li = table(spark, sf_dir, "lineitem").withColumn(
            "l_qty_i", F.col("l_quantity").cast("bigint")
        )
        out = tempfile.mkdtemp(prefix="lineitem_z3_")
        grid = write_clustered(
            li, out, layout="zorder",
            zorder_by=("l_partkey", "l_suppkey", "l_qty_i"), zorder_bits=2,
        )
        _Z3_CACHE[key] = (out, grid)
    out, grid = _Z3_CACHE[key]
    return spark.read.parquet(out), grid


@register(
    "q_zorder3_pruned_scan",
    oracle=f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
               MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx,
               MIN(CAST(l_quantity AS BIGINT)) AS qmn,
               MAX(CAST(l_quantity AS BIGINT)) AS qmx
        FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem, b
    WHERE l_partkey BETWEEN pmn + (pmx - pmn) // 10 AND pmn + (pmx - pmn) // 4
      AND l_suppkey BETWEEN smn AND smn + (smx - smn) // 5
      AND CAST(l_quantity AS BIGINT) BETWEEN qmn AND qmn + (qmx - qmn) // 2
    GROUP BY l_returnflag
    """,
    tags=("source", "layout", "scale", "zorder"),
)
def q_zorder3_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-dimensional z-order box scan (Delta's OPTIMIZE ZORDER BY
    takes N columns; round 7's operator was 2-D): lineitem clustered on
    the (partkey, suppkey, quantity) Morton grid, a conjunctive 3-D box
    pruned to its covered buckets by driver-side grid arithmetic, the
    exact predicates re-applied so the oracle runs the SAME box on the
    unclustered table. Box bounds derive from the table's own min/max
    with identical integer arithmetic on both sides
    (scale-factor-agnostic). With bits=2 the grid is 64 buckets — same
    partition budget as 2-D bits=3 — trading per-dimension resolution
    for an extra pruned dimension, which is exactly the knob a table
    owner turns when workloads filter three keys at once."""
    from docker_based_real_time_etl_project_spark.operators.zorder import (
        zorder_box_scan_n,
    )

    zdf, grid = _zordered3_lineitem(spark, sf_dir)
    bounds = [
        (grid.los[0] + (grid.his[0] - grid.los[0]) // 10,
         grid.los[0] + (grid.his[0] - grid.los[0]) // 4),
        (grid.los[1], grid.los[1] + (grid.his[1] - grid.los[1]) // 5),
        (grid.los[2], grid.los[2] + (grid.his[2] - grid.los[2]) // 2),
    ]
    return (
        zorder_box_scan_n(zdf, grid, bounds)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
    )


def _orders_snap_bloom(spark: SparkSession, sf_dir: str) -> str:
    """orders as a BLOOM-INDEXED snapshot table: same two versions as
    _orders_snap (pristine + the deterministic merge batch), but with
    the per-file bloom index on o_orderkey, so point lookups exercise
    sidecars from BOTH commit generations. Small files on purpose —
    the skipping contract needs a multi-file table to be observable."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_merge,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_bloom_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=5_000,
            bloom_col="o_orderkey",
            bloom_bits=131072,
        )
        snap_merge(
            spark,
            out,
            _merge_updates(spark, sf_dir),
            key_cols=("o_orderkey",),
            delete_col="_delete",
            sort_by=("o_orderkey",),
            target_rows_per_file=5_000,
        )
        return out

    return materialize_once(
        ("lake_snap_orders_bloom", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


_POINT_KEYS = (0, 5, 7, 97, 194, 1999999999, 2000000003)


@register(
    "q_lake_point_lookup",
    oracle=f"""
    WITH {_SNAP_MERGED_CTE}
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM merged
    WHERE o_orderkey IN {_POINT_KEYS}
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT LOOKUP via the PER-FILE BLOOM INDEX (lakesnap sidecars —
    the Delta bloom-filter-index / Iceberg value-skipping shape): the
    probed keys' xxhash64 is tested against each manifest file's
    bitmap, only might-contain files are opened, and the exact IN
    predicate re-applies on the survivors — so the index changes bytes
    read, never results. The key set walks every merge fate: 0/97/194
    were upserted (+1000 price), 5 was deleted (absent), 2000000003
    was re-inserted, 1999999999 never existed, 7 rode untouched. A
    uniformly-spread key defeats min/max stats (every file's range
    covers it) but not membership bitmaps — at 100 TB this is the
    difference between opening ~4 files and scanning a partition.
    Pruning contract pinned in tests/test_lakesnap.py; build is
    distributed (per-file OR-folds tree-reduced, operators/bloom.py).
    Reference parity: the reference serves point reads from row stores
    (init-db.sql:3-49); this is the same primitive lake-side."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_point_read

    path = _orders_snap_bloom(spark, sf_dir)
    return snap_point_read(spark, path, list(_POINT_KEYS)).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )


_DELETE_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0"


def _orders_snap_del(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot with a DELETE WHERE commit on top: v1 pristine,
    v2 = urgent orders above the price threshold removed — only the
    1-URGENT partition is rewritten, the other four ride the manifest."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_delete_where,
        snap_init,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_del_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v = snap_delete_where(spark, out, _DELETE_PRED, sort_by=("o_orderkey",))
        assert v == 2
        return out

    return materialize_once(
        ("lake_snap_orders_del", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_delete_where",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE NOT ({_DELETE_PRED})
    GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL DELETE on the snapshot lake (DELETE WHERE as a CoW
    commit — the DML verb that completes MERGE/upsert + tombstones):
    urgent orders above a price threshold are deleted; ONLY the
    1-URGENT partition is rewritten (the touched-partition discovery
    is a predicate-pushed scan of the partition column), the other
    partitions' manifest rows carry forward with zero data I/O, and
    v1 remains exactly readable (time travel) until vacuumed. The
    aggregate over the post-delete state hash-matches the oracle's
    relational restatement (WHERE NOT pred). ANSI NULL semantics
    (predicate-NULL rows are KEPT, not dropped) pinned in
    tests/test_lakesnap.py."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_del(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderkey").alias("max_key"),
    )


_UPDATE_PRED = "o_orderpriority = '2-HIGH' AND o_totalprice < 50000.0"


def _orders_snap_upd(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot with an UPDATE WHERE commit on top: cheap
    2-HIGH orders get a +500.00 price adjustment — only that partition
    is rewritten."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_update_where,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_upd_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v = snap_update_where(
            spark, out, _UPDATE_PRED,
            {"o_totalprice": "o_totalprice + 500.0"},
            sort_by=("o_orderkey",),
        )
        assert v == 2
        return out

    return materialize_once(
        ("lake_snap_orders_upd", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_update_where",
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN {_UPDATE_PRED} THEN o_totalprice + 500.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM u GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL UPDATE on the snapshot lake (UPDATE ... SET ... WHERE
    as a CoW commit — the last DML verb after MERGE and DELETE): cheap
    2-HIGH orders get a price adjustment; ONLY that partition is
    rewritten (predicate-pushed touched-partition discovery), every
    other partition's manifest rows carry forward with zero data I/O,
    and v1 stays readable. SET expressions evaluate against the OLD
    row (ANSI UPDATE; the swap-assignment pin lives in
    tests/test_lakesnap.py), predicate-NULL rows are untouched. The
    aggregate over the post-update state hash-matches the oracle's
    CASE restatement."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_upd(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderkey").alias("max_key"),
    )


_MOR_PRED2 = "o_orderpriority = '3-MEDIUM' AND o_orderkey % 7 = 0"


def _orders_snap_mor_del(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot with TWO merge-on-read DELETE commits on top:
    v2 deletes expensive urgent orders, v3 deletes every 7th medium
    order — both as DELETE FILES (Iceberg v2 equality-delete shape),
    with every data entry carried verbatim. The build asserts the MoR
    I/O contract: zero data files rewritten, bytes written bounded by
    the deleted rows, far below the partitions a CoW delete would
    rewrite."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        _read_manifest,
        snap_delete_where,
        snap_init,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_mor_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v2 = snap_delete_where(
            spark, out, _DELETE_PRED, sort_by=("o_orderkey",), mode="mor"
        )
        v3 = snap_delete_where(
            spark, out, _MOR_PRED2, sort_by=("o_orderkey",), mode="mor"
        )
        assert (v2, v3) == (2, 3)
        m1, m3 = _read_manifest(out, 1), _read_manifest(out, 3)
        # the MoR contract: data entries carried VERBATIM, and the
        # write I/O is the delete files alone — O(deleted rows)
        assert m3["entries"] == m1["entries"]
        del_bytes = sum(
            os.path.getsize(os.path.join(out, d["path"]))
            for d in m3["delete_entries"]
        )
        touched_bytes = sum(
            os.path.getsize(os.path.join(out, e["path"]))
            for e in m1["entries"]
            if e["partition"] in ("1-URGENT", "3-MEDIUM")
        )
        # at smoke scale parquet footer overhead dominates file size, so
        # the ratio is only meaningful once the partitions carry real data
        if touched_bytes > 256_000:
            assert del_bytes < touched_bytes / 2, (del_bytes, touched_bytes)
        return out

    return materialize_once(
        ("lake_snap_orders_mor", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_mor_delete",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE NOT ({_DELETE_PRED}) AND NOT ({_MOR_PRED2})
    GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ row-level delete (Iceberg v2 equality-delete files
    / Delta deletion vectors — the read-side half of the DML trade the
    CoW twin q_lake_delete_where pays at write time): two DELETE WHERE
    commits land as per-partition delete files with ZERO data files
    rewritten (pinned in the fixture: bytes written O(deleted rows),
    data entries carried verbatim), and the read anti-joins the delete
    files against only the partitions it scans — broadcast when small.
    The aggregate over the post-delete state hash-matches the same
    relational restatement the CoW twin matches, so both DML modes are
    held to the identical final state. Promotion back to plain files is
    snap_compact_partitions (tests/test_lakesnap.py pins promotion,
    time travel, bloom point reads, vacuum liveness, and the
    insert-after-delete ordering invariant through delete files)."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_mor_del(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderkey").alias("max_key"),
    )


def _orders_snap_restored(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot: v1 pristine -> v2 merge batch -> v3 RESTORE to
    v1. Latest must read exactly like the pristine table again."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_merge,
        snap_restore,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_rst_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        snap_merge(
            spark,
            out,
            _merge_updates(spark, sf_dir),
            key_cols=("o_orderkey",),
            delete_col="_delete",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v = snap_restore(spark, out, 1)
        assert v == 3
        return out

    return materialize_once(
        ("lake_snap_orders_rst", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_restore",
    oracle=f"""
    WITH {_SNAP_MERGED_CTE}
    SELECT CAST(2 AS BIGINT) AS version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price, MAX(o_orderkey) AS max_key
    FROM merged
    UNION ALL
    SELECT CAST(3 AS BIGINT), COUNT(*), {sql_dsum('o_totalprice')},
           MAX(o_orderkey)
    FROM orders
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TO VERSION as a driver-visible contract: after a merge
    (v2) the table is restored to v1 — v3's aggregate must equal the
    PRISTINE table exactly (the oracle recomputes it from the original
    parquet) while v2 stays readable and equals the merged
    restatement. The restore itself is one manifest CAS referencing
    v1's files — zero data moved at any table size (file-set identity
    pinned in tests/test_lakesnap.py)."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_restored(spark, sf_dir)
    outs = []
    for v in (2, 3):
        outs.append(
            snap_read(spark, path, v).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                dsum("o_totalprice").alias("total_price"),
                F.max("o_orderkey").alias("max_key"),
            ).select(F.lit(v).cast("bigint").alias("version"), "*")
        )
    return outs[0].unionByName(outs[1])


def _orders_snap_mor_upd(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot with a merge-on-read UPDATE commit on top (the
    Hudi upsert shape): v2 lands the matched rows' old images as
    delete files and their new images as seq-stamped data files —
    every base entry carried verbatim, no partition rewritten."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        _read_manifest,
        snap_init,
        snap_update_where,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_morupd_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v = snap_update_where(
            spark, out, _UPDATE_PRED,
            {"o_totalprice": "o_totalprice + 500.0"},
            sort_by=("o_orderkey",), mode="mor",
        )
        assert v == 2
        m1, m2 = _read_manifest(out, 1), _read_manifest(out, 2)
        assert all(e in m2["entries"] for e in m1["entries"])
        assert m2["delete_entries"]
        return out

    return materialize_once(
        ("lake_snap_orders_morupd", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_mor_update",
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN {_UPDATE_PRED} THEN o_totalprice + 500.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM u GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "scale", "lakesnap"),
)
def q_lake_mor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ row-level UPDATE (Hudi upsert / Iceberg v2
    sequence-ordered equality deletes): the same UPDATE the CoW twin
    q_lake_update_where applies by rewriting the touched partition
    lands here as old-image DELETE FILES plus new-image data files
    stamped with the commit's SEQUENCE NUMBER — write I/O O(matched
    rows), zero partitions rewritten, and the seq exempts the new
    images from the same commit's deletes (an identity update would
    otherwise cancel its own output; pinned in tests/test_lakesnap.py
    along with delete-after-update ordering and clone seq_floor).
    Readers merge the debris exactly as for MoR deletes; the aggregate
    over the post-update state hash-matches the identical CASE
    restatement the CoW twin matches, holding both DML modes to the
    same final state."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_mor_upd(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderkey").alias("max_key"),
    )


def _orders_snap_mor_merge(spark: SparkSession, sf_dir: str) -> str:
    """orders snapshot with the standard deterministic merge batch
    applied as a MERGE-ON-READ commit (snap_merge(mode='mor')): old
    images of the batch's keys -> delete files, its non-tombstone rows
    -> seq-stamped data files, every base entry carried verbatim —
    per-batch write cost tracks the changelog (the CDC-apply shape)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        _read_manifest,
        snap_init,
        snap_merge,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        out = tempfile.mkdtemp(prefix="lake_snap_orders_mormrg_")
        snap_init(
            spark,
            table(spark, sf_dir, "orders"),
            out,
            "o_orderpriority",
            sort_by=("o_orderkey",),
            target_rows_per_file=20_000,
        )
        v = snap_merge(
            spark,
            out,
            _merge_updates(spark, sf_dir),
            key_cols=("o_orderkey",),
            delete_col="_delete",
            sort_by=("o_orderkey",),
            mode="mor",
        )
        assert v == 2
        m1, m2 = _read_manifest(out, 1), _read_manifest(out, 2)
        assert all(e in m2["entries"] for e in m1["entries"])
        assert m2["delete_entries"]
        return out

    return materialize_once(
        ("lake_snap_orders_mormrg", sf_dir, table_fingerprint(sf_dir, "orders")),
        build,
    )


@register(
    "q_lake_mor_merge",
    oracle=f"""
    WITH upd AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice,
               FALSE AS del
        FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 <> 5
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice, TRUE
        FROM orders WHERE o_orderkey % 103 = 5
        UNION ALL
        SELECT o_orderkey + 2000000000, o_orderpriority, o_totalprice, FALSE
        FROM orders WHERE o_orderkey % 101 = 3
    ), merged AS (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM upd WHERE NOT del
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           COUNT(*) FILTER (WHERE o_orderkey >= 2000000000) AS n_inserted
    FROM merged
    GROUP BY o_orderpriority
    """,
    tags=("sink", "layout", "cdc", "scale", "lakesnap"),
)
def q_lake_mor_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE as a MERGE-ON-READ commit (Hudi MoR upsert / Iceberg v2
    sequence-ordered equality deletes) — the exact batch q_lake_merge
    applies copy-on-write lands here as old-image delete files plus
    seq-stamped new images with every base entry carried verbatim:
    write I/O O(matched + incoming), zero partitions rewritten. This
    is the CDC-apply shape at scale — a minute of changelog costs a
    minute of changelog, not the width of the partitions it grazes;
    snap_compact promotes the debris on maintenance cadence (pinned in
    tests/test_lakesnap.py along with the CoW-equality, tombstone /
    insert / upsert fates, and additive evolution through MoR). The
    aggregate over the post-merge state hash-matches the identical
    relational restatement the CoW twin matches."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    path = _orders_snap_mor_merge(spark, sf_dir)
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum((F.col("o_orderkey") >= 2_000_000_000).cast("bigint")).alias(
            "n_inserted"
        ),
    )


def _sync_lake(spark: SparkSession, sf_dir: str) -> str:
    """Orders snapshot lake whose v2 diverged from the base table by a
    LOCALIZED change (UPDATE WHERE on one priority partition), then
    was synced back to the base table with snap_sync — the diff-pruned
    three-armed MERGE. Built once per (sf_dir, fingerprint)."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        snap_init,
        snap_sync,
        snap_update_where,
    )
    from docker_based_real_time_etl_project_spark.queries.materialize import (
        materialize_once,
        table_fingerprint,
    )

    def build() -> str:
        import tempfile

        lake = tempfile.mkdtemp(prefix="sync_lake_")
        src = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
        )
        snap_init(spark, src, lake, "o_orderpriority", sort_by=("o_orderkey",))
        assert snap_update_where(
            spark, lake, "o_orderpriority = '1-URGENT'",
            {"o_totalprice": "o_totalprice + 1000.0"},
            sort_by=("o_orderkey",),
        ) == 2
        assert snap_sync(
            spark, lake, src, key_cols=("o_orderkey",), sort_by=("o_orderkey",)
        ) == 3
        # already-synced: the verb must publish NOTHING
        assert snap_sync(
            spark, lake, src, key_cols=("o_orderkey",), sort_by=("o_orderkey",)
        ) is None
        return lake

    return materialize_once(
        ("sync_lake", sf_dir, table_fingerprint(sf_dir, "orders")), build
    )


@register(
    "q_lake_sync",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           {sql_dsum("o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("lakesnap", "dml", "scale"),
)
def q_lake_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNC-TO-SOURCE as a lake verb (Delta's WHEN NOT MATCHED BY
    SOURCE arm completing the MERGE matrix): the table drifted from
    its source by an UPDATE WHERE on one partition; ``snap_sync``
    publishes ONE commit that makes the table equal the source again —
    updates for changed keys, inserts for missing ones, tombstones for
    keys the source no longer has — and the diff is computed with a
    null-safe full-row anti-join, so only partitions actually holding
    a difference are rewritten (the four un-drifted priority
    partitions carry their manifest rows verbatim; pinned in
    tests/test_lakesnap.py along with the None-on-already-synced
    idempotence contract). The final read must aggregate exactly to
    the base table; drift surviving the sync, a resurrected tombstone,
    or an over-eager rewrite all hash-fail."""
    from docker_based_real_time_etl_project_spark.lakesnap import snap_read

    lake = _sync_lake(spark, sf_dir)
    return (
        snap_read(spark, lake)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            dsum("o_totalprice").alias("total_price"),
        )
    )
