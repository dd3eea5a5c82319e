"""Native aggregation operators (SURVEY.md section 2.3, A1-A4).

The reference *ingests* these pre-computed (klines = tumbling OHLCV,
ticker_24hr = sliding 24 h stats); this engine computes them from raw
rows. All built-ins -- hash aggregates with map-side partials, window
functions with a single shuffle on the partition key. Deterministic
variants (min_by/max_by on timestamp rather than first/last) so the
same code is oracle-checkable and stable under distributed row order.

Scale notes per operator in docstrings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_ohlcv(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("symbol",),
    price_col: str = "price",
    qty_col: str = "quantity",
    window_duration: str = "1 hour",
    exact_volume: bool = False,
) -> DataFrame:
    """A1: per key per tumbling window: open=first price by event time,
    high/low=max/min, close=last, volume=sum(qty) -- the klines table
    computed natively (fields init-db.sql:27-38, 1 h per etl.py:228).

    One shuffle on (key, window). ``min_by/max_by(price, ts)`` gives
    deterministic open/close even when rows arrive unordered across
    partitions -- `first()` would not. Partial aggregation happens
    map-side, so at 100 TB the shuffle carries one row per
    (key, window), not raw trades.
    """
    from docker_based_real_time_etl_project_spark.functions import dsum

    ts, price, qty = F.col(ts_col), F.col(price_col), F.col(qty_col)
    win = F.window(ts, window_duration)
    vol = dsum(qty) if exact_volume else F.sum(qty)
    return (
        df.groupBy(*key_cols, win.alias("w"))
        .agg(
            F.min_by(price, ts).alias("open_price"),
            F.max(price).alias("high_price"),
            F.min(price).alias("low_price"),
            F.max_by(price, ts).alias("close_price"),
            vol.alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("open_time"),
            F.col("w.end").alias("close_time"),
            "open_price", "high_price", "low_price", "close_price",
            "volume", "n_trades",
        )
    )


def ticker_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("symbol",),
    price_col: str = "price",
    qty_col: str = "quantity",
    as_of: Column | None = None,
    lookback: str = "INTERVAL 24 HOURS",
) -> DataFrame:
    """A2: trailing-window ticker snapshot per key: last_price,
    prev_close_price (earliest price in window ~ price 24 h ago),
    price_change, price_change_percent, weighted_avg_price =
    sum(p*q)/sum(q), volume (fields init-db.sql:39-49).

    Snapshot form: filter to the trailing window (pushed to the scan /
    partition-pruned on a date-partitioned layout), then one hash
    aggregate per key. No window function needed, so no per-key
    total sort -- this is the form that scales.
    """
    ts, price, qty = F.col(ts_col), F.col(price_col), F.col(qty_col)
    bounded = df if as_of is None else df.filter(
        (ts <= as_of) & (ts > as_of - F.expr(lookback))
    )
    last_p = F.max_by(price, ts)
    prev_p = F.min_by(price, ts)  # earliest surviving price = close ~24h ago
    return (
        bounded.groupBy(*key_cols)
        .agg(
            last_p.alias("last_price"),
            prev_p.alias("prev_close_price"),
            (last_p - prev_p).alias("price_change"),
            F.round((last_p - prev_p) / prev_p * 100, 4).alias("price_change_percent"),
            (F.sum(price * qty) / F.sum(qty)).alias("weighted_avg_price"),
            F.sum(qty).alias("volume"),
        )
    )


def rollup_bars(
    bars: DataFrame,
    key_cols: Sequence[str],
    window_duration: str,
    time_col: str = "open_time",
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: re-aggregate finer
    OHLCV bars into coarser buckets WITHOUT rescanning raw rows (the
    1m -> 1h -> 1d cascade; the reference ingests only the 1 h grain,
    etl.py klines interval='1h').

    Correctness hinges on bars existing only for non-empty buckets, so
    the earliest finer bar (by bucket start) contains the coarse open
    and the latest contains the coarse close -- ``min_by/max_by`` on
    ``open_time`` needs no raw timestamps. At 100 TB this is the whole
    point: each cascade level aggregates the level below (a table
    ~1000x smaller than raw), and partial aggregation keeps the shuffle
    at one row per (key, coarse bucket). Volume re-sums exactly (and
    order-independently) when the finer level kept DECIMAL partials --
    ``sum(decimal)`` stays decimal, so a cascade only casts to double
    at the final emit.
    """
    t = F.col(time_col)
    win = F.window(t, window_duration)
    vol = F.sum(F.col("volume"))
    return (
        bars.groupBy(*key_cols, win.alias("w"))
        .agg(
            F.min_by("open_price", t).alias("open_price"),
            F.max("high_price").alias("high_price"),
            F.min("low_price").alias("low_price"),
            F.max_by("close_price", t).alias("close_price"),
            vol.alias("volume"),
            F.sum("n_trades").alias("n_trades"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("open_time"),
            F.col("w.end").alias("close_time"),
            "open_price", "high_price", "low_price", "close_price",
            "volume", "n_trades",
        )
    )


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """A3: best-k rows per group (order-book depth semantics: top 5 bids by
    price desc per snapshot, etl.py:126-127).

    row_number over (partition, order) -- one shuffle on the partition
    key; with AQE, skewed partitions split. For enormous groups a
    pre-filter via approximate per-group quantile would bound the sort,
    but rank<=k over a window is optimal for the common case.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_order: Sequence[Column],
) -> DataFrame:
    """A4: most recent row per key (latest_prices semantics / CDC stream
    compaction to current state; init-db.sql:3-8, upsert-by-PK
    cassandra-init.cql:4).

    row_number()==1 with a total order (ts + tiebreaker) -- keeps the
    WHOLE latest row. When only aggregable columns are needed,
    prefer groupBy + max_by which skips the sort. Needs a unique
    tiebreaker in `ts_order` for determinism.
    """
    w = Window.partitionBy(*key_cols).orderBy(*ts_order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
