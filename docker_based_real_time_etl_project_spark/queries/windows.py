"""Window-function and time-series surface: rank/lag/moving frames,
tumbling OHLCV (A1), trailing ticker stats (A2), latest-per-key (A4).
(SURVEY.md 2.3 + 2.4 'Window functions' row.)

These are the operators the reference only ever *ingested*
pre-computed from the exchange API; here they are computed natively
from raw rows, with deterministic orderings (unique tiebreaks
verified against the testdata: no (event_type, ts) or (user_id, ts)
duplicates at any SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.aggregates import latest_per_key, ticker_stats, top_k_per_group, tumbling_ohlcv
from docker_based_real_time_etl_project_spark.queries.registry import DEC, davg, dsum, register, sql_davg, sql_dsum, table


_WIN_RANK_ORACLE = """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """


@register("q_win_rank", oracle=_WIN_RANK_ORACLE, tags=("window",))
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 shape: top-3 orders per customer by value (order-book depth
    semantics generalized). One shuffle on the partition key."""
    o = table(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


@register(
    "q_win_lag",
    oracle="""
    SELECT user_id, event_id, value,
           value - LAG(value) OVER w AS value_change,
           ROUND((value - LAG(value) OVER w) / NULLIF(LAG(value) OVER w, 0) * 100, 4)
             AS value_change_pct
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2's price_change/price_change_percent semantics via LAG: per-user
    event-over-event delta. Per-row double arithmetic -- deterministic."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - prev).alias("value_change"),
        F.round(
            (F.col("value") - prev) / F.nullif(prev, F.lit(0)) * 100, 4
        ).alias("value_change_pct"),
    )


@register(
    "q_win_moving",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(25,10)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_in_frame
    FROM events
    """,
    tags=("window",),
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 5-row frame per user (running volume shape). The frame sum
    is decimal-exact so the sliding accumulation is order-stable."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@register(
    "q_ohlcv_1h",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS open_time,
           MIN_BY(value, ts) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX_BY(value, ts) AS close_value,
           {sql_dsum('value')} AS volume,
           COUNT(*) AS n_trades
    FROM events
    GROUP BY event_type, 2
    """,
    tags=("timeseries", "flagship"),
)
def q_ohlcv_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the klines table computed natively -- 1 h tumbling OHLCV per
    event_type over the events stream table (reference ingests this
    pre-computed; init-db.sql:27-38, etl.py:228 interval='1h').

    min_by/max_by(value, ts) is deterministic here: (event_type, ts) is
    unique in the testdata. Single hash-agg shuffle of partials."""
    e = table(spark, sf_dir, "events")
    out = tumbling_ohlcv(
        e, ts_col="ts", key_cols=("event_type",), price_col="value", qty_col="value",
        window_duration="1 hour", exact_volume=True,
    )
    return out.select(
        "event_type",
        F.date_format("open_time", "yyyy-MM-dd HH:mm:ss").alias("open_time"),
        F.col("open_price").alias("open_value"),
        F.col("high_price").alias("high_value"),
        F.col("low_price").alias("low_value"),
        F.col("close_price").alias("close_value"),
        "volume",
        "n_trades",
    )


@register(
    "q_ticker_24h",
    oracle=f"""
    SELECT event_type,
           MAX_BY(value, ts) AS last_price,
           MIN_BY(value, ts) AS prev_close_price,
           MAX_BY(value, ts) - MIN_BY(value, ts) AS price_change,
           ROUND((MAX_BY(value, ts) - MIN_BY(value, ts)) / MIN_BY(value, ts) * 100, 4)
             AS price_change_percent,
           {sql_dsum('value * value')} / {sql_dsum('value')} AS weighted_avg_price,
           {sql_dsum('value')} AS volume
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
      AND ts >  TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 24 HOURS
    GROUP BY event_type
    """,
    tags=("timeseries",),
)
def q_ticker_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the ticker_24hr table computed natively -- trailing-24 h
    snapshot per key as of a fixed instant (init-db.sql:39-49). Filter
    prunes the scan; one hash aggregate; no per-key sort."""
    e = table(spark, sf_dir, "events")
    out = ticker_stats(
        e,
        ts_col="ts",
        key_cols=("event_type",),
        price_col="value",
        qty_col="value",
        as_of=F.lit("2024-01-15 00:00:00").cast("timestamp"),
    )
    # weighted_avg needs the decimal-exact form for hash parity
    bounded = e.filter(
        (F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
        & (
            F.col("ts")
            > F.lit("2024-01-15 00:00:00").cast("timestamp") - F.expr("INTERVAL 24 HOURS")
        )
    )
    last_p = F.max_by("value", "ts")
    prev_p = F.min_by("value", "ts")
    return bounded.groupBy("event_type").agg(
        last_p.alias("last_price"),
        prev_p.alias("prev_close_price"),
        (last_p - prev_p).alias("price_change"),
        F.round((last_p - prev_p) / prev_p * 100, 4).alias("price_change_percent"),
        (dsum(F.col("value") * F.col("value")) / dsum("value")).alias("weighted_avg_price"),
        dsum("value").alias("volume"),
    )


@register(
    "q_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    tags=("dedup", "timeseries"),
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: latest event per user -- the latest_prices/CDC-compaction
    semantics (most recent full row per key; init-db.sql:3-8)."""
    e = table(spark, sf_dir, "events")
    out = latest_per_key(
        e.select("user_id", "event_id", "event_type", "value", "ts"),
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    return out.select("user_id", "event_id", "event_type", "value")


@register(
    "q_date_trunc_extract",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
    tags=("datetime",),
)
def q_date_trunc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12/A1 bucketing: calendar extraction + truncation (UTC session
    timezone pins bucket edges; rendered as a string for cross-engine
    hash stability)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))


@register(
    "q_win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist/
    first_value/nth_value) over a total order with key tiebreak.
    percent_rank and cume_dist are exact rationals of row positions --
    cross-engine stable after one rounding."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS trailing_1h_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_in_hour
    FROM events
    """,
    tags=("window", "timeseries"),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-event trailing 1 h sum/count (the
    per-row continuous version of the sliding ticker, A2) -- RANGE
    frames bound by event-time interval, not row count, so ties and
    gaps are handled by time semantics. The frame sum accumulates
    integer cents: a range frame recomputes sub-sums in engine-chosen
    order, so float addition would drift cross-engine. Rows with equal
    (user_id, ts) get identical frames in both engines (RANGE treats
    peers as one group), so the output needs no unique tiebreak.
    The frame orders on unix_micros with a microsecond interval bound,
    matching the oracle's full-precision INTERVAL 1 HOUR exactly —
    ordering on whole seconds would misclassify pairs whose true gap
    straddles 3600 s by sub-second amounts."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return e.select(
        "user_id",
        "event_id",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("n_in_hour"),
    )
