"""The reference's five ETL flows, end-to-end (etl.py:207-240), on the
rest_poll data source: fetch -> JSON decode with declared payload
schema -> T1-T7 transforms -> reference table shape (init-db.sql:3-49).

Each flow is `payload rows for its endpoint` -> one typed DataFrame;
:func:`poll_cycle` runs all five (the loop body the reference executes
every 60 s). Streaming: the same functions apply unchanged to
``spark.readStream.format("rest_poll")`` because they are pure
DataFrame transformations; pair with ``trigger(processingTime="60
seconds")`` and a sink from ``sinks.py`` for the full pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docker_based_real_time_etl_project_spark import schemas
from docker_based_real_time_etl_project_spark.operators import transforms as tr
from docker_based_real_time_etl_project_spark.sources.rest import register_rest_source


def poll_batch(
    spark: SparkSession, symbols: str = "BTCUSDT", poll_id: int = 0
) -> DataFrame:
    """One poll cycle's raw rows: (endpoint, symbol, poll_id, payload)."""
    register_rest_source(spark)
    return (
        spark.read.format("rest_poll")
        .option("symbols", symbols)
        .option("poll_id", str(poll_id))
        .load()
    )


def _payloads(raw: DataFrame, endpoint: str, schema) -> DataFrame:
    """Rows for one endpoint with the payload parsed under its declared
    schema (dict payloads -> one row; list payloads -> exploded rows,
    the T8 list-vs-scalar normalization)."""
    rows = raw.filter(F.col("endpoint") == endpoint)
    parsed = rows.withColumn("_p", F.from_json("payload", schema))
    return parsed


def flow_latest_prices(raw: DataFrame) -> DataFrame:
    """Flow 1 (etl.py:114-121): symbol + price, price cast to double."""
    p = _payloads(raw, "price", schemas.PRICE_PAYLOAD_SCHEMA)
    return tr.transform_latest_price(p.select("_p.symbol", "_p.price"))


def flow_order_book(raw: DataFrame, depth: int = 5) -> DataFrame:
    """Flow 2 (etl.py:123-134): top-N depth levels, bid/ask paired by
    level. The symbol rides along as a column (the reference loops one
    symbol at a time; a column keeps the flow fully distributed for
    N-symbol polls -- no driver-side loop)."""
    p = _payloads(raw, "depth", schemas.DEPTH_PAYLOAD_SCHEMA)
    sliced = p.select(
        "symbol",
        F.slice("_p.bids", 1, depth).alias("bids"),
        F.slice("_p.asks", 1, depth).alias("asks"),
    )
    paired = tr.zip_positional(sliced, "bids", "asks")
    return paired.select(
        "symbol",
        F.col("bid")[0].cast("double").alias("bid_price"),
        F.col("bid")[1].cast("double").alias("bid_quantity"),
        F.col("ask")[0].cast("double").alias("ask_price"),
        F.col("ask")[1].cast("double").alias("ask_quantity"),
    )


def flow_recent_trades(raw: DataFrame, limit: int = 50) -> DataFrame:
    """Flow 3 (etl.py:136-143): first-N trades, renamed + cast."""
    p = _payloads(raw, "trades", T.ArrayType(schemas.TRADE_PAYLOAD_SCHEMA))
    sym = p.select("symbol", F.posexplode("_p").alias("_i", "_t")).filter(
        F.col("_i") < limit
    )
    flat = sym.select("_t.price", "_t.qty", "_t.time", "_t.isBuyerMaker", "symbol")
    out = tr.rename(
        flat, {"qty": "quantity", "time": "trade_time", "isBuyerMaker": "is_buyer_maker"}
    )
    out = tr.cast_columns(out, {"price": "double", "quantity": "double"})
    return out.select("symbol", "price", "quantity", "trade_time", "is_buyer_maker")


def flow_klines(raw: DataFrame) -> DataFrame:
    """Flow 4 (etl.py:145-158): 12-slot positional kline arrays -> 8
    typed columns, symbol riding along as a column (no driver loop)."""
    p = _payloads(raw, "klines", T.ArrayType(schemas.KLINE_PAYLOAD_SCHEMA))
    rows = p.select("symbol", F.explode("_p").alias("kline"))
    out = tr.unpack_positional(
        rows,
        "kline",
        tr.KLINE_FIELDS,
        casts={
            "open_time": "bigint",
            "open_price": "double",
            "high_price": "double",
            "low_price": "double",
            "close_price": "double",
            "volume": "double",
            "close_time": "bigint",
        },
    )
    return out.select(
        "symbol", "open_time", "open_price", "high_price", "low_price",
        "close_price", "volume", "close_time",
    )


def flow_ticker_24hr(raw: DataFrame) -> DataFrame:
    """Flow 5 (etl.py:160-179): camelCase ticker -> snake_case typed."""
    p = _payloads(raw, "ticker24h", schemas.TICKER_PAYLOAD_SCHEMA)
    return tr.transform_ticker(p.select("_p.*"))


FLOWS = {
    "latest_prices": flow_latest_prices,
    "order_book": flow_order_book,
    "recent_trades": flow_recent_trades,
    "klines": flow_klines,
    "ticker_24hr": flow_ticker_24hr,
}


def poll_cycle(
    spark: SparkSession, symbols: str = "BTCUSDT", poll_id: int = 0
) -> dict[str, DataFrame]:
    """The reference's full loop body: all five flows from one poll."""
    raw = poll_batch(spark, symbols, poll_id)
    return {name: fn(raw) for name, fn in FLOWS.items()}
