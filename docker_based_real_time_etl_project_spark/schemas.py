"""Declared schemas -- the engine never infers in production paths.

Two families:

1. The reference pipeline's five logical tables (reference
   ``init-db.sql:3-49``), re-declared as Spark StructTypes with the
   numeric policy of SURVEY.md section 7.3: ``double`` end-to-end by
   default (the reference's own ETL computes in float64 even though
   the DB declares DECIMAL(20,8)); DECIMAL parity available via
   ``decimal_parity=True``.

2. The driver testdata star schema (TESTDATA.md / FIXTURES.md), used
   to read parquet with explicit schemas.

Plus the Debezium CDC envelope (reference ``debezium-config.json``,
shape per SURVEY.md section 3.2) for the streaming decode operator.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference pipeline tables (init-db.sql:3-49). `id SERIAL` is omitted from
# the query surface (SURVEY.md 7.3-4): surrogate ids are a sink-edge concern.
# ---------------------------------------------------------------------------

def _num(decimal_parity: bool) -> T.DataType:
    return T.DecimalType(20, 8) if decimal_parity else T.DoubleType()


def latest_prices_schema(decimal_parity: bool = False) -> T.StructType:
    """latest_prices(symbol, price, timestamp) -- init-db.sql:3-8."""
    return T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price", _num(decimal_parity), True),
            T.StructField("timestamp", T.TimestampType(), True),
        ]
    )


def order_book_schema(decimal_parity: bool = False) -> T.StructType:
    """order_book(symbol, bid_price, bid_quantity, ask_price, ask_quantity,
    timestamp) -- init-db.sql:9-17. Row i = depth level i of both sides."""
    n = _num(decimal_parity)
    return T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("bid_price", n, True),
            T.StructField("bid_quantity", n, True),
            T.StructField("ask_price", n, True),
            T.StructField("ask_quantity", n, True),
            T.StructField("timestamp", T.TimestampType(), True),
        ]
    )


def recent_trades_schema(decimal_parity: bool = False) -> T.StructType:
    """recent_trades(symbol, price, quantity, trade_time epoch-ms,
    is_buyer_maker, timestamp) -- init-db.sql:18-26."""
    n = _num(decimal_parity)
    return T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price", n, True),
            T.StructField("quantity", n, True),
            T.StructField("trade_time", T.LongType(), True),
            T.StructField("is_buyer_maker", T.BooleanType(), True),
            T.StructField("timestamp", T.TimestampType(), True),
        ]
    )


def klines_schema(decimal_parity: bool = False) -> T.StructType:
    """klines(symbol, open_time, open/high/low/close_price, volume,
    close_time, timestamp) -- init-db.sql:27-38. 1h tumbling windows."""
    n = _num(decimal_parity)
    return T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("open_time", T.LongType(), True),
            T.StructField("open_price", n, True),
            T.StructField("high_price", n, True),
            T.StructField("low_price", n, True),
            T.StructField("close_price", n, True),
            T.StructField("volume", n, True),
            T.StructField("close_time", T.LongType(), True),
            T.StructField("timestamp", T.TimestampType(), True),
        ]
    )


def ticker_24hr_schema(decimal_parity: bool = False) -> T.StructType:
    """ticker_24hr(symbol, price_change, price_change_percent,
    weighted_avg_price, prev_close_price, last_price, volume, timestamp)
    -- init-db.sql:39-49. price_change_percent is DECIMAL(10,4) in the DB."""
    n = _num(decimal_parity)
    pct = T.DecimalType(10, 4) if decimal_parity else T.DoubleType()
    return T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price_change", n, True),
            T.StructField("price_change_percent", pct, True),
            T.StructField("weighted_avg_price", n, True),
            T.StructField("prev_close_price", n, True),
            T.StructField("last_price", n, True),
            T.StructField("volume", n, True),
            T.StructField("timestamp", T.TimestampType(), True),
        ]
    )


# ---------------------------------------------------------------------------
# Raw API payload schemas (inputs to the transform operators; shapes from
# what the reference's etl.py indexes -- FIXTURES.md section B).
# ---------------------------------------------------------------------------

PRICE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.StringType(), True),  # string numerics on the wire
    ]
)

# order book: bids/asks are arrays of [price, qty] string pairs (etl.py:126-133)
DEPTH_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("bids", T.ArrayType(T.ArrayType(T.StringType())), True),
        T.StructField("asks", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)

TRADE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("price", T.StringType(), True),
        T.StructField("qty", T.StringType(), True),
        T.StructField("time", T.LongType(), True),
        T.StructField("isBuyerMaker", T.BooleanType(), True),
    ]
)

# klines: 12-element positional arrays (etl.py:148-152); elements arrive as
# mixed string/number JSON -- modeled as strings, cast on unpack.
KLINE_PAYLOAD_SCHEMA = T.ArrayType(T.StringType())

TICKER_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("priceChange", T.StringType(), True),
        T.StructField("priceChangePercent", T.StringType(), True),
        T.StructField("weightedAvgPrice", T.StringType(), True),
        T.StructField("prevClosePrice", T.StringType(), True),
        T.StructField("lastPrice", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Debezium CDC envelope (schema-less JsonConverter shape; SURVEY.md 3.2/S8).
# `after`/`before` are kept as raw JSON strings at this layer because the row
# image schema is per-table; the decode operator applies the table schema.
# ---------------------------------------------------------------------------

def cdc_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Debezium envelope with typed before/after images for one table."""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType(), True),
                        T.StructField("lsn", T.LongType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),  # c/u/d/r
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# ---------------------------------------------------------------------------
# Driver testdata star schema (TESTDATA.md / FIXTURES.md section A).
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
