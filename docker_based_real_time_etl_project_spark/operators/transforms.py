"""Row-level transform operators (SURVEY.md section 2.2, T1-T14).

Each function is a pure DataFrame -> DataFrame (or Column) combinator
built from JVM-side ``pyspark.sql.functions`` only -- no Python UDFs
in any of these paths, so every one stays inside whole-stage codegen
and is safe in the 100 TB hot path.

The five ``transform_*_payload`` compositions at the bottom reproduce
the reference ETL's five flows (reference ``etl.py:114-179``) against
raw JSON payload DataFrames, using the declared payload schemas.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark import schemas

# ---------------------------------------------------------------------------
# T1-T4: projection / rename / cast / literal
# ---------------------------------------------------------------------------

def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """T1: keep a named subset in order, dropping the rest (etl.py:117,139,154)."""
    return df.select(*columns)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """T2: source-name -> target-name, e.g. camelCase API fields to
    snake_case (etl.py:141,168-174). Single projection, not chained
    withColumnRenamed, so the plan stays one node wide."""
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """T3: cast named columns (string numerics -> double; etl.py:121,142-143)."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def with_literal(df: DataFrame, name: str, value) -> DataFrame:
    """T4: attach a constant column, e.g. the query symbol (etl.py:140,153)."""
    return df.withColumn(name, F.lit(value))


# ---------------------------------------------------------------------------
# T5: head-N limit, plus the deterministic top-k variant for distributed use
# ---------------------------------------------------------------------------

def head_n(df: DataFrame, n: int) -> DataFrame:
    """T5: truncate to first N rows of the payload (etl.py:126-127,139).

    Payload order is only meaningful within one fetched batch; for a
    deterministic distributed equivalent use :func:`top_k`."""
    return df.limit(n)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Deterministic T5: total-order sort then limit. Spark plans this as
    TakeOrderedAndProject -- per-partition top-k then a k-row merge on
    the driver, no full sort/shuffle of the input."""
    return df.orderBy(*order_by).limit(k)


# ---------------------------------------------------------------------------
# T6/T7: positional array unpack + zip (order-book depth, kline arrays)
# ---------------------------------------------------------------------------

def unpack_positional(
    df: DataFrame, array_col: str, names: Sequence[str], casts: Mapping[str, str] | None = None
) -> DataFrame:
    """T6: array with meaning-by-index -> named typed columns.

    Reference shape: 12-slot kline array -> 12 named columns then
    project 8 (etl.py:148-152). ``element_at`` is 1-based.
    """
    cols = [F.element_at(F.col(array_col), i + 1).alias(n) for i, n in enumerate(names)]
    out = df.select(*[c for c in df.columns if c != array_col], *cols)
    if casts:
        out = cast_columns(out, casts)
    return out


def zip_positional(
    df: DataFrame,
    left_col: str,
    right_col: str,
    pos_name: str = "depth_level",
    left_name: str = "bid",
    right_name: str = "ask",
) -> DataFrame:
    """T7: pair element i of two parallel arrays into one row (row index =
    depth rank), reproducing the order-book bid/ask pairing
    (etl.py:128-134). ``arrays_zip`` pads the shorter side with nulls
    (the reference's short-book tolerance); the explode is inner, so an
    empty book yields zero rows, not a null row."""
    zipped = F.arrays_zip(F.col(left_col).alias(left_name), F.col(right_col).alias(right_name))
    other = [c for c in df.columns if c not in (left_col, right_col)]
    return (
        df.select(*other, F.posexplode(zipped).alias(pos_name, "_pair"))
        .select(*other, pos_name, f"_pair.{left_name}", f"_pair.{right_name}")
    )


# ---------------------------------------------------------------------------
# T12/T13: epoch-millis conversion, JSON field extraction
# ---------------------------------------------------------------------------

def epoch_ms_to_ts(col: str | Column) -> Column:
    """T12: BIGINT epoch milliseconds -> timestamp (init-db.sql:23,30,36)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def json_get(col: str | Column, path: str) -> Column:
    """T13: extract one field from a JSON string column ($.-rooted path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def json_decode(df: DataFrame, col: str, schema) -> DataFrame:
    """T13 (typed): parse a JSON string column with a declared schema and
    flatten its fields alongside the other columns."""
    other = [c for c in df.columns if c != col]
    return df.select(*other, F.from_json(F.col(col), schema).alias("_j")).select(
        *other, "_j.*"
    )


# ---------------------------------------------------------------------------
# T14: stream-table whitelist filter
# ---------------------------------------------------------------------------

def whitelist_filter(df: DataFrame, col: str, allowed: Sequence[str]) -> DataFrame:
    """T14: keep only rows whose `col` is in the allowed set
    (debezium-config.json:14 table.include.list)."""
    return df.filter(F.col(col).isin(list(allowed)))


# ---------------------------------------------------------------------------
# The five reference flows (etl.py:114-179), payload DataFrame -> table shape.
# Input = one row per payload element with the declared payload schema;
# `symbol` attached per T4. Ingest timestamp (T11) is applied at the sink
# edge, not here, to keep these deterministic/testable.
# ---------------------------------------------------------------------------

def transform_latest_price(df: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """Flow 1 (etl.py:114-121): project symbol+price, cast price."""
    return cast_columns(project(df, [symbol_col, "price"]), {"price": "double"})


def transform_order_book(df: DataFrame, symbol: str, depth: int = 5) -> DataFrame:
    """Flow 2 (etl.py:123-134): top-`depth` levels of bids and asks,
    positionally paired, unpacked to typed columns.

    Input: one row per depth snapshot with array<array<string>> bids/asks.
    ``slice`` keeps the API's order (already best-first) = the [:5].
    """
    sliced = df.select(
        F.slice("bids", 1, depth).alias("bids"), F.slice("asks", 1, depth).alias("asks")
    )
    paired = zip_positional(sliced, "bids", "asks")
    return paired.select(
        F.lit(symbol).alias("symbol"),
        F.col("bid")[0].cast("double").alias("bid_price"),
        F.col("bid")[1].cast("double").alias("bid_quantity"),
        F.col("ask")[0].cast("double").alias("ask_price"),
        F.col("ask")[1].cast("double").alias("ask_quantity"),
    )


def transform_trades(df: DataFrame, symbol: str, limit: int = 50) -> DataFrame:
    """Flow 3 (etl.py:136-143): first-`limit` trades, project/rename/cast."""
    out = head_n(df, limit)
    out = project(out, ["price", "qty", "time", "isBuyerMaker"])
    out = rename(out, {"qty": "quantity", "time": "trade_time", "isBuyerMaker": "is_buyer_maker"})
    out = cast_columns(out, {"price": "double", "quantity": "double"})
    return with_literal(out, "symbol", symbol).select(
        "symbol", "price", "quantity", "trade_time", "is_buyer_maker"
    )


KLINE_FIELDS = (
    "open_time", "open_price", "high_price", "low_price", "close_price",
    "volume", "close_time", "quote_asset_volume", "number_of_trades",
    "taker_buy_base", "taker_buy_quote", "ignore",
)


def transform_klines(df: DataFrame, symbol: str, array_col: str = "kline") -> DataFrame:
    """Flow 4 (etl.py:145-158): unpack the 12-slot positional kline array,
    keep the 8 reference columns (drops quote volume, trade count,
    taker buys, ignore), cast prices/volume to double."""
    out = unpack_positional(
        df,
        array_col,
        KLINE_FIELDS,
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
    out = with_literal(out, "symbol", symbol)
    return project(
        out,
        ["symbol", "open_time", "open_price", "high_price", "low_price",
         "close_price", "volume", "close_time"],
    )


TICKER_RENAMES = {
    "priceChange": "price_change",
    "priceChangePercent": "price_change_percent",
    "weightedAvgPrice": "weighted_avg_price",
    "prevClosePrice": "prev_close_price",
    "lastPrice": "last_price",
}


def transform_ticker(df: DataFrame) -> DataFrame:
    """Flow 5 (etl.py:160-179): project 7 camelCase fields, rename to
    snake_case, cast numerics."""
    out = project(
        df,
        ["symbol", "priceChange", "priceChangePercent", "weightedAvgPrice",
         "prevClosePrice", "lastPrice", "volume"],
    )
    out = rename(out, TICKER_RENAMES)
    return cast_columns(
        out,
        {c: "double" for c in
         ("price_change", "price_change_percent", "weighted_avg_price",
          "prev_close_price", "last_price", "volume")},
    )


def with_ingest_timestamp(df: DataFrame, name: str = "timestamp") -> DataFrame:
    """T11: processing-time stamp at the sink edge (init-db.sql DEFAULT
    CURRENT_TIMESTAMP). Nondeterministic by design -- excluded from oracles."""
    return df.withColumn(name, F.current_timestamp())


def with_surrogate_id(df: DataFrame, name: str = "id") -> DataFrame:
    """T10: unique (not dense, not sequential) surrogate id. A distributed
    engine cannot cheaply produce the reference's globally-sequential
    SERIAL; uniqueness is the preserved contract (SURVEY.md 7.3-4)."""
    return df.withColumn(name, F.monotonically_increasing_id())
