"""REST polling source (SURVEY.md S1/S2) as a Spark 4 Python Data
Source -- the idiomatic replacement for the reference's driver loop
``fetch_binance_data`` + ``time.sleep(60)`` (etl.py:102-112, 207-240).

Design:

- One output row per (endpoint, symbol) fetch: ``(endpoint, symbol,
  poll_id, payload)`` with the payload as raw JSON text. Parsing into
  typed columns is downstream ``from_json`` with the declared payload
  schemas -- the source stays schema-stable however the API evolves.
- **Batch** reads fan out one partition per (endpoint, symbol) pair, so
  a 500-symbol poll is 2500 concurrent executor-side fetches, not a
  driver loop. **Streaming** advances a poll-counter offset per
  micro-batch; the trigger interval (60 s in production) is the
  caller's, the checkpoint makes restarts resume at the next poll.
- The fetch function is pluggable via the ``fetcher`` option (module
  path). The default is :func:`fake_binance_fetch`, a deterministic
  offline generator with the exact response shapes etl.py indexes into
  (dict / list / positional arrays) -- tests and CI never touch the
  network. The shipped LIVE fetcher is ``sources/http_fetch.py``::

      .option("fetcher",
              "docker_based_real_time_etl_project_spark"
              ".sources.http_fetch.fetch")

  (urllib GET with the reference's per-endpoint params, None on any
  failure; transport injectable for offline tests).
"""

from __future__ import annotations

import importlib
import json
import zlib
from collections.abc import Iterator, Sequence

ENDPOINTS = ("price", "depth", "trades", "klines", "ticker24h")

_LIMITS = {"depth": 5, "trades": 50, "klines": 100}


def _rand(seed: int) -> float:
    """Deterministic [0,1) from a seed (splitmix64 fold)."""
    z = (seed + 0x9E3779B97F4A7C15) & (2**64 - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return ((z ^ (z >> 31)) % 10**9) / 10**9


def fake_binance_fetch(endpoint: str, symbol: str, poll_id: int) -> object:
    """Offline stand-in for the five Binance REST endpoints with the
    reference's exact payload shapes (string numerics and all)."""
    # crc32, not hash(): Python string hashing is per-process salted, and
    # these values must agree across executors and driver restarts
    s = zlib.crc32(f"{endpoint}|{symbol}|{poll_id}".encode())
    base = 100.0 + (zlib.crc32(symbol.encode()) % 900) + poll_id * 0.25

    def px(i: int) -> str:
        return f"{base + (_rand(s + i) - 0.5) * 2:.8f}"

    def qty(i: int) -> str:
        return f"{_rand(s + 1000 + i) * 10:.8f}"

    t0 = 1_700_000_000_000 + poll_id * 60_000
    if endpoint == "price":
        return {"symbol": symbol, "price": px(0)}
    if endpoint == "depth":
        return {
            "bids": [[px(i), qty(i)] for i in range(_LIMITS["depth"])],
            "asks": [[px(100 + i), qty(100 + i)] for i in range(_LIMITS["depth"])],
        }
    if endpoint == "trades":
        return [
            {
                "price": px(i),
                "qty": qty(i),
                "time": t0 + i,
                "isBuyerMaker": _rand(s + 2000 + i) < 0.5,
            }
            for i in range(_LIMITS["trades"])
        ]
    if endpoint == "klines":
        return [
            [
                t0 + i * 3_600_000,          # open_time
                px(i), px(200 + i), px(400 + i), px(600 + i),  # o/h/l/c
                qty(i),                       # volume
                t0 + (i + 1) * 3_600_000 - 1,  # close_time
                qty(100 + i), 10 + i, qty(200 + i), qty(300 + i), "0",
            ]
            for i in range(_LIMITS["klines"])
        ]
    if endpoint == "ticker24h":
        return {
            "symbol": symbol,
            "priceChange": px(0),
            "priceChangePercent": f"{(_rand(s) - 0.5) * 10:.4f}",
            "weightedAvgPrice": px(1),
            "prevClosePrice": px(2),
            "lastPrice": px(3),
            "volume": qty(0),
        }
    raise ValueError(f"unknown endpoint {endpoint!r}")


def _resolve_fetcher(path: str | None):
    if not path:
        return fake_binance_fetch
    mod, _, fn = path.rpartition(".")
    return getattr(importlib.import_module(mod), fn)


def _poll_rows(
    fetcher, endpoints: Sequence[str], symbols: Sequence[str], poll_id: int
) -> Iterator[tuple]:
    for ep in endpoints:
        for sym in symbols:
            payload = fetcher(ep, sym, poll_id)
            if payload is None:  # S1: fetch failure -> skip, don't fail the batch
                continue
            yield (ep, sym, poll_id, json.dumps(payload))


try:  # Python Data Source API needs pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _FetchPartition(InputPartition):
        def __init__(self, endpoint: str, symbol: str):
            self.endpoint = endpoint
            self.symbol = symbol

    class RestBatchReader(DataSourceReader):
        def __init__(self, options):
            self.symbols = options.get("symbols", "BTCUSDT").split(",")
            self.endpoints = options.get("endpoints", ",".join(ENDPOINTS)).split(",")
            self.poll_id = int(options.get("poll_id", "0"))
            self.fetcher_path = options.get("fetcher", "")

        def partitions(self):
            # one partition per (endpoint, symbol): executor-side fetches
            return [
                _FetchPartition(ep, sym)
                for ep in self.endpoints
                for sym in self.symbols
            ]

        def read(self, partition):
            fetcher = _resolve_fetcher(self.fetcher_path)
            yield from _poll_rows(
                fetcher, [partition.endpoint], [partition.symbol], self.poll_id
            )

    class RestStreamReader(SimpleDataSourceStreamReader):
        """Offset = next poll id; each micro-batch performs one poll
        cycle (the reference's 60 s loop body, etl.py:210-237).
        SimpleReader keeps fetches driver-side per batch -- the
        partitioned DataSourceStreamReader variant would shard symbols,
        at the cost of offset bookkeeping per shard."""

        def __init__(self, options):
            self.symbols = options.get("symbols", "BTCUSDT").split(",")
            self.endpoints = options.get("endpoints", ",".join(ENDPOINTS)).split(",")
            self.fetcher_path = options.get("fetcher", "")

        def initialOffset(self):
            return {"poll": 0}

        def read(self, start: dict):
            poll = start["poll"]
            fetcher = _resolve_fetcher(self.fetcher_path)
            rows = list(_poll_rows(fetcher, self.endpoints, self.symbols, poll))
            return iter(rows), {"poll": poll + 1}

        def readBetweenOffsets(self, start: dict, end: dict):
            fetcher = _resolve_fetcher(self.fetcher_path)
            for poll in range(start["poll"], end["poll"]):
                yield from _poll_rows(fetcher, self.endpoints, self.symbols, poll)

    class RestDataSource(DataSource):
        """spark.read.format("rest_poll") / spark.readStream.format(...).

        Options: symbols (csv), endpoints (csv), poll_id (batch),
        fetcher (dotted path to a (endpoint, symbol, poll_id) -> obj).
        """

        @classmethod
        def name(cls):
            return "rest_poll"

        def schema(self):
            return "endpoint string, symbol string, poll_id long, payload string"

        def reader(self, schema):
            return RestBatchReader(self.options)

        def simpleStreamReader(self, schema):
            return RestStreamReader(self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4 fallback
    HAVE_DATASOURCE_API = False
    RestDataSource = None  # type: ignore[assignment]


def register_rest_source(spark) -> bool:
    """Idempotently register the rest_poll source; False if the Python
    Data Source API is unavailable (pre-4.0 Spark)."""
    if not HAVE_DATASOURCE_API:
        return False
    spark.dataSource.register(RestDataSource)
    return True
