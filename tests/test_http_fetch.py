"""The live HTTP fetcher (sources/http_fetch.py) — the shipped
counterpart of the reference's ``fetch_binance_data`` (etl.py:102-112)
— exercised entirely offline through an injected transport."""

from __future__ import annotations

import urllib.parse

import pytest

from docker_based_real_time_etl_project_spark.sources.http_fetch import (
    BASE_URL,
    DEFAULT_TIMEOUT,
    PARAMS,
    PATHS,
    build_url,
    make_fetcher,
)
from docker_based_real_time_etl_project_spark.sources.rest import (
    ENDPOINTS,
    register_rest_source,
)


def _parse(url: str):
    p = urllib.parse.urlparse(url)
    return p, {k: v[0] for k, v in urllib.parse.parse_qs(p.query).items()}


def test_endpoint_map_covers_source_endpoints():
    """Every endpoint the REST source polls has a URL path and params —
    the reference's five-endpoint map (etl.py:14-20)."""
    assert set(PATHS) == set(ENDPOINTS) == set(PARAMS)


@pytest.mark.parametrize(
    "endpoint,path,params",
    [
        ("price", "/ticker/price", {}),
        ("depth", "/depth", {"limit": "5"}),
        ("trades", "/trades", {"limit": "50"}),
        ("klines", "/klines", {"interval": "1h", "limit": "100"}),
        ("ticker24h", "/ticker/24hr", {}),
    ],
)
def test_build_url_matches_reference_call_sites(endpoint, path, params):
    """URL + query params per endpoint, exactly the reference's call
    sites (etl.py:216,222,228: limit=5 / limit=50 / interval=1h
    limit=100, symbol always present)."""
    p, q = _parse(build_url(endpoint, "ETHUSDT"))
    assert p.scheme == "https" and p.netloc == "api.binance.com"
    assert p.path == "/api/v3" + path
    assert q == {"symbol": "ETHUSDT", **params}


def test_build_url_rejects_unknown_endpoint():
    with pytest.raises(ValueError, match="unknown endpoint"):
        build_url("nope", "BTCUSDT")


def test_fetch_success_decodes_json_and_passes_timeout():
    seen = []

    def transport(url, timeout):
        seen.append((url, timeout))
        return '{"symbol": "BTCUSDT", "price": "101.5"}'

    fetch = make_fetcher(transport=transport, timeout=3.5)
    got = fetch("price", "BTCUSDT", 7)
    assert got == {"symbol": "BTCUSDT", "price": "101.5"}
    (url, timeout), = seen
    assert timeout == 3.5
    assert _parse(url)[1]["symbol"] == "BTCUSDT"


def test_fetch_failure_returns_none():
    """ANY transport or decode error -> None (etl.py:108-112), which
    the source turns into a skipped row, never a failed batch (S3)."""

    def down(url, timeout):
        raise OSError("connection refused")

    assert make_fetcher(transport=down)("price", "BTCUSDT", 0) is None

    def garbage(url, timeout):
        return "<html>503</html>"

    assert make_fetcher(transport=garbage)("depth", "BTCUSDT", 0) is None


def test_fetch_default_timeout_and_base_url():
    seen = {}

    def transport(url, timeout):
        seen["url"], seen["t"] = url, timeout
        return "[]"

    fetch = make_fetcher(transport=transport)
    assert fetch("trades", "BTCUSDT", 0) == []
    assert seen["t"] == DEFAULT_TIMEOUT
    assert seen["url"].startswith(BASE_URL)

    custom = make_fetcher(transport=transport, base_url="http://proxy:8080/v3")
    custom("trades", "BTCUSDT", 0)
    assert seen["url"].startswith("http://proxy:8080/v3/trades")


def test_http_fetch_drives_the_rest_source(spark):
    """End-to-end: the source's ``fetcher`` option pointing at an
    http_fetch-built fetcher (offline transport) yields one row per
    endpoint with JSON payloads — the documented live wiring."""
    register_rest_source(spark)
    raw = (
        spark.read.format("rest_poll")
        .option("symbols", "BTCUSDT")
        .option("fetcher", "tests.fetchers.offline_http_fetch")
        .load()
    )
    rows = raw.collect()
    assert {r.endpoint for r in rows} == set(ENDPOINTS)
    import json

    price = json.loads(next(r.payload for r in rows if r.endpoint == "price"))
    assert price["symbol"] == "BTCUSDT" and "price" in price
