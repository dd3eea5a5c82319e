"""Pluggable fetchers for rest_poll tests (imported by dotted path on
executors)."""

from __future__ import annotations

from docker_based_real_time_etl_project_spark.sources.rest import fake_binance_fetch


def depth_down_fetch(endpoint: str, symbol: str, poll_id: int):
    """Simulates the depth endpoint being down (etl.py:111 returns None
    on fetch failure): the flow must skip it, not fail the batch."""
    if endpoint == "depth":
        return None
    return fake_binance_fetch(endpoint, symbol, poll_id)


def _fake_http_transport(url: str, timeout: float) -> str:
    """Offline HTTP stand-in: serves the fake generator's payload for
    the (endpoint, symbol) the URL names — so the full http_fetch path
    (URL build -> transport -> JSON decode) runs with zero network."""
    import json
    import urllib.parse

    from docker_based_real_time_etl_project_spark.sources.http_fetch import PATHS

    parsed = urllib.parse.urlparse(url)
    ep = {v: k for k, v in PATHS.items()}[parsed.path.removeprefix("/api/v3")]
    sym = urllib.parse.parse_qs(parsed.query)["symbol"][0]
    return json.dumps(fake_binance_fetch(ep, sym, 0))


def _make_offline_http_fetch():
    from docker_based_real_time_etl_project_spark.sources.http_fetch import (
        make_fetcher,
    )

    return make_fetcher(transport=_fake_http_transport)


# module-level so executors can resolve it by dotted path
offline_http_fetch = _make_offline_http_fetch()
