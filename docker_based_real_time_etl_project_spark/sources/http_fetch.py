"""Live HTTP fetcher for the REST polling source (SURVEY.md S1).

The shipped counterpart of the reference's ``fetch_binance_data``
(etl.py:102-112: GET ``BASE_URL + ENDPOINTS[endpoint]`` with
symbol/limit params, JSON body on success, ``None`` on any failure)
and its endpoint map (etl.py:13-20). Plugs into ``rest_poll`` as::

    spark.read.format(...).option(
        "fetcher",
        "docker_based_real_time_etl_project_spark.sources.http_fetch.fetch",
    )

and runs EXECUTOR-side, one call per (endpoint, symbol) partition —
the source's partitioning is the distributed replacement for the
reference's sequential driver loop (etl.py:207-240).

Pure stdlib (``urllib``), and the transport is INJECTABLE via
:func:`make_fetcher` so every path — URL construction, params,
timeout, failure→None — is unit-testable offline; the default
transport only runs when a test or deployment explicitly opts into
network access.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

BASE_URL = "https://api.binance.com/api/v3"

# engine endpoint name -> API path, matching the reference's map
# (etl.py:14-20; names follow sources/rest.py ENDPOINTS)
PATHS = {
    "price": "/ticker/price",
    "depth": "/depth",
    "trades": "/trades",
    "klines": "/klines",
    "ticker24h": "/ticker/24hr",
}

# fixed per-endpoint query params — the reference's call sites
# (etl.py:216 limit=5, :222 limit=50, :228 interval='1h' limit=100)
PARAMS = {
    "price": {},
    "depth": {"limit": "5"},
    "trades": {"limit": "50"},
    "klines": {"interval": "1h", "limit": "100"},
    "ticker24h": {},
}

DEFAULT_TIMEOUT = 10.0

Transport = Callable[[str, float], str]
"""(url, timeout) -> response body text; raise on any failure."""


def _urllib_transport(url: str, timeout: float) -> str:
    req = urllib.request.Request(url, headers={"Accept": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status >= 400:  # urlopen raises for most, belt-and-braces
            raise urllib.error.HTTPError(
                url, resp.status, "bad status", resp.headers, None
            )
        return resp.read().decode("utf-8")


def build_url(endpoint: str, symbol: str, base_url: str = BASE_URL) -> str:
    """The exact request URL for one (endpoint, symbol) fetch."""
    if endpoint not in PATHS:
        raise ValueError(f"unknown endpoint {endpoint!r}")
    query = urllib.parse.urlencode({"symbol": symbol, **PARAMS[endpoint]})
    return f"{base_url}{PATHS[endpoint]}?{query}"


def make_fetcher(
    transport: Transport | None = None,
    base_url: str = BASE_URL,
    timeout: float = DEFAULT_TIMEOUT,
):
    """A fetcher ``(endpoint, symbol, poll_id) -> payload | None`` over
    an injectable transport. ``poll_id`` is the source's offset
    counter; a live API has no replay, so it is intentionally unused
    (the trigger interval provides the pacing, reference
    etl.py:240's ``time.sleep(60)``).

    Failure semantics mirror the reference exactly (etl.py:108-112):
    ANY transport or decode error returns ``None``, which the source
    turns into a skipped row — one symbol's outage never fails the
    batch (S3)."""
    send = transport or _urllib_transport

    def fetch(endpoint: str, symbol: str, poll_id: int) -> object | None:
        url = build_url(endpoint, symbol, base_url)
        try:
            return json.loads(send(url, timeout))
        except Exception:
            return None

    return fetch


# module-level entry for the source's ``fetcher`` option (resolved by
# sources/rest.py:_resolve_fetcher as "pkg.module.attr")
fetch = make_fetcher()
