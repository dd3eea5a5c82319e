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
