"""End-to-end ETL flow queries (S1/S2 + T1-T8): one poll cycle of the
rest_poll data source through all five reference flows. The oracle is
the reference's own per-cycle row contract (BASELINE.md: 1 price + 5
depth + 50 trades + 100 klines + 1 ticker = 157 rows/cycle,
etl.py:210-237) -- if any flow's parse/transform chain drops or
duplicates rows, the counts shift and the hash breaks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.flows import FLOWS, poll_batch
from docker_based_real_time_etl_project_spark.queries.registry import register

_FLOW_COUNTS = {
    "latest_prices": 1,
    "order_book": 5,
    "recent_trades": 50,
    "klines": 100,
    "ticker_24hr": 1,
}

_ORACLE = " UNION ALL ".join(
    f"SELECT '{name}' AS flow, CAST({n} AS BIGINT) AS n_rows"
    for name, n in sorted(_FLOW_COUNTS.items())
)


@register("q_etl_poll_cycle", oracle=_ORACLE, tags=("etl", "source"))
def q_etl_poll_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full poll cycle on the offline fetcher: custom data source ->
    JSON payload decode -> five transform chains -> per-flow row counts
    (the reference's 157-row cycle). sf_dir is unused: the source is
    the REST API stand-in, not the testdata."""
    raw = poll_batch(spark, symbols="BTCUSDT", poll_id=0)
    counts = [
        fn(raw).select(F.lit(name).alias("flow")).groupBy("flow").agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        for name, fn in FLOWS.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)
