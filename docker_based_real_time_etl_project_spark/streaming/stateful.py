"""Custom stateful streaming operator via ``applyInPandasWithState``
(the engine's answer to "arbitrary per-key streaming state" -- the
reference has no equivalent; its only state is Connect offset tracking,
docker-compose.yml:52-54).

Running per-user totals: state = (n_events, value_cents). The value
sum is accumulated in integer cents (the testdata's ``value`` has two
decimals), so the running total is exactly associative -- emitted
totals are bit-identical however micro-batches split, which is what
lets the final row per key be SQL-oracled instead of rows-only.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [cents / 100.0]}
    )


def running_totals_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-user running (n_events, value_sum), one emitted row per key
    per micro-batch it appears in; the row with the largest n_events per
    key is the final total. Arrow-batched state function -- the Python
    boundary processes whole batches, never row-at-a-time."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def final_totals(emitted: DataFrame) -> DataFrame:
    """Collapse the emitted update stream to the final totals per user
    (n_events is monotone per key, so max_by is deterministic)."""
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
    )
