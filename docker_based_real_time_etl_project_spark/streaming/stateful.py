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

import numpy as np
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


# ---------------------------------------------------------------------------
# Streaming as-of join (temporal join): attach latest right-side state
# ---------------------------------------------------------------------------

_ASOF_OUT = T.StructType(
    [
        T.StructField("trade_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("trade_ts_us", T.LongType()),
        T.StructField("trade_value", T.DoubleType()),
        T.StructField("quote_id", T.LongType()),
        T.StructField("quote_value", T.DoubleType()),
        T.StructField("quote_age_us", T.LongType()),
    ]
)
_ASOF_STATE = T.StructType(
    [
        T.StructField("q_id", T.LongType()),
        T.StructField("q_val", T.DoubleType()),
        T.StructField("q_ts_us", T.LongType()),
    ]
)


def _make_attach_asof(tolerance_us: int | None):
    def _attach_asof(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        q_id, q_val, q_ts = state.get if state.exists else (None, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # deterministic event order inside the batch: quotes before trades
        # at equal ts (inclusive match), event_id as the final tiebreak
        pdf = pdf.sort_values(
            ["ts", "side", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        ts_us = _ts_us(pdf["ts"])
        side = pdf["side"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        val = pdf["value"].to_numpy()
        # vectorized within-batch carry: index of the latest quote row at
        # or before each row (-1 = none yet in batch -> fall back to state)
        is_q = side == 0
        last_q = np.maximum.accumulate(np.where(is_q, np.arange(len(pdf)), -1))
        tr = np.flatnonzero(side == 1)
        src = last_q[tr]
        in_batch = src >= 0
        # masked int64 carry, never float NaN sentinels: routing 64-bit
        # ids/timestamps through float64 would silently corrupt values
        # above 2^53 (snowflake-style ids exceed it). Where a row has no
        # in-batch quote, the np.where fallback is the state value (an
        # int, so the arrays STAY int64); `valid` tracks which rows
        # genuinely carry a quote and masks the rest at emission.
        src_idx = np.maximum(src, 0)
        qid_out = eid[src_idx]
        qval_out = val[src_idx]
        qts_out = ts_us[src_idx]
        if q_id is not None:
            qid_out = np.where(in_batch, qid_out, np.int64(q_id))
            qval_out = np.where(in_batch, qval_out, q_val)
            qts_out = np.where(in_batch, qts_out, np.int64(q_ts))
            valid = np.ones(len(tr), dtype=bool)
        else:
            valid = in_batch.copy()
        # roll the state forward to the batch's latest quote. The state
        # tuple is kept even under a tolerance (the bound is evaluated
        # per trade against the trade's own timestamp, exactly like the
        # batch operator's post-window predicate — dropping state early
        # would change semantics for a later trade inside the bound).
        if is_q.any():
            last = int(np.flatnonzero(is_q)[-1])
            state.update((int(eid[last]), float(val[last]), int(ts_us[last])))
        elif state.exists:
            state.update((q_id, q_val, q_ts))
        has_q = valid
        if tolerance_us is not None:
            # a carried quote older than the bound nulls out atomically
            # (garbage lanes are already False in has_q, so the int64
            # arithmetic on them cannot flip a masked row back on)
            has_q = has_q & (ts_us[tr] - qts_out <= tolerance_us)
        miss = ~has_q
        yield pd.DataFrame(
            {
                "trade_id": eid[tr],
                "user_id": np.full(len(tr), key[0], dtype="int64"),
                "trade_ts_us": ts_us[tr],
                "trade_value": val[tr],
                "quote_id": pd.arrays.IntegerArray(
                    qid_out.astype("int64"), mask=miss.copy()
                ),
                "quote_value": np.where(has_q, qval_out, np.nan),
                "quote_age_us": pd.arrays.IntegerArray(
                    (ts_us[tr] - qts_out).astype("int64"), mask=miss.copy()
                ),
            }
        )

    return _attach_asof


def asof_attach_stream(
    tagged: DataFrame,
    watermark: str = "4 hours",
    tolerance_us: int | None = None,
) -> DataFrame:
    """STREAMING as-of join (the temporal join Spark lacks; Flink calls
    it a temporal table join): per key, every left row (``side`` 1) is
    emitted once, carrying the latest right row (``side`` 0) at or
    before its timestamp — right state is ONE tuple per key, updated as
    right rows flow past.

    Input: a single tagged stream with columns (event_id, user_id, ts,
    value, side) — the same same-source shape as the batch
    ``asof_join_backward_same_source``. Correctness across micro-batches
    requires per-key ts-monotone arrival (equal timestamps must share a
    batch), which the engine's time-range replay slicing guarantees and
    a Kafka source partitioned by key with in-order producers matches;
    within a batch, order is re-established by an explicit sort.

    The batch window form needs the full history shuffled per query; this
    form's state is O(keys) — ONE carried tuple per key however long the
    stream runs, which is what makes the operator deployable on an
    unbounded stream. applyInPandasWithState processes whole Arrow
    batches; the carry is a vectorized maximum.accumulate, no per-row
    Python.

    ``tolerance_us`` bounds staleness exactly like the batch operator's
    ``tolerance``: a carried quote older than the bound (relative to
    each trade's own timestamp) nulls the whole attached tuple."""
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_attach_asof(tolerance_us),
            outputStructType=_ASOF_OUT,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming content dedup: first-arrival-wins by content fingerprint
# ---------------------------------------------------------------------------

_DEDUP_OUT = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("keep_doc_id", T.LongType()),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("kept", T.LongType())])


def _keep_first(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    mn = min(int(pdf["doc_id"].min()) for pdf in pdfs)
    if state.exists:
        # fingerprint already admitted in an earlier batch: drop copies
        return
    state.update((mn,))
    yield pd.DataFrame({"fp": [key[0]], "keep_doc_id": [mn]})


def content_dedup_stream(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Streaming corpus-ingest dedup: exactly one row is admitted per
    distinct content fingerprint, the MINIMUM id among same-batch
    copies (deterministic — plain ``dropDuplicates`` keeps whichever
    copy a partition happened to process first) and the earliest batch
    across batches. State is one entry per distinct fingerprint —
    irreducible for exact dedup (every fingerprint ever admitted must
    stay queryable); at 100 TB that is the RocksDB-backed state store
    with the fingerprint itself as the grouping key, ~50 bytes per
    DISTINCT document, sharded across executors by the same hash the
    groupBy already does."""
    keyed = docs.select(
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.col(id_col).alias("doc_id"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _keep_first,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TOPK_OUT = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("rnk", T.IntegerType()),
        T.StructField("upd", T.LongType()),
    ]
)
_TOPK_STATE = T.StructType(
    [
        T.StructField("okeys", T.ArrayType(T.LongType())),
        T.StructField("prices", T.ArrayType(T.DoubleType())),
        T.StructField("upd", T.LongType()),
    ]
)
_TOPK_K = 3


def _update_topk(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        okeys, prices, upd = state.get
        rows = list(zip(prices, okeys))
    else:
        rows, upd = [], 0
    for pdf in pdfs:
        rows.extend(
            zip(pdf["o_totalprice"].astype(float), pdf["o_orderkey"].astype("int64"))
        )
    # deterministic total order: value DESC, then orderkey ASC — the
    # same tiebreak the batch window uses, so state merge order can't
    # change the survivors
    rows.sort(key=lambda t: (-t[0], t[1]))
    top = rows[:_TOPK_K]
    upd += 1
    state.update(
        ([int(k) for _, k in top], [float(p) for p, _ in top], upd)
    )
    yield pd.DataFrame(
        {
            "o_custkey": [key[0]] * len(top),
            "o_orderkey": [int(k) for _, k in top],
            "o_totalprice": [float(p) for p, _ in top],
            "rnk": list(range(1, len(top) + 1)),
            "upd": [upd] * len(top),
        }
    )


def topk_per_group_stream(orders: DataFrame) -> DataFrame:
    """Streaming A3: the per-customer top-3 leaderboard maintained as
    orders arrive. State per key is exactly the current top-k tuples
    (k=3: three (orderkey, price) pairs — O(k) per key, nothing else is
    needed because top-k under a total order is mergeable: the top-k of
    (state ∪ batch) only ever draws from state's top-k and the batch).
    Each batch a key appears in re-emits its full current top-k stamped
    with an update counter; the rows carrying the key's MAX counter are
    the final leaderboard. The batch twin (q_win_rank) shuffles once on
    the group key; this form never shuffles history — each new order
    meets k tuples of state, which is the leaderboard shape a 100 TB
    order stream needs (state size = customers x k, not orders)."""
    return orders.groupBy("o_custkey").applyInPandasWithState(
        _update_topk,
        outputStructType=_TOPK_OUT,
        stateStructType=_TOPK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: sequential-recursion state carried across micro-batches
# ---------------------------------------------------------------------------

_EWMA_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)
_EWMA_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _ts_us(series: pd.Series) -> "np.ndarray":
    """Timestamp series -> int64 microseconds-since-epoch, tz-safe.

    Arrow can hand applyInPandasWithState folds tz-aware timestamps;
    numpy's tz-aware->datetime64 parse is deprecated (future pandas
    raises). The session tz is pinned UTC, so converting to UTC and
    stripping the zone is value-identical. Shared by every stateful
    fold that needs integer event time (round-8 advice: the guard
    originally lived only in the asof fold)."""
    if getattr(series.dtype, "tz", None) is not None:
        series = series.dt.tz_convert("UTC").dt.tz_localize(None)
    return series.to_numpy().astype("datetime64[us]").astype("int64")


def _concat_sorted(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    """ALL of a group's Arrow chunks for this micro-batch, concatenated
    BEFORE the (ts, event_id) sort. applyInPandasWithState splits a
    group's batch into multiple chunks past
    spark.sql.execution.arrow.maxRecordsPerBatch (~10k) with no
    cross-chunk ordering guarantee — sorting each chunk independently
    (the pre-round-8 code) would fold a hot key out of order and
    silently diverge from the batch oracle. One concat restores the
    total (ts, event_id) order whatever the chunking."""
    chunks = list(pdfs)
    if not chunks:
        return pd.DataFrame()
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    return pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )


def _ewma_fold(
    n: int, ewma: float | None, values: "np.ndarray"
) -> tuple[int, float | None]:
    """Sequential EWMA recursion over already-ordered values. A plain
    Python float loop ON PURPOSE: the batch engine folds
    acc*0.8 + 0.2*x in exactly this operation order, and Python floats
    are the same IEEE-754 doubles — so the streaming result is
    BIT-identical to the batch fold, which pandas' ewm()
    (adjust/init semantics differ) would not give. EWMA is
    non-associative, so unlike RSI/Bollinger this fold cannot be
    vectorized without changing the operation sequence."""
    for x in values:
        x = float(x)
        ewma = x if ewma is None else ewma * 0.8 + 0.2 * x
        n += 1
    return n, ewma


def _update_ewma(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold the batch's rows (ordered across ALL chunks) into the
    carried EWMA. Groups are one (event_type, day) — bounded by the
    grain, never the corpus."""
    n, ewma = state.get if state.exists else (0, None)
    pdf = _concat_sorted(pdfs)
    if len(pdf):
        n, ewma = _ewma_fold(n, ewma, pdf["value"].to_numpy(dtype="float64"))
    state.update((n, ewma))
    yield pd.DataFrame(
        {"event_type": [key[0]], "day": [key[1]], "n_events": [n], "ewma": [ewma]}
    )


def ewma_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-(event_type, day) streaming EWMA (alpha = 0.2). Correct
    ONLY under in-order replay per key (the availableNow slicer cuts
    on ts VALUE boundaries, so equal timestamps never straddle
    batches and cross-batch order extends the within-batch
    (ts, event_id) sort); a production deployment fronts this with
    the same ordering guarantee or a watermark-delayed re-sort."""
    return (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .withWatermark("ts", watermark)
        .groupBy("event_type", "day")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def final_ewma(emitted: DataFrame) -> DataFrame:
    """Final EWMA per key from the update stream (n_events monotone
    per key -> max_by picks the last emission), micro-snapped to the
    batch oracle's contract."""
    return emitted.groupBy("event_type", "day").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.round(F.max_by("ewma", "n_events") * 1e6).cast("bigint").alias("ewma_micro"),
    )


# ---------------------------------------------------------------------------
# Streaming RSI: a sliding integer window carried across micro-batches
# ---------------------------------------------------------------------------

_RSI_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        # int64 epoch-micros: string rendering happens ENGINE-side after
        # the drain (JVM date_format in whole-stage codegen) — pandas
        # strftime over every emitted row was the hottest per-row cost
        # left in the fold path
        T.StructField("ts_us", T.LongType()),
        T.StructField("rsi_micro", T.LongType()),
    ]
)
# ring of the last 14 price deltas (integer cents) + last price + count
_RSI_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("diffs", T.ArrayType(T.LongType())),
    ]
)


def _rsi_fold(
    n: int,
    last: int | None,
    diffs: list[int],
    cents: "np.ndarray",
    ts_us: "np.ndarray",
) -> tuple[int, int, list[int], pd.DataFrame]:
    """Vectorized Cutler-RSI fold over one ordered run of prices.

    Integer arithmetic is associative, so the per-row Python loop the
    pre-round-8 code ran is replaced by numpy int64 cumsum window
    differences — bit-identical outputs (every quantity is an exact
    int64: 14·|Δcents| ≤ ~1e8, ×1e8 ≤ 1e16 < 2^63), ~100× less
    interpreter cost per batch, which matters because state is keyed
    by event_type (few keys) so all of a key's rows funnel through
    one task."""
    m = len(cents)
    ring = np.asarray(diffs, dtype=np.int64)
    if last is None:
        d_new = np.diff(cents)
        first_delta_row = 1  # row 0 has no delta
    else:
        d_new = np.diff(np.concatenate((np.asarray([last], np.int64), cents)))
        first_delta_row = 0
    full = np.concatenate((ring, d_new))
    gains = np.concatenate(([0], np.cumsum(np.where(full > 0, full, 0))))
    losses = np.concatenate(([0], np.cumsum(np.where(full < 0, -full, 0))))
    rows = np.arange(m)
    emit = np.flatnonzero(n + rows + 1 >= 15)
    # index in `full` of the delta ending at row i; emission implies at
    # least 14 deltas end there, so the [j-13, j] window is always full
    j = len(ring) + emit - first_delta_row
    sg = gains[j + 1] - gains[j - 13]
    sl = losses[j + 1] - losses[j - 13]
    tot = sg + sl
    rsi = (100_000_000 * sg) // np.where(tot > 0, tot, 1)
    out = pd.DataFrame(
        {
            "ts_us": ts_us[emit],
            "rsi_micro": pd.arrays.IntegerArray(
                rsi.astype("int64"), mask=(tot == 0)
            ),
        }
    )
    new_last = int(cents[-1]) if m else last
    new_ring = full[-14:].astype("int64").tolist() if len(full) else list(diffs)
    return n + m, new_last, new_ring, out


def _update_rsi(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Carry (n, last price, last-14 deltas) per event_type; every
    qualifying row (>= 15th of its key) emits Cutler RSI from the
    exact integer window. The window ring is 14 longs: state is O(1)
    per key; the in-batch fold is vectorized (_rsi_fold)."""
    n, last, diffs = state.get if state.exists else (0, None, [])
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((n, last, list(diffs)))
        return
    cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
    ts_us = _ts_us(pdf["ts"])
    n, last, diffs, out = _rsi_fold(n, last, list(diffs), cents, ts_us)
    state.update((n, last, diffs))
    out.insert(0, "event_type", key[0])
    yield out


def rsi_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming 14-period RSI; in-order-per-key replay
    guaranteed as for ewma_stream (ts-value slice boundaries)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_rsi,
            outputStructType=_RSI_OUT,
            stateStructType=_RSI_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming Bollinger: 20-price integer ring carried across micro-batches
# ---------------------------------------------------------------------------

_BOLL_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("mean_micro", T.LongType()),
        # raw double: the half-away micro rounding happens engine-side
        # after the drain (Python round() is half-EVEN — a divergence
        # trap this schema dodges by construction)
        T.StructField("sd_raw", T.DoubleType()),
    ]
)
_BOLL_STATE = T.StructType(
    [
        T.StructField("ring", T.ArrayType(T.LongType())),
    ]
)


def _boll_fold(
    ring: list[int], cents: "np.ndarray", ts_us: "np.ndarray"
) -> tuple[list[int], pd.DataFrame]:
    """Vectorized 20-period Bollinger fold over one ordered run.

    Same vectorization argument as _rsi_fold: the sliding Σc and Σc²
    are exact int64 cumsum differences (c ≤ ~1e6 cents → c² ≤ 1e12;
    a key's batch would need ~9e6 rows before the Σc² cumsum itself
    neared 2^63), and σ touches float exactly once — np.sqrt of an
    exactly-representable integer (20·Σc²−(Σc)² ≤ ~4e14 < 2^53) is
    the same correctly-rounded IEEE double math.sqrt produced, then
    /20*10000 in the identical operation order. Bit-identical to the
    per-row loop it replaces."""
    m = len(cents)
    r0 = len(ring)
    full = np.concatenate((np.asarray(ring, dtype=np.int64), cents))
    c1 = np.concatenate(([0], np.cumsum(full)))
    c2 = np.concatenate(([0], np.cumsum(full * full)))
    emit = np.flatnonzero(r0 + np.arange(m) + 1 >= 20)
    e = r0 + emit  # window [e-19, e] in `full` is always full at emission
    s = c1[e + 1] - c1[e - 19]
    s2 = c2[e + 1] - c2[e - 19]
    out = pd.DataFrame(
        {
            "ts_us": ts_us[emit],
            "mean_micro": (s * 10000) // 20,
            "sd_raw": np.sqrt((20 * s2 - s * s).astype("float64")) / 20 * 10000,
        }
    )
    return full[-20:].astype("int64").tolist(), out


def _update_bollinger(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Carry the last 20 prices (integer cents) per event_type; each
    row once the ring is full emits the rolling mean (integer
    division) and population stddev (one correctly-rounded sqrt of an
    exact integer — bit-identical to the batch engines'). O(1) state;
    in-batch fold vectorized (_boll_fold)."""
    (ring,) = state.get if state.exists else ([],)
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((list(ring),))
        return
    cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
    ts_us = _ts_us(pdf["ts"])
    ring, out = _boll_fold(list(ring), cents, ts_us)
    state.update((ring,))
    out.insert(0, "event_type", key[0])
    yield out


def bollinger_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming 20-period Bollinger stats; in-order
    replay per key as for ewma_stream/rsi_stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_bollinger,
            outputStructType=_BOLL_OUT,
            stateStructType=_BOLL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Watermark-delayed re-sort: out-of-order-tolerant indicator streams
# ---------------------------------------------------------------------------
#
# The in-order indicator twins above are correct only under in-order
# replay per key. These variants front the SAME fold cores with a
# per-key reorder buffer: arriving rows are buffered in state, and only
# rows with ts strictly BELOW the current event-time watermark are
# released — sorted by (ts, event_id) — into the fold. Release sets are
# totally ordered across micro-batches (batch k releases (wm_{k-1},
# wm_k); the operator itself drops arrivals older than wm —
# applyInPandasWithState does no late-row pre-filtering, unlike
# windowed aggregations), so the fold sees exactly the batch engine's
# order however
# shuffled the arrival was, as long as lateness stays within the
# watermark delay. State per key = fold state + the buffered rows
# inside the delay window: O(rows-per-delay-window), the irreducible
# price of out-of-order tolerance (Flink's event-time sort pays the
# same). An EventTimeTimeout is re-armed while the buffer is non-empty
# so tail rows flush once the watermark finally passes them (the replay
# harness appends a max-ts sentinel to push it past the end).


def _buffer_release(
    state: GroupState,
    buf: tuple["np.ndarray", ...],
    new: tuple["np.ndarray", ...] | None,
) -> tuple[tuple["np.ndarray", ...], tuple["np.ndarray", ...]]:
    """Merge new rows into the buffer, split at the watermark.
    ``buf``/``new`` are parallel (ts_us, event_id, value) arrays;
    returns (released sorted by (ts, event_id), kept).

    Arrivals BELOW the current watermark are dropped here, explicitly:
    applyInPandasWithState does not pre-filter late rows the way
    windowed aggregations do (verified empirically —
    tests/test_streaming.py::test_ooo_late_beyond_watermark_is_dropped
    fails without this filter), and folding such a row would mean
    emitting it AFTER later-ts rows already released in earlier
    batches. Dropping at the watermark is exactly the contract every
    watermarked Spark operator advertises: lateness within the delay
    is invisible, beyond it the row is discarded — never misordered."""
    wm_us = state.getCurrentWatermarkMs() * 1000
    if new is not None:
        fresh = new[0] >= wm_us
        if not fresh.all():
            new = tuple(a[fresh] for a in new)
        buf = tuple(np.concatenate((b, x)) for b, x in zip(buf, new))
    rel = buf[0] < wm_us
    released = tuple(a[rel] for a in buf)
    kept = tuple(a[~rel] for a in buf)
    order = np.lexsort((released[1], released[0]))
    return tuple(a[order] for a in released), kept


def _rearm_or_clear(state: GroupState, kept_ts_us: "np.ndarray", new_state) -> None:
    state.update(new_state)
    if len(kept_ts_us):
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm_ms + 1, int(kept_ts_us.max()) // 1000 + 1))


def _new_rows(pdfs: Iterable[pd.DataFrame], value_dtype: str | None):
    """(ts_us, event_id[, value]) arrays from a batch's chunks; the
    value column is omitted when ``value_dtype`` is None (folds keyed
    on time/id alone), carried as float64, or scaled to integer cents
    otherwise."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    base = (_ts_us(pdf["ts"]), pdf["event_id"].to_numpy().astype("int64"))
    if value_dtype is None:
        return base
    return base + (
        pdf["value"].to_numpy().astype(value_dtype)
        if value_dtype == "float64"
        else pdf["value"].mul(100).round().astype("int64").to_numpy(),
    )


_EWMA_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _update_ewma_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bval, n, ewma = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bval, np.float64),
        )
    else:
        buf = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
        n, ewma = 0, None
    new = None if state.hasTimedOut else _new_rows(pdfs, "float64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        n, ewma = _ewma_fold(n, ewma, released[2])
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "day": [key[1]],
                "n_events": [n],
                "ewma": [ewma],
            }
        )
    _rearm_or_clear(
        state, kept[0], (kept[0].tolist(), kept[1].tolist(), kept[2].tolist(), n, ewma)
    )


def ewma_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """EWMA over an OUT-OF-ORDER stream: the watermark-delayed re-sort
    feeds _ewma_fold, so any arrival order whose lateness stays within
    ``watermark`` hash-matches the in-order run bit for bit."""
    return (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .withWatermark("ts", watermark)
        .groupBy("event_type", "day")
        .applyInPandasWithState(
            _update_ewma_ooo,
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_OOO_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_RSI_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("diffs", T.ArrayType(T.LongType())),
    ]
)


def _update_rsi_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, n, last, diffs = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
        )
        last = None if n == 0 else last
        diffs = list(diffs)
    else:
        buf = (np.empty(0, np.int64),) * 3
        n, last, diffs = 0, None, []
    new = None if state.hasTimedOut else _new_rows(pdfs, "int64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        n, last, diffs, out = _rsi_fold(
            n, last, diffs, released[2], released[0]
        )
        if len(out):
            out.insert(0, "event_type", key[0])
            yield out
    _rearm_or_clear(
        state,
        kept[0],
        (
            kept[0].tolist(),
            kept[1].tolist(),
            kept[2].tolist(),
            n,
            last if last is not None else 0,
            diffs,
        ),
    )


def rsi_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """14-period RSI over an OUT-OF-ORDER stream via the same
    watermark-delayed re-sort; emits append-mode rows identical to the
    in-order twin whenever lateness stays within ``watermark``."""
    return events.withWatermark("ts", watermark).groupBy("event_type").applyInPandasWithState(
        _update_rsi_ooo,
        outputStructType=_RSI_OUT,
        stateStructType=_RSI_OOO_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming MACD: daily-close EMA-12/EMA-26 state carried across batches
# ---------------------------------------------------------------------------

_MACD_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_days", T.LongType()),
        # raw double: the half-away micro snap happens engine-side after
        # the drain (same rounding-trap dodge as the Bollinger twin)
        T.StructField("macd_raw", T.DoubleType()),
        T.StructField("upd", T.LongType()),
    ]
)
_MACD_STATE = T.StructType(
    [
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("e12", T.DoubleType()),
        T.StructField("e26", T.DoubleType()),
        T.StructField("last_day", T.StringType()),
        T.StructField("close", T.DoubleType()),
    ]
)

_A12 = 2.0 / 13.0
_A26 = 2.0 / 27.0


def _ema_step(e: float | None, a: float, c: float) -> float:
    # identical IEEE sequence to the batch F.aggregate fold: init on the
    # first close, then acc*(1-a) + a*c with the same constant-folded a
    return c if e is None else e * (1.0 - a) + a * c


def _update_macd(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Carry (EMA-12, EMA-26 over completed daily closes, the running
    day and its latest value) per event_type. Each batch folds the days
    it COMPLETES into the EMAs (a Python loop over the handful of
    calendar days a batch spans — bounded by the calendar, not rows;
    the per-row work of finding day boundaries is vectorized) and emits
    the provisional MACD as if the stream ended now: one extra EMA step
    on the running close, the exact operation the batch engine performs
    on its final array element. The last emission per key (max upd) is
    therefore BIT-identical to the batch q_macd fold."""
    if state.exists:
        n_rows, n_days, e12, e26, last_day, close = state.get
    else:
        n_rows, n_days, e12, e26, last_day, close = 0, 0, None, None, None, None
    pdf = _concat_sorted(pdfs)
    if len(pdf):
        days = pdf["ts"].dt.strftime("%Y-%m-%d").to_numpy()
        vals = pdf["value"].to_numpy(dtype="float64")
        # last row index of each day-run within the batch
        ends = np.flatnonzero(
            np.concatenate((days[1:] != days[:-1], [True]))
        )
        n_rows += len(pdf)
        for e in ends:
            d, c = days[e], float(vals[e])
            if d == last_day:
                close = c
            else:
                if last_day is not None:
                    e12 = _ema_step(e12, _A12, close)
                    e26 = _ema_step(e26, _A26, close)
                last_day, close = d, c
                n_days += 1
    state.update((n_rows, n_days, e12, e26, last_day, close))
    if last_day is None:
        return
    p12 = _ema_step(e12, _A12, close)
    p26 = _ema_step(e26, _A26, close)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_days": [n_days],
            "macd_raw": [p12 - p26],
            "upd": [n_rows],
        }
    )


def macd_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming MACD line (EMA-12 − EMA-26 of daily
    closes); in-order replay per key as for ewma_stream. State is six
    scalars per key — O(grain), however long the stream runs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_macd,
            outputStructType=_MACD_OUT,
            stateStructType=_MACD_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_BOLL_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("ring", T.ArrayType(T.LongType())),
    ]
)


def _update_bollinger_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, ring = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
        )
        ring = list(ring)
    else:
        buf = (np.empty(0, np.int64),) * 3
        ring = []
    new = None if state.hasTimedOut else _new_rows(pdfs, "int64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        ring, out = _boll_fold(ring, released[2], released[0])
        if len(out):
            out.insert(0, "event_type", key[0])
            yield out
    _rearm_or_clear(
        state,
        kept[0],
        (kept[0].tolist(), kept[1].tolist(), kept[2].tolist(), ring),
    )


def bollinger_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """20-period Bollinger stats over an OUT-OF-ORDER stream via the
    same watermark-delayed re-sort as rsi_stream_ooo; bit-identical to
    the in-order twin whenever lateness stays within ``watermark``."""
    return events.withWatermark("ts", watermark).groupBy("event_type").applyInPandasWithState(
        _update_bollinger_ooo,
        outputStructType=_BOLL_OUT,
        stateStructType=_BOLL_OOO_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_MACD_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("e12", T.DoubleType()),
        T.StructField("e26", T.DoubleType()),
        # UTC day number (ts_us // 86_400e6); -1 encodes "no day yet".
        # e12/e26 are None iff n_days <= 1 (no day completed), close/
        # last_day None iff n_days == 0 — both recoverable from n_days,
        # so plain placeholders round-trip the optional scalars.
        T.StructField("last_day", T.LongType()),
        T.StructField("close", T.DoubleType()),
    ]
)

_US_PER_DAY = 86_400_000_000


def _macd_fold(n_days, e12, e26, last_day, close, ts_us, vals):
    """Fold released (ts, value) rows — already in exact (ts, event_id)
    order — into the daily-close EMA-12/26 state. Day identity is the
    UTC day number, identical to the batch date_trunc('day') under the
    session's UTC timezone. Python loop is over day-run boundaries
    within the release (bounded by the calendar, not rows); run ends
    are found vectorized."""
    day_idx = ts_us // _US_PER_DAY
    ends = np.flatnonzero(np.concatenate((day_idx[1:] != day_idx[:-1], [True])))
    for e in ends:
        d, c = int(day_idx[e]), float(vals[e])
        if d == last_day:
            close = c
        else:
            if last_day is not None:
                e12 = _ema_step(e12, _A12, close)
                e26 = _ema_step(e26, _A26, close)
            last_day, close = d, c
            n_days += 1
    return n_days, e12, e26, last_day, close


def _update_macd_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bval, n_rows, n_days, e12, e26, last_day, close = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bval, np.float64),
        )
        if n_days == 0:
            last_day, close = None, None
        if n_days <= 1:
            e12, e26 = None, None
    else:
        buf = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
        n_rows, n_days, e12, e26, last_day, close = 0, 0, None, None, None, None
    new = None if state.hasTimedOut else _new_rows(pdfs, "float64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        n_rows += len(released[0])
        n_days, e12, e26, last_day, close = _macd_fold(
            n_days, e12, e26, last_day, close, released[0], released[2]
        )
        # provisional MACD as if the stream ended now: one extra EMA
        # step on the running close — the exact operation the batch
        # fold applies to its final array element, so the max-upd
        # emission is bit-identical to batch q_macd.
        p12 = _ema_step(e12, _A12, close)
        p26 = _ema_step(e26, _A26, close)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [n_days],
                "macd_raw": [p12 - p26],
                "upd": [n_rows],
            }
        )
    _rearm_or_clear(
        state,
        kept[0],
        (
            kept[0].tolist(),
            kept[1].tolist(),
            kept[2].tolist(),
            n_rows,
            n_days,
            e12 if e12 is not None else 0.0,
            e26 if e26 is not None else 0.0,
            last_day if last_day is not None else -1,
            close if close is not None else 0.0,
        ),
    )


def macd_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """Streaming MACD over an OUT-OF-ORDER stream: the watermark-delayed
    re-sort feeds the same daily-close EMA fold as macd_stream, so the
    final (max-upd) emission per key hash-matches the batch q_macd
    oracle for any arrival order whose lateness stays within
    ``watermark``. Completes the out-of-order matrix: all four
    order-sensitive indicator twins (EWMA/RSI/Bollinger/MACD) now have
    lateness-tolerant forms; VWAP needs none (associative integer
    sums — arrival order cannot change it)."""
    return events.withWatermark("ts", watermark).groupBy("event_type").applyInPandasWithState(
        _update_macd_ooo,
        outputStructType=_MACD_OUT,
        stateStructType=_MACD_OOO_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming tick-rule order-flow imbalance: (last price, last sign) state
# ---------------------------------------------------------------------------

_TICKIMB_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hour", T.StringType()),
        T.StructField("buy_vol", T.LongType()),
        T.StructField("sell_vol", T.LongType()),
        T.StructField("signed_vol", T.LongType()),
        T.StructField("n_buys", T.LongType()),
        T.StructField("n_sells", T.LongType()),
    ]
)
# n rows seen, last price (cents), last non-zero tick sign (0 = none yet)
_TICKIMB_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("last_sign", T.LongType()),
    ]
)


def _tick_sign_fold(
    n: int, last: int, last_sign: int, cents: "np.ndarray"
) -> tuple[int, int, int, "np.ndarray"]:
    """Vectorized tick-rule signing of one ordered run of prices,
    seeded by the carried (row count, last price, last non-zero sign).
    Sign of the delta chain, zero ticks forward-filled from the last
    non-zero sign by an index maximum-accumulate. Returns the updated
    carry, the per-row effective signs, and the per-row deltas (row 0
    of a FRESH key has no predecessor; its delta is reported as 0 and
    must be excluded by consumers that need true deltas, exactly as
    the batch operators drop the first NULL lag)."""
    if n == 0:
        d = np.concatenate((np.zeros(1, np.int64), np.diff(cents)))
    else:
        d = np.diff(np.concatenate((np.asarray([last], np.int64), cents)))
    raw = np.sign(d).astype(np.int64)
    idx = np.where(raw != 0, np.arange(len(raw)), -1)
    np.maximum.accumulate(idx, out=idx)
    eff = np.where(idx >= 0, raw[np.maximum(idx, 0)], np.int64(last_sign))
    new_sign = int(eff[-1]) if eff[-1] else last_sign
    return n + len(cents), int(cents[-1]), new_sign, eff, d


def _tick_partials(hour: "np.ndarray", eff: "np.ndarray", vol: "np.ndarray") -> pd.DataFrame:
    """Per-hour integer PARTIAL sums for one signed run. Partials are
    associative, so the post-drain groupBy-sum hash-matches the batch
    oracle exactly no matter how micro-batches split hours."""
    return (
        pd.DataFrame(
            {
                "hour": hour,
                "buy_vol": np.where(eff == 1, vol, 0),
                "sell_vol": np.where(eff == -1, vol, 0),
                "signed_vol": eff * vol,
                "n_buys": (eff == 1).astype(np.int64),
                "n_sells": (eff == -1).astype(np.int64),
            }
        )
        .groupby("hour", as_index=False, sort=False)
        .sum()
    )


def _update_tick_imbalance(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Tick-rule signing with 3 longs of state per key; the in-batch
    fold is _tick_sign_fold (vectorized)."""
    n, last, last_sign = state.get if state.exists else (0, 0, 0)
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((n, last, last_sign))
        return
    cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
    n, last, last_sign, eff, _ = _tick_sign_fold(n, last, last_sign, cents)
    part = _tick_partials(
        pdf["hour"].to_numpy(), eff, pdf["vol"].to_numpy(dtype="int64")
    )
    state.update((n, last, last_sign))
    part.insert(0, "event_type", key[0])
    yield part


def tick_imbalance_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming tick-rule imbalance; in-order-per-key
    replay guaranteed as for ewma_stream (ts-value slice boundaries).
    Expects the caller to have attached integer ``vol`` and formatted
    ``hour`` columns (JVM-side expressions — nothing string-heavy runs
    in the fold)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_tick_imbalance,
            outputStructType=_TICKIMB_OUT,
            stateStructType=_TICKIMB_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM: the drawup identity as 3 longs of state per key
# ---------------------------------------------------------------------------

_CUSUM_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("s_value", T.LongType()),
    ]
)
# cumulative deviation walk, its running minimum, and the previous S
_CUSUM_STATE = T.StructType(
    [
        T.StructField("cum", T.LongType()),
        T.StructField("runmin", T.LongType()),
        T.StructField("prev_s", T.LongType()),
    ]
)


def make_cusum_update(targets: dict, k_cents: int, h_cents: int):
    """Build the CUSUM state function around a per-key reference map
    (symbol -> target cents). The reference is TRAINED offline (here:
    one batch aggregate over the static table, O(keys) rows collected)
    exactly as a production monitor pins its in-control mean before
    watching the live stream; the closure ships it to executors with
    the serialized function."""

    def _update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum, runmin, prev_s = state.get if state.exists else (0, 0, 0)
        pdf = _concat_sorted(pdfs)
        if not len(pdf):
            state.update((cum, runmin, prev_s))
            return
        cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
        ts_us = _ts_us(pdf["ts"])
        new_state, out = _cusum_fold(
            (cum, runmin, prev_s), cents, ts_us,
            targets.get(key[0], 0), k_cents, h_cents,
        )
        state.update(new_state)
        if out is not None:
            out.insert(0, "event_type", key[0])
            yield out

    return _update


def _cusum_fold(
    carry: tuple[int, int, int],
    cents: "np.ndarray",
    ts_us: "np.ndarray",
    target: int,
    k_cents: int,
    h_cents: int,
) -> tuple[tuple[int, int, int], pd.DataFrame | None]:
    """Drawup-identity CUSUM over one ordered run: integer cumsum +
    running minimum, alarms on each h-upcrossing. Returns the updated
    (cum, runmin, prev_s) carry and the alarm rows (None if none)."""
    cum, runmin, prev_s = carry
    dev = cents - np.int64(target) - np.int64(k_cents)
    cums = np.int64(cum) + np.cumsum(dev)
    rm = np.minimum(np.minimum.accumulate(cums), np.int64(runmin))
    s = cums - np.minimum(np.int64(0), rm)
    prev = np.concatenate((np.asarray([prev_s], np.int64), s[:-1]))
    alarm = (s > h_cents) & (prev <= h_cents)
    new_state = (int(cums[-1]), int(rm[-1]), int(s[-1]))
    if not alarm.any():
        return new_state, None
    return new_state, pd.DataFrame({"ts_us": ts_us[alarm], "s_value": s[alarm]})


def cusum_stream(
    events: DataFrame,
    targets: dict,
    k_cents: int,
    h_cents: int,
    watermark: str = "4 hours",
) -> DataFrame:
    """One-sided CUSUM upcrossing alarms per event_type as a streaming
    state machine: S_i = max(0, S_{i-1} + dev_i) maintained via the
    same drawup identity the batch q_cusum uses (cum - min(0, running
    min)), carried across micro-batches in THREE longs — no buffering,
    O(keys) total state on an unbounded stream. The in-batch fold is
    numpy cumsum / minimum-accumulate (integer, associative-safe), and
    alarms emit append-mode. In-order-per-key replay contract as for
    ewma_stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_update(targets, k_cents, h_cents),
            outputStructType=_CUSUM_OUT,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# OOO microstructure twins: re-sort buffer in front of the same folds
# ---------------------------------------------------------------------------

_TICKIMB_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("buf_vol", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("last_sign", T.LongType()),
    ]
)


def _new_rows_priced(pdfs: Iterable[pd.DataFrame], with_vol: bool):
    """(ts_us, event_id, cents[, vol]) arrays from a batch's chunks."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    cols = [
        _ts_us(pdf["ts"]),
        pdf["event_id"].to_numpy().astype("int64"),
        pdf["value"].mul(100).round().astype("int64").to_numpy(),
    ]
    if with_vol:
        # sentinel flush rows carry no volume (null), and they must flow
        # THROUGH the state op (a pre-stateful filter gets pushed below
        # the watermark node and would stop the sentinel from advancing
        # it); their emissions are dropped post-drain by key
        cols.append(pdf["vol"].fillna(0).astype("int64").to_numpy())
    return tuple(cols)


def _hour_str_from_us(ts_us: "np.ndarray") -> "np.ndarray":
    """UTC hour-floor rendering identical to the engine's
    date_format(date_trunc('hour', ts)) under the session's pinned UTC
    timezone: pure calendar arithmetic on naive microsecond ints, no
    locale, no zone database."""
    return (
        pd.Series(ts_us.astype("datetime64[us]"))
        .dt.floor("h")
        .dt.strftime("%Y-%m-%d %H:%M:%S")
        .to_numpy()
    )


def _update_tick_imbalance_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, bv, n, last, last_sign = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
            np.asarray(bv, np.int64),
        )
    else:
        buf = (np.empty(0, np.int64),) * 4
        n, last, last_sign = 0, 0, 0
    new = None if state.hasTimedOut else _new_rows_priced(pdfs, with_vol=True)
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        n, last, last_sign, eff, _ = _tick_sign_fold(
            n, last, last_sign, released[2]
        )
        part = _tick_partials(_hour_str_from_us(released[0]), eff, released[3])
        part.insert(0, "event_type", key[0])
        yield part
    _rearm_or_clear(
        state,
        kept[0],
        (
            kept[0].tolist(),
            kept[1].tolist(),
            kept[2].tolist(),
            kept[3].tolist(),
            n,
            last,
            last_sign,
        ),
    )


def tick_imbalance_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """Tick-rule imbalance over an OUT-OF-ORDER stream: the
    watermark-delayed re-sort feeds _tick_sign_fold, so any arrival
    order whose lateness stays within ``watermark`` emits partials
    that sum to the in-order (= batch-oracle) result exactly. Hour
    keys are derived from the released rows' own timestamps (pure UTC
    calendar arithmetic), so nothing order-dependent leaves the
    fold."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_tick_imbalance_ooo,
            outputStructType=_TICKIMB_OUT,
            stateStructType=_TICKIMB_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_CUSUM_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("cum", T.LongType()),
        T.StructField("runmin", T.LongType()),
        T.StructField("prev_s", T.LongType()),
    ]
)


def make_cusum_update_ooo(targets: dict, k_cents: int, h_cents: int):
    """OOO CUSUM state function: same trained reference map as
    make_cusum_update, fronted by the per-key re-sort buffer."""

    def _update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bts, beid, bc, cum, runmin, prev_s = state.get
            buf = (
                np.asarray(bts, np.int64),
                np.asarray(beid, np.int64),
                np.asarray(bc, np.int64),
            )
        else:
            buf = (np.empty(0, np.int64),) * 3
            cum, runmin, prev_s = 0, 0, 0
        new = None if state.hasTimedOut else _new_rows_priced(pdfs, with_vol=False)
        released, kept = _buffer_release(state, buf, new)
        if len(released[0]):
            (cum, runmin, prev_s), out = _cusum_fold(
                (cum, runmin, prev_s),
                released[2],
                released[0],
                targets.get(key[0], 0),
                k_cents,
                h_cents,
            )
            if out is not None:
                out.insert(0, "event_type", key[0])
                yield out
        _rearm_or_clear(
            state,
            kept[0],
            (
                kept[0].tolist(),
                kept[1].tolist(),
                kept[2].tolist(),
                cum,
                runmin,
                prev_s,
            ),
        )

    return _update


def cusum_stream_ooo(
    events: DataFrame,
    targets: dict,
    k_cents: int,
    h_cents: int,
    watermark: str,
) -> DataFrame:
    """CUSUM alarms over an OUT-OF-ORDER stream via the
    watermark-delayed re-sort; hash-matches the batch q_cusum oracle
    whenever lateness stays within ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_update_ooo(targets, k_cents, h_cents),
            outputStructType=_CUSUM_OUT,
            stateStructType=_CUSUM_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming volume bars: the subordinated clock as 2 longs of state
# ---------------------------------------------------------------------------

_VBAR_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bar_id", T.LongType()),
        T.StructField("n_trades", T.LongType()),
        T.StructField("bar_vol", T.LongType()),
        T.StructField("o_ts", T.LongType()),
        T.StructField("o_eid", T.LongType()),
        T.StructField("o_c", T.LongType()),
        T.StructField("c_ts", T.LongType()),
        T.StructField("c_eid", T.LongType()),
        T.StructField("c_c", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)
# rows seen + cumulative volume: the whole volume clock
_VBAR_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cum_vol", T.LongType()),
    ]
)


def _update_volume_bars_factory(bar_volume: int):
    def _update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cum = state.get if state.exists else (0, 0)
        pdf = _concat_sorted(pdfs)
        if not len(pdf):
            state.update((n, cum))
            return
        vol = pdf["vol"].to_numpy(dtype="int64")
        cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
        ts_us = _ts_us(pdf["ts"])
        eid = pdf["event_id"].to_numpy().astype("int64")
        pre = np.int64(cum) + np.concatenate(
            (np.zeros(1, np.int64), np.cumsum(vol)[:-1])
        )
        bar = pre // bar_volume
        g = pd.DataFrame(
            {"bar_id": bar, "vol": vol, "c": cents, "ts": ts_us, "eid": eid}
        ).groupby("bar_id", as_index=False, sort=False)
        # rows are (ts, eid)-sorted, so positional first/last ARE the
        # bar's open/close and min/max ts its bounds — the partials
        # combine associatively post-drain via struct min/max
        part = g.agg(
            n_trades=("c", "size"),
            bar_vol=("vol", "sum"),
            o_ts=("ts", "first"),
            o_eid=("eid", "first"),
            o_c=("c", "first"),
            c_ts=("ts", "last"),
            c_eid=("eid", "last"),
            c_c=("c", "last"),
            hi=("c", "max"),
            lo=("c", "min"),
            start_us=("ts", "first"),
            end_us=("ts", "last"),
        )
        state.update((n + len(vol), int(cum + vol.sum())))
        part.insert(0, "event_type", key[0])
        yield part

    return _update


def volume_bars_stream(
    events: DataFrame, bar_volume: int, watermark: str = "4 hours"
) -> DataFrame:
    """Event-driven VOLUME bars built in-stream: the whole
    subordinated clock is TWO longs of state per key (rows seen,
    cumulative volume); each micro-batch assigns its rows to bars by
    an exclusive-prefix cumsum seeded from the carried total and
    emits per-bar integer partials (counts, sums, positional
    open/close carrying their (ts, event_id) for deterministic
    struct-min/max combination). Bars that straddle micro-batches
    emit one partial per batch; the post-drain combine is associative,
    so the drained result hash-matches the batch q_volume_bars oracle
    exactly. In-order-per-key replay contract as for ewma_stream.
    Expects integer ``vol`` attached JVM-side."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_volume_bars_factory(bar_volume),
            outputStructType=_VBAR_OUT,
            stateStructType=_VBAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_VBAR_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("buf_vol", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("cum_vol", T.LongType()),
    ]
)


def _update_volume_bars_ooo_factory(bar_volume: int):
    def _update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bts, beid, bc, bv, n, cum = state.get
            buf = (
                np.asarray(bts, np.int64),
                np.asarray(beid, np.int64),
                np.asarray(bc, np.int64),
                np.asarray(bv, np.int64),
            )
        else:
            buf = (np.empty(0, np.int64),) * 4
            n, cum = 0, 0
        new = None if state.hasTimedOut else _new_rows_priced(pdfs, with_vol=True)
        released, kept = _buffer_release(state, buf, new)
        if len(released[0]):
            ts_us, eid, cents, vol = released
            pre = np.int64(cum) + np.concatenate(
                (np.zeros(1, np.int64), np.cumsum(vol)[:-1])
            )
            g = pd.DataFrame(
                {
                    "bar_id": pre // bar_volume,
                    "vol": vol,
                    "c": cents,
                    "ts": ts_us,
                    "eid": eid,
                }
            ).groupby("bar_id", as_index=False, sort=False)
            part = g.agg(
                n_trades=("c", "size"),
                bar_vol=("vol", "sum"),
                o_ts=("ts", "first"),
                o_eid=("eid", "first"),
                o_c=("c", "first"),
                c_ts=("ts", "last"),
                c_eid=("eid", "last"),
                c_c=("c", "last"),
                hi=("c", "max"),
                lo=("c", "min"),
                start_us=("ts", "first"),
                end_us=("ts", "last"),
            )
            n, cum = n + len(vol), int(cum + vol.sum())
            part.insert(0, "event_type", key[0])
            yield part
        _rearm_or_clear(
            state,
            kept[0],
            (
                kept[0].tolist(),
                kept[1].tolist(),
                kept[2].tolist(),
                kept[3].tolist(),
                n,
                cum,
            ),
        )

    return _update


def volume_bars_stream_ooo(
    events: DataFrame, bar_volume: int, watermark: str
) -> DataFrame:
    """Volume bars over an OUT-OF-ORDER stream: bar assignment is a
    prefix sum of volume, i.e. fully order-defined, so the re-sort
    buffer fronts the same positional-partial emission as the in-order
    twin — shuffled arrival yields the identical bar set. Sentinel
    rows flow through (post-drain key filter) so the flush watermark
    advances."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_volume_bars_ooo_factory(bar_volume),
            outputStructType=_VBAR_OUT,
            stateStructType=_VBAR_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming Kyle lambda: the online regression as five integer partials
# ---------------------------------------------------------------------------

_KYLE_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("sxy", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sy", T.LongType()),
        T.StructField("sx2", T.LongType()),
    ]
)


def _update_kyle(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online price-impact regression: the five OLS sums are
    associative, so each batch emits one int64 PARTIAL row per key
    (y = price delta from the carried last price, x = tick-signed
    volume; the first row of a fresh key has no delta and is excluded,
    matching the batch operator's NULL-lag drop). State stays the
    tick-sign carry — 3 longs. The slope itself is computed post-drain
    in DECIMAL(38,0), where the cross terms outgrow int64."""
    n, last, last_sign = state.get if state.exists else (0, 0, 0)
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((n, last, last_sign))
        return
    fresh = n == 0
    cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
    n, last, last_sign, eff, d = _tick_sign_fold(n, last, last_sign, cents)
    x = eff * pdf["vol"].to_numpy(dtype="int64")
    y = d
    if fresh:
        x, y = x[1:], y[1:]
    if not len(x):
        state.update((n, last, last_sign))
        return
    state.update((n, last, last_sign))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_obs": [len(x)],
            "sxy": [int((x * y).sum())],
            "sx": [int(x.sum())],
            "sy": [int(y.sum())],
            "sx2": [int((x * x).sum())],
        }
    )


def kyle_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming Kyle-lambda partials;
    in-order-per-key replay contract as for ewma_stream. Expects
    integer ``vol`` attached JVM-side."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_kyle,
            outputStructType=_KYLE_OUT,
            stateStructType=_TICKIMB_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming Roll spread: serial-covariance partials over 3 longs of state
# ---------------------------------------------------------------------------

_ROLL_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("n_pairs", T.LongType()),
        T.StructField("sxy", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sy", T.LongType()),
    ]
)
# rows seen, last price, last delta (valid iff rows seen >= 2)
_ROLL_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("last_d", T.LongType()),
    ]
)


def _update_roll(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(key, day) serial-covariance PARTIALS (n, Σd₁d₀, Σd₁, Σd₀)
    for the Roll estimator: the delta chain is seeded by the carried
    last price, the lagged delta by the carried last delta, and a row
    contributes iff its GLOBAL index ≥ 2 (both deltas defined —
    exactly the batch operator's double-NULL-lag drop). Integer
    partials are associative; the spread's sqrt happens post-drain."""
    n, last_c, last_d = state.get if state.exists else (0, 0, 0)
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((n, last_c, last_d))
        return
    cents = pdf["value"].mul(100).round().astype("int64").to_numpy()
    m = len(cents)
    if n == 0:
        d = np.concatenate((np.zeros(1, np.int64), np.diff(cents)))
    else:
        d = np.diff(np.concatenate((np.asarray([last_c], np.int64), cents)))
    d0 = np.concatenate((np.asarray([last_d], np.int64), d[:-1]))
    valid = (n + np.arange(m)) >= 2
    state.update((n + m, int(cents[-1]), int(d[-1])))
    if not valid.any():
        return
    part = (
        pd.DataFrame(
            {
                "day": pdf["day"].to_numpy()[valid],
                "n_pairs": np.ones(int(valid.sum()), np.int64),
                "sxy": (d * d0)[valid],
                "sx": d[valid],
                "sy": d0[valid],
            }
        )
        .groupby("day", as_index=False, sort=False)
        .sum()
    )
    part.insert(0, "event_type", key[0])
    yield part


def roll_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming Roll-spread partials; in-order-per-key
    replay contract as for ewma_stream. Expects a formatted ``day``
    column attached JVM-side."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_roll,
            outputStructType=_ROLL_OUT,
            stateStructType=_ROLL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming autocorrelation: lag-1..3 ACF partials over a 3-value tail
# ---------------------------------------------------------------------------

_ACF_OUT = T.StructType(
    [T.StructField("event_type", T.StringType())]
    + [T.StructField(c, T.LongType()) for c in ("n", "s", "ss")]
    + [
        T.StructField(f"{c}{k}", T.LongType())
        for k in (1, 2, 3)
        for c in ("p", "m", "h", "t")
    ]
)

_ACF_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("tail", T.ArrayType(T.LongType())),
    ]
)


def _acf_fold(n: int, tail: list, v: "np.ndarray"):
    """One batch of ordered cents into the ACF partial row; returns
    (new n, new 3-value tail, partial dict). Shared by the in-order
    and OOO folds so their algebra cannot drift."""
    import numpy as np

    seq = np.concatenate([np.asarray(tail, np.int64), v])
    nt = len(tail)
    row = {"n": len(v), "s": int(v.sum()), "ss": int((v * v).sum())}
    for k in (1, 2, 3):
        j0 = max(k, nt)  # first pair whose LATER element is new
        heads = seq[j0 - k : len(seq) - k]
        tails = seq[j0:]
        row[f"p{k}"] = int((heads * tails).sum())
        row[f"m{k}"] = len(tails)
        row[f"h{k}"] = int(heads.sum())
        row[f"t{k}"] = int(tails.sum())
    return n + len(v), [int(x) for x in seq[-min(3, len(seq)):]], row


def _update_acf(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online lag-1..3 ACF: every sum in the classical common-mean
    estimator is associative over ordered (x_i, x_{i+k}) pairs, so the
    only state a lag-K ACF needs is the last K values (the pairs that
    straddle a batch boundary) plus the running count — 1 long + a
    3-long tail per key. Each batch emits one int64 PARTIAL row
    (n, Σx, Σx² and per-lag Σx·x', pair count, head/tail sums over the
    NEW pairs — those whose later element arrived this batch); the
    estimator itself is assembled post-drain in DECIMAL(38,0), where
    n²·Σxx outgrows int64. Per-batch partials stay inside int64 up to
    ~10⁶ rows/key/batch at 10⁶-cent prices (documented bound)."""
    import numpy as np

    n, tail = state.get if state.exists else (0, [])
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        state.update((n, list(tail)))
        return
    v = pdf["value"].mul(100).round().astype("int64").to_numpy()
    n, tail, row = _acf_fold(n, list(tail), v)
    state.update((n, tail))
    yield pd.DataFrame([{"event_type": key[0], **row}])


def acf_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming ACF partials; in-order-per-key replay
    contract as for ewma_stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_acf,
            outputStructType=_ACF_OUT,
            stateStructType=_ACF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ACF_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("tail", T.ArrayType(T.LongType())),
    ]
)


def _update_acf_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, n, tail = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
        )
        tail = list(tail)
    else:
        buf = (np.empty(0, np.int64),) * 3
        n, tail = 0, []
    new = None if state.hasTimedOut else _new_rows(pdfs, "int64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        n, tail, row = _acf_fold(n, tail, released[2])
        yield pd.DataFrame([{"event_type": key[0], **row}])
    _rearm_or_clear(
        state, kept[0],
        (kept[0].tolist(), kept[1].tolist(), kept[2].tolist(), n, tail),
    )


def acf_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """ACF partials over an OUT-OF-ORDER stream: pairing is
    order-defined, so the watermark-delayed re-sort fronts the same
    shared _acf_fold — shuffled arrival hash-matches the in-order run
    and the batch oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_acf_ooo,
            outputStructType=_ACF_OUT,
            stateStructType=_ACF_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming max drawdown: the path-dependent risk fold as one long of state
# ---------------------------------------------------------------------------

_MDD_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("dd", T.LongType()),
        T.StructField("pk", T.LongType()),
    ]
)

_MDD_STATE = T.StructType([T.StructField("peak", T.LongType())])


def _mdd_fold(peak: int | None, v: "np.ndarray"):
    """One batch of ordered cents into the drawdown partial: the
    running peak is the ONLY carried state (drawdowns computed against
    the carried peak are exact, so per-batch maxima combine with a
    plain max post-drain). Returns (new peak, partial dict). Shared by
    the in-order and OOO folds."""
    import numpy as np

    if peak is not None:
        pk = np.maximum.accumulate(
            np.concatenate([np.asarray([peak], np.int64), v])
        )[1:]
    else:
        pk = np.maximum.accumulate(v)
    dd = pk - v
    return int(pk[-1]), {
        "n": len(v),
        "dd": int(dd.max()),
        "pk": int(pk[-1]),
    }


def _update_mdd(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online maximum drawdown: state is ONE long per key (the running
    peak — max is associative, and every drawdown is measured against
    the prefix peak, which the fold carries). Each batch emits one
    int64 partial (rows, batch max drawdown, peak); the final combine
    is sum/max/max — exactly q_max_drawdown's closed form, so the
    stream hash-matches the batch oracle."""
    peak = state.get[0] if state.exists else None
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        if peak is not None:
            state.update((peak,))
        return
    v = pdf["value"].mul(100).round().astype("int64").to_numpy()
    peak, row = _mdd_fold(peak, v)
    state.update((peak,))
    yield pd.DataFrame([{"event_type": key[0], **row}])


def mdd_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming max-drawdown partials; in-order-per-key
    replay contract as for ewma_stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_mdd,
            outputStructType=_MDD_OUT,
            stateStructType=_MDD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> tuple[bool, str]:
    """Capability probe for Spark 4's ``transformWithStateInPandas``
    (the successor API to applyInPandasWithState: explicit
    ValueState/ListState/MapState handles, event/processing-time
    TIMERS, per-state TTL, schema evolution of state). The PLAN-side
    API exists in this pyspark build, but the runtime protocol between
    the JVM and the stateful-processor Python workers speaks protobuf
    (`pyspark/sql/streaming/proto/StateMessage_pb2.py` imports
    `google.protobuf`), and the `protobuf` package is not installed in
    this environment — the TWS driver worker crashes in
    validateAndMaybeEvolveStateSchema with
    `ImportError: cannot import name 'descriptor' from 'google.protobuf'`
    before the first micro-batch. Returns (usable, reason); the twin
    query's test skips on the reason so the moment the environment
    gains protobuf the hash-gate runs for real."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as e:  # pragma: no cover - present in 4.1
        return False, f"StatefulProcessor API missing: {e}"
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        return False, (
            "transformWithState runtime needs the protobuf package "
            f"(StateMessage_pb2): {e}"
        )
    return True, "ok"


def mdd_stream_tws(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """The max-drawdown fold on ``transformWithStateInPandas`` — the
    SAME ``_mdd_fold`` and the same one-long-per-key state, managed
    through an explicit ValueState handle instead of the
    applyInPandasWithState GroupState tuple, so the two APIs are
    hash-comparable against the identical batch oracle. What the
    migration buys at scale (once the runtime is usable, see
    :func:`tws_available`): per-state TTL instead of hand-rolled
    timeout folds, event-time TIMERS that would replace the OOO
    variants' manual re-sort buffer re-arm logic, multiple independent
    state variables per key (column families) instead of one packed
    tuple, and in-place state schema evolution."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _MDDProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._peak = handle.getValueState("peak", _MDD_STATE)

        def handleInputRows(self, key, rows, timerValues):
            cur = self._peak.get()
            peak = cur[0] if cur is not None else None
            pdf = _concat_sorted(rows)
            if not len(pdf):
                return
            v = pdf["value"].mul(100).round().astype("int64").to_numpy()
            peak, row = _mdd_fold(peak, v)
            self._peak.update((peak,))
            yield pd.DataFrame([{"event_type": key[0], **row}])

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=_MDDProcessor(),
            outputStructType=_MDD_OUT,
            outputMode="append",
            timeMode="none",
        )
    )


_MDD_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("peak", T.LongType()),
    ]
)


def _update_mdd_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, peak = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
        )
    else:
        buf = (np.empty(0, np.int64),) * 3
        peak = None
    new = None if state.hasTimedOut else _new_rows(pdfs, "int64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        peak, row = _mdd_fold(peak, released[2])
        yield pd.DataFrame([{"event_type": key[0], **row}])
    _rearm_or_clear(
        state, kept[0],
        (kept[0].tolist(), kept[1].tolist(), kept[2].tolist(), peak),
    )


def mdd_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """Max-drawdown partials over an OUT-OF-ORDER stream: the drawdown
    of a row depends on the peak of everything BEFORE it, so the
    watermark-delayed re-sort fronts the same shared _mdd_fold —
    shuffled arrival hash-matches the in-order run and the batch
    oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_mdd_ooo,
            outputStructType=_MDD_OUT,
            stateStructType=_MDD_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming realized volatility: per-(key, day) squared increments,
# two longs of carried state
# ---------------------------------------------------------------------------

_RV_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day_ord", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("rv", T.LongType()),
    ]
)

_RV_STATE = T.StructType(
    [
        T.StructField("last_day", T.LongType()),
        T.StructField("last_c", T.LongType()),
    ]
)

_US_PER_DAY = 86_400_000_000


def _rv_fold(last_day: int | None, last_c: int, days: "np.ndarray", v: "np.ndarray"):
    """One batch of ordered (day ordinal, cents) into per-day realized
    variance partials. An increment exists only between consecutive
    ticks of the SAME day (day boundaries restart the series — the
    overnight gap is not intraday variance), so the carried state is
    just the last (day, cents). Returns (new last_day, new last_c,
    list of partial dicts). Shared by the in-order and OOO folds."""
    import numpy as np

    sentinel = np.int64(-(1 << 62))
    prev_day = np.concatenate(
        [np.asarray([last_day if last_day is not None else sentinel], np.int64),
         days[:-1]]
    )
    prev_c = np.concatenate([np.asarray([last_c], np.int64), v[:-1]])
    valid = prev_day == days
    dy = np.where(valid, v - prev_c, 0)
    uniq, inv = np.unique(days, return_inverse=True)
    n = np.zeros(len(uniq), np.int64)
    np.add.at(n, inv, valid.astype(np.int64))
    amax = float(np.abs(dy).max()) if len(dy) else 0.0
    if amax * amax * len(dy) < float(1 << 62):
        # int64 accumulation provably cannot wrap for this batch
        rv = np.zeros(len(uniq), np.int64)
        np.add.at(rv, inv, dy * dy)
        rv = [int(x) for x in rv]
    else:
        # arbitrary-precision fallback: numpy int64 wraps SILENTLY on
        # overflow; Python ints cannot. A batch-day partial that still
        # exceeds int64 can't ride the LongType output schema — fail
        # LOUDLY (the cure is smaller micro-batches or sub-day keys),
        # never emit a wrapped value.
        rv = [0] * len(uniq)
        for i, d in zip(inv.tolist(), dy.tolist()):
            rv[i] += d * d
        if any(x >= (1 << 63) for x in rv):
            raise OverflowError(
                "realized-variance batch partial exceeds int64 — reduce "
                "micro-batch size; the cross-batch combine is DECIMAL(38,0)"
            )
    rows = [
        {"day_ord": int(d), "n": int(cn), "rv": int(cr)}
        for d, cn, cr in zip(uniq, n, rv)
        if cn > 0
    ]
    return int(days[-1]), int(v[-1]), rows


def _update_rv(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online daily realized variance: squared same-day increments are
    associative once the boundary tick is carried, so state is two
    longs per key (last day ordinal, last cents) and each batch emits
    one int64 partial per day it touched; the final combine sums
    per (key, day) in DECIMAL(38,0), so the whole path is integer-
    exact end to end."""
    last_day, last_c = state.get if state.exists else (None, 0)
    pdf = _concat_sorted(pdfs)
    if not len(pdf):
        if last_day is not None:
            state.update((last_day, last_c))
        return
    days = _ts_us(pdf["ts"]) // _US_PER_DAY
    v = pdf["value"].mul(100).round().astype("int64").to_numpy()
    last_day, last_c, rows = _rv_fold(last_day, last_c, days, v)
    state.update((last_day, last_c))
    if rows:
        yield pd.DataFrame([{"event_type": key[0], **r} for r in rows])


def rv_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Per-event_type streaming realized-variance partials;
    in-order-per-key replay contract as for ewma_stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_rv,
            outputStructType=_RV_OUT,
            stateStructType=_RV_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_RV_OOO_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
        T.StructField("last_day", T.LongType()),
        T.StructField("last_c", T.LongType()),
    ]
)


def _update_rv_ooo(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bts, beid, bc, last_day, last_c = state.get
        buf = (
            np.asarray(bts, np.int64),
            np.asarray(beid, np.int64),
            np.asarray(bc, np.int64),
        )
    else:
        buf = (np.empty(0, np.int64),) * 3
        last_day, last_c = None, 0
    new = None if state.hasTimedOut else _new_rows(pdfs, "int64")
    released, kept = _buffer_release(state, buf, new)
    if len(released[0]):
        days = released[0] // _US_PER_DAY
        last_day, last_c, rows = _rv_fold(last_day, last_c, days, released[2])
        if rows:
            yield pd.DataFrame([{"event_type": key[0], **r} for r in rows])
    _rearm_or_clear(
        state, kept[0],
        (kept[0].tolist(), kept[1].tolist(), kept[2].tolist(), last_day, last_c),
    )


def rv_stream_ooo(events: DataFrame, watermark: str) -> DataFrame:
    """Realized-variance partials over an OUT-OF-ORDER stream: the
    increment pairing is order-defined within each day, so the
    watermark-delayed re-sort fronts the same shared _rv_fold —
    shuffled arrival hash-matches the in-order run and the batch
    oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_rv_ooo,
            outputStructType=_RV_OUT,
            stateStructType=_RV_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming sweep line: live per-day peak interval concurrency
# ---------------------------------------------------------------------------

_CONC_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("max_concurrent", T.LongType()),
    ]
)
# re-sort buffer + pending interval ends + the running sweep
_CONC_STATE = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("pend_end", T.ArrayType(T.LongType())),
        T.StructField("conc", T.LongType()),
        T.StructField("cur_day", T.LongType()),
        T.StructField("cur_max", T.LongType()),
    ]
)

_DAY_US = 86_400_000_000


def _day_str(day_idx: int) -> str:
    return pd.Timestamp(day_idx * 86_400, unit="s").strftime("%Y-%m-%d")


def _conc_sweep(
    carry: tuple[int, int, int],
    starts_us: "np.ndarray",
    ends_now_us: "np.ndarray",
    final_day_excl: int | None,
) -> tuple[tuple[int, int, int], list[tuple[str, int]]]:
    """Fold (+1 at each start, -1 at each processable end) into the
    running sweep. Deltas at the SAME microsecond net together before
    the peak test (the oracle's per-t grouping). Days strictly below
    ``final_day_excl`` are complete and emit; the top day's running
    (day, max) stays in the carry. ``final_day_excl=None`` = drain
    everything (end of stream)."""
    conc, cur_day, cur_max = carry
    ts = np.concatenate((starts_us, ends_now_us))
    delta = np.concatenate(
        (
            np.ones(len(starts_us), np.int64),
            -np.ones(len(ends_now_us), np.int64),
        )
    )
    out: list[tuple[str, int]] = []
    if len(ts):
        order = np.argsort(ts, kind="stable")
        ts, delta = ts[order], delta[order]
        uts, idx = np.unique(ts, return_index=True)
        net = np.add.reduceat(delta, idx)
        concs = conc + np.cumsum(net)
        days = uts // _DAY_US
        conc = int(concs[-1])
        for d in np.unique(days):
            seg_max = int(concs[days == d].max())
            if cur_day >= 0 and d != cur_day:
                out.append((_day_str(cur_day), cur_max))
                cur_day, cur_max = -1, 0
            if cur_day == int(d):
                cur_max = max(cur_max, seg_max)
            else:
                cur_day, cur_max = int(d), seg_max
    if cur_day >= 0 and (final_day_excl is None or cur_day < final_day_excl):
        out.append((_day_str(cur_day), cur_max))
        cur_day, cur_max = -1, 0
    return (conc, cur_day, cur_max), out


def _update_interval_concurrency(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sweep-line state machine per key: the re-sort buffer releases
    starts in exact (ts, event_id) order; each start's interval end
    (ts + (event_id % 14 + 1) minutes) parks in the pending-ends array
    until the watermark passes it (no future start can precede a
    sub-watermark end, so processing is safe exactly then). State is
    O(reorder window + active intervals) — the inherent sweep-line
    frontier — and each finished day's peak emits append-mode."""
    if state.exists:
        bts, beid, pend, conc, cur_day, cur_max = state.get
        buf = (np.asarray(bts, np.int64), np.asarray(beid, np.int64))
        pend = np.asarray(pend, np.int64)
    else:
        buf = (np.empty(0, np.int64),) * 2
        pend = np.empty(0, np.int64)
        conc, cur_day, cur_max = 0, -1, 0
    new = None if state.hasTimedOut else _new_rows(pdfs, None)
    released, kept = _buffer_release(state, buf, new)
    ends_new = released[0] + (released[1] % 14 + 1) * 60_000_000
    pend = np.sort(np.concatenate((pend, ends_new)))
    # The drain is watermark-respecting on EVERY path, timeout or not:
    # a mid-stream timeout (a micro-batch with no rows for this key
    # while the watermark advanced) must do exactly what a data batch
    # would — never early-apply ends beyond the watermark or emit the
    # open day. Finality needs no special case because the OOO
    # sentinel advances the watermark past every reachable interval
    # end AND the following midnight (see _ooo_slices), after which
    # this same path naturally drains everything.
    wm_us = state.getCurrentWatermarkMs() * 1000
    cut = np.searchsorted(pend, wm_us)
    ends_now, pend_keep = pend[:cut], pend[cut:]
    final_day_excl = wm_us // _DAY_US
    (conc, cur_day, cur_max), done = _conc_sweep(
        (conc, cur_day, cur_max), released[0], ends_now, final_day_excl
    )
    if done:
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "day": [d for d, _ in done],
                "max_concurrent": [m for _, m in done],
            }
        )
    # Re-arm only while the key still holds work (buffered starts,
    # pending ends, or an open day) — the _rearm_or_clear discipline.
    # A fully drained key REMOVES its state row instead of persisting
    # an empty one: with no timeout armed an empty row would sit in
    # the store forever — a leak once the grouping key is
    # higher-cardinality than event_type. A late straggler after
    # removal re-creates the key from scratch, which the
    # watermark-respecting drain handles identically.
    if len(kept[0]) or len(pend_keep) or cur_day >= 0:
        state.update(
            (
                kept[0].tolist(),
                kept[1].tolist(),
                pend_keep.tolist(),
                conc,
                cur_day,
                cur_max,
            )
        )
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    else:
        state.remove()


def interval_concurrency_stream_ooo(
    events: DataFrame, watermark: str
) -> DataFrame:
    """Per-day peak in-flight intervals over an OUT-OF-ORDER stream:
    the batch sweep line (q_interval_concurrency's shape) as live
    bounded state. Hash-matches the direct SQL sweep whenever lateness
    stays within ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_interval_concurrency,
            outputStructType=_CONC_OUT,
            stateStructType=_CONC_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming deadline funnel: the per-user conversion machine in 4 longs
# ---------------------------------------------------------------------------

_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("v_us", T.LongType()),
        T.StructField("c_us", T.LongType()),
        T.StructField("p_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)
_FUNNEL_STATE = T.StructType(
    [
        T.StructField("v_us", T.LongType()),
        T.StructField("c_us", T.LongType()),
        T.StructField("p_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def make_funnel_deadline_update(click_us: int, buy_us: int):
    """Per-user deadline-funnel state machine: first view sets v, the
    first click in (v, v + click_us] sets c, the first purchase in
    (c, c + buy_us] sets p — processed in exact (ts, event_id) order,
    so the sequential machine computes precisely the batch
    q_funnel_deadline stage times. FOUR longs of state per user on an
    unbounded stream; one updated row per key per batch it appears in
    (n, the events-processed count, is monotone — the final row per
    key is max_by n)."""

    def _update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        v, c, p, n = state.get if state.exists else (None, None, None, 0)
        pdf = _concat_sorted(pdfs)
        if not len(pdf):
            state.update((v, c, p, n))
            return
        us = _ts_us(pdf["ts"])
        kinds = pdf["event_type"].to_numpy()
        for t, kind in zip(us, kinds):
            t = int(t)
            if kind == "view":
                if v is None:
                    v = t
            elif kind == "click":
                if v is not None and c is None and v < t <= v + click_us:
                    c = t
            elif kind == "purchase":
                if c is not None and p is None and c < t <= c + buy_us:
                    p = t
        n += len(pdf)
        state.update((v, c, p, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "v_us": [v],
                "c_us": [c],
                "p_us": [p],
                "n": [n],
            }
        )

    return _update


def funnel_deadline_stream(
    events: DataFrame, click_us: int, buy_us: int, watermark: str = "4 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_deadline_update(click_us, buy_us),
            outputStructType=_FUNNEL_OUT,
            stateStructType=_FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
