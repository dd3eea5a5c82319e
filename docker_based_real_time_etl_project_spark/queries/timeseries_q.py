"""Advanced time-series surface: as-of join, hypertable-style cascading
rollup, batch session windows.

The reference's stream pairing is implicit (each poll carries the
latest quote snapshot at poll time -- etl.py ticker/price flows) and
its only rollup grain is the pre-computed 1 h kline (etl.py:228
interval='1h'). Here both are computed from raw rows, in the shapes
that survive 100 TB: the as-of join shuffles |L|+|R| rows exactly
once; the rollup cascade re-aggregates bars (not raw events) at each
coarser grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.operators.aggregates import rollup_bars
from docker_based_real_time_etl_project_spark.operators.asof import (
    asof_join_backward, asof_join_backward_same_source,
)
from docker_based_real_time_etl_project_spark.queries.registry import (
    DEC, dround, dsum, register, sql_dround, sql_dsum, table,
)


@register(
    "q_join_asof",
    oracle="""
    WITH trades AS (
      SELECT event_id AS trade_id, user_id, ts AS trade_ts, value AS trade_value
      FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, event_id AS quote_id, value AS quote_value
      FROM events WHERE event_type = 'view'
    )
    SELECT t.trade_id, t.user_id,
           epoch_us(t.trade_ts) AS trade_ts_us, t.trade_value,
           q.quote_id, q.quote_value,
           epoch_us(t.trade_ts) - epoch_us(q.ts) AS quote_age_us
    FROM trades t
    LEFT JOIN LATERAL (
      SELECT quote_id, quote_value, ts
      FROM quotes q
      WHERE q.user_id = t.user_id AND q.ts <= t.trade_ts
      ORDER BY q.ts DESC, q.quote_id DESC LIMIT 1
    ) q ON TRUE
    """,
    tags=("join", "timeseries"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase paired with the user's most recent
    view at-or-before it (the point-in-time quote attach). Both sides
    are predicates over the ONE events stream — the reference's own
    pairing shape — so this runs the same-source carry-forward form:
    one scan, one shuffle, no pair blow-up (operators/asof.py;
    measured ~2x the two-scan form). The two-table general operator
    stays exercised by q_join_asof_tol. The oracle is the O(n^2)
    LATERAL formulation."""
    e = table(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    out = asof_join_backward_same_source(
        ev,
        on=["user_id"],
        ts_col="ts",
        is_left=F.col("event_type") == "purchase",
        carry={"event_id": "quote_id", "value": "quote_value", "ts": "quote_ts"},
        right_tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("trade_id"),
        "user_id",
        F.unix_micros("ts").alias("trade_ts_us"),
        F.col("value").alias("trade_value"),
        "quote_id",
        "quote_value",
        (F.unix_micros("ts") - F.unix_micros("quote_ts")).alias("quote_age_us"),
    )


@register(
    "q_rollup_cascade",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           MIN_BY(value, ts) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX_BY(value, ts) AS close_value,
           {sql_dsum('value')} AS volume,
           COUNT(*) AS n_trades
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
    tags=("timeseries", "rollup"),
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: 1 m bars from raw
    events, rolled to 1 h, rolled to 1 d -- the daily bars must equal a
    direct single-pass daily OHLCV (the oracle). Volume stays DECIMAL
    through both rollups so the re-sums are exact and order-free; each
    cascade level aggregates a table ~60x smaller than the one below."""
    e = table(spark, sf_dir, "events")
    minute = (
        e.groupBy("event_type", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.min_by("value", "ts").alias("open_price"),
            F.max("value").alias("high_price"),
            F.min("value").alias("low_price"),
            F.max_by("value", "ts").alias("close_price"),
            F.sum(F.col("value").cast(DEC)).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            "event_type", F.col("w.start").alias("open_time"),
            "open_price", "high_price", "low_price", "close_price",
            "volume", "n_trades",
        )
    )
    hour = rollup_bars(minute, ["event_type"], "1 hour")
    day = rollup_bars(hour, ["event_type"], "1 day")
    return day.select(
        "event_type",
        F.date_format("open_time", "yyyy-MM-dd").alias("day"),
        F.col("open_price").alias("open_value"),
        F.col("high_price").alias("high_value"),
        F.col("low_price").alias("low_value"),
        F.col("close_price").alias("close_value"),
        # decimal -> double via the string hop (see functions.dsum)
        F.col("volume").cast("string").cast("double").alias("volume"),
        "n_trades",
    )


@register(
    "q_session_window",
    oracle=f"""
    WITH ord AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM ord
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    tags=("window", "timeseries"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user activity sessions with a 30 min
    inactivity gap via ``session_window`` (the streaming twin is
    q_stream_session_window). The oracle reconstructs identical
    sessions gaps-and-islands style. One shuffle on user_id; session
    merge happens inside the aggregate, no self-join."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Gap-filled hourly bars (time_bucket_gapfill + locf shape)
# ---------------------------------------------------------------------------

@register(
    "q_gap_fill",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             MAX_BY(value, ts) AS close_value, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(MIN(bucket), MAX(bucket), INTERVAL 1 HOUR)) AS bucket
      FROM bars GROUP BY event_type
    ),
    joined AS (
      SELECT s.event_type, s.bucket, b.close_value,
             COALESCE(b.n_events, 0) AS n_events
      FROM spine s LEFT JOIN bars b USING (event_type, bucket)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           n_events,
           n_events = 0 AS is_gap,
           LAST_VALUE(close_value IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY bucket) AS filled_close
    FROM joined
    """,
    tags=("timeseries",),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly close series with carry-forward (the
    time_bucket_gapfill + locf shape a hypertable user expects): every
    hour between each key's first and last bar exists in the output,
    empty hours are flagged and carry the last real close.

    Scale shape: raw events are scanned and aggregated ONCE (map-side
    partials); each key's bars then fold into a bucket→bar map on a
    single per-key row, so the spine (sequence+explode between the
    min/max scalars) fills by MAP LOOKUP instead of a second scan +
    join — the naive bars-join-spine form reads the fact table twice.
    Map size is bounded by hours-spanned per key (~10k/year), never by
    raw rows. The fill window re-uses the per-key partitioning, so the
    whole query is two exchanges and one scan. (event_type, ts) is
    verified-unique in testdata, making MAX_BY deterministic.
    """
    bars = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.max_by("value", "ts").alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    per_key = bars.groupBy("event_type").agg(
        F.min("bucket").alias("b0"),
        F.max("bucket").alias("b1"),
        F.map_from_entries(
            F.collect_list(F.struct("bucket", F.struct("close_value", "n_events")))
        ).alias("bar_map"),
    )
    spine = per_key.select(
        "event_type",
        F.explode(F.expr("sequence(b0, b1, interval 1 hour)")).alias("bucket"),
        "bar_map",
    )
    bar = F.col("bar_map")[F.col("bucket")]
    w = Window.partitionBy("event_type").orderBy("bucket")
    return spine.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce(bar.n_events, F.lit(0)).alias("n_events"),
        (F.coalesce(bar.n_events, F.lit(0)) == 0).alias("is_gap"),
        F.last(bar.close_value, ignorenulls=True).over(w).alias("filled_close"),
    )


# ---------------------------------------------------------------------------
# Round 4: interpolated gap fill, TWAP, bounded-staleness as-of
# ---------------------------------------------------------------------------

@register(
    "q_gap_fill_interp",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             MAX_BY(value, ts) AS close_value, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(MIN(bucket), MAX(bucket), INTERVAL 1 HOUR)) AS bucket
      FROM bars GROUP BY event_type
    ),
    joined AS (
      SELECT s.event_type, s.bucket, b.close_value,
             COALESCE(b.n_events, 0) AS n_events
      FROM spine s LEFT JOIN bars b USING (event_type, bucket)
    ),
    f AS (
      SELECT event_type, bucket, n_events, close_value,
             LAST_VALUE(close_value IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket) AS prev_close,
             LAST_VALUE(CASE WHEN close_value IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket) AS prev_us,
             FIRST_VALUE(close_value IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_close,
             FIRST_VALUE(CASE WHEN close_value IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
      FROM joined
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           n_events,
           n_events = 0 AS is_gap,
           CAST(CAST(ROUND(CAST(
             CASE WHEN close_value IS NOT NULL THEN close_value
                  ELSE prev_close + (next_close - prev_close)
                       * ((epoch_us(bucket) - prev_us) / (next_us - prev_us))
             END AS DECIMAL(25,10)), 6) AS VARCHAR) AS DOUBLE) AS interp_close
    FROM f
    """,
    tags=("timeseries",),
)
def q_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly close series with LINEAR INTERPOLATION (the
    hypertable ``interpolate()`` companion to q_gap_fill's locf): empty
    hours get the straight line between the bracketing real closes,
    weighted by time position within the gap.

    Same one-scan shape as q_gap_fill (bars -> per-key map -> exploded
    spine); the bracketing values come from two frames over the SAME
    per-key partitioning (running last + forward-looking first), so no
    extra exchange. Brackets always exist inside the spine because the
    spine spans [first real bar, last real bar]. The interpolation
    fraction is integer-microsecond arithmetic divided in double --
    bit-identical cross-engine -- and the result snaps through
    DECIMAL(25,10) before the 6-digit round (functions.dround).
    """
    bars = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.max_by("value", "ts").alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    per_key = bars.groupBy("event_type").agg(
        F.min("bucket").alias("b0"),
        F.max("bucket").alias("b1"),
        F.map_from_entries(
            F.collect_list(F.struct("bucket", F.struct("close_value", "n_events")))
        ).alias("bar_map"),
    )
    spine = per_key.select(
        "event_type",
        F.explode(F.expr("sequence(b0, b1, interval 1 hour)")).alias("bucket"),
        "bar_map",
    )
    bar = F.col("bar_map")[F.col("bucket")]
    bucket_us = F.unix_micros("bucket")
    wb = Window.partitionBy("event_type").orderBy("bucket")
    wf = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    real_close = bar.close_value
    real_us = F.when(real_close.isNotNull(), bucket_us)
    staged = spine.select(
        "event_type",
        "bucket",
        F.coalesce(bar.n_events, F.lit(0)).alias("n_events"),
        real_close.alias("close_value"),
        F.last(real_close, ignorenulls=True).over(wb).alias("prev_close"),
        F.last(real_us, ignorenulls=True).over(wb).alias("prev_us"),
        F.first(real_close, ignorenulls=True).over(wf).alias("next_close"),
        F.first(real_us, ignorenulls=True).over(wf).alias("next_us"),
    )
    frac = (bucket_us - F.col("prev_us")) / (F.col("next_us") - F.col("prev_us"))
    interp = F.when(F.col("close_value").isNotNull(), F.col("close_value")).otherwise(
        F.col("prev_close") + (F.col("next_close") - F.col("prev_close")) * frac
    )
    return staged.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_events",
        (F.col("n_events") == 0).alias("is_gap"),
        dround(interp, 6).alias("interp_close"),
    )


@register(
    "q_twap",
    oracle="""
    WITH seg AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT event_type,
           CAST(CAST(ROUND(CAST(
             CAST(CAST(SUM(CAST(cents * dt_us AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(dt_us AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
             / 100.0
           AS DECIMAL(25,10)), 6) AS VARCHAR) AS DOUBLE) AS twap,
           CAST(SUM(dt_us) // 1000000 AS BIGINT) AS span_s,
           COUNT(*) AS n_segments
    FROM seg WHERE dt_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "agg"),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per key over irregular samples (the
    hypertable ``time_weight`` shape): each observation is weighted by
    how long it was the latest one, TWAP = sum(value_i * dt_i) / sum(dt_i)
    with dt from LEAD over the verified-unique (event_type, ts) order.

    Numerator and denominator accumulate as integer cents x integer
    microseconds in DECIMAL(38,0) -- exact and associative, so Spark's
    nondeterministic partial-agg order cannot drift the result; the one
    double division happens after both sums are exact, through the
    VARCHAR hop (functions._dec_to_double) so the >2^53 numerator
    converts identically in both engines. One window + one agg = two
    exchanges on the same key.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts")
    seg = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    num = F.sum((F.col("cents") * F.col("dt_us")).cast("decimal(38,0)"))
    den = F.sum(F.col("dt_us").cast("decimal(38,0)"))
    twap = num.cast("string").cast("double") / den.cast("string").cast("double") / 100.0
    return seg.groupBy("event_type").agg(
        dround(twap, 6).alias("twap"),
        # exact integer division in BOTH engines (oracle uses //): the
        # double path rounds 0.999999x across the integer boundary
        # differently than truncation
        F.expr("sum(dt_us) div 1000000").alias("span_s"),
        F.count(F.lit(1)).alias("n_segments"),
    )


@register(
    "q_join_asof_tol",
    oracle="""
    WITH trades AS (
      SELECT event_id AS trade_id, user_id, ts AS trade_ts, value AS trade_value
      FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, event_id AS quote_id, value AS quote_value
      FROM events WHERE event_type = 'view'
    )
    SELECT t.trade_id, t.user_id,
           epoch_us(t.trade_ts) AS trade_ts_us, t.trade_value,
           q.quote_id, q.quote_value,
           epoch_us(t.trade_ts) - epoch_us(q.ts) AS quote_age_us
    FROM trades t
    LEFT JOIN LATERAL (
      SELECT quote_id, quote_value, ts
      FROM quotes q
      WHERE q.user_id = t.user_id AND q.ts <= t.trade_ts
        AND q.ts >= t.trade_ts - INTERVAL 1 HOUR
      ORDER BY q.ts DESC, q.quote_id DESC LIMIT 1
    ) q ON TRUE
    """,
    tags=("join", "timeseries"),
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1 h staleness bound (pandas merge_asof
    ``tolerance``): a purchase with no view in the trailing hour keeps
    NULL quote columns instead of attaching an arbitrarily old one.
    Same single-shuffle union-and-carry plan as q_join_asof -- the bound
    is a post-window predicate on the carried tuple, not a join
    condition, so no extra exchange and no pair blow-up."""
    e = table(spark, sf_dir, "events")
    trades = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("trade_id"),
        "user_id",
        F.col("ts").alias("trade_ts"),
        F.col("value").alias("trade_value"),
    )
    quotes = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("quote_id"),
        F.col("value").alias("quote_value"),
    )
    out = asof_join_backward(
        trades,
        quotes,
        on=["user_id"],
        left_ts="trade_ts",
        right_ts="ts",
        carry={"quote_id": "quote_id", "quote_value": "quote_value", "ts": "quote_ts"},
        right_tiebreak="quote_id",
        tolerance="1 HOUR",
    )
    return out.select(
        "trade_id",
        "user_id",
        F.unix_micros("trade_ts").alias("trade_ts_us"),
        "trade_value",
        "quote_id",
        "quote_value",
        (F.unix_micros("trade_ts") - F.unix_micros("quote_ts")).alias("quote_age_us"),
    )


# shared with the streaming mirror (q_stream_ewma): both forms are
# held to the identical ordered-fold truth
_EWMA_ORACLE = """
    WITH o AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             array_agg(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(ROUND(list_reduce(vals, (acc, x) -> acc * 0.8 + 0.2 * x)
                      * 1000000) AS BIGINT) AS ewma_micro
    FROM o
    """


@register("q_ewma", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.2) of `value`
    per (event_type, day), the classic exchange-ticker smoother the
    reference's kline/ticker surface (etl.py:146-171, 227-233 —
    1 h klines and 24 h ticker stats) implies but never computes. The
    recursion y_t = 0.2*x_t + 0.8*y_{t-1} (y_1 = x_1) is inherently
    sequential in event order, so it runs as ONE ordered left fold per
    group: array_agg in exact (ts, event_id) order, then
    F.aggregate — the same IEEE-754 operation sequence DuckDB's
    list_reduce executes, so the doubles are BIT-identical before the
    micro-unit snap (no reliance on associativity, which EWMA doesn't
    have). Scale shape: one hash exchange on (event_type, day); each
    group's history is one array in one task — bounded by the grain
    (a day of one symbol), never the corpus; finer grains shrink the
    array, and no window ever sees SinglePartition."""
    d = table(spark, sf_dir, "events")
    o = (
        d.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.struct("ts", "event_id", F.col("value").cast("double").alias("v")).alias(
                "s"
            ),
        )
        .groupBy("event_type", "day")
        .agg(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["v"]).alias(
                "vals"
            )
        )
    )
    fold = F.aggregate(
        F.expr("slice(vals, 2, size(vals) - 1)"),
        F.element_at("vals", 1),
        lambda acc, x: acc * F.lit(0.8) + F.lit(0.2) * x,
    )
    return o.select(
        "event_type",
        "day",
        F.size("vals").cast("bigint").alias("n_events"),
        F.round(fold * 1e6).cast("bigint").alias("ewma_micro"),
    )


# shared with the streaming mirror (q_stream_rsi)
_RSI_ORACLE = """
    WITH o AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    d AS (
      SELECT event_type, ts, event_id,
             cents - LAG(cents) OVER w AS diff,
             ROW_NUMBER() OVER w AS rn
      FROM o
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (
      SELECT event_type, ts, rn,
             SUM(GREATEST(diff, 0)) OVER w14 AS sg,
             SUM(GREATEST(-diff, 0)) OVER w14 AS sl
      FROM d
      WINDOW w14 AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(100000000 * sg // NULLIF(sg + sl, 0) AS BIGINT) AS rsi_micro
    FROM g WHERE rn >= 15
    """


@register("q_rsi", oracle=_RSI_ORACLE, tags=("timeseries", "window"))
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI (Cutler's simple-average form) per event_type —
    the momentum oscillator of the reference's exchange domain
    (its kline close series, etl.py:146-158, is RSI's usual input).
    Exactness: price deltas become integer CENTS before any window
    math, so the 14-row sliding sums are exact integers (no
    incremental-float window-sum drift between engines) and
    rsi_micro = 100e6 * gains // (gains + losses) is one integer
    division — flat windows (gains+losses = 0) yield NULL via the
    same NULLIF in both engines. One hash exchange on event_type;
    both windows share its partitioning (ts, event_id order), so the
    lag and the sliding sums pipeline in a single sort."""
    d = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = d.select("event_type", "ts", "event_id", cents.alias("cents"))
    dd = o.select(
        "event_type", "ts", "event_id",
        (F.col("cents") - F.lag("cents").over(w)).alias("diff"),
        F.row_number().over(w).alias("rn"),
    )
    w14 = w.rowsBetween(-13, Window.currentRow)
    g = dd.select(
        "event_type", "ts", "rn",
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(w14).alias("sg"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(w14).alias("sl"),
    )
    return g.filter(F.col("rn") >= 15).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.expr("CAST(100000000 * sg div NULLIF(sg + sl, 0) AS BIGINT)").alias(
            "rsi_micro"
        ),
    )


# shared with the streaming mirror (q_stream_vwap)
_VWAP_ORACLE = """
    WITH o AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      FROM events
    )
    SELECT event_type, hour,
           CAST(SUM(vol) AS BIGINT) AS total_vol,
           CAST(SUM(cents * vol) * 10000 // NULLIF(SUM(vol), 0) AS BIGINT)
             AS vwap_micro
    FROM o GROUP BY event_type, hour
    """


@register("q_vwap", oracle=_VWAP_ORACLE, tags=("timeseries", "window"))
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly VWAP per event_type (volume from the props JSON payload
    — the reference's klines carry exactly this volume column,
    etl.py:152,157): Σ(price x volume)/Σvolume
    entirely in integers — prices become cents, the weighted sum and
    the volume sum are exact, and vwap_micro is ONE integer division
    (zero-volume hours NULL via the same NULLIF both engines run).
    One hash aggregation; map-side partials carry two longs."""
    d = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    vol = F.get_json_object("props", "$.k").cast("bigint")
    return (
        d.select(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            cents.alias("cents"),
            vol.alias("vol"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.sum("vol").cast("bigint").alias("total_vol"),
            F.expr("CAST(sum(cents * vol) * 10000 div NULLIF(sum(vol), 0) AS BIGINT)")
            .alias("vwap_micro"),
        )
    )


# shared with the streaming mirror (q_stream_bollinger)
_BOLL_ORACLE = """
    WITH o AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    w AS (
      SELECT event_type, ts,
             ROW_NUMBER() OVER win AS rn,
             SUM(c) OVER w20 AS s,
             SUM(c * c) OVER w20 AS s2,
             COUNT(*) OVER w20 AS n
      FROM o
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id),
             w20 AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(s * 10000 // n AS BIGINT) AS mean_micro,
           CAST(ROUND(SQRT(CAST(n * s2 - s * s AS DOUBLE)) / n * 10000)
                AS BIGINT) AS sd_micro
    FROM w WHERE rn >= 20
    """


@register("q_bollinger", oracle=_BOLL_ORACLE, tags=("timeseries", "window"))
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-period Bollinger statistics per event_type: rolling mean and
    population stddev of the price, from which the bands are mean ±
    2σ. Exactness: the sliding sums Σc and Σc² are INTEGER cents
    (incremental window arithmetic cannot drift), the mean is one
    integer division, and σ touches floating point exactly once —
    sqrt(n·Σc² − (Σc)²) of an exact integer, where IEEE sqrt is
    correctly rounded and therefore engine-identical — before the
    micro snap. Same single sort/exchange serves the row-number
    and the sliding window."""
    d = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w20 = w.rowsBetween(-19, Window.currentRow)
    o = d.select("event_type", "ts", "event_id", cents.alias("c"))
    g = o.select(
        "event_type", "ts",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w20).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w20).alias("s2"),
        F.count(F.lit(1)).over(w20).alias("n"),
    )
    return g.filter(F.col("rn") >= 20).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.expr("CAST(s * 10000 div n AS BIGINT)").alias("mean_micro"),
        F.round(
            F.sqrt((F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double"))
            / F.col("n")
            * 10000
        )
        .cast("bigint")
        .alias("sd_micro"),
    )


# shared with the streaming mirror (q_stream_macd)
_MACD_ORACLE = """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             array_agg(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1, 2
    ),
    closes AS (
      SELECT event_type, array_agg(vals[len(vals)] ORDER BY day) AS cs
      FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(len(cs) AS BIGINT) AS n_days,
           CAST(ROUND((list_reduce(cs, (a, x) -> a * (1 - 2.0/13.0) + (2.0/13.0) * x)
                     - list_reduce(cs, (a, x) -> a * (1 - 2.0/27.0) + (2.0/27.0) * x))
                      * 1000000) AS BIGINT) AS macd_micro
    FROM closes
    """


@register("q_macd", oracle=_MACD_ORACLE, tags=("timeseries", "window"))
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD line (EMA-12 minus EMA-26 of daily closes) per event_type,
    completing the indicator set over the reference's kline domain
    (etl.py:146-158). Daily close = last value of the day in exact
    (ts, event_id) order; both EMAs are ordered left folds whose IEEE
    operation sequence — including the constant-folded 2.0/13.0 and
    2.0/27.0 alphas — is identical in F.aggregate and DuckDB's
    list_reduce, so the doubles bit-agree before the single micro
    snap. Two narrow aggregations (day grain, then type grain);
    per-type state is one array of daily closes — bounded by the
    calendar, not the corpus."""
    d = table(spark, sf_dir, "events")
    daily = (
        d.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.struct("ts", "event_id", F.col("value").cast("double").alias("v")).alias(
                "s"
            ),
        )
        .groupBy("event_type", "day")
        .agg(
            F.element_at(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["v"]), -1
            ).alias("close")
        )
    )
    closes = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "close"))), lambda s: s["close"]
        ).alias("cs")
    )

    def ema(alpha_num: float, alpha_den: float):
        a = F.lit(alpha_num) / F.lit(alpha_den)
        return F.aggregate(
            F.expr("slice(cs, 2, size(cs) - 1)"),
            F.element_at("cs", 1),
            lambda acc, x: acc * (F.lit(1.0) - a) + a * x,
        )

    return closes.select(
        "event_type",
        F.size("cs").cast("bigint").alias("n_days"),
        F.round((ema(2.0, 13.0) - ema(2.0, 27.0)) * 1e6).cast("bigint").alias(
            "macd_micro"
        ),
    )


@register(
    "q_join_asof_forward",
    oracle="""
    WITH trades AS (
      SELECT event_id AS trade_id, user_id, ts AS trade_ts, value AS trade_value
      FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, event_id AS quote_id, value AS quote_value
      FROM events WHERE event_type = 'view'
    )
    SELECT t.trade_id, t.user_id,
           epoch_us(t.trade_ts) AS trade_ts_us, t.trade_value,
           q.quote_id, q.quote_value,
           epoch_us(q.ts) - epoch_us(t.trade_ts) AS response_lag_us
    FROM trades t
    LEFT JOIN LATERAL (
      SELECT quote_id, quote_value, ts
      FROM quotes q
      WHERE q.user_id = t.user_id AND q.ts >= t.trade_ts
        AND q.ts <= t.trade_ts + INTERVAL 48 HOUR
      ORDER BY q.ts ASC, q.quote_id DESC LIMIT 1
    ) q ON TRUE
    """,
    tags=("join", "timeseries"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'):
    every purchase paired with the user's NEXT view at-or-after it,
    bounded to a 48 h look-ahead — the "what happened after the
    event" attach (market response, post-purchase engagement) the
    backward family cannot express. Same union-and-carry machinery as
    q_join_asof run in DESCENDING time order (operators/asof.py
    asof_join_forward): one keyed sort over |L|+|R|, no pair blow-up;
    the oracle is the O(n^2) LATERAL formulation with the mirrored
    inequality. Equal-timestamp ties resolve to the greatest quote id
    on both sides; lags ride exact epoch-micro integers."""
    from docker_based_real_time_etl_project_spark.operators.asof import (
        asof_join_forward,
    )

    e = table(spark, sf_dir, "events")
    trades = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("trade_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("value").alias("trade_value"),
    )
    quotes = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join_forward(
        trades,
        quotes,
        on=["user_id"],
        left_ts="t_ts",
        right_ts="ts",
        carry={"event_id": "quote_id", "value": "quote_value", "ts": "quote_ts"},
        right_tiebreak="event_id",
        tolerance="48 HOURS",
    )
    return out.select(
        "trade_id",
        "user_id",
        F.unix_micros(F.col("t_ts")).alias("trade_ts_us"),
        "trade_value",
        "quote_id",
        "quote_value",
        (F.unix_micros(F.col("quote_ts")) - F.unix_micros(F.col("t_ts"))).alias(
            "response_lag_us"
        ),
    )


_WJ_US = 3_600_000_000  # trailing window: one hour, exclusive of t itself


@register(
    "q_join_window_agg",
    oracle=f"""
    SELECT t.event_id AS trade_id, t.user_id,
           epoch_us(t.ts) AS trade_ts_us,
           (SELECT COUNT(*) FROM events v
             WHERE v.event_type = 'view' AND v.user_id = t.user_id
               AND epoch_us(v.ts) >= epoch_us(t.ts) - {_WJ_US}
               AND epoch_us(v.ts) <  epoch_us(t.ts)) AS n_views_1h,
           (SELECT CAST(COALESCE(SUM(CAST(ROUND(v.value * 100) AS BIGINT)), 0)
                        AS BIGINT)
              FROM events v
             WHERE v.event_type = 'view' AND v.user_id = t.user_id
               AND epoch_us(v.ts) >= epoch_us(t.ts) - {_WJ_US}
               AND epoch_us(v.ts) <  epoch_us(t.ts)) AS view_cents_1h
    FROM events t WHERE t.event_type = 'purchase'
    """,
    tags=("join", "timeseries", "window"),
)
def q_join_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAILING-WINDOW AGGREGATION JOIN: every purchase carries the
    COUNT and value SUM of the same user's views in the preceding
    hour — the feature-engineering attach ("activity in the trailing
    window") that is neither an as-of join (it wants an aggregate,
    not the nearest row) nor a windowed group-by (the window anchors
    at each LEFT row, not on a fixed grid). The scale plan is the
    union-and-frame form: both sides union into one keyed stream,
    and a RANGE frame over integer microseconds
    ([t - 1h, t) exclusive of the anchor) aggregates the right-side
    rows — one |L|+|R| sort per user key, no per-pair join, the same
    single-exchange discipline as the as-of family. The sum rides
    integer cents because window accumulation order among
    equal-timestamp rows is not fixed; the oracle is the O(n*m)
    correlated formulation."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    u = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        (F.col("event_type") == "view").alias("is_view"),
        F.when(
            F.col("event_type") == "view",
            F.round(F.col("value") * 100).cast("bigint"),
        ).alias("view_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_WJ_US, -1)
    )
    out = u.withColumn(
        "n_views_1h",
        F.count(F.when(F.col("is_view"), F.lit(1))).over(w),
    ).withColumn(
        "view_cents_1h",
        F.coalesce(F.sum("view_cents").over(w), F.lit(0)).cast("bigint"),
    )
    return out.filter(~F.col("is_view")).select(
        F.col("event_id").alias("trade_id"),
        "user_id",
        F.col("us").alias("trade_ts_us"),
        "n_views_1h",
        "view_cents_1h",
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH trades AS (
      SELECT event_id AS trade_id, user_id, ts AS trade_ts, value AS trade_value
      FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, event_id AS quote_id, value AS quote_value
      FROM events WHERE event_type = 'view'
    )
    SELECT t.trade_id, t.user_id,
           epoch_us(t.trade_ts) AS trade_ts_us, t.trade_value,
           q.quote_id, q.quote_value,
           epoch_us(q.ts) - epoch_us(t.trade_ts) AS signed_lag_us
    FROM trades t
    LEFT JOIN LATERAL (
      SELECT quote_id, quote_value, ts
      FROM quotes q
      WHERE q.user_id = t.user_id
      ORDER BY abs(epoch_us(q.ts) - epoch_us(t.trade_ts)) ASC,
               (epoch_us(q.ts) > epoch_us(t.trade_ts)) ASC,
               q.quote_id DESC
      LIMIT 1
    ) q ON TRUE
    """,
    tags=("join", "timeseries"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest' / kdb
    wj): every purchase paired with the user's view CLOSEST in time,
    either direction — equal distances resolve BACKWARD (the earlier
    quote; a quote exactly at t has distance 0 on both sides and both
    carries elect the same row), same-timestamp ties to the greatest
    quote id, matching both parents' conventions. Completes the as-of
    matrix: backward, backward+tolerance, forward+lookahead, nearest.

    Plan: the global nearest among backward candidates IS the backward
    carry's winner (max ts <= t) and among forward candidates the
    forward carry's winner (min ts >= t), so nearest = run BOTH
    existing carry scans and pick the closer winner per trade with one
    integer comparison — two keyed |L|+|R| sorts and a trade-keyed
    join of two 1-row-per-trade outputs, never a pair blow-up, never a
    per-trade window over all quotes (which is what the oracle's
    O(n^2) LATERAL abs-distance sort spells out)."""
    from docker_based_real_time_etl_project_spark.operators.asof import (
        asof_join_forward,
    )

    e = table(spark, sf_dir, "events")
    trades = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("trade_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("value").alias("trade_value"),
    )
    quotes = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    back = asof_join_backward(
        trades,
        quotes,
        on=["user_id"],
        left_ts="t_ts",
        right_ts="ts",
        carry={"event_id": "b_id", "value": "b_value", "ts": "b_ts"},
        right_tiebreak="event_id",
    ).select("trade_id", "b_id", "b_value", "b_ts")
    fwd = asof_join_forward(
        trades,
        quotes,
        on=["user_id"],
        left_ts="t_ts",
        right_ts="ts",
        carry={"event_id": "f_id", "value": "f_value", "ts": "f_ts"},
        right_tiebreak="event_id",
    ).select("trade_id", "user_id", "t_ts", "trade_value",
             "f_id", "f_value", "f_ts")
    j = fwd.join(back, "trade_id")
    t_us = F.unix_micros(F.col("t_ts"))
    d_b = t_us - F.unix_micros(F.col("b_ts"))
    d_f = F.unix_micros(F.col("f_ts")) - t_us
    # pick the closer winner; a missing side loses automatically, equal
    # distances resolve backward (the earlier quote)
    use_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (d_b <= d_f)
    )
    return j.select(
        "trade_id",
        "user_id",
        t_us.alias("trade_ts_us"),
        "trade_value",
        F.when(use_back, F.col("b_id")).otherwise(F.col("f_id")).alias("quote_id"),
        F.when(use_back, F.col("b_value")).otherwise(F.col("f_value"))
        .alias("quote_value"),
        F.when(use_back, -d_b).otherwise(d_f).cast("bigint")
        .alias("signed_lag_us"),
    )
