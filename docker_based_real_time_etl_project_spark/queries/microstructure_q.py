"""Market-microstructure analytics over the event stream.

The reference ingests live exchange trade data and maintains kline /
ticker rollups (etl.py:146-171, init-db.sql:27-49); this module adds
the microstructure layer a trading-analytics user computes ON that
ingest: tick-rule trade signing (Lee & Ready 1991's tick test — the
classification exchanges themselves publish as "taker side"), signed
order-flow imbalance, event-driven volume bars (Mandelbrot/Clark's
subordinated-clock sampling, the "volume bars" of López de Prado's
AFML), and one-sided CUSUM change-point alarms (Page 1954) over the
price stream.

Determinism: prices become integer cents and volumes are integer, so
every aggregate here is an exact integer — hash-stable under any
aggregation order. The only per-key sequential structures are ordered
windows over (ts, event_id), the same shape (and the same single sort
exchange per key) as q_rsi/q_bollinger: at 100 TB the partition key is
the symbol, so parallelism is the symbol universe, and each symbol's
history is processed by streaming window frames — never materialized
whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    register,
    table,
)

# Volume-bar threshold (subordinated volume clock): a new bar begins
# each time cumulative pre-row volume crosses a multiple of this.
BAR_VOLUME = 5_000
# CUSUM allowance k (cents above the per-key reference mean that does
# NOT count as drift) and alarm threshold h (cents of accumulated
# excess). Tuned so alarms exist at every test SF; both are plain
# parameters a production monitor would set from process variance.
CUSUM_K_CENTS = 300
CUSUM_H_CENTS = 20_000

def _cents():
    # built lazily: Column construction needs an active SparkContext,
    # and this module is imported by the queries package before tests
    # (or the driver) have necessarily created one
    return F.round(F.col("value") * 100).cast("bigint")


def _vol():
    return F.get_json_object("props", "$.k").cast("bigint")


# ---------------------------------------------------------------------------
# Tick-rule signing + order-flow imbalance
# ---------------------------------------------------------------------------

# shared with the streaming mirror (q_stream_tick_imbalance)
_TICK_IMBALANCE_ORACLE = """
    WITH o AS (
      SELECT event_type, ts, event_id,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(ROUND(value*100) AS BIGINT) AS c,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      FROM events
    ), d AS (
      SELECT *, c - LAG(c) OVER win AS diff
      FROM o WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), e AS (
      SELECT *, COALESCE(
               LAST_VALUE(CASE WHEN diff > 0 THEN 1
                               WHEN diff < 0 THEN -1 END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS sgn
      FROM d
    )
    SELECT event_type, hour,
           CAST(SUM(CASE WHEN sgn = 1 THEN vol ELSE 0 END) AS BIGINT) AS buy_vol,
           CAST(SUM(CASE WHEN sgn = -1 THEN vol ELSE 0 END) AS BIGINT) AS sell_vol,
           CAST(SUM(sgn * vol) AS BIGINT) AS signed_vol,
           CAST(COUNT(CASE WHEN sgn = 1 THEN 1 END) AS BIGINT) AS n_buys,
           CAST(COUNT(CASE WHEN sgn = -1 THEN 1 END) AS BIGINT) AS n_sells
    FROM e GROUP BY event_type, hour
    """


@register(
    "q_tick_imbalance",
    oracle=_TICK_IMBALANCE_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_tick_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule signed order-flow imbalance per (event_type, hour).

    Each trade is signed by the tick test: +1 on an uptick, -1 on a
    downtick, and on a zero tick the LAST non-zero sign carries forward
    (Lee & Ready 1991). The leading run before any price change is
    neutral (sign 0). Hourly buy/sell volume, signed volume and trade
    counts follow — the flow-imbalance series every short-horizon
    price-impact model starts from.

    Exactness: the sign is a pure integer comparison and the carry is
    `last(non-zero sign) ignore nulls` over the same (ts, event_id)
    order both engines sort by, so every output is an exact integer.
    Scale: ONE sort exchange per event_type serves the lag and the
    carry-forward window (same frame family); the hourly aggregation
    is a hash agg with map-side partials."""
    d = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = d.select(
        "event_type",
        "ts",
        "event_id",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        _cents().alias("c"),
        _vol().alias("vol"),
    )
    diff = F.col("c") - F.lag("c").over(w)
    raw = F.when(diff > 0, F.lit(1)).when(diff < 0, F.lit(-1))
    e = o.withColumn("sgn", F.coalesce(F.last(raw, ignorenulls=True).over(wc), F.lit(0)))
    return e.groupBy("event_type", "hour").agg(
        F.sum(F.when(F.col("sgn") == 1, F.col("vol")).otherwise(0))
        .cast("bigint")
        .alias("buy_vol"),
        F.sum(F.when(F.col("sgn") == -1, F.col("vol")).otherwise(0))
        .cast("bigint")
        .alias("sell_vol"),
        F.sum(F.col("sgn") * F.col("vol")).cast("bigint").alias("signed_vol"),
        F.count(F.when(F.col("sgn") == 1, 1)).cast("bigint").alias("n_buys"),
        F.count(F.when(F.col("sgn") == -1, 1)).cast("bigint").alias("n_sells"),
    )


# ---------------------------------------------------------------------------
# Event-driven volume bars
# ---------------------------------------------------------------------------

_VOLUME_BARS_ORACLE = f"""
    WITH o AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value*100) AS BIGINT) AS c,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      FROM events
    ), b AS (
      SELECT *, COALESCE(SUM(vol) OVER (PARTITION BY event_type
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {BAR_VOLUME} AS bar_id
      FROM o
    )
    SELECT event_type, CAST(bar_id AS BIGINT) AS bar_id,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(vol) AS BIGINT) AS bar_vol,
           CAST(MIN({{'t': ts, 'e': event_id, 'c': c}}).c AS BIGINT) AS open_cents,
           CAST(MAX(c) AS BIGINT) AS high_cents,
           CAST(MIN(c) AS BIGINT) AS low_cents,
           CAST(MAX({{'t': ts, 'e': event_id, 'c': c}}).c AS BIGINT) AS close_cents,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
    FROM b GROUP BY event_type, bar_id
    """


@register(
    "q_volume_bars",
    oracle=_VOLUME_BARS_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLCV bars on a VOLUME clock instead of a time clock: a row
    belongs to bar floor(volume-before-it / BAR_VOLUME), so every bar
    carries ~equal traded volume and bars arrive faster when the
    market is active — the subordinated-clock sampling that gives
    better-behaved returns than wall-clock bars (Clark 1973; volume
    bars in López de Prado 2018). The time-windowed counterpart is
    q_ohlcv_1h; only the clock differs.

    The bar assignment is one exclusive-prefix integer cumsum per key
    (same sort exchange family as the tick window), and the OHLCV agg
    uses min/max over (ts, event_id, c) structs so open/close are
    deterministic under any partitioning. Everything is int64: vol
    sums are exact and bar_id is a floor division of non-negatives."""
    d = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    o = d.select(
        "event_type", "ts", "event_id", _cents().alias("c"), _vol().alias("vol")
    )
    b = o.withColumn("pre_vol", F.sum("vol").over(wx)).withColumn(
        "bar_id", F.expr(f"coalesce(pre_vol, 0) div {BAR_VOLUME}")
    )
    st = F.struct("ts", "event_id", "c")
    return b.groupBy("event_type", "bar_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        F.sum("vol").cast("bigint").alias("bar_vol"),
        F.min(st).getField("c").cast("bigint").alias("open_cents"),
        F.max("c").cast("bigint").alias("high_cents"),
        F.min("c").cast("bigint").alias("low_cents"),
        F.max(st).getField("c").cast("bigint").alias("close_cents"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
    )


# ---------------------------------------------------------------------------
# One-sided CUSUM change-point alarms
# ---------------------------------------------------------------------------

# shared with the streaming mirror (q_stream_cusum)
_CUSUM_ORACLE = f"""
    WITH o AS (
      SELECT event_type, ts, event_id, CAST(ROUND(value*100) AS BIGINT) AS c
      FROM events
    ), t AS (
      SELECT *, SUM(c) OVER (PARTITION BY event_type)
                // COUNT(*) OVER (PARTITION BY event_type) AS target
      FROM o
    ), cu AS (
      SELECT event_type, ts, event_id,
             SUM(c - target - {CUSUM_K_CENTS}) OVER win AS cum
      FROM t
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT event_type, ts, event_id, cum, MIN(cum) OVER win AS runmin
      FROM cu
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), sv AS (
      SELECT event_type, ts, cum - LEAST(0, runmin) AS s,
             LAG(cum - LEAST(0, runmin), 1, 0)
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_s
      FROM s
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(s AS BIGINT) AS s_value
    FROM sv WHERE s > {CUSUM_H_CENTS} AND prev_s <= {CUSUM_H_CENTS}
    """


@register(
    "q_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "microstructure", "anomaly", "window"),
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM change-point alarms per event_type
    (Page 1954): S_i = max(0, S_{i-1} + (c_i - target - k)), alarm on
    each UPCROSSING of h. The drift-detection primitive for a price /
    quality / latency stream — q_outliers_zscore flags single wild
    rows, CUSUM flags small persistent shifts those tests never see.

    The recursion is solved in closed form instead of folded:
    S_i = cum_i - min(0, min_{j<=i} cum_j) (running drawup of the
    deviation walk), which turns the sequential max-recursion into two
    stock prefix windows over ONE sort exchange — exactly the shape
    Catalyst already streams at scale, no stateful UDF needed. All
    arithmetic is int64 cents; the per-key reference mean is an exact
    integer division. Alarms report the first crossing of each
    excursion (S > h and prev_S <= h), so alarm count is excursion
    count, not time-above-threshold."""
    d = table(spark, sf_dir, "events")
    wk = Window.partitionBy("event_type")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = d.select("event_type", "ts", "event_id", _cents().alias("c"))
    t = o.withColumn("tot", F.sum("c").over(wk)).withColumn(
        "cnt", F.count(F.lit(1)).over(wk)
    )
    t = t.withColumn("dev", F.expr(f"c - tot div cnt - {CUSUM_K_CENTS}"))
    cu = t.withColumn("cum", F.sum("dev").over(wr))
    s = cu.withColumn("runmin", F.min("cum").over(wr)).withColumn(
        "s", F.col("cum") - F.least(F.lit(0), F.col("runmin"))
    )
    sv = s.withColumn("prev_s", F.lag("s", 1, 0).over(w))
    return sv.filter(
        (F.col("s") > CUSUM_H_CENTS) & (F.col("prev_s") <= CUSUM_H_CENTS)
    ).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("s").cast("bigint").alias("s_value"),
    )


# ---------------------------------------------------------------------------
# Roll effective-spread estimator
# ---------------------------------------------------------------------------

_ROLL_ORACLE = """
    WITH o AS (
      SELECT event_type, ts, event_id,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(ROUND(value*100) AS BIGINT) AS c
      FROM events
    ), d AS (
      SELECT *, c - LAG(c) OVER win AS d1,
             LAG(c) OVER win - LAG(c, 2) OVER win AS d0
      FROM o WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), g AS (
      SELECT event_type, day,
             COUNT(d1) FILTER (WHERE d0 IS NOT NULL) AS n,
             SUM(d1*d0) AS sxy,
             SUM(d1) FILTER (WHERE d0 IS NOT NULL) AS sx,
             SUM(d0) AS sy
      FROM d WHERE d1 IS NOT NULL
      GROUP BY event_type, day
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_deltas,
           CAST(n*sxy - sx*sy AS BIGINT) AS cov_num,
           CASE WHEN n*sxy - sx*sy < 0
                THEN CAST(ROUND(2.0 * SQRT(CAST(-(n*sxy - sx*sy) AS DOUBLE))
                          / n * 100) AS BIGINT)
                ELSE NULL END AS roll_spread_centi
    FROM g WHERE n >= 2
    """


@register(
    "q_roll_spread",
    oracle=_ROLL_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) implied effective spread per (event_type, day):
    2·sqrt(−cov(Δp_t, Δp_{t−1})) — bid-ask bounce makes consecutive
    price changes negatively autocorrelated, and the serial covariance
    recovers the spread without ever seeing a quote. Days whose
    covariance is non-negative yield NULL (the estimator's own
    documented failure mode on trending samples).

    Exactness: the covariance NUMERATOR n·Σd₁d₀ − Σd₁Σd₀ is exact
    int64 (per-day group sizes bound it far under 2^63; the global
    regression q_kyle_lambda shows the decimal treatment for unbounded
    groups), floating point enters once at the correctly-rounded IEEE
    sqrt — the same discipline as q_bollinger's σ. The delta chain is
    per-key (crossing midnight, like the tick signs), grouped by the
    later trade's day; one sort exchange serves both lags."""
    d = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = d.select(
        "event_type",
        "ts",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        _cents().alias("c"),
    )
    dd = o.select(
        "event_type",
        "day",
        (F.col("c") - F.lag("c").over(w)).alias("d1"),
        (F.lag("c").over(w) - F.lag("c", 2).over(w)).alias("d0"),
    ).filter(F.col("d1").isNotNull())
    g = dd.groupBy("event_type", "day").agg(
        F.count(F.when(F.col("d0").isNotNull(), 1)).alias("n"),
        F.sum(F.col("d1") * F.col("d0")).alias("sxy"),
        F.sum(F.when(F.col("d0").isNotNull(), F.col("d1"))).alias("sx"),
        F.sum("d0").alias("sy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return g.filter(F.col("n") >= 2).select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_deltas"),
        cov.cast("bigint").alias("cov_num"),
        F.when(
            cov < 0,
            F.round(2.0 * F.sqrt((-cov).cast("double")) / F.col("n") * 100).cast(
                "bigint"
            ),
        ).alias("roll_spread_centi"),
    )


# ---------------------------------------------------------------------------
# Kyle lambda: price impact of signed order flow
# ---------------------------------------------------------------------------

_KYLE_ORACLE = """
    WITH o AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value*100) AS BIGINT) AS c,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      FROM events
    ), d AS (
      SELECT *, c - LAG(c) OVER win AS dy
      FROM o WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), e AS (
      SELECT *, COALESCE(
               LAST_VALUE(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 END
                          IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS sgn
      FROM d
    ), r AS (
      SELECT event_type, CAST(dy AS HUGEINT) AS y,
             CAST(sgn * vol AS HUGEINT) AS x
      FROM e WHERE dy IS NOT NULL
    ), g AS (
      SELECT event_type, COUNT(*) AS n, SUM(x*y) AS sxy, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x*x) AS sx2
      FROM r GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_obs,
           CAST((n*sxy - sx*sy) * 1000000
                // NULLIF(n*sx2 - sx*sx, 0) AS BIGINT) AS lambda_micro
    FROM g
    """


@register(
    "q_kyle_lambda",
    oracle=_KYLE_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle (1985) lambda per event_type: the OLS slope of price
    change on tick-signed volume — cents of impact per unit of signed
    flow, THE standard price-impact/illiquidity measure. Reuses the
    tick-rule signs; the regression collapses to five sums, i.e. one
    map-side-combined hash aggregate after the sign window.

    Exactness under unbounded group sizes: per-row products stay
    int64, the five sums and the slope's cross terms are DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) — n·Σxy·10⁶ exceeds 2^63 already at
    sf1 — and the slope is ONE integer division. Spark's `div` and
    DuckDB's `//` both truncate toward zero (verified), so negative
    slopes hash identically."""
    d = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = d.select(
        "event_type", "ts", "event_id", _cents().alias("c"), _vol().alias("vol")
    )
    dy = F.col("c") - F.lag("c").over(w)
    raw = F.when(dy > 0, F.lit(1)).when(dy < 0, F.lit(-1))
    e = o.select(
        "event_type",
        dy.alias("dy"),
        F.coalesce(F.last(raw, ignorenulls=True).over(wc), F.lit(0)).alias("sgn"),
        "vol",
    ).filter(F.col("dy").isNotNull())
    r = e.select(
        "event_type",
        F.col("dy").alias("y"),
        (F.col("sgn") * F.col("vol")).alias("x"),
    )
    dec = "decimal(38,0)"
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sx2"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_obs"),
        F.expr(
            "CAST(CAST((n*sxy - sx*sy) AS DECIMAL(38,0)) * 1000000"
            " div NULLIF(CAST(n*sx2 - sx*sx AS DECIMAL(38,0)), 0) AS BIGINT)"
        ).alias("lambda_micro"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function: lag-1..3 ACF of the price series
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
    WITH o AS (
      SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c,
             LEAD(CAST(ROUND(value*100) AS BIGINT), 1) OVER win AS c1,
             LEAD(CAST(ROUND(value*100) AS BIGINT), 2) OVER win AS c2,
             LEAD(CAST(ROUND(value*100) AS BIGINT), 3) OVER win AS c3
      FROM events WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             CAST(SUM(c*c) AS HUGEINT) AS ss,
             CAST(SUM(c*c1) AS HUGEINT) AS p1, CAST(COUNT(c1) AS HUGEINT) AS m1,
             CAST(SUM(CASE WHEN c1 IS NOT NULL THEN c END) AS HUGEINT) AS h1,
             CAST(SUM(c1) AS HUGEINT) AS t1,
             CAST(SUM(c*c2) AS HUGEINT) AS p2, CAST(COUNT(c2) AS HUGEINT) AS m2,
             CAST(SUM(CASE WHEN c2 IS NOT NULL THEN c END) AS HUGEINT) AS h2,
             CAST(SUM(c2) AS HUGEINT) AS t2,
             CAST(SUM(c*c3) AS HUGEINT) AS p3, CAST(COUNT(c3) AS HUGEINT) AS m3,
             CAST(SUM(CASE WHEN c3 IS NOT NULL THEN c END) AS HUGEINT) AS h3,
             CAST(SUM(c3) AS HUGEINT) AS t3
      FROM o GROUP BY event_type
    ), l AS (
      SELECT event_type, 1 AS lag, n, s, ss, p1 AS p, m1 AS m, h1 AS h, t1 AS t FROM g
      UNION ALL
      SELECT event_type, 2, n, s, ss, p2, m2, h2, t2 FROM g
      UNION ALL
      SELECT event_type, 3, n, s, ss, p3, m3, h3, t3 FROM g
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(m AS BIGINT) AS n_pairs,
           CAST((n*n*p - n*s*(h + t) + m*s*s) * 1000000
                // NULLIF(n*n*ss - n*s*s, 0) AS BIGINT) AS acf_micro
    FROM l
    """


@register(
    "q_autocorr",
    oracle=_ACF_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the price series per event_type at
    lags 1..3 — the volatility-signature / market-efficiency diagnostic
    that generalizes q_roll_spread's lag-1 serial covariance (an
    efficient market's returns show ~0; bid-ask bounce shows negative
    lag-1). Classical common-mean ACF, made hash-exact the pack's
    standard way: cents in, every sum an int64-per-row product
    accumulated in DECIMAL(38,0)/HUGEINT, the estimator cleared of the
    1/n mean via n²·num = n²·Σx_t·x_{t+k} − n·S·(head+tail) + (n−k)·S²
    over n²·den = n²·SS − n·S², and ONE truncating integer division to
    micro-units (div/​// agree — the q_kyle_lambda discipline). Plan:
    three LEADs share ONE sort exchange, then a single map-side-
    combined hash aggregate per key; the 3-lag unpivot is a stack over
    the 16-column aggregate row — at 100 TB the shuffle is the sort
    exchange, everything after is O(keys). Bounds: n²·Σxx·10⁶ needs
    ~10³⁷ at sf1-scale groups — inside DECIMAL(38,0), named here so a
    1000× grain change revisits it consciously."""
    d = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = d.select(
        "event_type",
        _cents().alias("c"),
        *[F.lead(_cents(), k).over(w).alias(f"c{k}") for k in (1, 2, 3)],
    )
    dec = "decimal(38,0)"
    aggs = [
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("c").cast(dec).alias("s"),
        F.sum((F.col("c") * F.col("c")).cast(dec)).alias("ss"),
    ]
    for k in (1, 2, 3):
        ck = F.col(f"c{k}")
        aggs += [
            F.sum((F.col("c") * ck).cast(dec)).alias(f"p{k}"),
            F.count(ck).cast(dec).alias(f"m{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c"))).cast(dec).alias(f"h{k}"),
            F.sum(ck).cast(dec).alias(f"t{k}"),
        ]
    g = o.groupBy("event_type").agg(*aggs)
    stacked = g.select(
        "event_type",
        "n", "s", "ss",
        F.expr(
            "stack(3, 1L, p1, m1, h1, t1, 2L, p2, m2, h2, t2, 3L, p3, m3, h3, t3)"
            " AS (lag, p, m, h, t)"
        ),
    )
    return stacked.select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("m").cast("bigint").alias("n_pairs"),
        F.expr(
            "CAST(CAST((n*n*p - n*s*(h + t) + m*s*s) AS DECIMAL(38,0)) * 1000000"
            " div NULLIF(CAST(n*n*ss - n*s*s AS DECIMAL(38,0)), 0) AS BIGINT)"
        ).alias("acf_micro"),
    )


# ---------------------------------------------------------------------------
# Max drawdown + realized volatility: the risk layer over the price path
# ---------------------------------------------------------------------------

_MDD_ORACLE = """
    WITH o AS (
      SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c,
             MAX(CAST(ROUND(value*100) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(MAX(peak - c) AS BIGINT) AS max_dd_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents
    FROM o GROUP BY event_type
    """


@register(
    "q_max_drawdown",
    oracle=_MDD_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per event_type — the canonical path-dependent
    risk measure (largest peak-to-trough fall of the price path). The
    naive definition nests two scans (for every t, the max over the
    prefix); the closed form is ONE running max then one aggregate:
    max_t(prefix_max_t − c_t). Everything is integer cents, so the
    result is exact and hash-stable. Plan: the running max shares the
    pack's single (event_type)-sort exchange; the final aggregate
    reuses that partitioning — O(keys) output, no second shuffle. At
    100 TB the key is the symbol and each symbol's path streams
    through one window frame, never materialized."""
    d = table(spark, sf_dir, "events")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = d.select(
        "event_type",
        _cents().alias("c"),
        F.max(_cents()).over(wc).alias("peak"),
    )
    return o.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.max(F.col("peak") - F.col("c")).cast("bigint").alias("max_dd_cents"),
        F.max("peak").cast("bigint").alias("peak_cents"),
    )


_RV_ORACLE = """
    WITH o AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(ROUND(value*100) AS BIGINT) AS c,
             LAG(CAST(ROUND(value*100) AS BIGINT)) OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS cp
      FROM events
    )
    SELECT event_type, day,
           CAST(COUNT(cp) AS BIGINT) AS n_returns,
           CAST(SUM(CAST((c - cp) * (c - cp) AS HUGEINT)) AS BIGINT) AS rv_cents2
    FROM o WHERE cp IS NOT NULL
    GROUP BY event_type, day
    """


@register(
    "q_realized_vol",
    oracle=_RV_ORACLE,
    tags=("timeseries", "microstructure", "window"),
)
def q_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAILY REALIZED VOLATILITY (realized variance) per event_type:
    the sum of squared intraday price increments — the
    Andersen-Bollerslev high-frequency volatility estimator, and the
    quantity the signature plot (q_autocorr's diagnostic) is built
    from. Increments restart at day boundaries (the LAG partitions by
    (key, day)), so overnight gaps never pollute intraday variance.
    Integer cents in, each squared increment an int64, the day sum
    accumulated in DECIMAL(38,0)/HUGEINT — exact at any grain, cast
    back to bigint for the contract. Plan: one sort exchange on
    (event_type, day) drives both the LAG and the map-side-combined
    final aggregate; output is O(keys x days)."""
    d = table(spark, sf_dir, "events")
    day = F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    o = (
        d.select(
            "event_type", "ts", "event_id", day.alias("day"), _cents().alias("c")
        )
        .withColumn("cp", F.lag("c").over(w))
        .filter(F.col("cp").isNotNull())
    )
    dy = F.col("c") - F.col("cp")
    return o.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        F.sum((dy * dy).cast("decimal(38,0)")).cast("bigint").alias("rv_cents2"),
    )
