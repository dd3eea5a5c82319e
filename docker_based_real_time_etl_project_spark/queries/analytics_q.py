"""Event-analytics surface: conversion funnel, cohort retention,
value histogram.

The reference ingests a raw behavioral event stream (recent_trades --
etl.py:222, one row per market event) and leaves all analysis to the
warehouse; these are the three standard product-analytics shapes a
user of that stream runs first. Each is a single-scan, shuffle-minimal
plan over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    dround, dsum, register, sql_dround, sql_dsum, table,
)


@register(
    "q_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM u)  AS n_users,
           (SELECT COUNT(*) FROM t1) AS n_view,
           (SELECT COUNT(*) FROM t2) AS n_view_click,
           (SELECT COUNT(*) FROM t3) AS n_full_funnel
    """,
    tags=("analytics", "window"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    counts at stage N only with a strictly later event than their
    stage-N-1 entry (first view, first click after that, first
    purchase after that).

    The oracle chains three grouped self-joins; the engine computes all
    three stage timestamps as stacked conditional-min windows over ONE
    user_id partitioning -- Catalyst collapses them into a single Window
    node chain after a single exchange, then one tiny per-user agg.
    At 100 TB the shuffle is |events| rows on the natural key; no
    self-join materializes."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id")
    df = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    )
    df = df.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(wu),
    )
    df = df.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
        ).over(wu),
    )
    per_user = df.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT e.user_id,
             date_trunc('week', f.first_ts) AS cw,
             date_trunc('week', e.ts) AS aw
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, aw) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM a GROUP BY cw, aw
    """,
    tags=("analytics",),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by the week of
    their first event, counted in every later week they were active
    (offset in whole weeks; both endpoints week-truncated so the
    difference is an exact multiple of 7 days).

    One window (min ts per user) + one distinct + one agg, all hashed
    on user-derived keys -- the classic two-exchange plan. The oracle
    reconstructs it with a grouped self-join."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id")
    weeks = e.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(wu)).alias("cw"),
        F.date_trunc("week", "ts").alias("aw"),
    ).distinct()
    return weeks.groupBy("cw", "aw").agg(F.count(F.lit(1)).alias("n_users")).select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        F.floor(F.datediff("aw", "cw") / 7).cast("bigint").alias("week_offset"),
        "n_users",
    )


@register(
    "q_histogram",
    oracle=f"""
    WITH b AS (
      SELECT CAST(FLOOR(value / 50) * 50 AS BIGINT) AS bucket_lo,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT bucket_lo, n_events,
           {sql_dround('(n_events * 100.0) / SUM(n_events) OVER ()', 6)} AS pct
    FROM b
    """,
    tags=("analytics", "agg"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width 50) with share-of-total per
    bucket. The heavy lift is one map-side-combined count per bucket;
    the share divides by a whole-frame window over the ~10-row bucket
    table, so the unpartitioned window is bounded by bucket count,
    never by raw rows."""
    e = table(spark, sf_dir, "events")
    b = (
        e.select((F.floor(F.col("value") / 50) * 50).cast("bigint").alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    share = (F.col("n_events") * 100.0) / F.sum("n_events").over(
        Window.partitionBy()
    )
    return b.select("bucket_lo", "n_events", dround(share, 6).alias("pct"))


@register(
    "q_transition_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           {sql_dround('(n * 100.0) / SUM(n) OVER (PARTITION BY prev_type)', 6)}
             AS pct_of_prev
    FROM t
    """,
    tags=("analytics", "window"),
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts): per
    user, each consecutive event pair contributes one (prev -> next)
    transition; output counts and row-normalized percentages.

    One LAG window on the user_id exchange, one agg; the normalizing
    window runs over the |types|^2-row result, never raw events.
    (user_id, ts) is verified-unique so the sequence order needs no
    extra tiebreak."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    seq = e.select(
        F.lag("event_type").over(wu).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    share = (F.col("n") * 100.0) / F.sum("n").over(Window.partitionBy("prev_type"))
    return t.select(
        "prev_type", "next_type", "n", dround(share, 6).alias("pct_of_prev")
    )


@register(
    "q_outliers_zscore",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, value,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_id, event_type, value,
             CAST(cents AS DOUBLE) AS x,
             CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)))
                       OVER (PARTITION BY event_type) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
                       OVER (PARTITION BY event_type) AS VARCHAR) AS DOUBLE) AS s2,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_id, event_type, value,
           CAST(CAST(ROUND(CAST(
             (x - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))
           AS DECIMAL(25,10)), 6) AS VARCHAR) AS DOUBLE) AS z
    FROM m
    WHERE abs((x - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) >= 3.0
    """,
    tags=("analytics", "window"),
)
def q_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outliers (|z| >= 3 vs the key's own population
    moments) in ONE pass: the moments come from exact DECIMAL(38,0)
    integer-cent window sums -- order-independent, so the engine's
    nondeterministic partial order can't move a value across the |z|=3
    boundary -- then mean/std/z are the identical double expression DAG
    in both engines (exact ints -> varchar-hop doubles -> same ops).
    No stddev() aggregate anywhere: float stddev is merge-order
    dependent and would flap the cut. One exchange, no join: the stats
    window and the row filter share the event_type partitioning."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    wk = Window.partitionBy("event_type")
    c = e.select("event_id", "event_type", "value", cents.alias("cents"))
    s1 = F.sum(F.col("cents").cast("decimal(38,0)")).over(wk).cast("string").cast("double")
    s2 = (
        F.sum((F.col("cents").cast("decimal(38,0)") * F.col("cents"))).over(wk)
        .cast("string").cast("double")
    )
    n = F.count(F.lit(1)).over(wk)
    x = F.col("cents").cast("double")
    mu = s1 / n
    z = (x - mu) / F.sqrt(s2 / n - mu * mu)
    return (
        c.select("event_id", "event_type", "value", z.alias("_z"))
        .filter(F.abs(F.col("_z")) >= 3.0)
        .select("event_id", "event_type", "value", dround(F.col("_z"), 6).alias("z"))
    )


@register(
    "q_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT ud.user_id) AS active_users_7d
    FROM days JOIN ud
      ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
    tags=("analytics", "window"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users per observed day (the
    rolling-DAU/WAU family). Sliding COUNT DISTINCT does not merge, so
    the scale shape is contribution fan-out, not a range self-join:
    dedup to (user, day) once, explode each activity day to the <= 7
    target days it supports, then one exact distinct count per target
    day. Work is 7x|user-days| narrow rows; the oracle's range join is
    the O(days x user-days) spelling of the same set. Target days are
    semi-joined against observed days (broadcast-sized) so both engines
    emit exactly the days that exist in the data."""
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(d, d + interval 6 days, interval 1 day)")
        ).alias("day"),
    )
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users_7d"
        )
    )


@register(
    "q_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             LAG(event_type, 2) OVER w AS step_1,
             LAG(event_type, 1) OVER w AS step_2,
             event_type AS step_3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT step_1, step_2, step_3, COUNT(*) AS n
    FROM seq WHERE step_1 IS NOT NULL
    GROUP BY step_1, step_2, step_3
    ORDER BY n DESC, step_1, step_2, step_3
    LIMIT 10
    """,
    tags=("analytics", "window"),
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user paths (sequence mining one order up from
    the transition matrix): two LAGs over the same user ordering emit
    each sliding event-type triple, then count + total-order top-k
    (ties broken by the path itself, so LIMIT is deterministic).
    The triple space is |types|^3, so everything after the one window
    pass is constant-bounded; TakeOrderedAndProject keeps the top-k
    driver-side tiny."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    seq = e.select(
        F.lag("event_type", 2).over(wu).alias("step_1"),
        F.lag("event_type", 1).over(wu).alias("step_2"),
        F.col("event_type").alias("step_3"),
    ).filter(F.col("step_1").isNotNull())
    return (
        seq.groupBy("step_1", "step_2", "step_3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "step_1", "step_2", "step_3")
        .limit(10)
    )


@register(
    "q_sessionize_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, event_type, ts, value,
             FIRST_VALUE(event_type) OVER w AS ft,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    p AS (SELECT * FROM t WHERE event_type = 'purchase')
    SELECT 'first_touch' AS model, ft AS touch,
           {rev} AS revenue, COUNT(*) AS n_purchases
    FROM p GROUP BY ft
    UNION ALL
    SELECT 'last_touch' AS model, COALESCE(lt, 'direct') AS touch,
           {rev} AS revenue, COUNT(*) AS n_purchases
    FROM p GROUP BY COALESCE(lt, 'direct')
    """.format(rev=sql_dsum("value")),
    tags=("analytics", "window"),
)
def q_sessionize_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH / LAST-TOUCH revenue attribution over the funnel
    machinery (the marketing-analytics twin of q_funnel: which
    interaction gets credit for each purchase's value). First-touch =
    the type of the user's very first event; last-touch = the last
    NON-purchase event strictly before the purchase (purchases with no
    prior touch attribute to 'direct'). Revenue is decimal-summed so
    the hash is aggregation-order-proof.

    ONE window exchange on user_id computes both touch columns
    (first_value + ignore-nulls last_value over the same ordering —
    Catalyst stacks them in a single Window node), then two
    constant-size aggregations over only the purchase rows. At 100 TB
    the shuffle is |events| on the natural user key; nothing
    self-joins. The deterministic (ts, event_id) ordering makes tied
    timestamps reproducible in both engines."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    p = (
        e.withColumn("ft", F.first("event_type").over(w))
        .withColumn(
            "lt",
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(prev),
        )
        .filter(F.col("event_type") == "purchase")
    )
    # unpivot each purchase into its two (model, touch) credits so ONE
    # scan + ONE aggregation serves both models — a union of two
    # groupBys would window the event stream twice
    pairs = p.select(
        "value",
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("ft").alias("touch"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.coalesce("lt", F.lit("direct")).alias("touch"),
                ),
            )
        ).alias("mt"),
    ).select("mt.model", "mt.touch", "value")
    return pairs.groupBy("model", "touch").agg(
        dsum("value").alias("revenue"),
        F.count(F.lit(1)).alias("n_purchases"),
    )


@register(
    "q_retention_curve",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cd FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT e.user_id, f.cd, CAST(e.ts AS DATE) AS ad
      FROM events e JOIN f ON e.user_id = f.user_id
    ),
    per AS (
      SELECT cd, date_diff('day', cd, ad) AS day_offset,
             COUNT(*) AS n_active
      FROM a GROUP BY cd, date_diff('day', cd, ad)
    ),
    sized AS (
      SELECT cd, day_offset, n_active,
             MAX(CASE WHEN day_offset = 0 THEN n_active END)
               OVER (PARTITION BY cd) AS n_cohort
      FROM per
    )
    SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           n_active,
           n_cohort,
           CAST((n_active * 10000) // n_cohort AS BIGINT) AS retention_bp
    FROM sized
    """,
    tags=("analytics",),
)
def q_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-N RETENTION CURVE from the cohort triangle (the daily,
    normalized sibling of q_cohort_retention): users cohorted by the
    DAY of their first event; for every later active day, the count of
    returning users and the retention RATE in integer basis points
    (n_active*10000 div cohort size — integer arithmetic, so both
    engines agree bit-for-bit; a day-0 row always exists because every
    user is active on their cohort day, making the window-derived
    cohort size total).

    Plan: one min-ts window on user_id, one distinct on (user, day),
    one count agg, one constant-width window over cohort days — the
    same two data-sized exchanges the weekly triangle pays, no join
    for the denominator."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id")
    a = e.select(
        "user_id",
        F.to_date(F.min("ts").over(wu)).alias("cd"),
        F.to_date("ts").alias("ad"),
    ).distinct()
    per = a.groupBy(
        "cd", F.datediff("ad", "cd").cast("bigint").alias("day_offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))
    sized = per.withColumn(
        "n_cohort",
        F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(
            Window.partitionBy("cd")
        ),
    )
    return sized.select(
        F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_active",
        "n_cohort",
        ((F.col("n_active") * 10000) / F.col("n_cohort"))
        .cast("bigint")
        .alias("retention_bp"),
    )


@register(
    "q_interval_concurrency",
    oracle="""
    WITH iv AS (
        SELECT o_orderdate AS s,
               o_orderdate + ((o_orderkey % 14) + 1) * INTERVAL 1 DAY AS e
        FROM orders
    ),
    d AS (
        SELECT s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT e AS t, -1 AS delta FROM iv
    ),
    g AS (SELECT t, SUM(delta) AS delta FROM d GROUP BY t),
    c AS (SELECT t, SUM(delta) OVER (ORDER BY t) AS conc FROM g)
    SELECT strftime(date_trunc('month', t), '%Y-%m') AS month,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent,
           COUNT(*) AS n_points
    FROM c GROUP BY month
    """,
    tags=("interval", "scan", "scale"),
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX CONCURRENT INTERVALS BY SWEEP LINE — the ops question
    ("how many orders were in flight at once, per month?") whose naive
    SQL is a global running sum, i.e. the single-partition-window trap
    (``Window.orderBy(t)`` with no partitionBy drags ALL events
    through one task). The scale-correct plan: intervals become
    (start,+1)/(end,-1) deltas (end-exclusive), deltas aggregate per
    unique timestamp (one keyed exchange), and the running concurrency
    is the TWO-PHASE DISTRIBUTED PREFIX SCAN from operators/prefix.py
    — range-partition by time, per-partition totals, an O(partitions)
    driver scan, broadcast offsets back. The step function then rolls
    up to per-month peaks. The oracle computes the same sweep with a
    (single-threaded) SQL window, so boundary placement, tie folding,
    and the exclusive end must all agree exactly."""
    from docker_based_real_time_etl_project_spark.operators.prefix import (
        ordered_prefix_sum,
    )

    o = table(spark, sf_dir, "orders")
    s = F.col("o_orderdate")
    e = F.expr(
        "o_orderdate + make_interval(0, 0, 0, CAST(o_orderkey % 14 AS INT) + 1)"
    )
    deltas = (
        o.select(s.alias("t"), F.lit(1).alias("delta"))
        .unionByName(o.select(e.alias("t"), F.lit(-1).alias("delta")))
        .groupBy("t")
        .agg(F.sum("delta").cast("bigint").alias("delta"))
    )
    conc = ordered_prefix_sum(deltas, ["t"], "delta", out_col="conc")
    return conc.groupBy(
        F.date_format(F.date_trunc("month", "t"), "yyyy-MM").alias("month")
    ).agg(
        F.max("conc").cast("bigint").alias("max_concurrent"),
        F.count(F.lit(1)).alias("n_points"),
    )


_FD_CLICK_US = 48 * 3600 * 1_000_000  # click deadline after first view
_FD_BUY_US = 72 * 3600 * 1_000_000   # purchase deadline after that click


@register(
    "q_funnel_deadline",
    oracle=f"""
    WITH t1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > t1.v_us
          AND epoch_us(e.ts) <= t1.v_us + {_FD_CLICK_US}
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > t2.c_us
          AND epoch_us(e.ts) <= t2.c_us + {_FD_BUY_US}
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM t1) AS n_view,
           (SELECT COUNT(*) FROM t2) AS n_click_within,
           (SELECT COUNT(*) FROM t3) AS n_purchase_within,
           (SELECT CAST(COALESCE(SUM(t3.p_us - t1.v_us), 0) AS BIGINT)
              FROM t3 JOIN t1 ON t3.user_id = t1.user_id) AS total_lag_us
    """,
    tags=("analytics", "funnel", "window"),
)
def q_funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEADLINE-WINDOWED FUNNEL: q_funnel's ordered view -> click ->
    purchase chain, but each step only counts INSIDE its conversion
    window (click within 48 h of the first view, purchase within 72 h
    of that click) — the attribution-window semantics every product
    funnel actually ships with, and a different computation from the
    any-time funnel: a user with a click on day 5 converts nowhere
    here even though q_funnel counts them. Same scale shape as
    q_funnel — the deadline folds into the conditional-min windows'
    predicates, so it is STILL one exchange on user_id and one tiny
    final agg; the oracle chains bounded self-joins instead. Lags ride
    exact epoch-micro integers end to end (sum is a bigint — no
    float folding), so the hash pins every per-user stage time."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id")
    v_us = F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    staged = ev.withColumn("v_us", v_us)
    c_us = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("us") > F.col("v_us"))
            & (F.col("us") <= F.col("v_us") + _FD_CLICK_US),
            F.col("us"),
        )
    ).over(w)
    staged = staged.withColumn("c_us", c_us)
    p_us = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("c_us"))
            & (F.col("us") <= F.col("c_us") + _FD_BUY_US),
            F.col("us"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("p_us", p_us)
        .groupBy("user_id")
        .agg(
            F.first("v_us").alias("v_us"),
            F.first("c_us").alias("c_us"),
            F.first("p_us").alias("p_us"),
        )
    )
    return per_user.agg(
        F.count("v_us").alias("n_view"),
        F.count("c_us").alias("n_click_within"),
        F.count("p_us").alias("n_purchase_within"),
        F.coalesce(
            F.sum(F.col("p_us") - F.col("v_us")), F.lit(0)
        ).cast("bigint").alias("total_lag_us"),
    )


# ---------------------------------------------------------------------------
# Market-basket mining: frequent category pairs with lift
# ---------------------------------------------------------------------------

# Items = part categories (l_partkey % 97): raw TPC-H part keys barely
# co-occur (20k parts, ~4 lines/order), categories co-occur densely —
# the realistic support regime for pair mining. Absolute min support
# keeps the oracle restatement literal.
_MB_CAT = 97
_MB_MINSUP = 3


@register(
    "q_itemset_pairs",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey % {_MB_CAT} AS item
      FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM basket),
    item_sup AS (SELECT item, COUNT(*) AS sup FROM basket GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
      FROM basket a JOIN basket b
        ON a.okey = b.okey AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {_MB_MINSUP}
    )
    SELECT item_a, item_b, co,
           sa.sup AS sup_a, sb.sup AS sup_b,
           CAST(ROUND(CAST(co AS DOUBLE) * n.n_orders
                      / (sa.sup * sb.sup) * 1000000) AS BIGINT) AS lift_micro
    FROM pairs
    JOIN item_sup sa ON pairs.item_a = sa.item
    JOIN item_sup sb ON pairs.item_b = sb.item
    CROSS JOIN n
    """,
    tags=("analytics", "mining"),
)
def q_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENT-PAIR MINING (the A-Priori 2-itemset pass) with lift:
    which part categories land in the same order more often than
    independence predicts — the market-basket primitive behind
    recommendations and co-occurrence features.

    Scale shape: the pair expansion is a PER-BASKET self-join on the
    order key — each basket holds at most its line count of distinct
    items (<= 7 here), so candidates are sum of per-basket item-pairs,
    NEVER the global item x item product; the pair aggregate shuffles
    (item_a, item_b). Lift is one double multiply/divide from exact
    integers rounded to micro-units (single-operation determinism, the
    q_tfidf rule); supports attach by broadcastable category-sized
    joins."""
    li = table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_partkey") % _MB_CAT).alias("item"),
    ).distinct()
    n = basket.agg(F.countDistinct("okey").alias("n_orders"))
    item_sup = basket.groupBy("item").agg(F.count(F.lit(1)).alias("sup"))
    b2 = basket.select(
        F.col("okey"), F.col("item").alias("item_b")
    )
    pairs = (
        basket.join(b2, "okey")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy(F.col("item").alias("item_a"), "item_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _MB_MINSUP)
    )
    sa = item_sup.select(
        F.col("item").alias("item_a"), F.col("sup").alias("sup_a")
    )
    sb = item_sup.select(
        F.col("item").alias("item_b"), F.col("sup").alias("sup_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "co",
            "sup_a",
            "sup_b",
            F.round(
                F.col("co").cast("double")
                * F.col("n_orders")
                / (F.col("sup_a") * F.col("sup_b"))
                * 1e6
            ).cast("bigint").alias("lift_micro"),
        )
    )


@register(
    "q_regr_trend",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority AS priority,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM (
        SELECT o_orderpriority, o_orderdate,
               CAST(day(o_orderdate) AS BIGINT) AS x,
               CAST(CAST(o_totalprice * 100 AS BIGINT) // 100 AS BIGINT) AS y
        FROM orders)
      GROUP BY 1, 2, 3
    )
    SELECT priority, yr, mo, n,
           CAST(ROUND((nd * sxyd - sxd * syd)
                      / (nd * sxxd - sxd * sxd) * 1000000)
                AS BIGINT) AS slope_micro,
           CAST(ROUND((syd * sxxd - sxd * sxyd)
                      / (nd * sxxd - sxd * sxd) * 1000000)
                AS BIGINT) AS intercept_micro,
           {sql_dround(
               "(nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)"
               " / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))",
               6,
           )} AS r2
    FROM (
      SELECT *, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
      FROM s)
    WHERE n >= 2 AND nd * sxxd - sxd * sxd > 0
      AND nd * syyd - syd * syd > 0
    """,
    tags=("agg", "analytics"),
)
def q_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS REGRESSION AGGREGATES (regr_slope / regr_intercept / r2
    shape): per (order priority, year, month), the least-squares trend
    of order value (whole dollars, integer floor) against day of
    month. The moment sums n/Sx/Sy/Sxy/Sxx/Syy are EXACT int64 (day
    <= 31 and whole dollars keep even Syy inside int64 through
    ~sf1000 per month-group); each sum then converts to double ONCE
    (correctly rounded in both engines) and the closed forms are
    fixed-shape double expression trees -- bit-identical across
    engines with no intermediate whose order could vary, and free of
    the int64 ceiling the all-integer n*Syy - Sy^2 combination would
    hit around sf10 (ANSI overflow caught in the sf10 spot; this is
    the fix). Degenerate groups (single row, zero x- or y-variance)
    are filtered by the same double predicates on both sides.

    This is the analyst's drift/trend primitive done shuffle-light:
    one hash aggregate over six map-side-combined integer sums — the
    same pass regr_slope/regr_r2 cost — never a per-group sort or
    window."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("x"),
        F.expr(
            "CAST(CAST(o_totalprice * 100 AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("y"),
    )
    s = base.groupBy("priority", "yr", "mo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # Combinations in DOUBLE from the double-cast exact sums: each
    # int64 sum converts once (correctly rounded in both engines) and
    # the closed forms are fixed-shape expression trees, so the result
    # is bit-identical across engines AND free of the int64 ceiling
    # the n*syy - sy*sy product would hit around sf10 (ANSI mode
    # caught exactly that during the sf10 spot).
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd, syyd = (
        F.col(c).cast("double") for c in ("sxy", "sxx", "syy")
    )
    num = nd * sxyd - sxd * syd
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    inum = syd * sxxd - sxd * sxyd
    return s.filter((F.col("n") >= 2) & (denx > 0) & (deny > 0)).select(
        "priority", "yr", "mo", "n",
        F.round(num / denx * 1e6).cast("bigint").alias("slope_micro"),
        F.round(inum / denx * 1e6).cast("bigint").alias("intercept_micro"),
        dround(num * num / (denx * deny), 6).alias("r2"),
    )
