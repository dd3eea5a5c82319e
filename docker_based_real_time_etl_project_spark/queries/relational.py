"""Relational batch surface: scan/project/filter, joins of every
flavor, aggregations (plain, distinct, rollup/cube/grouping-sets),
sorts/top-k, set operations. (SURVEY.md 2.4 rows 1-8.)

Scale notes: dimension joins are explicitly broadcast; fact-fact
joins shuffle on the join key and rely on AQE for skew; every
aggregate is a hash aggregate with map-side partials (dsum's decimal
cast does not change that -- decimal sums still combine partially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    davg, dsum, register, sql_davg, sql_dsum, table,
)

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan→filter→project→agg→sort).
# The reference analog: the klines/ticker aggregates it ingests pre-computed
# (SURVEY.md 2.3) -- grouped sums/avgs over a date-bounded fact scan.
# ---------------------------------------------------------------------------

@register(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter pushed to the parquet scan, 6-group
    hash aggregate, one shuffle of pre-aggregated partials only."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / filter (T1-T3, T14)
# ---------------------------------------------------------------------------

@register(
    "q_project_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_extendedprice AS VARCHAR) IS NOT NULL AS has_price,
           CAST(CAST(l_extendedprice AS DECIMAL(20,8)) AS DOUBLE) AS price_dec
    FROM lineitem
    """,
    tags=("transform",),
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T3: narrow projection (2 keys + casts) -- ReadSchema in the plan
    should list only 4 of lineitem's 11 columns."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_extendedprice").cast("string").isNotNull().alias("has_price"),
        F.col("l_extendedprice").cast("decimal(20,8)").cast("double").alias("price_dec"),
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 24
      AND l_discount > 0.02
      AND l_returnflag <> 'A'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
    tags=("transform",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + inequality + date predicates, all pushed to the scan
    (PushedFilters in explain)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 24)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


# ---------------------------------------------------------------------------
# Joins (absent in the reference -- its Cassandra mapping is 1:1; SURVEY 2.4)
# ---------------------------------------------------------------------------

@register(
    "q_join_inner",
    oracle=f"""
    SELECT o.o_orderpriority,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem x orders) shuffled on orderkey, then
    grouped revenue. AQE handles any orderkey skew."""
    li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    return (
        li.join(o.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def skew_stress_join(spark: SparkSession, sf_dir: str, mappers: int | None = None) -> DataFrame:
    """Deliberately skewed large-large join: ~90% of lineitem rows are
    remapped onto ONE part key (sk=1), the worst case for a shuffle
    join, then revenue is grouped per brand. The merge hint pins the
    shuffle path (the 200-row dim would otherwise broadcast and make
    the stress vacuous -- at 100 TB the right side is not
    broadcast-size). AQE's skew-join split handles the hot partition by
    re-reading it in map-output ranges; ``mappers`` lets the plan test
    provide the multi-mapper shuffle AQE needs to split (at test SFs
    the scan is a single map task, so there is nothing to split --
    exactly the situation that disappears at scale).

    tests/test_plans.py::test_skew_stress_join_aqe_splits_hot_partition
    executes this under lowered skew thresholds and asserts the final
    adaptive plan contains the skew-split join, making the "AQE handles
    skew" claim on q_join_inner a tested invariant rather than a
    docstring promise."""
    li, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    if mappers:
        li = li.repartition(mappers)
    sk = (
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1).cast("bigint"))
        .otherwise(F.col("l_partkey"))
    )
    left = li.select(sk.alias("sk"), "l_extendedprice", "l_discount")
    dim = p.select(F.col("p_partkey").alias("sk"), "p_brand")
    return (
        left.join(dim.hint("merge"), "sk")
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_skew_stress",
    oracle=f"""
    WITH l AS (
      SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 1 ELSE l_partkey END AS sk,
             l_extendedprice, l_discount
      FROM lineitem
    )
    SELECT p.p_brand,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM l JOIN part p ON l.sk = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("join", "skew"),
)
def q_join_skew_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-stress twin of q_join_inner: see :func:`skew_stress_join`."""
    return skew_stress_join(spark, sf_dir)


@register(
    "q_join_star",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey  = c.c_custkey
      JOIN nation n    ON c.c_nationkey = n.n_nationkey
      JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "flagship"),
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: the three dimensions are broadcast (no shuffle);
    only lineitem x orders shuffles. This is the shape that must hold at
    100 TB -- dims stay broadcast-size, the single fact-fact shuffle is
    on the natural key."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_left",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           {sql_dsum('COALESCE(o.o_totalprice, 0)')} AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT of the
    right key is 0 for them)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce("o_totalprice", F.lit(0.0))).alias("total_spent"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS; emits each matching customer once, never
    duplicates, and only customer columns flow past the join."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 400000), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers with no URGENT order (the
    every-customer-ordered variant is vacuously empty on this data, so
    the predicate filters the right side to leave real survivors)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_range",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS late_items,
           {sql_davg('(epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400.0')} AS avg_lag_days
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
    tags=("join",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: ship lag > 60 days. The equi key still
    drives the shuffle; the range predicate is a cheap post-join residual
    -- the scalable pattern for theta joins with an equi component."""
    li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    lag_days = (
        F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")
    ) / 86400.0
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("late_items"),
            davg(lag_days).alias("avg_lag_days"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------

@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct per group (Spark plans an expand + two-phase
    aggregate; exact, unlike approx_count_distinct)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("q_agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate -- the 100 TB substitute for exact
    count-distinct (no expand, constant state). Rows-only check: HLL
    estimates are engine-specific by construction."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


@register(
    "q_approx_distinct_err",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_bounds
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error contract for the HLL++ estimate: per group, the rows-only
    q_agg_approx_distinct's estimate must sit within 5% of the exact
    distinct count (rsd is configured 2%). The estimate itself is
    engine-specific; the bound verdict is deterministic, so the driver
    sees a row go RED if the sketch ever degrades."""
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
    )
    rel_err = (
        F.abs(F.col("approx_customers") - F.col("exact_customers"))
        / F.col("exact_customers")
    )
    return agg.select(
        "o_orderstatus", "exact_customers", (rel_err <= 0.05).alias("within_bounds")
    )


@register(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag,status), (flag), ()."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice')} AS sum_price, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets: per-flag and per-status marginals in one
    pass (Expand operator, single shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,10))) AS STRING) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# Sort / top-k (T5 deterministic form)
# ---------------------------------------------------------------------------

@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort",),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject -- per-partition
    heap of k, then a k-row merge; no full sort at any scale. Unique
    o_orderkey tiebreak makes the cut deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations (the reference runs its 5 flows as disjoint inserts --
# union semantics; intersect/except complete the family)
# ---------------------------------------------------------------------------

@register(
    "q_union_all",
    oracle="""
    SELECT nationkey, kind FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    """,
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name -- no shuffle, partitions concatenate."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect (deduplicating): nations with both customers and
    suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT l_shipdate AS d FROM lineitem
    EXCEPT
    SELECT o_orderdate FROM orders
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: dates on which items shipped but nothing was
    ordered (ship dates lag order dates, so the tail survives at every
    SF -- the nationkey variant was vacuously empty). ``subtract`` is
    Spark's EXCEPT DISTINCT (exceptAll would keep surviving dups)."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_shipdate").alias("d"))
    o = table(spark, sf_dir, "orders").select(F.col("o_orderdate").alias("d"))
    return li.subtract(o)


@register(
    "q_agg_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           {sql_dsum('l.l_extendedprice')} AS sum_value,
           COUNT(*) AS n
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("agg", "skew"),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase (salted) aggregation over a 5-value key --
    the shape where one hot key would otherwise own a single reducer.
    The oracle is the PLAIN group-by: salting must be a pure execution
    strategy with zero semantic effect (decimal associativity)."""
    from docker_based_real_time_etl_project_spark.operators.skew import salted_sum_count

    li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return salted_sum_count(
        j, ["o_orderpriority"], "l_extendedprice",
        salt_from=["l_orderkey", "l_linenumber"], n_salts=16,
    )


@register(
    "q_join_full",
    oracle="""
    WITH open_o AS (
      SELECT o_custkey, COUNT(*) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ),
    closed_o AS (
      SELECT o_custkey, COUNT(*) AS n_closed
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT COALESCE(l.o_custkey, r.o_custkey) AS custkey,
           COALESCE(l.n_open, 0) AS n_open,
           COALESCE(r.n_closed, 0) AS n_closed,
           l.o_custkey IS NULL AS only_closed,
           r.o_custkey IS NULL AS only_open
    FROM open_o l FULL OUTER JOIN closed_o r ON l.o_custkey = r.o_custkey
    """,
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: reconcile per-customer open-order vs
    closed-order counts, keeping customers present on EITHER side with
    null-extension flags — the reconciliation-report join the other
    q_join_* variants don't cover.

    Scale shape: both sides pre-aggregate (map-side partials) before
    the join, so the full-outer shuffles at most one row per customer
    per side; full outer cannot broadcast, and the plan must keep it a
    shuffle join on the key."""
    o = table(spark, sf_dir, "orders")
    left = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    right = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("r_custkey"))
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    j = left.join(right, left.o_custkey == right.r_custkey, "full")
    return j.select(
        F.coalesce("o_custkey", "r_custkey").alias("custkey"),
        F.coalesce("n_open", F.lit(0)).alias("n_open"),
        F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
        F.col("o_custkey").isNull().alias("only_closed"),
        F.col("r_custkey").isNull().alias("only_open"),
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT n.n_name, r.r_name,
           n.n_regionkey = r.r_regionkey AS is_home
    FROM nation n CROSS JOIN region r
    """,
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate cross join of two PROVABLY TINY relations (25 x 5):
    the full nation-region grid with a home-region flag — the one
    legitimate cartesian in the surface.

    Scale rule this query documents: cross joins are legal only when
    one side is constant-bounded (catalog dims), in which case Spark
    plans a broadcast nested-loop whose cost is |big| x |tiny-const|;
    every other cartesian in the engine is a plan-test failure."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name", "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home"),
    )
