"""Second relational batch: subqueries (EXISTS / scalar -- Catalyst
rewrites both to joins), PIVOT, date arithmetic, null-handling
semantics, and ordered array aggregation. Rounds out the "every
operator a reference user could ask for" surface (SURVEY.md 2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    dsum, register, sql_dsum, table,
)


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
    tags=("join", "subquery"),
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS: Catalyst plans these as left-semi
    and left-anti joins -- written as SQL to exercise the subquery
    rewrite path rather than the explicit join API (q_join_semi/anti)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        """
    )


@register(
    "q_scalar_subquery",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("agg", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned as a broadcast single-row
    join): orders above the global average price. COUNT-only output, so
    the avg's float value never reaches the hash."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events
    GROUP BY user_id % 10
    """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event_type counts spread to columns per user bucket. The
    pivot values are declared explicitly -- at scale an undeclared pivot
    triggers a distinct-scan planning pass you don't want."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS VARCHAR) AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           CAST(strftime(last_day(o_orderdate), '%Y-%m-%d') AS VARCHAR) AS month_end,
           CAST(date_part('dow', o_orderdate) AS INT) AS dow,
           CAST(date_part('quarter', o_orderdate) AS INT) AS qtr
    FROM orders
    """,
    tags=("date",),
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic kernel: interval add, day difference, month end,
    day-of-week, quarter (T12-adjacent). Dates rendered as strings so
    the comparison is calendar math, not timestamp encoding."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("bigint").alias("days_since_95"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek(d) - 1).cast("int").alias("dow"),  # Spark 1=Sun -> 0=Sun
        F.quarter(d).cast("int").alias("qtr"),
    )


@register(
    "q_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           (CASE WHEN l_discount = 0 THEN NULL ELSE l_quantity / NULLIF(l_discount, 0) END)
             IS NULL AS qty_per_disc_null,
           IFNULL(NULLIF(CAST(l_quantity AS BIGINT), 0), -1) AS qty_or_neg1,
           CASE WHEN l_tax > 0.05 THEN 'high' WHEN l_tax > 0.02 THEN 'mid' ELSE 'low' END AS tax_band
    FROM lineitem
    """,
    tags=("transform", "null"),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics kernel: coalesce/nullif/ifnull and multi-branch
    CASE -- the null-propagation contract every transform in the
    reference implicitly relies on (pandas NaN vs SQL NULL is a classic
    porting bug; here the engine is held to SQL NULL rules exactly)."""
    li = table(spark, sf_dir, "lineitem")
    qty_per_disc = F.when(F.col("l_discount") == 0, F.lit(None)).otherwise(
        F.col("l_quantity") / F.nullif(F.col("l_discount"), F.lit(0))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        qty_per_disc.isNull().alias("qty_per_disc_null"),
        F.ifnull(F.nullif(F.col("l_quantity").cast("bigint"), F.lit(0)), F.lit(-1)).alias("qty_or_neg1"),
        F.when(F.col("l_tax") > 0.05, "high")
        .when(F.col("l_tax") > 0.02, "mid")
        .otherwise("low")
        .alias("tax_band"),
    )


@register(
    "q_array_agg_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("agg", "array"),
)
def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: collect_list is shuffle-order-dependent,
    so determinism comes from array_sort before rendering -- the only
    safe way to oracle a collected array."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(CAST(l_quantity AS BIGINT)) AS median_qty,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25_qty,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.90) AS p90_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based, linear interpolation) on integer
    quantities -- interpolation arithmetic on exact ints is
    cross-engine stable where it would NOT be on arbitrary doubles.
    The approximate variant (approx_percentile / KLL at scale) stays
    rows-only like q_agg_approx_distinct."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("median_qty"),
        F.percentile(q, F.lit(0.25)).alias("p25_qty"),
        F.percentile(q, F.lit(0.90)).alias("p90_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_percentiles_approx",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(CAST(l_quantity AS BIGINT)) AS exact_median,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.90) AS exact_p90,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "approx"),
)
def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path (q_percentiles' documented scale
    variant): approx_percentile with accuracy 10000 -- bounded sketch
    state instead of a per-group sort. Contract shape like
    q_approx_distinct_err: the sketch values are engine-internal, but
    |approx - exact| <= 1 on the 1..50 integer quantity scale is a
    deterministic verdict the oracle pins to TRUE."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("exact_median"),
        F.percentile(q, F.lit(0.90)).alias("exact_p90"),
        F.percentile_approx(q, F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx(q, F.lit(0.90), F.lit(10000)).alias("a90"),
    )
    ok = (F.abs(F.col("a50") - F.col("exact_median")) <= 1) & (
        F.abs(F.col("a90") - F.col("exact_p90")) <= 1
    )
    return agg.select("l_returnflag", "exact_median", "exact_p90", ok.alias("approx_ok"))


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) vs the UNION ALL of q_union_all: dedup across
    the branches -- planned as union + hash aggregate."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "q_filtered_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           {sql_dsum('l_extendedprice').replace('SUM(', 'SUM(').replace('CAST(SUM', 'CAST(SUM')} AS sum_all,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,10)))
                FILTER (WHERE l_discount > 0.05) AS VARCHAR) AS DOUBLE) AS sum_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (conditional aggregation without CASE
    gymnastics), decimal-exact where doubles are summed."""
    from docker_based_real_time_etl_project_spark.functions import DEC, _dec_to_double

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        dsum("l_extendedprice").alias("sum_all"),
        _dec_to_double(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice").cast(DEC)))
        ).alias("sum_discounted"),
    )


@register(
    "q_regexp_all",
    oracle=r"""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ') AS words,
           len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled,
           regexp_matches(p_name, '^[a-z]') AS starts_lower
    FROM part
    """,
    tags=("string",),
)
def q_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp kernel: extract-all (joined to a space-delimited string so
    the driver's pandas canonicalizer can sort the column -- raw
    array<string> cells are unhashable there), global replace, match
    test. Complements q_str_funcs' single-capture extract."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(F.regexp_extract_all("p_name", F.lit(r"[a-z]+"), 0), " ").alias("words"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[a-z]+"), 0)).cast("bigint").alias("n_words"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_devoweled"),
        F.col("p_name").rlike("^[a-z]").alias("starts_lower"),
    )


@register(
    "q_join_salted",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "scale"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join (operators/skew.py
    salted_broadcast_free_join): fact salted from its own unique key,
    dim exploded n_salts ways, join on (key, salt). The oracle is the
    PLAIN join -- salting must be invisible in the result. Completes
    the skew toolbox next to q_agg_salted (AQE splits skewed
    sort-merge joins, but not pre-shuffled or non-SMJ plans; salting
    is the deterministic fallback)."""
    from docker_based_real_time_etl_project_spark.operators.skew import (
        salted_broadcast_free_join,
    )

    o = table(spark, sf_dir, "orders")
    # merge hint keeps the demo on the shuffle path (broadcast would
    # make salting moot -- the operator exists for dims too big for it)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").hint("merge")
    joined = salted_broadcast_free_join(
        o.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"),
        c,
        on=["c_custkey"],
        n_salts=16,
        salt_from=["o_orderkey"],
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter ->
    3-way join -> grouped revenue -> total-order top-10. The customer
    filter broadcasts; lineitem shuffles once on orderkey; the LIMIT
    rides TakeOrderedAndProject, not a full sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        agg.select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (supplier volume by nation within a region): a
    dim snowflake (region -> nation -> supplier) collapses via chained
    broadcasts; the fact shuffles once for the final per-nation
    aggregate."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    dims = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_fuzzy_match",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("dedup", "string"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match: near-identical part names by edit
    distance, BLOCKED on brand so the self-join is per-block all-pairs
    (the classic record-linkage shape), never corpus x corpus. At scale
    the block key comes from a cheap canopy (prefix/soundex/minhash);
    levenshtein runs only inside blocks."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    pairs = a.join(b, ["brand"]).filter(F.col("key_a") < F.col("key_b"))
    return (
        pairs.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id % 10 AS user_bucket,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             COUNT(CASE WHEN event_type = 'view'  THEN 1 END) AS view,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
      FROM events
      GROUP BY user_id % 10
    )
    SELECT user_bucket, kind, n
    FROM wide
    UNPIVOT (n FOR kind IN (click, view, error))
    """,
    tags=("transform", "pivot"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-type counts back to long form -- the
    inverse of q_pivot, completing the reshape pair. Pure projection
    after the aggregate (each wide row expands to 3 long rows,
    no shuffle added). UNPIVOT drops NULL cells by default in both
    engines; COUNT never yields NULL so the pair is total here."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error"),
    )
    return wide.unpivot(
        ids=["user_bucket"], values=["click", "view", "error"],
        variableColumnName="kind", valueColumnName="n",
    )


@register(
    "q_except_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): each 'R' occurrence cancels ONE
    'N' occurrence of the same partkey, so surviving duplicates carry
    their multiplicity -- semantics DISTINCT-based EXCEPT (q_except)
    cannot express. One shuffle on the value; counts subtract
    per-partition partials."""
    li = table(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_returnflag") == "N").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return n.exceptAll(r)


@register(
    "q_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): min(multiplicity) copies
    survive per value."""
    li = table(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_returnflag") == "N").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return n.intersectAll(r)
