"""Correlated-subquery / decorrelation surface (round 3): the TPC-H
shapes whose defining feature is a subquery Catalyst must rewrite —
scalar-equals-aggregate (Q2), HAVING-vs-global-scalar (Q11),
left-join count distribution (Q13), correlated per-group average
(Q17), chained EXISTS / NOT EXISTS over a derived relation (Q21),
scalar-average gate + NOT EXISTS (Q22), and a LATERAL top-N join.

The reference has no relational operators at all (SURVEY.md 2.4 —
`etl.py:114-179` is five fixed pandas projections); this module
completes the decision-support surface started in ``relational.py`` /
``relational3.py`` with the *subquery-rewrite* half of the planner.

Why these matter at 100 TB:

- Correlated scalar subqueries naively re-execute the inner query per
  outer row — a disaster at scale. Catalyst decorrelates them into an
  aggregate + join (visible in the plan as one extra shuffle, not N
  probes); half of these queries are deliberately written as Spark SQL
  text so the *rewrite path* is what's exercised, not a hand-built
  join.
- EXISTS / NOT EXISTS become left-semi / left-anti joins — linear,
  shuffle-partitioned, no row explosion.
- The LATERAL top-N decorrelates into a ranked window over the
  (broadcast-joined) right side rather than 25 separate sorted scans.
- Like the rest of the surface, money sums go through DECIMAL(25,10)
  (:func:`~docker_based_real_time_etl_project_spark.functions.dsum`) so partial-agg
  ordering can't flip a HAVING comparison between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    dsum, register, sql_dsum, table,
)

# Spark SQL twin of sql_dsum/sql_davg: Spark spells the string type
# STRING (bare VARCHAR is not a Spark type); the chain is otherwise
# identical, so both engines produce the bit-identical double.
def _sp_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,10))) AS STRING) AS DOUBLE)"


def _sp_davg(expr: str) -> str:
    return f"{_sp_dsum(expr)} / COUNT({expr})"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Q2 shape: scalar subquery correlated to an aggregate (max per group)
# ---------------------------------------------------------------------------

@register(
    "q_max_acctbal_supplier",
    oracle="""
    SELECT n.n_name AS nation, s.s_name AS s_name, s.s_acctbal AS s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
    tags=("subquery", "join", "tpch"),
)
def q_max_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: rows matching a per-group aggregate via a
    correlated scalar subquery (the min-cost-supplier pattern, on the
    columns this schema has).

    Written as SQL so Catalyst's decorrelation is what runs: the inner
    MAX becomes one grouped aggregate joined back on s_nationkey —
    1 shuffle of a 100-row dim at test SF, and at 100 TB still a
    single agg+join, never a per-row re-execution. MAX is exact on
    doubles (no summation), so no decimal hop is needed.
    """
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation, s.s_name AS s_name, s.s_acctbal AS s_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
        """
    )


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against an uncorrelated global-aggregate scalar
# ---------------------------------------------------------------------------

_Q11_EXPR = "l_extendedprice * (1 - l_discount)"


@register(
    "q_important_parts",
    oracle=f"""
    SELECT l_partkey, {sql_dsum(_Q11_EXPR)} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {sql_dsum(_Q11_EXPR)} >
           (SELECT {sql_dsum(_Q11_EXPR)} * 0.0005 FROM lineitem)
    """,
    tags=("subquery", "agg", "tpch"),
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue kept only when it exceeds a
    fraction of the global total (a scalar subquery over the same
    fact table).

    DataFrame form of the decorrelated plan: one grouped aggregate,
    one single-row global aggregate broadcast into the filter. The
    fact table is scanned twice; at 100 TB an optimizer may reuse the
    grouped result to derive the total — here both sums are
    decimal-exact so the 0.0005 threshold compares identically in
    both engines (a double HAVING boundary is where partial-agg
    reordering would otherwise flip rows).
    """
    li = table(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(val).alias("part_value"))
    total = li.agg((dsum(val) * F.lit(0.0005)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q13 shape: left-outer count distribution (customers with zero orders kept)
# ---------------------------------------------------------------------------

@register(
    "q_cust_order_dist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed N (non-urgent)
    orders, including N=0 — the join predicate must live in the LEFT
    JOIN's ON clause (a WHERE would drop the zero-order customers).

    Scale shape: the non-equi part of the condition filters orders
    BEFORE the shuffle; two cascaded hash aggregates, the second over
    at most ~hundreds of distinct counts — trivially small. COUNT is
    integral so no decimal hop.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average gate
# ---------------------------------------------------------------------------

@register(
    "q_small_qty_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.2 * (
            SELECT {sql_dsum('l2.l_quantity')} / COUNT(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("subquery", "join", "agg", "tpch"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity lines, where "small"
    is relative to that part's own average quantity — a scalar
    subquery correlated on l_partkey.

    The DataFrame form IS the decorrelated plan: per-part averages
    (one agg over lineitem), joined back on partkey, then the gate.
    At 100 TB the naive correlated form would probe lineitem once per
    row; this shape is two shuffles total and the brand filter prunes
    part before its join. The average goes through the decimal hop on
    BOTH sides so the 0.2*avg boundary is bit-identical.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        (dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("pp_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q21 shape: chained EXISTS / NOT EXISTS over a derived relation
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS is_late,
         o.o_orderstatus
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT s.s_name AS s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN late l1 ON s.s_suppkey = l1.l_suppkey
WHERE n.n_name = 'NATION_3'
  AND l1.o_orderstatus = 'F'
  AND l1.is_late = 1
  AND EXISTS (SELECT 1 FROM late l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late = 1)
GROUP BY s.s_name
"""


@register("q_waiting_suppliers", oracle=_Q21_SQL, tags=("subquery", "join", "tpch"))
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order — an EXISTS (some other supplier on the
    order) chained with a NOT EXISTS (no other LATE supplier).

    The reference schema has no commit/receipt dates, so "late" is
    shipdate > orderdate + 60 days, precomputed once in a CTE so both
    existentials correlate on plain equality (l_orderkey) — the form
    Catalyst turns into one left-semi and one left-anti join. At
    100 TB that is three shuffles of lineitem by orderkey (CTE + two
    probes) and zero per-row re-execution; the semi/anti sides carry
    only (orderkey, suppkey, is_late).
    """
    _views(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    return spark.sql(_Q21_SQL)


# ---------------------------------------------------------------------------
# Q22 shape: scalar-average gate + NOT EXISTS anti-join
# ---------------------------------------------------------------------------

@register(
    "q_idle_customers",
    oracle=f"""
    SELECT CAST(c.c_custkey % 7 AS BIGINT) AS seg,
           COUNT(*) AS numcust,
           {sql_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_custkey % 7 IN (1, 3, 5)
      AND c.c_acctbal > (SELECT {sql_dsum('c2.c_acctbal')} / COUNT(c2.c_acctbal)
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 350000)
    GROUP BY CAST(c.c_custkey % 7 AS BIGINT)
    """,
    tags=("subquery", "agg", "tpch"),
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers (above the positive-
    balance average — an uncorrelated scalar subquery) who never
    placed a high-value order (NOT EXISTS — anti-join), grouped by a
    derived segment (custkey mod 7 stands in for the phone country
    code this schema lacks).

    Written as SQL: the scalar average becomes a broadcast single-row
    subquery and the NOT EXISTS a left-anti join against orders
    pre-filtered to >350k — at 100 TB the anti side shuffles only the
    filtered order keys. The average and the output sum take the
    decimal hop on both engines.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        f"""
        SELECT CAST(c.c_custkey % 7 AS BIGINT) AS seg,
               COUNT(*) AS numcust,
               {_sp_dsum('c.c_acctbal')} AS totacctbal
        FROM customer c
        WHERE c.c_custkey % 7 IN (1, 3, 5)
          AND c.c_acctbal > (SELECT {_sp_davg('c2.c_acctbal')}
                             FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000)
        GROUP BY CAST(c.c_custkey % 7 AS BIGINT)
        """
    )


# ---------------------------------------------------------------------------
# LATERAL top-N: per-group top-k via a correlated LIMIT subquery
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name AS n_name, t.s_name AS s_name, t.s_acctbal AS s_acctbal
FROM nation n,
LATERAL (SELECT s_name, s_acctbal FROM supplier s
         WHERE s.s_nationkey = n.n_nationkey
         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
"""


@register("q_lateral_topn", oracle=_LATERAL_SQL, tags=("subquery", "join"))
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 suppliers by account balance via a LATERAL
    correlated LIMIT subquery — the SQL spelling of top-k-per-group
    (the window-function spelling is ``q_win_rank``).

    Catalyst decorrelates the LATERAL into a ranked rewrite over the
    joined right side instead of running 25 separate sorted scans —
    at 100 TB this is one shuffle of supplier by nationkey with a
    per-partition top-k (no global sort). s_name breaks balance ties
    so the row set is deterministic.
    """
    _views(spark, sf_dir, "nation", "supplier")
    return spark.sql(_LATERAL_SQL)
