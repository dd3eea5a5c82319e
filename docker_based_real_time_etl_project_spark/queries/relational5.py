"""TPC-H shape completion (round 3): Q4, Q8, Q15, Q16, Q20 — the
last decision-support shapes missing from the surface. With these,
all 22 TPC-H query shapes exist in an adaptation to this schema
(inventory in COVERAGE.md §2.4).

Planner features exercised here and nowhere else:

- **Q16's NOT IN** is NULL-AWARE anti-join semantics — a different
  physical operator (null-aware BroadcastHashJoin LeftAnti) from the
  NOT EXISTS anti joins elsewhere; if the subquery could yield a
  NULL, `NOT IN` must return no rows, and the planner has to prove
  or check that at runtime.
- **Q15's CTE** is referenced twice (join input + scalar MAX) — the
  reuse/inline decision is the planner's, not hand-scheduled.
- **Q20 nests** an IN subquery whose HAVING itself contains a scalar
  subquery — two levels of rewrite in one predicate.
- **Q4's EXISTS** correlates on a non-equality time predicate
  (shipdate vs its own order's date); precomputing the late-order set
  in a CTE reduces it to the equality correlation Catalyst turns
  into a left-semi join — same trick as Q21 in ``relational4``.

The reference has no relational operators (SURVEY.md 2.4 —
`etl.py:114-179` is five fixed pandas projections); money/quantity
sums take the DECIMAL(25,10) hop on both engines so HAVING and
equality-to-MAX boundaries are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.registry import (
    dsum, register, sql_dsum, table,
)
from docker_based_real_time_etl_project_spark.queries.relational4 import (
    _sp_dsum, _views,
)

# ---------------------------------------------------------------------------
# Q4 shape: order-priority checking (EXISTS against late lineitems)
# ---------------------------------------------------------------------------

_Q4_SQL = """
WITH late_lines AS (
  SELECT DISTINCT l.l_orderkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
SELECT o.o_orderpriority AS o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM late_lines ll WHERE ll.l_orderkey = o.o_orderkey)
GROUP BY o.o_orderpriority
"""


@register("q_priority_waiting", oracle=_Q4_SQL, tags=("subquery", "agg", "tpch"))
def q_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter that had at least one late
    line, counted by priority. "Late" (no commit/receipt dates in this
    schema) = shipped >30 days after its own order date — a
    non-equality correlation, precomputed once in a CTE so the EXISTS
    correlates on plain orderkey equality and plans as a left-semi
    join.

    Scale shape: the quarter filter pushes to the orders scan; the
    late set carries orderkeys only; one semi-join shuffle + one
    5-group aggregate.
    """
    _views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_Q4_SQL)


# ---------------------------------------------------------------------------
# Q8 shape: national market share within a region
# ---------------------------------------------------------------------------

@register(
    "q_market_share",
    oracle=f"""
    WITH all_n AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
             / {sql_dsum('volume')} AS mkt_share
    FROM all_n
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of PROMO-part revenue sold to
    ASIA customers, per year — an 8-way join tree feeding a
    conditional-over-total aggregate.

    Scale shape: region/nation broadcast always; part's type filter
    prunes before its join; the only big shuffles are fact↔orders.
    Both the conditional and total sums take the decimal hop, and
    their per-year ratio divides two bit-identical doubles.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            ).select(F.col("n_nationkey").alias("c_nationkey"))
        ),
        "c_nationkey",
    )
    supp_n = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        "s_nationkey",
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_7", volume).otherwise(F.lit(0.0)))
                / dsum(volume)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier via a twice-referenced CTE + scalar MAX
# ---------------------------------------------------------------------------

_Q15_SQL_T = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {DSUM} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       r.total_revenue AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "q_top_supplier",
    oracle=_Q15_SQL_T.format(DSUM=sql_dsum("l_extendedprice * (1 - l_discount)")),
    tags=("subquery", "agg", "tpch"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue
    — a CTE referenced twice (join input AND the scalar MAX), leaving
    the reuse-vs-inline decision to the planner.

    Scale shape: revenue is one grouped aggregate of the
    date-pruned fact scan; the MAX collapses it to a single broadcast
    row; supplier joins a ≤|suppliers| relation. The revenue doubles
    are decimal-hopped so equality-to-MAX selects identical rows in
    both engines.
    """
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        _Q15_SQL_T.format(DSUM=_sp_dsum("l_extendedprice * (1 - l_discount)"))
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN (null-aware anti join) + COUNT DISTINCT
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 5, 9, 13, 17)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_name LIKE '%1')
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q_supplier_cnt", oracle=_Q16_SQL, tags=("subquery", "agg", "tpch"))
def q_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) for selected sizes, excluding a supplier blocklist via NOT
    IN — which is NULL-AWARE anti-join semantics, a different physical
    join from the NOT EXISTS anti elsewhere (one NULL in the subquery
    would legally empty the result, and the plan must account for it).

    Scale shape: the brand/size predicates prune part before its
    join; the blocklist broadcasts; COUNT(DISTINCT) is a two-phase
    partial-distinct aggregate on (group, suppkey).
    """
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16_SQL)


# ---------------------------------------------------------------------------
# Q20 shape: nested IN whose HAVING holds its own scalar subquery
# ---------------------------------------------------------------------------

_Q20_SQL_T = """
SELECT s.s_name AS s_name, s.s_acctbal AS s_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_2', 'NATION_7')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%gear%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey
    HAVING {DSUM_Q} > 0.5 * (
      SELECT {DSUM_Q2} / COUNT(DISTINCT l2.l_suppkey)
      FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
      WHERE p2.p_name LIKE '%gear%'
        AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
"""


@register(
    "q_excess_shippers",
    oracle=_Q20_SQL_T.format(
        DSUM_Q=sql_dsum("l.l_quantity"), DSUM_Q2=sql_dsum("l2.l_quantity")
    ),
    tags=("subquery", "join", "tpch"),
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in two nations who shipped more than
    half the per-supplier average quantity of pattern-matched parts in
    a year — an IN subquery that is itself an aggregate whose HAVING
    contains another (uncorrelated) scalar subquery. Two rewrite
    levels: the IN becomes a left-semi join, the scalar a broadcast
    single row.

    Scale shape: part's name filter prunes before the fact join
    (runtime-filterable down to lineitem at scale); the semi-join side
    carries only qualifying suppkeys; quantity sums take the decimal
    hop so the HAVING threshold compares bit-identically.
    """
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(
        _Q20_SQL_T.format(
            DSUM_Q=_sp_dsum("l.l_quantity"), DSUM_Q2=_sp_dsum("l2.l_quantity")
        )
    )


@register(
    "q_skyline",
    oracle="""
    WITH o95 AS (
        SELECT * FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
    )
    SELECT p.o_orderpriority, p.o_orderkey,
           epoch_us(p.o_orderdate) AS date_us, p.o_totalprice
    FROM o95 p
    WHERE NOT EXISTS (
        SELECT 1 FROM o95 q
        WHERE q.o_orderpriority = p.o_orderpriority
          AND q.o_orderdate <= p.o_orderdate
          AND q.o_totalprice >= p.o_totalprice
          AND (q.o_orderdate < p.o_orderdate
               OR q.o_totalprice > p.o_totalprice)
    )
    """,
    tags=("window", "skyline", "scale"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier): per priority, the orders no
    other order dominates on (earlier-or-equal date, higher-or-equal
    price, strictly better in one) — the multi-criteria shortlist
    (cheapest-and-earliest / best-and-freshest) whose naive form is
    the quadratic NOT EXISTS self-join the oracle runs. The engine's
    plan is the sort-scan identity: ordered by date, a point is on
    the frontier iff its price strictly exceeds every EARLIER date's
    running max (else something older is at least as good in both
    dims) and equals the running max INCLUDING its own date (else a
    same-date point strictly beats it); exact duplicates survive on
    both sides of the algebra, matching dominance's reflexivity. Two
    RANGE-frame windows over one priority-key exchange — O(n log n)
    per group against the oracle's O(n^2), and the frontier output is
    tiny. Dates compare as integer epoch micros on both engines."""
    o = (
        table(spark, sf_dir, "orders")
        # one order-year scope: the oracle is the quadratic NOT
        # EXISTS, and a year keeps its cold cost in seconds while
        # exercising every dominance case (the engine plan is
        # indifferent — the filter pushes into the scan)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("date_us"),
            "o_totalprice",
        )
    )
    before = (
        Window.partitionBy("o_orderpriority")
        .orderBy("date_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    incl = (
        Window.partitionBy("o_orderpriority")
        .orderBy("date_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        o.withColumn("m_before", F.max("o_totalprice").over(before))
        .withColumn("m_incl", F.max("o_totalprice").over(incl))
        .filter(
            (
                F.col("m_before").isNull()
                | (F.col("o_totalprice") > F.col("m_before"))
            )
            & (F.col("o_totalprice") == F.col("m_incl"))
        )
        .select("o_orderpriority", "o_orderkey", "date_us", "o_totalprice")
    )
