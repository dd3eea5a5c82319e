"""Iterative / theta-join query shapes the relational surface lacked:

- ``q_hierarchy_closure``: transitive closure over a forest by POINTER
  JUMPING (path doubling) — O(log depth) join rounds instead of
  O(depth), the scale-correct plan for hierarchy flattening (org
  charts, category trees, BOM explosion). Oracle = DuckDB's native
  ``WITH RECURSIVE``, so the doubling algebra is held to the exact
  fixpoint semantics.
- ``q_join_interval_overlap``: a PURE interval-overlap join (no equi
  key at all — `q_join_range` at relational.py:322 still shuffles on
  an equi key). The scale plan maps every interval to its covered
  coarse time buckets, equi-joins on the bucket, and keeps the exact
  overlap predicate as a residual with a start-bucket dedup guard —
  candidate generation is bounded by bucket co-occupancy, never the
  row-count product.

The reference has no recursive or theta-join machinery (its only
joins are implicit Kafka-topic fanouts, `cassandra-sink-config.json:6`);
these extend the engine per BASELINE.json's 100 TB north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_based_real_time_etl_project_spark.queries.materialize import (
    table_fingerprint,
)
from docker_based_real_time_etl_project_spark.queries.registry import (
    dsum,
    register,
    sql_dsum,
    table,
)

# Forest over the customer keys: parent(c) = c DIV 8 + c % 7 for c >= 8
# (strictly decreasing, lands inside the dense 0..max key space, and the
# `% 7` term makes the pointer data-dependent enough that the closure
# below genuinely joins a materialized edge table rather than collapsing
# to closed-form arithmetic); nodes 0..7 are roots.
_ROOT_BOUND = 8


def _parent_expr(col: str) -> str:
    return f"{col} DIV 8 + {col} % 7"


def _closure(
    spark: SparkSession, sf_dir: str, *, carry_path: bool = False,
    node_filter: str | None = None,
) -> DataFrame:
    """(node, cur=root, depth[, path]) over the synthetic customer
    forest via operators/graph.pointer_jump. The jump table always
    covers EVERY non-root customer; ``node_filter`` restricts only the
    resolved state set (the jump table must still carry the
    intermediate ancestors the filtered nodes walk through)."""
    from docker_based_real_time_etl_project_spark.operators.graph import (
        pointer_jump,
    )

    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    edges = c.filter(F.col("node") >= _ROOT_BOUND).select(
        "node", F.expr(_parent_expr("node")).alias("parent")
    )
    nodes = c.filter(F.expr(node_filter)) if node_filter else c
    return pointer_jump(
        nodes,
        edges,
        root_bound_expr=f"cur < {_ROOT_BOUND}",
        fallback_parent_expr=_parent_expr("cur"),
        carry_path=carry_path,
    )


@register(
    "q_hierarchy_closure",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
        UNION ALL
        SELECT node, cur // 8 + cur % 7, depth + 1 FROM w WHERE cur >= 8
    )
    SELECT cur AS root,
           COUNT(*) AS n_nodes,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(SUM(node) AS BIGINT) AS sum_key
    FROM w WHERE cur < 8
    GROUP BY cur
    """,
    tags=("graph", "iterative", "scale"),
)
def q_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVE CLOSURE BY POINTER JUMPING: every customer node walks
    a synthetic forest (parent = ``node DIV 8 + node % 7``) to its
    root, but instead of one join per level (O(depth) shuffle rounds —
    the naive loop), the jump table composes with ITSELF each round
    (J' = J∘J), so after k rounds every state advances 2^k levels:
    O(log depth) rounds total. At 100 TB this is the difference
    between ~8 shuffle rounds and ~3 for a 15M-node forest, and the
    per-round cost stays one keyed equi-join on the (node -> ancestor)
    table. ``localCheckpoint`` truncates the doubling lineage exactly
    as the connected-components operator does (operators/dedup.py).
    The convergence probe is one ``isEmpty`` action per round —
    O(log depth) driver round-trips, never a per-row collect. The
    DuckDB oracle walks the same forest with a native recursive CTE,
    so the doubled-step depth accounting must land on the exact
    per-node (root, depth) fixpoint to hash-match the bigint sums.

    The jump join is TOTAL over any key set: a state whose current
    ancestor value has no jump entry (possible when keys are sparse —
    e.g. the offset-replicated sf1/sf10 stress data — since the
    arithmetic parent of a key need not itself be a key) falls back to
    ONE arithmetic parent step via coalesce, so correctness never
    depends on key density; dense keys get the full 2^k doubling,
    stray values converge in <= 21 single steps (parent divides by 8,
    so depth <= log8(2^63)).
    """
    state = _closure(spark, sf_dir)
    return state.groupBy(F.col("cur").alias("root")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("depth").cast("bigint").alias("max_depth"),
        F.sum("node").cast("bigint").alias("sum_key"),
    )


# Interval-overlap join fixtures: sparse 30-day "promo windows" (one
# per ~6007 orders) against every order's own activity interval
# [o_orderdate, o_orderdate + (o_orderkey % 14) days]. Both derived
# deterministically from orders so the oracle restates them exactly.
_W_PRED = "o_orderkey % 6007 = 1"
_W_DAYS = 30
_IV_DAYS = "o_orderkey % 14"

# Adaptive bucket width per sf_dir (the _Z3_CACHE discipline): the P99
# interval-length aggregate is an eager action at DataFrame-build time,
# so without this cache every rebuild of q_join_interval_overlap (plan
# fingerprinting, repeated bench fn() calls, oracle-comparison setup)
# would re-pay two column-pruned input scans — and approx_percentile's
# partitioning-dependent result could move the width (and therefore the
# plan fingerprint) between builds. Correctness is width-independent;
# caching pins cost AND fingerprint within a process. Keyed by
# (sf_dir, table_fingerprint(orders)) — the materialize_once
# discipline — so an in-process regeneration of the tables under an
# sf_dir invalidates the cached width instead of silently reusing it.
_IOB_WIDTH_CACHE: dict[tuple, int] = {}
# Bucket width is ADAPTIVE (operators/interval.py: P99 interval
# length), so any typical interval covers <= 2 buckets and a skewed
# long tail pays explode rows instead of widening the bucket.


@register(
    "q_join_interval_overlap",
    oracle=f"""
    WITH w AS (
        SELECT o_orderkey AS w_key, o_orderdate AS w_start,
               o_orderdate + INTERVAL {_W_DAYS} DAY AS w_end
        FROM orders WHERE {_W_PRED}
    ),
    iv AS (
        SELECT o_orderkey, o_totalprice, o_orderdate AS s,
               o_orderdate + ({_IV_DAYS}) * INTERVAL 1 DAY AS e
        FROM orders
    )
    SELECT w.w_key, COUNT(*) AS n_overlap,
           {sql_dsum("iv.o_totalprice")} AS total_price
    FROM w JOIN iv ON iv.s <= w.w_end AND w.w_start <= iv.e
    GROUP BY w.w_key
    """,
    tags=("join", "interval", "scale"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE INTERVAL-OVERLAP JOIN, BUCKETIZED: match every order whose
    activity interval [orderdate, orderdate + key%14 days] overlaps a
    sparse set of 30-day windows — NO equi key exists, so the naive
    plan is a cross join with a theta residual (O(|A|x|B|), the plan
    Spark itself picks for a bare theta join). The scale plan
    (operators/interval.py) maps each interval to the coarse time
    buckets it covers, equi-joins on the bucket with the EXACT overlap
    predicate as residual, and dedups multi-bucket matches with the
    start-bucket guard — exactly-once at ANY width. The width itself
    is ADAPTIVE: the observed P99 interval length (here the 30-day
    windows dominate the tail), so a skewed length distribution (one
    year-long interval among day-long ones) costs that interval a few
    extra explode rows instead of widening everyone's bucket toward a
    per-bucket cartesian. Candidate cost is bucket co-occupancy
    (data-local), not the row product; the shuffle key is the bucket.
    The oracle runs the direct theta join, so the decomposition must
    reproduce the exact overlap set. Timestamps bucket via
    cast-to-long epoch seconds (timezone-independent), symmetric on
    both sides."""
    from docker_based_real_time_etl_project_spark.operators.interval import (
        adaptive_bucket_s,
        interval_overlap_join,
    )

    o = table(spark, sf_dir, "orders")
    w = o.filter(F.expr(_W_PRED)).select(
        F.col("o_orderkey").alias("w_key"),
        F.col("o_orderdate").cast("long").alias("w_s"),
        (F.col("o_orderdate").cast("long") + F.lit(_W_DAYS * 86400)).alias("w_e"),
    )
    iv = o.select(
        F.col("o_totalprice"),
        F.col("o_orderdate").cast("long").alias("iv_s"),
        (
            F.col("o_orderdate").cast("long")
            + F.expr(_IV_DAYS).cast("long") * 86400
        ).alias("iv_e"),
    )
    cache_key = (sf_dir, table_fingerprint(sf_dir, "orders"))
    if cache_key not in _IOB_WIDTH_CACHE:
        _IOB_WIDTH_CACHE[cache_key] = adaptive_bucket_s(
            w, iv, ("w_s", "w_e"), ("iv_s", "iv_e")
        )
    pairs = interval_overlap_join(
        w, iv, ("w_s", "w_e"), ("iv_s", "iv_e"),
        bucket_s=_IOB_WIDTH_CACHE[cache_key],
    )
    return pairs.groupBy("w_key").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "q_hierarchy_rollup",
    oracle=f"""
    WITH RECURSIVE w AS (
        SELECT c_custkey AS node, c_custkey AS cur FROM customer
        UNION ALL
        SELECT node, cur // 8 + cur % 7 FROM w WHERE cur >= 8
    ),
    closure AS (SELECT node, cur AS root FROM w WHERE cur < 8)
    SELECT cl.root,
           COUNT(*) AS n_orders,
           {sql_dsum("o.o_totalprice")} AS total_rev
    FROM orders o JOIN closure cl ON o.o_custkey = cl.node
    GROUP BY cl.root
    """,
    tags=("graph", "iterative", "agg", "scale"),
)
def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHY ROLLUP: revenue aggregated to each subtree ROOT — the
    org-chart / category-tree rollup every BI stack needs and flat SQL
    can't express without recursion. The closure (node -> root, from
    the O(log depth) pointer-jumping operator) acts as a derived
    DIMENSION: the fact table equi-joins it on the child key and
    aggregates by root. At 100 TB the closure output is
    customer-sized (built once, reusable as a materialized dim), the
    fact join is an ordinary keyed shuffle (broadcastable when the
    hierarchy is small), and the rollup is one partial-agg exchange —
    recursion never touches the fact table. The oracle recomputes the
    closure with a native recursive CTE and joins directly; the
    decimal-hop sum makes base+closure bit-equal across engines.
    """
    closure = _closure(spark, sf_dir).select("node", F.col("cur").alias("root"))
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        o.join(closure, o.o_custkey == closure.node)
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_rev"),
        )
    )


@register(
    "q_hierarchy_path",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT c_custkey AS node, c_custkey AS cur,
               CAST(c_custkey AS VARCHAR) AS path
        FROM customer WHERE c_custkey % 97 = 0
        UNION ALL
        SELECT node, cur // 8 + cur % 7,
               path || '>' || CAST(cur // 8 + cur % 7 AS VARCHAR)
        FROM w WHERE cur >= 8
    )
    SELECT node, path FROM w WHERE cur < 8
    """,
    tags=("graph", "iterative"),
)
def q_hierarchy_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZED ANCESTOR PATHS THROUGH THE DOUBLING: every 97th
    node emits its full '>'-joined root path (the ltree/materialized-
    path column hierarchical schemas denormalize). The jump table
    carries, besides the 2^k-th ancestor, the exact path SEGMENT it
    skips, and J∘J concatenates the halves — so path construction
    inherits the O(log depth) round count instead of forcing the
    naive one-level-per-join walk. This pins strictly more than
    q_hierarchy_closure's (root, depth) sums: every intermediate
    ancestor, in order, must match DuckDB's recursive CTE character
    for character. The state set is filtered to the sampled nodes but
    the jump table must cover all customers (the sampled nodes walk
    through unsampled ancestors)."""
    state = _closure(
        spark, sf_dir, carry_path=True, node_filter="node % 97 = 0"
    )
    return state.select("node", "path")


# ---------------------------------------------------------------------------
# PageRank over the customer->supplier purchase graph
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 1_000_000_000
_PR_DAMP = 85  # percent


def _pagerank_oracle_sql() -> str:
    """The power method unrolled: one (dangling, contribs, ranks) CTE
    triple per iteration. DuckDB's recursive CTEs forbid aggregation
    over the recursive reference, so a fixed iteration count restates
    cleanest as a chain; every operation is integer (// floor-div on
    positives == Spark's DIV), making the restatement bit-exact."""
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, (SELECT {_PR_SCALE} // n FROM nn) AS rank FROM nodes
    )"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(f""",
    d{k} AS MATERIALIZED (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
      FROM r{k - 1} r LEFT JOIN deg ON r.node = deg.src
      WHERE deg.src IS NULL
    ),
    c{k} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS contrib
      FROM e JOIN deg d ON e.src = d.src JOIN r{k - 1} r ON e.src = r.node
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST((SELECT (CAST({_PR_SCALE} AS BIGINT) * {100 - _PR_DAMP} // 100)
                     // nn.n FROM nn)
             + (SELECT (dang * {_PR_DAMP} // 100) // (SELECT nn.n FROM nn)
                FROM d{k})
             + COALESCE(c.contrib, 0) * {_PR_DAMP} // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS node_type,
           node // 2 AS key, rank AS pr_nano, rnk
    FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
      FROM r{_PR_ITERS})
    WHERE rnk <= 100
    """
    return head + "".join(its) + tail


@register(
    "q_pagerank",
    oracle=_pagerank_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK over the bipartite customer->supplier purchase graph
    (edge = customer bought from supplier, via orders><lineitem): the
    canonical iterative-centrality workload, 5 synchronous power-
    method iterations at d=0.85 via operators/graph.pagerank. The
    bipartite shape exercises the dangling correction hard — EVERY
    supplier is dangling, so half the mass redistributes uniformly
    each round.

    Determinism: nano-rank integers end to end (per-edge contribution
    rank DIV degree, damping x*85 DIV 100, shares // N) — the oracle
    restates each iteration as a CTE triple and must match bit-for-bit,
    no epsilon. Top-100 by (rank, node) keeps the output bounded with
    TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import Window

    from docker_based_real_time_etl_project_spark.operators.graph import (
        pagerank,
    )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # checkpoint the edge build ONCE and derive the node set from the
    # materialization — nodes previously re-ran the join+distinct
    # lineage a second time (round 14)
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = pagerank(
        nodes, e, iters=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE,
        edges_materialized=True,
    )
    top = r.orderBy(F.col("rank").desc(), "node").limit(100)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.when(F.col("node") % 2 == 0, F.lit("cust"))
        .otherwise(F.lit("supp"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("key"),
        F.col("rank").alias("pr_nano"),
        "rnk",
    )


def _pagerank_weighted_oracle_sql() -> str:
    """The weighted power method unrolled: q_pagerank's CTE chain with
    the edge list carrying the per-pair purchase count and the per-edge
    contribution restated as (rank * w) // sum_w(src) — integer, so
    still bit-exact."""
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS MATERIALIZED (
      SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM e GROUP BY src
    ),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, (SELECT {_PR_SCALE} // n FROM nn) AS rank FROM nodes
    )"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(f""",
    d{k} AS MATERIALIZED (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
      FROM r{k - 1} r LEFT JOIN deg ON r.node = deg.src
      WHERE deg.src IS NULL
    ),
    c{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             CAST(SUM((r.rank * e.w) // d.sw) AS BIGINT) AS contrib
      FROM e JOIN deg d ON e.src = d.src JOIN r{k - 1} r ON e.src = r.node
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST((SELECT (CAST({_PR_SCALE} AS BIGINT) * {100 - _PR_DAMP} // 100)
                     // nn.n FROM nn)
             + (SELECT (dang * {_PR_DAMP} // 100) // (SELECT nn.n FROM nn)
                FROM d{k})
             + COALESCE(c.contrib, 0) * {_PR_DAMP} // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS node_type,
           node // 2 AS key, rank AS pr_nano, rnk
    FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
      FROM r{_PR_ITERS})
    WHERE rnk <= 100
    """
    return head + "".join(its) + tail


@register(
    "q_pagerank_weighted",
    oracle=_pagerank_weighted_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDGE-WEIGHTED PAGERANK over the purchase graph: the weight the
    global form distinct-ed away — lineitem count per (customer,
    supplier) pair, the natural purchase intensity — now splits each
    customer's mass proportionally: contribution = (rank * w) DIV
    sum_w(src), one integer multiply and floor divide per edge, so the
    unrolled-CTE oracle still matches bit-for-bit with no epsilon.
    Same 5-iteration / d=0.85 / nano-rank / dangling-correction
    machinery as q_pagerank (every supplier still dangles), same
    TakeOrderedAndProject top-100."""
    from pyspark.sql import Window

    from docker_based_real_time_etl_project_spark.operators.graph import (
        pagerank,
    )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # one checkpointed edge build feeds nodes AND the operator (r14)
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = pagerank(
        nodes, e, iters=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE,
        weight_col="w", edges_materialized=True,
    )
    top = r.orderBy(F.col("rank").desc(), "node").limit(100)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.when(F.col("node") % 2 == 0, F.lit("cust"))
        .otherwise(F.lit("supp"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("key"),
        F.col("rank").alias("pr_nano"),
        "rnk",
    )


_PPR_SEED = "node % 2000 = 0"  # customers with c_custkey % 1000 = 0


def _ppr_oracle_sql() -> str:
    """q_pagerank's unrolled power method with the teleport, initial
    mass, and dangling redistribution restricted to the seed set —
    random walk with restart. Same MATERIALIZED discipline (DuckDB
    inlines multiply-referenced CTEs)."""
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS MATERIALIZED (
      SELECT node, ({_PPR_SEED}) AS is_seed FROM (
        SELECT src AS node FROM e UNION SELECT dst FROM e)
    ),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    nn AS MATERIALIZED (
      SELECT COUNT(*) FILTER (WHERE is_seed) AS ns FROM nodes
    ),
    r0 AS MATERIALIZED (
      SELECT node, is_seed,
             CASE WHEN is_seed THEN (SELECT {_PR_SCALE} // ns FROM nn)
                  ELSE 0 END AS rank
      FROM nodes
    )"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(f""",
    d{k} AS MATERIALIZED (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
      FROM r{k - 1} r LEFT JOIN deg ON r.node = deg.src
      WHERE deg.src IS NULL
    ),
    c{k} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS contrib
      FROM e JOIN deg d ON e.src = d.src JOIN r{k - 1} r ON e.src = r.node
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node, n.is_seed,
             CAST(CASE WHEN n.is_seed THEN
               (SELECT (CAST({_PR_SCALE} AS BIGINT) * {100 - _PR_DAMP} // 100)
                       // nn.ns FROM nn)
               + (SELECT (dang * {_PR_DAMP} // 100) // (SELECT nn.ns FROM nn)
                  FROM d{k})
             ELSE 0 END
             + COALESCE(c.contrib, 0) * {_PR_DAMP} // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS node_type,
           node // 2 AS key, rank AS pr_nano, rnk
    FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
      FROM r{_PR_ITERS})
    WHERE rnk <= 100
    """
    return head + "".join(its) + tail


@register(
    "q_pagerank_ppr",
    oracle=_ppr_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_pagerank_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (random walk with restart): the teleport,
    initial mass, and dangling redistribution land only on a sparse
    customer seed set (every 1000th customer), so the ranking measures
    PROXIMITY TO THE SEEDS — which suppliers those customers'
    purchases concentrate on, the graph-recommendation primitive
    (related-items, account-expansion). Same integer-exact machinery
    and per-iteration plan as q_pagerank (operators/graph.pagerank
    with ``seeds``); non-seed customers hold rank exactly 0 in this
    bipartite graph (no in-edges), a sharp structural pin the oracle
    must reproduce bit-for-bit."""
    from pyspark.sql import Window

    from docker_based_real_time_etl_project_spark.operators.graph import (
        pagerank,
    )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # one checkpointed edge build feeds nodes AND the operator (r14)
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.expr(_PPR_SEED))
    r = pagerank(
        nodes, e, iters=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE,
        seeds=seeds, edges_materialized=True,
    )
    top = r.orderBy(F.col("rank").desc(), "node").limit(100)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.when(F.col("node") % 2 == 0, F.lit("cust"))
        .otherwise(F.lit("supp"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("key"),
        F.col("rank").alias("pr_nano"),
        "rnk",
    )


# Scoped shuffle-partition sizing for the undirected-edge iterative
# family (round-12 verdict item 4): at sf10 the per-round (dst, label)
# / (dst, dist) hash aggregates OOM under the session's 32 shuffle
# partitions (multi-million-group hash maps per task x 32 concurrent
# tasks — the honest finding in SCALE.md), while a GLOBAL partition
# raise was measured and rejected (30-55% slowdown on the whole
# iterative family at sf0.1). The scoped fix sizes
# spark.sql.shuffle.partitions PER QUERY from the edge-build input's
# on-disk bytes — the same rule a cluster deployment applies per data
# scale — for exactly the duration of the eager per-round checkpoints,
# restoring the session value after. At the shipped SFs the estimate
# never exceeds the session value (sf0.1 lineitem ~11 MB, sf1 ~184 MB
# -> unchanged plans, bench stays in the noise band); at sf10
# (~1.8 GB) it lands at ~220. Partition count alone is NOT enough on
# the default 16 GiB heap (measured this round: heap OOM in a round-5
# aggregate at 110 partitions): the checkpointed undirected edge table
# (~110 M rows at sf10) also squats on the unified memory region the
# per-round hash aggregates need, so in big-scale mode (estimate >
# session value) the edge checkpoint is stored DISK_ONLY — lineage
# truncation without the storage-memory tax; each round re-streams the
# edges from local disk, which the sf10 spot prices honestly. At the
# shipped SFs big-scale mode never engages and plans are unchanged.
_GRAPH_PART_TARGET_BYTES = 8 << 20


def _graph_shuffle_partitions(spark: SparkSession, sf_dir: str) -> int:
    """max(session value, min(256, ceil(edge-input bytes /
    _GRAPH_PART_TARGET_BYTES = 8 MiB)))."""
    import os

    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = os.path.join(sf_dir, "lineitem.parquet")
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        return session
    est = -(-nbytes // _GRAPH_PART_TARGET_BYTES)
    return max(session, min(256, est))


def _graph_ckpt_level(big: bool):
    """Storage level for the giant edge-table checkpoint: DISK_ONLY in
    big-scale mode (frees the unified memory region for the per-round
    hash aggregates — the measured sf10 OOM cause), engine default
    otherwise (None keeps the shipped-SF plans byte-identical)."""
    if not big:
        return None
    from pyspark import StorageLevel

    return StorageLevel.DISK_ONLY


class _scoped_shuffle_partitions:
    """Set spark.sql.shuffle.partitions for the duration of a query's
    eager per-round builds; restore the session value on exit (the
    run_to_memory state_partitions discipline, scoped to batch)."""

    def __init__(self, spark: SparkSession, n: int):
        self.spark, self.n = spark, n

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


_LPA_ITERS = 4


def _lpa_oracle_sql() -> str:
    """Synchronous label propagation unrolled (the PageRank CTE
    discipline): each round every node adopts its neighbors' most
    frequent label, ties broken by the SMALLER label — a total order,
    so the fixed-round state is engine-independent. The undirected
    edge list materializes both directions once."""
    head = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ),
    l0 AS MATERIALIZED (
      SELECT node, node AS lbl FROM (SELECT a AS node FROM e0
                                     UNION SELECT b FROM e0)
    )"""
    its = []
    for k in range(1, _LPA_ITERS + 1):
        its.append(f""",
    l{k} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT e.dst AS node, l.lbl,
               ROW_NUMBER() OVER (PARTITION BY e.dst
                                  ORDER BY COUNT(*) DESC, l.lbl) AS rn
        FROM e JOIN l{k - 1} l ON e.src = l.node
        GROUP BY e.dst, l.lbl)
      WHERE rn = 1
    )""")
    tail = f"""
    SELECT lbl AS community, n_members, n_cust, n_supp, rnk
    FROM (
      SELECT lbl, COUNT(*) AS n_members,
             CAST(COUNT(*) FILTER (WHERE node % 2 = 0) AS BIGINT) AS n_cust,
             CAST(COUNT(*) FILTER (WHERE node % 2 = 1) AS BIGINT) AS n_supp,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lbl) AS rnk
      FROM l{_LPA_ITERS}
      GROUP BY lbl)
    WHERE rnk <= 100
    """
    return head + "".join(its) + tail


@register(
    "q_label_propagation",
    oracle=_lpa_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-PROPAGATION COMMUNITY DETECTION on the undirected purchase
    graph: {_LPA_ITERS} synchronous rounds where every node adopts its
    neighborhood's most frequent label, ties to the smaller label —
    the classic near-linear community algorithm (Raghavan 2007),
    deterministic here because the (count DESC, label ASC) argmax is a
    total order and the round count is fixed (synchronous LPA on a
    bipartite graph can oscillate; a fixed horizon makes the state
    well-defined for the bit-exact oracle either way). Output: the
    100 largest communities with member counts split by node side.

    Scale shape: per round ONE shuffle — labels join edges on src,
    hash-aggregate (dst, label) counts, per-node argmax via
    max(struct(count, -label)) (no sort, no window over the full node
    set) — the Pregel shape PageRank uses, with localCheckpoint
    truncating per-round lineage; the edge table is materialized once
    and its partitioning is reusable every round at cluster scale.

    Unlike BFS (round 15), LPA CANNOT restrict the per-round join to
    changed-label nodes: a node's next label is the majority over its
    WHOLE neighborhood, so unchanged neighbors still vote — dropping
    them changes results. The sound delta form (maintain (dst, lbl)
    counts, apply ±1 for changed srcs) still re-shuffles the
    O(|E|)-sized count table per round for the merge + argmax, so it
    moves the same order of bytes; evaluated and left alone."""
    from pyspark.sql import Window

    n_parts = _graph_shuffle_partitions(spark, sf_dir)
    big = n_parts > int(spark.conf.get("spark.sql.shuffle.partitions"))
    with _scoped_shuffle_partitions(spark, n_parts):
        o = table(spark, sf_dir, "orders")
        li = table(spark, sf_dir, "lineitem")
        e0 = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("a"),
                (F.col("l_suppkey") * 2 + 1).alias("b"),
            )
            .distinct()
        )
        e = (
            e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .localCheckpoint(eager=True, storageLevel=_graph_ckpt_level(big))
        )
        # node set from the CHECKPOINTED bidirectional edges (src
        # covers both sides) — deriving it from e0 re-ran the whole
        # join+distinct edge build a second time (round 14)
        lbl = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        for _ in range(_LPA_ITERS):
            lbl = (
                e.join(lbl.withColumnRenamed("node", "src"), "src")
                .groupBy("dst", "lbl")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .groupBy("dst")
                .agg(F.max(F.struct(F.col("cnt"), (-F.col("lbl")).alias("neg"))).alias("m"))
                .select(F.col("dst").alias("node"), (-F.col("m.neg")).alias("lbl"))
                .localCheckpoint(eager=True)
            )
    comm = lbl.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cust"),
        F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_supp"),
    )
    top = comm.orderBy(F.col("n_members").desc(), "lbl").limit(100)
    w = Window.orderBy(F.col("n_members").desc(), F.col("lbl"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.col("lbl").alias("community"), "n_members", "n_cust", "n_supp", "rnk"
    )


_BFS_ITERS = 4
_BFS_SEED = "node % 2000 = 0"  # customers with c_custkey % 1000 = 0
_BFS_INF = 1 << 30  # unreached sentinel: pure integer MIN algebra


def _bfs_oracle_sql() -> str:
    """Hop-distance BFS unrolled: d0 seeds the frontier at 0 with an
    integer sentinel for unreached (NULL-free MIN algebra — engines
    disagree on NULL handling in least/MIN, integers never do); each
    round takes min(own, min-over-neighbors + 1)."""
    head = f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ),
    d0 AS MATERIALIZED (
      SELECT node, CASE WHEN {_BFS_SEED} THEN 0 ELSE {_BFS_INF} END AS dist
      FROM (SELECT a AS node FROM e0 UNION SELECT b FROM e0)
    )"""
    its = []
    for k in range(1, _BFS_ITERS + 1):
        its.append(f""",
    n{k} AS MATERIALIZED (
      SELECT e.dst AS node, MIN(d.dist) + 1 AS nd
      FROM e JOIN d{k - 1} d ON e.src = d.node
      GROUP BY e.dst
    ),
    d{k} AS MATERIALIZED (
      SELECT d.node,
             CAST(CASE WHEN n.nd IS NULL OR d.dist <= n.nd
                       THEN d.dist ELSE n.nd END AS BIGINT) AS dist
      FROM d{k - 1} d LEFT JOIN n{k} n ON d.node = n.node
    )""")
    tail = f"""
    SELECT dist AS hop, COUNT(*) AS n_nodes,
           CAST(COUNT(*) FILTER (WHERE node % 2 = 0) AS BIGINT) AS n_cust,
           CAST(COUNT(*) FILTER (WHERE node % 2 = 1) AS BIGINT) AS n_supp,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM d{_BFS_ITERS}
    WHERE dist < {_BFS_INF}
    GROUP BY dist
    """
    return head + "".join(its) + tail


@register(
    "q_bfs_levels",
    oracle=_bfs_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP-DISTANCE BFS from a sparse seed set on the undirected
    purchase graph: {_BFS_ITERS} synchronous min-propagation rounds —
    dist'(v) = min(dist(v), 1 + min over in-neighbors) — the
    degrees-of-separation / blast-radius primitive (how far does an
    entity's influence reach in k hops), rolled up to per-level node
    counts split by side. Unreached nodes carry an integer sentinel
    rather than NULL so every step is pure integer MIN algebra (NULL
    semantics in least()/MIN aggregation differ across engines;
    integers never do) and the unrolled-CTE oracle matches exactly.

    Scale shape (round 15, r14 verdict #8): per round the edge join
    carries ONLY THE FRONTIER — the nodes settled in the previous
    round (dist == round index; BFS layers are exact: min-propagation
    never lowers a settled distance, so a non-frontier neighbor's
    contribution dist(u)+1 was already folded into dist(v) the round
    u settled, and dropping it cannot change the min). Summed over
    all rounds the join touches each node's incident edges ONCE —
    O(|E|) total edge-join volume instead of rounds x |E| (the r14
    form joined the full distance vector every round). The O(V) side
    is the per-round keyed left join back into the distance vector,
    lineage truncated per round; the edge table is checkpointed
    once. The unrolled-CTE oracle keeps the full-vector form — the
    hash gate is the equivalence proof."""
    n_parts = _graph_shuffle_partitions(spark, sf_dir)
    big = n_parts > int(spark.conf.get("spark.sql.shuffle.partitions"))
    with _scoped_shuffle_partitions(spark, n_parts):
        o = table(spark, sf_dir, "orders")
        li = table(spark, sf_dir, "lineitem")
        e0 = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("a"),
                (F.col("l_suppkey") * 2 + 1).alias("b"),
            )
            .distinct()
        )
        e = (
            e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .localCheckpoint(eager=True, storageLevel=_graph_ckpt_level(big))
        )
        # node set from the CHECKPOINTED bidirectional edges (src
        # covers both sides) — deriving it from e0 re-ran the whole
        # join+distinct edge build a second time (round 14)
        d = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .select(
                "node",
                F.when(F.expr(_BFS_SEED), F.lit(0))
                .otherwise(F.lit(_BFS_INF))
                .cast("long")
                .alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        for it in range(_BFS_ITERS):
            # frontier = the layer settled last round (it=0: the seeds)
            frontier = d.filter(F.col("dist") == it)
            nbr = (
                e.join(frontier.withColumnRenamed("node", "src"), "src")
                .groupBy("dst")
                .agg((F.min("dist") + 1).alias("nd"))
            )
            d = (
                d.join(nbr, d.node == nbr.dst, "left")
                .select(
                    "node",
                    F.when(
                        F.col("nd").isNull() | (F.col("dist") <= F.col("nd")),
                        F.col("dist"),
                    )
                    .otherwise(F.col("nd"))
                    .cast("long")
                    .alias("dist"),
                )
                .localCheckpoint(eager=True)
            )
    return (
        d.filter(F.col("dist") < _BFS_INF)
        .groupBy(F.col("dist").alias("hop"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cust"),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_supp"),
            F.min("node").cast("bigint").alias("min_node"),
        )
    )


def _ppr_weighted_oracle_sql() -> str:
    """The weighted power method with seed-restricted teleport/initial
    mass/dangling redistribution — the remaining cell of the
    (global|personalized) x (uniform|weighted) matrix, restated with
    the same integer discipline as both parents."""
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (
      SELECT node, ({_PPR_SEED}) AS is_seed FROM (
        SELECT src AS node FROM e UNION SELECT dst FROM e)
    ),
    deg AS MATERIALIZED (
      SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM e GROUP BY src
    ),
    nn AS MATERIALIZED (
      SELECT COUNT(*) FILTER (WHERE is_seed) AS ns FROM nodes
    ),
    r0 AS MATERIALIZED (
      SELECT node, is_seed,
             CASE WHEN is_seed THEN (SELECT {_PR_SCALE} // ns FROM nn)
                  ELSE 0 END AS rank
      FROM nodes
    )"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(f""",
    d{k} AS MATERIALIZED (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
      FROM r{k - 1} r LEFT JOIN deg ON r.node = deg.src
      WHERE deg.src IS NULL
    ),
    c{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             CAST(SUM((r.rank * e.w) // d.sw) AS BIGINT) AS contrib
      FROM e JOIN deg d ON e.src = d.src JOIN r{k - 1} r ON e.src = r.node
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node, n.is_seed,
             CAST(CASE WHEN n.is_seed THEN
               (SELECT (CAST({_PR_SCALE} AS BIGINT) * {100 - _PR_DAMP} // 100)
                       // nn.ns FROM nn)
               + (SELECT (dang * {_PR_DAMP} // 100) // (SELECT nn.ns FROM nn)
                  FROM d{k})
             ELSE 0 END
             + COALESCE(c.contrib, 0) * {_PR_DAMP} // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS node_type,
           node // 2 AS key, rank AS pr_nano, rnk
    FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
      FROM r{_PR_ITERS})
    WHERE rnk <= 100
    """
    return head + "".join(its) + tail


@register(
    "q_pagerank_ppr_weighted",
    oracle=_ppr_weighted_oracle_sql(),
    tags=("graph", "iterative", "scale"),
)
def q_pagerank_ppr_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PERSONALIZED PAGERANK — the fourth cell of the
    (global|personalized) x (uniform|weighted) matrix and the variant a
    production recommender actually serves: random walk with restart
    to a sparse customer seed set, each step splitting mass
    proportionally to purchase intensity ((rank * w) DIV sum_w), so
    suppliers rank by volume-weighted proximity to the seeds rather
    than mere connectivity. Both parameters ride the one shared
    operator (operators/graph.pagerank) — the composition is a
    parameter product, not new machinery — and the integer discipline
    survives it verbatim: the unrolled-CTE oracle (weighted
    contributions + seed-restricted teleport/dangling) matches
    bit-for-bit. The bipartite structural pin carries over: non-seed
    customers hold rank exactly 0."""
    from pyspark.sql import Window

    from docker_based_real_time_etl_project_spark.operators.graph import (
        pagerank,
    )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # one checkpointed edge build feeds nodes AND the operator (r14)
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.expr(_PPR_SEED))
    r = pagerank(
        nodes, e, iters=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE,
        seeds=seeds, weight_col="w", edges_materialized=True,
    )
    top = r.orderBy(F.col("rank").desc(), "node").limit(100)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.when(F.col("node") % 2 == 0, F.lit("cust"))
        .otherwise(F.lit("supp"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("key"),
        F.col("rank").alias("pr_nano"),
        "rnk",
    )
