"""Plan-shape invariants (SURVEY.md section 4 / the 100 TB design):
pushdown reaches the scan, projections prune columns, dims broadcast,
top-k avoids full sorts. A regression here is a performance bug even
when results stay correct.
"""

from __future__ import annotations

from docker_based_real_time_etl_project_spark.plans import (
    count_exchanges,
    formatted_plan,
    join_strategies,
    scan_infos,
)
from docker_based_real_time_etl_project_spark.queries import REGISTRY


def _q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_projection_prunes_scan(spark, sf_dir):
    """q_project_cast touches 4 of lineitem's 11 columns -- the scan
    must read exactly those."""
    scans = scan_infos(_q("q_project_cast", spark, sf_dir))
    assert len(scans) == 1
    assert sorted(scans[0].read_columns) == [
        "l_extendedprice", "l_linenumber", "l_orderkey", "l_quantity",
    ]


def test_filters_push_to_scan(spark, sf_dir):
    scans = scan_infos(_q("q_pricing_summary", spark, sf_dir))
    pushed = " ".join(scans[0].pushed_filters)
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed
    scans = scan_infos(_q("q_filter_pred", spark, sf_dir))
    pushed = " ".join(scans[0].pushed_filters)
    for frag in ("GreaterThanOrEqual(l_quantity", "GreaterThan(l_discount", "l_shipdate"):
        assert frag in pushed, pushed


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    js = join_strategies(_q("q_join_star", spark, sf_dir))
    assert js.get("BroadcastHashJoin", 0) >= 3  # customer/nation/region at minimum
    assert js.get("CartesianProduct", 0) == 0


def test_pricing_summary_single_shuffle(spark, sf_dir):
    """Partial aggregation map-side: exactly one hash exchange (the
    final agg), nothing else."""
    assert count_exchanges(_q("q_pricing_summary", spark, sf_dir)) == 1


def test_topk_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), not a global sort."""
    plan = formatted_plan(_q("q_topk_orders", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert count_exchanges(_q("q_topk_orders", spark, sf_dir)) == 0


def test_minhash_shuffles_are_bounded(spark, sf_dir):
    """The near-dup pipeline may shuffle for signatures, banding, dedup
    and the verify joins -- but the count must stay small and fixed (no
    accidental cartesian / resort)."""
    df = _q("q_dedup_minhash", spark, sf_dir)
    assert join_strategies(df).get("CartesianProduct", 0) == 0
    assert count_exchanges(df) <= 8
