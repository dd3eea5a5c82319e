"""Interval-overlap join: the no-equi-key theta join done as a
bucketized equi-join (the plan behind q_join_interval_overlap,
queries/graph_q.py — factored out with ADAPTIVE bucket width).

Correctness is WIDTH-INDEPENDENT: each interval explodes into every
coarse time bucket it covers, candidates equi-join on the bucket, the
exact overlap predicate runs as a residual, and a pair is emitted only
in the bucket containing ``max(start_a, start_b)`` — two overlapping
intervals both cover their overlap's start bucket, so the pair appears
exactly once no matter the width. Width is purely a COST knob:

- too narrow → long intervals explode into many buckets (row blowup on
  the build side);
- too wide → unrelated intervals co-occupy buckets (candidate blowup
  on the probe side, degrading toward per-bucket cartesian).

``adaptive_bucket_s`` picks the observed P99 interval length (one
cheap agg over the two span columns — column-pruned, a vanishing scan
at 100 TB): ~99% of intervals then cover <= 2 buckets, while the rare
much-longer interval (the skewed-length regime: one year-long booking
among minute-long ones) pays length/width explode rows instead of
forcing a year-wide bucket on everyone — the split-and-dedup fallback
is inherent in the sequence+explode + start-bucket guard, no special
case. approx_percentile's result can vary slightly with partitioning;
that only moves the cost knob, never the result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_iob_bucket"


def adaptive_bucket_s(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    *,
    pctl: float = 0.99,
    min_bucket_s: int = 3600,
) -> int:
    """Bucket width = P99 interval length across BOTH inputs (+1 so a
    P99-length interval still spans <= 2 buckets), floored at
    ``min_bucket_s`` so near-point intervals don't create a bucket per
    second of timeline."""
    ls, le = left_span
    rs, re = right_span
    lens = left.select((F.col(le) - F.col(ls)).alias("_len")).unionByName(
        right.select((F.col(re) - F.col(rs)).alias("_len"))
    )
    p = lens.agg(F.percentile_approx("_len", pctl).alias("p")).head()["p"]
    return max(int(p or 0) + 1, min_bucket_s)


def _bucketize(df: DataFrame, s: str, e: str, bucket_s: int) -> DataFrame:
    return df.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.expr(f"{s} DIV {bucket_s}"), F.expr(f"{e} DIV {bucket_s}")
            )
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    *,
    bucket_s: int | None = None,
    pctl: float = 0.99,
    min_bucket_s: int = 3600,
) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap
    (``r.s <= l.e AND l.s <= r.e``), as a bucket equi-join with the
    exact predicate residual. Span columns must be longs (epoch
    seconds) with distinct names across the two sides; every column of
    both inputs survives. ``bucket_s=None`` derives the width
    adaptively (see :func:`adaptive_bucket_s`)."""
    ls, le = left_span
    rs, re = right_span
    if bucket_s is None:
        bucket_s = adaptive_bucket_s(
            left, right, left_span, right_span,
            pctl=pctl, min_bucket_s=min_bucket_s,
        )
    lb = _bucketize(left, ls, le, bucket_s)
    rb = _bucketize(right, rs, re, bucket_s)
    return (
        lb.join(rb, _BUCKET)
        .filter(
            (F.col(rs) <= F.col(le))
            & (F.col(ls) <= F.col(re))
            # exactly-once guard: emit only in the overlap-start bucket
            & (
                F.expr(f"greatest({ls}, {rs}) DIV {bucket_s}")
                == F.col(_BUCKET)
            )
        )
        .drop(_BUCKET)
    )
