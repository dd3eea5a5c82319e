"""Z-order (Morton-curve) clustered layout for multi-dimensional
data skipping.

The storage-side complement to single-key layouts already in the
engine (date partitioning, bucketed joins, IVF cell dirs): a table
queried by a conjunctive range box on TWO keys cannot be pruned by
partitioning on either key alone — partitioning on key A leaves the
key-B predicate scanning every A-partition. Interleaving the bits of
both keys into one Morton value makes cells that are rectangles in
(A, B) space contiguous bucket ids, so a 2-D box predicate maps to a
small, exactly-enumerable set of bucket directories and Catalyst's
partition pruning skips the rest. This is the same layout trick
Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order z-curves apply
at 100 TB; here it is a library operator over plain parquet
directories, so the pruning is visible in the scan's
``PartitionFilters`` and testable.

Correctness contract: the bucket set enumerated for a query box is a
SUPERSET of the buckets holding matching rows (cells are axis-aligned
rectangles and the per-dimension cell index is monotonic in the
value, so the covering cells form the cross product of two index
ranges), and the exact per-row predicate is always re-applied after
pruning — the layout can only change bytes read, never results.
``q_zorder_pruned_scan`` hash-verifies that against the unclustered
table; ``tests/test_scale_ops.py`` proves the scan reads only covered
buckets.

Everything is integer expression arithmetic (shift/and/multiply) on
the JVM side — no UDF, no collect beyond the two (min, max) scalar
pairs that define the grid, mirroring the IVF layout's
centroid-matrix-only driver traffic (similarity.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ZGrid:
    """The 2-D grid a z-layout was built on: per-dimension [min, max]
    and the bit width (2**bits cells per dimension)."""

    col1: str
    col2: str
    min1: int
    max1: int
    min2: int
    max2: int
    bits: int

    def __post_init__(self) -> None:
        # cell() computes (v - lo) * 2^bits in signed-64 executor math;
        # refuse grids where that product could overflow (the driver's
        # Python bigints would silently diverge from the executors)
        for lo, hi in ((self.min1, self.max1), (self.min2, self.max2)):
            if hi < lo:
                raise ValueError(f"empty key domain [{lo}, {hi}]")
            if (hi - lo) > (1 << (62 - self.bits)):
                raise ValueError(
                    f"key domain [{lo}, {hi}] too wide for bits={self.bits}: "
                    "(max - min) << bits must stay inside signed 64-bit"
                )

    @property
    def n_buckets(self) -> int:
        return 1 << (2 * self.bits)

    def cell(self, dim: int, value: int) -> int:
        """Per-dimension cell index of ``value`` (clamped; monotonic)."""
        lo, hi = (self.min1, self.max1) if dim == 1 else (self.min2, self.max2)
        v = min(max(value, lo), hi)
        return ((v - lo) * (1 << self.bits)) // (hi - lo + 1)

    def interleave(self, c1: int, c2: int) -> int:
        z = 0
        for i in range(self.bits):
            z |= ((c1 >> i) & 1) << (2 * i)
            z |= ((c2 >> i) & 1) << (2 * i + 1)
        return z

    def box_buckets(self, lo1: int, hi1: int, lo2: int, hi2: int) -> list[int]:
        """Every z-bucket whose cell rectangle intersects the query box
        [lo1, hi1] x [lo2, hi2]. Sufficient (a superset — no matching
        row lives outside it) because cell() is monotonic per
        dimension; minimal exactly when every cell index in the covered
        ranges is occupied by some value, which can fail when 2**bits
        exceeds a dimension's value range (cell() then skips indices
        and the range enumeration lists empty cells — harmless for
        pruning, just not minimal)."""
        c1_lo, c1_hi = self.cell(1, lo1), self.cell(1, hi1)
        c2_lo, c2_hi = self.cell(2, lo2), self.cell(2, hi2)
        return sorted(
            self.interleave(c1, c2)
            for c1 in range(c1_lo, c1_hi + 1)
            for c2 in range(c2_lo, c2_hi + 1)
        )


def _cell_expr(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Spark twin of ZGrid.cell — EXACT floor division, bit-identical to
    the driver's Python ``//`` by construction. Spark's ``/`` on longs
    goes through double, whose 53-bit mantissa could round the quotient
    across an integer boundary on a wide key domain; a row would then
    land in a bucket the driver never enumerates and be silently
    dropped by partition pruning. So: take the double-floor as a ±1
    candidate, then correct it with the exact long-arithmetic residual
    (num - q*den is always long-exact; ZGrid.__post_init__ guarantees
    num itself cannot overflow)."""
    clamped = F.greatest(F.least(col.cast("long"), F.lit(hi)), F.lit(lo))
    num = (clamped - F.lit(lo)) * F.lit(1 << bits)
    den = F.lit(hi - lo + 1)
    q = F.floor(num / den).cast("long")
    r = num - q * den
    return F.when(r < 0, q - 1).when(r >= den, q + 1).otherwise(q)


def zvalue_expr(grid: ZGrid) -> Column:
    """Morton value of (grid.col1, grid.col2) as a pure bit-twiddling
    expression tree: 2*bits shift/and/shift terms, whole-stage-codegen
    friendly, no Python in the row path.

    NULL in either cluster key yields a NULL z-value (the write path
    then files the row under the Hive null partition instead of
    clamping it into the max cell, where an IS NULL query would have
    to scan a data cell and a box scan would co-locate unrelated
    rows). ``zorder_box_scan``'s bucket IN-list and exact BETWEEN both
    evaluate NULL -> filtered out, so box queries skip the null
    partition entirely — by semantics, not by luck. Without the guard,
    F.least/F.greatest would silently skip the NULL and clamp to hi."""
    c1 = _cell_expr(F.col(grid.col1), grid.min1, grid.max1, grid.bits)
    c2 = _cell_expr(F.col(grid.col2), grid.min2, grid.max2, grid.bits)
    z = F.lit(0).cast("long")
    for i in range(grid.bits):
        z = z + F.shiftleft(F.shiftright(c1, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(c2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return F.when(
        F.col(grid.col1).isNull() | F.col(grid.col2).isNull(), F.lit(None).cast("long")
    ).otherwise(z)


def fit_grid(df: DataFrame, col1: str, col2: str, bits: int = 3) -> ZGrid:
    """One tiny agg defines the grid — four scalars to the driver, the
    same budget as the IVF centroid matrix."""
    row = df.agg(
        F.min(col1).cast("long"),
        F.max(col1).cast("long"),
        F.min(col2).cast("long"),
        F.max(col2).cast("long"),
    ).first()
    return ZGrid(col1, col2, int(row[0]), int(row[1]), int(row[2]), int(row[3]), bits)


def zorder_write(df: DataFrame, path: str, grid: ZGrid) -> None:
    """Materialize ``df`` clustered by z-bucket: one partition directory
    per occupied Morton cell (``zb=<z>``). At 100 TB this is a
    compaction/OPTIMIZE pass owned by the table writer (one shuffle on
    a uniform key — cells are equal-area so bucket sizes follow the
    data distribution, not a skewed head); readers get box pruning
    for free from then on."""
    df.withColumn("zb", zvalue_expr(grid)).repartition("zb").write.partitionBy(
        "zb"
    ).mode("overwrite").parquet(path)


def zorder_box_scan(
    spark_read_df: DataFrame, grid: ZGrid, lo1: int, hi1: int, lo2: int, hi2: int
) -> DataFrame:
    """Box query over a z-layout: bucket IN-list (partition pruning,
    computed driver-side from grid math — no data pass) AND the exact
    row predicate (correctness independent of the layout)."""
    buckets = grid.box_buckets(lo1, hi1, lo2, hi2)
    return spark_read_df.filter(
        F.col("zb").isin(buckets)
        & F.col(grid.col1).between(lo1, hi1)
        & F.col(grid.col2).between(lo2, hi2)
    )


# ---------------------------------------------------------------------------
# N-dimensional Morton grid (Delta's OPTIMIZE ZORDER BY takes N columns)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ZGridN:
    """N-dimensional Morton grid: per-dimension [lo, hi] and a shared
    bit width — 2**bits cells per dimension, (2**bits)**N buckets
    total. Same per-dimension cell arithmetic as :class:`ZGrid`
    (clamped, monotonic, exact floor division); dimension d's bit i
    interleaves to z-bit i*N + d. Choose ``bits`` so the bucket count
    stays a sane partition count — bits=2 with 3 dims is 64 buckets,
    the same budget as the 2-D default."""

    cols: tuple[str, ...]
    los: tuple[int, ...]
    his: tuple[int, ...]
    bits: int

    def __post_init__(self) -> None:
        assert len(self.cols) == len(self.los) == len(self.his) >= 2
        for lo, hi in zip(self.los, self.his):
            if hi < lo:
                raise ValueError(f"empty key domain [{lo}, {hi}]")
            if (hi - lo) > (1 << (62 - self.bits)):
                raise ValueError(
                    f"key domain [{lo}, {hi}] too wide for bits={self.bits}"
                )

    @property
    def ndim(self) -> int:
        return len(self.cols)

    @property
    def n_buckets(self) -> int:
        return 1 << (self.ndim * self.bits)

    def cell(self, dim: int, value: int) -> int:
        """Cell index of ``value`` along dimension ``dim`` (0-based)."""
        lo, hi = self.los[dim], self.his[dim]
        v = min(max(value, lo), hi)
        return ((v - lo) * (1 << self.bits)) // (hi - lo + 1)

    def interleave(self, cells: Sequence[int]) -> int:
        z = 0
        for i in range(self.bits):
            for d, c in enumerate(cells):
                z |= ((c >> i) & 1) << (i * self.ndim + d)
        return z

    def box_buckets(self, bounds: Sequence[tuple]) -> list[int]:
        """Every bucket whose cell hyper-rectangle intersects the query
        box (one (lo, hi) pair per dimension) — the cross product of
        per-dimension cell ranges, a superset by per-dim monotonicity.
        Enumeration cost is the covered-cell count, bounded by
        n_buckets."""
        assert len(bounds) == self.ndim
        ranges = [
            range(self.cell(d, lo), self.cell(d, hi) + 1)
            for d, (lo, hi) in enumerate(bounds)
        ]
        out = []
        from itertools import product

        for cells in product(*ranges):
            out.append(self.interleave(cells))
        return sorted(out)


def fit_grid_n(df: DataFrame, cols: Sequence[str], bits: int = 2) -> ZGridN:
    """One tiny agg defines the grid — 2N scalars to the driver."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("long"), F.max(c).cast("long")]
    row = df.agg(*aggs).first()
    los = tuple(int(row[2 * i]) for i in range(len(cols)))
    his = tuple(int(row[2 * i + 1]) for i in range(len(cols)))
    return ZGridN(tuple(cols), los, his, bits)


def zvalue_expr_n(grid: ZGridN) -> Column:
    """Morton value over N columns as a pure bit-twiddling expression
    tree (the N-dim twin of :func:`zvalue_expr`, same exact-floor cell
    arithmetic and NULL contract: any NULL key -> NULL z-value)."""
    cells = [
        _cell_expr(F.col(c), grid.los[d], grid.his[d], grid.bits)
        for d, c in enumerate(grid.cols)
    ]
    z = F.lit(0).cast("long")
    for i in range(grid.bits):
        for d, cell in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * grid.ndim + d
            )
    null_any = F.lit(False)
    for c in grid.cols:
        null_any = null_any | F.col(c).isNull()
    return F.when(null_any, F.lit(None).cast("long")).otherwise(z)


def zorder_write_n(df: DataFrame, path: str, grid: ZGridN) -> None:
    """Materialize ``df`` clustered by N-dim z-bucket (``zb=<z>`` dirs),
    same contract as :func:`zorder_write`."""
    df.withColumn("zb", zvalue_expr_n(grid)).repartition("zb").write.partitionBy(
        "zb"
    ).mode("overwrite").parquet(path)


def zorder_box_scan_n(
    spark_read_df: DataFrame, grid: ZGridN, bounds: Sequence[tuple]
) -> DataFrame:
    """N-dim box query over a z-layout: bucket IN-list (partition
    pruning from grid math) AND the exact per-dimension predicates."""
    buckets = grid.box_buckets(bounds)
    pred = F.col("zb").isin(buckets)
    for d, (lo, hi) in enumerate(bounds):
        pred = pred & F.col(grid.cols[d]).between(lo, hi)
    return spark_read_df.filter(pred)
