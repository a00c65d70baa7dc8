"""Z-order (Morton) multi-dimensional clustering for data layout
(SURVEY.md §2.1/§2.9 extension — the write-side twin of partition
pruning: interleaving the bits of several scaled key columns and
range-partitioning the write on that value gives every output file a
TIGHT min/max envelope on ALL the keys at once, so columnar data
skipping prunes multi-predicate scans the way hive partitioning prunes
one column. The same layout trick Delta/Iceberg OPTIMIZE ZORDER applies;
reference has no equivalent — driver-mandated scale surface).

Everything is integer Catalyst expressions (shift/mask/or — replayable
in any engine):

    scaled_c = clamp(floor((x_c - lo_c) / (hi_c - lo_c) * 2^bits),
                     0, 2^bits - 1)
    z        = OR over c, j of  bit_j(scaled_c) << (j * ncols + c)

(half-open cells: the multiplier is 2^bits, the top cell absorbs
x = hi via the clamp — exactly what ``_scaled`` computes and the x83
oracle replays)

100 TB posture:
- computing z is a zero-shuffle projection;
- ``cluster_by_zorder`` adds exactly ONE range exchange (sampled range
  partitioning on z) + in-partition sort — the standard layout-rewrite
  cost, after which multi-column scans skip at file/row-group level;
- bounds come from one min/max aggregate (one row to the driver) or are
  caller-pinned for replayable layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_bounds(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """[(lo, hi), ...] per column — ONE aggregate job, 2*ncols scalars."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    return [(float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"]))
            for c in cols]


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear map of [lo, hi] onto integer [0, 2^bits - 1], clamped (so
    out-of-bounds values fold to the edge cells instead of corrupting
    the interleave)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    s = F.floor((col.cast("double") - F.lit(lo))
                / F.lit(hi - lo) * F.lit(float(top + 1))).cast("long")
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(top).cast("long"), s))


def zorder_value(cols: list[Column | str],
                 bounds: list[tuple[float, float]],
                 bits: int = 8) -> Column:
    """The Morton interleave of the scaled columns (bigint). ``bits`` per
    column; ncols * bits must fit in 63. Column order matters (it fixes
    which dimension owns which bit lanes) — pin it for replayability."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(cols) != len(bounds):
        raise ValueError(f"{len(cols)} cols but {len(bounds)} bounds")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds 63")
    ncols = len(cols)
    z = F.lit(0).cast("long")
    for ci, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        col = F.col(c) if isinstance(c, str) else c
        s = _scaled(col, lo, hi, bits)
        for j in range(bits):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, j * ncols + ci))
    return z


def cluster_by_zorder(df: DataFrame, cols: list[str], bits: int = 8,
                      num_partitions: int | None = None,
                      bounds: list[tuple[float, float]] | None = None,
                      z_col: str = "__z") -> DataFrame:
    """Attach the z-value and range-partition + sort the frame on it —
    ready for a partition-preserving write where every file's min/max
    stats are tight on every clustered column. One exchange, one
    in-partition sort."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    out = df.withColumn(z_col, zorder_value(cols, bounds, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(parts, F.col(z_col))
            .sortWithinPartitions(z_col))


def zorder_compact(table, cols: list[str], max_rows_per_file: int,
                   bits: int = 8, partitions: list | None = None,
                   bounds: list[tuple[float, float]] | None = None,
                   max_retries: int = 5) -> int:
    """OPTIMIZE ZORDER for a transactional table
    (sources/txn.TxnTable): rewrite the selected partitions with rows
    Morton-sorted on ``cols`` and split into
    ``max_rows_per_file``-bounded files, under compact()'s snapshot
    semantics. Each rewritten file then covers a contiguous z-range,
    so its manifest-carried footer min/max is TIGHT on every clustered
    column at once and ``table.read(between=...)`` skips files WITHIN
    partitions — multi-column data skipping on layouts (bucket tables)
    where partition pruning can't see the predicate.

    Cost shape: one bounds aggregate (2*ncols scalars to the driver),
    then the selected partitions' rows through one hash exchange +
    in-partition sort (the z expression is a pure integer projection).
    Orthogonal to the partition scheme; commits race-safe like any
    other compact. Returns the new version."""
    if bounds is None:
        bounds = column_bounds(table.read(partitions=partitions), cols)
    zexpr = zorder_value(cols, bounds, bits)
    return table.compact(partitions=partitions, max_retries=max_retries,
                         order_by=[zexpr],
                         max_rows_per_file=max_rows_per_file)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 8, num_files: int | None = None,
                   bounds: list[tuple[float, float]] | None = None,
                   fmt: str = "parquet", mode: str = "overwrite",
                   **options) -> None:
    """The layout-rewrite sink: z-cluster then land ``num_files`` files
    whose per-file column stats are tight on all ``cols`` (the z column
    itself is dropped — it is layout plumbing, not payload)."""
    clustered = cluster_by_zorder(df, cols, bits, num_files, bounds)
    (clustered.drop("__z")
     .write.mode(mode).format(fmt).options(**options).save(path))
