"""Mergeable frequency sketches (SURVEY.md §2.9 extension surface):
count-min sketch build/estimate/merge over token (or any key) streams —
the approximate-heavy-hitter primitive a 100 TB vocabulary pass needs when
the exact groupBy's key space (billions of distinct tokens) no longer fits
a shuffle budget.

100 TB posture
--------------
* The sketch is a fixed (depth x width) counter grid, independent of both
  corpus size and cardinality; ``cms_build`` is ONE map-side-combined
  aggregation — each partition combines its (row, pos) increments locally,
  so the shuffle carries at most depth*width rows per partition, usually
  far fewer.
* Sketches MERGE by counter addition (``cms_merge`` is a groupBy-sum):
  per-day / per-shard sketches roll up without touching raw data — the
  same mergeability contract as the HLL path in model.py.
* Estimates are one-sided (never undercount; overcount bounded by
  eN/width with probability 1 - (1/2)^depth, N = total increments).
* Hashing is the engine-portable md5 scheme (packing._md5_bucket family),
  so a DuckDB twin rebuilds the identical grid — the correctness gate
  hashes the ESTIMATES, pinning the full build+probe arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators.packing import _md5_bucket


def _cms_pos(key: Column, row: int, width: int) -> Column:
    """Counter position of ``key`` in sketch row ``row``: the shared
    engine-portable md5 bucket (packing._md5_bucket) of 'row:key'
    (DuckDB twin: ('0x'||substr(md5(r||':'||x),1,15))::BIGINT % width)."""
    return _md5_bucket(F.concat(F.lit(str(row)), F.lit(":"),
                                key.cast("string")), width)


def cms_build(df: DataFrame, key_col: str | Column, width: int = 2048,
              depth: int = 4) -> DataFrame:
    """Build a count-min sketch over one key per input row ->
    (row, pos, cnt), only non-zero counters materialized (the grid is
    implicitly zero elsewhere). Count-weighted build: pass a pre-exploded
    frame (one row per occurrence) — the natural shape after
    ``explode(tokens(...))``."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cms_pos(key, r, width).alias("pos"))
        for r in range(depth)])).alias("c")
    return (df.select(cells)
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.pos").alias("pos"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (width, depth): counter-wise
    sum. Distributive — daily/shard sketches roll up to any window."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 key_col: str = "key", width: int = 2048,
                 depth: int = 4) -> DataFrame:
    """Estimated count per probe key -> (key_col, est): min over the
    depth rows of the addressed counters; absent counters are zero.

    The probe side is the small side (a heavy-hitter candidate list);
    the sketch side is at most depth*width rows — both broadcastable, so
    estimation never shuffles anything big."""
    key = F.col(key_col)
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cms_pos(key, r, width).alias("pos"))
        for r in range(depth)])).alias("c")
    addressed = probes.select(key, cells).select(
        key_col, F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = addressed.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est")))
