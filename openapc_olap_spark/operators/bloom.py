"""Bloom-filter runtime prefilter for semi-joins (SURVEY.md §2.9 extension
surface): filter a huge fact table by membership in a key set WITHOUT
shuffling the fact side first — the explicit, engine-portable form of the
runtime row-level filters Spark's optimizer injects
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), exposed as an
operator so pipelines can apply it across stage/job boundaries where the
optimizer cannot see the join.

100 TB posture
--------------
* The filter build is ONE map-side-combined aggregation over the (small)
  key side: per key, ``num_hashes`` bit positions; per 64-bit word, a
  ``bit_or`` partial-aggregated to at most ``num_bits/64`` rows before the
  shuffle.  The collected sketch is fixed-size (``num_bits/8`` bytes —
  driver-side by design, like a trained IVF codebook), independent of
  either table's row count.
* The probe is a pure codegen'd expression on the fact scan — no join, no
  shuffle, no broadcast-table build; false-positive survivors are removed
  by the exact left-semi join, whose SHUFFLE now moves only
  ``fpr + selectivity`` of the fact instead of all of it.  With the default
  sizing (num_bits=2**20, num_hashes=5) the FPR at 50k keys is ~0.9%.
* Result is exactly the semi-join result: the bloom stage only prunes,
  never decides membership.

Sizing: fpr ~= (1 - exp(-k*n/m))**k for n keys, m bits, k hashes; pick
m >= ~14*n for ~0.1%.  Oversized is cheap (the sketch is bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(keys_df: DataFrame, key_col: str, num_bits: int = 1 << 20,
                num_hashes: int = 5) -> list[int]:
    """Build the filter over the key side -> ``num_bits/64`` int64 words.

    Distributed: positions and word-partials are computed executor-side
    (xxhash64 seeded per hash function, bit_or combine); only the finished
    fixed-size sketch reaches the driver."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)])).alias("pos")
    words = (keys_df.select(pos)
             .groupBy((F.col("pos") / 64).cast("long").alias("w"))
             .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 AS int)))")
                  .alias("bits"))
             .collect())
    sketch = [0] * (num_bits // 64)
    for r in words:
        sketch[r["w"]] = r["bits"]
    return sketch


def bloom_might_contain(key: Column, sketch: list[int],
                        num_hashes: int = 5) -> Column:
    """Membership-test expression against a built sketch: true iff all
    ``num_hashes`` bit positions are set. Pure whole-stage-codegen
    arithmetic over an array literal — runs inside the fact scan."""
    num_bits = len(sketch) * 64
    # force array<bigint>: a sketch whose set words all fit in 32 bits would
    # otherwise infer array<int>, capping getbit positions at 32
    arr = F.lit(sketch).cast("array<bigint>")
    checks = []
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        checks.append(F.getbit(word, (pos % 64).cast("int")) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(fact: DataFrame, keys_df: DataFrame, fact_key: str,
                    dim_key: str | None = None, num_bits: int = 1 << 20,
                    num_hashes: int = 5, exact: bool = True) -> DataFrame:
    """Semi-join ``fact`` to ``keys_df`` with a bloom prefilter: same rows
    as ``fact LEFT SEMI JOIN keys``, but the fact side is pruned by the
    sketch before any join machinery runs.

    ``exact=False`` skips the verifying semi-join and returns the bloom
    survivors (superset semantics with known FPR) — the mode for pure
    pre-shuffle volume reduction when a later stage re-checks membership
    anyway.

    The verify join is left to Catalyst/AQE to strategize: a small key set
    becomes a broadcast join; a 100M-key dimension (the case that motivates
    the bloom in the first place — too big to broadcast) becomes a shuffled
    semi-join whose fact-side exchange now carries only the bloom
    survivors."""
    dim_key = dim_key or fact_key
    sketch = bloom_build(keys_df, dim_key, num_bits, num_hashes)
    pre = fact.filter(bloom_might_contain(F.col(fact_key), sketch,
                                          num_hashes))
    if not exact:
        return pre
    dim = keys_df.select(F.col(dim_key).alias(fact_key))
    return pre.join(dim, fact_key, "left_semi")
