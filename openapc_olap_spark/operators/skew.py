"""Skew mitigation utilities (SURVEY.md §7 risk register: "skewed keys ->
salting or AQE skew-join").

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in our session defaults)
handles moderate skew by splitting oversized shuffle partitions at runtime.
These helpers cover the cases AQE can't:

- ``salted_aggregate``: a single groupBy key so hot that even a split
  partition concentrates one key's rows on one task. Two-stage aggregation
  (partial agg on (key, salt), final agg on key) spreads the hot key over
  ``salt_buckets`` tasks. Only works for algebraic aggregates — the helper
  takes (partial, merge) expression pairs.
- ``salted_join``: a fact×dim join where a handful of fact keys dominate and
  the dim side is too big to broadcast. The fact side gets a random salt in
  [0, n); the dim side is exploded n-fold so every (key, salt) pair exists.
  Shuffle spreads each hot key across n partitions at the price of an n-fold
  dim replication — use only for the skewed-keys subset (``hot_keys``).

Both are pure DataFrame transforms: deterministic plans, Catalyst-visible,
zero UDFs. `rand(seed)` is the only nondeterminism and affects placement,
never results (verified by parity tests in tests/test_operators.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int = 16, seed: int = 42,
              salt_col: str = "__salt") -> DataFrame:
    """Uniform integer salt in [0, salt_buckets)."""
    return df.withColumn(
        salt_col, (F.rand(seed) * salt_buckets).cast("int"))


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     partial_aggs: dict[str, Column],
                     final_aggs: dict[str, Column],
                     salt_buckets: int = 16, seed: int = 42) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs``: name -> aggregate Column over the raw rows (stage 1,
    grouped by keys + salt). ``final_aggs``: name -> aggregate Column over
    the stage-1 partials (stage 2, grouped by keys only), referencing the
    stage-1 output names.

    Example — skew-safe sum + count (avg derivable)::

        salted_aggregate(df, ["k"],
                         {"s": F.sum("v"), "c": F.count(F.lit(1))},
                         {"s": F.sum("s"), "c": F.sum("c")})

    Map-side combine already gives Spark a partial-agg stage; salting
    additionally bounds the FINAL stage's per-task row count for a hot key
    at (rows_of_key / salt_buckets) in stage 1 and salt_buckets rows in
    stage 2.
    """
    salted = with_salt(df, salt_buckets, seed)
    stage1 = (salted.groupBy(*keys, "__salt")
              .agg(*[c.alias(n) for n, c in partial_aggs.items()]))
    return (stage1.groupBy(*keys)
            .agg(*[c.alias(n) for n, c in final_aggs.items()]))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_buckets: int = 8, seed: int = 42,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the fact side, explode the dim side.

    Every dim row is replicated ``salt_buckets`` times so each salted fact
    partition finds its match; result equals ``fact.join(dim, key, how)``
    with the hot keys' rows spread over ``salt_buckets`` tasks.

    Only ``inner`` and ``left`` are supported: an unmatched dim key under
    right/full-outer would surface once per salt replica (salt_buckets
    duplicate rows instead of one). Flip the sides (dim-skew is rare) or
    dedup unmatched dim rows separately if you need outer semantics.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "unmatched dim-side keys would emit one row per salt replica")
    f = with_salt(fact, salt_buckets, seed)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return f.join(d, [key, "__salt"], how).drop("__salt")


def key_histogram(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Diagnostic: the top-N heaviest key values with their row counts and
    share of total — the input you need to decide hot_keys/salt_buckets."""
    total = df.count()
    return (df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
            .orderBy(F.col("n_rows").desc())
            .limit(top_n))
