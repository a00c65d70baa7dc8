"""Deterministic exact-count per-group sampling — the round-7-queue
companion to the rate-based ``packing.stratified_sample`` (md5 permille
filter, count varies with the draw) and the quality-ranked
``ranking.top_k_per_group`` (not a sample at all): every group
contributes EXACTLY min(k, |group|) uniformly-chosen rows.

In its own module (rather than appended to ``ranking.py``) because
ranking.py backs the hash-certified x42 gate this round — the cert
manifest pins that module byte-identical until its next window
rotation.

100 TB posture: inherits everything from ``top_k_per_group`` — one
group-keyed shuffle, ``salt_parts`` two-stage pruning for mega-groups
(any global top-k-by-priority row is top-k within its salt bucket, so
the sample is IDENTICAL for every salt_parts). The md5 priority is a
pure function of (seed, id): reproducible across runs, partitionings,
and engines (a DuckDB twin ranks on the same digest), independent of
input order, and redrawable by changing ``seed`` alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import top_k_per_group


def sample_k_per_group(df: DataFrame, group_cols: list[str], k: int,
                       id_col: str, seed: str = "0",
                       salt_parts: int = 1) -> DataFrame:
    """All input columns plus ``rk`` (1-based priority rank within the
    group), rows with rk <= k only — a uniform sample because md5 is
    uniform over ids and independent of every data column."""
    pri = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                         F.col(id_col).cast("string")))
    out = top_k_per_group(df.withColumn("__pri", pri), group_cols,
                          "__pri", k, id_col, descending=False,
                          salt_parts=salt_parts)
    return out.drop("__pri")
