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


# (h + 1) / (2^48 + 1): a 12-hex-digit md5 prefix mapped into the OPEN
# interval (0, 1) — both endpoints excluded, so ln(u) is always finite.
# 2^48 + 1 is exactly representable as a double.
_U_DENOM = float((1 << 48) + 1)


def _md5_uniform(col, seed: str):
    """Deterministic uniform in (0, 1) from (seed, id) — the engine-
    portable randomness primitive (DuckDB twin:
    ('0x' || substr(md5(seed || ':' || id), 1, 12))::BIGINT + 1, over
    the same denominator)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                       col.cast("string"))), 1, 12), 16, 10).cast("long")
    return (h + F.lit(1).cast("long")) / F.lit(_U_DENOM)


def weighted_sample_k_per_group(df: DataFrame, group_cols: list[str],
                                k: int, weight_col: str, id_col: str,
                                seed: str = "0",
                                salt_parts: int = 1) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly min(k, |group|)
    rows per group: the Efraimidis-Spirakis A-ES scheme — each row
    draws u ~ U(0,1) deterministically from (seed, id) and the k rows
    with the largest u^(1/w) win, which selects each row with
    probability proportional to its weight among the remaining rows.
    Ranked on the monotone-equivalent key ln(u)/w descending (ln and
    one division — engine-replayable where pow is not guaranteed
    bit-identical), ties broken by id.

    Rows with NULL or non-positive weight are EXCLUDED before the draw
    (they have no defined inclusion probability); redraw by changing
    ``seed``. Inherits ``top_k_per_group``'s salted two-stage pruning —
    the sample is identical for every ``salt_parts``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    key = F.log(_md5_uniform(F.col(id_col), seed)) / w
    out = top_k_per_group(
        df.filter(w.isNotNull() & (w > 0)).withColumn("__key", key),
        group_cols, "__key", k, id_col, descending=True,
        salt_parts=salt_parts)
    return out.drop("__key")
