"""Per-group top-k selection (SURVEY.md §2.9 extension surface): keep the k
best rows of each group — the curation primitive behind "best N documents
per domain/source" quota sampling and canonical-representative picks.

100 TB posture
--------------
The naive plan is one shuffle on the group key plus an in-partition sort —
fine until one group holds a billion rows (a mega-domain), where a single
reducer sorts the whole group.  ``salt_parts > 1`` switches to the two-stage
prune: stage 1 ranks within (group, salt) — spreading a hot group over
``salt_parts`` reducers — and keeps k rows per salt; stage 2 ranks the
surviving k*salt_parts rows per group.  Any global top-k row is top-k within
its salt bucket, so the result is IDENTICAL for every salt_parts value; the
knob trades one extra (tiny) shuffle for bounded per-reducer sort size.

Determinism: ties on the ordering column are broken by ``id_col`` ascending,
so the selected set is stable across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                    k: int, id_col: str, descending: bool = True,
                    salt_parts: int = 1) -> DataFrame:
    """All input columns plus ``rk`` (1-based rank within the group), rows
    with rk <= k only. Ordered by ``order_col`` (desc by default), ties
    broken by ``id_col`` ascending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if salt_parts < 1:
        raise ValueError(f"salt_parts must be >= 1, got {salt_parts}")
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc, F.col(id_col).asc()]

    out = df
    if salt_parts > 1:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_parts))
        w1 = Window.partitionBy(*group_cols, salt).orderBy(*order)
        out = (out.withColumn("__rk1", F.row_number().over(w1))
               .filter(F.col("__rk1") <= k).drop("__rk1"))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (out.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def best_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                   id_col: str, descending: bool = True,
                   salt_parts: int = 1) -> DataFrame:
    """k=1 convenience: the single best row per group (e.g. the canonical
    representative of a duplicate cluster), ``rk`` dropped."""
    return top_k_per_group(df, group_cols, order_col, 1, id_col,
                           descending, salt_parts).drop("rk")
