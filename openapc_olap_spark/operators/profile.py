"""Dataset profiling (data-quality summary) in ONE aggregation pass.

``profile`` computes per-column statistics — count, nulls, min, max, mean,
stddev, quantiles — for any set of numeric columns with a single
map-side-combined aggregate over one scan, then reshapes the one wide row
to the long (column, stat...) form with ``stack``. No per-column jobs, no
driver-side loops over data.

Quantiles: ``exact=False`` (default) uses ``approx_percentile`` —
bounded-memory sketches, the only viable shape at 100 TB. ``exact=True``
uses the exact interpolated ``percentile`` (per-aggregate value buffering;
fine at gate/test scale, documented divergence at corpus scale) — the same
exact-vs-approx opt-in split as count_distinct in model.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str],
            quantiles: tuple[float, ...] = (0.5, 0.95),
            exact: bool = False) -> DataFrame:
    """Per-column profile: (column, n, n_nulls, min, max, mean, stddev,
    q<NN>...) — one row per profiled column, one scan, one aggregate."""
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"__{c}_n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"__{c}_nulls"),
            F.min(col).alias(f"__{c}_min"),
            F.max(col).alias(f"__{c}_max"),
            F.avg(col).alias(f"__{c}_mean"),
            F.stddev(col).alias(f"__{c}_std"),
        ]
        for q in quantiles:
            fn = F.percentile(col, F.lit(q)) if exact \
                else F.percentile_approx(col, F.lit(q))
            aggs.append(fn.alias(f"__{c}_q{int(q * 100)}"))
    wide = df.agg(*aggs)
    qnames = [f"q{int(q * 100)}" for q in quantiles]
    stats = ["n", "nulls", "min", "max", "mean", "std"] + qnames
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args += [f"`__{c}_{s}`" for s in stats]
    out_cols = ", ".join(["column"] + stats)
    return wide.select(F.expr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS ({out_cols})"))
