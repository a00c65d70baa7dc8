"""Distribution statistics for corpus curation (SURVEY.md §2.9 X4
family — character-entropy gibberish detection and exact-percentile
outlier trimming, the two distribution-shaped quality filters next to
the heuristic scores in operators.text. Reference has no equivalent;
driver-mandated LLM-pipeline surface).

100 TB posture: entropy is one (doc, char) map-side-combined aggregate
(the explode multiplies rows but pre-aggregates before the shuffle, so
the exchange carries per-doc char counts — bounded by alphabet size per
doc, not text length); the percentile filter is one tiny quantile
aggregate broadcast back over a second scan-predicate pass. Float sums
fold in char-sorted order (the repo determinism discipline, see
operators.lm) so scores hash-certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 round_to: int | None = None) -> DataFrame:
    """Per-document Shannon entropy of the character distribution, in
    nats: (id_col, n_chars, entropy). Empty documents emit no row.

    entropy = ln(n) - (1/n) * sum_c cnt(c) * ln(cnt(c)) — the second
    form avoids per-char division and folds the char-sorted term list
    deterministically. Natural-language text sits ~3-4 nats; extreme
    lows flag repeated-character spam, extreme highs flag random bytes.
    """
    per = (df.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), "")).alias("c"))
           .filter(F.col("c") != "")
           .groupBy(id_col, "c")
           .agg(F.count(F.lit(1)).alias("cnt")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("c"), (F.col("cnt") * F.log("cnt")).alias("t")))),
        lambda s: s["t"])
    tsum = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    n = F.sum("cnt")
    ent = F.log(n) - tsum / n
    if round_to is not None:
        ent = F.round(ent, round_to)
    return (per.groupBy(id_col)
            .agg(n.alias("n_chars"), ent.alias("entropy")))


def percentile_bounds(df: DataFrame, metric_col: str,
                      lower: float = 0.05,
                      upper: float = 0.95) -> tuple[float, float]:
    """EXACT interpolated percentiles of a metric (Spark ``percentile``,
    the R-7/linear-interpolation definition DuckDB's quantile_cont
    shares) — one aggregate job returning two scalars. Exactness costs
    a sort of the METRIC column only; at 10^11 rows switch the caller
    to approx_percentile and widen the band."""
    row = df.agg(
        F.percentile(F.col(metric_col).cast("double"), F.lit(lower))
        .alias("lo"),
        F.percentile(F.col(metric_col).cast("double"), F.lit(upper))
        .alias("hi")).first()
    if row is None or row["lo"] is None or row["hi"] is None:
        raise ValueError(
            f"percentile_bounds: no non-null {metric_col!r} values")
    return float(row["lo"]), float(row["hi"])


def filter_by_percentile(df: DataFrame, metric_col: str,
                         lower: float = 0.05,
                         upper: float = 0.95) -> DataFrame:
    """Trim distribution outliers: keep rows whose metric lies inside
    the [lower, upper] exact-percentile band (inclusive). The bounds
    are two driver scalars, so the filter is a pure scan predicate on
    the second pass — no join, no shuffle.

    For INTEGRAL metric columns the float bounds tighten to
    [ceil(lo), floor(hi)] — selecting exactly the same integer rows —
    so the predicate compares the column in its own type and reaches
    the parquet reader as a PushedFilter (row-group/page pruning at
    100 TB); a double-cast comparison would stop at a post-scan
    filter."""
    import math
    try:
        lo, hi = percentile_bounds(df, metric_col, lower, upper)
    except ValueError:
        # no non-null metric values: the trimmed frame is empty
        return df.filter(F.lit(False))
    dtype = dict(df.dtypes)[metric_col]
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        m = F.col(metric_col)
        return df.filter((m >= F.lit(int(math.ceil(lo))))
                         & (m <= F.lit(int(math.floor(hi)))))
    m = F.col(metric_col).cast("double")
    return df.filter((m >= F.lit(lo)) & (m <= F.lit(hi)))
