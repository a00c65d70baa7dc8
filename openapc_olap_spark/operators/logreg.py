"""Deterministic in-engine logistic regression — the trainable quality
classifier of LLM curation recipes (the role fastText's supervised
classifier plays in the GPT-3/LLaMA data filters: score documents by
P(high quality | engineered features), keep by threshold), fit the same
oracle-able way as ``operators.kmeans``:

- model: w in R^(d+1) (bias folded in as feature 0 = 1.0), d small —
  the engineered text-quality features of ``operators.text`` /
  ``operators.stats`` (length ratios, entropy, LM score, ...), not a
  vocabulary.
- fit: full-batch gradient descent, fixed ``n_iter`` and ``lr`` —
  every step is grad = (1/n) * sum_i (sigmoid(x_i . w) - y_i) * x_i
  (the MEAN gradient, so ``lr`` is corpus-size-independent: a
  sum-gradient step scales with n and diverges the moment the corpus
  grows — caught live on the 500-doc drive), one scan per iteration
  whose exchange carries d+1 PARTIAL SUMS per partition, never rows;
  the driver holds only the (d+1)-float model (the kmeans/BPE
  scalar-grain rule).
- ``deterministic=True`` folds each gradient component in id-sorted
  order — bitwise PARTITIONING-invariant within Spark (the x54/x58/x60
  discipline; bounded corpora, since per-feature value lists
  materialize). Cross-ENGINE replay agrees to ~1 ulp per iteration,
  not to the bit: JVM ``exp`` and C-libm ``exp`` legitimately differ
  in the last place, so an oracle gate must hash ROUNDED scores (the
  repo's standard 4-6 dp gate rounding absorbs this; tested at 1e-12
  over 40 iterations). The default map-side ``sum`` is the 100 TB
  path whose additional sum-order noise no oracle hashes.
- scoring is a pure expression (dot + sigmoid): codegen'd scan at any
  scale, composable with ``stats.filter_by_percentile`` / ``ccnet``
  bucketing downstream.

Driver loop: n_iter sequential jobs, model-grain work per job; n_iter
is a small constant by construction, not corpus-dependent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic=True materializes id-sorted per-group value lists (the
# oracle-replay summation order); above this the guard raises instead of
# letting a one-reducer collect_list fold OOM (VERDICT r06 item 4)
DETERMINISTIC_MAX_ROWS = 1_000_000


def _dot_w(feats: Column, w: list[float]) -> Column:
    """x . w over an array column against literal weights — fixed
    evaluation order (index-ascending), identical in any engine."""
    out = F.lit(0.0)
    for j, wj in enumerate(w):
        out = out + feats[j] * F.lit(float(wj))
    return out


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def with_features(df: DataFrame, feature_cols: list[str],
                  out_col: str = "__x") -> DataFrame:
    """[1.0, f1, f2, ...] — bias term folded in as index 0."""
    return df.withColumn(out_col, F.array(
        F.lit(1.0), *[F.col(c).cast("double") for c in feature_cols]))


def logreg_fit(df: DataFrame, feature_cols: list[str], label_col: str,
               n_iter: int = 50, lr: float = 0.1,
               id_col: str = "doc_id",
               init: list[float] | None = None,
               deterministic: bool = False) -> list[float]:
    """Fit [bias, w1, ..., wd]; labels must be 0/1. Fixed-shape descent
    (no adaptive steps, no early stopping) so a replay with the same
    inputs walks the same trajectory to the bit, modulo summation order
    — which ``deterministic=True`` also pins."""
    d = len(feature_cols) + 1
    if init is not None and len(init) != d:
        raise ValueError(f"init has {len(init)} weights, want {d} "
                         f"(bias + {len(feature_cols)} features)")
    w = [float(x) for x in init] if init is not None else [0.0] * d
    fx = with_features(df, feature_cols)
    n = fx.count()
    if n == 0:
        return w
    if deterministic and n > DETERMINISTIC_MAX_ROWS:
        raise ValueError(
            f"deterministic=True materializes one id-sorted value list of "
            f"the WHOLE corpus per feature (a single-reducer collect_list "
            f"fold, the oracle-replay mode): {n} rows exceeds the "
            f"{DETERMINISTIC_MAX_ROWS}-row ceiling. Use the default "
            f"map-side-combined sums at scale.")

    for _ in range(n_iter):
        err = (sigmoid(_dot_w(F.col("__x"), w))
               - F.col(label_col).cast("double"))
        terms = fx.select(
            F.col(id_col).alias("__id"),
            *[(err * F.col("__x")[j]).alias(f"__g{j}") for j in range(d)])
        if deterministic:
            aggs = []
            for j in range(d):
                ordered = F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("__id").alias("i"),
                        F.col(f"__g{j}").alias("v")))),
                    lambda s: s["v"])
                aggs.append(F.aggregate(ordered, F.lit(0.0),
                                        lambda acc, x: acc + x)
                            .alias(f"__g{j}"))
            row = terms.agg(*aggs).first()
        else:
            row = terms.agg(*[F.sum(f"__g{j}").alias(f"__g{j}")
                              for j in range(d)]).first()
        w = [w[j] - lr * float(row[j]) / n for j in range(d)]
    return w


def logreg_score(df: DataFrame, weights: list[float],
                 feature_cols: list[str],
                 score_col: str = "quality_score") -> DataFrame:
    """All input columns + P(label=1 | features) as a pure expression —
    the 100 TB scoring scan (codegen'd; no UDF, no join, no shuffle)."""
    fx = with_features(df, feature_cols)
    return (fx.withColumn(score_col,
                          sigmoid(_dot_w(F.col("__x"), weights)))
            .drop("__x"))


def log_loss(df: DataFrame, weights: list[float],
             feature_cols: list[str], label_col: str) -> float:
    """Mean negative log-likelihood — the descent objective; a
    convergence / regression probe (one scan, one scalar)."""
    fx = with_features(df, feature_cols)
    p = sigmoid(_dot_w(F.col("__x"), weights))
    y = F.col(label_col).cast("double")
    ll = y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p)
    out = fx.agg(F.avg(ll)).first()[0]
    return -float(out) if out is not None else math.nan
