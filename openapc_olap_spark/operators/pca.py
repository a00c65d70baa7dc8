"""Distributed PCA over an embedding column (SURVEY.md §2.9 X3/X4
extension — dimensionality reduction for the embedding half of a
curation stack: cheaper ANN / semdedup / outlier scans on k' << d
projections, whitening before cosine thresholds, drift probes via
explained variance. Reference has no equivalent; driver-mandated
LLM-pipeline surface).

The classic two-phase shape, Spark-first:

1. **Covariance — distributed, single pass.** One aggregation computes
   every moment: n, the d means, and the d(d+1)/2 upper-triangle raw
   second moments sum(v_i * v_j) as independent map-side-combined SUM
   expressions. The exchange carries d^2-grain partial sums — NEVER
   rows — and the driver receives one row of d(d+3)/2 + 1 scalars
   (model-grain, the kmeans/bpe rule; d=1024 -> ~4 MB).
2. **Eigenvector — driver-side, replayable.** ``top_component`` runs
   fixed-iteration power iteration on the d x d matrix with EXPLICIT
   ascending-index summation folds (no numpy dot — SIMD/pairwise order
   would diverge from a SQL twin), so an oracle replays it to the bit.
   For production k-component use, ``numpy.linalg.eigh`` on the same
   matrix is exposed via ``principal_components`` (driver-side d x d —
   not oracle-replayable, says so).
3. **Projection — zero-shuffle scan.** Literal component vectors,
   dimension-ascending dot-product folds; codegen-friendly expressions.

``deterministic=True`` on the covariance swaps each SUM for an
id-sorted fold per (i, j) cell — the x54/x58 engine-deterministic
summation discipline (bounded corpora; the logreg row ceiling guards
it). The default SUM path is the 100 TB mode.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def covariance_matrix(df: DataFrame, dim: int, vec_col: str = "embedding",
                      id_col: str = "doc_id",
                      deterministic: bool = False
                      ) -> tuple[list[list[float]], list[float], int]:
    """(cov, mean, n): the d x d sample covariance (divide by n, the
    population/ML convention — fully specified for replay), the mean
    vector, and the row count. ``dim`` is required — no data probe.

    cov[i][j] = sum(v_i * v_j)/n - mean_i * mean_j, computed from raw
    moments so ONE pass suffices (no second centered scan)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    v = F.col(vec_col).cast("array<double>")
    if deterministic:
        from openapc_olap_spark.operators.logreg import DETERMINISTIC_MAX_ROWS
        if df.limit(DETERMINISTIC_MAX_ROWS + 1).count() \
                > DETERMINISTIC_MAX_ROWS:
            raise ValueError(
                f"deterministic=True materializes id-sorted value lists "
                f"per covariance cell: input exceeds the "
                f"{DETERMINISTIC_MAX_ROWS}-row ceiling. Use the default "
                f"map-side-combined sums at scale.")
        base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))

        def _fold(expr_fn):
            ordered = F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__id").alias("i"), expr_fn().alias("x")))),
                lambda s: s["x"])
            return F.aggregate(ordered, F.lit(0.0),
                               lambda acc, x: acc + x)

        aggs = [F.count(F.lit(1)).alias("__n")]
        for i in range(dim):
            aggs.append(_fold(lambda i=i: F.col("__v")[i])
                        .alias(f"__m{i}"))
        for i in range(dim):
            for j in range(i, dim):
                aggs.append(_fold(lambda i=i, j=j:
                                  F.col("__v")[i] * F.col("__v")[j])
                            .alias(f"__s{i}_{j}"))
        row = base.agg(*aggs).first()
    else:
        aggs = [F.count(F.lit(1)).alias("__n")]
        aggs += [F.sum(v[i]).alias(f"__m{i}") for i in range(dim)]
        aggs += [F.sum(v[i] * v[j]).alias(f"__s{i}_{j}")
                 for i in range(dim) for j in range(i, dim)]
        row = df.agg(*aggs).first()
    n = int(row["__n"] or 0)
    if n == 0:
        zero = [[0.0] * dim for _ in range(dim)]
        return zero, [0.0] * dim, 0
    mean = [float(row[f"__m{i}"] or 0.0) / n for i in range(dim)]
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            c = float(row[f"__s{i}_{j}"] or 0.0) / n - mean[i] * mean[j]
            cov[i][j] = cov[j][i] = c
    return cov, mean, n


def top_component(cov: list[list[float]], n_iter: int = 10) -> list[float]:
    """The dominant eigenvector by fixed-iteration power iteration with
    fully-specified arithmetic: v0 = 1/sqrt(d) everywhere; each step is
    w_i = sum_j(cov[i][j] * v_j) folded j-ascending, then v = w/||w||
    with the norm folded i-ascending; sign fixed so the first
    |component| > 1e-12 entry is positive. Pure Python loops — an
    engine replaying the same folds reproduces every double."""
    d = len(cov)
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(n_iter):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc = acc + cov[i][j] * v[j]
            w.append(acc)
        nrm = 0.0
        for i in range(d):
            nrm = nrm + w[i] * w[i]
        nrm = math.sqrt(nrm)
        if nrm == 0.0:
            return w          # degenerate: zero matrix
        v = [x / nrm for x in w]
    for x in v:
        if abs(x) > 1e-12:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def principal_components(cov: list[list[float]],
                         k: int) -> tuple[list[list[float]], list[float]]:
    """Top-k eigenvectors + eigenvalues via numpy.linalg.eigh (the
    production path; NOT oracle-replayable — numpy's LAPACK order is
    opaque, which is exactly why ``top_component`` exists for gates)."""
    import numpy as np

    w, vecs = np.linalg.eigh(np.asarray(cov, dtype=np.float64))
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        nz = np.flatnonzero(np.abs(c) > 1e-12)
        if len(nz) and c[nz[0]] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return comps, [float(w[i]) for i in order]


def project_expr(vec_col: Column | str, component: list[float],
                 mean: list[float] | None = None) -> Column:
    """(v - mean) . component as a dimension-ascending expression fold —
    zero shuffle, replayable. ``mean=None`` skips centering."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    out = F.lit(0.0)
    for i, c in enumerate(component):
        x = v[i] - F.lit(float(mean[i])) if mean is not None else v[i]
        out = out + x * F.lit(float(c))
    return out


def project(df: DataFrame, components: list[list[float]],
            mean: list[float] | None = None, vec_col: str = "embedding",
            out_col: str = "pca") -> DataFrame:
    """All input columns + ``out_col`` array<double> of the k projected
    coordinates — one zero-shuffle scan."""
    return df.withColumn(out_col, F.array(
        *[project_expr(vec_col, c, mean) for c in components]))
