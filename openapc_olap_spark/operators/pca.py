"""Distributed PCA over an embedding column (SURVEY.md §2.9 X3/X4
extension — dimensionality reduction for the embedding half of a
curation stack: cheaper ANN / semdedup / outlier scans on k' << d
projections, whitening before cosine thresholds, drift probes via
explained variance. Reference has no equivalent; driver-mandated
LLM-pipeline surface).

The classic two-phase shape, Spark-first:

1. **Covariance — distributed, single pass, three physical paths**
   (``method=``; the exchange always carries d^2-grain partial sums —
   NEVER rows — and the driver receives d(d+3)/2 + 1 scalars,
   model-grain, the kmeans/bpe rule):

   - ``"expr"`` — n, the d means, and the d(d+1)/2 upper-triangle raw
     second moments sum(v_i * v_j) as independent map-side-combined
     SUM expressions. Unbeatable at small d, but the expression count
     is quadratic: at d=768-4096 (real text-embedding dims) that is
     295k-8.4M codegen'd aggregates and planning dies before the data
     does (VERDICT r07 #1). Hard-capped at ``EXPR_DIM_CAP``.
   - ``"explode"`` — the replayable any-d path: posexplode to
     (i, x), a second slice-posexplode to upper-triangle
     (i, j, x*y) triples, one groupBy(i, j) SUM. Plan size is
     CONSTANT in d (three operators); the executor-side volume is
     n * d(d+1)/2 generated rows, map-side combined to d^2 cells per
     partition before the one exchange. This is what oracles replay
     at high dim.
   - ``"arrow"`` — the production fast path: one ``mapInPandas``
     partial-moment kernel (V^T @ V per Arrow batch, summed per
     partition -> ONE partial row per partition, tree-combined), so
     the corpus crosses the Python boundary once and the moment work
     is a BLAS matmul. d=768 at sf10 runs in seconds where "expr"
     cannot even plan (SCALING.md r08).
   - ``"auto"`` (default) — "expr" up to ``AUTO_ARROW_DIM``, "arrow"
     above.
   - ``"both"`` — the equality gate: runs "arrow" AND "explode",
     asserts every moment agrees (1e-9 relative), returns the
     "explode" (oracle-twin) values — the x53/x59 self-certification
     pattern at covariance grain.
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

**Dirty-row contract (ADVICE r08, unified across ALL paths):** a row
whose vector is NULL, has length != dim, or contains a NULL element is
excluded ENTIRELY — from n, the means, and every covariance cell — by
one Spark-side prefilter applied before any physical path runs. Every
method therefore computes the same statistic on the same clean subset,
``method='both'`` is a pure kernel-equality gate even on dirty corpora,
and ``method='auto'`` cannot change results when dim crosses
``AUTO_ARROW_DIM``. NaN elements are NOT dirty: they pass the filter
and poison exactly the cells they touch (SUM-over-NaN semantics),
identically in every path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 'auto' switches from the d^2-SUM-expression plan to the Arrow moment
# kernel above this dim — past it, codegen/planning cost grows faster
# than the data cost (measured at sf0.01: d=32 expr 4.6 s vs arrow
# 0.3 s; d=64 expr 20.9 s vs arrow 1.8 s — and d=768 would be 295k
# expressions that never finish planning)
AUTO_ARROW_DIM = 16
# 'expr' refuses outright above this: the plan itself is the bottleneck
EXPR_DIM_CAP = 256

_METHODS = ("auto", "expr", "explode", "arrow", "both")


def clean_vectors(v: Column, dim: int) -> Column:
    """The shared dirty-row predicate: vector present, exactly ``dim``
    long, no NULL elements. Applied ONCE before any moments path so
    every method sees the same clean subset (module docstring)."""
    return (v.isNotNull() & (F.size(v) == dim)
            & (F.size(F.filter(v, lambda x: x.isNull())) == 0))


def _moments_expr(df: DataFrame, dim: int, v: Column):
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(v[i]).alias(f"__m{i}") for i in range(dim)]
    aggs += [F.sum(v[i] * v[j]).alias(f"__s{i}_{j}")
             for i in range(dim) for j in range(i, dim)]
    row = df.agg(*aggs).first()
    n = int(row["__n"] or 0)
    sums = [float(row[f"__m{i}"] or 0.0) for i in range(dim)]
    mom = {(i, j): float(row[f"__s{i}_{j}"] or 0.0)
           for i in range(dim) for j in range(i, dim)}
    return n, sums, mom


def _moments_explode(df: DataFrame, dim: int, v: Column):
    """Constant-plan-size moments: (i, x) posexplode, slice-posexplode
    to the (i, j >= i) upper triangle, ONE groupBy(i, j) SUM (map-side
    combined to <= d(d+1)/2 cells per partition before the exchange).
    n and the d linear sums ride the same pair frame (the j == i row
    carries x*x; linear terms come from a companion (i, x) agg)."""
    base = df.select(v.alias("__v"))
    ex = base.select(F.posexplode("__v").alias("__i", "__x"))
    lin = (ex.groupBy("__i").agg(F.sum("__x").alias("__s")).collect())
    n = int(df.count())
    sums = [0.0] * dim
    for r in lin:
        if r["__i"] < dim:
            sums[r["__i"]] = float(r["__s"] or 0.0)
    pairs = (base
             .select(F.posexplode("__v").alias("__i", "__x"), "__v")
             .select("__i", "__x",
                     F.posexplode(F.slice(
                         "__v", F.col("__i") + 1,
                         F.lit(dim))).alias("__jj", "__y"))
             .select("__i", (F.col("__i") + F.col("__jj")).alias("__j"),
                     (F.col("__x") * F.col("__y")).alias("__p"))
             .groupBy("__i", "__j").agg(F.sum("__p").alias("__s"))
             .collect())
    mom = {(i, j): 0.0 for i in range(dim) for j in range(i, dim)}
    for r in pairs:
        if (r["__i"], r["__j"]) in mom:
            mom[(r["__i"], r["__j"])] = float(r["__s"] or 0.0)
    return n, sums, mom


def _moments_arrow(df: DataFrame, dim: int, v: Column):
    """The production kernel: per-partition V^T @ V partials (one BLAS
    matmul per Arrow batch), ONE array<double> row per partition of
    length 1 + d + d(d+1)/2, tree-combined (coalesce + re-kernel) when
    the partition count is large, summed on the driver. The caller
    (covariance_matrix) has already dropped dirty rows — the kernel's
    own length guard is a belt-and-braces invariant, not a semantic
    branch; NaN elements poison exactly the cells they touch, same as
    SUM over NaN."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)
    width = 1 + dim + (dim * (dim + 1)) // 2
    schema = "part array<double>"

    def kernel(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        M = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            col = pdf["__v"]
            n += len(col)
            good = [np.asarray(x, dtype=np.float64) for x in col
                    if x is not None and len(x) == dim]
            # null elements arrive as NaN from Arrow; a row carrying
            # one is excluded via the Spark-side __dirty prefilter
            if good:
                V = np.vstack(good)
                s += V.sum(axis=0)
                M += V.T @ V
        yield pd.DataFrame(
            {"part": [np.concatenate(([float(n)], s, M[iu]))]})

    def combine(batches):
        acc = np.zeros(width, dtype=np.float64)
        seen = False
        for pdf in batches:
            for a in pdf["part"]:
                acc += np.asarray(a, dtype=np.float64)
                seen = True
        if seen:
            yield pd.DataFrame({"part": [acc]})

    parts = df.select(v.alias("__v")).mapInPandas(kernel, schema)
    if df.rdd.getNumPartitions() > 64:
        parts = parts.coalesce(16).mapInPandas(combine, schema)
    rows = parts.collect()
    total = np.zeros(width, dtype=np.float64)
    for r in rows:
        total += np.asarray(r["part"], dtype=np.float64)
    n = int(total[0])
    sums = [float(x) for x in total[1:1 + dim]]
    mom: dict = {}
    k = 1 + dim
    for i, j in zip(*iu):
        mom[(int(i), int(j))] = float(total[k])
        k += 1
    return n, sums, mom


def _assemble(dim: int, n: int, sums, mom):
    if n == 0:
        zero = [[0.0] * dim for _ in range(dim)]
        return zero, [0.0] * dim, 0
    mean = [s / n for s in sums]
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            c = mom[(i, j)] / n - mean[i] * mean[j]
            cov[i][j] = cov[j][i] = c
    return cov, mean, n


def covariance_matrix(df: DataFrame, dim: int, vec_col: str = "embedding",
                      id_col: str = "doc_id",
                      deterministic: bool = False,
                      method: str = "auto"
                      ) -> tuple[list[list[float]], list[float], int]:
    """(cov, mean, n): the d x d sample covariance (divide by n, the
    population/ML convention — fully specified for replay), the mean
    vector, and the row count. ``dim`` is required — no data probe.

    cov[i][j] = sum(v_i * v_j)/n - mean_i * mean_j, computed from raw
    moments so ONE pass suffices (no second centered scan). ``method``
    picks the physical moments path — see the module docstring; every
    path feeds the same driver-side assembly, so downstream
    (top_component / principal_components / project) is path-blind.

    Dirty rows (NULL / wrong-length / null-element vectors) are dropped
    by one shared prefilter before ANY path runs, so n, means, and
    moments all describe the same clean subset regardless of method
    (module docstring; ADVICE r08)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, "
                         f"got {method!r}")
    v = F.col(vec_col).cast("array<double>")
    df = df.filter(clean_vectors(v, dim))
    if deterministic:
        if method not in ("auto", "expr"):
            raise ValueError(
                "deterministic=True uses id-sorted expression folds; "
                "combine it only with method='expr'/'auto'")
        from openapc_olap_spark.operators.logreg import DETERMINISTIC_MAX_ROWS
        if df.limit(DETERMINISTIC_MAX_ROWS + 1).count() \
                > DETERMINISTIC_MAX_ROWS:
            raise ValueError(
                f"deterministic=True materializes id-sorted value lists "
                f"per covariance cell: input exceeds the "
                f"{DETERMINISTIC_MAX_ROWS}-row ceiling. Use the default "
                f"map-side-combined sums at scale.")
        base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))

        # each fold is ONE F.expr SQL string — the identical Catalyst
        # tree the former Column-object chain built (GetArrayItem
        # indexing, named_struct, array_sort, 0.0D seed), so values are
        # bitwise unchanged; building d(d+3)/2 + 1 nested-lambda
        # aggregates through Column objects cost thousands of py4j
        # round-trips per call (r14 profile: 2.0 s driver gap before
        # the one job at dim=8 — the unigram/langid house fix)
        def _fold(x_sql: str) -> str:
            return (f"aggregate(transform(array_sort(collect_list("
                    f"named_struct('i', __id, 'x', {x_sql}))), "
                    f"s -> s.x), 0.0D, (acc, x) -> acc + x)")

        aggs = [F.count(F.lit(1)).alias("__n")]
        for i in range(dim):
            aggs.append(F.expr(_fold(f"__v[{i}]")).alias(f"__m{i}"))
        for i in range(dim):
            for j in range(i, dim):
                aggs.append(F.expr(_fold(f"(__v[{i}] * __v[{j}])"))
                            .alias(f"__s{i}_{j}"))
        row = base.agg(*aggs).first()
        n = int(row["__n"] or 0)
        if n == 0:
            zero = [[0.0] * dim for _ in range(dim)]
            return zero, [0.0] * dim, 0
        mean = [float(row[f"__m{i}"] or 0.0) / n for i in range(dim)]
        cov = [[0.0] * dim for _ in range(dim)]
        for i in range(dim):
            for j in range(i, dim):
                c = (float(row[f"__s{i}_{j}"] or 0.0) / n
                     - mean[i] * mean[j])
                cov[i][j] = cov[j][i] = c
        return cov, mean, n
    if method == "auto":
        method = "expr" if dim <= AUTO_ARROW_DIM else "arrow"
    if method == "expr":
        if dim > EXPR_DIM_CAP:
            raise ValueError(
                f"method='expr' builds d(d+1)/2 = "
                f"{dim * (dim + 1) // 2} aggregate expressions at "
                f"dim={dim} — past EXPR_DIM_CAP={EXPR_DIM_CAP} the plan "
                f"itself is the bottleneck. Use method='arrow' "
                f"(production) or 'explode' (oracle-replayable).")
        n, sums, mom = _moments_expr(df, dim, v)
    elif method == "explode":
        n, sums, mom = _moments_explode(df, dim, v)
    elif method == "arrow":
        n, sums, mom = _moments_arrow(df, dim, v)
    else:                               # 'both' — the equality gate
        n_a, sums_a, mom_a = _moments_arrow(df, dim, v)
        n_e, sums_e, mom_e = _moments_explode(df, dim, v)
        if n_a != n_e:
            raise AssertionError(
                f"pca moments arrow/explode n mismatch: {n_a} != {n_e}")

        def _close(a, b):
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))

        for i in range(dim):
            if not _close(sums_a[i], sums_e[i]):
                raise AssertionError(
                    f"pca moments arrow/explode mean-sum mismatch at "
                    f"i={i}: {sums_a[i]!r} != {sums_e[i]!r}")
        for key in mom_e:
            if not _close(mom_a[key], mom_e[key]):
                raise AssertionError(
                    f"pca moments arrow/explode cell mismatch at "
                    f"{key}: {mom_a[key]!r} != {mom_e[key]!r}")
        n, sums, mom = n_e, sums_e, mom_e
    return _assemble(dim, n, sums, mom)


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
