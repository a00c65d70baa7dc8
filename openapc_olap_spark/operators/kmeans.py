"""Deterministic in-engine k-means (Lloyd's iterations over DataFrame
ops) — the oracle-able twin of ``similarity.train_ivf_centroids``.

MLlib's KMeans is seeded but its init (k-means||) and update order are
implementation-opaque, so a cross-engine oracle can't replay it. This
fit is replayable anywhere:

- init: the vectors of the k SMALLEST ids (one sorted-limit job) — a
  deliberately simple, fully specified seed rule. Quality-sensitive
  callers can pass ``init=`` centroids from anywhere (e.g. MLlib) and
  still get deterministic iterations.
- assign: ``similarity._nearest_centroid`` — argmin squared-L2 over a
  literal centroid array, first-index tie-break, dimension-ordered
  distance fold (deterministic by construction).
- update: per-(cluster, dimension) mean via posexplode + groupBy. The
  exchange carries k*dim aggregate rows, never vectors; the driver
  collects only the k*dim model (same scalar-grain rule as
  ``bloom.py``'s sketch row and BPE's pair fetch).
- empty clusters keep their previous centroid (fully specified).

``deterministic=True`` computes each mean with an id-sorted fold so the
double additions associate identically across partitionings AND in a
DuckDB twin (the x54/x58/x60 discipline) — gate/oracle mode, bounded
corpora only (each (cluster, dim) group materializes its member values:
at n=10^6, k=100 that is ~10k doubles per group — fine; at 100 TB use
the default map-side-combined ``avg``, whose low-bit sum-order noise is
irrelevant when no oracle must hash the result).

Driver loop: ``n_iter`` sequential jobs, model-grain work per job —
the same shape as BPE training rounds; n_iter is small (5-20) by
construction, not corpus-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (_nearest_centroid, _nearest_centroid_arrow,
                         ivf_assign)


def _update(assigned: DataFrame, vec_col: str, id_col: str,
            deterministic: bool) -> list[tuple]:
    ex = assigned.select(
        F.col("__cid"), F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
         .alias("__pos", "__val"))
    if deterministic:
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("__id").alias("i"), F.col("__val").alias("v")))),
            lambda s: s["v"])
        agg = (ex.groupBy("__cid", "__pos")
                 .agg((F.aggregate(ordered, F.lit(0.0),
                                   lambda acc, x: acc + x)
                       / F.count(F.lit(1))).alias("__mean")))
    else:
        agg = (ex.groupBy("__cid", "__pos")
                 .agg(F.avg("__val").alias("__mean")))
    return agg.collect()


def kmeans_fit(df: DataFrame, k: int, n_iter: int = 5,
               vec_col: str = "embedding", id_col: str = "doc_id",
               init: list[list[float]] | None = None,
               deterministic: bool = False,
               assign: str = "expr") -> list[list[float]]:
    """Fit k centroids; returns the driver-side model (k x dim floats),
    ready for ``similarity.ivf_assign`` / ``semdedup`` /
    ``write_ann_index``. See the module docstring for the exact rules.

    ``assign="arrow"`` swaps the interpreted-HOF argmin for the
    Arrow-batched matmul (same ids on every test fixture; measured 35x
    faster full-corpus iterations at k=64, dim=64). The expression path stays
    the default and the oracle mode: a sub-ulp distance NEAR-tie could
    in principle argmin differently between the two float formulations,
    so ``deterministic=True`` (gate/oracle replay) rejects "arrow".
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if assign not in ("expr", "arrow"):
        raise ValueError(f"assign must be 'expr' or 'arrow', got {assign!r}")
    if deterministic and assign == "arrow":
        raise ValueError("deterministic=True requires assign='expr' — "
                         "the oracle replays the expression argmin")
    if deterministic:
        # the id-sorted fold means materializes each (cluster, dim)
        # group's member values — oracle-replay mode, bounded corpora
        # only; enforce the docstring ceiling instead of trusting prose
        # (VERDICT r06 item 4). limit(N+1) keeps the probe a bounded scan.
        from .logreg import DETERMINISTIC_MAX_ROWS
        if df.limit(DETERMINISTIC_MAX_ROWS + 1).count() \
                > DETERMINISTIC_MAX_ROWS:
            raise ValueError(
                f"deterministic=True materializes id-sorted value lists "
                f"per (cluster, dim) group: input exceeds the "
                f"{DETERMINISTIC_MAX_ROWS}-row ceiling. Use the default "
                f"map-side-combined avg at scale.")
    if init is not None:
        if len(init) != k:
            raise ValueError(f"init has {len(init)} centroids, want {k}")
        cents = [list(map(float, c)) for c in init]
    else:
        seed_rows = (df.select(id_col, vec_col)
                       .orderBy(id_col).limit(k).collect())
        if len(seed_rows) < k:
            raise ValueError(
                f"k={k} but the input has only {len(seed_rows)} rows")
        cents = [list(map(float, r[vec_col])) for r in seed_rows]

    for _ in range(n_iter):
        if assign == "arrow":
            from .similarity import _null_elem
            v = F.col(vec_col).cast("array<double>")
            cid = _nearest_centroid_arrow(cents)(v, _null_elem(v))
        else:
            cid = _nearest_centroid(F.col(vec_col).cast("array<double>"),
                                    cents)
        assigned = df.select(F.col(id_col), F.col(vec_col),
                             cid.alias("__cid"))
        rows = _update(assigned, vec_col, id_col, deterministic)
        new = [list(c) for c in cents]          # empty cluster -> keep
        for r in rows:
            new[r["__cid"]][r["__pos"]] = r["__mean"]
        cents = new
    return cents


def kmeans_cost(df: DataFrame, centroids: list[list[float]],
                vec_col: str = "embedding") -> float:
    """Sum of squared L2 distances to each vector's nearest centroid
    (the Lloyd's objective) — one scan, one scalar out. Monotonically
    non-increasing over ``kmeans_fit`` iterations; useful as a
    convergence / regression probe."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                      for c in centroids])
    v = F.col(vec_col).cast("array<double>")
    dists = F.transform(cents, lambda c: F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, val: acc + val))
    out = df.agg(F.sum(F.array_min(dists))).first()[0]
    return float(out) if out is not None else 0.0


def ivf_assign_fast(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """``similarity.ivf_assign(method="arrow")`` — kept as the
    historically-named convenience for full-corpus assignment jobs where
    the interpreted-HOF expression is the bottleneck (it dominated e.g.
    the k=200 cluster-outlier scan at sf10 — SCALING.md). The argmin
    implementations now live in similarity.py so every cluster path
    (semdedup, outliers, IVF) shares them via ``method=``."""
    return ivf_assign(df, centroids, vec_col, method="arrow")
