"""k-nearest-neighbour GRAPH construction over an embedding column
(SURVEY.md §2.9 X3 extension; VERDICT r08 #4 — the bulk-similarity
shape between semdedup's "too similar" and cluster_outliers' "too far":
every doc linked to its k nearest, the input graph-based dedup /
clustering / label-propagation pipelines start from. Reference has no
equivalent; driver-mandated LLM-pipeline surface).

Three physical paths behind one output contract
(src, rank, dst, score) with rank 1..k ordered by (score desc, dst id
asc — fully deterministic tie-break):

- ``"expr"`` — the oracle-replayable twin: query x corpus join, JVM
  cosine/dot fold, one window top-k per src. O(|Q| * n) scored pairs
  through a shuffle — correct at any size, affordable when the QUERY
  side is bounded (the gate's shape) or n is small. This is what DuckDB
  replays.
- ``"arrow"`` — the brute-force production path at index-build scale:
  the (id, vector) corpus is collected and broadcast ONCE (guarded by
  ``ARROW_CORPUS_CAP`` — n * d * 8 bytes must fit an executor; ~0.5 GB
  at 1M x 64d), then one ``mapInPandas`` kernel streams QUERY
  partitions, scores each Arrow batch against the corpus with a single
  BLAS matmul, and emits ONLY the top-k rows per query — the n^2 pair
  set never materializes, never shuffles, and the output is n*k rows
  straight from the kernel. Tie-break replicated exactly via
  lexsort(dst_id, -score).
- ``"both"`` — the equality gate (kmeans/pca/cc pattern): runs arrow
  AND expr, asserts (src, rank, dst) identical everywhere and scores
  equal to 1e-9 rel, returns the expr (oracle-twin) frame. Sound
  whenever scores can't tie across ulp noise — exact on
  integer-quantized vectors (the x87 gate discipline: dot products of
  floor(x*1000+0.5) vectors are exact < 2^53 in BOTH float64 matmul
  and SQL folds).

Past broadcast scale the answer is the blocked path:

- :func:`knn_graph_ivf` — IVF-blocked approximate kNN: assign every
  vector to its nearest centroid (``similarity.ivf_assign``), give
  every query row its ``n_probe`` nearest centroid ids (constant-size
  expression, same squared-L2 + index tie-break as
  ``similarity._ivf_probe_ids``), equi-join probe ids against list
  assignments, score only co-probed pairs, window top-k per src.
  Candidate volume is n * (n / n_centroids) * n_probe instead of n^2;
  with n_centroids ~ sqrt(n) and the corpus written partitioned by
  list_id (``similarity.write_ivf_index``) the probe join becomes a
  partition-pruned scan. Recall < 1 by construction — measured as a
  probe-breadth curve in tests/test_ann_recall.py.

Dirty rows (NULL / wrong-length / null-element vectors) are dropped on
BOTH sides by the shared ``pca.clean_vectors`` prefilter — one contract
across the whole embedding-operator family (ADVICE r08).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators.pca import clean_vectors
from openapc_olap_spark.operators.similarity import (_as_double_array,
                                                     cosine, dot, ivf_assign,
                                                     train_ivf_centroids)

# method='arrow' broadcasts the (id, vector) corpus to every executor:
# n * (d * 8 + 8) bytes. 1M rows at d=64 is ~0.5 GB — the practical
# brute-force ceiling; past it, use knn_graph_ivf (blocked, no corpus
# broadcast) or trim the corpus first.
ARROW_CORPUS_CAP = 1_000_000
# 'auto' uses the expr twin below this corpus size (cheap, zero Python),
# the Arrow kernel above it
AUTO_EXPR_ROWS = 4_096

_METHODS = ("auto", "expr", "arrow", "both")
_METRICS = ("cosine", "dot")


def _score(metric: str, a: Column, b: Column) -> Column:
    return cosine(a, b) if metric == "cosine" else dot(a, b)


def _clean(df: DataFrame, dim: int, id_col: str,
           vec_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return (df.filter(clean_vectors(v, dim))
            .select(F.col(id_col).alias("id"), v.alias("v")))


def _row_topk_np(s, mids, k):
    """Exact top-k indices by (score desc, id asc). Fast path:
    argpartition to k + slack candidates (O(n)), exact-sort only
    those; provably complete unless a score TIE spans the partition
    boundary, in which case fall back to the full lexsort — ties above
    the k-th candidate's score cannot exist outside the candidate set
    by the partition guarantee."""
    import numpy as np

    n = len(s)
    take = k + 8
    if take >= n:
        order = np.lexsort((mids, -s))
    else:
        cand = np.argpartition(-s, take - 1)[:take]
        cand = cand[np.lexsort((mids[cand], -s[cand]))]
        kth_val = s[cand[-1]]              # the partition boundary
        if len(cand) >= k and s[cand[k - 1]] > kth_val:
            order = cand
        else:                               # boundary tie: exact path
            order = np.lexsort((mids, -s))
    return order


def _expr_topk(queries: DataFrame, corpus: DataFrame, k: int,
               metric: str) -> DataFrame:
    """(src, rank, dst, score): join + fold + one window per src —
    the replayable twin. The query side broadcasts when small (AQE)."""
    q = queries.select(F.col("id").alias("src"), F.col("v").alias("__qv"))
    c = corpus.select(F.col("id").alias("dst"), F.col("v").alias("__cv"))
    scored = (q.join(c, F.col("src") != F.col("dst"))
              .select("src", "dst",
                      _score(metric, F.col("__qv"),
                             F.col("__cv")).alias("score")))
    w = Window.partitionBy("src").orderBy(F.col("score").desc(),
                                          F.col("dst").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("src", "rank", "dst", "score"))


def _arrow_topk(queries: DataFrame, corpus: DataFrame, k: int,
                metric: str, dim: int) -> DataFrame:
    """Broadcast-corpus BLAS kernel: per Arrow batch of queries, one
    Q @ M^T matmul, per-row lexsort((dst_id, -score)) top-k — emits only
    n*k rows, no pair shuffle."""
    import numpy as np
    import pandas as pd

    rows = corpus.collect()
    if len(rows) > ARROW_CORPUS_CAP:
        raise ValueError(
            f"knn_graph(method='arrow') broadcasts the corpus matrix: "
            f"{len(rows)} rows exceeds ARROW_CORPUS_CAP="
            f"{ARROW_CORPUS_CAP}. Use knn_graph_ivf (blocked) at this "
            f"scale.")
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    M = (np.array([r["v"] for r in rows], dtype=np.float64)
         if rows else np.zeros((0, dim), dtype=np.float64))
    sc = corpus.sparkSession.sparkContext
    b_ids, b_m = sc.broadcast(ids), sc.broadcast(M)
    _row_topk = _row_topk_np

    def kernel(batches):
        mids, mat = b_ids.value, b_m.value
        if metric == "cosine":
            mnrm = np.sqrt((mat * mat).sum(axis=1))
        # chunk the matmul so the score block stays ~256 MB regardless
        # of corpus size (the 200k x 200k full matrix would be 320 GB)
        chunk = max(1, (1 << 25) // max(1, len(mids)))
        for pdf in batches:
            if not len(pdf):
                continue
            Qall = np.array(list(pdf["v"]), dtype=np.float64)
            qall = pdf["id"].to_numpy(dtype=np.int64)
            out_src, out_rank, out_dst, out_score = [], [], [], []
            for c0 in range(0, len(qall), chunk):
                Q = Qall[c0:c0 + chunk]
                qid = qall[c0:c0 + chunk]
                S = Q @ mat.T
                if metric == "cosine":
                    qn = np.sqrt((Q * Q).sum(axis=1))
                    den = np.outer(qn, mnrm)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        S = np.where(den > 0, S / den, 0.0)
                for i in range(len(qid)):
                    s = S[i].copy()
                    s[mids == qid[i]] = -np.inf     # self excluded
                    order = _row_topk(s, mids, k)
                    taken = 0
                    for j in order:
                        if not np.isfinite(s[j]):
                            continue
                        taken += 1
                        out_src.append(qid[i])
                        out_rank.append(taken)
                        out_dst.append(mids[j])
                        out_score.append(float(s[j]))
                        if taken == k:
                            break
            yield pd.DataFrame({"src": pd.Series(out_src, dtype="int64"),
                                "rank": pd.Series(out_rank, dtype="int32"),
                                "dst": pd.Series(out_dst, dtype="int64"),
                                "score": pd.Series(out_score,
                                                   dtype="float64")})

    return queries.mapInPandas(
        kernel, "src long, rank int, dst long, score double")


def knn_graph(df: DataFrame, dim: int, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              queries: DataFrame | None = None,
              metric: str = "cosine",
              method: str = "auto") -> DataFrame:
    """Exact k-nearest-neighbour graph: (src, rank, dst, score) for
    every (clean) row of ``queries`` (default: every row of ``df``)
    against the full corpus ``df``, rank 1..k by (score desc, dst asc),
    self excluded. ``dim`` is required — no data probe; dirty rows drop
    on both sides (module docstring). ``method`` picks the physical
    path; ``metric`` is cosine (default) or raw dot product."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, "
                         f"got {metric!r}")
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, "
                         f"got {method!r}")
    corpus = _clean(df, dim, id_col, vec_col)
    qf = corpus if queries is None else _clean(queries, dim, id_col,
                                               vec_col)
    if method == "auto":
        n = df.limit(AUTO_EXPR_ROWS + 1).count()
        method = "expr" if n <= AUTO_EXPR_ROWS else "arrow"
    if method == "expr":
        return _expr_topk(qf, corpus, k, metric)
    if method == "arrow":
        return _arrow_topk(qf, corpus, k, metric, dim)
    # 'both' — the equality gate: exact on integer-quantized vectors.
    # The expr frame is consumed twice (compare + return) — persist it
    # so the pair join + window run once (the dedup._materialized rule)
    from openapc_olap_spark.operators.dedup import _materialized
    a = _arrow_topk(qf, corpus, k, metric, dim)
    e = _materialized(_expr_topk(qf, corpus, k, metric))
    ja = a.select("src", "rank", F.col("dst").alias("__da"),
                  F.col("score").alias("__sa"))
    je = e.select("src", "rank", F.col("dst").alias("__de"),
                  F.col("score").alias("__se"))
    bad = (ja.join(je, ["src", "rank"], "full")
           .filter(F.col("__da").isNull() | F.col("__de").isNull()
                   | (F.col("__da") != F.col("__de"))
                   | (F.abs(F.col("__sa") - F.col("__se"))
                      > F.lit(1e-9) * F.greatest(
                          F.lit(1.0), F.abs(F.col("__sa")),
                          F.abs(F.col("__se")))))
           .count())
    if bad:
        raise AssertionError(
            f"knn_graph arrow/expr mismatch on {bad} (src, rank) "
            f"slot(s) — kernel bug (or real-valued ties; 'both' is "
            f"exact on integer-quantized vectors)")
    return e


def _probe_lists(vec: Column, centroids: list[list[float]],
                 n_probe: int) -> Column:
    """Per-row top-``n_probe`` centroid ids by squared L2, centroid
    index tie-break — the same ordering as
    ``similarity._ivf_probe_ids``, as ONE constant-size expression
    (array_sort on struct<d, c> is lexicographic: distance, then
    index)."""
    cents = F.array(*[_as_double_array(c) for c in centroids])
    scored = F.transform(cents, lambda c, i: F.struct(
        F.aggregate(F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, z: acc + z).alias("d"),
        i.alias("c")))
    return F.slice(F.transform(F.array_sort(scored), lambda st: st["c"]),
                   1, n_probe)


def knn_graph_ivf(df: DataFrame, dim: int, k: int = 10,
                  n_probe: int = 2,
                  centroids: list[list[float]] | None = None,
                  n_centroids: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  queries: DataFrame | None = None,
                  metric: str = "cosine",
                  assign_method: str = "expr",
                  score_method: str = "expr") -> DataFrame:
    """IVF-blocked APPROXIMATE kNN graph — the 100 TB path: score only
    pairs whose assigned centroid is among the query's ``n_probe``
    nearest. Same output contract as :func:`knn_graph`; recall < 1 by
    construction (probe-breadth curve in tests/test_ann_recall.py).
    ``centroids=None`` trains ``n_centroids`` seeded-MLlib centroids on
    the corpus (``similarity.train_ivf_centroids``; at real scale train
    on a sample and pass them in — and size n_centroids ~ n /
    target_list_size: candidate volume is n * list_size * n_probe, so
    too few lists quietly reverts to quadratic work).
    ``assign_method`` forwards to ``similarity.ivf_assign`` ('arrow'
    for full-corpus assignment jobs). ``score_method``:

    - ``"expr"`` — pair join then a JVM cosine fold per candidate row
      + one window top-k (oracle-replayable; the fold is interpreted,
      so past ~10M candidates it dominates);
    - ``"arrow"`` — the fused path (the r07 semdedup Gram-scorer
      lesson): cogroup queries-probing-a-list with the list's members
      and run ONE BLAS Q_l @ M_l^T per list, emitting only each
      query's per-list top-k (argpartition + exact tie fallback); the
      global top-k then merges <= n * n_probe * k candidate rows —
      the full candidate pair set never materializes. Measured 19x at
      sf10 (SCALING.md r09).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, "
                         f"got {metric!r}")
    if score_method not in ("expr", "arrow"):
        raise ValueError(f"score_method must be 'expr' or 'arrow', "
                         f"got {score_method!r}")
    corpus = _clean(df, dim, id_col, vec_col)
    if centroids is None:
        centroids = train_ivf_centroids(corpus, k=n_centroids,
                                        vec_col="v")
    assigned = (ivf_assign(corpus, centroids, vec_col="v",
                           method=assign_method)
                .select(F.col("id").alias("dst"),
                        F.col("v").alias("__cv"), "list_id"))
    qf = corpus if queries is None else _clean(queries, dim, id_col,
                                               vec_col)
    probed = (qf.select(F.col("id").alias("src"),
                        F.col("v").alias("__qv"),
                        F.explode(_probe_lists(
                            F.col("v"), centroids,
                            n_probe)).alias("list_id")))
    if score_method == "arrow":
        scored = _cogroup_scored(probed, assigned, k, metric)
    else:
        scored = (probed.join(assigned, ["list_id"])
                  .filter(F.col("src") != F.col("dst"))
                  .select("src", "dst",
                          _score(metric, F.col("__qv"),
                                 F.col("__cv")).alias("score")))
    w = Window.partitionBy("src").orderBy(F.col("score").desc(),
                                          F.col("dst").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("src", "rank", "dst", "score"))


def _cogroup_scored(probed: DataFrame, assigned: DataFrame, k: int,
                    metric: str) -> DataFrame:
    """(src, dst, score) per-list top-k candidates via ONE BLAS matmul
    per IVF list: cogroup the probing queries with the list members;
    each list contributes at most k candidates per query, which is
    sufficient for the global per-src top-k (the union of per-list
    top-ks contains the global top-k)."""
    import numpy as np
    import pandas as pd

    def score_fn(_key, qpdf, mpdf):
        if not len(qpdf) or not len(mpdf):
            return pd.DataFrame({"src": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        Q = np.array(list(qpdf["__qv"]), dtype=np.float64)
        qids = qpdf["src"].to_numpy(dtype=np.int64)
        M = np.array(list(mpdf["__cv"]), dtype=np.float64)
        mids = mpdf["dst"].to_numpy(dtype=np.int64)
        out_s, out_d, out_v = [], [], []
        chunk = max(1, (1 << 24) // max(1, len(mids)))
        if metric == "cosine":
            mnrm = np.sqrt((M * M).sum(axis=1))
        for c0 in range(0, len(qids), chunk):
            Qc, qc = Q[c0:c0 + chunk], qids[c0:c0 + chunk]
            S = Qc @ M.T
            if metric == "cosine":
                qn = np.sqrt((Qc * Qc).sum(axis=1))
                den = np.outer(qn, mnrm)
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = np.where(den > 0, S / den, 0.0)
            for i in range(len(qc)):
                s = S[i].copy()
                s[mids == qc[i]] = -np.inf        # self excluded
                taken = 0
                for j in _row_topk_np(s, mids, k):
                    if not np.isfinite(s[j]):
                        continue
                    taken += 1
                    out_s.append(qc[i])
                    out_d.append(mids[j])
                    out_v.append(float(s[j]))
                    if taken == k:
                        break
        return pd.DataFrame({"src": pd.Series(out_s, dtype="int64"),
                             "dst": pd.Series(out_d, dtype="int64"),
                             "score": pd.Series(out_v, dtype="float64")})

    return (probed.groupBy("list_id")
            .cogroup(assigned.groupBy("list_id"))
            .applyInPandas(score_fn, "src long, dst long, score double"))
