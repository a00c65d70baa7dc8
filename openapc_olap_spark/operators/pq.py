"""IVF-PQ approximate nearest neighbour: product-quantized candidate
scoring with exact re-rank (SURVEY.md §2.9 X3 family; VERDICT r09 #4 —
the scale rung past IVF-flat, whose probed lists still read full float
vectors: at 1B x 768d the vector BYTES are the bottleneck, and PQ codes
are m bytes/vector instead of 8*d).

Pipeline (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search" — IVFADC):

1. **Coarse quantizer**: every vector joins the IVF list of its
   nearest coarse centroid (squared-L2 argmin, ties to the smaller
   list id).
2. **Residual PQ encode**: the residual r = v - c_list is split into
   ``m`` subspaces of dim/m dims; each subspace is quantized to the
   nearest of ``ksub`` sub-centroids — the vector is stored as m small
   codes. The codes table is what candidate scoring READS; full
   vectors are touched only by the re-rank.
3. **ADC candidate scoring**: a query probing a list scores every
   member as  dot(q, c_list) + sum_m dot(q_sub_m, pqc[m][code_m]) —
   exact dot against the RECONSTRUCTED vector, computed from codes
   alone (the classic asymmetric-distance lookup; the arrow kernel
   materializes the per-query LUT Q_sub @ pqc[m]^T once per list).
4. **Exact re-rank**: the top ``rerank`` candidates per query by
   approximate score fetch their full vectors (an id equi-join — the
   only full-vector read) and the final top-k is exact-dot ranked.

Two scorers behind one output contract (src, rank, dst, score), rank
1..k by (exact score desc, dst asc):

- ``"expr"`` — oracle-replayable: assignment, codes, probe, ADC and
  re-rank are all Catalyst expressions (built as single-parse SQL
  strings — the unigram r10 lesson); DuckDB replays them with
  list_dot_product / slices. On integer-quantized vectors
  (floor(x*1000+0.5), the x87/x89 gate discipline) every distance and
  score is an exact integer < 2^53, so argmins, ties, and digests are
  bitwise reproducible on any engine in any order.
- ``"arrow"`` — the production scorer: cogroup queries-probing-a-list
  with the list's CODES, one LUT build + gather per list (numpy), per
  list top-``rerank`` per query; the shared exact re-rank then runs on
  the candidate sliver. The full-vector table never rides the probe
  join.
- ``"both"`` — runs both scorers, asserts the post-top-``rerank``
  candidate sets identical (src, dst, approx), returns the expr frame
  (the x87/x35 self-certification pattern).

Deterministic "training" for certification: ``coarse=None`` /
``pq_cents=None`` take the FIRST n_lists (resp. ksub) corpus vectors
by id — the x17/x53 trick that lets a SQL oracle replicate training
instead of assuming KMeans. Production passes centroids trained by
operators/kmeans (coarse) and per-subspace variants thereof.

Dirty rows are dropped by the shared ``pca.clean_vectors`` prefilter
(one contract across the embedding-operator family, ADVICE r08).

Scale notes (measured at sf10 in SCALING.md r10): candidate volume is
n * list_size * n_probe like IVF-flat, but the probe join carries
m-byte codes instead of d*8-byte vectors; re-rank reads rerank * |Q|
full vectors. n_lists ~ n / target_list_size, rerank a small multiple
of k (recall curve in tests/test_ann_recall.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators.pca import clean_vectors


def _clean(df: DataFrame, dim: int, id_col: str,
           vec_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return (df.filter(clean_vectors(v, dim))
            .select(F.col(id_col).alias("id"), v.alias("v")))


def _arr(vals: list[float]) -> str:
    """SQL double-array literal (repr round-trips IEEE doubles
    exactly)."""
    return "array(" + ", ".join(f"CAST('{v!r}' AS DOUBLE)"
                                for v in vals) + ")"


def _arr2(tab: list[list[float]]) -> str:
    return "array(" + ", ".join(_arr(v) for v in tab) + ")"


def _arr3(tab: list[list[list[float]]]) -> str:
    return "array(" + ", ".join(_arr2(t) for t in tab) + ")"


def _ssq(vexpr: str, arr_sql: str) -> str:
    return (f"aggregate(zip_with({vexpr}, {arr_sql}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (s, t) -> s + t)")


def _dot(vexpr: str, other: str) -> str:
    return (f"aggregate(zip_with({vexpr}, {other}, (x, y) -> x * y), "
            f"0.0D, (s, t) -> s + t)")


def first_n_vectors(corpus: DataFrame, n: int) -> list[list[float]]:
    """The deterministic-training helper: the first ``n`` clean vectors
    by id, as plain lists (the x17/x53 oracle-replicable centroid
    choice)."""
    return [[float(x) for x in r["v"]]
            for r in corpus.orderBy("id").limit(n).collect()]


def train_pq_cents(corpus_first: list[list[float]],
                   coarse: list[list[float]],
                   m: int) -> list[list[list[float]]]:
    """Deterministic residual sub-centroids: assign each seed vector to
    its coarse list (squared-L2 argmin, ties to the smaller id — pure
    Python over <= ksub vectors, replayed by the oracle), take its
    residual, and slice into ``m`` subspaces. Returns pqc[m][c] =
    seed c's m-th residual subvector. Production would Lloyd-refine
    per subspace (operators/kmeans) and pass the result in."""
    dim = len(coarse[0])
    dsub = dim // m
    out: list[list[list[float]]] = [[] for _ in range(m)]
    for v in corpus_first:
        best = min(range(len(coarse)),
                   key=lambda li: (sum((v[j] - coarse[li][j]) ** 2
                                       for j in range(dim)), li))
        r = [v[j] - coarse[best][j] for j in range(dim)]
        for mm in range(m):
            out[mm].append(r[mm * dsub:(mm + 1) * dsub])
    return out


def train_pq_cents_lloyd(df: DataFrame, coarse: list[list[float]],
                         m: int, ksub: int = 16, n_iter: int = 3,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding"
                         ) -> list[list[list[float]]]:
    """Production PQ training: per subspace, Lloyd-refine ``ksub``
    sub-centroids over the corpus residuals (operators/kmeans, seeded
    with the deterministic first-``ksub`` residuals so refinement only
    improves on the certifiable baseline). A driver loop at MODEL grain
    — m kmeans runs of ksub x (dim/m) floats; at real scale train on a
    sample and pass the result into :func:`ivf_pq_topk`. The recall
    gain over the unrefined seeds is measured in
    tests/test_ann_recall.py."""
    from openapc_olap_spark.operators.dedup import _materialized
    from openapc_olap_spark.operators.kmeans import kmeans_fit
    from openapc_olap_spark.operators.similarity import ivf_assign

    dim = len(coarse[0])
    dsub = dim // m
    corpus = _clean(df, dim, id_col, vec_col)
    coarsetab = _arr2(coarse)
    # arrow assignment + MATERIALIZED residuals: the m kmeans runs make
    # m * n_iter passes over this frame, and an interpreted per-row
    # argmin over hundreds of centroid structs re-executed per pass
    # dominated the whole trainer (sf10 r10 profile: 159 s -> the fix)
    resid = _materialized(
        ivf_assign(corpus, coarse, vec_col="v", method="arrow")
        .select("id", F.expr(
            f"zip_with(v, element_at({coarsetab}, list_id + 1), "
            f"(x, y) -> x - y)").alias("r")))
    seeds = train_pq_cents(first_n_vectors(corpus, ksub), coarse, m)
    out = []
    try:
        for mm in range(m):
            sub = resid.select(
                "id", F.expr(f"slice(r, {mm * dsub + 1}, {dsub})")
                .alias("rsub"))
            out.append(kmeans_fit(sub, k=ksub, n_iter=n_iter,
                                  vec_col="rsub", id_col="id",
                                  init=seeds[mm], assign="arrow"))
    finally:
        resid.unpersist()
    return out


def pq_codes(corpus: DataFrame, coarse: list[list[float]],
             pq_cents: list[list[list[float]]],
             method: str = "expr") -> DataFrame:
    """(id, list_id, codes): coarse assignment + residual PQ codes for
    every clean corpus vector — the m-byte-per-vector index the
    candidate stage reads. ``corpus`` must be the (id, v) frame from
    the shared clean prefilter.

    ``method="expr"`` is the oracle-replayable Catalyst path — fine at
    gate dials, but its per-row argmin over n_lists struct candidates
    is interpreted HOF work: at production list counts (hundreds+) use
    ``"arrow"``, one batched matmul argmin per Arrow batch. On
    integer-quantized vectors both paths are bitwise identical:
    distances are exact integers and np.argmin's first-occurrence tie
    rule equals array_min's (d, i) struct order."""
    m, ksub = len(pq_cents), len(pq_cents[0])
    dim = len(coarse[0])
    dsub = dim // m
    if method == "arrow":
        return _pq_codes_arrow(corpus, coarse, pq_cents, dsub)
    if method != "expr":
        raise ValueError(f"method must be 'expr' or 'arrow', "
                         f"got {method!r}")
    cands = "array(" + ", ".join(
        f"named_struct('d', {_ssq('v', _arr(c))}, 'i', {li})"
        for li, c in enumerate(coarse)) + ")"
    assign = f"array_min({cands}).i"
    coarsetab = _arr2(coarse)
    resid = (f"zip_with(v, element_at({coarsetab}, list_id + 1), "
             f"(x, y) -> x - y)")
    code_exprs = []
    for mm in range(m):
        sub = f"slice(__r, {mm * dsub + 1}, {dsub})"
        cc = "array(" + ", ".join(
            f"named_struct('d', {_ssq(sub, _arr(pq_cents[mm][c]))}, "
            f"'i', {c})" for c in range(ksub)) + ")"
        code_exprs.append(f"array_min({cc}).i")
    codes = "array(" + ", ".join(code_exprs) + ")"
    return (corpus
            .select("id", "v", F.expr(assign).alias("list_id"))
            .select("id", "v", "list_id", F.expr(resid).alias("__r"))
            .select("id", "list_id", F.expr(codes).alias("codes")))


def _pq_codes_arrow(corpus: DataFrame, coarse: list[list[float]],
                    pq_cents: list[list[list[float]]],
                    dsub: int) -> DataFrame:
    """Batched encode kernel: per Arrow batch, coarse argmin by one
    V @ C^T matmul (||v-c||^2 = vv - 2vc + cc), residuals, then one
    small matmul argmin per subspace."""
    import numpy as np
    import pandas as pd

    carr = np.array(coarse, dtype=np.float64)
    parr = np.array(pq_cents, dtype=np.float64)     # m x ksub x dsub
    m = parr.shape[0]
    cc = (carr * carr).sum(axis=1)
    pp = (parr * parr).sum(axis=2)                  # m x ksub

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["v"]), dtype=np.float64)
            d2 = cc[None, :] - 2.0 * (V @ carr.T)   # + vv omitted:
            lid = np.argmin(d2, axis=1)             # constant per row
            R = V - carr[lid]
            codes = np.empty((len(V), m), dtype=np.int64)
            for mm in range(m):
                Rs = R[:, mm * dsub:(mm + 1) * dsub]
                sd = pp[mm][None, :] - 2.0 * (Rs @ parr[mm].T)
                codes[:, mm] = np.argmin(sd, axis=1)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(dtype=np.int64),
                "list_id": lid.astype(np.int32),
                "codes": list(codes.astype(np.int32))})

    # schema matches the expr path exactly (list_id/codes int) so the
    # probe cogroup keys and element_at index types line up
    return corpus.mapInPandas(kernel,
                              "id long, list_id int, "
                              "codes array<int>")


def _probe(coarse: list[list[float]], n_probe: int) -> str:
    cands = "array(" + ", ".join(
        f"named_struct('d', {_ssq('__qv', _arr(c))}, 'i', {li})"
        for li, c in enumerate(coarse)) + ")"
    return (f"transform(slice(array_sort({cands}), 1, {n_probe}), "
            f"s -> s.i)")


def _adc(coarse: list[list[float]],
         pq_cents: list[list[list[float]]]) -> str:
    """approx = dot(q, c_list) + sum_m dot(q_sub_m, pqc[m][code_m]) —
    the asymmetric-distance score against the reconstructed vector."""
    m, _ = len(pq_cents), len(pq_cents[0])
    dim = len(coarse[0])
    dsub = dim // m
    coarse_dot = _dot("__qv", f"element_at({_arr2(coarse)}, list_id + 1)")
    pqtab = _arr3(pq_cents)
    sub_dot = (f"aggregate(sequence(1, {dsub}), 0.0D, (a, j) -> "
               f"a + element_at(__qv, (mm - 1) * {dsub} + j) * "
               f"element_at(element_at(element_at({pqtab}, mm), "
               f"element_at(codes, mm) + 1), j))")
    return (f"({coarse_dot}) + aggregate(sequence(1, {m}), 0.0D, "
            f"(acc, mm) -> acc + ({sub_dot}))")


def _arrow_candidates(probed: DataFrame, codes_df: DataFrame,
                      coarse: list[list[float]],
                      pq_cents: list[list[list[float]]],
                      rerank: int) -> DataFrame:
    """Per-list LUT scorer: cogroup queries probing a list with the
    list's CODES, build LUT[m] = Q_sub_m @ pqc[m]^T once per
    (list, query-batch), gather by code, emit per-list top-``rerank``
    per query (the union over probed lists contains the global
    top-rerank)."""
    import numpy as np
    import pandas as pd

    from openapc_olap_spark.operators.knn import _row_topk_np

    carr = np.array(coarse, dtype=np.float64)
    parr = np.array(pq_cents, dtype=np.float64)     # m x ksub x dsub
    m, _, dsub = parr.shape

    def score_fn(key, qpdf, mpdf):
        if not len(qpdf) or not len(mpdf):
            return pd.DataFrame({"src": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="int64"),
                                 "approx": pd.Series(dtype="float64")})
        lid = int(key[0])
        Q = np.array(list(qpdf["__qv"]), dtype=np.float64)
        qids = qpdf["src"].to_numpy(dtype=np.int64)
        codes = np.array(list(mpdf["codes"]), dtype=np.int64)
        mids = mpdf["id"].to_numpy(dtype=np.int64)
        base = Q @ carr[lid]                         # nq
        S = np.tile(base[:, None], (1, len(mids)))
        for mm in range(m):
            lut = Q[:, mm * dsub:(mm + 1) * dsub] @ parr[mm].T
            S += lut[:, codes[:, mm]]
        out_s, out_d, out_v = [], [], []
        for i in range(len(qids)):
            s = S[i].copy()
            s[mids == qids[i]] = -np.inf             # self excluded
            taken = 0
            for j in _row_topk_np(s, mids, rerank):
                if not np.isfinite(s[j]):
                    continue
                out_s.append(qids[i])
                out_d.append(mids[j])
                out_v.append(float(s[j]))
                taken += 1
                if taken == rerank:
                    break
        return pd.DataFrame({"src": pd.Series(out_s, dtype="int64"),
                             "dst": pd.Series(out_d, dtype="int64"),
                             "approx": pd.Series(out_v,
                                                 dtype="float64")})

    return (probed.groupBy("list_id")
            .cogroup(codes_df.groupBy("list_id"))
            .applyInPandas(score_fn,
                           "src long, dst long, approx double"))


def write_pq_index(df: DataFrame, path: str,
                   coarse: list[list[float]],
                   pq_cents: list[list[list[float]]],
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   encode_method: str = "arrow") -> None:
    """Materialize the IVF-PQ index — the serving twin of
    ``similarity.write_ivf_index`` with the PQ byte story carried to
    STORAGE: ``<path>/codes`` (the m-codes table) and
    ``<path>/vectors`` (full vectors, touched only by re-rank) are both
    written partitioned by ``list_id``, and ``<path>/pq_meta.json``
    carries the centroids. A probe then reads only the nprobe nearest
    lists' CODE partitions (~nprobe/k of m bytes/vector), and the
    re-rank reads the same lists' vector partitions filtered to the
    candidate ids — storage-level pruning on both stages."""
    import json
    import os

    dim = len(coarse[0])
    corpus = _clean(df, dim, id_col, vec_col)
    codes = pq_codes(corpus, coarse, pq_cents, method=encode_method)
    codes.write.mode("overwrite").partitionBy("list_id") \
        .parquet(f"{path}/codes")
    (corpus.join(codes.select("id", "list_id"), ["id"])
     .write.mode("overwrite").partitionBy("list_id")
     .parquet(f"{path}/vectors"))
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/pq_meta.json", "w") as fh:
        json.dump({"coarse": coarse, "pq_cents": pq_cents}, fh)


def pq_index_topk(spark, path: str, query_vec: list[float],
                  k: int = 10, n_probe: int = 2,
                  rerank: int | None = None,
                  exclude_id: int | None = None) -> DataFrame:
    """Top-k for ONE query against a written PQ index: probe lists are
    ranked driver-side (the centroid table is tiny), the ``list_id``
    IN-predicate prunes partitions before any IO on BOTH the codes scan
    (ADC candidates) and the vectors scan (exact re-rank of the top
    ``rerank``). Results match ``ivf_pq_topk`` at the same dials for a
    NON-corpus query vector; for a query that IS a corpus member the
    served set includes the self row unless its id is passed as
    ``exclude_id`` (ivf_pq_topk's batch path always drops src==dst)."""
    import json

    from openapc_olap_spark.operators.similarity import _ivf_probe_ids

    with open(f"{path}/pq_meta.json") as fh:
        meta = json.load(fh)
    coarse, pq_cents = meta["coarse"], meta["pq_cents"]
    m = len(pq_cents)
    dim = len(coarse[0])
    dsub = dim // m
    rerank = 3 * k if rerank is None else rerank
    probes = _ivf_probe_ids(coarse, query_vec, n_probe)
    codes = (spark.read.parquet(f"{path}/codes")
             .filter(F.col("list_id").isin(probes)))
    if exclude_id is not None:
        codes = codes.filter(F.col("id") != F.lit(exclude_id))
    # per-(m, code) ADC lookup values for THIS query, as one literal
    lut = [[sum(query_vec[mm * dsub + j] * pq_cents[mm][c][j]
                for j in range(dsub))
            for c in range(len(pq_cents[mm]))]
           for mm in range(m)]
    cdots = [sum(query_vec[j] * coarse[li][j] for j in range(dim))
             for li in range(len(coarse))]
    approx = (f"element_at({_arr(cdots)}, list_id + 1) + " +
              " + ".join(
                  f"element_at({_arr(lut[mm])}, "
                  f"element_at(codes, {mm + 1}) + 1)"
                  for mm in range(m)))
    cands = (codes.select("id", "list_id",
                          F.expr(approx).alias("approx"))
             .orderBy(F.col("approx").desc(), F.col("id").asc())
             .limit(rerank))
    vecs = (spark.read.parquet(f"{path}/vectors")
            .filter(F.col("list_id").isin(probes))
            .select("id", "v"))
    qlit = _arr([float(x) for x in query_vec])
    exact = (cands.select("id").join(vecs, ["id"])
             .select("id", F.expr(_dot("v", qlit)).alias("score")))
    return (exact.orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(k))


def train_pq_rotation(df: DataFrame, dim: int, m: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> list[list[float]]:
    """OPQ-style rotation by eigenvalue allocation (the parametric
    variant of Ge et al. 2013, "Optimized Product Quantization"): PCA
    eigenbasis + greedy balanced assignment of eigen-directions to the
    ``m`` subspaces by descending eigenvalue on log-variance load — so
    every subspace carries comparable energy and no single subspace's
    quantizer is asked to encode most of the signal. Returns R as d
    rows (output dim i = dot(R[i], v)); R is orthogonal, so
    dot(Rq, Rv) == dot(q, v) — rotating corpus AND queries leaves
    exact scores, ranks, and the re-rank untouched while ADC
    quantization error drops wherever variance was unevenly spread
    (measured at 768d in SCALING.md r11). Train on a sample at real
    scale; persist alongside pq_meta.json."""
    import math

    from openapc_olap_spark.operators.pca import (covariance_matrix,
                                                  principal_components)

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    cov, _mean, _n = covariance_matrix(df, dim, vec_col=vec_col,
                                       id_col=id_col)
    comps, eigs = principal_components(cov, dim)
    dsub = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = [0.0] * m
    # Layer-wise greedy (round 12 fix): candidates are ONLY the free
    # buckets with the minimum fill count, largest remaining eigenvalue
    # to the lightest of them. Comparing equal-count buckets makes the
    # allocation SCALE-INVARIANT; the r11 version compared buckets of
    # unequal fill, and for eigenvalues < 1 (log < 0) the bucket that
    # had just received a direction became the lightest and swallowed
    # everything — all the signal of a low-rank corpus collapsed into
    # subspace 0 (anti-balanced, measured in SCALING.md r12).
    for ci, ev in enumerate(eigs):          # descending eigenvalue
        free = [b for b in range(m) if len(buckets[b]) < dsub]
        lowest = min(len(buckets[b]) for b in free)
        layer = [b for b in free if len(buckets[b]) == lowest]
        b = min(layer, key=lambda x: (load[x], x))
        buckets[b].append(ci)
        load[b] += math.log(max(ev, 1e-12))
    return [comps[ci] for b in buckets for ci in b]


def apply_rotation(df: DataFrame, rotation: list[list[float]],
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   method: str = "arrow") -> DataFrame:
    """(id_col, vec_col) with vec_col replaced by R @ v. ``"arrow"``
    is one V @ R^T matmul per batch (production); ``"expr"`` is
    pca.project's dimension-ascending expression folds
    (oracle-replayable at gate dims)."""
    dim = len(rotation)
    if method == "expr":
        from openapc_olap_spark.operators.pca import project
        return (project(df, rotation, mean=None, vec_col=vec_col,
                        out_col="__rot")
                .select(id_col, F.col("__rot").alias(vec_col)))
    if method != "arrow":
        raise ValueError(f"method must be 'expr' or 'arrow', "
                         f"got {method!r}")
    import numpy as np
    import pandas as pd

    R = np.asarray(rotation, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            out = V @ R.T
            yield pd.DataFrame({id_col: pdf[id_col],
                                vec_col: list(out)})

    cleaned = _clean(df, dim, id_col, vec_col) \
        .select(F.col("id").alias(id_col), F.col("v").alias(vec_col))
    return cleaned.mapInPandas(
        kernel, f"{id_col} long, {vec_col} array<double>")


def create_pq_txn_index(spark, path: str, df: DataFrame,
                        coarse: list[list[float]],
                        pq_cents: list[list[list[float]]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        encode_method: str = "arrow") -> None:
    """Transactional twin of :func:`write_pq_index` (VERDICT r10 #6 —
    the ANN sibling of incremental dedup): ``<path>/codes`` and
    ``<path>/vectors`` are TxnTables partitioned by ``list_id``, so a
    crawl's embedding batch lands as a partition-scoped commit
    (:func:`upsert_pq_txn_index`) instead of a full index rewrite, and
    serving (:func:`pq_txn_topk`) prunes at the MANIFEST level — the
    probe opens exactly the probed lists' files, no directory listing.
    Both tables carry a ``seq`` column (the crawl sequence) for
    last-wins replay idempotence. Centroids are fixed at creation time
    (pq_meta.json); maintenance re-encodes only the update batch
    against them."""
    import json
    import os

    from openapc_olap_spark.sources.txn import TxnTable

    from openapc_olap_spark.operators.dedup import _materialized

    dim = len(coarse[0])
    corpus = _clean(df, dim, id_col, vec_col)
    # the codes frame is consumed twice (its own store's write AND the
    # vectors store's list_id-attach join) and its evaluation IS the
    # whole encode kernel — cache it or the corpus encodes twice
    # (round 14, the dedup._materialized signature-frame rule)
    codes = _materialized(
        pq_codes(corpus, coarse, pq_cents, method=encode_method)
        .withColumn("seq", F.lit(0).cast("long")))
    os.makedirs(path, exist_ok=True)
    try:
        TxnTable.create(spark, f"{path}/codes", codes, "list_id",
                        meta={"kind": "pq_codes"})
        vecs = (corpus.join(codes.select("id", "list_id"), ["id"])
                .withColumn("seq", F.lit(0).cast("long")))
        TxnTable.create(spark, f"{path}/vectors", vecs, "list_id",
                        meta={"kind": "pq_vectors"})
    finally:
        # unpersist on any exit (ADVICE r14's upsert gap, same shape
        # here): a failed create must not leak the cached encode
        codes.unpersist()
    with open(f"{path}/pq_meta.json", "w") as fh:
        json.dump({"coarse": coarse, "pq_cents": pq_cents}, fh)


def upsert_pq_txn_index(spark, path: str, updates: DataFrame,
                        seq: int, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        encode_method: str = "arrow") -> tuple[int, int]:
    """Commit an embedding batch into a :func:`create_pq_txn_index`
    index: ONLY the batch is re-encoded (the zero-shuffle pq_codes
    path) against the creation-time centroids, then both stores take a
    TxnTable.upsert_moving keyed on id — partition-scoped rewrites of
    the touched lists plus any list a re-embedded id moved OUT of;
    untouched lists' files re-link. Replay with the same ``seq`` is
    idempotent (last-wins merge re-derives the identical rows).
    Returns the (codes, vectors) new versions."""
    import json

    from openapc_olap_spark.sources.txn import TxnTable

    from openapc_olap_spark.operators.dedup import _materialized

    with open(f"{path}/pq_meta.json") as fh:
        meta = json.load(fh)
    coarse, pq_cents = meta["coarse"], meta["pq_cents"]
    dim = len(coarse[0])
    batch = _clean(updates, dim, id_col, vec_col)
    # upsert_moving evaluates its updates frame several times (touched-
    # set probe, survivor anti-join, last-wins merge) and the codes
    # frame's evaluation IS the whole encode kernel — without the cache
    # each batch re-encoded ~4x across the two stores' commits (round
    # 14, measured in plans/r14/x94_*; the vectors frame rides the same
    # cache through its join)
    codes = _materialized(
        pq_codes(batch, coarse, pq_cents, method=encode_method)
        .withColumn("seq", F.lit(seq).cast("long")))
    ct = TxnTable(spark, f"{path}/codes", "list_id")
    vecs = _materialized(
        batch.join(codes.select("id", "list_id"), ["id"])
        .withColumn("seq", F.lit(seq).cast("long")))
    vt = TxnTable(spark, f"{path}/vectors", "list_id")
    # Both sides derive from the one cached encode; the stores are
    # independent (disjoint dirs, UUID-staged writes, atomic renames)
    # and each upsert_moving replays idempotently on the same seq, so
    # the two commits overlap from two driver threads (guide §2.6).
    # Mid-replay the stores could already diverge transiently in the
    # serial order's crash window (codes new / vectors old); overlap
    # only adds the mirror window, repaired by the same replay.
    from concurrent.futures import ThreadPoolExecutor

    # try/finally (ADVICE r14): if either upsert raises — e.g.
    # CommitConflict after retries — both MEMORY_AND_DISK caches still
    # unpersist instead of leaking until GC. A raised exception may
    # leave exactly ONE store committed (either order: the commits
    # overlap); replaying the same ``seq`` is the documented recovery,
    # identical to the crash window.
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            fc = pool.submit(ct.upsert_moving, codes, ["id"], "seq")
            fv = pool.submit(vt.upsert_moving, vecs, ["id"], "seq")
            vc, vv = fc.result(), fv.result()
    finally:
        codes.unpersist()
        vecs.unpersist()
    return vc, vv


def pq_txn_topk(spark, path: str, query_vec: list[float],
                k: int = 10, n_probe: int = 2,
                rerank: int | None = None,
                exclude_id: int | None = None) -> DataFrame:
    """:func:`pq_index_topk` against the transactional index: the
    probed lists prune at the MANIFEST level (TxnTable.read names the
    exact files — no directory listing, no footer reads outside the
    probed lists) on BOTH the codes scan and the re-rank's vector
    scan. Same self-row semantics as pq_index_topk (pass
    ``exclude_id`` for corpus-member queries)."""
    import json

    from openapc_olap_spark.operators.similarity import _ivf_probe_ids
    from openapc_olap_spark.sources.txn import TxnTable

    with open(f"{path}/pq_meta.json") as fh:
        meta = json.load(fh)
    coarse, pq_cents = meta["coarse"], meta["pq_cents"]
    m = len(pq_cents)
    dim = len(coarse[0])
    dsub = dim // m
    rerank = 3 * k if rerank is None else rerank
    probes = _ivf_probe_ids(coarse, query_vec, n_probe)
    codes = TxnTable(spark, f"{path}/codes", "list_id") \
        .read(partitions=probes).select("id", "list_id", "codes")
    if exclude_id is not None:
        codes = codes.filter(F.col("id") != F.lit(exclude_id))
    lut = [[sum(query_vec[mm * dsub + j] * pq_cents[mm][c][j]
                for j in range(dsub))
            for c in range(len(pq_cents[mm]))]
           for mm in range(m)]
    cdots = [sum(query_vec[j] * coarse[li][j] for j in range(dim))
             for li in range(len(coarse))]
    approx = (f"element_at({_arr(cdots)}, list_id + 1) + " +
              " + ".join(
                  f"element_at({_arr(lut[mm])}, "
                  f"element_at(codes, {mm + 1}) + 1)"
                  for mm in range(m)))
    cands = (codes.select("id", "list_id",
                          F.expr(approx).alias("approx"))
             .orderBy(F.col("approx").desc(), F.col("id").asc())
             .limit(rerank))
    vecs = TxnTable(spark, f"{path}/vectors", "list_id") \
        .read(partitions=probes).select("id", "v")
    qlit = _arr([float(x) for x in query_vec])
    exact = (cands.select("id").join(vecs, ["id"])
             .select("id", F.expr(_dot("v", qlit)).alias("score")))
    return (exact.orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(k))


def ivf_pq_topk(df: DataFrame, dim: int, k: int = 10, m: int = 8,
                n_probe: int = 2, rerank: int | None = None,
                coarse: list[list[float]] | None = None,
                pq_cents: list[list[list[float]]] | None = None,
                n_lists: int = 8, ksub: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                queries: DataFrame | None = None,
                method: str = "expr",
                encode_method: str = "expr") -> DataFrame:
    """IVF-PQ top-k (dot metric): PQ-coded ADC candidate generation
    over the probed lists, exact-dot re-rank of the top ``rerank``
    candidates per query (default 3*k). Output contract matches
    knn.knn_graph: (src, rank, dst, score), rank 1..k by
    (exact score desc, dst asc). See the module docstring for the
    expr / arrow / both scorer semantics."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if k < 1 or n_probe < 1:
        raise ValueError("k and n_probe must be >= 1")
    if method not in ("expr", "arrow", "both"):
        raise ValueError(f"method must be 'expr', 'arrow' or 'both', "
                         f"got {method!r}")
    rerank = 3 * k if rerank is None else rerank
    if rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    corpus = _clean(df, dim, id_col, vec_col)
    if coarse is None:
        coarse = first_n_vectors(corpus, n_lists)
    if pq_cents is None:
        pq_cents = train_pq_cents(first_n_vectors(corpus, ksub),
                                  coarse, m)
    codes_df = pq_codes(corpus, coarse, pq_cents, method=encode_method)
    qf = corpus if queries is None else _clean(queries, dim, id_col,
                                               vec_col)
    return _topk_from_codes(codes_df, corpus, qf, coarse, pq_cents,
                            k, n_probe, rerank, method)


def _topk_from_codes(codes_df: DataFrame, corpus: DataFrame,
                     qf: DataFrame, coarse: list[list[float]],
                     pq_cents: list[list[list[float]]],
                     k: int, n_probe: int, rerank: int,
                     method: str) -> DataFrame:
    """The shared IVF-PQ serving core: ADC candidates over probed
    lists from an (id, list_id, codes) frame, exact-dot re-rank
    against the (id, v) corpus frame. Called by ivf_pq_topk (codes
    freshly encoded) and pq_txn_topk_batch (codes read from the
    transactional index — no re-encode)."""
    probed = (qf.select(F.col("id").alias("src"),
                        F.col("v").alias("__qv"))
              .select("src", "__qv",
                      F.explode(F.expr(_probe(coarse, n_probe)))
                      .alias("list_id")))
    wc = Window.partitionBy("src").orderBy(F.col("approx").desc(),
                                           F.col("dst").asc())

    def expr_cands() -> DataFrame:
        pairs = (probed.join(codes_df, ["list_id"])
                 .filter(F.col("src") != F.col("id"))
                 .select("src", "__qv", "list_id",
                         F.col("id").alias("dst"), "codes"))
        return (pairs
                .select("src", "__qv", "dst",
                        F.expr(_adc(coarse, pq_cents)).alias("approx"))
                .withColumn("__cr", F.row_number().over(wc))
                .filter(F.col("__cr") <= rerank)
                .select("src", "dst", "approx"))

    def arrow_cands() -> DataFrame:
        per_list = _arrow_candidates(probed, codes_df, coarse,
                                     pq_cents, rerank)
        return (per_list.withColumn("__cr", F.row_number().over(wc))
                .filter(F.col("__cr") <= rerank)
                .select("src", "dst", "approx"))

    if method == "expr":
        cands = expr_cands()
    elif method == "arrow":
        cands = arrow_cands()
    else:
        from openapc_olap_spark.operators.dedup import _materialized
        ce = _materialized(expr_cands())
        ca = arrow_cands()
        diff = (ce.alias("e").join(
                    ca.alias("a"),
                    ["src", "dst", "approx"], "full")
                .filter(F.col("e.src").isNull()
                        | F.col("a.src").isNull())
                .count())
        if diff:
            raise AssertionError(
                f"ivf_pq expr/arrow candidate mismatch on {diff} "
                f"row(s) — kernel bug, not data")
        cands = ce
    # shared exact re-rank: the ONLY full-vector read
    qv = qf.select(F.col("id").alias("src"), F.col("v").alias("__qv"))
    cv = corpus.select(F.col("id").alias("dst"),
                       F.col("v").alias("__cv"))
    exact = (cands.join(qv, ["src"]).join(cv, ["dst"])
             .select("src", "dst",
                     F.expr(_dot("__qv", "__cv")).alias("score")))
    wk = Window.partitionBy("src").orderBy(F.col("score").desc(),
                                           F.col("dst").asc())
    return (exact.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("src", "rank", "dst", "score"))


def pq_txn_topk_batch(spark, path: str, queries: DataFrame,
                      k: int = 10, n_probe: int = 2,
                      rerank: int | None = None,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      method: str = "arrow") -> DataFrame:
    """Batch top-k against the TRANSACTIONAL index: the stored codes
    serve the ADC stage directly (no corpus re-encode — the point of
    maintaining the index), the stored vectors serve only the re-rank
    sliver. Output contract matches ivf_pq_topk: (src, rank, dst,
    score), self rows dropped when a query id equals a corpus id. For
    a LARGE query batch every list is probed by someone, so the codes
    store is read whole (one manifest-driven scan of m-byte codes);
    single-query lookups should use :func:`pq_txn_topk`, which prunes
    the manifest to the probed lists."""
    import json

    from openapc_olap_spark.sources.txn import TxnTable

    with open(f"{path}/pq_meta.json") as fh:
        meta = json.load(fh)
    coarse, pq_cents = meta["coarse"], meta["pq_cents"]
    dim = len(coarse[0])
    rerank = 3 * k if rerank is None else rerank
    if rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    codes_df = TxnTable(spark, f"{path}/codes", "list_id") \
        .read().select("id", "list_id", "codes")
    corpus = TxnTable(spark, f"{path}/vectors", "list_id") \
        .read().select("id", "v")
    qf = _clean(queries, dim, id_col, vec_col)
    return _topk_from_codes(codes_df, corpus, qf, coarse, pq_cents,
                            k, n_probe, rerank, method)
