"""Vector similarity search over embedding columns (SURVEY.md §2.9 X3).

Primitives are higher-order array functions (zip_with + aggregate) — the dot
product never leaves the JVM. Two search paths:

- brute-force top-k against a literal query vector: one scan, no shuffle,
  TakeOrderedAndProject for the top-k — the exact baseline;
- random-hyperplane LSH bucketing for ANN at scale: signature = packed sign
  bits of ``nbits`` fixed random projections; search probes only matching
  (or near-matching) buckets, turning a 100 TB scan into a bucket-pruned
  fraction. Bucket ids are plain columns, so the bucketed table can be
  written partitioned/bucketed by signature for storage-level pruning.

Embedding near-dup (X2's cosine variant) composes the same pieces:
bucket-join then exact cosine verify.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators._memo import memoized


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn > 0, d / nn).otherwise(F.lit(0.0))


def _as_double_array(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def brute_force_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of ``query_vec`` over the embedding column.

    Plan shape: project(sim) -> TakeOrderedAndProject(k) — a single pass,
    partial top-k per partition, no full sort, no shuffle of the data.
    Ties broken by id for determinism.
    """
    q = _as_double_array(query_vec)
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (df.select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


# --------------------------------------------------------------------------
# Random-hyperplane LSH (the ANN scale path)
# --------------------------------------------------------------------------

def random_hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-Gaussian projection vectors."""
    rng = random.Random(seed)
    planes = []
    for _ in range(nbits):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_signature(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Packed sign-bit signature (bigint) of the projections — the LSH
    bucket id. Same-bucket vectors are likely high-cosine (SRP-LSH)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    c = c.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(c, _as_double_array(p)) >= 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


# Built signature Columns memoized per (vec_col, dim, nbits, seed): the
# nbits x dim literal-array construction is hundreds of py4j round-trips
# (~0.8 s driver time per call under load); unresolved Columns are
# immutable and bind at select-time, so reuse across frames is safe. The
# memo is gateway-scoped (operators._memo) so a JVM restart invalidates it.
_SIG_MEMO: dict = {}


def lsh_bucketize(df: DataFrame, nbits: int = 8, vec_col: str = "embedding",
                  dim: int = 0, seed: int = 42) -> DataFrame:
    """Attach the LSH ``bucket`` column. ``dim`` (the embedding length)
    is REQUIRED — inferring it from the first row would be a hidden
    driver-side job per call, so no internal path probes the data (r4/r5
    verdict items; the old ``dim=None`` probe is gone)."""
    if not dim:
        raise ValueError("dim (embedding length) is required; pass it "
                         "explicitly — no driver-side first-row probe")
    sig = memoized(
        _SIG_MEMO, (vec_col, dim, nbits, seed),
        lambda: hyperplane_signature(vec_col,
                                     random_hyperplanes(dim, nbits, seed)))
    return df.withColumn("bucket", sig)


def lsh_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
              nbits: int = 8, max_hamming: int = 1, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """ANN top-k: probe buckets within ``max_hamming`` signature bits of the
    query's bucket, exact-rank inside the probed set.

    At 100 TB the bucketized table is written partitioned by ``bucket``;
    the signature filter is then a partition-pruned read of
    sum(C(nbits, 0..max_hamming)) / 2^nbits of the data.
    """
    planes = random_hyperplanes(len(query_vec), nbits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        d = sum(x * y for x, y in zip(query_vec, p))
        qsig |= (1 if d >= 0 else 0) << i
    bucketed = lsh_bucketize(df, nbits, vec_col, len(query_vec), seed)
    probe = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qsig))) <= max_hamming
    q = _as_double_array(query_vec)
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (bucketed.filter(probe)
            .select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


def write_ann_index(df: DataFrame, path: str, dim: int, nbits: int = 8,
                    vec_col: str = "embedding", seed: int = 42) -> None:
    """Materialize the SRP-LSH index: the table written partitioned by
    ``bucket``, so probes become partition-pruned scans (storage-level
    pruning, not just a filter) — the 100 TB serving shape.

    ``dim`` (embedding length) is REQUIRED here: this is a pipeline entry
    point, and inferring it would cost a hidden driver-side first-row job
    before the write."""
    lsh_bucketize(df, nbits, vec_col, dim, seed) \
        .write.mode("overwrite").partitionBy("bucket").parquet(path)


def ann_index_top_k(spark, path: str, query_vec: list[float], k: int = 10,
                    nbits: int = 8, max_hamming: int = 1,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> DataFrame:
    """Top-k against a written ANN index: the bucket predicate prunes
    partitions before any IO; exact cosine ranks the probed remainder."""
    planes = random_hyperplanes(len(query_vec), nbits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        d = sum(x * y for x, y in zip(query_vec, p))
        qsig |= (1 if d >= 0 else 0) << i
    probe_buckets = [b for b in range(1 << nbits)
                     if bin(b ^ qsig).count("1") <= max_hamming]
    df = spark.read.parquet(path)
    q = _as_double_array(query_vec)
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (df.filter(F.col("bucket").isin(probe_buckets))
            .select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path
# --------------------------------------------------------------------------

def train_ivf_centroids(df: DataFrame, k: int = 16,
                        vec_col: str = "embedding",
                        seed: int = 42, max_iter: int = 5) -> list[list[float]]:
    """K-means centroids for IVF list assignment (MLlib, seeded).

    Train on a sample — centroid quality needs thousands of vectors, not
    100 TB; the full corpus is only ever *assigned*, never iterated.
    """
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError:  # pragma: no cover - mllib ships with pyspark
        raise NotImplementedError("pyspark.ml unavailable")
    train = df.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_centroid(vec_expr: Column, centroids: list[list[float]]) -> Column:
    """argmin squared-L2 over literal centroids (no UDF, no shuffle).

    One CONSTANT-SIZE expression: transform over a single literal
    array-of-centroids producing the distance vector, then
    ``array_position(d, array_min(d))`` for the argmin — first occurrence
    wins ties (same first-index tie-break as a strict `<` scan). The
    earlier k-term formulation (one fold + when-chain per centroid)
    produced identical ids but a plan Catalyst re-analyzed per centroid —
    5x slower end-to-end at k=8, and growing linearly in k."""
    cents = F.array(*[_as_double_array(c) for c in centroids])
    dists = F.transform(cents, lambda c: F.aggregate(
        F.zip_with(vec_expr, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _nearest_centroid_arrow(centroids: list[list[float]]):
    """Arrow-vectorized argmin (batch matmul) — identical ids to
    ``_nearest_centroid`` (first-index tie-break; asserted per-row by
    ``method="both"`` below and on every test fixture). The expression
    argmin is interpreted per element (HOF lambdas don't codegen), ~k*dim
    interpreter ops per row; this path does one ||v||^2 - 2 v.C + ||c||^2
    matmul per Arrow batch — measured 35x faster (389.6 -> 11.0 s for a
    5-iteration full-corpus fit at 200k vecs, k=64, dim=64; 0 assignment
    mismatches, identical final cost).

    Dirty-data contract (mirrors the expression path exactly — ADVICE
    r07): NULL / ragged / null-ELEMENT vectors yield NULL ids (the expr
    twin's distances are NULL there); vectors containing NaN yield the
    argmin under SPARK's NaN ordering (NaN sorts above every number, so
    an all-NaN distance row resolves to id 0 — array_min = NaN,
    array_position finds it first), NOT NULL. Arrow flattens null
    elements to NaN inside numpy, so the null-element case rides a
    Spark-side ``exists(v, isnull)`` flag, the only way to keep the two
    dirt kinds distinguishable. Built lazily so importing the module
    never registers a UDF."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)          # k x dim
    cn = (C * C).sum(axis=1)                             # ||c||^2
    dim = C.shape[1]

    @pandas_udf("int")
    def assign(vs: pd.Series, has_null: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series(np.empty(0, dtype=np.int32))
        # one cheap len() per row (no per-element scan); null ELEMENTS
        # arrive via the Spark-computed has_null flag
        ok = np.fromiter(
            (v is not None and len(v) == dim and not hn
             for v, hn in zip(vs, has_null)),
            dtype=bool, count=len(vs))
        out = pd.Series([pd.NA] * len(vs), dtype="Int32")
        if ok.any():
            V = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in vs[ok]])
            # squared L2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 is constant
            # per row, so argmin over (cn - 2 V@C.T) matches exactly.
            d = cn[None, :] - 2.0 * (V @ C.T)
            # Spark NaN ordering: NaN sorts ABOVE +inf, so a NaN distance
            # never wins argmin unless every distance is NaN — masking to
            # +inf reproduces both cases (all-masked rows argmin to 0,
            # exactly array_position(d, array_min(d)) on an all-NaN row)
            d = np.where(np.isnan(d), np.inf, d)
            out[ok] = pd.array(d.argmin(axis=1).astype(np.int32),
                               dtype="Int32")
        return out

    return assign


def _null_elem(vec_expr: Column) -> Column:
    """True when the array itself is non-NULL but some ELEMENT is NULL —
    the flag the Arrow kernels need because Arrow->numpy flattens null
    elements into NaN, erasing a distinction the expression twins keep
    (NULL element -> NULL distance -> NULL id; NaN element -> NaN
    distance -> Spark-ordered argmin)."""
    return F.coalesce(F.exists(vec_expr, lambda x: x.isNull()),
                      F.lit(False))


def _centroid_cosine_arrow(centroids: list[list[float]]):
    """Fused argmin + own-centroid cosine in ONE Arrow batch matmul:
    the V @ C.T Gram block serves both the squared-L2 argmin and the
    chosen centroid's dot product, so the per-row interpreted cosine
    fold (dim-linear — the residual cost of the argmin-only arrow path,
    SCALING.md r07) disappears. Returns struct<list_id, centroid_cos>.

    Float caveat: numpy's SIMD/pairwise dot differs from the expression
    fold's sequential order by ulps, so this path is equality-tested
    in-suite to 1e-9 (ids bitwise) rather than hash-certified — gates
    keep the expression cosine. Dirty data mirrors the expression twin
    (ADVICE r07): NULL/ragged/null-ELEMENT vectors yield NULL list_id
    with cosine 0.0 (the when(nn > 0) guard sees a NULL condition and
    falls to the 0.0 otherwise-branch); NaN-element vectors yield the
    Spark-ordered argmin (id 0 on an all-NaN distance row) with cosine
    NaN (Spark evaluates NaN > 0 as TRUE — NaN sorts above everything —
    so the expr guard takes the then-branch and the NaN propagates);
    zero norms yield 0.0. Caveat: pandas->Arrow serialization folds NaN
    doubles to NULL on the UDF's way out, so the NaN cosine reaches
    Spark as NULL — ``semdedup.with_centroid_cosine`` restores it with
    a when-expression on exactly the NaN-element rows."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    cnorm = np.sqrt(cn)
    dim = C.shape[1]

    @pandas_udf("list_id int, centroid_cos double")
    def score(vs: pd.Series, has_null: pd.Series) -> pd.DataFrame:
        n = len(vs)
        out_ids = pd.array([pd.NA] * n, dtype="Int32")
        # plain float64, NOT nullable Float64: the masked dtype folds
        # NaN into NA, but the expr twin never yields NULL cosine (dirty
        # rows get 0.0, NaN rows keep NaN) — NaN must survive to match
        out_cos = np.zeros(n, dtype=np.float64)
        ok = np.fromiter(
            (v is not None and len(v) == dim and not hn
             for v, hn in zip(vs, has_null)),
            dtype=bool, count=n)
        if ok.any():
            V = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in vs[ok]])
            G = V @ C.T
            d = cn[None, :] - 2.0 * G
            # Spark NaN ordering (see _nearest_centroid_arrow)
            ids = np.where(np.isnan(d), np.inf, d).argmin(axis=1)
            dots = G[np.arange(len(ids)), ids]
            vn = np.sqrt((V * V).sum(axis=1))
            denom = vn * cnorm[ids]
            # expr guard is when(denom > 0, dot/denom).otherwise(0.0)
            # under SPARK comparison semantics, where NaN > 0 is TRUE:
            # NaN denominators take the then-branch and propagate NaN
            take = (denom > 0) | np.isnan(denom)
            cos = np.where(take,
                           dots / np.where(take, denom, 1.0), 0.0)
            out_ids[ok] = pd.array(ids.astype(np.int32), dtype="Int32")
            out_cos[ok] = cos
        return pd.DataFrame({"list_id": out_ids, "centroid_cos": out_cos})

    return score


def _centroid_id(vec_expr: Column, centroids: list[list[float]],
                 method: str = "expr") -> Column:
    """The assignment column for the chosen path:

    - ``"expr"`` — pure-Catalyst argmin (zero-UDF; what every oracle
      replays);
    - ``"arrow"`` — the vectorized batch matmul (the full-corpus fast
      path);
    - ``"both"`` — compute BOTH and ``assert_true`` id equality per row,
      in-plan and distributed, returning the arrow value — the
      self-certifying mode oracle gates run (the x04 SimHash discipline),
      so the fast path is hash-certified rather than just test-asserted.
    """
    if method not in ("expr", "arrow", "both"):
        raise ValueError(
            f"method must be 'expr', 'arrow' or 'both', got {method!r}")
    if method == "expr":
        return _nearest_centroid(vec_expr, centroids)
    arrow = _nearest_centroid_arrow(centroids)(vec_expr,
                                               _null_elem(vec_expr))
    if method == "arrow":
        return arrow
    expr = _nearest_centroid(vec_expr, centroids)
    return F.coalesce(
        F.assert_true(arrow.eqNullSafe(expr),
                      F.lit("centroid argmin arrow/expr mismatch"))
        .cast("int"),
        arrow)


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding",
               method: str = "expr") -> DataFrame:
    """Attach the IVF ``list_id``. At 100 TB, write the table partitioned by
    list_id so probes are partition-pruned scans of nprobe/k of the data;
    ``method="arrow"`` swaps the interpreted argmin for the Arrow batch
    matmul on full-corpus assignment jobs (see ``_centroid_id``)."""
    return df.withColumn(
        "list_id", _centroid_id(F.col(vec_col).cast("array<double>"),
                                centroids, method))


def _ivf_probe_ids(centroids: list[list[float]], query_vec: list[float],
                   nprobe: int) -> list[int]:
    """Driver-side probe-list selection: the ``nprobe`` centroids nearest
    (squared L2, centroid index tie-break) to the query. Shared by the
    compute path (ivf_top_k) and the written-index path (ivf_index_top_k)
    so the two can never drift — x36's oracle equivalence depends on it."""
    dists = []
    for i, c in enumerate(centroids):
        d = sum((x - y) * (x - y) for x, y in zip(query_vec, c))
        dists.append((d, i))
    return [i for _, i in sorted(dists)[:nprobe]]


def _rank_probed(df: DataFrame, query_vec: list[float], k: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """Exact cosine rank of an already-probed candidate frame: one
    projection + TakeOrderedAndProject, id tie-break."""
    q = _as_double_array(query_vec)
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (df.select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


def write_ivf_index(df: DataFrame, path: str, centroids: list[list[float]],
                    vec_col: str = "embedding") -> None:
    """Materialize the IVF index: the corpus written partitioned by
    ``list_id``, the serving twin of ``write_ann_index`` — probes then
    read only the ``nprobe`` nearest lists as partition-pruned scans
    (storage-level pruning, ~nprobe/k of the bytes), which is the 100 TB
    ANN serving shape."""
    ivf_assign(df, centroids, vec_col) \
        .write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_index_top_k(spark, path: str, centroids: list[list[float]],
                    query_vec: list[float], k: int = 10, nprobe: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k against a written IVF index: centroid ranking happens
    driver-side (k_centroids is tiny), the ``list_id`` predicate prunes
    partitions before any IO, exact cosine ranks the probed remainder.
    Identical results to ``ivf_top_k`` over the same centroids — minus
    the full-corpus assignment scan."""
    probe_ids = _ivf_probe_ids(centroids, query_vec, nprobe)
    probed = spark.read.parquet(path).filter(F.col("list_id").isin(probe_ids))
    return _rank_probed(probed, query_vec, k, id_col, vec_col)


def ivf_top_k(df: DataFrame, centroids: list[list[float]],
              query_vec: list[float], k: int = 10, nprobe: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: rank centroids by distance to the query driver-side
    (k_centroids is tiny), scan only the ``nprobe`` nearest lists, exact
    cosine rank within them. Plan: pruned scan -> TakeOrderedAndProject."""
    probe_ids = _ivf_probe_ids(centroids, query_vec, nprobe)
    probed = (ivf_assign(df, centroids, vec_col)
              .filter(F.col("list_id").isin(probe_ids)))
    return _rank_probed(probed, query_vec, k, id_col, vec_col)


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              nbits: int = 8, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              seed: int = 42,
                              bucket_cap: int | None = None,
                              materialize: bool = True, *,
                              dim: int) -> DataFrame:
    """X2 embedding-cosine near-dup: same-bucket candidate pairs -> exact
    cosine verify >= threshold. Output (id_a, id_b, cos_sim).

    The reciprocal norm is computed once per ROW before the bucket shuffle
    (it sits under the exchange, so it cannot collapse into the per-pair
    projection); the per-pair work is then a single dot product — 3x less
    array folding than evaluating cosine() pairwise (measured at sf0.1).

    ``materialize`` persists the bucketized frame so hyperplane signatures
    and norms are computed once, not once per self-join side (the HOF dot
    products are the dominant per-row cost; the cache spills to local disk
    at scale, still cheaper than recomputing nbits x dim multiplies per
    row).

    Scale guards — the same-bucket self-join emits b*(b-1)/2 pairs for a
    bucket of b members, so at corpus scale BOTH of these matter:

    - ``bucket_cap`` drops buckets with more than cap members before the
      join (semi-join against the small-bucket key set, identical to the
      MinHash path's guard in dedup._lsh_candidates_from_sets). A dropped
      bucket's members are dense near-identical clusters — route those to
      exact dedup (X1) on a quantized-vector fingerprint instead of
      enumerating the quadratic pair list.
    - ``nbits`` must grow with the corpus: expected bucket occupancy is
      n / 2^nbits, so keep nbits >= log2(n) - log2(target_occupancy)
      (e.g. 1e9 vectors, ~1k per bucket -> nbits >= 20). The default 8 is
      sized for test corpora, NOT for production.

    ``dim`` (the embedding length) is REQUIRED — like ``write_ann_index``,
    this is a pipeline entry point, and inferring the length would cost a
    hidden driver-side first-row probe job per call.
    """
    b = (lsh_bucketize(df, nbits, vec_col, dim, seed)
         .select(F.col(id_col).alias("id"),
                 F.col(vec_col).cast("array<double>").alias("v"), "bucket")
         .withColumn("inv_norm", F.when(norm(F.col("v")) > 0,
                                        F.lit(1.0) / norm(F.col("v")))
                     .otherwise(F.lit(0.0))))
    if materialize:
        from openapc_olap_spark.operators.dedup import _materialized, _spread
        # spread the stream side across the cores BEFORE caching: when the
        # bucket self-join broadcasts one side, its parallelism is the
        # stream side's partition count, and a few-file scan would run the
        # quadratic verify nearly serially (measured 50 s -> 4 s at sf1;
        # same fix as semdedup.semantic_candidate_pairs); conditional so
        # an already-spread scan pays no extra shuffle
        b = _materialized(_spread(b))
    if bucket_cap is not None:
        small = (b.groupBy("bucket")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= bucket_cap)
                 .select("bucket"))
        b = b.join(small, ["bucket"], "left_semi")
    l, r = b.alias("l"), b.alias("r")
    sim = (dot(F.col("l.v"), F.col("r.v"))
           * F.col("l.inv_norm") * F.col("r.inv_norm"))
    pairs = (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                    & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     sim.alias("cos_sim")))
    return pairs.filter(F.col("cos_sim") >= threshold)


def recommended_nbits(n_vectors: int, target_occupancy: int = 1024,
                      floor: int = 4, cap: int = 28) -> int:
    """The SCALING.md occupancy rule as code: nbits >= log2(n) -
    log2(target bucket occupancy), clamped to [floor, cap]. Use this to
    size SRP-LSH for a corpus instead of carrying a fixture-tuned
    constant to production — occupancy collapse (too few buckets for the
    corpus) makes the bucket self-join quadratic, which is the measured
    x06 sf0.1->sf1 cost cliff; oversizing just thins buckets.

    >>> recommended_nbits(500, 8)        # test-corpus scale
    6
    >>> recommended_nbits(10**9, 1024)   # 1e9 vectors at ~1k/bucket
    20
    """
    import math
    if n_vectors <= 0:
        return floor
    bits = math.ceil(math.log2(max(n_vectors / target_occupancy, 1.0)))
    return max(floor, min(cap, bits))
