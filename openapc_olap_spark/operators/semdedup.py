"""Semantic deduplication over embedding clusters (SemDeDup-style;
SURVEY.md §2.9 X3/X2d family — reference has no equivalent, this is part
of the driver-mandated LLM-data-pipeline surface).

Where SRP-LSH near-dup (similarity.embedding_near_duplicates) buckets by
random-hyperplane sign bits, semantic dedup buckets by a coarse
quantizer: assign every vector to its nearest centroid (an IVF ``list_id``,
similarity.ivf_assign), then enumerate candidate pairs only WITHIN a
cluster and keep the exact-cosine verified ones. Duplicates resolve
min-id-wins: any vector that appears as the greater id of a verified
pair is dropped, the smallest id of each near-duplicate neighborhood
survives. This is the standard greedy SemDeDup resolution (Abbas et al.
2023 keep one representative per high-cosine cluster neighborhood) and —
unlike a transitive-closure grouping — needs no iteration, so the whole
operator is two shuffles.

100 TB posture:
- the pair join is an equi-join on ``list_id`` — never all-pairs. With k
  clusters of roughly n/k members the candidate volume is n^2/k, so k
  must grow with the corpus exactly like LSH nbits (SCALING.md occupancy
  rule; k ~ n/1000 keeps clusters ~1000 wide).
- ``cluster_cap`` drops clusters larger than the cap from pair
  enumeration BEFORE the join (left_semi against the small-cluster key
  set) — a mega-cluster is a dense near-identical blob better routed to
  exact dedup on a quantized fingerprint than enumerated quadratically.
- the reciprocal norm is computed once per row under the exchange, so
  the per-pair work is one dot product.
- centroids are a driver-side literal (k * dim floats) — at production k
  (thousands), broadcast-sized; assignment is a constant-size Catalyst
  expression, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators.similarity import dot, ivf_assign, norm


def semantic_candidate_pairs(df: DataFrame, centroids: list[list[float]],
                             threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             cluster_cap: int | None = None,
                             materialize: bool = True,
                             block_parts: int | None = None,
                             method: str = "expr") -> DataFrame:
    """Verified same-cluster pairs: (id_a, id_b, cos_sim), id_a < id_b,
    cos_sim >= threshold. ``materialize`` persists the assigned frame so
    centroid argmin + norms are computed once, not once per join side.

    ``block_parts`` (B) enables the triangle-blocked self-join: each
    cluster's members are hash-assigned to B blocks and every unordered
    block pair (i <= j) becomes its own join cell, so reducer parallelism
    is k * B(B+1)/2 instead of k, at ~(B+1)/2x input replication. The
    PAIR SET is identical for any B (tested) — use it when cluster count
    is below core count (small-k regimes; at production k, leave None).

    ``method`` picks the centroid-argmin path ("expr" | "arrow" |
    "both" — see ``similarity._centroid_id``): "arrow" for full-corpus
    assignment speed, "both" for in-plan hash-certified equality.
    """
    a = (ivf_assign(df, centroids, vec_col, method=method)
         .select(F.col(id_col).alias("id"),
                 F.col(vec_col).cast("array<double>").alias("v"), "list_id")
         .withColumn("inv_norm", F.when(norm(F.col("v")) > 0,
                                        F.lit(1.0) / norm(F.col("v")))
                     .otherwise(F.lit(0.0))))
    if materialize:
        from openapc_olap_spark.operators.dedup import _materialized, _spread
        # spread the stream side across the cores BEFORE caching: when the
        # pair join broadcasts (small corpus / one side capped), its
        # parallelism is the stream side's partition count — a 2-file scan
        # would otherwise run the quadratic verify on 2 tasks (measured
        # 363 s -> 40 s at sf1 from this alone); conditional so an
        # already-spread scan pays no extra shuffle
        a = _materialized(_spread(a))
    if cluster_cap is not None:
        small = (a.groupBy("list_id")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= cluster_cap)
                 .select("list_id"))
        a = a.join(small, ["list_id"], "left_semi")
    sim = (dot(F.col("l.v"), F.col("r.v"))
           * F.col("l.inv_norm") * F.col("r.inv_norm"))
    if block_parts is not None and block_parts > 1:
        bcol = F.pmod(F.hash(F.col("id")), F.lit(block_parts))
        ab = a.withColumn("b", bcol.cast("int"))
        l = (ab.withColumn("cj", F.explode(
                F.sequence(F.col("b"), F.lit(block_parts - 1))))
             .alias("l"))
        r = (ab.withColumn("ci", F.explode(
                F.sequence(F.lit(0), F.col("b"))))
             .alias("r"))
        cell = ((F.col("l.list_id") == F.col("r.list_id"))
                & (F.col("l.b") == F.col("r.ci"))
                & (F.col("l.cj") == F.col("r.b")))
        # diagonal cells see each unordered pair twice (both rows sit on
        # both sides) -> id order dedups; off-diagonal cells see it once
        keep = F.when(F.col("l.b") == F.col("l.cj"),
                      F.col("l.id") < F.col("r.id")).otherwise(F.lit(True))
        return (l.join(r, cell & keep)
                .select(F.least("l.id", "r.id").alias("id_a"),
                        F.greatest("l.id", "r.id").alias("id_b"),
                        sim.alias("cos_sim"))
                .filter(F.col("cos_sim") >= threshold))
    l, r = a.alias("l"), a.alias("r")
    return (l.join(r, (F.col("l.list_id") == F.col("r.list_id"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                    sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def semantic_dedup(df: DataFrame, centroids: list[list[float]],
                   threshold: float = 0.9, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cluster_cap: int | None = None,
                   materialize: bool = True,
                   block_parts: int | None = None,
                   method: str = "expr") -> DataFrame:
    """Greedy min-id-wins survivor set: the input minus every row whose id
    appears as the GREATER id of a verified pair. Deterministic (drop set
    is a pure function of the pair list, independent of join order) and
    single-pass — no iterative closure; for transitive duplicate GROUPS
    use dedup.duplicate_groups over semantic_candidate_pairs instead."""
    pairs = semantic_candidate_pairs(df, centroids, threshold, id_col,
                                     vec_col, cluster_cap, materialize,
                                     block_parts, method)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, [id_col], "left_anti")


def with_centroid_cosine(df: DataFrame, centroids: list[list[float]],
                         vec_col: str = "embedding",
                         method: str = "expr") -> DataFrame:
    """Attach ``list_id`` and ``centroid_cos`` (cosine of each vector to
    its assigned centroid) — the per-row quality signal of an embedding
    space (low cosine = far from every centroid = off-distribution).

    ``method="expr"`` (default) / ``"both"``: assignment per
    ``similarity._centroid_id``, cosine as a pure expression
    (one element_at into the literal centroid array; no shuffle) — what
    the oracle gates replay. ``method="arrow"``: the FUSED batch-matmul
    scorer — argmin and cosine share one V @ C.T Gram block, removing
    the dim-linear interpreted cosine fold too (equality-tested to 1e-9
    in-suite; ids bitwise)."""
    from openapc_olap_spark.operators.similarity import (
        _as_double_array, _centroid_cosine_arrow, _null_elem, cosine)

    if method == "arrow":
        v = F.col(vec_col).cast("array<double>")
        sc = _centroid_cosine_arrow(centroids)(v, _null_elem(v))
        # pandas->Arrow folds NaN doubles into NULL on the UDF's way out,
        # but the expr twin yields cosine NaN for NaN-element vectors
        # (Spark evaluates NaN > 0 as TRUE in the when-guard) — restore
        # it with an expression on exactly those rows: full-length,
        # no null elements, some NaN element (ADVICE r07)
        nan_row = ((F.size(v) == len(centroids[0]))
                   & ~_null_elem(v)
                   & F.coalesce(F.exists(v, F.isnan), F.lit(False)))
        cos = F.when(nan_row, F.lit(float("nan"))) \
               .otherwise(F.col("__sc.centroid_cos"))
        return (df.withColumn("__sc", sc)
                .select(*df.columns,
                        F.col("__sc.list_id").alias("list_id"),
                        cos.alias("centroid_cos")))
    assigned = ivf_assign(df, centroids, vec_col, method=method)
    cents = F.array(*[_as_double_array(c) for c in centroids])
    own = F.element_at(cents, F.col("list_id") + 1)
    return assigned.withColumn(
        "centroid_cos",
        cosine(F.col(vec_col).cast("array<double>"), own))


def cluster_outliers(df: DataFrame, centroids: list[list[float]],
                     z: float = 2.0, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     method: str = "expr") -> DataFrame:
    """Flag embedding outliers per cluster: rows whose centroid cosine
    falls more than ``z`` sample-stddevs below their cluster's mean get
    ``is_outlier`` = true (single-member clusters never flag — stddev is
    undefined). The filter-side twin of semantic dedup: dedup drops the
    too-similar, this drops the too-far (corrupt vectors, wrong-modality
    rows, encoder failures).

    100 TB posture: one scan for the per-row cosine, one
    cluster-cardinality aggregate, one broadcast join of k stat rows back
    onto the scan. Nothing corpus-sized shuffles."""
    scored = with_centroid_cosine(df, centroids, vec_col, method)
    stats = (scored.groupBy("list_id")
             .agg(F.avg("centroid_cos").alias("__mean"),
                  F.stddev("centroid_cos").alias("__std")))
    cut = F.col("__mean") - F.lit(z) * F.col("__std")
    return (scored.join(F.broadcast(stats), ["list_id"])
            .withColumn("is_outlier",
                        F.when(F.col("__std").isNull(), F.lit(False))
                        .otherwise(F.col("centroid_cos") < cut))
            .drop("__mean", "__std"))
