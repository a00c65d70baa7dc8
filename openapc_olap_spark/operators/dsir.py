"""Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
distribution looks like a small high-quality target corpus.

The published recipe, re-expressed as Spark expressions end-to-end:

1. Featurize every document as a BAG of word n-grams (unigrams +
   bigrams by default, repeats kept — counts are the signal) hashed
   into a fixed bucket space ``n_buckets`` (md5-prefix mod B, the same
   engine-portable bucket as ``packing._md5_bucket`` so a DuckDB twin
   can replay it bit-for-bit).
2. Fit two bucket-unigram models — target and raw — each just
   ``(bucket, count)`` with add-k smoothing over the fixed space.
3. Score each raw document with the importance log-weight
   ``sum_g [ln p_target(bucket(g)) - ln p_raw(bucket(g))]`` and keep
   the top fraction by weight.

100 TB posture: the model frames are AT MOST ``n_buckets`` rows
(fixed by config, e.g. 2^16) regardless of corpus size — always
broadcast-able; featurization is one explode scan with a
(doc, bucket) map-side pre-aggregation, so the exchange carries
bucket-count pairs, never raw grams; the per-document weight is a
bucket-sorted ``F.aggregate`` fold so double additions associate
identically across partitionings and engines (the repo's x54/x58
determinism discipline). Nothing collects corpus-sized data to the
driver — the only driver scalars are the two model totals (one row
each) and the top-k cutoff count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .packing import _md5_bucket


def ngram_bag(col: Column | str = "text", n_max: int = 2) -> Column:
    """All word n-grams for n = 1..n_max, repeats KEPT -> array<string>.

    Same normalization and overlapping-match regex trick as
    ``text.shingles`` (one codegen'd pass per n, no per-element HOF
    lambdas), minus the ``array_distinct`` — DSIR models gram COUNTS.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    parts = []
    for n in range(1, n_max + 1):
        pat = r"(?<=^| )(?=(\S+" + r" \S+" * (n - 1) + r"))"
        parts.append(F.regexp_extract_all(norm, F.lit(pat), 1))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def doc_bucket_counts(df: DataFrame, n_buckets: int,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_max: int = 2) -> DataFrame:
    """(id_col, bucket, count) — per-document hashed-gram bag.

    ``explode_outer`` keeps gram-less documents (empty/whitespace text)
    as a single NULL-bucket row so downstream scoring can emit them
    with weight 0 instead of silently dropping them.
    """
    g = F.explode_outer(ngram_bag(text_col, n_max)).alias("__g")
    ex = df.select(F.col(id_col), g)
    return (ex.groupBy(
                id_col,
                F.when(F.col("__g").isNotNull(),
                       _md5_bucket(F.col("__g"), n_buckets))
                 .alias("bucket"))
              .agg(F.count(F.col("__g")).alias("count")))


def corpus_bucket_counts(df: DataFrame, n_buckets: int,
                         text_col: str = "text",
                         n_max: int = 2) -> DataFrame:
    """(bucket, count) over the whole corpus — the model-fitting input.
    At most ``n_buckets`` rows out; the groupBy is map-side combined."""
    g = F.explode(ngram_bag(text_col, n_max)).alias("__g")
    return (df.select(g)
              .groupBy(_md5_bucket(F.col("__g"), n_buckets).alias("bucket"))
              .agg(F.count(F.lit(1)).alias("count")))


def fit_bucket_model(counts: DataFrame, n_buckets: int,
                     smoothing_k: float = 1.0) -> tuple[DataFrame, float]:
    """Add-k smoothed bucket log-probabilities.

    Returns ``(model, floor)``: ``model`` is (bucket, logp) for SEEN
    buckets only (<= n_buckets rows — broadcast-able at any corpus
    size), ``floor`` the shared ln(k / (total + k*B)) for the unseen
    rest, so callers coalesce instead of densifying B rows. The total
    is one aggregate row collected to the driver (scalar-grain, same
    as bloom.py's sketch row)."""
    from openapc_olap_spark.operators.dedup import _materialized

    # counts is consumed TWICE (the total scalar below AND the model
    # select that feeds the broadcast scoring join) and its evaluation
    # is the corpus-sized gram explode + hash pass — cache it or each
    # fitted model costs two corpus passes (round 14; the frame itself
    # is <= n_buckets rows)
    counts = _materialized(counts)
    total = counts.agg(F.sum("count")).first()[0] or 0
    denom = float(total) + smoothing_k * n_buckets
    model = counts.select(
        "bucket",
        F.log((F.col("count") + F.lit(smoothing_k)) / F.lit(denom))
         .alias("logp"))
    floor = math.log(smoothing_k / denom) if denom > 0 else 0.0
    return model, floor


def corpus_counts_from_doc_counts(per: DataFrame) -> DataFrame:
    """Re-aggregate a ``doc_bucket_counts`` table to the corpus-level
    (bucket, count) frame ``corpus_bucket_counts`` would produce over
    the same input — integer sums, bit-identical — so a pipeline that
    needs BOTH grains (dsir_select, the x73 shape) runs the corpus-sized
    gram explode once, not twice (guide §1.2). NULL-bucket rows (the
    explode_outer placeholders for gram-less docs, count 0) are dropped,
    matching the plain-explode corpus path."""
    return (per.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.sum("count").alias("count")))


def importance_weights(df: DataFrame, target_model: DataFrame,
                       target_floor: float, raw_model: DataFrame,
                       raw_floor: float, n_buckets: int,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_max: int = 2,
                       per: DataFrame | None = None) -> DataFrame:
    """(id_col, n_ngrams, weight): per-document importance log-weight.

    Both model joins broadcast (<= n_buckets rows by construction).
    The weight folds (bucket, count, delta) structs sorted by bucket id
    so the floating-point sum is partitioning- and engine-invariant.
    Gram-less documents surface with n_ngrams = 0, weight = 0.0.
    ``per`` accepts a precomputed (ideally cached) ``doc_bucket_counts``
    frame so the raw-model fit and the scoring pass can share ONE gram
    explode (see corpus_counts_from_doc_counts).
    """
    if per is None:
        per = doc_bucket_counts(df, n_buckets, id_col, text_col, n_max)
    lt = F.coalesce(F.col("__lt"), F.lit(target_floor))
    lr = F.coalesce(F.col("__lr"), F.lit(raw_floor))
    scored = (per
              .join(F.broadcast(target_model.withColumnRenamed("logp", "__lt")),
                    "bucket", "left")
              .join(F.broadcast(raw_model.withColumnRenamed("logp", "__lr")),
                    "bucket", "left")
              .select(F.col(id_col),
                      F.col("bucket"),
                      F.col("count"),
                      (F.col("count") * (lt - lr)).alias("__delta")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("bucket").alias("b"), F.col("__delta").alias("d")))),
        lambda s: s["d"])
    return (scored.groupBy(id_col)
            .agg(F.sum(F.when(F.col("bucket").isNotNull(),
                              F.col("count")).otherwise(F.lit(0)))
                  .cast("bigint").alias("n_ngrams"),
                 F.coalesce(
                     F.aggregate(ordered, F.lit(0.0),
                                 lambda acc, x: acc + x),
                     F.lit(0.0)).alias("weight")))


def dsir_select(raw_df: DataFrame, target_df: DataFrame,
                keep_fraction: float, n_buckets: int = 1 << 16,
                id_col: str = "doc_id", text_col: str = "text",
                n_max: int = 2, smoothing_k: float = 1.0) -> DataFrame:
    """The composed pipeline: fit both models, score every raw doc,
    keep the top ``keep_fraction`` by (weight desc, id asc — the
    deterministic tie-break). Output: raw_df columns + n_ngrams +
    weight, filtered. Gram-less documents (n_ngrams = 0) are excluded
    BEFORE the cutoff: their weight is exactly 0, which would rank
    above every genuinely raw-like (negative-weight) document despite
    carrying zero evidence of target-likeness.

    The cutoff is EXACT but never a one-task global sort (ADVICE r06):
    an approx-quantile bracket on the weight column bounds the k-th
    weight to a narrow rank band, one band-only aggregate finds the
    boundary weight exactly, rows strictly above it are kept with a
    plain filter, and only the boundary TIE GROUP (one weight value) is
    ranked by id — so per-reducer work is band-sized, independent of
    corpus size. The scored frame is localCheckpoint-ed first: it is
    id-grain scalar triples (never documents), reused by the count, the
    quantile sketch, the band aggregate, and the final filters."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], "
                         f"got {keep_fraction}")
    from openapc_olap_spark.operators.dedup import _materialized

    # ONE raw-corpus gram pass: the per-doc bucket table feeds both the
    # raw model (re-aggregated, integer-exact) and the scoring join
    # (guide §1.2 — corpus_bucket_counts(raw_df) was a second full
    # explode of the same grams)
    per_raw = _materialized(doc_bucket_counts(raw_df, n_buckets, id_col,
                                              text_col, n_max))
    t_counts = corpus_bucket_counts(target_df, n_buckets, text_col, n_max)
    r_counts = corpus_counts_from_doc_counts(per_raw)
    t_model, t_floor = fit_bucket_model(t_counts, n_buckets, smoothing_k)
    r_model, r_floor = fit_bucket_model(r_counts, n_buckets, smoothing_k)
    w = importance_weights(raw_df, t_model, t_floor, r_model, r_floor,
                           n_buckets, id_col, text_col, n_max, per=per_raw)
    w = w.filter(F.col("n_ngrams") > 0).localCheckpoint(eager=True)
    n = w.count()
    if n == 0:
        return raw_df.join(w, id_col)
    k = max(1, math.ceil(keep_fraction * n))
    if k >= n:
        return raw_df.join(w, id_col)
    keep = _top_k_by_weight(w, k, n, id_col)
    return raw_df.join(keep, id_col)


def _top_k_by_weight(w: DataFrame, k: int, n: int,
                     id_col: str) -> DataFrame:
    """Exact top-k rows of ``w`` by (weight desc, ``id_col`` asc) without
    a global sort. approxQuantile's rank-error contract brackets the
    k-th largest weight in [lo, hi] (rank span ~4*err*n); the boundary
    weight is found exactly from a per-distinct-weight count of that
    band; ties at the boundary are ranked by id within one weight value
    (one reducer sized by the tie group, not the corpus). Falls back to
    the windowed global rank only if the band degenerates (> _BAND_CAP
    distinct weights — pathological weight spread)."""
    err = min(1e-3, max(1e-6, 1e5 / n))
    q = 1.0 - k / n
    lo, hi = w.stat.approxQuantile(
        "weight", [max(0.0, q - 2 * err), min(1.0, q + 2 * err)], err)
    n_above = w.filter(F.col("weight") > hi).count()
    band = (w.filter(F.col("weight").between(lo, hi))
            .groupBy("weight").agg(F.count(F.lit(1)).alias("__c")))
    rows = band.orderBy(F.col("weight").desc()).limit(_BAND_CAP + 1) \
               .collect()
    w_k, r_need = None, 0
    # n_above >= k means the sketch's upper bracket was breached (the
    # k-th weight lies ABOVE hi, not inside the band): leave w_k None so
    # the exact windowed fallback runs — walking the band would return
    # every row above hi (> k rows) with r_need <= 0 (ADVICE r07).
    if len(rows) <= _BAND_CAP and n_above < k:
        acc = n_above                       # = count(weight > current)
        for r in rows:
            if acc + r["__c"] >= k:
                w_k, r_need = r["weight"], k - acc
                break
            acc += r["__c"]
    if w_k is None:
        # degenerate band (or sketch contract violated): correct, slow
        ranked = w.withColumn(
            "__rk", F.row_number().over(
                Window.orderBy(F.col("weight").desc(), F.col(id_col))))
        return ranked.filter(F.col("__rk") <= k).drop("__rk")
    ties = (w.filter(F.col("weight") == w_k)
            .withColumn("__rk", F.row_number().over(
                Window.partitionBy("weight")
                      .orderBy(F.col(id_col).asc())))
            .filter(F.col("__rk") <= r_need).drop("__rk"))
    return w.filter(F.col("weight") > w_k).unionByName(ties)


# distinct boundary-band weights collected to the driver before the exact
# cutoff walk; beyond this the band is pathological and the windowed rank
# takes over
_BAND_CAP = 1_000_000
