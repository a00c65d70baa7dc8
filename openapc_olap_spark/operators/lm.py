"""Unigram language-model scoring (SURVEY.md §2.9 X4 family — a
KenLM-style perplexity quality filter's cheap, exactly-reproducible
cousin; reference has no equivalent, driver-mandated LLM-pipeline
surface).

Train an add-k-smoothed unigram model on a corpus (one token-count
aggregation), then score every document by its mean token log-probability
— low scores flag gibberish / OOV-dense / off-distribution text, the
classic model-based quality signal used alongside the heuristic scores in
operators.text (quality_score).

100 TB posture:
- training is ONE map-side-combined token count; the model is
  vocab-sized, not corpus-sized, and ``min_count`` prunes the hapax tail
  (web-scale vocab at min_count>=5 is tens of millions of rows).
- scoring pre-aggregates to per-(doc, DISTINCT token) counts before the
  model join, so join input is bounded by per-doc vocab, not token
  instances; the model join carries NO forced hint by default — AQE
  broadcasts a model that fits and shuffle-joins one that doesn't
  (``broadcast_model`` overrides in either direction).
- the two model scalars (total tokens N, vocab size V) come from a
  one-row aggregate — the only driver action, two longs.
- the per-doc sum folds over a token-SORTED list, so the floating-point
  addition order is deterministic across partitionings, runs, and
  engines (groupBy sum order is not) — this is what makes the score
  hash-certifiable rather than merely approximately stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def unigram_counts(df: DataFrame, text_col: str = "text",
                   min_count: int = 1) -> DataFrame:
    """(token, count) over the corpus — the unigram model's sufficient
    statistic. ``min_count`` prunes rare tokens OUT OF THE VOCABULARY:
    pruned (and unseen) tokens score as OOV at smoothing mass k/denom."""
    counts = (df.select(F.explode(text.tokens(text_col)).alias("token"))
              .groupBy("token")
              .agg(F.count(F.lit(1)).alias("count")))
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    return counts


def _hinted(model: DataFrame, broadcast: bool | None) -> DataFrame:
    """Join-strategy hint for a model frame: True forces broadcast (only
    when the caller KNOWS the model is small), False forces a shuffle
    hash join, None (default) leaves the choice to Catalyst/AQE — which
    broadcasts vocab-sized models that actually fit and degrades to a
    shuffle join for web-scale vocabularies (tens of millions of rows)
    instead of OOMing the driver under a forced hint."""
    if broadcast is True:
        return F.broadcast(model)
    if broadcast is False:
        return model.hint("shuffle_hash")
    return model


def doc_mean_logprob(df: DataFrame, model: DataFrame | None = None,
                     id_col: str = "doc_id", text_col: str = "text",
                     smoothing_k: float = 1.0,
                     round_to: int | None = None,
                     broadcast_model: bool | None = None) -> DataFrame:
    """Per-document mean token ln-probability under the add-k unigram
    model: (id_col, n_tokens, mean_logprob). Token-less documents emit no
    row (they have no tokens to score; filter upstream with token_count).

    p(t) = (count(t) + k) / (N + k * (V + 1)) — V+1 reserves one
    smoothing slot for the OOV class, so unseen tokens get ln(k / denom).
    ``model`` defaults to a model trained on ``df`` itself; pass a
    pre-trained ``unigram_counts`` frame to score against a reference
    corpus (the fastText/KenLM filtering setup).
    """
    if model is None:
        from openapc_olap_spark.operators.dedup import _materialized
        # the model frame is consumed twice (the N/V scalar agg below AND
        # the broadcast scoring join) — cache it or the corpus-sized token
        # count runs twice. Deriving the model from a materialized
        # per-(doc, token) table (the bigram/KN §1.2 rewrite) was
        # measured HERE and lost at sf0.1 (+0.2 s: the single-token
        # explode is cheaper than the extra cache + vocab reshuffle it
        # saves), so the unigram scorer keeps the two-pass shape.
        model = _materialized(unigram_counts(df, text_col))
    stats = model.agg(F.sum("count").alias("n"),
                      F.count(F.lit(1)).alias("v")).first()
    n_total = int(stats["n"] or 0)
    vocab = int(stats["v"] or 0)
    denom = float(n_total) + smoothing_k * (vocab + 1)

    per = (df.select(F.col(id_col), F.explode(text.tokens(text_col))
                     .alias("token"))
           .groupBy(id_col, "token")
           .agg(F.count(F.lit(1)).alias("n")))
    logp = F.log((F.coalesce(F.col("count"), F.lit(0)) + F.lit(smoothing_k))
                 / F.lit(denom))
    joined = (per.join(_hinted(model, broadcast_model), ["token"], "left")
              .select(F.col(id_col), F.col("token"), F.col("n"),
                      (F.col("n") * logp).alias("contrib")))
    # Deterministic-order sum: fold the token-sorted contribution list so
    # the double additions associate identically everywhere.
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("token", "contrib"))),
        lambda s: s["contrib"])
    total = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    score = total / F.sum("n")
    if round_to is not None:
        score = F.round(score, round_to)
    return (joined.groupBy(id_col)
            .agg(F.sum("n").alias("n_tokens"),
                 score.alias("mean_logprob")))


def bigram_counts(df: DataFrame, text_col: str = "text",
                  min_count: int = 1) -> DataFrame:
    """(prev, token, count) over adjacent in-document token pairs — the
    bigram model's sufficient statistic (no BOS/EOS markers: interior
    bigrams only, so single-token documents contribute nothing). One
    map-side-combined aggregation; output is bigram-vocabulary-sized and
    ``min_count`` prunes the long tail (the usual broadcastability
    lever — observed bigrams grow with the corpus far slower than
    tokens)."""
    toks = text.tokens(text_col)
    n = F.size(toks)
    pairs = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("token")))
    ).otherwise(F.array().cast("array<struct<prev:string,token:string>>"))
    counts = (df.select(F.explode(pairs).alias("bg"))
              .groupBy("bg.prev", "bg.token")
              .agg(F.count(F.lit(1)).alias("count")))
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    return counts


def doc_mean_bigram_logprob(df: DataFrame,
                            bigram_model: DataFrame | None = None,
                            unigram_model: DataFrame | None = None,
                            id_col: str = "doc_id", text_col: str = "text",
                            smoothing_k: float = 1.0,
                            round_to: int | None = None,
                            broadcast_model: bool | None = None) -> DataFrame:
    """Per-document mean conditional ln-probability under an add-k bigram
    model: (id_col, n_bigrams, mean_logprob). Documents with fewer than
    two tokens emit no row.

    p(t | prev) = (c(prev, t) + k) / (c(prev) + k * (V + 1)) with V the
    UNIGRAM vocabulary size — each context's distribution smooths over
    the full vocabulary plus one OOV slot, so unseen contexts score
    ln(k / (k * (V + 1))) = -ln(V + 1) per token. Both models default to
    self-training on ``df``; pass pre-trained frames to score against a
    reference corpus. Same determinism discipline as doc_mean_logprob:
    per-(doc, distinct bigram) pre-aggregation, broadcast model joins,
    and a bigram-sorted fold for the final sum."""
    from openapc_olap_spark.operators.dedup import _materialized

    toks = text.tokens(text_col)
    n = F.size(toks)
    pairs = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("token")))
    ).otherwise(F.array().cast("array<struct<prev:string,token:string>>"))
    per = (df.select(F.col(id_col), F.explode(pairs).alias("bg"))
           .groupBy(id_col, "bg.prev", "bg.token")
           .agg(F.count(F.lit(1)).alias("n")))
    if bigram_model is None:
        # self-trained: the bigram model is the per-(doc, bigram) table
        # re-aggregated over docs (integer sums — bit-identical to a
        # direct corpus count), so materialize the per-doc table once
        # instead of running the corpus bigram explode twice (§1.2)
        per = _materialized(per)
        bigram_model = (per.groupBy("prev", "token")
                        .agg(F.sum("n").alias("count")))
    if unigram_model is None:
        # consumed twice (vocab-size agg + the context join) — cache, or
        # the corpus token count runs twice. NOT derivable from the
        # bigram table: a single-token document's token never enters a
        # pair, and c(prev) must count ALL occurrences including
        # document-final ones.
        unigram_model = _materialized(unigram_counts(df, text_col))
    vocab = int(unigram_model.agg(
        F.count(F.lit(1)).alias("v")).first()["v"] or 0)

    bgm = bigram_model.select("prev", "token",
                              F.col("count").alias("__cbg"))
    ugm = unigram_model.select(F.col("token").alias("prev"),
                               F.col("count").alias("__cprev"))
    logp = F.log(
        (F.coalesce(F.col("__cbg"), F.lit(0)) + F.lit(smoothing_k))
        / (F.coalesce(F.col("__cprev"), F.lit(0))
           + F.lit(smoothing_k * (vocab + 1))))
    joined = (per.join(_hinted(bgm, broadcast_model), ["prev", "token"],
                       "left")
              .join(_hinted(ugm, broadcast_model), ["prev"], "left")
              .select(F.col(id_col),
                      F.concat("prev", F.lit(" "), "token").alias("__bg"),
                      F.col("n"), (F.col("n") * logp).alias("contrib")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("__bg", "contrib"))),
        lambda s: s["contrib"])
    total = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    score = total / F.sum("n")
    if round_to is not None:
        score = F.round(score, round_to)
    return (joined.groupBy(id_col)
            .agg(F.sum("n").alias("n_bigrams"),
                 score.alias("mean_logprob")))


def doc_mean_kn_logprob(df: DataFrame,
                        bigram_model: DataFrame | None = None,
                        unigram_model: DataFrame | None = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        discount: float = 0.75,
                        smoothing_k: float = 1.0,
                        round_to: int | None = None,
                        broadcast_model: bool | None = None) -> DataFrame:
    """Per-document mean conditional ln-probability under an
    INTERPOLATED KNESER-NEY bigram model — the smoothing the
    KenLM-perplexity quality filters (CCNet-style) actually use, next
    to the add-k cousins above: (id_col, n_bigrams, mean_logprob).

    p(t | prev) = max(c(prev,t) - D, 0) / c(prev)
                  + D * N1+(prev,.) / c(prev) * Pcont(t)

    with D = ``discount`` and the continuation distribution add-k
    floored so unseen continuations stay finite and the whole model is
    replayable by a SQL twin:

    Pcont(t) = (N1+(., t) + k) / (T + k * (V + 1))

    (N1+ are distinct-neighbor counts, T = distinct bigram types, V =
    unigram vocabulary). A context never seen in training backs off to
    Pcont(t) entirely. Why KN beats add-k as a quality signal: the
    continuation probability ranks tokens by how many DISTINCT
    contexts they follow, so boilerplate tokens glued to one context
    ("Francisco" after "San") stop inflating fluency scores.

    100 TB posture matches doc_mean_bigram_logprob: the three model
    frames (bigram counts + its two groupBys) are model-grain; scoring
    pre-aggregates to per-(doc, distinct bigram) before the joins;
    the two scalars (T, V) are one-row aggregates; the per-doc sum
    folds bigram-sorted so the float addition order — and therefore
    the hash — is engine- and partitioning-independent."""
    from openapc_olap_spark.operators.dedup import _materialized

    toks = text.tokens(text_col)
    n = F.size(toks)
    pairs = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("token")))
    ).otherwise(F.array().cast("array<struct<prev:string,token:string>>"))
    per = (df.select(F.col(id_col), F.explode(pairs).alias("bg"))
           .groupBy(id_col, "bg.prev", "bg.token")
           .agg(F.count(F.lit(1)).alias("n")))
    if bigram_model is None:
        # self-trained: derive the bigram counts from the materialized
        # per-(doc, bigram) table instead of a second corpus explode
        # (§1.2; integer sums — bit-identical to a direct count)
        per = _materialized(per)
        bigram_model = (per.groupBy("prev", "token")
                        .agg(F.sum("n").alias("count")))
    # consumed three times (ctx/cont groupBys + the scoring join)
    bigram_model = _materialized(bigram_model)
    if unigram_model is None:
        unigram_model = unigram_counts(df, text_col)
    # ONE driver action for both model scalars (round 14, guide §5 —
    # fewer driver round-trips): the two 1-row aggregates cross-join
    # into a single job instead of two sequential .first() barriers
    row = (bigram_model.agg(F.count(F.lit(1)).alias("t"))
           .crossJoin(unigram_model.agg(F.count(F.lit(1)).alias("v")))
           .first())
    t_types = int(row["t"] or 0)
    vocab = int(row["v"] or 0)
    ctx = (bigram_model.groupBy("prev")
           .agg(F.sum("count").alias("__c1"),
                F.count(F.lit(1)).alias("__n1f")))
    cont = (bigram_model.groupBy("token")
            .agg(F.count(F.lit(1)).alias("__n1b")))
    bgm = bigram_model.select("prev", "token",
                              F.col("count").alias("__cbg"))

    pc = ((F.coalesce(F.col("__n1b"), F.lit(0)) + F.lit(smoothing_k))
          / F.lit(float(t_types + smoothing_k * (vocab + 1))))
    seen = (F.greatest(F.coalesce(F.col("__cbg"), F.lit(0))
                       - F.lit(discount), F.lit(0.0))
            / F.col("__c1")
            + F.lit(discount) * F.col("__n1f") / F.col("__c1") * pc)
    p = F.when(F.col("__c1").isNotNull(), seen).otherwise(pc)
    joined = (per.join(_hinted(bgm, broadcast_model),
                       ["prev", "token"], "left")
              .join(_hinted(ctx, broadcast_model), ["prev"], "left")
              .join(_hinted(cont, broadcast_model), ["token"], "left")
              .select(F.col(id_col),
                      F.concat("prev", F.lit(" "), "token").alias("__bg"),
                      F.col("n"), (F.col("n") * F.log(p)).alias("contrib")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("__bg", "contrib"))),
        lambda s: s["contrib"])
    total = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    score = total / F.sum("n")
    if round_to is not None:
        score = F.round(score, round_to)
    return (joined.groupBy(id_col)
            .agg(F.sum("n").alias("n_bigrams"),
                 score.alias("mean_logprob")))
