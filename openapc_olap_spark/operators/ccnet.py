"""CCNet-style per-language quality bucketing (Wenzek et al. 2020,
arXiv:1911.00359): split each language's documents into head / middle /
tail by language-model score terciles — the standard pretraining recipe
of "train on head+middle, drop or downweight tail", composed from this
repo's LM scorer (``operators.lm.doc_mean_logprob``) and an exact
per-group quantile cut.

Scores are mean token log-probabilities (higher = better), the
monotone inverse of CCNet's perplexity ordering (lower ppl = better) —
so ``head`` here is the TOP score tercile. Cut points use Spark's
exact interpolated ``percentile`` aggregate, which implements the same
R-7 rule as DuckDB's ``quantile_cont`` (the x69 precedent), so the
bucket boundaries hash-certify cross-engine.

100 TB posture: ONE map-side-combinable group quantile aggregate
(group-cardinality rows out — languages, not documents), broadcast
back over the scored frame, label = two comparisons. Documents are
never shuffled; ties at a boundary go to the better bucket
(>= upper -> head, >= lower -> middle), which is deterministic because
the cut is a pure function of the group's value multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_score_cuts(scored: DataFrame, by: str = "lang",
                     score_col: str = "score",
                     cuts: tuple[float, float] = (1 / 3, 2 / 3)) -> DataFrame:
    """(by, cut_lo, cut_hi): exact interpolated score quantiles per
    group. ``cuts`` are fractions of the ASCENDING score distribution;
    NULL scores are excluded (Spark and DuckDB agree on NULL-skipping
    aggregate semantics)."""
    lo, hi = cuts
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"cuts must satisfy 0 <= lo < hi <= 1, got {cuts}")
    return (scored.filter(F.col(score_col).isNotNull())
            .groupBy(by)
            .agg(F.percentile(score_col, F.lit(lo)).alias("cut_lo"),
                 F.percentile(score_col, F.lit(hi)).alias("cut_hi")))


def perplexity_buckets(scored: DataFrame, by: str = "lang",
                       score_col: str = "score",
                       cuts: tuple[float, float] = (1 / 3, 2 / 3),
                       bucket_col: str = "bucket") -> DataFrame:
    """All input columns plus ``bucket`` in {'head','middle','tail'}
    (NULL score -> NULL bucket): head = score >= the upper cut of its
    group, tail = below the lower cut. The cuts frame is
    group-cardinality, so the join broadcasts at any corpus size."""
    from openapc_olap_spark.operators.dedup import _materialized

    # scored is consumed TWICE (the cuts aggregate AND the label join);
    # callers pass expensive upstreams (LM scoring, span-dedup, lang-id
    # prediction) that would otherwise evaluate once per consumer —
    # cache the per-doc frame (one narrow row per document) before
    # fanning out (round 14, the dedup._materialized rule)
    scored = _materialized(scored)
    cut_df = group_score_cuts(scored, by, score_col, cuts)
    s = F.col(score_col)
    bucket = (F.when(s.isNull(), F.lit(None).cast("string"))
               .when(s >= F.col("cut_hi"), F.lit("head"))
               .when(s >= F.col("cut_lo"), F.lit("middle"))
               .otherwise(F.lit("tail")))
    return (scored.join(F.broadcast(cut_df), [by], "left")
            .withColumn(bucket_col, bucket)
            .drop("cut_lo", "cut_hi"))


def bucket_report(bucketed: DataFrame, by: str = "lang",
                  bucket_col: str = "bucket") -> DataFrame:
    """(by, bucket, n_docs) — the audit view: tercile cuts put ~1/3 of
    each group per bucket, skewed only by ties and tiny groups."""
    return (bucketed.groupBy(by, bucket_col)
            .agg(F.count(F.lit(1)).alias("n_docs")))
