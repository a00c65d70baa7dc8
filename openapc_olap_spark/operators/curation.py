"""End-to-end training-data curation pipeline (SURVEY.md §2.9 capstone).

Composes the X-family operators into the standard pre-training data prep
flow — quality filter -> deterministic exact dedup -> PII redaction ->
token accounting — as ONE declarative plan:

- ``curate`` returns the curated corpus (the production path);
- ``curation_funnel`` returns the one-row funnel summary (docs in, docs
  passing quality, docs surviving dedup, PII matches redacted, tokens out)
  computed in a single window + aggregate pass — the monitoring view a
  100 TB curation job emits per run.

Scale shape: quality/fingerprint/PII/token columns are pure codegen'd
expressions over one scan; the only shuffle is the fingerprint window for
deterministic dedup (identical to ``dedup.exact_dedup``); the funnel
aggregate is map-side combined. No UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def curate(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
           min_quality: float = 0.35, lang: str = "en") -> DataFrame:
    """The curated corpus: quality-filtered, exact-deduped (keep min id per
    normalized fingerprint, among passing docs), PII-redacted, with
    ``quality`` / ``n_pii_matches`` / ``n_tokens`` metric columns."""
    pii = text.pii_counts(text_col)
    scored = (df
              .withColumn("quality", text.quality_score(text_col, lang))
              .withColumn("__fp", text.fingerprint(text_col))
              .withColumn("n_pii_matches",
                          sum(pii.values(), F.lit(0))))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    kept = (scored.filter(F.col("quality") >= min_quality)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    return (kept
            .withColumn(text_col, text.redact_pii(text_col))
            .withColumn("n_tokens", text.token_count(text_col))
            .drop("__fp", "__rn"))


def curation_funnel(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", min_quality: float = 0.35,
                    lang: str = "en") -> DataFrame:
    """One-row funnel summary of ``curate`` over ``df``, in ONE pass.

    Dedup-among-passing-docs is folded into a single window over ALL docs:
    partitions ordered (passes-quality DESC, id ASC), so rank 1 is the
    min-id passing doc whenever the group has one — no second scan for the
    pre-filter count. Columns: n_input, n_quality, n_unique,
    n_pii_matches (over kept docs), total_tokens (post-redaction, kept).
    """
    pii = text.pii_counts(text_col)
    qp = (text.quality_score(text_col, lang) >= min_quality).alias("__qp")
    scored = df.select(
        F.col(id_col).alias("__id"),
        qp,
        text.fingerprint(text_col).alias("__fp"),
        sum(pii.values(), F.lit(0)).alias("__pii"),
        F.size(text.tokens(text.redact_pii(text_col))).alias("__toks"))
    w = Window.partitionBy("__fp").orderBy(F.col("__qp").desc(),
                                           F.col("__id").asc())
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    kept = F.col("__qp") & (F.col("__rn") == 1)
    zero = F.lit(0).cast("long")
    # coalesce: sum over zero rows is NULL — an empty input/partition must
    # still report a fully-defined (all-zero) funnel to monitoring
    return ranked.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.coalesce(F.sum(F.col("__qp").cast("long")), zero)
         .alias("n_quality"),
        F.coalesce(F.sum(kept.cast("long")), zero).alias("n_unique"),
        F.coalesce(F.sum(F.when(kept, F.col("__pii")).otherwise(0)), zero)
         .alias("n_pii_matches"),
        F.coalesce(F.sum(F.when(kept, F.col("__toks")).otherwise(0)), zero)
         .alias("total_tokens"))
