"""TF-IDF keyword extraction (SURVEY.md §2.9 extension surface): per-term
term-frequency / document-frequency statistics and top-k salient terms per
document — the classic relevance weighting a curation pipeline uses for
keyword tagging, topic hints, and boilerplate detection.

100 TB posture
--------------
* TF is one explode + map-side-combined groupBy on (doc, term) — the same
  shuffle discipline as the vocabulary pass (text.py vocab).
* DF derives from the TF frame (already one row per (doc, term)), so the
  second aggregation shuffles vocabulary-sized data, not corpus-sized.
* The corpus size N joins in as a broadcast single-row frame (no driver
  round-trip inside the plan); the DF join is vocabulary vs TF — AQE
  picks broadcast when the vocab (or its `max_df_ratio`-pruned survivor
  set) is small enough.
* `max_df_ratio` doubles as the stopword guard: terms in more than that
  fraction of documents carry ~zero idf anyway, and pruning them BEFORE
  the top-k window removes exactly the rows that make boilerplate terms
  hot keys.
* Top-k reuses ranking.top_k_per_group (salted two-stage available for
  pathological documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import ranking, text


def term_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id_col, term, tf): raw occurrence count per document term."""
    return (df.select(F.col(id_col),
                      F.explode(text.tokens(text_col)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def doc_frequencies(tf_df: DataFrame) -> DataFrame:
    """(term, df) from a term_frequencies frame — its rows are already
    distinct (doc, term), so this is a plain count."""
    return tf_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    max_df_ratio: float | None = None,
                    salt_parts: int = 1,
                    round_to: int | None = None,
                    materialize: bool = True) -> DataFrame:
    """Top-k terms per document by tf * ln(N/df), ties broken by term
    ascending -> (id_col, term, tf, df, tfidf, rk). N counts ALL input
    documents (including token-less ones, which simply yield no rows).

    ``round_to`` rounds the score BEFORE ranking: mathematically equal
    scores reached via different arithmetic (2*ln(2) vs ln(4)) can differ
    by 1 ulp between libm implementations, so cross-engine-reproducible
    pipelines should rank on a rounded score and let the term tie-break
    decide — the correctness gate runs with round_to=6."""
    tf = term_frequencies(df, id_col, text_col)
    if materialize:
        # tf feeds BOTH the score join and the df aggregation; without
        # persisting it, each consumer re-runs the corpus explode+agg —
        # the dominant cost at scale (same rationale as dedup._materialized)
        from openapc_olap_spark.operators.dedup import _materialized
        tf = _materialized(tf)
    dfreq = doc_frequencies(tf)
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n)))
    if max_df_ratio is not None:
        scored = scored.filter(
            F.col("df") <= F.col("__n") * F.lit(max_df_ratio))
    score = F.col("tf") * F.log(F.col("__n") / F.col("df"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = scored.withColumn("tfidf", score)
    top = ranking.top_k_per_group(scored, [id_col], "tfidf", k,
                                  id_col="term", salt_parts=salt_parts)
    return top.select(id_col, "term", "tf", "df", "tfidf", "rk")
