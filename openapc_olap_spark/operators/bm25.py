"""BM25 ranked retrieval over a document corpus (SURVEY.md §2.9 X4
extension — the lexical-search half of a training-data curation stack:
TF-IDF (tfidf.py) surfaces corpus-characteristic TERMS, BM25 ranks
DOCUMENTS against a query — dataset search, eval-set mining, targeted
decontamination lookups. Reference has no equivalent; part of the
driver-mandated LLM-pipeline surface).

Okapi BM25 with the Lucene non-negative IDF:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(D, q) = sum_t idf(t) * tf * (k1 + 1)
                               / (tf + k1 * (1 - b + b * |D| / avgdl))

100 TB posture:
- the corpus statistics (doc frequency per term, N, avgdl) come from ONE
  tokenize pass with map-side-combined aggregation; the df frame is
  vocab-sized, never corpus-sized (same posture as ``lm.unigram_counts``),
  and ``min_df`` prunes the hapax tail.
- scoring a LITERAL query filters the exploded tokens to the query's
  terms BEFORE any aggregation — an ``isin`` over a handful of literals
  that pushes into the scan — so per-query work is proportional to
  matching postings, not the corpus; the per-(doc, term) pre-aggregation
  bounds the join input by per-doc matched vocab.
- the query-side statistics join is a broadcast of |q| rows.
- top-k is TakeOrderedAndProject (partial top-k per partition, no global
  sort).
- the per-doc score folds a term-SORTED contribution list (the
  x54/x58 discipline) so double additions associate identically across
  partitionings and engines — hash-certifiable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def corpus_stats(df: DataFrame, text_col: str = "text",
                 min_df: int = 1) -> DataFrame:
    """(token, df) — document frequency per distinct term, the BM25
    sufficient statistic alongside N and avgdl. One map-side-combined
    aggregation over per-doc DISTINCT tokens."""
    out = (df.select(F.explode(F.array_distinct(text.tokens(text_col)))
                     .alias("token"))
           .groupBy("token").agg(F.count(F.lit(1)).alias("df")))
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out


def bm25_score(df: DataFrame, query: list[str],
               id_col: str = "doc_id", text_col: str = "text",
               k1: float = 1.2, b: float = 0.75,
               stats: DataFrame | None = None,
               n_docs: int | None = None, avgdl: float | None = None,
               round_to: int | None = None) -> DataFrame:
    """(id_col, score) for every document matching at least one query
    term, under Okapi BM25. Pass a pre-built ``corpus_stats`` frame plus
    its ``n_docs``/``avgdl`` scalars to amortize the statistics pass
    across queries; otherwise they are derived from ``df`` (two
    aggregate jobs — N+avgdl in one, df counts in the other).

    Query terms are lowercased to match the tokenizer; duplicate query
    terms count once (standard bag-of-words query semantics score each
    TERM, and the per-(doc, term) grain below deduplicates naturally).
    """
    terms = sorted({t.lower() for t in query if t})
    if not terms:
        raise ValueError("query must contain at least one term")
    if n_docs is None or avgdl is None:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(text.tokens(text_col))).alias("avgdl")).first()
        n_docs = int(row["n"] or 0)
        avgdl = float(row["avgdl"] or 0.0)
    if stats is None:
        stats = corpus_stats(df, text_col)
    if n_docs == 0 or avgdl <= 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, score double")

    qdf = (stats.filter(F.col("token").isin(terms))
           .select("token",
                   F.log(F.lit(1.0)
                         + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                         / (F.col("df") + 0.5)).alias("idf")))

    toks = text.tokens(text_col)
    per = (df.select(F.col(id_col), F.size(toks).alias("__dl"),
                     F.explode(toks).alias("token"))
           .filter(F.col("token").isin(terms))
           .groupBy(id_col, "token")
           .agg(F.count(F.lit(1)).alias("tf"),
                F.first("__dl").alias("__dl")))
    lennorm = (F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("__dl") / F.lit(avgdl)))
    contrib = (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf") + lennorm))
    joined = (per.join(F.broadcast(qdf), ["token"])
              .select(F.col(id_col), F.col("token"),
                      contrib.alias("contrib")))
    # deterministic-order sum: fold term-sorted contributions (x54/x58)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("token", "contrib"))),
        lambda s: s["contrib"])
    score = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    if round_to is not None:
        score = F.round(score, round_to)
    return joined.groupBy(id_col).agg(score.alias("score"))


def bm25_top_k(df: DataFrame, query: list[str], k: int = 10,
               id_col: str = "doc_id", text_col: str = "text",
               k1: float = 1.2, b: float = 0.75,
               stats: DataFrame | None = None,
               n_docs: int | None = None, avgdl: float | None = None,
               round_to: int | None = None) -> DataFrame:
    """The k best-scoring documents (score desc, id asc tie-break) —
    plan shape: score -> TakeOrderedAndProject, no global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = bm25_score(df, query, id_col, text_col, k1, b,
                        stats, n_docs, avgdl, round_to)
    return (scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def idf_value(n_docs: int, df_count: int) -> float:
    """Driver-side twin of the IDF expression (for tests/oracles)."""
    return math.log(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))
