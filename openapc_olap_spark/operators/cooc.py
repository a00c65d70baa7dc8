"""Windowed token co-occurrence + PMI (SURVEY.md §2.9 X4 extension —
the word2vec/SGNS training-pair statistic and the classic collocation
detector: PMI-ranked pairs surface multiword expressions ("new york",
"machine learning") that tokenizer vocabularies and phrase-mining passes
feed on. Reference has no equivalent; driver-mandated LLM-pipeline
surface).

PMI(a, b) = ln( (c_ab / P) / ((c_a / T) * (c_b / T)) )

where c_ab counts unordered within-window pairs, P is the total pair
count, c_* are corpus token counts, and T the total token count — the
fully-specified symmetric-window variant, so any engine can replay it.

100 TB posture:
- pair enumeration is LINEAR, never quadratic: each token position emits
  ``window`` shifted join keys (doc, pos+k), and an equi-join on
  (doc, pos) pairs it with the token there — corpus tokens x window
  rows, no document ever self-joins freely.
- both sides of that join come from ONE posexplode scan, materialized
  once (dedup._materialized), so the corpus is tokenized once.
- counts pre-aggregate map-side on (a, b); the unigram join frames are
  vocab-sized (AQE broadcasts when they fit); totals are one-row
  aggregates — the only driver scalars.
- ``min_pair_count`` prunes the pair tail BEFORE the unigram joins (PMI
  on hapax pairs is noise anyway — the standard practice). P stays the
  UNFILTERED total, so reported PMIs are absolute (cross-corpus
  comparable) regardless of the reporting threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def _positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, tok) — one posexplode pass over the tokenizer."""
    return df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(text.tokens(text_col)).alias("__pos", "__tok"))


def cooccurrence_counts(df: DataFrame, window: int = 2,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(tok_a, tok_b, n_pairs) over unordered within-``window`` token
    pairs, tok_a <= tok_b (self-pairs "x x" from repeated tokens kept —
    they are real co-occurrences). Forward offsets only, so each
    unordered occurrence counts exactly once."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from openapc_olap_spark.operators.dedup import _materialized

    pos = _materialized(_positions(df, id_col, text_col))
    left = pos.select(
        "__doc", "__tok",
        F.explode(F.sequence(
            F.col("__pos") + 1,
            F.col("__pos") + window)).alias("__pos"))
    pairs = left.join(pos.withColumnRenamed("__tok", "__tok_r"),
                      ["__doc", "__pos"])
    return (pairs.select(
                F.least("__tok", "__tok_r").alias("tok_a"),
                F.greatest("__tok", "__tok_r").alias("tok_b"))
            .groupBy("tok_a", "tok_b")
            .agg(F.count(F.lit(1)).alias("n_pairs")))


def pmi_pairs(df: DataFrame, window: int = 2, min_pair_count: int = 2,
              id_col: str = "doc_id", text_col: str = "text",
              round_to: int | None = None) -> DataFrame:
    """(tok_a, tok_b, n_pairs, pmi) for pairs seen >= ``min_pair_count``
    times. High-PMI pairs are collocations; NEGATIVE PMI flags tokens
    that repel (useful for boilerplate detection)."""
    from openapc_olap_spark.operators.lm import unigram_counts

    pairs_all = cooccurrence_counts(df, window, id_col, text_col)
    pairs = pairs_all
    if min_pair_count > 1:
        from openapc_olap_spark.operators.dedup import _materialized
        pairs_all = _materialized(pairs_all)
        pairs = pairs_all.filter(F.col("n_pairs") >= min_pair_count)
    uni = unigram_counts(df, text_col)
    # P is the total pair count BEFORE the min_pair_count filter (the
    # module formula): the filter only prunes which pairs are REPORTED,
    # it must not rescale every reported probability (ADVICE r07 — the
    # post-filter total inflated all PMIs by ln(true_total/filtered)).
    totals = (pairs_all.agg(F.sum("n_pairs")).first()[0] or 0,
              df.agg(F.sum(F.size(text.tokens(text_col)))).first()[0] or 0)
    p_total, t_total = float(totals[0]), float(totals[1])
    if p_total == 0 or t_total == 0:
        return pairs.withColumn("pmi", F.lit(None).cast("double"))
    ua = uni.select(F.col("token").alias("tok_a"),
                    F.col("count").alias("__ca"))
    ub = uni.select(F.col("token").alias("tok_b"),
                    F.col("count").alias("__cb"))
    pmi = F.log((F.col("n_pairs") / F.lit(p_total))
                / ((F.col("__ca") / F.lit(t_total))
                   * (F.col("__cb") / F.lit(t_total))))
    if round_to is not None:
        pmi = F.round(pmi, round_to)
    return (pairs.join(ua, ["tok_a"]).join(ub, ["tok_b"])
            .select("tok_a", "tok_b", "n_pairs", pmi.alias("pmi")))


def top_collocations(df: DataFrame, k: int = 20, window: int = 2,
                     min_pair_count: int = 2, id_col: str = "doc_id",
                     text_col: str = "text",
                     round_to: int | None = None) -> DataFrame:
    """The k highest-PMI pairs (pmi desc, then tok_a/tok_b asc) —
    TakeOrderedAndProject, no global sort."""
    scored = pmi_pairs(df, window, min_pair_count, id_col, text_col,
                       round_to)
    return (scored.orderBy(F.col("pmi").desc(), F.col("tok_a").asc(),
                           F.col("tok_b").asc())
            .limit(k))
