"""Train/eval decontamination: flag (or drop) training documents that share
word n-grams with an evaluation/benchmark set (SURVEY.md §2.9 extension
surface — the standard pretraining-pipeline step popularized by the GPT-3
appendix-C / The Pile decontamination procedure; 13-gram overlap is the
conventional setting, configurable here).

100 TB posture
--------------
The asymmetry is the whole design: eval suites are tiny (1e5-1e7 distinct
n-grams) while the train corpus is the 100 TB side.  So:

* the eval n-gram set is built once, hashed to 8-byte longs, and BROADCAST —
  the train scan never shuffles its text or its grams;
* the per-document overlap count comes from ONE map-side-combined groupBy
  on (doc_id): the explode → broadcast-left-join → count pipeline emits at
  most one combined row per document per input partition, so the only
  shuffle is ~one short row per document, independent of document length;
* there is no join-back pass — zero overlap counts fall out of
  ``count(match)`` over the left join (explode_outer keeps gram-less docs).

Dropping contaminated docs is a broadcast anti-join against the flagged-id
set (small by construction — contamination rates are per-mille).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def _gram_hash(g: Column) -> Column:
    """8-byte gram key: xxhash64 of the gram string, null-preserving.

    ``xxhash64(NULL)`` returns the seed rather than NULL, so the null row
    explode_outer emits for a gram-less document is guarded explicitly —
    otherwise it could (with probability 2**-64, but still) collide with a
    real eval gram's hash."""
    return F.when(g.isNotNull(), F.xxhash64(g))


def eval_ngram_set(eval_df: DataFrame, text_col: str = "text", n: int = 13,
                   hashed: bool = True) -> DataFrame:
    """Distinct word n-grams of the eval corpus as a single column ``g``
    (8-byte xxhash64 longs when ``hashed``, raw strings otherwise).

    This is the broadcast side: distinct() collapses it to benchmark-suite
    size before it ever meets the train scan."""
    g = F.explode(text.shingles(text_col, n)).alias("__g_raw")
    out = eval_df.select(g)
    key = _gram_hash(F.col("__g_raw")) if hashed else F.col("__g_raw")
    return out.select(key.alias("g")).distinct()


def ngram_overlap(train_df: DataFrame, eval_grams: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, hashed: bool = True) -> DataFrame:
    """Per-train-document count of DISTINCT eval n-grams it contains ->
    (id_col, n_overlap).  Every train document appears, including ones too
    short to produce a single n-gram (n_overlap = 0).

    One shuffle total: explode the (distinct) per-doc grams, broadcast-left-
    join the eval set, count matches per document.  ``shingles`` already
    dedups within the document, so the count is distinct-gram overlap
    without a second aggregation."""
    g = F.explode_outer(text.shingles(text_col, n)).alias("__g_raw")
    grams = train_df.select(F.col(id_col), g)
    key = _gram_hash(F.col("__g_raw")) if hashed else F.col("__g_raw")
    grams = grams.select(id_col, key.alias("g"))
    ev = F.broadcast(eval_grams.withColumn("__hit", F.lit(1)))
    return (grams.join(ev, "g", "left")
            .groupBy(id_col)
            .agg(F.count("__hit").alias("n_overlap")))


def decontaminate(train_df: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, min_hits: int = 1,
                  hashed: bool = True) -> DataFrame:
    """Flag frame: (id_col, n_overlap, contaminated) for every train doc,
    ``contaminated`` iff it shares >= ``min_hits`` distinct n-grams with the
    eval corpus."""
    ev = eval_ngram_set(eval_df, text_col, n, hashed)
    counts = ngram_overlap(train_df, ev, id_col, text_col, n, hashed)
    return counts.withColumn(
        "contaminated", F.col("n_overlap") >= F.lit(min_hits))


def drop_contaminated(train_df: DataFrame, eval_df: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 13, min_hits: int = 1) -> DataFrame:
    """Train frame with contaminated documents removed — broadcast anti-join
    against the flagged-id set (small: contamination is the exception, so
    the flagged side is broadcastable long after the corpus is not)."""
    flagged = (decontaminate(train_df, eval_df, id_col, text_col, n,
                             min_hits)
               .filter(F.col("contaminated"))
               .select(id_col))
    return train_df.join(F.broadcast(flagged), id_col, "left_anti")
