"""Fuzzy string matching / record linkage (SURVEY.md §2.9 X2 extension —
the approximate-key join a curation stack needs where exact dedup stops:
title/author/venue variants, OCR'd strings, near-identical metadata rows
from different feeds. Reference has no equivalent; driver-mandated
LLM-pipeline surface).

Classic blocked edit-distance join, Spark-first:

1. **q-gram postings blocking.** Each string emits its DISTINCT
   positional-free q-grams; an equi-join on the gram pairs only strings
   sharing at least one (never all-pairs). ``gram_cap`` drops grams
   occurring in more than cap strings BEFORE the join — the stopword-
   gram guard, same df-cap discipline as ngram_jaccard (x14).
2. **Count-filter pruning.** Strings within edit distance k share at
   least max(|a|,|b|) - q + 1 - k*q q-grams (Gravano et al. 2001,
   the standard q-gram count bound) — applied on the aggregated shared
   count BEFORE any expensive verify, pairs failing the bound never
   reach levenshtein.
3. **Exact verify.** ``F.levenshtein`` (JVM, codegen) on the surviving
   sliver; identical semantics in DuckDB's levenshtein, so the whole
   operator is oracle-replayable.

The postings carry (gram, id) only — strings join back onto the
candidate PAIRS, so the wide columns never ride the gram exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct q-grams of the lowercased, whitespace-normalized string
    -> array<string>. Strings shorter than q yield their whole
    normalized self as the single gram (so short strings still block)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - q + 1, F.lit(1))),
        lambda i: s.substr(i, F.lit(q)))
    return F.array_distinct(grams)


def _norm(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fuzzy_duplicates(df: DataFrame, col: str = "text",
                     id_col: str = "doc_id", max_dist: int = 2,
                     q: int = 3,
                     gram_cap: int | None = None) -> DataFrame:
    """Self-join form: (id_a, id_b, dist) for all pairs with
    levenshtein(norm_a, norm_b) <= max_dist, id_a < id_b. Distance is
    on the NORMALIZED strings (lowercase, collapsed whitespace) — the
    linkage convention; identical-after-normalization pairs surface
    with dist 0."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    from openapc_olap_spark.operators.dedup import _materialized, _spread

    base = _materialized(_spread(df.select(
        F.col(id_col).alias("id"), _norm(col).alias("s"),
        qgrams(col, q).alias("__g"))))
    post = base.select("id", F.length("s").alias("__len"),
                       F.explode("__g").alias("gram"))
    if gram_cap is not None:
        small = (post.groupBy("gram")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= gram_cap)
                 .select("gram"))
        post = post.join(small, ["gram"], "left_semi")
    l, r = post.alias("l"), post.alias("r")
    shared = (l.join(r, (F.col("l.gram") == F.col("r.gram"))
                     & (F.col("l.id") < F.col("r.id")))
              .groupBy(F.col("l.id").alias("id_a"),
                       F.col("r.id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("__shared"),
                   F.first("l.__len").alias("__la"),
                   F.first("r.__len").alias("__lb")))
    # Gravano q-gram count lower bound for edit distance <= k
    bound = (F.greatest("__la", "__lb") - F.lit(q - 1)
             - F.lit(max_dist * q))
    cands = (shared.filter(F.col("__shared") >= F.greatest(bound, F.lit(1)))
             .select("id_a", "id_b"))
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("__sa"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("__sb"))
    return (cands.join(sa, ["id_a"]).join(sb, ["id_b"])
            .withColumn("dist", F.levenshtein("__sa", "__sb"))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def fuzzy_join(left: DataFrame, right: DataFrame, col: str,
               left_id: str = "id_l", right_id: str = "id_r",
               max_dist: int = 2, q: int = 3,
               gram_cap: int | None = None) -> DataFrame:
    """Two-frame form: (left_id, right_id, dist) for cross-frame pairs
    within ``max_dist`` — the record-linkage join (match a dirty feed
    against a canonical table). Same blocking + bound + verify."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    from openapc_olap_spark.operators.dedup import _materialized, _spread

    def prep(df, id_col, side):
        return _materialized(_spread(df.select(
            F.col(id_col).alias(f"__id_{side}"),
            _norm(col).alias(f"__s_{side}"),
            qgrams(col, q).alias("__g"))))

    bl, br = prep(left, left_id, "l"), prep(right, right_id, "r")
    pl = bl.select("__id_l", F.length("__s_l").alias("__la"),
                   F.explode("__g").alias("gram"))
    pr = br.select("__id_r", F.length("__s_r").alias("__lb"),
                   F.explode("__g").alias("gram"))
    if gram_cap is not None:
        counts = (pl.select("gram").unionByName(pr.select("gram"))
                  .groupBy("gram").agg(F.count(F.lit(1)).alias("__n"))
                  .filter(F.col("__n") <= gram_cap).select("gram"))
        pl = pl.join(counts, ["gram"], "left_semi")
        pr = pr.join(counts, ["gram"], "left_semi")
    shared = (pl.join(pr, ["gram"])
              .groupBy("__id_l", "__id_r")
              .agg(F.count(F.lit(1)).alias("__shared"),
                   F.first("__la").alias("__la"),
                   F.first("__lb").alias("__lb")))
    bound = (F.greatest("__la", "__lb") - F.lit(q - 1)
             - F.lit(max_dist * q))
    cands = (shared.filter(F.col("__shared") >= F.greatest(bound, F.lit(1)))
             .select("__id_l", "__id_r"))
    return (cands
            .join(bl.select("__id_l", "__s_l"), ["__id_l"])
            .join(br.select("__id_r", "__s_r"), ["__id_r"])
            .withColumn("dist", F.levenshtein("__s_l", "__s_r"))
            .filter(F.col("dist") <= max_dist)
            .select(F.col("__id_l").alias(left_id),
                    F.col("__id_r").alias(right_id), "dist"))
