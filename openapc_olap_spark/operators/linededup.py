"""Corpus-level repeated-line removal (SURVEY.md §2.9 X1/X4 family — the
RefinedWeb/MassiveText boilerplate rule: a line that recurs across many
documents is navigation/cookie-banner/footer boilerplate, not content;
C4 applies the same idea at sentence-span grain. Reference has no
equivalent; driver-mandated LLM-pipeline surface).

Shape at 100 TB: one corpus-sized (doc, pos, line) explode feeding a
map-side-combined line-frequency aggregate (line-cardinality output,
far smaller than the corpus), then one join of the exploded lines
against the HOT-line set only (boilerplate lines are by definition few
distinct values — the join's build side is tiny and AQE broadcasts it),
and a per-doc position-sorted fold to reassemble. No UDF, no window
over the corpus, no driver-side text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_frequencies(df: DataFrame, text_col: str = "text",
                     sep: str = "\n") -> DataFrame:
    """(line, n_docs): how many DISTINCT documents contain each line.
    ``sep`` is a Java REGEX (Spark split semantics) — escape it if the
    separator has meta-characters; the default newline is literal-safe.
    Distinct-per-doc before the count, so a page repeating its own
    footer 50 times counts once — the boilerplate signal is cross-doc
    recurrence, not within-doc repetition."""
    return (df.select(F.explode(F.array_distinct(
                F.split(F.col(text_col), sep))).alias("line"))
            .filter(F.col("line") != "")
            .groupBy("line")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def remove_boilerplate_lines(df: DataFrame, max_docs: int,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             sep: str = "\n") -> DataFrame:
    """Strip every line occurring in more than ``max_docs`` distinct
    documents, from ALL documents. Output keeps the input columns with
    ``text_col`` rewritten plus ``n_removed`` (line occurrences dropped,
    within-doc repeats included).

    The anti-join runs against the hot-line set only (lines with
    n_docs > max_docs) — line-cardinality, heavily skew-concentrated,
    so the set is small and the join map-side; documents never shuffle.
    Reassembly is a position-sorted fold per doc (one shuffle at doc
    grain, the operator's only corpus-sized exchange besides the
    frequency aggregate)."""
    hot = (line_frequencies(df, text_col, sep)
           .filter(F.col("n_docs") > max_docs)
           .select("line", F.lit(True).alias("__hot")))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "line"))
    marked = lines.join(hot, ["line"], "left")
    rebuilt = (marked.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(F.struct(
                        F.col("__pos"),
                        F.col("line"),
                        F.coalesce(F.col("__hot"), F.lit(False))
                        .alias("hot")))).alias("__ls"))
               .select(
                   F.col(id_col),
                   F.array_join(F.transform(
                       F.filter("__ls", lambda s: ~s["hot"]),
                       lambda s: s["line"]), sep).alias(text_col),
                   F.size(F.filter("__ls", lambda s: s["hot"]))
                   .alias("n_removed")))
    others = [c for c in df.columns if c not in (id_col, text_col)]
    if others:
        rebuilt = rebuilt.join(df.select(id_col, *others), [id_col])
    return rebuilt
