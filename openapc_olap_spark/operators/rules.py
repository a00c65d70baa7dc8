"""Gopher-style heuristic quality rules (SURVEY.md §2.9 X4 family —
the named-rule filter bundle of web-corpus curation, after Rae et al.
2021's Gopher rules and their C4/RefinedWeb relatives; reference has no
equivalent, driver-mandated LLM-pipeline surface).

Where operators.text.quality_score blends signals into one number, this
module keeps each rule a NAMED boolean column — production curation
wants per-rule violation accounting (which rule fired, how often, per
source) before committing to a drop, and ablating one rule must not
disturb the others.

All pure Catalyst expressions over one tokenize pass; the rule report is
a single map-side-combined aggregation. Embarrassingly parallel at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def rule_columns(text_col: str = "text",
                 min_tokens: int = 50, max_tokens: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_word_ratio: float = 0.8,
                 min_distinct_ratio: float = 0.3) -> dict[str, Column]:
    """The rule bundle as named PASS columns (True = document passes):

    - doc_length: min_tokens <= n_tokens <= max_tokens;
    - mean_word_length: in [min_mean_word_len, max_mean_word_len] —
      outside it, the text is symbol soup or concatenation junk;
    - symbol_ratio: #/… density below max_symbol_ratio (boilerplate and
      scraped-markup signal);
    - alpha_words: fraction of tokens containing at least one letter is
      at least min_alpha_word_ratio (tables of numbers fail);
    - distinct_tokens: distinct/total token ratio at least
      min_distinct_ratio (degenerate repetition fails).

    Each rule reads the SAME materializable token array; compose with
    ``with_rules`` so the tokenize happens once.
    """
    toks = text.tokens(text_col)
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1))
    mean_len = (F.aggregate(toks, F.lit(0).cast("long"),
                            lambda a, t: a + F.length(t)).cast("double")
                / safe_n)
    symbols = F.size(F.filter(
        toks, lambda t: t.rlike(r"^[#\.]{1,}$") | t.contains("#")
        | t.contains("…")))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-zÀ-ÿ]")))
    distinct_ratio = (F.size(F.array_distinct(toks)).cast("double")
                      / safe_n)
    return {
        "doc_length": (n >= min_tokens) & (n <= max_tokens),
        "mean_word_length": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio": (symbols.cast("double") / safe_n)
        <= max_symbol_ratio,
        "alpha_words": (alpha.cast("double") / safe_n)
        >= min_alpha_word_ratio,
        "distinct_tokens": distinct_ratio >= min_distinct_ratio,
    }


def with_rules(df: DataFrame, text_col: str = "text",
               **thresholds) -> DataFrame:
    """Attach every rule as ``rule_<name>`` boolean plus ``passes_all``."""
    cols = rule_columns(text_col, **thresholds)
    out = df
    for name, c in cols.items():
        out = out.withColumn(f"rule_{name}", c)
    all_pass = None
    for name in cols:
        c = F.col(f"rule_{name}")
        all_pass = c if all_pass is None else (all_pass & c)
    return out.withColumn("passes_all", all_pass)


def rule_report(df: DataFrame, text_col: str = "text",
                group_col: str | None = None, **thresholds) -> DataFrame:
    """Violation accounting: per group (or overall), document count,
    per-rule violation counts, and survivors. One aggregation."""
    flagged = with_rules(df, text_col, **thresholds)
    # derive the rule list from the bundle's own keys, not by scraping
    # rule_*-prefixed columns off the caller's frame (which may carry
    # unrelated columns with that prefix)
    rule_names = [f"rule_{n}"
                  for n in rule_columns(text_col, **thresholds)]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for rn in rule_names:
        aggs.append(F.sum((~F.col(rn)).cast("long"))
                    .alias(rn.replace("rule_", "fail_")))
    aggs.append(F.sum(F.col("passes_all").cast("long")).alias("n_pass"))
    if group_col is None:
        return flagged.agg(*aggs)
    return flagged.groupBy(group_col).agg(*aggs)
