"""Byte-pair-encoding vocabulary induction (SURVEY.md §2.9 X4 family —
the tokenizer-training half of a pretraining data pipeline; reference has
no equivalent, driver-mandated LLM-pipeline surface).

Distributed BPE training works at WORD-VOCABULARY grain, not corpus
grain: one corpus pass builds (word, count), and every subsequent merge
iteration runs over the vocabulary table weighted by word frequency —
the classic Sennrich et al. 2016 formulation. At 100 TB the corpus pass
is the only corpus-sized shuffle (map-side combined token count); each
merge iteration is a vocab-sized pair count (tens of millions of rows at
web scale, one small shuffle) plus an expression-only re-segmentation.
The driver holds just the learned merge list (one tiny collect per
iteration — merges are inherently sequential, that is the algorithm).

The merge application is a single left-to-right fold with a string
accumulator (symbols never contain spaces, so the accumulator IS the
space-joined symbol sequence): greedy non-overlapping replacement, and a
token just created by a merge never re-participates within the same pass
(the suffix check requires a space-delimited occurrence of the ORIGINAL
left symbol; a merged token equals left||right which can never equal
left). The same fold runs verbatim in DuckDB's list_reduce, which is
what makes the whole training loop hash-certifiable (x55).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) corpus vocabulary — the one corpus-sized aggregation."""
    return (df.select(F.explode(text.tokens(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc")))


def with_initial_symbols(vocab: DataFrame,
                         word_col: str = "word") -> DataFrame:
    """Attach ``symbols``: the word split into single characters (the BPE
    base alphabet). No end-of-word marker — deployments that want the
    </w> convention can append it to ``word_col`` upstream."""
    return vocab.withColumn("symbols", F.split(F.col(word_col), ""))


def pair_counts(vocab: DataFrame, symbols_col: str = "symbols",
                weight_col: str = "wc") -> DataFrame:
    """(pair, cnt): adjacent-symbol pairs over the vocabulary, weighted
    by word frequency. ``pair`` is "left right" (symbols are space-free,
    so the space join is unambiguous). Map-side combined single shuffle
    at vocabulary grain."""
    s = F.col(symbols_col)
    n = F.size(s)
    pairs = F.when(n >= 2, F.zip_with(
        F.slice(s, 1, n - 1), F.slice(s, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))
    return (vocab.select(F.explode(pairs).alias("pair"),
                         F.col(weight_col))
            .groupBy("pair")
            .agg(F.sum(weight_col).alias("cnt")))


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    left||right, as a space-joined string: fold each symbol into the
    accumulator, gluing when the accumulator's trailing token is
    ``left`` and the incoming symbol is ``right``."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        symbols, F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(((acc == a) | acc.endswith(F.concat(F.lit(" "), a)))
              & (x == b), F.concat(acc, b))
        .otherwise(F.concat(acc, F.lit(" "), x)))


def apply_merge(vocab: DataFrame, left: str, right: str,
                symbols_col: str = "symbols") -> DataFrame:
    """Re-segment every word with one learned merge applied. Pure
    expression — no shuffle, no UDF."""
    merged = F.split(_merge_fold(F.col(symbols_col), left, right), " ")
    return vocab.withColumn(symbols_col, merged)


def bpe_train(df: DataFrame, num_merges: int,
              text_col: str = "text") -> tuple[list[tuple[str, str, int]],
                                               DataFrame]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns
    (merges, vocab): merges = [(left, right, pair_count), ...] in learned
    order, vocab = the word table with final ``symbols``.

    Argmax tie-break is (count desc, pair asc) — deterministic across
    runs and engines. Each iteration is one vocab-sized pair-count job
    plus a driver fetch of ONE row; the vocabulary frame is persisted so
    iterations re-segment the cached table instead of replaying the
    corpus scan."""
    from openapc_olap_spark.operators.dedup import _materialized

    vocab = _materialized(with_initial_symbols(word_counts(df, text_col)))
    merges: list[tuple[str, str, int]] = []
    prev: DataFrame | None = None
    for _ in range(num_merges):
        # this action materializes the CURRENT vocab's cache, after which
        # the one before it is dead weight — rolling unpersist keeps at
        # most two iterations cached instead of num_merges+1 (the caller
        # still holds the final frame plus its immediate parent, whose
        # cache backs the final frame's first materialization)
        top = (pair_counts(vocab)
               .orderBy(F.col("cnt").desc(), F.col("pair").asc())
               .first())
        if prev is not None:
            prev.unpersist()
        if top is None:
            break
        left, right = top["pair"].split(" ", 1)
        merges.append((left, right, int(top["cnt"])))
        prev, vocab = vocab, _materialized(apply_merge(vocab, left, right))
    return merges, vocab


def segment_digest(word_col: str = "word",
                   symbols_col: str = "symbols") -> Column:
    """Aggregate md5 over the full (word -> segmentation) map, entry-sorted
    — collapses the whole vocabulary state to one certifiable value. A
    Column expression: apply it with ``vocab.agg(segment_digest())``."""
    entry = F.concat(F.col(word_col), F.lit(":"),
                     F.array_join(F.col(symbols_col), " "))
    return F.md5(F.array_join(F.array_sort(F.collect_list(entry)), "|"))


def bpe_encode(df: DataFrame, vocab: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Segment documents with a TRAINED vocabulary (the inference half of
    BPE): (id_col, bpe_tokens array<string>, n_bpe_tokens).

    Spark-first design: instead of replaying the merge list per token
    occurrence (a per-row loop over potentially 30k+ merges), each
    document's words join the trained ``vocab`` frame's final ``symbols``
    on the word itself — one broadcast join at (doc, position) grain.
    Words absent from the vocabulary fall back to character symbols
    (their true BPE segmentation under a merge list that never saw them
    can only merge pairs learned from OTHER words; the char fallback is
    the conservative floor and keeps the operator join-shaped — route
    OOV-heavy corpora through bpe_train on their own text instead).

    Order is preserved by carrying the token position through the join
    and re-assembling with a position-sorted fold — no window, no second
    shuffle beyond the per-doc collect."""
    toks = text.tokens(text_col)
    per = (df.select(F.col(id_col),
                     F.posexplode(toks).alias("__pos", "word")))
    seg = vocab.select("word", F.col("symbols").alias("__seg"))
    joined = (per.join(F.broadcast(seg), ["word"], "left")
              .withColumn("__seg", F.coalesce(F.col("__seg"),
                                              F.split("word", ""))))
    ordered = F.flatten(F.transform(
        F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
        lambda s: s["__seg"]))
    return (joined.groupBy(id_col)
            .agg(ordered.alias("bpe_tokens"))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens")))
