"""Cross-document repeated-SPAN removal at token-window grain — the
exact-substring analogue of ``linededup`` (Lee et al. 2022,
arXiv:2107.06499, strip verbatim >= W-token substrings shared across
documents; their suffix array is replaced by the Spark-shaped
equivalent: hash every W-token window, count distinct docs per window
hash, mask the tokens covered by any cross-doc-hot window).

Two deliberate approximations vs a suffix array, both conservative and
documented: (a) only spans of at least W tokens are caught (a shared
span of length L >= W contains L - W + 1 hot windows whose union covers
it exactly, so long spans are removed in full); (b) matching is by md5
of the space-joined window (engine-portable, collision probability
~2^-60 per pair — the repo's fingerprint standard).

Shape at 100 TB: one (doc, pos, window-hash) explode feeding a
map-side-combined frequency aggregate (window-cardinality out), one
join of the exploded windows against the HOT set only (cross-doc
verbatim spans are few distinct values — tiny build side, AQE
broadcasts), then a per-doc fold that masks covered token positions
and rejoins. Documents never shuffle whole; the only corpus-sized
exchanges are the explode aggregate and the doc-grain reassembly —
the same budget as ``linededup``. No UDF, no window-function over the
corpus, no driver-side text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column | str) -> Column:
    """Whitespace tokens of the RAW text (no lowercasing — span removal
    must strip verbatim text, and rejoining lowercased tokens would
    corrupt the survivors)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def _window_hashes(toks: Column, w: int) -> Column:
    """md5 of each w-token window (space-joined) -> array<string>, one
    per start position 0..n_tokens-w; empty array when n_tokens < w."""
    n = F.size(toks)
    starts = F.when(n >= w, F.sequence(F.lit(0), n - w)) \
              .otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s: F.md5(F.array_join(F.slice(toks, s + 1, w), " ")))


def span_frequencies(df: DataFrame, w: int = 50,
                     text_col: str = "text") -> DataFrame:
    """(span_hash, n_docs): distinct-document frequency of every
    w-token window. Distinct-per-doc first — the dedup signal is
    cross-doc verbatim recurrence, not within-doc repetition."""
    return (df.select(F.explode(F.array_distinct(
                _window_hashes(_tokens(text_col), w))).alias("span_hash"))
            .groupBy("span_hash")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def remove_repeated_spans(df: DataFrame, w: int = 50, max_docs: int = 1,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Strip every >= w-token span appearing verbatim in more than
    ``max_docs`` distinct documents, from ALL documents. Output keeps
    the input columns with ``text_col`` rewritten (survivor tokens
    space-rejoined) plus ``n_tokens_removed``.

    A token survives iff NO hot window covers it — i.e. no hot start s
    with s <= pos < s + w. The per-token check folds over the doc's hot
    starts, which are few by construction (hot spans are the rare
    cross-doc boilerplate); the fold is exact coverage, so overlapping
    hot windows remove their union, matching the suffix-array
    semantics for long shared spans."""
    hot = (span_frequencies(df, w, text_col)
           .filter(F.col("n_docs") > max_docs)
           .select("span_hash", F.lit(True).alias("__hot")))
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(_window_hashes(_tokens(text_col), w))
         .alias("__pos", "span_hash"))
    hot_starts = (exploded.join(hot, ["span_hash"], "left")
                  .groupBy(id_col)
                  .agg(F.sort_array(F.collect_list(
                          F.when(F.col("__hot"), F.col("__pos"))))
                       .alias("__hs")))
    toks = _tokens(text_col)
    covered = lambda t: F.exists(  # noqa: E731
        F.col("__hs"), lambda s: (s <= t) & (t < s + w))
    kept = F.filter(toks, lambda tok, i: ~covered(i))
    removed = F.size(toks) - F.size(kept)
    out = (df.join(hot_starts, [id_col], "left")
           .select(*[F.col(c) for c in df.columns if c != text_col],
                   F.array_join(kept, " ").alias(text_col),
                   removed.alias("n_tokens_removed")))
    return out
