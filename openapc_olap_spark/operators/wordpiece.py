"""WordPiece tokenizer: likelihood-scored merge training + greedy
longest-match-first encoding (Schuster & Nakajima 2012; the BERT
tokenizer), completing the engine's tokenizer family next to BPE
(operators/bpe.py) and unigram-LM (operators/unigram.py).

Training is BPE-shaped — iterate (count adjacent pairs, pick one merge,
re-segment) — but the selection criterion is the LIKELIHOOD gain
score(l, r) = count(lr) / (count(l) * count(r)) instead of raw pair
frequency: merging a pair only helps the unigram LM over the segmented
corpus when the pair co-occurs more than its parts predict. Continuation
symbols carry the standard ``##`` prefix (word "hello" seeds as
h ##e ##l ##l ##o); a merge glues l + r with r's ``##`` marker stripped,
so the merged token keeps l's word-position marker.

Spark-first shape (same discipline as bpe.py): the corpus is touched
ONCE (word_counts — one map-side-combined shuffle at word grain); every
training iteration then runs at VOCABULARY grain — pair/symbol counts
are two small aggregations, the argmax is a 1-row collect, and the
re-segmentation is a pure expression fold (no shuffle, no UDF). At
100 TB the corpus scan dominates and happens once; iterations cost is
O(vocab), independent of corpus size.

Encoding runs at DISTINCT-WORD grain: each word is segmented once by a
constant-size runtime fold (greedy longest-match per step, vocabulary
membership via a 1-row broadcast map — the unigram.py literal-map
contract), then joined back onto (doc, position) — AQE-decided
strategy, never a forced broadcast (bpe_encode's contract) — and
reassembled with a position-sorted fold. Unknown characters (or words
longer than ``word_cap``) yield the conventional single ``[UNK]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from openapc_olap_spark.operators import text
from openapc_olap_spark.operators.bpe import pair_counts, word_counts

UNK = "[UNK]"
CONT = "##"


def with_wordpiece_symbols(vocab: DataFrame,
                           word_col: str = "word") -> DataFrame:
    """Attach ``symbols``: first character bare, every later character
    ``##``-prefixed (the WordPiece seed segmentation)."""
    chars = F.split(F.col(word_col), "")
    rest = F.transform(F.slice(chars, 2, F.greatest(F.size(chars) - 1,
                                                    F.lit(0))),
                       lambda c: F.concat(F.lit(CONT), c))
    first = F.slice(chars, 1, 1)
    return vocab.withColumn("symbols", F.concat(first, rest))


def symbol_counts(vocab: DataFrame, symbols_col: str = "symbols",
                  weight_col: str = "wc") -> DataFrame:
    """(sym, scnt): wc-weighted occurrence count of every symbol under
    the current segmentation — the denominator of the WordPiece score.
    Vocabulary-grain aggregation (map-side combined)."""
    return (vocab.select(F.explode(symbols_col).alias("sym"),
                         F.col(weight_col))
            .groupBy("sym")
            .agg(F.sum(weight_col).alias("scnt")))


def _glue(left: str, right: str) -> str:
    """The merged symbol: l + r with r's continuation marker stripped
    (in-word right symbols ALWAYS carry it — every non-initial seed
    symbol does, and merges preserve the left operand's prefix)."""
    return left + right[len(CONT):]


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    _glue(left, right), as a space-joined string (bpe._merge_fold with
    the ## strip; symbols are whitespace-free so the join is
    unambiguous)."""
    a, b = F.lit(left), F.lit(right)
    glued = F.lit(_glue(left, right)[len(left):])
    return F.aggregate(
        symbols, F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(((acc == a) | acc.endswith(F.concat(F.lit(" "), a)))
              & (x == b), F.concat(acc, glued))
        .otherwise(F.concat(acc, F.lit(" "), x)))


def apply_merge(vocab: DataFrame, left: str, right: str,
                symbols_col: str = "symbols") -> DataFrame:
    """Re-segment every word with one learned merge. Pure expression."""
    merged = F.split(_merge_fold(F.col(symbols_col), left, right), " ")
    return vocab.withColumn(symbols_col, merged)


def select_merge(vocab: DataFrame) -> tuple[str, str, int, int, int]:
    """The iteration's merge: argmax of cnt(lr) / (scnt(l) * scnt(r))
    over adjacent pairs, ties broken by pair string ascending (both
    deterministic and replayable by the SQL twin — the score is the
    same IEEE division of the same integers on both engines). Returns
    (left, right, pair_count, left_count, right_count) — a 1-row
    model-grain collect; the integer triple pins the score exactly
    with zero float-hash risk."""
    pairs = pair_counts(vocab)
    syms = symbol_counts(vocab)
    l = F.split_part(F.col("pair"), F.lit(" "), F.lit(1))
    r = F.split_part(F.col("pair"), F.lit(" "), F.lit(2))
    scored = (pairs.withColumn("l", l).withColumn("r", r)
              .join(syms.select(F.col("sym").alias("l"),
                                F.col("scnt").alias("cl")), "l")
              .join(syms.select(F.col("sym").alias("r"),
                                F.col("scnt").alias("cr")), "r")
              .withColumn("score",
                          F.col("cnt").cast("double") /
                          (F.col("cl") * F.col("cr")).cast("double")))
    row = (scored.orderBy(F.col("score").desc(), F.col("pair").asc())
           .limit(1).collect())
    if not row:
        raise ValueError("no adjacent pairs left to merge")
    w = row[0]
    return w["l"], w["r"], int(w["cnt"]), int(w["cl"]), int(w["cr"])


def wordpiece_train(df: DataFrame, num_merges: int,
                    text_col: str = "text",
                    vocab0: DataFrame | None = None
                    ) -> tuple[list[dict], DataFrame]:
    """Train ``num_merges`` WordPiece merges. Returns (merge log —
    [{step, left, right, token, cnt, cl, cr}] — and the final vocabulary
    frame (word, wc, symbols)). One corpus-grain shuffle up front; each
    iteration is vocabulary-grain (two small aggs + a 1-row collect +
    an expression re-segmentation).

    ``vocab0`` accepts a precomputed (ideally cached)
    ``with_wordpiece_symbols(word_counts(df))`` frame: a caller that
    also needs the initial segmentation — vocab_tokens' seed alphabet,
    the x100 encode shape — shares ONE corpus word-count pass instead
    of re-running it here (guide §1.2)."""
    if vocab0 is not None:
        vocab = vocab0
    else:
        # iteration re-plans stack fold-upon-fold; checkpoint lineage at
        # model grain like unigram_train (vocab tables are small)
        vocab = with_wordpiece_symbols(word_counts(df, text_col)) \
            .localCheckpoint(eager=False)
    log: list[dict] = []
    for step in range(1, num_merges + 1):
        left, right, cnt, cl, cr = select_merge(vocab)
        vocab = apply_merge(vocab, left, right).localCheckpoint(
            eager=False)
        log.append({"step": step, "left": left, "right": right,
                    "token": _glue(left, right), "cnt": cnt,
                    "cl": cl, "cr": cr})
    return log, vocab


def vocab_tokens(initial: DataFrame, log: list[dict]) -> list[str]:
    """The encoder vocabulary: the seed alphabet (every distinct symbol
    of the INITIAL segmentation) plus each merge's created token —
    sorted, deduped. Model-grain collect."""
    rows = (initial.select(F.explode("symbols").alias("sym"))
            .distinct().collect())
    toks = {r["sym"] for r in rows} | {m["token"] for m in log}
    return sorted(toks)


def _greedy_expr(word_cap: int, max_piece: int) -> str:
    """SQL for the greedy longest-match fold over one word: state
    (pos, toks, bad) advances through ``word_cap`` runtime steps; each
    step takes the LONGEST vocabulary hit at pos (word-initial bare,
    otherwise ##-prefixed), or poisons the word ([UNK]). The fold body
    appears once in the plan — expression size is O(max_piece), not
    O(word_cap * max_piece) — and membership is an element_at against
    the 1-row broadcast __vmap (unigram.py's literal-map contract)."""
    def cand(l: int) -> str:
        return (f"CASE WHEN acc.pos = 1 THEN substring(word, 1, {l}) "
                f"ELSE '{CONT}' || substring(word, acc.pos, {l}) END")

    def hit(l: int) -> str:
        return (f"acc.pos + {l} - 1 <= wlen AND "
                f"element_at(__vmap, {cand(l)}) IS NOT NULL")

    def advance(l: int) -> str:
        return (f"named_struct('pos', acc.pos + {l}, "
                f"'toks', array_append(acc.toks, {cand(l)}), "
                f"'bad', false)")

    chain = "named_struct('pos', acc.pos, 'toks', acc.toks, 'bad', true)"
    for l in range(1, max_piece + 1):        # longest match wins: the
        chain = (f"CASE WHEN {hit(l)} THEN {advance(l)} "
                 f"ELSE {chain} END")        # l-descending CASE nests
    return (f"aggregate(sequence(1, {word_cap}), "
            f"named_struct('pos', 1, "
            f"'toks', CAST(array() AS array<string>), 'bad', false), "
            f"(acc, step) -> CASE WHEN acc.bad OR acc.pos > wlen "
            f"THEN acc ELSE {chain} END)")


def segment_words(words: DataFrame, tokens: list[str],
                  word_cap: int = 16, max_piece: int = 8) -> DataFrame:
    """Segment DISTINCT words greedily: (word, pieces array<string>).
    Words longer than ``word_cap`` or containing an unknown character
    become [UNK] (the BERT convention). Zero shuffle: one broadcast
    crossJoin of the 1-row vocab map + a constant-plan runtime fold."""
    spark = words.sparkSession
    vrow = spark.createDataFrame([({t: 1 for t in tokens},)],
                                 "__vmap map<string,int>")
    fold = _greedy_expr(word_cap, max_piece)
    out = (words.crossJoin(F.broadcast(vrow))
           .withColumn("wlen", F.length("word"))
           .withColumn("__st", F.expr(fold)))
    pieces = (F.when((F.col("wlen") > word_cap) | F.col("__st.bad"),
                     F.array(F.lit(UNK)))
              .otherwise(F.col("__st.toks")))
    return out.select("word", pieces.alias("pieces"))


def wordpiece_encode(df: DataFrame, tokens: list[str],
                     id_col: str = "doc_id", text_col: str = "text",
                     word_cap: int = 16, max_piece: int = 8,
                     broadcast_vocab: bool | None = None) -> DataFrame:
    """Encode documents with a trained WordPiece vocabulary:
    (id_col, wp_tokens array<string>, n_wp_tokens). Distinct words
    segment ONCE (segment_words), join back onto the (doc, position)
    exploded frame, and a position-sorted fold reassembles each
    document — the bpe.bpe_encode shape, so the corpus-side cost is
    one explode + one aggregate regardless of vocabulary size.

    The word->pieces join carries NO forced broadcast hint by default
    (the bpe_encode contract, lm._hinted): a 100 TB corpus's
    distinct-word frame is vocabulary-sized by Heaps' law — hundreds
    of millions of rows of noisy tokens — and a forced hint would OOM
    the driver/executors. Catalyst/AQE still broadcasts a frame that
    actually fits; ``broadcast_vocab=True`` forces the hint for
    known-small word sets, ``False`` forces a shuffle hash join."""
    toks = text.tokens(text_col)
    per = (df.select(F.col(id_col),
                     F.posexplode(toks).alias("__pos", "word")))
    seg = segment_words(per.select("word").distinct(), tokens,
                        word_cap, max_piece)
    from openapc_olap_spark.operators.lm import _hinted
    joined = per.join(_hinted(seg, broadcast_vocab), ["word"])
    ordered = F.flatten(F.transform(
        F.array_sort(F.collect_list(F.struct("__pos", "pieces"))),
        lambda s: s["pieces"]))
    return (joined.groupBy(id_col)
            .agg(ordered.alias("wp_tokens"))
            .withColumn("n_wp_tokens", F.size("wp_tokens")))
