"""Unigram-LM (SentencePiece-style) tokenizer training (SURVEY.md §2.9
X4 family; VERDICT r08 #5 — the other half of the tokenizer story next
to BPE x55/x61: Kudo 2018's unigram model, where a piece vocabulary is
EM-fitted to maximize corpus likelihood under all segmentations and
pruned to size. Reference has no equivalent; driver-mandated
LLM-pipeline surface).

Like ``bpe.py``, training runs at WORD-VOCABULARY grain: one corpus
pass builds (word, wc), and every EM iteration is vocab-sized work.
The E-step is the classic forward-backward over each word's
segmentation lattice — but expressed ENTIRELY as a fixed family of
Spark columns, which is what makes the whole trainer oracle-replayable:

- Words are truncated to ``word_cap`` chars, so the lattice has a FIXED
  position count and the DP unrolls into plain column chains
  (f_0..f_cap forward, b_0..b_cap backward-from-the-end) instead of an
  iterative join. Each slot (i, l) — piece of length l at offset i —
  is valid iff i + l <= wlen; piece probabilities arrive by ONE
  broadcast equi-join of the slot substrings against the current piece
  table, pivoted back to per-word columns.
- f_j = sum over l of f_(j-l) * p(word[j-l+1 .. j]), terms added in
  FIXED i-ascending order; b_k (k = chars from the END, so variable
  word length never indexes a column) = sum over l of
  p(word[wlen-k+1 .. wlen-k+l]) * b_(k-l), l-ascending. Z = f_wlen via
  element_at. Expected count of slot (i, l) = f_i * p * b_(wlen-i-l)
  / Z. Every product and sum has one fixed association order, so a SQL
  engine evaluating the same tree reproduces every double BITWISE —
  the x84 power-iteration discipline, applied to lattice DP.
- M-step: piece count = sum over words of wc * expected-count, piece
  probs renormalized, vocabulary pruned to all single chars (coverage
  guarantee: the char-only segmentation keeps every word's Z > 0) plus
  the top ``vocab_size`` multi-char pieces by (count desc, piece asc).
  ``deterministic=True`` swaps the word-grain SUMs for (word, i, l)-
  sorted folds (the x54/x58/logreg discipline, row-ceiling-guarded) —
  the gate mode; plain SUM is the 100 TB mode.

No model state ever crosses the driver: the piece table flows between
iterations as a broadcast frame, and the lattice DP runs as RUNTIME
folds over packed slot-prob matrices — constant plan size however many
rounds chain (Catalyst would inline an unrolled recurrence into
tribonacci-sized trees). Seed counts are integer (wc-weighted
substring occurrences), so seed probs are exact ratios on any engine
regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text

# deterministic=True materializes per-piece sorted contribution lists;
# reuse the engine-wide ceiling discipline
from openapc_olap_spark.operators.logreg import DETERMINISTIC_MAX_ROWS

# separator inside the Viterbi backtrack's string accumulator — a piece
# containing \x01 would split wrongly (identically on both engines);
# whitespace tokenization never produces it from normal text
_SEG_SEP = "\x01"


def _slots(word_cap: int, piece_len: int) -> list[tuple[int, int]]:
    """Forward slots: all (offset i, length l) pieces of a
    word_cap-char word, i + l <= cap."""
    return [(i, l) for i in range(word_cap)
            for l in range(1, piece_len + 1) if i + l <= word_cap]


def _bslots(word_cap: int, piece_len: int) -> list[tuple[int, int]]:
    """Backward slots: (k = chars from the END, length l) with
    l <= k <= cap — the piece occupying [wlen-k+1, wlen-k+l]."""
    return [(k, l) for k in range(1, word_cap + 1)
            for l in range(1, min(piece_len, k) + 1)]


def word_vocab(df: DataFrame, text_col: str = "text",
               word_cap: int = 8,
               max_words: int | None = None) -> DataFrame:
    """(word, wc, wlen): the corpus word vocabulary, words truncated to
    ``word_cap`` chars BEFORE counting (so the lattice width is fixed).
    ``max_words`` keeps the top words by (wc desc, word asc) — the
    deterministic cap gates use; None keeps everything (the corpus-scale
    mode)."""
    w = (df.select(F.explode(text.tokens(text_col)).alias("t"))
         .select(F.substring("t", 1, word_cap).alias("word"))
         .filter(F.length("word") >= 1)
         .groupBy("word").agg(F.count(F.lit(1)).alias("wc")))
    if max_words is not None:
        rank = Window.orderBy(F.col("wc").desc(), F.col("word").asc())
        w = (w.withColumn("__r", F.row_number().over(rank))
             .filter(F.col("__r") <= max_words).drop("__r"))
    return w.withColumn("wlen", F.length("word"))


def seed_pieces(words: DataFrame, piece_len: int = 3,
                seed_size: int = 80, word_cap: int = 8) -> DataFrame:
    """(piece, p): the seed unigram model — every substring slot of
    every vocab word, wc-weighted occurrence counts (exact integers, so
    the seed is engine-deterministic under ANY summation order), pruned
    to all single chars + top ``seed_size`` multi-char pieces, counts
    renormalized to probabilities."""
    slot_structs = F.array(*[
        F.when(F.lit(i + l) <= F.col("wlen"),
               F.substring("word", i + 1, l))
        for (i, l) in _slots(word_cap, piece_len)])
    cnt = (words.select(F.col("wc"),
                        F.explode(slot_structs).alias("piece"))
           .filter(F.col("piece").isNotNull())
           .groupBy("piece")
           .agg(F.sum("wc").cast("long").alias("cnt"))
           # model-grain; consumed twice by the prune (rank + total)
           .localCheckpoint(eager=False))
    return _prune_and_normalize(cnt, seed_size, integer_counts=True)


def _prune_and_normalize(cnt: DataFrame, vocab_size: int,
                         integer_counts: bool = False) -> DataFrame:
    """Keep all single-char pieces + the top ``vocab_size`` multi-char
    pieces by (cnt desc, piece asc); renormalize. The total is folded
    piece-ascending (order-pinned) unless counts are exact integers."""
    rank = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    kept = (cnt.filter(F.length("piece") > 1)
            .withColumn("__r", F.row_number().over(rank))
            .filter(F.col("__r") <= vocab_size).drop("__r")
            .unionByName(cnt.filter(F.length("piece") == 1)))
    if integer_counts:
        total = kept.agg(F.sum("cnt").alias("__t"))
    else:
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("piece").alias("k"), F.col("cnt").alias("v")))),
            lambda s: s["v"])
        total = kept.agg(F.aggregate(ordered, F.lit(0.0),
                                     lambda a, x: a + x).alias("__t"))
    return (kept.crossJoin(F.broadcast(total))
            .select("piece", "cnt",
                    (F.col("cnt") / F.col("__t")).alias("p")))


def _attach_slot_probs(words: DataFrame, pieces: DataFrame,
                       word_cap: int, piece_len: int) -> DataFrame:
    """Pivot the current piece probs onto each word as fixed columns:
    pf_{i}_{l} (forward slot: piece at offset i) and pb_{k}_{l}
    (backward slot: piece ENDING k-l chars from the end). Invalid slots
    (outside the word) and unknown pieces are 0.0. One broadcast
    equi-join + one pivot groupBy — the only joins in an EM round."""
    fwd = [F.struct(F.lit(0).alias("d"), F.lit(i).alias("x"),
                    F.lit(l).alias("l"),
                    F.when(F.lit(i + l) <= F.col("wlen"),
                           F.substring("word", i + 1, l))
                    .alias("sub"))
           for (i, l) in _slots(word_cap, piece_len)]
    # backward slot (k, l): substr(wlen-k+1, l), valid iff k <= wlen
    # (l <= k holds by slot construction, so the piece lies inside)
    bwd = [F.struct(F.lit(1).alias("d"), F.lit(k).alias("x"),
                    F.lit(l).alias("l"),
                    F.when(F.lit(k) <= F.col("wlen"),
                           F.col("word").substr(
                               F.col("wlen") - F.lit(k) + 1, F.lit(l)))
                    .alias("sub"))
           for (k, l) in _bslots(word_cap, piece_len)]
    ex = (words.select("word", "wc", "wlen",
                       F.explode(F.array(*(fwd + bwd))).alias("s"))
          .select("word", "wc", "wlen", F.col("s.d").alias("d"),
                  F.col("s.x").alias("x"), F.col("s.l").alias("l"),
                  F.col("s.sub").alias("sub"))
          .filter(F.col("sub").isNotNull()))
    joined = ex.join(F.broadcast(pieces.select(F.col("piece").alias("sub"),
                                               "p")),
                     ["sub"], "left")
    aggs = []
    for (i, l) in _slots(word_cap, piece_len):
        aggs.append(F.coalesce(F.max(F.when(
            (F.col("d") == 0) & (F.col("x") == i) & (F.col("l") == l),
            F.col("p"))), F.lit(0.0)).alias(f"pf_{i}_{l}"))
    for (k, l) in _bslots(word_cap, piece_len):
        aggs.append(F.coalesce(F.max(F.when(
            (F.col("d") == 1) & (F.col("x") == k) & (F.col("l") == l),
            F.col("p"))), F.lit(0.0)).alias(f"pb_{k}_{l}"))
    return joined.groupBy("word", "wc", "wlen").agg(*aggs)


def em_counts(words: DataFrame, pieces: DataFrame, word_cap: int = 8,
              piece_len: int = 3,
              deterministic: bool = False) -> DataFrame:
    """One E-step: (piece, cnt) expected wc-weighted piece counts under
    the current model — forward-backward posteriors per slot, summed at
    piece grain (sorted (word, i, l) folds when ``deterministic``).

    The DP arrays (f_0..f_cap, b_0..b_cap) are computed by RUNTIME
    folds over the packed slot-prob matrices — constant plan size per
    round. An earlier unrolled-column formulation let Catalyst's
    CollapseProject inline f_(j-1)/f_(j-2)/f_(j-3) into f_j textually
    (tribonacci tree growth: a 126 MiB task binary and a 244 s plan at
    250 words); the fold adds each position's terms in the SAME fixed
    i-ascending (forward) / l-ascending (backward) order starting from
    +0.0 — IEEE-exact next to the unrolled chains the oracle replays,
    because every term is non-negative and x + 0.0 == x."""
    piv = _attach_slot_probs(words, pieces, word_cap, piece_len)
    pfmat = F.array(*[
        F.array(*[(F.col(f"pf_{i}_{l}") if i + l <= word_cap
                   else F.lit(0.0))
                  for l in range(1, piece_len + 1)])
        for i in range(word_cap)])
    pbmat = F.array(*[
        F.array(*[(F.col(f"pb_{k}_{l}") if l <= min(piece_len, k)
                   else F.lit(0.0))
                  for l in range(1, piece_len + 1)])
        for k in range(1, word_cap + 1)])

    def fstep(acc, j):
        t = F.lit(0.0)
        for l in range(piece_len, 0, -1):      # i-ascending
            t = t + F.when(
                j >= l,
                F.element_at(acc, (j - l + 1).cast("int"))
                * F.element_at(F.element_at(F.col("__pfm"),
                                            (j - l + 1).cast("int")),
                               l)).otherwise(F.lit(0.0))
        return F.concat(acc, F.array(t))

    def bstep(acc, k):
        t = F.lit(0.0)
        for l in range(1, piece_len + 1):      # l-ascending
            t = t + F.when(
                k >= l,
                F.element_at(F.element_at(F.col("__pbm"),
                                          k.cast("int")), l)
                * F.element_at(acc, (k - l + 1).cast("int"))
            ).otherwise(F.lit(0.0))
        return F.concat(acc, F.array(t))

    seq = F.sequence(F.lit(1), F.lit(word_cap))
    state = (piv.withColumn("__pfm", pfmat)
             .withColumn("__pbm", pbmat)
             .withColumn("__fa", F.aggregate(
                 seq, F.array(F.lit(1.0)), fstep))
             .withColumn("__ba", F.aggregate(
                 seq, F.array(F.lit(1.0)), bstep))
             .withColumn("__z", F.element_at(F.col("__fa"),
                                             F.col("wlen") + 1)))
    slot_ec = []
    for (i, l) in _slots(word_cap, piece_len):
        # posterior mass of "a piece spans [i+1, i+l]":
        # f_i * p * b_(wlen - i - l) / Z
        ec = F.when(
            (F.lit(i + l) <= F.col("wlen")) & (F.col("__z") > F.lit(0.0)),
            F.element_at(F.col("__fa"), i + 1) * F.col(f"pf_{i}_{l}")
            * F.element_at(F.col("__ba"),
                           F.col("wlen") - F.lit(i + l) + 1)
            / F.col("__z")
        ).otherwise(F.lit(0.0))
        slot_ec.append(F.struct(
            F.lit(i).alias("i"), F.lit(l).alias("l"),
            F.when(F.lit(i + l) <= F.col("wlen"),
                   F.substring("word", i + 1, l)).alias("piece"),
            ec.alias("ec")))
    contrib = (state.select("word", "wc",
                            F.explode(F.array(*slot_ec)).alias("s"))
               .filter(F.col("s.piece").isNotNull())
               .select("word", F.col("s.i").alias("i"),
                       F.col("s.l").alias("l"),
                       F.col("s.piece").alias("piece"),
                       (F.col("wc") * F.col("s.ec")).alias("v")))
    if not deterministic:
        return contrib.groupBy("piece").agg(F.sum("v").alias("cnt"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("word").alias("w"), F.col("i").alias("i"),
            F.col("l").alias("l"), F.col("v").alias("v")))),
        lambda s: s["v"])
    return contrib.groupBy("piece").agg(
        F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x).alias("cnt"))


def viterbi_segment(words: DataFrame, pieces: DataFrame,
                    word_cap: int = 8, piece_len: int = 3) -> DataFrame:
    """(word, seg): the max-probability segmentation of every word as
    array<string>, NULL when the word is unsegmentable under the model
    (some position unreachable — e.g. a character absent from the piece
    table). Same pivot + unrolled-DP machinery as the EM E-step; the
    backtrack is ``word_cap`` chained CASE steps indexing the
    backpointer columns by the current position (element_at), so the
    whole segmentation is one zero-shuffle projection after the
    broadcast pivot join."""
    if word_cap > 99:
        raise ValueError("word_cap > 99 breaks the 2-digit backtrack "
                         "position encoding")
    piv = _attach_slot_probs(words, pieces, word_cap, piece_len)
    # pack the pivoted slot probs into ONE array-of-arrays column and
    # run the forward DP as a RUNTIME fold with a (vs, bps) struct
    # accumulator — an unrolled column-chain formulation embeds the v
    # trees inside nested CASEs and Catalyst spent ~14 s ANALYZING
    # them for a 31-row frame; the fold's expression is
    # constant-size. The oracle replays the same
    # products/comparisons as unrolled lateral-alias chains (SQL
    # planners handle those fine), so values still match bitwise.
    pfmat = F.array(*[
        F.array(*[(F.col(f"pf_{i}_{l}") if i + l <= word_cap
                   else F.lit(0.0))
                  for l in range(1, piece_len + 1)])
        for i in range(word_cap)])
    state = piv.select("word", "wlen", pfmat.alias("__pf"))
    facc0 = F.struct(
        F.array(F.lit(1.0)).alias("vs"),
        F.array().cast("array<int>").alias("bps"))

    def fstep(acc, j):
        # cand(l) = vs[j-l] * pf[j-l][l]; strict > keeps the SMALLEST
        # winning l (same order as _viterbi_columns / the SQL chains);
        # slots with l > j get a -1 sentinel that can never win
        def cand(l):
            return F.when(
                j >= l,
                F.element_at(acc["vs"], (j - l + 1).cast("int"))
                * F.element_at(F.element_at(F.col("__pf"),
                                            (j - l + 1).cast("int")),
                               l)).otherwise(F.lit(-1.0))
        best, bp = cand(1), F.lit(1)
        for l in range(2, piece_len + 1):
            c = cand(l)
            bp = F.when(c > best, F.lit(l)).otherwise(bp)
            best = F.when(c > best, c).otherwise(best)
        return F.struct(
            F.concat(acc["vs"], F.array(best)).alias("vs"),
            F.concat(acc["bps"],
                     F.array(bp.cast("int"))).alias("bps"))

    fwd = F.aggregate(F.sequence(F.lit(1), F.lit(word_cap)),
                      facc0, fstep)
    state = state.select("word", "wlen", fwd["vs"].alias("__vs"),
                         fwd["bps"].alias("__bps"))
    varr = F.col("__vs")
    bparr = F.col("__bps")
    ok = F.element_at(varr, F.col("wlen") + 1) > F.lit(0.0)
    # Backtrack as a RUNTIME fold (constant plan size — an unrolled
    # version quintuples the expression tree per step under
    # CollapseProject). The accumulator is a plain string —
    # "PP<sep>piece<sep>piece..." with PP the 2-digit remaining
    # position — because a struct accumulator mis-binds inside
    # DuckDB 1.0 list_reduce lambdas and the oracle must replay this
    # fold verbatim. Each step consumes bp[pos] chars off the end and
    # PREPENDS the piece, so the final list reads front-to-back.
    sep = F.lit(_SEG_SEP)
    acc0 = F.when(ok, F.lpad(F.col("wlen").cast("string"), 2, "0")) \
        .otherwise(F.lit("00"))

    def step(acc, _):
        p = F.substring(acc, 1, 2).cast("int")
        l = F.element_at(bparr, F.greatest(p, F.lit(1)))
        piece = F.col("word").substr(p - l + 1, l)
        return F.when(
            p > 0,
            F.concat(F.lpad((p - l).cast("string"), 2, "0"), sep,
                     piece, F.substring(acc, 3, 1 << 20))
        ).otherwise(acc)

    final = F.aggregate(F.sequence(F.lit(1), F.lit(word_cap)),
                        acc0, step)
    seg = F.filter(F.split(F.substring(final, 3, 1 << 20), _SEG_SEP),
                   lambda x: x != "")
    return state.select("word", F.when(ok, seg).alias("seg"))


def unigram_encode(df: DataFrame, pieces: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   word_cap: int = 8, piece_len: int = 3,
                   unk: str = "<unk>") -> DataFrame:
    """Encode every document with a trained unigram model: (id_col,
    pieces array<string>) — each whitespace token (truncated to
    ``word_cap``, the training contract) replaced by its Viterbi
    segmentation, unsegmentable tokens by ``unk``. Work is word-vocab
    grain: segment DISTINCT words once, broadcast-map them back onto
    the token stream, reassemble per doc with a position-sorted fold —
    at 100 TB the corpus crosses the wire once and the DP runs on the
    vocabulary."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(text.tokens(text_col)).alias("__pos", "__t")
    ).select(id_col, "__pos",
             F.substring("__t", 1, word_cap).alias("word"))
    words = (toks.select("word").distinct()
             .withColumn("wlen", F.length("word"))
             .withColumn("wc", F.lit(1)))
    seg = viterbi_segment(words, pieces, word_cap, piece_len)
    seg = seg.select("word", F.coalesce(
        F.col("seg"), F.array(F.lit(unk))).alias("seg"))
    joined = toks.join(F.broadcast(seg), ["word"])
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("__pos").alias("p"), F.col("seg").alias("s")))),
        lambda st: st["s"])
    return (joined.groupBy(id_col)
            .agg(F.flatten(ordered).alias("pieces")))


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 60, n_iter: int = 2,
                  piece_len: int = 3, word_cap: int = 8,
                  seed_size: int = 80,
                  max_words: int | None = None,
                  deterministic: bool = False) -> DataFrame:
    """Fit the unigram tokenizer model: (piece, cnt, p) after
    ``n_iter`` EM rounds, pruned each round to all single chars + the
    top ``vocab_size`` multi-char pieces. One Spark plan end to end —
    the piece table flows between rounds as a broadcast frame."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 1 <= piece_len <= word_cap:
        raise ValueError(f"need 1 <= piece_len <= word_cap, got "
                         f"piece_len={piece_len}, word_cap={word_cap}")
    if deterministic and (max_words is None
                          or max_words > DETERMINISTIC_MAX_ROWS):
        raise ValueError(
            f"deterministic=True materializes sorted per-piece "
            f"contribution lists: pass max_words <= "
            f"{DETERMINISTIC_MAX_ROWS} (the engine-wide ceiling). "
            f"Use the default SUM path at scale.")
    # the word vocabulary feeds the seed and every EM round — persist
    from openapc_olap_spark.operators.dedup import _materialized
    words = _materialized(word_vocab(df, text_col, word_cap, max_words))
    # the piece table is model-grain (vocab_size + charset rows);
    # localCheckpoint it between rounds so round N+1's plan starts from
    # the materialized model instead of re-embedding (and re-executing)
    # round N's whole DAG at every reference
    pieces = seed_pieces(words, piece_len, seed_size,
                         word_cap).localCheckpoint(eager=False)
    for _ in range(n_iter):
        # cnt is ALSO model-grain and feeds _prune_and_normalize twice
        # (the ranked keep-set and the normalizer total) — checkpoint
        # it or the whole E-step executes once per consumer
        cnt = em_counts(words, pieces, word_cap, piece_len,
                        deterministic).localCheckpoint(eager=False)
        pieces = _prune_and_normalize(
            cnt, vocab_size).localCheckpoint(eager=False)
    return pieces
