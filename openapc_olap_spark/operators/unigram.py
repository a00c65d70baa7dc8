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
  is valid iff i + l <= wlen; piece probabilities arrive by an
  element_at lookup of the slot substrings against the MODEL-grain
  piece table embedded as a literal map (collected once per round,
  LITERAL_MAP_MAX_PIECES-guarded) — a zero-shuffle projection.
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

Model state crossing the driver is MODEL-grain only (the piece table,
collected per round into the literal lookup map — exact binary doubles,
so values are engine-deterministic); corpus-grain data never does. The
lattice DP runs as RUNTIME folds over packed slot-prob matrices —
constant plan size however many rounds chain (Catalyst would inline an
unrolled recurrence into tribonacci-sized trees). Seed counts are
integer (wc-weighted substring occurrences), so seed probs are exact
ratios on any engine regardless of summation order.
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


def _slots_lit(word_cap: int, piece_len: int) -> str:
    """The forward slot table as ONE SQL literal array<struct<i,l>>:
    per-slot expressions become a single transform/explode lambda that
    Catalyst analyzes once, instead of ``len(_slots)`` textually
    unrolled copies (the dominant per-EM-round driver cost in the r15
    profile: each lazy localCheckpoint re-plans the round's tree).
    Array order == _slots order, so exploded rows, sort keys, and every
    fold order are unchanged."""
    return "array(" + ", ".join(
        f"named_struct('i', {i}, 'l', {l})"
        for (i, l) in _slots(word_cap, piece_len)) + ")"


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
        # distributed TakeOrdered, not row_number over a global Window —
        # the Window form funnels the ENTIRE distinct-word vocabulary
        # through one task's sort; (wc desc, word asc) is a total order,
        # so sort+limit picks the identical top set
        w = w.orderBy(F.col("wc").desc(), F.col("word").asc()) \
             .limit(max_words)
    return w.withColumn("wlen", F.length("word"))


def seed_pieces(words: DataFrame, piece_len: int = 3,
                seed_size: int = 80, word_cap: int = 8) -> DataFrame:
    """(piece, p): the seed unigram model — every substring slot of
    every vocab word, wc-weighted occurrence counts (exact integers, so
    the seed is engine-deterministic under ANY summation order), pruned
    to all single chars + top ``seed_size`` multi-char pieces, counts
    renormalized to probabilities."""
    # one F.expr parse of a transform over the literal slot table — the
    # unrolled F.when column list cost ~0.26 s of py4j chatter per call
    # and an analysis tree ~20x this size (r15 profile); values are
    # identical (same slots, same order, same NULL-when-invalid)
    slot_structs = F.expr(
        f"transform({_slots_lit(word_cap, piece_len)}, s -> "
        f"CASE WHEN s.i + s.l <= wlen "
        f"THEN substring(word, s.i + 1, s.l) END)")
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


# the piece table is model-grain by construction (vocab/seed size +
# charset); it is embedded in the plan as a literal map, so cap it
LITERAL_MAP_MAX_PIECES = 200_000


def _attach_slot_probs(words: DataFrame, pieces: DataFrame,
                       word_cap: int, piece_len: int) -> DataFrame:
    """Attach the current piece probs to each word as two packed
    array-of-arrays columns: ``__pfm`` (forward — [i+1][l] = prob of
    the piece of length l at offset i) and ``__pbm`` (backward —
    [k][l] = prob of the piece ENDING k-l chars from the end). Invalid
    slots (outside the word) and unknown pieces are 0.0.

    The piece table is MODEL-grain (vocab/seed size + charset — tens of
    thousands at the outside, guarded by LITERAL_MAP_MAX_PIECES), so it
    is collected once per round and embedded as a literal map: every
    slot prob is then a zero-shuffle element_at projection over the
    word frame. The earlier explode -> broadcast-join -> 30-column
    conditional pivot produced identical values but cost two shuffles
    plus the pivot's analysis time EVERY round — on a vocab-grain word
    table the planning dominated the whole EM loop (r10 profile: half
    of each 2.5 s round). Probabilities cross the driver as exact
    binary doubles (collect -> lit), so values are bitwise unchanged."""
    rows = pieces.select("piece", "p").collect()
    if len(rows) > LITERAL_MAP_MAX_PIECES:
        raise ValueError(
            f"piece table has {len(rows)} rows — beyond "
            f"LITERAL_MAP_MAX_PIECES={LITERAL_MAP_MAX_PIECES} the "
            f"plan-embedded model map bloats the task binary; shrink "
            f"the vocabulary or restore a join-based lookup")
    # the model crosses back in as a 1-row broadcast map frame (no SQL
    # escaping of corpus bytes; probabilities ride as exact binary
    # doubles) — the engine's scalar broadcast-crossJoin pattern. All
    # slot expressions below are built as ONE SQL string per column:
    # the Column-object formulation cost ~10k py4j round-trips (~1.5 s
    # socket I/O) per EM round on a vocab-grain table (r10 profile);
    # F.expr parses the identical Catalyst tree in one call, so values
    # are bitwise unchanged and the oracle hash certifies it.
    spark = words.sparkSession
    mrow = spark.createDataFrame(
        [({r["piece"]: float(r["p"]) for r in rows},)],
        "__pmap map<string,double>")

    def look(valid: str, sub: str) -> str:
        return (f"CASE WHEN {valid} THEN "
                f"coalesce(element_at(__pmap, {sub}), 0.0D) "
                f"ELSE 0.0D END")

    # packed directly as the DP's array-of-arrays matrices (__pfm[i+1][l]
    # forward, __pbm[k][l] backward) in ONE select. Deliberately kept as
    # textually UNROLLED literal arrays (word_cap x piece_len CASE
    # lookups): a transform-over-sequence lambda version was measured
    # (r15) and lost — the matrices are evaluated per WORD row on the
    # encode path's full distinct-word vocabulary, where the interpreted
    # lambda eval costs more than the one-time analysis of the unrolled
    # tree saves (x90 +11% with lambdas, against x88's planning win that
    # the slot_ec/seed transforms already capture).
    pfm = "array(" + ", ".join(
        "array(" + ", ".join(
            (look(f"{i + l} <= wlen", f"substring(word, {i + 1}, {l})")
             if i + l <= word_cap else "0.0D")
            for l in range(1, piece_len + 1)) + ")"
        for i in range(word_cap)) + ")"
    # backward slot (k, l): substr(wlen-k+1, l), valid iff k <= wlen
    # (l <= k holds by slot construction, so the piece lies inside)
    pbm = "array(" + ", ".join(
        "array(" + ", ".join(
            (look(f"{k} <= wlen",
                  f"substring(word, wlen - {k} + 1, {l})")
             if l <= min(piece_len, k) else "0.0D")
            for l in range(1, piece_len + 1)) + ")"
        for k in range(1, word_cap + 1)) + ")"
    return (words.crossJoin(F.broadcast(mrow))
            .select("word", "wc", "wlen",
                    F.expr(pfm).alias("__pfm"),
                    F.expr(pbm).alias("__pbm")))


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

    # every big expression below is ONE F.expr SQL string — identical
    # Catalyst trees to the former Column-object chains (values bitwise
    # unchanged, oracle-certified), ~10k fewer py4j round-trips per round
    def fterm(l: int) -> str:                  # i-ascending via l desc
        return (f"CASE WHEN j >= {l} THEN "
                f"element_at(acc, CAST(j - {l} + 1 AS INT)) * "
                f"element_at(element_at(__pfm, "
                f"CAST(j - {l} + 1 AS INT)), {l}) ELSE 0.0D END")

    def bterm(l: int) -> str:                  # l-ascending
        return (f"CASE WHEN k >= {l} THEN "
                f"element_at(element_at(__pbm, CAST(k AS INT)), {l}) * "
                f"element_at(acc, CAST(k - {l} + 1 AS INT)) "
                f"ELSE 0.0D END")

    fsum = "0.0D"
    for l in range(piece_len, 0, -1):
        fsum = f"({fsum} + {fterm(l)})"
    bsum = "0.0D"
    for l in range(1, piece_len + 1):
        bsum = f"({bsum} + {bterm(l)})"
    fa = (f"aggregate(sequence(1, {word_cap}), array(1.0D), "
          f"(acc, j) -> concat(acc, array({fsum})))")
    ba = (f"aggregate(sequence(1, {word_cap}), array(1.0D), "
          f"(acc, k) -> concat(acc, array({bsum})))")
    # two selects, not five withColumns — every withColumn re-analyzes
    # the whole (large) projection
    state = piv.select("word", "wc", "wlen", "__pfm",
                       F.expr(fa).alias("__fa"), F.expr(ba).alias("__ba"))
    state = state.select(
        "word", "wc", "wlen", "__pfm", "__fa", "__ba",
        F.expr("element_at(__fa, wlen + 1)").alias("__z"))
    # posterior mass of "a piece spans [i+1, i+l]":
    # f_i * p * b_(wlen - i - l) / Z — ONE transform lambda over the
    # literal slot table (array order == _slots order, so the exploded
    # rows and every downstream sort/fold are unchanged) instead of
    # len(_slots) unrolled named_struct copies; see _slots_lit
    slot_ec = (
        f"transform({_slots_lit(word_cap, piece_len)}, s -> named_struct("
        f"'i', s.i, 'l', s.l, "
        f"'piece', CASE WHEN s.i + s.l <= wlen "
        f"THEN substring(word, s.i + 1, s.l) END, "
        f"'ec', CASE WHEN s.i + s.l <= wlen AND __z > 0.0D THEN "
        f"element_at(__fa, s.i + 1) * "
        f"element_at(element_at(__pfm, s.i + 1), s.l) * "
        f"element_at(__ba, wlen - (s.i + s.l) + 1) / __z "
        f"ELSE 0.0D END))")
    contrib = (state.select(
        "word", "wc",
        F.explode(F.expr(slot_ec)).alias("s"))
        .filter(F.col("s.piece").isNotNull())
        .select("word", F.col("s.i").alias("i"),
                F.col("s.l").alias("l"),
                F.col("s.piece").alias("piece"),
                (F.col("wc") * F.col("s.ec")).alias("v")))
    if not deterministic:
        return contrib.groupBy("piece").agg(F.sum("v").alias("cnt"))
    ordered = ("transform(array_sort(collect_list(named_struct("
               "'w', word, 'i', i, 'l', l, 'v', v))), s -> s.v)")
    return contrib.groupBy("piece").agg(
        F.expr(f"aggregate({ordered}, 0.0D, (a, x) -> a + x)")
        .alias("cnt"))


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
    # the slot probs arrive already packed as the __pfm matrix; run the
    # forward DP as a RUNTIME fold with a (vs, bps) struct accumulator —
    # an unrolled column-chain formulation embeds the v trees inside
    # nested CASEs and Catalyst spent ~14 s ANALYZING them for a 31-row
    # frame; the fold's expression is constant-size. The oracle replays
    # the same products/comparisons as unrolled lateral-alias chains
    # (SQL planners handle those fine), so values still match bitwise.
    state = piv.select("word", "wlen", F.col("__pfm").alias("__pf"))
    # cand(l) = vs[j-l] * pf[j-l][l]; strict > keeps the SMALLEST
    # winning l (same order as the oracle's SQL chains); slots with
    # l > j get a -1 sentinel that can never win. Expressions are built
    # as SQL strings (single F.expr parse — the Column-object chains
    # cost thousands of py4j round-trips per call; identical Catalyst
    # trees, oracle-certified bitwise).

    def cand(l: int) -> str:
        return (f"CASE WHEN j >= {l} THEN "
                f"element_at(acc.vs, CAST(j - {l} + 1 AS INT)) * "
                f"element_at(element_at(__pf, "
                f"CAST(j - {l} + 1 AS INT)), {l}) ELSE -1.0D END")

    best, bp = cand(1), "1"
    for l in range(2, piece_len + 1):
        c = cand(l)
        bp = f"CASE WHEN {c} > {best} THEN {l} ELSE {bp} END"
        best = f"CASE WHEN {c} > {best} THEN {c} ELSE {best} END"
    fwd = (f"aggregate(sequence(1, {word_cap}), "
           f"named_struct('vs', array(1.0D), "
           f"'bps', CAST(array() AS ARRAY<INT>)), "
           f"(acc, j) -> named_struct("
           f"'vs', concat(acc.vs, array({best})), "
           f"'bps', concat(acc.bps, array(CAST({bp} AS INT)))))")
    state = state.select("word", "wlen",
                         F.expr(f"{fwd}.vs").alias("__vs"),
                         F.expr(f"{fwd}.bps").alias("__bps"))
    ok = "element_at(__vs, wlen + 1) > 0.0D"
    # Backtrack as a RUNTIME fold (constant plan size — an unrolled
    # version quintuples the expression tree per step under
    # CollapseProject). The accumulator is a plain string —
    # "PP<sep>piece<sep>piece..." with PP the 2-digit remaining
    # position — because a struct accumulator mis-binds inside
    # DuckDB 1.0 list_reduce lambdas and the oracle must replay this
    # fold verbatim. Each step consumes bp[pos] chars off the end and
    # PREPENDS the piece, so the final list reads front-to-back.
    acc0 = (f"CASE WHEN {ok} THEN "
            f"lpad(CAST(wlen AS STRING), 2, '0') ELSE '00' END")
    p = "CAST(substring(acc, 1, 2) AS INT)"
    ln = f"element_at(__bps, greatest({p}, 1))"
    step = (f"CASE WHEN {p} > 0 THEN concat("
            f"lpad(CAST({p} - {ln} AS STRING), 2, '0'), '{_SEG_SEP}', "
            f"substring(word, {p} - {ln} + 1, {ln}), "
            f"substring(acc, 3, {1 << 20})) ELSE acc END")
    final = (f"aggregate(sequence(1, {word_cap}), {acc0}, "
             f"(acc, ig) -> {step})")
    seg = (f"filter(split(substring({final}, 3, {1 << 20}), "
           f"'{_SEG_SEP}'), x -> x != '')")
    return state.select(
        "word", F.expr(f"CASE WHEN {ok} THEN {seg} END").alias("seg"))


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


def prune_schedule(seed_size: int, vocab_size: int,
                   shrink_factor: float | None,
                   n_iter: int) -> list[int]:
    """Per-EM-round multi-char prune sizes. ``shrink_factor=None`` is
    the single-cut mode: every one of the ``n_iter`` rounds prunes
    straight to ``vocab_size``. With a factor f in (0, 1) the schedule
    is the Kudo 2018 alternating EM+prune loop: round r prunes to
    max(vocab_size, floor(prev * f)) starting from ``seed_size``, until
    the target is reached; if the shrink chain is shorter than
    ``n_iter`` the remaining rounds run at ``vocab_size``. The schedule
    is a pure function of the DIALS — never of the data — so a
    generated SQL oracle can replay round-for-round without knowing the
    corpus (the x88 gate contract)."""
    if shrink_factor is None:
        return [vocab_size] * n_iter
    if not 0.0 < shrink_factor < 1.0:
        raise ValueError(f"shrink_factor must be in (0, 1), got "
                         f"{shrink_factor}")
    sizes: list[int] = []
    cur = seed_size
    while cur > vocab_size:
        cur = max(vocab_size, int(cur * shrink_factor))
        sizes.append(cur)
    while len(sizes) < n_iter:
        sizes.append(vocab_size)
    return sizes


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 60, n_iter: int = 2,
                  piece_len: int = 3, word_cap: int = 8,
                  seed_size: int = 80,
                  max_words: int | None = None,
                  shrink_factor: float | None = None,
                  deterministic: bool = False) -> DataFrame:
    """Fit the unigram tokenizer model: (piece, cnt, p) after EM
    rounds following :func:`prune_schedule` — by default ``n_iter``
    rounds each pruned to all single chars + the top ``vocab_size``
    multi-char pieces; with ``shrink_factor`` set, the Kudo 2018
    multi-round loop that alternates EM with a geometric prune from
    ``seed_size`` down to ``vocab_size`` (VERDICT r09 #6), so pieces
    competing near the cut survive long enough for their expected
    counts to stabilize instead of being guillotined on round-1
    posteriors. One Spark plan end to end — the piece table flows
    between rounds as a broadcast frame; the loop is driver-coordinated
    at VOCAB grain (the bpe.py discipline), with per-round work
    independent of corpus size."""
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
    sizes = prune_schedule(seed_size, vocab_size, shrink_factor, n_iter)
    # the word vocabulary feeds the seed and every EM round — persist
    from openapc_olap_spark.operators.dedup import _materialized
    words = _materialized(word_vocab(df, text_col, word_cap, max_words))
    # the piece table needs NO checkpoint between rounds: round N+1
    # consumes it exactly once — _attach_slot_probs COLLECTS it into the
    # literal model map, which is what already cuts the cross-round
    # lineage — and its own plan is a shallow prune over the
    # checkpointed cnt. The localCheckpoint(eager=False) this loop used
    # to add per round still ran the full Catalyst pipeline (toRdd) at
    # declaration time: ~0.4-0.6 s of pure re-planning per round in the
    # r15 profile, for a lineage cut the collect provides anyway.
    pieces = seed_pieces(words, piece_len, seed_size, word_cap)
    for size in sizes:
        # cnt IS checkpointed: it is model-grain and feeds
        # _prune_and_normalize twice (the ranked keep-set and the
        # normalizer total) — without the cut the whole E-step executes
        # once per consumer
        cnt = em_counts(words, pieces, word_cap, piece_len,
                        deterministic).localCheckpoint(eager=False)
        pieces = _prune_and_normalize(cnt, size)
    return pieces
