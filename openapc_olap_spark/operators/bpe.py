"""Byte-pair-encoding vocabulary induction (SURVEY.md §2.9 X4 family —
the tokenizer-training half of a pretraining data pipeline; reference has
no equivalent, driver-mandated LLM-pipeline surface).

Distributed BPE training works at WORD-VOCABULARY grain, not corpus
grain: one corpus pass builds (word, count), and every subsequent merge
iteration runs over the vocabulary table weighted by word frequency —
the classic Sennrich et al. 2016 formulation. At 100 TB the corpus pass
is the only corpus-sized shuffle (map-side combined token count); each
merge ROUND is a vocab-sized pair count (tens of millions of rows at
web scale, one small shuffle) plus an expression-only re-segmentation.
The driver holds just the learned merge list (one tiny ``take`` per
round). Merges are logically sequential, but ``merge_batch`` lets one
round learn many at once via an EXACT batched selection rule
(``_select_merge_batch``) — at production merge counts the sequential
loop's cost is pure job-scheduling overhead (30k rounds x ~0.3 s
floor), and batching divides the round count without changing the
learned merge list.

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


def _merge_fold_multi(symbols: Column,
                      pairs: list[tuple[str, str]]) -> Column:
    """One left-to-right pass applying a BATCH of merges: like
    ``_merge_fold`` but with one WHEN branch per pair — expression size
    is linear in the batch, where nesting per-merge folds is quadratic
    in work and blows codegen memory past ~10 merges (measured OOM).

    Single-pass == per-merge sequential passes ONLY under the
    ``_select_merge_batch`` guards: token-disjoint pairs with
    collision-free concatenations can neither chain (a created token
    never equals any pair's left) nor steal each other's occurrences,
    so each glue decision depends on exactly one pair, independent of
    the others' application order."""
    def step(acc: Column, x: Column) -> Column:
        out = F.concat(acc, F.lit(" "), x)
        for left, right in pairs:
            a, b = F.lit(left), F.lit(right)
            hit = ((acc == a) | acc.endswith(F.concat(F.lit(" "), a))) \
                & (x == b)
            out = F.when(hit, F.concat(acc, b)).otherwise(out)
        return F.when(acc == F.lit(""), x).otherwise(out)

    return F.aggregate(symbols, F.lit(""), step)


def _select_merge_batch(rows, max_batch: int,
                        gated: bool = True) -> list[tuple[str, str, int]]:
    """Pick a batch of merges from the (cnt desc, pair asc)-sorted pair
    list. With ``gated=True`` (the exact mode) the batch is PROVABLY
    identical to applying that many sequential argmax merges — not the
    usual lossy approximation; ``gated=False`` keeps only the structural
    guards the single-pass fold needs (steps 1-2) and returns the whole
    prefix — the greedy production mode.

    1. Maximal conflict-free PREFIX: stop at the first pair sharing a
       TOKEN with an earlier selection (or at ``max_batch``). Token-
       disjoint merges commute, and each one's own pair count is
       invariant under applying the others.
    2. Concat-collision guards: a selected pair's concatenation
       left||right must be pairwise distinct from the other selections'
       concatenations AND from every selected token. Without this, a
       created token can collide with an existing token string (e.g.
       (ab,c) creating "abc" while an earlier round's (a,bc) token
       "abc" exists) and inflate that token's pair counts mid-replay.
    3. Strict count gate ``> cut``: ``cut`` is the first row NOT
       selected (conflict or cap). Provided no selected concatenation
       equals an EXISTING vocabulary token (step 2 covers collisions
       within the batch; ``bpe_train`` verifies the rest against the
       vocabulary itself before applying), every pair a batch merge
       CREATES is bounded by cut — it absorbs an old pair that shares a
       token with the batch, which ranks at/after the cut row — so
       members strictly above cut can never be outranked, or tied into
       via the pair-asc tie-break, mid-replay. When the fetched list is
       exhausted with no cut, every adjacent pair is in the
       token-disjoint prefix, nothing shares a token with it, nothing
       can be created — the whole prefix is safe with no gate.
    4. Fallback: if the gates empty the batch, take the single argmax —
       the plain sequential step, always exact.

    Every rejection costs only an extra round, never correctness.
    """
    used: set[str] = set()
    cats: set[str] = set()
    prefix: list[tuple[str, str, int]] = []
    cut_cnt: int | None = None
    for r in rows:
        left, right = r["pair"].split(" ", 1)
        cat = left + right
        conflict = (left in used or right in used         # token conflict
                    or cat in used or cat in cats         # concat collision
                    or left in cats or right in cats)
        if not gated:
            # greedy mode: SKIP conflicting pairs and keep scanning —
            # prefix contiguity only matters for the exactness proof,
            # and the head of a natural pair list is conflict-dense
            # (frequent tokens share letters), so stopping there caps
            # batches at ~3 (measured). The structural fold guards
            # still apply to every SELECTED pair.
            if conflict:
                continue
            prefix.append((left, right, int(r["cnt"])))
            used.add(left)
            used.add(right)
            cats.add(cat)
            if len(prefix) >= max_batch:
                break
            continue
        if len(prefix) >= max_batch or conflict:
            cut_cnt = int(r["cnt"])
            break
        prefix.append((left, right, int(r["cnt"])))
        used.add(left)
        used.add(right)
        cats.add(cat)
    if not gated:
        return prefix
    if cut_cnt is not None:
        safe = [m for m in prefix if m[2] > cut_cnt]
    else:
        safe = prefix
    return safe if safe else prefix[:1]


def bpe_train(df: DataFrame, num_merges: int,
              text_col: str = "text",
              merge_batch: int = 1,
              selection: str = "exact") -> tuple[list[tuple[str, str, int]],
                                                 DataFrame]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns
    (merges, vocab): merges = [(left, right, pair_count), ...] in learned
    order, vocab = the word table with final ``symbols``.

    Argmax tie-break is (count desc, pair asc) — deterministic across
    runs and engines. Each round is one vocab-sized pair-count job plus
    a driver fetch of at most ``merge_batch + 1`` rows; the vocabulary
    frame is persisted so rounds re-segment the cached table instead of
    replaying the corpus scan.

    ``merge_batch`` bounds how many merges one round may learn. The
    sequential loop's real cost at production merge counts is SCHEDULING
    (30k merges = 30k Spark jobs at a ~0.3 s floor each, independent of
    data size); batching learns up to N merges per pair-count job.

    ``selection`` picks the batching contract:

    - ``"exact"`` (default): ``_select_merge_batch``'s gated rule — the
      merge LIST is bit-identical to ``merge_batch=1``
      (property-tested), only the job count drops (~1.7x fewer rounds
      measured at 1000 Zipfian merges; tie-dense count regions degrade
      to sequential because exactness demands it). This is the oracle-
      certifiable mode.
    - ``"greedy"``: the standard distributed-BPE trade — take the whole
      conflict-free prefix with no count gate and no vocabulary
      collision scan, giving ~merge_batch x fewer rounds. The result is
      a VALID BPE vocabulary (every learned merge had a positive count
      when selected; the collision guards that the single-pass fold
      itself needs stay on) but is NOT argmax-faithful: a batched merge
      may be learned before a pair that interim recounting would have
      ranked higher. Deterministic for a fixed corpus+params, just a
      different (and in practice equivalent-quality) merge order — the
      mode production tokenizer training wants at 30k merges.
    """
    if selection not in ("exact", "greedy"):
        raise ValueError(f"unknown selection mode: {selection!r}")
    # localCheckpoint, not persist: each round's re-segmentation layers
    # one fold expression onto the plan, and persist KEEPS lineage — at
    # hundreds of merges the accumulated plan OOMs the driver during
    # analysis/codegen (measured at ~150 sequential rounds). Local
    # checkpointing materializes the round AND truncates the plan to a
    # scan of the stored blocks, so plan size is constant in round
    # count; old rounds' blocks are GC-cleaned once unreferenced. The
    # executor-loss caveat of localCheckpoint is acceptable for a
    # driver-coordinated trainer (restart the training job; the data
    # path stays recomputable from source).
    vocab = with_initial_symbols(word_counts(df, text_col)) \
        .localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        want = min(merge_batch, num_merges - len(merges))
        # exact mode needs exactly the boundary row beyond the batch;
        # greedy mode scans PAST conflicts, so give it a wider window
        # (the fetch is driver-side rows of (pair, cnt) — tiny)
        fetch = want + 1 if selection == "exact" else max(4 * want, 64)
        rows = (pair_counts(vocab)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .take(fetch))
        if not rows:
            break
        batch = _select_merge_batch(rows, want, gated=selection == "exact")
        if len(batch) > 1 and selection == "exact":
            # the exactness proof needs every created token string to be
            # NEW: a concat colliding with an existing token would
            # inflate that token's pair counts mid-replay. One narrow
            # vocab-scan job (no shuffle) checks the whole vocabulary;
            # on a hit, truncate the batch before the first colliding
            # member (prefix contiguity must hold). Amortized over
            # len(batch) merges, this keeps rounds at ~num_merges/N
            # with 3 jobs per round instead of 2 per merge.
            cats = F.array(*[F.lit(l + r) for l, r, _ in batch])
            hit = (vocab
                   .select(F.explode(F.array_intersect(
                       F.array_distinct("symbols"), cats)).alias("t"))
                   .limit(len(batch)).collect())
            if hit:
                bad = {r["t"] for r in hit}
                for i, (l, r, _) in enumerate(batch):
                    if l + r in bad:
                        batch = batch[:i] if i else batch[:1]
                        break
        merges.extend(batch)
        seg = F.split(_merge_fold_multi(
            F.col("symbols"), [(l, r) for l, r, _ in batch]), " ")
        vocab = vocab.withColumn("symbols", seg) \
            .localCheckpoint(eager=True)
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
               text_col: str = "text",
               broadcast_vocab: bool | None = None) -> DataFrame:
    """Segment documents with a TRAINED vocabulary (the inference half of
    BPE): (id_col, bpe_tokens array<string>, n_bpe_tokens).

    Spark-first design: instead of replaying the merge list per token
    occurrence (a per-row loop over potentially 30k+ merges), each
    document's words join the trained ``vocab`` frame's final ``symbols``
    on the word itself — one join at (doc, position) grain. The join
    carries NO forced broadcast hint by default: a web-scale word
    vocabulary (tens of millions of rows x symbol arrays) is multi-GB
    and a forced hint would OOM the driver/executors, so the strategy is
    left to Catalyst/AQE (which still broadcasts a vocabulary that
    actually fits); ``broadcast_vocab=True`` forces the hint for
    known-small vocabularies, ``False`` forces a shuffle hash join.
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
    from openapc_olap_spark.operators.lm import _hinted
    seg = _hinted(vocab.select("word", F.col("symbols").alias("__seg")),
                  broadcast_vocab)
    joined = (per.join(seg, ["word"], "left")
              .withColumn("__seg", F.coalesce(F.col("__seg"),
                                              F.split("word", ""))))
    ordered = F.flatten(F.transform(
        F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
        lambda s: s["__seg"]))
    return (joined.groupBy(id_col)
            .agg(ordered.alias("bpe_tokens"))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens")))
