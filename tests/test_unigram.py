"""Unigram-LM tokenizer training (operators/unigram.py) vs a pure-Python
forward-backward EM reference with IDENTICAL arithmetic order — the
trainer's claim is bitwise replayability (the x84/x89 discipline), so
the reference asserts equality, not approx."""

import pytest

from openapc_olap_spark.operators import unigram

DOCS = [(1, "the cat sat on the mat"), (2, "the cats sat"),
        (3, "a catalog of mats and cats"), (4, "the the the cat"),
        (5, "internationalization of the catalog")]
CAP, L = 8, 3


def _slots():
    return [(i, l) for i in range(CAP)
            for l in range(1, L + 1) if i + l <= CAP]


def _py_words(docs):
    wc = {}
    for _, t in docs:
        for w in t.lower().split():
            if w:
                w = w[:CAP]
                wc[w] = wc.get(w, 0) + 1
    return wc


def _py_prune(cnt, size, integer):
    multi = sorted((p for p in cnt if len(p) > 1),
                   key=lambda p: (-cnt[p], p))[:size]
    kept = {p: cnt[p] for p in multi}
    kept.update({p: cnt[p] for p in cnt if len(p) == 1})
    if integer:
        tot = sum(kept.values())
    else:
        tot = 0.0
        for p in sorted(kept):
            tot = tot + kept[p]
    return {p: (kept[p], kept[p] / tot) for p in kept}


def _py_seed(wc, seed_size):
    cnt = {}
    for w, c in wc.items():
        for (i, l) in _slots():
            if i + l <= len(w):
                cnt[w[i:i + l]] = cnt.get(w[i:i + l], 0) + c
    return _py_prune(cnt, seed_size, True)


def _py_em(wc, model):
    def pr(s):
        return model[s][1] if s in model else 0.0

    contrib = {}
    for w in wc:
        c, n = wc[w], len(w)
        f = [1.0]
        for j in range(1, CAP + 1):
            acc = None
            for l in range(min(L, j), 0, -1):       # i-ascending
                i = j - l
                t = f[i] * (pr(w[i:i + l]) if i + l <= n else 0.0)
                acc = t if acc is None else acc + t
            f.append(acc)
        b = [1.0]
        for k in range(1, CAP + 1):
            acc = None
            for l in range(1, min(L, k) + 1):        # l-ascending
                t = (pr(w[n - k:n - k + l]) if k <= n else 0.0) * b[k - l]
                acc = t if acc is None else acc + t
            b.append(acc)
        z = f[n]
        for (i, l) in _slots():
            if i + l <= n and z > 0.0:
                ec = f[i] * pr(w[i:i + l]) * b[n - i - l] / z
                contrib.setdefault(w[i:i + l], []).append((w, i, l, c * ec))
    out = {}
    for p, lst in contrib.items():
        acc = 0.0
        for _, _, _, v in sorted(lst):
            acc = acc + v
        out[p] = acc
    return out


def _py_train(docs, vocab_size, n_iter, seed_size):
    wc = _py_words(docs)
    model = _py_seed(wc, seed_size)
    for _ in range(n_iter):
        model = _py_prune(_py_em(wc, model), vocab_size, False)
    return model


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)


def test_word_vocab_truncates_and_ranks(spark, docs_df):
    got = {r["word"]: (r["wc"], r["wlen"]) for r in
           unigram.word_vocab(docs_df, max_words=100).collect()}
    want = {w: (c, len(w)) for w, c in _py_words(DOCS).items()}
    assert got == want
    assert "internati" not in got and "internat" in got     # 8-char cap
    top3 = {r["word"] for r in
            unigram.word_vocab(docs_df, max_words=3).collect()}
    wc = _py_words(DOCS)
    assert top3 == set(sorted(wc, key=lambda w: (-wc[w], w))[:3])


def test_seed_probs_and_char_coverage(spark, docs_df):
    words = unigram.word_vocab(docs_df, max_words=100)
    seed = {r["piece"]: r["p"] for r in
            unigram.seed_pieces(words, seed_size=10).collect()}
    want = {p: v[1] for p, v in _py_seed(_py_words(DOCS), 10).items()}
    assert seed == want                              # bitwise
    chars = {c for w in _py_words(DOCS) for c in w}
    assert chars <= set(seed)                        # full char coverage
    assert abs(sum(seed.values()) - 1.0) < 1e-12


def test_em_train_bitwise_matches_python_reference(spark, docs_df):
    want = _py_train(DOCS, vocab_size=8, n_iter=2, seed_size=12)
    got = {r["piece"]: (r["cnt"], r["p"]) for r in
           unigram.unigram_train(docs_df, vocab_size=8, n_iter=2,
                                 seed_size=12, max_words=100,
                                 deterministic=True).collect()}
    assert set(got) == set(want)
    for p in want:                                   # bitwise, not approx
        assert got[p] == want[p], p
    # useful multi-char pieces won: 'the' and 'cat' dominate this corpus
    top = sorted(got, key=lambda p: -got[p][1])[:4]
    assert "the" in top and "cat" in top


def test_scale_mode_matches_to_tolerance(spark, docs_df):
    """The plain-SUM (100 TB) path differs only in summation order."""
    det = {r["piece"]: r["p"] for r in
           unigram.unigram_train(docs_df, vocab_size=8, n_iter=2,
                                 seed_size=12, max_words=100,
                                 deterministic=True).collect()}
    fast = {r["piece"]: r["p"] for r in
            unigram.unigram_train(docs_df, vocab_size=8, n_iter=2,
                                  seed_size=12).collect()}
    assert set(det) == set(fast)
    for p in det:
        assert fast[p] == pytest.approx(det[p], rel=1e-9)


MODEL = ([("jo", .02), ("in", .02), ("ha", .02), ("sh", .02),
          ("row", .03), ("sca", .02), ("an", .02), ("ba", .02),
          ("tch", .02), ("the", .03), ("cat", .03), ("at", .02)]
         + [(c, .005) for c in "abcdefghijklmnopqrstuvwxyz"])


def _py_viterbi(w, P, cap=8, L=3):
    w = w[:cap]
    n = len(w)
    v = [1.0] + [0.0] * n
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        best = v[j - 1] * P.get(w[j - 1:j], 0.0)
        b = 1
        for l in range(2, min(L, j) + 1):
            c = v[j - l] * P.get(w[j - l:j], 0.0)
            if c > best:
                best, b = c, l
        v[j], bp[j] = best, b
    if v[n] <= 0.0:
        return None
    seg, p = [], n
    while p > 0:
        seg.append(w[p - bp[p]:p])
        p -= bp[p]
    return list(reversed(seg))


def test_viterbi_encode_matches_python(spark):
    P = dict(MODEL)
    pieces = spark.createDataFrame(MODEL, "piece string, p double")
    docs = [(1, "join hash row batch scan"),
            (2, "the cat hatch Scan  JOIN"),     # case/space normalize
            (3, "zebra q!x internationalization"),  # unk + 8-char cap
            (4, "a")]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
    got = {r["doc_id"]: r["pieces"] for r in
           unigram.unigram_encode(df, pieces).collect()}
    for did, t in docs:
        want = []
        for tok in t.lower().split():
            s = _py_viterbi(tok, P)
            want += s if s else ["<unk>"]
        assert got[did] == want, (did, got[did], want)
    # ties: 'at' (0.02) vs 'a'+'t' (0.000025): piece wins; and the
    # smallest-l tie rule is exercised via equal-probability chars
    assert "at" in got[2] or "cat" in got[2]


def test_encode_after_train_round_trip(spark, docs_df):
    """Encoding with a model trained on the same corpus segments every
    token (full char coverage -> no <unk>) and concatenating the
    pieces of each doc reproduces its whitespace-joined tokens."""
    model = unigram.unigram_train(docs_df, vocab_size=8, n_iter=1,
                                  seed_size=12, max_words=100)
    out = unigram.unigram_encode(docs_df, model)
    rows = {r["doc_id"]: r["pieces"] for r in out.collect()}
    for did, t in DOCS:
        toks = [w[:CAP] for w in t.lower().split()]
        assert "".join(rows[did]) == "".join(toks), did
        assert "<unk>" not in rows[did]


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="n_iter"):
        unigram.unigram_train(docs_df, n_iter=0)
    with pytest.raises(ValueError, match="piece_len"):
        unigram.unigram_train(docs_df, piece_len=9, word_cap=8)
    with pytest.raises(ValueError, match="ceiling"):
        unigram.unigram_train(docs_df, deterministic=True)


def test_prune_schedule_is_dial_pure():
    """VERDICT r09 #6: the Kudo shrink loop's per-round prune sizes are
    a pure function of the dials (never the data), so generated SQL
    oracles can replay round-for-round."""
    assert unigram.prune_schedule(80, 60, None, 2) == [60, 60]
    assert unigram.prune_schedule(120, 60, 0.7, 2) == [84, 60]
    assert unigram.prune_schedule(500, 60, 0.75, 2) == [
        375, 281, 210, 157, 117, 87, 65, 60]
    # shrink chain shorter than n_iter: pad with target-size rounds
    assert unigram.prune_schedule(70, 60, 0.5, 3) == [60, 60, 60]
    with pytest.raises(ValueError, match="shrink_factor"):
        unigram.prune_schedule(80, 60, 1.5, 2)


def test_unigram_train_shrink_loop(spark):
    """shrink_factor training: multi-char piece count respects every
    round's prune size and the final model is at target size; the
    explicit schedule replayed by hand gives the identical model."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(4)]
        + [(9, "a banana and a bandana")],
        ["doc_id", "text"])
    got = unigram.unigram_train(docs, vocab_size=4, n_iter=2,
                                piece_len=3, word_cap=6, seed_size=9,
                                shrink_factor=0.7, max_words=50,
                                deterministic=True)
    rows = {r["piece"]: (r["cnt"], r["p"]) for r in got.collect()}
    assert sum(1 for k in rows if len(k) > 1) <= 4
    # replay the schedule by hand: [6, 4] for seed 9 -> 0.7
    assert unigram.prune_schedule(9, 4, 0.7, 2) == [6, 4]
    from openapc_olap_spark.operators.dedup import _materialized
    words = _materialized(unigram.word_vocab(docs, "text", 6, 50))
    pieces = unigram.seed_pieces(words, 3, 9, 6)
    for size in [6, 4]:
        cnt = unigram.em_counts(words, pieces, 6, 3, True)
        pieces = unigram._prune_and_normalize(cnt, size)
    want = {r["piece"]: (r["cnt"], r["p"]) for r in pieces.collect()}
    assert rows == want
