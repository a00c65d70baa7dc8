"""WordPiece tokenizer: likelihood-scored merge training + greedy
longest-match-first encoding (operators/wordpiece.py)."""

from pyspark.sql import functions as F

from openapc_olap_spark.operators import wordpiece as wp


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(rows)],
        "doc_id long, text string")


def test_seed_symbols_mark_continuations(spark):
    v = wp.with_wordpiece_symbols(
        spark.createDataFrame([("abc",), ("x",)], "word string"))
    got = {r["word"]: r["symbols"] for r in v.collect()}
    assert got == {"abc": ["a", "##b", "##c"], "x": ["x"]}


def test_glue_strips_continuation_marker():
    assert wp._glue("a", "##b") == "ab"
    assert wp._glue("##a", "##b") == "##ab"


def test_train_scores_by_likelihood_not_frequency(spark):
    # pair (##i ##d) occurs 3x with rare parts; (l ##o) occurs 6x but
    # its parts are everywhere — WordPiece must pick the rare-part pair
    # first where raw-frequency BPE would pick the common one.
    docs = _docs(spark, ["low lower lowest new newer newest",
                         "low low new wide wider widest",
                         "er er est low new"])
    log, vocab = wp.wordpiece_train(docs, 2)
    assert (log[0]["left"], log[0]["right"]) == ("##i", "##d")
    assert log[0]["cnt"] == 3 and log[0]["cl"] == 3 and log[0]["cr"] == 3
    assert log[1]["token"] == "wid"
    segs = {r["word"]: r["symbols"] for r in vocab.collect()}
    assert segs["wide"] == ["wid", "##e"]
    assert segs["low"] == ["l", "##o", "##w"]   # untouched by merge 1-2


def test_encode_greedy_longest_match_and_order(spark):
    docs = _docs(spark, ["aab ab b"])
    toks = ["a", "##a", "##b", "##ab", "b", "ab"]
    enc = wp.wordpiece_encode(docs, toks, word_cap=8, max_piece=4)
    row = enc.collect()[0]
    # "aab" -> a + ##ab (longest continuation beats ##a ##b);
    # "ab" -> ab (whole-word token beats a + ##b); order preserved
    assert row["wp_tokens"] == ["a", "##ab", "ab", "b"]
    assert row["n_wp_tokens"] == 4


def test_encode_unk_for_unknown_and_overlong(spark):
    docs = _docs(spark, ["ab xq abcdefghi"])
    toks = ["a", "##b"]
    enc = wp.wordpiece_encode(docs, toks, word_cap=8, max_piece=4)
    row = enc.collect()[0]
    # xq has no vocab coverage -> one [UNK]; abcdefghi exceeds word_cap
    assert row["wp_tokens"] == ["a", "##b", wp.UNK, wp.UNK]


def test_vocab_tokens_alphabet_plus_merges(spark):
    docs = _docs(spark, ["ab ab ba"])
    log, _ = wp.wordpiece_train(docs, 1)
    init = wp.with_wordpiece_symbols(wp.word_counts(docs))
    toks = wp.vocab_tokens(init, log)
    assert set(toks) == {"a", "b", "##a", "##b", log[0]["token"]}


def test_encode_matches_trained_segmentation(spark):
    """Greedy encode with the trained vocab reproduces the training
    segmentation on the training corpus (no merge fold at inference)."""
    docs = _docs(spark, ["low lower lowest new newer newest",
                         "low low new wide wider widest"])
    log, vocab = wp.wordpiece_train(docs, 4)
    init = wp.with_wordpiece_symbols(wp.word_counts(docs))
    toks = wp.vocab_tokens(init, log)
    seg = wp.segment_words(vocab.select("word"), toks,
                           word_cap=8, max_piece=8)
    both = vocab.join(seg, "word")
    bad = both.filter(F.col("symbols") != F.col("pieces")).collect()
    assert bad == [], bad
