"""Trained char-n-gram Naive Bayes language id (operators/langid.py):
differential test against a pure-Python reference implementation of the
same math (md5 buckets, Laplace smoothing, prior + default-adjusted
scores), plus learning/determinism properties."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark.operators import langid

M = 256  # small bucket space so collisions are exercised
N = 3
ALPHA = 1.0

CORPUS = [
    # three synthetic "languages" with genuinely distinct character
    # distributions: vowel-heavy, consonant-cluster-heavy, digit-heavy
    (1, "aa", "aeea ooua aiee uoau eaio aaee ouio eeau"),
    (2, "aa", "oui aie eau oue aia eou uie aoe iua eio"),
    (3, "aa", "aeiou aoeui eaiou ioaue uaeio oieau"),
    (4, "bb", "strk krst tsrk rkts skrt krts strk tskr"),
    (5, "bb", "brzk zkrb krbz bzrk rzbk zbrk brkz kzbr"),
    (6, "bb", "grpt prtg tgrp rptg ptgr trpg grtp pgrt"),
    (7, "cc", "101 110 011 100 010 001 111 000 1010 0101"),
    (8, "cc", "2020 0202 2002 0220 2200 0022 202 020"),
    (9, "cc", "3113 1331 3131 1313 3311 1133 313 131"),
    (10, "aa", "eeoo aaii oouu eeaa iioo uuee aoao eiei"),
    (11, "bb", "klmn nmlk lknm mnkl nklm lmkn kmln nlkm"),
    (12, "cc", "4554 5445 4545 5454 5544 4455 454 545"),
]

HELD_OUT = [
    (101, "aa", "aeae ouou eiei auau oeoe uiui aeio euoa"),
    (102, "bb", "krkr stst rzrz bzbz tgtg rprp zkzk skbr"),
    (103, "cc", "1221 2112 1212 2121 2211 1122 121 212"),
]


def _norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def _bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % M


def _grams(t):
    t = _norm(t)
    return [_bucket(t[i:i + N]) for i in range(len(t) - N + 1)]


def _py_fit(corpus):
    cnt, tot, docs = defaultdict(Counter), Counter(), Counter()
    for _id, lang, text in corpus:
        docs[lang] += 1
        for b in _grams(text):
            cnt[lang][b] += 1
            tot[lang] += 1
    nd = sum(docs.values())
    model = {(l, b): math.log((c + ALPHA) / (tot[l] + ALPHA * M))
             for l in cnt for b, c in cnt[l].items()}
    stats = {l: (math.log(docs[l] / nd),
                 math.log(ALPHA / (tot[l] + ALPHA * M))) for l in docs}
    return model, stats


def _py_scores(doc_text, model, stats):
    pairs = Counter(_grams(doc_text))
    t = sum(pairs.values())
    out = {}
    for lang, (prior, default) in stats.items():
        adj = sum(c * (model[(lang, b)] - default)
                  for b, c in sorted(pairs.items()) if (lang, b) in model)
        out[lang] = round(prior + t * default + adj, langid.SCORE_DECIMALS)
    return out


def _py_predict(doc_text, model, stats):
    sc = _py_scores(doc_text, model, stats)
    return min(sc, key=lambda l: (-sc[l], l))


@pytest.fixture(scope="module")
def fitted(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, lang string, "
                                       "text string")
    model, stats = langid.langid_fit(df, n=N, n_buckets=M, alpha=ALPHA)
    return df, model.cache(), stats.cache()


def test_model_matches_python_reference(spark, fitted):
    _df, model, stats = fitted
    py_model, py_stats = _py_fit(CORPUS)
    got = {(r["lang"], r["bucket"]): r["logp"] for r in model.collect()}
    assert set(got) == set(py_model)
    for k, v in py_model.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    for r in stats.collect():
        prior, default = py_stats[r["lang"]]
        assert r["prior_logp"] == pytest.approx(prior, abs=1e-9)
        assert r["default_logp"] == pytest.approx(default, abs=1e-9)


def test_scores_and_predictions_match_python_reference(spark, fitted):
    _df, model, stats = fitted
    py_model, py_stats = _py_fit(CORPUS)
    test_df = spark.createDataFrame(HELD_OUT, "doc_id long, lang string, "
                                              "text string")
    sc = {(r["doc_id"], r["lang"]): r["score"]
          for r in langid.langid_scores(
              test_df, model, stats, n=N, n_buckets=M).collect()}
    for doc_id, _lang, text in HELD_OUT:
        py = _py_scores(text, py_model, py_stats)
        for lang, v in py.items():
            assert sc[(doc_id, lang)] == pytest.approx(v, abs=2e-6), \
                (doc_id, lang)
    preds = {r["doc_id"]: r["pred_lang"] for r in langid.langid_predict(
        test_df, model, stats, n=N, n_buckets=M).collect()}
    for doc_id, _lang, text in HELD_OUT:
        assert preds[doc_id] == _py_predict(text, py_model, py_stats)


def test_learns_separable_languages(spark, fitted):
    """The held-out docs (unseen strings, same char distributions) all
    classify correctly — the operator actually learns."""
    _df, model, stats = fitted
    test_df = spark.createDataFrame(HELD_OUT, "doc_id long, lang string, "
                                              "text string")
    preds = {r["doc_id"]: r["pred_lang"] for r in langid.langid_predict(
        test_df, model, stats, n=N, n_buckets=M).collect()}
    assert preds == {101: "aa", 102: "bb", 103: "cc"}


def test_empty_and_short_text_predict_via_prior(spark, fitted):
    """Texts shorter than n yield zero grams: the score reduces to the
    prior and the argmax is the most frequent training language with
    lang-ascending tie-break — never a crash or a dropped row."""
    _df, model, stats = fitted
    test_df = spark.createDataFrame([(201, ""), (202, "ab")],
                                    "doc_id long, text string")
    out = langid.langid_predict(test_df, model, stats,
                                n=N, n_buckets=M).collect()
    # priors are 5/12 (aa) vs 4/12 (bb) vs 3/12 (cc) -> aa wins
    assert {r["doc_id"]: r["pred_lang"] for r in out} \
        == {201: "aa", 202: "aa"}


def test_gram_extraction_is_position_complete(spark):
    df = spark.createDataFrame([(1, "  AbC  dE ")], "id long, t string")
    got = df.select(langid.char_ngram_buckets("t", n=N, n_buckets=M)
                    .alias("g")).first()["g"]
    # normalized text "abc de" -> 4 overlapping grams, position order
    assert got == [_bucket(g) for g in ["abc", "bc ", "c d", " de"]]
