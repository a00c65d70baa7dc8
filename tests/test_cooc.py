"""Windowed co-occurrence + PMI (operators/cooc.py) vs a pure-Python
reference."""

import math

import pytest

from openapc_olap_spark.operators import cooc

DOCS = [
    (1, "new york is a big city"),
    (2, "new york new york"),
    (3, "a big dog and a big cat"),
    (4, "york"),
    (5, ""),
]


def _py_pairs(window):
    out = {}
    for _, t in DOCS:
        ts = t.lower().split()
        for i in range(len(ts)):
            for k in range(1, window + 1):
                if i + k < len(ts):
                    a, b = sorted((ts[i], ts[i + k]))
                    out[(a, b)] = out.get((a, b), 0) + 1
    return out


def _py_pmi(window, min_count):
    pairs_all = _py_pairs(window)
    pairs = {p: c for p, c in pairs_all.items() if c >= min_count}
    uni = {}
    total_tok = 0
    for _, t in DOCS:
        for tok in t.lower().split():
            uni[tok] = uni.get(tok, 0) + 1
            total_tok += 1
    # P is the UNFILTERED pair total (module formula): min_pair_count
    # prunes reporting only, it must not rescale every probability
    p_total = sum(pairs_all.values())
    return {p: math.log((c / p_total)
                        / ((uni[p[0]] / total_tok) * (uni[p[1]] / total_tok)))
            for p, c in pairs.items()}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)


def test_pair_counts_match_python(spark, docs_df):
    for w in (1, 2, 3):
        got = {(r["tok_a"], r["tok_b"]): r["n_pairs"] for r in
               cooc.cooccurrence_counts(docs_df, window=w).collect()}
        assert got == _py_pairs(w), f"window {w}"


def test_pmi_matches_python(spark, docs_df):
    got = {(r["tok_a"], r["tok_b"]): r["pmi"] for r in
           cooc.pmi_pairs(docs_df, window=2, min_pair_count=2).collect()}
    want = _py_pmi(2, 2)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12)
    top = cooc.top_collocations(docs_df, k=1, window=2,
                                min_pair_count=2).first()
    best_pmi = max(want.values())
    assert top["pmi"] == pytest.approx(best_pmi, rel=1e-12)
    assert (top["tok_a"], top["tok_b"]) == min(
        p for p, v in want.items()
        if v == pytest.approx(best_pmi, rel=1e-12))


def test_validation_and_single_token_corpus(spark):
    solo = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    # one token -> no pairs -> empty PMI frame (and no div-by-zero)
    assert cooc.pmi_pairs(solo, window=2, min_pair_count=1).count() == 0
    with pytest.raises(ValueError):
        cooc.cooccurrence_counts(solo, window=0)
