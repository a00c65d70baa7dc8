"""BM25 (operators/bm25.py) vs an independent pure-Python Okapi
reference with the same Lucene-style IDF."""

import math

import pytest

from openapc_olap_spark.operators import bm25

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps"),
    (3, "lazy summer days and lazy nights"),
    (4, "a fox and a cat"),
    (5, "completely unrelated text about spark"),
]
K1, B = 1.2, 0.75


def _py_bm25(query):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfc = {}
    for ts in toks.values():
        for t in set(ts):
            dfc[t] = dfc.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        s = 0.0
        hit = False
        for t in sorted(set(q.lower() for q in query)):
            tf = ts.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
        if hit:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)


def test_scores_match_python_reference(spark, docs_df):
    got = {r["doc_id"]: r["score"] for r in
           bm25.bm25_score(docs_df, ["lazy", "fox"]).collect()}
    want = _py_bm25(["lazy", "fox"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_top_k_order_and_tie_break(spark, docs_df):
    rows = bm25.bm25_top_k(docs_df, ["fox", "cat"], k=3).collect()
    want = _py_bm25(["fox", "cat"])
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["doc_id"] for r in rows] == [i for i, _ in order]


def test_amortized_stats_and_duplicate_query_terms(spark, docs_df):
    stats = bm25.corpus_stats(docs_df)
    row = docs_df.selectExpr(
        "count(*) as n",
        "avg(size(filter(split(lower(text), '\\\\s+'), t -> t != ''))) "
        "as avgdl").first()
    a = {r["doc_id"]: r["score"] for r in
         bm25.bm25_score(docs_df, ["lazy", "LAZY", "lazy"],
                         stats=stats, n_docs=int(row["n"]),
                         avgdl=float(row["avgdl"])).collect()}
    b = {r["doc_id"]: r["score"] for r in
         bm25.bm25_score(docs_df, ["lazy"]).collect()}
    assert a == b


def test_partitioning_invariant_and_validation(spark, docs_df):
    a = sorted(map(tuple, bm25.bm25_score(
        docs_df.coalesce(1), ["quick", "dog"], round_to=9).collect()))
    b = sorted(map(tuple, bm25.bm25_score(
        docs_df.repartition(7), ["quick", "dog"], round_to=9).collect()))
    assert a == b
    with pytest.raises(ValueError):
        bm25.bm25_score(docs_df, [])
    with pytest.raises(ValueError):
        bm25.bm25_top_k(docs_df, ["x"], k=0)
