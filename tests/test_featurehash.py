"""Feature hashing (operators/featurehash.py) vs a pure-Python md5
reference; composition with logreg."""

import hashlib

import pytest

from openapc_olap_spark.operators import featurehash

DOCS = [
    (1, "spam spam ham"),
    (2, "ham eggs"),
    (3, ""),
    (4, "Spam HAM spam"),
]
M = 16


def _bucket(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % M


def _sign(tok):
    return 1.0 if int(hashlib.md5(tok.encode()).hexdigest()[15], 16) % 2 == 0 \
        else -1.0


def _py_dense(text, signed=True):
    v = [0.0] * M
    for t in text.lower().split():
        v[_bucket(t)] += _sign(t) if signed else 1.0
    return v


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(3)


def test_dense_matches_python(spark, docs_df):
    for signed in (True, False):
        got = {r["doc_id"]: list(r["features"]) for r in
               featurehash.hashed_features(docs_df, M,
                                           signed=signed).collect()}
        for i, t in DOCS:
            assert got[i] == _py_dense(t, signed), (i, signed)
    # empty doc -> all-zero vector, not a missing row
    assert got[3] == [0.0] * M


def test_sparse_dense_consistency(spark, docs_df):
    pairs = featurehash.hashed_feature_pairs(docs_df, M)
    sparse = {}
    for r in pairs.collect():
        sparse.setdefault(r["doc_id"], {})[r["bucket"]] = r["value"]
    dense = {r["doc_id"]: list(r["features"]) for r in
             featurehash.hashed_features(docs_df, M).collect()}
    for i in dense:
        for b in range(M):
            assert dense[i][b] == sparse.get(i, {}).get(b, 0.0)


def test_logreg_adapter_roundtrip(spark):
    from openapc_olap_spark.operators import logreg

    rows = [(i, "good quality document text here", 1) for i in range(8)]
    rows += [(100 + i, "spam spam buy now cheap", 0) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    feat = featurehash.with_hashed_feature_cols(df, 8)
    cols = [f"f{i}" for i in range(8)]
    w = logreg.logreg_fit(feat, cols, "label", n_iter=30, lr=0.5)
    scored = logreg.logreg_score(feat, w, cols)
    got = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    assert min(got[i] for i in range(8)) \
        > max(got[100 + i] for i in range(8))


def test_validation(spark, docs_df):
    with pytest.raises(ValueError):
        featurehash.hashed_feature_pairs(docs_df, 0)
