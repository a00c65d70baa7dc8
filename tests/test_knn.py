"""kNN-graph construction (operators/knn.py) vs a pure-Python exact
reference; arrow/expr equality; IVF-blocked recall behavior."""

import math

import numpy as np
import pytest

from openapc_olap_spark.operators import knn

RNG = np.random.RandomState(42)
N, D = 40, 8
X = RNG.randn(N, D)


def _py_knn(mat, ids, k, metric):
    out = {}
    for i, a in enumerate(mat):
        scored = []
        for j, b in enumerate(mat):
            if ids[j] == ids[i]:
                continue
            d = float(np.dot(a, b))
            if metric == "cosine":
                na, nb = math.sqrt(float(np.dot(a, a))), \
                    math.sqrt(float(np.dot(b, b)))
                d = d / (na * nb) if na * nb > 0 else 0.0
            scored.append((-d, ids[j]))
        scored.sort()
        for rank, (nd, dj) in enumerate(scored[:k], 1):
            out[(ids[i], rank)] = (dj, -nd)
    return out


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [(i, [float(x) for x in X[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(5)


@pytest.fixture(scope="module")
def int_df(spark):
    Q = np.floor(X * 1000 + 0.5)
    rows = [(i, [float(x) for x in Q[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(5)


def test_expr_matches_python_reference(spark, vec_df):
    for metric in ("cosine", "dot"):
        want = _py_knn(X, list(range(N)), 3, metric)
        got = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
               knn.knn_graph(vec_df, dim=D, k=3, metric=metric,
                             method="expr").collect()}
        assert set(got) == set(want)
        for key in want:
            assert got[key][0] == want[key][0], (metric, key)
            assert got[key][1] == pytest.approx(want[key][1], rel=1e-9)


def test_arrow_matches_expr_and_both_certifies(spark, int_df):
    """Integer-quantized vectors: dot products are exact < 2^53, so the
    BLAS kernel and the SQL fold agree BITWISE and 'both' passes."""
    e = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
         knn.knn_graph(int_df, dim=D, k=5, metric="dot",
                       method="expr").collect()}
    a = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
         knn.knn_graph(int_df, dim=D, k=5, metric="dot",
                       method="arrow").collect()}
    assert a == e
    b = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
         knn.knn_graph(int_df, dim=D, k=5, metric="dot",
                       method="both").collect()}
    assert b == e
    # real-valued cosine: same neighbors, scores to tolerance
    e2 = {(r["src"], r["rank"]): r["dst"] for r in
          knn.knn_graph(int_df, dim=D, k=5, method="expr").collect()}
    a2 = {(r["src"], r["rank"]): r["dst"] for r in
          knn.knn_graph(int_df, dim=D, k=5, method="arrow").collect()}
    assert a2 == e2


def test_queries_subset_and_small_corpus(spark, vec_df):
    q = vec_df.filter("vec_id % 10 = 0")          # 4 query rows
    got = knn.knn_graph(vec_df, dim=D, k=3, queries=q, method="expr")
    rows = got.collect()
    assert {r["src"] for r in rows} == {0, 10, 20, 30}
    assert len(rows) == 4 * 3
    # k exceeding n-1: every other node, ranks 1..n-1
    tiny = vec_df.filter("vec_id < 4")
    out = knn.knn_graph(tiny, dim=D, k=10, method="expr").collect()
    assert len(out) == 4 * 3
    assert max(r["rank"] for r in out) == 3


def test_dirty_rows_dropped_both_sides(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
            (4, None), (5, [1.0]), (6, [1.0, None])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for method in ("expr", "arrow"):
        got = knn.knn_graph(df, dim=2, k=5, method=method).collect()
        assert {r["src"] for r in got} == {1, 2, 3}, method
        assert all(r["dst"] in (1, 2, 3) for r in got), method


def test_validation_and_arrow_cap(spark, vec_df, monkeypatch):
    with pytest.raises(ValueError, match="k must"):
        knn.knn_graph(vec_df, dim=D, k=0)
    with pytest.raises(ValueError, match="metric"):
        knn.knn_graph(vec_df, dim=D, metric="euclid")
    with pytest.raises(ValueError, match="method"):
        knn.knn_graph(vec_df, dim=D, method="bogus")
    monkeypatch.setattr(knn, "ARROW_CORPUS_CAP", 10)
    with pytest.raises(ValueError, match="ARROW_CORPUS_CAP"):
        knn.knn_graph(vec_df, dim=D, method="arrow").collect()


@pytest.fixture(scope="module")
def clustered(spark):
    """4 well-separated Gaussian blobs: IVF blocking is near-lossless
    at n_probe=1 for intra-blob neighbors, and the recall curve vs the
    exact graph is monotone in n_probe."""
    rng = np.random.RandomState(5)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0],
                        [0, 0, 10, 0], [0, 0, 0, 10]], dtype=float)
    pts = np.vstack([c + 0.5 * rng.randn(30, 4) for c in centers])
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(4)


def test_ivf_full_probe_equals_exact(spark, clustered):
    cents = knn.train_ivf_centroids(
        clustered.selectExpr("embedding as v"), k=4, vec_col="v")
    exact = {(r["src"], r["rank"]): r["dst"] for r in
             knn.knn_graph(clustered, dim=4, k=5,
                           method="expr").collect()}
    full = {(r["src"], r["rank"]): r["dst"] for r in
            knn.knn_graph_ivf(clustered, dim=4, k=5, n_probe=4,
                              centroids=cents).collect()}
    assert full == exact          # probing every list IS the exact graph


def test_ivf_arrow_scorer_matches_expr(spark, clustered):
    """score_method='arrow' (cogrouped per-list BLAS, the 100 TB
    scorer) returns the same neighbors and ranks as the expr fold;
    scores agree to float tolerance."""
    cents = knn.train_ivf_centroids(
        clustered.selectExpr("embedding as v"), k=4, vec_col="v")
    e = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
         knn.knn_graph_ivf(clustered, dim=4, k=5, n_probe=2,
                           centroids=cents).collect()}
    a = {(r["src"], r["rank"]): (r["dst"], r["score"]) for r in
         knn.knn_graph_ivf(clustered, dim=4, k=5, n_probe=2,
                           centroids=cents,
                           score_method="arrow").collect()}
    assert set(a) == set(e)
    for key in e:
        assert a[key][0] == e[key][0], key
        assert a[key][1] == pytest.approx(e[key][1], rel=1e-9)
    with pytest.raises(ValueError, match="score_method"):
        knn.knn_graph_ivf(clustered, dim=4, score_method="bogus")


def test_ivf_recall_curve(spark, clustered):
    cents = knn.train_ivf_centroids(
        clustered.selectExpr("embedding as v"), k=4, vec_col="v")
    exact = {(r["src"], r["rank"]): r["dst"] for r in
             knn.knn_graph(clustered, dim=4, k=5,
                           method="expr").collect()}
    truth = {}
    for (s, _), d in exact.items():
        truth.setdefault(s, set()).add(d)
    recalls = []
    for p in (1, 2, 4):
        got = {}
        for r in knn.knn_graph_ivf(clustered, dim=4, k=5, n_probe=p,
                                   centroids=cents).collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        hit = sum(len(got.get(s, set()) & t) for s, t in truth.items())
        tot = sum(len(t) for t in truth.values())
        recalls.append(hit / tot)
    assert recalls[0] <= recalls[1] <= recalls[2] == 1.0
    assert recalls[0] >= 0.8      # separated blobs: 1 probe nearly enough
    with pytest.raises(ValueError, match="n_probe"):
        knn.knn_graph_ivf(clustered, dim=4, n_probe=0)
