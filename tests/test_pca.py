"""Distributed PCA (operators/pca.py) vs numpy and a pure-Python
power-iteration twin."""

import math

import numpy as np
import pytest

from openapc_olap_spark.operators import pca

RNG = np.random.RandomState(7)
# anisotropic cloud: dominant direction ~ [3, 1, 0.2]
BASE = RNG.randn(80, 3) * np.array([3.0, 1.0, 0.2])
ROT = np.linalg.qr(RNG.randn(3, 3))[0]
DATA = BASE @ ROT + np.array([1.0, -2.0, 0.5])


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [(i, [float(x) for x in DATA[i]]) for i in range(len(DATA))]
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>") \
        .repartition(5)


def test_covariance_matches_numpy(spark, vec_df):
    cov, mean, n = pca.covariance_matrix(vec_df, dim=3)
    assert n == 80
    np.testing.assert_allclose(mean, DATA.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(cov, np.cov(DATA.T, bias=True), rtol=1e-9)


def test_deterministic_covariance_partition_invariant(spark, vec_df):
    a = pca.covariance_matrix(vec_df.coalesce(1), dim=3,
                              deterministic=True)
    b = pca.covariance_matrix(vec_df.repartition(7, "doc_id"), dim=3,
                              deterministic=True)
    assert a == b            # bitwise, not approx


def test_top_component_matches_eigh_direction(spark, vec_df):
    cov, mean, _ = pca.covariance_matrix(vec_df, dim=3)
    comp = pca.top_component(cov, n_iter=50)
    comps, eigvals = pca.principal_components(cov, k=3)
    dot = abs(sum(a * b for a, b in zip(comp, comps[0])))
    assert dot == pytest.approx(1.0, abs=1e-9)
    assert eigvals[0] >= eigvals[1] >= eigvals[2] >= -1e-9
    assert sum(x * x for x in comp) == pytest.approx(1.0, rel=1e-12)


def test_projection_explains_variance(spark, vec_df):
    cov, mean, n = pca.covariance_matrix(vec_df, dim=3)
    comps, eigvals = pca.principal_components(cov, k=2)
    out = pca.project(vec_df, comps, mean)
    P = np.array([r["pca"] for r in out.orderBy("doc_id").collect()])
    # per-coordinate variance of the projection == the eigenvalue
    np.testing.assert_allclose(P.var(axis=0), eigvals[:2], rtol=1e-9)
    # coordinates are uncorrelated
    assert abs(np.cov(P.T, bias=True)[0, 1]) < 1e-9


def test_power_iteration_python_twin(spark, vec_df):
    """top_component's folds are fully specified: an independent Python
    replay (same ascending loops) is BITWISE identical."""
    cov, _, _ = pca.covariance_matrix(vec_df, dim=3,
                                      deterministic=True)
    d = len(cov)
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(4):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc = acc + cov[i][j] * v[j]
            w.append(acc)
        nrm = 0.0
        for i in range(d):
            nrm = nrm + w[i] * w[i]
        nrm = math.sqrt(nrm)
        v = [x / nrm for x in w]
    first = next(i for i, x in enumerate(v) if abs(x) > 1e-12)
    if v[first] < 0:
        v = [-y for y in v]
    assert pca.top_component(cov, n_iter=4) == v


def test_validation_and_empty(spark, vec_df):
    with pytest.raises(ValueError):
        pca.covariance_matrix(vec_df, dim=0)
    empty = vec_df.filter("doc_id < 0")
    cov, mean, n = pca.covariance_matrix(empty, dim=3)
    assert n == 0 and mean == [0.0] * 3
    monkey_ceiling = __import__(
        "openapc_olap_spark.operators.logreg", fromlist=["x"])
    old = monkey_ceiling.DETERMINISTIC_MAX_ROWS
    try:
        monkey_ceiling.DETERMINISTIC_MAX_ROWS = 3
        with pytest.raises(ValueError, match="ceiling"):
            pca.covariance_matrix(vec_df, dim=3, deterministic=True)
    finally:
        monkey_ceiling.DETERMINISTIC_MAX_ROWS = old


def test_moment_paths_agree_and_match_numpy(spark, vec_df):
    """VERDICT r07 #1: explode (replayable) and arrow (production) give
    the same covariance as expr, and 'both' self-certifies."""
    ref, ref_mean, _ = pca.covariance_matrix(vec_df, dim=3, method="expr")
    for m in ("explode", "arrow", "both"):
        cov, mean, n = pca.covariance_matrix(vec_df, dim=3, method=m)
        assert n == 80, m
        np.testing.assert_allclose(mean, ref_mean, rtol=1e-12, err_msg=m)
        np.testing.assert_allclose(cov, ref, rtol=1e-9, err_msg=m)


def test_high_dim_arrow_path(spark):
    """d=768 — the dimensionality the expr path cannot even plan
    (295k aggregate expressions): arrow and explode agree with numpy."""
    rng = np.random.RandomState(11)
    X = rng.randn(40, 768)
    rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>").repartition(4)
    cov, mean, n = pca.covariance_matrix(df, dim=768, method="arrow")
    assert n == 40
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(X.T, bias=True),
                               rtol=1e-8, atol=1e-12)
    # 'auto' routes above AUTO_ARROW_DIM to arrow; 'expr' refuses
    cov2, _, _ = pca.covariance_matrix(df, dim=768, method="auto")
    np.testing.assert_allclose(cov2, cov, rtol=0, atol=0)
    with pytest.raises(ValueError, match="EXPR_DIM_CAP"):
        pca.covariance_matrix(df, dim=768, method="expr")
    with pytest.raises(ValueError, match="method"):
        pca.covariance_matrix(df, dim=3, method="bogus")
    with pytest.raises(ValueError, match="deterministic"):
        pca.covariance_matrix(df, dim=3, deterministic=True,
                              method="arrow")


def test_dirty_rows_excluded_identically_on_every_path(spark):
    """ADVICE r08: ONE dirty-row contract — NULL / ragged / null-element
    rows are excluded entirely (from n, means, and covariance) by a
    shared Spark-side prefilter, so every method returns the clean-subset
    statistic and 'both'/'auto' cannot diverge on dirty corpora."""
    X = [[1.0, 2.0], [3.0, 5.0], [0.0, -1.0]]
    rows = [(1, X[0]), (2, X[1]), (3, X[2]),
            (4, None), (5, [1.0]), (6, [1.0, None]),
            (7, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    A = np.array(X)
    m = A.mean(axis=0)
    c = np.cov(A.T, bias=True)
    for method in ("expr", "explode", "arrow", "both"):
        cov, mean, n = pca.covariance_matrix(df, dim=2, method=method)
        assert n == 3, method
        np.testing.assert_allclose(mean, m, rtol=1e-12, err_msg=method)
        np.testing.assert_allclose(cov, c, rtol=1e-12, err_msg=method)
    cov, mean, n = pca.covariance_matrix(df, dim=2, deterministic=True)
    assert n == 3
    np.testing.assert_allclose(mean, m, rtol=1e-12)
    np.testing.assert_allclose(cov, c, rtol=1e-12)


def test_integer_quantized_moments_bitwise_across_paths(spark):
    """The x89 gate discipline: integer-valued doubles make every
    moment exact (< 2^53), so explode and arrow agree BITWISE and any
    engine replays them."""
    rng = np.random.RandomState(3)
    X = np.floor(rng.randn(50, 64) * 1000 + 0.5)
    rows = [(i, [float(x) for x in X[i]]) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>").repartition(7)
    a = pca.covariance_matrix(df, dim=64, method="arrow")
    e = pca.covariance_matrix(df, dim=64, method="explode")
    assert a == e                     # bitwise, not approx
