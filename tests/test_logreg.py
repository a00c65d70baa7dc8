"""Deterministic logistic regression (operators/logreg.py) vs an
independent pure-Python gradient-descent reference with identical
fixed-shape float operations."""

import math

import pytest

from openapc_olap_spark.operators import logreg

# linearly separable-ish: y = 1 when f1 + f2 is large
ROWS = [
    (1, 0.1, 0.2, 0), (2, 0.2, 0.1, 0), (3, 0.3, 0.3, 0),
    (4, 0.2, 0.4, 0), (5, 1.8, 1.6, 1), (6, 1.5, 1.9, 1),
    (7, 2.0, 1.7, 1), (8, 1.6, 1.4, 1), (9, 0.9, 1.1, 1),
    (10, 1.0, 0.8, 0),
]
FEATS = ["f1", "f2"]
LR, ITERS = 5.0, 40        # mean-gradient lr; n=10 -> same trajectory
                           # as a sum-gradient lr of 0.5


def _sig(z):
    return 1.0 / (1.0 + math.exp(-z))


def _py_fit(rows, n_iter=ITERS, lr=LR, init=None):
    w = list(init) if init else [0.0, 0.0, 0.0]
    n = len(rows)
    for _ in range(n_iter):
        g = [0.0, 0.0, 0.0]
        for _, f1, f2, y in sorted(rows):       # id-sorted accumulation
            x = [1.0, f1, f2]
            # same index-ascending dot as the operator's _dot_w
            z = 0.0
            for j in range(3):
                z = z + x[j] * w[j]
            e = _sig(z) - y
            for j in range(3):
                g[j] += e * x[j]
        # same float op order as the operator: (lr * g) / n
        w = [w[j] - lr * g[j] / n for j in range(3)]
    return w


@pytest.fixture(scope="module")
def lab_df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "f1", "f2", "label"])


def test_fit_matches_python_reference(spark, lab_df):
    got = logreg.logreg_fit(lab_df, FEATS, "label", n_iter=ITERS, lr=LR,
                            deterministic=True)
    want = _py_fit(ROWS)
    # NOT bitwise across languages: JVM exp and C-libm exp differ by
    # ulps (measured ~5e-16 after 3 iterations); 1e-12 over 40
    # iterations bounds the amplification — gate rounding (4-6 dp)
    # absorbs it. Bitwise WITHIN Spark is pinned by the partitioning
    # test below.
    assert got == pytest.approx(want, rel=1e-12)


def test_deterministic_partitioning_invariant(spark, lab_df):
    a = logreg.logreg_fit(lab_df.coalesce(1), FEATS, "label",
                          n_iter=10, lr=LR, deterministic=True)
    b = logreg.logreg_fit(lab_df.repartition(7, "doc_id"), FEATS,
                          "label", n_iter=10, lr=LR, deterministic=True)
    assert a == b


def test_fast_mode_close(spark, lab_df):
    det = logreg.logreg_fit(lab_df, FEATS, "label", n_iter=ITERS, lr=LR,
                            deterministic=True)
    fast = logreg.logreg_fit(lab_df, FEATS, "label", n_iter=ITERS, lr=LR)
    assert fast == pytest.approx(det, rel=1e-9)


def test_fit_separates_and_loss_decreases(spark, lab_df):
    w = logreg.logreg_fit(lab_df, FEATS, "label", n_iter=ITERS, lr=LR)
    scored = {r["doc_id"]: r["quality_score"]
              for r in logreg.logreg_score(lab_df, w, FEATS).collect()}
    for i, f1, f2, y in ROWS:
        if i == 9 or i == 10:                  # near the boundary
            continue
        assert (scored[i] > 0.5) == bool(y), (i, scored[i])
    assert (logreg.log_loss(lab_df, w, FEATS, "label")
            < logreg.log_loss(lab_df, [0.0, 0.0, 0.0], FEATS, "label"))


def test_score_is_pure_expression_no_shuffle(spark, lab_df):
    w = [0.3, -1.0, 2.0]
    out = logreg.logreg_score(lab_df, w, FEATS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    r = {r["doc_id"]: r["quality_score"] for r in out.collect()}
    z = 0.0
    for j, x in enumerate([1.0, ROWS[0][1], ROWS[0][2]]):
        z = z + x * w[j]
    assert r[1] == pytest.approx(_sig(z), rel=1e-15)


def test_init_validation_and_empty_input(spark, lab_df):
    with pytest.raises(ValueError):
        logreg.logreg_fit(lab_df, FEATS, "label", init=[0.0])
    empty = lab_df.filter("doc_id < 0")
    w = logreg.logreg_fit(empty, FEATS, "label", n_iter=3,
                          init=[0.5, 0.5, 0.5])
    assert w == [0.5, 0.5, 0.5]                 # kept verbatim


def test_deterministic_row_ceiling_guard(spark, lab_df, monkeypatch):
    """VERDICT r06 item 4: deterministic=True is the bounded oracle-replay
    mode; above the ceiling it must raise, not build a corpus-sized
    collect_list on one reducer."""
    from openapc_olap_spark.operators import logreg as lr_mod
    monkeypatch.setattr(lr_mod, "DETERMINISTIC_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="ceiling"):
        logreg.logreg_fit(lab_df, ["f1", "f2"], "label", n_iter=1,
                          deterministic=True)
    assert logreg.logreg_fit(lab_df, ["f1", "f2"], "label", n_iter=1)
