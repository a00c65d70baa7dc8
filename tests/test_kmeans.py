"""Deterministic k-means (operators/kmeans.py) vs an independent
pure-Python Lloyd's reference with the same fully-specified rules
(smallest-k-ids init, first-index argmin tie-break, empty keeps old)."""

import math

import pytest

from openapc_olap_spark.operators import kmeans, similarity

# two tight blobs + one far singleton; ids chosen so the k=2 seed rule
# picks one vector from each blob
VECS = [
    (1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [0.2, 0.1]),
    (4, [10.1, 9.9]), (5, [0.1, 0.3]), (6, [9.9, 10.2]),
    (7, [50.0, 50.0]),
]


def _py_fit(rows, k, n_iter, init=None):
    cents = (init or
             [list(v) for _, v in sorted(rows)[:k]])
    cents = [list(map(float, c)) for c in cents]
    for _ in range(n_iter):
        sums = [[0.0] * len(cents[0]) for _ in range(k)]
        counts = [0] * k
        for _, v in sorted(rows):              # id-sorted accumulation
            d = [sum((x - y) ** 2 for x, y in zip(v, c)) for c in cents]
            cid = d.index(min(d))              # first-index tie-break
            counts[cid] += 1
            for p, x in enumerate(v):
                sums[cid][p] += x
        cents = [[s / c for s in sums[i]] if (c := counts[i]) else
                 list(cents[i]) for i in range(k)]
    return cents


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "doc_id: long, embedding: array<double>")


def test_fit_matches_python_reference_exactly(spark, vec_df):
    got = kmeans.kmeans_fit(vec_df, k=2, n_iter=3, deterministic=True)
    want = _py_fit(VECS, k=2, n_iter=3)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=0.0)   # bitwise, not approx


def test_deterministic_mode_partitioning_invariant(spark, vec_df):
    a = kmeans.kmeans_fit(vec_df.coalesce(1), k=2, n_iter=3,
                          deterministic=True)
    b = kmeans.kmeans_fit(vec_df.repartition(5, "doc_id"), k=2,
                          n_iter=3, deterministic=True)
    assert a == b


def test_fast_mode_close_to_deterministic(spark, vec_df):
    det = kmeans.kmeans_fit(vec_df, k=2, n_iter=3, deterministic=True)
    fast = kmeans.kmeans_fit(vec_df, k=2, n_iter=3, deterministic=False)
    for g, w in zip(fast, det):
        assert g == pytest.approx(w, rel=1e-9)


def test_explicit_init_and_empty_cluster_keeps_centroid(spark, vec_df):
    # third centroid near the far singleton captures exactly it; the
    # first two keep the blobs; re-fit with a centroid NO point is
    # nearest to -> it must stay put
    far = [[0.0, 0.0], [10.0, 10.0], [49.0, 49.0]]
    got = kmeans.kmeans_fit(vec_df, k=3, n_iter=1, init=far,
                            deterministic=True)
    # cluster 2 captured only (50,50); clusters 0/1 the blobs
    assert got[2] == pytest.approx([50.0, 50.0])
    nobody = [[0.0, 0.0], [10.0, 10.0], [10**6, 10**6]]
    got2 = kmeans.kmeans_fit(vec_df, k=3, n_iter=2, init=nobody,
                             deterministic=True)
    assert got2[2] == [float(10**6), float(10**6)]   # kept verbatim


def test_cost_decreases_over_iterations(spark, vec_df):
    c1 = kmeans.kmeans_fit(vec_df, k=2, n_iter=1)
    c3 = kmeans.kmeans_fit(vec_df, k=2, n_iter=3)
    assert (kmeans.kmeans_cost(vec_df, c3)
            <= kmeans.kmeans_cost(vec_df, c1) + 1e-9)


def test_feeds_ivf_assign(spark, vec_df):
    # the far singleton would drag blob2's centroid toward itself and
    # flip blob2 into blob1's cluster (Lloyd's is init-sensitive — the
    # reference test above pins that dynamic exactly); two clean blobs
    # separate under the seed rule
    two_blobs = vec_df.filter("doc_id < 7")
    cents = kmeans.kmeans_fit(two_blobs, k=2, n_iter=3)
    assigned = similarity.ivf_assign(two_blobs, cents)
    by_list = {r["doc_id"]: r["list_id"] for r in assigned.collect()}
    assert by_list[1] == by_list[3] == by_list[5]
    assert by_list[2] == by_list[4] == by_list[6]
    assert by_list[1] != by_list[2]


def test_validation(spark, vec_df):
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(vec_df, k=0)
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(vec_df, k=2, init=[[0.0, 0.0]])
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(vec_df.limit(1), k=2)


def test_arrow_assign_matches_expression_path(spark, vec_df):
    from pyspark.sql import functions as F
    from openapc_olap_spark.operators.similarity import (_nearest_centroid,
                                                         _null_elem)
    cents = [[0.0, 0.0], [10.0, 10.0], [49.0, 49.0]]
    v = F.col("embedding").cast("array<double>")
    both = vec_df.select(
        "doc_id",
        _nearest_centroid(v, cents).alias("expr_cid"),
        kmeans._nearest_centroid_arrow(cents)(v, _null_elem(v))
        .alias("arrow_cid"))
    rows = both.collect()
    assert rows and all(r["expr_cid"] == r["arrow_cid"] for r in rows)


def test_arrow_fit_equals_expr_fit(spark, vec_df):
    a = kmeans.kmeans_fit(vec_df, k=2, n_iter=3, assign="expr")
    b = kmeans.kmeans_fit(vec_df, k=2, n_iter=3, assign="arrow")
    for ca, cb in zip(a, b):
        assert ca == pytest.approx(cb, rel=1e-12)


def test_arrow_mode_validation(spark, vec_df):
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(vec_df, k=2, assign="bogus")
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(vec_df, k=2, deterministic=True, assign="arrow")


def test_ivf_assign_fast_matches_similarity(spark, vec_df):
    cents = [[0.0, 0.0], [10.0, 10.0], [49.0, 49.0]]
    slow = {r["doc_id"]: r["list_id"]
            for r in similarity.ivf_assign(vec_df, cents).collect()}
    fast = {r["doc_id"]: r["list_id"]
            for r in kmeans.ivf_assign_fast(vec_df, cents).collect()}
    assert slow == fast


def test_arrow_assign_null_and_ragged_vectors(spark):
    """ADVICE r06 + r07: the Arrow argmin must treat dirty embeddings
    exactly the way the expression path does — NULL id for NULL/ragged/
    null-element vectors, but Spark-ordered argmin (id 0, not NULL) for
    NaN-element vectors (array_min = NaN, array_position finds it at 1),
    so method='both' never trips on a NaN row."""
    import math

    from pyspark.sql import functions as F

    from openapc_olap_spark.operators.similarity import (_nearest_centroid,
                                                         _null_elem)

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0]), (4, [9.0, 9.0]),
         (5, [1.0, None]), (6, [math.nan, 1.0]), (7, [math.nan, math.nan])],
        "doc_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 10.0]]
    v = F.col("embedding").cast("array<double>")
    got = {r["doc_id"]: r["cid"] for r in df.select(
        "doc_id",
        kmeans._nearest_centroid_arrow(cents)(v, _null_elem(v))
        .alias("cid")).collect()}
    assert got[1] == 0 and got[4] == 1
    assert got[2] is None and got[3] is None and got[5] is None
    assert got[6] == 0 and got[7] == 0
    # the expression path agrees on every row
    expr = {r["doc_id"]: r["cid"] for r in df.select(
        "doc_id", _nearest_centroid(
            F.col("embedding").cast("array<double>"), cents).alias("cid"))
        .collect()}
    assert expr == got


def test_deterministic_row_ceiling_guard(spark, vec_df, monkeypatch):
    """VERDICT r06 item 4: the deterministic-mode corpus ceiling is a
    raised guard, not docstring prose."""
    from openapc_olap_spark.operators import logreg
    monkeypatch.setattr(logreg, "DETERMINISTIC_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="ceiling"):
        kmeans.kmeans_fit(vec_df, k=2, n_iter=1, deterministic=True)
    # the scalable default mode is unaffected
    assert kmeans.kmeans_fit(vec_df, k=2, n_iter=1)


def test_centroid_method_both_certifies_in_plan(spark, vec_df):
    """method='both' returns the arrow ids with a per-row in-plan
    equality assert against the expression path (the x04 discipline);
    all three methods agree, and a bogus method raises."""
    from pyspark.sql import functions as F

    cents = [[0.0, 0.0], [10.0, 10.0]]
    outs = {}
    for m in ("expr", "arrow", "both"):
        outs[m] = {r["doc_id"]: r["list_id"] for r in
                   similarity.ivf_assign(vec_df, cents, "embedding",
                                         method=m).collect()}
    assert outs["expr"] == outs["arrow"] == outs["both"]
    with pytest.raises(ValueError, match="method"):
        similarity.ivf_assign(vec_df, cents, "embedding", method="bogus")
    # the semdedup cluster paths accept the knob end-to-end
    from openapc_olap_spark.operators import semdedup
    a = semdedup.cluster_outliers(vec_df, cents, id_col="doc_id",
                                  method="both")
    b = semdedup.cluster_outliers(vec_df, cents, id_col="doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fused_arrow_cosine_matches_expr(spark):
    """The fused batch-matmul scorer (with_centroid_cosine
    method='arrow') gives bitwise-identical ids and 1e-9-close cosines
    to the expression path, including on dirty vectors."""
    from openapc_olap_spark.operators import semdedup

    import math

    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)]
    rows += [(100, None), (101, [1.0]), (102, [0.0, 0.0]),
             (103, [math.nan, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [6.0, 4.0], [3.0, 2.0]]
    e = {r["vec_id"]: (r["list_id"], r["centroid_cos"]) for r in
         semdedup.with_centroid_cosine(df, cents).collect()}
    a = {r["vec_id"]: (r["list_id"], r["centroid_cos"]) for r in
         semdedup.with_centroid_cosine(df, cents,
                                       method="arrow").collect()}
    assert set(e) == set(a)
    for k in e:
        assert e[k][0] == a[k][0], k                       # ids bitwise
        if isinstance(e[k][1], float) and math.isnan(e[k][1]):
            assert math.isnan(a[k][1]), k
        else:
            assert a[k][1] == pytest.approx(e[k][1], abs=1e-9), k
    # zero-norm AND dirty vectors score 0.0 on both paths (the expr
    # when-guard's otherwise-branch), with NULL list_id for dirty rows
    assert e[102][1] == 0.0 and a[102][1] == 0.0
    assert e[100] == (None, 0.0) and a[100] == (None, 0.0)
    # NaN vectors: Spark's NaN ordering makes the expr argmin resolve to
    # id 0 (array_min = NaN, found first) and its when(nn > 0) guard
    # TRUE (NaN > 0 in Spark), so cosine is NaN — on BOTH paths
    # (ADVICE r07: arrow used to return NULL id and would have failed
    # method='both' on a single NaN row)
    assert e[103][0] == 0 and a[103][0] == 0
    assert math.isnan(e[103][1]) and math.isnan(a[103][1])
    # cluster_outliers accepts the fused path end-to-end; its inner
    # stats join drops NULL-assignment rows on BOTH paths
    oa = semdedup.cluster_outliers(df, cents, id_col="vec_id",
                                   method="arrow")
    oe = semdedup.cluster_outliers(df, cents, id_col="vec_id")
    assert oa.filter("vec_id = 100").count() == 0
    assert oe.filter("vec_id = 100").count() == 0
    assert sorted(r["vec_id"] for r in oa.collect()) \
        == sorted(r["vec_id"] for r in oe.collect())
