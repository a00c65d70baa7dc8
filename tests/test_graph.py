"""PageRank (operators/graph.py) vs a pure-Python power iteration with
the identical mass-conserving dangling rule."""

import pytest

from openapc_olap_spark.operators import graph

# a -> b, a -> c, b -> c, d dangling, c -> a (cycle back), parallel b->c
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"), ("c", "a"),
         ("c", "d")]


def _py_pagerank(edges, n_iter, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r[v] for v in nodes if outdeg.get(v, 0) == 0)
        inflow = {v: 0.0 for v in nodes}
        # source-id-sorted accumulation, matching deterministic=True
        for s, t in sorted(edges):
            inflow[t] += r[s] / outdeg[s]
        r = {v: (1 - d) / n + d * (inflow[v] + dangling / n)
             for v in nodes}
    return r


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"]).repartition(3)


def test_matches_python_reference(spark, edges_df):
    for it in (1, 3, 7):
        got = {r["node"]: r["rank"] for r in
               graph.pagerank(edges_df, n_iter=it,
                              deterministic=True).collect()}
        want = _py_pagerank(EDGES, it)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], rel=1e-12), (it, v)


def test_mass_conserved_and_modes_agree(spark, edges_df):
    det = {r["node"]: r["rank"] for r in
           graph.pagerank(edges_df, n_iter=5, deterministic=True).collect()}
    fast = {r["node"]: r["rank"] for r in
            graph.pagerank(edges_df, n_iter=5).collect()}
    assert sum(det.values()) == pytest.approx(1.0, abs=1e-12)
    for v in det:
        assert fast[v] == pytest.approx(det[v], rel=1e-9)


def test_partitioning_invariant_deterministic(spark, edges_df):
    a = {r["node"]: r["rank"] for r in
         graph.pagerank(edges_df.coalesce(1), n_iter=4,
                        deterministic=True).collect()}
    b = {r["node"]: r["rank"] for r in
         graph.pagerank(edges_df.repartition(7), n_iter=4,
                        deterministic=True).collect()}
    assert a == b           # bitwise, not approx


def test_validation_and_empty(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank(empty, n_iter=2).count() == 0
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    with pytest.raises(ValueError):
        graph.pagerank(edges, n_iter=0)
    with pytest.raises(ValueError):
        graph.pagerank(edges, n_iter=1, damping=1.5)
