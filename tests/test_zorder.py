"""Z-order clustering (operators/zorder.py) vs a pure-Python Morton
interleave; layout properties of the clustered write."""

import os

import pytest

from openapc_olap_spark.operators import zorder


def _py_scale(x, lo, hi, bits):
    top = (1 << bits) - 1
    if hi <= lo:
        return 0
    s = int(((x - lo) / (hi - lo)) * (top + 1) // 1)
    return max(0, min(top, s))


def _py_z(vals, bounds, bits):
    ncols = len(vals)
    z = 0
    for ci, (x, (lo, hi)) in enumerate(zip(vals, bounds)):
        s = _py_scale(x, lo, hi, bits)
        for j in range(bits):
            z |= ((s >> j) & 1) << (j * ncols + ci)
    return z


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [(i, float(i % 13), float((i * 7) % 17)) for i in range(200)]
    return spark.createDataFrame(rows, ["rid", "x", "y"]).repartition(5)


def test_zvalue_matches_python(spark, grid_df):
    bounds = [(0.0, 12.0), (0.0, 16.0)]
    got = {r["rid"]: r["z"] for r in grid_df.select(
        "rid", zorder.zorder_value(["x", "y"], bounds, bits=6)
        .alias("z")).collect()}
    for i in range(200):
        x, y = float(i % 13), float((i * 7) % 17)
        assert got[i] == _py_z([x, y], bounds, 6), i
    # out-of-bounds clamps to edge cells instead of corrupting bits
    oob = spark.createDataFrame([(1, -5.0, 99.0)], ["rid", "x", "y"])
    z = oob.select(zorder.zorder_value(["x", "y"], bounds, 6)
                   .alias("z")).first()["z"]
    assert z == _py_z([0.0, 16.0], bounds, 6)


def test_auto_bounds_and_cluster_order(spark, grid_df):
    bounds = zorder.column_bounds(grid_df, ["x", "y"])
    assert bounds == [(0.0, 12.0), (0.0, 16.0)]
    clustered = zorder.cluster_by_zorder(grid_df, ["x", "y"], bits=6,
                                         num_partitions=4)
    # z values are globally non-decreasing across ordered partitions
    from pyspark.sql import functions as F
    zs = [r["__z"] for r in clustered.select("__z").collect()]
    # collect preserves partition order, and rows are sorted within
    assert zs == sorted(zs)
    assert clustered.rdd.getNumPartitions() == 4


def test_write_zordered_tight_file_stats(spark, grid_df, tmp_path):
    p = str(tmp_path / "zo")
    zorder.write_zordered(grid_df, p, ["x", "y"], bits=6, num_files=4)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 4
    back = spark.read.parquet(p)
    assert back.count() == 200
    assert "__z" not in back.columns
    # data skipping works: per-file spans of BOTH columns are strictly
    # tighter than the global span on average (the point of z-order)
    import pyarrow.parquet as pq
    spans = []
    for f in files:
        t = pq.read_table(os.path.join(p, f))
        xs = t.column("x").to_pylist()
        ys = t.column("y").to_pylist()
        spans.append(((max(xs) - min(xs)) / 12.0,
                      (max(ys) - min(ys)) / 16.0))
    mean_span = sum(a + b for a, b in spans) / (2 * len(spans))
    assert mean_span < 0.9


def test_validation(spark, grid_df):
    with pytest.raises(ValueError):
        zorder.zorder_value([], [], bits=8)
    with pytest.raises(ValueError):
        zorder.zorder_value(["x"], [(0, 1), (0, 1)], bits=8)
    with pytest.raises(ValueError):
        zorder.zorder_value(["x", "y"], [(0, 1), (0, 1)], bits=32)
