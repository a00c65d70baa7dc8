"""Deterministic exact-k per-group sampling (operators/sampling.py)."""

import hashlib

import pytest

from openapc_olap_spark.operators import sampling

ROWS = [(i, "big" if i <= 20 else ("mid" if i <= 26 else "tiny"))
        for i in range(1, 29)]           # big=20, mid=6, tiny=2


def _py_sample(k, seed="0"):
    pri = {i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
           for i, _ in ROWS}
    out = {}
    for grp in ("big", "mid", "tiny"):
        ids = sorted((i for i, g in ROWS if g == grp),
                     key=lambda i: (pri[i], i))
        out[grp] = set(ids[:k])
    return out


@pytest.fixture(scope="module")
def grp_df(spark):
    return spark.createDataFrame(ROWS, ["id", "grp"])


def test_exact_counts_and_python_reference(spark, grp_df):
    out = sampling.sample_k_per_group(grp_df, ["grp"], k=4, id_col="id")
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], set()).add(r["id"])
    assert {g: len(s) for g, s in got.items()} == \
        {"big": 4, "mid": 4, "tiny": 2}     # min(k, |group|)
    assert got == _py_sample(4)


def test_salted_identical_and_partition_invariant(spark, grp_df):
    def ids(df, **kw):
        return {(r["grp"], r["id"]) for r in
                sampling.sample_k_per_group(
                    df, ["grp"], k=3, id_col="id", **kw).collect()}
    a = ids(grp_df)
    assert a == ids(grp_df, salt_parts=4)
    assert a == ids(grp_df.repartition(7, "id"))


def test_seed_redraws(spark, grp_df):
    def ids(seed):
        return {r["id"] for r in sampling.sample_k_per_group(
            grp_df, ["grp"], k=5, id_col="id", seed=seed).collect()}
    assert ids("0") == ids("0")
    assert ids("0") != ids("1")             # 20-choose-5 — collision ~0
