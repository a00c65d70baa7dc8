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


def test_weighted_sample_matches_python_es(spark):
    """A-ES weighted sampling vs a pure-Python replay of the same
    md5-derived uniforms and ln(u)/w keys."""
    import hashlib
    import math

    rows = [(i, "g" + str(i % 2), float(1 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"]).repartition(5)

    def key(i, w, seed="7"):
        h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:12], 16)
        u = (h + 1) / float((1 << 48) + 1)
        return math.log(u) / w

    want = {}
    for g in ("g0", "g1"):
        members = [(i, w) for i, gg, w in rows if gg == g]
        ranked = sorted(members, key=lambda t: (-key(t[0], t[1]), t[0]))
        want[g] = [i for i, _ in ranked[:5]]
    got = {}
    out = sampling.weighted_sample_k_per_group(
        df, ["grp"], k=5, weight_col="w", id_col="doc_id", seed="7")
    for r in out.collect():
        got.setdefault(r["grp"], []).append((r["rk"], r["doc_id"]))
    for g in want:
        assert [i for _, i in sorted(got[g])] == want[g], g
    # salt-invariant and seed-sensitive
    salted = sampling.weighted_sample_k_per_group(
        df, ["grp"], k=5, weight_col="w", id_col="doc_id", seed="7",
        salt_parts=4)
    assert sorted(map(tuple, salted.collect())) \
        == sorted(map(tuple, out.collect()))
    redraw = sampling.weighted_sample_k_per_group(
        df, ["grp"], k=5, weight_col="w", id_col="doc_id", seed="8")
    assert {r["doc_id"] for r in redraw.collect()} \
        != {r["doc_id"] for r in out.collect()}


def test_weighted_sample_bias_and_hygiene(spark):
    """Heavier rows win more often across many seeds; bad weights are
    excluded; small groups come back whole."""
    rows = [(1, "g", 10.0), (2, "g", 1.0), (3, "g", 1.0), (4, "g", None),
            (5, "g", 0.0), (6, "g", -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    wins = {1: 0, 2: 0, 3: 0}
    for seed in range(40):
        picked = sampling.weighted_sample_k_per_group(
            df, ["grp"], k=1, weight_col="w", id_col="doc_id",
            seed=str(seed)).first()["doc_id"]
        assert picked in (1, 2, 3)        # null/zero/negative never drawn
        wins[picked] += 1
    assert wins[1] > wins[2] + wins[3]    # w=10 vs 1+1: ~83% expected
    # k beyond the (valid) group size returns every valid row
    assert sampling.weighted_sample_k_per_group(
        df, ["grp"], k=10, weight_col="w", id_col="doc_id").count() == 3
    with pytest.raises(ValueError):
        sampling.weighted_sample_k_per_group(
            df, ["grp"], k=0, weight_col="w", id_col="doc_id")
