"""DSIR importance resampling (operators/dsir.py) vs an independent
pure-Python reference of the published recipe (hashed-ngram bucket
models + add-k smoothing + importance log-weights)."""

import hashlib
import math
import re

import pytest

from openapc_olap_spark.operators import dsir

N_BUCKETS = 64
SMOOTH = 1.0

RAW = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "stock market prices rose sharply in early trading"),
    (3, "the fox and the dog are friends"),
    (4, "buy cheap pills online now best price"),
    (5, "a study of fox behaviour in the wild"),
    (6, ""),
    (7, "   "),
]
TARGET = [
    (101, "the fox is a small wild dog like animal"),
    (102, "wild fox behaviour varies with habitat"),
]


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _py_ngrams(text: str, n_max: int = 2):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    toks = norm.split(" ") if norm else []
    out = []
    for n in range(1, n_max + 1):
        out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return out


def _py_model(rows):
    counts = {}
    for _, t in rows:
        for g in _py_ngrams(t):
            b = _py_bucket(g)
            counts[b] = counts.get(b, 0) + 1
    total = sum(counts.values())
    denom = total + SMOOTH * N_BUCKETS
    logp = {b: math.log((c + SMOOTH) / denom) for b, c in counts.items()}
    return logp, math.log(SMOOTH / denom)


def _py_weights():
    lt, ft = _py_model(TARGET)
    lr, fr = _py_model(RAW)
    out = {}
    for i, t in RAW:
        per = {}
        for g in _py_ngrams(t):
            b = _py_bucket(g)
            per[b] = per.get(b, 0) + 1
        # bucket-sorted fold, mirroring the operator's determinism rule
        w = 0.0
        for b in sorted(per):
            w += per[b] * (lt.get(b, ft) - lr.get(b, fr))
        out[i] = (sum(per.values()), w)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, target


def test_ngram_bag_counts_repeats(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    got = sorted(df.select(dsir.ngram_bag("text")).first()[0])
    assert got == ["a", "a", "a b", "b", "b a"]


def test_importance_weights_match_python_reference(spark, frames):
    raw, target = frames
    t_model, t_floor = dsir.fit_bucket_model(
        dsir.corpus_bucket_counts(target, N_BUCKETS), N_BUCKETS, SMOOTH)
    r_model, r_floor = dsir.fit_bucket_model(
        dsir.corpus_bucket_counts(raw, N_BUCKETS), N_BUCKETS, SMOOTH)
    got = {r["doc_id"]: (r["n_ngrams"], r["weight"])
           for r in dsir.importance_weights(
               raw, t_model, t_floor, r_model, r_floor,
               N_BUCKETS).collect()}
    want = _py_weights()
    assert set(got) == set(want)          # gram-less docs ARE present
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_weights_partitioning_invariant_bitwise(spark, frames):
    raw, target = frames
    t_model, t_floor = dsir.fit_bucket_model(
        dsir.corpus_bucket_counts(target, N_BUCKETS), N_BUCKETS, SMOOTH)
    r_model, r_floor = dsir.fit_bucket_model(
        dsir.corpus_bucket_counts(raw, N_BUCKETS), N_BUCKETS, SMOOTH)

    def run(df):
        return {r["doc_id"]: r["weight"]
                for r in dsir.importance_weights(
                    df, t_model, t_floor, r_model, r_floor,
                    N_BUCKETS).collect()}

    a = run(raw.coalesce(1))
    b = run(raw.repartition(7, "doc_id"))
    assert a == b                          # exact doubles, not approx


def test_dsir_select_keeps_target_like_docs(spark, frames):
    raw, target = frames
    out = dsir.dsir_select(raw, target, keep_fraction=0.3,
                           n_buckets=N_BUCKETS, smoothing_k=SMOOTH)
    kept = {r["doc_id"] for r in out.collect()}
    want = {i: v for i, v in _py_weights().items() if v[0] > 0}
    k = math.ceil(0.3 * len(want))
    expect = {i for i, _ in sorted(
        want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]}
    assert kept == expect
    # fox/dog docs outrank the spam and finance docs; the gram-less
    # docs (6, 7) are excluded from selection entirely
    assert kept <= {1, 3, 5}


def test_dsir_select_validates_fraction(spark, frames):
    raw, target = frames
    with pytest.raises(ValueError):
        dsir.dsir_select(raw, target, keep_fraction=0.0)


def test_empty_raw_corpus(spark, frames):
    _, target = frames
    empty = target.filter("doc_id < 0")
    out = dsir.dsir_select(empty, target, keep_fraction=0.5,
                           n_buckets=N_BUCKETS)
    assert out.count() == 0


def test_randomized_corpora_match_python_reference(spark):
    """Seeded random raw/target corpora — weights equality vs the
    published-recipe reference, one Spark job per corpus."""
    import math
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(40)]
        raw = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 12))))
               for i in range(1, 16)]
        target = [(100 + i,
                   " ".join(rng.choices(vocab[:15], k=rng.randint(3, 10))))
                  for i in range(3)]

        def model(rows):
            counts = {}
            for _, t in rows:
                for g in _py_ngrams(t):
                    b = _py_bucket(g)
                    counts[b] = counts.get(b, 0) + 1
            total = sum(counts.values())
            denom = total + SMOOTH * N_BUCKETS
            return ({b: math.log((c + SMOOTH) / denom)
                     for b, c in counts.items()},
                    math.log(SMOOTH / denom))

        lt, ft = model(target)
        lr, fr = model(raw)
        want = {}
        for i, t in raw:
            per = {}
            for g in _py_ngrams(t):
                b = _py_bucket(g)
                per[b] = per.get(b, 0) + 1
            w = 0.0
            for b in sorted(per):
                w += per[b] * (lt.get(b, ft) - lr.get(b, fr))
            want[i] = (sum(per.values()), w)

        raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
        tgt_df = spark.createDataFrame(target, ["doc_id", "text"])
        t_model, t_floor = dsir.fit_bucket_model(
            dsir.corpus_bucket_counts(tgt_df, N_BUCKETS), N_BUCKETS, SMOOTH)
        r_model, r_floor = dsir.fit_bucket_model(
            dsir.corpus_bucket_counts(raw_df, N_BUCKETS), N_BUCKETS, SMOOTH)
        got = {r["doc_id"]: (r["n_ngrams"], r["weight"])
               for r in dsir.importance_weights(
                   raw_df, t_model, t_floor, r_model, r_floor,
                   N_BUCKETS).collect()}
        assert set(got) == set(want), f"seed {seed}"
        for i in want:
            assert got[i][0] == want[i][0], f"seed {seed} doc {i}"
            assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_select_cutoff_tie_refinement(spark):
    """ADVICE r06: the exact cutoff is approx-quantile + boundary
    refinement, not a global sort. Duplicate texts put MANY docs on the
    boundary weight — the kept set must still be (weight desc, id asc)
    top-k, i.e. the smallest ids inside the tie group."""
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma") for i in range(3)],
        ["doc_id", "text"])
    # 2 target-like docs, then 10 identical middling docs (one tie
    # group), then 3 spam docs; k = ceil(0.4 * 15) = 6 -> cut lands
    # INSIDE the tie group: 2 winners + the 4 smallest tie ids
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma alpha")]
    rows += [(10 + i, "alpha zzz qqq") for i in range(10)]
    rows += [(50 + i, "spam spam spam eggs") for i in range(3)]
    raw = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    out = dsir.dsir_select(raw, target, keep_fraction=0.4,
                           n_buckets=N_BUCKETS)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 10, 11, 12, 13]
    # fraction=1 keeps every gram-ful doc without entering the cutoff
    assert dsir.dsir_select(raw, target, keep_fraction=1.0,
                            n_buckets=N_BUCKETS).count() == 15
