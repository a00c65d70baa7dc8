"""ANN quality measurement (SCALING.md evidence): recall@10 of the SRP-LSH
and IVF paths against exact brute-force cosine, across several query
vectors. Quantifies the probe-pruning/recall trade-off instead of
asserting it.

Run at the bench SF with SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 to
reproduce the SCALING.md numbers; the suite uses sf0.01 to stay fast.
"""

import os

import pytest

pytestmark = pytest.mark.slow  # statistical recall bands, not a correctness contract
from pyspark.sql import functions as F

from openapc_olap_spark.operators import similarity

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    """Deterministic query vectors drawn from the corpus (every 37th)."""
    rows = (emb.filter(F.col("vec_id") % 37 == 3)
            .orderBy("vec_id").limit(N_QUERIES).collect())
    return [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows]


def _recall(spark_df, truth_ids):
    got = {r["vec_id"] for r in spark_df.collect()}
    return len(got & truth_ids) / len(truth_ids)


def test_lsh_and_ivf_recall_at_10(emb, queries):
    """Measures the recall/probe-breadth curve. The testdata embeddings are
    near-uniform random, the HARDEST case for ANN (true neighbors barely
    closer than random), so absolute recall is modest by construction;
    the assertions check the curve's shape — more probes -> more recall —
    and a collapse floor, while the measured numbers go to SCALING.md."""
    lsh = {h: [] for h in (1, 2, 3)}
    ivf = {p: [] for p in (2, 3, 5)}
    cents = similarity.train_ivf_centroids(emb, k=8, seed=42)
    for _, q in queries:
        truth = {r["vec_id"]
                 for r in similarity.brute_force_top_k(emb, q, k=K).collect()}
        for h in lsh:
            lsh[h].append(_recall(
                similarity.lsh_top_k(emb, q, k=K, nbits=8, max_hamming=h),
                truth))
        for p in ivf:
            ivf[p].append(_recall(
                similarity.ivf_top_k(emb, cents, q, k=K, nprobe=p), truth))
    lsh_mean = {h: sum(v) / len(v) for h, v in lsh.items()}
    ivf_mean = {p: sum(v) / len(v) for p, v in ivf.items()}
    print(f"\nrecall@{K} over {len(queries)} queries at {SF}: "
          f"LSH(nbits=8) h<=1/2/3 = "
          f"{lsh_mean[1]:.3f}/{lsh_mean[2]:.3f}/{lsh_mean[3]:.3f}; "
          f"IVF(k=8) nprobe 2/3/5 = "
          f"{ivf_mean[2]:.3f}/{ivf_mean[3]:.3f}/{ivf_mean[5]:.3f}")
    # curve shape: widening the probe set never loses recall
    assert lsh_mean[1] <= lsh_mean[2] <= lsh_mean[3]
    assert ivf_mean[2] <= ivf_mean[3] <= ivf_mean[5]
    # collapse floors: a broken probe path scores ~k/n, far below these
    assert lsh_mean[2] >= 0.15
    assert ivf_mean[3] >= 0.4
    # self-query sanity: the query vector itself is always found
    vid, q = queries[0]
    top = similarity.lsh_top_k(emb, q, k=1, nbits=8, max_hamming=2).collect()
    assert top[0]["vec_id"] == vid


def test_ivf_pq_recall_curve(spark, emb):
    """VERDICT r09 #4: the IVF-PQ rung's recall curve — recall@5 vs
    exact brute-force dot, swept over re-rank breadth and probe count.
    The testdata embeddings are near-uniform random (the hardest ANN
    case: ADC quantization error rivals the true score spread), so the
    assertions check curve SHAPE and the exactness anchor, while the
    measured numbers go to SCALING.md:

    - wider re-rank -> recall never decreases, strictly better at 10x;
    - full probes + corpus-wide re-rank == exact top-k (recall 1.0) —
      the pipeline degenerates to brute force by construction;
    - Lloyd-refined sub-centroids (train_pq_cents_lloyd) stay a valid
      model: same anchor, comparable mid-curve recall."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    queries = dq.filter(F.col("vec_id") % 50 == 0)
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph(dq, dim=64, k=5, queries=queries,
                           metric="dot", method="expr").collect()}
    n = dq.count()

    def recall(n_probe, rerank, pq_cents=None):
        got = {(r["src"], r["dst"]) for r in
               pq.ivf_pq_topk(dq, 64, k=5, m=8, n_probe=n_probe,
                              rerank=rerank, pq_cents=pq_cents,
                              queries=queries).collect()}
        return len(got & exact) / len(exact)

    r15 = recall(2, 15)
    r50 = recall(2, 50)
    r150 = recall(2, 150)
    assert r15 <= r50 <= r150          # re-rank breadth curve
    assert r150 > r15                  # and it actually moves
    assert recall(4, 50) >= r50        # probe breadth curve
    # exactness anchor: all lists probed + corpus-wide re-rank
    assert recall(8, n) == 1.0
    # Lloyd-refined model: same anchor, valid mid-curve
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    lloyd = pq.train_pq_cents_lloyd(dq, coarse, m=8, ksub=16, n_iter=2)
    assert recall(8, n, pq_cents=lloyd) == 1.0
    assert 0.0 <= recall(2, 50, pq_cents=lloyd) <= 1.0


def test_ivf_pq_validation_and_dirty_rows(spark):
    """Dial validation + the shared clean-vector contract: dirty rows
    (NULL / wrong-length / null-element) are invisible on both corpus
    and query side."""
    from openapc_olap_spark.operators import pq

    clean = [(i, [float((i * 7 + j) % 11 - 5) for j in range(8)])
             for i in range(30)]
    dirty = [(100, None), (101, [1.0] * 3),
             (102, [None] + [1.0] * 7)]
    df = spark.createDataFrame(clean + dirty,
                               "vec_id long, embedding array<double>")
    out = pq.ivf_pq_topk(df, dim=8, k=2, m=4, n_lists=4, ksub=4,
                         n_probe=4, rerank=30, method="both")
    ids = {r["src"] for r in out.collect()}
    assert ids == {i for i, _ in clean}
    assert not {100, 101, 102} & ids
    with pytest.raises(ValueError, match="divisible"):
        pq.ivf_pq_topk(df, dim=8, k=2, m=3)
    with pytest.raises(ValueError, match="rerank"):
        pq.ivf_pq_topk(df, dim=8, k=5, m=4, rerank=3)
    with pytest.raises(ValueError, match="method"):
        pq.ivf_pq_topk(df, dim=8, k=2, m=4, method="bogus")


def test_pq_codes_arrow_matches_expr(spark, emb):
    """The batched encode kernel (production path at real list counts)
    must produce bit-identical (list_id, codes) to the oracle-replay
    expression path — exact integer distances + first-occurrence
    argmin tie rule on both."""
    from openapc_olap_spark.operators import pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding")).limit(400)
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16), coarse, 8)
    ex = {r["id"]: (r["list_id"], tuple(r["codes"])) for r in
          pq.pq_codes(corpus, coarse, cents, method="expr").collect()}
    ar = {r["id"]: (r["list_id"], tuple(r["codes"])) for r in
          pq.pq_codes(corpus, coarse, cents, method="arrow").collect()}
    assert ex == ar and len(ex) > 0
    with pytest.raises(ValueError, match="method"):
        pq.pq_codes(corpus, coarse, cents, method="bogus")


def test_pq_index_roundtrip_matches_in_memory(spark, emb, tmp_path):
    """write_pq_index / pq_index_topk: the written-index serving path
    returns the identical top-k (id AND score) as the in-memory
    ivf_pq_topk for the same query and dials, and the list_id probe
    predicate lands as a PartitionFilter on BOTH the codes and the
    vectors scans."""
    from openapc_olap_spark import plans
    from openapc_olap_spark.operators import pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16), coarse, 8)
    path = str(tmp_path / "pqidx")
    pq.write_pq_index(dq, path, coarse, cents)
    # query vector NOT in the corpus (perturbed member, fresh id), so
    # neither path has a self row and results compare directly
    qrow = corpus.filter(F.col("id") % 20 == 0).orderBy("id").first()
    qvec = [float(x) + (1.0 if j == 0 else 0.0)
            for j, x in enumerate(qrow["v"])]
    got = pq.pq_index_topk(spark, path, qvec, k=5, n_probe=2,
                           rerank=15)
    qdf = spark.createDataFrame([(999999, qvec)],
                                "vec_id long, embedding array<double>")
    want = (pq.ivf_pq_topk(dq, 64, k=5, m=8, n_probe=2, rerank=15,
                           coarse=coarse, pq_cents=cents, queries=qdf)
            .select(F.col("dst").alias("id"), "score"))
    g = [(r["id"], r["score"]) for r in got.collect()]
    w = [(r["id"], r["score"]) for r in want.collect()]
    assert g == w and len(g) == 5
    p = plans.plan_of(got)
    assert p.count("PartitionFilters: [isnotnull(list_id") >= 2 or \
        p.count("list_id#") >= 2     # both scans carry the probe filter


def _to_768d(df):
    """Synthesize a 768-d corpus from the 64-d testdata (VERDICT r10
    #5): concatenate 12 circularly-shifted copies of each vector —
    each block is an orthogonal transform of the base, so neighbor
    structure carries over while the byte geometry (6 KB/vector) is
    the production-embedding shape the PQ story targets."""
    blocks = [F.expr(f"concat(slice(embedding, {s + 1}, {64 - s}), "
                     f"slice(embedding, 1, {s}))")
              for s in range(0, 60, 5)]          # 12 x 64 = 768
    return df.select("vec_id",
                     F.concat(*blocks).alias("embedding"))


def test_ivf_pq_768d_end_to_end(spark, emb, tmp_path):
    """The 768-d rung (VERDICT r10 #5): the block encode kernel, ADC
    scorer and exact re-rank run end-to-end at production
    dimensionality (m=96 x 8-dim subspaces, 96 B codes vs 6 KB
    vectors); the exactness anchor (full probes + corpus-wide re-rank
    == brute force) holds; and the transactional index round-trips an
    upsert at 768d with the served top-k matching the in-memory path."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = _to_768d(emb.select("vec_id", qv.alias("embedding"))
                  .limit(200))
    assert dq.select(F.size("embedding")).first()[0] == 768
    n = dq.count()
    queries = dq.filter(F.col("vec_id") % 50 == 0)
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph(dq, dim=768, k=5, queries=queries,
                           metric="dot", method="arrow").collect()}

    def recall(n_probe, rerank):
        got = {(r["src"], r["dst"]) for r in
               pq.ivf_pq_topk(dq, 768, k=5, m=96, n_probe=n_probe,
                              rerank=rerank, queries=queries,
                              method="arrow",
                              encode_method="arrow").collect()}
        return len(got & exact) / len(exact)

    # exactness anchor: the pipeline degenerates to brute force
    assert recall(8, n) == 1.0
    r15 = recall(2, 15)
    assert 0.0 <= r15 <= recall(2, 60) <= 1.0     # re-rank curve
    # transactional index at 768d: base (4/5) + upsert (1/5), serving
    # must see an upserted vector's true neighbors
    corpus = pq._clean(dq, 768, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16),
                              coarse, 96)
    path = str(tmp_path / "pq768")
    pq.create_pq_txn_index(spark, path,
                           dq.filter(F.col("vec_id") % 5 != 0),
                           coarse, cents)
    pq.upsert_pq_txn_index(spark, path,
                           dq.filter(F.col("vec_id") % 5 == 0), seq=1)
    qvec = [float(x) for x in
            dq.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = {r["id"] for r in
           pq.pq_txn_topk(spark, path, qvec, k=5, n_probe=2,
                          rerank=15, exclude_id=0).collect()}
    want = {r["dst"] for r in
            pq.ivf_pq_topk(dq, 768, k=5, m=96, n_probe=2, rerank=15,
                           coarse=coarse, pq_cents=cents,
                           queries=dq.filter(F.col("vec_id") == 0),
                           method="arrow",
                           encode_method="arrow").collect()}
    assert got == want and len(got) == 5


def test_pq_txn_topk_batch_matches_in_memory(spark, emb, tmp_path):
    """pq_txn_topk_batch: batch serving from the STORED codes (no
    corpus re-encode) returns the identical (src, rank, dst, score)
    set as the in-memory ivf_pq_topk at the same dials — after an
    upsert, so the served index is the maintained one."""
    from openapc_olap_spark.operators import pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    base = dq.filter(F.col("vec_id") % 5 != 0)
    bc = pq._clean(base, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(bc, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(bc, 16), coarse, 8)
    path = str(tmp_path / "pqb")
    pq.create_pq_txn_index(spark, path, base, coarse, cents)
    pq.upsert_pq_txn_index(spark, path,
                           dq.filter(F.col("vec_id") % 5 == 0), seq=1)
    queries = dq.filter(F.col("vec_id") % 20 == 0)
    got = {(r["src"], r["rank"], r["dst"], r["score"]) for r in
           pq.pq_txn_topk_batch(spark, path, queries, k=5, n_probe=2,
                                rerank=15, method="arrow").collect()}
    want = {(r["src"], r["rank"], r["dst"], r["score"]) for r in
            pq.ivf_pq_topk(dq, 64, k=5, m=8, n_probe=2, rerank=15,
                           coarse=coarse, pq_cents=cents,
                           queries=queries, method="arrow",
                           encode_method="arrow").collect()}
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="rerank"):
        pq.pq_txn_topk_batch(spark, path, queries, k=5, rerank=3)


def test_pq_txn_upsert_cache_hygiene(spark, emb, tmp_path):
    """Round 14: create/upsert_pq_txn_index cache the encoded batch so
    the Arrow encode runs once per commit pair (not once per
    upsert_moving evaluation) — and unpersist it afterwards, so a
    long-running stream of batches does not accumulate caches. Pins:
    (a) no cached RDDs remain after the call, (b) the maintained
    stores' content is unchanged vs a from-scratch create."""
    from openapc_olap_spark.operators import pq
    from openapc_olap_spark.sources.txn import TxnTable

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    base = dq.filter(F.col("vec_id") % 5 != 0)
    bc = pq._clean(base, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(bc, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(bc, 16), coarse, 8)
    upd = dq.filter(F.col("vec_id") % 5 == 0)

    # delta-based: earlier tests' _materialized frames are dropped by
    # the ContextCleaner only when Python GC releases them, so a global
    # zero-cache assertion is a race against unrelated tests (observed
    # flaky in full-suite runs); what this test pins is that the
    # create/upsert pair itself leaves NO NEW cached RDD behind
    def cached_ids():
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs()
                .keySet().toArray()}

    before = cached_ids()
    inc = str(tmp_path / "inc")
    pq.create_pq_txn_index(spark, inc, base, coarse, cents)
    pq.upsert_pq_txn_index(spark, inc, upd, seq=1)
    leaked = cached_ids() - before
    assert not leaked, \
        f"upsert_pq_txn_index leaked cached frame(s): {sorted(leaked)}"

    full = str(tmp_path / "full")
    pq.create_pq_txn_index(spark, full, dq, coarse, cents)
    for sub, cols in (("codes", ["id", "list_id", "codes"]),
                      ("vectors", ["id", "list_id", "v"])):
        got = {tuple(map(str, r)) for r in
               TxnTable(spark, f"{inc}/{sub}", "list_id")
               .read().select(*cols).collect()}
        want = {tuple(map(str, r)) for r in
                TxnTable(spark, f"{full}/{sub}", "list_id")
                .read().select(*cols).collect()}
        assert got == want and len(got) > 0, sub


def test_pq_rotation_orthogonal_and_score_preserving(spark, emb):
    """OPQ-style rotation (round 11): R is orthogonal (R R^T = I),
    arrow and expr application agree bitwise-closely, dot products are
    preserved (rotating corpus AND queries leaves ivf_pq_topk's exact
    scores/ranks at the full-probe anchor identical to unrotated),
    and the subspace variance loads are balanced."""
    import numpy as np

    from openapc_olap_spark.operators import pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding")).limit(300)
    R = pq.train_pq_rotation(dq, dim=64, m=8, id_col="vec_id")
    Rm = np.asarray(R)
    assert np.allclose(Rm @ Rm.T, np.eye(64), atol=1e-9)
    # variance balance: each 8-dim block's eigen-load within 10x of any
    # other (greedy log-load allocation; unbalanced would be ~1000x)
    rot = pq.apply_rotation(dq, R, method="arrow")
    V = np.array([r["embedding"] for r in rot.collect()])
    loads = [V[:, b * 8:(b + 1) * 8].var(axis=0).sum() for b in range(8)]
    assert max(loads) / max(min(loads), 1e-12) < 10
    # expr twin agrees with the BLAS kernel
    ex = {r["vec_id"]: tuple(r["embedding"]) for r in
          pq.apply_rotation(dq, R, method="expr").collect()}
    ar = {r["vec_id"]: tuple(r["embedding"]) for r in rot.collect()}
    assert set(ex) == set(ar)
    for k_ in ex:
        assert np.allclose(ex[k_], ar[k_], atol=1e-9)
    # score preservation at the exactness anchor: full probes +
    # corpus-wide re-rank on ROTATED vectors == brute force on RAW
    from openapc_olap_spark.operators import knn
    queries = dq.filter(F.col("vec_id") % 50 == 0)
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph(dq, dim=64, k=5, queries=queries,
                           metric="dot", method="expr").collect()}
    n = dq.count()
    rot_q = pq.apply_rotation(queries, R, method="arrow")
    got = {(r["src"], r["dst"]) for r in
           pq.ivf_pq_topk(rot, 64, k=5, m=8, n_probe=8, rerank=n,
                          queries=rot_q, method="arrow",
                          encode_method="arrow").collect()}
    assert got == exact
    with pytest.raises(ValueError, match="divisible"):
        pq.train_pq_rotation(dq, dim=64, m=7)
    with pytest.raises(ValueError, match="method"):
        pq.apply_rotation(dq, R, method="bogus")


def test_pq_rotation_balances_low_rank_anisotropy(spark):
    """r12 regression (SCALING.md r12): on a LOW-RANK anisotropic
    corpus (v = Q[:, :4] @ diag(0.5^j) @ z at dim 16, m=4 — the shape
    real embeddings have) the r11 greedy collapsed ALL signal
    directions into subspace 0: log-eigenvalues < 0 made the bucket
    that just received a direction the lightest, so it swallowed every
    next one (scale-dependent anti-balancing). The layer-wise greedy
    compares only equal-fill buckets (scale-invariant) and spreads the
    four signal directions one per subspace."""
    import numpy as np

    from openapc_olap_spark.operators import pq

    rng = np.random.default_rng(7)
    q_, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    A = q_[:, :4] * (0.5 ** np.arange(4))
    Z = rng.standard_normal((400, 4))
    V = Z @ A.T
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(400)],
        "vec_id long, embedding array<double>")
    R = pq.train_pq_rotation(df, dim=16, m=4)
    rot = pq.apply_rotation(df, R, method="arrow")
    W = np.stack([np.array(r["embedding"]) for r in rot.collect()])
    loads = [W[:, b * 4:(b + 1) * 4].var(axis=0).sum() for b in range(4)]
    assert all(ld > 1e-6 for ld in loads), loads       # none starved
    assert max(loads) < 0.9 * sum(loads), loads        # none hoards
