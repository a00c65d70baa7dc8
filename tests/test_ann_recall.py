"""ANN quality measurement (SCALING.md evidence): recall@10 of the SRP-LSH
and IVF paths against exact brute-force cosine, across several query
vectors. Quantifies the probe-pruning/recall trade-off instead of
asserting it.

Run at the bench SF with SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 to
reproduce the SCALING.md numbers; the suite uses sf0.01 to stay fast.
"""

import os

import pytest
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
