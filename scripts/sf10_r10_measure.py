"""Round-10 sf10 (100x) spot measurements for SCALING.md:

- IVF-PQ vs IVF-flat kNN over the 200k x 64d embeddings — wall-clock
  AND bytes: the PQ candidate stage reads the m-codes index instead of
  full float vectors (parquet sizes of both reported), with the exact
  re-rank touching only rerank * |Q| full vectors.
- x85 aggregate-grain fuzzy linkage (fuzzy.linkage_stats) vs the r09
  gate shape that expanded the full true-pair set (24.8M pairs).
- x88 unigram trainer after the r10 expression-build rewrite + Kudo
  shrink loop, full word vocab (SUM mode).

Same protocol as sf10_r09_measure.py (local[32], warm caches,
wall-clock). Usage:
    python scripts/sf10_r10_measure.py [sf10_dir] [sections...]
    sections: any of pq fuzzy unigram (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark  # noqa: E402
from openapc_olap_spark.tpch import load_tables  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f} s ({out})", flush=True)
    return dt


def _dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files)
    return total


def _run_pq(spark, F, t, par):
    import shutil
    import tempfile

    from openapc_olap_spark.operators import knn, pq
    from openapc_olap_spark.operators.similarity import \
        train_ivf_centroids

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    emb = (t["embeddings"].select("vec_id", qv.alias("embedding"))
           .repartition(par).cache())
    n = emb.count()
    print("vectors:", n, flush=True)
    cents = None

    def _train():
        nonlocal cents
        cents = train_ivf_centroids(emb.sample(0.1, seed=7), k=512,
                                    max_iter=3)
        return len(cents)
    timed("ivf centroids k=512 (10% sample train)", _train)
    timed("IVF-FLAT knn_graph_ivf: k=10, n_probe=2, 512 lists "
          "(arrow assign + cogrouped BLAS, full vectors on the "
          "probe join)",
          lambda: knn.knn_graph_ivf(emb, dim=64, k=10, n_probe=2,
                                    centroids=cents,
                                    assign_method="arrow",
                                    score_method="arrow").count())
    corpus = pq._clean(emb, 64, "vec_id", "embedding")
    pqc = None

    def _trainpq():
        nonlocal pqc
        pqc = pq.train_pq_cents_lloyd(
            emb.sample(0.05, seed=7), cents, m=8, ksub=16, n_iter=2)
        return sum(len(x) for x in pqc)
    timed("pq sub-centroids m=8 ksub=16 (5% sample, 2 Lloyd iters)",
          _trainpq)
    timed("IVF-PQ ivf_pq_topk: k=10, n_probe=2, rerank=30, 512 lists "
          "(arrow encode + LUT scorer, codes on the probe join)",
          lambda: pq.ivf_pq_topk(emb, dim=64, k=10, m=8, n_probe=2,
                                 rerank=30, coarse=cents, pq_cents=pqc,
                                 method="arrow",
                                 encode_method="arrow").count())
    # bytes: what the candidate stage reads per vector
    base = f"{tempfile.gettempdir()}/sf10_pq_bytes"
    shutil.rmtree(base, ignore_errors=True)
    codes = pq.pq_codes(corpus, cents, pqc, method="arrow")
    codes.select("id", "list_id",
                 F.col("codes").cast("array<tinyint>").alias("codes")) \
        .write.parquet(f"{base}/codes")
    corpus.write.parquet(f"{base}/vectors")
    cb, vb = _dir_bytes(f"{base}/codes"), _dir_bytes(f"{base}/vectors")
    print(f"bytes on the candidate path: codes index {cb:,} B "
          f"vs full vectors {vb:,} B ({vb / cb:.1f}x)", flush=True)
    emb.unpersist()


def _run_fuzzy(F, fuzzy, docs):
    base = F.concat(F.col("source"), F.lit(" "),
                    F.substring(F.md5((F.col("doc_id") % 20000)
                                      .cast("string")), 1, 8))
    variant = F.col("doc_id") % 4
    name = (F.when(variant == 0, base)
            .when(variant == 1, F.upper(base))
            .when(variant == 2, F.concat(
                F.substring(base, 1, 2), F.lit("x"),
                F.substring(base, 4, 1000)))
            .otherwise(F.concat(
                F.substring(base, 1, F.length(base) - 1), F.lit("z"))))
    named = docs.select("doc_id", name.alias("name"))
    timed("linkage_stats (aggregate grain, NO pair expansion), "
          "500k names / 20k key groups",
          lambda: fuzzy.linkage_stats(
              named, col="name", id_col="doc_id", max_dist=2,
              q=3).count())
    timed("fuzzy_duplicates collapse_exact (r09 gate shape: full "
          "pair expansion)",
          lambda: fuzzy.fuzzy_duplicates(
              named, col="name", id_col="doc_id", max_dist=2, q=3,
              collapse_exact=True).count())


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/tmp/sf10_derived"
    sections = set(a for a in args if a in ("pq", "fuzzy", "unigram")) \
        or {"pq", "fuzzy", "unigram"}
    spark = get_spark(app_name="sf10-r10", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import fuzzy, unigram

    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    if "pq" in sections:
        _run_pq(spark, F, t, par)
    if sections & {"fuzzy", "unigram"}:
        docs = t["documents"].repartition(par).cache()
        docs.count()
        if "fuzzy" in sections:
            _run_fuzzy(F, fuzzy, docs)
        if "unigram" in sections:
            timed("unigram_train: 500k docs, FULL word vocab, "
                  "vocab_size=2000, shrink 0.7 from seed 4000 "
                  "(SUM mode, r10 expr-string build)",
                  lambda: unigram.unigram_train(
                      docs, vocab_size=2000, n_iter=2,
                      seed_size=4000, shrink_factor=0.7).count())


if __name__ == "__main__":
    main()
