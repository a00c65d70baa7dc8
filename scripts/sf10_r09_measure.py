"""Round-9 sf10 (100x) spot measurements for SCALING.md: star-mode
connected components vs label propagation, kNN-graph construction
(brute Arrow + IVF-blocked with the cogrouped BLAS scorer),
collapse-exact fuzzy linkage, and full-vocabulary unigram-LM training.
Same protocol as sf10_r07_measure.py (local[32], warm caches,
wall-clock).

Usage: python scripts/sf10_r09_measure.py [sf10_dir] [sections...]
       sections: any of cc knn fuzzy unigram (default: all)
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


def _run_cc(spark, F, dedup, par):
    # adversarial long chain: ONE path of 2M nodes (diameter 2M)
    chain = (spark.range(2_000_000 - 1)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b"))
             .repartition(par).cache())
    chain.count()
    for method in ("label", "star"):
        timed(f"cc {method}: 2M-node path (diameter 2M)",
              lambda m=method: dedup.connected_components(
                  chain, max_iter=40, method=m)
              .agg(F.countDistinct("comp")).first()[0])
    # dedup-shaped graph: 400k near-cliques of 5 (2M nodes, ~2M edges)
    cliq = (spark.range(2_000_000)
            .select((F.col("id") - F.col("id") % 5).alias("base"),
                    F.col("id"))
            .filter(F.col("id") % 5 != 0)
            .select(F.col("base").alias("id_a"), F.col("id").alias("id_b"))
            .unionByName(
                spark.range(2_000_000).filter("id % 5 = 1")
                .select(F.col("id").alias("id_a"),
                        (F.col("id") + 1).alias("id_b")))
            .repartition(par).cache())
    cliq.count()
    for method in ("label", "star"):
        timed(f"cc {method}: 400k 5-cliques (2M nodes, dedup shape)",
              lambda m=method: dedup.connected_components(
                  cliq, max_iter=40, method=m)
              .agg(F.countDistinct("comp")).first()[0])
    chain.unpersist()
    cliq.unpersist()


def _run_knn(spark, F, knn, t, par, brute=True):
    emb = t["embeddings"].repartition(par).cache()
    emb.count()
    dim = len(emb.first()["embedding"])
    print("embedding dim:", dim, flush=True)
    if brute:
        timed("knn_graph arrow brute: 200k x 200k, k=10 (chunked BLAS)",
              lambda: knn.knn_graph(emb, dim=dim, k=10,
                                    method="arrow").count())
    from openapc_olap_spark.operators.similarity import train_ivf_centroids
    cents = None

    def _train():
        nonlocal cents
        # n_centroids ~ n / target_list_size: 512 lists -> ~390
        # members/list, candidate volume n * 390 * 2 instead of n^2
        cents = train_ivf_centroids(emb.sample(0.1, seed=7), k=512,
                                    max_iter=3)
        return len(cents)
    timed("ivf centroids k=512 (10% sample train)", _train)
    timed("knn_graph_ivf: 200k vecs, k=10, n_probe=2, 512 lists "
          "(arrow assign + cogrouped BLAS scorer)",
          lambda: knn.knn_graph_ivf(emb, dim=dim, k=10, n_probe=2,
                                    centroids=cents,
                                    assign_method="arrow",
                                    score_method="arrow").count())
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
    timed("fuzzy_duplicates collapse_exact q=3 max_dist=2, 500k names "
          "(20k key groups; r07 plain path: 298.8 s at q=4 + cap)",
          lambda: fuzzy.fuzzy_duplicates(
              named, col="name", id_col="doc_id", max_dist=2, q=3,
              collapse_exact=True).count())


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/tmp/sf10_derived"
    sections = set(a for a in args
                   if a in ("cc", "knn", "fuzzy", "unigram")) \
        or {"cc", "knn", "fuzzy", "unigram"}
    spark = get_spark(app_name="sf10-r09", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import dedup, fuzzy, knn, unigram

    if "cc" in sections:
        _run_cc(spark, F, dedup, par)
    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    if "knn" in sections:
        _run_knn(spark, F, knn, t, par,
                 brute="nobrute" not in args)
    if sections & {"fuzzy", "unigram"}:
        docs = t["documents"].repartition(par).cache()
        docs.count()
        if "fuzzy" in sections:
            _run_fuzzy(F, fuzzy, docs)
        if "unigram" in sections:
            timed("unigram_train: 500k docs, FULL word vocab, "
                  "vocab_size=2000, 2 EM rounds (SUM mode)",
                  lambda: unigram.unigram_train(
                      docs, vocab_size=2000, n_iter=2,
                      seed_size=4000).count())


if __name__ == "__main__":
    main()
