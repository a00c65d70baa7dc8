"""Round-7 sf10 (100x) spot measurements for SCALING.md: the Arrow-argmin
cluster-outlier scan (VERDICT r06 item 2), the new write_shards sink
(item 5), the re-worked dsir_select cutoff, and the five new operator
families. Single warm run each, same protocol as the r05/r06 tables.

Usage: python scripts/sf10_r07_measure.py [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_derived"
    spark = get_spark(app_name="sf10-r07", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir,
                    ["documents", "embeddings", "events", "lineitem"])
    # the derived parquet arrives as 1-2 splits; spread across the cores
    # exactly as a real many-split corpus would arrive (the r06 _spread
    # rule) so per-core rates are what a cluster would see
    par = spark.sparkContext.defaultParallelism
    docs = t["documents"].repartition(par).cache()
    emb = t["embeddings"].repartition(par).cache()
    ev, li = t["events"], t["lineitem"]
    print("partitions:", docs.rdd.getNumPartitions(),
          emb.rdd.getNumPartitions(), "docs:", docs.count(),
          "emb:", emb.count(), flush=True)

    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import (bm25, cooc, dsir, featurehash,
                                              graph, kmeans, semdedup,
                                              sharding, zorder)

    # x59 cluster outliers with the Arrow argmin (k=200; the r06 SCALING
    # row measured the expr path at 39.1 s - the k x n interpreted argmin
    # dominates there, and a filter that INLINES the argmin predicate
    # re-evaluates it, so aggregate the flag instead of filtering on it)
    cents = kmeans.kmeans_fit(emb.limit(20000), k=200, n_iter=2,
                              vec_col="embedding", id_col="vec_id",
                              assign="arrow")
    timed("cluster_outliers k=200 method=arrow",
          lambda: semdedup.cluster_outliers(emb, cents, z=2.0,
                                            method="arrow")
          .agg(F.sum(F.col("is_outlier").cast("long"))).first()[0])

    # write_shards end-to-end sink (item 5)
    with tempfile.TemporaryDirectory() as d:
        timed("write_shards target=2M chars, 500k docs",
              lambda: sharding.write_shards(
                  docs, os.path.join(d, "sh"), target=2_000_000))
        timed("  shard count", lambda: len(
            [x for x in os.listdir(os.path.join(d, "sh"))
             if x.startswith("shard=")]))

    # dsir_select with the quantile-bracket cutoff (r06 row: 76.4 s with
    # the global-sort rank)
    target = docs.filter("doc_id % 97 = 0")
    timed("dsir_select 20%, 500k docs (bracket cutoff)",
          lambda: dsir.dsir_select(docs, target, keep_fraction=0.2)
          .count())

    # new families
    timed("bm25_top_k 3 terms k=100, 500k docs",
          lambda: bm25.bm25_top_k(docs, ["hash", "merge", "vector"],
                                  k=100).count())
    timed("pmi top-100 w=2 min=50, 500k docs",
          lambda: cooc.top_collocations(docs, k=100, window=2,
                                        min_pair_count=50).count())
    edges = ev.select((F.col("user_id") % 100000).alias("src"),
                      ((F.col("user_id") + F.col("event_id")) % 100000)
                      .alias("dst"))
    timed("pagerank 5 iters, 10M edges / 100k nodes",
          lambda: graph.pagerank(edges, n_iter=5).count())
    timed("hashed_feature_pairs m=2^18, 500k docs",
          lambda: featurehash.hashed_feature_pairs(docs, 1 << 18).count())
    with tempfile.TemporaryDirectory() as d:
        timed("write_zordered (l_partkey,l_suppkey) 60M rows, 32 files",
              lambda: zorder.write_zordered(
                  li, os.path.join(d, "zo"), ["l_partkey", "l_suppkey"],
                  bits=10, num_files=32))


if __name__ == "__main__":
    main()
