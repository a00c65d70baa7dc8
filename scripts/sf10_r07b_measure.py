"""Round-7 part-2 sf10 spot measurements: distributed PCA and fuzzy
record linkage. Same protocol as sf10_r07_measure.py.

Usage: python scripts/sf10_r07b_measure.py [sf10_dir]
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_derived"
    spark = get_spark(app_name="sf10-r07b", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    par = spark.sparkContext.defaultParallelism
    docs = t["documents"].repartition(par).cache()
    emb = t["embeddings"].repartition(par).cache()
    docs.count(); emb.count()

    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import fuzzy, pca

    dim = len(emb.first()["embedding"])
    print("embedding dim:", dim, flush=True)

    # full-dim single-pass covariance: d(d+3)/2 + 1 aggregate exprs
    cov = mean = None

    def _cov():
        nonlocal cov, mean
        cov, mean, n = pca.covariance_matrix(emb, dim=dim,
                                             vec_col="embedding",
                                             id_col="vec_id")
        return n
    timed(f"pca covariance d={dim}, 200k vecs (one pass)", _cov)
    comps, eigvals = pca.principal_components(cov, k=8)
    timed("pca project k=8, 200k vecs (zero-shuffle scan)",
          lambda: pca.project(emb, comps, mean, vec_col="embedding")
          .agg(F.sum(F.element_at("pca", 1))).first()[0] and 0 or 0)

    # fuzzy linkage over high-entropy synthesized names. Two lessons
    # baked in (SCALING.md r07 part 2): q=4 keeps the q-gram blocking's
    # sum(df^2) join volume within budget where q=3 over this token
    # space times out; and low-entropy name formats die at the
    # cap+bound (a run on "src7 rec 431"-style names matched nothing —
    # every informative gram was capped). SPARK_GRAFT_DRIVER_MEM=48g
    # recommended: the dense duplicate load yields ~25M verified pairs.
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
    timed("fuzzy_duplicates q=4 max_dist=2 cap=20000, 500k names",
          lambda: fuzzy.fuzzy_duplicates(
              named, col="name", id_col="doc_id", max_dist=2, q=4,
              gram_cap=20000).count())


if __name__ == "__main__":
    main()
