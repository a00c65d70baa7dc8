"""Round-11 sf10 (100x) spot measurements for SCALING.md:

- 768-d IVF-PQ end-to-end (VERDICT r10 #5): the 64-d round-10 row
  argued the ~96x candidate-byte win at 768d from the 8.3x measured at
  64d; this measures it. The 768-d corpus is synthesized from the sf10
  embeddings by concatenating 12 circularly-shifted copies (each block
  an orthogonal transform — neighbor structure preserved, byte
  geometry = production embeddings). Reports parquet bytes of the
  codes index vs the full-vector index, wall for ivf_pq_topk (arrow)
  vs ivf-flat kNN at the same probes, and recall@5 vs exact.

- TxnTable "100 crawls against one store" (VERDICT r10 #4/#8): commit
  100 small upsert batches into a bucketed store, tracking wall/commit,
  files-per-bucket and manifest growth; then compact() + checkpoint()
  + vacuum() and report the collapsed layout. The occupancy model for
  SCALING.md's streaming/txn section.

Usage:
    python scripts/sf10_r11_measure.py [sf10_dir] [sections...]
    sections: any of pq768 txn (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark  # noqa: E402
from openapc_olap_spark.session import load_tables  # noqa: E402


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


def _run_pq768(spark, F, t, par):
    import shutil
    import tempfile

    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(f"concat(slice(embedding, {s + 1}, {64 - s}), "
                     f"slice(embedding, 1, {s}))")
              for s in range(0, 60, 5)]          # 12 x 64 = 768
    emb = (t["embeddings"].select("vec_id", qv.alias("embedding"))
           .select("vec_id", F.concat(*blocks).alias("embedding"))
           .repartition(par).cache())
    n = emb.count()
    print("vectors:", n, "dim: 768", flush=True)

    corpus = pq._clean(emb, 768, "vec_id", "embedding")
    n_lists, m, ksub = 512, 96, 16
    coarse = pq.first_n_vectors(corpus, n_lists)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, ksub),
                              coarse, m)
    queries = emb.filter(F.col("vec_id") % 997 == 0)
    nq = queries.count()
    print("queries:", nq, flush=True)

    base = tempfile.mkdtemp(prefix="sf10_pq768_")
    # byte story: codes index vs full-vector index, as parquet on disk
    codes = pq.pq_codes(corpus, coarse, cents, method="arrow")
    codes.write.mode("overwrite").partitionBy("list_id") \
        .parquet(f"{base}/codes")
    (corpus.join(codes.select("id", "list_id"), ["id"])
     .write.mode("overwrite").partitionBy("list_id")
     .parquet(f"{base}/vectors"))
    cb = _dir_bytes(f"{base}/codes")
    vb = _dir_bytes(f"{base}/vectors")
    print(f"codes index: {cb / 1e6:.2f} MB; full vectors: "
          f"{vb / 1e6:.2f} MB; ratio {vb / cb:.1f}x", flush=True)

    # exact ground truth: probe EVERY list (degenerates to brute force
    # without broadcasting a 1.2 GB corpus matrix — the per-list BLAS
    # path the ARROW_CORPUS_CAP fail-fast points at)
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(emb, dim=768, k=5, n_probe=n_lists,
                               centroids=coarse, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}

    def run_pq():
        got = {(r["src"], r["dst"]) for r in
               pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                              rerank=50, coarse=coarse, pq_cents=cents,
                              queries=queries, method="arrow",
                              encode_method="arrow").collect()}
        return (f"{len(got)} edges, recall@5 "
                f"{len(got & exact) / len(exact):.3f}")

    def run_flat():
        got = {(r["src"], r["dst"]) for r in
               knn.knn_graph_ivf(emb, dim=768, k=5, n_probe=8,
                                 centroids=coarse, queries=queries,
                                 metric="dot", assign_method="arrow",
                                 score_method="arrow").collect()}
        return (f"{len(got)} edges, recall@5 "
                f"{len(got & exact) / len(exact):.3f}")

    timed(f"IVF-PQ 768d (m={m}, n_probe=8, rerank=50, "
          f"{n_lists} lists)", run_pq)
    try:
        timed("IVF-flat 768d (n_probe=8, same lists)", run_flat)
    except Exception as e:
        print(f"ivf-flat comparison skipped: {e}", flush=True)

    # recall-recovery curve: Lloyd-refined sub-centroids (the
    # production trainer) + wider exact re-rank — seed-residual
    # centroids accumulate quantization noise over m=96 subspaces on
    # near-random data, so the dial that matters is cents quality
    # and re-rank breadth, not probe count
    def run_lloyd_train():
        return pq.train_pq_cents_lloyd(
            emb.sample(0.05, seed=7), coarse, m=m, ksub=ksub, n_iter=2)

    t0 = time.perf_counter()
    lloyd = run_lloyd_train()
    print(f"lloyd pq cents (5% sample, 2 iters, m={m}): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    def run_pq_dials(cents_used, rr, label):
        def go():
            got = {(r["src"], r["dst"]) for r in
                   pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                                  rerank=rr, coarse=coarse,
                                  pq_cents=cents_used, queries=queries,
                                  method="arrow",
                                  encode_method="arrow").collect()}
            return (f"{len(got)} edges, recall@5 "
                    f"{len(got & exact) / len(exact):.3f}")
        timed(label, go)

    run_pq_dials(lloyd, 50, "IVF-PQ 768d lloyd cents, rerank=50")
    run_pq_dials(lloyd, 200, "IVF-PQ 768d lloyd cents, rerank=200")
    run_pq_dials(cents, 200, "IVF-PQ 768d seed cents, rerank=200")
    shutil.rmtree(base, ignore_errors=True)


def _run_pq768_lloyd(spark, F, t, par):
    """The recall-recovery half of the 768-d story alone (the first
    full run OOM'd at the default 8g heap after Lloyd training — run
    this section with SPARK_GRAFT_DRIVER_MEM=48g): Lloyd-refined
    sub-centroids + wider exact re-rank vs the seed-residual cents."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(f"concat(slice(embedding, {s + 1}, {64 - s}), "
                     f"slice(embedding, 1, {s}))")
              for s in range(0, 60, 5)]
    emb = (t["embeddings"].select("vec_id", qv.alias("embedding"))
           .select("vec_id", F.concat(*blocks).alias("embedding"))
           .repartition(par).cache())
    emb.count()
    corpus = pq._clean(emb, 768, "vec_id", "embedding")
    n_lists, m, ksub = 512, 96, 16
    coarse = pq.first_n_vectors(corpus, n_lists)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, ksub),
                              coarse, m)
    queries = emb.filter(F.col("vec_id") % 997 == 0)
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(emb, dim=768, k=5, n_probe=n_lists,
                               centroids=coarse, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}

    t0 = time.perf_counter()
    lloyd = pq.train_pq_cents_lloyd(
        emb.sample(0.05, seed=7), coarse, m=m, ksub=ksub, n_iter=1)
    print(f"lloyd pq cents (5% sample, 1 iter, m={m}): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    def run_pq_dials(cents_used, rr, label):
        def go():
            got = {(r["src"], r["dst"]) for r in
                   pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                                  rerank=rr, coarse=coarse,
                                  pq_cents=cents_used, queries=queries,
                                  method="arrow",
                                  encode_method="arrow").collect()}
            return (f"{len(got)} edges, recall@5 "
                    f"{len(got & exact) / len(exact):.3f}")
        timed(label, go)

    run_pq_dials(lloyd, 50, "IVF-PQ 768d lloyd cents, rerank=50")
    run_pq_dials(lloyd, 200, "IVF-PQ 768d lloyd cents, rerank=200")
    run_pq_dials(cents, 200, "IVF-PQ 768d seed cents, rerank=200")


def _run_pq768_rot(spark, F, t, par):
    """OPQ-style rotation at 768d: eigenvalue-allocation PCA rotation
    (train_pq_rotation) applied to corpus+queries before PQ — measures
    the recall lift over the unrotated seed-cents baseline (0.033) at
    identical probes/rerank. Run with SPARK_GRAFT_DRIVER_MEM=48g."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(f"concat(slice(embedding, {s + 1}, {64 - s}), "
                     f"slice(embedding, 1, {s}))")
              for s in range(0, 60, 5)]
    raw = (t["embeddings"].select("vec_id", qv.alias("embedding"))
           .select("vec_id", F.concat(*blocks).alias("embedding"))
           .repartition(par).cache())
    raw.count()
    t0 = time.perf_counter()
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=96)
    print(f"pq rotation train (10% sample, eigh 768x768): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    emb = pq.apply_rotation(raw, R, method="arrow") \
        .repartition(par).cache()
    emb.count()
    corpus = pq._clean(emb, 768, "vec_id", "embedding")
    n_lists, m, ksub = 512, 96, 16
    coarse = pq.first_n_vectors(corpus, n_lists)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, ksub),
                              coarse, m)
    queries = emb.filter(F.col("vec_id") % 997 == 0)
    # ground truth is rotation-invariant (orthogonal R): compute on
    # the rotated frame directly
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(emb, dim=768, k=5, n_probe=n_lists,
                               centroids=coarse, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}

    def run(rr):
        def go():
            got = {(r["src"], r["dst"]) for r in
                   pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                                  rerank=rr, coarse=coarse,
                                  pq_cents=cents, queries=queries,
                                  method="arrow",
                                  encode_method="arrow").collect()}
            return (f"{len(got)} edges, recall@5 "
                    f"{len(got & exact) / len(exact):.3f}")
        timed(f"IVF-PQ 768d ROTATED seed cents, rerank={rr}", go)

    run(50)
    run(200)


def _run_pq768_aniso(spark, F, t, par):
    """Rotation on ANISOTROPIC 768d data — the distribution real
    embeddings actually have: block s of the lifted corpus is scaled
    by round(0.72^s * block), so a few directions carry most energy.
    Measures IVF-PQ recall with vs without the OPQ rotation at
    identical dials; theory says the rotation's variance re-allocation
    should now matter. SPARK_GRAFT_DRIVER_MEM=48g."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(
        f"transform(concat(slice(embedding, {s + 1}, {64 - s}), "
        f"slice(embedding, 1, {s})), "
        f"x -> CAST(floor(x * {0.72 ** s!r} + 0.5d) AS DOUBLE))")
        for s in range(0, 60, 5)]
    raw = (t["embeddings"].select("vec_id", qv.alias("embedding"))
           .select("vec_id", F.concat(*blocks).alias("embedding"))
           .repartition(par).cache())
    raw.count()
    n_lists, m, ksub = 512, 96, 16

    def curve(emb, tag):
        corpus = pq._clean(emb, 768, "vec_id", "embedding")
        coarse = pq.first_n_vectors(corpus, n_lists)
        cents = pq.train_pq_cents(pq.first_n_vectors(corpus, ksub),
                                  coarse, m)
        queries = emb.filter(F.col("vec_id") % 997 == 0)
        exact = {(r["src"], r["dst"]) for r in
                 knn.knn_graph_ivf(emb, dim=768, k=5, n_probe=n_lists,
                                   centroids=coarse, queries=queries,
                                   metric="dot",
                                   assign_method="arrow",
                                   score_method="arrow").collect()}
        for rr in (50, 200):
            def go(rr=rr):
                got = {(r["src"], r["dst"]) for r in
                       pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                                      rerank=rr, coarse=coarse,
                                      pq_cents=cents, queries=queries,
                                      method="arrow",
                                      encode_method="arrow").collect()}
                return (f"recall@5 "
                        f"{len(got & exact) / len(exact):.3f}")
            timed(f"aniso {tag}, rerank={rr}", go)

    curve(raw, "UNROTATED seed cents")
    t0 = time.perf_counter()
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=96)
    print(f"rotation train: {time.perf_counter() - t0:.1f} s",
          flush=True)
    rot = pq.apply_rotation(raw, R, method="arrow") \
        .repartition(par).cache()
    rot.count()
    curve(rot, "ROTATED seed cents")


def _run_txn(spark, F, t, par):
    import shutil
    import tempfile

    from openapc_olap_spark.sources import txn

    docs = t["documents"].select(
        F.col("doc_id").alias("k"),
        F.md5(F.col("text")).alias("val")).cache()
    n = docs.count()
    n_buckets = 64
    base = tempfile.mkdtemp(prefix="sf10_txn_")
    seed = txn.add_bucket(
        docs.filter(F.col("k") % 2 == 0)
        .withColumn("seq", F.lit(0).cast("long")), ["k"], n_buckets)
    store = txn.TxnTable.create(spark, f"{base}/t", seed, "bucket",
                                meta={"n_buckets": n_buckets})
    print(f"store seeded: {n // 2} rows, {n_buckets} buckets",
          flush=True)

    # 100 crawls: each commits ~n/200 new/updated keys
    odd = docs.filter(F.col("k") % 2 == 1)
    t0 = time.perf_counter()
    for c in range(1, 101):
        batch = txn.add_bucket(
            odd.filter(F.col("k") % 100 == c % 100)
            .withColumn("seq", F.lit(c).cast("long")), ["k"], n_buckets)
        store.upsert(batch, ["k"], "seq")
    dt = time.perf_counter() - t0
    snap = store.snapshot()
    per = {}
    for f in snap["files"]:
        per[f["partition"]] = per.get(f["partition"], 0) + 1
    manifests = len(os.listdir(store._mdir()))
    data_files = len(os.listdir(f"{base}/t/data"))
    print(f"100 upserts: {dt:.1f} s ({dt / 100 * 1000:.0f} ms/commit); "
          f"live files/bucket max={max(per.values())} "
          f"(upsert rewrites whole touched buckets); manifests="
          f"{manifests}; data files on disk={data_files}; "
          f"store bytes={_dir_bytes(base) / 1e6:.1f} MB", flush=True)

    # append-mode alternative: O(batch) commits that DO accumulate
    t0 = time.perf_counter()
    for c in range(1, 101):
        batch = txn.add_bucket(
            odd.filter(F.col("k") % 100 == c % 100)
            .withColumn("seq", F.lit(100 + c).cast("long")),
            ["k"], n_buckets)
        store.append(batch)
    dt = time.perf_counter() - t0
    per = {}
    for f in store.snapshot()["files"]:
        per[f["partition"]] = per.get(f["partition"], 0) + 1
    print(f"100 appends: {dt:.1f} s ({dt / 100 * 1000:.0f} ms/commit); "
          f"live files/bucket max={max(per.values())}", flush=True)

    def maintain():
        store.compact()
        dropped = store.checkpoint(retain_versions=1)
        gone = store.vacuum(grace_seconds=0)
        per2 = {}
        for f in store.snapshot()["files"]:
            per2[f["partition"]] = per2.get(f["partition"], 0) + 1
        return (f"files/bucket max={max(per2.values())}, dropped "
                f"{len(dropped)} manifests, reclaimed {len(gone)} files, "
                f"store now {_dir_bytes(base) / 1e6:.1f} MB")

    timed("compact + checkpoint + vacuum", maintain)
    rows = store.read().count()
    print(f"post-maintenance rows: {rows}", flush=True)
    shutil.rmtree(base, ignore_errors=True)


def main():
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_derived"
    sections = sys.argv[2:] or ["pq768", "txn"]
    spark = get_spark(app_name="sf10_r11", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir,
                    ["embeddings", "documents"])
    par = 32
    if "pq768" in sections:
        _run_pq768(spark, F, t, par)
    if "pq768lloyd" in sections:
        _run_pq768_lloyd(spark, F, t, par)
    if "pq768rot" in sections:
        _run_pq768_rot(spark, F, t, par)
    if "pq768aniso" in sections:
        _run_pq768_aniso(spark, F, t, par)
    if "txn" in sections:
        _run_txn(spark, F, t, par)
    spark.stop()


if __name__ == "__main__":
    main()
