"""Round-12 spot measurements for SCALING.md:

- REBUCKET occupancy (VERDICT r11 #6 "Done"): seed a bucketed store at
  sf1 scale, grow it 64 -> 256 buckets with bounded commits, tracking
  per-commit wall, bytes rewritten per commit, and the cost/size of a
  LIVE upsert mid-transition vs the same upsert on a quiesced table.

- WIDE-COMMIT stats harvest (VERDICT r11 #4 "Done"): land a ~1000-file
  commit (compact with max_rows_per_file) under the distributed footer
  harvest vs the serial driver loop, and report the commit-side wall of
  each — the serial loop's cost grows linearly in files, the
  distributed one stays one short task wave.

- OPQ rotation validation chain (VERDICT r11 #7): aniso2 (recall,
  stride-permuted full-rank corpus), aniso3 (IVF+PQ distortion, same),
  aniso4 (IVF+PQ distortion, low-rank corpus), aniso5 (PURE-PQ
  distortion + 1-list ADC recall, low-rank corpus — the configuration
  that isolates the allocation and shows the 25-54x / 0.64->1.00
  lift), aniso6 (full-pipeline recall at 512 lists / 8 probes —
  coarse-ceiling-limited both variants, the stage-decomposition coda).
  Run aniso* against .scale/sf10 with SPARK_GRAFT_DRIVER_MEM=48g;
  results in SCALING.md round 12.

Usage:
    python scripts/r12_measure.py [sf_dir] [sections...]
    sections: any of rebucket harvest aniso2 aniso3 aniso4 aniso5 aniso6
    (default: rebucket harvest)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark  # noqa: E402
from openapc_olap_spark.session import load_tables  # noqa: E402


def _dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _run_rebucket(spark, F, t, par):
    from openapc_olap_spark.sources import txn

    docs = t["documents"].select(
        F.col("doc_id").alias("k"), F.md5("text").alias("val")).cache()
    n = docs.count()
    base = tempfile.mkdtemp(prefix="r12_rebucket_")
    seed = txn.add_bucket(
        docs.withColumn("seq", F.lit(0).cast("long")), ["k"], 64)
    store = txn.TxnTable.create(spark, f"{base}/t", seed, "bucket",
                                meta={"n_buckets": 64})
    size0 = _dir_bytes(base)
    print(f"store seeded: {n} rows, 64 buckets, "
          f"{size0 / 1e6:.1f} MB", flush=True)

    # migrate 64 -> 256 in bounded commits of 8 old buckets each
    walls = []
    commits = 0
    t_all = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        store.rebucket(256, keys=["k"], buckets_per_commit=8)
        walls.append(time.perf_counter() - t0)
        commits += 1
        if not store.in_rebucket():
            break
        if commits == 4:     # mid-transition: a LIVE upsert
            up = txn.add_bucket(
                docs.filter(F.col("k") % 100 == 7)
                .withColumn("val", F.lit("UPDATED"))
                .withColumn("seq", F.lit(1).cast("long")), ["k"], 256)
            t0 = time.perf_counter()
            store.upsert(up, ["k"], "seq")
            mid_up = time.perf_counter() - t0
            print(f"mid-transition upsert ({n // 100} keys): "
                  f"{mid_up:.2f} s", flush=True)
    total = time.perf_counter() - t_all
    snap = store.snapshot()
    parts = {f["partition"] for f in snap["files"]}
    print(f"rebucket 64->256: {commits} bounded commits, total "
          f"{total:.1f} s (mean {sum(walls) / len(walls) * 1000:.0f} "
          f"ms/commit, max {max(walls):.2f} s); final partitions="
          f"{len(parts)}; store bytes (incl. superseded) "
          f"{_dir_bytes(base) / 1e6:.1f} MB", flush=True)

    # the same upsert on the quiesced (post-migration) table
    up2 = txn.add_bucket(
        docs.filter(F.col("k") % 100 == 13)
        .withColumn("val", F.lit("UPDATED2"))
        .withColumn("seq", F.lit(2).cast("long")), ["k"], 256)
    t0 = time.perf_counter()
    store.upsert(up2, ["k"], "seq")
    print(f"quiesced upsert ({n // 100} keys): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)
    store.checkpoint(1)
    store.vacuum(0)
    print(f"after checkpoint+vacuum: {_dir_bytes(base) / 1e6:.1f} MB",
          flush=True)
    shutil.rmtree(base, ignore_errors=True)


def _run_harvest(spark, F, t, par):
    from openapc_olap_spark.sources import txn

    li = t["lineitem"].select("l_orderkey", "l_partkey", "l_quantity",
                              "l_extendedprice", "l_shipdate").cache()
    n = li.count()
    rows_per_file = max(n // 1000, 1)

    for label, cap in (("distributed (threshold 32)", 32),
                       ("serial driver loop (threshold 10^9)", 10**9)):
        txn._DRIVER_STATS_MAX = cap
        base = tempfile.mkdtemp(prefix="r12_harvest_")
        seed = txn.add_bucket(li, ["l_orderkey"], 16)
        store = txn.TxnTable.create(spark, f"{base}/t", seed, "bucket")
        t0 = time.perf_counter()
        v = store.compact(order_by=[F.col("l_shipdate")],
                          max_rows_per_file=rows_per_file)
        dt = time.perf_counter() - t0
        n_files = len(store.snapshot(v)["files"])
        print(f"compact -> {n_files} files, {label}: {dt:.1f} s",
              flush=True)
        shutil.rmtree(base, ignore_errors=True)
    txn._DRIVER_STATS_MAX = 32


def _permuted_aniso(F, t, par):
    """The stride-permuted anisotropic 768-d corpus shared by aniso2/3:
    12 circularly-shifted copies of the 64-d embeddings, block b scaled
    0.6^b, then dim i <- lifted[(97*i) % 768] so every PQ subspace
    mixes all 12 energy scales (within-subspace anisotropy — the shape
    OPQ's allocation targets)."""
    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(
        f"transform(concat(slice(lifted0, {s + 1}, {64 - s}), "
        f"slice(lifted0, 1, {s})), "
        f"x -> CAST(floor(x * {0.6 ** b!r} + 0.5d) AS DOUBLE))")
        for b, s in enumerate(range(0, 60, 5))]
    lifted = (t["embeddings"].select("vec_id", qv.alias("lifted0"))
              .select("vec_id", F.concat(*blocks).alias("lifted"))
              .repartition(par).cache())
    lifted.count()
    perm = [(97 * i) % 768 for i in range(768)]
    raw = (lifted.select(
        "vec_id",
        F.array(*[F.col("lifted")[j] for j in perm]).alias("embedding"))
        .repartition(par).cache())
    raw.count()
    lifted.unpersist()
    return raw


def _run_aniso3(spark, F, t, par):
    """The metric OPQ actually optimizes (Ge et al. 2013): PQ
    reconstruction DISTORTION, rotated vs unrotated, on the
    within-subspace-anisotropic corpus. Recall on uniform-random
    synthetics is margin-limited (three constructions measured flat in
    r11/r12 — true-neighbor score gaps are microscopic, so ANY
    m-subspace quantizer noise swamps them, allocated well or badly);
    distortion isolates the allocation mechanism itself.
    Reports relative distortion E||v - v_hat||^2 / E||v - v_bar||^2 on
    a 4k sample, seed and Lloyd cents, both variants."""
    import numpy as np

    from openapc_olap_spark.operators import pq

    raw = _permuted_aniso(F, t, par)
    n_lists, m, ksub = 512, 24, 16
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=m)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    for tag, emb in (("UNROTATED", raw), ("ROTATED", rot)):
        corpus = pq._clean(emb, 768, "vec_id", "embedding").cache()
        coarse = pq.first_n_vectors(corpus, n_lists)
        seed_cents = pq.train_pq_cents(
            pq.first_n_vectors(corpus, ksub), coarse, m)
        t0 = time.perf_counter()
        lloyd = pq.train_pq_cents_lloyd(emb.sample(0.05, seed=7),
                                        coarse, m, ksub=ksub, n_iter=1)
        t_lloyd = time.perf_counter() - t0
        sample = corpus.filter(F.col("id") % 53 == 0).cache()
        rows = {r["id"]: np.array(r["v"]) for r in sample.collect()}
        vbar = np.mean(np.stack(list(rows.values())), axis=0)
        base = float(np.mean([np.sum((v - vbar) ** 2)
                              for v in rows.values()]))
        for cents, cl in ((seed_cents, "seed"), (lloyd, "lloyd")):
            codes = pq.pq_codes(sample, coarse, cents,
                                method="arrow").collect()
            carr = np.array(coarse)
            cent = np.array(cents)        # m x ksub x dsub
            dsub = 768 // m
            errs = []
            for r in codes:
                v = rows[r["id"]]
                recon = carr[r["list_id"]].copy()
                for s_, c_ in enumerate(r["codes"]):
                    recon[s_ * dsub:(s_ + 1) * dsub] += cent[s_][c_]
                errs.append(float(np.sum((v - recon) ** 2)))
            print(f"aniso3 {tag} {cl} cents: relative distortion "
                  f"{np.mean(errs) / base:.4f} "
                  f"(n={len(errs)}; lloyd train {t_lloyd:.0f} s)",
                  flush=True)
        sample.unpersist()
        corpus.unpersist()


def _distortion(spark, F, emb, tag, m, ksub, n_lists, lloyd_iter=0,
                coarse=None):
    """Relative PQ reconstruction distortion
    E||v - v_hat||^2 / E||v - v_bar||^2 on a ~4k sample (the objective
    OPQ optimizes, Ge et al. 2013). Prints one line per cents flavor."""
    import numpy as np

    from openapc_olap_spark.operators import pq

    corpus = pq._clean(emb, 768, "vec_id", "embedding").cache()
    if coarse is None:
        coarse = pq.first_n_vectors(corpus, n_lists)
    flavors = [("seed", pq.train_pq_cents(
        pq.first_n_vectors(corpus, ksub), coarse, m))]
    if lloyd_iter:
        t0 = time.perf_counter()
        flavors.append(("lloyd", pq.train_pq_cents_lloyd(
            emb.sample(0.05, seed=7), coarse, m, ksub=ksub,
            n_iter=lloyd_iter)))
        print(f"  lloyd train: {time.perf_counter() - t0:.0f} s",
              flush=True)
    sample = corpus.filter(F.col("id") % 53 == 0).cache()
    rows = {r["id"]: np.array(r["v"]) for r in sample.collect()}
    vbar = np.mean(np.stack(list(rows.values())), axis=0)
    base = float(np.mean([np.sum((v - vbar) ** 2)
                          for v in rows.values()]))
    carr = np.array(coarse)
    dsub = 768 // m
    for cl, cents in flavors:
        codes = pq.pq_codes(sample, coarse, cents,
                            method="arrow").collect()
        cent = np.array(cents)
        errs = []
        for r in codes:
            v = rows[r["id"]]
            recon = carr[r["list_id"]].copy()
            for s_, c_ in enumerate(r["codes"]):
                recon[s_ * dsub:(s_ + 1) * dsub] += cent[s_][c_]
            errs.append(float(np.sum((v - recon) ** 2)))
        print(f"{tag} {cl} cents (m={m}, ksub={ksub}): relative "
              f"distortion {np.mean(errs) / base:.4f} (n={len(errs)})",
              flush=True)
    sample.unpersist()
    corpus.unpersist()


def _run_aniso4(spark, F, t, par):
    """The corpus shape rotation actually exploits: LOW-RANK anisotropy
    (real embeddings concentrate energy in ~100 directions MIXED across
    all coordinates; aniso2/3's full-rank uniform base gives a 4-bit
    subspace quantizer nothing to capture, allocated well or badly).
    v = Q[:, :96] @ diag(0.92^j) @ z with Q a fixed orthogonal 768x768
    and z 96 iid pseudo-random latents per vector — effective rank 96,
    dense in coordinates. The PCA rotation re-concentrates the energy;
    the eigenvalue allocation balances it across subspaces; distortion
    (and any downstream recall) should finally separate rotated from
    unrotated."""
    import numpy as np
    import pandas as pd

    from openapc_olap_spark.operators import pq

    r_eff = 96
    rng = np.random.default_rng(7)
    q_, _ = np.linalg.qr(rng.standard_normal((768, 768)))
    A = (q_[:, :r_eff] * (0.92 ** np.arange(r_eff))).astype(np.float64)
    z = F.expr(
        f"transform(sequence(0, {r_eff - 1}), j -> "
        f"CAST(pmod(xxhash64(vec_id * {r_eff} + j), 2001) - 1000 "
        f"AS DOUBLE) / 1000.0)")
    lat = (t["embeddings"].select("vec_id", z.alias("z"))
           .repartition(par))
    bA = lat.sparkSession.sparkContext.broadcast(A)

    def mk(it):
        for pdf in it:
            Z = np.stack(pdf["z"].to_numpy())          # n x r
            V = Z @ bA.value.T                          # n x 768
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": list(V)})

    raw = (lat.mapInPandas(
        mk, "vec_id long, embedding array<double>")
        .repartition(par).cache())
    raw.count()
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=24)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    for tag, emb in (("aniso4 UNROTATED", raw), ("aniso4 ROTATED", rot)):
        _distortion(spark, F, emb, tag, m=24, ksub=16, n_lists=512,
                    lloyd_iter=1)


def _run_aniso5(spark, F, t, par):
    """PURE-PQ distortion on the low-rank corpus — the coarse IVF
    stage's error is rotation-INVARIANT (rotating everything rotates
    all distances identically) and dominated aniso4's totals, hiding
    the PQ-stage effect. One zero-vector list (residual = the vector)
    and m=96 isolate the allocation: rotated, the 96 signal directions
    land ONE per 8-dim subspace (16 centroids on an effectively 1-d
    distribution — near-lossless with Lloyd); unrotated, every
    subspace is 8 dense projections of all 96 latents (16 centroids in
    effective dim 8 — little capture). This is the configuration where
    the fixed layer-wise allocation must show its lift through our
    operators end-to-end."""
    import numpy as np
    import pandas as pd

    from openapc_olap_spark.operators import pq

    r_eff = 96
    rng = np.random.default_rng(7)
    q_, _ = np.linalg.qr(rng.standard_normal((768, 768)))
    A = (q_[:, :r_eff] * (0.92 ** np.arange(r_eff))).astype(np.float64)
    z = F.expr(
        f"transform(sequence(0, {r_eff - 1}), j -> "
        f"CAST(pmod(xxhash64(vec_id * {r_eff} + j), 2001) - 1000 "
        f"AS DOUBLE) / 1000.0)")
    lat = (t["embeddings"].select("vec_id", z.alias("z"))
           .repartition(par))
    bA = lat.sparkSession.sparkContext.broadcast(A)

    def mk(it):
        for pdf in it:
            Z = np.stack(pdf["z"].to_numpy())
            V = Z @ bA.value.T
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": list(V)})

    raw = (lat.mapInPandas(
        mk, "vec_id long, embedding array<double>")
        .repartition(par).cache())
    raw.count()
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=96)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    one_list = [[0.0] * 768]
    for tag, emb in (("aniso5 UNROTATED", raw), ("aniso5 ROTATED", rot)):
        _distortion(spark, F, emb, tag, m=96, ksub=16, n_lists=1,
                    lloyd_iter=1, coarse=one_list)
    # recall through the SAME configuration: one list (pure ADC
    # ordering over the whole corpus), exact rerank of the top-50
    # candidates; ground truth is orthogonal-invariant, computed once
    from openapc_olap_spark.operators import knn

    queries = raw.filter(F.col("vec_id") % 997 == 0)
    corpus0 = pq._clean(raw, 768, "vec_id", "embedding")
    coarse512 = pq.first_n_vectors(corpus0, 512)
    t0 = time.perf_counter()
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(raw, dim=768, k=5, n_probe=512,
                               centroids=coarse512, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}
    print(f"aniso5 exact GT (all-lists probe): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    for tag, emb in (("aniso5 UNROTATED", raw), ("aniso5 ROTATED", rot)):
        corpus = pq._clean(emb, 768, "vec_id", "embedding")
        cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16),
                                  one_list, 96)
        qs = emb.filter(F.col("vec_id") % 997 == 0)
        for rr in (50,):
            t0 = time.perf_counter()
            got = {(r["src"], r["dst"]) for r in
                   pq.ivf_pq_topk(emb, 768, k=5, m=96, n_probe=1,
                                  rerank=rr, coarse=one_list,
                                  pq_cents=cents, queries=qs,
                                  method="arrow",
                                  encode_method="arrow").collect()}
            print(f"{tag} seed cents recall@5 (1 list, rerank={rr}): "
                  f"{len(got & exact) / len(exact):.3f} "
                  f"({time.perf_counter() - t0:.1f} s)", flush=True)


def _run_aniso2(spark, F, t, par):
    """OPQ rotation validated where the theory says it bites
    (VERDICT r11 #7). The r11 'aniso' corpus scaled whole 64-d blocks,
    which leaves every 8-d subspace INTERNALLY homogeneous — nothing
    for the rotation to reallocate, and recall was rotation-invariant
    (measured twice). Real embeddings concentrate energy in a few
    directions MIXED across all coordinates, so here the scaled blocks
    are stride-permuted (dim i <- lifted[(97*i) % 768]) before PQ:
    every subspace then mixes all 12 energy scales, the unrotated
    quantizer wastes codewords on dead directions, and the
    eigenvalue-allocation rotation should recover. Ground truth is
    computed ONCE on the permuted corpus and shared — both the
    permutation and R are orthogonal, so exact dot-product neighbors
    are identical across all variants. SPARK_GRAFT_DRIVER_MEM=48g."""
    from openapc_olap_spark.operators import knn, pq

    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    blocks = [F.expr(
        f"transform(concat(slice(lifted0, {s + 1}, {64 - s}), "
        f"slice(lifted0, 1, {s})), "
        f"x -> CAST(floor(x * {0.6 ** b!r} + 0.5d) AS DOUBLE))")
        for b, s in enumerate(range(0, 60, 5))]
    lifted = (t["embeddings"].select("vec_id", qv.alias("lifted0"))
              .select("vec_id", F.concat(*blocks).alias("lifted"))
              .repartition(par).cache())
    lifted.count()
    perm = [(97 * i) % 768 for i in range(768)]
    raw = (lifted.select(
        "vec_id",
        F.array(*[F.col("lifted")[j] for j in perm]).alias("embedding"))
        .repartition(par).cache())
    raw.count()
    n_lists, m, ksub = 512, 24, 16
    corpus = pq._clean(raw, 768, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, n_lists)
    queries = raw.filter(F.col("vec_id") % 997 == 0)
    t0 = time.perf_counter()
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(raw, dim=768, k=5, n_probe=n_lists,
                               centroids=coarse, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}
    print(f"exact ground truth (shared, orthogonal-invariant): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=m)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    variants = {"UNROTATED": raw, "ROTATED": rot}
    for tag, emb in variants.items():
        co = pq.first_n_vectors(pq._clean(emb, 768, "vec_id",
                                          "embedding"), n_lists)
        qs = emb.filter(F.col("vec_id") % 997 == 0)
        seed_cents = pq.train_pq_cents(
            pq.first_n_vectors(pq._clean(emb, 768, "vec_id",
                                         "embedding"), ksub), co, m)
        t0 = time.perf_counter()
        lloyd = pq.train_pq_cents_lloyd(emb.sample(0.05, seed=7), co,
                                        m, ksub=ksub, n_iter=1)
        t_lloyd = time.perf_counter() - t0
        for cents, cl in ((seed_cents, "seed"), (lloyd, "lloyd")):
            for rr in (50, 200) if cl == "seed" else (50,):
                t0 = time.perf_counter()
                got = {(r["src"], r["dst"]) for r in
                       pq.ivf_pq_topk(emb, 768, k=5, m=m, n_probe=8,
                                      rerank=rr, coarse=co,
                                      pq_cents=cents, queries=qs,
                                      method="arrow",
                                      encode_method="arrow").collect()}
                print(f"aniso2 {tag} {cl} cents, m={m}, rerank={rr}: "
                      f"{time.perf_counter() - t0:.1f} s (recall@5 "
                      f"{len(got & exact) / len(exact):.3f})",
                      flush=True)
        print(f"aniso2 {tag} lloyd train (5% sample, 1 iter, m={m}): "
              f"{t_lloyd:.1f} s", flush=True)


def _run_aniso6(spark, F, t, par):
    """Production-dial recall on the low-rank corpus: full IVF-PQ
    (512 lists, n_probe=8, m=96, Lloyd cents, rerank 50) rotated vs
    unrotated — the aniso5 1-list result shown through the whole
    serving pipeline, coarse stage included."""
    import numpy as np
    import pandas as pd

    from openapc_olap_spark.operators import knn, pq

    r_eff = 96
    rng = np.random.default_rng(7)
    q_, _ = np.linalg.qr(rng.standard_normal((768, 768)))
    A = (q_[:, :r_eff] * (0.92 ** np.arange(r_eff))).astype(np.float64)
    z = F.expr(
        f"transform(sequence(0, {r_eff - 1}), j -> "
        f"CAST(pmod(xxhash64(vec_id * {r_eff} + j), 2001) - 1000 "
        f"AS DOUBLE) / 1000.0)")
    lat = (t["embeddings"].select("vec_id", z.alias("z"))
           .repartition(par))
    bA = lat.sparkSession.sparkContext.broadcast(A)

    def mk(it):
        for pdf in it:
            Z = np.stack(pdf["z"].to_numpy())
            V = Z @ bA.value.T
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": list(V)})

    raw = (lat.mapInPandas(
        mk, "vec_id long, embedding array<double>")
        .repartition(par).cache())
    raw.count()
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=96)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    corpus0 = pq._clean(raw, 768, "vec_id", "embedding")
    coarse0 = pq.first_n_vectors(corpus0, 512)
    queries = raw.filter(F.col("vec_id") % 997 == 0)
    t0 = time.perf_counter()
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(raw, dim=768, k=5, n_probe=512,
                               centroids=coarse0, queries=queries,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}
    print(f"aniso6 exact GT: {time.perf_counter() - t0:.1f} s",
          flush=True)
    for tag, emb in (("aniso6 UNROTATED", raw), ("aniso6 ROTATED", rot)):
        corpus = pq._clean(emb, 768, "vec_id", "embedding")
        co = pq.first_n_vectors(corpus, 512)
        qs = emb.filter(F.col("vec_id") % 997 == 0)
        t0 = time.perf_counter()
        lloyd = pq.train_pq_cents_lloyd(emb.sample(0.05, seed=7), co,
                                        96, ksub=16, n_iter=1)
        t_tr = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = {(r["src"], r["dst"]) for r in
               pq.ivf_pq_topk(emb, 768, k=5, m=96, n_probe=8,
                              rerank=50, coarse=co, pq_cents=lloyd,
                              queries=qs, method="arrow",
                              encode_method="arrow").collect()}
        print(f"{tag} lloyd cents recall@5 (512 lists, probe 8, "
              f"rerank 50): {len(got & exact) / len(exact):.3f} "
              f"({time.perf_counter() - t0:.1f} s; lloyd {t_tr:.0f} s)",
              flush=True)


def main():
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    sections = sys.argv[2:] or ["rebucket", "harvest"]
    spark = get_spark(app_name="r12-measure", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    par = 32
    tables = ["documents", "lineitem"]
    if any(x in sections for x in ("aniso2", "aniso3", "aniso4",
                                   "aniso5", "aniso6")):
        tables.append("embeddings")
    t = load_tables(spark, sf_dir, tables)
    if "rebucket" in sections:
        _run_rebucket(spark, F, t, par)
    if "harvest" in sections:
        _run_harvest(spark, F, t, par)
    if "aniso2" in sections:
        _run_aniso2(spark, F, t, par)
    if "aniso3" in sections:
        _run_aniso3(spark, F, t, par)
    if "aniso4" in sections:
        _run_aniso4(spark, F, t, par)
    if "aniso5" in sections:
        _run_aniso5(spark, F, t, par)
    if "aniso6" in sections:
        _run_aniso6(spark, F, t, par)
    spark.stop()


if __name__ == "__main__":
    main()
