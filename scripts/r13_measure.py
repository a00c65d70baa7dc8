"""Round-13 SCALING measurements.

- probe_sweep (VERDICT r12 #6): the IVF-PQ serving stack past the
  coarse ceiling. r12's aniso6 showed n_probe=8/512 caps recall at
  ~0.17 regardless of PQ quality; this sweep publishes the three-dial
  tuning table — coarse recall (n_probe, measured as EXACT-scoring
  recall at that probe width), PQ fidelity (rotation + Lloyd cents at
  m=24 vs m=96 under the same probe width), re-rank width — so a
  deployment reads off which dial is binding. Corpus = the r12
  low-rank anisotropic 768-d latents (scripts/r12_measure.py aniso6
  generator, r_eff=96, 0.92^j spectrum), the shape the rotation
  actually exploits.

Run: python scripts/r13_measure.py .scale/sf1 probe_sweep
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark, load_tables  # noqa: E402


def _lowrank_corpus(spark, F, t, par, r_eff=96, dim=768):
    """The aniso4/5/6 low-rank corpus: deterministic per-(vec_id, j)
    hash latents pushed through a fixed rank-96 map with a 0.92^j
    spectrum (see scripts/r12_measure.py)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    q_, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
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

    raw = (lat.mapInPandas(mk, "vec_id long, embedding array<double>")
           .repartition(par).cache())
    raw.count()
    return raw


def _run_probe_sweep(spark, F, t, par):
    from openapc_olap_spark.operators import knn, pq

    n_lists = 512
    k = 5
    raw = _lowrank_corpus(spark, F, t, par)
    R = pq.train_pq_rotation(raw.sample(0.1, seed=11), dim=768, m=96)
    rot = (pq.apply_rotation(raw, R, method="arrow")
           .repartition(par).cache())
    rot.count()
    corpus0 = pq._clean(raw, 768, "vec_id", "embedding")
    coarse0 = pq.first_n_vectors(corpus0, n_lists)
    queries0 = raw.filter(F.col("vec_id") % 997 == 0)
    t0 = time.perf_counter()
    exact = {(r["src"], r["dst"]) for r in
             knn.knn_graph_ivf(raw, dim=768, k=k, n_probe=n_lists,
                               centroids=coarse0, queries=queries0,
                               metric="dot", assign_method="arrow",
                               score_method="arrow").collect()}
    print(f"probe_sweep exact GT ({len(exact)} edges): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    # the PQ side runs on the ROTATED corpus (aniso5/6: the validated
    # configuration); the coarse ceiling is rotation-invariant, measured
    # on raw with exact in-list scoring
    corpus_r = pq._clean(rot, 768, "vec_id", "embedding")
    coarse_r = pq.first_n_vectors(corpus_r, n_lists)
    queries_r = rot.filter(F.col("vec_id") % 997 == 0)
    cents = {}
    for m in (24, 96):
        t0 = time.perf_counter()
        cents[m] = pq.train_pq_cents_lloyd(rot.sample(0.05, seed=7),
                                           coarse_r, m, ksub=16, n_iter=1)
        print(f"probe_sweep lloyd train m={m}: "
              f"{time.perf_counter() - t0:.0f} s", flush=True)

    for n_probe in (8, 32, 64, 128, 512):
        t0 = time.perf_counter()
        ceil = {(r["src"], r["dst"]) for r in
                knn.knn_graph_ivf(raw, dim=768, k=k, n_probe=n_probe,
                                  centroids=coarse0, queries=queries0,
                                  metric="dot", assign_method="arrow",
                                  score_method="arrow").collect()}
        t_ceil = time.perf_counter() - t0
        line = (f"probe_sweep n_probe={n_probe:>3}: coarse ceiling "
                f"{len(ceil & exact) / len(exact):.3f} ({t_ceil:.1f} s)")
        for m in (24, 96):
            t0 = time.perf_counter()
            got = {(r["src"], r["dst"]) for r in
                   pq.ivf_pq_topk(rot, 768, k=k, m=m, n_probe=n_probe,
                                  rerank=50, coarse=coarse_r,
                                  pq_cents=cents[m], queries=queries_r,
                                  method="arrow",
                                  encode_method="arrow").collect()}
            line += (f" | m={m} rot+lloyd rerank=50: "
                     f"{len(got & exact) / len(exact):.3f} "
                     f"({time.perf_counter() - t0:.1f} s)")
        print(line, flush=True)

    # third dial: re-rank width at a mid probe setting
    for rr in (20, 50, 200):
        t0 = time.perf_counter()
        got = {(r["src"], r["dst"]) for r in
               pq.ivf_pq_topk(rot, 768, k=k, m=96, n_probe=64,
                              rerank=rr, coarse=coarse_r,
                              pq_cents=cents[96], queries=queries_r,
                              method="arrow",
                              encode_method="arrow").collect()}
        print(f"probe_sweep rerank={rr:>3} (n_probe=64, m=96): "
              f"{len(got & exact) / len(exact):.3f} "
              f"({time.perf_counter() - t0:.1f} s)", flush=True)


def main():
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    sections = sys.argv[2:] or ["probe_sweep"]
    spark = get_spark(app_name="r13-measure", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    par = 32
    t = load_tables(spark, sf_dir, ["embeddings"])
    if "probe_sweep" in sections:
        _run_probe_sweep(spark, F, t, par)
    spark.stop()


if __name__ == "__main__":
    main()
