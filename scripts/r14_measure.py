"""Round-14 SCALING measurement (VERDICT r13 #7): a 10^3-commit
TxnTable at sf10 with a rebucket mid-stream — the compacted snapshot's
occupancy/cost claims measured instead of asserted on a store whose
manifest log is two orders past the ckpt_every cadence.

Shape: v0 = 1.5M customer rows (10% of the sf10 replica) at 8 buckets;
~990 append commits of ~15k known-new keys each (the crawl shape: one
small file per touched bucket per commit), compact() every 128 commits
outside the transition window; at ~half-stream a rebucket 8 -> 16 runs
bounded (buckets_per_commit=2) with upserts interleaved mid-transition
(the only DML allowed there, and it advances the migration). Then:

- commit latency early vs late (the manifest is a full snapshot, so
  its rewrite cost tracks file count — compaction is what bounds it);
- write_checkpoint() INCREMENTAL vs full=True at ~10^3 retained
  manifests: wall + v*.json files actually opened (the r14 claim:
  <= ckpt_every + 1 vs every retained manifest);
- hint-less snapshot(): checkpoint path vs listing fallback;
- vacuum referenced-set build off the fresh checkpoint;
- occupancy: files/bucket + store MB before and after
  compact() + checkpoint(1) + vacuum(0).

Run: python scripts/r14_measure.py .scale/sf10 ckpt_rebucket
"""

import builtins
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark, load_tables  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scale", "r14_store")


def _du_mb(path):
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total / 1e6


def _manifest_opens(fn):
    """Run fn() counting v*.json manifest opens; returns (result, n)."""
    n = [0]
    real = builtins.open

    def spy(p, *a, **kw):
        s = str(p)
        if "_manifest" in s and os.path.basename(s).startswith("v") \
                and s.endswith(".json"):
            n[0] += 1
        return real(p, *a, **kw)

    builtins.open = spy
    try:
        out = fn()
    finally:
        builtins.open = real
    return out, n[0]


def _run(spark, sf_dir):
    import shutil

    from pyspark.sql import functions as F

    from openapc_olap_spark.sources import txn
    from openapc_olap_spark.sources.txn import TxnTable

    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.time()
    cust = (load_tables(spark, sf_dir, ["customer"])["customer"]
            .select("c_custkey", "c_mktsegment", "c_acctbal")
            .withColumn("seq", F.lit(0).cast("long")))
    slc = F.pmod(F.xxhash64("c_custkey"), F.lit(1000))
    base = cust.filter(slc < 100)
    NB = 8
    t = TxnTable.create(spark, ROOT, txn.add_bucket(base, ["c_custkey"], NB),
                        "bucket", meta={"n_buckets": NB, "ckpt_every": 64})
    print(f"v0: {base.count()} rows, {time.time()-t0:.1f}s", flush=True)

    lat = {}
    total_slices = 1000

    def one_append(i):
        rows = cust.filter(slc == i)
        a0 = time.time()
        t.append(txn.add_bucket(rows, ["c_custkey"],
                                t.snapshot()["meta"]["n_buckets"]))
        return time.time() - a0

    # phase 1: appends 100..549, compact every 128
    for i in range(100, 550):
        dt = one_append(i)
        if i in (110, 540):
            lat[f"append@c{i-99}"] = dt
        if (i - 100) % 128 == 127:
            t.compact()
    print(f"phase1 done v={t.version()} {time.time()-t0:.1f}s", flush=True)

    # phase 2: rebucket 8 -> 16, bounded, upserts interleaved
    r0 = time.time()
    t.rebucket(16, keys=["c_custkey"], buckets_per_commit=2)
    pre_files = len(t.snapshot()["files"])
    mid_seen = t.in_rebucket()
    up_mid = 0.0
    step = 0
    while t.in_rebucket():
        # an upsert mid-transition (advances migration as a side effect)
        batch = (cust.filter(slc == 300 + step)
                 .withColumn("c_acctbal", F.col("c_acctbal") + 1)
                 .withColumn("seq", F.lit(1).cast("long")))
        u0 = time.time()
        t.upsert(txn.add_bucket(batch, ["c_custkey"], 16),
                 ["c_custkey"], "seq")
        up_mid += time.time() - u0
        t.rebucket(16, buckets_per_commit=2)
        step += 1
    lat["rebucket_total_s"] = time.time() - r0
    lat["upserts_mid_transition"] = step
    print(f"rebucket 8->16 done (mid_seen={mid_seen}, files_pre={pre_files})"
          f" v={t.version()} {time.time()-t0:.1f}s", flush=True)

    # phase 3: appends to ~10^3 commits under the new spec
    i = 550
    while t.version() < 1000 and i < total_slices:
        dt = one_append(i)
        if t.version() in (990, 999):
            lat[f"append@c{t.version()}"] = dt
        if (i - 550) % 128 == 127:
            t.compact()
        i += 1
    vfinal = t.version()
    print(f"phase3 done v={vfinal} {time.time()-t0:.1f}s", flush=True)

    # --- measurements on the 10^3-commit store ---
    out = {"commits": vfinal + 1, "latency": lat}

    w0 = time.time()
    _, n_inc = _manifest_opens(t.write_checkpoint)
    inc_s = time.time() - w0
    w0 = time.time()
    ck_full, n_full = _manifest_opens(lambda: t.write_checkpoint(full=True))
    full_s = time.time() - w0
    _, n_inc2 = _manifest_opens(t.write_checkpoint)
    out["ckpt_refresh"] = {
        "incremental_s": round(inc_s, 3), "manifests_read_inc": n_inc,
        "full_s": round(full_s, 3), "manifests_read_full": n_full,
        "incremental_after_tight_reads": n_inc2,
        "referenced": len(ck_full["referenced"])}

    os.remove(t._hint_path())
    s0 = time.time()
    _, n_snap = _manifest_opens(t.snapshot)
    out["hintless_snapshot_ckpt"] = {"s": round(time.time() - s0, 3),
                                     "manifest_gets": n_snap}
    os.remove(t._hint_path())
    ckp = t._ckpt_path()
    os.rename(ckp, ckp + ".aside")
    s0 = time.time()
    _, n_list = _manifest_opens(t.snapshot)
    out["hintless_snapshot_listing"] = {"s": round(time.time() - s0, 3),
                                        "manifest_gets": n_list}
    os.rename(ckp + ".aside", ckp)

    counts = {}
    snap = t.snapshot()
    for f in snap["files"]:
        counts[f["partition"]] = counts.get(f["partition"], 0) + 1
    out["pre_maintenance"] = {
        "files": len(snap["files"]),
        "max_files_per_bucket": max(counts.values()),
        "store_mb": round(_du_mb(ROOT), 1),
        "manifest_mb": round(_du_mb(t._mdir()), 1)}

    m0 = time.time()
    t.compact()
    c_s = time.time() - m0
    m0 = time.time()
    t.checkpoint(retain_versions=1)
    r_s = time.time() - m0
    m0 = time.time()
    gone = t.vacuum(grace_seconds=0)
    v_s = time.time() - m0
    snap = t.snapshot()
    out["post_maintenance"] = {
        "compact_s": round(c_s, 1), "checkpoint_s": round(r_s, 1),
        "vacuum_s": round(v_s, 1), "orphans_reclaimed": len(gone),
        "files": len(snap["files"]),
        "store_mb": round(_du_mb(ROOT), 1),
        "manifest_mb": round(_du_mb(t._mdir()), 1)}
    rows = t.read().count()
    out["final_rows"] = rows
    print(json.dumps(out, indent=1), flush=True)
    shutil.rmtree(ROOT, ignore_errors=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
    _run(spark, sf_dir)


if __name__ == "__main__":
    main()
