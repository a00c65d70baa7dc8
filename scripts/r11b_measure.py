"""Round-11 (second half) scale spot-measurements for SCALING.md — the
TxnTable DML/incremental-read surface and the WordPiece tokenizer:

- **skip**: zone-map data skipping on an sf1 events store (30 day files,
  ~1M rows): files opened + wall for a 2.5-day `read(between=...)` vs
  the full-scan filter of the same predicate. The claim under test: IO
  follows the files that can match, not the snapshot.
- **delete**: copy-on-write predicate delete on an sf1 orders store
  partitioned by o_orderpriority: bytes rewritten vs table bytes when
  the predicate touches 2 of 5 partitions.
- **cdf**: read_changes cost follows the COMMITS, not the table — a
  1k-key upsert + a narrow delete against a 64-bucket sf1 orders store
  (~1.5M rows), then read_changes(v0, v2, keys) wall + the changed
  partition count it actually diffed.
- **wp**: WordPiece training wall at sf0.1 vs sf1 (same 4 merges): the
  corpus-grain word count scan scales linearly; the per-iteration cost
  is vocabulary-grain and should be ~flat (the synthetic corpus keeps
  per-copy token suffixes, so sf1 vocab is ~10x words but still tiny).

Usage:
    python scripts/r11b_measure.py [sf1_dir] [sections...]
    sections: any of skip delete cdf wp (default: all)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openapc_olap_spark.session import get_spark, load_tables  # noqa: E402
from openapc_olap_spark.sources import txn  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s ({out})", flush=True)
    return dt, out


def dir_bytes(root):
    tot = 0
    for dp, _, fs in os.walk(root):
        for f in fs:
            tot += os.path.getsize(os.path.join(dp, f))
    return tot


def data_bytes(store, paths=None):
    snap = store.snapshot()
    files = snap["files"] if paths is None else [
        f for f in snap["files"] if f["path"] in paths]
    return sum(os.path.getsize(os.path.join(store.path, f["path"]))
               for f in files)


def sec_skip(spark, sf_dir, scratch):
    ev = (load_tables(spark, sf_dir, ["events"])["events"]
          .withColumn("day", F.date_format("ts", "yyyy-MM-dd")))
    root = os.path.join(scratch, "skip")
    shutil.rmtree(root, ignore_errors=True)
    t = txn.TxnTable.create(spark, root, ev, "day")
    lo, hi = "2024-01-10 06:00:00", "2024-01-12 18:00:00"
    kept, total = t.pruned_file_count({"ts": (lo, hi)})
    snap = t.snapshot()
    keep_paths = {f["path"] for f in snap["files"]
                  if txn._file_can_match(f, {"ts": (lo, hi)})}
    print(f"skip: files {kept}/{total}, bytes "
          f"{data_bytes(t, keep_paths)}/{data_bytes(t)}")
    timed("skip: bounded read (zone-map)",
          lambda: t.read(between={"ts": (lo, hi)}).count())
    timed("skip: full-scan filter (no skipping)",
          lambda: t.read().filter(
              (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
          ).count())


def sec_delete(spark, sf_dir, scratch):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    root = os.path.join(scratch, "del")
    shutil.rmtree(root, ignore_errors=True)
    t = txn.TxnTable.create(spark, root, orders, "o_orderpriority")
    before = data_bytes(t)
    pred = ("o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "AND o_orderstatus = 'F' AND o_totalprice < 150000")
    timed("delete: commit (2 of 5 partitions match)",
          lambda: t.delete(pred))
    s0 = {f["path"] for f in t.snapshot(0)["files"]}
    rewritten = [f["path"] for f in t.snapshot(1)["files"]
                 if f["path"] not in s0]
    print(f"delete: rewrote {data_bytes(t, set(rewritten))} of "
          f"{before} bytes ({len(rewritten)} of "
          f"{len(t.snapshot(0)['files'])} files)")


def sec_cdf(spark, sf_dir, scratch):
    """Two shapes: a 1001-key batch sprays ~all of 64 hash buckets
    (diff degrades to table width — inherent to uniform keys over few
    buckets), while a ~50-key batch against 256 buckets touches <50
    partitions and the diff reads only that sliver. The locality claim
    is 'cost follows the touched partitions', so both are reported."""
    orders = (load_tables(spark, sf_dir, ["orders"])["orders"]
              .withColumn("seq", F.lit(0).cast("long")))
    n = orders.count()
    for tag, nb, mod in (("wide", 64, 1498), ("narrow", 256, 29989)):
        root = os.path.join(scratch, f"cdf_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        t = txn.TxnTable.create(
            spark, root, txn.add_bucket(orders, ["o_orderkey"], nb),
            "bucket", meta={"n_buckets": nb})
        batch = txn.add_bucket(
            orders.filter(F.col("o_orderkey") % mod == 1)
            .withColumn("seq", F.lit(1).cast("long"))
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0),
            ["o_orderkey"], nb)
        print(f"cdf[{tag}]: table rows {n}, batch rows {batch.count()}, "
              f"{nb} buckets")
        timed(f"cdf[{tag}]: upsert commit", lambda: t.upsert(
            batch, keys=["o_orderkey"], seq_col="seq"))
        timed(f"cdf[{tag}]: delete commit", lambda: t.delete(
            f"o_orderkey % {mod * 7} = 3"))
        a = {f["path"] for f in t.snapshot(0)["files"]}
        b = {f["path"] for f in t.snapshot(2)["files"]}
        parts = {f["partition"] for f in t.snapshot(2)["files"]
                 if f["path"] not in a} | \
                {f["partition"] for f in t.snapshot(0)["files"]
                 if f["path"] not in b}
        timed(f"cdf[{tag}]: read_changes(0,2,keys) over "
              f"{len(parts)}/{nb} partitions",
              lambda: t.read_changes(0, 2, keys=["o_orderkey"])
              .groupBy("_change_type").count().collect())


def sec_wp(spark, sf_dir):
    from openapc_olap_spark.operators import wordpiece as wp

    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf_dir)):
        docs = load_tables(spark, d, ["documents"])["documents"]
        nwords = (wp.word_counts(docs).count())
        timed(f"wp: train 4 merges @ {tag} (vocab {nwords} words)",
              lambda: len(wp.wordpiece_train(docs, 4)[0]))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    secs = sys.argv[2:] or ["skip", "delete", "cdf", "wp"]
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    scratch = os.path.join(tempfile.gettempdir(), "r11b_measure")
    if "skip" in secs:
        sec_skip(spark, sf_dir, scratch)
    if "delete" in secs:
        sec_delete(spark, sf_dir, scratch)
    if "cdf" in secs:
        sec_cdf(spark, sf_dir, scratch)
    if "wp" in secs:
        sec_wp(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
