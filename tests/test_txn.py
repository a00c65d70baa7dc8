"""TxnTable: manifest-swap transactional parquet (VERDICT r09 #5) —
snapshot isolation, partition-overwrite upsert, crash consistency,
commit races, vacuum."""

import json
import os

import pytest

from openapc_olap_spark.sources import txn
from openapc_olap_spark.sources.txn import CommitConflict, TxnTable


def _rows(df):
    return {(r["k"], r["seq"], r["val"]) for r in
            df.select("k", "seq", "val").collect()}


def _mk(spark, tmp_path, rows):
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 4)
    return TxnTable.create(spark, str(tmp_path / "t"), df, "bucket")


def test_create_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 1, "x"), ("b", 1, "y")])
    assert t.version() == 0
    assert _rows(t.read()) == {("a", 1, "x"), ("b", 1, "y")}


def test_upsert_last_wins_and_partition_rewrite_scope(spark, tmp_path):
    rows = [(f"k{i}", 1, f"v{i}") for i in range(20)]
    t = _mk(spark, tmp_path, rows)
    before = {f["path"] for f in t.snapshot()["files"]}
    up = txn.add_bucket(
        spark.createDataFrame([("k3", 2, "NEW"), ("zz", 2, "new-key")],
                              "k string, seq long, val string"),
        ["k"], 4)
    v = t.upsert(up, ["k"], "seq")
    assert v == 1
    got = _rows(t.read())
    assert ("k3", 2, "NEW") in got and ("k3", 1, "v3") not in got
    assert ("zz", 2, "new-key") in got
    assert len(got) == 21
    # untouched partitions' files are RE-LINKED, not rewritten
    touched = {r[0] for r in up.select("bucket").distinct().collect()}
    after = t.snapshot()["files"]
    untouched_before = {f["path"] for f in after
                        if f["partition"] not in {str(x) for x in touched}}
    assert untouched_before <= before
    # stale seq loses
    stale = txn.add_bucket(
        spark.createDataFrame([("k3", 0, "OLD")],
                              "k string, seq long, val string"),
        ["k"], 4)
    t.upsert(stale, ["k"], "seq")
    assert ("k3", 2, "NEW") in _rows(t.read())


def test_upsert_matches_coverage_merge_contract(spark, tmp_path):
    """TxnTable.upsert's merge == etl/coverage.upsert_last_wins on the
    same frames (the e17 semantics, now behind a transactional store)."""
    from openapc_olap_spark.etl.coverage import upsert_last_wins
    ex = [(f"d{i % 7}", i, f"y{i % 3}") for i in range(0, 30, 2)]
    up = [(f"d{i % 9}", 100 + i, f"y{i % 4}") for i in range(0, 20, 3)]
    edf = spark.createDataFrame(ex, "k string, seq long, val string")
    udf = spark.createDataFrame(up, "k string, seq long, val string")
    want = {(r["k"], r["seq"], r["val"]) for r in
            upsert_last_wins(edf, udf, ["k"], "seq").collect()}
    t = TxnTable.create(spark, str(tmp_path / "t"),
                        txn.add_bucket(edf, ["k"], 4), "bucket")
    t.upsert(txn.add_bucket(udf, ["k"], 4), ["k"], "seq")
    assert _rows(t.read()) == want


def test_crash_consistency_and_vacuum(spark, tmp_path):
    """A writer that lands data files but dies before the manifest
    publish leaves the table unchanged; re-running the upsert converges
    to the same state; vacuum reclaims the orphans."""
    t = _mk(spark, tmp_path, [("a", 1, "x"), ("b", 1, "y")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "X2")],
                              "k string, seq long, val string"),
        ["k"], 4)
    # simulate the crash: data files land, no commit
    merged = txn._merge_last_wins(
        t.read(partitions=[str(r[0]) for r in
                           up.select("bucket").distinct().collect()]),
        up, ["k"], "seq")
    orphans = t._write_data(merged)
    assert orphans
    assert t.version() == 0                      # table unchanged
    assert _rows(t.read()) == {("a", 1, "x"), ("b", 1, "y")}
    # re-run converges
    t.upsert(up, ["k"], "seq")
    assert _rows(t.read()) == {("a", 2, "X2"), ("b", 1, "y")}
    # vacuum removes exactly the unreferenced files
    gone = t.vacuum(grace_seconds=0)
    assert {f"data/{g}" for g in gone} == {o["path"] for o in orphans}
    assert _rows(t.read()) == {("a", 2, "X2"), ("b", 1, "y")}
    # staging left nothing behind
    assert not os.path.exists(os.path.join(t.path, "_staging")) or \
        not os.listdir(os.path.join(t.path, "_staging"))


def test_commit_race_retries_against_winner(spark, tmp_path):
    """Optimistic concurrency: if another writer publishes first, the
    upsert re-merges against the WINNER's snapshot (its rows survive
    when its seq is higher)."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    # a competing writer wins version 1 out from under our upsert
    orig_publish = t._publish
    raced = {"done": False}

    def racing_publish(version, files, schema, meta=None):
        if not raced["done"]:
            raced["done"] = True
            winner = txn.add_bucket(
                spark.createDataFrame([("a", 9, "WINNER")],
                                      "k string, seq long, val string"),
                ["k"], 4)
            t2 = TxnTable(spark, t.path, "bucket")
            t2.upsert(winner, ["k"], "seq")
        return orig_publish(version, files, schema, meta)

    t._publish = racing_publish
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "loser"), ("b", 2, "fresh")],
                              "k string, seq long, val string"),
        ["k"], 4)
    v = t.upsert(up, ["k"], "seq")
    assert v == 2
    got = _rows(t.read())
    assert ("a", 9, "WINNER") in got             # winner's higher seq kept
    assert ("b", 2, "fresh") in got


def test_commit_conflict_exhausts_retries(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 1, "x")])

    def always_conflict(version, files, schema, meta=None):
        raise CommitConflict("simulated")

    t._publish = always_conflict
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "y")],
                              "k string, seq long, val string"),
        ["k"], 4)
    with pytest.raises(CommitConflict, match="lost 2 commit races"):
        t.upsert(up, ["k"], "seq", max_retries=2)


def test_manifest_level_partition_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path, [(f"k{i}", 1, "v") for i in range(40)])
    snap = t.snapshot()
    one = snap["files"][0]["partition"]
    df = t.read(partitions=[one])
    assert 0 < df.count() < 40
    assert set(df.select("bucket").distinct().toPandas()["bucket"]
               .astype(str)) == {one}
    # schema survives an empty prune
    assert t.read(partitions=["no-such"]).count() == 0


def test_updates_must_carry_partition_column(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    bare = spark.createDataFrame([("a", 2, "y")],
                                 "k string, seq long, val string")
    with pytest.raises(ValueError, match="partition column"):
        t.upsert(bare, ["k"], "seq")


def test_manifest_is_the_read_surface_not_the_directory(spark, tmp_path):
    """A data file dropped into data/ by hand (or an orphan) is
    invisible: readers open exactly the manifest's file list."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    # hand-plant a rogue parquet file in data/
    rogue = spark.createDataFrame([("zzz", 99, "rogue", 0)],
                                  "k string, seq long, val string, "
                                  "bucket bigint")
    tmp = str(tmp_path / "rogue")
    rogue.coalesce(1).write.parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, src),
              os.path.join(t.path, "data", "rogue.parquet"))
    assert _rows(t.read()) == {("a", 1, "x")}
    # and the manifest is versioned json with per-file partitions
    snap = json.load(open(t._version_path(t.version())))
    assert all({"path", "partition"} <= set(f) for f in snap["files"])


def test_publish_is_atomic_no_partial_manifest(spark, tmp_path):
    """ADVICE r10: the version file is linked into place fully written
    and fsynced — at no point can a reader observe a partial highest
    manifest. Losing a version race leaves no temp debris, and
    snapshot() never sees .tmp-* files."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "x2")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up, ["k"], "seq")
    mdir = t._mdir()
    assert not [f for f in os.listdir(mdir) if f.startswith(".tmp")]
    # every committed manifest parses completely (no partial writes);
    # the advisory _latest.hint is not a manifest
    for f in os.listdir(mdir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        with open(os.path.join(mdir, f)) as fh:
            doc = json.load(fh)
        assert {"version", "schema", "files"} <= doc.keys()
    # losing the slot raises CommitConflict AND cleans its temp file
    with pytest.raises(CommitConflict):
        t._publish(1, [], t.read().schema, {})
    assert not [f for f in os.listdir(mdir) if f.startswith(".tmp")]


def test_compact_folds_partition_files_and_preserves_rows(spark, tmp_path):
    """VERDICT r10 #4: N appends leave a bucket holding N small files
    (append is the O(batch) insert-only path — no bucket read-back);
    compact() rewrites fat partitions to one file each via a normal
    manifest swap — rows identical, untouched single-file partitions
    re-linked, superseded files reclaimed by vacuum."""
    t = _mk(spark, tmp_path, [(f"k{i}", 0, f"v{i}") for i in range(12)])
    for s in (1, 2, 3):
        up = txn.add_bucket(
            spark.createDataFrame([(f"n{i}s{s}", s, f"v{i}s{s}")
                                   for i in range(0, 12, 3)],
                                  "k string, seq long, val string"),
            ["k"], 4)
        t.append(up)
    before_rows = _rows(t.read())
    snap = t.snapshot()
    per = {}
    for f in snap["files"]:
        per[f["partition"]] = per.get(f["partition"], 0) + 1
    assert max(per.values()) > 1          # something to compact
    v = t.compact()
    assert v == snap["version"] + 1
    assert _rows(t.read()) == before_rows
    per2 = {}
    for f in t.snapshot()["files"]:
        per2[f["partition"]] = per2.get(f["partition"], 0) + 1
    assert per2 and max(per2.values()) == 1
    # idempotent: nothing fat left -> version unchanged
    assert t.compact() == v
    # superseded files stay referenced by the OLD manifest versions
    # (time travel); checkpoint drops those, then vacuum reclaims
    assert t.vacuum(grace_seconds=0) == []
    t.checkpoint(retain_versions=1)
    gone = t.vacuum(grace_seconds=0)
    assert gone
    assert _rows(t.read()) == before_rows


def test_vacuum_grace_protects_young_orphans(spark, tmp_path):
    """ADVICE r10: files an in-flight writer just renamed into data/
    are indistinguishable from orphans until its manifest publishes —
    the grace period keeps vacuum from deleting them mid-commit."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "x2")],
                              "k string, seq long, val string"), ["k"], 4)
    merged = txn._merge_last_wins(t.read(), up, ["k"], "seq")
    orphans = t._write_data(merged)           # landed, not yet published
    assert orphans
    assert t.vacuum(grace_seconds=3600) == []          # protected
    assert t.vacuum(grace_seconds=0) == sorted(
        o["path"].split("/", 1)[1] for o in orphans)   # quiesced sweep


def test_checkpoint_retains_newest_manifests(spark, tmp_path):
    """Manifest retention: checkpoint(n) drops all but the newest n
    versions; reads stay on the head; files only the dropped versions
    referenced become vacuumable orphans."""
    t = _mk(spark, tmp_path, [(f"k{i}", 0, f"v{i}") for i in range(8)])
    for s in (1, 2):
        up = txn.add_bucket(
            spark.createDataFrame([(f"k{i}", s, f"w{s}")
                                   for i in range(0, 8, 2)],
                                  "k string, seq long, val string"),
            ["k"], 4)
        t.upsert(up, ["k"], "seq")
    head = t.version()
    rows = _rows(t.read())
    dropped = t.checkpoint(retain_versions=1)
    assert len(dropped) == head              # v0..v(head-1) gone
    assert t.version() == head and _rows(t.read()) == rows
    gone = t.vacuum(grace_seconds=0)         # old-version-only files
    assert gone and _rows(t.read()) == rows
    with pytest.raises(ValueError):
        t.checkpoint(retain_versions=0)


def test_upsert_moving_rewrites_old_partition_of_moved_key(spark, tmp_path):
    """upsert_moving (VERDICT r10 #6): partition NOT a function of the
    key (a vector index's list_id). A key whose partition value CHANGES
    must be rewritten out of its old partition in the same commit, and
    only the touched partitions' files may change."""
    rows = [("a", 0, "p0"), ("b", 0, "p0"), ("c", 0, "p1"),
            ("d", 0, "p2"), ("e", 0, "p3")]
    df = spark.createDataFrame(rows, "k string, seq long, part string")
    t = TxnTable.create(spark, str(tmp_path / "m"), df, "part")
    before = {f["path"]: f["partition"] for f in t.snapshot()["files"]}
    # key 'a' MOVES p0 -> p1; key 'f' is new in p1
    up = spark.createDataFrame([("a", 1, "p1"), ("f", 1, "p1")],
                               "k string, seq long, part string")
    t.upsert_moving(up, ["k"], "seq")
    got = {(r["k"], r["seq"], r["part"]) for r in t.read().collect()}
    assert got == {("a", 1, "p1"), ("b", 0, "p0"), ("c", 0, "p1"),
                   ("d", 0, "p2"), ("e", 0, "p3"), ("f", 1, "p1")}
    # no stale 'a' row hiding in p0
    assert {(r["k"]) for r in t.read(partitions=["p0"]).collect()} \
        == {"b"}
    # partition-scoped writes: p2/p3 files re-linked byte-identical
    after = {f["path"]: f["partition"] for f in t.snapshot()["files"]}
    untouched_before = {p for p, pv in before.items() if pv in ("p2", "p3")}
    untouched_after = {p for p, pv in after.items() if pv in ("p2", "p3")}
    assert untouched_before == untouched_after
    changed = {pv for p, pv in after.items() if p not in before}
    assert changed <= {"p0", "p1"}
    # replay idempotence: same batch, same seq -> same rows
    v = t.version()
    t.upsert_moving(up, ["k"], "seq")
    assert t.version() == v + 1
    assert {(r["k"], r["seq"], r["part"])
            for r in t.read().collect()} == got


def test_upsert_moving_requires_partition_column(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    up = spark.createDataFrame([("a", 2, "y")],
                               "k string, seq long, val string")
    with pytest.raises(ValueError, match="partition column"):
        t.upsert_moving(up, ["k"], "seq")


def test_time_travel_read(spark, tmp_path):
    """snapshot(version)/read(version=N): any retained version is
    readable as-of; checkpoint() retires old versions and time travel
    to them then raises."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "x2"), ("b", 2, "y")],
                              "k string, seq long, val string"),
        ["k"], 4)
    t.upsert(up, ["k"], "seq")
    assert _rows(t.read(version=0)) == {("a", 1, "x")}
    assert _rows(t.read(version=1)) == {("a", 2, "x2"), ("b", 2, "y")}
    assert _rows(t.read()) == _rows(t.read(version=1))
    with pytest.raises(FileNotFoundError, match="never committed"):
        t.read(version=7)
    t.checkpoint(retain_versions=1)
    with pytest.raises(FileNotFoundError, match="retired"):
        t.read(version=0)


def test_upsert_schema_evolution(spark, tmp_path):
    """allow_schema_merge: a batch may ADD a payload column — the
    manifest schema widens, touched partitions rewrite with it, and
    re-linked old files read the new column as NULL. Strict mode still
    rejects the mismatch."""
    t = _mk(spark, tmp_path, [(f"k{i}", 0, f"v{i}") for i in range(8)])
    up = txn.add_bucket(
        spark.createDataFrame(
            [("k0", 1, "V0", 0.9), ("zz", 1, "Z", 0.5)],
            "k string, seq long, val string, quality double"),
        ["k"], 4)
    with pytest.raises(Exception):
        t.upsert(up, ["k"], "seq")              # strict: schema mismatch
    v = t.upsert(up, ["k"], "seq", allow_schema_merge=True)
    got = {(r["k"], r["seq"], r["val"], r["quality"]) for r in
           t.read().collect()}
    assert ("k0", 1, "V0", 0.9) in got and ("zz", 1, "Z", 0.5) in got
    # untouched keys read the NEW column as NULL from re-linked files
    assert ("k1", 0, "v1", None) in got
    assert len(got) == 9
    assert "quality" in t.read().columns
    # time travel still reads the old schema
    assert "quality" not in t.read(version=v - 1).columns


def test_delete_cow_scope_and_sql_null_semantics(spark, tmp_path):
    """delete(): predicate-TRUE rows go, FALSE and NULL rows survive
    (SQL DELETE semantics); only partitions holding matching rows
    rewrite, the rest re-link byte-identical; a no-match delete is a
    no-op (version unchanged)."""
    df = spark.createDataFrame(
        [("p1", "a", 1), ("p1", "b", None), ("p2", "c", 9),
         ("p3", "d", 3)],
        "part string, k string, score int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    v = t.delete("score < 2")          # hits p1 only; NULL survives
    assert v == 1
    got = {(r["part"], r["k"]) for r in t.read().collect()}
    assert got == {("p1", "b"), ("p2", "c"), ("p3", "d")}
    f0 = {f["path"]: f["partition"] for f in t.snapshot(0)["files"]}
    f1 = {f["path"]: f["partition"] for f in t.snapshot(1)["files"]}
    relinked = {p for p, pv in f1.items() if p in f0}
    assert {f1[p] for p in relinked} == {"p2", "p3"}
    assert t.delete("score > 100") == 1          # no match -> no-op
    # fully-deleted partition drops out of the manifest entirely
    assert t.delete("part = 'p2'") == 2
    assert {f["partition"] for f in t.snapshot()["files"]} == {"p1", "p3"}


def test_manifest_entries_carry_footer_stats(spark, tmp_path):
    """Every manifest entry carries rows + per-column footer min/max
    (+null count) harvested at write time — no scan job."""
    df = spark.createDataFrame(
        [("p1", "a", 1), ("p1", "z", 5), ("p2", None, 9),
         ("p2", "m", None)],
        "part string, k string, score int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    by_pv = {f["partition"]: f for f in t.snapshot()["files"]}
    e1 = by_pv["p1"]
    assert e1["rows"] == 2
    assert e1["stats"]["k"] == {"min": "a", "max": "z", "nulls": 0}
    assert e1["stats"]["score"] == {"min": 1, "max": 5, "nulls": 0}
    e2 = by_pv["p2"]
    assert e2["stats"]["k"] == {"min": "m", "max": "m", "nulls": 1}
    assert e2["stats"]["score"] == {"min": 9, "max": 9, "nulls": 1}


def test_between_read_skips_files_and_bounds_rows(spark, tmp_path):
    """read(between=...): zone-map skipping opens only files whose
    [min, max] can intersect the bound, the residual filter applies to
    survivors, and the result equals a plain filter over the table.
    Open ends and multi-column bounds compose."""
    rows = [(f"p{i // 10}", i, float(i) / 7) for i in range(50)]
    df = spark.createDataFrame(rows, "part string, seqno int, x double")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    kept, total = t.pruned_file_count({"seqno": (13, 27)})
    assert (kept, total) == (2, 5)          # p1 [10,19], p2 [20,29]
    got = {r["seqno"] for r in t.read(between={"seqno": (13, 27)})
           .collect()}
    assert got == set(range(13, 28))
    # open lower end + second column bound
    got2 = {r["seqno"] for r in
            t.read(between={"seqno": (None, 8),
                            "x": (0.5, None)}).collect()}
    assert got2 == {i for i in range(0, 9) if i / 7 >= 0.5}
    k3, _ = t.pruned_file_count({"seqno": (None, 8)})
    assert k3 == 1


def test_between_missing_stats_or_type_mismatch_is_conservative(
        spark, tmp_path):
    """A bound on a column with no usable stats (or mismatched types)
    must keep every file — skipping is an optimization, never a
    filter."""
    df = spark.createDataFrame(
        [("p1", "a", 1), ("p2", "b", 2)],
        "part string, k string, score int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    assert t.pruned_file_count({"nosuch": (0, 9)})[0] == 2
    # string bound against a numeric column: incomparable -> keep
    assert t.pruned_file_count({"score": ("a", "z")})[0] == 2
    assert {r["k"] for r in
            t.read(between={"k": ("a", "z")}).collect()} == {"a", "b"}


def test_read_changes_keyed_nets_commits_into_classes(spark, tmp_path):
    """read_changes(v0, v2, keys): insert / update_postimage / delete
    classes net across commits — an inserted-then-deleted key yields
    nothing, an updated row reports its NEW image, a deleted row its
    OLD image, and carried-over rows in rewritten partitions never
    leak."""
    t = _mk(spark, tmp_path,
            [("a", 0, "va"), ("b", 0, "vb"), ("c", 0, "vc"),
             ("d", 0, "vd")])
    up = txn.add_bucket(
        spark.createDataFrame(
            [("a", 1, "VA"), ("e", 1, "ve"), ("f", 1, "vf")],
            "k string, seq long, val string"), ["k"], 4)
    t.upsert(up, ["k"], "seq")                     # v1
    t.delete("k IN ('b', 'f')")                    # v2
    ch = {(r["k"], r["_change_type"], r["seq"], r["val"]) for r in
          t.read_changes(0, 2, keys=["k"]).collect()}
    assert ch == {("a", "update_postimage", 1, "VA"),
                  ("e", "insert", 1, "ve"),
                  ("b", "delete", 0, "vb")}        # f nets to nothing
    # single-commit feeds compose the same way
    ch01 = {(r["k"], r["_change_type"]) for r in
            t.read_changes(0, 1, keys=["k"]).collect()}
    assert ch01 == {("a", "update_postimage"), ("e", "insert"),
                    ("f", "insert")}


def test_read_changes_keyed_requires_key_unique_snapshots(spark, tmp_path):
    """VERDICT r14 #5 pinned: read_changes(keys=) is exact ONLY for
    key-unique snapshots (the upsert/merge/delete keyed-consumer
    contract — every engine consumer satisfies it). A snapshot that
    carries duplicate keys into a rewritten partition is OUT OF
    CONTRACT: the null-safe full-outer classification join multiplies
    the duplicate rows and emits spurious update images where the old
    exceptAll path would have produced multiset diffs. This test
    documents that failure mode so a future consumer with non-unique
    keys hits a red test, not a silent wrong feed."""
    df = txn.add_bucket(
        spark.createDataFrame(
            [("a", 0, "x"), ("a", 0, "y"), ("b", 0, "vb")],
            "k string, seq long, val string"), ["k"], 1)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket")
    t.delete("k = 'b'")                            # v1 rewrites the one bucket
    ch = [(r["k"], r["_change_type"], r["val"]) for r in
          t.read_changes(0, 1, keys=["k"]).collect()]
    # the in-contract part of the feed is still right
    assert ("b", "delete", "vb") in ch
    # the duplicate key is where the contract breaks: the full-outer
    # join pairs every old 'a' row with every new 'a' row, so the two
    # unchanged-but-distinct rows surface as cross-paired spurious
    # updates (exceptAll multiset semantics would emit nothing here)
    spurious = [c for c in ch if c[0] == "a"]
    assert sorted(spurious) == [("a", "update_postimage", "x"),
                                ("a", "update_postimage", "y")]


def test_read_changes_include_preimages(spark, tmp_path):
    """include_preimages=True adds the update_preimage class (the OLD
    row of every updated key) — the retraction input for incremental
    aggregate maintenance; inserts and deletes are unchanged, and the
    preimage/postimage key sets coincide exactly."""
    t = _mk(spark, tmp_path,
            [("a", 0, "va"), ("b", 0, "vb"), ("c", 0, "vc")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 1, "VA"), ("e", 1, "ve")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up, ["k"], "seq")                     # v1
    t.delete("k = 'b'")                            # v2
    ch = {(r["k"], r["_change_type"], r["seq"], r["val"]) for r in
          t.read_changes(0, 2, keys=["k"],
                         include_preimages=True).collect()}
    assert ch == {("a", "update_postimage", 1, "VA"),
                  ("a", "update_preimage", 0, "va"),
                  ("e", "insert", 1, "ve"),
                  ("b", "delete", 0, "vb")}
    # default stays the three-class feed
    ch_def = {r["_change_type"] for r in
              t.read_changes(0, 2, keys=["k"]).collect()}
    assert "update_preimage" not in ch_def


def test_merge_meta_update_rides_the_commit(spark, tmp_path):
    """merge(meta_update=...) publishes the updated table meta WITH the
    DML commit (the atomic watermark carrier for maintain_aggregate);
    untouched keys persist, an empty source leaves meta alone."""
    df = txn.add_bucket(
        spark.createDataFrame([("a", 0, "va")],
                              "k string, seq long, val string"), ["k"], 4)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket",
                        meta={"n_buckets": 4})
    src = txn.add_bucket(
        spark.createDataFrame([("a", 1, "VA")],
                              "k string, seq long, val string"), ["k"], 4)
    t.merge(src, ["k"], "seq", meta_update={"agg_watermark": 7})
    meta = t.snapshot()["meta"]
    assert meta["agg_watermark"] == 7
    assert meta["n_buckets"] == 4                  # existing keys persist
    empty = src.limit(0)
    v = t.version()
    t.merge(empty, ["k"], "seq", meta_update={"agg_watermark": 9})
    assert t.version() == v                        # no commit
    assert t.snapshot()["meta"]["agg_watermark"] == 7


def test_read_changes_filegrain_and_schema_boundary(spark, tmp_path):
    """Without keys, read_changes returns the rows of files ADDED
    between the versions (exact for append-only); across a column-ADD
    evolution the feed survives (VERDICT r11 #3) — both sides align to
    the union-by-name schema with the missing column NULL on the old
    side."""
    t = _mk(spark, tmp_path, [("a", 0, "va")])
    rows = txn.add_bucket(
        spark.createDataFrame([("x", 1, "vx"), ("y", 1, "vy")],
                              "k string, seq long, val string"),
        ["k"], 4)
    t.append(rows)
    assert _rows(t.read_changes(0, 1)) == {("x", 1, "vx"),
                                           ("y", 1, "vy")}
    up = txn.add_bucket(
        spark.createDataFrame([("z", 2, "vz", 1.0)],
                              "k string, seq long, val string, q double"),
        ["k"], 4)
    t.upsert(up, ["k"], "seq", allow_schema_merge=True)
    ch = t.read_changes(0, 2, keys=["k"])
    assert set(ch.columns) == {"k", "seq", "val", "bucket", "q",
                               "_change_type"}
    got = {(r["k"], r["seq"], r["val"], r["q"], r["_change_type"])
           for r in ch.collect()}
    # the feed nets both commits: x/y/z all insert; z carries q, the
    # pre-evolution inserts read q as NULL; 'a' is untouched (no row)
    assert got == {("x", 1, "vx", None, "insert"),
                   ("y", 1, "vy", None, "insert"),
                   ("z", 2, "vz", 1.0, "insert")}


def test_read_changes_evolution_update_and_type_change(spark, tmp_path):
    """Keyed CDF across the boundary classifies an UPDATED pre-evolution
    key correctly (postimage carries the new column), and a TYPE change
    on a common column still refuses."""
    t = _mk(spark, tmp_path, [("a", 0, "va"), ("b", 0, "vb")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 1, "NEW", 7.5)],
                              "k string, seq long, val string, q double"),
        ["k"], 4)
    t.upsert(up, ["k"], "seq", allow_schema_merge=True)
    ch = t.read_changes(0, 1, keys=["k"])
    got = {(r["k"], r["seq"], r["val"], r["q"], r["_change_type"])
           for r in ch.collect()}
    # 'b' shares a's bucket era only if hashed together; whatever the
    # bucket layout, b is value-unchanged so it must NOT appear
    assert got == {("a", 1, "NEW", 7.5, "update_postimage")}
    # type change: publish a manifest whose schema retypes q
    import copy

    from pyspark.sql.types import StructType

    snap = copy.deepcopy(t.snapshot())
    sch = json.loads(snap["schema"])
    for f in sch["fields"]:
        if f["name"] == "q":
            f["type"] = "string"
    t._publish(2, snap["files"], StructType.fromJson(sch),
               snap.get("meta"))
    # v0 has no q at all, so 0->2 is add-evolution (fine); 1->2 retypes
    # the COMMON column q, which must refuse
    with pytest.raises(ValueError, match="TYPE change"):
        t.read_changes(1, 2, keys=["k"])


def test_delete_between_hint_prunes_discovery_only(spark, tmp_path):
    """delete(between=...): the zone-map hint bounds the touched-scan
    IO but never the rewrite — the result is identical to the unhinted
    delete, including survivors in the touched partition that the hint
    range excludes."""
    rows = [(f"p{i // 10}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "part string, seqno int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    v = t.delete("seqno >= 33 AND seqno <= 35",
                 between={"seqno": (33, 35)})
    assert v == 1
    got = {r["seqno"] for r in t.read().collect()}
    assert got == set(range(50)) - {33, 34, 35}
    # only p3 rewrote; p3's hint-excluded rows (30-32, 36-39) survived
    s0 = {f["path"] for f in t.snapshot(0)["files"]}
    changed = {f["partition"] for f in t.snapshot(1)["files"]
               if f["path"] not in s0}
    assert changed == {"p3"}


def test_zorder_compact_tightens_zone_maps(spark, tmp_path):
    """zorder_compact: the layout rewrite splits every partition into
    bounded z-sorted files whose manifest stats are tight on BOTH
    clustered columns, so a two-column between-read skips files inside
    partitions that partition pruning can't see; results stay exactly
    the plain filter's."""
    from openapc_olap_spark.operators.zorder import zorder_compact

    rows = [(i % 2, i % 100, float((i * 37) % 100), i)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "bucket int, a int, b double, id int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket")
    with pytest.raises(ValueError, match="max_rows_per_file"):
        t.compact(order_by=["a"])
    v = zorder_compact(t, ["a", "b"], max_rows_per_file=125)
    assert v == 1
    snap = t.snapshot()
    per_part = {}
    for f in snap["files"]:
        per_part.setdefault(f["partition"], []).append(f)
    assert all(len(fs) > 1 for fs in per_part.values())
    bounds = {"a": (10, 30), "b": (20.0, 40.0)}
    kept, total = t.pruned_file_count(bounds)
    assert kept < total, (kept, total)
    got = {r["id"] for r in t.read(between=bounds).collect()}
    want = {i for i in range(2000)
            if 10 <= i % 100 <= 30 and 20.0 <= (i * 37) % 100 <= 40.0}
    assert got == want


def test_merge_three_clause_semantics(spark, tmp_path):
    """merge(): WHEN MATCHED AND cond THEN DELETE / WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED THEN INSERT, one commit — untouched keys
    keep their rows, the delete condition sees BOTH sides, the source
    collapses last-wins before applying."""
    t = _mk(spark, tmp_path,
            [("a", 0, "va"), ("b", 0, "vb"), ("c", 0, "DROP"),
             ("d", 0, "vd")])
    src = txn.add_bucket(
        spark.createDataFrame(
            [("a", 1, "A1"), ("a", 2, "A2"),      # last-wins inside batch
             ("c", 1, "anything"),                # t.val = DROP -> delete
             ("e", 1, "ve")],                     # new key -> insert
            "k string, seq long, val string"), ["k"], 4)
    v = t.merge(src, ["k"], "seq", matched_delete="t.val = 'DROP'")
    assert v == 1
    assert _rows(t.read()) == {("a", 2, "A2"), ("b", 0, "vb"),
                               ("d", 0, "vd"), ("e", 1, "ve")}


def test_merge_clause_toggles(spark, tmp_path):
    """matched_update=False leaves matched targets alone;
    insert_unmatched=False drops source-only keys."""
    t = _mk(spark, tmp_path, [("a", 0, "va"), ("b", 0, "vb")])
    src = txn.add_bucket(
        spark.createDataFrame([("a", 5, "NEW"), ("z", 5, "vz")],
                              "k string, seq long, val string"), ["k"], 4)
    t.merge(src, ["k"], "seq", matched_update=False,
            insert_unmatched=False,
            matched_delete="s.val = 'nomatch'")
    assert _rows(t.read()) == {("a", 0, "va"), ("b", 0, "vb")}
    t.merge(src, ["k"], "seq")          # defaults: update + insert
    assert _rows(t.read()) == {("a", 5, "NEW"), ("b", 0, "vb"),
                               ("z", 5, "vz")}


def test_merge_requires_partition_column(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "va")])
    bare = spark.createDataFrame([("a", 1, "x")],
                                 "k string, seq long, val string")
    with pytest.raises(ValueError, match="partition column"):
        t.merge(bare, ["k"], "seq")


def test_merge_empty_source_is_noop(spark, tmp_path):
    """ADVICE r11: merge() with a source that touches no partition is a
    no-op returning the current version — matching delete()'s no-match
    contract — instead of publishing an empty marker commit that
    pollutes retention and wakes streaming consumers."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    empty = txn.add_bucket(
        spark.createDataFrame([], "k string, seq long, val string"),
        ["k"], 4)
    assert t.merge(empty, ["k"], "seq") == 0
    assert t.version() == 0


def test_stats_harvest_distributed_matches_serial(spark, tmp_path,
                                                  monkeypatch):
    """VERDICT r11 #4: a wide commit harvests footer stats through a
    Spark job instead of a serial driver loop; the manifest entries are
    byte-identical either way. Forcing the threshold to 0 routes a
    normal commit through the distributed path."""
    rows = [(f"p{i % 7}", i, float(i)) for i in range(600)]
    df = spark.createDataFrame(rows, "part string, seqno int, v double")

    monkeypatch.setattr(txn, "_DRIVER_STATS_MAX", 0)
    t = TxnTable.create(spark, str(tmp_path / "dist"), df, "part")
    monkeypatch.setattr(txn, "_DRIVER_STATS_MAX", 10_000)
    s = TxnTable.create(spark, str(tmp_path / "ser"), df, "part")

    def key(snap):
        return sorted((f["partition"], f["rows"],
                       json.dumps(f["stats"], sort_keys=True))
                      for f in snap["files"])

    assert key(t.snapshot()) == key(s.snapshot())
    # and the distributed path really produced per-file zone maps
    assert all(f["stats"]["seqno"]["min"] is not None
               for f in t.snapshot()["files"])


def test_rebucket_single_commit(spark, tmp_path):
    """rebucket(n_new) with no bound migrates the whole table in ONE
    snapshot commit: same rows, meta n_buckets flips, every file tagged
    with the new spec, partition values consistent with the new hash."""
    rows = [(f"k{i}", 1, f"v{i}") for i in range(40)]
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 4)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket",
                        meta={"n_buckets": 4})
    v = t.rebucket(16, keys=["k"])
    assert v == 1 and not t.in_rebucket()
    assert t.snapshot()["meta"]["n_buckets"] == 16
    assert _rows(t.read()) == {(f"k{i}", 1, f"v{i}") for i in range(40)}
    from pyspark.sql import functions as F
    bad = (t.read()
           .filter(F.col("bucket")
                   != F.pmod(F.xxhash64("k"), F.lit(16))).count())
    assert bad == 0
    # post-completion: a NORMAL upsert under the new spec works
    up = txn.add_bucket(
        spark.createDataFrame([("k3", 2, "NEW")],
                              "k string, seq long, val string"),
        ["k"], 16)
    t.upsert(up, ["k"], "seq")
    assert ("k3", 2, "NEW") in _rows(t.read())
    assert ("k3", 1, "v3") not in _rows(t.read())


def test_rebucket_incremental_reads_and_upserts_mid_transition(
        spark, tmp_path):
    """The scale path (VERDICT r11 #6): buckets_per_commit bounds each
    commit's rewrite volume, and MID-transition the table stays live —
    full reads exact, value-pruned reads conservatively include
    un-migrated files (a key's row is found through its NEW bucket even
    while it still sits in an old-spec file), and upsert both stays
    correct (stale copies rewritten out of old-spec files) and advances
    the migration."""
    from pyspark.sql import functions as F

    rows = [(f"k{i}", 1, f"v{i}") for i in range(60)]
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 3)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket",
                        meta={"n_buckets": 3})
    t.rebucket(8, keys=["k"], buckets_per_commit=1)
    assert t.in_rebucket()
    # full read exact mid-transition
    assert _rows(t.read()) == set(rows)
    # a still-un-migrated key is found via its NEW bucket value
    unmig = [f for f in t.snapshot()["files"] if f.get("nb") != 8]
    assert unmig, "expected un-migrated files after one bounded commit"
    old_parts = {f["partition"] for f in unmig}
    probe = next(r["k"] for r in t.read().collect()
                 if str(r["bucket"]) in old_parts)
    new_b = spark.createDataFrame([(probe,)], "k string").select(
        F.pmod(F.xxhash64("k"), F.lit(8)).alias("b")).first()["b"]
    got = {r["k"] for r in t.read(partitions=[new_b]).collect()}
    assert probe in got
    # ADVICE r12: the value-pruned read is EXACT mid-transition — no
    # phantom rows from un-requested buckets, and the partition column
    # carries the NEW-spec value (bit-identical before/after migration)
    pruned = t.read(partitions=[new_b]).collect()
    assert {r["bucket"] for r in pruned} == {int(new_b)}
    all_new_b = {r["k"] for r in t.read().select(
        "k", F.pmod(F.xxhash64("k"), F.lit(8)).alias("b")).collect()
        if r["b"] == int(new_b)}
    assert {r["k"] for r in pruned} == all_new_b
    # upsert mid-transition: update an un-migrated key + insert a new one
    up = txn.add_bucket(
        spark.createDataFrame([(probe, 2, "UPD"), ("zz", 2, "ins")],
                              "k string, seq long, val string"),
        ["k"], 8)
    t.upsert(up, ["k"], "seq")
    want = (set(rows) - {(probe, 1, f"v{probe[1:]}")}) | \
        {(probe, 2, "UPD"), ("zz", 2, "ins")}
    assert _rows(t.read()) == want
    # the old copy is truly gone from the old-spec file (single-copy
    # invariant): every occurrence of probe is the seq-2 row
    assert [r["seq"] for r in
            t.read().filter(F.col("k") == probe).collect()] == [2]
    # drive the migration to completion
    for _ in range(32):
        before = t.version()
        t.rebucket(8)
        if not t.in_rebucket():
            break
        assert t.version() > before
    assert not t.in_rebucket()
    assert t.snapshot()["meta"]["n_buckets"] == 8
    assert _rows(t.read()) == want
    bad = (t.read()
           .filter(F.col("bucket")
                   != F.pmod(F.xxhash64("k"), F.lit(8))).count())
    assert bad == 0


def test_rebucket_guards_other_dml(spark, tmp_path):
    """Mid-transition, partition-value arithmetic is ambiguous across
    the two live specs: append/delete/merge/compact/upsert_moving/
    overwrite/read_changes refuse with a pointed error; a different
    rebucket target refuses; starting without keys/n_old refuses."""
    rows = [(f"k{i}", 1, f"v{i}") for i in range(30)]
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 3)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket")
    with pytest.raises(ValueError, match="needs keys and n_old"):
        t.rebucket(8)
    t.rebucket(8, keys=["k"], n_old=3, buckets_per_commit=1)
    assert t.in_rebucket()
    batch = txn.add_bucket(
        spark.createDataFrame([("q", 1, "x")],
                              "k string, seq long, val string"),
        ["k"], 8)
    for op in (lambda: t.append(batch),
               lambda: t.delete("val = 'v1'"),
               lambda: t.merge(batch, ["k"], "seq"),
               lambda: t.compact(),
               lambda: t.upsert_moving(batch, ["k"], "seq"),
               lambda: t.overwrite(batch)):
        with pytest.raises(ValueError, match="rebucket transition"):
            op()
    with pytest.raises(ValueError, match="rebucket transition"):
        t.read_changes(0, t.version(), keys=["k"])
    with pytest.raises(ValueError, match="already in progress"):
        t.rebucket(12)


def test_append_refuses_rebucket_started_after_precheck(spark, tmp_path):
    """ADVICE r12: append checked _no_transition once BEFORE landing its
    data files; a rebucket starting between that check and the commit
    used to let append publish untagged files into a mid-transition
    manifest (where _upsert_mid_rebucket matches them against OLD-spec
    buckets and a stale copy of an upserted key could survive). The
    retry loop now re-checks on every snapshot and fails the append —
    the landed files become vacuum-able orphans, like a lost race."""
    rows = [(f"k{i}", 1, f"v{i}") for i in range(12)]
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 3)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket",
                        meta={"n_buckets": 3})
    batch = txn.add_bucket(
        spark.createDataFrame([("q", 1, "x")],
                              "k string, seq long, val string"),
        ["k"], 3)
    v_before = t.version()
    orig = t._write_data

    def hijack(rows_df, nb=None):
        files = orig(rows_df, nb=nb)
        # a concurrent writer starts a rebucket AFTER append's pre-check
        # has passed but BEFORE its first commit attempt
        other = TxnTable(t.spark, t.path, "bucket")
        other.rebucket(8, keys=["k"], buckets_per_commit=1)
        t._write_data = orig
        return files

    t._write_data = hijack
    with pytest.raises(ValueError, match="rebucket transition"):
        t.append(batch)
    # nothing published by the refused append; the table stays readable
    assert ("q", 1, "x") not in _rows(t.read())
    assert t.version() > v_before  # only the rebucket's own commits


def test_snapshot_latest_hint_fast_path_and_fallbacks(spark, tmp_path):
    """snapshot() resolves the latest version via the advisory
    _latest.hint + forward probe (O(commits since hint), not
    O(versions) listing). The hint is never load-bearing: stale,
    missing, corrupt, or checkpoint-retired hints all fall back and
    self-repair."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    hint = t._hint_path()
    assert open(hint).read() == "0"
    up = txn.add_bucket(
        spark.createDataFrame([("b", 2, "y")],
                              "k string, seq long, val string"),
        ["k"], 4)
    t.upsert(up, ["k"], "seq")
    assert open(hint).read() == "1"
    # stale hint -> forward probe finds the newer version
    with open(hint, "w") as fh:
        fh.write("0")
    assert t.version() == 1
    # missing hint -> listing fallback, then self-repair
    os.remove(hint)
    assert t.version() == 1
    assert open(hint).read() == "1"
    # corrupt hint -> fallback
    with open(hint, "w") as fh:
        fh.write("not-a-number")
    assert t.version() == 1
    # hint pointing at a checkpoint-retired version -> fallback
    with open(hint, "w") as fh:
        fh.write("0")
    t.checkpoint(retain_versions=1)   # retires v0
    assert t.version() == 1


def test_compacted_snapshot_resolution_and_cadence(spark, tmp_path,
                                                   monkeypatch):
    """VERDICT r12 #5: the compacted snapshot (_checkpoint.json,
    manifest-of-manifests) resolves the latest version WITHOUT a hint
    and WITHOUT listing the manifest directory — one read + a bounded
    forward probe — and _publish refreshes it on the ckpt_every
    cadence."""
    rows = [("a", 1, "x")]
    df = txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], 4)
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "bucket",
                        meta={"ckpt_every": 2})
    assert not os.path.exists(t._ckpt_path())   # v0 is not a cadence hit
    up = lambda k, s: txn.add_bucket(  # noqa: E731
        spark.createDataFrame([(k, s, "y")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up("b", 2), ["k"], "seq")          # v1
    assert not os.path.exists(t._ckpt_path())
    t.upsert(up("c", 3), ["k"], "seq")          # v2 -> cadence refresh
    ck = t._read_ckpt()
    assert ck is not None and ck["version"] == 2
    assert all(p.startswith("data/") for p in ck["referenced"])
    t.upsert(up("d", 4), ["k"], "seq")          # v3: ckpt now stale by 1
    # no hint + no listing: snapshot must resolve via checkpoint +
    # forward probe alone
    os.remove(t._hint_path())
    real_listdir = os.listdir
    mdir = t._mdir()

    def no_listing(p):
        assert os.path.abspath(str(p)) != os.path.abspath(mdir), \
            "snapshot() listed the manifest dir despite a checkpoint"
        return real_listdir(p)

    monkeypatch.setattr(os, "listdir", no_listing)
    assert t.version() == 3
    monkeypatch.undo()
    # the probe self-repaired the hint
    assert open(t._hint_path()).read() == "3"
    # corrupt checkpoint -> listing fallback still works
    os.remove(t._hint_path())
    with open(t._ckpt_path(), "w") as fh:
        fh.write("{not json")
    assert t.version() == 3


def test_compacted_snapshot_vacuum_fast_path(spark, tmp_path):
    """vacuum() reads only manifests newer than the checkpoint; a stale
    checkpoint is a conservative superset (orphans linger, nothing live
    deleted) and retention's write_checkpoint re-tightens it."""
    t = _mk(spark, tmp_path, [("a", 1, "x"), ("b", 1, "y")])
    up = txn.add_bucket(
        spark.createDataFrame([("a", 2, "z")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up, ["k"], "seq")                  # v1 rewrites a's bucket
    old_files = {e["path"] for e in t.snapshot(0)["files"]}
    new_files = {e["path"] for e in t.snapshot(1)["files"]}
    rewritten = old_files - new_files
    assert rewritten
    t.write_checkpoint()
    ck = t._read_ckpt()
    assert set(ck["referenced"]) == old_files | new_files
    # stale-superset safety: retire v0, keep the STALE pre-retention
    # checkpoint -> the rewritten file is still pinned, nothing breaks
    stale = open(t._ckpt_path()).read()
    t.checkpoint(retain_versions=1)             # also re-tightens
    tight = t._read_ckpt()
    assert set(tight["referenced"]) == new_files
    with open(t._ckpt_path(), "w") as fh:
        fh.write(stale)
    assert t.vacuum(grace_seconds=0) == []      # superset pins orphans
    assert _rows(t.read()) == {("a", 2, "z"), ("b", 1, "y")}
    # a FULL refresh drops the resurrected stale paths (the incremental
    # cadence path deliberately never drops — VERDICT r13 #3) and the
    # orphan is found through the fast path
    t.write_checkpoint(full=True)
    gone = t.vacuum(grace_seconds=0)
    assert {f"data/{g}" for g in gone} == rewritten


def test_incremental_checkpoint_refresh_parity(spark, tmp_path):
    """VERDICT r13 #3: the cadence checkpoint refresh merges the
    previous checkpoint's referenced set with manifests NEWER than it —
    O(commits-since-refresh) manifest reads, not O(retained) — and,
    absent retention, produces EXACTLY the full rebuild's set. With
    retention in between, the incremental set is a superset (safe) and
    only full=True re-tightens."""
    t = _mk(spark, tmp_path, [("a", 1, "x"), ("b", 1, "y")])
    up = lambda k, s: txn.add_bucket(  # noqa: E731
        spark.createDataFrame([(k, s, "z")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up("a", 2), ["k"], "seq")              # v1
    base = t.write_checkpoint()                     # seeds the chain
    t.upsert(up("b", 3), ["k"], "seq")              # v2
    t.upsert(up("c", 4), ["k"], "seq")              # v3
    opened: list[str] = []
    real_open = open

    def spy(p, *a, **kw):
        opened.append(str(p))
        return real_open(p, *a, **kw)

    import builtins
    try:
        builtins.open, _orig = spy, builtins.open
        inc = t.write_checkpoint()
    finally:
        builtins.open = _orig
    # only manifests NEWER than the previous checkpoint were read
    read_manifests = [p for p in opened
                      if "/_manifest/v" in p and p.endswith(".json")]
    assert {os.path.basename(p) for p in read_manifests} \
        == {"v00000002.json", "v00000003.json"}, read_manifests
    full = t.write_checkpoint(full=True)
    assert inc["version"] == full["version"] == 3
    # no retention happened -> incremental == tight full rebuild
    assert inc["referenced"] == full["referenced"]
    assert set(base["referenced"]) <= set(inc["referenced"])
    # retention retires v0-v2; the next INCREMENTAL refresh keeps the
    # retired manifests' exclusive paths (superset, still safe for
    # vacuum), full=True drops them
    live = {e["path"] for e in t.snapshot()["files"]}
    t.checkpoint(retain_versions=1)                 # re-tightens (full)
    assert set(t._read_ckpt()["referenced"]) == live
    inc2 = t.write_checkpoint()
    assert set(inc2["referenced"]) == live          # chain from tight base


def test_incremental_checkpoint_falls_back_when_base_retired(
        spark, tmp_path):
    """An incremental refresh whose previous checkpoint points at a
    retention-retired manifest cannot trust the chain (intermediate
    manifests may be gone too) — it falls back to the full rebuild."""
    t = _mk(spark, tmp_path, [("a", 1, "x")])
    up = lambda k, s: txn.add_bucket(  # noqa: E731
        spark.createDataFrame([(k, s, "z")],
                              "k string, seq long, val string"), ["k"], 4)
    t.upsert(up("a", 2), ["k"], "seq")              # v1
    t.write_checkpoint()                            # base at v1
    stale = open(t._ckpt_path()).read()
    t.upsert(up("a", 3), ["k"], "seq")              # v2
    # retire everything below v2, then resurrect the v1-based ckpt
    t.checkpoint(retain_versions=1)
    with open(t._ckpt_path(), "w") as fh:
        fh.write(stale)
    ck = t.write_checkpoint()                       # base manifest gone
    assert ck["version"] == 2
    assert set(ck["referenced"]) \
        == {e["path"] for e in t.snapshot()["files"]}
