"""Transactional parquet table: manifest-swap snapshots with bucketed
partition-overwrite upsert (SURVEY.md §2.1 S-surface extension;
VERDICT r09 #5 — the incremental-state store e17/x49 need, so cache
refresh and crawl-over-crawl dedup stop modeling upsert as a full
overwrite of a plain parquet directory).

Layout (all state under one root):

    <root>/data/<txn>-<k>.parquet      immutable data files
    <root>/_manifest/v<8 digits>.json  snapshot N: schema + file list,
                                       each file tagged with its
                                       partition value

Why a manifest and not the directory: a reader NEVER globs ``data/`` —
it reads exactly the files the highest committed manifest names. That
single indirection buys, on any filesystem with atomic
exclusive-create:

- **Atomic commit / crash consistency.** A writer lands new data files
  first, then publishes the next manifest version. Crash before the
  publish leaves orphan data files that no manifest references — the
  table is bitwise unchanged, a re-run converges to the same final
  state, and :func:`TxnTable.vacuum` reclaims the orphans.
- **Optimistic concurrency.** The version file is created with
  O_CREAT|O_EXCL; the loser of a race gets EEXIST, re-reads the new
  snapshot, and redoes its merge against it (bounded retries). Two
  writers can never both publish version N. (On HDFS the equivalent
  primitive is atomic rename-without-overwrite; on S3, conditional
  put — the protocol is unchanged.)
- **Partition-overwrite-by-filter.** Files are tagged with one
  partition value each; an upsert rewrites ONLY the partitions its
  update batch touches and re-links every other file untouched into
  the new manifest. With key-stable bucket partitioning
  (:func:`add_bucket`), a 100 TB table absorbs a small update batch by
  rewriting a handful of buckets, not the table.

Upsert merge semantics are per-key last-wins on an explicit sequence
column — union + groupBy(keys) + max(struct(seq, payload)), one
map-side-combined shuffle over ONLY the touched partitions' rows.

The upsert contract requires the partition value to be a FUNCTION OF
THE KEY (else a key's superseded row could hide in an untouched
partition): use :func:`add_bucket` (pmod(xxhash64(keys), n)) unless the
natural partition column already is one.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"
_STAGING_DIR = "_staging"
# partitionBy column (a copy of the partition value — Spark drops the
# partitionBy column from the data files, the original stays inside)
_PV = "__pv"


class CommitConflict(Exception):
    """Another writer published the version this commit targeted."""


def add_bucket(df: DataFrame, keys: list[str], n_buckets: int,
               col: str = "bucket") -> DataFrame:
    """Attach the key-stable bucket column upsert needs:
    pmod(xxhash64(keys), n_buckets). Same keys -> same bucket forever,
    so last-wins merges can never strand a superseded row in an
    untouched partition."""
    return df.withColumn(
        col, F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                    F.lit(n_buckets)))


def _merge_last_wins(existing: DataFrame, updates: DataFrame,
                     keys: list[str], seq_col: str) -> DataFrame:
    """union -> groupBy(keys) -> max(struct(seq, payload...)) — the
    engine's T15 merge shape (etl/coverage.upsert_last_wins), local so
    the storage layer does not import the ETL layer."""
    combined = existing.unionByName(updates)
    payload = [c for c in combined.columns if c not in keys]
    if seq_col not in payload:
        raise ValueError(f"{seq_col!r} must be a non-key column")
    ordered = [seq_col] + [c for c in payload if c != seq_col]
    best = (combined.groupBy(*keys)
            .agg(F.max(F.struct(*ordered)).alias("__best")))
    return best.select(*keys,
                       *[F.col(f"__best.{c}").alias(c) for c in payload])


class TxnTable:
    """Handle on one transactional table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str,
                 partition_col: str):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col

    # -- snapshot bookkeeping -------------------------------------------

    def _mdir(self) -> str:
        return os.path.join(self.path, _MANIFEST_DIR)

    def _version_path(self, v: int) -> str:
        return os.path.join(self._mdir(), f"v{v:08d}.json")

    def snapshot(self) -> dict:
        """The highest committed manifest: {"version", "schema",
        "files": [{"path", "partition"}...]}."""
        versions = [int(f[1:9]) for f in os.listdir(self._mdir())
                    if f.startswith("v") and f.endswith(".json")]
        if not versions:
            raise FileNotFoundError(
                f"no committed manifest under {self._mdir()}")
        with open(self._version_path(max(versions))) as fh:
            return json.load(fh)

    def version(self) -> int:
        return self.snapshot()["version"]

    # -- creation / read -------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, df: DataFrame,
               partition_col: str,
               meta: dict | None = None) -> "TxnTable":
        """Initialize a table at ``path`` (must not already hold one)
        with ``df`` as snapshot v0. ``meta`` rides in every manifest
        (e.g. the add_bucket n_buckets, so later writers bucket
        identically)."""
        t = cls(spark, path, partition_col)
        os.makedirs(t._mdir(), exist_ok=False)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        files = t._write_data(df)
        t._publish(0, files, df.schema, meta or {})
        return t

    def read(self, partitions: list | None = None) -> DataFrame:
        """The current snapshot as a DataFrame. ``partitions`` prunes at
        the MANIFEST (file-list) level — no directory listing, only the
        named files are opened."""
        snap = self.snapshot()
        files = snap["files"]
        if partitions is not None:
            want = {str(p) for p in partitions}
            files = [f for f in files if f["partition"] in want]
        schema = StructType.fromJson(json.loads(snap["schema"]))
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f["path"]) for f in files])

    # -- writes ------------------------------------------------------------

    def _write_data(self, df: DataFrame) -> list[dict]:
        """Land ``df``'s rows as immutable files under data/, one
        partition value per file, via a staging dir + rename. Returns
        manifest entries; nothing is visible until _publish."""
        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, _STAGING_DIR, txn)
        (df.withColumn(_PV, F.col(self.partition_col).cast("string"))
         .repartition(_PV)
         .write.partitionBy(_PV).mode("overwrite").parquet(staging))
        entries: list[dict] = []
        k = 0
        for d in sorted(os.listdir(staging)):
            if not d.startswith(f"{_PV}="):
                continue
            pv = d.split("=", 1)[1]
            for f in sorted(os.listdir(os.path.join(staging, d))):
                if not f.endswith(".parquet"):
                    continue
                name = f"{txn}-{k}.parquet"
                k += 1
                os.rename(os.path.join(staging, d, f),
                          os.path.join(self.path, _DATA_DIR, name))
                entries.append({"path": f"{_DATA_DIR}/{name}",
                                "partition": pv})
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def _publish(self, version: int, files: list[dict],
                 schema, meta: dict | None = None) -> None:
        """Atomically publish ``version`` (exclusive create — EEXIST
        means another writer won; raise CommitConflict)."""
        payload = json.dumps({
            "version": version,
            "schema": json.dumps(schema.jsonValue()),
            "meta": meta or {},
            "files": files,
        }, indent=1)
        try:
            fd = os.open(self._version_path(version),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed") from e
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)

    def overwrite(self, df: DataFrame) -> int:
        """Full-snapshot replace (the bulk-load path); returns the new
        version."""
        snap = self.snapshot()
        files = self._write_data(df)
        v = snap["version"] + 1
        self._publish(v, files, df.schema, snap.get("meta"))
        return v

    def upsert(self, updates: DataFrame, keys: list[str],
               seq_col: str, max_retries: int = 5) -> int:
        """Partition-overwrite-by-filter upsert: merge ``updates`` into
        the table with per-key last-wins on ``seq_col``, rewriting ONLY
        the partitions the batch touches. Requires the partition value
        to be a function of the keys (see module docstring /
        :func:`add_bucket`). Optimistic: on a concurrent commit, the
        whole merge re-runs against the fresh snapshot. Returns the new
        version."""
        if self.partition_col not in updates.columns:
            raise ValueError(
                f"updates must carry the partition column "
                f"{self.partition_col!r} (add_bucket derives it)")
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            touched = {str(r[0]) for r in
                       updates.select(self.partition_col)
                       .distinct().collect()}
            if not touched:
                # empty batch (a heartbeat / fully-deduped micro-batch):
                # re-publish the snapshot unchanged — the version still
                # advances (one commit per batch), no write job runs
                try:
                    v = snap["version"] + 1
                    self._publish(v, snap["files"],
                                  StructType.fromJson(
                                      json.loads(snap["schema"])),
                                  snap.get("meta"))
                    return v
                except CommitConflict as e:
                    last = e
                    continue
            current = self.read(partitions=sorted(touched))
            merged = _merge_last_wins(current, updates, keys, seq_col)
            new_files = self._write_data(merged)
            keep = [f for f in snap["files"]
                    if f["partition"] not in touched]
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, merged.schema,
                              snap.get("meta"))
                return v
            except CommitConflict as e:
                # our data files are now orphans (vacuum reclaims);
                # re-read and re-merge against the winner's snapshot
                last = e
        raise CommitConflict(
            f"upsert lost {max_retries} commit races") from last

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO manifest version (crash /
        lost-race orphans). Returns the deleted names."""
        referenced: set[str] = set()
        for f in os.listdir(self._mdir()):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(self._mdir(), f)) as fh:
                    referenced.update(e["path"]
                                      for e in json.load(fh)["files"])
        gone = []
        ddir = os.path.join(self.path, _DATA_DIR)
        for f in sorted(os.listdir(ddir)):
            if f"{_DATA_DIR}/{f}" not in referenced:
                os.remove(os.path.join(ddir, f))
                gone.append(f)
        return gone
