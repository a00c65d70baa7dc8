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
                 follow_log: bool = False, include_preimages: bool = False):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.last = int(start_version)
        self.frontier_path = frontier_path
        # include_preimages: emit the update_preimage class too (the OLD
        # row of updated keys) — what retraction-based consumers such as
        # maintain_aggregate subtract before adding the postimage
        self.include_preimages = bool(include_preimages)
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
            ch = (t.read_changes(v - 1, v, keys=self.keys,
                                 include_preimages=self.include_preimages)
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
        if self.follow_log:
            # the commit log is the source of truth and every version a
            # stream row can carry is <= its latest (files only enter
            # data/ via a committed manifest), so chasing the log alone
            # yields the same hi WITHOUT running a job over batch_df —
            # which would drag every batch file through the Python data
            # source just to learn version numbers _range_df re-derives
            # from the manifests anyway (r14 optimization: one driver
            # listing replaces a per-batch distributed scan)
            vs = _versions(self.path)
            hi = vs[-1] if vs else self.last
        else:
            # only the max version is needed — a map-side max, not a
            # distinct shuffle (r14 optimization)
            from pyspark.sql import functions as F
            row = batch_df.agg(F.max(VERSION_COL)).first()
            hi = self.last if row is None or row[0] is None else int(row[0])
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
                  trigger: dict | None = None,
                  include_preimages: bool = False):
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
    ``awaitTermination()`` it.

    Subscription mechanics (r14 optimization): the managed driver
    consumes the commit log's MANIFEST FILES through the engine's
    JVM-native file stream — a new ``v*.json`` is what triggers a
    micro-batch — while the keyed frontier sequences the exact version
    range and ``TxnTable.read_changes`` derives the rows, exactly as
    before. The batch's file CONTENT is never read: with the
    log-chasing frontier the per-batch row frame was already ignored
    (every delivered version is re-derived from the manifests), so
    routing the trigger through the Python streaming DataSource
    (``txn_changes``) only added a per-query Python source-runner
    process and its per-batch offset round-trips — measured 2.0 s of
    the 2.3 s no-op drain at sf0.1, vs 0.27 s through the file stream.
    Delivery semantics are unchanged, including trailing drop-only
    commits (their manifest file IS a new file, so they trigger
    natively — no follow-the-log special case needed at the source).
    The ``txn_changes`` DataSource remains the row-grain streaming
    source for direct subscribers (x102/x107 surface)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    kc = KeyedChanges(
        spark, path, keys, start_version=start_version,
        frontier_path=os.path.join(checkpoint_dir,
                                   "_keyed_cdf_frontier.json"),
        follow_log=True, include_preimages=include_preimages)

    def _fb(batch_df, batch_id):
        sink(kc(batch_df, batch_id), batch_id)

    reader = (spark.readStream.format("text")
              .load(os.path.join(path, _MANIFEST_DIR, "v*.json")))
    return (reader.writeStream
            .foreachBatch(_fb)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start())


def replicate_keyed_cdf(spark, src_path: str, keys: list[str], dst,
                        checkpoint_dir: str, n_buckets: int,
                        version_col: str = VERSION_COL,
                        start_version: int = 0,
                        trigger: dict | None = None,
                        transform=None, where=None):
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
    ``dst`` holds ``transform(source state)`` at all times.

    ``where`` (r14) makes it a FILTERED view: a row-local SQL predicate
    (string or Column) over the SOURCE columns, evaluated on each
    change's postimage — ``dst`` holds
    ``transform(source state WHERE where)`` at all times. The
    delete-on-false-predicate semantics filters need: a postimage
    PASSING the predicate upserts (a key entering the view inserts); a
    postimage FAILING it routes to the version-guarded delete applier
    exactly like a source delete (a key leaving the view is removed; a
    key that never passed is an absent-key no-op). NULL predicate =
    false, SQL WHERE semantics. Seed the replica from the FILTERED
    snapshot (``src.read(version=v0).filter(where)``). The predicate
    sees pre-transform source columns. Aggregations remain a different
    operator (:func:`maintain_aggregate` — retraction logic).

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

    keep = (F.expr(where) if isinstance(where, str) else where) \
        if where is not None else F.lit(True)

    def sink(ch, _bid):
        # r14 optimization (guide §2.4 — remove shuffles/actions
        # outright): the former two-commit apply (upsert the postimages,
        # then a version-guarded merge-delete) read the touched buckets
        # twice, joined twice, wrote twice and probed emptiness three
        # times. The applied STATE is a pure per-key last-wins fold of
        # (current rows ∪ live changes ∪ tombstones) on (version, dead)
        # — so compute exactly that in ONE pass and land it with ONE
        # partition-replace commit (TxnTable.overwrite_partitions):
        # live change at higher version wins (upsert), tombstone at >=
        # version wins then drops (the old merge's s.ver >= t.ver
        # guard: the dead flag ranks ABOVE a live row at equal version),
        # replayed identical rows tie harmlessly. Per batch: one
        # metadata collect + one write job instead of ~7 actions.
        latest = txn._merge_last_wins(ch.limit(0), ch, keys, version_col)
        dst_cols = [c for c in latest.columns if c != "_change_type"]
        in_view = ((F.col("_change_type") != "delete")
                   & F.coalesce(keep, F.lit(False)))
        live = _shaped(latest.filter(in_view).select(*dst_cols)) \
            .withColumn("__dead", F.lit(0))
        dead = _shaped(latest.filter(~in_view).select(*dst_cols)) \
            .withColumn("__dead", F.lit(1))
        changes = txn.add_bucket(live.unionByName(dead), keys,
                                 n_buckets, col=dst.partition_col)
        changes = changes.cache()
        try:
            touched = sorted({str(r[0]) for r in
                              changes.select(dst.partition_col)
                              .distinct().collect()})
            if not touched:
                return
            cur = (dst.read(partitions=touched)
                   .withColumn("__dead", F.lit(0)))
            combined = cur.unionByName(changes.select(*cur.columns))
            payload = [c for c in combined.columns if c not in keys]
            ordered = ([version_col, "__dead"]
                       + [c for c in payload
                          if c not in (version_col, "__dead")])
            best = (combined.groupBy(*keys)
                    .agg(F.max(F.struct(*ordered)).alias("__best")))
            merged = (best.filter(F.col("__best.__dead") == 0)
                      .select(*keys,
                              *[F.col(f"__best.{c}").alias(c)
                                for c in payload if c != "__dead"]))
            dst.overwrite_partitions(merged, touched)
        finally:
            changes.unpersist()

    return run_keyed_cdf(spark, src_path, keys, sink,
                         checkpoint_dir=checkpoint_dir,
                         start_version=start_version, trigger=trigger)


# -- incremental aggregate maintenance (streaming materialized view) -----

_RETRACTABLE = ("sum", "count", "avg")


def _agg_specs(aggs: dict) -> dict:
    """Validate/normalize {name: (fn, expr_sql)} — fn in sum/count/avg,
    expr_sql a ROW-LOCAL SQL expression over the source columns ('*'
    only for count). max/min (and any order-statistic) are refused:
    they are not retractable — deleting the current max needs the full
    per-group value multiset to find the runner-up, which is a
    different operator (keep the rows; replicate_keyed_cdf + a
    re-aggregating reader covers it)."""
    out = {}
    for name, (fn, expr) in aggs.items():
        if fn not in _RETRACTABLE:
            raise ValueError(
                f"aggregate {name!r}: {fn!r} is not retractable — a "
                f"delete would need the full per-group state to "
                f"recompute it; only {_RETRACTABLE} maintain "
                f"incrementally (for max/min keep a row replica via "
                f"replicate_keyed_cdf and aggregate at read time)")
        if expr == "*" and fn != "count":
            raise ValueError(f"aggregate {name!r}: '*' only with count")
        out[name] = (fn, expr)
    return out


def _phys_cols(aggs: dict) -> list[str]:
    """Physical state columns backing the spec: count(*) reads the
    always-maintained _group_rows; everything else keeps (running sum,
    non-null count) so SQL null semantics (SUM/AVG of an all-null
    group are NULL) reconstruct at read time."""
    cols: list[str] = []
    for name, (fn, expr) in aggs.items():
        if fn == "count" and expr == "*":
            continue
        if fn in ("sum", "avg"):
            cols.append(f"{name}__sum")
        cols.append(f"{name}__cnt")
    return cols


def seed_aggregate(spark, src, group_cols: list[str], aggs: dict,
                   dst_root: str, n_buckets: int, version: int = 0,
                   version_col: str = VERSION_COL):
    """Bootstrap the aggregate table from a source snapshot: one
    group-grain aggregation of ``src`` (a DataFrame — typically
    ``src_table.read(version=v)``), bucketed on the group columns,
    created as a TxnTable whose meta records the applied-version
    watermark ``version`` — :func:`maintain_aggregate` picks up from
    there. Running sums are stored 0-valued (not NULL) for all-null
    groups so delta addition stays total; :func:`read_aggregate`
    restores SQL null semantics."""
    from pyspark.sql import functions as F

    from openapc_olap_spark.sources import txn

    specs = _agg_specs(aggs)
    exprs = []
    done = set()
    for name, (fn, expr) in specs.items():
        if fn == "count" and expr == "*":
            continue
        e = F.expr(expr)
        if fn in ("sum", "avg"):
            exprs.append(F.sum(e).alias(f"{name}__sum"))
        exprs.append(F.count(e).alias(f"{name}__cnt"))
        done.add(name)
    agged = src.groupBy(*group_cols).agg(
        *exprs, F.count(F.lit(1)).alias("_group_rows"))
    types = dict(agged.dtypes)
    proj = list(group_cols)
    for c in _phys_cols(specs):
        col = F.col(c)
        if c.endswith("__sum"):
            col = F.coalesce(col, F.lit(0).cast(types[c]))
        proj.append(col.alias(c))
    phys = agged.select(*proj, "_group_rows").withColumn(
        version_col, F.lit(int(version)).cast("long"))
    return txn.TxnTable.create(
        spark, dst_root, txn.add_bucket(phys, group_cols, n_buckets),
        "bucket", meta={"n_buckets": int(n_buckets),
                        "agg_watermark": int(version)})


def maintain_aggregate(spark, src_path: str, keys: list[str],
                       group_cols: list[str], aggs: dict, dst,
                       checkpoint_dir: str, n_buckets: int,
                       start_version: int = 0,
                       version_col: str = VERSION_COL,
                       trigger: dict | None = None, where=None):
    """Maintain ``dst`` (seeded by :func:`seed_aggregate`) as an
    incrementally updated GROUP AGGREGATE of the source table —
    streaming materialized-view maintenance with retractions, the
    capability ``replicate_keyed_cdf`` documents out of scope:

        dst  ==  transform-to-state(SELECT group_cols, sum/count/avg...
                 FROM source GROUP BY group_cols)   at all times.

    Per micro-batch of keyed changes (consumed WITH update preimages):
    every change row contributes with sign +1 (insert /
    update_postimage) or -1 (delete / update_preimage), so one
    group-grain aggregation yields exact deltas for each affected
    group — including groups a row LEFT because its grouping column
    changed (the preimage retracts from the old group, the postimage
    adds to the new). The deltas join the current group rows (one
    bucket-pruned read) and land as ONE ``dst.merge`` commit: updated
    groups rewrite, groups whose row count reaches zero DELETE, new
    groups insert — with the applied-version watermark published
    atomically in the same commit's meta (``agg_watermark``).

    Exactly-once: a replayed batch re-emits the recorded version range
    (:func:`run_keyed_cdf`), the sink filters changes at or below the
    committed watermark, and watermark+data move in one commit — a
    crash before the merge re-applies the whole batch, a crash after
    filters it to nothing. Unlike the replica appliers, delta
    application is NOT naturally idempotent, which is exactly why the
    watermark rides the commit.

    Exactness: deltas are algebraic, so integer/decimal aggregates
    maintain exactly; double running sums carry the usual cancellation
    residue under retraction (cast to decimal in the spec expression
    when exact money semantics matter — e.g.
    ``("sum", "CAST(x AS DECIMAL(18,2))")``). A group retracted to
    zero non-null contributions snaps its running sum back to exact 0.

    ``where`` (r14) maintains the aggregate of the FILTERED source —
    ``GROUP BY ... FROM source WHERE where`` — by filtering each change
    IMAGE independently before the signed aggregation: a preimage that
    passed retracts, a postimage that passes adds, so a row updated
    across the predicate boundary nets exactly an arrival or departure
    — the same ± algebra, no extra machinery. NULL = false (SQL WHERE).
    Seed from the filtered snapshot
    (``seed_aggregate(spark, src.read(v0).filter(where), ...)``).

    Scale shape: per batch — one commit-scoped CDF diff, one
    group-grain shuffle (the delta aggregation, map-side combined),
    one join against ONLY the touched buckets of a groups-sized table,
    two tiny metadata collects (touched buckets + high version), one
    partition-scoped merge commit. Cost follows the commits and the
    touched groups; neither the source nor the aggregate table is ever
    rescanned."""
    from pyspark.sql import functions as F

    from openapc_olap_spark.sources import txn

    specs = _agg_specs(aggs)
    phys = _phys_cols(specs)
    state_cols = [*group_cols, *phys, "_group_rows", version_col]
    have = set(dst.read().columns)
    missing = [c for c in state_cols if c not in have]
    if missing:
        raise ValueError(
            f"aggregate table at {dst.path} lacks state columns "
            f"{missing}; seed it with seed_aggregate over the same "
            f"spec")

    keep = (F.expr(where) if isinstance(where, str) else where) \
        if where is not None else None

    def sink(ch, _bid):
        wm = int(dst.snapshot().get("meta", {}).get("agg_watermark",
                                                    start_version))
        ch = ch.filter(F.col(VERSION_COL) > wm)
        if keep is not None:
            # filter each image independently: passing preimages
            # retract, passing postimages add — the signed algebra
            # turns a predicate-boundary crossing into an exact
            # arrival/departure
            ch = ch.filter(F.coalesce(keep, F.lit(False)))
        sign = F.when(F.col("_change_type").isin("insert",
                                                 "update_postimage"),
                      F.lit(1)).otherwise(F.lit(-1))
        dexprs = [F.sum(sign).alias("_d_rows"),
                  F.max(F.col(VERSION_COL)).alias("_d_ver")]
        for name, (fn, expr) in specs.items():
            if fn == "count" and expr == "*":
                continue
            e = F.expr(expr)
            if fn in ("sum", "avg"):
                dexprs.append(F.sum(F.when(e.isNotNull(), e * sign))
                              .alias(f"_d_{name}__sum"))
            dexprs.append(F.sum(F.when(e.isNotNull(), sign))
                          .alias(f"_d_{name}__cnt"))
        deltas = txn.add_bucket(
            ch.groupBy(*group_cols).agg(*dexprs),
            group_cols, n_buckets, col=dst.partition_col)
        deltas = deltas.cache()
        try:
            head = (deltas.groupBy()
                    .agg(F.collect_set(dst.partition_col).alias("bk"),
                         F.max("_d_ver").alias("hi")).first())
            if head is None or not head["bk"]:
                return
            # r14 optimization (guide §2.4): the former delta apply
            # joined deltas LEFT against the touched buckets, then
            # handed the result to dst.merge — which read the SAME
            # buckets again and full-outer-joined them a second time.
            # One FULL OUTER join computes the complete new content of
            # the touched buckets directly (delta-only groups insert,
            # both-sides groups merge — dropping to nothing at zero
            # rows — old-only groups carry over unchanged), landed as
            # ONE partition-replace commit with the watermark in its
            # meta: one read + one join + one write instead of two of
            # each plus a distinct-collect.
            touched = sorted(head["bk"])
            old = dst.read(partitions=touched)
            types = dict(old.dtypes)
            on = [F.col(f"d.{k}").eqNullSafe(F.col(f"o.{k}"))
                  for k in group_cols]
            dm = deltas.withColumn("__d", F.lit(1)).alias("d")
            om = old.withColumn("__o", F.lit(1)).alias("o")
            j = dm.join(om, on, "full_outer")
            d_here = F.col("d.__d").isNotNull()
            new_rows = (F.coalesce(F.col("o._group_rows"), F.lit(0))
                        + F.coalesce(F.col("d._d_rows"), F.lit(0)))
            proj = [F.when(d_here, F.col(f"d.{k}"))
                    .otherwise(F.col(f"o.{k}")).alias(k)
                    for k in group_cols]
            cnt_of = {}
            for c in phys:
                if c.endswith("__cnt"):
                    cnt_of[c[:-5]] = (
                        F.coalesce(F.col(f"o.{c}"), F.lit(0))
                        + F.coalesce(F.col(f"d._d_{c}"), F.lit(0)))
            for c in phys:
                if c.endswith("__sum"):
                    zero = F.lit(0).cast(types[c])
                    run = (F.coalesce(F.col(f"o.{c}"), zero)
                           + F.coalesce(F.col(f"d._d_{c}"), zero))
                    # all contributions retracted -> snap to exact 0
                    # (kills double-cancellation residue at the empty
                    # state; see docstring)
                    col = F.when(cnt_of[c[:-5]] > 0,
                                 run).otherwise(zero).cast(types[c])
                else:
                    col = cnt_of[c[:-5]].cast(types[c])
                proj.append(col.alias(c))
            proj.append(new_rows.cast(types["_group_rows"])
                        .alias("_group_rows"))
            proj.append(F.greatest(
                F.coalesce(F.col(f"o.{version_col}"), F.lit(0)),
                F.coalesce(F.col("d._d_ver"), F.lit(0)))
                .cast("long").alias(version_col))
            proj.append(F.when(d_here, F.col(f"d.{dst.partition_col}"))
                        .otherwise(F.col(f"o.{dst.partition_col}"))
                        .alias(dst.partition_col))
            new_state = (j.select(*proj)
                         .filter(F.col("_group_rows") > 0))
            dst.overwrite_partitions(
                new_state, touched,
                meta_update={"agg_watermark": int(head["hi"])})
        finally:
            deltas.unpersist()

    return run_keyed_cdf(spark, src_path, keys, sink,
                         checkpoint_dir=checkpoint_dir,
                         start_version=start_version, trigger=trigger,
                         include_preimages=True)


def read_aggregate(dst, group_cols: list[str], aggs: dict,
                   version_col: str = VERSION_COL):
    """The SQL-semantics view of a maintained aggregate table: one row
    per live group with each spec name as a column — SUM/AVG of a group
    whose non-null contributions all retracted read NULL (matching a
    from-scratch GROUP BY), COUNT reads 0, count(*) reads the
    maintained row count — plus ``version_col``, the last source
    version that touched the group (the per-group freshness
    watermark). Row-local projection over the groups-sized state; no
    shuffle."""
    from pyspark.sql import functions as F

    specs = _agg_specs(aggs)
    proj = [F.col(c) for c in group_cols]
    for name, (fn, expr) in specs.items():
        if fn == "count" and expr == "*":
            proj.append(F.col("_group_rows").alias(name))
        elif fn == "count":
            proj.append(F.col(f"{name}__cnt").alias(name))
        elif fn == "sum":
            proj.append(F.when(F.col(f"{name}__cnt") > 0,
                               F.col(f"{name}__sum")).alias(name))
        else:                                   # avg
            proj.append(F.when(
                F.col(f"{name}__cnt") > 0,
                F.col(f"{name}__sum").cast("double")
                / F.col(f"{name}__cnt")).alias(name))
    proj.append(F.col(version_col))
    return dst.read().select(*proj)


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
