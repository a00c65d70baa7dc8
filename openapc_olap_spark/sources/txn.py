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

Maintenance lifecycle (round 11): :meth:`TxnTable.append` is the
O(batch) insert-only path (no bucket read-back — one small file per
touched partition per commit); :meth:`TxnTable.compact` folds a fat
partition's files back to one under the same snapshot semantics;
:meth:`TxnTable.checkpoint` retires old manifest versions; and
:meth:`TxnTable.vacuum` (grace-windowed so it cannot race an
in-flight writer's already-landed files) reclaims unreferenced data
files. Together they bound both read amplification (files/bucket)
and metadata growth (manifests) for a commit-every-hour workload.

DML + incremental-read surface (round 11, second half):

- :meth:`TxnTable.delete` — predicate delete as copy-on-write: only
  the partitions holding matching rows rewrite (survivors kept,
  SQL DELETE null semantics — a NULL predicate row survives); every
  other file re-links untouched.
- **Per-file column stats / data skipping** — every manifest entry
  carries ``rows`` plus min/max/null-count per primitive column,
  harvested from the parquet FOOTER the file already has (no extra
  scan job). :meth:`TxnTable.read` accepts ``between={col: (lo,
  hi)}``: files whose [min, max] cannot intersect the bound are never
  opened, and the residual row filter is applied to the survivors —
  zone-map pruning on top of partition pruning, so a time-range query
  over a bucket-partitioned table still reads only the files that can
  match.
- :meth:`TxnTable.read_changes` — change-data-feed between two
  retained versions. With ``keys`` it emits exact row-level changes
  (``_change_type`` in insert / update_postimage / delete) computed
  only over the partitions whose file set changed; without keys it
  returns the rows of newly-added files (exact for append-only
  commits). This is what lets a downstream incremental pipeline
  consume a table without re-scanning it.

The upsert contract requires the partition value to be a FUNCTION OF
THE KEY (else a key's superseded row could hide in an untouched
partition): use :func:`add_bucket` (pmod(xxhash64(keys), n)) unless the
natural partition column already is one.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"
_STAGING_DIR = "_staging"
# advisory latest-version pointer inside _manifest/ (see snapshot())
_HINT = "_latest.hint"
_CKPT = "_checkpoint.json"
# compacted-snapshot cadence: _publish refreshes _checkpoint.json every
# this-many commits (meta key "ckpt_every" overrides per table) — the
# lakehouse _last_checkpoint convention, sized so latest-version
# resolution without a hint probes at most this many versions forward
CHECKPOINT_EVERY = 64
# partitionBy column (a copy of the partition value — Spark drops the
# partitionBy column from the data files, the original stays inside)
_PV = "__pv"


class CommitConflict(Exception):
    """Another writer published the version this commit targeted."""


def _stat_key(v):
    """Normalize a stat / bound value into a JSON-storable form that
    compares consistently on both sides of the skip test: datetimes and
    dates become space-separated ISO strings (lexically order-preserving,
    prefix-comparable against second-precision bounds), numbers and
    strings pass through, anything else is None (=> no stats kept, file
    never skipped on that column)."""
    import datetime

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def _file_stats(path: str) -> dict:
    """Harvest {rows, stats: {col: {min, max, nulls}}} from the parquet
    FOOTER (row-group statistics the writer already emitted) — a
    metadata read, no data scan. Columns whose stats are absent or
    non-primitive are simply omitted (readers treat missing stats as
    'cannot skip'). parquet-mr/arrow truncate long binary min/max
    CONSERVATIVELY (max is rounded up), so footer bounds stay safe for
    skipping."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    return _stats_from_metadata(md)


def _stats_from_metadata(md) -> dict:
    agg: dict[str, dict] = {}
    bad: set[str] = set()    # any row group without min/max poisons the col
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:   # nested leaf / poisoned
                continue
            st = col.statistics
            lo = _stat_key(st.min) if st is not None and st.has_min_max \
                else None
            hi = _stat_key(st.max) if st is not None and st.has_min_max \
                else None
            if lo is None or hi is None:
                bad.add(name)
                agg.pop(name, None)
                continue
            nulls = st.null_count if st.has_null_count else None
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"min": lo, "max": hi, "nulls": nulls}
            else:
                cur["min"] = min(cur["min"], lo)
                cur["max"] = max(cur["max"], hi)
                if nulls is None or cur["nulls"] is None:
                    cur["nulls"] = None
                else:
                    cur["nulls"] += nulls
    return {"rows": md.num_rows, "stats": agg}


# Commits landing at most this many files harvest footer stats in a
# driver loop (no job-launch overhead); wider commits (bulk loads, 1000-
# file compacts) distribute the footer reads as a Spark job so commit
# wall stays flat in the file count (VERDICT r11 "What's wrong" #4).
# The default is sized for OBJECT STORAGE, where a footer is a 10-50 ms
# ranged GET and 256 serial reads are already seconds of driver wall;
# on local NVMe a footer read is ~0.5 ms and the job's ~0.3-0.5 s
# scheduling overhead never pays (measured, SCALING.md r12) — the r12
# bench initially shipped threshold 32 and every multi-list vector-
# index commit ate a job launch (x95 5.8->12.7 s). Tune with
# SPARK_GRAFT_STATS_JOB_THRESHOLD per deployment.
_DRIVER_STATS_MAX = int(os.environ.get(
    "SPARK_GRAFT_STATS_JOB_THRESHOLD", "256"))


def _harvest_stats(spark: SparkSession, paths: list[str]) -> list[dict]:
    """{rows, stats} per path, order-aligned with ``paths``. Small
    batches read footers serially on the driver; large ones fan the
    metadata reads out as a Spark job (every executor sees the same
    filesystem — local disk here, HDFS/S3 on a cluster), so a
    1000-file compact() costs one short task wave, not a serial
    driver loop. Footer reads only — no data scan either way."""
    if len(paths) <= _DRIVER_STATS_MAX:
        return [_file_stats(p) for p in paths]
    sc = spark.sparkContext
    n_slices = min(len(paths), sc.defaultParallelism or 8)
    pairs = (sc.parallelize(list(enumerate(paths)), n_slices)
             .map(lambda ip: (ip[0], _file_stats(ip[1]))).collect())
    return [s for _, s in sorted(pairs)]


def _file_can_match(entry: dict, between: dict) -> bool:
    """Zone-map test: False only when the entry's footer stats PROVE no
    row can satisfy every (col, (lo, hi)) bound. Missing stats, type
    mismatches, or open ends keep the file (conservative)."""
    stats = entry.get("stats") or {}
    for col, (lo, hi) in between.items():
        st = stats.get(col)
        if st is None:
            continue
        lo_k, hi_k = _stat_key(lo), _stat_key(hi)
        for bound, fmin_fmax, side in ((lo_k, st["max"], "lo"),
                                       (hi_k, st["min"], "hi")):
            if bound is None:
                continue
            both_num = (isinstance(bound, (int, float))
                        and isinstance(fmin_fmax, (int, float)))
            both_str = (isinstance(bound, str)
                        and isinstance(fmin_fmax, str))
            if not (both_num or both_str):
                continue
            if side == "lo" and fmin_fmax < bound:
                return False            # file max < lower bound
            if side == "hi" and fmin_fmax > bound:
                return False            # file min > upper bound
    return True


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
                     keys: list[str], seq_col: str,
                     allow_schema_merge: bool = False) -> DataFrame:
    """union -> groupBy(keys) -> max(struct(seq, payload...)) — the
    engine's T15 merge shape (etl/coverage.upsert_last_wins), local so
    the storage layer does not import the ETL layer.
    ``allow_schema_merge`` widens the union by name: columns present
    on only one side become NULL on the other (schema EVOLUTION —
    add/drop columns; type changes are not supported)."""
    combined = existing.unionByName(
        updates, allowMissingColumns=allow_schema_merge)
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

    def snapshot(self, version: int | None = None) -> dict:
        """A committed manifest: {"version", "schema",
        "files": [{"path", "partition"}...]}. Default is the highest
        committed version; pass ``version`` for time travel to any
        still-retained snapshot (checkpoint() retires old ones).

        Latest-version resolution is O(commits since the last hint),
        not O(all versions): every publish best-effort overwrites an
        ADVISORY ``_latest.hint``, and the reader probes FORWARD from
        it (version numbers are gap-free, so the first missing
        manifest bounds the search). The hint is never trusted blindly
        — a missing/stale/corrupt hint falls back to the full listing
        — so correctness never depends on the non-atomic hint write,
        but a million-commit table on object storage resolves its
        snapshot with a handful of existence probes instead of a
        directory listing."""
        if version is not None:
            p = self._version_path(version)
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"version {version} not found under {self._mdir()} "
                    f"(never committed, or retired by checkpoint())")
            with open(p) as fh:
                return json.load(fh)
        v = self._hinted_latest()
        if v is None:
            # durable fallback BEFORE the O(versions) listing: the
            # compacted snapshot file (VERDICT r12 #5) is written
            # atomically every ckpt_every commits, so even a table with
            # 10^5 retained manifests and no usable hint resolves its
            # latest version with one read + a bounded forward probe
            v = self._ckpt_latest()
        if v is None:
            versions = [int(f[1:9]) for f in os.listdir(self._mdir())
                        if f.startswith("v") and f.endswith(".json")]
            if not versions:
                raise FileNotFoundError(
                    f"no committed manifest under {self._mdir()}")
            v = max(versions)
            self._write_hint(v)     # repair for the next reader
        with open(self._version_path(v)) as fh:
            return json.load(fh)

    def _hint_path(self) -> str:
        return os.path.join(self._mdir(), _HINT)

    def _hinted_latest(self) -> int | None:
        """The highest committed version reachable by probing forward
        from the advisory hint; None when the hint is absent, unreadable,
        or points at a retired manifest (fallback: full listing)."""
        try:
            with open(self._hint_path()) as fh:
                v = int(fh.read().strip())
        except (OSError, ValueError):
            return None
        if not os.path.exists(self._version_path(v)):
            return None             # hint predates a checkpoint()
        while os.path.exists(self._version_path(v + 1)):
            v += 1
        return v

    def _write_hint(self, v: int) -> None:
        """Best-effort advisory write (plain overwrite — two racing
        writers can interleave, and a crash can skip it entirely; the
        forward probe / listing fallback absorbs both)."""
        try:
            tmp = self._hint_path() + f".{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                fh.write(str(v))
            os.replace(tmp, self._hint_path())
        except OSError:
            pass

    def version(self) -> int:
        return self.snapshot()["version"]

    # -- compacted snapshot (manifest-of-manifests) ----------------------

    def _ckpt_path(self) -> str:
        return os.path.join(self._mdir(), _CKPT)

    def _read_ckpt(self) -> dict | None:
        """The compacted snapshot file, or None when absent/corrupt —
        never load-bearing: every consumer falls back to the manifest
        listing."""
        try:
            with open(self._ckpt_path()) as fh:
                ck = json.load(fh)
            ck["version"] = int(ck["version"])
            if not isinstance(ck["referenced"], list):
                raise TypeError
            return ck
        except (OSError, ValueError, KeyError, TypeError):
            return None

    def _ckpt_latest(self) -> int | None:
        """Highest committed version reachable from the compacted
        snapshot: its recorded version + the gap-free forward probe
        (bounded by commits since the last checkpoint refresh, i.e.
        ckpt_every). None when the file is absent, corrupt, or points
        at a retention-retired manifest."""
        ck = self._read_ckpt()
        if ck is None:
            return None
        v = ck["version"]
        if not os.path.exists(self._version_path(v)):
            return None
        while os.path.exists(self._version_path(v + 1)):
            v += 1
        self._write_hint(v)         # repair the advisory hint too
        return v

    def write_checkpoint(self, full: bool = False) -> dict:
        """Refresh the compacted snapshot (the lakehouse
        ``_last_checkpoint`` convention, VERDICT r12 #5): one atomically
        replaced JSON recording the latest committed version and the
        UNION of data paths referenced by every retained manifest, so

        - ``snapshot()`` resolves the latest version in O(1) reads plus
          a <= ckpt_every forward probe — no directory listing, even
          hint-less on a 10^5-commit table;
        - ``vacuum()`` reads only manifests NEWER than the checkpoint
          instead of every retained version file.

        The cadence refresh is INCREMENTAL (VERDICT r13 #3): start from
        the previous checkpoint's referenced set and read only manifests
        NEWER than its version — O(ckpt_every) manifest reads per
        refresh instead of O(retained), which on object storage turns a
        long-retention store's refresh from one GET per retained version
        into one GET per commit since the last refresh. Safety is the
        same monotonicity argument as a stale checkpoint: the previous
        set covers every manifest <= its version (possibly as a
        superset after retention), so the merged set covers every
        current manifest. ``full=True`` rebuilds the TIGHT set from
        every retained manifest — checkpoint() uses it after retention
        so retired manifests' exclusive references become vacuum-able
        instead of riding the superset forever; the incremental path
        also falls back to a full rebuild when the previous checkpoint
        is absent, corrupt, or points at a retired manifest.

        Concurrent refreshes last-win a complete file (os.replace); a
        stale checkpoint is always SAFE — its referenced set is a
        superset for any later vacuum (orphans linger until the next
        refresh, nothing live is ever deleted), and its version only
        lengthens the forward probe. _publish refreshes it every
        ``ckpt_every`` commits (meta override; default
        ``CHECKPOINT_EVERY``) and checkpoint() re-tightens it after
        retention."""
        names = sorted(f for f in os.listdir(self._mdir())
                       if f.startswith("v") and f.endswith(".json"))
        if not names:
            raise FileNotFoundError(
                f"no committed manifest under {self._mdir()}")
        referenced: set[str] = set()
        base_v = -1
        if not full:
            prev = self._read_ckpt()
            if (prev is not None
                    and os.path.exists(self._version_path(prev["version"]))):
                referenced.update(prev["referenced"])
                base_v = prev["version"]
        for f in names:
            if int(f[1:9]) <= base_v:
                continue
            with open(os.path.join(self._mdir(), f)) as fh:
                referenced.update(e["path"]
                                  for e in json.load(fh)["files"])
        ck = {"version": int(names[-1][1:9]),
              "referenced": sorted(referenced)}
        tmp = self._ckpt_path() + f".{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(ck, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._ckpt_path())
        return ck

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

    def read(self, partitions: list | None = None,
             version: int | None = None,
             between: dict | None = None) -> DataFrame:
        """A snapshot as a DataFrame (default: current; ``version``
        time-travels to a retained older one). ``partitions`` prunes at
        the MANIFEST (file-list) level — no directory listing, only the
        named files are opened.

        ``between={col: (lo, hi)}`` is zone-map data skipping: files
        whose footer min/max (carried in the manifest) prove no row can
        satisfy every bound are never opened, and the residual
        ``col >= lo AND col <= hi`` filters (open ends allowed via
        None) apply to the survivors — the result is EXACTLY the
        bounded rows, with IO proportional to the files that can match
        rather than the snapshot. Timestamp bounds: pass datetimes or
        'YYYY-MM-DD HH:MM:SS' strings (stats normalize to
        space-separated ISO, so lexical compare is order-true)."""
        snap = self.snapshot(version)
        files = snap["files"]
        residual = None
        if partitions is not None:
            want = {str(p) for p in partitions}
            files = [f for f in files if f["partition"] in want]
            rb = self._rebucket_info(snap)
            if rb:
                # ADVICE r12: mid-rebucket, a value-pruned read must open
                # every un-migrated file (a key's old bucket differs from
                # its new one) — but those files hold whole OLD-spec
                # buckets, so without a row-level residual the caller
                # would receive phantom rows from buckets it did not
                # request, carrying stale old-spec partition values. The
                # manifest carries rb["keys"]/rb["to"]: recompute the
                # NEW-spec bucket per row, keep only requested buckets,
                # and stamp the partition column with the new-spec value
                # so the result is bit-identical before/after migration.
                files += self._unmigrated(snap, want)
                bucket = F.pmod(
                    F.xxhash64(*[F.col(k) for k in rb["keys"]]),
                    F.lit(int(rb["to"])))
                residual = (bucket, [int(p) for p in want])
        if between:
            files = [f for f in files if _file_can_match(f, between)]
        df = self._read_entries(snap, files)
        if residual is not None:
            bucket, want_ints = residual
            df = (df.filter(bucket.isin(want_ints))
                    .withColumn(self.partition_col, bucket))
        if between:
            for col, (lo, hi) in between.items():
                if lo is not None:
                    df = df.filter(F.col(col) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def _read_entries(self, snap: dict, files: list[dict]) -> DataFrame:
        """The named manifest entries as a DataFrame under the
        snapshot's explicit schema (missing columns in older files read
        as NULL — the schema-evolution read path)."""
        schema = StructType.fromJson(json.loads(snap["schema"]))
        seen, uniq = set(), []
        for f in files:
            if f["path"] not in seen:
                seen.add(f["path"])
                uniq.append(f)
        if not uniq:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f["path"]) for f in uniq])

    def _unmigrated(self, snap: dict, want: set) -> list[dict]:
        """During a rebucket transition, files still under the OLD
        bucketing spec cannot be pruned by new-spec partition values
        (a key's old bucket differs from its new one), so value-pruned
        reads open every un-migrated file; read() then applies the
        row-level new-spec residual so the RESULT stays exact (ADVICE
        r12). Outside a transition this is empty — file pruning alone
        is exact."""
        rb = (snap.get("meta") or {}).get("rebucket")
        if not rb:
            return []
        return [f for f in snap["files"]
                if f.get("nb") != rb["to"] and f["partition"] not in want]

    def _rebucket_info(self, snap: dict) -> dict | None:
        """{"from", "to", "keys"} while a rebucket transition is in
        progress, else None."""
        return (snap.get("meta") or {}).get("rebucket")

    def _no_transition(self, snap: dict, op: str) -> None:
        """Operations whose partition-value arithmetic is ambiguous
        across two live bucketing specs refuse mid-transition —
        read(), upsert() and rebucket() itself are the supported
        surface until the migration completes."""
        if self._rebucket_info(snap):
            raise ValueError(
                f"{op} is not supported while a rebucket transition is "
                f"in progress; drive the migration to completion with "
                f"rebucket() (read and upsert stay available)")

    def pruned_file_count(self, between: dict,
                          version: int | None = None) -> tuple[int, int]:
        """(files that survive ``between`` skipping, total files) for
        the snapshot — the observability hook plan tests and capacity
        math use."""
        snap = self.snapshot(version)
        keep = [f for f in snap["files"] if _file_can_match(f, between)]
        return len(keep), len(snap["files"])

    # -- writes ------------------------------------------------------------

    def _write_data(self, df: DataFrame, order_by: list | None = None,
                    max_rows_per_file: int | None = None,
                    nb: int | None = None) -> list[dict]:
        """Land ``df``'s rows as immutable files under data/, one
        partition value per file, via a staging dir + rename. Returns
        manifest entries; nothing is visible until _publish.

        ``order_by`` (Column expressions) sorts rows WITHIN each
        partition before the write and ``max_rows_per_file`` splits a
        partition's sorted stream into consecutive bounded files — so
        each file covers a contiguous slice of the sort order and its
        footer min/max (hence the manifest zone maps) are TIGHT on the
        ordering columns. This is the layout half of data skipping;
        see compact()/zorder_compact."""
        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, _STAGING_DIR, txn)
        out = (df.withColumn(_PV, F.col(self.partition_col)
                             .cast("string"))
               .repartition(_PV))
        if order_by:
            out = out.sortWithinPartitions(F.col(_PV), *order_by)
        w = out.write.partitionBy(_PV).mode("overwrite")
        if max_rows_per_file:
            w = w.option("maxRecordsPerFile", int(max_rows_per_file))
        w.parquet(staging)
        entries: list[dict] = []
        dests: list[str] = []
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
                dest = os.path.join(self.path, _DATA_DIR, name)
                os.rename(os.path.join(staging, d, f), dest)
                dests.append(dest)
                e = {"path": f"{_DATA_DIR}/{name}", "partition": pv}
                if nb is not None:
                    # bucketing-spec tag: during a rebucket transition,
                    # files written under the NEW spec are marked so
                    # value-pruned reads can tell them from un-migrated
                    # old-spec files (see rebucket / _unmigrated)
                    e["nb"] = nb
                entries.append(e)
        shutil.rmtree(staging, ignore_errors=True)
        # zone-map stats from the footers the files already carry — a
        # metadata read, no data scan; batched so a wide commit
        # distributes the footer reads instead of serializing them
        # through the driver (VERDICT r11 #4)
        for e, st in zip(entries, _harvest_stats(self.spark, dests)):
            e.update(st)
        return entries

    def _publish(self, version: int, files: list[dict],
                 schema, meta: dict | None = None) -> None:
        """Atomically publish ``version``: the payload is written and
        fsynced to a hidden temp file first, then linked into place —
        the version file either does not exist or is complete, so a
        crash mid-write can never leave a partial highest manifest that
        poisons every later snapshot(). os.link is
        create-WITH-CONTENT-or-EEXIST; EEXIST means another writer won
        the version slot (CommitConflict)."""
        payload = json.dumps({
            "version": version,
            "schema": json.dumps(schema.jsonValue()),
            "meta": meta or {},
            "files": files,
        }, indent=1)
        tmp = os.path.join(self._mdir(), f".tmp-{uuid.uuid4().hex[:12]}")
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._version_path(version))
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed") from e
        finally:
            os.unlink(tmp)
        self._write_hint(version)
        every = int((meta or {}).get("ckpt_every", CHECKPOINT_EVERY))
        if every > 0 and version > 0 and version % every == 0:
            try:
                self.write_checkpoint()   # best-effort, never fails a commit
            except OSError:
                pass

    def overwrite(self, df: DataFrame) -> int:
        """Full-snapshot replace (the bulk-load path); returns the new
        version."""
        snap = self.snapshot()
        self._no_transition(snap, "overwrite")
        files = self._write_data(df)
        v = snap["version"] + 1
        self._publish(v, files, df.schema, snap.get("meta"))
        return v

    def append(self, rows: DataFrame, max_retries: int = 5) -> int:
        """Blind row-append: land ``rows``'s files and publish a
        manifest referencing ALL existing files plus the new ones —
        cost is O(batch), no partition read-back or rewrite. The
        insert-only fast path for workloads whose keys are known-new
        (or whose readers dedup anyway, e.g. a fingerprint set probed
        via semi-join): each commit adds one small file per touched
        partition, and :meth:`compact` periodically folds a fat
        partition back to one file. Use :meth:`upsert` when per-key
        last-wins semantics must hold at READ time."""
        if self.partition_col not in rows.columns:
            raise ValueError(
                f"rows must carry the partition column "
                f"{self.partition_col!r} (add_bucket derives it)")
        last: Exception | None = None
        self._no_transition(self.snapshot(), "append")
        new_files = self._write_data(rows)
        for _ in range(max_retries):
            snap = self.snapshot()
            # ADVICE r12: a rebucket may start between the pre-write
            # check and this commit attempt; committing would publish
            # untagged files into a mid-transition manifest, where
            # _upsert_mid_rebucket matches them against OLD-spec buckets
            # and a stale copy of an upserted key could survive. Fail
            # the append instead (the landed files become vacuum-able
            # orphans, same as a lost commit race).
            self._no_transition(snap, "append")
            try:
                v = snap["version"] + 1
                self._publish(v, snap["files"] + new_files, rows.schema,
                              snap.get("meta"))
                return v
            except CommitConflict as e:
                # append commutes with any concurrent commit: just
                # re-read the winner's file list and retry the publish —
                # our data files are already landed and stay valid
                last = e
        raise CommitConflict(
            f"append lost {max_retries} commit races") from last

    def upsert(self, updates: DataFrame, keys: list[str],
               seq_col: str, max_retries: int = 5,
               allow_schema_merge: bool = False) -> int:
        """Partition-overwrite-by-filter upsert: merge ``updates`` into
        the table with per-key last-wins on ``seq_col``, rewriting ONLY
        the partitions the batch touches. Requires the partition value
        to be a function of the keys (see module docstring /
        :func:`add_bucket`). Optimistic: on a concurrent commit, the
        whole merge re-runs against the fresh snapshot. Returns the new
        version.

        ``allow_schema_merge=True`` permits the batch to ADD (or omit)
        payload columns: the published manifest schema widens to the
        union, touched partitions rewrite with the new schema, and
        re-linked untouched files read missing columns as NULL (the
        explicit-schema parquet read fills them) — schema evolution
        without a table rewrite. Type changes are not supported.

        During a :meth:`rebucket` transition, upsert stays fully
        available: the batch re-buckets under the NEW spec, and the
        touched set widens to the batch keys' OLD buckets too, so a
        stale copy can never hide in an un-migrated file — and the
        touched old buckets migrate as a side effect (their survivors
        rewrite under the new spec)."""
        if self.partition_col not in updates.columns:
            raise ValueError(
                f"updates must carry the partition column "
                f"{self.partition_col!r} (add_bucket derives it)")
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            rb = self._rebucket_info(snap)
            if rb:
                try:
                    return self._upsert_mid_rebucket(
                        snap, rb, updates, keys, seq_col,
                        allow_schema_merge)
                except CommitConflict as e:
                    last = e
                    continue
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
            merged = _merge_last_wins(current, updates, keys, seq_col,
                                      allow_schema_merge)
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

    def _upsert_mid_rebucket(self, snap: dict, rb: dict,
                             updates: DataFrame, keys: list[str],
                             seq_col: str,
                             allow_schema_merge: bool) -> int:
        """One optimistic upsert attempt while a rebucket transition is
        live. The batch's partition column is RE-DERIVED under the new
        spec (the caller's bucketing may predate the transition); the
        touched file set is (new-spec files in the batch's new buckets)
        + (un-migrated files in the batch keys' old buckets), so the
        per-key single-copy invariant holds across specs; everything
        read rewrites under the new spec — each upsert migrates the old
        buckets it touches as a side effect."""
        bkeys = [F.col(k) for k in rb["keys"]]
        n_old, n_new = int(rb["from"]), int(rb["to"])
        ups = updates.withColumn(
            self.partition_col, F.pmod(F.xxhash64(*bkeys), F.lit(n_new)))
        pairs = (ups.select(
            F.col(self.partition_col).alias("__new"),
            F.pmod(F.xxhash64(*bkeys), F.lit(n_old)).alias("__old"))
            .distinct().collect())
        if not pairs:
            v = snap["version"] + 1
            self._publish(v, snap["files"],
                          StructType.fromJson(json.loads(snap["schema"])),
                          snap.get("meta"))
            return v
        t_new = {str(r["__new"]) for r in pairs}
        t_old = {str(r["__old"]) for r in pairs}
        sel = [f for f in snap["files"]
               if (f["partition"] in t_new if f.get("nb") == n_new
                   else f["partition"] in t_old)]
        current = self._read_entries(snap, sel)
        merged = _merge_last_wins(current, ups, keys, seq_col,
                                  allow_schema_merge)
        merged = merged.withColumn(
            self.partition_col, F.pmod(F.xxhash64(*bkeys), F.lit(n_new)))
        new_files = self._write_data(merged, nb=n_new)
        drop = {f["path"] for f in sel}
        keep = [f for f in snap["files"] if f["path"] not in drop]
        v = snap["version"] + 1
        self._publish(v, keep + new_files, merged.schema,
                      snap.get("meta"))
        return v

    def rebucket(self, n_new: int, keys: list[str] | None = None,
                 n_old: int | None = None,
                 buckets_per_commit: int | None = None,
                 max_retries: int = 5) -> int:
        """Change the bucket count of a key-bucketed table (the
        add_bucket contract: partition = pmod(xxhash64(keys), n)) —
        the operation a store that grew 100x needs, without a manual
        offline rewrite (VERDICT r11 #6).

        Snapshot semantics throughout: every commit is a normal
        optimistic manifest swap, so readers always see either the old
        layout or the new one, never a mix of a partition.

        With ``buckets_per_commit=None`` the whole table migrates in
        ONE commit (small tables). With a bound, each call migrates up
        to that many OLD-spec partitions and returns — the manifest
        meta carries the transition ({"rebucket": {from, to, keys}})
        and every file is tagged with the spec it was written under,
        so the migration can proceed commit-by-commit (bounding
        per-commit rewrite volume at 100 TB) while the table stays
        live: reads are exact (value-pruned reads conservatively
        include un-migrated files — see :meth:`_unmigrated`), and
        upserts both stay correct and advance the migration
        (:meth:`_upsert_mid_rebucket`). The final migration commit
        atomically completes the transition (meta n_buckets flips to
        ``n_new``). Call repeatedly until the returned version stops
        advancing, or check :meth:`in_rebucket`.

        ``keys``/``n_old`` seed a NEW transition (n_old defaults to
        meta["n_buckets"], recorded by create/add_bucket users); both
        are ignored when continuing one. Other DML (append, delete,
        merge, compact, upsert_moving, overwrite) refuses
        mid-transition."""
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            meta = dict(snap.get("meta") or {})
            rb = meta.get("rebucket")
            if rb is None:
                old = n_old if n_old is not None else meta.get("n_buckets")
                if keys is None or old is None:
                    raise ValueError(
                        "starting a rebucket needs keys and n_old (or "
                        "meta['n_buckets'] recorded at create time)")
                if int(old) == int(n_new):
                    return snap["version"]
                rb = {"from": int(old), "to": int(n_new),
                      "keys": list(keys)}
            elif int(rb["to"]) != int(n_new):
                raise ValueError(
                    f"a rebucket to {rb['to']} buckets is already in "
                    f"progress; finish it before changing the target")
            old_files = [f for f in snap["files"]
                         if f.get("nb") != rb["to"]]
            parts = sorted({f["partition"] for f in old_files})
            if buckets_per_commit is not None:
                parts = parts[:int(buckets_per_commit)]
            sel = [f for f in old_files if f["partition"] in set(parts)]
            done = len(sel) == len(old_files)
            meta2 = dict(meta)
            if done:
                meta2.pop("rebucket", None)
                meta2["n_buckets"] = int(n_new)
            else:
                meta2["rebucket"] = rb
            schema = StructType.fromJson(json.loads(snap["schema"]))
            if not sel:
                if meta2 == meta:
                    return snap["version"]    # nothing to do
                try:                          # completion-only commit
                    v = snap["version"] + 1
                    self._publish(v, snap["files"], schema, meta2)
                    return v
                except CommitConflict as e:
                    last = e
                    continue
            rows = self._read_entries(snap, sel)
            migrated = rows.withColumn(
                self.partition_col,
                F.pmod(F.xxhash64(*[F.col(k) for k in rb["keys"]]),
                       F.lit(int(n_new))))
            new_files = self._write_data(migrated, nb=int(n_new))
            drop = {f["path"] for f in sel}
            keep = [f for f in snap["files"] if f["path"] not in drop]
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, schema, meta2)
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"rebucket lost {max_retries} commit races") from last

    def in_rebucket(self) -> bool:
        """True while a rebucket transition is in progress."""
        return self._rebucket_info(self.snapshot()) is not None

    def upsert_moving(self, updates: DataFrame, keys: list[str],
                      seq_col: str, max_retries: int = 5) -> int:
        """Upsert for tables whose partition value is NOT a function of
        the keys (e.g. a vector index partitioned by list_id, keyed by
        vector id: re-embedding an id can move it to another list).
        The touched set is the updates' partitions PLUS every current
        partition holding an updated key — found by a column-pruned
        (keys + partition) scan of the snapshot semi-joined to the
        batch — so a moved key's stale row is rewritten out of its old
        partition in the same commit. Merge is replace-by-key: current
        rows whose key appears in the batch are dropped (left-anti),
        then per-key last-wins collapses the batch itself on
        ``seq_col``. Same optimistic-concurrency semantics as upsert.
        Returns the new version."""
        if self.partition_col not in updates.columns:
            raise ValueError(
                f"updates must carry the partition column "
                f"{self.partition_col!r}")
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            self._no_transition(snap, "upsert_moving")
            # ONE job finds both halves of the touched set: the batch's
            # partitions plus every current partition holding an updated
            # key (column-pruned key scan semi-joined to the batch)
            old_parts = (self.read()
                         .select(*keys, self.partition_col)
                         .join(updates.select(*keys).distinct(), keys,
                               "left_semi")
                         .select(self.partition_col))
            touched = {str(r[0]) for r in
                       updates.select(self.partition_col)
                       .unionByName(old_parts)
                       .distinct().collect()}
            if not touched:
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
            survivors = current.join(updates.select(*keys).distinct(),
                                     keys, "left_anti")
            batch_best = _merge_last_wins(
                updates.limit(0), updates, keys, seq_col)
            merged = survivors.unionByName(
                batch_best.select(*survivors.columns))
            new_files = self._write_data(merged)
            keep = [f for f in snap["files"]
                    if f["partition"] not in touched]
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, merged.schema,
                              snap.get("meta"))
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"upsert_moving lost {max_retries} commit races") from last

    def overwrite_partitions(self, df: DataFrame, partitions: list,
                             max_retries: int = 5,
                             meta_update: dict | None = None) -> int:
        """Low-level partition replace (round 14, optimization): publish
        a snapshot where the named partitions' content is EXACTLY
        ``df``'s rows and every other file re-links untouched — one
        write job, one publish, no read-back, no merge. This is the
        committer for callers that have already computed the full new
        content of the touched partitions themselves (the CDC appliers:
        replicate_keyed_cdf / maintain_aggregate fold current rows +
        changes in one pass and land the result here); ``upsert`` /
        ``merge`` remain the row-merging front ends for everyone else.

        Contract: ``df`` carries ``partition_col`` and only values in
        ``partitions`` (all listed partitions are dropped from the kept
        set whether or not ``df`` re-populates them — an emptied bucket
        simply disappears); the caller must be the only writer of the
        touched partitions (a concurrent commit retries the PUBLISH
        against the fresh file list, like append — ``df``'s content is
        NOT re-merged, it is partition-content-final by definition).
        ``meta_update`` dict-merges into the published meta — the
        transactional carrier for consumer state that must move
        atomically with the data (the maintain_aggregate watermark)."""
        if self.partition_col not in df.columns:
            raise ValueError(
                f"df must carry the partition column "
                f"{self.partition_col!r} (add_bucket derives it)")
        touched = {str(p) for p in partitions}
        self._no_transition(self.snapshot(), "overwrite_partitions")
        new_files = self._write_data(df)
        bad = {f["partition"] for f in new_files} - touched
        if bad:
            raise ValueError(
                f"df holds rows outside the declared partitions: "
                f"{sorted(bad)}")
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            self._no_transition(snap, "overwrite_partitions")
            keep = [f for f in snap["files"]
                    if f["partition"] not in touched]
            meta = dict(snap.get("meta") or {})
            if meta_update:
                meta.update(meta_update)
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, df.schema, meta)
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"overwrite_partitions lost {max_retries} commit races"
        ) from last

    def merge(self, source: DataFrame, keys: list[str], seq_col: str,
              matched_update: bool = True,
              matched_delete=None,
              insert_unmatched: bool = True,
              max_retries: int = 5,
              meta_update: dict | None = None) -> int:
        """MERGE INTO — the three-clause lakehouse DML primitive in ONE
        partition-scoped commit: for each source row keyed into the
        table, WHEN MATCHED [AND ``matched_delete`` over ``t.*``/
        ``s.*``] THEN DELETE, WHEN MATCHED THEN UPDATE (take the source
        row; disable with matched_update=False), WHEN NOT MATCHED THEN
        INSERT (disable with insert_unmatched=False). Target rows whose
        key is absent from the source are untouched, and only the
        source's partitions rewrite — the same partition-is-a-
        function-of-the-key contract as upsert (add_bucket), which is
        what makes the single-commit rewrite complete.

        ``matched_delete`` is a SQL string (or Column) over the aliased
        pair — e.g. ``"s.o_orderstatus = 'F' AND t.o_totalprice <
        100000"`` — evaluated only on matched pairs, NULL = false (SQL
        DELETE semantics). The source collapses per-key last-wins on
        ``seq_col`` first, so a batch may carry multiple versions of a
        key. One optimistic commit; returns the new version.

        Cost shape: one column-pruned read of the touched partitions,
        one full-outer join at their grain (both sides hash on the
        keys), one write — identical exchange count to upsert; the
        clauses are pure row-local projections on the joined frame.

        ``meta_update`` dict-merges into the table meta published WITH
        this commit — the transactional carrier for consumer state that
        must move atomically with the data (e.g. the applied-version
        watermark maintain_aggregate stores, whose exactly-once
        semantics come from watermark-and-data being one commit). An
        empty source skips the commit and leaves meta untouched."""
        if self.partition_col not in source.columns:
            raise ValueError(
                f"source must carry the partition column "
                f"{self.partition_col!r} (add_bucket derives it)")
        dcond = (F.expr(matched_delete)
                 if isinstance(matched_delete, str) else matched_delete)
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            self._no_transition(snap, "merge")
            touched = {str(r[0]) for r in
                       source.select(self.partition_col)
                       .distinct().collect()}
            if not touched:
                # an empty source touches nothing: no-op, same contract
                # as a no-match delete (ADVICE r11 — a version-bump
                # marker commit would pollute retention and wake
                # streaming consumers with empty batches)
                return snap["version"]
            cur = self.read(partitions=sorted(touched))
            cols = cur.columns
            srcb = _merge_last_wins(source.limit(0), source, keys,
                                    seq_col).select(*cols)
            tm = cur.withColumn("__t", F.lit(1)).alias("t")
            sm = srcb.withColumn("__s", F.lit(1)).alias("s")
            on = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                  for k in keys]
            j = tm.join(sm, on, "full_outer")
            t_here = F.col("t.__t").isNotNull()
            s_here = F.col("s.__s").isNotNull()
            both = t_here & s_here
            drop_matched = (both & F.coalesce(dcond, F.lit(False))
                            if dcond is not None else F.lit(False))
            drop_insert = (s_here & ~t_here &
                           F.lit(not insert_unmatched))
            use_source = s_here & (~t_here | F.lit(matched_update))
            merged = (j.filter(~(drop_matched | drop_insert))
                      .select(*[F.when(use_source, F.col(f"s.{c}"))
                                .otherwise(F.col(f"t.{c}")).alias(c)
                                for c in cols]))
            new_files = self._write_data(merged)
            keep = [f for f in snap["files"]
                    if f["partition"] not in touched]
            meta = dict(snap.get("meta") or {})
            if meta_update:
                meta.update(meta_update)
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, merged.schema, meta)
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"merge lost {max_retries} commit races") from last

    def delete(self, predicate, between: dict | None = None,
               max_retries: int = 5) -> int:
        """Copy-on-write predicate delete: drop every row where
        ``predicate`` (a SQL string or Column) evaluates TRUE — SQL
        DELETE semantics, so rows where it is NULL survive. Only the
        partitions that HOLD matching rows rewrite (their survivors are
        re-landed; a fully-deleted partition just drops out of the
        manifest); every other file re-links untouched. No key/bucket
        requirement — deletes never strand stale rows the way upserts
        can. Same optimistic-concurrency loop as upsert. Returns the
        new version (the current one when nothing matched — a no-match
        delete is a no-op, not an empty commit).

        ``between={col: (lo, hi)}`` is a zone-map DISCOVERY hint for
        the touched-partition scan: it should be IMPLIED by the
        predicate (every predicate-TRUE row satisfies it — e.g. the
        predicate's own range constraint restated), and then the scan
        that finds matching partitions opens only files whose footer
        stats can intersect it, instead of the predicate columns of the
        whole table. The hint prunes at the FILE level only — no
        residual row filter rides it (ADVICE r11) — so a
        slightly-wrong hint can only miss rows whose whole FILE was
        skipped, not rows that merely fall outside the bound inside a
        surviving file. The rewrite itself always reads the touched
        partitions in full, so correctness never depends on the hint
        being tight — only the discovery cost does."""
        cond = F.expr(predicate) if isinstance(predicate, str) \
            else predicate
        hit = F.coalesce(cond, F.lit(False))
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            self._no_transition(snap, "delete")
            cand = snap["files"]
            if between:
                cand = [f for f in cand if _file_can_match(f, between)]
            touched = {str(r[0]) for r in
                       self._read_entries(snap, cand).filter(hit)
                       .select(self.partition_col).distinct().collect()}
            if not touched:
                return snap["version"]
            survivors = (self.read(partitions=sorted(touched))
                         .filter(~hit))
            new_files = self._write_data(survivors)
            keep = [f for f in snap["files"]
                    if f["partition"] not in touched]
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files,
                              StructType.fromJson(
                                  json.loads(snap["schema"])),
                              snap.get("meta"))
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"delete lost {max_retries} commit races") from last

    def read_changes(self, v_from: int, v_to: int,
                     keys: list[str] | None = None,
                     include_preimages: bool = False) -> DataFrame:
        """Change-data-feed between two retained snapshot versions
        (``v_from`` exclusive as a state, i.e. 'changes that turn
        v_from into v_to').

        With ``keys``: exact row-level changes, as the table rows plus
        a ``_change_type`` column — ``insert`` (key absent at v_from),
        ``update_postimage`` (key present, row changed; the NEW row),
        ``delete`` (key absent at v_to; the OLD row). Computed ONLY
        over the partitions whose file set differs between the two
        manifests — the diff never scans the unchanged bulk of the
        table, so its cost follows the commits, not the table size.

        ``include_preimages=True`` (keys mode only) additionally emits
        ``update_preimage`` — the OLD row of every updated key — which
        is what retraction-based consumers need: an incrementally
        maintained aggregate subtracts the preimage's contribution and
        adds the postimage's (txn_stream.maintain_aggregate), and a
        group-membership change (the grouping column itself updated)
        only balances when both images flow. Same plan shape — the
        preimage class is the complementary semi-join on the already
        computed changed_old frame, no extra scan.

        Without ``keys``: the rows of files ADDED between the versions
        (exact for append-only commits; for rewrite commits it
        includes the rewritten partitions' carried-over rows — use
        keys when last-wins grain matters).

        Requires both versions to still be retained (checkpoint()
        drops old ones). The feed SURVIVES a schema-evolution boundary
        (columns added or dropped via ``allow_schema_merge`` upserts,
        VERDICT r11 #3): both sides align to the union-by-name schema
        — v_to's columns first, then v_from-only columns — with
        columns absent on one side read as NULL, exactly how the
        evolved table itself reads its pre-evolution files. A COMMON
        column changing type is real evolution and still raises (the
        write path doesn't support it either)."""
        a, b = self.snapshot(v_from), self.snapshot(v_to)
        for s_, which in ((a, "v_from"), (b, "v_to")):
            if self._rebucket_info(s_):
                raise ValueError(
                    f"read_changes is not supported while {which} is "
                    f"inside a rebucket transition (value-pruned reads "
                    f"are conservative supersets there, so the "
                    f"partition-scoped diff would see phantom rows); "
                    f"finish the migration first")
        sa = StructType.fromJson(json.loads(a["schema"]))
        sb = StructType.fromJson(json.loads(b["schema"]))
        ta = {f.name: f.dataType for f in sa}
        tb = {f.name: f.dataType for f in sb}
        clash = sorted(n for n in set(ta) & set(tb)
                       if ta[n].simpleString() != tb[n].simpleString())
        if clash:
            raise ValueError(
                f"read_changes across a TYPE change is not supported "
                f"(columns {clash}); only column add/drop evolution "
                f"carries the change feed")
        union_cols = [f.name for f in sb] + [f.name for f in sa
                                             if f.name not in tb]
        if keys is not None and not set(keys) <= set(ta) & set(tb):
            raise ValueError(
                f"keys {keys} must exist at both versions")

        def align(df, have):
            # identity fast path (r14, guide §5 — the multi-version CDF
            # drain builds this plan per version, so construction cost
            # is driver time per micro-batch): outside a schema
            # evolution boundary the snapshot already reads in
            # union_cols order and the projection would be a no-op
            if df.columns == union_cols:
                return df
            return df.select(*[
                F.col(c) if c in have else
                F.lit(None).cast((ta | tb)[c]).alias(c)
                for c in union_cols])

        paths_a = {f["path"] for f in a["files"]}
        paths_b = {f["path"] for f in b["files"]}
        added = [f for f in b["files"] if f["path"] not in paths_a]
        if keys is None:
            return align(self._read_entries(b, added), tb)
        removed = [f for f in a["files"] if f["path"] not in paths_b]
        parts = sorted({f["partition"] for f in added} |
                       {f["partition"] for f in removed})
        old = align(self.read(partitions=parts, version=v_from), ta)
        new = align(self.read(partitions=parts, version=v_to), tb)
        # Row-level delta, scoped to the changed partitions, as ONE
        # null-safe FULL OUTER join on the keys with a single-pass
        # classification (r14 optimization, guide §2.4: the former
        # exceptAll x2 + distinct x2 + four semi/anti joins spent ~12
        # exchanges per version on the same answer). Key-unique
        # snapshots — the upsert/merge/delete contract every keyed
        # consumer already requires ("update_postimage: key present,
        # row changed" presupposes one row per key) — make the mapping
        # exact: key only in new -> insert; only in old -> delete; both
        # with any column differing (null-safe struct compare, matching
        # exceptAll's NULL- and NaN-equality) -> update_postimage
        # (+ update_preimage); both identical (carried-over rows in
        # rewritten partitions) -> no change row. Each joined key emits
        # its class rows through one explode — no repeated subtrees.
        ct = "_change_type"
        om = old.withColumn("__o", F.lit(1)).alias("o")
        nm = new.withColumn("__n", F.lit(1)).alias("n")

        # The whole classification is ONE F.expr SQL string parsed in a
        # single py4j call (r14, guide §5 / the house batch-6 rule): the
        # per-column Column-object chains (4 structs + 2 compare structs
        # + per-key eqNullSafe) cost ~1000 driver round-trips per
        # version, and the CDF drain pays that per drained version per
        # micro-batch. The parsed tree is the same Catalyst shape —
        # named_struct / <=> / CASE WHEN / array / explode — so the
        # emitted rows are bit-identical.
        def q(c: str) -> str:
            return "`" + c.replace("`", "``") + "`"

        def s(v: str) -> str:
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

        def img(side: str, cls: str) -> str:
            fields = ", ".join(f"{s(c)}, {side}.{q(c)}"
                               for c in union_cols)
            return f"named_struct({fields}, {s(ct)}, {s(cls)})"

        def bare(side: str) -> str:
            fields = ", ".join(f"{s(c)}, {side}.{q(c)}"
                               for c in union_cols)
            return f"named_struct({fields})"

        on = F.expr(" AND ".join(f"o.{q(k)} <=> n.{q(k)}" for k in keys))
        j = om.join(nm, on, "full_outer")
        upd = (f"array({img('n', 'update_postimage')}, "
               f"{img('o', 'update_preimage')})"
               if include_preimages
               else f"array({img('n', 'update_postimage')})")
        arr = (f"CASE WHEN o.`__o` IS NULL THEN array({img('n', 'insert')}) "
               f"WHEN n.`__n` IS NULL THEN array({img('o', 'delete')}) "
               f"WHEN NOT ({bare('o')} <=> {bare('n')}) THEN {upd} "
               f"END")                     # identical rows -> NULL array
        return (j.select(F.expr(f"explode({arr})").alias("__r"))
                .select("__r.*"))

    def compact(self, partitions: list | None = None,
                max_retries: int = 5, order_by: list | None = None,
                max_rows_per_file: int | None = None) -> int:
        """Rewrite every partition that holds more than one data file
        down to one file, publishing the result as a normal new
        snapshot version (same optimistic-concurrency semantics as
        upsert — readers see either the old file set or the new one,
        never a mix). ``partitions`` restricts the sweep. Returns the
        new version, or the current one if nothing needed compaction.

        This is the maintenance half of the upsert story: a
        crawl-every-hour workload appends one small file per touched
        bucket per commit; compact() folds a bucket's N files back to
        one so read amplification stays O(buckets), not O(commits).
        The superseded files become orphans for vacuum().

        ``order_by`` turns compaction into a LAYOUT rewrite (the
        OPTIMIZE ZORDER shape — operators/zorder.zorder_compact builds
        the Morton expression): every selected partition rewrites
        (single-file ones too — re-clustering is the point) with rows
        sorted by the expressions and split into
        ``max_rows_per_file``-bounded files, so each file's
        manifest-carried min/max is tight on the ordering columns and
        read(between=...) skips WITHIN partitions. Requires
        max_rows_per_file (one file per partition has the same stats
        envelope the partition already had)."""
        if order_by and not max_rows_per_file:
            raise ValueError(
                "order_by compaction needs max_rows_per_file: a single "
                "file per partition has the partition's stats envelope "
                "regardless of row order")
        last: Exception | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            self._no_transition(snap, "compact")
            counts: dict[str, int] = {}
            for f in snap["files"]:
                counts[f["partition"]] = counts.get(f["partition"], 0) + 1
            want = None if partitions is None else {str(p)
                                                    for p in partitions}
            fat = {p for p, n in counts.items()
                   if (n > 1 or order_by)
                   and (want is None or p in want)}
            if not fat:
                return snap["version"]
            rows = self.read(partitions=sorted(fat))
            # one output file per partition value (coalesced via the
            # repartition(_PV) in _write_data) — unless an order_by
            # layout rewrite splits the sorted stream into bounded files
            new_files = self._write_data(rows, order_by=order_by,
                                         max_rows_per_file=max_rows_per_file)
            keep = [f for f in snap["files"] if f["partition"] not in fat]
            try:
                v = snap["version"] + 1
                self._publish(v, keep + new_files, rows.schema,
                              snap.get("meta"))
                return v
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"compact lost {max_retries} commit races") from last

    def checkpoint(self, retain_versions: int = 1) -> list[str]:
        """Manifest retention: delete all but the newest
        ``retain_versions`` manifest files (>=1). Time travel to the
        dropped versions is gone; any data file only they referenced
        becomes an orphan for vacuum(). Returns the deleted manifest
        names. Like vacuum, requires no in-flight writer older than the
        retained horizon (a retrying upsert re-reads snapshot() each
        attempt, so the running store is safe)."""
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        names = sorted(f for f in os.listdir(self._mdir())
                       if f.startswith("v") and f.endswith(".json"))
        drop = names[:-retain_versions]
        for f in drop:
            os.remove(os.path.join(self._mdir(), f))
        if drop:
            try:
                # re-tighten the compacted snapshot: the retired
                # manifests' exclusive references become vacuum-able
                # immediately instead of lingering until the next
                # cadence refresh (full rebuild — the incremental merge
                # deliberately never drops a path)
                self.write_checkpoint(full=True)
            except OSError:
                pass
        return drop

    def vacuum(self, grace_seconds: float = 3600.0) -> list[str]:
        """Delete data files referenced by NO manifest version (crash /
        lost-race / post-checkpoint orphans). Returns the deleted names.

        ``grace_seconds`` protects in-flight writers: a concurrent
        upsert renames its data files into data/ BEFORE publishing the
        manifest that references them, so a zero-grace vacuum racing
        that window could delete files the imminent winning commit
        needs. Files younger than the grace period are skipped; pass 0
        only on a quiesced table (no in-flight writers)."""
        referenced: set[str] = set()
        ck = self._read_ckpt()
        ck_v = ck["version"] if ck is not None else -1
        if ck is not None:
            # compacted-snapshot fast path: the checkpoint's union
            # covers every manifest <= its version (a stale one is a
            # conservative superset — see write_checkpoint), so only
            # NEWER manifests need reading
            referenced.update(ck["referenced"])
        for f in os.listdir(self._mdir()):
            if (f.startswith("v") and f.endswith(".json")
                    and int(f[1:9]) > ck_v):
                with open(os.path.join(self._mdir(), f)) as fh:
                    referenced.update(e["path"]
                                      for e in json.load(fh)["files"])
        gone = []
        now = time.time()
        ddir = os.path.join(self.path, _DATA_DIR)
        for f in sorted(os.listdir(ddir)):
            full = os.path.join(ddir, f)
            if f"{_DATA_DIR}/{f}" in referenced:
                continue
            if grace_seconds > 0 and \
                    now - os.path.getmtime(full) < grace_seconds:
                continue
            os.remove(full)
            gone.append(f)
        return gone
