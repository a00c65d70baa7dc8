"""Size-targeted output sharding (SURVEY.md §2.9 X4 family — the last
step before writing training data: pack documents, in a deterministic
global order, into shards of ~``target`` total weight (tokens/bytes)
each, so a 100 TB corpus lands as uniformly-sized files. Reference has
no equivalent; driver-mandated LLM-pipeline surface).

The assignment is a GLOBAL prefix sum of the weight column in id order
— the textbook distributed scan, done Spark-first instead of a
single-partition window (``Window.orderBy`` with no partition key pulls
the whole corpus through ONE task):

1. range-repartition by id (metadata columns only — id + weight, not
   payloads);
2. per-partition interior prefix sums via an in-partition window;
3. per-partition TOTALS (a partition-count-sized aggregate) collect to
   the driver, prefix-sum there, and join back as a broadcastable
   offset table keyed by partition id.

Weights are integers, so the prefix sum is exact and the shard of a row
is partitioning-invariant: shard = floor(cum_before / target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(df: DataFrame, target: int,
                  id_col: str = "doc_id",
                  weight_col: str = "n_chars",
                  num_partitions: int | None = None) -> DataFrame:
    """Attach ``shard`` (0-based) and ``cum_before`` (exact weight
    preceding the row in id order): rows fill shard s until its running
    total reaches ``target``, then spill to s+1 — every shard except
    possibly the last holds >= target-max_weight and < target+max_weight
    total weight. Deterministic: depends only on (id, weight), never on
    partitioning."""
    if target <= 0:
        raise ValueError("target must be positive")
    spark = df.sparkSession
    npart = num_partitions or spark.sparkContext.defaultParallelism
    w = (df.select(F.col(id_col), F.col(weight_col).cast("long")
                   .alias("__w"))
         .repartitionByRange(npart, F.col(id_col))
         .withColumn("__pid", F.spark_partition_id()))
    iw = Window.partitionBy("__pid").orderBy(F.col(id_col).asc())
    interior = w.withColumn(
        "__cum_in",
        F.coalesce(F.sum("__w").over(
            iw.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    interior = interior.persist()
    try:
        totals = (interior.groupBy("__pid")
                  .agg(F.sum("__w").alias("__tot"),
                       F.min(id_col).alias("__min_id"))
                  .collect())
        # prefix-sum the partition totals in ID order, not pid order:
        # range partitioning orders partitions by key already, but sort
        # by the partition's min id to be independent of pid numbering
        totals = sorted(totals, key=lambda r: (r["__min_id"] is None,
                                               r["__min_id"]))
        offset, offsets = 0, []
        for r in totals:
            offsets.append((r["__pid"], offset))
            offset += int(r["__tot"] or 0)
        # explicit schema: an EMPTY offsets list (empty input frame) has
        # nothing to infer from
        off = spark.createDataFrame(offsets, "__pid int, __off long")
        out = (interior.join(F.broadcast(off), ["__pid"])
               .withColumn("cum_before", F.col("__off") + F.col("__cum_in"))
               .withColumn("shard", F.floor(F.col("cum_before")
                                            / F.lit(target)).cast("long"))
               .select(id_col, "cum_before", "shard"))
        # materialize ONLY the 3-column id->shard map before dropping the
        # interior cache it reads — not the full joined output (at 100 TB
        # the payload join should stay lazy so downstream projections
        # prune it; the map is id-grain metadata). localCheckpoint, not
        # persist: persist() registers the plan in CacheManager, which
        # holds a strong reference until an explicit unpersist — repeated
        # calls in a long-lived session would accumulate cached maps.
        # localCheckpoint blocks ARE reclaimed by the ContextCleaner once
        # the returned frame is garbage-collected, and it also truncates
        # the lineage so the window+join never recomputes.
        out = out.localCheckpoint(eager=True)
    finally:
        interior.unpersist()
    return df.join(out, [id_col])


def shard_summary(assigned: DataFrame,
                  weight_col: str = "n_chars") -> DataFrame:
    """(shard, n_docs, total_weight) — the write-planning view."""
    return (assigned.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(weight_col).cast("long"))
                 .alias("total_weight")))


def write_shards(df: DataFrame, path: str, target: int,
                 id_col: str = "doc_id", weight_col: str = "n_chars",
                 fmt: str = "parquet", mode: str = "overwrite",
                 num_partitions: int | None = None, **options) -> None:
    """The end-to-end sharded sink: ``assign_shards`` then land ONE file
    per shard under ``path/shard=N/`` (VERDICT r06 item 5 — the last
    pipeline step, made real instead of stopping at the id->shard map).

    Layout discipline:
    - shuffle on ``shard`` before the write, so each shard's rows sit in
      exactly one task -> exactly one data file per shard directory (no
      small-files explosion: file count == shard count == ceil(total
      weight / target), by construction uniform at ~``target`` weight);
    - rows sorted by id within the file (shard order IS id order
      globally, so readers get deterministic sequential content and
      columnar formats get tight id min/max stats);
    - hive-style ``shard=`` directories, so a consumer can
      partition-prune any shard range.

    ``cum_before`` is dropped — it is assignment plumbing, not payload.
    """
    from openapc_olap_spark.sources.io import write_dataset

    assigned = assign_shards(df, target, id_col, weight_col,
                             num_partitions).drop("cum_before")
    out = (assigned.repartition(F.col("shard"))
           .sortWithinPartitions("shard", id_col))
    write_dataset(out, path, fmt=fmt, partition_by=["shard"],
                  mode=mode, **options)
