"""Streaming incremental dedup with exactly-once EFFECTS (SURVEY.md
§2.9 X6 x X1 composition): a document stream deduplicated per
micro-batch against the transactional fingerprint store
(sources/txn.TxnTable), surviving docs and their fingerprints both
landed as bucketed partition-overwrite upserts.

Why this shape survives failure semantics Structured Streaming actually
has: ``foreachBatch`` is AT-LEAST-ONCE — after a crash the last batch
re-runs. Plain parquet-append output would double its rows; here BOTH
effects are last-wins upserts into manifest-swap tables, so a replayed
batch recomputes the identical kept set (the fp snapshot it reads is
either pre- or post- its own commit — see ordering below) and
re-applies idempotently. Commit ORDER is load-bearing:

1. kept documents -> out_store (upsert keyed on the doc id);
2. their fingerprints -> fp_store (upsert keyed on fp, seq=batch_id).

Crash between 1 and 2, then replay: the fp snapshot is unchanged, the
batch's kept set recomputes identically, both upserts re-apply to the
same final state. The REVERSE order loses data: fps committed first
would make the replayed batch see its own fingerprints as historical,
keep nothing, and never write the documents.

In-batch duplicates (two docs with one fingerprint arriving together)
resolve deterministically to the min-id row, matching the batch
operator's arg_min semantics so a SQL oracle can replay the whole run.

At 100 TB: per-batch work is the bloom-guarded anti-join of
incremental_dedup (novel rows skip the shuffle) plus two bucket-scoped
rewrites; the stores' untouched buckets re-link, never rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators import dedup
from openapc_olap_spark.operators.text import fingerprint
from openapc_olap_spark.sources.txn import TxnTable, add_bucket


def read_document_stream(spark: SparkSession, path: str,
                         schema=None) -> DataFrame:
    """File-source document stream (schema from the directory's parquet
    when not given — file streams require an explicit schema)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path))


def stream_dedup_commit(stream_df: DataFrame, fp_store: TxnTable,
                        out_store: TxnTable, checkpoint: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        bloom_bits: int | None = None):
    """Run the stream through per-batch dedup-and-commit (availableNow;
    returns the finished query). ``fp_store`` holds (fp, seq) rows,
    ``out_store`` the surviving documents + a ``seq`` column — both
    created over add_bucket'ed frames with meta.n_buckets (the
    incremental_dedup_commit contract)."""
    n_out = out_store.snapshot().get("meta", {}).get("n_buckets")
    if not n_out:
        raise ValueError("out_store manifest carries no meta.n_buckets")
    # validate BOTH stores before the query starts: a missing fp-store
    # bucket count would null the bucket column and strand superseded
    # fingerprints in partitions the last-wins upsert never rewrites
    n_fp = fp_store.snapshot().get("meta", {}).get("n_buckets")
    if not n_fp:
        raise ValueError("fp_store manifest carries no meta.n_buckets")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # a maxFilesPerTrigger=1 micro-batch scans as 1-2 partitions, so
        # the normalize+fingerprint chain ran on 1-2 tasks (r14 profile:
        # 0.8 s of a ~2 s batch); spread the batch first — the exchange
        # carries one micro-batch of raw text, once (kept is cached)
        batch_df = dedup._spread(batch_df)
        seen = fp_store.read().select("fp")
        # keep_fp: the fingerprint is computed ONCE per batch and rides
        # the cached frame into the in-batch window AND the fp commit —
        # previously each of the three consumers re-normalized and
        # re-hashed the text (round 14)
        kept = dedup.incremental_dedup(batch_df, seen, id_col, text_col,
                                       "fp", bloom_bits, keep_fp=True)
        # in-batch dedup: one row per fingerprint, min id wins (the
        # batch arg_min the oracle replays)
        w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
        kept = (kept.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))
        from openapc_olap_spark.operators.dedup import _materialized
        kept = _materialized(
            kept.withColumn("seq", F.lit(batch_id).cast("long")))
        # ORDER MATTERS: documents first, fingerprints second (module
        # docstring) — the reverse order loses the batch on replay
        out_store.upsert(add_bucket(kept.drop("__fp"), [id_col], n_out),
                         [id_col], "seq")
        fps = (kept.select(F.col("__fp").alias("fp"))
               .distinct()
               .withColumn("seq", F.lit(batch_id).cast("long")))
        fp_store.upsert(add_bucket(fps, ["fp"], n_fp), ["fp"], "seq")

    q = (stream_df.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
