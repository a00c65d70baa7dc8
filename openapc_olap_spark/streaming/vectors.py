"""Streaming vector-index maintenance (SURVEY.md §2.9 X6 x X3
composition; round 11): an embedding stream committed into the
transactional PQ index (operators/pq.create_pq_txn_index) per
micro-batch — the ANN sibling of streaming/incremental.py's
exactly-once dedup.

Failure semantics: ``foreachBatch`` is AT-LEAST-ONCE — after a crash
the last batch re-runs. Both effects here are ``TxnTable.upsert_moving``
commits keyed on the vector id (codes store first, vectors store
second), and the committed rows are a pure function of the batch's
content (re-encode against the creation-time centroids) plus the batch
id as the last-wins sequence — so a replayed batch recomputes identical
rows and re-applies idempotently: content converges, only the manifest
version advances. A crash BETWEEN the codes and vectors commits leaves
one store a batch ahead; the replay re-upserts both to the same final
content (the stores never disagree on what a vector IS, only
transiently on whether its full-precision row has landed — and the
serving re-rank joins on id, so a code row whose vector row is one
replay behind simply re-ranks against the prior vector until
convergence).

At 100 TB: per-batch work is the zero-shuffle Arrow encode of the
batch plus two partition-scoped commits over only the touched list_id
partitions (plus any list a re-embedded id moved out of); untouched
lists re-link, never rewrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def read_vector_stream(spark, path: str, schema=None) -> DataFrame:
    """File-source embedding stream (schema from the directory's
    parquet when not given — file streams require an explicit
    schema)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path))


def stream_vector_index_commit(stream_df: DataFrame, index_path: str,
                               checkpoint: str,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               encode_method: str = "arrow"):
    """Run the embedding stream through per-batch encode-and-commit
    against the transactional PQ index at ``index_path``
    (availableNow; returns the finished query). The index must already
    exist (``create_pq_txn_index`` — centroids are fixed at creation;
    a stream never retrains them, it only maintains membership)."""
    from openapc_olap_spark.operators.pq import upsert_pq_txn_index

    # validate the index BEFORE the query starts: a missing/torn meta
    # file should fail the job, not every micro-batch
    meta_path = os.path.join(index_path, "pq_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if not meta.get("coarse") or not meta.get("pq_cents"):
        raise ValueError(f"{meta_path} carries no centroids")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_pq_txn_index(batch_df.sparkSession, index_path,
                            batch_df, seq=batch_id, id_col=id_col,
                            vec_col=vec_col,
                            encode_method=encode_method)

    q = (stream_df.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
