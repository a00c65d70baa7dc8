"""Document chunking (SURVEY.md §2.9 extension surface): split long
documents into fixed-token-length, optionally overlapping chunks — the
context-window segmentation step between raw documents and sequence
packing in a pretraining/RAG pipeline.

100 TB posture
--------------
* One scan, zero shuffle: tokenize once, compute the chunk count
  arithmetically, posexplode a ``sequence`` of chunk ids, slice the token
  array per chunk — all whole-stage-codegen expressions (plan-audited).
  Fan-out is bounded by doc_len/stride, the same multiplicity the
  downstream trainer needs anyway.
* Chunk identity is (doc_id, chunk_id) — deterministic, so chunked
  corpora are re-derivable and hash-splittable (packing.hash_split on
  the composite key) without materializing intermediate state.

Coverage guarantee (unit-tested): every token of a non-empty document
appears in at least one chunk; consecutive chunks overlap by exactly
``overlap`` tokens except the final chunk, which may be shorter (never
empty). Token-less documents yield zero chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 512,
                    overlap: int = 0) -> DataFrame:
    """One row per chunk: all input columns except ``text_col``, plus
    (chunk_id, chunk_text, n_tokens). Chunk i covers tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; the last chunk starts at the smallest multiple of stride
    whose window reaches the end of the document."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} vs "
            f"{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = text.tokens(text_col).alias("__toks")
    base = df.select("*", toks).withColumn("__n", F.size(F.col("__toks")))
    # 1 + ceil(max(n - chunk, 0) / stride), integer arithmetic
    n_chunks = (F.lit(1) +
                (F.greatest(F.col("__n") - chunk_tokens, F.lit(0)) +
                 (stride - 1)).cast("long") / stride).cast("long")
    base = base.withColumn("__k", n_chunks).filter(F.col("__n") > 0)
    exploded = base.select(
        "*", F.explode(F.sequence(F.lit(0).cast("long"),
                                  F.col("__k") - 1)).alias("chunk_id"))
    piece = F.slice(F.col("__toks"),
                    (F.col("chunk_id") * stride + 1).cast("int"),
                    chunk_tokens)
    keep = [c for c in df.columns if c != text_col]
    return exploded.select(
        *keep, "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"))
