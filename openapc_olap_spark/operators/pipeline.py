"""End-to-end pretraining-data pipeline composition (SURVEY.md §2.9): the
canonical curation chain — quality filter → exact dedup → train/eval
decontamination → context-window chunking → deterministic train/val/test
split — as ONE composed, deterministic, engine-portable transformation.

Every stage is an already-oracled operator (x16/x01/x40/x47/x30); this
module pins their COMPOSITION: stage order, survivor semantics, and the
identity keys that make the output re-derivable. A DuckDB twin of the
whole chain is asserted in tests/test_operators.py (the same
twin-methodology as the gate queries, run in-suite; promoted to a driver
gate when the certification window reopens next round).

100 TB posture: stages 1-3 are scan-side filters plus the decontamination
broadcast join; the only corpus-scale shuffles are exact-dedup's
min-per-fingerprint aggregate and decontamination's per-doc count. The
chunk explode and split assignment never shuffle. Nothing in the chain
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators import chunking, decontam, packing, text


def pretraining_pipeline(docs: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         min_tokens: int = 20, ngram: int = 3,
                         min_hits: int = 2, chunk_tokens: int = 128,
                         overlap: int = 16, val_permille: int = 50,
                         test_permille: int = 50) -> DataFrame:
    """Chunked, split-assigned training corpus:
    (id_col, chunk_id, chunk_text, n_tokens, split).

    Stage semantics (each deterministic, so the output is re-derivable):
      1. quality: keep docs with >= min_tokens whitespace tokens;
      2. exact dedup: among equal normalized fingerprints keep the
         smallest id (text.fingerprint — md5 of ws-normalized lowercase);
      3. decontaminate: drop docs sharing >= min_hits distinct word
         n-grams with eval_df;
      4. chunk: overlapping fixed-token windows (chunking.chunk_documents);
      5. split: md5-permille hash split on the composite chunk identity —
         a chunk's split never depends on what else survived.
    """
    quality = docs.filter(text.token_count(text_col) >= min_tokens)
    w = Window.partitionBy("__fp")
    deduped = (quality
               .withColumn("__fp", text.fingerprint(text_col))
               .withColumn("__keep", F.min(id_col).over(w))
               .filter(F.col(id_col) == F.col("__keep"))
               .drop("__fp", "__keep"))
    clean = decontam.drop_contaminated(deduped, eval_df, id_col, text_col,
                                       n=ngram, min_hits=min_hits)
    chunks = chunking.chunk_documents(clean, id_col, text_col,
                                      chunk_tokens, overlap)
    chunk_key = F.concat(F.col(id_col).cast("string"), F.lit("#"),
                         F.col("chunk_id").cast("string"))
    split = packing.hash_split(
        chunks.withColumn("__ck", chunk_key), id_col="__ck",
        val_permille=val_permille, test_permille=test_permille)
    return split.drop("__ck")


def pipeline_report(out: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-split manifest of a pretraining_pipeline result:
    (split, n_chunks, n_docs, total_tokens)."""
    return (out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))
