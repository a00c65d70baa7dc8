"""Embedding quantization (SURVEY.md §2.9 extension surface): symmetric
per-vector int8 quantization and dequantization for embedding columns —
the 4x storage/bandwidth compression an ANN corpus takes before it ships
to an index at 100 TB (float32[dim] -> int8[dim] + one float scale).

100 TB posture
--------------
* Pure per-row expression work: array_max + transform inside whole-stage
  codegen, no shuffle, no UDF — quantization rides the same scan that
  wrote the embeddings.
* The quantized column is what downstream ANN coarse stages should read:
  4x less parquet IO per probe, with the scale column making dot products
  recoverable as (qa . qb) * scale_a * scale_b.
* Element arithmetic is promoted to double on BOTH engines before the
  divide/round, so the quantized grid is engine-portable (gate x46 pins
  per-vector integer checksums of the full grid).

Precision note: symmetric scaling (scale = max|x| / 127) keeps zero exact
and saturates only the max-magnitude element; reconstruction cosine for
typical unit-norm 64-dim embeddings is > 0.999 (unit-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantization_scale(vec: Column, levels: int = 127) -> Column:
    """Per-vector symmetric scale: max|x| / levels (double). Zero vectors
    get scale 0 (their quantized form is all zeros)."""
    return (F.array_max(F.transform(vec, lambda x: F.abs(x)))
            .cast("double") / F.lit(float(levels)))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        levels: int = 127,
                        keep_vec: bool = False) -> DataFrame:
    """Adds ``scale`` (double) and ``qvec`` (array<int> in
    [-levels, levels]) columns; drops the float vector unless
    ``keep_vec``. q_i = round(x_i / scale), half away from zero."""
    vec = F.col(vec_col)
    q = F.when(F.col("scale") > 0, F.transform(
        vec, lambda x: F.round(x.cast("double") / F.col("scale"))
        .cast("int"))).otherwise(
            F.transform(vec, lambda x: F.lit(0)))
    out = (df.withColumn("scale", quantization_scale(vec, levels))
           .withColumn("qvec", q))
    return out if keep_vec else out.drop(vec_col)


def dequantize(qvec: Column | str, scale: Column | str = "scale") -> Column:
    """Approximate float vector back from (qvec, scale):
    x_i ~= q_i * scale."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda x: x.cast("double") * s)


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Dot product in the quantized domain: (qa . qb) * sa * sb — integer
    multiply-adds (SIMD-friendly) with one float correction, the arithmetic
    an int8 ANN rerank stage runs."""
    acc = F.zip_with(qa, qb, lambda a, b: (a * b).cast("long"))
    return (F.aggregate(acc, F.lit(0).cast("long"), lambda s, x: s + x)
            .cast("double") * sa * sb)
