"""Feature hashing (the hashing trick; Weinberger et al. 2009) —
fixed-width text featurization with NO vocabulary pass (SURVEY.md §2.9
X4 extension: the featurizer that feeds ``logreg`` quality classifiers
at corpus scale, where a fitted vocabulary would itself be a moving
target. Reference has no equivalent; driver-mandated LLM-pipeline
surface).

Each token t maps to bucket h(t) mod m with sign s(t) in {-1, +1}; a
document's feature vector is the signed bucket-count histogram. The
signed variant makes collisions cancel in expectation instead of
inflating counts. Both h and s derive from the same engine-portable md5
(the ``packing._md5_bucket`` discipline), so a DuckDB oracle replays
vectors bit-for-bit.

100 TB posture:
- ONE tokenize/explode pass, map-side-combined (doc, bucket) pre-
  aggregation — the exchange carries bucket-count pairs, never tokens;
- the sparse form is the scale path (rows = nonzero buckets per doc);
  the dense form materializes m doubles per doc — bounded by
  ``n_features``, which the caller sizes (2^10..2^18 typical);
- everything is Catalyst expressions (map_from_entries + transform for
  densification) — no UDF, no shuffle beyond the one pre-aggregation;
- composition: ``hashed_features`` output feeds ``logreg_fit``'s
  ``with_features`` directly via the dense array column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text
from openapc_olap_spark.operators.packing import _md5_bucket


def _md5_sign(col: Column) -> Column:
    """+1.0 / -1.0 from one md5 hex digit DISJOINT from the bucket
    prefix (digit 16; ``_md5_bucket`` consumes 1-15), so bucket and sign
    are independent. DuckDB twin:
    CASE WHEN ('0x'||substr(md5(t),16,1))::INT % 2 = 0 THEN 1.0 ELSE -1.0
    END."""
    digit = F.conv(F.substring(
        F.md5(F.encode(col.cast("string"), "utf-8")), 16, 1), 16, 10)
    return F.when(digit.cast("int") % 2 == 0,
                  F.lit(1.0)).otherwise(F.lit(-1.0))


def hashed_feature_pairs(df: DataFrame, n_features: int,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         signed: bool = True) -> DataFrame:
    """Sparse form: (id_col, bucket, value) for nonzero buckets only —
    the 100 TB representation. ``value`` is the signed token count of
    the bucket (zero-sum collisions CAN yield value 0 rows; they are
    kept — "nonzero" means the bucket was touched)."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    tok = F.explode(text.tokens(text_col)).alias("__tok")
    per = df.select(F.col(id_col), tok)
    val = _md5_sign(F.col("__tok")) if signed else F.lit(1.0)
    return (per.select(F.col(id_col),
                       _md5_bucket(F.col("__tok"), n_features)
                       .alias("bucket"),
                       val.alias("__v"))
            .groupBy(id_col, "bucket")
            .agg(F.sum("__v").alias("value")))


def hashed_features(df: DataFrame, n_features: int,
                    id_col: str = "doc_id", text_col: str = "text",
                    signed: bool = True,
                    out_col: str = "features") -> DataFrame:
    """Dense form: (id_col, out_col array<double> of length
    ``n_features``) — densified from the sparse pairs with a
    map_from_entries lookup over 0..m-1 (pure expressions). Documents
    with no tokens get the all-zero vector (left join + coalesce)."""
    pairs = hashed_feature_pairs(df, n_features, id_col, text_col, signed)
    as_map = (pairs.groupBy(id_col)
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("bucket", "value")))
                  .alias("__m")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i.cast("long")),
                             F.lit(0.0)))
    return (df.select(id_col)
            .join(as_map, [id_col], "left")
            .select(F.col(id_col),
                    F.when(F.col("__m").isNull(),
                           F.array_repeat(F.lit(0.0), n_features))
                    .otherwise(dense).alias(out_col)))


def with_hashed_feature_cols(df: DataFrame, n_features: int,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             signed: bool = True,
                             prefix: str = "f") -> DataFrame:
    """``n_features`` scalar columns ``f0..f{m-1}`` — the adapter onto
    ``logreg.logreg_fit(feature_cols=...)``; sensible only for small m
    (a classifier's typical 2^6..2^10)."""
    dense = hashed_features(df, n_features, id_col, text_col, signed,
                            out_col="__feat")
    cols = [F.col("__feat")[i].alias(f"{prefix}{i}")
            for i in range(n_features)]
    return df.join(dense, [id_col]).select(*df.columns, *cols)
