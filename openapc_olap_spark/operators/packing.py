"""Training-batch assembly operators (SURVEY.md §2.9): deterministic
sequence packing and hash-based dataset splits.

Both are pure window/expression plans with exact cross-engine twins, so the
batch-assembly stage of a pretraining pipeline sits under the same DuckDB
hash gate as the analytics operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openapc_olap_spark.operators import text


def _md5_bucket(col: Column, buckets: int) -> Column:
    """Portable uniform bucket in [0, buckets): md5-prefix mod buckets —
    same value in any engine (DuckDB twin: ('0x'||substr(md5(x),1,15))::BIGINT
    % buckets), unlike xxhash64 which is Spark-specific."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.encode(col.cast("string"), "utf-8")),
                           1, 15), 16, 10).cast("long"),
        F.lit(buckets))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", capacity: int = 2048,
                   n_shards: int = 64,
                   token_count_col: str | None = None) -> DataFrame:
    """Next-fit streaming sequence packing: assign each document to a
    fixed-token-capacity training bin, deterministically.

    Documents are hashed to ``n_shards`` independent shards (md5 bucket of
    the id — reproducible across runs AND engines), ordered by id within
    the shard, and concatenated conceptually; a bin is cut every
    ``capacity`` tokens, with each document assigned by its starting
    offset (next-fit: a document may straddle its bin's boundary — the
    standard concat-then-chunk pretraining shape where sequences are
    chunked downstream, not re-ordered).

    Scale: packing is embarrassingly parallel ACROSS shards — the only
    shuffle is the shard hash partition + the in-shard window sort, so
    1000 executors pack 1000 shards independently; no global order, no
    driver-side loop. Capacity waste amortizes per shard. Output: one row
    per document (shard, bin_id, doc id, n_tokens, bin_offset).

    Determinism precondition: ``id_col`` values must be UNIQUE — the
    in-shard order is (id, n_tokens), so duplicate ids with equal token
    counts would make the cumulative offsets ambiguous across engines.
    With unique ids the output is bit-stable across runs AND engines
    (the contract hash_split's leakage guarantee builds on).
    """
    toks = (F.col(token_count_col) if token_count_col
            else text.token_count(text_col))
    base = df.select(
        F.col(id_col),
        _md5_bucket(F.col(id_col), n_shards).alias("shard"),
        toks.alias("n_tokens"))
    w = (Window.partitionBy("shard")
         .orderBy(F.col(id_col).asc(), F.col("n_tokens").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    out = base.withColumn("__start", cum - F.col("n_tokens"))
    return out.select(
        "shard",
        F.floor(F.col("__start") / capacity).cast("long").alias("bin_id"),
        F.col(id_col),
        "n_tokens",
        F.pmod(F.col("__start"), F.lit(capacity)).alias("bin_offset"))


def pack_summary(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", capacity: int = 2048,
                 n_shards: int = 64) -> DataFrame:
    """Per-bin packing summary (the batch manifest a trainer consumes):
    (shard, bin_id, n_docs, total_tokens)."""
    packed = pack_sequences(df, id_col, text_col, capacity, n_shards)
    return (packed.groupBy("shard", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               val_permille: int = 10, test_permille: int = 10,
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test split by content-independent id hash:
    stable under re-runs, engine-portable (md5 bucket of salt||id over
    1000), and leakage-free as long as ids are stable. Adds a ``split``
    column; never moves data."""
    b = _md5_bucket(F.concat(F.lit(salt), F.lit(":"),
                             F.col(id_col).cast("string")), 1000)
    return df.withColumn(
        "split",
        F.when(b < val_permille, "val")
         .when(b < val_permille + test_permille, "test")
         .otherwise("train"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing knob of a
    training-data pipeline (e.g. keep 80% of en, 30% of de, drop the
    rest), as a pure filter:

    - membership is decided by the md5 permille bucket of (salt, id) —
      content-independent, so re-runs, engine ports, AND overlapping
      sample jobs with the same salt select consistent subsets (a row in
      the 30% sample is always in the 80% sample: nested samples for
      scaling-law curves come free);
    - no shuffle, no randomness, no sampleBy approximation: the sampled
      fraction converges to the target by the hash's uniformity and is
      exactly reproducible;
    - ``fractions`` maps stratum value -> keep fraction in [0, 1];
      unlisted strata get ``default_fraction``.

    At 100 TB this is a scan with a codegen'd predicate — pushdown-
    friendly and embarrassingly parallel.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} out of [0,1]: {v}")
    b = _md5_bucket(F.concat(F.lit(salt), F.lit(":"),
                             F.col(id_col).cast("string")), 1000)
    thresh = F.lit(int(round(default_fraction * 1000)))
    for k, v in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == k,
                        F.lit(int(round(v * 1000)))).otherwise(thresh)
    return df.filter(b < thresh)


def deterministic_shuffle(df: DataFrame, id_col: str = "doc_id",
                          seed: str = "shuffle",
                          n_shards: int = 64) -> DataFrame:
    """Reproducible global training order: every row gets a ``shard`` and a
    1-based in-shard ``pos``, both pure functions of (seed, id) — the
    "shuffled dataset" a trainer streams shard-by-shard, identical across
    runs, engines, and cluster sizes (unlike ``df.orderBy(rand())``, which
    is neither reproducible nor restartable).

    Order key is the md5 hex digest of ``seed || ':' || id`` (lexicographic
    hex order agrees across engines); the shard is the high 60 bits of the
    same digest mod ``n_shards``, so changing the seed re-deals both shard
    membership AND order. Scale: one hash-partition shuffle on shard + an
    in-shard sort — embarrassingly parallel across shards, no global sort,
    no driver state; re-shuffling an epoch is a new seed, not a new plan.

    Determinism precondition: unique ``id_col`` (ties broken by id, so
    duplicate ids would collapse the tiebreak).
    """
    hexd = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                          F.col(id_col).cast("string")))
    shard = F.pmod(F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long"),
                   F.lit(n_shards))
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__okey").asc(), F.col(id_col).asc()))
    return (df.withColumn("__okey", hexd)
            .withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__okey"))


def mixture_fractions(df: DataFrame, strata_col: str,
                      targets: dict[str, float]) -> dict[str, float]:
    """Per-stratum keep fractions that hit a target mixture by
    downsampling only (no upsampling): with counts n_s and target weights
    t_s (normalized), the largest feasible corpus is T = min_s(n_s / t_s)
    and f_s = t_s * T / n_s. Strata absent from ``targets`` get 0.

    Fractions are FLOORED to permille precision — the resolution
    ``stratified_sample`` applies anyway — so the computed rates are
    engine-portable by construction (no round-half ambiguity between
    Python's banker's rounding and SQL round()).

    The aggregation is stratum-sized (one tiny collect — like reading a
    trained codebook); the actual data never moves here."""
    # normalize with a SORTED-key fold: double addition is order-sensitive
    # and dict/collect order is not deterministic, so an unsorted sum can
    # flip a permille floor at a rate boundary between runs (and against
    # the SQL oracle, which folds in ORDER BY)
    total = 0.0
    for k in sorted(targets):
        total += targets[k]
    if total <= 0:
        raise ValueError("targets must have positive total weight")
    t = {k: v / total for k, v in targets.items()}
    counts = {r[strata_col]: r["n"]
              for r in df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    missing = [k for k in t if counts.get(k, 0) == 0]
    if missing:
        raise ValueError(f"target strata with no rows: {missing}")
    cap = min(counts[k] / t[k] for k in t if t[k] > 0)
    import math
    return {k: math.floor(min(t[k] * cap / counts[k], 1.0) * 1000) / 1000
            for k in t}


def rebalance_mixture(df: DataFrame, strata_col: str,
                      targets: dict[str, float], id_col: str = "doc_id",
                      salt: str = "mix") -> DataFrame:
    """Deterministically downsample to a target stratum mixture (e.g.
    50% en / 20% de / ...): compute the per-stratum keep fractions, then
    apply the md5-permille stratified filter. The output mixture matches
    ``targets`` up to permille rounding and hash uniformity, with the
    largest total size downsampling allows; membership is a pure function
    of (salt, id) — reproducible, nestable, engine-portable."""
    fr = mixture_fractions(df, strata_col, targets)
    return stratified_sample(df, strata_col, fr, default_fraction=0.0,
                             id_col=id_col, salt=salt)
