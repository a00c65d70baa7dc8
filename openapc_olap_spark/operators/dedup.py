"""Deduplication operators for training-data pipelines (SURVEY.md §2.9 X1/X2).

Five dedup families, each shaped for 100 TB:

- exact:         hash-groupBy on a normalized fingerprint (one shuffle,
                 map-side combinable).
- MinHash-LSH:   shingle -> k-permutation min-hash signature (array ops, no
                 shuffle) -> banding -> bucket self-join for candidates ->
                 exact-Jaccard verify. Only candidate pairs ever shuffle.
- SimHash:       64-bit sign-of-weighted-sum signature computed entirely with
                 array expressions; banded into 16-bit chunks for candidate
                 generation (pigeonhole: hamming<=3 => >=1 equal chunk).
- n-gram Jaccard: inverted-index join on shared shingles (exact — any pair
                 with Jaccard > 0 shares a shingle), then threshold filter.
- embedding:     cosine near-dup via random-hyperplane LSH + exact verify
                 (see operators.similarity for the primitives).

Everything signature-side is built-in expressions (xxhash64, transform,
aggregate, filter) — zero Python in the scan. Shuffles happen only on
(band/bucket) keys and are AQE-skew-handled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators._memo import memoized
from openapc_olap_spark.operators.text import fingerprint, shingles, tokens

# A large prime < 2^31 for affine minhash permutations (Carter-Wegman style).
_MERSENNE = (1 << 31) - 1


def _materialized(df: DataFrame) -> DataFrame:
    """Persist + force a derived frame that a self-join consumes from both
    sides. Without this, each join side re-runs the whole upstream corpus
    scan + tokenize + signature compute (and with doc-frequency filters, a
    third time for the frequency pass) — at 100 TB that is the dominant
    cost, and signatures/banded keys are tiny (bytes per doc) next to the
    corpus. MEMORY_AND_DISK keeps lineage, so executor loss recomputes
    instead of failing the job (unlike localCheckpoint). Spark's
    ContextCleaner drops the cache when the DataFrame is garbage-collected;
    long-lived callers can also unpersist() the returned frame."""
    from pyspark import StorageLevel
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()   # eager: both join-side stages must read cache, not race
    return out


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to ``defaultParallelism`` ONLY when the frame has
    fewer partitions. Signature/bucket frames are cached and then
    self-joined; when the join broadcasts one side, its parallelism is
    the stream side's partition count, so a 2-file scan would run the
    quadratic verify on 2 tasks (measured 363 s -> 40 s at sf1 in
    semdedup from spreading alone). But when the scan already yields
    >= defaultParallelism splits — the normal case at sf0.1+ and on any
    real cluster — an unconditional repartition is a pure extra shuffle
    (it cost the r05 driver bench ~2.5x on x06/x18 at sf0.1). The
    ``.rdd.getNumPartitions()`` probe triggers physical planning only,
    no job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


# --------------------------------------------------------------------------
# X1: exact dedup
# --------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (whitespace/case-normalized) documents:
    one row per duplicated fingerprint with the kept (min) id and count."""
    return (df
            .withColumn("fp", fingerprint(text_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep exactly one row (the min id) per normalized fingerprint.

    Deterministic alternative to ``dropDuplicates`` (which keeps an
    arbitrary row), in ONE shuffle: rank within fingerprint partitions and
    keep rank 1 (the groupBy(min)+semi-join formulation costs a second
    shuffle for the join).
    """
    from pyspark.sql import Window
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (df.withColumn("__fp", fingerprint(text_col))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__fp", "__rn"))


def canonical_documents(df: DataFrame, score_col: str,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Quality-aware exact dedup ("keep the best copy"): within each
    normalized-fingerprint group keep the row with the HIGHEST
    ``score_col`` (ties -> min id), annotated with ``n_copies``. The
    copies of a page differ in scraping quality even when the
    normalized text matches — min-id keeps the first crawl,
    this keeps the best one.

    One shuffle: rank and group-size share the fingerprint window
    partitioning, so Catalyst plans a single exchange + sort."""
    from pyspark.sql import Window
    part = Window.partitionBy("__fp")
    w = part.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (df.withColumn("__fp", fingerprint(text_col))
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("n_copies", F.count(F.lit(1)).over(part))
            .filter(F.col("__rn") == 1)
            .drop("__fp", "__rn"))


# --------------------------------------------------------------------------
# X2: MinHash + LSH near-dup
# --------------------------------------------------------------------------

def _affine_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
            for _ in range(num_perm)]


def hashes_from_shingles(sh_col) -> Column:
    """Per-shingle base hashes (xxhash64 mod p) from an existing shingle
    array column — lets pipelines shingle the corpus ONCE and derive both
    the MinHash path and the exact-verify path from the same cached frame."""
    sh = F.col(sh_col) if isinstance(sh_col, str) else sh_col
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def base_hashes(text_col="text", shingle_n: int = 3) -> Column:
    """Per-shingle base hashes (xxhash64 mod p) — materialize this ONCE as a
    column before fanning out to permutations; inlining it under each
    permutation re-tokenizes the document num_perm times and blows the
    expression past codegen limits (measured 15x slowdown)."""
    return hashes_from_shingles(shingles(text_col, shingle_n))


def minhash_from_hashes(hashes_col, num_perm: int = 32,
                        seed: int = 42) -> Column:
    """MinHash signature (array<bigint>, length num_perm) from base hashes
    in ONE fold: for each shingle hash, all num_perm running minima update
    via zip_with with the affine (a, b) parameters as literal arrays. The
    input array is evaluated exactly once per row regardless of projection
    collapsing, and the per-element work is pure codegen'd arithmetic.
    Empty documents get an all-p signature (the fold's init).

    Built Columns are memoized for string-named inputs (same rationale as
    similarity._SIG_MEMO: the literal-array + nested-lambda construction
    is dozens of py4j round-trips per call; unresolved Columns are
    immutable, so reuse across frames is safe)."""
    if isinstance(hashes_col, str):
        return memoized(_MINHASH_MEMO, (hashes_col, num_perm, seed),
                        lambda: _build_minhash(F.col(hashes_col), num_perm,
                                               seed))
    return _build_minhash(hashes_col, num_perm, seed)


def _build_minhash(h, num_perm: int, seed: int) -> Column:
    params = _affine_params(num_perm, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    idx = F.sequence(F.lit(1), F.lit(num_perm))
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_perm)
    return F.aggregate(
        h, init,
        lambda acc, x: F.zip_with(
            acc, idx,
            lambda m, i: F.least(m, F.pmod(
                F.element_at(a_arr, i) * x + F.element_at(b_arr, i),
                F.lit(_MERSENNE)))))


_MINHASH_MEMO: dict = {}


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 32,
                           bands: int = 16, shingle_n: int = 3,
                           seed: int = 42,
                           bucket_cap: int | None = None,
                           materialize: bool = True) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash.

    ``bands`` bands of ``num_perm/bands`` rows; two docs are candidates when
    any band hashes equal. With 16 bands x 2 rows, detection probability at
    Jaccard 0.8 is 1-(1-0.8^2)^16 ≈ 0.9998 — tuned for high recall so the
    exact-verify stage determines the final answer.

    Scale shape: explode to ``bands`` rows/doc, shuffle on (band, band_hash),
    self-join inside buckets. ``materialize`` persists the tiny banded-key
    frame so the corpus is scanned and signed once, not once per join side.
    Hot buckets (boilerplate docs) are the skew
    risk — AQE skew-join handles moderate cases; ``bucket_cap`` handles the
    pathological ones by dropping buckets with more than cap members before
    the join (a bucket of b docs yields b*(b-1)/2 pairs — one million
    identical boilerplate pages would otherwise emit 5e11 candidate rows in
    a single task's bucket). Docs in a dropped bucket can still pair via
    their other bands; truly boilerplate-identical docs belong to the exact
    dedup pass (X1), which handles them in one linear shuffle.
    """
    sets_df = df.select(F.col(id_col).alias("id"),
                        shingles(text_col, shingle_n).alias("sh"))
    return _lsh_candidates_from_sets(sets_df, num_perm, bands, seed,
                                     bucket_cap, materialize)


def _band_rows(sets_df: DataFrame, num_perm: int, bands: int,
               seed: int) -> DataFrame:
    """(id, band, bhash) LSH band keys from a (id, sh) shingle-set
    frame — the rows an LSH index stores and a lookup joins on."""
    assert num_perm % bands == 0, "num_perm must be divisible by bands"
    rows_per_band = num_perm // bands
    sig = (sets_df
           .select("id", hashes_from_shingles("sh").alias("__bh"))
           .select("id", minhash_from_hashes("__bh", num_perm, seed)
                   .alias("sig")))
    return sig.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"))),
                ).alias("bhash")))).alias("bk")
    ).select("id", "bk.band", "bk.bhash")


def _lsh_candidates_from_bands(banded: DataFrame,
                               bucket_cap: int | None) -> DataFrame:
    """Candidate pairs from an (id, band, bhash) band-row frame
    (possibly cached): bucket-cap filter, then the band-key self-join.
    The cap counts rows of THIS frame — callers that pre-filter the
    band rows (e.g. to a crawl's surviving docs) get caps over exactly
    the population being self-joined, same as recomputing from sets."""
    if bucket_cap is not None:
        small = (banded.groupBy("band", "bhash")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= bucket_cap)
                 .select("band", "bhash"))
        banded = banded.join(small, ["band", "bhash"], "left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bhash") == F.col("r.bhash"))
                      & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct())


def _lsh_candidates_from_sets(sets_df: DataFrame, num_perm: int, bands: int,
                              seed: int, bucket_cap: int | None,
                              materialize: bool) -> DataFrame:
    """Candidates from a (id, sh) shingle-set frame (possibly cached)."""
    banded = _band_rows(sets_df, num_perm, bands, seed)
    if materialize:
        # spread (conditionally) before caching: if the bucket self-join
        # broadcasts one side, its parallelism is the stream side's
        # partition count (see similarity.embedding_near_duplicates —
        # measured 20x there)
        banded = _materialized(_spread(banded))
    return _lsh_candidates_from_bands(banded, bucket_cap)


def _jaccard_verify_sets(sets_df: DataFrame, pairs: DataFrame,
                         threshold: float) -> DataFrame:
    """Exact Jaccard over a (id, sh) frame for given candidate pairs."""
    a = sets_df.alias("a")
    b = sets_df.alias("b")
    joined = (pairs
              .join(a, pairs.id_a == F.col("a.id")).drop("id")
              .join(b, pairs.id_b == F.col("b.id")).drop("id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = (F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter)
    return (joined
            .select("id_a", "id_b",
                    F.when(union > 0, inter.cast("double") / union)
                     .otherwise(F.lit(0.0)).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def jaccard_verify(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", shingle_n: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs >=
    threshold. Output: (id_a, id_b, jaccard)."""
    sets_df = df.select(F.col(id_col).alias("id"),
                        shingles(text_col, shingle_n).alias("sh"))
    return _jaccard_verify_sets(sets_df, pairs, threshold)


def minhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", threshold: float = 0.8,
                            num_perm: int = 32, bands: int = 16,
                            shingle_n: int = 3, seed: int = 42,
                            bucket_cap: int | None = None,
                            materialize: bool = True) -> DataFrame:
    """X2 end-to-end: LSH candidates -> exact Jaccard verify -> pairs
    (id_a, id_b, jaccard) with jaccard >= threshold.

    The corpus is shingled ONCE: with ``materialize`` the (id, shingles)
    frame is cached and feeds signature generation, both bucket-join sides,
    and both exact-verify sides — five consumers, one tokenize pass. The
    uncached path (materialize=False) trades 3 extra corpus scans for zero
    storage; at 100 TB prefer the cache (shingle arrays spill to local disk,
    still far cheaper than re-tokenizing the corpus)."""
    sets_df = df.select(F.col(id_col).alias("id"),
                        shingles(text_col, shingle_n).alias("sh"))
    if materialize:
        sets_df = _materialized(sets_df)
    cands = _lsh_candidates_from_sets(sets_df, num_perm, bands, seed,
                                      bucket_cap, materialize)
    return _jaccard_verify_sets(sets_df, cands, threshold)


# --------------------------------------------------------------------------
# X2b: n-gram Jaccard (exact, inverted-index join)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.8,
                        doc_freq_cap: int | None = None,
                        materialize: bool = True) -> DataFrame:
    """Exact all-pairs Jaccard >= threshold without a cartesian product:
    candidate pairs come from an inverted-index self-join (any pair with
    Jaccard > 0 shares at least one shingle), counted per pair, then the
    Jaccard is computed from intersection counts and set sizes.

    Scale: the explode-join shuffles on shingle value; common shingles fan
    out quadratically (a shingle in d docs contributes d*(d-1)/2 join rows).
    ``doc_freq_cap`` bounds the blowup by dropping shingles whose document
    frequency exceeds the cap BEFORE the self-join (stopword-like shingles
    carry no dedup signal). With a cap the result is a high-recall
    approximation: a pair is missed only if ALL of its shared shingles are
    above the cap — for near-dup thresholds (>= 0.8) that requires the pair
    to consist almost entirely of boilerplate, which is exactly the content
    a dedup pipeline wants weighted down. Jaccard is still computed against
    the FULL set sizes, so reported similarity is never inflated.
    """
    sets_df = (df.select(F.col(id_col).alias("id"),
                         shingles(text_col, shingle_n).alias("sh"))
               .withColumn("sh_size", F.size("sh")))
    if materialize:
        # cache the compact array form, not the exploded index: the corpus
        # is tokenized once and each consumer (df-cap pass + both join
        # sides) re-explodes from cache, which is pure codegen.
        sets_df = _materialized(sets_df)
    inv = sets_df.select("id", "sh_size", F.explode("sh").alias("g"))
    if doc_freq_cap is not None:
        # anti-join against the shingles ABOVE the cap, not semi-join against
        # those below: the hot set is tiny (boilerplate head), so AQE
        # broadcasts it and the inverted index never shuffles for the
        # filter; the semi-join formulation shuffles the full index against
        # the (large) rare-shingle set. The df count itself moves only
        # (g, partial count) thanks to map-side combine.
        hot = (inv.groupBy("g")
               .agg(F.count(F.lit(1)).alias("__df"))
               .filter(F.col("__df") > doc_freq_cap)
               .select("g"))
        inv = inv.join(hot, "g", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (a.join(b, (F.col("a.g") == F.col("b.g"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.col("a.sh_size").alias("size_a"),
                      F.col("b.sh_size").alias("size_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    jac = (F.col("n_inter").cast("double")
           / (F.col("size_a") + F.col("size_b") - F.col("n_inter")))
    return (inter.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# --------------------------------------------------------------------------
# X2e: winnowing near-dup (rolling-hash fingerprints -> inverted index)
# --------------------------------------------------------------------------

def winnow_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8,
                           window: int = 4, min_shared: int = 2,
                           doc_freq_cap: int | None = None) -> DataFrame:
    """Partial-overlap near-dup candidates via winnowing fingerprints
    (text.with_winnow_fingerprints): docs sharing >= ``min_shared``
    fingerprints. Catches copied PASSAGES (any shared substring of length
    >= k + window - 1 guarantees a shared fingerprint) that whole-document
    schemes miss.

    Same scale shape as the n-gram inverted index: explode fingerprints,
    self-join on the fingerprint key (shuffle bounded by posting-list
    sizes), count shared per pair. ``doc_freq_cap`` anti-joins the
    boilerplate head (fingerprints present in more than cap docs — licence
    blocks, navigation chrome) before the quadratic fan-out, exactly like
    the x14 df-cap. Output: (id_a, id_b, n_shared).
    """
    from openapc_olap_spark.operators import text as _text

    fps = (_text.with_winnow_fingerprints(df, text_col, k, window)
           .select(F.col(id_col).alias("id"),
                   F.explode("fingerprints").alias("fp")))
    if doc_freq_cap is not None:
        hot = (fps.groupBy("fp")
               .agg(F.count(F.lit(1)).alias("__df"))
               .filter(F.col("__df") > doc_freq_cap)
               .select("fp"))
        fps = fps.join(hot, "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


# --------------------------------------------------------------------------
# X2c: SimHash
# --------------------------------------------------------------------------

def token_hashes(text_col="text", method: str = "xxhash64") -> Column:
    """Per-token hash array — materialize once before the 64-bit vote
    (inlining it under each bit re-tokenizes 64 times; see base_hashes).

    ``method``: "xxhash64" (default, one JVM hash per token) or "md5" — a
    portable 60-bit hash (first 15 hex chars of the MD5 digest, so the
    value fits a signed long) with an exact cross-engine twin:
    DuckDB ``('0x' || substr(md5(t), 1, 15))::BIGINT`` produces identical
    values, which puts SimHash under the hash-match oracle gate. MD5 costs
    a full digest per token; keep xxhash64 for production pipelines."""
    if method == "md5":
        def _h(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    elif method == "xxhash64":
        def _h(t):
            return F.xxhash64(t)
    else:
        raise ValueError(f"unknown token hash method: {method!r}")
    return F.transform(tokens(text_col), _h)


def simhash_from_hashes(hashes_col) -> Column:
    """64-bit SimHash as bigint from materialized token hashes: for each bit
    position the sign of the (+1/-1) vote sum sets the output bit.

    Two nested folds with CONSTANT-SIZE expression trees: one pass over the
    token hashes accumulating a 64-counter array (bit tests via literal mask
    array — Column-valued shift counts aren't expressible), then a fold over
    the counters assembling the signature MSB-first. The earlier 64-term
    formulation (one size(filter(...)) per bit) produced identical bits but
    an expression tree Catalyst re-analyzed in ~1.5 s per plan — 8x slower
    end-to-end than this at sf0.1. No shuffle, no UDF. Built Columns are
    memoized for string-named inputs (see _MINHASH_MEMO rationale)."""
    if isinstance(hashes_col, str):
        return memoized(_SIMHASH_MEMO, hashes_col,
                        lambda: _build_simhash(F.col(hashes_col)))
    return _build_simhash(hashes_col)


def _build_simhash(h) -> Column:
    n = F.size(h)
    masks = F.array(*[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
                      for i in range(64)])
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    counts = F.aggregate(
        h, F.array_repeat(zero, 64),
        lambda acc, x: F.zip_with(
            acc, masks,
            lambda c, m: c + F.when(x.bitwiseAND(m) != 0, one)
                              .otherwise(zero)))
    return F.aggregate(
        F.reverse(counts), zero,
        lambda acc, c: F.shiftleft(acc, 1).bitwiseOR(
            F.when(c * 2 > n, one).otherwise(zero)))


_SIMHASH_MEMO: dict = {}


def simhash(text_col="text") -> Column:
    """Convenience single-expression form (fine for small frames; prefer
    materializing token_hashes + simhash_from_hashes in pipelines)."""
    return simhash_from_hashes(token_hashes(text_col))


def _simhash_arrow():
    """Arrow-vectorized SimHash (same bits as ``simhash_from_hashes``,
    verified bit-identical at sf0.1): per Arrow batch, numpy unpacks each
    doc's token-hash words to a (tokens, 64) bit matrix, majority-votes the
    columns, and repacks — ~3.5x faster than the interpreted HOF fold and
    the per-partition work parallelizes the same way. Built lazily so
    importing the module never registers a UDF. Little-endian bit packing
    matches the JVM long layout on all supported platforms."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_vec(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        for j, arr in enumerate(hs):
            a = np.asarray(arr, dtype=np.int64)
            if a.size == 0:
                out[j] = 0    # empty doc: no votes -> all bits 0
                continue
            bits = np.unpackbits(a.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little")
            sig_bits = (bits.sum(axis=0) * 2 > a.size).astype(np.uint8)
            out[j] = np.packbits(sig_bits, bitorder="little").view(np.int64)[0]
        return pd.Series(out)

    return simhash_vec


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            max_hamming: int = 3,
                            materialize: bool = True,
                            method: str = "arrow",
                            token_hash: str = "xxhash64") -> DataFrame:
    """SimHash near-dup pairs with hamming <= max_hamming.

    Candidates via 4x16-bit chunk banding (pigeonhole: hamming <= 3 implies
    at least one of 4 chunks equal), then exact hamming verify.
    Output: (id_a, id_b, hamming).

    ``materialize`` persists the 16-byte/doc signature frame so the corpus
    is tokenized and signed once (not once per self-join side; unmaterialized
    the signature expression additionally inlines under each of the 4 chunk
    projections — 8 corpus sign passes, measured 10x slower at sf0.1).

    ``method``: "arrow" (default) signs with the vectorized numpy UDF;
    "expr" uses the pure-Catalyst fold (zero-UDF, same bits) for callers
    that must keep the whole plan JVM-side; "both" computes BOTH and
    asserts bit-identity in-plan (``assert_true`` per row, distributed) —
    the self-certifying mode oracle gates run, so the vectorized path is
    hash-certified too, not just test-asserted.

    ``token_hash``: per-token hash family (see ``token_hashes``); "md5"
    yields a DuckDB-replicable signature for oracle-gated runs.
    """
    base = df.select(F.col(id_col).alias("id"),
                     token_hashes(text_col, method=token_hash).alias("__th"))
    if method == "both":
        two = base.select("id", _simhash_arrow()("__th").alias("__sig_a"),
                          simhash_from_hashes("__th").alias("__sig_e"))
        verified = F.coalesce(
            F.assert_true(F.col("__sig_a") == F.col("__sig_e"),
                          F.lit("simhash arrow/expr bit mismatch"))
            .cast("long"),
            F.col("__sig_a"))
        sig = two.select("id", verified.alias("sig"))
    else:
        sig_col = (_simhash_arrow()("__th") if method == "arrow"
                   else simhash_from_hashes("__th"))
        sig = base.select("id", sig_col.alias("sig"))
    if materialize:
        # spread (conditionally) before caching (broadcast-regime
        # stream-side parallelism; see minhash banding above)
        sig = _materialized(_spread(sig))
    chunks = sig.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("ckey"))
            for i in range(4)])).alias("c")
    ).select("id", "sig", "c.chunk", "c.ckey")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.ckey") == F.col("b.ckey"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"))
             .distinct())
    return pairs.filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# X2f: duplicate-group resolution (connected components over near-dup pairs)
# --------------------------------------------------------------------------

def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 20,
                         method: str = "label") -> DataFrame:
    """Resolve the connected components of an undirected pair graph:
    output (id, comp) where ``comp`` is the MINIMUM node id reachable from
    ``id`` — the canonical representative every dedup pipeline needs after
    pair generation (pairs alone don't say which doc to keep when dups
    chain a-b, b-c).

    Two physical algorithms behind one contract (``method=``, the
    kmeans/pca knob pattern — VERDICT r08 #3):

    - ``"label"`` (default, the oracle-replay mode): iterative min-label
      propagation with pointer-jumping compression. Each round, (1)
      every node offers its current label to its neighbours and labels
      re-aggregate by min (one join + one map-side combined min-agg on
      node keys), then (2) labels shortcut through their own target
      (comp -> comp(comp)), so the distance a component min travels
      roughly doubles per round — O(log diameter) rounds; near-dup
      graphs (near-cliques) finish in 2-3. Every round touches the FULL
      node-label frame.
    - ``"star"`` — alternating large-star/small-star (Kiveris et al.
      2014, "Connected Components in MapReduce and Beyond"): rewrites
      the EDGE set itself toward a star forest rooted at component
      minima, converging in O(log^2 n) rounds independent of diameter,
      with per-round volume bounded by the CURRENT edge count (large-star
      emits <= |E| edges, small-star <= |E| + |V|). On long-chain graphs
      — pathological for label propagation's per-round full-frame
      traffic — star's edge frame collapses geometrically instead
      (SCALING.md r09 measurement).
    - ``"both"`` — the self-certifying gate: runs BOTH, asserts the
      (id, comp) maps are identical, returns the label-mode frame.

    The edge frame is persisted once and reused every round; per-round
    frames are localCheckpoint-ed so the plan stays constant-size across
    rounds (the standard iterative-DataFrame lineage guard). Raises
    after ``max_iter`` rounds without convergence rather than returning
    silently-wrong labels.
    """
    if method not in ("label", "star", "both"):
        raise ValueError(f"method must be 'label', 'star' or 'both', "
                         f"got {method!r}")
    if method == "star":
        return _cc_star(edges, src, dst, max_iter)
    if method == "both":
        lab = _materialized(connected_components(edges, src, dst,
                                                 max_iter, "label"))
        star = _cc_star(edges, src, dst, max_iter)
        diff = (lab.join(star.withColumnRenamed("comp", "__sc"),
                         ["id"], "full")
                .filter(F.col("comp").isNull() | F.col("__sc").isNull()
                        | (F.col("comp") != F.col("__sc")))
                .count())
        if diff:
            raise AssertionError(
                f"connected_components label/star mismatch on {diff} "
                f"node(s) — kernel bug, not data")
        return lab
    sym = (edges.select(F.col(src).cast("long").alias("a"),
                        F.col(dst).cast("long").alias("b"))
           .union(edges.select(F.col(dst).cast("long").alias("a"),
                               F.col(src).cast("long").alias("b")))
           .distinct())
    sym = _materialized(sym)
    # localCheckpoint (not persist) each round: persisting caches DATA but
    # the logical plan still nests one join+union+agg deeper per round —
    # analysis cost and driver heap grow until they blow up (~30 rounds
    # OOMs a 4 GB driver even on toy graphs). Checkpointing truncates the
    # lineage, keeping every round's plan constant-size; the re-compute-
    # on-executor-loss caveat is confined to this iterative loop.
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint())
    try:
        for _ in range(max_iter):
            # neighbour offers: node b receives a's current label
            offers = (sym.join(labels, sym["a"] == labels["id"])
                      .select(F.col("b").alias("id"), F.col("comp")))
            # NOT checkpointed (round 14, guide §2.4): the self-join
            # below consumes prop twice, but both consumers sit in ONE
            # localCheckpoint job, so the propagation shuffle is written
            # once and re-read via ReusedExchange — only the post-
            # shuffle min-agg runs per consumer. One driver action per
            # round instead of two.
            prop = (labels.select("id", "comp").union(offers)
                    .groupBy("id").agg(F.min("comp").alias("comp")))
            # pointer-jumping compression (Wyllie shortcutting): follow
            # comp -> comp(comp) once per round. A label value is always
            # itself a node id, so the self-join resolves; labels only
            # ever decrease toward the component min, and comp(comp) is
            # reachable whenever comp is, so correctness is unchanged
            # while the distance a min travels per round roughly doubles
            # — convergence drops from O(diameter) to O(log diameter)
            # rounds (a 30-node chain: 30 rounds -> 6).
            jump = prop.select(F.col("id").alias("__jid"),
                               F.col("comp").alias("__jcomp"))
            new_labels = (prop
                          .join(jump, prop["comp"] == jump["__jid"], "left")
                          .select("id",
                                  F.coalesce(F.col("__jcomp"),
                                             F.col("comp")).alias("comp"))
                          .localCheckpoint())
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.comp") != F.col("o.comp"))
                       .count())
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(raise max_iter; with pointer-jumping the bound is "
            f"~log2(diameter) + constant)")
    finally:
        sym.unpersist()


def _cc_star(edges: DataFrame, src: str, dst: str,
             max_iter: int) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014): each
    round rewrites the canonical undirected edge set

    - large-star(u): every neighbour v > u re-attaches to
      m = min(N(u) + {u})  — emits (m, v), one edge per directed pair
      with v > u, so |E'| <= |E|;
    - small-star(u): every neighbour v < u (and u itself) re-attaches
      to m = min(N^-(u)) — emits <= |E| + |V| edges;

    until the set is stable, i.e. a star forest rooted at component
    minima. Neither phase ever drops a node: a local-min u keeps
    appearing via (x, m(u)=u) in large-star, and a node with any edge
    appears in its greater endpoint's small-star emission. Per-round
    cost is two (groupBy-min + join-back + distinct) passes over the
    CURRENT edge frame — which shrinks geometrically on long chains,
    where label propagation keeps shuffling the full node-label frame
    every round. localCheckpoint per phase keeps the plan
    constant-size (the label-mode lineage discipline)."""
    raw = (edges.select(F.col(src).cast("long").alias("u"),
                        F.col(dst).cast("long").alias("v"))
           .localCheckpoint())
    cur = (raw.filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("a"),
                   F.greatest("u", "v").alias("b"))
           .distinct()
           .localCheckpoint())
    # the u != v filter drops SELF-LOOP edges; a node whose only edge is a
    # self-loop would vanish from the output, while label mode keeps it
    # (sym retains (a,a) -> (a, comp=a)). The contract is "every node in
    # the edge frame gets a comp row", so capture the filtered-away node
    # set up front and union it back as singleton components at the end
    # (ADVICE r09). One extra anti-join over the (small) node set.
    loop_only = (raw.select(F.col("u").alias("id"))
                 .union(raw.select(F.col("v").alias("id")))
                 .distinct()
                 .join(cur.select(F.col("a").alias("id"))
                       .union(cur.select(F.col("b").alias("id")))
                       .distinct(),
                       ["id"], "left_anti")
                 .withColumn("comp", F.col("id"))
                 .localCheckpoint())
    for _ in range(max_iter):
        # -- large-star: (v, min(N(u) + {u})) for v > u
        dirn = cur.union(cur.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
        mins = (dirn.groupBy("a").agg(F.min("b").alias("__mb"))
                .select("a", F.least("__mb", F.col("a")).alias("__m")))
        # m <= u < v, so (m, v) is already canonical and never a loop
        big = (dirn.filter(F.col("b") > F.col("a"))
               .join(mins, ["a"])
               .select(F.col("__m").alias("a"), "b")
               .distinct()
               .localCheckpoint())
        # -- small-star: (v, min(N^-(u))) for v < u, plus (u, min)
        dirn2 = big.union(big.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
        minus = dirn2.filter(F.col("b") < F.col("a"))
        mins2 = minus.groupBy("a").agg(F.min("b").alias("__m"))
        sm = (minus.join(mins2, ["a"])
              .select(F.col("__m").alias("na"), F.col("b").alias("nb"))
              .filter(F.col("na") != F.col("nb"))      # v == m loop
              .union(mins2.select(F.col("__m").alias("na"),
                                  F.col("a").alias("nb")))
              .distinct()
              .select(F.col("na").alias("a"), F.col("nb").alias("b"))
              .localCheckpoint())
        # set equality in ONE job (both frames are distinct): a full
        # outer join row with either side missing means the edge sets
        # differ — replaces anti-join count + two counts (round 14)
        stable = (cur.withColumn("__c", F.lit(1))
                  .join(sm.withColumn("__s", F.lit(1)), ["a", "b"],
                        "full_outer")
                  .filter(F.col("__c").isNull() | F.col("__s").isNull())
                  .count() == 0)
        cur = sm
        if stable:
            # star forest: every edge is (component-min, member); plus the
            # self-loop-only singletons filtered out before the loop
            centers = (cur.select(F.col("a").alias("id")).distinct()
                       .withColumn("comp", F.col("id")))
            leaves = (cur.groupBy(F.col("b").alias("id"))
                      .agg(F.min("a").alias("comp")))
            return leaves.unionByName(centers).unionByName(loop_only)
    raise RuntimeError(
        f"connected_components(method='star') did not converge in "
        f"{max_iter} rounds (the Kiveris bound is O(log^2 n) — raise "
        f"max_iter)")


def duplicate_groups(pairs: DataFrame, src: str = "id_a",
                     dst: str = "id_b", method: str = "label") -> DataFrame:
    """Per-group summary of the near-dup pair graph: one row per
    connected component — (canon_id, n_members), canon_id = min doc id.
    Feed any pair family (x02/x03/x04/x06) in; groups say which docs
    collapse together and which single doc survives. ``method`` selects
    the CC algorithm (label / star / both — see connected_components)."""
    comp = connected_components(pairs, src, dst, method=method)
    return (comp.groupBy(F.col("comp").alias("canon_id"))
            .agg(F.count(F.lit(1)).alias("n_members")))


def resolve_duplicates(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       src: str = "id_a", dst: str = "id_b",
                       method: str = "label") -> DataFrame:
    """Attach ``canon_id`` to every row of ``df``: the component
    representative for docs in the pair graph, the doc's own id otherwise
    (singletons). ``df.filter(col(id_col) == col('canon_id'))`` is then
    the deduplicated corpus — one broadcast-friendly left join against
    the (tiny relative to the corpus) component map."""
    # collision-proof aliases: dropping a bare 'id'/'comp' would also
    # drop (or clash with) same-named columns of the caller's frame
    comp = connected_components(pairs, src, dst, method=method).select(
        F.col("id").alias("__cc_id"), F.col("comp").alias("__cc_comp"))
    return (df.join(comp, df[id_col] == comp["__cc_id"], "left")
            .withColumn("canon_id",
                        F.coalesce(F.col("__cc_comp"), F.col(id_col)))
            .drop("__cc_id", "__cc_comp"))


def incremental_dedup(new_df: DataFrame, seen_fps: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      fp_col: str = "fp",
                      bloom_bits: int | None = None,
                      keep_fp: bool = False) -> DataFrame:
    """Incremental-ingest dedup: keep rows of ``new_df`` whose normalized
    content fingerprint (text.fingerprint) is NOT in the historical
    fingerprint index ``seen_fps`` (a frame with column ``fp_col``) —
    the "dedup this crawl against all previous crawls" step.

    Scale shape: the exact check is a left-anti join against the index.
    With ``bloom_bits`` set, a bloom sketch of the index splits the new
    corpus FIRST: bloom-negative rows are *provably* absent from the
    index (no false negatives) and bypass the join entirely, so the
    anti-join's shuffle carries only the bloom-positive sliver —
    duplicates plus the FPR. For a crawl that is mostly novel content,
    that is the difference between shuffling everything and shuffling
    almost nothing. Results are identical with or without the bloom.

    ``keep_fp=True`` keeps the computed fingerprint as a ``__fp``
    column (round 14): commit paths that must land the survivors'
    fingerprints re-select the column instead of re-normalizing and
    re-hashing the surviving text a second time.
    """
    from openapc_olap_spark.operators import bloom as _bloom

    fp = fingerprint(text_col)
    marked = new_df.withColumn("__fp", fp)
    seen = seen_fps.select(F.col(fp_col).alias("__fp"))
    if bloom_bits is None:
        out = marked.join(seen, "__fp", "left_anti")
        # the equi-key anti-join hoists "__fp" to the front; re-select
        # the original order (+ __fp last) so both paths agree
        return out.select(*marked.columns) if keep_fp else out.drop("__fp")
    sketch = _bloom.bloom_build(seen, "__fp", num_bits=bloom_bits)
    might = _bloom.bloom_might_contain(F.col("__fp"), sketch)
    definitely_new = marked.filter(~might)
    candidates = marked.filter(might).join(seen, "__fp", "left_anti")
    out = definitely_new.unionByName(candidates)
    return out.select(*marked.columns) if keep_fp else out.drop("__fp")


def incremental_dedup_commit(new_df, store, crawl_seq: int,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             bloom_bits: int | None = None):
    """Crawl-over-crawl dedup against a TRANSACTIONAL fingerprint store
    (sources/txn.TxnTable, VERDICT r09 #5): keep rows of ``new_df``
    whose normalized fingerprint is absent from the store's current
    snapshot (the same bloom-guarded anti-join as
    :func:`incremental_dedup`), then COMMIT the surviving fingerprints
    back as a bucketed partition-overwrite upsert keyed on ``fp`` with
    sequence ``crawl_seq``.

    The store is the "seen in any previous crawl" index as a real
    table instead of a rewrite-the-world parquet dir: a crashed run
    never publishes (orphan files only — re-run converges bitwise), a
    lost commit race re-merges against the winner, and only the
    buckets this crawl's fingerprints hash into are rewritten. The
    store must have been created over (fp, seq) rows bucketed by
    ``add_bucket(..., ["fp"], n)`` with ``meta={"n_buckets": n}`` —
    the bucket count is read back from the manifest so every crawl
    buckets identically. Returns the kept rows, MATERIALIZED before
    the commit so the returned frame is stable against the store's
    own advance."""
    from openapc_olap_spark.sources.txn import add_bucket

    n_buckets = store.snapshot().get("meta", {}).get("n_buckets")
    if not n_buckets:
        raise ValueError(
            "store manifest carries no meta.n_buckets — create the "
            "fingerprint store with TxnTable.create(..., "
            "meta={'n_buckets': n}) over add_bucket(df, ['fp'], n)")
    seen = store.read().select("fp")
    kept = _materialized(incremental_dedup(
        new_df, seen, id_col, text_col, "fp", bloom_bits, keep_fp=True))
    # the survivors' fingerprints come off the cached frame — same
    # deterministic expression, not a second normalize+hash pass over
    # the surviving text (round 14)
    fresh = (kept.select(F.col("__fp").alias("fp"))
             .distinct()
             .withColumn("seq", F.lit(crawl_seq).cast("long")))
    store.upsert(add_bucket(fresh, ["fp"], n_buckets), ["fp"], "seq")
    return kept.drop("__fp")


def incremental_near_dup_commit(new_df, band_store, shingle_store,
                                crawl_seq: int,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                threshold: float = 0.8,
                                num_perm: int = 32, bands: int = 16,
                                shingle_n: int = 3, seed: int = 42,
                                bucket_cap: int | None = None,
                                method: str = "label"):
    """Crawl-over-crawl NEAR-dup dedup against transactional stores —
    the approximate sibling of :func:`incremental_dedup_commit` for the
    "this crawl rewrote last crawl's pages with small edits" shape exact
    fingerprints cannot catch. Two sources/txn.TxnTable stores:

    - ``band_store``: the persistent LSH index — one (band, bhash,
      doc_id) row per band key of every accepted doc, keyed on all
      three (bucketed on them via add_bucket, meta.n_buckets);
    - ``shingle_store``: (doc_id, sh) shingle sets, keyed on doc_id —
      read ONLY for the candidate old docs an LSH lookup surfaces, so
      exact verification never scans the historical corpus.

    Contract (deterministic, SQL-replayable):

    1. drop new docs whose exact shingle Jaccard against ANY stored doc
       is >= ``threshold`` — candidates from the band-key equi-join
       against the stored index, verified exactly against the stored
       sets (the x03 LSH-candidates -> exact-verify discipline);
    2. resolve near-dup GROUPS among the remaining new docs (the
       in-batch pair graph -> connected components, ``method`` as in
       :func:`connected_components`) to the min-id survivor;
    3. commit the survivors' band rows and shingle sets as last-wins
       upserts with seq ``crawl_seq`` — idempotent on at-least-once
       replay (the incremental_dedup_commit discipline; land any
       downstream document output BEFORE these commits).

    Returns the surviving rows of ``new_df``, MATERIALIZED before the
    commits. At 100 TB: the lookup join carries band keys (16 longs per
    doc), the verify reads only candidate slivers from the id-bucketed
    shingle store, and the commits rewrite only touched buckets.

    Edge: documents too short to produce a shingle (fewer than
    ``shingle_n`` tokens) have an empty set — Jaccard against anything
    is 0, so they are invisible to near-dup matching in BOTH directions
    (kept every crawl). Route short docs through the exact
    :func:`incremental_dedup_commit` store instead."""
    from openapc_olap_spark.sources.txn import add_bucket

    n_band = band_store.snapshot().get("meta", {}).get("n_buckets")
    n_sh = shingle_store.snapshot().get("meta", {}).get("n_buckets")
    if not n_band or not n_sh:
        raise ValueError(
            "band_store/shingle_store manifests must carry "
            "meta.n_buckets (create over add_bucket'ed frames)")
    sets_df = _materialized(
        new_df.select(F.col(id_col).alias("id"),
                      shingles(text_col, shingle_n).alias("sh")))
    # band rows derive from the CACHED shingle sets (pure codegen over
    # cache — left lazy; each consumer re-runs only the minhash, never
    # the tokenize+shingle pass)
    newband = _band_rows(sets_df, num_perm, bands, seed)
    old = band_store.read().select("band", "bhash",
                                   F.col("doc_id").alias("__old"))
    cands = (newband.join(old, ["band", "bhash"])
             .select("id", "__old").distinct())
    oldsh = (shingle_store.read()
             .join(cands.select(F.col("__old").alias("doc_id"))
                   .distinct(), ["doc_id"], "left_semi")
             .select(F.col("doc_id").alias("__old"),
                     F.col("sh").alias("__osh")))
    inter = F.size(F.array_intersect(F.col("sh"), F.col("__osh")))
    union = F.size("sh") + F.size("__osh") - inter
    dup_ids = (cands.join(sets_df, ["id"]).join(oldsh, ["__old"])
               .filter(F.when(union > 0,
                              inter.cast("double") / union)
                       .otherwise(F.lit(0.0)) >= threshold)
               .select("id").distinct())
    rem = _materialized(new_df.join(
        dup_ids.withColumnRenamed("id", id_col), [id_col], "left_anti"))
    # in-batch pairs (round 14, guide §1.2): the band rows and shingle
    # sets minhash_near_duplicates would re-derive from rem's RAW TEXT
    # (a second full tokenize+shingle pass over the crawl) are instead
    # the cached sets' rows restricted to the remaining docs — same
    # values (deterministic per (id, sh)), and bucket caps count
    # exactly the population being self-joined. The rem-filtered band
    # frame is cached for the self-join's two sides, the pre-existing
    # minhash_near_duplicates discipline.
    remid = rem.select(F.col(id_col).alias("id"))
    rband = _materialized(_spread(
        newband.join(remid, ["id"], "left_semi")))
    pairs = _jaccard_verify_sets(
        sets_df, _lsh_candidates_from_bands(rband, bucket_cap),
        threshold)
    kept = _materialized(
        resolve_duplicates(rem, pairs, id_col=id_col, method=method)
        .filter(F.col(id_col) == F.col("canon_id")).drop("canon_id"))
    kid = kept.select(F.col(id_col).alias("id"))
    ksets = (sets_df.join(kid, ["id"], "left_semi")
             .select(F.col("id").alias("doc_id"), "sh")
             .withColumn("seq", F.lit(crawl_seq).cast("long")))
    # kept ⊆ rem, so the survivors' band rows are the CACHED rem-filtered
    # band frame restricted to the kept ids — deriving them from newband
    # instead re-ran the whole minhash lineage twice inside the upsert
    # (touched-bucket probe + write job; r14 session 2, guide §5)
    kband = (rband.join(kid, ["id"], "left_semi")
             .select("band", "bhash", F.col("id").alias("doc_id"))
             .withColumn("seq", F.lit(crawl_seq).cast("long")))
    # The two stores are independent (disjoint directories, UUID-staged
    # writes, atomic renames) and each upsert is idempotent on replay
    # with the same crawl_seq, so their commits overlap from two driver
    # threads (guide §2.6): each store's probe/write/publish chain fills
    # the other's scheduling tail instead of running serially after it.
    # Either single-store crash window (band without shingle set, or the
    # reverse) degrades the same way the serial order's window did — a
    # candidate invisible to exact verify until the crawl replays.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fsh = pool.submit(shingle_store.upsert,
                          add_bucket(ksets, ["doc_id"], n_sh),
                          ["doc_id"], "seq")
        fbd = pool.submit(
            band_store.upsert,
            add_bucket(kband, ["band", "bhash", "doc_id"], n_band),
            ["band", "bhash", "doc_id"], "seq")
        fsh.result()
        fbd.result()
    return kept
