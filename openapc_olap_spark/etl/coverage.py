"""Springer-Compact coverage pipeline (SURVEY.md §2.5 T3-T5, T12-T14, §2.4
E12/E14): builds the ``springer_compact_coverage`` cube.

Reference behavior re-expressed as DataFrame transforms:
- E12 Springer-only filter (springer_compact_coverage.py:168-170;
  assets_generator.py:471-472)
- E14 DOI -> Springer journal-id extraction: 11 regular prefixes slice
  ``doi[9:14].lstrip('0')``, 4 hardcoded irregulars, ISSN-keyed cache for
  the two non-extractable families (springer_compact_coverage.py:295-339);
  the landing-page scrape stays an out-of-engine ingest concern (S3) — here
  unresolved rows surface through ``unresolved_journal_ids`` (the
  fail-fast-parity check, cf. ValueError at :339).
- T4 pub-year resolution: cached article pubdate else row period
  (assets_generator.py:477-479)
- T3 per-(journal, year) article counts (assets_generator.py:481-486)
- T5 coverage-cache left join + zero-fill (assets_generator.py:495-509)
- T13/T14 cache-building helpers over SpringerLink CSV exports
  (springer_compact_coverage.py:247-276, 85-99)

The JSON caches are dict-of-dicts documents a few MB in size (dimension-side
metadata, 2,041 journals) — loaded driver-side and parallelized; fact-side
data (the TA table) never touches the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Regular prefixes whose DOIs embed the journal id at chars 10-14
# (springer_compact_coverage.py:311-312).
REGULAR_PREFIXES = ("10.1007/s", "10.3758/s", "10.1245/s", "10.1617/s",
                    "10.1186/s", "10.1208/s", "10.1365/s", "10.1038/s",
                    "10.1057/s", "10.2478/s", "10.1557/s")
# Irregular prefixes -> fixed ids (springer_compact_coverage.py:313-318).
IRREGULAR_IDS = {"10.14283": "42415", "10.1631": "11582",
                 "10.3938/jkps": "40042"}
# Families resolvable only via the ISSN-keyed cache / landing page
# (springer_compact_coverage.py:319-337).
CACHE_ONLY_PREFIXES = ("10.1140", "10.17269")


def journal_id_from_doi(doi="doi"):
    """E14 as a pure column expression: journal id for all locally-
    extractable DOIs, NULL for the cache-only families (callers fill those
    via the ISSN cache join — see ``with_journal_id``)."""
    d = F.col(doi) if isinstance(doi, str) else doi
    expr = F.lit(None).cast("string")
    # build backwards so earlier prefixes win, mirroring the if/elif chain
    for p in CACHE_ONLY_PREFIXES:
        expr = F.when(d.startswith(p), F.lit(None).cast("string")).otherwise(expr)
    for p, jid in IRREGULAR_IDS.items():
        expr = F.when(d.startswith(p), F.lit(jid)).otherwise(expr)
    regular = F.regexp_replace(F.substring(d, 10, 5), "^0+", "")
    for p in REGULAR_PREFIXES:
        expr = F.when(d.startswith(p), regular).otherwise(expr)
    return expr


def with_journal_id(df: DataFrame, journal_ids_df: DataFrame | None = None,
                    doi: str = "doi", issn: str = "issn") -> DataFrame:
    """Attach ``journal_id``: local extraction first, ISSN-cache broadcast
    join for the cache-only families."""
    out = df.withColumn("journal_id", journal_id_from_doi(doi))
    if journal_ids_df is not None:
        cache = F.broadcast(journal_ids_df.select(
            F.col("issn").alias("__issn"),
            F.col("journal_id").alias("__cached_jid")))
        out = (out.join(cache, out[issn] == cache["__issn"], "left")
               .withColumn("journal_id",
                           F.coalesce("journal_id", "__cached_jid"))
               .drop("__issn", "__cached_jid"))
    return out


def unresolved_journal_ids(df: DataFrame, doi: str = "doi") -> DataFrame:
    """Fail-fast parity: rows no local rule nor cache resolved (reference
    raises ValueError / scrapes the landing page). Empty == healthy."""
    is_springer = F.lit(False)
    for p in (REGULAR_PREFIXES + tuple(IRREGULAR_IDS) + CACHE_ONLY_PREFIXES):
        is_springer = is_springer | F.col(doi).startswith(p)
    return df.filter(F.col("journal_id").isNull() | ~is_springer)


# ---------------------------------------------------------------------------
# Cache loaders (dimension-side JSON documents -> small DataFrames)
# ---------------------------------------------------------------------------

_COVERAGE_SCHEMA = T.StructType([
    T.StructField("journal_id", T.StringType()),
    T.StructField("journal_full_title", T.StringType()),
    T.StructField("period", T.StringType()),
    T.StructField("num_journal_total_articles", T.DoubleType()),
    T.StructField("num_journal_oa_articles", T.DoubleType()),
])


def load_coverage_stats(spark: SparkSession, path: str) -> DataFrame:
    """coverage_stats.json: {journal_id: {title, years: {year: stats}}} ->
    one row per journal-year (the reference's nested loop,
    assets_generator.py:495-509)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    rows = [(jid, info["title"], year,
             float(stats["num_journal_total_articles"]),
             float(stats["num_journal_oa_articles"]))
            for jid, info in doc.items()
            for year, stats in info["years"].items()]
    return spark.createDataFrame(rows, _COVERAGE_SCHEMA)


def load_article_pubdates(spark: SparkSession, path: str) -> DataFrame:
    """article_pubdates.json: {journal_id: {doi: year}} -> (journal_id, doi,
    cached_pub_year)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    rows = [(jid, doi, year)
            for jid, dois in doc.items() for doi, year in dois.items()]
    return spark.createDataFrame(
        rows, ["journal_id", "doi", "cached_pub_year"])


def load_journal_ids(spark: SparkSession, path: str) -> DataFrame:
    """journal_ids.json: {issn: journal_id}."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    return spark.createDataFrame(list(doc.items()), ["issn", "journal_id"])


# ---------------------------------------------------------------------------
# The cube build (T3 + T4 + T5)
# ---------------------------------------------------------------------------

def springer_compact_coverage_cube(ta_df: DataFrame, coverage_df: DataFrame,
                                   pubdates_df: DataFrame,
                                   journal_ids_df: DataFrame | None = None
                                   ) -> DataFrame:
    """springer_compact_coverage: one row per cached journal-year with the
    TA article count joined in (0 when absent).

    Scale shape: TA facts shuffle once on (journal_id, pub_year) for the T3
    count; both joins are broadcast (caches are KB-MB dimension data), so
    the whole build is one shuffle regardless of TA size.
    """
    springer = ta_df.filter(F.col("publisher") == "Springer Nature")   # E12
    with_id = with_journal_id(springer, journal_ids_df)                # E14
    resolved = (with_id
                .join(F.broadcast(pubdates_df), ["journal_id", "doi"], "left")
                .withColumn("pub_year",
                            F.coalesce("cached_pub_year", "period")))  # T4
    counts = (resolved.groupBy("journal_id", F.col("pub_year").alias("period"))
              .agg(F.count(F.lit(1)).cast("double")
                   .alias("num_springer_compact_articles")))           # T3
    return (coverage_df
            .join(counts, ["journal_id", "period"], "left")            # T5
            .fillna(0.0, ["num_springer_compact_articles"])
            .select(
                F.col("period"),
                F.lit("Springer Nature").alias("publisher"),
                F.col("journal_full_title"),
                F.lit("TRUE").alias("is_hybrid"),
                "num_springer_compact_articles",
                "num_journal_total_articles",
                "num_journal_oa_articles"))


# ---------------------------------------------------------------------------
# Cache-building helpers over SpringerLink CSV exports (T12-T14)
# ---------------------------------------------------------------------------

def read_annual_csvs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """T12: union of per-year CSV exports; Spark's multi-file reader handles
    the keep-first-header-only concat natively
    (springer_compact_coverage.py:278-293)."""
    return spark.read.csv(paths, header=True, encoding="UTF-8")


def build_pubdates_map(journal_csv: DataFrame,
                       seq_col: str | None = None) -> DataFrame:
    """T13: ("Item DOI" -> "Publication Year") with last-wins dedup
    (springer_compact_coverage.py:247-276).

    last-wins must be deterministic under shuffles: an explicit ``seq_col``
    (export sequence number, ingest timestamp) is the 100 TB-safe contract —
    "file order" is not a property a distributed scan preserves. Without
    one, falls back to ``monotonically_increasing_id`` (partition-major ==
    file/row order for a single sequential read) and takes ``max_by``
    instead of the order-undefined ``F.last``."""
    seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    ordered = journal_csv.withColumn("__seq", seq)
    return (ordered.groupBy(F.col("Item DOI").alias("doi"))
            .agg(F.max_by("Publication Year", "__seq")
                 .alias("cached_pub_year")))


def upsert_last_wins(existing: DataFrame, updates: DataFrame,
                     keys: list[str], seq_col: str) -> DataFrame:
    """T15 incremental cache refresh, in-engine: merge a new batch of
    cache rows into the stored table with per-key last-wins on an explicit
    sequence column (export number, fetch timestamp).

    The reference rewrites its whole JSON cache on every run
    (springer_compact_coverage.py:52-66); at scale the cache lives as a
    keyed table and refresh is this one map-side-combined shuffle:
    union -> groupBy(keys) -> max_by(struct(seq, payload)) — the struct
    max makes ties on ``seq_col`` resolve deterministically by payload
    order instead of arrival order.
    """
    combined = existing.unionByName(updates)
    payload = [c for c in combined.columns if c not in keys]
    assert seq_col in payload, f"{seq_col} must be a non-key column"
    ordered = [seq_col] + [c for c in payload if c != seq_col]
    best = (combined.groupBy(*keys)
            .agg(F.max(F.struct(*ordered)).alias("__best")))
    return best.select(*keys,
                       *[F.col(f"__best.{c}").alias(c) for c in payload])


def hybrid_journals(catalog_csv: DataFrame) -> DataFrame:
    """T14: keep Open-Choice hybrid journals from a Springer catalog
    (springer_compact_coverage.py:85-99)."""
    return catalog_csv.filter(
        F.col("Open Access Option") == "Hybrid (Open Choice)")
