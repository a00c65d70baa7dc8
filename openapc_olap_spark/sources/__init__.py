"""Source / reader surface (SURVEY.md §2.1).

One import point for every way data enters the engine:

    load_tables          driver testdata parquet (TPC-H-ish + documents /
                         embeddings / events), with the nanos-timestamp
                         session handling applied (S-scan)
    OpenAPCPipeline      OpenAPC CSV ingest -> derived cube tables (S1, and
                         the S4-S6 parquet / partitioned / manifest sinks)
    InputPaths           declarative CSV input layout for the pipeline
    load_coverage_stats  journal coverage JSON cache (S2)
    load_article_pubdates per-article pubdate JSON cache (S2)
    load_journal_ids     ISSN -> journal id JSON cache (S2)
    read_annual_csvs     Springer journal-catalog CSVs, year-tagged (T12)

The reference's HTTP fetch (S3) is intentionally out-of-engine: scraping is
a driver-side script concern; the engine consumes its JSON cache output and
exposes ``etl.coverage.unresolved_journal_ids`` as the refresh detector.

Streaming sources live in ``openapc_olap_spark.streaming`` (rate / file
``readStream`` twins of the batch event-window queries).
"""

from __future__ import annotations

from openapc_olap_spark.etl.coverage import (
    load_article_pubdates,
    load_coverage_stats,
    load_journal_ids,
    read_annual_csvs,
)
from openapc_olap_spark.etl.openapc import InputPaths, OpenAPCPipeline
from openapc_olap_spark.session import load_tables

__all__ = [
    "load_tables",
    "OpenAPCPipeline",
    "InputPaths",
    "load_coverage_stats",
    "load_article_pubdates",
    "load_journal_ids",
    "read_annual_csvs",
]
