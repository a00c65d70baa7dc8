"""Cube schemas — the reference's fixed TABLE_SCHEMAS re-declared for Spark.

Reference: assets_generator.py:68-176 (TABLE_SCHEMAS literal) and :232-249
(type map {"string": String(512), "float": Numeric, ...}). Every column is a
string except ``euro`` (float) — and in ``doi_lookup`` even euro is a string
(assets_generator.py:267). Missing value is the literal string "NA", never
NULL (§1.3 of SURVEY.md) — we keep that convention in the cube tables so
query results are bit-compatible with the reference's API.
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

# Core APC cube (assets_generator.py:85-106): 18 CSV columns + 2 derived
# (country, institution_ror appended by enrichment, :521-524).
APC_CSV_COLUMNS = [
    "institution", "period", "euro", "doi", "is_hybrid", "publisher",
    "journal_full_title", "issn", "issn_print", "issn_electronic", "issn_l",
    "license_ref", "indexed_in_crossref", "pmid", "pmcid", "ut", "url", "doaj",
]
APC_COLUMNS = APC_CSV_COLUMNS + ["country", "institution_ror"]

# BPC cube (assets_generator.py:69-84): books.
BPC_CSV_COLUMNS = [
    "institution", "period", "euro", "doi", "backlist_oa", "publisher",
    "book_title", "isbn", "isbn_print", "isbn_electronic", "license_ref",
    "indexed_in_crossref", "doab",
]
BPC_COLUMNS = BPC_CSV_COLUMNS + ["country"]

# Transformative agreements (assets_generator.py:155-175): APC-like + agreement,
# no euro in the cube schema (euro only gates the `combined` copy, :445-446).
TA_CSV_COLUMNS = APC_CSV_COLUMNS + ["agreement"]
TA_COLUMNS = [c for c in TA_CSV_COLUMNS if c != "euro"] + ["country"]

# DEAL cube (assets_generator.py:132-154): APC schema + opt_out.
DEAL_COLUMNS = APC_COLUMNS + ["opt_out"]

# Additional-costs cube (assets_generator.py:107-131): APC schema + 3 derived.
APC_AC_COLUMNS = APC_COLUMNS + ["cost_type", "cost_category", "publication_key"]

# Institutions enrichment dimension (assets_generator.py:704-721).
INSTITUTIONS_COLUMNS = [
    "institution", "institution_full_name", "institution_cubes_name",
    "ror_id", "continent", "country", "state",
]

# doi_lookup cube (assets_generator.py:263-271) — euro is a STRING here.
DOI_LOOKUP_COLUMNS = [
    "institution", "institution_ror", "institution_full_name", "euro",
    "period", "doi", "url",
]


def csv_schema(columns: list[str]) -> StructType:
    """All-string schema for a raw CSV (the reference's universal type)."""
    return StructType([StructField(c, StringType()) for c in columns])


def cube_schema(columns: list[str], float_euro: bool = True) -> StructType:
    """Cube-table schema: strings + float euro (unless doi_lookup-style)."""
    return StructType([
        StructField(c, DoubleType() if (c == "euro" and float_euro) else StringType())
        for c in columns
    ])
