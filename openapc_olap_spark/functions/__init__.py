"""Scalar / column-function surface (SURVEY.md §2.8 + §2.9 column helpers).

One import point for every reusable Column-level function in the engine —
the §2.8 parity scalars (all pure Catalyst expressions, zero UDFs, so they
stay inside whole-stage codegen at any scale) plus the extension-operator
column primitives (text metrics, signatures, vector math).

Parity scalars (reference: assets_generator.py / springer_compact_coverage.py):
    strip_ror_prefix     E3  'https://ror.org/X' -> 'X' else 'NA'
    publication_key      E5  doi if present else euro-prefixed url key
    journal_id_from_doi  E14 DOI -> Springer journal id (regex + lstrip-0)

Extension primitives:
    text:      tokens, token_count, bpe_ish_token_count, detect_language,
               quality_score, punctuation_ratio, stopword_ratio,
               mean_token_length, fingerprint, shingles
    dedup:     token_hashes, simhash, simhash_from_hashes, hamming64,
               base_hashes, minhash_from_hashes
    vectors:   dot, norm, cosine
"""

from __future__ import annotations

from openapc_olap_spark.etl.coverage import journal_id_from_doi
from openapc_olap_spark.etl.openapc import publication_key, strip_ror_prefix
from openapc_olap_spark.operators.dedup import (
    base_hashes,
    hamming64,
    minhash_from_hashes,
    simhash,
    simhash_from_hashes,
    token_hashes,
)
from openapc_olap_spark.operators.similarity import cosine, dot, norm
from openapc_olap_spark.operators.text import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    mean_token_length,
    punctuation_ratio,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    # §2.8 parity scalars
    "strip_ror_prefix",
    "publication_key",
    "journal_id_from_doi",
    # text analysis
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "detect_language",
    "quality_score",
    "punctuation_ratio",
    "stopword_ratio",
    "mean_token_length",
    "fingerprint",
    "shingles",
    # dedup signatures
    "token_hashes",
    "simhash",
    "simhash_from_hashes",
    "hamming64",
    "base_hashes",
    "minhash_from_hashes",
    # vector math
    "dot",
    "norm",
    "cosine",
]
