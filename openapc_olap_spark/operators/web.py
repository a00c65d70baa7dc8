"""Web-corpus curation operators: URL parsing, registrable-domain
rollups, and domain blocklist filtering (SURVEY.md §2.9 X4 family —
driver-mandated LLM-pipeline surface; web pipelines like C4/RefinedWeb
filter and weight at DOMAIN granularity before any per-document pass).

All pure Catalyst expressions (regexp + string ops — no UDF): URL
structure is regular enough that one anchored regex per component beats
a parser UDF by the usual 10-100x, and keeps the scan inside
whole-stage codegen.

100 TB posture: per-domain rollups are one map-side-combined aggregation
at domain cardinality (millions, not billions); blocklists broadcast
(they are KB-MB scale); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes where the registrable domain needs THREE
# labels (example.co.uk, not co.uk). A pragmatic curated subset of the
# public-suffix list — real deployments swap in the full PSL as a
# broadcast table; the heuristic keeps the hot path join-free.
TWO_LEVEL_TLDS = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "co.jp", "ne.jp",
    "or.jp", "ac.jp", "go.jp", "com.au", "net.au", "org.au", "edu.au",
    "gov.au", "co.nz", "org.nz", "net.nz", "com.br", "org.br", "net.br",
    "co.in", "org.in", "net.in", "co.za", "org.za", "com.cn", "org.cn",
    "net.cn", "com.mx", "org.mx", "com.ar", "com.tr", "com.sg", "co.kr",
]

_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?([^:/?#]+)"


def url_host(col: str | Column = "url") -> Column:
    """Lowercased host of a URL ('' for unparseable input): the authority
    between scheme:// and the first of :port / path / query / fragment,
    with any userinfo@ stripped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _URL_RE, 1))


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic over a host expression: last two labels, or last
    three when the two-label suffix is a known two-level public suffix
    ('' propagates for empty hosts; bare/single-label hosts pass
    through)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # clamp starts to 1: slice() rejects start<1 even on branches a CASE
    # would never take for that row
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    return (F.when(n <= 2, host)
            .when(last2.isin(TWO_LEVEL_TLDS), last3)
            .otherwise(last2))


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``host`` and ``domain`` (registrable) columns."""
    host = url_host(url_col)
    return (df.withColumn("host", host)
            .withColumn("domain", registrable_domain(F.col("host"))))


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-registrable-domain corpus rollup: (domain, n_docs, n_hosts,
    total_tokens, mean_quality) — the table a curation pipeline ranks /
    caps / blocklists on. One aggregation at domain cardinality."""
    from openapc_olap_spark.operators import text as t

    return (with_domain(df, url_col)
            .withColumn("__toks", t.token_count(text_col))
            .withColumn("__q", t.quality_score(text_col))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.sum("__toks").alias("total_tokens"),
                 F.avg("__q").alias("mean_quality")))


def filter_blocklisted(df: DataFrame, blocklist: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """Drop documents whose registrable domain is blocklisted. The
    blocklist frame has one ``domain`` column; it broadcasts (blocklists
    are small) and the anti-join therefore adds no shuffle of ``df``."""
    return (with_domain(df, url_col)
            .join(F.broadcast(blocklist.select("domain")), ["domain"],
                  "left_anti")
            .drop("host", "domain"))
