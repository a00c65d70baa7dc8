"""URL canonicalization + URL-level dedup (SURVEY.md §2.9 X1/X4 family —
the first dedup a web-crawl training pipeline runs: the same page is
fetched under http/https, with/without ``www.``, with tracking params,
trailing slashes, fragments; CCNet/RefinedWeb dedup on the canonical
URL before ever touching content. Reference has no equivalent;
driver-mandated LLM-pipeline surface).

Everything is a single-scan Catalyst expression chain — no UDF, no
driver round-trip — so canonicalization runs inside whole-stage codegen
at 100 TB and the dedup itself is one canonical-key aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify a CLIENT, not a resource — dropped during
# canonicalization (the standard tracking-param strip list). Bare ``ref``
# is deliberately NOT here: it is semantic on many real sites (VCS branch
# refs, API resource selectors), so stripping it would conflate distinct
# resources; ``ref_src`` (the Twitter tracker) stays. Sites where ``ref``
# IS a tracker can pass their own list via ``tracking_param_re=``.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref_src)="


def canonical_url(url: Column | str,
                  tracking_param_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form of an absolute http(s) URL, as one expression:

    - scheme dropped (http/https serve the same resource), host
      lowercased, leading ``www.`` and default ports (:80/:443) stripped;
    - fragment dropped (never sent to the server);
    - query: tracking params removed (``TRACKING_PARAM_RE``), the rest
      SORTED (param order is not semantic) and re-joined; an emptied
      query drops its ``?``;
    - trailing ``/`` on the path stripped (but a bare host keeps none).

    Path case is preserved — paths ARE case-sensitive; only the
    scheme/host are case-folded.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    # split host+path from query before case-folding: only host folds
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.when(u.contains("?"),
                   F.regexp_replace(u, r"^[^?]*\?", "")).otherwise(F.lit(""))
    host = F.lower(F.regexp_replace(base, r"/.*$", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.when(base.contains("/"),
                  F.regexp_replace(base, r"^[^/]*", "")).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_re)))
    qs = F.when(F.size(kept) > 0,
                F.concat(F.lit("?"), F.array_join(kept, "&"))
                ).otherwise(F.lit(""))
    return F.concat(host, path, qs)


def url_duplicates(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id",
                   tracking_param_re: str = TRACKING_PARAM_RE) -> DataFrame:
    """Canonical-URL dedup report: one row per canonical URL fetched more
    than once — (canonical_url, kept_id, n_dups). ``kept_id`` is the min
    id (first fetch wins, the crawl convention). One map-side-combined
    aggregation on the canonical key; at 100 TB this is the cheapest
    dedup pass and runs before any content-level dedup."""
    return (df.select(canonical_url(url_col, tracking_param_re)
                      .alias("canonical_url"),
                      F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias("kept_id"),
                 F.count(F.lit(1)).alias("n_dups"))
            .filter(F.col("n_dups") > 1))


def dedup_by_url(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id",
                 tracking_param_re: str = TRACKING_PARAM_RE) -> DataFrame:
    """The filtering form: keep only each canonical URL's min-id row.
    Window-free: a (canonical, min_id) aggregate semi-joined back, so
    the heavy side is never sorted — the aggregate is tiny next to the
    corpus and AQE picks the join strategy."""
    canon = df.withColumn("__cu", canonical_url(url_col,
                                                tracking_param_re))
    keep = (canon.groupBy("__cu").agg(F.min(id_col).alias(id_col))
            .select("__cu", id_col))
    return canon.join(keep, ["__cu", id_col], "left_semi").drop("__cu")
