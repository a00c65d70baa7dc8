"""Coverage-cache refresh job (SURVEY.md §2.1 S3 — the out-of-engine ingest).

Re-expresses the reference's SpringerLink scrape
(``springer_compact_coverage.py:77-374``): walk the annual Springer catalog
CSVs, and for every "Hybrid (Open Choice)" journal-year not already cached,
fetch the search result pages, extract the total / OA article counts and the
journal title, and update the three JSON cache documents that the engine's
loaders (``openapc_olap_spark.etl.coverage.load_*``) consume:

- ``coverage_stats.json``    {journal_id: {title, years: {year: stats}}}
- ``article_pubdates.json``  {journal_id: {doi: pub_year}}
- ``journal_ids.json``       {issn: journal_id}

This is deliberately NOT a Spark job: it is a polite, sequential web scrape
of a few thousand journal pages (dimension-side metadata, KB-MB of JSON).
The 100 TB fact-side never flows through here — the engine joins these
caches as broadcast dimensions (see ``springer_compact_coverage_cube``).

HTTP is injected (``fetch`` callable) so tests drive the full update logic
with canned fixtures and no network; the default fetcher is stdlib urllib
with the reference's retry-on-503 behavior
(``springer_compact_coverage.py:355-360``).
"""

from __future__ import annotations

import argparse
import csv
import io
import json
import os
import re
from collections.abc import Callable

# Result-page extraction patterns (reference springer_compact_coverage.py:16-18)
SEARCH_RESULTS_COUNT_RE = re.compile(
    r'<h1 id="number-of-search-results-and-search-terms">\s*'
    r"<strong>(?P<count>[\d,]+)</strong>", re.IGNORECASE)
SEARCH_RESULTS_TITLE_RE = re.compile(
    r'<p class="title">\s*<a href="/journal/\d+">(?P<title>.*?)</a>',
    re.IGNORECASE | re.UNICODE)
JOURNAL_ID_RE = re.compile(
    r'<a href="/journal/(?P<journal_id>\d+)" title=".*?">', re.IGNORECASE)

# Search/CSV endpoints (reference springer_compact_coverage.py:22-24)
FULL_SEARCH_URL = ("https://link.springer.com/search?facet-journal-id={jid}"
                   "&query=&date-facet-mode=in&facet-start-year={year}"
                   "&facet-end-year={year}")
OA_SEARCH_URL = ("https://link.springer.com/search?facet-journal-id={jid}"
                 "&package=openaccessarticles&search-within=Journal&query="
                 "&date-facet-mode=in&facet-start-year={year}"
                 "&facet-end-year={year}")
CSV_EXPORT_URL = ("https://link.springer.com/search/csv?"
                  "date-facet-mode=between&search-within=Journal"
                  "&facet-journal-id={jid}&facet-start-year={year}"
                  "&facet-end-year={year}&query=")
LANDING_PAGE_URL = "https://doi.org/{doi}"

FetchFn = Callable[[str], str]


def default_fetch(url: str, max_retries: int = 5) -> str:
    """stdlib GET with the reference's retry-on-503 loop
    (springer_compact_coverage.py:355-360)."""
    from urllib.error import HTTPError
    from urllib.request import urlopen

    for attempt in range(max_retries):
        try:
            with urlopen(url) as resp:  # noqa: S310 - https URLs only
                return resp.read().decode("utf-8")
        except HTTPError as e:
            if e.code == 503 and attempt < max_retries - 1:
                continue   # SpringerLink signals throttling via 503
            raise
    raise RuntimeError("unreachable")


# ---------------------------------------------------------------------------
# Cache documents
# ---------------------------------------------------------------------------

def load_json(path: str) -> dict:
    if os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return {}


def dump_json(doc: dict, path: str) -> None:
    """Write sorted + indented, matching the reference's _shutdown format
    (springer_compact_coverage.py:57-66) so diffs stay reviewable."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, sort_keys=True, indent=4, separators=(",", ": "))


# ---------------------------------------------------------------------------
# Per-journal lookups
# ---------------------------------------------------------------------------

def journal_stats(fetch: FetchFn, journal_id: str, year: str,
                  oa: bool = False) -> dict:
    """(count, title) from one search result page
    (springer_compact_coverage.py:343-374). Raises ValueError when the page
    shape changed — the caller records and continues, reference parity."""
    url = (OA_SEARCH_URL if oa else FULL_SEARCH_URL).format(
        jid=journal_id, year=year)
    content = fetch(url)
    m = SEARCH_RESULTS_COUNT_RE.search(content)
    if not m:
        raise ValueError(f"no results count at {url}")
    count = int(m.group("count").replace(",", ""))
    title = None
    tm = SEARCH_RESULTS_TITLE_RE.search(content)
    if tm:
        title = tm.group("title")
    return {"count": count, "title": title}


def journal_pubdates(fetch: FetchFn, journal_id: str,
                     years: list[str]) -> dict[str, str]:
    """doi -> pub_year from the per-year CSV exports
    (springer_compact_coverage.py:247-293): later years win on duplicate
    DOIs, mirroring the engine-side ``build_pubdates_map`` contract."""
    out: dict[str, str] = {}
    for year in years:
        content = fetch(CSV_EXPORT_URL.format(jid=journal_id, year=year))
        for row in csv.DictReader(io.StringIO(content)):
            out[row["Item DOI"]] = row["Publication Year"]
    return out


def journal_id_from_landing_page(fetch: FetchFn, doi: str) -> str:
    """Resolve a cache-only-family DOI (10.1140/10.17269) via its landing
    page (springer_compact_coverage.py:320-337)."""
    content = fetch(LANDING_PAGE_URL.format(doi=doi))
    m = JOURNAL_ID_RE.search(content)
    if not m:
        raise ValueError(f"no journal id found on landing page of {doi}")
    return m.group("journal_id")


# ---------------------------------------------------------------------------
# The refresh driver
# ---------------------------------------------------------------------------

def refresh(catalog_dir: str, cache_dir: str, years: list[str],
            fetch: FetchFn = default_fetch,
            max_lookups: int | None = None,
            fetch_pubdates: bool = False) -> dict:
    """Update the cache documents from the annual catalog CSVs.

    Returns {"lookups": n, "errors": [msg, ...]} — reference parity with
    the LOOKUPS_PERFORMED counter + ERROR_MSGS report
    (springer_compact_coverage.py:49-50,226-245).
    """
    coverage_path = os.path.join(cache_dir, "coverage_stats.json")
    pubdates_path = os.path.join(cache_dir, "article_pubdates.json")
    coverage = load_json(coverage_path)
    pubdates = load_json(pubdates_path)
    lookups, errors = 0, []

    for year in years:   # fail before any lookup if a catalog is missing
        path = os.path.join(catalog_dir, f"{year}.csv")
        if not os.path.isfile(path):
            raise OSError(f"catalogue file {path} not found")

    for year in years:
        with open(os.path.join(catalog_dir, f"{year}.csv"),
                  encoding="utf-8") as f:
            for line in csv.DictReader(f):
                if max_lookups is not None and lookups >= max_lookups:
                    break
                if line["Open Access Option"] != "Hybrid (Open Choice)":
                    continue
                jid = line["product_id"]
                cached = coverage.get(jid, {}).get("years", {}).get(year)
                if cached and {"num_journal_total_articles",
                               "num_journal_oa_articles"} <= set(cached):
                    continue
                try:
                    total = journal_stats(fetch, jid, year, oa=False)
                    oa = journal_stats(fetch, jid, year, oa=True)
                except ValueError as e:
                    errors.append(f"journal {jid} ({line['Title']}): {e}")
                    continue
                lookups += 1
                entry = coverage.setdefault(
                    jid, {"title": total["title"] or line["Title"],
                          "years": {}})
                entry["years"][year] = {
                    "num_journal_total_articles": total["count"],
                    "num_journal_oa_articles": oa["count"],
                }
                if fetch_pubdates:
                    try:
                        pubdates[jid] = journal_pubdates(fetch, jid, years)
                    except Exception as e:   # noqa: BLE001 - report & go on
                        errors.append(f"journal {jid} pubdates: {e}")

    dump_json(coverage, coverage_path)
    if fetch_pubdates:
        dump_json(pubdates, pubdates_path)
    return {"lookups": lookups, "errors": errors}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("catalog_dir",
                    help="directory of annual Springer catalog CSVs "
                         "(2015.csv, 2016.csv, ...)")
    ap.add_argument("cache_dir", help="directory holding the JSON caches")
    ap.add_argument("--years", nargs="+", required=True)
    ap.add_argument("--max-lookups", type=int, default=None)
    ap.add_argument("--pubdates", action="store_true",
                    help="also refresh the per-journal DOI->year cache")
    args = ap.parse_args()
    result = refresh(args.catalog_dir, args.cache_dir, args.years,
                     max_lookups=args.max_lookups,
                     fetch_pubdates=args.pubdates)
    print(json.dumps(result))
    return 1 if result["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
