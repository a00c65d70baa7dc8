"""S3 ingest skeleton: the coverage refresh job drives the full update
logic against canned HTTP fixtures, and the caches it writes round-trip
through the engine-side loaders (reference springer_compact_coverage.py
:77-374 scrape -> assets_generator.py:358-374 consumption)."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

import refresh_coverage as rc  # noqa: E402

RESULT_PAGE = """
<h1 id="number-of-search-results-and-search-terms">
<strong>{count}</strong> Result(s)</h1>
<p class="message">You are now only searching within the Journal</p>
<p class="title">
<a href="/journal/{jid}">{title}</a></p>
"""

CSV_EXPORT = ('"Item Title","Publication Title","Item DOI",'
              '"Publication Year"\n'
              '"A","J","10.1007/s{jid}-a","{year}"\n'
              '"B","J","10.1007/s{jid}-b","{year}"\n')

LANDING_PAGE = '<a href="/journal/13690" title="Archives">Archives</a>'


def canned_fetch(url: str) -> str:
    if url.startswith("https://doi.org/"):
        return LANDING_PAGE
    if "search/csv" in url:
        jid = url.split("facet-journal-id=")[1].split("&")[0]
        year = url.split("facet-start-year=")[1].split("&")[0]
        return CSV_EXPORT.format(jid=jid, year=year)
    jid = url.split("facet-journal-id=")[1].split("&")[0]
    count = "1,234" if "openaccessarticles" not in url else "56"
    return RESULT_PAGE.format(count=count, jid=jid, title=f"Journal {jid}")


@pytest.fixture()
def catalog_dir(tmp_path):
    d = tmp_path / "catalog"
    d.mkdir()
    rows = ('"Title","Open Access Option","product_id"\n'
            '"Journal 10238","Hybrid (Open Choice)","10238"\n'
            '"Journal 99999","Fully Open Access","99999"\n')
    for year in ("2015", "2016"):
        (d / f"{year}.csv").write_text(rows)
    return str(d)


def test_refresh_updates_caches_and_loaders_roundtrip(
        spark, catalog_dir, tmp_path):
    cache_dir = tmp_path / "caches"
    cache_dir.mkdir()
    result = rc.refresh(catalog_dir, str(cache_dir), ["2015", "2016"],
                        fetch=canned_fetch, fetch_pubdates=True)
    assert result["errors"] == []
    assert result["lookups"] == 2          # one hybrid journal x two years

    doc = json.loads((cache_dir / "coverage_stats.json").read_text())
    assert doc["10238"]["title"] == "Journal 10238"
    assert doc["10238"]["years"]["2015"] == {
        "num_journal_total_articles": 1234,
        "num_journal_oa_articles": 56,
    }
    assert "99999" not in doc              # non-hybrid skipped (T14 parity)

    # idempotent: second run does zero lookups (cache-hit path)
    again = rc.refresh(catalog_dir, str(cache_dir), ["2015", "2016"],
                       fetch=canned_fetch)
    assert again["lookups"] == 0

    # the written documents feed the engine loaders unchanged
    from openapc_olap_spark.etl.coverage import (
        load_article_pubdates, load_coverage_stats,
    )
    cov = load_coverage_stats(spark, str(cache_dir / "coverage_stats.json"))
    rows = {(r["journal_id"], r["period"]):
            (r["num_journal_total_articles"], r["num_journal_oa_articles"])
            for r in cov.collect()}
    assert rows[("10238", "2015")] == (1234.0, 56.0)
    pd = load_article_pubdates(
        spark, str(cache_dir / "article_pubdates.json"))
    got = {r["doi"]: r["cached_pub_year"] for r in pd.collect()}
    # later-year export wins on the shared DOI (last-wins parity with T13)
    assert got["10.1007/s10238-a"] == "2016"


def test_retry_on_503_then_success(monkeypatch):
    calls = {"n": 0}

    def flaky_urlopen(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise urllib_error.HTTPError(url, 503, "busy", {}, None)

        class R:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def read(self):
                return b"ok"
        return R()

    import urllib.error as urllib_error
    import urllib.request as urllib_request
    monkeypatch.setattr(urllib_request, "urlopen", flaky_urlopen)
    assert rc.default_fetch("https://link.springer.com/x") == "ok"
    assert calls["n"] == 3


def test_journal_id_from_landing_page():
    assert rc.journal_id_from_landing_page(
        canned_fetch, "10.17269/whatever") == "13690"


def test_missing_catalog_raises(tmp_path):
    with pytest.raises(OSError, match="2019.csv"):
        rc.refresh(str(tmp_path), str(tmp_path), ["2019"],
                   fetch=canned_fetch)
