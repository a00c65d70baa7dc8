"""Coverage-pipeline semantics (SURVEY.md §2.5 T3-T5, §2.4 E12/E14) against
hand-computed expectations on synthetic caches + TA rows."""

import json

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark.etl import coverage


@pytest.fixture(scope="module")
def caches(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("caches")
    cov = {
        "123": {"title": "Journal X", "years": {
            "2019": {"num_journal_total_articles": 100,
                     "num_journal_oa_articles": 10},
            "2020": {"num_journal_total_articles": 90,
                     "num_journal_oa_articles": 12}}},
        "7": {"title": "Journal Y", "years": {
            "2019": {"num_journal_total_articles": 50,
                     "num_journal_oa_articles": 5}}},
    }
    pub = {"123": {"10.1007/s00123-019-1": "2020"}}   # pubdate overrides period
    jid = {"1234-5678": "99999"}
    (d / "coverage_stats.json").write_text(json.dumps(cov))
    (d / "article_pubdates.json").write_text(json.dumps(pub))
    (d / "journal_ids.json").write_text(json.dumps(jid))
    return {
        "coverage": coverage.load_coverage_stats(
            spark, str(d / "coverage_stats.json")),
        "pubdates": coverage.load_article_pubdates(
            spark, str(d / "article_pubdates.json")),
        "journal_ids": coverage.load_journal_ids(
            spark, str(d / "journal_ids.json")),
    }


@pytest.fixture(scope="module")
def ta(spark):
    rows = [
        # regular prefix, pubdate cache moves it 2019 -> 2020 (T4)
        ("Springer Nature", "10.1007/s00123-019-1", "1111-1111", "2019"),
        # regular prefix, no cached pubdate -> stays in period year
        ("Springer Nature", "10.1007/s00123-019-2", "1111-1111", "2019"),
        # leading-zero strip: 00007 -> 7
        ("Springer Nature", "10.1007/s00007-019-9", "2222-2222", "2019"),
        # irregular prefix -> fixed id 11582 (journal not in coverage cache)
        ("Springer Nature", "10.1631/abc", "3333-3333", "2019"),
        # cache-only family resolved via ISSN map
        ("Springer Nature", "10.1140/epja/x", "1234-5678", "2019"),
        # non-Springer publisher filtered out (E12)
        ("Elsevier BV", "10.1016/j.x", "4444-4444", "2019"),
    ]
    return spark.createDataFrame(rows, ["publisher", "doi", "issn", "period"])


def test_journal_id_extraction(spark, caches, ta):
    got = {r["doi"]: r["journal_id"]
           for r in coverage.with_journal_id(ta, caches["journal_ids"]).collect()}
    assert got["10.1007/s00123-019-1"] == "123"
    assert got["10.1007/s00007-019-9"] == "7"
    assert got["10.1631/abc"] == "11582"
    assert got["10.1140/epja/x"] == "99999"     # via ISSN cache


def test_unresolved_detector(spark, caches, ta):
    without_cache = coverage.with_journal_id(ta)  # no ISSN map
    bad = coverage.unresolved_journal_ids(
        without_cache.filter(F.col("publisher") == "Springer Nature"))
    assert [r["doi"] for r in bad.collect()] == ["10.1140/epja/x"]


def test_coverage_cube(spark, caches, ta):
    cube = coverage.springer_compact_coverage_cube(
        ta, caches["coverage"], caches["pubdates"], caches["journal_ids"])
    rows = {(r["journal_full_title"], r["period"]): r for r in cube.collect()}
    # grain = coverage cache journal-years, 3 rows (irregular journal absent)
    assert len(rows) == 3
    # doi-1 moved to 2020 by the pubdate cache; doi-2 stays 2019
    assert rows[("Journal X", "2020")]["num_springer_compact_articles"] == 1.0
    assert rows[("Journal X", "2019")]["num_springer_compact_articles"] == 1.0
    assert rows[("Journal Y", "2019")]["num_springer_compact_articles"] == 1.0
    # zero-fill + constants + measure passthrough (T5)
    r = rows[("Journal X", "2019")]
    assert r["publisher"] == "Springer Nature" and r["is_hybrid"] == "TRUE"
    assert r["num_journal_total_articles"] == 100.0
    assert r["num_journal_oa_articles"] == 10.0


def test_pubdates_map_and_hybrid_filter(spark):
    csv = spark.createDataFrame(
        [("10.1/a", "2019"), ("10.1/a", "2020"), ("10.1/b", "2018")],
        ["Item DOI", "Publication Year"])
    got = {r["doi"]: r["cached_pub_year"]
           for r in coverage.build_pubdates_map(csv).collect()}
    assert got == {"10.1/a": "2020", "10.1/b": "2018"}   # last wins

    cat = spark.createDataFrame(
        [("J1", "Hybrid (Open Choice)"), ("J2", "Full Open Access")],
        ["Title", "Open Access Option"])
    assert [r["Title"] for r in coverage.hybrid_journals(cat).collect()] == ["J1"]


def test_upsert_last_wins(spark):
    """T15 incremental refresh: per-key last-wins on the explicit seq;
    seq ties resolve deterministically via the payload struct order."""
    existing = spark.createDataFrame(
        [("a", 1, "2015"), ("b", 2, "2016")], ["doi", "seq", "year"])
    updates = spark.createDataFrame(
        [("a", 5, "2019"),               # newer seq wins
         ("b", 1, "1999"),               # older seq loses
         ("c", 3, "2020"),               # new key inserted
         ("c", 3, "2021")],              # seq tie -> larger payload wins
        ["doi", "seq", "year"])
    got = {r["doi"]: (r["seq"], r["year"])
           for r in coverage.upsert_last_wins(
               existing, updates, ["doi"], "seq").collect()}
    assert got == {"a": (5, "2019"), "b": (2, "2016"), "c": (3, "2021")}
