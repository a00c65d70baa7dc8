"""ETL golden tests on the synthetic OpenAPC corpus (SURVEY.md §5 strategy:
derived-cube row counts + spot rows — halving E8, melt/explode E16/E17,
prunes T7/T8, fail-fast E2)."""

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark.etl.openapc import (
    InputPaths, OpenAPCPipeline, UnknownInstitutionError,
)


@pytest.fixture(scope="module")
def pipeline(spark, openapc_fixture_dir):
    return OpenAPCPipeline(spark, InputPaths.under(openapc_fixture_dir))


def rows_of(df):
    return [r.asDict() for r in df.collect()]


def test_openapc_cube(pipeline):
    out = rows_of(pipeline.openapc_cube())
    assert len(out) == 8
    by_doi = {r["doi"]: r for r in out}
    # enrichment (E2) + ror strip (E3)
    assert by_doi["10.1002/apc1"]["country"] == "DEU"
    assert by_doi["10.1002/apc1"]["institution_ror"] == "01alpha99"
    assert by_doi["10.1002/apc5"]["country"] == "GBR"
    # non-ror-prefixed id -> NA (E3)
    assert by_doi["10.1002/apc5"]["institution_ror"] == "NA"
    # colon scrub (E4)
    assert by_doi["NA"]["journal_full_title"] == "Journal F Subtitle More"
    # euro is a float now
    assert by_doi["10.1002/apc2"]["euro"] == 1200.0


def test_unknown_institution_aborts(spark, openapc_fixture_dir, tmp_path):
    import csv
    import shutil
    bad_dir = tmp_path / "bad"
    shutil.copytree(openapc_fixture_dir, bad_dir)
    with open(bad_dir / "apc_de.csv", "a", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Unknown U", "2021", "100.00", "10.1/x", "FALSE", "P",
                    "J", "NA", "NA", "NA", "NA", "NA", "NA", "NA", "NA",
                    "NA", "NA", "NA"])
    p = OpenAPCPipeline(spark, InputPaths.under(str(bad_dir)))
    with pytest.raises(UnknownInstitutionError, match="Unknown U"):
        p.openapc_cube().collect()
        p.check_validations()


def test_unknown_institution_aborts_write(spark, openapc_fixture_dir, tmp_path):
    """Reference abort parity through the build path (assets_generator.py
    :487-492): write() raises after materializing, via observed metrics."""
    import csv
    import shutil
    bad_dir = tmp_path / "bad"
    shutil.copytree(openapc_fixture_dir, bad_dir)
    with open(bad_dir / "apc_de.csv", "a", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Unknown U", "2021", "100.00", "10.1/x", "FALSE", "P",
                    "J", "NA", "NA", "NA", "NA", "NA", "NA", "NA", "NA",
                    "NA", "NA", "NA"])
    p = OpenAPCPipeline(spark, InputPaths.under(str(bad_dir)))
    with pytest.raises(UnknownInstitutionError, match="Unknown U"):
        p.write(str(tmp_path / "out"))


def test_generate_yamls_field_equivalent(pipeline, tmp_path):
    """generate_yamls (reference assets_generator.py:738-789): one parseable
    YAML per institution; header from the institutions dim, hierarchies in
    manifest priority order, per-type spec field-equivalent to the
    reference templates."""
    import yaml as pyyaml

    from openapc_olap_spark.etl.yamls import generate_yamls
    out = tmp_path / "yamls"
    written = generate_yamls(pipeline.institutional_manifest(),
                             pipeline.institutions, str(out))
    assert written, "no yaml files written"
    docs = {p: pyyaml.safe_load(open(p)) for p in written}
    for path, doc in docs.items():
        assert doc["source"] == "Open APC"
        assert doc["dataset"] == doc["slug"]
        assert doc["default"] in doc["hierarchies"]
        # priority 0 cube type is the default hierarchy
        first_type = doc["default"]
        h = doc["hierarchies"][first_type]
        assert h["cube"]
        assert {"name", "primary_aggregate", "filters", "table_items",
                "drilldowns"} <= set(h)
        # every hierarchy's percentage row relates to its primary aggregate
        for htype, hier in doc["hierarchies"].items():
            pct = [t for t in hier["table_items"]
                   if t["type"] == "total_percentage"]
            assert len(pct) == 1
            assert pct[0]["relates_to"] == hier["primary_aggregate"]
    # template parity spot-checks (YAML_STATIC_PART_APC / _TA)
    any_doc = next(iter(docs.values()))
    apc = any_doc["hierarchies"]["apc"]
    assert apc["primary_aggregate"] == "apc_amount_sum"
    assert apc["drilldowns"] == ["publisher", "journal_full_title", "doi"]
    assert {f["field"] for f in apc["filters"]} == {"period", "is_hybrid"}


def test_build_is_action_free(spark, openapc_fixture_dir, monkeypatch):
    """Plan construction must trigger NO Spark jobs — validation rides the
    write action via df.observe, not eager collects (100 TB: the old probe
    cost 3+ full corpus passes before the first write)."""
    from pyspark.sql import DataFrame as SparkDF

    def boom(self, *a, **k):
        raise AssertionError("driver-side action during plan construction")

    for action in ("collect", "count", "take", "first", "head", "toPandas"):
        monkeypatch.setattr(SparkDF, action, boom)
    p = OpenAPCPipeline(spark, InputPaths.under(openapc_fixture_dir))
    p.build_all()
    p.institutional_manifest()


def test_combined_cube(pipeline):
    out = rows_of(pipeline.combined_cube())
    # 8 apc rows + 2 TA rows with euro != NA
    assert len(out) == 10
    ta_rows = [r for r in out if r["doi"] in ("10.1002/ta1", "10.1016/ta3")]
    assert len(ta_rows) == 2
    # TA rows never carry institution_ror (reference missing-key -> NULL)
    assert all(r["institution_ror"] is None for r in ta_rows)
    assert {r["euro"] for r in ta_rows} == {1111.11, 750.0}


def test_ta_cube_schema(pipeline):
    df = pipeline.ta_cube()
    assert "euro" not in df.columns
    assert "agreement" in df.columns
    assert df.count() == 4


def test_deal_cube(pipeline):
    out = rows_of(pipeline.deal_cube())
    # wiley opt-out 2 + springer opt-out 1 + TA wiley 1 + TA springer 2 + apc
    # wiley 1 (apc1) + apc springer 1 (s00001) = 8
    assert len(out) == 8
    by_doi = {}
    for r in out:
        by_doi.setdefault(r["doi"], []).append(r)
    # E8 halving on 2019 Wiley opt-out: 1000.01/2 = 500.005 -> bankers 500.0
    assert by_doi["10.1002/oo1"][0]["euro"] == 500.0
    # E8 halving on 2019 TA DEAL Wiley row: 1111.11/2 = 555.555 -> 555.56
    assert by_doi["10.1002/ta1"][0]["euro"] == 555.56
    # imprint normalization (E7)
    assert by_doi["10.1002/oo1"][0]["publisher"] == "Wiley-Blackwell"
    assert by_doi["10.1007/s00001-021-1"][0]["publisher"] == "Springer Nature"
    # opt_out flags (E6/E10)
    assert by_doi["10.1002/oo1"][0]["opt_out"] == "TRUE"
    assert by_doi["10.1002/ta1"][0]["opt_out"] == "FALSE"
    # non-2019 opt-out not halved
    assert by_doi["10.1002/oo2"][0]["euro"] == 1300.0
    # APC-eligibility respected: 2019 Wiley row and hybrid row absent
    assert "10.1002/apc2" not in by_doi
    assert "10.1007/s00002-021-2" not in by_doi


def test_openapc_ac_cube(pipeline):
    out = rows_of(pipeline.openapc_ac_cube())
    # 8 apc rows + 2 cost rows (apc7) + 1 cost row (apc1); unmatched doi joins nothing
    assert len(out) == 11
    apc7 = [r for r in out if r["doi"] == "10.1002/apc7"]
    assert {(r["cost_type"], r["euro"]) for r in apc7} == {
        ("apc", 2000.0), ("colorpage", 150.0), ("pagecharge", 75.5)}
    assert {r["cost_category"] for r in apc7} == {"APC", "Additional Cost"}
    # publication_key: doi when present, url-sans-scheme otherwise (E5)
    na_doi = [r for r in out if r["doi"] == "NA"]
    assert na_doi[0]["publication_key"] == "example.org/paper6"
    # non-numeric cells dropped in melt (E16)
    apc1 = [r for r in out if r["doi"] == "10.1002/apc1"]
    assert {(r["cost_type"], r["euro"]) for r in apc1} == {
        ("apc", 1500.0), ("submissionfee", 20.0)}


def test_doi_lookup_cube(pipeline):
    out = rows_of(pipeline.doi_lookup_cube())
    # apc: 7 non-NA dois; bpc: 1; ta: 4 -> 12
    assert len(out) == 12
    r = next(x for x in out if x["doi"] == "10.1002/apc1")
    assert r["url"] == ("https://olap.openapc.net/cube/openapc/facts"
                        "?cut=doi:10.1002/apc1")
    assert r["institution_full_name"] == "Technical University Alpha"
    assert isinstance(r["euro"], str)  # euro is a STRING in doi_lookup
    bpc = next(x for x in out if x["doi"] == "10.5555/bpc1")
    assert "/cube/bpc/facts" in bpc["url"]


def test_institutional_manifest(pipeline):
    out = rows_of(pipeline.institutional_manifest())
    pairs = {(r["institution"], r["cube_type"]) for r in out}
    # Inst Delta has cubes_name NA -> no institutional cubes at all
    assert not any(i == "Inst Delta" for i, _ in pairs)
    # T7: apc_ac only for TU Alpha (only institution with non-apc cost rows)
    assert ("TU Alpha", "apc_ac") in pairs
    assert not any(t == "apc_ac" and i != "TU Alpha" for i, t in pairs)
    # T8: deal pruned to participants (TU Alpha, Uni Beta)
    deal_insts = {i for i, t in pairs if t == "deal"}
    assert deal_insts == {"TU Alpha", "Uni Beta"}
    # cube naming: apc cube has bare slug, others get suffix
    names = {(r["institution"], r["cube_type"]): r["cube_name"] for r in out}
    assert names[("TU Alpha", "apc")] == "tualpha"
    assert names[("TU Alpha", "apc_ac")] == "tualpha_apc_ac"
    # T9: priorities are a contiguous 0..n-1 rank in fixed type order
    tu = sorted((r["priority"], r["cube_type"]) for r in out
                if r["institution"] == "TU Alpha")
    assert tu == [(0, "apc"), (1, "apc_ac"), (2, "bpc"), (3, "ta"),
                  (4, "deal")]


def test_write_partitioned(pipeline, tmp_path):
    out = str(tmp_path / "cubes")
    pipeline.write(out)
    import os
    assert os.path.isdir(os.path.join(out, "openapc"))
    # partitioned by institution -> directory per institution value
    parts = [p for p in os.listdir(os.path.join(out, "openapc"))
             if p.startswith("institution=")]
    assert len(parts) == 5
    df = pipeline.spark.read.parquet(os.path.join(out, "openapc"))
    assert df.count() == 8


def test_t10_institutions_by_cube_type(pipeline):
    out = {r["cube_type"]: r["institutions"]
           for r in pipeline.institutions_by_cube_type().collect()}
    assert out["apc_ac"] == ["TU Alpha"]
    assert out["bpc"] == ["College Gamma", "TU Alpha"]
    assert out["ta"] == ["College Gamma", "TU Alpha", "Uni Beta"]
    assert out["deal"] == ["TU Alpha", "Uni Beta"]


def test_t11_additional_cost_institutions(pipeline):
    got = [r["institution"]
           for r in pipeline.additional_cost_institutions().collect()]
    assert got == ["TU Alpha"]


def test_write_clusters_institution_period(pipeline, tmp_path):
    """SCALING.md write-locality promise, asserted on actual parquet
    footers: partitioned cubes are written sortWithinPartitions
    (institution, period), so inside every physical file the period column
    is non-decreasing and consecutive row-group min/max stats are ordered —
    period cuts then skip row groups. Institution leads the sort so the
    dynamic-partition writer does not inject its own (unstable) sort."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted_out")
    pipeline.write(out)
    checked = 0
    for path in glob.glob(f"{out}/*/institution=*/*.parquet"):
        pf = pq.ParquetFile(path)
        names = pf.schema_arrow.names
        if "period" not in names:
            continue
        md = pf.metadata
        col = names.index("period")
        prev_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            assert st is not None and st.has_min_max, path
            if prev_max is not None:
                assert st.min >= prev_max, path   # ordered row groups
            prev_max = st.max
        vals = pf.read(columns=["period"]).column("period").to_pylist()
        assert vals == sorted(vals), path         # clustered inside file
        checked += 1
    assert checked > 0
