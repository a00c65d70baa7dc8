import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openapc_olap_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Synthetic OpenAPC raw-CSV corpus (FIXTURES.md section A)
# ---------------------------------------------------------------------------

INSTITUTIONS = [
    # institution, full_name, cubes_name, ror_id, continent, country, state
    ["TU Alpha", "Technical University Alpha", "tualpha",
     "https://ror.org/01alpha99", "Europe", "DEU", "BY"],
    ["Uni Beta", "University Beta", "unibeta",
     "https://ror.org/02beta88", "Europe", "DEU", "BW"],
    ["College Gamma", "College Gamma London", "gamma",
     "no-ror", "Europe", "GBR", "NA"],
    ["Inst Delta", "Institute Delta", "NA",
     "https://ror.org/04delta4", "Europe", "DEU", "HE"],
    ["Uni Epsilon", "University Epsilon", "epsilon",
     "https://ror.org/05eps55", "North America", "USA", "NA"],
]

APC_HEADER = ["institution", "period", "euro", "doi", "is_hybrid", "publisher",
              "journal_full_title", "issn", "issn_print", "issn_electronic",
              "issn_l", "license_ref", "indexed_in_crossref", "pmid", "pmcid",
              "ut", "url", "doaj"]

APC_ROWS = [
    # eligible DEAL Wiley (imprint, DEU, not hybrid, 2021 > 2019)
    ["TU Alpha", "2021", "1500.00", "10.1002/apc1", "FALSE", "EMBO",
     "Journal A: Applied", "1111-1111", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "https://example.org/a1", "TRUE"],
    # NOT eligible (period 2019 not > 2019)
    ["TU Alpha", "2019", "1200.00", "10.1002/apc2", "FALSE", "Wiley-Blackwell",
     "Journal B", "1111-2222", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "NA", "TRUE"],
    # eligible DEAL Springer (2021 > 2020)
    ["Uni Beta", "2021", "2100.50", "10.1007/s00001-021-1", "FALSE",
     "Zhejiang University Press", "Journal C", "2222-1111", "NA", "NA", "NA",
     "CC BY", "TRUE", "NA", "NA", "NA", "NA", "TRUE"],
    # NOT eligible (hybrid)
    ["Uni Beta", "2021", "1800.00", "10.1007/s00002-021-2", "TRUE",
     "Springer Nature", "Journal D", "2222-3333", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "NA", "FALSE"],
    # NOT eligible (GBR)
    ["College Gamma", "2021", "999.99", "10.1002/apc5", "FALSE",
     "Wiley-Blackwell", "Journal E", "3333-1111", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "NA", "TRUE"],
    # doi NA, url present -> publication_key from url; title has colon
    ["Inst Delta", "2020", "850.25", "NA", "FALSE", "Other Press",
     "Journal F: Subtitle: More", "4444-1111", "NA", "NA", "NA", "CC BY-ND",
     "FALSE", "NA", "NA", "NA", "https://example.org/paper6", "FALSE"],
    # has additional costs (doi in ac file)
    ["TU Alpha", "2022", "2000.00", "10.1002/apc7", "FALSE", "Other Press",
     "Journal G", "5555-1111", "NA", "NA", "NA", "CC BY", "TRUE", "NA", "NA",
     "NA", "NA", "TRUE"],
    ["Uni Epsilon", "2022", "3000.00", "10.1002/apc8", "TRUE", "Elsevier BV",
     "Journal H", "6666-1111", "NA", "NA", "NA", "CC BY", "TRUE", "NA", "NA",
     "NA", "NA", "FALSE"],
]

BPC_HEADER = ["institution", "period", "euro", "doi", "backlist_oa",
              "publisher", "book_title", "isbn", "isbn_print",
              "isbn_electronic", "license_ref", "indexed_in_crossref", "doab"]

BPC_ROWS = [
    ["TU Alpha", "2021", "4000.00", "10.5555/bpc1", "FALSE", "Book House",
     "Book One: A Story", "978-1", "NA", "NA", "CC BY", "TRUE", "TRUE"],
    ["College Gamma", "2020", "3500.50", "NA", "TRUE", "Book House",
     "Book Two", "978-2", "NA", "NA", "CC BY", "FALSE", "FALSE"],
]

TA_HEADER = APC_HEADER + ["agreement"]

TA_ROWS = [
    # DEAL Wiley Germany w/ euro + 2019 -> halving in deal copy
    ["TU Alpha", "2019", "1111.11", "10.1002/ta1", "TRUE", "EMBO",
     "Journal TA-1: Colon", "1111-1111", "NA", "NA", "NA", "CC BY", "TRUE",
     "NA", "NA", "NA", "NA", "TRUE", "DEAL Wiley Germany"],
    # DEAL Springer Nature Germany, euro NA -> no combined row
    ["Uni Beta", "2021", "NA", "10.1007/s00003-021-3", "TRUE",
     "Springer Nature", "Journal TA-2", "2222-1111", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "NA", "TRUE",
     "DEAL Springer Nature Germany"],
    # non-DEAL agreement with cost -> combined only
    ["College Gamma", "2020", "750.00", "10.1016/ta3", "FALSE", "Elsevier BV",
     "Journal TA-3", "3333-1111", "NA", "NA", "NA", "CC BY", "TRUE", "NA",
     "NA", "NA", "NA", "FALSE", "Jisc Elsevier UK"],
    # Springer Nature TA row (coverage pipeline input)
    ["Uni Beta", "2020", "NA", "10.1007/s00004-020-4", "TRUE",
     "Springer Nature", "Journal TA-4", "2222-4444", "NA", "NA", "NA", "CC BY",
     "TRUE", "NA", "NA", "NA", "NA", "TRUE",
     "DEAL Springer Nature Germany"],
]

OPTOUT_HEADER = APC_HEADER  # same shape, no agreement column

WILEY_OPTOUT_ROWS = [
    # period 2019 -> euro halved 1000.01/2 = 500.005 -> bankers 500.0
    ["TU Alpha", "2019", "1000.01", "10.1002/oo1", "TRUE", "EMBO",
     "Journal OO-1", "1111-1111", "NA", "NA", "NA", "CC BY", "TRUE", "NA",
     "NA", "NA", "NA", "TRUE"],
    ["Uni Beta", "2020", "1300.00", "10.1002/oo2", "TRUE", "Wiley-Blackwell",
     "Journal OO-2", "1111-3333", "NA", "NA", "NA", "CC BY", "TRUE", "NA",
     "NA", "NA", "NA", "TRUE"],
]

SPRINGER_OPTOUT_ROWS = [
    ["Uni Beta", "2020", "2400.00", "10.1007/s00005-020-5", "TRUE",
     "Zhejiang University Press", "Journal OO-3", "2222-5555", "NA", "NA",
     "NA", "CC BY", "TRUE", "NA", "NA", "NA", "NA", "TRUE"],
]

AC_HEADER = ["doi", "colorpage", "pagecharge", "submissionfee"]

AC_ROWS = [
    ["10.1002/apc7", "150.00", "75.50", ""],        # 2 numeric cells
    ["10.1002/apc1", "", "not-a-number", "20.00"],  # 1 numeric cell
    ["10.9999/unmatched", "10.00", "", ""],         # doi not in APC file
]


def _write_csv(path, header, rows):
    import csv
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


@pytest.fixture(scope="session")
def openapc_fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("openapc_csvs")
    _write_csv(d / "institutions.csv",
               ["institution", "institution_full_name",
                "institution_cubes_name", "ror_id", "continent", "country",
                "state"], INSTITUTIONS)
    _write_csv(d / "apc_de.csv", APC_HEADER, APC_ROWS)
    _write_csv(d / "bpc.csv", BPC_HEADER, BPC_ROWS)
    _write_csv(d / "transformative_agreements.csv", TA_HEADER, TA_ROWS)
    _write_csv(d / "deal_wiley_germany_opt_out.csv", OPTOUT_HEADER,
               WILEY_OPTOUT_ROWS)
    _write_csv(d / "deal_springer_nature_germany_opt_out.csv", OPTOUT_HEADER,
               SPRINGER_OPTOUT_ROWS)
    _write_csv(d / "apc_de_additional_costs.csv", AC_HEADER, AC_ROWS)
    return str(d)
