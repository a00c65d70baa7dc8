"""CCNet-style per-language quality bucketing (operators/ccnet.py)."""

import pytest

from openapc_olap_spark.operators import ccnet

# lang en: scores 1..9 -> R-7 terciles at 3.667 / 6.333
#   head {7,8,9}, middle {4,5,6}, tail {1,2,3}
# lang de: scores 10,20 -> cuts 13.333 / 16.667 -> head {20}, tail {10}
ROWS = ([(i, "en", float(i)) for i in range(1, 10)]
        + [(101, "de", 10.0), (102, "de", 20.0)]
        + [(201, "fr", None)])


def _r7(vals, q):
    vals = sorted(vals)
    h = (len(vals) - 1) * q
    lo = int(h)
    return vals[lo] + (h - lo) * (vals[min(lo + 1, len(vals) - 1)] - vals[lo])


@pytest.fixture(scope="module")
def scored_df(spark):
    return spark.createDataFrame(ROWS, "doc_id: long, lang: string, "
                                       "score: double")


def test_cuts_match_r7(spark, scored_df):
    cuts = {r["lang"]: (r["cut_lo"], r["cut_hi"])
            for r in ccnet.group_score_cuts(scored_df).collect()}
    en = [float(i) for i in range(1, 10)]
    assert cuts["en"][0] == pytest.approx(_r7(en, 1 / 3))
    assert cuts["en"][1] == pytest.approx(_r7(en, 2 / 3))
    assert cuts["de"] == (pytest.approx(_r7([10, 20], 1 / 3)),
                          pytest.approx(_r7([10, 20], 2 / 3)))
    assert "fr" not in cuts                     # all-NULL group drops


def test_bucket_assignment(spark, scored_df):
    got = {r["doc_id"]: r["bucket"]
           for r in ccnet.perplexity_buckets(scored_df).collect()}
    for i in (1, 2, 3):
        assert got[i] == "tail"
    for i in (4, 5, 6):
        assert got[i] == "middle"
    for i in (7, 8, 9):
        assert got[i] == "head"
    assert got[101] == "tail" and got[102] == "head"
    assert got[201] is None                     # NULL score -> NULL bucket


def test_boundary_tie_goes_up(spark):
    # 4 values: terciles at 2.0 / 3.0 exactly; score==cut -> upper bucket
    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in (1, 2, 3, 4)],
        "doc_id: long, lang: string, score: double")
    got = {r["doc_id"]: r["bucket"]
           for r in ccnet.perplexity_buckets(df).collect()}
    assert got == {1: "tail", 2: "middle", 3: "head", 4: "head"}


def test_report_counts(spark, scored_df):
    b = ccnet.perplexity_buckets(scored_df)
    rep = {(r["lang"], r["bucket"]): r["n_docs"]
           for r in ccnet.bucket_report(b).collect()}
    assert rep[("en", "head")] == 3
    assert rep[("en", "middle")] == 3
    assert rep[("en", "tail")] == 3
    assert rep[("fr", None)] == 1


def test_cut_validation(spark, scored_df):
    with pytest.raises(ValueError):
        ccnet.group_score_cuts(scored_df, cuts=(0.7, 0.3))
