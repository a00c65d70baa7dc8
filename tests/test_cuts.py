"""Cut grammar: parsing, compilation, and property-based round-trip
(SURVEY.md §5: parse→print→parse identity, filter-order invariance)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openapc_olap_spark.cuts import (
    CutParseError, PointCut, RangeCut, SetCut, cuts_to_string, parse_cut,
    parse_cuts,
)


def test_point_cut():
    assert parse_cut("period:2020") == PointCut("period", "2020")
    assert parse_cut("!period:2020") == PointCut("period", "2020", invert=True)


def test_range_cut():
    assert parse_cut("period:2014~2016") == RangeCut("period", "2014", "2016")
    assert parse_cut("period:2014~") == RangeCut("period", "2014", None)
    assert parse_cut("period:~2016") == RangeCut("period", None, "2016")


def test_set_cut():
    assert parse_cut("country:DEU;GBR;USA") == SetCut(
        "country", ("DEU", "GBR", "USA"))


def test_multi_cut_anded():
    cuts = parse_cuts("country:GBR|is_hybrid:TRUE")
    assert len(cuts) == 2


def test_errors():
    with pytest.raises(CutParseError):
        parse_cut("nocolon")
    with pytest.raises(CutParseError):
        parse_cut(":value")
    with pytest.raises(CutParseError):
        parse_cut("dim:~")
    with pytest.raises(CutParseError):
        parse_cut("dim:a~b~c")


# values that survive the grammar: no reserved chars (: | ; ~ !), nonempty
_value = st.text(
    alphabet=st.characters(blacklist_characters=":|;~!", min_codepoint=32,
                           max_codepoint=0x2FF),
    min_size=1, max_size=20)
_dim = st.from_regex(r"[a-z_][a-z0-9_]{0,15}", fullmatch=True)


@given(dim=_dim, value=_value, invert=st.booleans())
@settings(max_examples=200)
def test_point_roundtrip(dim, value, invert):
    cut = PointCut(dim, value, invert)
    assert parse_cut(cut.to_string()) == cut


@given(dim=_dim, values=st.lists(_value, min_size=2, max_size=5),
       invert=st.booleans())
@settings(max_examples=200)
def test_set_roundtrip(dim, values, invert):
    cut = SetCut(dim, tuple(values), invert)
    assert parse_cut(cut.to_string()) == cut


@given(dim=_dim, lo=st.none() | _value, hi=st.none() | _value,
       invert=st.booleans())
@settings(max_examples=200)
def test_range_roundtrip(dim, lo, hi, invert):
    if lo is None and hi is None:
        return
    cut = RangeCut(dim, lo, hi, invert)
    assert parse_cut(cut.to_string()) == cut


@given(st.lists(st.tuples(_dim, _value), min_size=1, max_size=4))
@settings(max_examples=100)
def test_cuts_param_roundtrip(pairs):
    param = "|".join(f"{d}:{v}" for d, v in pairs)
    cuts = parse_cuts(param)
    assert cuts_to_string(cuts) == param
