"""Property-based extraction tests (SURVEY.md §5.2(5)): render random
values to text → extract → round-trip equal. Pure-core, no Spark."""

from __future__ import annotations

import os
from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st

from biosd_feature_annotator_spark.operators.extract import extract_from_text, fmt_num
from biosd_feature_annotator_spark.sources.lexicon import load_lexicon

LEX = load_lexicon(os.path.join(os.path.dirname(__file__), "golden", "lexicon.json"))


def only_vals(text):
    return [m for m in extract_from_text(text, LEX) if m["kind"] != "term"]


ints = st.integers(min_value=-10**9, max_value=10**9)
pos_floats = st.floats(
    min_value=0.001, max_value=10**6, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 3))


@settings(max_examples=200, deadline=None)
@given(ints)
def test_int_roundtrip(v):
    ms = only_vals(f"observed value {v} today")
    assert len(ms) == 1 and ms[0]["kind"] == "number"
    assert ms[0]["num"] == float(v)
    assert ms[0]["obj"] == f"num:{fmt_num(float(v))}"


@settings(max_examples=200, deadline=None)
@given(pos_floats)
def test_float_roundtrip(v):
    ms = only_vals(f"measurement {v} recorded")
    assert len(ms) == 1 and ms[0]["kind"] == "number"
    assert ms[0]["num"] == float(str(v))


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**6), st.integers(0, 10**6))
def test_range_roundtrip_and_lo_hi_normalized(a, b):
    ms = only_vals(f"span {a} to {b} here")
    rngs = [m for m in ms if m["kind"] == "range"]
    assert len(rngs) == 1
    assert rngs[0]["lo"] == float(min(a, b)) and rngs[0]["hi"] == float(max(a, b))
    assert not [m for m in ms if m["kind"] == "number"]  # consumed by range


@settings(max_examples=200, deadline=None)
@given(st.dates(min_value=date(1900, 1, 1), max_value=date(2099, 12, 28)))
def test_iso_date_roundtrip(d):
    ms = only_vals(f"collected {d.isoformat()} onwards")
    dates = [m for m in ms if m["kind"] == "date"]
    assert len(dates) == 1
    assert dates[0]["obj"] == f"date:{d.isoformat()}"
    assert not [m for m in ms if m["kind"] in ("number", "range")]  # precedence


@settings(max_examples=100, deadline=None)
@given(st.dates(min_value=date(1900, 1, 1), max_value=date(2099, 12, 28)))
def test_dmy_slash_roundtrip(d):
    ms = only_vals(f"received {d.strftime('%d/%m/%Y')} by post")
    dates = [m for m in ms if m["kind"] == "date"]
    assert len(dates) == 1 and dates[0]["obj"] == f"date:{d.isoformat()}"


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 500), st.sampled_from(["year", "week", "month", "day", "kg", "cm"]))
def test_unit_attachment(v, unit):
    ms = only_vals(f"value {v} {unit} noted")
    assert len(ms) == 1
    assert ms[0]["unit"] == LEX.unit_map[unit]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghij klmnop", max_size=80))
def test_no_numbers_in_letter_text(s):
    assert not [m for m in only_vals(s) if m["kind"] == "number"]
