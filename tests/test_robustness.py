"""Adversarial/pathological inputs through the pure extraction core —
the inputs a 100 TB web-scale corpus WILL contain."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from biosd_feature_annotator_spark.operators.extract import extract_from_text
from biosd_feature_annotator_spark.sources.lexicon import load_lexicon

LEX = load_lexicon(os.path.join(os.path.dirname(__file__), "golden", "lexicon.json"))


def test_very_long_text():
    text = ("filler words without digits " * 2000) + "homo sapiens aged 40 years"
    ms = extract_from_text(text, LEX)
    kinds = sorted(m["kind"] for m in ms)
    assert kinds == ["number", "term"]
    assert ms[0]["unit"] == "year" or ms[1]["unit"] == "year"


def test_unicode_and_controls():
    cases = [
        "温度 36.5 .. 37.5 observed ✓",
        "naïve café résumé 42",
        "tab\tseparated\t7 kg",
        "null\x00byte 5",
        "emoji 🧬 Homo sapiens 🧬 detected",
        "rtl ‮تجربة‬ 12",
    ]
    for text in cases:
        ms = extract_from_text(text, LEX)  # must not raise
        assert isinstance(ms, list)
    # the emoji case still links the organism
    ms = extract_from_text(cases[4], LEX)
    assert any(m["kind"] == "term" for m in ms)


def test_surface_casing_and_whitespace_variants():
    for text in ["HOMO   SAPIENS", "hOmO sApIeNs", "Homo\tsapiens", "homo  sapiens end"]:
        ms = [m for m in extract_from_text(text, LEX) if m["kind"] == "term"]
        assert len(ms) == 1 and ms[0]["match_norm"] in ("homo sapiens",), text


def test_number_bombs():
    # huge exponents / many digits must not crash or hang; overflowing
    # literals are skipped (not representable values)
    for text in ["value 9e308 big", "tiny 1e-320 x", "long 123456789012345678901234567890 n"]:
        ms = extract_from_text(text, LEX)
        assert all(m["obj"] is not None for m in ms if m["kind"] != "term")
    assert extract_from_text("overflow 9e999 here", LEX) == []


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_never_crashes_on_arbitrary_text(s):
    ms = extract_from_text(s, LEX)
    # structural invariants hold for every mention on any input
    for m in ms:
        assert m["kind"] in ("term", "number", "range", "date")
        if m["kind"] == "range":
            assert m["lo"] <= m["hi"]
        if m["kind"] != "term":
            assert m["obj"].split(":", 1)[0] in ("num", "range", "date")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789.-eE+ ", max_size=60))
def test_numeric_soup_deterministic(s):
    assert extract_from_text(s, LEX) == extract_from_text(s, LEX)
