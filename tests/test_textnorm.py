"""Text-normalization kernel tests (reference parity, SURVEY.md F1-F4, P2)."""

import unicodedata

import pandas as pd
from hypothesis import given
from hypothesis import strategies as st

from mass_georeferencing_spark.functions import textnorm


def ref_fold(s: str) -> str:
    # the reference's exact fold (batch_georeferencing.py:151)
    return unicodedata.normalize("NFD", s).encode("ascii", "ignore").decode("utf-8")


def ref_strip(s: str) -> str:
    # the reference's exact stopword strip (batch_georeferencing.py:149)
    return " ".join(w for w in s.split() if w not in textnorm._STOPWORD_SET)


def test_ascii_fold_matches_reference():
    cases = ["São Paulo", "Müller Straße", "café", "北京 city", "plain", "", "naïve père"]
    out = textnorm.ascii_fold_series(pd.Series(cases))
    assert list(out) == [ref_fold(c) for c in cases]


@given(st.text(max_size=60))
def test_ascii_fold_property(s):
    assert textnorm.ascii_fold_series(pd.Series([s]))[0] == ref_fold(s)


@given(st.text(max_size=60))
def test_fold_idempotent(s):
    once = textnorm.ascii_fold_series(pd.Series([s]))[0]
    twice = textnorm.ascii_fold_series(pd.Series([once]))[0]
    assert once == twice


def test_stopword_strip_matches_reference():
    cases = [
        "the river near the lake",
        "a b c",
        "don't stop me now",
        "Mountain of the Moon",  # 'of'/'the' dropped, capitalized words kept
        "",
        "the the the",
    ]
    out = textnorm.strip_stopwords_series(pd.Series(cases))
    assert list(out) == [ref_strip(c) for c in cases]


@given(st.lists(st.sampled_from(["the", "river", "of", "lake", "don't", "Big"]), max_size=8))
def test_stopword_strip_property(words):
    s = " ".join(words)
    assert textnorm.strip_stopwords_series(pd.Series([s]))[0] == ref_strip(s)


def test_garbage_locality_values():
    assert textnorm.GARBAGE_LOCALITIES == ("none", "unknown", "no locality data")
