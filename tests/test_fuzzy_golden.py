"""Pin the fast fuzzy kernels against the committed golden table and the
independent naive-DP reference (tests/fuzzy_reference.py).

Two independent from-scratch transcriptions of rapidfuzz's published
algorithms must agree exactly (float roundoff only): the engine's bit-parallel
kernels and the naive reference that generated the golden. The golden also
embeds rapidfuzz's public documentation examples with their published outputs,
hand-asserted below — the closest available pin to the real library, which is
not installable in this sandbox (see fuzzy_reference.py docstring).
"""

import csv
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzzy_reference import partial_ratio_ref, ratio_ref, token_set_ratio_ref
from mass_georeferencing_spark.functions import fuzzy, fuzzy_batch

GOLDEN = Path(__file__).parent / "golden" / "fuzzy_golden.csv"
TOL = 1e-9  # float-roundoff only: the two implementations use algebraically
# identical but differently-ordered float expressions


def _load():
    with GOLDEN.open(newline="", encoding="utf-8") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) >= 4500
    return rows


def test_scalar_kernels_match_golden():
    for r in _load():
        a, b = r["a"], r["b"]
        assert fuzzy.ratio(a, b) == pytest.approx(float(r["ratio"]), abs=TOL), (a, b)
        assert fuzzy.partial_ratio(a, b) == pytest.approx(
            float(r["partial_ratio"]), abs=TOL
        ), (a, b)
        assert fuzzy.token_set_ratio(a, b) == pytest.approx(
            float(r["token_set_ratio"]), abs=TOL
        ), (a, b)


def test_batch_kernels_match_golden():
    rows = _load()
    a = [r["a"] for r in rows]
    b = [r["b"] for r in rows]
    br = fuzzy_batch.batch_ratio(a, b)
    bp = fuzzy_batch.batch_partial_ratio(a, b)
    bt = fuzzy_batch.batch_token_set_ratio(a, b)
    for i, r in enumerate(rows):
        assert br[i] == pytest.approx(float(r["ratio"]), abs=TOL), (r["a"], r["b"])
        assert bp[i] == pytest.approx(float(r["partial_ratio"]), abs=TOL), (
            r["a"],
            r["b"],
        )
        assert bt[i] == pytest.approx(float(r["token_set_ratio"]), abs=TOL), (
            r["a"],
            r["b"],
        )


def test_golden_regenerates_from_reference():
    # the committed CSV IS the reference implementation's output (spot-check
    # every 10th row keeps this fast while covering all shape families)
    for r in _load()[::10]:
        a, b = r["a"], r["b"]
        assert repr(ratio_ref(a, b)) == r["ratio"]
        assert repr(partial_ratio_ref(a, b)) == r["partial_ratio"]
        assert repr(token_set_ratio_ref(a, b)) == r["token_set_ratio"]


def test_published_rapidfuzz_doc_values():
    # outputs published in rapidfuzz/fuzzywuzzy docs for these exact inputs
    assert fuzzy.ratio("this is a test", "this is a test!") == pytest.approx(
        96.55172413793103, abs=TOL
    )
    assert fuzzy.partial_ratio("this is a test", "this is a test!") == 100.0
    assert (
        fuzzy.token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0
    )
    # ADVICE.md boundary-alignment case: rapidfuzz clips the window at the
    # haystack end — ratio('bcx', 'bc') = 80, not the full-window 66.7
    assert fuzzy.partial_ratio("bcx", "abc") == pytest.approx(80.0, abs=TOL)
    assert fuzzy.partial_ratio("abc", "bcx") == pytest.approx(80.0, abs=TOL)


@settings(max_examples=400, deadline=None)
@given(
    st.text(alphabet="abcx z", max_size=20),
    st.text(alphabet="abcx z", max_size=20),
)
def test_partial_ratio_matches_reference(a, b):
    assert fuzzy.partial_ratio(a, b) == pytest.approx(
        partial_ratio_ref(a, b), abs=TOL
    )


@settings(max_examples=400, deadline=None)
@given(
    st.text(alphabet="abcx z", max_size=24),
    st.text(alphabet="abcx z", max_size=24),
)
def test_token_set_matches_length_formula(a, b):
    # the literal reconstructed-string implementation equals rapidfuzz's
    # length-formula shortcut (common-prefix lemma)
    assert fuzzy.token_set_ratio(a, b) == pytest.approx(
        token_set_ratio_ref(a, b), abs=TOL
    )
