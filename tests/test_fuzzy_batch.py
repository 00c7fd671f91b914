"""Batch fuzzy kernels must be bit-identical to the scalar kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mass_georeferencing_spark.functions import fuzzy, fuzzy_batch

WORDS = st.text(alphabet="abcdefg ", max_size=30)


def _check_all(a_list, b_list):
    br = fuzzy_batch.batch_ratio(a_list, b_list)
    bp = fuzzy_batch.batch_partial_ratio(a_list, b_list)
    bt = fuzzy_batch.batch_token_set_ratio(a_list, b_list)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        assert br[i] == fuzzy.ratio(a, b), ("ratio", a, b, br[i])
        assert bp[i] == fuzzy.partial_ratio(a, b), ("partial", a, b, bp[i])
        assert bt[i] == fuzzy.token_set_ratio(a, b), ("token_set", a, b, bt[i])


def test_known_cases():
    a = ["", "", "abc", "spark table", "new york", "sao paulo brazil", "a" * 80]
    b = ["", "x", "abc", "spark table scan", "york new", "paulo", "a" * 100 + "b"]
    _check_all(a, b)


@given(st.lists(st.tuples(WORDS, WORDS), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_property_equivalence(pairs):
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    _check_all(a_list, b_list)


@given(st.tuples(st.text(max_size=70), st.text(max_size=70)))
@settings(max_examples=100, deadline=None)
def test_unicode_and_long_fallback(pair):
    a, b = pair
    _check_all([a], [b])


@given(st.lists(st.tuples(WORDS, WORDS, WORDS), min_size=1, max_size=25))
@settings(max_examples=150, deadline=None)
def test_score_pair_prune_sound(triples):
    # the prune short-circuit may alter scores only for pairs that the
    # downstream threshold filter drops either way
    from mass_georeferencing_spark.operators.fuzzy_join import (
        FUZZY_SUM_THRESHOLD,
        score_pair,
    )

    for qf, qn, nm in triples:
        exact = score_pair(qf, qn, nm, threshold=None)
        pruned = score_pair(qf, qn, nm, threshold=FUZZY_SUM_THRESHOLD)
        keep_exact = sum(exact) > FUZZY_SUM_THRESHOLD
        keep_pruned = sum(pruned) > FUZZY_SUM_THRESHOLD
        assert keep_exact == keep_pruned, (qf, qn, nm, exact, pruned)
        if keep_exact:
            assert exact == pruned


def test_score_batch_threshold_prune_sound():
    # batch prune: identical keep-set and identical scores for kept pairs
    import pandas as pd

    from mass_georeferencing_spark.operators.fuzzy_join import (
        FUZZY_SUM_THRESHOLD,
        _score_batch,
    )

    qf = pd.Series(["rio grande", "lake tahoe", "zzz qqq", "black river", "x"])
    qn = pd.Series(["rio grande", "lake tahoe", "zzz qqq", "black river", "x"])
    nm = pd.Series(["rio grande", "tahoe city", "unrelated words", "black riv", "y"])
    exact = _score_batch(qf, qn, nm, None)
    pruned = _score_batch(qf, qn, nm, FUZZY_SUM_THRESHOLD)
    for i in range(len(qf)):
        keep_e = exact.score1[i] + exact.score2[i] > FUZZY_SUM_THRESHOLD
        keep_p = pruned.score1[i] + pruned.score2[i] > FUZZY_SUM_THRESHOLD
        assert keep_e == keep_p, i
        if keep_e:
            assert exact.score1[i] == pruned.score1[i]
            assert exact.score2[i] == pruned.score2[i]
