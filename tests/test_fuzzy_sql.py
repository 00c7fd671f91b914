"""The pure-SQL (recursive-CTE) fuzzy kernels behind the J1/J2 driver oracles.

Three layers of evidence:

1. bit-for-bit equality with the ENGINE kernels (functions/fuzzy.py) over the
   real blocked pair set at SF_DIR plus crafted adversarial pairs;
2. bit-for-bit equality with the INDEPENDENT naive-DP reference
   (tests/fuzzy_reference.py) over the adversarial pairs — so the SQL is not
   just a third transcription of the same bug;
3. domain assertions on the real parquet at every SF: pure ASCII, space-only
   whitespace, BIGINT-safe lengths, NFD→ASCII fold == identity. These are the
   preconditions under which the pure-SQL oracle (fold dropped, masks in
   BIGINT, string_split(' ')) is exact.
"""

import math
import sys
import unicodedata
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fuzzy_reference import partial_ratio_ref, ratio_ref, token_set_ratio_ref

from mass_georeferencing_spark.functions.fuzzy import (
    partial_ratio,
    ratio,
    token_set_ratio,
)
from mass_georeferencing_spark.functions.fuzzy_sql import fuzzy_score_ctes
from mass_georeferencing_spark.sources import synthetic as syn

from tools.parity import duck_connect

from conftest import SF_DIR

ADVERSARIAL = [
    ("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"), ("ab", "ba"),
    ("bcx", "abc"), ("abc", "abc"), ("aaaa", "aa"), ("abab", "babab"),
    ("x y z", "z y x"), ("the cat", "cat the dog"),
    ("  double  space ", "double space"),
    ("aaaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaab"), ("xyzzy", "zzyxx"),
    ("san juan", "juan san de"), ("a b", "b a"), ("q", "qqqqqqqqq"),
    ("ab", "ab"), ("abcd", "dcba"), ("aa bb", "bb aa cc"),
    ("nA pA", "pA nA"), ("zzz", "zzzz"), ("ox", "boxer"),
]




def _run_modes(con, pairs_sql_prefix: str, pairs_cte: str):
    block = fuzzy_score_ctes(
        [
            (pairs_cte, "partial", "o_pr"),
            (pairs_cte, "token_set", "o_ts"),
            (pairs_cte, "ratio", "o_r"),
        ]
    )
    return con.execute(f"""
{pairs_sql_prefix}
{block}
SELECT 'pr' AS k, a, b, score FROM o_pr
UNION ALL SELECT 'ts', a, b, score FROM o_ts
UNION ALL SELECT 'r', a, b, score FROM o_r
""").fetchall()


def _assert_matches(rows, fns, rel_tol: float = 0.0):
    """rel_tol=0 → bit-exact (engine comparison: same operation order).
    The independent reference computes ``100 - 100*dist/total`` instead of the
    engine's ``200*lcs/total`` — mathematically equal, one ULP apart for
    values like 200/3 — so that comparison allows rel_tol=1e-12."""
    bad = []
    for k, a, b, sc in rows:
        want = fns[k](a or "", b or "")
        ok = sc == want if rel_tol == 0.0 else math.isclose(sc, want, rel_tol=rel_tol)
        if not ok:
            bad.append((k, a, b, sc, want))
    assert not bad, bad[:10]


def test_sql_kernels_match_engine_on_real_pairs():
    con = duck_connect(SF_DIR)
    ctes = ",".join(c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE))
    prefix = f"""
WITH RECURSIVE {ctes},
pairs AS MATERIALIZED (
  SELECT DISTINCT g.mention AS a, c.name AS b
  FROM (SELECT lang, mention FROM mentions
        WHERE lower(mention) NOT IN ('none','unknown','no locality data')
        GROUP BY 1, 2) g
  JOIN (SELECT DISTINCT lang, name FROM (
          SELECT lang, name FROM gazetteer
          UNION ALL
          SELECT lang, unnest(string_split(alternatenames, ',')) AS name
          FROM gazetteer WHERE alternatenames IS NOT NULL AND alternatenames <> '')
        WHERE name <> '') c ON c.lang = g.lang),"""
    rows = _run_modes(con, prefix, "pairs")
    assert len(rows) > 1000
    _assert_matches(rows, {"pr": partial_ratio, "ts": token_set_ratio, "r": ratio})


@pytest.fixture()
def adv_con():
    con = duckdb.connect()
    con.execute("CREATE TABLE advp (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO advp VALUES (?, ?)", ADVERSARIAL)
    return con


def test_sql_kernels_match_engine_on_adversarial(adv_con):
    rows = _run_modes(adv_con, "WITH RECURSIVE", "advp")
    assert len(rows) == 3 * len(set((a or "", b or "") for a, b in ADVERSARIAL))
    _assert_matches(rows, {"pr": partial_ratio, "ts": token_set_ratio, "r": ratio})


def test_sql_kernels_match_independent_reference(adv_con):
    rows = _run_modes(adv_con, "WITH RECURSIVE", "advp")
    _assert_matches(
        rows, {"pr": partial_ratio_ref, "ts": token_set_ratio_ref, "r": ratio_ref},
        rel_tol=1e-12,
    )


def test_sql_kernels_match_engine_on_seeded_random_pairs():
    """500 seeded-random ASCII pairs (lengths 0-24, small alphabet to force
    repeats/overlaps, spaces included so token paths engage) — one DuckDB
    query, compared bit-exact against the engine kernels."""
    import numpy as np

    rng = np.random.RandomState(1234)
    alphabet = list("ab cde")
    pairs = []
    for _ in range(500):
        la, lb = rng.randint(0, 25), rng.randint(0, 25)
        a = "".join(rng.choice(alphabet, size=la))
        b = "".join(rng.choice(alphabet, size=lb))
        pairs.append((a, b))
    con = duckdb.connect()
    con.execute("CREATE TABLE advp (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO advp VALUES (?, ?)", pairs)
    rows = _run_modes(con, "WITH RECURSIVE", "advp")
    assert len(rows) == 3 * len(set(pairs))
    _assert_matches(rows, {"pr": partial_ratio, "ts": token_set_ratio, "r": ratio})


def _fold(s: str) -> str:
    return unicodedata.normalize("NFD", s or "").encode("ascii", "ignore").decode("utf-8")


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_corpus_in_sql_kernel_domain(sf):
    """The pure-SQL J1/J2 oracles drop the NFD fold and split on single
    spaces; this pins the preconditions on the actual driver parquet."""
    con = duck_connect(f"/root/testdata/sf{sf}")
    ctes = ",".join(c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE))
    rows = con.execute(f"""
WITH {ctes},
strs AS (
  SELECT mention AS s FROM mentions
  UNION ALL SELECT coalesce(state, '') FROM mentions
  UNION ALL SELECT name FROM gazetteer
  UNION ALL SELECT coalesce(stateprovince, '') FROM gazetteer
  UNION ALL SELECT unnest(string_split(alternatenames, ','))
    FROM gazetteer WHERE alternatenames IS NOT NULL)
SELECT DISTINCT s FROM strs
""").fetchall()
    assert rows
    for (s,) in rows:
        s = s or ""
        assert all(32 <= ord(ch) < 127 for ch in s), f"non-ASCII/control: {s!r}"
        assert "\t" not in s and "\n" not in s
        assert len(s) < 63, f"BIGINT mask overflow risk: {s!r}"
        assert _fold(s) == s
        assert s.split() == [w for w in s.split(" ") if w], f"whitespace: {s!r}"
