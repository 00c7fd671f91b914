"""Full value-level local oracles for the six driver rows-only contract queries.

The driver's pure-SQL gate can only rows-check queries whose kernels aren't
ANSI-SQL-expressible (LSH banding, trigram language-ID, fuzzy scoring, IVF).
All six are DETERMINISTIC, so each gets the flagship's treatment
(tests/test_flagship_oracle.py): the whole contract query restated against an
INDEPENDENT reimplementation — DuckDB SQL with registered Python UDFs where
the dataflow is relational (minhash/simhash LSH, lang-id, J2 fuzzy-mean), a
from-scratch pandas/python pipeline where it isn't (hyperplane LSH, IVF) —
and compared rows+schema+values under the driver-replica comparator
(tools.parity.compare, STRICT dtypes).

Independence notes (what is re-derived, not imported from the engine):
- minhash: int64 two-step-mod universal hashing ((a·h) mod p + b) mod p —
  numerically equal to, but structurally different from, the engine's
  uint64-overflow formulation (dedup.py:44-46); band hash re-packed with
  struct.pack('<4q') instead of ndarray.tobytes().
- simhash: pure-python-int splitmix64 + per-bit accumulator loop vs the
  engine's numpy bit vectors.
- fuzzy: the naive-DP reference kernels (tests/fuzzy_reference.py).
- lang-id: plain-dict trigram profiles + classify loop (same spec, no
  Counter/pandas_udf machinery).
- cosine/LSH bits: sequential left-fold dot products mirroring the JVM
  `aggregate` fold order bit-for-bit (dedup.cosine_col).
Shared by design (parameters, not computation): the seeded RandomState(42)
permutation/plane draws, crc32, and the splitmix64 constants — all published
configuration of the algorithm.
"""

from __future__ import annotations

import hashlib
import math
import struct
import sys
import unicodedata
import zlib
from functools import lru_cache
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry
from fuzzy_reference import partial_ratio_ref

from mass_georeferencing_spark.sources import synthetic as syn
from tools.parity import compare, duck_connect

from conftest import SF_DIR

MERSENNE_P = (1 << 61) - 1
M64 = (1 << 64) - 1

QUERIES = entry.queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def _reg(duck, name, fn, args, ret):
    """create_function, idempotent — several tests share the module connection."""
    try:
        duck.create_function(name, fn, args, ret)
    except duckdb.Error:
        # already registered by an earlier test on this shared connection
        pass


# ---------------------------------------------------------------------------
# independent kernels
# ---------------------------------------------------------------------------

_rng = np.random.RandomState(42)
_A = _rng.randint(1, 1 << 31, size=64, dtype=np.uint64).astype(np.int64)
_B = _rng.randint(0, MERSENNE_P, size=64, dtype=np.uint64).astype(np.int64)


def _char_shingles_ref(text: str, k: int = 5) -> set[bytes]:
    b = (text or "").encode("utf-8", "ignore")
    if not b:
        return set()
    if len(b) <= k:
        return {b}
    return {b[i : i + k] for i in range(len(b) - k + 1)}


@lru_cache(maxsize=None)
def _minhash_sig_ref(text: str) -> tuple[int, ...] | None:
    sh = _char_shingles_ref(text)
    if not sh:
        return None
    hs = np.fromiter((zlib.crc32(s) for s in sorted(sh)), dtype=np.int64, count=len(sh))
    # (a·h) mod p then + b mod p: every intermediate < 2^63, so plain int64 —
    # no dependence on the engine's uint64 wraparound trick
    m = (hs[:, None] * _A[None, :]) % MERSENNE_P
    m = (m + _B[None, :]) % MERSENNE_P
    return tuple(int(x) for x in m.min(axis=0))


def _minhash_band_hash_ref(text: str | None, band: int | None) -> int | None:
    sig = _minhash_sig_ref(text or "")
    if sig is None:
        return None
    chunk = sig[band * 4 : (band + 1) * 4]
    return zlib.crc32(struct.pack("<4q", *chunk)) | (band << 32)


@lru_cache(maxsize=None)
def _simhash_ref(text: str) -> int:
    acc = [0] * 64
    for w in (text or "").split():
        z = (zlib.crc32(w.encode()) + 1 + 0x9E3779B97F4A7C15) & M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
        z ^= z >> 31
        for i in range(64):
            acc[i] += 1 if (z >> i) & 1 else -1
    out = sum(1 << i for i in range(64) if acc[i] > 0)
    return out - (1 << 64) if out >= (1 << 63) else out


def _jaccard_ref(ta: str | None, tb: str | None) -> float:
    a, b = _char_shingles_ref(ta or ""), _char_shingles_ref(tb or "")
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def _fold_ref(s: str | None) -> str:
    return unicodedata.normalize("NFD", s or "").encode("ascii", "ignore").decode()


def _dot_seq(a, b) -> float:
    # sequential left fold — the exact IEEE op order of the JVM
    # aggregate(zip_with(...)) in dedup.cosine_col
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cosine_seq(a, b) -> float | None:
    na = math.sqrt(_dot_seq(a, a))
    nb = math.sqrt(_dot_seq(b, b))
    denom = na * nb
    if denom == 0.0:
        return None  # Spark double division by zero -> NULL
    return _dot_seq(a, b) / denom


# ---------------------------------------------------------------------------
# j2_fuzzy_mean — DuckDB UDF oracle
# ---------------------------------------------------------------------------


def test_j2_fuzzy_mean_matches_duckdb_udf_oracle(spark, duck):
    got = QUERIES["j2_fuzzy_mean"](spark, SF_DIR).toPandas()
    duck.create_function("fold", _fold_ref, ["VARCHAR"], "VARCHAR")
    duck.create_function(
        "partial_ratio", lambda a, b: partial_ratio_ref(a or "", b or ""),
        ["VARCHAR", "VARCHAR"], "DOUBLE",
    )
    ctes = ",".join(c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE))
    want = duck.execute(f"""
WITH {ctes},
grp AS (
  SELECT md5(concat_ws('|', lang, mention, state)) AS recgroup_id,
         lang, fold(mention) AS mention_folded, state
  FROM (SELECT lang, mention, coalesce(state, '') AS state FROM mentions
        WHERE lower(mention) NOT IN ('none', 'unknown', 'no locality data')
        GROUP BY 1, 2, 3)),
cand AS (
  SELECT uid, lang, fold(name) AS name_folded,
         fold(stateprovince) AS stateprovince_folded
  FROM (SELECT DISTINCT uid, lang, name, stateprovince, data_source FROM gazetteer))
SELECT recgroup_id, uid, round(s, 2) AS score FROM (
  SELECT g.recgroup_id, c.uid,
         (partial_ratio(g.mention_folded, c.name_folded)
          + partial_ratio(g.state, c.stateprovince_folded)) / 2.0 AS s
  FROM grp g JOIN cand c ON c.lang = g.lang)
WHERE s > 80.0
""").fetchdf()
    assert len(got) > 0
    errs = compare("j2_fuzzy_mean", got, want)
    assert not errs, errs

    # the DRIVER-GATE oracle (pure SQL, recursive-CTE LCS — no UDFs) must
    # agree with both the engine and this independent-UDF restatement
    pure = duck.execute(entry.oracle_sql()["j2_fuzzy_mean"]).fetchdf()
    errs = compare("j2_pure_sql_vs_udf", pure, want)
    assert not errs, errs
    errs = compare("j2_pure_sql_vs_engine", got, pure)
    assert not errs, errs


# ---------------------------------------------------------------------------
# dedup_minhash_pairs — DuckDB UDF oracle
# ---------------------------------------------------------------------------


def _want_minhash(duck) -> pd.DataFrame:
    _reg(duck, "band_hash", _minhash_band_hash_ref, ["VARCHAR", "BIGINT"], "BIGINT")
    _reg(duck, "jacc", _jaccard_ref, ["VARCHAR", "VARCHAR"], "DOUBLE")
    return duck.execute("""
WITH bands AS (
  SELECT * FROM (
    SELECT d.doc_id, r.range AS band, band_hash(d.text, r.range) AS band_hash
    FROM documents d CROSS JOIN range(16) r)
  WHERE band_hash IS NOT NULL),
capped AS (
  SELECT b.* FROM bands b
  JOIN (SELECT band, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) <= 1000) ok
  USING (band, band_hash)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
  SELECT p.id_a, p.id_b, jacc(ta.text, tb.text) AS j
  FROM pairs p
  JOIN documents ta ON ta.doc_id = p.id_a
  JOIN documents tb ON tb.doc_id = p.id_b)
WHERE j >= 0.5
""").fetchdf()


def test_dedup_minhash_pairs_matches_duckdb_udf_oracle(spark, duck):
    got = QUERIES["dedup_minhash_pairs"](spark, SF_DIR).toPandas()
    want = _want_minhash(duck)
    assert len(got) > 0
    errs = compare("dedup_minhash_pairs", got, want)
    assert not errs, errs


# ---------------------------------------------------------------------------
# dedup_simhash_pairs — DuckDB UDF oracle
# ---------------------------------------------------------------------------


def _want_simhash(duck) -> pd.DataFrame:
    _reg(duck, "simhash_ref", _simhash_ref, ["VARCHAR"], "BIGINT")
    _reg(duck, "bandval", lambda sh, b: ((sh & M64) >> (16 * b)) & 0xFFFF,
         ["BIGINT", "BIGINT"], "BIGINT")
    _reg(duck, "ham", lambda a, b: bin((a ^ b) & M64).count("1"),
         ["BIGINT", "BIGINT"], "INTEGER")
    return duck.execute("""
WITH fp AS (
  SELECT doc_id, simhash_ref(text) AS sh FROM documents
  WHERE length(trim(text)) > 0),
banded AS (
  SELECT doc_id, sh, r.range AS band, bandval(sh, r.range) AS bv
  FROM fp CROSS JOIN range(4) r),
capped AS (
  SELECT b.* FROM banded b
  JOIN (SELECT band, bv FROM banded GROUP BY 1, 2 HAVING count(*) <= 1000) ok
  USING (band, bv)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
  FROM capped a JOIN capped b USING (band, bv)
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b, ham(sh_a, sh_b) AS hamming FROM pairs)
WHERE hamming <= 10
""").fetchdf()


def test_dedup_simhash_pairs_matches_duckdb_udf_oracle(spark, duck):
    got = QUERIES["dedup_simhash_pairs"](spark, SF_DIR).toPandas()
    want = _want_simhash(duck)
    assert len(got) > 0
    errs = compare("dedup_simhash_pairs", got, want)
    assert not errs, errs


# ---------------------------------------------------------------------------
# text_lang_id — DuckDB UDF oracle
# ---------------------------------------------------------------------------


def _build_profiles_ref(rows: list[tuple[str, str]]) -> dict[str, dict[str, float]]:
    by_lang: dict[str, list[str]] = {}
    for lang, text in rows:
        by_lang.setdefault(lang, []).append(text)
    profiles: dict[str, dict[str, float]] = {}
    for lang, texts in by_lang.items():
        counts: dict[str, int] = {}
        for t in texts:
            t2 = f"  {t or ''} ".lower()
            for i in range(len(t2) - 2):
                g = t2[i : i + 3]
                counts[g] = counts.get(g, 0) + 1
        total = sum(counts.values()) or 1
        top = sorted(counts.items(), key=lambda kv: kv[1], reverse=True)[:300]
        profiles[lang] = {g: c / total for g, c in top}
    return profiles


def _want_lang_id(duck) -> pd.DataFrame:
    sample = duck.execute("SELECT lang, text FROM documents LIMIT 200").fetchall()
    profiles = _build_profiles_ref(sample)
    langs = sorted(profiles)

    def pred(t: str | None) -> str:
        t2 = f"  {t or ''} ".lower()
        grams: dict[str, int] = {}
        for i in range(len(t2) - 2):
            g = t2[i : i + 3]
            grams[g] = grams.get(g, 0) + 1
        total = sum(grams.values()) or 1
        best, best_score = langs[0] if langs else "", -1.0
        for lang in langs:
            prof = profiles[lang]
            score = sum(min(c / total, prof.get(g, 0.0)) for g, c in grams.items())
            if score > best_score:
                best, best_score = lang, score
        return best

    _reg(duck, "pred", pred, ["VARCHAR"], "VARCHAR")
    return duck.execute(
        "SELECT doc_id, lang, pred(text) AS pred_lang FROM documents"
    ).fetchdf()


def test_text_lang_id_matches_duckdb_udf_oracle(spark, duck):
    got = QUERIES["text_lang_id"](spark, SF_DIR).toPandas()
    want = _want_lang_id(duck)
    assert len(got) > 0
    errs = compare("text_lang_id", got, want)
    assert not errs, errs


# ---------------------------------------------------------------------------
# emb_lsh_near_dup — pandas/python reference pipeline
# ---------------------------------------------------------------------------


def _load_embeddings() -> list[tuple[int, list[float]]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    # float32 -> exact double, mirroring Spark's cast(array<float> as double)
    return [(int(i), [float(np.float32(x)) for x in v]) for i, v in rows]


def _want_emb_lsh() -> pd.DataFrame:
    vecs = dict(_load_embeddings())
    planes = np.random.RandomState(42).standard_normal((16, 64))
    sig = {}
    for vid, v in vecs.items():
        s = 0
        for i in range(16):
            if _dot_seq(v, [float(x) for x in planes[i]]) >= 0:
                s |= 1 << i
        sig[vid] = s
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, s in sig.items():
        for band in range(4):
            buckets.setdefault((band, (s >> (band * 4)) & 0xF), []).append(vid)
    pairs = set()
    for members in buckets.values():
        if len(members) > 1000:  # max_bucket rail
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pairs.add((a, b))
    out = []
    for a, b in sorted(pairs):
        cos = _cosine_seq(vecs[a], vecs[b])
        if cos is not None and cos >= 0.42:
            out.append((a, b, round(cos, 6)))
    return pd.DataFrame(out, columns=["id_a", "id_b", "cosine"]).astype(
        {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
    )


def test_emb_lsh_near_dup_matches_python_reference(spark):
    got = QUERIES["emb_lsh_near_dup"](spark, SF_DIR).toPandas()
    want = _want_emb_lsh()
    assert len(got) > 0
    errs = compare("emb_lsh_near_dup", got, want)
    assert not errs, errs


# ---------------------------------------------------------------------------
# ann_ivf_topk — pandas/python reference pipeline (seeds → Lloyd → probe)
# ---------------------------------------------------------------------------


def _assign_ref(vecs: dict[int, list[float]], cents: dict[int, list[float]]) -> dict[int, int]:
    cids = sorted(cents)
    out = {}
    for vid, v in vecs.items():
        best_cid, best = cids[0], -np.inf
        for cid in cids:
            cos = _cosine_seq(v, cents[cid])
            r = -np.inf if cos is None else round(cos, 9)
            if r > best:  # ties keep the LOWEST id (first seen)
                best_cid, best = cid, r
        out[vid] = best_cid
    return out


def _want_ivf() -> pd.DataFrame:
    vecs = dict(_load_embeddings())
    # deterministic_centroids: 8 lowest (md5(str(id)), id)
    seeds = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:8]
    cents = {i: list(vecs[i]) for i in seeds}
    # 2 Lloyd rounds: assign -> per-dim member mean (empty cluster keeps prev)
    for _ in range(2):
        assign = _assign_ref(vecs, cents)
        members: dict[int, list[list[float]]] = {}
        for vid, cid in assign.items():
            members.setdefault(cid, []).append(vecs[vid])
        cents = {
            cid: (
                [float(np.mean([m[d] for m in members[cid]])) for d in range(64)]
                if cid in members
                else prev
            )
            for cid, prev in cents.items()
        }
    assign = _assign_ref(vecs, cents)

    # per query: probe the nprobe=3 nearest centroids, exact top-5 within
    rows = []
    for qid in sorted(v for v in vecs if v < 5):
        qv = vecs[qid]
        scored_c = sorted(
            ((c, _cosine_seq(qv, cents[c])) for c in cents),
            key=lambda t: (-round(t[1], 9) if t[1] is not None else np.inf, t[0]),
        )
        probed = {c for c, _ in scored_c[:3]}
        cand = [vid for vid, cid in assign.items() if cid in probed]
        scored = sorted(
            ((vid, _cosine_seq(qv, vecs[vid])) for vid in cand),
            key=lambda t: (-round(t[1], 9) if t[1] is not None else np.inf, t[0]),
        )
        for rank, (vid, cos) in enumerate(scored[:5], start=1):
            rows.append((qid, vid, round(cos, 6), rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine", "rank"]).astype(
        {"query_id": "int64", "vec_id": "int64", "cosine": "float64", "rank": "int32"}
    )


def test_ann_ivf_topk_matches_python_reference(spark):
    got = QUERIES["ann_ivf_topk"](spark, SF_DIR).toPandas()
    want = _want_ivf()
    assert len(got) > 0
    errs = compare("ann_ivf_topk", got, want)
    assert not errs, errs


# ---------------------------------------------------------------------------
# pure-SQL driver-gate oracles (plans/contract_ext.py) vs the same references
# ---------------------------------------------------------------------------
# The five queries above also carry PURE DuckDB SQL twins under the driver
# gate (no UDF registration). Closing the triangle — engine == python
# reference (tests above) AND sql twin == python reference (here) — pins the
# SQL strings without needing a Spark session, at a second scale factor.

_SQL_TWIN_REFS = {
    "dedup_minhash_pairs": _want_minhash,
    "dedup_simhash_pairs": _want_simhash,
    "text_lang_id": _want_lang_id,
    "emb_lsh_near_dup": lambda duck: _want_emb_lsh(),
    "ann_ivf_topk": lambda duck: _want_ivf(),
}


@pytest.mark.parametrize("name", sorted(_SQL_TWIN_REFS))
def test_pure_sql_driver_oracle_matches_reference(name, duck):
    sql = entry.oracle_sql()[name]
    got = duck.execute(sql).fetchdf()
    want = _SQL_TWIN_REFS[name](duck)
    assert len(got) > 0
    errs = compare(f"sql_twin:{name}", got, want)
    assert not errs, errs
