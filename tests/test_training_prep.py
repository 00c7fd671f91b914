"""Value-level oracle for the composed training-data preparation plan.

The whole `plans/training_prep.py` dataflow — language-ID → quality filter →
exact dedup → MinHash-LSH near-dup removal → annotation — is restated as ONE
DuckDB query over the same parquet, with every non-SQL kernel supplied by the
INDEPENDENT references from test_rowsonly_oracles (two-step-mod minhash,
plain-dict lang-id, byte-shingle Jaccard), and compared rows+schema+values
under the driver-replica comparator.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from test_rowsonly_oracles import (
    _build_profiles_ref,
    _jaccard_ref,
    _minhash_band_hash_ref,
)

from mass_georeferencing_spark.plans.contract_ext import (
    _STOPS_SQL,
    QUALITY_SCORE_ORACLE_SQL,
)
from mass_georeferencing_spark.plans.training_prep import prepare_training_corpus
from tools.parity import compare, duck_connect

from conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def _pred_ref(profiles):
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

    return pred


def test_training_prep_matches_duckdb_oracle(spark, duck):
    stages = prepare_training_corpus(spark, SF_DIR)
    got = stages["corpus"].toPandas()

    sample = duck.execute("SELECT lang, text FROM documents LIMIT 200").fetchall()
    duck.create_function("pred", _pred_ref(_build_profiles_ref(sample)), ["VARCHAR"], "VARCHAR")
    duck.create_function("band_hash", _minhash_band_hash_ref, ["VARCHAR", "BIGINT"], "BIGINT")
    duck.create_function("jacc", _jaccard_ref, ["VARCHAR", "VARCHAR"], "DOUBLE")

    want = duck.execute(f"""
WITH q AS ({QUALITY_SCORE_ORACLE_SQL}),
kept AS (
  SELECT d.doc_id, d.lang, d.text, q.quality,
         CASE WHEN trim(d.text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS n_tokens
  FROM documents d JOIN q USING (doc_id)
  WHERE q.quality >= 70.0),
fp AS (
  SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM kept),
eu AS (
  SELECT fp.* FROM fp
  JOIN (SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY 1) reps
  USING (fingerprint, doc_id)),
bands AS (
  SELECT * FROM (
    SELECT e.doc_id, e.text, r.range AS band, band_hash(e.text, r.range) AS band_hash
    FROM eu e CROSS JOIN range(16) r)
  WHERE band_hash IS NOT NULL),
capped AS (
  SELECT b.* FROM bands b
  JOIN (SELECT band, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) <= 1000) ok
  USING (band, band_hash)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id),
verified AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN eu ta ON ta.doc_id = p.id_a
  JOIN eu tb ON tb.doc_id = p.id_b
  WHERE jacc(ta.text, tb.text) >= 0.5)
SELECT doc_id, lang, pred(text) AS pred_lang, quality, n_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS bpe_tokens,
       fingerprint, text
FROM eu
WHERE doc_id NOT IN (SELECT id_b FROM verified)
""").fetchdf()

    # the filter chain must be doing real work at this fixture size
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs
    errs = compare("training_prep_corpus", got, want)
    assert not errs, errs


def test_training_prep_stages_are_monotone(spark):
    stages = prepare_training_corpus(spark, SF_DIR)
    n_kept = stages["kept"].count()
    n_eu = stages["exact_unique"].count()
    n_corpus = stages["corpus"].count()
    assert n_kept >= n_eu >= n_corpus > 0
    # healthy fixture: the bucket cap fired on nothing, and the report says so
    assert stages["dropped_buckets"].count() == 0
    # greedy removal: no verified pair survives into the corpus
    pairs = stages["near_dup_pairs"].select("id_a", "id_b").collect()
    kept_ids = {r.doc_id for r in stages["corpus"].select("doc_id").collect()}
    for p in pairs:
        assert not (p.id_a in kept_ids and p.id_b in kept_ids)
