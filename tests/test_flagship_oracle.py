"""End-to-end oracle for the FLAGSHIP query (J1) — the one operator the
driver's pure-SQL gate can only rows-check.

DuckDB can register Python scalar functions, so the full flagship pipeline
(geoparse → record groups → alternate-name explode → blocked fuzzy join with
threshold → top-50 → spatial banding → EAV melt → mean → prune → cell assign)
is restated as ONE DuckDB query whose fuzzy/fold UDFs are the INDEPENDENT
naive-DP reference kernels (tests/fuzzy_reference.py) — not the engine's.
Row counts, schema, and values must match the Spark flagship exactly under
the same comparator the driver replica uses (tools/parity.compare).
"""

import sys
import unicodedata
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fuzzy_reference import partial_ratio_ref, token_set_ratio_ref

from mass_georeferencing_spark.functions.cells import cell_oracle_sql
from mass_georeferencing_spark.functions.textnorm import ENGLISH_STOPWORDS
from mass_georeferencing_spark.operators.scoring import DISTANCE_BAND_SQL
from mass_georeferencing_spark.plans.contract_ext import _HAV
from mass_georeferencing_spark.plans.pipeline import flagship
from mass_georeferencing_spark.sources import synthetic as syn
from tools.parity import compare, duck_connect

from conftest import SF_DIR

_STOPS = frozenset(ENGLISH_STOPWORDS)


def _fold(s: str) -> str:
    # the reference's own fold (batch_georeferencing.py:151) — independent of
    # the engine's pandas-vectorized kernel
    return unicodedata.normalize("NFD", s or "").encode("ascii", "ignore").decode("utf-8")


def _strip_stops(s: str) -> str:
    return " ".join(w for w in (s or "").split() if w not in _STOPS)


def _pr(a, b) -> float:
    return partial_ratio_ref(a or "", b or "")


def _tsr(a, b) -> float:
    return token_set_ratio_ref(a or "", b or "")


def _oracle_sql() -> str:
    hav = _HAV.format(lat1="group_lat", lon1="group_lon", lat2="lat", lon2="lon")
    band = DISTANCE_BAND_SQL.format(d=hav)
    cell = cell_oracle_sql("lat", "lon", 12)
    ctes = ",".join(
        c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE)
    )
    return f"""
WITH {ctes},
grp AS (
  SELECT md5(concat_ws('|', lang, mention, state)) AS recgroup_id,
         lang, mention, state, no_records, group_lat, group_lon,
         fold(mention) AS mention_folded,
         fold(strip_stops(mention)) AS mention_nostop_folded
  FROM (
    SELECT lang, mention, coalesce(state, '') AS state,
           count(*) AS no_records, avg(lat) AS group_lat, avg(lon) AS group_lon
    FROM mentions
    WHERE lower(mention) NOT IN ('none', 'unknown', 'no locality data')
    GROUP BY 1, 2, 3)),
cand AS (
  SELECT DISTINCT uid, name, stateprovince, data_source, lang, lon, lat,
         no_features, fold(name) AS name_folded,
         fold(stateprovince) AS stateprovince_folded
  FROM (
    SELECT uid, name, stateprovince, data_source, lang, lon, lat, no_features
    FROM gazetteer
    UNION ALL
    SELECT uid, unnest(string_split(alternatenames, ',')) AS name,
           stateprovince, data_source, lang, lon, lat, no_features
    FROM gazetteer WHERE alternatenames IS NOT NULL AND alternatenames <> '')
  WHERE name <> ''),
surv AS (
  SELECT * FROM (
    SELECT lang, mention_folded, mention_nostop_folded, name_folded,
           partial_ratio(mention_folded, name_folded) AS score1,
           token_set_ratio(mention_nostop_folded, name_folded) AS score2
    FROM (SELECT DISTINCT g.lang, g.mention_folded, g.mention_nostop_folded,
                 c.name_folded
          FROM grp g JOIN cand c ON c.lang = g.lang))
  WHERE score1 + score2 > 140),
joined AS (
  SELECT g.recgroup_id, g.lang, g.mention, g.state, g.group_lat, g.group_lon,
         c.uid, c.name, c.stateprovince, c.data_source, c.lon, c.lat,
         c.no_features, s.score1, s.score2,
         partial_ratio(g.state, c.stateprovince_folded) AS score_state,
         md5(concat_ws('|', g.recgroup_id, c.uid, c.data_source)) AS candidate_id
  FROM grp g
  JOIN surv s ON s.lang = g.lang
             AND s.mention_folded = g.mention_folded
             AND s.mention_nostop_folded = g.mention_nostop_folded
  JOIN cand c ON c.lang = g.lang AND c.name_folded = s.name_folded),
top AS (
  SELECT * FROM (
    SELECT j.*, ROW_NUMBER() OVER (PARTITION BY recgroup_id
      ORDER BY score1 DESC NULLS LAST, score2 DESC NULLS LAST,
               score_state DESC NULLS LAST, no_features DESC NULLS LAST,
               uid ASC) AS _rn
    FROM joined j) WHERE _rn <= 50),
kept0 AS (
  SELECT *, CASE WHEN group_lat IS NOT NULL AND lat IS NOT NULL
                 THEN CAST(({band}) AS DOUBLE) END AS score_spatial
  FROM top),
eav AS (
  SELECT candidate_id, score FROM (
    SELECT candidate_id, CAST(score1 AS DOUBLE) AS score FROM kept0
    UNION ALL SELECT candidate_id, CAST(score2 AS DOUBLE) FROM kept0
    UNION ALL SELECT candidate_id, CAST(score_state AS DOUBLE) FROM kept0
    UNION ALL SELECT candidate_id, score_spatial FROM kept0)
  WHERE score IS NOT NULL),
means AS (SELECT candidate_id, round(avg(score), 1) AS mean_score
          FROM eav GROUP BY 1)
SELECT k.recgroup_id, k.lang, k.mention, k.state, k.uid, k.name, k.data_source,
       k.score1, k.score2, k.score_state, m.mean_score, k.no_features,
       {cell} AS cell
FROM kept0 k LEFT JOIN means m USING (candidate_id)
WHERE m.mean_score IS NULL OR m.mean_score >= 80
"""


def test_flagship_matches_duckdb_udf_oracle(spark):
    got = flagship(spark, SF_DIR).toPandas()

    con = duck_connect(SF_DIR)
    con.create_function("fold", _fold, ["VARCHAR"], "VARCHAR")
    con.create_function("strip_stops", _strip_stops, ["VARCHAR"], "VARCHAR")
    con.create_function("partial_ratio", _pr, ["VARCHAR", "VARCHAR"], "DOUBLE")
    con.create_function("token_set_ratio", _tsr, ["VARCHAR", "VARCHAR"], "DOUBLE")
    want = con.execute(_oracle_sql()).fetchdf()

    assert len(got) > 0
    errs = compare("j1_fuzzy_flagship", got, want)
    assert not errs, errs

    # the DRIVER-GATE oracle (pure SQL, no UDFs — recursive-CTE bit-parallel
    # LCS, plans/oracle_fuzzy.py) must agree with both the engine and this
    # independent-UDF restatement
    from mass_georeferencing_spark.plans.oracle_fuzzy import flagship_oracle_sql

    pure = con.execute(flagship_oracle_sql()).fetchdf()
    errs = compare("j1_fuzzy_flagship_pure_sql_vs_udf", pure, want)
    assert not errs, errs
    errs = compare("j1_fuzzy_flagship_pure_sql_vs_engine", got, pure)
    assert not errs, errs
