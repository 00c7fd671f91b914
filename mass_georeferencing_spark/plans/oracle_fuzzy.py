"""Pure-SQL driver oracles for the fuzzy queries (J1 flagship, J2 fuzzy-mean).

These restate the two fuzzy pipelines as single DuckDB queries with NO Python
UDFs, so the driver's correctness gate can value-check them (previously they
were rows-only). The fuzzy scores come from
:func:`mass_georeferencing_spark.functions.fuzzy_sql.fuzzy_score_ctes` — a
recursive-CTE transcription of the Allison-Dix bit-parallel LCS kernels,
validated bit-for-bit against both the engine kernels and the independent
naive-DP reference (tests/test_fuzzy_sql.py, tests/test_flagship_oracle.py).

The NFD→ASCII fold is the identity here: the synthetic corpus is pure ASCII
(single-space whitespace), asserted at every SF by
tests/test_fuzzy_sql.py::test_corpus_in_sql_kernel_domain — the same
precondition the crc32 minhash/simhash oracles already rely on.

Pipeline skeleton mirrors tests/test_flagship_oracle.py's UDF-based oracle
(which stays as the independent cross-check); reference lifecycle:
batch_georeferencing/batch_georeferencing.py:129-499, scores at
functions.py:272,277,289.
"""

from __future__ import annotations

from ..functions.cells import cell_oracle_sql
from ..functions.fuzzy_sql import fuzzy_score_ctes, strip_stops_sql
from ..operators.scoring import DISTANCE_BAND_SQL
from ..sources import synthetic as syn

__all__ = [
    "flagship_oracle_sql",
    "fuzzy_mean_oracle_sql",
    "streaming_fuzzy_oracle_sql",
]

# Fail-loud domain guard (ADVICE r3): a NULL score means a needle hit the SQL
# kernel's len>=63 domain limit. Silently dropping such rows through a
# `score > threshold` predicate would surface as an opaque row-count mismatch
# in the driver gate; raising here names the cause instead.
_NULL_GUARD = (
    "CASE WHEN {nulls} THEN error("
    "'fuzzy SQL oracle: NULL score — needle length >= 63 is outside the "
    "bit-parallel kernel domain (functions/fuzzy_sql.py); regenerate the "
    "corpus or widen the kernel') ELSE {pred} END"
)


def _hav() -> str:
    # the same meters-scale haversine text every other spatial oracle uses
    from .contract_ext import _HAV

    return _HAV


def flagship_oracle_sql() -> str:
    """J1 flagship as one pure-SQL DuckDB query (no UDFs)."""
    hav = _hav().format(lat1="group_lat", lon1="group_lon", lat2="lat", lon2="lon")
    band = DISTANCE_BAND_SQL.format(d=hav)
    cell = cell_oracle_sql("lat", "lon", 12)
    strip = strip_stops_sql("mention")
    ctes = ",".join(
        c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE)
    )
    fuzzy = fuzzy_score_ctes(
        [
            ("ploc", "partial", "sc1"),
            ("ptok", "token_set", "sc2"),
            ("pstate", "partial", "scst"),
        ],
        tag="j1",
    )
    return f"""
WITH RECURSIVE {ctes},
grp AS MATERIALIZED (
  SELECT md5(concat_ws('|', lang, mention, state)) AS recgroup_id,
         lang, mention, state, no_records, group_lat, group_lon,
         mention AS mention_folded,
         {strip} AS mention_nostop_folded
  FROM (
    SELECT lang, mention, coalesce(state, '') AS state,
           count(*) AS no_records, avg(lat) AS group_lat, avg(lon) AS group_lon
    FROM mentions
    WHERE lower(mention) NOT IN ('none', 'unknown', 'no locality data')
    GROUP BY 1, 2, 3)),
cand AS MATERIALIZED (
  SELECT DISTINCT uid, name, stateprovince, data_source, lang, lon, lat,
         no_features, name AS name_folded,
         coalesce(stateprovince, '') AS stateprovince_folded
  FROM (
    SELECT uid, name, stateprovince, data_source, lang, lon, lat, no_features
    FROM gazetteer
    UNION ALL
    SELECT uid, unnest(string_split(alternatenames, ',')) AS name,
           stateprovince, data_source, lang, lon, lat, no_features
    FROM gazetteer WHERE alternatenames IS NOT NULL AND alternatenames <> '')
  WHERE name <> ''),
blocked AS MATERIALIZED (
  SELECT DISTINCT g.lang, g.mention_folded, g.mention_nostop_folded, c.name_folded
  FROM grp g JOIN cand c ON c.lang = g.lang),
ploc AS MATERIALIZED (SELECT DISTINCT mention_folded AS a, name_folded AS b FROM blocked),
ptok AS MATERIALIZED (SELECT DISTINCT mention_nostop_folded AS a, name_folded AS b FROM blocked),
pstate AS MATERIALIZED (
  SELECT DISTINCT g.state AS a, c.stateprovince_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
{fuzzy},
surv AS (
  SELECT d.lang, d.mention_folded, d.mention_nostop_folded, d.name_folded,
         s1.score AS score1, s2.score AS score2
  FROM blocked d
  JOIN sc1 s1 ON s1.a = d.mention_folded AND s1.b = d.name_folded
  JOIN sc2 s2 ON s2.a = d.mention_nostop_folded AND s2.b = d.name_folded
  WHERE {_NULL_GUARD.format(nulls="s1.score IS NULL OR s2.score IS NULL",
                            pred="s1.score + s2.score > 140")}),
joined AS (
  SELECT g.recgroup_id, g.lang, g.mention, g.state, g.group_lat, g.group_lon,
         c.uid, c.name, c.stateprovince, c.data_source, c.lon, c.lat,
         c.no_features, s.score1, s.score2,
         CAST({_NULL_GUARD.format(nulls="st.score IS NULL", pred="st.score")}
              AS DOUBLE) AS score_state,
         md5(concat_ws('|', g.recgroup_id, c.uid, c.data_source)) AS candidate_id
  FROM grp g
  JOIN surv s ON s.lang = g.lang
             AND s.mention_folded = g.mention_folded
             AND s.mention_nostop_folded = g.mention_nostop_folded
  JOIN cand c ON c.lang = g.lang AND c.name_folded = s.name_folded
  JOIN scst st ON st.a = g.state AND st.b = c.stateprovince_folded),
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


def fuzzy_mean_oracle_sql() -> str:
    """J2 fuzzy-mean as one pure-SQL DuckDB query (no UDFs).

    Semantics: old/shiny/match_localities/match_SI_GBIF.py:43-71 — score =
    (partial_ratio(locality, name) + partial_ratio(state, stateprovince)) / 2,
    keep > 80 (same skeleton as the UDF-based oracle in
    tests/test_rowsonly_oracles.py, which remains the independent check).
    """
    ctes = ",".join(
        c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE)
    )
    fuzzy = fuzzy_score_ctes(
        [("p1", "partial", "sloc"), ("p2", "partial", "sst")], tag="j2"
    )
    return f"""
WITH RECURSIVE {ctes},
grp AS MATERIALIZED (
  SELECT md5(concat_ws('|', lang, mention, state)) AS recgroup_id,
         lang, mention AS mention_folded, state
  FROM (SELECT lang, mention, coalesce(state, '') AS state FROM mentions
        WHERE lower(mention) NOT IN ('none', 'unknown', 'no locality data')
        GROUP BY 1, 2, 3)),
cand AS MATERIALIZED (
  SELECT uid, lang, coalesce(name, '') AS name_folded,
         coalesce(stateprovince, '') AS stateprovince_folded
  FROM (SELECT DISTINCT uid, lang, name, stateprovince, data_source FROM gazetteer)),
p1 AS MATERIALIZED (
  SELECT DISTINCT g.mention_folded AS a, c.name_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
p2 AS MATERIALIZED (
  SELECT DISTINCT g.state AS a, c.stateprovince_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
{fuzzy}
SELECT recgroup_id, uid, round(s, 2) AS score FROM (
  SELECT g.recgroup_id, c.uid,
         (CAST({_NULL_GUARD.format(nulls="a1.score IS NULL OR a2.score IS NULL",
                                   pred="a1.score")} AS DOUBLE)
          + a2.score) / 2.0 AS s
  FROM grp g JOIN cand c ON c.lang = g.lang
  JOIN sloc a1 ON a1.a = g.mention_folded AND a1.b = c.name_folded
  JOIN sst a2 ON a2.a = g.state AND a2.b = c.stateprovince_folded)
WHERE s > 80.0
"""


def streaming_fuzzy_oracle_sql() -> str:
    """§2.8 streaming contract as one pure-SQL DuckDB query (no UDFs).

    The ``streaming_fuzzy_microbatch`` driver row drains a real availableNow
    file-source stream whose foreachBatch reuses the BATCH fuzzy join; its
    distinct projection over ``STREAM_CONTRACT_COLS`` equals the batch
    pipeline's distinct output for ANY micro-batch slicing (every column is a
    pure function of the group key and the candidate row —
    streaming/incremental.py:99-114, equality pinned by
    tests/test_streaming.py::test_stream_fuzzy_contract_equals_batch).
    This restates that deterministic batch-equivalent set with the same
    recursive-CTE fuzzy kernels the J1 flagship oracle uses, so the driver
    gate can value-check the streaming row (rows-only through round 3).

    Skeleton: record groups over the geoparsed mentions (same extraction the
    stream's geoparse_stream applies — sources/synthetic.py MENTIONS_CTE),
    normalized gazetteer candidates (normalize_candidates: fold = identity on
    the ASCII corpus, NULL stateprovince → ''), blocked distinct-pair scoring,
    threshold score1 + score2 > 140 (functions.py:292), state similarity,
    DISTINCT over the contract projection.
    """
    strip = strip_stops_sql("mention")
    ctes = ",".join(
        c.strip() for c in (syn.PAGES_CTE, syn.MENTIONS_CTE, syn.GAZETTEER_CTE)
    )
    fuzzy = fuzzy_score_ctes(
        [
            ("ploc", "partial", "sc1"),
            ("ptok", "token_set", "sc2"),
            ("pstate", "partial", "scst"),
        ],
        tag="sm",
    )
    guard = _NULL_GUARD.format(
        nulls="s1.score IS NULL OR s2.score IS NULL OR st.score IS NULL",
        pred="s1.score + s2.score > 140",
    )
    return f"""
WITH RECURSIVE {ctes},
grp AS MATERIALIZED (
  SELECT md5(concat_ws('|', lang, mention, state)) AS recgroup_id,
         lang, mention, state,
         mention AS mention_folded,
         {strip} AS mention_nostop_folded
  FROM (SELECT DISTINCT lang, mention, coalesce(state, '') AS state
        FROM mentions
        WHERE lower(mention) NOT IN ('none', 'unknown', 'no locality data'))),
cand AS MATERIALIZED (
  SELECT uid, name, data_source, lang,
         name AS name_folded,
         coalesce(stateprovince, '') AS stateprovince_folded
  FROM gazetteer),
ploc AS MATERIALIZED (
  SELECT DISTINCT g.mention_folded AS a, c.name_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
ptok AS MATERIALIZED (
  SELECT DISTINCT g.mention_nostop_folded AS a, c.name_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
pstate AS MATERIALIZED (
  SELECT DISTINCT g.state AS a, c.stateprovince_folded AS b
  FROM grp g JOIN cand c ON c.lang = g.lang),
{fuzzy}
SELECT DISTINCT g.recgroup_id, g.mention, g.state, c.uid, c.name, c.data_source,
       s1.score AS score1, s2.score AS score2, st.score AS score_state
FROM grp g
JOIN cand c ON c.lang = g.lang
JOIN sc1 s1 ON s1.a = g.mention_folded AND s1.b = c.name_folded
JOIN sc2 s2 ON s2.a = g.mention_nostop_folded AND s2.b = c.name_folded
JOIN scst st ON st.a = g.state AND st.b = c.stateprovince_folded
WHERE {guard}
"""
