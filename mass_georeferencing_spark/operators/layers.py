"""Gazetteer layer front-end: normalization, alias expansion, unions (P1, U1-U2,
F5-F6, J7-J8, A3-A4).

Reference: every layer query projects to ``(uid, name, stateprovince, data_source)``
(batch_georeferencing/queries.py:57,241,410 et al.); GADM expands 12 alias branches
(queries.py:103-131); geonames/wikidata explode comma-packed alternate names
(queries.py:444,494); unions dedup via GROUP BY with no aggregates (queries.py:57).

Scale notes: layers are dimension tables (10^5–10^9 rows, BASELINE.md) — the
normalization is narrow projections + generators (explode), no shuffles except the
final ``dropDuplicates`` which the engine makes optional (exact-dedup A4) because
the fuzzy join's dedup-before-score already collapses repeated names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import ascii_fold_udf

CANDIDATE_COLS = ("uid", "name", "stateprovince", "data_source")


def explode_alternate_names(
    layer: DataFrame,
    alt_col: str = "alternatenames",
    name_col: str = "name",
    sep: str = ",",
) -> DataFrame:
    """F6/U2: one candidate row per name variant — the primary name plus each
    entry of the comma-packed alternate list (queries.py:440-447
    ``unnest(string_to_array(alternatenames, ','))``)."""
    base = layer.drop(alt_col)
    alts = (
        layer.where(F.col(alt_col).isNotNull() & (F.col(alt_col) != ""))
        .withColumn(name_col, F.explode(F.split(F.col(alt_col), sep)))
        .drop(alt_col)
    )
    return base.unionByName(alts).where(F.col(name_col) != "")


def county_alias_names(
    layer: DataFrame,
    name_col: str = "name",
    admin1_col: str = "stateprovince",
) -> DataFrame:
    """F5/U1: GADM-style alias expansion — emit the bare name plus
    '<name> Co., <admin1>' and '<name>, <admin1>' forms (queries.py:108-130)."""
    alias1 = layer.withColumn(
        name_col, F.concat(F.col(name_col), F.lit(" Co., "), F.col(admin1_col))
    )
    alias2 = layer.withColumn(
        name_col, F.concat(F.col(name_col), F.lit(", "), F.col(admin1_col))
    )
    return layer.unionByName(alias1).unionByName(alias2)


def normalize_candidates(
    layer: DataFrame,
    dedup: bool = True,
    fold: bool = True,
) -> DataFrame:
    """P1 + A4 + F2: project to the candidate schema, ASCII-fold the fuzzy-join
    inputs (functions.py:264-265), optionally exact-dedup (queries.py:57 GROUP BY)."""
    cols = [c for c in layer.columns]
    out = layer
    if fold:
        out = out.withColumn("name_folded", ascii_fold_udf(F.col("name"))).withColumn(
            "stateprovince_folded", ascii_fold_udf(F.col("stateprovince"))
        )
    if dedup:
        out = out.dropDuplicates([c for c in ("uid", "name", "stateprovince", "data_source") if c in cols])
    return out


def union_layers(*layers: DataFrame, dedup: bool = False) -> DataFrame:
    """U1/U2: union candidate layers by name (missing columns null-filled)."""
    out = layers[0]
    for more in layers[1:]:
        out = out.unionByName(more, allowMissingColumns=True)
    if dedup:
        out = out.dropDuplicates(["uid", "name", "stateprovince", "data_source"])
    return out


def join_alternate_name_table(
    records: DataFrame,
    names: DataFrame,
    key: str = "source_id",
) -> DataFrame:
    """J8: wikidata records × names equi-join (queries.py:494). ``names`` is the
    smaller side at reference scale → broadcast."""
    return records.join(F.broadcast(names), on=key)


def collapse_duplicate_localities(
    occurrences: DataFrame,
    group_cols: list[str],
    uid_col: str = "uid",
) -> DataFrame:
    """A3: MAX(uid) as representative + count(*) multiplicity
    (queries.py:32 ``MAX(gbifid::bigint) AS uid, count(*) AS no_features``)."""
    return occurrences.groupBy(*group_cols).agg(
        F.max(uid_col).alias(uid_col), F.count(F.lit(1)).alias("no_features")
    )
