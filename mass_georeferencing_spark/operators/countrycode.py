"""F7 — verbatim country-name → ISO-code normalization (effective reference
semantics: the reference's behavior with its two pinned dead-branch/escaping
artifacts cleaned up — see CLEANUP_PATTERN and the case-insensitivity note).

Reference: database/cleanup_countrycode.py:85-122 — occurrences whose
``countrycode`` is NULL get one derived from the verbatim country string:

1. cleanup: ``TRIM(regexp_replace(verbatim, '[^a-zA-Z \\\\]', '', 'g'))``
   (cleanup_countrycode.py:85);
2. direct lookup of the cleaned name against the country dim by ``name``,
   falling back to ``common_name`` (:96-103, pycountry get(name=)/get(
   common_name=));
3. otherwise split the name on ``/``, falling back to ``' or '``, then
   ``' and '`` (:105-111); each part is trimmed and looked up (name, then
   common_name); the found alpha-2 codes join with ``','`` and apply only
   when non-empty (:112-121).

The reference's UPDATE keys on the verbatim string with NO null-code guard
(:98 ``WHERE countryverbatim = ...``), so a resolved verbatim overwrites
matching rows that already carried a code — preserved here as
``coalesce(mapped, existing)``. Lookups are modeled case-insensitively: the
reference's lower()/capitalize() round-trip exists to hit pycountry's string
index (and drops parts whose leading separator space defeats capitalize);
a broadcast dim join on lowercased keys replaces the per-row library call
with one deterministic rule.

Scale design: the resolution runs over DISTINCT verbatim strings — the
reference's ``GROUP BY countryverbatim`` — a bounded country-name vocabulary
orders of magnitude smaller than the occurrence table, then broadcasts back.
The country dim is broadcast to every lookup. Zero Python UDFs: cleanup,
splitting and code assembly are all codegen'd JVM string ops, so the whole
operator rides the occurrence scan plus two broadcast hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# keep letters, spaces and '/' — effective-semantics reading of the reference
# class (cleanup_countrycode.py:85): its Python source renders the SQL keep
# class as [^a-zA-Z \\] (letters/space/BACKSLASH), which strips '/' during
# cleanup and makes the reference's own '/'-split branch (:106) unreachable —
# the '\\\\' is an escaping artifact of the intended '/'. Keeping '/' makes
# the multi-value split live (same dead-branch cleanup rationale as F9);
# digits/punctuation still vanish before any lookup.
CLEANUP_PATTERN = r"[^a-zA-Z /]"


def resolve_country_codes(
    occurrences: DataFrame,
    countries: DataFrame,
    verbatim_col: str = "countryverbatim",
    name_col: str = "name",
    common_name_col: str = "common_name",
    code_col: str = "alpha_2",
) -> DataFrame:
    """Distinct-verbatim resolution map: one row per input verbatim string
    that resolves, with its derived code (single alpha-2 or the ','-joined
    multi-code of the split path). ``countries`` must be dimension-sized
    (broadcast twice: name index + common-name index)."""
    low = F.lower(F.trim(F.regexp_replace(F.col(verbatim_col), CLEANUP_PATTERN, "")))
    verb = (
        occurrences.select(verbatim_col)
        .where(F.col(verbatim_col).isNotNull())
        .distinct()
        .withColumn("_low", low)
    )
    names = countries.select(
        F.lower(F.col(name_col)).alias("_k"), F.col(code_col).alias("_nc")
    )
    commons = countries.where(F.col(common_name_col).isNotNull()).select(
        F.lower(F.col(common_name_col)).alias("_k"), F.col(code_col).alias("_cc")
    )
    # fail-loud dim contract: the lookups replace a dict-style library index,
    # which CANNOT fan out — duplicate lowercased keys here would silently
    # multiply matching occurrence rows through the map join. The dim is
    # broadcast-sized, so the probe is one tiny job per index.
    for idx, what in ((names, name_col), (commons, common_name_col)):
        dup = idx.groupBy("_k").count().where(F.col("count") > 1).limit(1)
        if not dup.isEmpty():
            k = dup.collect()[0]["_k"]
            raise ValueError(
                f"normalize_country_codes: countries dim has duplicate "
                f"lowercased {what} key {k!r} — a lookup index must be "
                f"unique or every matching occurrence row would duplicate; "
                f"dedupe the dim (or disambiguate the colliding names) first"
            )
    direct = (
        verb.join(F.broadcast(names), verb["_low"] == names["_k"], "left")
        .drop("_k")
        .join(F.broadcast(commons), F.col("_low") == commons["_k"], "left")
        .drop("_k")
        .withColumn("_direct", F.coalesce("_nc", "_cc"))
        .drop("_nc", "_cc")
    )
    # separator precedence is the reference's: '/' first, then ' or ', then
    # ' and '; no separator → the whole string is the single (already-failed)
    # part, mirroring the len==1 fallthrough
    parts_arr = (
        F.when(F.col("_low").contains("/"), F.split("_low", "/"))
        .when(F.col("_low").contains(" or "), F.split("_low", " or "))
        .when(F.col("_low").contains(" and "), F.split("_low", " and "))
        .otherwise(F.array(F.col("_low")))
    )
    parts = (
        direct.where(F.col("_direct").isNull())
        .select(verbatim_col, F.posexplode(parts_arr).alias("_pos", "_part"))
        .withColumn("_p", F.trim("_part"))
    )
    part_codes = (
        parts.join(F.broadcast(names), parts["_p"] == names["_k"], "left")
        .drop("_k")
        .join(F.broadcast(commons), F.col("_p") == commons["_k"], "left")
        .drop("_k")
        .withColumn("_code", F.coalesce("_nc", "_cc"))
        .where(F.col("_code").isNotNull())
    )
    # ','-join in part order (cleanup_countrycode.py:117); unfound parts drop
    split_codes = part_codes.groupBy(verbatim_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_code"))),
                lambda s: s["_code"],
            ),
            ",",
        ).alias("_split")
    )
    return (
        direct.join(split_codes, on=verbatim_col, how="left")
        .select(
            verbatim_col,
            F.coalesce("_direct", "_split").alias("resolved_code"),
        )
        .where(F.col("resolved_code").isNotNull())
    )


def normalize_country_codes(
    occurrences: DataFrame,
    countries: DataFrame,
    verbatim_col: str = "countryverbatim",
    code_col: str = "countrycode",
    name_col: str = "name",
    common_name_col: str = "common_name",
    dim_code_col: str = "alpha_2",
) -> DataFrame:
    """Apply the F7 normalization: fill (and, per the reference's unguarded
    UPDATE, overwrite) ``code_col`` from the resolved verbatim map. Returns
    the occurrence frame with ``code_col`` updated in place."""
    vmap = resolve_country_codes(
        occurrences.where(F.col(code_col).isNull()),
        countries,
        verbatim_col=verbatim_col,
        name_col=name_col,
        common_name_col=common_name_col,
        code_col=dim_code_col,
    )
    return (
        occurrences.join(F.broadcast(vmap), on=verbatim_col, how="left")
        .withColumn(code_col, F.coalesce("resolved_code", code_col))
        .select(*occurrences.columns)
    )
