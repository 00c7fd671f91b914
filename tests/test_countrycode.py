"""F7 verbatim-country normalization (cleanup_countrycode.py:85-122) + the
retired-from-contract F12 rounding value oracle."""

from pyspark.sql import functions as F

from mass_georeferencing_spark.operators.countrycode import normalize_country_codes
from mass_georeferencing_spark.sources import synthetic as syn

from conftest import SF_DIR
from tools.parity import duck_connect as duck


def _countries(spark):
    return spark.createDataFrame(
        [
            ("MX", "Mexico", None),
            ("US", "United states", "The united states"),
            ("CA", "Canada", None),
            ("GM", "Gambia", "The gambia"),
        ],
        "alpha_2 string, name string, common_name string",
    )


def _occ(spark, rows):
    return spark.createDataFrame(
        rows, "occ_id bigint, countryverbatim string, countrycode string"
    )


def _run(spark, rows):
    out = normalize_country_codes(_occ(spark, rows), _countries(spark))
    return {r.occ_id: r.countrycode for r in out.collect()}


def test_direct_name_with_cleanup(spark):
    # punctuation/digits vanish before lookup; match is case-insensitive
    got = _run(spark, [(1, "MEXICO!!9", None), (2, "  canada \t".strip() + "##", None)])
    assert got == {1: "MX", 2: "CA"}


def test_common_name_fallback(spark):
    got = _run(spark, [(1, "The United States123", None), (2, "the gambia", None)])
    assert got == {1: "US", 2: "GM"}


def test_split_separator_precedence(spark):
    # '/' beats ' or ' beats ' and '; codes join in part order; unfound drop
    got = _run(
        spark,
        [
            (1, "mexico / CANADA", None),
            (2, "canada or mexico", None),
            (3, "mexico and atlantis", None),
            (4, "atlantis and neverland", None),
        ],
    )
    assert got == {1: "MX,CA", 2: "CA,MX", 3: "MX", 4: None}


def test_unmatched_and_null_verbatim_stay_null(spark):
    got = _run(spark, [(1, "terra incognita 99", None), (2, None, None)])
    assert got == {1: None, 2: None}


def test_unguarded_update_overwrites_existing_code(spark):
    # the reference UPDATE keys on the verbatim string with no null-code
    # guard: a resolved verbatim overwrites rows that already had a code,
    # but only when some null-code row shares the string
    got = _run(
        spark,
        [(1, "MEXICO!!9", None), (2, "MEXICO!!9", "ZZ"), (3, "canada", "ZZ")],
    )
    assert got == {1: "MX", 2: "MX", 3: "ZZ"}


def test_f7_contract_matches_oracle(spark):
    from mass_georeferencing_spark.plans.contract_ext2 import _q_f7_verbatim_country
    from tools.parity import compare

    sdf = _q_f7_verbatim_country(spark, SF_DIR).toPandas()
    from mass_georeferencing_spark.plans.contract_ext2 import F7_VERBATIM_ORACLE

    ddf = duck(SF_DIR).execute(F7_VERBATIM_ORACLE).fetchdf()
    assert compare("f7_verbatim_country", sdf, ddf) == []
    # every branch is represented: direct, common, multi-code, unmatched NULL,
    # overwritten pre-coded row
    codes = sdf.set_index("occ_id")["countrycode"]
    assert codes.notna().any() and codes.isna().any()
    assert any("," in c for c in codes.dropna())
    # unguarded-overwrite semantics: every pre-coded (occ_id % 8 == 6) row
    # whose verbatim string also resolved for a null-code (% 8 == 0) row must
    # carry that resolved code, not its original 'ZZ'
    m0 = sdf[(sdf.occ_id % 8 == 0) & sdf.countrycode.notna()]
    resolved = dict(zip(m0.countryverbatim, m0.countrycode))
    m6 = sdf[(sdf.occ_id % 8 == 6) & sdf.countryverbatim.isin(resolved)]
    assert len(m6) > 0, "synthetic data must exercise the overwrite branch"
    assert (m6.countrycode == m6.countryverbatim.map(resolved)).all()
    assert not (m6.countrycode == "ZZ").any()


def test_f12_rounding_oracle(spark):
    # retired from the 50-slot driver contract in round 4; value parity pinned
    # here so the evidence survives
    from mass_georeferencing_spark.plans.contract_ext2 import (
        F12_ROUNDING_ORACLE,
        _q_f12_rounding,
    )
    from tools.parity import compare

    sdf = _q_f12_rounding(spark, SF_DIR).toPandas()
    ddf = duck(SF_DIR).execute(F12_ROUNDING_ORACLE).fetchdf()
    assert compare("f12_rounding", sdf, ddf) == []
