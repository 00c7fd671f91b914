"""Branch-by-branch unit test of the full GADM alias expansion (U1,
batch_georeferencing/queries.py:103-131). The driver oracle checks the same
operator end-to-end over the synthetic supplier-derived hierarchy
(gadm_alias_names contract query); this pins each branch's exact output on a
hand-built fixture."""

from pyspark.sql import functions as F

from mass_georeferencing_spark.operators.layers import gadm_alias_names

COLS = [
    "uid", "level", "name_0", "name_1", "name_2", "name_3", "name_4",
    "name_5", "varname", "type_2",
]


def _fixture(spark):
    rows = [
        # level-1 state with a variant name
        ("g1", 1, "United States", "state 1", None, None, None, None, "alt1", None),
        # level-2 US county (type County) in an abbreviated state
        ("g2", 2, "United States", "state 1", "orange", None, None, None, None, "County"),
        # level-2 US municipality (no Co. branch, but type-suffix branch)
        ("g3", 2, "United States", "state 2", "plum", None, None, None, "altp", "Municipality"),
        # level-2 NON-US county: no US extras at all
        ("g4", 2, "Mexico", "sonora", "rio", None, None, None, None, "County"),
        # level-3 row: hierarchy concat of 2 ancestors + country
        ("g5", 3, "Canada", "bc", "capital", "victoria", None, None, None, None),
        # level-5 row: full 4-ancestor concat, varname ignored at level 5
        ("g6", 5, "Mexico", "s", "c", "d", "w", "deep", "altd", None),
    ]
    gadm = spark.createDataFrame(rows, COLS)
    abbrevs = spark.createDataFrame(
        [("state 1", "ST1")], ["state", "abbreviation"]
    )
    return gadm, abbrevs


def test_all_thirteen_branches(spark):
    gadm, abbrevs = _fixture(spark)
    out = {
        (r.uid, r.name, r.stateprovince)
        for r in gadm_alias_names(gadm, abbrevs).collect()
    }
    expected = {
        # L1 + varname_1 (branches 1-2)
        ("g1", "state 1", "state 1"),
        ("g1", "alt1", "state 1"),
        # L2 base (branch 3) for g2/g3/g4
        ("g2", "orange", "state 1, United States"),
        ("g3", "plum", "state 2, United States"),
        ("g4", "rio", "sonora, Mexico"),
        # varname_2 (branch 4): only g3 has one
        ("g3", "altp", "state 2, United States"),
        # L3 (branch 5)
        ("g5", "victoria", "capital, bc, Canada"),
        # L5 (branch 9) — NO varname branch at level 5
        ("g6", "deep", "w, d, c, s, Mexico"),
        # US 'Co.' form (branch 10): type County only
        ("g2", "orange Co., state 1", "state 1, United States"),
        # US type-suffix form (branch 11): every US level-2 row
        ("g2", "orange County, state 1", "state 1, United States"),
        ("g3", "plum Municipality, state 2", "state 2, United States"),
        # US abbreviation forms (branches 12-13): only states in the lookup
        ("g2", "orange, ST1", "state 1, United States"),
        ("g2", "orange Co., ST1", "state 1, United States"),
    }
    assert out == expected
    # every row carries the layer tag
    assert {
        r.data_source for r in gadm_alias_names(gadm, abbrevs).select("data_source").distinct().collect()
    } == {"gadm"}
