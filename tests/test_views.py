"""UI read-path view shapes (SURVEY §3.3)."""

from pyspark.sql import functions as F

from mass_georeferencing_spark.plans import views
from mass_georeferencing_spark.plans.pipeline import georeference

from conftest import SF_DIR


def test_views_shapes(spark):
    out = georeference(spark, SF_DIR)
    rg = views.species_recgroups(out["groups_final"]).collect()
    counts = [r.no_records for r in rg]
    assert counts == sorted(counts, reverse=True)

    one_group = rg[0].recgroup_id
    cands = views.group_candidates(out["kept"], one_group).collect()
    assert all(c.recgroup_id == one_group for c in cands)
    assert len(cands) >= 1

    scores = views.candidate_scores(out["scores_long"], cands[0].candidate_id).collect()
    assert {s.score_type for s in scores} >= {"locality.partial_ratio", "locality.token_set_ratio"}

    sel = views.selection_payload(out["kept"])
    assert {"candidate_id", "point_or_polygon", "lat", "lon", "cell"} <= set(sel.columns)
    assert sel.count() == out["kept"].count()
