"""UI read-path views (SURVEY.md §3.3) — the query shapes the reference's Shiny
client issues against the output tables, restated as DataFrame views:

- species_recgroups: groups sorted by desc(no_records) (app.R:640-654, W4);
- group_candidates: per-group candidates in display order — source-priority
  list position then mean score desc (app.R:899-901, W3);
- candidate_scores: the long-form EAV per candidate (app.R:1114-1125);
- selection payload: candidate + centroid/uncertainty for the save action
  (app.R:1297-1315, 2037).

Pure compositions over pipeline outputs — no new operators, mirroring the
reference where the UI adds no semantics beyond ordering/projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topk import ranked_display_order

DISPLAY_PRIORITY = ["admin", "webnames"]  # app.R:900's source-priority vector analog


def species_recgroups(groups_final: DataFrame) -> DataFrame:
    return groups_final.orderBy(F.desc("no_records"), F.asc("recgroup_id"))


def group_candidates(kept: DataFrame, recgroup_id: str | None = None) -> DataFrame:
    df = kept if recgroup_id is None else kept.where(F.col("recgroup_id") == recgroup_id)
    return ranked_display_order(df, priority=DISPLAY_PRIORITY, score_col="mean_score")


def candidate_scores(scores_long: DataFrame, candidate_id: str | None = None) -> DataFrame:
    df = scores_long
    if candidate_id is not None:
        df = df.where(F.col("candidate_id") == candidate_id)
    return df.orderBy("candidate_id", "score_type")


def selection_payload(kept: DataFrame) -> DataFrame:
    """What the save action persists (mg_selected_candidates analog,
    database/mass_georef_database.sql:365-376): candidate id, point/polygon
    kind, rounded coordinates (app.R:1484-1485), cell assignment."""
    return kept.select(
        "recgroup_id",
        "candidate_id",
        "uid",
        "data_source",
        F.lit("point").alias("point_or_polygon"),
        F.round(F.col("lat"), 5).alias("lat"),
        F.round(F.col("lon"), 5).alias("lon"),
        "mean_score",
        "cell",
    )
