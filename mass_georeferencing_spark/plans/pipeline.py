"""The end-to-end georeferencing dataflow (reference lifecycle §3.1 restated).

The reference's triple loop (species × country × layer,
batch_georeferencing/batch_georeferencing.py:129-499) collapses to ONE dataflow:

  pages → geoparse mentions → record groups (A1)
        → gazetteer layers normalized + unioned (P1, U1-U2, F5-F6)
        → blocked fuzzy join (J1) → filter s1+s2>140 → top-50 per group (W1)
        → spatial distance-band score (J5, vs group inline coords)
        → long-form scores (EAV) → mean per candidate (A6) → prune < 80 (J9)
        → per-group candidate counts (A5) → drop empty groups
        → tile/cell assignments (F14) for every kept candidate

Shuffles: the group-by (A1), the block-key join (J1, broadcast when the gazetteer
slice is small), the pair-dedup + join-back, the top-k window (hash on
recgroup_id), and the final mean aggregation — each on a key the next stage
reuses. Everything else is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from ..operators.fuzzy_join import fuzzy_candidate_join
from ..operators.layers import explode_alternate_names, normalize_candidates
from ..operators.record_groups import build_record_groups, group_id
from ..operators.scoring import (
    MIN_SCORE,
    distance_band_score,
    drop_empty_groups,
    group_candidate_counts,
    mean_scores,
    melt_scores,
    prune_low_scores,
)
from ..operators.topk import TOP_K, topk_per_group
from ..sources import synthetic


def georeference(
    spark: SparkSession,
    sf_dir: str,
    min_score: float = MIN_SCORE,
    top_k: int = TOP_K,
    spatial: bool = True,
    range_scoring: bool = False,
    elevation_scoring: bool = False,
    elevation_strategy: str = "broadcast",
    broadcast_candidates: bool = False,
    cell_res: int = C.DEFAULT_POINT_RES,
) -> dict[str, DataFrame]:
    """Run the full pipeline over the synthetic pages/gazetteer derivation.

    Returns the intermediate + final DataFrames keyed by stage name (the
    checkpoint runner in plans/checkpoint.py persists these per stage).
    """
    mentions = synthetic.mentions_df(spark, sf_dir)
    # both sides feed two plan subtrees each (distinct-pair build + blocked
    # join), so persist once — at scale these are the SMALL relations
    groups = build_record_groups(mentions, coord_cols=("lat", "lon")).persist()

    gaz = synthetic.gazetteer_df(spark, sf_dir)
    candidates = normalize_candidates(explode_alternate_names(gaz)).persist()

    scored = fuzzy_candidate_join(
        groups,
        candidates,
        block_keys=["lang"],
        broadcast_candidates=broadcast_candidates,
    ).withColumn("candidate_id", group_id(F.col("recgroup_id"), F.col("uid"), F.col("data_source")))

    top = topk_per_group(
        scored,
        partition_cols=["recgroup_id"],
        order_cols=["score1", "score2", "score_state", "no_features"],
        k=top_k,
    ).persist()  # consumed by both the EAV melt and the prune join — without
    # this the fuzzy-join subtree executes twice in one action

    if spatial:
        from ..functions.geo import haversine_col

        dist = haversine_col(F.col("group_lon"), F.col("group_lat"), F.col("lon"), F.col("lat"))
        top = top.withColumn(
            "score_spatial",
            F.when(
                F.col("group_lat").isNotNull() & F.col("lat").isNotNull(),
                distance_band_score(dist).cast("double"),
            ),
        )
        score_cols = {
            "locality.partial_ratio": "score1",
            "locality.token_set_ratio": "score2",
            "stateprovince": "score_state",
            "locality.spatial": "score_spatial",  # functions.py:60
        }
    else:
        score_cols = None

    if elevation_scoring:
        # the reference's elevation disambiguation (J6, functions.py:145-230,
        # call site commented at batch_georeferencing.py:500-513): candidate →
        # nearest elevation sample → banded |claimed − sampled| score.
        # ``elevation_strategy``: 'broadcast' collects + broadcasts the grid
        # (right when the elevation side is a regional raster sample);
        # 'rings' routes to the cell-ring-expansion kNN for web-scale grids —
        # both are exact and produce identical results (tests/test_pipeline.py).
        from ..operators.knn import knn_join, knn_join_broadcast
        from ..operators.scoring import elevation_band_score

        elev = synthetic.elevation_grid_df(spark, sf_dir).select(
            F.col("grid_id").alias("target_id"),
            F.col("lat").alias("target_lat"),
            F.col("lon").alias("target_lon"),
            "elev_m",
        )
        cand_pts = (
            top.select("candidate_id", F.col("lat").alias("q_lat"), F.col("lon").alias("q_lon"))
            .where(F.col("q_lat").isNotNull())
            .dropDuplicates(["candidate_id"])
        )
        knn_impl = knn_join_broadcast if elevation_strategy == "broadcast" else knn_join
        knn_kwargs = {} if elevation_strategy == "broadcast" else {"res": 3}
        nearest = knn_impl(
            cand_pts.withColumnRenamed("candidate_id", "query_id"),
            elev.drop("elev_m"),
            k=1,
            lat_col="q_lat",
            lon_col="q_lon",
            **knn_kwargs,
        ).select(F.col("query_id").alias("candidate_id"), "target_id")
        nearest = nearest.join(elev.select("target_id", "elev_m"), on="target_id")
        # join-back is AQE-decided, NOT forced broadcast: `nearest` has one row
        # per distinct surviving candidate — a set that grows with the data
        # (top-k × #groups), unlike a dimension. AQE promotes to broadcast from
        # the measured size when it fits (same treatment as the fuzzy
        # join-backs, d104938).
        top = top.join(
            nearest.select("candidate_id", F.col("elev_m").alias("_elev")),
            on="candidate_id",
            how="left",
        ).withColumn(
            "score_elevation",
            F.when(
                F.col("_elev").isNotNull() & F.col("group_lat").isNotNull(),
                elevation_band_score(
                    (F.abs(F.col("group_lat")) * 30) - F.col("_elev")
                ).cast("double"),
            ),
        ).drop("_elev")

    if range_scoring:
        # the reference's spatial_match mode (settings.py.template, J5):
        # per-lang range = convex hull of that lang's known coordinates,
        # built once + broadcast; candidate distance to range banded
        from ..operators.spatial import build_range_wkb, range_distance_scores

        ranges = build_range_wkb(mentions.where(F.col("lat").isNotNull()))
        top = range_distance_scores(
            top.withColumnRenamed("lat", "cand_lat").withColumnRenamed("lon", "cand_lon"),
            ranges,
            lat_col="cand_lat",
            lon_col="cand_lon",
        ).withColumnRenamed("cand_lat", "lat").withColumnRenamed("cand_lon", "lon")
        if score_cols is not None:
            score_cols = {**score_cols, "locality.range": "score_range"}
    if elevation_scoring and score_cols is not None:
        score_cols = {**score_cols, "elevation": "score_elevation"}  # functions.py:179

    scores_long = melt_scores(top, score_cols=score_cols)
    kept = prune_low_scores(top, scores_long, min_score=min_score)
    kept = kept.withColumn(
        "cell", C.latlng_to_cell_col(F.col("lat"), F.col("lon"), cell_res)
    )

    groups_with_counts = drop_empty_groups(group_candidate_counts(kept, groups))
    means = mean_scores(scores_long)

    return {
        "mentions": mentions,
        "groups": groups,
        "candidates": candidates,
        "scored": scored,
        "top": top,
        "scores_long": scores_long,
        "kept": kept,
        "means": means,
        "groups_final": groups_with_counts,
    }


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline query: per record group, its surviving top candidates with
    fuzzy + spatial scores and tile assignment — the engine's reason to exist."""
    kept = georeference(spark, sf_dir)["kept"]
    return kept.select(
        "recgroup_id",
        "lang",
        "mention",
        "state",
        "uid",
        "name",
        "data_source",
        "score1",
        "score2",
        "score_state",
        "mean_score",
        "no_features",
        "cell",
    )
