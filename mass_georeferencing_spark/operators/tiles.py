"""Tile aggregation: multi-resolution rollups + adaptive cell splitting.

The tiling half of the north rule ("H3/S2 index … tile assignments"): once every
row carries a cell id, per-tile analytics are plain group-bys, and coarser zoom
levels derive from finer ones by integer parent math — NO re-scan of the raw
coordinates, no Python. This is the engine's "hypertable rollup": aggregate once
at the finest resolution, then fold counts upward res-by-res (each fold shuffles
only the tile table, which shrinks geometrically).

Adaptive cell splitting (skew, SURVEY.md O9): a tile table keyed at a fixed
resolution puts Tokyo and the Pacific in same-sized buckets. ``adaptive_cells``
re-keys rows in over-full cells to children at a finer resolution, bounding
rows-per-cell — the partition-sizing knob for downstream per-cell work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def tile_counts(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Finest-level tile table: (cell, n [, extra aggs])."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    return (
        points.where(F.col(lat_col).isNotNull())
        .withColumn("cell", C.latlng_to_cell_col(F.col(lat_col), F.col(lon_col), res))
        .groupBy("cell")
        .agg(*aggs)
    )


def rollup_tiles(tiles: DataFrame, res: int, parent_res: int) -> DataFrame:
    """Fold a tile table one or more levels up: counts sum, no raw-data re-scan."""
    return (
        tiles.withColumn("cell", C.cell_parent_col(F.col("cell"), res, parent_res))
        .groupBy("cell")
        .agg(F.sum("n").alias("n"))
    )


def tile_pyramid(
    points: DataFrame,
    resolutions: list[int],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All zoom levels in one frame: finest level aggregated from points, each
    coarser level folded from the previous (geometrically shrinking shuffles).
    Output: (res, cell, n)."""
    resolutions = sorted(resolutions, reverse=True)
    finest = resolutions[0]
    level = tile_counts(points, finest, lat_col, lon_col)
    out = level.select(F.lit(finest).alias("res"), "cell", "n")
    prev_res = finest
    for r in resolutions[1:]:
        level = rollup_tiles(level, prev_res, r)
        out = out.unionByName(level.select(F.lit(r).alias("res"), "cell", "n"))
        prev_res = r
    return out


def adaptive_cells(
    points: DataFrame,
    base_res: int,
    max_rows_per_cell: int,
    split_delta: int = 2,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "cell",
) -> DataFrame:
    """Mixed-resolution cell assignment: rows in cells holding more than
    ``max_rows_per_cell`` re-key to the child cell ``split_delta`` levels finer.
    One count-aggregate + one broadcast of the (small) hot-cell set."""
    base = points.withColumn("_base", C.latlng_to_cell_col(F.col(lat_col), F.col(lon_col), base_res))
    hot = (
        base.groupBy("_base")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_rows_per_cell)
        .select("_base")
        .withColumn("_hot", F.lit(True))
    )
    fine = C.latlng_to_cell_col(F.col(lat_col), F.col(lon_col), base_res + split_delta)
    return (
        base.join(F.broadcast(hot), on="_base", how="left")
        .withColumn(out_col, F.when(F.col("_hot").isNotNull(), fine).otherwise(F.col("_base")))
        .drop("_base", "_hot")
    )
