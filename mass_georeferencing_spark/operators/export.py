"""Export sinks (S5/S6, J11): denormalized selection join + partitioned writes.

Reference: per-country CSV exports with QUOTE_ALL (tools/export_postgis_csv.py:
110-300), shapefile-per-source zips (export_downloads/export.R:133-136), and the
5-way export star join (export.R:78-117). Spark restatement: one chained
equi-join plan + ``partitionBy`` columnar/CSV writes — the partition column IS
the per-country file split the reference loops by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_star_join(
    selected: DataFrame,
    candidates: DataFrame,
    groups: DataFrame,
    mentions: DataFrame,
    pages: DataFrame | None = None,
) -> DataFrame:
    """J11: mg_selected_candidates ⋈ mg_candidates ⋈ recordgroups ⋈ records ⋈
    occurrences (export_downloads/export.R:78-117) — chained equi-joins on ids;
    the dimension sides broadcast when small."""
    out = (
        selected.join(candidates, on="candidate_id")
        .join(groups, on="recgroup_id")
        .join(mentions, on=["lang", "mention", "state"])
    )
    if pages is not None:
        out = out.join(pages, on="url")
    return out


def write_partitioned_csv(
    df: DataFrame, path: str, partition_col: str = "lang", quote_all: bool = True
) -> None:
    """S5: one CSV directory per partition value (per-country files,
    tools/export_postgis_csv.py:110; QUOTE_ALL per :300)."""
    (
        df.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("header", True)
        .option("quoteAll", quote_all)
        .csv(path)
    )


def write_geoparquet_like(df: DataFrame, path: str, partition_col: str | None = None) -> None:
    """S6 analog: columnar geo export (WKB column stays binary; parquet replaces
    the reference's pgsql2shp shapefile hop)."""
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)
