"""Parquet table scans (reference S1/S2: per-layer Postgres scans,
batch_georeferencing/batch_georeferencing.py:163-499 → columnar parquet reads).

At 100 TB these would be Iceberg/partitioned-parquet catalogs; the scan API is the
same (`spark.read.parquet` → Catalyst pushes filters + prunes columns). Keep every
downstream operator expressed against the DataFrame so pushdown stays automatic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (mirrors the driver's DuckDB
    view registration so spark.sql() text can be shared/diffed with oracles)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
