"""Incremental ingest via Structured Streaming (optional mode — SURVEY.md §2.8).

The reference is pure batch; the engine's incremental path processes newly
crawled pages as micro-batches: a file-source stream over the pages directory →
the same geoparse + record-grouping transformations → windowed mention counts
with a watermark on ``warc_ts`` (late crawl records tolerated up to the
watermark), plus a ``foreachBatch`` hook that reuses the BATCH fuzzy-join
pipeline verbatim — one code path for both modes.

This keeps streaming semantics honest: aggregations are keyed on
(window(warc_ts), lang, mention) with append/update handled by Spark's state
store; checkpointLocation makes the stream itself resumable, mirroring
plans/checkpoint.py for batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import garbage_locality_filter

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string, doc_id bigint"


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def geoparse_stream(pages: DataFrame) -> DataFrame:
    """Stateless geoparse (same extraction as sources/synthetic.py mentions)."""
    m1 = pages.withColumn("mention", F.regexp_extract("text", r"^(\w+ \w+)", 1))
    m2 = pages.withColumn("mention", F.regexp_extract("text", r"^\w+ \w+ \w+ (\w+ \w+)", 1))
    out = m1.unionByName(m2).where(F.col("mention") != "")
    return out.select(
        "url",
        "warc_ts",
        "lang",
        "mention",
        F.regexp_extract("text", r"^\w+ \w+ (\w+)", 1).alias("state"),
    ).where(garbage_locality_filter(F.col("mention")))


def windowed_mention_counts(
    mentions: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window record-group counts — the streaming analog of
    the A1 grouping; late pages within the watermark still merge into their
    window's group state."""
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang", "mention")
        .agg(F.count(F.lit(1)).alias("no_records"))
    )


def start_incremental_georeference(
    spark: SparkSession,
    pages_path: str,
    gazetteer: DataFrame,
    out_path: str,
    checkpoint_path: str,
):
    """End-to-end incremental mode: stream pages → per-micro-batch reuse of the
    BATCH fuzzy pipeline (foreachBatch = exactly-once sink with the stream's own
    checkpoint), appending candidates parquet."""
    from ..operators.fuzzy_join import fuzzy_candidate_join
    from ..operators.layers import normalize_candidates
    from ..operators.record_groups import build_record_groups

    cand = normalize_candidates(gazetteer)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        mentions = geoparse_stream(batch_df)
        groups = build_record_groups(mentions)
        scored = fuzzy_candidate_join(groups, cand)
        scored.write.mode("append").parquet(out_path)

    return (
        read_pages_stream(spark, pages_path)
        .writeStream.option("checkpointLocation", checkpoint_path)
        .foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
