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
    max_files_per_trigger: int = 4,
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
        read_pages_stream(spark, pages_path, max_files_per_trigger)
        .writeStream.option("checkpointLocation", checkpoint_path)
        .foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )


# stable contract projection: everything per-(group, candidate) deterministic.
# `no_records` is intentionally EXCLUDED — it counts records per micro-batch,
# so a group whose pages span batches reports partial counts per batch; every
# column below depends only on the group key and the candidate row, so the
# distinct set is identical however the input is sliced into batches.
STREAM_CONTRACT_COLS = [
    "recgroup_id",
    "mention",
    "state",
    "uid",
    "name",
    "data_source",
    "score1",
    "score2",
    "score_state",
]


def streaming_fuzzy_contract(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Contract query for the incremental mode (SURVEY.md §2.8): materialize the
    synthetic pages table as a multi-file parquet directory, drive the
    foreachBatch fuzzy pipeline through ≥2 real micro-batches with
    ``trigger(availableNow=True)``, and return the distinct
    (group, candidate, scores) set.

    The distinct projection over :data:`STREAM_CONTRACT_COLS` equals the batch
    pipeline's distinct output for ANY micro-batch slicing: scores are pure
    functions of (mention, state, candidate) and grouping is keyed on the same
    md5 recgroup_id in every batch, so cross-batch repeats collapse
    (value-level equality pinned by tests/test_streaming.py).
    """
    import os
    import tempfile

    from ..sources import synthetic as syn

    root = tempfile.mkdtemp(prefix="mgs_stream_contract_")
    pages_path = os.path.join(root, "pages")
    syn.pages_df(spark, sf_dir).repartition(n_files).write.mode("overwrite").parquet(pages_path)
    q = start_incremental_georeference(
        spark,
        pages_path,
        syn.gazetteer_df(spark, sf_dir),
        os.path.join(root, "out"),
        os.path.join(root, "ck"),
        max_files_per_trigger,
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("incremental stream did not drain within 600s")
    return (
        spark.read.parquet(os.path.join(root, "out"))
        .select(*STREAM_CONTRACT_COLS)
        .dropDuplicates()
    )
