"""Structured-streaming incremental-mode tests: stream result == batch result."""

import pytest
from pyspark.sql import functions as F

from mass_georeferencing_spark.sources import synthetic as syn
from mass_georeferencing_spark.streaming import incremental

from conftest import SF_DIR


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    syn.pages_df(spark, SF_DIR).repartition(4).write.mode("overwrite").parquet(str(d / "pages"))
    return str(d / "pages")


def test_stream_counts_match_batch(spark, pages_dir, tmp_path):
    stream = incremental.read_pages_stream(spark, pages_dir)
    assert stream.isStreaming
    counts = incremental.windowed_mention_counts(incremental.geoparse_stream(stream))
    q = (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(no_records) AS n FROM mention_counts").collect()[0].n
    batch = incremental.geoparse_stream(syn.pages_df(spark, SF_DIR)).count()
    assert got == batch


def test_incremental_pipeline_foreachbatch(spark, pages_dir, tmp_path):
    gaz = syn.gazetteer_df(spark, SF_DIR)
    out = str(tmp_path / "cands")
    q = incremental.start_incremental_georeference(
        spark, pages_dir, gaz, out, str(tmp_path / "ck2")
    )
    q.awaitTermination(180)
    result = spark.read.parquet(out)
    assert result.count() > 0
    assert {"recgroup_id", "uid", "score1", "score2"} <= set(result.columns)
    # resumable: a second availableNow run with the same checkpoint adds nothing
    n1 = result.count()
    q2 = incremental.start_incremental_georeference(
        spark, pages_dir, gaz, out, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_stream_fuzzy_contract_equals_batch(spark):
    """Value-level stream==batch equality for the streaming_fuzzy_microbatch
    contract query: the availableNow foreachBatch run over ≥2 micro-batches
    must produce exactly the batch fuzzy pipeline's distinct
    (group, candidate, scores) set — scores bit-identical (same kernels, same
    inputs), grouping keyed on the same md5 recgroup_id in every batch."""
    from mass_georeferencing_spark.operators.fuzzy_join import fuzzy_candidate_join
    from mass_georeferencing_spark.operators.layers import normalize_candidates
    from mass_georeferencing_spark.operators.record_groups import build_record_groups

    got = incremental.streaming_fuzzy_contract(spark, SF_DIR).collect()

    groups = build_record_groups(incremental.geoparse_stream(syn.pages_df(spark, SF_DIR)))
    cand = normalize_candidates(syn.gazetteer_df(spark, SF_DIR))
    want = (
        fuzzy_candidate_join(groups, cand)
        .select(*incremental.STREAM_CONTRACT_COLS)
        .dropDuplicates()
        .collect()
    )
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0
