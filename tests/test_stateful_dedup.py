"""applyInPandasWithState cross-batch dedup: duplicates suppressed across
micro-batches, state survives between triggers."""

from pyspark.sql import functions as F

from mass_georeferencing_spark.sources import synthetic as syn
from mass_georeferencing_spark.streaming import incremental, stateful_dedup

from conftest import SF_DIR


def test_stream_exact_dedup(spark, tmp_path):
    # duplicate every page once → stream must emit each fingerprint exactly once
    pages = syn.pages_df(spark, SF_DIR)
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("/copy")))
    both = pages.unionByName(dup).repartition(6)
    src = str(tmp_path / "pages")
    both.write.mode("overwrite").parquet(src)

    stream = incremental.read_pages_stream(spark, src, max_files_per_trigger=2)
    out = stateful_dedup.stream_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT fingerprint, n_suppressed FROM dedup_out").collect()
    n_distinct = pages.select(
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    ).distinct().count()
    assert len(got) == n_distinct  # each content emitted once despite 2x traffic
    assert {r.fingerprint for r in got} == set(
        r[0]
        for r in pages.select(
            F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
        ).distinct().collect()
    )
