"""spark-submit entry point for the full georeferencing pipeline.

Usage (north rule: spark-submit --py-files at two cluster sizes):

    cd /root/repo && zip -qr /tmp/mgs.zip mass_georeferencing_spark
    spark-submit --master local[8]  --py-files /tmp/mgs.zip \
        jobs/georeference_job.py --sf-dir /root/testdata/sf0.1 --out /tmp/mgs_out8
    spark-submit --master local[32] --py-files /tmp/mgs.zip \
        jobs/georeference_job.py --sf-dir /root/testdata/sf0.1 --out /tmp/mgs_out32

On a real cluster the master flag becomes the cluster manager and --py-files
ships the same zip to executors; nothing in the package assumes local mode.
Prints a one-line JSON summary (rows, wall seconds, pages/sec).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="parquet output dir (omit: noop sink)")
    ap.add_argument("--checkpoint-dir", default=None, help="enable resumable stage checkpointing")
    ap.add_argument("--amplify", type=int, default=1, help="deterministic workload multiplier")
    ap.add_argument("--gaz-amplify", type=int, default=None, help="gazetteer multiplier (default amplify//4)")
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    # same scale-tuned session defaults as session.get_spark (master/deploy come
    # from spark-submit; these configs are no-ops if overridden via --conf)
    cpus = os.cpu_count() or 8
    spark = (
        SparkSession.builder.appName("mass-georeferencing")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    # size reducer count to the data, NOT to this run's core count: the
    # scaling-evidence protocol runs the IDENTICAL plan at every parallelism
    # level, so the reducer count must stay constant across levels (floor 8,
    # same as session.get_spark's bench default)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(spark.sparkContext.defaultParallelism, 8)),
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    if args.checkpoint_dir:
        from mass_georeferencing_spark.plans.checkpoint import run_georeference_checkpointed

        kept, ck = run_georeference_checkpointed(spark, args.sf_dir, args.checkpoint_dir)
        n_pages = None
    elif args.amplify > 1:
        import sys as _sys

        _sys.path.insert(0, "/root/repo")
        import bench  # amplified deterministic workload

        from pyspark.sql import functions as F

        from mass_georeferencing_spark.functions import cells as C
        from mass_georeferencing_spark.operators.fuzzy_join import fuzzy_candidate_join
        from mass_georeferencing_spark.operators.layers import (
            explode_alternate_names,
            normalize_candidates,
        )
        from mass_georeferencing_spark.operators.record_groups import (
            build_record_groups,
            group_id,
        )
        from mass_georeferencing_spark.operators.scoring import melt_scores, prune_low_scores
        from mass_georeferencing_spark.operators.topk import topk_per_group

        pages = bench.amplified_pages(spark, args.sf_dir, args.amplify)
        mentions = bench.amplified_mentions(pages)
        gaz = bench.amplified_gazetteer(
            spark, args.sf_dir, args.gaz_amplify or max(args.amplify // 4, 1)
        )
        n_pages = pages.count()  # warm file listing + JIT outside the timer
        t0 = time.time()
        groups = build_record_groups(mentions, coord_cols=("lat", "lon")).persist()
        candidates = normalize_candidates(explode_alternate_names(gaz)).persist()
        scored = fuzzy_candidate_join(
            groups, candidates  # join-back strategy: AQE decides from runtime sizes
        ).withColumn(
            "candidate_id",
            group_id(F.col("recgroup_id"), F.col("uid"), F.col("data_source")),
        )
        top = topk_per_group(
            scored,
            partition_cols=["recgroup_id"],
            order_cols=["score1", "score2", "score_state", "no_features"],
        ).persist()
        kept = prune_low_scores(top, melt_scores(top)).withColumn(
            "cell", C.latlng_to_cell_col(F.col("lat"), F.col("lon"), 12)
        )
    else:
        from mass_georeferencing_spark.plans.pipeline import georeference

        kept = georeference(spark, args.sf_dir)["kept"]
        n_pages = None

    if args.out:
        kept.write.mode("overwrite").parquet(args.out)
        n_rows = spark.read.parquet(args.out).count()
    else:
        kept.write.format("noop").mode("overwrite").save()
        n_rows = -1
    wall = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "rows": n_rows,
                "wall_s": wall,
                "n_pages": n_pages,
                "pages_per_sec": round(n_pages / wall, 1) if n_pages else None,
                "master": spark.sparkContext.master,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
