"""Checkpoint/resume tests: kill-and-resume recomputes nothing committed;
lineage change invalidates downstream stages (north rule O8)."""

import pytest

from mass_georeferencing_spark.plans.checkpoint import (
    CheckpointRunner,
    run_georeference_checkpointed,
)

from conftest import SF_DIR


def test_resume_skips_committed_stages(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "x")

    ck1 = CheckpointRunner(spark, str(tmp_path), "r1")
    df1 = ck1.run_stage("s1", build)
    assert df1.count() == 10
    assert calls["n"] == 1
    assert ck1.stages_built == ["s1"]

    # simulate a restart: fresh runner over the same dir
    ck2 = CheckpointRunner(spark, str(tmp_path), "r1")
    df2 = ck2.run_stage("s1", build)
    assert df2.count() == 10
    assert calls["n"] == 1  # ZERO recomputation
    assert ck2.stages_skipped == ["s1"]


def test_lineage_invalidation(spark, tmp_path):
    ck = CheckpointRunner(spark, str(tmp_path), "r2")
    ck.run_stage("up", lambda: spark.range(3))
    calls = {"n": 0}

    def build_down():
        calls["n"] += 1
        return spark.range(5)

    ck.run_stage("down", build_down, upstream=["up"])
    assert calls["n"] == 1

    # restart with unchanged upstream → skip
    ck2 = CheckpointRunner(spark, str(tmp_path), "r2")
    ck2.run_stage("up", lambda: spark.range(3))
    ck2.run_stage("down", build_down, upstream=["up"])
    assert calls["n"] == 1

    # restart with CHANGED upstream input → downstream rebuilds
    ck3 = CheckpointRunner(spark, str(tmp_path), "r2")
    ck3.run_stage(
        "up",
        lambda: spark.range(4).withColumnRenamed("id", "y"),
        input_fingerprint="v2",
    )
    assert ck3.stages_built == ["up"]
    ck3.run_stage("down", build_down, upstream=["up"])
    assert calls["n"] == 2


def test_manifest_metrics(spark, tmp_path):
    ck = CheckpointRunner(spark, str(tmp_path), "r3")
    ck.run_stage(
        "part",
        lambda: spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["x", "k"]),
        partition_by="k",
    )
    m = ck.metrics()["part"]
    assert m["committed"] is True
    assert m["partition_counts"] == {"a": 2, "b": 1}
    assert m["row_count"] == 3
    assert "schema" in m and "wall_s" in m


def test_pipeline_kill_and_resume(spark, tmp_path):
    kept1, ck1 = run_georeference_checkpointed(spark, SF_DIR, str(tmp_path), "pipe")
    n1 = kept1.count()
    assert n1 > 0
    assert set(ck1.stages_built) == {"groups", "candidates", "top", "kept"}

    kept2, ck2 = run_georeference_checkpointed(spark, SF_DIR, str(tmp_path), "pipe")
    assert ck2.stages_built == []
    assert set(ck2.stages_skipped) == {"groups", "candidates", "top", "kept"}
    assert kept2.count() == n1


def test_input_fingerprint_invalidates_on_data_change(spark, tmp_path):
    from mass_georeferencing_spark.plans.checkpoint import input_path_fingerprint

    src = tmp_path / "src"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"aaaa")
    fp1 = input_path_fingerprint(str(src))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    ck = CheckpointRunner(spark, str(tmp_path), "r3")
    ck.run_stage("src", build, input_fingerprint=fp1)
    assert calls["n"] == 1

    # same data → resume skips
    ck2 = CheckpointRunner(spark, str(tmp_path), "r3")
    ck2.run_stage("src", build, input_fingerprint=input_path_fingerprint(str(src)))
    assert calls["n"] == 1

    # changed data → rebuild (size change; mtime alone also flips the hash)
    (src / "part-0.parquet").write_bytes(b"bbbbbb")
    ck3 = CheckpointRunner(spark, str(tmp_path), "r3")
    ck3.run_stage("src", build, input_fingerprint=input_path_fingerprint(str(src)))
    assert calls["n"] == 2
