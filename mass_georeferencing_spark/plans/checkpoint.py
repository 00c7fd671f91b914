"""Stage checkpointing with per-partition lineage + row-count metrics (O8).

The reference restarts by wiping and recomputing the whole collex
(batch_georeferencing/batch_georeferencing.py:119-121). The north rule demands
the opposite: every stage commits its output with lineage + metrics so a killed
job resumes with ZERO recomputation of committed stages.

On a production cluster this is Iceberg: each stage is a ``writeTo(...).append``
whose snapshot carries summary properties (per-partition row counts, upstream
snapshot ids) and resume reads ``snapshot_id``s. This environment has no Iceberg
runtime jars, so the same contract is implemented over parquet directories with
an atomically-committed JSON manifest per stage — the manifest plays the
snapshot: it records schema, per-partition row counts, upstream lineage (stage
name → manifest fingerprint), wall time, and a commit marker. The commit is the
atomic ``os.replace`` of the manifest into place: a stage with no manifest is
simply recomputed, so a kill at ANY point leaves a consistent resumable state.

Resume semantics: ``run_stage`` with an existing committed manifest whose
lineage fingerprints match re-reads the parquet output and skips the build
entirely (verified by tests/test_checkpoint.py's build-counter).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def input_path_fingerprint(path: str) -> str:
    """Content fingerprint of a local input directory: (relpath, size, mtime_ns)
    of every data file, hashed. The parquet-directory stand-in for an Iceberg
    snapshot id — source stages pass it so a resume against CHANGED input data
    invalidates instead of silently reusing stale checkpoints."""
    entries: list[tuple[str, int, int]] = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.startswith((".", "_")):
                continue
            full = os.path.join(root, fn)
            st = os.stat(full)
            entries.append((os.path.relpath(full, path), st.st_size, st.st_mtime_ns))
    entries.sort()
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()


class CheckpointRunner:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        self.spark = spark
        self.base = os.path.join(base_dir, run_id)
        os.makedirs(self.base, exist_ok=True)
        self._fingerprints: dict[str, str] = {}
        self.stages_built: list[str] = []
        self.stages_skipped: list[str] = []

    # -- manifest helpers ---------------------------------------------------

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "_mgs_manifest.json")

    def _load_manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    @staticmethod
    def _fingerprint(manifest: dict) -> str:
        payload = json.dumps(
            {k: manifest[k] for k in ("stage", "schema", "partition_counts", "lineage")},
            sort_keys=True,
        )
        return hashlib.md5(payload.encode()).hexdigest()

    # -- the runner ---------------------------------------------------------

    def run_stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        upstream: list[str] | None = None,
        partition_by: str | None = None,
        input_fingerprint: str | None = None,
    ) -> DataFrame:
        """Build-or-resume one stage. ``upstream`` names stages whose committed
        fingerprints become this stage's lineage; a change upstream invalidates
        the checkpoint (content-addressed recompute, not timestamps). Source
        stages (no upstream) pass ``input_fingerprint`` (e.g. an input-path etag
        or snapshot id) so changed inputs also invalidate."""
        upstream = upstream or []
        lineage = {u: self._fingerprints[u] for u in upstream}
        if input_fingerprint is not None:
            lineage["__input__"] = input_fingerprint
        out_dir = self._stage_dir(name)
        data_dir = os.path.join(out_dir, "data")

        manifest = self._load_manifest(name)
        if manifest and manifest.get("committed") and manifest.get("lineage") == lineage:
            self._fingerprints[name] = self._fingerprint(manifest)
            self.stages_skipped.append(name)
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data_dir)

        written = self.spark.read.parquet(data_dir)
        if partition_by:
            counts = {
                str(r[partition_by]): r["cnt"]
                for r in written.groupBy(partition_by).agg(F.count(F.lit(1)).alias("cnt")).collect()
            }
        else:
            counts = {
                str(r["pid"]): r["cnt"]
                for r in written.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
        manifest = {
            "stage": name,
            "schema": written.schema.simpleString(),
            "partition_counts": counts,
            "row_count": int(sum(counts.values())),
            "lineage": lineage,
            "wall_s": round(time.time() - t0, 3),
            "committed": True,
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        self._fingerprints[name] = self._fingerprint(manifest)
        self.stages_built.append(name)
        return written

    def metrics(self) -> dict[str, dict]:
        """All committed stage manifests (the lineage/metrics surface)."""
        out = {}
        for name in os.listdir(self.base):
            m = self._load_manifest(name)
            if m:
                out[name] = m
        return out


def run_georeference_checkpointed(
    spark: SparkSession,
    sf_dir: str,
    base_dir: str,
    run_id: str = "run",
) -> tuple[DataFrame, CheckpointRunner]:
    """The pipeline as resumable stages (each stage re-reads the previous
    stage's committed parquet, so a resume never recomputes upstream work)."""
    from ..functions import cells as C
    from ..operators.fuzzy_join import fuzzy_candidate_join
    from ..operators.layers import explode_alternate_names, normalize_candidates
    from ..operators.record_groups import build_record_groups, group_id
    from ..operators.scoring import melt_scores, prune_low_scores
    from ..operators.topk import topk_per_group
    from ..sources import synthetic

    ck = CheckpointRunner(spark, base_dir, run_id)

    # source stages carry an input fingerprint so resuming the same run_id
    # after the sf_dir data changes invalidates (content-addressed, like the
    # snapshot-id a real Iceberg source would pass)
    src_fp = input_path_fingerprint(sf_dir)
    groups = ck.run_stage(
        "groups",
        lambda: build_record_groups(synthetic.mentions_df(spark, sf_dir), coord_cols=("lat", "lon")),
        input_fingerprint=src_fp,
    )
    candidates = ck.run_stage(
        "candidates",
        lambda: normalize_candidates(explode_alternate_names(synthetic.gazetteer_df(spark, sf_dir))),
        input_fingerprint=src_fp,
    )
    top = ck.run_stage(
        "top",
        lambda: topk_per_group(
            fuzzy_candidate_join(groups, candidates).withColumn(
                "candidate_id",
                group_id(F.col("recgroup_id"), F.col("uid"), F.col("data_source")),
            ),
            partition_cols=["recgroup_id"],
            order_cols=["score1", "score2", "score_state", "no_features"],
        ),
        upstream=["groups", "candidates"],
        partition_by="lang",
    )
    kept = ck.run_stage(
        "kept",
        lambda: prune_low_scores(top, melt_scores(top)).withColumn(
            "cell", C.latlng_to_cell_col(F.col("lat"), F.col("lon"), C.DEFAULT_POINT_RES)
        ),
        upstream=["top"],
        partition_by="lang",
    )
    return kept, ck
