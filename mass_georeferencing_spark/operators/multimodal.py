"""Multimodal binary-column plumbing: decode / feature-extract / frame-sample.

Media travel as opaque ``binary`` columns with typed metadata (the pages table
already carries ``html binary`` per input_hint). The image/audio libraries are
not available in this environment, so the decode kernels are STUBS — either
raising NotImplementedError (``strict=True``) or producing a deterministic fake
derived from the content hash (``strict=False``, default: keeps the Spark-side
plumbing — schemas, Arrow batch shapes, partitioning — real and testable).

All kernels run via ``mapInPandas`` so each Arrow batch crosses the JVM↔Python
boundary once; binary payloads stay columnar (no per-row pickling).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id string, kind string, payload binary, mime string, width int, height int, duration_s double"


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features: md5-seeded uniform vector. Placeholder for
    a real encoder (CLIP/whisper/etc.) — NOT a model, just stable plumbing."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(dim).astype(np.float32)


def decode_and_embed(
    media: DataFrame,
    dim: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """media → (media_id, n_bytes, content_hash, features array<float>).

    ``strict=True`` raises NotImplementedError where the real decoder would run
    (no image/audio libs in this container); ``strict=False`` emits the
    deterministic fake so downstream similarity/dedup plumbing is exercised.
    """
    schema = f"{id_col} string, n_bytes long, content_hash string, features array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires an image/audio codec not present in this "
                    "environment; plumbing validated with strict=False fakes"
                )
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [_fake_features(p, dim) for p in payloads],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(gen, schema)


def frame_sample(
    media: DataFrame,
    every_s: float = 2.0,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (the decode of
    the actual frame is the stubbed step). Pure JVM sequence generator."""
    n = F.greatest((F.col(duration_col) / F.lit(every_s)).cast("int"), F.lit(1))
    return media.select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("long"), (n - 1).cast("long"))).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * F.lit(every_s))


def synthesize_media_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the pages table (html bytes play
    the payload): exercises the multimodal schema without external data."""
    return pages.select(
        F.md5(F.col("url")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("html").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 1920 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 1080 + 1).cast("int").alias("height"),
        ((F.col("doc_id") % 600) / 10.0 + 0.1).alias("duration_s"),
    )
