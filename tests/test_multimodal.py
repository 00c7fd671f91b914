"""Multimodal decode plumbing: pluggable encoder hook, strict refusal, and
deterministic fake features (the driver oracle covers the hash/size/frame
queries; this pins the encoder surface)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mass_georeferencing_spark.operators import multimodal
from mass_georeferencing_spark.sources import synthetic as syn

from conftest import SF_DIR


def test_custom_encoder_plumbs_through(spark):
    # nested function → cloudpickle serializes it BY VALUE (a module-level
    # function from a test file wouldn't resolve on executors)
    def const_encoder(payload: bytes) -> np.ndarray:
        v = np.zeros(4, dtype=np.float32)
        v[0] = (payload[0] if payload else 0) / 255.0
        return v

    media = multimodal.synthesize_media_from_pages(syn.pages_df(spark, SF_DIR)).limit(10)
    out = multimodal.decode_and_embed(media, dim=4, encoder=const_encoder).collect()
    assert len(out) == 10
    for r in out:
        assert len(r.features) == 4
        assert r.features[1] == 0.0  # the custom encoder's signature shape


def test_strict_refuses_fake_path(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("a real codec exists here; strict path would succeed")
    except ImportError:
        pass
    media = multimodal.synthesize_media_from_pages(syn.pages_df(spark, SF_DIR)).limit(2)
    with pytest.raises(Exception, match="codec"):
        multimodal.decode_and_embed(media, strict=True).collect()


def test_default_fake_features_deterministic(spark):
    media = multimodal.synthesize_media_from_pages(syn.pages_df(spark, SF_DIR)).limit(5)
    a = {r.media_id: list(r.features) for r in multimodal.decode_and_embed(media, dim=8).collect()}
    b = {r.media_id: list(r.features) for r in multimodal.decode_and_embed(media, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
