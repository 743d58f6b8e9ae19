"""Multimodal plumbing tests: schema, Arrow batching through mapInPandas,
row-expanding frame sampling, and the decoder-stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from w4h_etl_container_spark.multimodal import (
    decode_stub,
    extract_features,
    frame_sample,
    synthesize_media,
)
from w4h_etl_container_spark.multimodal.media import resize_stub


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=48).cache()


class TestFeatures:
    def test_schema_and_cardinality(self, media):
        feats = extract_features(media)
        assert [f.name for f in feats.schema.fields] == [
            "media_id", "mime", "n_bytes", "byte_mean", "byte_entropy", "content_hash",
        ]
        assert feats.count() == media.count()

    def test_feature_values(self, media):
        row = extract_features(media).where(F.col("media_id") == 0).collect()[0]
        assert row["n_bytes"] > 0
        assert 0.0 <= row["byte_mean"] <= 255.0
        assert 0.0 <= row["byte_entropy"] <= 8.0
        assert len(row["content_hash"]) == 32

    def test_deterministic(self, media):
        a = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
        b = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
        assert a == b


class TestFrameSample:
    def test_row_expansion_and_no_image_frames(self, media):
        frames = frame_sample(media)
        assert frames.count() > media.count()  # expands
        image_ids = {r["media_id"] for r in media.where(F.col("mime") == "image/png").collect()}
        assert not image_ids & {r["media_id"] for r in frames.select("media_id").distinct().collect()}

    def test_frame_bytes_bounded(self, media):
        mx = frame_sample(media, frame_len=64).agg(F.max(F.length("frame_bytes"))).collect()[0][0]
        assert mx <= 64


class TestDecodeContract:
    def test_stub_decodes_known_mimes(self):
        assert decode_stub(b"\x00\x01\x02", "image/png").tolist() == [0, 1, 2]

    def test_unknown_mime_raises(self):
        with pytest.raises(NotImplementedError):
            decode_stub(b"x", "application/pdf")

    def test_resize_plumbing(self, media, spark):
        out = resize_stub(media.limit(6), 8, 8)
        rows = out.collect()
        assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
        assert all(len(r["payload"]) <= 64 for r in rows)
