"""Multimodal declared queries (rows-only — binary payload processing has
no SQL oracle; the driver records row counts and the pytest suite pins the
feature values). Media assets are synthesized deterministically (seed 42)
since the fixture set carries no binary table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.multimodal.media import (
    extract_features,
    frame_sample,
    synthesize_media,
)
from w4h_etl_container_spark.plans.registry import register


@register("q_media_features", sql=None, survey_ids=("EXT-MEDIA",))
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over binary media columns via
    Arrow-batched ``mapInPandas`` (decode kernel stubbed — see
    multimodal/media.py; Spark-side plumbing is real). Deterministic:
    seeded synth + md5 content hashes."""
    media = synthesize_media(spark, n=64)
    return extract_features(media).orderBy("media_id")


@register("q_media_frames", sql=None, survey_ids=("EXT-MEDIA",))
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (row-expanding mapInPandas — the UDTF shape): one
    row per sampled frame of each audio/video asset."""
    media = synthesize_media(spark, n=64)
    return frame_sample(media).select(
        "media_id", "frame_idx", F.length("frame_bytes").alias("n_bytes")
    )
