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
    """The multimodal processing chain over binary media columns:
    byte-level feature extraction (Arrow-batched ``mapInPandas``; decode
    kernel stubbed — see multimodal/media.py; Spark-side plumbing is
    real) joined with per-asset sampled-frame counts from the
    row-expanding ``frame_sample`` kernel (the UDTF shape — one output
    row per frame, aggregated back per asset). Deterministic: seeded
    synth + md5 content hashes; image assets (no frames) carry
    n_frames = 0."""
    media = synthesize_media(spark, n=64)
    n_frames = frame_sample(media).groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        extract_features(media)
        .join(n_frames, "media_id", "left")
        .withColumn("n_frames", F.coalesce(F.col("n_frames"), F.lit(0)))
        .orderBy("media_id")
    )
