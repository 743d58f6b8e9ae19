"""Incremental forecast pipeline — Phase D integration (SURVEY §2.9
STR-1/2/3): new GFS-like runs land as parquet files; each micro-batch
derives the thermal indices and prefer-new-merges into the snapshot table.

This is the reference's whole polling loop (``main.py:38-250``) as one
Structured Streaming query: the file-source checkpoint replaces the
source-id compare-and-commit, the single-active-query guarantee replaces
the isUpdating lock, and FLT-3+JOIN-2 run inside ``foreachBatch`` on the
batch's rows only.

Snapshot layout = parquet partitioned by ``snap_date``; the merge reads
the current snapshot, combines, and atomically replaces it (at cluster
scale: Delta/Iceberg MERGE INTO — same plan shape, transactional commit
instead of directory swap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.merge import combine_first, retention_clip
from w4h_etl_container_spark.pipeline.forecast import derive_thermal_indices, select_run_window
from w4h_etl_container_spark.streaming.ingest import ingest_available_now

SNAPSHOT_SCHEMA = "lat double, lon double, ts timestamp, utci double, wbgt double"


def _merge_batch(
    spark: SparkSession, batch: DataFrame, snapshot_path: str, retention_cutoff
) -> None:
    new = derive_thermal_indices(select_run_window(batch))
    if os.path.exists(snapshot_path):
        old = spark.read.parquet(snapshot_path)
        old = retention_clip(old, "ts", retention_cutoff)
        merged = combine_first(new, old, keys=["lat", "lon", "ts"], value_cols=["utci", "wbgt"])
    else:
        merged = new
    tmp = snapshot_path + ".staging"
    merged.withColumn("snap_date", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "snap_date"
    ).parquet(tmp)
    # atomic-ish swap keeps the snapshot readable mid-merge (a table
    # format makes this a real transaction at scale)
    back = snapshot_path + ".old"
    if os.path.exists(snapshot_path):
        os.rename(snapshot_path, back)
    os.rename(tmp, snapshot_path)
    if os.path.exists(back):
        import shutil

        shutil.rmtree(back)


def incremental_forecast(
    spark: SparkSession,
    landing_glob: str,
    checkpoint_dir: str,
    snapshot_path: str,
    run_schema,
    retention_cutoff="2026-07-31T19:00:00",
):
    """Drain all unseen runs from the landing dir into the snapshot.
    Exactly-once per file via the checkpoint; idempotent to re-trigger."""

    def batch_fn(df: DataFrame, _epoch: int) -> None:
        if df.isEmpty():
            return
        _merge_batch(spark, df, snapshot_path, retention_cutoff)

    return ingest_available_now(spark, landing_glob, checkpoint_dir, batch_fn, schema=run_schema)
