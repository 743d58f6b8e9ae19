"""Entry point 2 — serving upload (reference ``main.py:254-336``;
SURVEY §3 lifecycle 2): encode → mask join → per-cell document build →
idempotent bulk-upsert sink.

The reference's only non-vectorized hot loop (the Python zip over
lat×lon, ``main.py:286-305``) becomes a groupBy + ordered collect — fully
distributed. The sink is ``foreachPartition`` with per-partition retry —
the Spark rendering of the reference's chunked bulk_write with 12→100
escalation (``main.py:308-323``): Spark's ``repartition(n)`` *is* the
chunking, and failed partitions retry at task granularity instead of
re-splitting the whole payload.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import SparkBackend
from w4h_etl_container_spark.operators.shift import offset_hours_from_head
from w4h_etl_container_spark.pipeline.retrylib import retry


def encode_serving(df: DataFrame) -> DataFrame:
    """SF-9 + WIN-2 (reference ``main.py:256-279``): pack (utci, wbgt,
    hour-offset-from-run-start) into one int32 per cell-hour."""
    B = SparkBackend()
    # int32 arrays can't carry missing values: a cell-hour with no utci or
    # wbgt simply doesn't appear in the serving payload
    df = df.where(F.col("utci").isNotNull() & F.col("wbgt").isNotNull())
    df2, off = offset_hours_from_head(df, "ts")
    enc = K.encode_temp_times(B, F.col("utci"), F.col("wbgt"), off.cast("double"))
    return df2.select(
        "lat",
        "lon",
        "ts",
        F.col("__t0__").alias("forecast_start"),
        enc.cast("int").alias("encoded"),
    )


def build_documents(encoded: DataFrame, mask: DataFrame) -> DataFrame:
    """JOIN-3 + FLT-1 + AGG-5 + SF-7 (reference ``main.py:281-305``):
    broadcast the near-land mask, keep near-land cells, build one document
    per cell with its time-ordered encoded array and the 2-dp "lat,lon"
    id. Ordering is explicit (struct sort on ts) — the reference relied
    on positional order."""
    near = mask.where(F.col("near_land")).select("lat", "lon")
    kept = encoded.join(F.broadcast(near), ["lat", "lon"], "left_semi")
    pair = F.struct(F.col("ts").alias("t"), F.col("encoded").alias("e"))
    return (
        kept.groupBy("lat", "lon")
        .agg(
            F.min("forecast_start").alias("forecastStart"),
            F.sort_array(F.collect_list(pair)).alias("pairs"),
        )
        .select(
            F.format_string("%.2f,%.2f", F.col("lat"), F.col("lon")).alias("_id"),
            "forecastStart",
            F.transform("pairs", lambda s: s.e).alias("tempTimesEncoded"),
        )
    )


def upsert_documents(docs: DataFrame, out_dir: str, n_chunks: int = 12) -> int:
    """SNK-1 (reference bulk ReplaceOne upsert, ``main.py:293-324``):
    ``foreachPartition`` writer, one JSONL file per partition named by a
    deterministic partition key — rewriting the same batch twice yields
    identical files, so the sink is idempotent (the at-least-once →
    exactly-once trick the reference gets from Mongo ``_id`` upserts).

    A Mongo deployment swaps the body for ``collection.bulk_write([...
    ReplaceOne({'_id': d['_id']}, d, upsert=True)])`` — the partitioning,
    retry and idempotence story is identical. Returns the doc count.
    """
    os.makedirs(out_dir, exist_ok=True)
    target = docs.repartition(n_chunks, "_id")  # the reference's "12 chunks"
    # count via accumulator inside the ONE write pass — a trailing
    # docs.count() would re-execute the whole encode→join→collect plan
    # (accumulator updates in actions are exactly-once per successful task)
    n_docs = docs.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows) -> None:
        @retry(tries=4, delay_s=0.1, backoff=2.0, exceptions=(OSError,))
        def _write(batch: list[dict]) -> None:
            if not batch:
                return
            # deterministic per-partition file name = idempotent rewrite
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            tmp = os.path.join(out_dir, f".part-{pid:05d}.tmp")
            final = os.path.join(out_dir, f"part-{pid:05d}.jsonl")
            with open(tmp, "w") as f:
                for d in batch:
                    f.write(json.dumps(d, sort_keys=True, default=str) + "\n")
            os.replace(tmp, final)

        batch = [r.asDict(recursive=True) for r in rows]
        n_docs.add(len(batch))
        _write(batch)

    target.foreachPartition(write_partition)
    return n_docs.value


def run_serve(spark: SparkSession, merged: DataFrame, grid_dir: str, out_dir: str) -> int:
    mask = spark.read.parquet(f"{grid_dir}/near_land.parquet")
    docs = build_documents(encode_serving(merged), mask)
    return upsert_documents(docs, out_dir)
