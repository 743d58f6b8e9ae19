"""Incremental ingestion — STR-1/2/3 as Structured Streaming (SURVEY §2.9).

The reference is a polling micro-batch job: scrape, compare to the last
committed source id, process, commit (``main.py:38-79,326``). The Spark
rendering: a file source over a landing directory where each new "run"
arrives as parquet, ``Trigger.AvailableNow`` per invocation (one bounded
micro-batch — exactly the reference's cron-triggered container run), the
checkpoint replacing the Mongo source-id compare-and-commit, and a
``foreachBatch`` idempotent sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def ingest_available_now(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    schema=None,
):
    """Process all not-yet-seen files in ``landing_dir`` through
    ``batch_fn`` exactly once per file (checkpoint-tracked offsets = the
    reference's ``latestSuccessfulUpdateSource`` bookkeeping; the single
    active query per checkpoint = its ``isUpdating`` lock).

    Scale: the file source lists incrementally (``maxFilesPerTrigger``
    bounds a batch); each micro-batch is a normal Catalyst plan so every
    batch operator in this engine is reusable inside ``batch_fn``.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
