"""Table maintenance — small-file compaction.

Incremental pipelines (the snapshot merge, the serving sink, streaming
ingestion) accumulate small files; at 100 TB unmanaged small files become
the dominant scan cost (footer reads + task-per-file scheduling).
Compaction rewrites a partitioned parquet table to a bounded file count
per partition, preserving the partition layout so pruning still works.
(Table formats — Delta/Iceberg — replace the directory swap with a
transactional rewrite; the plan shape is identical.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_files_per_partition: int = 1,
) -> int:
    """Rewrite ``path`` with ``target_files_per_partition`` files per
    partition (repartition by the partition column so each output task
    owns whole partitions). Returns the resulting data-file count."""
    df = spark.read.parquet(path)
    writer = df
    if partition_col is not None:
        if target_files_per_partition > 1:
            # repartition(n, partition_col) alone hash-routes each
            # partition VALUE wholly to one task (→ always ~1 file); a
            # bucket term actually splits each partition value n ways.
            # The explicit partition count keeps AQE from coalescing the
            # buckets back together on small inputs.
            from pyspark.sql import functions as F

            bucket = F.pmod(F.hash(*df.columns), F.lit(target_files_per_partition))
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            writer = df.repartition(max(n_shuffle, target_files_per_partition), partition_col, bucket)
        else:
            writer = df.repartition(target_files_per_partition, partition_col)
    else:
        writer = df.coalesce(target_files_per_partition)
    staging = path + ".compact"
    w = writer.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(staging)
    backup = path + ".precompact"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
