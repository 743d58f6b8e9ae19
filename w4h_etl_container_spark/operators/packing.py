"""Greedy sequence packing: chunk rows → fixed-token-budget training
rows (SURVEY.md §2.11 — the step after ``chunk_documents``).

Training consumes fixed-length context windows; feeding one short chunk
per window wastes the budget, so pipelines PACK multiple chunks into
each window ("sequence packing"). Optimal bin packing is NP-hard and
inherently sequential — the scale answer is partition-local first-fit-
decreasing (FFD): each partition packs its own chunks independently
(embarrassingly parallel, no cross-partition coordination), giving the
classic FFD utilization guarantee within every partition. Global
optimality is deliberately NOT chased: at corpus scale the loss from
partition-local packing is a fraction of a percent (each partition
holds thousands of chunks, so edge effects vanish), while a global pack
would serialize the corpus through one process.

Engine shape: one ``repartition`` (any existing partitioning works —
packing is valid under ANY assignment of chunks to partitions) → sort
within partitions by size descending → ONE ``mapInPandas`` pass whose
bin state carries across Arrow batches within the partition. Pack ids
are (partition_id, local_bin) — globally unique without coordination.
Python is legitimately on this path: the decision loop is data-
dependent per row (the definition of a case built-ins can't express),
and it touches each row once over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_id", LongType()),
        StructField("n_chunk_tokens", LongType()),
        StructField("pack_id", LongType()),
        StructField("pack_slot", LongType()),
    ]
)


def pack_chunks(chunks: DataFrame, budget: int = 256, partitions: int | None = None) -> DataFrame:
    """Assign every (doc_id, chunk_id, n_chunk_tokens) row to a pack of
    total size ≤ ``budget`` (a chunk larger than the budget gets its own
    pack — the caller truncates or re-chunks those). First-fit over
    size-descending order per partition; bins stay open across Arrow
    batches, so the pass is single-scan regardless of batch size.

    Returns the assignment table (input columns + ``pack_id`` and
    ``pack_slot`` = the chunk's token OFFSET within its pack — strictly
    increasing per pack, so the downstream writer groups by ``pack_id``
    and concatenates in slot order, and the offset doubles as the
    position-id base each training row needs). Deterministic for a
    fixed partition count: hash partitioning and the (size desc, doc,
    chunk) sort fix the packing order."""
    if partitions is None:
        partitions = chunks.sparkSession.sparkContext.defaultParallelism

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        open_bins: list[tuple[int, int]] = []  # (bin_local_id, remaining)
        next_bin = 0
        for b in batches:
            out_pack, out_slot = [], []
            for n in b["n_chunk_tokens"]:
                n = int(n)
                placed = None
                for i, (bid, rem) in enumerate(open_bins):
                    if n <= rem:
                        placed = (i, bid, rem)
                        break
                if placed is None:
                    bid = next_bin
                    next_bin += 1
                    open_bins.append((bid, max(0, budget - n)))
                    out_slot.append(0)
                else:
                    i, bid, rem = placed
                    open_bins[i] = (bid, rem - n)
                    out_slot.append(budget - rem)  # tokens already in the bin
                out_pack.append(pid * 1_000_000_000 + bid)
            res = b[["doc_id", "chunk_id", "n_chunk_tokens"]].copy()
            res["pack_id"] = pd.Series(out_pack, dtype="int64")
            res["pack_slot"] = pd.Series(out_slot, dtype="int64")
            yield res

    prepared = (
        chunks.select("doc_id", "chunk_id", "n_chunk_tokens")
        .repartition(partitions, "doc_id")
        .sortWithinPartitions(
            F.col("n_chunk_tokens").desc(), "doc_id", "chunk_id"
        )
    )
    return prepared.mapInPandas(pack, _PACK_SCHEMA)
