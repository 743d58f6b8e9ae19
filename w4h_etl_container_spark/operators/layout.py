"""Sort-based data layout for parquet min/max skipping (SURVEY §4
extension): write a table so that selective scans prune row groups.

Parquet stores per-row-group (and per-page) min/max statistics; a scan
with a pushed predicate skips any unit whose range excludes the value.
That only pays off if the writer CLUSTERED the data — a randomly-laid
table has every file spanning the whole key domain, so nothing prunes.
At 100 TB this is the difference between reading 100 TB and reading one
file: layout is the cheapest query accelerator there is (one sort at
write time, amortized over every future scan).

``cluster_by`` = range-partition on the leading key (global clustering:
each output file owns a disjoint key range) + sort WITHIN partitions on
the full key list (row-group-level order for secondary keys). This is
the classic "linear clustering" layout; interleaved orders (Z/Hilbert)
trade leading-key selectivity for multi-key balance and can plug into
the same writer as a derived sort column.

Cited reference behavior: the reference's serving table is implicitly
clustered by its snapshot date partitioning (`main.py` partitioned
upsert); this operator generalizes that to arbitrary keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_by(df: DataFrame, cols: list[str], n_files: int | None = None) -> DataFrame:
    """Return ``df`` re-laid-out for min/max skipping on ``cols``:
    range-partitioned on the key prefix so each output partition (hence
    file, under one-file-per-partition writes) owns a disjoint range of
    the leading key, then sorted within partitions on the full key so
    row groups inside a file are also clustered.

    ``n_files`` bounds the output partition count (defaults to the
    session's shuffle partitions). The transformation is one range
    shuffle + local sort; write with
    ``cluster_by(df, ks).write.parquet(...)``."""
    if not cols:
        raise ValueError("cluster_by needs at least one column")
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)
