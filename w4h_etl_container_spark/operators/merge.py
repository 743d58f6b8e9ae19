"""Prefer-new merge and retention — JOIN-2 / FLT-3 as reusable operators
(reference ``combine_first`` + retention clip, ``main.py:219-250``)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention_clip(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """FLT-3: drop rows older than the retention cutoff. A pushed
    predicate — on a date-partitioned snapshot this prunes partitions
    before any I/O, which is what makes the 100 TB snapshot merge cheap."""
    return df.where(F.col(ts_col) >= F.lit(cutoff))


def combine_first(
    new: DataFrame,
    old: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """JOIN-2: full outer join on ``keys``; where both sides have a value,
    take the new one (per value column — the reference's xarray
    ``combine_first`` coalesces elementwise, so a null cell in the new run
    falls back to the old snapshot even when the row exists in both).

    Scale: one sort-merge shuffle on the keys. When both tables are
    written bucketed by the same keys (the snapshot pipeline does this),
    Catalyst elides both exchanges — a zero-shuffle merge.
    """
    if value_cols is None:
        value_cols = [c for c in new.columns if c in old.columns and c not in keys]
    n, o = new.alias("n"), old.alias("o")
    # USING-style join: Spark emits coalesced key columns for full outer
    joined = n.join(o, on=list(keys), how="full_outer")
    return joined.select(
        *[F.col(k) for k in keys],
        *[F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c) for c in value_cols],
    )
