"""Completeness gates — FLT-2 / AGG-4 exact semantics (reference
``main.py:401-408``), the subtle two-pass subplan SURVEY §4 flags as a
correctness risk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_incomplete_timesteps(
    df: DataFrame, ts_col: str, value_cols: Sequence[str]
) -> DataFrame:
    """FLT-2: the reference's ``data.dropna("time")`` drops a *time label*
    if ANY cell (any lat/lon, any variable) is NaN at that label — a
    global-per-timestep predicate, not a per-row dropna.

    Two-pass subplan: aggregate per timestep the count of null cells,
    broadcast the clean-timestep set back as a semi-join. One shuffle on
    ts (bounded cardinality: hours), broadcast of a tiny set — the shape
    survives any grid size.
    """
    any_null = None
    for c in value_cols:
        n = F.max(F.col(c).isNull().cast("int"))
        any_null = n if any_null is None else F.greatest(any_null, n)
    clean = (
        df.groupBy(ts_col)
        .agg(any_null.alias("has_null"))
        .where(F.col("has_null") == 0)
        .select(ts_col)
    )
    return df.join(F.broadcast(clean), ts_col, "left_semi")


def qualifying_periods(
    df: DataFrame,
    period_col,
    ts_col: str,
    min_distinct_hours: int = 24,
) -> DataFrame:
    """AGG-4: periods (dates) with at least ``min_distinct_hours`` distinct
    hourly labels — the reference's ``len(data.time) >= 24`` gate. Returns
    the qualifying period keys for a broadcast semi-join."""
    return (
        df.groupBy(period_col)
        .agg(F.countDistinct(F.date_trunc("HOUR", F.col(ts_col))).alias("n_hours"))
        .where(F.col("n_hours") >= min_distinct_hours)
        .drop("n_hours")
    )


def observed_write(
    df,
    path: str,
    *,
    metrics: dict | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """Write ``df`` to parquet and return metrics computed DURING the
    write job itself (``DataFrame.observe`` — zero extra scans), instead
    of the count-after-write pattern that re-reads the data.

    ``metrics``: name → aggregate Column over the written rows; defaults
    to ``{"n_rows": count(*)}``. Returns the resolved metric dict.

    At 100 TB this is the difference between a manifest costing one
    extra full scan per artifact and costing nothing: the observation
    piggybacks on the write's own pass. (Metrics are exact for the
    single-action batch case used here; under retries of a FAILED job
    Spark recomputes the whole action, so the final values still
    describe exactly the committed rows.)"""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return dict(obs.get)
