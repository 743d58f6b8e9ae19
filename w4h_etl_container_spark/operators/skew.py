"""Skew mitigation — explicit salting for hot keys (SURVEY §4 / PERF.md).

AQE's skew-join splitting handles most cases at runtime; explicit salting
remains the tool when a *single* group key dominates an aggregation (the
hot-shingle / hot-user shape): stage 1 aggregates on (key, salt) —
spreading one hot key over ``salt_n`` reducers — stage 2 combines the
partials on the key alone. Works for any algebraic aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name → (stage1_agg_expr, stage2_combine_expr);
    stage-2 expressions reference the stage-1 output column by name, e.g.::

        salted_aggregate(df, ["k"], {
            "n":  (F.count(F.lit(1)),           F.sum("n")),
            "mx": (F.max("value"),              F.max("mx")),
            "total": (F.sum(F.col("value").cast("decimal(18,4)")), F.sum("total")),
        })

    The salt is a deterministic spread of the row over ``salt_n`` buckets
    (hash of a high-cardinality column set, not rand() — keeps the plan
    re-executable/retry-safe, which matters for speculative execution).
    """
    salt = (F.abs(F.hash(*df.columns)) % salt_n).alias("__salt__")
    stage1 = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )
