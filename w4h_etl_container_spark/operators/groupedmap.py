"""Grouped-map operator surface — UDF-6 (SURVEY §2.10): ``applyInPandas``
for per-group kernels that need the whole group as a frame. The engine's
rule: use it only when window/aggregate expressions genuinely can't
express the semantics — the declared example (per-group z-score) *can* be
a native window plan, and the pytest suite pins the two implementations
against each other (the UDF-vs-native parity discipline from SURVEY §5.2).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ZSCORE_SCHEMA = "user_id bigint, event_id bigint, value double, zscore double"


def zscore_grouped_map(events: DataFrame) -> DataFrame:
    """Per-user z-score via Arrow grouped-map (population std; groups with
    zero variance emit 0.0)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "value": v, "zscore": z}
        )

    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        kernel, ZSCORE_SCHEMA
    )


def zscore_native(events: DataFrame) -> DataFrame:
    """The same semantics as a native window plan (the production path:
    one shuffle, no Python)."""
    w = Window.partitionBy("user_id")
    mean = F.avg("value").over(w)
    std = F.stddev_pop("value").over(w)
    z = F.when(std > 0, (F.col("value") - mean) / std).otherwise(F.lit(0.0))
    return events.select("user_id", "event_id", "value", z.alias("zscore"))


SESSION_FEATURES_SCHEMA = "user_id bigint, event_id bigint, rn bigint, gap_s bigint"


def session_features_grouped_map(events: DataFrame) -> DataFrame:
    """Per-user ordinal + inter-event gap via Arrow grouped-map — the
    oracle-checkable UDF-6 declared surface (integer outputs are exact in
    every engine; gap counts whole-second boundary crossings, -1 for each
    user's first event). The whole group arrives as one pandas frame —
    the shape custom sessionization / trajectory kernels need."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # floor to whole seconds resolution-independently (Arrow hands the
        # kernel datetime64[ns] regardless of the column's µs precision)
        ts_s = pdf["ts"].astype("datetime64[s]").astype("int64")
        gap = ts_s.diff().fillna(-1).astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "rn": range(1, len(pdf) + 1),
                "gap_s": gap.to_numpy(),
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(kernel, SESSION_FEATURES_SCHEMA)
    )
