"""Hour-angle key-shift and stream-head offset — WIN-1 / WIN-2 as
reusable operators (reference ``main.py:361-367`` and ``main.py:263-275``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def utc_hour_angle(lon: Column) -> Column:
    """round(lon/15) mapped from (12, 24) → negative — the reference's
    wraparound ``xr.where`` (``main.py:364``). floor(x+0.5) rounding keeps
    the expression backend-exact (SF-4 note in SURVEY §2.8)."""
    ha = F.floor(lon / F.lit(15.0) + F.lit(0.5)).cast("double")
    return F.when(ha > 12.0, ha - 24.0).otherwise(ha)


def hour_angle_shift(df: DataFrame, ts_col: str = "ts", lon_col: str = "lon") -> DataFrame:
    """WIN-1 re-expressed Spark-first: the reference loops over distinct
    offsets calling ``ds.shift(time=k)`` — physical data movement per
    offset. In the relational model the shift is a *relabeling*: add the
    hour angle to the timestamp (``haa_ts``). Zero data movement, zero
    shuffle; downstream daily grouping uses ``to_date(haa_ts)``.

    Boundary parity: labels that acquire no value in the reference become
    NaN and are dropped by FLT-2; here the relabeled timestamps simply
    extend past the run's UTC range and the same completeness gate
    (``qualifying_hours``) removes the incomplete edge dates.
    """
    ha = utc_hour_angle(F.col(lon_col))
    return df.withColumn("haa_ts", F.col(ts_col) + F.make_interval(hours=ha.cast("int")))


def offset_hours_from_head(df: DataFrame, ts_col: str = "ts") -> tuple[DataFrame, Column]:
    """WIN-2: integer hours since the global minimum timestamp.

    The head is a 1-row aggregate broadcast-cross-joined (a two-stage
    reduction at any scale), and the conversion is integer seconds
    floor-divided — the reference's accessor-based lossless semantics
    (``main.py:266-270``), never float ns division."""
    head = df.agg(F.min(ts_col).alias("__t0__"))
    out = df.crossJoin(F.broadcast(head))
    off = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.col("__t0__"))) / F.lit(3600.0)
    ).cast("int")
    return out, off
