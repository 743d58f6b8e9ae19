"""Entry point 3 — charting (reference ``main.py:341-443``; SURVEY §3
lifecycle 3): cyclic-point union → HAA key-shift → completeness gates →
daily high/low grids → driver-side render.

Everything up to the render is one distributed plan; only the final
per-date aggregated grid (≈1 row per cell per date) crosses to the
driver — the single intentional driver-side step (SURVEY §2.1 SNK-3).
matplotlib isn't in this container, so the render step degrades to a
deterministic .npz artifact behind an import-try; the figure-reuse
optimization of the reference (``main.py:421-423``) belongs to that
driver-side renderer, not the engine.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.gates import drop_incomplete_timesteps, qualifying_periods
from w4h_etl_container_spark.operators.shift import hour_angle_shift


def cyclic_point_union(df: DataFrame, lon_col: str = "lon") -> DataFrame:
    """SET-2 (reference ``main.py:345-350``): if lon 0 is present, append
    a copy relabeled lon=360 so contour charts wrap. Plan-level union of a
    one-column slice — negligible at any scale."""
    seam = df.where(F.col(lon_col) == 0.0).withColumn(lon_col, F.lit(360.0))
    return df.unionByName(seam)


def daily_extremes(df: DataFrame, value_col: str = "utci", min_hours: int = 24) -> DataFrame:
    """WIN-1 → FLT-2 → AGG-4 → AGG-1 (reference ``main.py:361-408``):
    local-solar-time relabeling, drop any timestep with a null anywhere,
    keep dates with ≥ ``min_hours`` distinct hours, then per-cell daily
    max/min."""
    shifted = hour_angle_shift(df)
    shifted = shifted.withColumn("haa_date", F.to_date("haa_ts"))
    clean = drop_incomplete_timesteps(shifted, "haa_ts", [value_col])
    good_dates = qualifying_periods(clean, F.col("haa_date"), "haa_ts", min_hours)
    gated = clean.join(F.broadcast(good_dates), "haa_date", "left_semi")
    return gated.groupBy("lat", "lon", "haa_date").agg(
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
    )


def render_charts(daily: DataFrame, out_dir: str) -> list[str]:
    """SNK-3: collect the per-date grids (the one deliberate driver-side
    hop) and render. With matplotlib present → contour PNGs (2 per date,
    highs and lows, reusing one figure); without → deterministic .npz
    grids so the artifact chain stays testable."""
    os.makedirs(out_dir, exist_ok=True)
    pdf = daily.toPandas().sort_values(["haa_date", "lat", "lon"])
    artifacts: list[str] = []
    try:
        import matplotlib  # noqa: F401

        have_mpl = True
    except ImportError:
        have_mpl = False

    for d, grp in pdf.groupby("haa_date"):
        if have_mpl:
            import matplotlib.pyplot as plt

            for kind in ("high", "low"):
                piv = grp.pivot_table(index="lat", columns="lon", values=kind)
                fig = plt.figure(figsize=(20, 20), dpi=100)
                plt.contourf(piv.columns, piv.index, piv.values, levels=9)
                path = os.path.join(out_dir, f"{d}_{kind}.png")
                fig.savefig(path)
                plt.close(fig)
                artifacts.append(path)
        else:
            path = os.path.join(out_dir, f"{d}.npz")
            np.savez_compressed(
                path,
                lat=grp["lat"].to_numpy(),
                lon=grp["lon"].to_numpy(),
                high=grp["high"].to_numpy(),
                low=grp["low"].to_numpy(),
            )
            artifacts.append(path)
    return artifacts
