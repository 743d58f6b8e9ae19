"""Weather-grid fixture generator (FIXTURES.md Family 2).

Deterministic (seed=42) synthetic GFS-like grid in long form — the
engine's golden-test input, mirroring the reference's data model
(SURVEY.md §1): lat × lon × hourly ts with 8 surface variables, seeded
nulls, a previous-snapshot table, a near-land mask, a status record, and
a source listing. Written as one parquet per table under a caller-chosen
directory (tests use a session-scoped tmp dir; /root/testdata is
read-only and untouched).

Grid (FIXTURES.md §2.1): lat −10..10 step 0.5 (41); lon 0..20 step 0.5
plus 350..359.5 step 0.5 (61, cyclic seam + negative hour angles);
ts hourly × 49 from 2026-08-01T01:00 (hour 0 pre-dropped). 122,509 rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
T0 = pd.Timestamp("2026-08-01T01:00:00")
N_HOURS = 49


def grid_coords() -> tuple[np.ndarray, np.ndarray, pd.DatetimeIndex]:
    lat = np.arange(-10.0, 10.0 + 0.25, 0.5)
    lon = np.concatenate([np.arange(0.0, 20.0 + 0.25, 0.5), np.arange(350.0, 359.75, 0.5)])
    ts = pd.date_range(T0, periods=N_HOURS, freq="1h")
    return lat, lon, ts


def gfs_run() -> pd.DataFrame:
    """FIXTURES.md §2.1 — one forecast run, long form, ~0.5% seeded nulls."""
    rng = np.random.default_rng(SEED)
    lat, lon, ts = grid_coords()
    la, lo, tt = np.meshgrid(lat, lon, np.arange(N_HOURS), indexing="ij")
    la, lo, tt = la.ravel(), lo.ravel(), tt.ravel()
    hours = (tt + 1).astype("float64")  # hour-of-run; T0 is hour 1

    # smooth diurnal temperature field (K), peak at local solar afternoon
    local_hour = (hours + lo / 15.0) % 24.0
    diurnal = np.cos((local_hour - 14.0) / 24.0 * 2.0 * np.pi)
    t2 = 288.0 + 12.0 * diurnal + 8.0 * np.cos(np.radians(la * 3.0)) + rng.normal(0, 1.0, la.shape)
    dpt = t2 - np.abs(rng.normal(3.0, 2.0, la.shape))  # dpt ≤ t2
    ug = rng.uniform(-20.0, 20.0, la.shape)
    vg = rng.uniform(-20.0, 20.0, la.shape)
    daylight = np.maximum(0.0, np.cos((local_hour - 12.0) / 24.0 * 2.0 * np.pi))
    dsw = 950.0 * daylight * rng.uniform(0.6, 1.0, la.shape)
    dsw[daylight <= 0.05] = 0.0  # night
    usw = dsw * rng.uniform(0.05, 0.25, la.shape)  # usw ≤ dsw
    dlw = rng.uniform(250.0, 420.0, la.shape)
    ulw = rng.uniform(300.0, 480.0, la.shape)

    df = pd.DataFrame(
        {
            "lat": la,
            "lon": lo,
            "ts": np.repeat(ts.values.reshape(1, -1), len(lat) * len(lon), axis=0).ravel(),
            "tmp2m": t2,
            "dpt2m": dpt,
            "ugrd10m": ug,
            "vgrd10m": vg,
            "dswrfsfc": dsw,
            "dlwrfsfc": dlw,
            "uswrfsfc": usw,
            "ulwrfsfc": ulw,
        }
    )
    # ~0.5% of value cells null at seeded positions (FLT-2 / JOIN-2 fodder)
    value_cols = ["tmp2m", "dpt2m", "ugrd10m", "vgrd10m", "dswrfsfc", "dlwrfsfc", "uswrfsfc", "ulwrfsfc"]
    for c in value_cols:
        mask = rng.random(len(df)) < 0.005
        df.loc[mask, c] = np.nan
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def gfs_run_prev() -> pd.DataFrame:
    """FIXTURES.md §2.2 — previous snapshot (utci/wbgt), shifted 6 h
    earlier, values seeded differently so JOIN-2 prefer-new is observable."""
    rng = np.random.default_rng(SEED + 1)
    lat, lon, _ = grid_coords()
    ts = pd.date_range(T0 - pd.Timedelta(hours=6), periods=N_HOURS, freq="1h")
    la, lo, tt = np.meshgrid(lat, lon, np.arange(N_HOURS), indexing="ij")
    la, lo, tt = la.ravel(), lo.ravel(), tt.ravel()
    df = pd.DataFrame(
        {
            "lat": la,
            "lon": lo,
            "ts": np.repeat(ts.values.reshape(1, -1), len(lat) * len(lon), axis=0).ravel(),
            "utci": rng.uniform(-30.0, 45.0, la.shape).round(3),
            "wbgt": rng.uniform(-30.0, 40.0, la.shape).round(3),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def near_land() -> pd.DataFrame:
    """FIXTURES.md §2.3 — static mask; ~60% true; lat=-10 row all-false;
    lon=0 column all-true (cyclic edge)."""
    rng = np.random.default_rng(SEED + 2)
    lat, lon, _ = grid_coords()
    la, lo = np.meshgrid(lat, lon, indexing="ij")
    la, lo = la.ravel(), lo.ravel()
    flag = rng.random(la.shape) < 0.6
    flag[lo == 0.0] = True
    flag[la == -10.0] = False  # wins at the (−10, 0) corner: upload must skip the row
    return pd.DataFrame({"lat": la, "lon": lo, "near_land": flag})


def status() -> pd.DataFrame:
    """FIXTURES.md §2.4 — single-row state record with one stale chart key."""
    return pd.DataFrame(
        [
            {
                "_id": "status",
                "isUpdating": False,
                "latestSuccessfulUpdateSource": "gfs20260731/18z",
                "globalCharts": {"2026-07-20": "2026-07-20_06z", "2026-08-01": "2026-08-01_00z"},
            }
        ]
    )


def source_listing() -> pd.DataFrame:
    """FIXTURES.md §2.5 — catalog listing with a unique arg-max."""
    rows = []
    for d in (20260730, 20260731, 20260801):
        for h in (0, 6, 12, 18):
            if d == 20260801 and h > 6:
                continue
            rows.append(
                {
                    "url": f"https://nomads.example/gfs{d}/gfs_0p25_1hr_{h:02d}z",
                    "run_date": np.int32(d),
                    "run_hour": np.int32(h),
                }
            )
    return pd.DataFrame(rows)


def write_all(out_dir: str) -> dict[str, str]:
    """Materialize every Family-2 table as parquet; returns name→path."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name, fn in [
        ("gfs_run", gfs_run),
        ("gfs_run_prev", gfs_run_prev),
        ("near_land", near_land),
        ("status", status),
        ("source_listing", source_listing),
    ]:
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            fn().to_parquet(path, index=False)
        out[name] = path
    return out
