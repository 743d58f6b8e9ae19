"""SRC-2/SRC-3 ingestion boundary tests: the pure-numpy NetCDF3 classic
codec and the .nc → long-form-parquet converter (reference boundary:
``xr.open_dataset`` in ``main.py:81``, ``utils.py:45-54``)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from w4h_etl_container_spark.sources.netcdf3 import (
    NcFile,
    NcVar,
    grid_nc_to_long,
    grid_nc_to_parquet,
    long_to_grid_nc,
    read_netcdf3,
    write_netcdf3,
)

VALUE_COLS = [
    "tmp2m", "dpt2m", "ugrd10m", "vgrd10m",
    "dswrfsfc", "dlwrfsfc", "uswrfsfc", "ulwrfsfc",
]


class TestCodec:
    def test_roundtrip_types_attrs_dims(self, tmp_path):
        rng = np.random.default_rng(7)
        nc = NcFile(
            dims={"x": 3, "y": 4},
            variables={
                "x": NcVar("x", ("x",), np.array([1.0, 2.0, 3.0]), {"units": "m"}),
                "f32": NcVar("f32", ("x", "y"), rng.random((3, 4), dtype=np.float32)),
                "f64": NcVar("f64", ("x", "y"), rng.random((3, 4))),
                "i32": NcVar("i32", ("y",), np.arange(4, dtype=np.int32)),
            },
            attrs={"title": "t"},
        )
        p = str(tmp_path / "t.nc")
        write_netcdf3(nc, p)
        got = read_netcdf3(p)
        assert got.dims == {"x": 3, "y": 4}
        assert got.attrs["title"] == "t"
        assert got.variables["x"].attrs["units"] == "m"
        for name in nc.variables:
            np.testing.assert_array_equal(got.variables[name].data, nc.variables[name].data)
            assert got.variables[name].dims == nc.variables[name].dims

    def test_magic_and_alignment(self, tmp_path):
        # odd-length names/payloads must stay 4-byte aligned
        nc = NcFile(
            dims={"abc": 5},
            variables={"odd": NcVar("odd", ("abc",), np.arange(5, dtype=np.int16))},
        )
        p = str(tmp_path / "odd.nc")
        write_netcdf3(nc, p)
        with open(p, "rb") as f:
            assert f.read(4) == b"CDF\x01"
        got = read_netcdf3(p)
        np.testing.assert_array_equal(got.variables["odd"].data, np.arange(5, dtype=np.int16))

    def test_rejects_non_netcdf(self, tmp_path):
        p = str(tmp_path / "junk.nc")
        with open(p, "wb") as f:
            f.write(b"PAR1junkjunk")
        with pytest.raises(ValueError):
            read_netcdf3(p)


class TestGridRoundTrip:
    def test_long_to_nc_to_long_bitexact(self, tmp_path):
        from w4h_etl_container_spark.sources.gridgen import gfs_run

        df = gfs_run()
        p = str(tmp_path / "run.nc")
        long_to_grid_nc(df, p, VALUE_COLS)
        back = grid_nc_to_long(p)
        key = ["lat", "lon", "ts"]
        a = df.sort_values(key).reset_index(drop=True)
        b = back.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        assert list(b.columns) == key + VALUE_COLS
        np.testing.assert_array_equal(a["ts"].to_numpy(), b["ts"].to_numpy())
        for c in ("lat", "lon", *VALUE_COLS):
            # bit-exact doubles, NaNs (seeded nulls) preserved in place
            np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())

    def test_nc_converted_parquet_drives_forecast_golden_equal(self, spark, grid_dir, tmp_path):
        """The full SRC-2 loop: .nc → parquet → run_forecast produces the
        identical snapshot as the native-parquet path."""
        from w4h_etl_container_spark.pipeline import forecast as forecast_mod

        run = pd.read_parquet(f"{grid_dir}/gfs_run.parquet")
        nc_path = str(tmp_path / "gfs_run.nc")
        long_to_grid_nc(run, nc_path, VALUE_COLS)

        conv_dir = tmp_path / "grid_from_nc"
        shutil.copytree(grid_dir, conv_dir)
        os.remove(conv_dir / "gfs_run.parquet")
        n = grid_nc_to_parquet(nc_path, str(conv_dir / "gfs_run.parquet"))
        assert n == len(run)

        key = ["lat", "lon", "ts"]
        native = forecast_mod.run_forecast(spark, grid_dir).orderBy(*key).collect()
        vianc = forecast_mod.run_forecast(spark, str(conv_dir)).orderBy(*key).collect()
        assert len(native) == len(vianc)
        for r1, r2 in zip(native, vianc):
            assert r1 == r2
