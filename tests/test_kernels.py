"""Kernel numeric fidelity (SURVEY §5.2): pin outputs against published
reference values, verify the three backend renderings agree, and property-
test the encode/decode inverse."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import NumpyBackend, SqlBackend

B = NumpyBackend()


def arr(*xs):
    return np.asarray(xs, dtype=np.float64)


class TestPublishedValues:
    def test_saturation_vapour_pressure(self):
        # Hardy(1998) es at 20 °C ≈ 23.39 hPa, 0 °C ≈ 6.112 hPa
        np.testing.assert_allclose(
            K.saturation_vapour_pressure_hpa(B, arr(293.15, 273.15)), [23.392, 6.112], rtol=1e-3
        )

    def test_utci_reference_point(self):
        # Bröde et al. validation: Ta=25°C, Tmrt=25°C, va=1 m/s, RH=50%
        # (td=13.86°C) → UTCI ≈ 24.6°C
        got = K.utci_c(B, arr(298.15), arr(1.0), arr(298.15), arr(287.01))
        assert abs(got[0] - 24.6) < 0.1

    def test_utci_monotone_in_wind_chill(self):
        cold_calm = K.utci_c(B, arr(263.15), arr(0.5), arr(263.15), arr(261.0))
        cold_windy = K.utci_c(B, arr(263.15), arr(10.0), arr(263.15), arr(261.0))
        assert cold_windy[0] < cold_calm[0] < -5.0
        assert cold_windy[0] < -15.0  # strong wind chill

    def test_stull_wet_bulb(self):
        # Stull (2011) worked example: Ta=20 °C, RH=50% → Tw ≈ 13.7 °C
        got = K.wet_bulb_stull_c(B, arr(20.0), arr(50.0))
        assert abs(got[0] - 13.7) < 0.1

    def test_globe_temperature_fixed_point(self):
        # Tmrt == Ta ⇒ Tg == Ta exactly (energy balance trivially solved)
        got = K.globe_temperature_k(B, arr(300.0), arr(300.0), arr(1.0))
        np.testing.assert_allclose(got, [300.0], atol=1e-9)

    def test_erbs_clearness_regimes(self):
        # overcast (kt≤0.22) → nearly all diffuse; clear (kt>0.8) → DF=0.165
        df_overcast = K.erbs_diffuse_fraction(B, arr(0.1))
        df_clear = K.erbs_diffuse_fraction(B, arr(0.9))
        assert df_overcast[0] == pytest.approx(1 - 0.009, abs=1e-9)
        assert df_clear[0] == pytest.approx(0.165)

    def test_cossza_geometry(self):
        # equator, equinox, solar noon → cos(z) ≈ 1; midnight → clamped 0
        noon = K.cos_solar_zenith_angle(B, arr(0.0), arr(0.0), arr(80.0), arr(12.0))
        midnight = K.cos_solar_zenith_angle(B, arr(0.0), arr(0.0), arr(80.0), arr(0.0))
        assert noon[0] > 0.99
        assert midnight[0] == 0.0

    def test_wind_speed_correct_not_reference_bug(self):
        # 3-4-5 triangle; the reference's hypot(u,u) would give 3√2 ≈ 4.24
        got = K.wind_speed(B, arr(3.0), arr(4.0))
        np.testing.assert_allclose(got, [5.0])


class TestBackendParity:
    """numpy vs DuckDB-SQL renderings of the same kernel agree ≤1e-9
    (Spark parity is covered in test_weather_queries via the oracle)."""

    def _duck_eval(self, S: SqlBackend, sql_expr: str, **cols) -> float:
        from w4h_etl_container_spark.functions.exprbackend import render_lets

        con = duckdb.connect()
        binds = ", ".join(f"{float(v)!r}::DOUBLE AS {k}" for k, v in cols.items())
        q = render_lets(S, f"{sql_expr} AS r", f"(SELECT {binds})")
        return con.sql(q).fetchone()[0]

    def test_utci_parity(self):
        S = SqlBackend()
        expr = K.utci_c(S, S.col("t2"), S.col("va"), S.col("mrt"), S.col("td"))
        duck = self._duck_eval(S, str(expr), t2=303.15, va=4.0, mrt=320.0, td=295.0)
        ours = K.utci_c(B, arr(303.15), arr(4.0), arr(320.0), arr(295.0))[0]
        assert abs(duck - ours) < 1e-9

    def test_wbgt_parity(self):
        S = SqlBackend()
        expr = K.wbgt_c(S, S.col("t2"), S.col("mrt"), S.col("va"), S.col("td"))
        duck = self._duck_eval(S, str(expr), t2=303.15, mrt=330.0, va=2.0, td=296.0)
        ours = K.wbgt_c(B, arr(303.15), arr(330.0), arr(2.0), arr(296.0))[0]
        assert abs(duck - ours) < 1e-9

    def test_greatest_least_null_strict_in_sql(self):
        """SqlBackend.greatest/least must propagate NULL (Spark/numpy
        contract), not skip it like plain SQL GREATEST does in DuckDB."""
        S = SqlBackend()
        g = S.greatest(S.col("a"), S.col("b"))
        le = S.least(S.col("a"), S.col("b"))
        con = duckdb.connect()
        row = con.sql(
            f"SELECT {g} AS g, {le} AS l FROM (SELECT NULL::DOUBLE AS a, 0.5 AS b)"
        ).fetchone()
        assert row == (None, None)
        row2 = con.sql(
            f"SELECT {g} AS g, {le} AS l FROM (SELECT 1.5::DOUBLE AS a, 0.5 AS b)"
        ).fetchone()
        assert row2 == (1.5, 0.5)


class TestEncodeDecode:
    @given(
        utci=st.floats(min_value=-99.9, max_value=99.9),
        wbgt=st.floats(min_value=-99.9, max_value=99.9),
        off=st.integers(min_value=0, max_value=199),
    )
    @settings(max_examples=300, deadline=None)
    def test_roundtrip(self, utci, wbgt, off):
        """SF-9 exact inverse over the full encodable domain (the
        reference's production-bug note ``main.py:266-270`` is exactly a
        failed version of this property)."""
        enc = K.encode_temp_times(B, arr(utci), arr(wbgt), arr(float(off)))[0]
        assert 0 <= enc < 2**31
        # decoded values are the 0.1°-rounded inputs
        u10 = np.floor((utci + 100.0) * 10.0 + 0.5)
        w10 = np.floor((wbgt + 100.0) * 10.0 + 0.5)
        assert K.decode_utci(B, arr(enc))[0] == pytest.approx(u10 / 10.0 - 100.0, abs=1e-9)
        assert K.decode_wbgt_c(B, arr(enc))[0] == pytest.approx(w10 / 10.0 - 100.0, abs=1e-9)
        assert K.decode_offset_hours(B, arr(enc))[0] == off
