"""UDF-vs-native parity (SURVEY §5.2): the Arrow pandas-UDF renderings of
the kernels must agree with the production native-Column renderings to
1e-9 — the reference's apply_ufunc surface and our codegen path are the
same math."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import SparkBackend, apply_lets
from w4h_etl_container_spark.functions.udfs import get_udfs
from w4h_etl_container_spark.plans.weather import synth_weather
from w4h_etl_container_spark.session import read_events


@pytest.fixture(scope="module")
def inputs(spark, sf_dir):
    ev = read_events(spark, sf_dir).limit(500)
    B = SparkBackend()
    sy = synth_weather(B, F.col("value"), F.col("user_id").cast("double"))
    df = apply_lets(ev, B).select(
        "event_id",
        sy["t2_k"].alias("t2_k"),
        sy["va"].alias("va"),
        sy["mrt_k"].alias("mrt_k"),
        sy["td_k"].alias("td_k"),
        sy["lat"].alias("lat"),
        sy["lon"].alias("lon"),
        sy["ghi"].alias("ghi"),
        sy["cossza"].alias("cz"),
        F.dayofyear("ts").cast("double").alias("doy"),
        (F.hour("ts").cast("double") - F.lit(0.5)).alias("uh"),
    )
    return df.cache()


def _max_abs_diff(df, a, b) -> float:
    return df.agg(F.max(F.abs(F.col(a) - F.col(b)))).collect()[0][0]


class TestParity:
    def test_utci(self, inputs):
        B = SparkBackend()
        native = K.utci_c(B, F.col("t2_k"), F.col("va"), F.col("mrt_k"), F.col("td_k"))
        df = apply_lets(inputs, B).withColumn("n", native).withColumn(
            "u", get_udfs()["utci"]("t2_k", "va", "mrt_k", "td_k")
        )
        assert _max_abs_diff(df, "n", "u") < 1e-9

    def test_wbgt(self, inputs):
        B = SparkBackend()
        native = K.wbgt_c(B, F.col("t2_k"), F.col("mrt_k"), F.col("va"), F.col("td_k"))
        df = apply_lets(inputs, B).withColumn("n", native).withColumn(
            "u", get_udfs()["wbgt"]("t2_k", "mrt_k", "va", "td_k")
        )
        assert _max_abs_diff(df, "n", "u") < 1e-9

    def test_cossza(self, inputs):
        B = SparkBackend()
        native = K.cos_solar_zenith_angle(B, F.col("lat"), F.col("lon"), F.col("doy"), F.col("uh"))
        df = apply_lets(inputs, B).withColumn("n", native).withColumn(
            "u", get_udfs()["cossza"]("lat", "lon", "doy", "uh")
        )
        assert _max_abs_diff(df, "n", "u") < 1e-9

    def test_erbs_struct_output(self, inputs):
        B = SparkBackend()
        r = K.erbs(B, F.col("ghi"), F.col("cz"), F.col("doy"))
        df = (
            apply_lets(inputs, B)
            .withColumn("n_dni", r["dni"])
            .withColumn("e", get_udfs()["erbs"]("ghi", "cz", "doy"))
        )
        df = df.withColumn("u_dni", F.col("e.dni"))
        assert _max_abs_diff(df, "n_dni", "u_dni") < 1e-9
