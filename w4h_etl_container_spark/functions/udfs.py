"""Arrow-vectorized pandas-UDF renderings of the kernel library.

Production uses the native Column renderings (whole-stage codegen — see
``plans/weather.py``); these UDFs exist because the reference's extension
surface is ``xr.apply_ufunc`` over numpy kernels (SURVEY.md §2.10) and the
engine keeps that surface: users with kernels that genuinely can't be
Column trees plug in here. Parity between the two renderings is pinned by
``tests/test_udf_parity.py`` (≤1e-9).

Constructed lazily via :func:`get_udfs` — ``@pandas_udf`` needs an active
SparkSession, so module import stays session-free.

Batch sizing: ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in
session.py) keeps Arrow batches ~64k rows — large enough to amortize the
Python hop, small enough to stay in executor memory at 124.6M-row grids
(SURVEY.md §4).
"""

from __future__ import annotations

import functools

import pandas as pd

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import NumpyBackend

_B = NumpyBackend()


@functools.lru_cache(maxsize=1)
def get_udfs() -> dict:
    """Build (once per process) the pandas-UDF kernel surface."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def utci_udf(t2_k: pd.Series, va: pd.Series, mrt_k: pd.Series, td_k: pd.Series) -> pd.Series:
        """UDF-4: UTCI °C (reference ``calculate_utci``, ``main.py:188-195``)."""
        return pd.Series(
            K.utci_c(_B, t2_k.to_numpy(), va.to_numpy(), mrt_k.to_numpy(), td_k.to_numpy())
        )

    @pandas_udf("double")
    def wbgt_udf(t2_k: pd.Series, mrt_k: pd.Series, va: pd.Series, td_k: pd.Series) -> pd.Series:
        """UDF-5: WBGT °C (reference ``calculate_wbgt``, ``main.py:197-203``)."""
        return pd.Series(
            K.wbgt_c(_B, t2_k.to_numpy(), mrt_k.to_numpy(), va.to_numpy(), td_k.to_numpy())
        )

    @pandas_udf("double")
    def cossza_udf(lat: pd.Series, lon: pd.Series, doy: pd.Series, utc_hour: pd.Series) -> pd.Series:
        """UDF-1: cosine of solar zenith (reference ``main.py:115-131``)."""
        return pd.Series(
            K.cos_solar_zenith_angle(
                _B, lat.to_numpy(), lon.to_numpy(), doy.to_numpy(), utc_hour.to_numpy()
            )
        )

    @pandas_udf("struct<dni:double, dhi:double>")
    def erbs_udf(ghi: pd.Series, cossza: pd.Series, doy: pd.Series) -> pd.DataFrame:
        """UDF-2: Erbs decomposition — multi-output, returned as a struct
        (the reference needed an apply_ufunc tuple wrapper, ``utils.py:57-60``;
        here a struct column the caller unpacks with ``r.dni``/``r.dhi``)."""
        r = K.erbs(_B, ghi.to_numpy(), cossza.to_numpy(), doy.to_numpy())
        return pd.DataFrame({"dni": r["dni"], "dhi": r["dhi"]})

    @pandas_udf("double")
    def mrt_udf(
        ssrd: pd.Series,
        ssru: pd.Series,
        strd: pd.Series,
        stru: pd.Series,
        dni: pd.Series,
        cossza: pd.Series,
    ) -> pd.Series:
        """UDF-3: mean radiant temperature K (reference ``main.py:149-158``)."""
        return pd.Series(
            K.mean_radiant_temperature_k(
                _B,
                ssrd.to_numpy(),
                ssru.to_numpy(),
                strd.to_numpy(),
                stru.to_numpy(),
                dni.to_numpy(),
                cossza.to_numpy(),
            )
        )

    return {
        "utci": utci_udf,
        "wbgt": wbgt_udf,
        "cossza": cossza_udf,
        "erbs": erbs_udf,
        "mrt": mrt_udf,
    }
