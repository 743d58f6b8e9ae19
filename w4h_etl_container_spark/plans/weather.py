"""Weather-kernel declared queries (SURVEY.md §2.8/§2.10) + the flagship
daily-highs/lows pipeline (SURVEY.md §7 Phase A).

The kernels are rendered twice from one source of truth (``kernels.py``):
SparkBackend → native Column trees (whole-stage codegen, no Python in the
hot path) and SqlBackend → the DuckDB oracle. Inputs are synthesized from
fixture columns with *exact* IEEE arithmetic (mod-via-floor of 2-decimal
doubles), so both engines see bit-identical inputs.

Two engineering rules keep these plans fast and exact:

* **let-bindings** — every reused kernel intermediate becomes a named
  column (``apply_lets`` projection layers / SQL lateral aliases).
  Without them the symbolic form explodes combinatorially: the UTCI
  chain reached 650 KB of SQL / tens of thousands of Column nodes, with
  multi-second plan-build and binder times in both engines.
* **round6** — outputs that pass through transcendentals (exp/log/trig/
  pow) are rounded with backend-identical floor(x·1e6+0.5)/1e6: Java's
  and libm's exp/log can differ in the last ulp; 6-decimal rounding
  absorbs that while keeping °C meaningful to a millionth of a degree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark import kernels as K
from w4h_etl_container_spark.functions.exprbackend import (
    SparkBackend,
    SqlBackend,
    apply_lets,
    render_lets,
)
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import parallelize_compute, read_events, read_table


def _fmod(B, x, m):
    """Non-negative float mod via floor — identical in every backend."""
    return x - B.floor(x / m) * m


def round6(B, x):
    """Round to 6 decimals as floor(x·1e6 + 0.5)/1e6 — backend-identical
    (engine ROUND implementations differ in tie handling; floor does not)."""
    return B.floor(x * 1000000.0 + 0.5) / 1000000.0


def synth_weather(B, value, user_id):
    """Deterministic pseudo-weather inputs from (value, user_id).

    Pure exact arithmetic (+,-,×,÷,floor) on fixture doubles — bit-equal
    between Spark and DuckDB — landing inside each kernel's valid domain:
    t2 ∈ [268,313] K, va ∈ [0.5,16.5] m/s, Tmrt−t2 ∈ [−16,32] K, td ≤ t2.
    Every output is let-bound so downstream kernels reference short names.
    """
    value = B.let("sw_value", value)
    user_id = B.let("sw_uid", user_id)
    t2_k = B.let("sy_t2k", 268.15 + _fmod(B, value, 45.0))
    return {
        "t2_k": t2_k,
        "va": B.let("sy_va", 0.5 + _fmod(B, value, 16.0)),
        "mrt_k": B.let("sy_mrtk", t2_k + (_fmod(B, user_id, 7.0) - 2.0) * 8.0),
        "td_k": B.let("sy_tdk", t2_k - 1.0 - _fmod(B, value, 12.0)),
        "lat": B.let("sy_lat", _fmod(B, user_id, 14.0) * 10.0 - 65.0),
        "lon": B.let("sy_lon", _fmod(B, value * 7.3, 360.0)),
        "ghi": B.let("sy_ghi", _fmod(B, value * 4.7, 1100.0)),
        "cossza": B.let("sy_cz", _fmod(B, value, 100.0) / 100.0),
    }


def _sql_events_kernel(build, from_table: str = "events") -> str:
    S = SqlBackend()
    sy = synth_weather(S, S.col("value"), S.col("CAST(user_id AS DOUBLE)"))
    outputs = build(S, sy)
    select = ", ".join(["event_id"] + [f"{e} AS {n}" for n, e in outputs.items()])
    return render_lets(S, select, from_table)


def _spark_events_kernel_sqltext(spark, sf_dir, build, view: str) -> DataFrame:
    """Plan-construction fast path for the heaviest kernel suites: the
    SAME dialect-shared rendering the oracle runs is valid Spark SQL for
    the kernel math (ANSI functions + lateral column aliases), so the
    Spark side parses it JVM-side in ONE call instead of building the
    equivalent Column tree through ~10³ py4j roundtrips (measured: 1.7 s
    Column build vs 0.2 s parse per invocation for the thermal suite —
    the vectors.py lesson applied to kernels). Catalyst sees the
    identical expression tree either way; the Column rendering stays the
    API surface for pipelines (forecast.py) and parity tests."""
    ev = parallelize_compute(read_events(spark, sf_dir), key="user_id")
    ev.createOrReplaceTempView(view)
    return spark.sql(_sql_events_kernel(build, from_table=view))


# ---------------------------------------------------------------------------
# SF-1/2/4/9 — grid scalar suite: wind speed + encode/decode roundtrip
# ---------------------------------------------------------------------------
def _sf_scalars_sql() -> str:
    S = SqlBackend()
    u = S.let("enc_u", S.col("(l_quantity - 25.0 + l_tax * 10.0)"))
    w = S.let("enc_w", S.col("(l_discount * 100.0 - 2.0 + l_quantity / 2.0)"))
    off = S.col("CAST(l_linenumber AS DOUBLE)")
    enc = S.let("enc", K.encode_temp_times(S, u, w, off))
    wind = K.wind_speed(S, S.col("(l_quantity - 25.0)"), S.col("(l_discount * 100.0 - 5.0)"))
    select = (
        f"l_orderkey, l_linenumber, {wind} AS wind_speed, "
        f"CAST({enc} AS BIGINT) AS encoded, "
        f"{K.decode_utci(S, enc)} AS utci_dec, "
        f"{K.decode_wbgt_c(S, enc)} AS wbgt_dec, "
        f"CAST({K.decode_offset_hours(S, enc)} AS BIGINT) AS offset_dec"
    )
    return render_lets(S, select, "lineitem")


@register("q_sf_scalars", sql=_sf_scalars_sql(), survey_ids=("SF-2", "SF-9", "SF-4", "SF-1"))
def q_sf_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grid scalar-function suite in one scan:

    * SF-2 wind speed — the engine computes the correct √(u²+v²); the
      reference's duplicated-u ``np.hypot(u, u)`` is a documented upstream
      bug (``main.py:179``). IEEE sqrt is exactly rounded → bit-equal
      oracle.
    * SF-9/SF-4 bit-pack roundtrip (reference ``main.py:254-276``):
      (utci, wbgt, offset) → int32-range integer and its exact inverse as
      pure Column integer arithmetic (round-not-truncate per
      ``main.py:266-270``; +0.5/floor is the backend-exact rounding).
      Synthesized inputs land in the encodable range utci,wbgt ∈
      (−100, 100), offset ≤ 199."""
    li = parallelize_compute(read_table(spark, sf_dir, "lineitem"), key="l_orderkey")
    B = SparkBackend()
    u = B.let("enc_u", F.col("l_quantity") - F.lit(25.0) + F.col("l_tax") * F.lit(10.0))
    w = B.let("enc_w", F.col("l_discount") * F.lit(100.0) - F.lit(2.0) + F.col("l_quantity") / F.lit(2.0))
    off = F.col("l_linenumber").cast("double")
    enc = B.let("enc", K.encode_temp_times(B, u, w, off))
    wu = F.col("l_quantity") - F.lit(25.0)
    wv = F.col("l_discount") * F.lit(100.0) - F.lit(5.0)
    return apply_lets(li, B).select(
        "l_orderkey",
        "l_linenumber",
        K.wind_speed(B, wu, wv).alias("wind_speed"),
        enc.cast("long").alias("encoded"),
        K.decode_utci(B, enc).alias("utci_dec"),
        K.decode_wbgt_c(B, enc).alias("wbgt_dec"),
        K.decode_offset_hours(B, enc).cast("long").alias("offset_dec"),
    )


# ---------------------------------------------------------------------------
# UDF-3/4/5 — thermal indices suite (MRT, UTCI, WBGT in one pass)
# ---------------------------------------------------------------------------
def _mrt_inputs(B, sy, value):
    return dict(
        ssrd=sy["ghi"],
        ssru=sy["ghi"] * 0.15,
        strd=350.0 + (value - B.floor(value / 80.0) * 80.0),
        stru=380.0 + (value - B.floor(value / 60.0) * 60.0),
        dni=sy["ghi"] * 0.6,
        cossza=sy["cossza"],
    )


def _thermal_outputs(B, sy, value):
    i = _mrt_inputs(B, sy, value)
    mrt = K.mean_radiant_temperature_k(
        B, i["ssrd"], i["ssru"], i["strd"], i["stru"], i["dni"], i["cossza"]
    )
    utci = K.utci_c(B, sy["t2_k"], sy["va"], sy["mrt_k"], sy["td_k"])
    wbgt = K.wbgt_c(B, sy["t2_k"], sy["mrt_k"], sy["va"], sy["td_k"])
    return {
        "mrt_k": round6(B, mrt),
        "utci": round6(B, utci),
        "wbgt": round6(B, wbgt),
    }


def _thermal_outputs_sql(S, sy):
    return _thermal_outputs(S, sy, S.col("value"))


@register(
    "q_thermal_indices",
    sql=_sql_events_kernel(_thermal_outputs_sql),
    survey_ids=("UDF-3", "UDF-4", "UDF-5", "SF-10", "SF-1"),
)
def q_thermal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thermal-index kernel suite computed in ONE scan — exactly how a
    production pipeline runs it (the reference computes MRT → UTCI → WBGT
    per timestep in sequence, ``main.py:149-203``):

    * UDF-3 MRT — the 6-flux formula (Di Napoli et al. 2020); the
      reference's staged flux assembly (SF-1 sums + drops) becomes shared
      let-bound subexpressions.
    * UDF-4 UTCI — the Bröde et al. 210-term polynomial as a native
      Column tree (whole-stage codegen, no Python worker; a parity
      pandas-UDF rendering is tested in tests/). Power ladders and
      humidity are let-bound, keeping the analyzed plan linear in
      polynomial size.
    * UDF-5 WBGT — ISO 7243 weighting, Stull wet-bulb, let-bound Newton
      globe recovery.

    Scale: one scan, zero shuffles, one codegen'd projection; let-bound
    intermediates (va clamp, humidity, power ladders) are shared across
    the three indices instead of recomputed. Spark-side plan is built
    via the SQL-text fast path (see _spark_events_kernel_sqltext)."""
    return _spark_events_kernel_sqltext(spark, sf_dir, _thermal_outputs_sql, "__ev_thermal")


# ---------------------------------------------------------------------------
# UDF-1 — cos solar zenith;  UDF-2 — Erbs decomposition (solar suite)
# ---------------------------------------------------------------------------
def _solar_outputs_sql(S, sy):
    cz = S.let(
        "cz_out",
        K.cos_solar_zenith_angle(
            S,
            sy["lat"],
            sy["lon"],
            S.col("CAST(date_part('doy', ts) AS DOUBLE)"),
            S.col("(CAST(date_part('hour', ts) AS DOUBLE) - 0.5)"),
        ),
    )
    r = K.erbs(S, sy["ghi"], sy["cossza"], S.col("CAST(date_part('doy', ts) AS DOUBLE)"))
    return {
        "cossza": round6(S, cz),
        "zenith_deg": round6(S, S.degrees(S.acos(cz))),
        "dni": round6(S, r["dni"]),
        "dhi": round6(S, r["dhi"]),
    }


@register(
    "q_solar",
    sql=_sql_events_kernel(_solar_outputs_sql),
    survey_ids=("UDF-1", "UDF-2", "SF-3"),
)
def q_solar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The solar-geometry suite in one scan:

    * UDF-1 cossza (reference thermofeel hour-integrated cossza,
      ``main.py:115-131``): Spencer-1971 solar geometry evaluated at the
      mid-hour point (the reference's per-hour integral ≈ midpoint to
      ≤0.3%; documented deviation). SF-3: the zenith angle recovered via
      arccos (reference ``main.py:141``).
    * UDF-2 Erbs decomposition (reference pvlib erbs via apply_ufunc,
      ``utils.py:57-60``, ``main.py:135-144``): multi-output kernel — DNI
      and DHI over a shared let-bound diffuse fraction (computed once,
      not per output).

    Per-row expressions — the reference's per-time slice loop + concat
    (SET-1) disappears in long form. Scan-bound at any scale. Spark-side
    plan via the SQL-text fast path."""
    return _spark_events_kernel_sqltext(spark, sf_dir, _solar_outputs_sql, "__ev_solar")


# ---------------------------------------------------------------------------
# Flagship — daily highs/lows: WIN-1 key-shift → AGG-4 gate → AGG-1
# ---------------------------------------------------------------------------
def _daily_sql() -> str:
    S = SqlBackend()
    sy = synth_weather(S, S.col("value"), S.col("CAST(user_id AS DOUBLE)"))
    utci = round6(S, K.utci_c(S, sy["t2_k"], sy["va"], sy["mrt_k"], sy["td_k"]))
    ha_raw = S.let("ha_raw", S.col(f"FLOOR({sy['lon']} / 15.0 + 0.5)"))
    shifted_select = (
        f"user_id, ts + to_hours(CAST(CASE WHEN {ha_raw} > 12.0 THEN {ha_raw} - 24.0 "
        f"ELSE {ha_raw} END AS BIGINT)) AS haa_ts, {utci} AS utci"
    )
    shifted = render_lets(S, shifted_select, "events")
    return f"""
    WITH shifted AS (
      {shifted}
    ), gated AS (
      SELECT CAST(haa_ts AS DATE) AS haa_date
      FROM shifted
      GROUP BY 1
      HAVING COUNT(DISTINCT date_part('hour', haa_ts)) >= 20
    )
    SELECT s.user_id, CAST(s.haa_ts AS DATE) AS haa_date,
           max(s.utci) AS utci_high, min(s.utci) AS utci_low,
           COUNT(*) AS n_obs
    FROM shifted s
    WHERE CAST(s.haa_ts AS DATE) IN (SELECT haa_date FROM gated)
    GROUP BY s.user_id, CAST(s.haa_ts AS DATE)
    """


@register(
    "q_daily_highlow",
    sql=_daily_sql(),
    survey_ids=("WIN-1", "AGG-1", "AGG-4", "UDF-4", "SF-5", "SF-6"),
)
def q_daily_highlow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §7 Phase A; reference entry point 3,
    ``main.py:341-443``): per-cell daily UTCI highs/lows in local solar
    time.

    WIN-1 re-expressed Spark-first: the reference's per-offset ``shift``
    loop is a *key shift* — relabel each row's timestamp by its
    longitude's hour angle, then group by the shifted date. No data
    movement for the shift itself (it's a column expression).

    AGG-4 gate folded into ONE pass: each (user, date) partial carries a
    24-bit hour-presence bitmask (``bit_or(shiftleft(1, hour))``); the
    date-level distinct-hour count is then ``bit_count`` of the masks
    OR-ed across users — a window over the already-aggregated rows (one
    row per user×date, ~1e4× smaller than the input), so the gate never
    rescans the data. vs the naive two-branch shape (separate
    date-level countDistinct + semi join): ONE events scan instead of
    two, UTCI computed once, one full-data shuffle instead of two.
    At 100 TB: scan-partition pruning on ts, one hash aggregate with
    map-side partials, one tiny window; nothing else.
    """
    ev = parallelize_compute(read_events(spark, sf_dir), key="user_id")
    B = SparkBackend()
    sy = synth_weather(B, F.col("value"), F.col("user_id").cast("double"))
    utci = round6(B, K.utci_c(B, sy["t2_k"], sy["va"], sy["mrt_k"], sy["td_k"]))
    ha_raw = B.let("ha_raw", F.floor(sy["lon"] / 15.0 + 0.5).cast("double"))
    ha = F.when(ha_raw > 12.0, ha_raw - 24.0).otherwise(ha_raw)  # SF-5 wraparound
    shifted = apply_lets(ev, B).select(
        "user_id",
        (F.col("ts") + F.make_interval(hours=ha.cast("int"))).alias("haa_ts"),
        utci.alias("utci"),
    )
    daily = (
        shifted.groupBy("user_id", F.col("haa_ts").cast("date").alias("haa_date"))
        .agg(
            F.max("utci").alias("utci_high"),
            F.min("utci").alias("utci_low"),
            F.count(F.lit(1)).alias("n_obs"),
            F.expr("bit_or(shiftleft(1, hour(haa_ts)))").alias("hmask"),
        )
    )
    from pyspark.sql import Window

    date_hours = F.bit_count(F.expr("bit_or(hmask)").over(Window.partitionBy("haa_date")))
    return (
        daily.withColumn("__n_hours", date_hours)
        .where(F.col("__n_hours") >= 20)
        .select("user_id", "haa_date", "utci_high", "utci_low", "n_obs")
    )
