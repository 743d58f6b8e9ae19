"""Hostile-events parity sweep: every events-reading declared query runs
on a crafted event stream with the failure classes a real feed ships —
null value, null/malformed/mistyped props JSON, null event_type,
duplicate (user, ts) pairs, year-boundary timestamps — and must match
DuckDB exactly.

Already caught and fixed: DuckDB's bare ``json_extract`` ERRORS on
malformed props where Spark's ``from_json`` yields NULL (oracle now
guards with json_valid + TRY_CAST), and a NULL event_type crashed
``map_from_entries`` in q_state_ops (NULL_MAP_KEY) even though the
equality join could never emit such rows."""

from __future__ import annotations

import datetime
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from w4h_etl_container_spark.plans.registry import load_library

EVENT_QUERIES = [
    "q_agg_daily",
    "q_agg_distinct",
    "q_agg_gate",
    "q_daily_highlow",
    "q_flt_dropna",
    "q_flt_retention",
    "q_grouped_map",
    "q_join_asof",
    "q_prj_slice",
    "q_set_cyclic",
    "q_sf_datetime",
    "q_solar",
    "q_state_ops",
    "q_stream_dedup",
    "q_stream_session",
    "q_stream_tumbling",
    "q_thermal_indices",
    "q_win_funcs",
    "q_win_offset",
    "q_win_range",
    "q_funnel",
    "q_cohort_retention",
    "q_pivot",
    "q_gapfill",
    "q_histogram",
    "q_corr",
    "q_outliers",
    "q_props_profile",
    "q_attribution",
    "q_transitions",
    "q_rfm",
    "q_kmv_distinct",
    "q_heavy_hitters",
    "q_scd2",
    "q_salted_join",
    "q_sessionize",
    "q_kmv_setops",
    "q_rate_anomaly",
    "q_key_skew",
]

TYPES = ["click", "view", "purchase", "error", "signup"]


@pytest.fixture(scope="module")
def hostile_ev_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("hostile_ev"))
    rng = np.random.default_rng(11)
    rows = []
    base = pd.Timestamp("2024-01-01")
    eid = 0
    # regular traffic: 6 users, full-hour coverage so the completeness
    # gates have qualifying dates
    for u in range(6):
        for h in range(26):
            rows.append(
                (
                    eid,
                    base + pd.Timedelta(hours=h, minutes=int(rng.integers(0, 59))),
                    u,
                    TYPES[eid % 5],
                    round(float(rng.normal(100, 50)), 2),
                    '{"k": %d}' % (eid % 97),
                )
            )
            eid += 1
    hostile = [
        (eid + 0, base, 0, "click", None, '{"k": 1}'),  # null value
        (eid + 1, base + pd.Timedelta(hours=1), 1, "view", 5.0, None),  # null props
        (eid + 2, base + pd.Timedelta(hours=2), 2, "error", -1e9, "not json"),
        (eid + 3, rows[0][1], 0, "click", 7.0, '{"k": 2}'),  # dup (user, ts)
        (eid + 4, pd.Timestamp("2024-12-31 23:59:59.999999"), 3, "purchase", 0.0, '{"k": 3}'),
        (eid + 5, base + pd.Timedelta(hours=3), 4, None, 1.0, '{"k": 4}'),  # null type
        (eid + 6, base + pd.Timedelta(hours=4), 5, "view", 2.0, '{"k": "abc"}'),  # mistyped k
        (eid + 7, pd.NaT, 2, "view", 3.0, '{"k": 9}'),  # null ts: ingestion drops it
        # null user_id (anonymous event): grouping/partitioning treats
        # NULL identically in both engines — probed parity-clean across
        # all 19 queries, kept here so that stays true
        (eid + 8, base + pd.Timedelta(hours=5), None, "view", 4.0, '{"k": 10}'),
        # null event_id: the salted join derives the fact-side salt from
        # event_id — a NULL salt must not silently drop the row (ADVICE r9)
        (None, base + pd.Timedelta(hours=6), 1, "purchase", 6.0, '{"k": 11}'),
    ]
    pdf = pd.DataFrame(
        rows + hostile,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    # keep event_id/user_id physically int64-with-null (the production
    # schema), not the float64 pandas degrades object columns with None to
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    # dimension/fact side tables some event queries join against
    import shutil

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def duck_ev(hostile_ev_dir):
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{hostile_ev_dir}/{t}.parquet')"
        )
    # the oracle view models the INGESTED relation: read_events enforces
    # ts IS NOT NULL (a null event time has engine-defined, non-portable
    # semantics in every temporal operator — see session.read_events).
    # Driver fixtures always satisfy the contract, so the driver's raw
    # views and this filtered view are the same relation there.
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{hostile_ev_dir}/events.parquet') WHERE ts IS NOT NULL"
    )
    return con


def _align_dates(s: pd.DataFrame, d: pd.DataFrame) -> None:
    """Spark's toPandas yields datetime.date objects for DATE columns
    while DuckDB's fetchdf widens them to datetime64 — narrow the duck
    side so value comparison is type-consistent (the driver's
    canonicalizer does the same)."""
    for c in s.columns:
        col = s[c].dropna()
        if (
            s[c].dtype == object
            and len(col)
            and isinstance(col.iloc[0], datetime.date)
            and not isinstance(col.iloc[0], datetime.datetime)
        ):
            d[c] = pd.to_datetime(d[c]).dt.date
        elif s[c].dtype.kind == "M" or d[c].dtype.kind == "M":
            # same instants, different units (Spark ns vs DuckDB us) —
            # assert_frame_equal compares raw int64 representations
            s[c] = s[c].astype("datetime64[ns]")
            d[c] = d[c].astype("datetime64[ns]")


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_hostile_events_parity(spark, hostile_ev_dir, duck_ev, name):
    q = load_library()[name]
    assert q.sql is not None
    sdf = q.fn(spark, hostile_ev_dir).toPandas()
    ddf = duck_ev.execute(q.sql).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), (cols, sorted(ddf.columns))
    _align_dates(sdf, ddf)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


def test_ingestion_quarantine_partitions_raw(spark, hostile_ev_dir):
    """ADVICE r7: the parquet boundary's contract drops are auditable —
    read_events ∪ read_events_quarantine = the raw table, disjointly
    (the JSONL boundary's every-row-lands-somewhere invariant)."""
    from w4h_etl_container_spark.session import (
        read_events,
        read_events_quarantine,
        read_table,
    )

    raw = read_table(spark, hostile_ev_dir, "events")
    clean = read_events(spark, hostile_ev_dir)
    quar = read_events_quarantine(spark, hostile_ev_dir)
    assert quar.count() == 1  # exactly the null-ts row
    assert clean.count() + quar.count() == raw.count()
    # disjoint by event id
    both = clean.select("event_id").intersect(quar.select("event_id"))
    assert both.count() == 0
