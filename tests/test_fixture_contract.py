"""Fixture-schema contract for the events table.

Round 5 post-mortem: the driver regenerated ``events.parquet`` with ``ts``
as parquet TIMESTAMP(MICROS) where earlier generations used
TIMESTAMP(NANOS); a reader hard-wired to the nanos layout ERR'd 19/50
gate queries and 24/119 tests at analysis time. This module pins the
contract instead: ``read_events`` must yield ``ts: timestamp`` regardless
of the physical layout the fixture generation chose, and the *real*
fixture's layout must be one the reader dispatches on — so the next
regeneration breaks ONE test with a clear message.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from w4h_etl_container_spark.session import read_events, read_table

from conftest import SF_DIR

# Two instants the generator could plausibly emit, at µs resolution.
_INSTANTS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events_like(path: str, ts_array: pa.Array) -> None:
    """Minimal events-shaped parquet with the given ts physical layout."""
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], type=pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(['{"a":1}', "{}"]),
        }
    )
    pq.write_table(tbl, path)


def _expected_py_datetimes() -> list[dt.datetime]:
    return [
        dt.datetime.fromtimestamp(us / 1_000_000, tz=dt.timezone.utc).replace(tzinfo=None)
        for us in _INSTANTS_US
    ]


@pytest.mark.parametrize(
    "layout,ts_array",
    [
        # Legacy generation: TIMESTAMP(NANOS) — Spark reads as ns-longs
        # under spark.sql.legacy.parquet.nanosAsLong.
        ("nanos", pa.array([us * 1000 for us in _INSTANTS_US], type=pa.timestamp("ns"))),
        # Current generation: TIMESTAMP(MICROS), tz-naive (TIMESTAMP_NTZ).
        ("micros_ntz", pa.array(_INSTANTS_US, type=pa.timestamp("us"))),
        # Defensive: µs adjusted-to-UTC (plain TIMESTAMP in Spark).
        ("micros_utc", pa.array(_INSTANTS_US, type=pa.timestamp("us", tz="UTC"))),
    ],
)
def test_read_events_handles_layout(spark, tmp_path, layout, ts_array):
    d = tmp_path / layout
    d.mkdir()
    _write_events_like(str(d / "events.parquet"), ts_array)
    ev = read_events(spark, str(d))
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        f"read_events must normalize the {layout} layout to a session-UTC timestamp"
    )
    got = sorted(r.ts for r in ev.select("ts").collect())
    assert got == _expected_py_datetimes(), (
        f"{layout}: instants changed under normalization — reader dispatch is wrong"
    )


def test_real_fixture_layout_is_dispatched(spark):
    """The driver's actual fixture must land on a known dispatch branch AND
    round-trip to the same instants DuckDB sees on the same file."""
    path = os.path.join(SF_DIR, "events.parquet")
    field = pq.read_schema(path).field("ts")
    assert pa.types.is_timestamp(field.type) or field.type == pa.int64(), (
        f"events.ts fixture layout changed to {field.type}; "
        "extend read_events() dispatch in session.py"
    )

    ev = read_events(spark, SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp"

    import duckdb

    con = duckdb.connect()
    oracle_min, oracle_max, oracle_n = con.execute(
        "SELECT CAST(min(ts) AS TIMESTAMP), CAST(max(ts) AS TIMESTAMP), count(*) "
        f"FROM read_parquet('{path}')"
    ).fetchone()
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi", "count(*) AS n").first()
    assert row.n == oracle_n
    assert row.lo == oracle_min and row.hi == oracle_max, (
        "Spark and DuckDB disagree on events.ts instants — timezone or "
        "unit handling drifted in read_events"
    )


# Full physical-schema pin for every fixture table (as of the round-6
# regeneration). A driver-side regeneration that changes ANY name or
# arrow type fails here first, with the exact drift named — instead of
# surfacing as dozens of analysis-time errors across the gate (the
# round-5 failure mode). A deliberate fixture change updates this map.
_ARROW_SCHEMAS = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {"c_custkey": "int64", "c_name": "string", "c_nationkey": "int32", "c_acctbal": "double", "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32", "s_acctbal": "double"},
    "part": {"p_partkey": "int64", "p_name": "string", "p_brand": "string", "p_type": "string", "p_size": "int32", "p_retailprice": "double"},
    "orders": {"o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string", "o_totalprice": "double", "o_orderdate": "timestamp[us]", "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64", "l_linenumber": "int32", "l_quantity": "double", "l_extendedprice": "double", "l_discount": "double", "l_tax": "double", "l_returnflag": "string", "l_linestatus": "string", "l_shipdate": "timestamp[us]"},
    # events.ts: any layout read_events dispatches on (see tests above)
    "events": {"event_id": "int64", "ts": None, "user_id": "int64", "event_type": "string", "value": "double", "props": "string"},
    "documents": {"doc_id": "int64", "text": "string", "lang": "string", "source": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64", "embedding": "list<element: float>", "label": "int32"},
}


def test_all_fixture_schemas_stable():
    drifts = []
    for name, want in _ARROW_SCHEMAS.items():
        sch = pq.read_schema(os.path.join(SF_DIR, f"{name}.parquet"))
        got = {f.name: str(f.type) for f in sch}
        if set(got) != set(want):
            drifts.append(f"{name}: columns {sorted(got)} != expected {sorted(want)}")
            continue
        for col, typ in want.items():
            if typ is not None and got[col] != typ:
                drifts.append(f"{name}.{col}: {got[col]} != expected {typ}")
    assert not drifts, "fixture regeneration changed physical schemas:\n" + "\n".join(drifts)


def test_read_table_other_fixtures_stable(spark):
    """Non-events tables: pin the column sets the plans depend on."""
    expected_cols = {
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"},
        "orders": {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"},
        "documents": {"doc_id", "text"},
        "embeddings": {"vec_id", "embedding"},
    }
    for name, cols in expected_cols.items():
        df = read_table(spark, SF_DIR, name)
        missing = cols - set(df.columns)
        assert not missing, f"{name} fixture lost columns {missing}"
