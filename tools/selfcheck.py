"""Local mirror of the driver's correctness gate.

Runs every declared query through Spark AND its DuckDB oracle at a given
scale factor, comparing row count, column names/ordering, and an
order-insensitive canonical value hash. Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import traceback
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            # pandas materializes SQL NULL in float columns as NaN on BOTH
            # engine paths (the driver's canonicalizer demonstrably equates
            # them — q_win_funcs' NULL lag cells hash green) — so NULL and
            # NaN canonicalize identically here too.
            return "∅"
        return repr(v)  # shortest roundtrip repr — identical for identical doubles
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _from_pandas(v):
    """Unwrap pandas/numpy scalars to Python, preserving float-ness.

    np.float64(1.0) must stay ``float`` (not collapse to int) so that a
    DuckDB HUGEINT column that pandas coerced to float64 hashes differently
    from Spark's bigint — exactly what the driver's canonicalizer sees.
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.generic):
        return v.item()
    return v


def nan_cells(rows: list[tuple]) -> int:
    """Count float-NaN cells. NULL and NaN canonicalize to the same token
    (driver-verified equivalence — see _canon_cell), which could mask a
    genuine Spark-NaN vs DuckDB-NULL divergence; surfacing the count per
    engine keeps any such masking visible instead of silent."""
    return sum(
        1 for r in rows for v in r if isinstance(v, float) and math.isnan(v)
    )


def canon_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from w4h_etl_container_spark.session import get_spark
    from w4h_etl_container_spark.plans.registry import load_library

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # library tier included: the driver hash-checks only the 50 gate
    # queries, but the local mirror keeps every declared oracle honest
    registry = load_library()
    names = [n for n in sorted(registry) if not only or n in only]
    n_pass = n_fail = 0
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_hash = canon_hash(s_cols, s_rows)
            spark_s = time.time() - t0
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=5)
            n_fail += 1
            continue
        if q.sql is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {spark_s:.1f}s)")
            n_pass += 1
            continue
        t1 = time.time()
        try:
            rel = con.sql(q.sql)
            d_cols = rel.columns
            # Materialize through pandas like the driver's canonicalizer —
            # fetchall() hands back Python ints and hides type drift (e.g.
            # DuckDB HUGEINT → float64 through pandas), which cost a round-2
            # driver hash mismatch the tuple path could not reproduce.
            pdf = rel.df()
            # pandas widens DATE to midnight datetime64; narrow those
            # columns back using DuckDB's declared types (the driver's
            # round-2 results show DATE columns hash equal to Spark dates,
            # while HUGEINT→float64 drift does NOT get normalized).
            date_cols = {c for c, t in zip(rel.columns, rel.types) if str(t) == "DATE"}
            is_date = [c in date_cols for c in d_cols]
            d_rows = [
                tuple(
                    _from_pandas(v).date() if is_date[i] and v is not None and v == v and hasattr(v, "date")
                    else _from_pandas(v)
                    for i, v in enumerate(row)
                )
                for row in pdf.itertuples(index=False, name=None)
            ]
            d_hash = canon_hash(d_cols, d_rows)
            duck_s = time.time() - t1
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=5)
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if s_hash != d_hash:
            problems.append(f"hash {s_hash} vs {d_hash}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            # show a tiny diff sample for hash mismatches
            if len(s_rows) == len(d_rows) and sorted(s_cols) == sorted(d_cols):
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ss = sorted("|".join(_canon_cell(r[i]) for i in order_s) for r in s_rows)
                dd = sorted("|".join(_canon_cell(r[i]) for i in order_d) for r in d_rows)
                shown = 0
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"    spark: {a[:200]}")
                        print(f"    duck : {b[:200]}")
                        shown += 1
                        if shown >= 3:
                            break
            n_fail += 1
        else:
            s_nan, d_nan = nan_cells(s_rows), nan_cells(d_rows)
            nan_note = f" [nan cells: spark {s_nan}, duck {d_nan}]" if (s_nan or d_nan) else ""
            print(
                f"PASS {name} ({len(s_rows)} rows, spark {spark_s:.1f}s, "
                f"duck {duck_s:.2f}s){nan_note}"
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
