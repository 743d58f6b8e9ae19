"""The standing sequential DuckDB control (PERF.md round-15 method):
fresh-connect best-of-2 per GATE query oracle at sf0.1, printed as one
JSON line — divide BENCH_LOCAL's sequential Spark total (same boot!) by
this total for the per-round ratio row, instead of re-deriving the
method every round.

Usage: python tools/seq_control.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from w4h_etl_container_spark.plans.registry import load_all

    out = {"sf_dir": sf_dir, "method": "fresh-connect best-of-2 per query",
           "queries": {}}
    for name, q in sorted(load_all().items()):
        if q.sql is None:
            continue
        best = float("inf")
        for _ in range(2):
            con = duckdb.connect()  # fresh connect per run, like the bench
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            t0 = time.time()
            con.sql(q.sql).fetchall()
            best = min(best, time.time() - t0)
            con.close()
        out["queries"][name] = round(best, 3)
        print(f"# {name}: {out['queries'][name]}s", file=sys.stderr, flush=True)
    out["duck_sequential_total"] = round(sum(out["queries"].values()), 3)
    out["n_queries"] = len(out["queries"])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
