"""Capture ``explain('formatted')`` for declared queries into
``plans/<tag>/<query>_<suffix>.txt`` (round deliverable: the judge checks
plan claims against these files).

Usage:
    python tools/plancap.py <tag> <suffix> [query ...]
e.g.
    python tools/plancap.py r17 before            # all gate queries
    python tools/plancap.py r17 after q_winnow    # subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    from w4h_etl_container_spark.session import get_spark
    from w4h_etl_container_spark.plans.registry import load_library

    spark = get_spark("plancap")
    reg = load_library()
    if not names:
        from w4h_etl_container_spark.plans.registry import QUERIES

        names = sorted(QUERIES)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = reg[name].fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
