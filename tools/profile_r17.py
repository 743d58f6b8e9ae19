"""Round-17 measurement harness (guide §1: measure first).

For each named query (default: the 10 most expensive gate entries from
BENCH_r16), runs the plan through the noop sink and records:

* wall seconds (median of N, after one untimed warm pass),
* Spark JOBS submitted (DAGScheduler.nextJobId delta — the commit-path
  driver-round-trip count the r16 verdict asked to instrument),
* stages completed (statusTracker delta).

Usage:
    python tools/profile_r17.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q_mtable_mv",
    "q_mtable_evolution",
    "q_mtable_compact_split",
    "q_mtable_overwrite",
    "q_mtable_checks",
    "q_split_leakfree",
    "q_shared_runs",
    "q_dedup_survivors",
    "q_daily_highlow",
    "q_winnow",
    "q_rrf_fusion",
]


def _job_count(sc) -> int:
    # DAGScheduler.nextJobId is the monotone count of jobs ever submitted
    # in this JVM (private[spark] compiles to a public accessor).
    return sc._jsc.sc().dagScheduler().nextJobId()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if a.startswith("q_")] or DEFAULT

    from w4h_etl_container_spark.session import get_spark
    from w4h_etl_container_spark.plans.registry import load_library

    spark = get_spark("profile-r17")
    sc = spark.sparkContext
    reg = load_library()

    def run(name: str) -> None:
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # engine warmup (bench parity): one pass of each profiled query at
    # sf0.001 then at the measured scale, untimed
    for name in names:
        for d in ("/root/testdata/sf0.001", sf_dir):
            try:
                run(name) if d == sf_dir else reg[name].fn(spark, d).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"WARM FAIL {name}: {e}", file=sys.stderr)

    out = {}
    for name in names:
        walls = []
        jobs = stages = 0
        for i in range(3):
            j0 = _job_count(sc)
            t0 = time.time()
            run(name)
            walls.append(round(time.time() - t0, 3))
            if i == 0:
                jobs = _job_count(sc) - j0
        walls.sort()
        out[name] = {"wall_med": walls[1], "walls": walls, "jobs": jobs}
        print(f"{name}: med {walls[1]}s walls={walls} jobs={jobs}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
