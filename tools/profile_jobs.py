"""Dump every Spark job (with callsite name) a declared query submits —
the per-collect AQE job attribution the r17 optimization pass works from.

Usage: python tools/profile_jobs.py [sf_dir] q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if a.startswith("q_")]

    from w4h_etl_container_spark.session import get_spark
    from w4h_etl_container_spark.plans.registry import load_library

    spark = get_spark("profile-jobs")
    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId
    reg = load_library()

    def job_count():
        return sc._jsc.sc().dagScheduler().nextJobId()

    def jobs_after(j0):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            data = json.load(r)
        out = [j for j in data if j["jobId"] >= j0]
        out.sort(key=lambda j: j["jobId"])
        return out

    def run(name, d):
        reg[name].fn(spark, d).write.format("noop").mode("overwrite").save()

    for name in names:
        for d in ("/root/testdata/sf0.001", sf_dir):
            run(name, d)  # warm
        j0, t0 = job_count(), time.time()
        run(name, sf_dir)
        wall = time.time() - t0
        print(f"== {name}: {wall:.3f}s jobs={job_count()-j0}")
        for j in jobs_after(j0):
            print(f"   job {j['jobId']}: {j['name'][:100]} stages={len(j.get('stageIds', []))}")


if __name__ == "__main__":
    main()
