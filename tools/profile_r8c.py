"""Round-8 profiling part 3: per-stage wall breakdown of q_ngram_jaccard
via the Spark UI REST API, plus quick variant tests."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from w4h_etl_container_spark.session import get_spark, read_table, parallelize_compute

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:58s} {best:7.3f} s")
    return best


def stages_between(spark, fn):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stage_list():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return json.load(r)

    before = {s["stageId"] for s in stage_list()}
    fn()
    time.sleep(0.3)
    out = []
    for s in stage_list():
        if s["stageId"] in before or s["status"] not in ("COMPLETE", "FAILED"):
            continue
        out.append(
            (
                s["stageId"],
                s.get("executorRunTime", 0) / 1000.0,
                s.get("numTasks"),
                (s.get("name") or "")[:80],
            )
        )
    for sid, rt, nt, name in sorted(out):
        print(f"  stage {sid:4d}  runTime {rt:7.2f}s  tasks {nt:3d}  {name}")


def main():
    spark = get_spark("profile-r8c")
    from w4h_etl_container_spark.plans.textops import (
        _shingle_sets,
        _jaccard_from_shingles,
    )

    d = read_table(spark, SF, "documents")

    def keyed():
        return _shingle_sets(parallelize_compute(d)).select(
            "doc_id",
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("sh"),
        )

    q = lambda: noop(_jaccard_from_shingles(keyed()))  # noqa: E731
    q()
    q()  # warm
    print("=== q_ngram_jaccard stage breakdown (one warm run) ===")
    t0 = time.time()
    stages_between(spark, q)
    print(f"total wall: {time.time() - t0:.3f}s")

    print("=== variants ===")
    t("baseline spread=True", lambda: noop(_jaccard_from_shingles(keyed())))
    t("spread=False (lazy)", lambda: noop(_jaccard_from_shingles(keyed(), spread=False)))

    spark.stop()


if __name__ == "__main__":
    main()
