"""Per-job attribution for the q_mtable_mv phases via the Spark UI REST
API (jobs carry their callsite as the name — exactly which action each
driver round-trip is)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from w4h_etl_container_spark.session import get_spark, read_table
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create, mtable_merge, mtable_read,
    )
    from w4h_etl_container_spark.pipeline.mview import mv_create, mv_refresh

    spark = get_spark("profile-mv-jobs")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def jobs_after(j0):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs"
        ) as r:
            data = json.load(r)
        out = [j for j in data if j["jobId"] >= j0]
        out.sort(key=lambda j: j["jobId"])
        return out

    def job_count():
        return sc._jsc.sc().dagScheduler().nextJobId()

    # warm
    from w4h_etl_container_spark.plans.registry import load_library
    for d in ("/root/testdata/sf0.001", sf_dir):
        load_library()["q_mtable_mv"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("g"),
        F.round(F.col("c_acctbal").cast("double") * 100).alias("bal"),
    )
    d = tempfile.mkdtemp(prefix="prof-mvj-base-")
    v = tempfile.mkdtemp(prefix="prof-mvj-view-")

    def phase(name, fn):
        j0 = job_count()
        out = fn()
        for j in jobs_after(j0):
            dur = ""
            if j.get("submissionTime") and j.get("completionTime"):
                pass
            print(
                f"  [{name}] job {j['jobId']}: {j['name'][:110]}"
                f" stages={len(j.get('stageIds', []))}"
            )
        print(f"{name}: jobs={job_count()-j0}", flush=True)
        return out

    phase("create", lambda: mtable_create(spark, base.repartition(4, "ckey"), d))
    phase(
        "mv_create",
        lambda: mv_create(
            spark, v, d, group_by="g",
            aggs={
                "n": ("count", "*"), "sb": ("sum", "bal"), "ab": ("avg", "bal"),
                "mnb": ("min", "bal"), "mxb": ("max", "bal"),
            },
            key="ckey",
        ),
    )
    cur = mtable_read(spark, d)
    del_pred = (F.col("ckey") % 89 == 0) & (F.col("ckey") % 53 != 0)
    upd = cur.where(F.col("ckey") % 53 == 0).withColumn("bal", F.col("bal") + 700)
    ins = (
        cur.where(F.col("ckey") % 211 == 0)
        .withColumn("ckey", F.col("ckey") + 10000000)
        .withColumn("bal", F.lit(9900.0))
    )
    dels = cur.where(del_pred).select("ckey")
    phase(
        "mor_merge",
        lambda: mtable_merge(
            spark, d, upd.unionByName(ins), key="ckey", deletes=dels, mode="mor"
        ),
    )
    phase("mv_refresh", lambda: mv_refresh(spark, v))


if __name__ == "__main__":
    main()
