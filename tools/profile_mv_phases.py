"""Phase-level job/wall decomposition of q_mtable_mv (guide §1: find
where the driver round-trips actually are before cutting them)."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from w4h_etl_container_spark.session import get_spark, read_table
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create, mtable_merge, mtable_read, read_manifest,
    )
    from w4h_etl_container_spark.pipeline.mview import (
        mv_create, mv_read, mv_refresh,
    )

    spark = get_spark("profile-mv")
    sc = spark.sparkContext

    def jobs() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    # warm pass at sf0.001 then the measured scale
    for d in ("/root/testdata/sf0.001", sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library
        load_library()["q_mtable_mv"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("g"),
        F.round(F.col("c_acctbal").cast("double") * 100).alias("bal"),
    )
    d = tempfile.mkdtemp(prefix="prof-mv-base-")
    v = tempfile.mkdtemp(prefix="prof-mv-view-")

    def phase(name, fn):
        j0, t0 = jobs(), time.time()
        out = fn()
        print(f"{name}: {time.time()-t0:.3f}s jobs={jobs()-j0}", flush=True)
        return out

    phase("mtable_create", lambda: mtable_create(spark, base.repartition(4, "ckey"), d))
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
    phase("mv_refresh_noop", lambda: mv_refresh(spark, v))
    phase(
        "mv_read_noop_sink",
        lambda: mv_read(spark, v).write.format("noop").mode("overwrite").save(),
    )


if __name__ == "__main__":
    main()
