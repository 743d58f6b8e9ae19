"""Round-8 profiling: break down q_percentile and q_ngram_jaccard wall
time at sf0.1 into their constituent jobs (warm engine, best-of-N)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from w4h_etl_container_spark.session import get_spark, read_table
from w4h_etl_container_spark.plans.registry import load_all

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.3f} s")
    return best


def main():
    spark = get_spark("profile-r8")
    reg = load_all()

    # warmup
    for _ in range(2):
        noop(reg["q_percentile"].fn(spark, SF))
        noop(reg["q_ngram_jaccard"].fn(spark, SF))

    print("=== q_percentile breakdown ===")
    li = read_table(spark, SF, "lineitem")
    rows = li.select("l_returnflag", "l_extendedprice")
    t("scan only (count)", lambda: rows.where(F.col("l_extendedprice").isNotNull()).count())
    t("scan1: groupBy + GK sketch (acc=10000)", lambda: noop(
        rows.groupBy("l_returnflag").agg(
            F.count("l_extendedprice").alias("n"),
            F.expr("percentile_approx(l_extendedprice, array(0.4997, 0.5003, 0.8997, 0.9003), 10000)").alias("br"),
        )))
    t("scan1 with acc=1000", lambda: noop(
        rows.groupBy("l_returnflag").agg(
            F.count("l_extendedprice").alias("n"),
            F.expr("percentile_approx(l_extendedprice, array(0.497, 0.503, 0.897, 0.903), 1000)").alias("br"),
        )))
    t("naive percentile() full-buffer", lambda: noop(
        rows.groupBy("l_returnflag").agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("p"))))
    t("full q_percentile", lambda: noop(reg["q_percentile"].fn(spark, SF)))

    from w4h_etl_container_spark.operators.percentiles import exact_percentile_refined
    t("exact_percentile_refined only", lambda: noop(
        exact_percentile_refined(rows, "l_extendedprice", "l_returnflag", [0.5, 0.9], disc=True)))

    print("=== q_ngram_jaccard breakdown ===")
    from w4h_etl_container_spark.plans.textops import (
        _shingle_sets, _jaccard_from_shingles, _PAIR_EXPAND, _DF_CAP,
    )
    from w4h_etl_container_spark.session import parallelize_compute

    d = read_table(spark, SF, "documents")
    keyed = _shingle_sets(parallelize_compute(d)).select(
        "doc_id", F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("sh")
    )
    t("shingle+md5 keys only (noop)", lambda: noop(keyed))
    byssh_plan = (
        keyed.groupBy("sh").agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .where(F.size("ds") <= _DF_CAP)
    )
    t("posting lists (groupBy sh)", lambda: noop(byssh_plan))

    def full_no_spread():
        noop(_jaccard_from_shingles(keyed, spread=False))
    t("jaccard spread=False (lazy, no checkpoint)", full_no_spread)

    def full_spread():
        noop(_jaccard_from_shingles(keyed, spread=True))
    t("jaccard spread=True (checkpoint barrier)", full_spread)

    # pair expansion alone, from materialized posting lists
    byssh_cp = byssh_plan.localCheckpoint()
    byssh_cp.count()
    pc = parallelize_compute(byssh_cp)
    t("pairs: explode+groupBy(pk) from checkpoint", lambda: noop(
        pc.where(F.size("ds") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPAND)).alias("pk"))
        .groupBy("pk").agg(F.count(F.lit(1)).alias("n_common"))))
    t("sizes from checkpoint", lambda: noop(
        pc.select(F.explode("ds").alias("doc_id")).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))))

    spark.stop()


if __name__ == "__main__":
    main()
