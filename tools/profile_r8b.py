"""Round-8 profiling part 2: scan2 + job-overhead breakdown for
q_percentile; per-stage breakdown for q_ngram_jaccard variants."""

from __future__ import annotations

import os
import sys
import time

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


def main():
    spark = get_spark("profile-r8b")
    li = read_table(spark, SF, "lineitem")
    rows = li.select("l_returnflag", "l_extendedprice").where(
        F.col("l_extendedprice").isNotNull()
    )
    qs = [0.5, 0.9]
    acc = 10_000
    eps = 1.0 / acc
    bounds = []
    for qi in qs:
        bounds += [max(0.0, qi - 3 * eps), min(1.0, qi + 3 * eps)]

    # warm
    rows.count()
    pre_plan = rows.groupBy("l_returnflag").agg(
        F.count("l_extendedprice").alias("_n"),
        F.expr(
            f"percentile_approx(l_extendedprice, array({', '.join(map(repr, bounds))}), {acc})"
        ).alias("_br"),
    )
    noop(pre_plan)
    noop(pre_plan)

    print("=== percentile scan2 pieces ===")
    t("scan1 (GK sketch agg)", lambda: noop(pre_plan))

    # materialize pre once; scan2 from it
    pre = pre_plan.select(
        "l_returnflag",
        "_n",
        F.col("_br")[0].alias("lo0"), F.col("_br")[1].alias("hi0"),
        F.col("_br")[2].alias("lo1"), F.col("_br")[3].alias("hi1"),
    ).localCheckpoint()
    pre.count()

    def scan2():
        j = rows.join(F.broadcast(pre), "l_returnflag")
        in_any = (
            (F.col("l_extendedprice") >= F.col("lo0")) & (F.col("l_extendedprice") <= F.col("hi0"))
        ) | (
            (F.col("l_extendedprice") >= F.col("lo1")) & (F.col("l_extendedprice") <= F.col("hi1"))
        )
        noop(
            j.groupBy("l_returnflag").agg(
                F.sum((F.col("l_extendedprice") < F.col("lo0")).cast("long")).alias("b0"),
                F.sum((F.col("l_extendedprice") < F.col("lo1")).cast("long")).alias("b1"),
                F.array_sort(
                    F.collect_list(F.when(in_any, F.col("l_extendedprice")))
                ).alias("pool"),
            )
        )

    t("scan2 (join pre + audit agg + pool) from cached pre", scan2)
    t("empty job overhead (noop 1-row)", lambda: noop(spark.range(1)))
    t("localCheckpoint of 3-row agg", lambda: pre_plan.localCheckpoint().count(), n=2)

    # cached-rows variant: does sharing the scan help?
    rows_cp = rows.localCheckpoint()
    rows_cp.count()
    t("scan1 from cached rows", lambda: noop(
        rows_cp.groupBy("l_returnflag").agg(
            F.count("l_extendedprice").alias("_n"),
            F.expr(
                f"percentile_approx(l_extendedprice, array({', '.join(map(repr, bounds))}), {acc})"
            ).alias("_br"),
        )))

    print("=== ngram_jaccard stage metrics via UI API ===")
    from w4h_etl_container_spark.plans.textops import _shingle_sets, _jaccard_from_shingles

    d = read_table(spark, SF, "documents")
    keyed = _shingle_sets(parallelize_compute(d)).select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("sh"),
    )
    noop(_jaccard_from_shingles(keyed))  # warm

    t("full jaccard (spread=True)", lambda: noop(_jaccard_from_shingles(keyed)))
    t("full jaccard (spread=False)", lambda: noop(_jaccard_from_shingles(keyed, spread=False)))

    # doc count / shingle count facts
    print("documents rows:", d.count())
    print("shingle occurrences:", keyed.count())
    print("distinct shingles:", keyed.select("sh").distinct().count())

    spark.stop()


if __name__ == "__main__":
    main()
