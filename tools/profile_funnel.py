"""Round-13 q_funnel profile at 100x (60 M events): decompose the wall
into (scan+shuffle+collect_list), (+array_sort), (+aggregate walk), and
race the min-join-chain alternative (the oracle's own shape rendered in
DataFrame ops with exchange reuse) against the packed-long automaton.

Usage: python tools/profile_funnel.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.analytics import FUNNEL_STEPS, q_funnel
from w4h_etl_container_spark.session import get_spark, read_events

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench100x_corpus"


def timeit(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main():
    spark = get_spark("profile-funnel")

    ev = read_events(spark, SF).where(
        F.col("event_type").isin(*FUNNEL_STEPS) & F.col("user_id").isNotNull()
    )
    idx = F.when(F.col("event_type") == FUNNEL_STEPS[0], F.lit(0))
    for i, s in enumerate(FUNNEL_STEPS[1:], 1):
        idx = idx.when(F.col("event_type") == s, F.lit(i))
    enc = (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(4) + idx).cast("long")

    # --- stage decomposition of the current shape -------------------
    timeit("scan+filter only", lambda: ev.select("user_id").foreach(lambda r: None))
    timeit(
        "collect_list (no sort, no walk)",
        lambda: ev.groupBy("user_id")
        .agg(F.collect_list(enc).alias("evs"))
        .select(F.size("evs"))
        .foreach(lambda r: None),
    )
    timeit(
        "collect_list+sort (no walk)",
        lambda: ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(enc)).alias("evs"))
        .select(F.size("evs"))
        .foreach(lambda r: None),
    )
    timeit("full q_funnel (current)", lambda: q_funnel(spark, SF).foreach(lambda r: None))

    # --- alternative: min-join chain (oracle shape) ------------------
    def chain():
        e = ev.select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
        cur = (
            e.where(F.col("event_type") == FUNNEL_STEPS[0])
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts = [cur.count()]
        for s in FUNNEL_STEPS[1:]:
            cur = (
                e.where(F.col("event_type") == s)
                .join(cur, "user_id")
                .where(F.col("ts") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
            counts.append(cur.count())
        return counts

    timeit("min-join chain (4 actions)", chain)

    # --- alternative: per-step min-array walk (one shuffle, no lambda) --
    # collect per-step sorted arrays then chain with filter+element_at
    def per_step_arrays():
        aggs = [
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type") == s,
                        F.unix_micros(F.col("ts").cast("timestamp")),
                    )
                )
            ).alias(f"a{i}")
            for i, s in enumerate(FUNNEL_STEPS)
        ]
        g = ev.groupBy("user_id").agg(*aggs)
        t = F.element_at("a0", 1)
        k = F.when(t.isNotNull(), F.lit(1)).otherwise(F.lit(0))
        for i in range(1, len(FUNNEL_STEPS)):
            nxt = F.element_at(F.filter(f"a{i}", lambda x, tt=t: x > tt), 1)
            k = F.when(nxt.isNotNull(), F.lit(i + 1)).otherwise(k)
            t = nxt
        g.select(k.alias("k")).groupBy().agg(
            *[F.sum((F.col("k") >= i + 1).cast("long")).alias(f"n{i+1}")
              for i in range(len(FUNNEL_STEPS))]
        ).foreach(lambda r: None)

    timeit("per-step arrays + filter walk", per_step_arrays)


if __name__ == "__main__":
    main()
