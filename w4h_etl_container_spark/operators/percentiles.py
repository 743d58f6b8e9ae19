"""Exact percentiles without unbounded buffers (SURVEY §2.4 AGG-6 at
100 TB).

``percentile(x, q)`` is exact but buffers EVERY value of a group in one
aggregator — the one plan shape in the declared surface that cannot
bound memory at corpus scale. ``percentile_approx`` bounds memory but
is only exact while accuracy exceeds the group size. This module closes
the gap: a two-pass plan that returns the bit-exact continuous
(type-7 / linear-interpolation) percentile — the same number
``percentile`` and DuckDB ``quantile_cont`` produce — while no operator
ever holds more than ~6·n/accuracy values of a group.

Pass 1 (one scan): per group, the row count and a Greenwald-Khanna
bracket — ``percentile_approx`` at ``[q - 3ε, q + 3ε]`` (ε = 1/accuracy)
whose rank-error guarantee (±εn) makes the bracket provably enclose the
target ranks ⌊r⌋ and ⌈r⌉, r = 1 + (n-1)·q. Pass 2 (one scan + a tiny
sort): count values strictly below the bracket, window-sort ONLY the
in-bracket rows (expected ~6εn per group — bounded by the accuracy
knob, not the group), read the two ranked values, interpolate.

Exactness is audited, not assumed (the ``deterministic_topk_per_group_
refined`` pattern): a group whose bracket demonstrably missed a target
rank — possible only if the sketch under-delivered its guarantee —
falls back to its full row set for the sort. The audit tables are
per-group aggregates: broadcast-sized at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentile_refined(
    df: DataFrame,
    value: str,
    group: str,
    q: float,
    accuracy: int = 10_000,
) -> DataFrame:
    """(group, p) — the exact continuous percentile ``q`` of ``value``
    per group, computed with bounded per-group state (module docstring).

    Equal to ``F.expr(f"percentile({value}, {q})")`` bit-for-bit: the
    final interpolation runs on exact ranked values; the sketch only
    narrows where the sort looks."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    eps = 1.0 / accuracy
    qlo, qhi = max(0.0, q - 3 * eps), min(1.0, q + 3 * eps)
    rows = df.where(F.col(value).isNotNull()).select(group, value)

    pre = (
        rows.groupBy(group)
        .agg(
            F.count(value).alias("_n"),
            F.expr(
                f"percentile_approx({value}, array({qlo!r}, {qhi!r}), {accuracy})"
            ).alias("_br"),
        )
        .select(
            group,
            "_n",
            F.col("_br")[0].alias("_lo"),
            F.col("_br")[1].alias("_hi"),
            # 0-based position, the EXACT arithmetic shape of Spark's
            # `percentile` (and DuckDB quantile_cont): (n-1)·q, floored
            # for the lower index, the fraction as the interpolation
            # weight. A 1-based rendering (1 + (n-1)q) rounds
            # differently in float and diverges by an ULP.
            ((F.col("_n") - 1) * F.lit(q)).alias("_pos"),
        )
        .withColumn("_kf", F.floor("_pos").cast("long") + 1)
        .withColumn("_kc", F.ceil("_pos").cast("long") + 1)
        # One row per group — materialize it. The bracket feeds FOUR
        # subtrees (audit counts, in-bracket filter, rescue, rank
        # targets); re-evaluating the GK sketch per subtree would let
        # the audit validate a DIFFERENT bracket than the one the pool
        # was filtered by (sketch merge order follows shuffle-fetch
        # order), voiding the exactness proof. A checkpointed bracket
        # is one broadcast-sized fact every consumer agrees on.
        .localCheckpoint()
    )

    j = rows.join(F.broadcast(pre), group)
    audit = (
        j.groupBy(group)
        .agg(
            F.sum((F.col(value) < F.col("_lo")).cast("long")).alias("_below"),
            F.sum(
                ((F.col(value) >= F.col("_lo")) & (F.col(value) <= F.col("_hi"))).cast(
                    "long"
                )
            ).alias("_in"),
        )
        .join(pre.select(group, "_kf", "_kc"), group)
    )
    # bracket provably contains ranks kf..kc ⇔ below < kf and below+in ≥ kc
    ok = audit.where(
        (F.col("_below") < F.col("_kf"))
        & (F.col("_below") + F.col("_in") >= F.col("_kc"))
    ).select(group, "_below")
    rescued = audit.join(ok, group, "left_anti").select(
        group, F.lit(0).cast("long").alias("_below")
    )

    in_bracket = j.where(
        (F.col(value) >= F.col("_lo")) & (F.col(value) <= F.col("_hi"))
    ).select(group, value)
    full = rows.join(F.broadcast(rescued.select(group)), group, "left_semi").select(
        group, value
    )
    pool = in_bracket.join(
        F.broadcast(rescued.select(group)), group, "left_anti"
    ).unionByName(full)

    w = Window.partitionBy(group).orderBy(value)
    ranked = (
        pool.join(F.broadcast(ok.unionByName(rescued)), group)
        .withColumn("_rank", F.row_number().over(w) + F.col("_below"))
        .join(F.broadcast(pre.select(group, "_pos", "_kf", "_kc")), group)
        .where((F.col("_rank") == F.col("_kf")) | (F.col("_rank") == F.col("_kc")))
    )
    return (
        ranked.groupBy(group, "_pos", "_kf", "_kc")
        .agg(
            F.min(F.when(F.col("_rank") == F.col("_kf"), F.col(value))).alias("_vf"),
            F.min(F.when(F.col("_rank") == F.col("_kc"), F.col(value))).alias("_vc"),
        )
        .select(
            group,
            # Spark's Percentile.getPercentile arithmetic, token for
            # token: (higher − pos)·lower_val + (pos − lower)·higher_val
            # when the position is fractional, else the exact value —
            # any algebraically-equal rearrangement rounds differently
            # in float and costs an ULP against the oracle.
            F.when(F.col("_kf") == F.col("_kc"), F.col("_vf"))
            .otherwise(
                (F.ceil("_pos").cast("double") - F.col("_pos")) * F.col("_vf")
                + (F.col("_pos") - F.floor("_pos").cast("double")) * F.col("_vc")
            )
            .alias("p"),
        )
    )
