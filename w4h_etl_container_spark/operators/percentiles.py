"""Exact percentiles without unbounded buffers (SURVEY §2.4 AGG-6 at
100 TB).

``percentile(x, q)`` is exact but buffers EVERY value of a group in one
aggregator — the one plan shape in the declared surface that cannot
bound memory at corpus scale. ``percentile_approx`` bounds memory but
is only exact while accuracy exceeds the group size. This module closes
the gap: a two-scan plan that returns the bit-exact continuous
(type-7 / linear-interpolation) percentile — the same number
``percentile`` and DuckDB ``quantile_cont`` produce — while no operator
ever holds more than ~6·n/accuracy values of a group.

Scan 1: per group, the row count and a Greenwald-Khanna bracket —
``percentile_approx`` at ``[q - 3ε, q + 3ε]`` (ε = 1/accuracy) whose
rank-error guarantee (±εn) makes the bracket provably enclose the
target ranks ⌊r⌋ and ⌈r⌉, r = 1 + (n-1)·q. Scan 2 (ONE aggregation):
per group, count values strictly below each bracket, count values
inside it, and ``collect_list`` only the in-bracket values — a buffer
bounded at ~6εn per quantile by the sketch guarantee, not by the group.
The final step is per-group array arithmetic on that bounded row:
``array_sort`` the bracket pool, index the two target ranks directly
(rank − below), interpolate. No window, no extra shuffle — the sort is
an O(εn·log εn) kernel on an already-bounded array.

Multiple quantiles share the whole plan: ONE GK sketch per group emits
every bracket, and the shared scan-2 aggregation carries per-quantile
below/in counts plus the union-of-brackets pool. A k-quantile report
costs exactly the same two data scans as one quantile.

Exactness is audited, not assumed (the ``deterministic_topk_per_group_
refined`` pattern): a group whose bracket demonstrably missed a target
rank — possible only if the sketch under-delivered its guarantee —
falls back to its full row set. The audit rides the checkpointed
per-group aggregate (one bounded row per group), so the common path
never re-scans the data: the rescue subtree is attached only when the
audit actually finds a failed group (a driver-side count over the
materialized aggregate — the same adaptive-plan pattern as
``operators.components``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: At or under this many groups the scan-2 bracket bounds inline as
#: literal map lookups (no join in the hot stage — a BroadcastHashJoin
#: probe costs more than the aggregation it feeds); above it, the
#: broadcast-join path keeps group cardinality off the driver.
_INLINE_GROUP_CAP = 256


def exact_percentile_refined(
    df: DataFrame,
    value: str,
    group: str,
    q: float | Sequence[float],
    accuracy: int = 10_000,
    extra_aggs: Sequence[Column] | None = None,
    disc: bool = False,
    _force_rescue: bool = False,
) -> DataFrame:
    """(group, p) — the exact continuous percentile(s) ``q`` of ``value``
    per group, computed with bounded per-group state (module docstring).

    ``q`` may be one quantile (``p`` is a double, the historical
    signature) or a sequence (``p`` is an array of doubles in ``q``'s
    order, sharing both scans across all quantiles — the shape a real
    percentile report wants). ``extra_aggs`` are additional aggregate
    columns evaluated in the scan-2 aggregation (over the non-null
    ``value`` rows) and carried to the output — lets a caller fold e.g.
    a ``percentile_approx`` sketch into the same scan instead of paying
    a third one. ``disc=True`` additionally returns ``p_disc`` — the
    DISCRETE percentile (DuckDB ``quantile_disc``: the element at rank
    max(1, ⌈q·n⌉)) read from the SAME bracket pool: that rank provably
    lies in [kf, kc] (⌈q·n⌉ ≥ ⌊(n−1)q⌋+1 and ≤ ⌈(n−1)q⌉+1 for q ∈
    [0,1]), the disc ranks are added to the audit, and no extra sketch
    or scan is paid. Exact at ANY scale — unlike a
    ``percentile_approx``-as-disc rendering, which is only exact while
    accuracy exceeds the group size.

    Equal to ``F.expr(f"percentile({value}, {q})")`` bit-for-bit: the
    final interpolation runs on exact ranked values; the sketch only
    narrows where the sort looks."""
    scalar = not isinstance(q, Sequence)
    qs = [q] if scalar else list(q)
    if not qs:
        raise ValueError("need at least one quantile")
    for qi in qs:
        if not 0.0 <= qi <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {qi}")
    k = len(qs)
    extras = list(extra_aggs or [])
    extra_names = [df.select(e).columns[0] for e in extras] if extras else []
    eps = 1.0 / accuracy
    bounds = []
    for qi in qs:
        bounds += [max(0.0, qi - 3 * eps), min(1.0, qi + 3 * eps)]
    rows = df.where(F.col(value).isNotNull()).select(group, value)

    pre = (
        rows.groupBy(group)
        .agg(
            F.count(value).alias("_n"),
            # ONE sketch per group serves every quantile's bracket.
            F.expr(
                f"percentile_approx({value}, array({', '.join(repr(b) for b in bounds)}), {accuracy})"
            ).alias("_br"),
        )
        .select(
            group,
            "_n",
            # Effective brackets. The ±3ε quantile margin only spans
            # ranks once εn ≥ 1: for n > accuracy, 3εn ≥ 3 ranks covers
            # both the GK error (±εn) and the ≤1-rank gap between the
            # sketch's q·n rank convention and percentile's (n−1)·q.
            # For n ≤ accuracy a sub-rank margin can miss the target by
            # that convention gap, so small groups take the exact
            # full-pool path instead — bracket widened to ±∞, pool = the
            # whole group, which is bounded by `accuracy` by definition
            # (the same knob that bounds the large-group pool at ~6εn).
            F.array(
                *[
                    F.when(F.col("_n") <= accuracy, F.lit(float("-inf")))
                    .otherwise(F.col("_br")[2 * i])
                    for i in range(k)
                ]
            ).alias("_los"),
            F.array(
                *[
                    F.when(F.col("_n") <= accuracy, F.lit(float("inf")))
                    .otherwise(F.col("_br")[2 * i + 1])
                    for i in range(k)
                ]
            ).alias("_his"),
            # 0-based positions, the EXACT arithmetic shape of Spark's
            # `percentile` (and DuckDB quantile_cont): (n-1)·q, floored
            # for the lower index, the fraction as the interpolation
            # weight. A 1-based rendering (1 + (n-1)q) rounds
            # differently in float and diverges by an ULP.
            F.array(*[((F.col("_n") - 1) * F.lit(qi)) for qi in qs]).alias("_poss"),
        )
        .withColumn("_kfs", F.transform("_poss", lambda p: F.floor(p).cast("long") + 1))
        .withColumn("_kcs", F.transform("_poss", lambda p: F.ceil(p).cast("long") + 1))
    )

    # The sketch result is tiny (one row per group) but NONDETERMINISTIC
    # (GK merge order follows shuffle-fetch order) — materialize it
    # once so every consumer (the hot scan's scalar brackets, the
    # post-aggregation metadata join, the rescue arm) reads the SAME
    # evaluation. Without this, two references could see two different
    # bracket sets and the audit counts would disagree with the pool.
    pre = pre.localCheckpoint()

    # Scan 2 — audit counts AND the bounded bracket pool in one
    # aggregation. How the per-row expressions obtain their group's
    # bracket bounds is COUNT-GATED (round-12 rework, measured in the
    # 100× crossover bench): a BroadcastHashJoin probe costs ~70 ns/row
    # INSIDE whole-stage codegen (string hash + relation lookup +
    # joined-row copy) — 5 s of the 8.6 s wall at 60 M rows, ~4× the
    # aggregation itself. At or under the gate the brackets inline as
    # LITERAL MAP lookups (group → bound; GetMapValue over ≤ _INLINE
    # entries is a few ns), so the hot stage is scan → agg with NO join
    # at all; above the gate the broadcast join path remains (group
    # cardinality never bounds driver memory). Either way the array
    # metadata (_n/_los/_his/_poss/_kfs/_kcs) attaches AFTER the
    # aggregation, where the row count is #groups, not #rows.
    n_groups = pre.count()
    if n_groups <= _INLINE_GROUP_CAP:
        brows = pre.select(group, "_los", "_his").collect()
        in_src = rows

        def _bound(which: str, i: int) -> Column:
            m = F.create_map(
                *[
                    x
                    for r in brows
                    for x in (F.lit(r[group]), F.lit(float(r[which][i])))
                ]
            )
            return m[F.col(group)]

        lo = lambda i: _bound("_los", i)  # noqa: E731
        hi = lambda i: _bound("_his", i)  # noqa: E731
    else:
        pre_flat = pre.select(
            group,
            *[F.col("_los")[i].alias(f"_lo_{i}") for i in range(k)],
            *[F.col("_his")[i].alias(f"_hi_{i}") for i in range(k)],
        )
        in_src = rows.join(F.broadcast(pre_flat), group)
        lo = lambda i: F.col(f"_lo_{i}")  # noqa: E731
        hi = lambda i: F.col(f"_hi_{i}")  # noqa: E731
    in_any = F.lit(False)
    for i in range(k):
        in_any = in_any | ((F.col(value) >= lo(i)) & (F.col(value) <= hi(i)))
    aggs = []
    for i in range(k):
        aggs.append(
            F.count(F.when(F.col(value) < lo(i), 1)).alias(f"_below_{i}")
        )
        aggs.append(
            F.count(
                F.when((F.col(value) >= lo(i)) & (F.col(value) <= hi(i)), 1)
            ).alias(f"_in_{i}")
        )
    aggs.append(
        F.array_sort(F.collect_list(F.when(in_any, F.col(value)))).alias("_pool")
    )
    aggs += extras
    # One bounded row per group (pool ≤ k·6εn values) — materialize it:
    # the audit verdict and the result read the SAME aggregate, and the
    # rescue decision below needs a cheap count over it.
    g2 = (
        in_src.groupBy(group)
        .agg(*aggs)
        .join(
            F.broadcast(
                pre.select(group, "_n", "_los", "_his", "_poss", "_kfs", "_kcs")
            ),
            group,
        )
        .localCheckpoint()
    )

    # bracket i provably contains its ranks kf..kc
    #   ⇔ below_i < kf_i and below_i + in_i ≥ kc_i
    def disc_rank(i: int, n: Column) -> Column:
        # DuckDB quantile_disc's rank rule, same double arithmetic:
        # max(1, ceil(q·n)) — verified against DuckDB across boundary
        # cases (q·n exactly integral, n=1, q=0/1).
        return F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(qs[i]) * n))

    ok_pred = F.lit(True)
    for i in range(k):
        ok_pred = (
            ok_pred
            & (F.col(f"_below_{i}") < F.col("_kfs")[i])
            & (F.col(f"_below_{i}") + F.col(f"_in_{i}") >= F.col("_kcs")[i])
        )
        if disc:
            rd = disc_rank(i, F.col("_n"))
            ok_pred = (
                ok_pred
                & (F.col(f"_below_{i}") < rd)
                & (F.col(f"_below_{i}") + F.col(f"_in_{i}") >= rd)
            )
    if _force_rescue:  # test hook: exercise the fallback machinery
        ok_pred = F.lit(False)

    def interp(i: int, pool: Column, below: Column, n: Column):
        """Rank the targets inside the sorted per-bracket pool. The
        continuous interpolation is Spark's Percentile.getPercentile
        arithmetic, token for token: (higher − pos)·lower_val +
        (pos − lower)·higher_val when the position is fractional, else
        the exact value — any algebraically-equal rearrangement rounds
        differently in float and costs an ULP against the oracle. The
        discrete value is a plain element_at on the disc rank."""
        pos = F.col("_poss")[i]
        kf, kc = F.col("_kfs")[i], F.col("_kcs")[i]
        srt = F.array_sort(
            F.filter(
                pool,
                lambda v: (v >= F.col("_los")[i]) & (v <= F.col("_his")[i]),
            )
        )
        vf = F.element_at(srt, (kf - below).cast("int"))
        vc = F.element_at(srt, (kc - below).cast("int"))
        cont = F.when(kf == kc, vf).otherwise(
            (F.ceil(pos).cast("double") - pos) * vf
            + (pos - F.floor(pos).cast("double")) * vc
        )
        if not disc:
            return cont, None
        vd = F.element_at(srt, (disc_rank(i, n) - below).cast("int"))
        return cont, vd

    def finish(src: DataFrame, pool: Column, belows: list[Column], n: Column) -> DataFrame:
        pairs = [interp(i, pool, belows[i], n) for i in range(k)]
        out = [group, F.array(*[c for c, _ in pairs]).alias("_ps")]
        if disc:
            out.append(F.array(*[d for _, d in pairs]).alias("_pds"))
        return src.select(*(out + extra_names))

    main = finish(
        g2.where(ok_pred),
        F.col("_pool"),
        [F.col(f"_below_{i}") for i in range(k)],
        F.col("_n"),
    )

    # Rescue: only if some group's sketch under-delivered its rank
    # guarantee. g2 is checkpointed, so this count is a scan of tiny
    # per-group rows — and when it's zero (the overwhelmingly common
    # case) the result plan contains NO second look at the data.
    bad = g2.where(~ok_pred)
    if bad.limit(1).count() > 0:
        full = (
            rows.join(
                F.broadcast(bad.select(group, "_poss", "_kfs", "_kcs", *extra_names)),
                group,
            )
            .groupBy(group)
            .agg(
                F.array_sort(F.collect_list(F.col(value))).alias("_all"),
                F.count(F.col(value)).alias("_n"),
                F.first("_poss").alias("_poss"),
                F.first("_kfs").alias("_kfs"),
                F.first("_kcs").alias("_kcs"),
                # full-pool fallback: every value qualifies for every
                # bracket, so widen the bracket bounds to the pool
                F.min(F.col(value)).alias("_mn"),
                F.max(F.col(value)).alias("_mx"),
                *[F.first(n).alias(n) for n in extra_names],
            )
            .withColumn("_los", F.array_repeat(F.col("_mn"), k))
            .withColumn("_his", F.array_repeat(F.col("_mx"), k))
        )
        rescue = finish(
            full, F.col("_all"), [F.lit(0).cast("long")] * k, F.col("_n")
        )
        main = main.unionByName(rescue)

    pd_cols = []
    if disc:
        pd_cols = [
            (F.col("_pds")[0] if scalar else F.col("_pds")).alias("p_disc")
        ]
    if scalar:
        return main.select(
            group, F.col("_ps")[0].alias("p"), *pd_cols, *extra_names
        )
    return main.select(group, F.col("_ps").alias("p"), *pd_cols, *extra_names)
