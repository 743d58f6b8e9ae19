"""Event-sequence analytics over ``events`` (SURVEY.md §2.11 extension
surface) — ordered-funnel matching and cohort retention, the two
classic product-analytics operators every event warehouse ships
(Mixpanel/Amplitude funnels; the cohort-week × age retention triangle).

Both are declared library queries with full DuckDB hash oracles: every
compared cell is an integer, a timestamp, or a date — no float crosses
the engine boundary.

Reference scope note: the reference pipeline (main.py) has no event
analytics; these extend the engine the same way the corpus/vector
operators do (BASELINE.json extension mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_events, read_table

# The funnel definition: ordered steps a user must hit with strictly
# increasing timestamps (a purchase BEFORE the signup does not count —
# pinned in tests). The fixture's event_type domain is
# {signup, view, click, purchase, error}.
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def _funnel_sql() -> str:
    steps = FUNNEL_STEPS
    # user_id IS NOT NULL on both sides: a NULL user can never join
    # through the oracle's USING chain, so the Spark side must not
    # funnel-match one either (fixtures have no null users; hostile
    # inputs must not diverge silently)
    ctes = [
        f"""s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{steps[0]}' AND user_id IS NOT NULL
      GROUP BY user_id
    )"""
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"""s{i + 1} AS (
      SELECT e.user_id, min(e.ts) AS t{i + 1}
      FROM events e JOIN s{i} USING (user_id)
      WHERE e.event_type = '{steps[i]}' AND e.ts > s{i}.t{i}
      GROUP BY e.user_id
    )"""
        )
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT {i + 1} AS step, '{s}' AS step_name, "
        f"(SELECT COUNT(*) FROM s{i + 1}) AS n_users"
        for i, s in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)}\n    {unions}"


@register(
    "q_funnel",
    sql=_funnel_sql(),
    survey_ids=("EXT-EVENTS",),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over events: how many users progressed through
    signup → view → click → purchase with STRICTLY increasing event
    times (each step's match is the earliest occurrence after the
    previous step's match — the standard greedy funnel semantics, which
    is optimal: matching the earliest possible occurrence at every step
    maximizes the number of later steps that can still match).

    Spark shape (round-16 rework): ONE groupBy(user_id) with
    STEP-ASYMMETRIC aggregation buffers. The greedy walk's endpoints
    admit bounded summaries even though its middle does not: the first
    step needs only ``min(S1)`` (t1 is the earliest signup,
    unconditionally) and the LAST step needs only ``max(S4)`` (step 4
    completes iff ∃t∈S4: t > t3 ⇔ max(S4) > t3) — both are true
    map-side partial aggregates, so every step-1/step-4 event
    collapses to one long per user per map partition before the
    exchange. Only the middle steps collect full timestamp lists
    (information-theoretically required: any step-2 timestamp can be
    the successor of some t1 by adversarial choice of the other
    partition's step-1 events — there is no bounded mergeable summary
    for them). The walk is then pure array math on UNSORTED lists:
    ``t2 = array_min(filter(a2, x > t1))`` (the earliest step-2 event
    strictly after t1 IS the min of the filtered set — no sort
    needed), likewise t3, then ``max4 > t3``. Null propagation does
    the failure bookkeeping: a user missing step i has
    ``t_i = NULL``, every later comparison is NULL, and the final
    1-row aggregate counts non-nulls per step, unpivoted with
    ``stack``. Total: one shuffle on user_id + one 1-row aggregate.
    The oracle spells the same walk as a chain of per-step min joins.
    (The r12–r15 shape — one sorted packed-long array walked by an
    ``aggregate()`` automaton — was raced against this at the 100×
    and 1000× tiers and loses ~5%: it ships all four steps' events
    through the exchange and pays an O(n log n) per-user sort this
    shape never does.)

    The NTZ→timestamp cast is exact under the engine's fixed UTC
    session zone (session.py pins it), so ``unix_micros`` is strictly
    monotone in event time and strict ``>`` on micros matches the
    oracle's strict ``>`` on timestamps.

    Scale: at 10^10 users this is one hash aggregate on an even key
    (user_id) with map-side partials on every buffer; no window, no
    self-join, no per-step pass over the corpus (the naive rendering
    is k sequential corpus joins — raced slower, PERF.md). The 100×
    ratio vs DuckDB is SCAN-FLOOR-BOUND, not plan-bound: at 100×
    volume the bare scan+filter+count of events costs 0.43 s against
    DuckDB's 0.33 s for the ENTIRE funnel, so no aggregation strategy
    can reach 2× there; the honest scale evidence is the 1000×
    crossover (BENCH_10X r15: 1.86 and falling)."""
    n = len(FUNNEL_STEPS)
    assert n == 4, "the step-asymmetric buffers below are written for 4 steps"
    ev = read_events(spark, sf_dir).where(
        F.col("event_type").isin(*FUNNEL_STEPS) & F.col("user_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    step_ts = [F.when(F.col("event_type") == s, us) for s in FUNNEL_STEPS]
    g = ev.groupBy("user_id").agg(
        F.min(step_ts[0]).alias("t1"),
        F.collect_list(step_ts[1]).alias("a2"),
        F.collect_list(step_ts[2]).alias("a3"),
        F.max(step_ts[3]).alias("m4"),
    )
    t2 = F.array_min(F.filter("a2", lambda x: x > F.col("t1")))
    t3 = F.array_min(F.filter("a3", lambda x: x > F.col("t2")))
    per = g.select("t1", t2.alias("t2"), "a3", "m4").select(
        "t1", "t2", t3.alias("t3"), "m4"
    )
    totals = per.agg(
        F.sum(F.col("t1").isNotNull().cast("long")).alias("n1"),
        F.sum(F.col("t2").isNotNull().cast("long")).alias("n2"),
        F.sum(F.col("t3").isNotNull().cast("long")).alias("n3"),
        F.sum((F.col("m4") > F.col("t3")).cast("long")).alias("n4"),
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', n{i + 1}" for i, s in enumerate(FUNNEL_STEPS)
    )
    return totals.selectExpr(
        f"stack({n}, {stack_args}) AS (step, step_name, n_users)"
    )


@register(
    "q_cohort_retention",
    sql="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7
                  AS INTEGER) AS age_weeks,
             e.user_id
      FROM events e JOIN first_seen f USING (user_id)
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_n FROM first_seen GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.age_weeks,
           COUNT(*) AS n_active,
           s.cohort_n,
           (COUNT(*) * 10000) // s.cohort_n AS retention_bp
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.age_weeks, s.cohort_n
    """,
    survey_ids=("EXT-EVENTS",),
    gate=False,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen ISO week,
    tracked by how many distinct users from each cohort were active
    ``age_weeks`` weeks later, with retention in exact basis points
    (integer division — no float crosses the engine boundary).

    Both engines truncate to Monday-start ISO weeks (Spark
    ``date_trunc('week')`` and DuckDB agree), so the day difference is
    always a multiple of 7 and the integer division is exact.

    Scale: one min-aggregate per user (map-side combined), one
    fact-side join on user_id (AQE-skew-safe even key), one DISTINCT
    bounded by users × weeks, one tiny cohort-size broadcast. No
    windows, no per-week passes."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("age_weeks"),
            "user_id",
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    return (
        activity.groupBy("cohort_week", "age_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_active",
            "cohort_n",
            F.expr("n_active * 10000 div cohort_n").alias("retention_bp"),
        )
    )


# ---------------------------------------------------------------------------
# PRJ/AGG extension — pivot (long→wide): the per-entity feature-vector
# shape every BI layer and feature store emits
# ---------------------------------------------------------------------------
PIVOT_TYPES = ("signup", "view", "click", "purchase", "error")


@register(
    "q_pivot",
    sql=f"""
    SELECT user_id,
           {", ".join(
               f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in PIVOT_TYPES
           )},
           {", ".join(
               "CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = '"
               + t
               + "') AS DOUBLE) AS v_"
               + t
               for t in ("purchase", "error")
           )}
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
    """,
    survey_ids=("PRJ-5", "AGG-1"),
    gate=False,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: one row per user, a count column per event type
    and a decimal-exact value sum for the value-bearing types — the
    per-entity feature vector (the closest legitimate analog of the
    reference's PRJ-5 transpose in a relational engine: axes swap, but
    over a DECLARED, bounded category domain).

    The pivot values are declared literals (``PIVOT_TYPES``) in BOTH
    engines — an inferred pivot (Spark's ``pivot(col)`` without values)
    launches a distinct-scan job and makes the output schema
    data-dependent, which breaks plan caching and the oracle's fixed
    schema; at 100 TB you always know your category domain.

    Scale: ONE hash aggregate with map-side partials — conditional
    aggregation never widens the exchange (5+2 cells per user), and no
    second job for value inference."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    counts = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in PIVOT_TYPES
    ]
    sums = [
        F.sum(
            F.when(F.col("event_type") == t, F.col("value").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias(f"v_{t}")
        for t in ("purchase", "error")
    ]
    return ev.groupBy("user_id").agg(*counts, *sums)


# ---------------------------------------------------------------------------
# PRJ-6/WIN extension — resample to a dense hourly grid + forward fill
# (the xarray reindex+ffill shape on relational rails: sensors and
# telemetry never arrive on clean grids; training features need them)
# ---------------------------------------------------------------------------
@register(
    "q_gapfill",
    sql="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, max(value) AS v_obs
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
      SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    )
    SELECT g.user_id, g.hr, o.v_obs,
           last_value(o.v_obs IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           (o.v_obs IS NULL) AS is_filled
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
    """,
    survey_ids=("PRJ-6", "WIN-3"),
    gate=False,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample + forward fill per user: every user gets a
    gap-free hour grid spanning their own [first, last] observation,
    observed hours carry their (max) value, missing hours inherit the
    most recent earlier value — the reference's align/reindex (PRJ-6)
    composed with xarray-style ``ffill``, on relational rails.

    Scale: the grid explode is bounded by each user's own time span
    (``sequence`` is a per-row expression — no driver-side calendar
    table, no cross join against a global grid); the fill is ONE
    running window per user over the already-shuffled grid — the same
    single-shuffle discipline as q_win_funcs. At 100 TB the grid join
    co-partitions with the observation aggregate (same key), so AQE
    plans it shuffle-free on the grid side."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.max("value").alias("v_obs"))
    bounds = obs.groupBy("user_id").agg(
        F.min("hr").alias("mn"), F.max("hr").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = grid.join(obs, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hr",
        "v_obs",
        F.last("v_obs", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_obs").isNull().alias("is_filled"),
    )


# ---------------------------------------------------------------------------
# AGG extension — equi-width histogram + exact-integer correlation (the
# distribution/diagnostic aggregates a feature pipeline logs per batch)
# ---------------------------------------------------------------------------
HIST_LO, HIST_HI, HIST_NB = 0.0, 500.0, 20


@register(
    "q_histogram",
    sql=f"""
    SELECT event_type,
           CAST(LEAST(GREATEST(FLOOR((value - {HIST_LO!r}) * {HIST_NB}
                                     / ({HIST_HI!r} - {HIST_LO!r})), 0),
                      {HIST_NB - 1}) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(FLOOR(min(value) * 1000000.0 + 0.5) AS BIGINT) AS lo_e6,
           CAST(FLOOR(max(value) * 1000000.0 + 0.5) AS BIGINT) AS hi_e6
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, 2
    """,
    survey_ids=("AGG-6",),
    gate=False,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``value`` per event type: 20 buckets over
    a declared [0, 500) domain, out-of-range values clamped to the edge
    buckets (the standard telemetry-histogram contract). The bucket
    index is the same floor expression in both engines (pure IEEE
    arithmetic on identical doubles — width_bucket is Spark-only, so
    the portable rendering IS the operator); per-bucket min/max are
    e6-exact.

    Scale: one map-side-combined aggregate on a (type × 20)-bounded key
    domain — the cheapest distribution diagnostic there is."""
    ev = read_events(spark, sf_dir).where(F.col("value").isNotNull())
    bucket = F.least(
        F.greatest(
            F.floor(
                (F.col("value") - F.lit(HIST_LO))
                * F.lit(HIST_NB)
                / (F.lit(HIST_HI) - F.lit(HIST_LO))
            ),
            F.lit(0),
        ),
        F.lit(HIST_NB - 1),
    ).cast("long")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.min("value") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("lo_e6"),
        F.floor(F.max("value") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("hi_e6"),
    )


@register(
    "q_corr",
    sql="""
    WITH q AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) AS x,
             CAST(hour(ts) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND abs(value) <= 500.0
    ), sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM q GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(FLOOR(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)
           ELSE NULL END AS corr_e6
    FROM sums
    """,
    survey_ids=("AGG-6", "SF-1"),
    gate=False,
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of value vs hour-of-day per event type, made
    ORDER-FREE: the inputs quantize to integers (value in e3
    milli-units, hour as-is), the five moment sums are exact integer
    aggregates (no float accumulation order anywhere), and the final
    correlation is a fixed-shape double expression over those exact
    integers — bit-equal across engines, e6-rounded for the compare.
    The native ``corr()`` aggregate would be the one-liner, but its
    running float accumulation is partition-order-dependent — exactly
    the nondeterminism a distributed diagnostic must not have.

    Scale: one map-side-combined aggregate. Quantization is e3, not
    e6, because the SQUARED sum must fit int64 under ANSI: with
    |value| ≤ 500, x_e3² ≤ 2.5e11, so Σx² stays in-range to ~37 M
    rows per group (e6 overflows at a few dozen rows — caught by the
    ANSI overflow check, not silently); beyond that, quantize coarser
    or widen the sums to DECIMAL(38,0). Pearson r is scale-invariant,
    so the e3/e6 choice only sets the quantization error floor. The
    [−500, 500] domain is ENFORCED as a filter in both engines (the
    emitted n makes exclusions auditable): an out-of-domain value
    would overflow Spark's int64 sum under ANSI while DuckDB's
    hugeint silently absorbs it — the hostile sweep caught exactly
    this divergence on a −1e9 probe value."""
    ev = read_events(spark, sf_dir).where(
        F.col("value").isNotNull() & (F.abs("value") <= F.lit(500.0))
    )
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    sums = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    # guard arithmetic in exact DECIMAL: n·sxx in int64 overflows
    # already at ~6k rows/group (the double rendering could flip a
    # tiny-variance group's >0 across engines); DECIMAL(38,0) holds the
    # full domain (n ≤ 3.7e7 → |n·sxx| ≤ 9e18·… < 1e38) exactly
    dn = F.col("n").cast("decimal(12,0)")
    varx = dn * F.col("sxx").cast("decimal(25,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sx").cast("decimal(19,0)")
    vary = dn * F.col("syy").cast("decimal(25,0)") - F.col("sy").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    # a zero-variance side has no defined correlation: NULL in both
    # engines (ANSI Spark would otherwise throw DIVIDE_BY_ZERO where
    # DuckDB floats through — hostile-sweep finding)
    return sums.select(
        "event_type",
        "n",
        F.when(
            (varx > 0) & (vary > 0),
            F.floor(num / den * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
        ).alias("corr_e6"),
    )


# ---------------------------------------------------------------------------
# AGG extension — robust outlier flags (median absolute deviation):
# the data-quality gate that mean/stddev z-scores can't provide, since
# outliers corrupt the very moments classic z-scores standardize by
# ---------------------------------------------------------------------------
_MAD_K = 3.0 * 1.4826  # 1.4826 ≈ 1/Φ⁻¹(3/4): MAD→σ under normality


@register(
    "q_outliers",
    sql=f"""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) AS x_e3
      FROM events WHERE value IS NOT NULL
    ), med AS (
      SELECT event_type, quantile_cont(x_e3, 0.5) AS m FROM q GROUP BY event_type
    ), dev AS (
      SELECT q.event_id, q.event_type, q.x_e3, med.m,
             abs(CAST(q.x_e3 AS DOUBLE) - med.m) AS d
      FROM q JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS md FROM dev GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type, dev.x_e3,
           CAST(FLOOR(dev.m * 1000.0 + 0.5) AS BIGINT) AS med_e6,
           CAST(FLOOR(mad.md * 1000.0 + 0.5) AS BIGINT) AS mad_e6,
           (dev.d > {_MAD_K!r} * mad.md) AS is_outlier
    FROM dev JOIN mad USING (event_type)
    """,
    survey_ids=("AGG-6", "SF-5"),
    gate=False,
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags per event type: |x − median| > 3·1.4826·MAD
    (the Hampel filter). Values quantize to e3 integers first, so both
    engines take order statistics over EXACT integers; the continuous-
    median interpolation is a half-sum of two ≤2⁵²-magnitude integers —
    exact in double, bit-equal across engines — and every comparison
    and emitted stat derives deterministically from those.

    Scale: two grouped percentiles over a 5-key domain + one broadcast
    join back. The in-group percentile buffer is the gate-documented
    exact path at this cardinality; corpus-scale groups swap in
    ``operators/percentiles.exact_percentile_refined`` (same contract,
    bounded state) for the same two calls."""
    ev = read_events(spark, sf_dir).where(F.col("value").isNotNull())
    q = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("x_e3"),
    )
    med = q.groupBy("event_type").agg(
        F.expr("percentile(x_e3, 0.5)").alias("m")
    )
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "x_e3",
        "m",
        F.abs(F.col("x_e3").cast("double") - F.col("m")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("md")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "x_e3",
        F.floor(F.col("m") * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("med_e6"),
        F.floor(F.col("md") * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("mad_e6"),
        (F.col("d") > F.lit(_MAD_K) * F.col("md")).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# EXT-EVENTS — behavioral sequence + value segmentation: the Markov
# transition matrix and RFM quintiles every product-analytics stack ships
# ---------------------------------------------------------------------------
@register(
    "q_transitions",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id IS NOT NULL
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), totals AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n,
           (p.n * 10000) // t.row_n AS p_bp
    FROM pairs p JOIN totals t USING (prev_type)
    """,
    survey_ids=("EXT-EVENTS", "WIN-3"),
    gate=False,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: count of (previous type → next type) adjacencies in
    (ts, event_id) order, with row-normalized probabilities in exact
    basis points. The behavioral fingerprint sequence models train on.

    Scale: one window (lag) on the user partition — the same single
    shuffle every per-user operator here pays — then a map-side-combined
    aggregate on the (types²)-bounded key domain; the row-total join is
    a broadcast of ≤ |types| rows."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 10000 div row_n").alias("p_bp"),
    )


@register(
    "q_rfm",
    sql="""
    WITH p AS (
      SELECT user_id,
             max(ts) AS last_purchase,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
      GROUP BY user_id
    ), horizon AS (
      SELECT max(ts) AS h FROM events
    ), base AS (
      SELECT user_id,
             CAST(date_diff('second', last_purchase, h) AS BIGINT) AS recency_s,
             frequency, monetary
      FROM p, horizon
    )
    , cuts AS (
      SELECT quantile_cont(CAST(recency_s AS DOUBLE), [0.2,0.4,0.6,0.8]) AS rc,
             quantile_cont(CAST(frequency AS DOUBLE), [0.2,0.4,0.6,0.8]) AS fc,
             quantile_cont(monetary, [0.2,0.4,0.6,0.8]) AS mc
      FROM base
    )
    SELECT user_id, recency_s, frequency, monetary,
           1 + CAST(CAST(recency_s AS DOUBLE) > rc[1] AS INT)
             + CAST(CAST(recency_s AS DOUBLE) > rc[2] AS INT)
             + CAST(CAST(recency_s AS DOUBLE) > rc[3] AS INT)
             + CAST(CAST(recency_s AS DOUBLE) > rc[4] AS INT) AS r_bucket,
           1 + CAST(CAST(frequency AS DOUBLE) > fc[1] AS INT)
             + CAST(CAST(frequency AS DOUBLE) > fc[2] AS INT)
             + CAST(CAST(frequency AS DOUBLE) > fc[3] AS INT)
             + CAST(CAST(frequency AS DOUBLE) > fc[4] AS INT) AS f_bucket,
           1 + CAST(monetary > mc[1] AS INT)
             + CAST(monetary > mc[2] AS INT)
             + CAST(monetary > mc[3] AS INT)
             + CAST(monetary > mc[4] AS INT) AS m_bucket
    FROM base, cuts
    """,
    survey_ids=("EXT-EVENTS", "WIN-3", "AGG-1"),
    gate=False,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, seconds since their last
    purchase (relative to the stream's own horizon — no wall clock, so
    the result is deterministic), purchase count, decimal-exact spend,
    and quintile buckets 1..5 per metric (5 = highest value of the
    metric; consumers map to RFM convention). Buckets come from
    QUANTILE CUTOFFS (the 20/40/60/80 percentiles) compared per row —
    NOT a global NTILE window: the engine keeps its no-unpartitioned-
    window discipline, ties at a cutoff share a bucket (quantile
    semantics, deterministic in both engines via the established
    percentile bit-parity), and the plan has no global sort anywhere.

    Scale: one aggregate per user, one 1-row horizon broadcast, one
    1-row cutoff aggregate broadcast back — every stage is
    embarrassingly parallel; a 10^10-user table pays two tiny scalar
    aggregates instead of a 10^10-row sort."""
    ev = read_events(spark, sf_dir)
    p = (
        ev.where((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("monetary"),
        )
    )
    horizon = ev.agg(F.max("ts").alias("h"))
    base = p.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        (F.unix_timestamp("h") - F.unix_timestamp("last_purchase"))
        .cast("long")
        .alias("recency_s"),
        "frequency",
        "monetary",
    )
    cuts = base.agg(
        F.expr("percentile(CAST(recency_s AS DOUBLE), array(0.2,0.4,0.6,0.8))").alias("rc"),
        F.expr("percentile(CAST(frequency AS DOUBLE), array(0.2,0.4,0.6,0.8))").alias("fc"),
        F.expr("percentile(monetary, array(0.2,0.4,0.6,0.8))").alias("mc"),
    )

    def bucket(metric, cutlist):
        b = F.lit(1)
        for i in range(4):
            b = b + (metric > F.element_at(F.col(cutlist), i + 1)).cast("int")
        return b

    return base.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_s",
        "frequency",
        "monetary",
        bucket(F.col("recency_s").cast("double"), "rc").alias("r_bucket"),
        bucket(F.col("frequency").cast("double"), "fc").alias("f_bucket"),
        bucket(F.col("monetary"), "mc").alias("m_bucket"),
    )


# ---------------------------------------------------------------------------
# EXT-BASKET — market-basket association pairs (support + lift)
# ---------------------------------------------------------------------------
ASSOC_MIN_SUPPORT = 5


def _assoc_sql() -> str:
    return f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
    supp AS (SELECT p_brand, COUNT(*) AS brand_cnt FROM baskets GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS pair_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, pair_cnt,
           sa.brand_cnt AS cnt_a, sb.brand_cnt AS cnt_b,
           (1000000 * (SELECT n_orders FROM n) * pair_cnt)
             // (sa.brand_cnt * sb.brand_cnt) AS lift_e6
    FROM pairs
    JOIN supp sa ON sa.p_brand = brand_a
    JOIN supp sb ON sb.p_brand = brand_b
    WHERE pair_cnt >= {ASSOC_MIN_SUPPORT}
    """


@register(
    "q_assoc_pairs",
    sql=_assoc_sql(),
    survey_ids=("EXT-BASKET", "JOIN-1"),
    gate=False,
)
def q_assoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the brand grain: for every
    brand pair co-occurring in ≥5 orders, its support count and lift
    ``N·supp(a,b) / (supp(a)·supp(b))`` in e6 integer units.

    Scale shape: the classic a-priori first rung. Baskets are the
    DISTINCT (order, brand) projection — one shuffle with map-side
    dedup, grain bounded by brands-per-order (≤25 here), never by
    lineitem fan-in. The pair join is a SELF-join on the basket's own
    order key: co-partitioned by construction (one exchange feeds both
    sides), and each order contributes C(brands,2) ≤ 300 pairs — the
    quadratic term is bounded per-key, so the join output stays linear
    in orders at any corpus size. Brand supports are a 25-row broadcast.
    Lift is computed entirely in BIGINT (e6 pre-scale, floor division)
    so the cross-engine contract is exact integer equality, not float
    proximity.

    At 100 TB the only heavy operator is the baskets dedup — the same
    single-shuffle cost as any distinct — and AQE's skew split handles
    a pathological mega-order."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = baskets.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    supp = baskets.groupBy("p_brand").agg(F.count(F.lit(1)).alias("brand_cnt"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= ASSOC_MIN_SUPPORT)
    )
    sa = supp.select(
        F.col("p_brand").alias("brand_a"), F.col("brand_cnt").alias("cnt_a")
    )
    sb = supp.select(
        F.col("p_brand").alias("brand_b"), F.col("brand_cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.expr(
                "(1000000L * n_orders * pair_cnt) div (cnt_a * cnt_b)"
            ).alias("lift_e6"),
        )
    )


# Sessionization gap: a new session starts when a user is idle longer
# than this (the classic 30-minute web-analytics cut).
SESSION_GAP_US = 1_800_000_000


def _sessionize_sql() -> str:
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    lagged AS (
      SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_seq
      FROM lagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           MIN(us) AS start_us,
           (MAX(us) - MIN(us)) // 1000000 AS duration_sec,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_e6
    FROM sess GROUP BY user_id, session_seq
    """


@register(
    "q_sessionize",
    sql=_sessionize_sql(),
    survey_ids=("EXT-EVENTS", "WIN-3", "STR-5"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the batch twin of the streaming
    session-window query (q_stream_session): per user, a new session
    starts at the first event and whenever the idle gap exceeds 30
    minutes; each session reports its event count, distinct-type
    count, start, duration, and e6-integer value sum.

    Spark shape: ONE shuffle. Both window functions (the LAG gap flag
    and the running SUM that numbers sessions) share the same
    (user_id)×(us, event_id) partitioning and sort, so WindowExec
    evaluates them in a single pass over one exchange; the session
    roll-up then re-aggregates on (user_id, session_seq) — a key that
    REFINES the window partition, so AQE-planned hash aggregation sees
    perfectly partial-aggregable input (map-side combine collapses each
    user's sessions locally; no second wide exchange of raw events).

    Determinism: ordering ties on (us) break on the unique event_id;
    all compared cells are integers (epoch micros, floor-rounded e6
    value units), so cross-engine equality is exact. NULL users are
    excluded on both sides — an "anonymous" mega-partition is a skew
    hazard AND semantically one fake user's sessions.

    Scale: user_id is a high-cardinality, naturally even key; per-user
    state in WindowExec is one row of look-behind (LAG) plus a running
    long — no buffering of the partition. At 100 TB this is the
    cheapest correct sessionizer: exactly one sort-shuffle of the
    event stream."""
    ev = (
        read_events(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("us"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("us") - prev > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_seq", seq)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.min("us").alias("start_us"),
            F.max("us").alias("_end_us"),
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            ).alias("value_e6"),
        )
        .select(
            "user_id",
            "session_seq",
            "n_events",
            "n_types",
            "start_us",
            # integer floor-division in BIGINT — no double round-trip
            F.expr("(_end_us - start_us) div 1000000").alias("duration_sec"),
            "value_e6",
        )
    )


# ---------------------------------------------------------------------------
# EXT-EVENTS / WIN-3 — trailing-window rate anomaly: the ops alarm a
# 100 TB feed runs continuously ("is this hour's volume > 3σ off its
# trailing day?"), in exact integer arithmetic so the flag itself is
# engine-pinned
# ---------------------------------------------------------------------------
ANOMALY_LOOKBACK_H = 24
ANOMALY_MIN_HOURS = 12  # insufficient history → verdict NULL, not false


def _rate_anomaly_sql() -> str:
    return f"""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
             COUNT(*) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    framed AS (
      SELECT event_type, hour_idx, n_events,
             COUNT(*) OVER w AS w_hours,
             COALESCE(SUM(n_events) OVER w, 0) AS s_prev,
             COALESCE(SUM(n_events * n_events) OVER w, 0) AS ssq_prev
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                   RANGE BETWEEN {ANOMALY_LOOKBACK_H} PRECEDING
                             AND 1 PRECEDING)
    )
    SELECT event_type, hour_idx, n_events, w_hours,
           CAST(s_prev AS BIGINT) AS s_prev,
           CAST(ssq_prev AS BIGINT) AS ssq_prev,
           CASE WHEN w_hours < {ANOMALY_MIN_HOURS} THEN -1
                WHEN (CAST(w_hours AS HUGEINT) * n_events - s_prev)
                       * (CAST(w_hours AS HUGEINT) * n_events - s_prev)
                     > 9 * (CAST(w_hours AS HUGEINT) * ssq_prev
                            - CAST(s_prev AS HUGEINT) * s_prev)
                THEN 1 ELSE 0
           END AS verdict
    FROM framed
    """


@register(
    "q_rate_anomaly",
    sql=_rate_anomaly_sql(),
    survey_ids=("EXT-EVENTS", "WIN-3", "AGG-6"),
    gate=False,
)
def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate anomaly flags: an hour is anomalous when its
    count sits more than 3σ from the mean of its own type's trailing
    24 closed hours (the current hour EXCLUDED — a spike must not
    inflate the baseline it is judged against). The z-test runs
    denominator-free as one integer inequality —
    (w·x − s)² > 9·(w·ssq − s²), the cross-multiplied form of
    (x−μ)²/σ² > 9 — so no division, no float, no cross-engine
    rounding: the FLAG is exact, in DECIMAL(38,0)/HUGEINT guard
    arithmetic that holds to 10⁹-events-per-hour feeds. Hours with
    under {ANOMALY_MIN_HOURS}h of history verdict -1 (unknown) —
    a non-null three-state integer (1/0/-1), never a tri-state bool.

    Shape: one hash aggregate (events → hourly counts, map-side
    combined) then one RANGE window on the integer hour index —
    bounded two-pointer state per type, shuffle carries hourly rows
    (8 760 per type-year), not events. The same plan at 100 TB is
    bounded by the first aggregate's scan."""
    ev = read_events(spark, sf_dir)
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
        )
        .groupBy("event_type", "hour_idx")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-ANOMALY_LOOKBACK_H, -1)
    )
    framed = hourly.select(
        "event_type",
        "hour_idx",
        "n_events",
        F.count(F.lit(1)).over(w).alias("w_hours"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("s_prev"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        ).alias("ssq_prev"),
    )
    d38 = "decimal(38,0)"
    dev = F.col("w_hours").cast(d38) * F.col("n_events") - F.col("s_prev")
    spread = F.col("w_hours").cast(d38) * F.col("ssq_prev") - F.col(
        "s_prev"
    ).cast(d38) * F.col("s_prev")
    return framed.select(
        "event_type",
        "hour_idx",
        "n_events",
        "w_hours",
        "s_prev",
        "ssq_prev",
        F.when(F.col("w_hours") < ANOMALY_MIN_HOURS, F.lit(-1))
        .when(dev * dev > F.lit(9).cast(d38) * spread, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("verdict"),
    )
