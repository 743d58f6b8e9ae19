"""Event-stream declared queries (SURVEY.md §2.9) — the *batch-checkable*
renderings of the streaming semantics (tumbling windows, session windows,
dedup-within-window, state expiry). The live Structured Streaming
counterparts (readStream / withWatermark / foreachBatch) live in
``w4h_etl_container_spark/streaming`` and are covered by pytest; these
declared queries pin the window semantics against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_events


# ---------------------------------------------------------------------------
# STR-5 — tumbling + sliding window aggregation
# ---------------------------------------------------------------------------
@register(
    "q_stream_tumbling",
    sql="""
    SELECT 'tumble6h' AS kind,
           time_bucket(INTERVAL '6 hours', ts) AS ws,
           event_type,
           COUNT(*) AS n,
           min(value) AS lo, max(value) AS hi,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'slide1d6h' AS kind,
           time_bucket(INTERVAL '6 hours', ts) - to_hours(6 * k.k) AS ws,
           '*' AS event_type,
           COUNT(*) AS n,
           min(value) AS lo, max(value) AS hi,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 2
    """,
    survey_ids=("STR-5",),
    gate=False,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR-5 (SURVEY §2.9): 6-hour tumbling windows per event type, plus
    sliding windows (1 day long, 6 h slide — each row lands in 4 windows),
    tagged and unioned. ``F.window`` aligns to the epoch, as does DuckDB's
    ``time_bucket`` (their origins differ by 2000-01-01, a whole multiple
    of 6 h — boundaries coincide); the oracle spells the slide expansion
    as a cross join with k ∈ 0..3. In streaming mode the identical
    expressions run under ``withWatermark`` (see streaming/windows.py).

    Scale: tumbling is one hash aggregate (window assignment is a pure
    expression); sliding is a bounded ×(length/slide) map-side row
    expansion before its aggregate. The union is plan-level only."""
    ev = read_events(spark, sf_dir)
    tumble = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.lit("tumble6h").alias("kind"),
            F.col("w.start").alias("ws"),
            "event_type",
            "n",
            "lo",
            "hi",
            "total",
        )
    )
    slide = (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.lit("slide1d6h").alias("kind"),
            F.col("w.start").alias("ws"),
            F.lit("*").alias("event_type"),
            "n",
            "lo",
            "hi",
            "total",
        )
    )
    return tumble.unionByName(slide)


# ---------------------------------------------------------------------------
# STR-5 — session windows (gaps-and-islands)
# ---------------------------------------------------------------------------
@register(
    "q_stream_session",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second',
                                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > 7200
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, event_id,
             -- CAST: DuckDB's windowed SUM yields HUGEINT, which pandas
             -- materializes as float64 (1.0 vs Spark's bigint 1) and every
             -- row hash differs; BIGINT matches Spark's sum(int) output.
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    survey_ids=("STR-5",),
    gate=False,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR-5 (SURVEY §2.9): session windows with a 2-hour inactivity gap,
    as gaps-and-islands (lag → new-session flag → running sum → group).
    This is also exactly how ``session_window`` evaluates in batch mode;
    the streaming variant uses the built-in with a watermark. Scale: one
    shuffle on user_id; windows and the final aggregate share it (Catalyst
    reuses the partitioning)."""
    ev = read_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(order)
    new_session = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 7200), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = ev.select(
        "user_id", "ts", "event_id", F.sum(new_session).over(running).alias("session_id")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# STR-5 — dedup within window (watermark dedup analog)
# ---------------------------------------------------------------------------
@register(
    "q_stream_dedup",
    sql="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    survey_ids=("STR-5", "STR-3"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-within-window (the batch rendering of streaming
    ``dropDuplicatesWithinWatermark``): first (user, type) event per hour.
    Scale: one shuffle on the dedup key; in streaming the same key set
    bounds the state store and the watermark expires it."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type", F.date_trunc("HOUR", "ts")).orderBy(
        "ts", "event_id"
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# STR-1/STR-4/SNK-4 — state-table maintenance (map ops + expiry + bookkeeping)
# ---------------------------------------------------------------------------
@register(
    "q_state_ops",
    sql="""
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ), live AS (
      SELECT event_type, max(ts) AS last_seen
      FROM events
      GROUP BY event_type
      HAVING max(ts) >= TIMESTAMP '2024-01-25 00:00:00'
    )
    SELECT p.user_id, p.event_type, p.n, l.last_seen
    FROM per_type p JOIN live l ON p.event_type = l.event_type
    WHERE p.n >= 10
    """,
    survey_ids=("STR-1", "STR-4", "SNK-4", "SF-11"),
)
def q_state_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The state-table maintenance chain (reference status-doc
    bookkeeping + ``globalCharts`` dotted-map updates + chart-registry
    expiry, ``utils.py:80-91``, ``main.py:353-359``):

    * SNK-4/SF-11 — build a per-user map<event_type, count> with
      ``map_from_entries``, drop small entries with ``map_filter``, then
      ``explode`` back to rows (the MapType op surface, oracle-hashable);
    * STR-1/STR-4 — the per-type state rows (type → last_seen) with
      expired types dropped by the retention predicate, joined back so
      every surviving row carries its source's bookkeeping.

    Scale: two hash aggregates sharing the events scan; the live-type
    state is tiny → broadcast join; map ops are per-row expressions over
    bounded-size maps (5 event types)."""
    # a NULL event_type crashes map_from_entries (NULL_MAP_KEY) — and
    # such rows can never reach the output anyway (the equality join on
    # event_type drops NULL), so both engines agree after the filter
    # (hostile-events finding; the fixture has no null types)
    ev = read_events(spark, sf_dir).where(F.col("event_type").isNotNull())
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    kept = mapped.select("user_id", F.map_filter("m", lambda k, v: v >= 10).alias("m"))
    rows = kept.select("user_id", F.explode("m").alias("event_type", "n"))
    live = (
        ev.groupBy("event_type")
        .agg(F.max("ts").alias("last_seen"))
        .where(F.col("last_seen") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
    )
    return rows.join(F.broadcast(live), "event_type").select(
        "user_id", "event_type", "n", "last_seen"
    )


# ---------------------------------------------------------------------------
# WIN-3 extension — time-RANGE moving frame (interval windows, not row
# counts: the frame is "everything in the trailing hour", however many
# rows that is — the rolling-metric shape rows-frames can't express)
# ---------------------------------------------------------------------------
@register(
    "q_win_range",
    sql="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    survey_ids=("WIN-3",),
    gate=False,
)
def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-one-hour RANGE frame per user: count and decimal-exact
    sum of everything within 3 600 s before each event (inclusive).
    The frame is ordered on epoch MICROSECONDS (bigint) in both engines
    — an epoch-seconds rendering would silently merge sub-second
    neighbors into the frame boundary; range peers (equal timestamps)
    are frame-mates in both engines by RANGE semantics.

    Scale: one shuffle on user_id; the frame evaluates streaming per
    partition with a sliding two-pointer over the sorted order — state
    is bounded by the densest hour per user, never the partition."""
    ev = read_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# SF-11 extension — JSON payload schema profiling (the drift detector:
# which keys exist, how often, and whether their values stay integral)
# ---------------------------------------------------------------------------
@register(
    "q_props_profile",
    sql="""
    WITH val AS (
      SELECT props FROM events
      WHERE props IS NOT NULL AND json_valid(props) AND json_type(props) = 'OBJECT'
    ), kv AS (
      SELECT unnest(json_keys(props)) AS key, props FROM val
    ), x AS (
      SELECT key,
             json_extract_string(props, '$.' || chr(34) || key || chr(34)) AS value
      FROM kv
    )
    SELECT key,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE value IS NULL) AS n_null,
           COUNT(*) FILTER (WHERE regexp_matches(value, '^-?[0-9]+$')) AS n_int,
           COUNT(*) FILTER (WHERE value IS NOT NULL
                            AND NOT regexp_matches(value, '^-?[0-9]+$')) AS n_other
    FROM x GROUP BY key
    """,
    survey_ids=("SF-11",),
    gate=False,
)
def q_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profile of the ``props`` JSON payload: per key, how many
    valid-object rows carry it, and whether its values are integer
    literals, explicit nulls, or something else — the drift detector a
    pipeline runs when an upstream team "just adds a field".

    Engine-neutral by construction: Spark parses to
    ``map<string,string>`` (malformed/non-object rows parse to NULL,
    exactly DuckDB's ``json_valid AND json_type='OBJECT'`` gate; JSON
    scalars stringify identically for scalar values) and the
    INT-likeness CLASSIFICATION is the only thing compared — never the
    raw value strings, so nested-value re-serialization differences
    (Spark keeps the raw substring, DuckDB minifies) can't diverge the
    result. Domain: flat scalar values (the JSONL wire contract);
    profiled keys must not contain quote characters (JSON-path
    rendering).

    Scale: one projection + one explode bounded by keys-per-row, one
    map-side-combined aggregate on the (tiny) key domain."""
    ev = read_events(spark, sf_dir)
    m = ev.select(F.from_json("props", "map<string,string>").alias("m")).where(
        F.col("m").isNotNull()
    )
    kv = m.select(F.explode("m").alias("key", "value"))
    is_int = F.col("value").rlike("^-?[0-9]+$")
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null"),
        F.count(F.when(is_int, 1)).alias("n_int"),
        F.count(F.when(F.col("value").isNotNull() & ~is_int, 1)).alias("n_other"),
    )


# ---------------------------------------------------------------------------
# JOIN-4 extension — attribution interval join (the batch twin of
# streaming/joins.py::attribution_join, which tests pin stream-parity
# against; declared here so the semantics are ALSO hash-checked)
# ---------------------------------------------------------------------------
@register(
    "q_attribution",
    sql="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           p.value AS amount,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
    survey_ids=("JOIN-4", "STR-5"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: every (purchase, click-by-same-user-
    within-the-preceding-hour) pair — the ad-tech touchpoint join. The
    STREAMING rendering of this exact operator lives in
    ``streaming/joins.py`` (watermark-bounded state) and is pinned
    equal to this batch form across micro-batch boundaries in
    test_streaming; this declared query pins the semantics against the
    DuckDB oracle as well, closing the triangle.

    Scale: an equi-join on user_id with a residual time-range
    predicate — the range never becomes a nested loop because the
    equi key carries the join; at 100 TB both sides co-partition on
    user_id and the hour bound caps per-key match fan-out."""
    from w4h_etl_container_spark.streaming.joins import attribution_join

    return attribution_join(read_events(spark, sf_dir), window_seconds=3600)
