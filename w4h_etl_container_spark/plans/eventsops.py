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
# STR-5 — tumbling window aggregation
# ---------------------------------------------------------------------------
@register(
    "q_stream_tumbling",
    sql="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS ws,
           event_type,
           COUNT(*) AS n,
           min(value) AS lo, max(value) AS hi,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
    survey_ids=("STR-5",),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR-5 (SURVEY §2.9): 6-hour tumbling window per event type.
    ``F.window`` aligns to the epoch, as does DuckDB's ``time_bucket``
    (their origins differ by 2000-01-01, which is a whole multiple of 6 h
    — boundaries coincide). In streaming mode the identical expression
    runs under ``withWatermark`` (see streaming/windows.py). Scale: one
    hash aggregate; window assignment is a pure expression."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "lo", "hi", "total")
    )


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
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    survey_ids=("STR-5",),
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
# STR-1/STR-4 — source bookkeeping & state expiry (relational state table)
# ---------------------------------------------------------------------------
@register(
    "q_state_expiry",
    sql="""
    SELECT event_type, max(ts) AS last_seen, COUNT(*) AS n_total
    FROM events
    GROUP BY event_type
    HAVING max(ts) >= TIMESTAMP '2024-01-25 00:00:00'
    """,
    survey_ids=("STR-1", "STR-4", "SNK-4"),
)
def q_state_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR-1/STR-4 (reference status-doc bookkeeping + chart-registry
    expiry, ``utils.py:80-91``, ``main.py:353-359``): the state table as
    rows (type → last_seen), expired entries dropped by the retention
    predicate. The reference's dotted-path map updates become plain
    aggregate-then-filter over the state relation."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n_total"))
        .where(F.col("last_seen") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
    )


# ---------------------------------------------------------------------------
# SNK-4 — MapType state operations (map build → filter → expand)
# ---------------------------------------------------------------------------
@register(
    "q_state_map",
    sql="""
    SELECT user_id, event_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ) WHERE n >= 10
    """,
    survey_ids=("SNK-4", "SF-11", "STR-4"),
)
def q_state_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK-4 (reference ``globalCharts`` dotted-map updates,
    ``utils.py:80-91``): the MapType op chain — build a per-user
    map<event_type, count> with ``map_from_entries``, expire small entries
    with ``map_filter`` (the STR-4 expiry shape), then ``explode`` back to
    rows so the oracle can hash it. Scale: one aggregate; the map ops are
    per-row expressions over bounded-size maps (5 event types)."""
    ev = read_events(spark, sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    kept = mapped.select(
        "user_id", F.map_filter("m", lambda k, v: v >= 10).alias("m")
    )
    return kept.select("user_id", F.explode("m").alias("event_type", "n"))
