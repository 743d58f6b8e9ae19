"""Streaming window operators — STR-5 (SURVEY §2.9): watermarked tumbling
and session windows and watermark-scoped dedup over an event stream.

These are the *live* counterparts of the batch-declared queries in
``plans/eventsops.py`` (same expressions, same semantics — the batch
versions are what the DuckDB oracle checks; these run under watermarks
with state cleanup). Each returns a streaming DataFrame ready for
``writeStream``; tests drive them with ``Trigger.AvailableNow`` over a
file source and assert against the batch rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, window: str = "6 hours", watermark: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling aggregate. State for a window is dropped once
    the watermark passes its end — bounded state at any throughput."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "lo", "hi")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "6 hours",
    slide: str = "2 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked SLIDING aggregate: each event contributes to
    ``window/slide`` overlapping windows (3 here). Spark assigns the
    overlapping windows at the map side (one state entry per open
    window, same bounded-state guarantee as tumbling — a window's state
    drops when the watermark passes its end); the per-event fan-out is
    window/slide, constant, not data-dependent."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean_value"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "mean_value",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "2 hours", watermark: str = "1 day"
) -> DataFrame:
    """Watermarked session windows (built-in ``session_window`` — dynamic
    gap merging handled by the state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermark-scoped dedup on (user_id, event_type): state expires with
    the watermark instead of growing forever — the streaming analog of
    q_stream_dedup's one-per-hour rule."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def watermark_drop_count(query) -> int:
    """Rows silently discarded as too-late across a (finished or
    running) streaming query's progress history — the
    ``numRowsDroppedByWatermark`` counters summed over every state
    operator of every micro-batch in ``recentProgress``.

    Why it exists: the watermark contract DROPS late data without any
    error, which is correct streaming semantics and a silent data-loss
    bug from an auditing standpoint — the same every-row-lands-
    somewhere concern the ingestion quarantine answers for batch. A
    pipeline run logs this number next to its output counts; non-zero
    means upstream event-time disorder exceeded the configured bound
    and the watermark (or the feed) needs attention.

    Unit caveat (measured, pinned in tests): the counter is in
    STATE-OPERATOR INPUT rows, which for a windowed aggregation sit
    AFTER the map-side partial aggregate — four late events in one
    window count as ONE dropped row; four late events in four windows
    count as four. It is a did-we-lose-anything signal (zero ⇔ no
    loss), not a raw-event tally; pair it with an input count when the
    magnitude matters."""
    total = 0
    for prog in query.recentProgress:
        for op in (prog.get("stateOperators") or []):
            total += int(op.get("numRowsDroppedByWatermark") or 0)
    return total
