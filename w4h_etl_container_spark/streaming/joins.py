"""Stream-stream joins with watermark-bounded state (SURVEY §2.9 —
the STR capability the window/dedup/stateful modules don't cover):
two live streams joined on an equi key PLUS an event-time interval,
where the watermarks tell the state store when a buffered row can
never match again and is dropped.

Operator: click→purchase attribution — each purchase joins every click
by the same user in the preceding ``window_seconds``. This is the
classic ad-attribution / touchpoint join; in batch it is exactly the
engine's range-join shape (q_join_range), which is what the tests pin
streaming parity against.

State bound: each side buffers only rows younger than
(watermark − interval). Spark ACCEPTS an unwatermarked inner
stream-stream join (state then grows forever — this module always
sets both watermarks and the interval bound precisely so it cannot);
outer joins are refused outright without watermarks, a guard the
tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each ``purchase`` to the same user's ``click`` events within
    the preceding ``window_seconds`` (inclusive of the purchase
    instant, exclusive of clicks after it). Works identically on a
    static frame (the parity oracle) and a streaming one (where the
    watermarks bound the join state).

    One row per (purchase, qualifying click) — the consumer picks
    last-touch/first-touch by aggregating over ``click_ts``."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    return purchases.join(clicks, cond).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "amount",
        "click_id",
        "click_ts",
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on_stream: str, on_dim: str) -> DataFrame:
    """Stream-static enrichment — the OTHER standard streaming join:
    a live event stream joined against a batch dimension table
    (user → segment, document → source metadata). No state store is
    involved at all: Spark re-plans the static side per micro-batch,
    so the join is stateless, needs no watermark, and the static side
    broadcasts when small exactly as in batch.

    Semantics contract (pinned in tests): a parquet dimension's FILE
    LISTING is captured in the DataFrame's file index when the
    DataFrame is CREATED — new dimension files are invisible through
    that object even across query restarts and even after
    ``refreshByPath`` (both measured in tests). The
    slowly-changing-dim refresh pattern is therefore RE-CREATING the
    dim DataFrame (and this join) before the next drain — or a
    per-batch re-read inside ``foreachBatch`` for continuously-running
    queries. Inner join: events without a dimension row drop, the
    batch join's own convention — left-join to keep them.

    At 100 TB/day: the stream side never shuffles for this join when
    the dim broadcasts; a corpus-scale dimension belongs in a
    stream-stream join or a keyed state store instead."""
    ev = events.withColumnRenamed(on_stream, "_k") if on_stream != "_k" else events
    d = dim.withColumnRenamed(on_dim, "_k") if on_dim != "_k" else dim
    return ev.join(F.broadcast(d), "_k").withColumnRenamed("_k", on_stream)
