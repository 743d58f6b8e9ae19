"""Custom stateful streaming operator — the engine's
``applyInPandasWithState`` surface (SURVEY §2.9/§2.10: the escape hatch for
stateful semantics the built-in windows can't express).

Operator implemented: per-user running telemetry (event count, running max
value, high-water-mark timestamp) that emits an updated row per user per
micro-batch and expires idle users' state via processing-time timeout —
the canonical "profile accumulator" shape of a training-data pipeline
(per-source corpus counters work identically).

State is a single Arrow-encoded tuple per key; the state store bounds
memory by key cardinality, and the timeout bounds key cardinality by
activity — both required properties at 100 TB/day event volumes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double, last_ts timestamp"
STATE_SCHEMA = "n_events bigint, max_value double, last_ts timestamp"


def _make_update(timeout_ms: int | None):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, mx, last = state.get if state.exists else (0, float("-inf"), None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            mx = max(mx, float(pdf["value"].max()))
            t = pdf["ts"].max()
            last = t if last is None or t > last else last
        state.update((n, mx, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "max_value": mx, "last_ts": last}]
        )

    return _update


def user_running_stats(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Attach the stateful accumulator to a streaming events frame.

    ``idle_timeout_ms`` enables processing-time state expiry for
    continuously-running queries (bounding state by key activity). Leave
    ``None`` for ``Trigger.AvailableNow`` batch drains — a pending
    processing-time timeout keeps an available-now query alive past its
    last batch, so the trigger would never terminate.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twin (the Spark 4 successor API)
# ---------------------------------------------------------------------------
def _twx_classes():
    """Import the transformWithState surface lazily: the API is Spark 4+
    (absent on a 3.x cluster) and the engine's applyInPandasWithState
    form above stays the portable fallback."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return StatefulProcessor, StatefulProcessorHandle


def user_running_stats_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """``user_running_stats`` on ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SPARK-45939): typed ValueState replaces
    the single state tuple, state TTL replaces the manual
    processing-time timeout dance, and timers/list/map state are
    available for richer accumulators without schema contortions.

    Emits the same rows as the ``applyInPandasWithState`` form —
    parity-pinned in tests (same final per-user totals under
    AvailableNow). Prefer this form on Spark 4 clusters; keep the other
    for 3.x portability. State is one typed row per key in the state
    store; ``ttl_ms`` bounds idle-key state exactly as the timeout did,
    enforced by the store instead of handler code.

    Runtime requirements (checked by the tests' import gates): the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the protobuf
    runtime for the state-server protocol — standard on Spark 4
    clusters, absent in this container, so execution parity skips here
    while plan-build/schema is always asserted; execution parity of the
    PROCESSOR code itself runs unconditionally through the in-memory
    handle harness in tests — see ``make_running_stats_processor``."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_stats_processor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def make_running_stats_processor(ttl_ms: int | None = None):
    """The ``transformWithStateInPandas`` StatefulProcessor behind
    ``user_running_stats_tws``, exposed as a factory so its EXECUTION
    can be pinned without the protobuf state-server transport: the
    processor touches the handle only through ``getValueState`` and the
    ValueState ``exists/get/update`` triple, so an in-memory handle
    drives every line of init/handleInputRows/close across real
    micro-batch frames (tests/test_streaming.py's harness), asserting
    emission parity against the ``applyInPandasWithState`` operator and
    the batch aggregate. On a protobuf-equipped Spark 4 cluster the
    same instance runs unmodified under the real transport."""
    StatefulProcessor, _ = _twx_classes()

    class RunningStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._acc = handle.getValueState("acc", STATE_SCHEMA, ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, mx, last = (
                self._acc.get() if self._acc.exists() else (0, float("-inf"), None)
            )
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
                t = pdf["ts"].max()
                last = t if last is None or t > last else last
            self._acc.update((n, mx, last))
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "max_value": mx, "last_ts": last}]
            )

        def close(self) -> None:
            pass

    return RunningStats()


# ---------------------------------------------------------------------------
# Streaming funnel state machine (the incremental twin of the batch
# q_funnel): per-user progression through an ordered step list, state =
# (step_reached, t_last), advanced greedily in event-time order
# ---------------------------------------------------------------------------
FUNNEL_OUTPUT_SCHEMA = "user_id bigint, step_reached int, t_last timestamp"
FUNNEL_STATE_SCHEMA = "step_reached int, t_last timestamp"


def _make_funnel_update(steps: tuple[str, ...], timeout_ms: int | None):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        step, t_last = state.get if state.exists else (0, None)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            rows = pd.concat(frames)
            rows = rows[rows["event_type"].isin(steps)].sort_values("ts")
            for ts, et in zip(rows["ts"], rows["event_type"]):
                if step >= len(steps):
                    break
                # strictly-after semantics, identical to the batch walk:
                # step 0 needs no predecessor, later steps need ts > t_last
                if et == steps[step] and (t_last is None or ts > t_last):
                    step += 1
                    t_last = ts
        state.update((step, t_last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "step_reached": step, "t_last": t_last}]
        )

    return _update


def user_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Incremental funnel: the same greedy earliest-match walk as the
    batch ``q_funnel`` (plans/analytics.py), held as two scalars of
    per-user state across micro-batches. Events are sorted by event
    time WITHIN each batch; arrivals that cross batch boundaries out of
    event-time order cannot retro-advance an earlier step (the
    documented streaming relaxation — a watermark-buffered variant
    would hold per-step candidate times instead; the batch query is the
    reconciliation oracle on ordered replays, pinned in tests).

    State per user is (int, timestamp) regardless of event volume —
    the store is bounded by user cardinality, and ``idle_timeout_ms``
    bounds that by activity."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(steps, idle_timeout_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
