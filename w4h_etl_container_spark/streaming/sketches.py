"""Streaming mergeable-sketch operator (SURVEY §2.9/§2.10 + the
round-10 sketch family): a KMV distinct-count accumulator per group,
maintained incrementally across micro-batches with
``applyInPandasWithState``.

This is the operational argument for sketches made executable: the
batch ``q_kmv_distinct`` recomputes the k-minimum set from scratch;
this operator folds each micro-batch into 32 longs of per-group state
and emits the updated estimate — the same answer (KMV insertion is
order-insensitive: the k smallest of a union is the k smallest of
incremental unions), pinned against the batch formula in
tests/test_streaming.py. At 100 TB/day the state store holds
``groups × K`` longs TOTAL, and a day's sketch merges with history
without re-reading either side.

Hash contract: identical to plans/sketches.py — the first 15 hex chars
of ``md5(str(user_id))`` as a 60-bit integer — so streaming state,
batch query, and DuckDB oracle all agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from w4h_etl_container_spark.plans.sketches import KMV_K, _DOMAIN

OUTPUT_SCHEMA = (
    "event_type string, n_mins int, kth_min bigint, est_users double"
)
STATE_SCHEMA = "mins array<bigint>"


def _hash60(user) -> int:
    return int(hashlib.md5(str(int(user)).encode()).hexdigest()[:15], 16)


def _estimate(mins: list[int]) -> float:
    if len(mins) < KMV_K:
        return float(len(mins))
    return (KMV_K - 1) * _DOMAIN / float(mins[-1])


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    mins = sorted(state.get[0]) if state.exists else []
    have = set(mins)
    for pdf in pdfs:
        users = pdf["user_id"].dropna()
        if len(users) == 0:
            continue
        # vectorized md5 over the batch's DISTINCT users only — the
        # per-batch dedup is the map-side combine of the batch plan
        for h in users.drop_duplicates().map(_hash60):
            if h not in have:
                have.add(h)
                mins.append(h)
    mins.sort()
    del mins[KMV_K:]
    state.update((mins,))
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "n_mins": len(mins),
                "kth_min": mins[-1] if mins else None,
                "est_users": _estimate(mins),
            }
        ]
    )


def group_kmv(events: DataFrame) -> DataFrame:
    """Attach the incremental KMV accumulator to a streaming events
    frame: one updated (n_mins, kth_min, est_users) row per group per
    micro-batch. No timeout — cardinality state is the thing you keep;
    use an outer retention job to drop retired groups."""
    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Incremental count-min: the frequency twin of the KMV accumulator.
# Same geometry and hash contract as the batch q_heavy_hitters sketch
# (plans/sketches.py CMS_D × CMS_W, md5('s{r}:user') bucket idiom), so
# the streaming state, the batch cells, and the DuckDB oracle agree
# cell-for-cell; counters only ever ADD, which is the mergeability
# argument (sum of per-batch sketches == sketch of the union).
# --------------------------------------------------------------------------

CMS_OUTPUT_SCHEMA = "event_type string, n_rows bigint, cells array<bigint>"
CMS_STATE_SCHEMA = "n_rows bigint, cells array<bigint>"


def _cms_bucket_py(user: int, r: int) -> int:
    from w4h_etl_container_spark.plans.sketches import CMS_W

    return int(hashlib.md5(f"s{r}:{user}".encode()).hexdigest()[:8], 16) % CMS_W


def cms_estimate(cells: list[int], user: int) -> int:
    """Point-frequency estimate from a flattened d×w cell array: MIN
    over the key's d counters (the classic ≥-true overestimate)."""
    from w4h_etl_container_spark.plans.sketches import CMS_D, CMS_W

    return min(cells[r * CMS_W + _cms_bucket_py(int(user), r)] for r in range(CMS_D))


def _cms_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from w4h_etl_container_spark.plans.sketches import CMS_D, CMS_W

    (etype,) = key
    if state.exists:
        n_rows, cells = state.get
        cells = list(cells)
    else:
        n_rows, cells = 0, [0] * (CMS_D * CMS_W)
    for pdf in pdfs:
        users = pdf["user_id"].dropna()
        n_rows += int(len(users))
        # per-batch value_counts is the map-side combine: one bucket
        # computation per DISTINCT user, weighted by its batch count
        for user, cnt in users.value_counts().items():
            for r in range(CMS_D):
                cells[r * CMS_W + _cms_bucket_py(int(user), r)] += int(cnt)
    state.update((n_rows, cells))
    yield pd.DataFrame(
        [{"event_type": etype, "n_rows": n_rows, "cells": cells}]
    )


def group_cms(events: DataFrame) -> DataFrame:
    """Attach the incremental count-min accumulator to a streaming
    events frame: one updated (n_rows, cells) row per group per
    micro-batch. State is CMS_D·CMS_W longs per group — fixed forever,
    the property that lets a 100 TB/day feed keep per-group frequency
    sketches in a state store that never grows."""
    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cms_update,
            outputStructType=CMS_OUTPUT_SCHEMA,
            stateStructType=CMS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
