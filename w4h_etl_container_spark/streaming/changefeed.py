"""Streaming CHANGE-FEED source for manifest tables — the poll-only
``mtable_changes`` batch feed (pipeline/mtable.py) wrapped as a real
Structured Streaming source, so CDC consumers (``sync_text_index`` /
``sync_vector_index``) run CONTINUOUSLY with checkpointed offsets
instead of a hand-driven loop.

Design (the Delta ``readStream`` split, rendered on the Python Data
Source API): the STREAM carries the tiny per-commit metadata — one row
per committed table VERSION, offsets ARE version numbers — and the
row-level diff is computed inside ``foreachBatch`` on the driver,
where a SparkSession exists, by the same oracle-checked
``mtable_changes`` the batch path uses. This keeps executor-side
stream work trivial (the version reader parses manifest JSONs; no
Spark-in-Spark, no reimplementation of the multiset diff in pandas)
while Structured Streaming supplies the offset log, replay, and
restart semantics from its checkpoint.

Exactly-once composition: a replayed micro-batch re-delivers the same
version rows; ``apply_changes`` re-derives the same diffs; and the
downstream index syncs are replay-safe by their OWN manifest-folded
``synced_table_version`` watermark (round 13: folded into the final
mutation's atomic publish) — so the pipeline end-to-end is
exactly-once without the stream and the sink sharing state.

Usage::

    from w4h_etl_container_spark.streaming.changefeed import (
        MtableVersionsDataSource, apply_changes,
    )

    spark.dataSource.register(MtableVersionsDataSource)
    versions = (
        spark.readStream.format("mtable_versions")
        .option("table_dir", table_dir)
        .load()
    )
    q = (
        versions.writeStream
        .foreachBatch(apply_changes(spark, table_dir, key="doc_id",
                                    process=my_process))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )

No reference analog (the reference's streaming surface is a fixed
Mongo upsert loop); extension mandated by BASELINE.json's operational
surface.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

_SCHEMA = "version long, parent long, op string, committed_at double, n_files long"


def _read_versions(table_dir: str, after: int, upto: int):
    """Rows for committed versions in (after, upto] — manifest JSON
    parses only, O(versions in the window); a vacuumed-away manifest
    inside the window is a hard error (the feed would silently skip
    commits), matching ``mtable_changes``'s retention contract."""
    out = []
    for v in range(after + 1, upto + 1):
        path = os.path.join(table_dir, "_manifests", f"v{v}.json")
        try:
            with open(path) as f:
                man = json.load(f)
        except FileNotFoundError:
            raise RuntimeError(
                f"mtable_versions stream at {table_dir}: manifest v{v} is "
                "gone (vacuumed?) but the stream's offset still needs it — "
                "restart the stream from a retained version"
            ) from None
        out.append(
            (
                man["version"],
                man.get("parent"),
                man.get("op", ""),
                man.get("committed_at"),
                # segmented descriptors carry the count directly (the
                # whole point: never resolve the file list for metadata)
                man["n_files"] if "n_files" in man
                else len(man.get("files", [])),
            )
        )
    return out


class _VersionsStreamReader(SimpleDataSourceStreamReader):
    """Offsets are table versions: {"version": N} means every commit
    ≤ N has been delivered. ``read`` runs on the DRIVER (the simple
    reader contract — correct here: a micro-batch is a handful of
    ~1 KB metadata rows, never data)."""

    def __init__(self, options: dict):
        self._dir = options["table_dir"]
        self._starting = options.get("starting_version")
        if self._starting is not None and int(self._starting) < -1:
            raise ValueError(
                "mtable_versions: starting_version must be >= -1 "
                "(-1 replays from v0 inclusive)"
            )
        # rate limit: a consumer catching up over thousands of retained
        # commits would otherwise get them all in ONE micro-batch — and
        # apply_changes runs one diff per version, so an unbounded batch
        # is an unbounded foreachBatch call with no checkpoint progress
        # until the very end
        maxv = options.get("max_versions_per_batch")
        self._maxv = int(maxv) if maxv is not None else None
        if self._maxv is not None and self._maxv < 1:
            raise ValueError(
                "mtable_versions: max_versions_per_batch must be >= 1"
            )

    def _current(self) -> int:
        with open(os.path.join(self._dir, "_latest")) as f:
            return int(f.read().strip())

    def initialOffset(self) -> dict:
        # default: deliver every retained commit AFTER the version the
        # stream starts at; starting_version=-1 replays from v0
        # inclusive (apply_changes renders v0 as a full-snapshot insert
        # batch — there is no v-1 manifest to diff against)
        if self._starting is not None:
            return {"version": int(self._starting)}
        return {"version": self._current()}

    def read(self, start: dict):
        upto = self._current()
        if self._maxv is not None:
            upto = min(upto, start["version"] + self._maxv)
        rows = _read_versions(self._dir, start["version"], upto)
        return iter(rows), {"version": upto}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_read_versions(self._dir, start["version"], end["version"]))


class MtableVersionsDataSource(DataSource):
    """``spark.readStream.format("mtable_versions")`` — one row per
    committed mtable version. Options: ``table_dir`` (required),
    ``starting_version`` (deliver commits AFTER this version; -1
    replays from v0 inclusive; default = the table's current version
    at stream start, i.e. only new commits), ``max_versions_per_batch``
    (cap each micro-batch at N versions — a catch-up over a long
    retained history then checkpoints progress every N commits instead
    of applying the whole backlog in one unbounded foreachBatch
    call)."""

    @classmethod
    def name(cls) -> str:
        return "mtable_versions"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema: StructType):
        if "table_dir" not in self.options:
            raise ValueError(
                "mtable_versions: .option('table_dir', <path>) is required"
            )
        return _VersionsStreamReader(self.options)


def apply_changes(
    spark: SparkSession,
    table_dir: str,
    key: str | list[str],
    process: Callable[[DataFrame, int], None],
):
    """foreachBatch adapter: turn a micro-batch of version rows into
    consecutive per-version row-level diffs (``mtable_changes(v-1, v)``)
    and hand each to ``process(diff_df, version)`` in commit order.
    Version 0 (delivered only under ``starting_version=-1`` full
    replay) has no parent manifest to diff against — it renders as the
    v0 snapshot with ``_change_type='insert'``, the same shape a diff
    from an empty table would produce. Per-version diffs also make a
    window spanning a schema evolution safe: each call reads both
    sides under its own newer manifest's schema (old rows null-fill),
    so mixed-schema batches never co-mingle in one scan.

    ``process`` must be replay-tolerant (Structured Streaming may
    re-deliver the last uncommitted batch after a restart) — the index
    syncs are, via their manifest watermark; ad-hoc consumers can key
    on ``version``."""
    from pyspark.sql import functions as F

    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_changes,
        mtable_read,
        read_manifest,
    )

    def _fb(batch_df: DataFrame, epoch_id: int) -> None:
        versions = sorted(r["version"] for r in batch_df.select("version").collect())
        for v in versions:
            if v == 0:
                if not read_manifest(table_dir, 0)["files"]:
                    continue  # empty create: nothing to replay
                diff = mtable_read(spark, table_dir, version=0).withColumn(
                    "_change_type", F.lit("insert")
                )
            else:
                diff = mtable_changes(spark, table_dir, v - 1, v, key=key)
            process(diff, v)

    return _fb


def sync_index_on_changes(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    kind: str = "text",
):
    """foreachBatch adapter wiring the change-feed stream straight
    into a serving index: each micro-batch advances the index to the
    batch's NEWEST delivered version with ONE sync call (the sync
    resumes from its own manifest watermark and diffs straight to the
    target version — intermediate versions collapse into one
    O(churned files) application, and a replayed batch is a no-op
    because the watermark already sits at or past the target)."""
    if kind == "text":
        from w4h_etl_container_spark.pipeline.textindex import sync_text_index as _sync
    elif kind == "vector":
        from w4h_etl_container_spark.pipeline.vectorindex import (
            sync_vector_index as _sync,
        )
    else:
        raise ValueError(f"sync_index_on_changes: unknown kind {kind!r}")

    def _fb(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.select("version").collect()
        if not rows:
            return
        target = max(r["version"] for r in rows)
        with open(os.path.join(index_dir, "MANIFEST.json")) as f:
            synced = json.load(f).get("synced_table_version")
        if synced is not None and synced >= target:
            return  # replayed batch: already applied
        _sync(spark, index_dir, table_dir, to_version=target)

    return _fb


def mv_sync_on_changes(spark: SparkSession, mv_dir: str):
    """foreachBatch adapter keeping a MATERIALIZED VIEW
    (pipeline/mview.py) current behind a trickling base table: each
    micro-batch of version rows collapses into ONE ``mv_refresh`` call
    — the refresh diffs from the view's own manifest watermark to the
    base's newest committed version, so intermediate versions cost one
    O(churned files) application and a replayed batch is a no-op (the
    watermark already advanced; the refresh returns refreshed=False).
    Wire it to the mtable-versions stream exactly like the index
    syncs:

        reader = (spark.readStream.format("mtable-versions")
                  .option("table_dir", base).load())
        reader.writeStream.foreachBatch(mv_sync_on_changes(spark, mv))
    """
    from w4h_etl_container_spark.pipeline.mview import mv_refresh

    def _fb(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.select("version").limit(1).collect():
            return
        # mv_refresh reads the base's CURRENT version itself; the batch
        # is only the wake-up signal (its max version is ≤ current, and
        # refreshing past it is strictly fresher — same contract as the
        # index syncs' to_version=max, minus the pin, because the view
        # watermark rides the view table's own CAS)
        mv_refresh(spark, mv_dir)

    return _fb
