"""Manifest table ("mtable") — minimal copy-on-write table format for
mutable datasets: MERGE (upsert) that rewrites ONLY the data files
containing matched keys, snapshot-isolated readers, time travel, and
vacuum. The lakehouse mechanics (Delta/Iceberg's core loop) rendered
in ~200 lines on plain parquet + a JSON manifest, because the engine's
100 TB story needs a mutation path that does not rewrite the table:

* a TABLE is a directory of immutable parquet data files plus
  ``_manifests/v{N}.json`` listing the files of version N and
  ``_latest`` naming the current version (written via atomic rename,
  so a reader resolves one consistent file list — snapshot isolation
  for free on a POSIX dir; on object stores the pointer write is the
  usual single-key atomic PUT);
* MERGE = footer-level pruning (per-file min/max of the merge key —
  the ``pruning_report`` honesty) intersected with the update batch's
  key set → read only matched files → anti-join out old rows →
  union the update batch → write new files → publish manifest N+1
  re-listing untouched files verbatim. Untouched bytes are never
  read, never rewritten;
* the batch↔file intersection is COUNT-GATED: a bounded key set
  (≤ ``max_collect_keys`` distinct keys) collects to the driver for
  exact per-file membership pruning; anything wider NEVER collects —
  matched files come from joining the footer-range table (one tiny
  row per file, broadcast) against the distinct-key DataFrame, and
  the driver only ever holds the matched FILE list. This is the
  join-based file matching Delta/Iceberg use for corpus-scale CDC
  deltas: merge key volume never bounds driver memory;
* old versions stay readable (time travel) until ``vacuum`` deletes
  files unreferenced by any retained manifest;
* commits are manifest COMPARE-AND-SWAP'd: version N+1 is claimed by
  atomic exclusive file creation (``os.link`` of a fully-written
  temp), so two interleaved writers racing the same parent produce
  exactly one winner and one loud ``ConcurrentWriteError`` — never a
  silently lost update. Callers holding a planning snapshot can also
  pin ``expected_version`` to fail fast on a stale plan.

Surface: ``mtable_create`` / ``mtable_read`` (versioned) /
``mtable_merge`` (keyed upsert) / ``mtable_delete`` /
``mtable_merge_agg`` (incremental aggregate maintenance — the
materialized-view refresh) / ``mtable_compact`` (compaction as a
version) / ``mtable_vacuum`` / ``mtable_sink`` (exactly-once
foreachBatch append / keyed merge / replay-safe additive combine).
Keys may be numeric or string (footer stats decode; a file with ANY
stats-less row group, or missing the key column entirely, reports an
unbounded range and is conservatively matched — unprunable files are
read, never skipped). Model-checked against a dict reference and
crash-tested: orphan DATA generations are reader-invisible and
vacuumed; an orphan MANIFEST above the ``_latest`` pointer (crash
between manifest write and pointer flip) never anchors vacuum
retention — the retention window is pinned to the pointer, so the
live version can never be vacuumed out from under its own pointer.

Coordination: the state-store lock (``pipeline/state.py``) remains
the cooperative layer; the manifest CAS turns its correctness from an
assumption into a checked invariant. No reference analog; extension
mandated by BASELINE.json's operational surface.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_LATEST = "_latest"

#: Above this many distinct batch keys, merge/delete/merge_agg switch
#: from driver-side exact key collection to the join-based file-match
#: path (driver memory bounded by FILE count, never key count).
DEFAULT_MAX_COLLECT_KEYS = 100_000


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer planned to
    publish (manifest CAS lost) or moved the table past the snapshot
    this writer planned against (``expected_version`` stale)."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def _write_manifest(
    table_dir: str,
    version: int,
    files: list[str],
    meta: dict,
    overwrite: bool = False,
) -> None:
    """Publish manifest ``version`` then flip the ``_latest`` pointer.

    The manifest is fully written to a temp file first, then claimed
    under its final name with ``os.link`` — an atomic EXCLUSIVE create
    on POSIX — so a second writer racing the same version number gets
    ``ConcurrentWriteError`` instead of silently clobbering the
    winner's commit (compare-and-swap on the version slot). A crash
    after the link but before the pointer rename leaves an orphan
    manifest ABOVE the pointer; readers never see it (they resolve the
    pointer) and vacuum drops it without anchoring retention on it.

    ``overwrite=True`` is the self-annotation escape hatch (the
    streaming sink re-stamping its OWN just-committed version with
    epoch lineage) — never used to publish new content."""
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    man = {"version": version, "files": sorted(files), **meta}
    path = _manifest_path(table_dir, version)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    if overwrite:
        os.rename(tmp, path)
    else:
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.remove(tmp)
            raise ConcurrentWriteError(
                f"mtable at {table_dir}: version {version} was already "
                "committed by another writer (manifest CAS lost); replan "
                "from the current snapshot and retry"
            ) from None
        os.remove(tmp)
    # the pointer flip is the commit: readers that resolved the old
    # pointer keep a consistent old file list (those files still exist)
    ptr_tmp = os.path.join(table_dir, f".{_LATEST}.tmp-{uuid.uuid4().hex}")
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.rename(ptr_tmp, os.path.join(table_dir, _LATEST))


def _current_version(table_dir: str) -> int:
    with open(os.path.join(table_dir, _LATEST)) as f:
        return int(f.read().strip())


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = _current_version(table_dir)
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _new_data_files(table_dir: str, df: DataFrame) -> list[str]:
    """Write ``df`` as fresh immutable data files under a unique
    subdirectory; return their paths (relative to ``table_dir``)."""
    sub = f"data-{uuid.uuid4().hex}"
    out = os.path.join(table_dir, sub)
    df.write.parquet(out)
    return [
        os.path.join(sub, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    ]


def mtable_create(spark: SparkSession, df: DataFrame, table_dir: str) -> dict:
    """Create version 0 from ``df``."""
    os.makedirs(table_dir, exist_ok=True)
    files = _new_data_files(table_dir, df)
    _write_manifest(table_dir, 0, files, {"op": "create"})
    return read_manifest(table_dir)


def mtable_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read one VERSION's consistent file list (latest by default).
    Time travel = pass an older version; its files are immutable, so
    the read is reproducible until a vacuum drops that version."""
    man = read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, f) for f in man["files"]]
    if not paths:
        raise ValueError(f"mtable at {table_dir} v{man['version']} lists no files")
    return spark.read.parquet(*paths)


def _file_key_ranges(table_dir: str, files: list[str], key: str) -> dict:
    """{file: (min, max)} of ``key`` from parquet footer statistics —
    metadata-only, no data read. A file reports ``None`` (= UNPRUNABLE,
    treated as MATCHED by every consumer: unprunable files are read,
    never skipped — the pruning_report failure direction) whenever its
    bounds cannot be trusted to cover every row:

    * the key column is absent from the file's schema (field index
      < 0 — schema drift);
    * ANY row group lacks min/max statistics (a key present only in a
      stats-less row group must not be pruned away — partial stats
      are not a valid file range);
    * stats are not comparable to the key's Python type.

    String-key stats surface as ``bytes`` from the footer and are
    decoded so ``<=`` against Python strings is well-typed."""
    import pyarrow.parquet as pq

    def _norm(v):
        return v.decode("utf-8", "surrogateescape") if isinstance(v, bytes) else v

    out = {}
    for rel in files:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(key)
        if idx < 0:
            out[rel] = None
            continue
        mins, maxs = [], []
        complete = md.num_row_groups > 0
        try:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    complete = False
                    break
                mins.append(_norm(st.min))
                maxs.append(_norm(st.max))
            out[rel] = (min(mins), max(maxs)) if complete else None
        except TypeError:
            out[rel] = None
    return out


def _plan_matched_files(
    spark: SparkSession,
    table_dir: str,
    man: dict,
    batch: DataFrame,
    key: str,
    max_collect_keys: int,
    empty_msg: str,
):
    """Shared MERGE/DELETE planning: which data files can contain any
    of the batch's keys?

    Returns ``(matched, untouched, n_keys, key_df, path)`` where
    ``key_df`` is the persisted distinct-key DataFrame (caller reuses
    it for the anti-join and MUST unpersist) and ``path`` records the
    strategy taken ('collect' | 'join') in the manifest for
    observability.

    Count-gated: one cheap ``distinct().count()`` decides. At or under
    ``max_collect_keys`` the exact key set collects for per-file
    membership tests (tightest pruning). Above it, nothing key-shaped
    ever reaches the driver: the footer-range table (one row per data
    file — thousands of rows for a 100 TB table, always broadcastable)
    joins against the key DataFrame on range containment, and only the
    distinct matched FILE names collect (bounded by file count). Files
    with untrusted stats (``None`` range) are matched unconditionally
    on both paths."""
    kdf = batch.select(key).distinct().persist()
    n_keys = kdf.count()
    if n_keys == 0:
        kdf.unpersist()
        raise ValueError(empty_msg)
    ranges = _file_key_ranges(table_dir, man["files"], key)
    unprunable = [f for f, rng in ranges.items() if rng is None]
    bounded = {f: rng for f, rng in ranges.items() if rng is not None}
    if n_keys <= max_collect_keys:
        path = "collect"
        keys = [r[0] for r in kdf.collect()]
        kmin, kmax = min(keys), max(keys)
        kset = set(keys)
        hits = [
            f
            for f, (lo, hi) in bounded.items()
            if lo <= kmax and kmin <= hi and any(lo <= k <= hi for k in kset)
        ]
    elif bounded:
        path = "join"
        rng_df = spark.createDataFrame(
            [(f, lo, hi) for f, (lo, hi) in bounded.items()],
            ["_mt_file", "_mt_min", "_mt_max"],
        )
        kcol = F.col(key)
        hits = sorted(
            r[0]
            for r in kdf.join(
                F.broadcast(rng_df),
                (kcol >= F.col("_mt_min")) & (kcol <= F.col("_mt_max")),
            )
            .select("_mt_file")
            .distinct()
            .collect()
        )
    else:
        path = "join"
        hits = []
    matched_set = set(unprunable) | set(hits)
    matched = [f for f in man["files"] if f in matched_set]
    untouched = [f for f in man["files"] if f not in matched_set]
    return matched, untouched, n_keys, kdf, path


def _check_expected(man: dict, expected_version: int | None, table_dir: str) -> None:
    if expected_version is not None and man["version"] != expected_version:
        raise ConcurrentWriteError(
            f"mtable at {table_dir}: planned against v{expected_version} "
            f"but the table is now at v{man['version']} — another writer "
            "committed first; replan from the current snapshot"
        )


def mtable_merge(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
    max_collect_keys: int = DEFAULT_MAX_COLLECT_KEYS,
    expected_version: int | None = None,
) -> dict:
    """MERGE (upsert) ``updates`` by ``key``: rows whose key exists are
    replaced, new keys are inserted. Copy-on-write limited to MATCHED
    files (see ``_plan_matched_files`` — count-gated exact-key pruning
    under ``max_collect_keys`` distinct keys, driver-safe join-based
    file matching above it; key volume never bounds driver memory),
    only those files are read/anti-joined/rewritten, every untouched
    file is re-listed verbatim in the next manifest.

    ``expected_version`` pins the snapshot this merge was planned
    against: the commit raises ``ConcurrentWriteError`` if another
    writer moved the table (and the manifest CAS catches the
    commit-time race even without it — one winner, one loud loser).

    Returns the new manifest (also records files_rewritten /
    files_untouched / key_match_path so the no-table-rewrite property
    and the chosen pruning strategy are observable)."""
    man = read_manifest(table_dir)
    _check_expected(man, expected_version, table_dir)
    matched, untouched, n_keys, kdf, path = _plan_matched_files(
        spark, table_dir, man, updates, key, max_collect_keys,
        "mtable_merge: empty update batch",
    )
    n_rows = updates.count()
    if n_rows != n_keys:
        # a batch with duplicate keys has no well-defined upsert (which
        # row wins?) — the Delta/Iceberg "multiple source rows matched"
        # refusal; dedupe upstream or pre-aggregate via mtable_merge_agg
        kdf.unpersist()
        raise ValueError(
            f"mtable_merge: update batch has {n_rows - n_keys} duplicate "
            f"key rows ({n_rows} rows, {n_keys} distinct {key!r}); an "
            "upsert needs one row per key"
        )
    try:
        if matched:
            old = spark.read.parquet(*[os.path.join(table_dir, f) for f in matched])
            anti = F.broadcast(kdf) if n_keys <= max_collect_keys else kdf
            combined = old.join(anti, key, "left_anti").unionByName(updates)
        else:
            combined = updates
        new_files = _new_data_files(table_dir, combined)
    finally:
        kdf.unpersist()

    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        untouched + new_files,
        {
            "op": "merge",
            "parent": man["version"],
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_update_keys": n_keys,
            "key_match_path": path,
        },
    )
    return read_manifest(table_dir)


def mtable_vacuum(table_dir: str, retain_versions: int = 1) -> dict:
    """Delete data files unreferenced by the ``retain_versions`` most
    recent COMMITTED manifests, and drop manifests outside that window.
    Time travel shrinks to the retained window.

    Retention is anchored on the ``_latest`` POINTER, never on the
    highest manifest file present: a crash between manifest write and
    pointer flip leaves an orphan manifest ABOVE the pointer, and
    anchoring on it would let vacuum retain only the orphan while
    deleting the live pointed-to version's files (data loss). Instead
    the window is the pointer version and its predecessors; manifests
    above the pointer are crash debris — dropped whole (their data
    files are reclaimed unless a retained version also lists them),
    tolerating even an unparseable half-written orphan."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    current = _current_version(table_dir)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")
    )
    committed = [v for v in versions if v <= current]
    keep_versions = committed[-max(1, retain_versions):]
    if current not in keep_versions:  # pointer always survives vacuum
        keep_versions.append(current)
    referenced: set[str] = set()
    for v in keep_versions:
        referenced |= set(read_manifest(table_dir, v)["files"])
    removed = []
    for entry in os.listdir(table_dir):
        sub = os.path.join(table_dir, entry)
        if not (entry.startswith("data-") and os.path.isdir(sub)):
            continue
        for f in os.listdir(sub):
            rel = os.path.join(entry, f)
            if f.endswith(".parquet") and rel not in referenced:
                os.remove(os.path.join(table_dir, rel))
                removed.append(rel)
    for v in versions:
        if v not in keep_versions:
            os.remove(_manifest_path(table_dir, v))
    return {"removed_files": sorted(removed), "retained_versions": keep_versions}


def mtable_delete(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    key: str,
    max_collect_keys: int = DEFAULT_MAX_COLLECT_KEYS,
    expected_version: int | None = None,
) -> dict:
    """DELETE by key set — the MERGE machinery minus the insert: only
    files whose footer range intersects the key set are read and
    rewritten without the deleted rows; everything else is re-listed
    verbatim. Same count-gated planning and CAS commit as
    ``mtable_merge``. A key that matches nothing still commits a
    (no-op-ish) version — deletes are idempotent by construction."""
    man = read_manifest(table_dir)
    _check_expected(man, expected_version, table_dir)
    matched, untouched, n_keys, kdf, path = _plan_matched_files(
        spark, table_dir, man, keys, key, max_collect_keys,
        "mtable_delete: empty key set",
    )
    new_files: list[str] = []
    try:
        if matched:
            old = spark.read.parquet(*[os.path.join(table_dir, f) for f in matched])
            anti = F.broadcast(kdf) if n_keys <= max_collect_keys else kdf
            survivors = old.join(anti, key, "left_anti")
            if survivors.limit(1).count():
                new_files = _new_data_files(table_dir, survivors)
    finally:
        kdf.unpersist()
    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        untouched + new_files,
        {
            "op": "delete",
            "parent": man["version"],
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_delete_keys": n_keys,
            "key_match_path": path,
        },
    )
    return read_manifest(table_dir)


def mtable_compact(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 << 20,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Compaction as a VERSION: rewrite the current snapshot's files
    into ⌈total/target⌉ uniformly-sized files (operators.layout.
    compact_table's sizing rule) and publish them as version N+1 —
    readers on version N are untouched, and time travel across the
    compaction keeps working until vacuum. This is how a manifest
    table absorbs the small files MERGE/append churn produces without
    ever blocking reads."""
    import math

    man = read_manifest(table_dir)
    total = sum(
        os.path.getsize(os.path.join(table_dir, f)) for f in man["files"]
    )
    n_out = max(1, math.ceil(total / target_bytes))
    df = mtable_read(spark, table_dir).repartition(n_out)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    new_files = _new_data_files(table_dir, df)
    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        new_files,
        {
            "op": "compact",
            "parent": man["version"],
            "files_in": len(man["files"]),
            "files_out": len(new_files),
            "bytes_in": total,
        },
    )
    new_man = read_manifest(table_dir)
    n_old = mtable_read(spark, table_dir, version=man["version"]).count()
    n_new = mtable_read(spark, table_dir).count()
    if n_old != n_new:
        raise RuntimeError(
            f"mtable_compact row-count mismatch: {n_old} vs {n_new}"
        )
    return new_man


def mtable_sink(
    spark: SparkSession,
    table_dir: str,
    key: str | None = None,
    combine: dict[str, str] | None = None,
):
    """Exactly-once streaming sink into an mtable: a ``foreachBatch``
    function that APPENDS each micro-batch (or MERGES it by ``key`` —
    the batch must be key-UNIQUE: dedupe upstream with
    ``dropDuplicates``/a stateful last-write-wins, because a batch
    carrying two rows for one key has no well-defined upsert and
    ``mtable_merge`` refuses it loudly rather than committing an
    arbitrary winner) as one table version, with Spark's documented
    idempotent-sink
    contract implemented on the manifest — every commit records the
    epoch id it came from, and a REPLAYED epoch (post-crash recovery
    re-delivers the last uncommitted batch) is recognized and skipped,
    so at-least-once delivery × idempotent commit = exactly-once table
    contents. EMPTY micro-batches (no-data ticks, watermark-advance
    and recovery batches — Spark delivers these) are a no-op: an
    empty replay re-skips for free, so not recording their epoch is
    safe, and merge/combine modes never see a zero-key batch.

    The epoch check and the version publish are one single-writer
    manifest transaction (atomic pointer rename) in append mode, so a
    crash BETWEEN data-file write and manifest publish leaves orphan
    files (invisible to every reader; vacuum's job) and the replay
    commits cleanly — the standard write-ahead-of-publish recovery
    story. Merge mode annotates the merge's manifest with the epoch in
    a second atomic publish; a crash in that window makes the replay
    re-apply the SAME keyed upsert, which is idempotent by replace
    semantics — contents stay exactly-once either way, at the cost of
    one redundant (harmless) version on that recovery path.

    Usage::

        q = stream.writeStream.foreachBatch(
            mtable_sink(spark, table_dir, key="doc_id")
        ).option("checkpointLocation", ckpt).start()
    """

    def _commit(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return  # no-data / watermark-advance / recovery micro-batch
        try:
            man = read_manifest(table_dir)
        except FileNotFoundError:
            man = None
        if man is not None and epoch_id in set(man.get("epochs", [])):
            return  # replayed micro-batch: already committed
        if man is None:
            files = _new_data_files(table_dir, df)
            _write_manifest(
                table_dir, 0, files, {"op": "stream-append", "epochs": [epoch_id]}
            )
            return
        epochs = man.get("epochs", []) + [epoch_id]
        if combine is not None:
            # aggregate mode: the additive combine is NOT idempotent, so
            # the epoch record MUST ride the same atomic publish as the
            # data (extra_meta) — no replay window at all
            if key is None:
                raise ValueError("mtable_sink: combine mode needs key=")
            mtable_merge_agg(
                spark, table_dir, df, key, combine, extra_meta={"epochs": epochs}
            )
        elif key is None:
            files = man["files"] + _new_data_files(table_dir, df)
            meta = {"op": "stream-append", "epochs": epochs}
            _write_manifest(table_dir, man["version"] + 1, files, meta)
        else:
            new_man = mtable_merge(spark, table_dir, df, key)
            # annotate the merge commit with its epoch lineage (merge
            # wrote version N+1; rewrite its manifest with epochs —
            # same version, same files, one more atomic publish)
            _write_manifest(
                table_dir,
                new_man["version"],
                new_man["files"],
                {
                    k: v
                    for k, v in new_man.items()
                    if k not in ("version", "files")
                }
                | {"epochs": epochs},
                overwrite=True,
            )

    return _commit


_COMBINE_FNS = {"sum": F.sum, "max": F.max, "min": F.min}


def mtable_merge_agg(
    spark: SparkSession,
    table_dir: str,
    delta: DataFrame,
    key: str,
    combine: dict[str, str],
    extra_meta: dict | None = None,
    max_collect_keys: int = DEFAULT_MAX_COLLECT_KEYS,
    expected_version: int | None = None,
) -> dict:
    """Incremental AGGREGATE maintenance — the materialized-view
    refresh: the table holds per-``key`` aggregates, ``delta`` holds
    the new batch's partial aggregates for the same columns, and the
    commit COMBINES matched keys instead of replacing them
    (``combine``: column → 'sum' | 'max' | 'min' — the decomposable
    aggregates; avg ships as sum+count, distinct as a KMV column).

    Same copy-on-write discipline, count-gated file matching, and CAS
    commit as ``mtable_merge``: footer pruning picks the files whose
    key ranges intersect the delta, ONLY those are read; their matched
    rows re-aggregate together with the delta (one groupBy over
    matched-rows ∪ delta — both are per-key aggregates, so the
    combined groupBy is exact for decomposable functions), unmatched
    rows pass through, new keys insert. At 100 TB this is how a
    per-entity profile table absorbs a day's events without rescanning
    history: the delta is aggregated upstream (map-side, corpus-scale),
    the table touch is footer-pruned, and a corpus-scale delta key set
    never collects to the driver."""
    for col, fn in combine.items():
        if fn not in _COMBINE_FNS:
            raise ValueError(f"unsupported combine fn {fn!r} for {col!r}")
    man = read_manifest(table_dir)
    _check_expected(man, expected_version, table_dir)
    matched, untouched, n_keys, kdf, path = _plan_matched_files(
        spark, table_dir, man, delta, key, max_collect_keys,
        "mtable_merge_agg: empty delta",
    )
    kdf.unpersist()  # merge_agg re-aggregates whole matched files; no anti-join

    cols = [key] + sorted(combine)
    delta_sel = delta.select(*cols)
    if matched:
        old = spark.read.parquet(
            *[os.path.join(table_dir, f) for f in matched]
        ).select(*cols)
        pool = old.unionByName(delta_sel)
    else:
        pool = delta_sel
    combined = pool.groupBy(key).agg(
        *[_COMBINE_FNS[fn](c).alias(c) for c, fn in sorted(combine.items())]
    )
    new_files = _new_data_files(table_dir, combined.select(*cols))
    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        untouched + new_files,
        {
            "op": "merge-agg",
            "parent": man["version"],
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_delta_keys": n_keys,
            "key_match_path": path,
            **(extra_meta or {}),
        },
    )
    return read_manifest(table_dir)


def mtable_clone(src_dir: str, dst_dir: str) -> dict:
    """ZERO-COPY shallow clone (Delta CLONE's core move): publish a new
    table at ``dst_dir`` whose version 0 references the SOURCE's
    current data files by absolute path — no bytes move, the clone is
    O(manifest). Writes to the clone land new files under the clone's
    own directory (copy-on-write applies per table), so the two tables
    diverge independently from a shared immutable base.

    Contract (the standard shallow-clone caveat, made loud here): the
    clone depends on the source's files; ``mtable_vacuum`` only ever
    deletes files under its OWN table directory, so vacuuming the
    CLONE never touches shared bytes — but vacuuming the SOURCE can
    orphan a clone that still references pre-clone versions' files.
    The clone manifest records ``cloned_from`` so an operator can
    audit the dependency; promote to a full copy (read + rewrite) to
    sever it."""
    man = read_manifest(src_dir)
    os.makedirs(dst_dir, exist_ok=True)
    abs_files = [os.path.abspath(os.path.join(src_dir, f)) for f in man["files"]]
    _write_manifest(
        dst_dir,
        0,
        abs_files,
        {
            "op": "clone",
            "cloned_from": os.path.abspath(src_dir),
            "cloned_version": man["version"],
        },
    )
    return read_manifest(dst_dir)
