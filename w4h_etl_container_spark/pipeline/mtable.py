"""Manifest table ("mtable") — minimal copy-on-write table format for
mutable datasets: MERGE (upsert) that rewrites ONLY the data files
containing matched keys, snapshot-isolated readers, time travel, and
vacuum. The lakehouse mechanics (Delta/Iceberg's core loop) rendered
in ~150 lines on plain parquet + a JSON manifest, because the engine's
100 TB story needs a mutation path that does not rewrite the table:

* a TABLE is a directory of immutable parquet data files plus
  ``_manifests/v{N}.json`` listing the files of version N and
  ``_latest`` naming the current version (written via atomic rename,
  so a reader resolves one consistent file list — snapshot isolation
  for free on a POSIX dir; on object stores the pointer write is the
  usual single-key atomic PUT);
* MERGE = footer-level pruning (per-file min/max of the merge key —
  the ``pruning_report`` honesty) intersected with the update batch's
  EXACT key set → read only matched files → anti-join out old rows →
  union the update batch → write new files → publish manifest N+1
  re-listing untouched files verbatim. Untouched bytes are never
  read, never rewritten;
* old versions stay readable (time travel) until ``vacuum`` deletes
  files unreferenced by any retained manifest.

Surface: ``mtable_create`` / ``mtable_read`` (versioned) /
``mtable_merge`` (keyed upsert) / ``mtable_delete`` /
``mtable_merge_agg`` (incremental aggregate maintenance — the
materialized-view refresh) / ``mtable_compact`` (compaction as a
version) / ``mtable_vacuum`` / ``mtable_sink`` (exactly-once
foreachBatch append / keyed merge / replay-safe additive combine).
Keys may be numeric or string (footer stats decode; uncomparable
stats conservatively match). Model-checked against a dict reference
and crash-tested (orphan generations reader-invisible, vacuumed).

Single-writer by contract (the reference pipeline's lock-document
protocol — ``pipeline/state.py`` — is the coordination layer when
multiple jobs may write). No reference analog; extension mandated by
BASELINE.json's operational surface.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_LATEST = "_latest"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def _write_manifest(table_dir: str, version: int, files: list[str], meta: dict) -> None:
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    man = {"version": version, "files": sorted(files), **meta}
    path = _manifest_path(table_dir, version)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.rename(tmp, path)
    # the pointer flip is the commit: readers that resolved the old
    # pointer keep a consistent old file list (those files still exist)
    ptr_tmp = os.path.join(table_dir, f".{_LATEST}.tmp-{uuid.uuid4().hex}")
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.rename(ptr_tmp, os.path.join(table_dir, _LATEST))


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        with open(os.path.join(table_dir, _LATEST)) as f:
            version = int(f.read().strip())
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
    metadata-only, no data read. A file whose stats are absent or not
    comparable to the key's Python type reports ``None``, which every
    consumer treats as MATCHED (conservative: unprunable files are
    read, never skipped — the pruning_report failure direction).
    String-key stats surface as ``bytes`` from the footer and are
    decoded so ``<=`` against Python strings is well-typed."""
    import pyarrow.parquet as pq

    def _norm(v):
        return v.decode("utf-8", "surrogateescape") if isinstance(v, bytes) else v

    out = {}
    for rel in files:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(key)
        mins, maxs = [], []
        try:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(_norm(st.min))
                    maxs.append(_norm(st.max))
            out[rel] = (min(mins), max(maxs)) if mins else None
        except TypeError:
            out[rel] = None
    return out


def mtable_merge(
    spark: SparkSession, table_dir: str, updates: DataFrame, key: str
) -> dict:
    """MERGE (upsert) ``updates`` by ``key``: rows whose key exists are
    replaced, new keys are inserted. Copy-on-write limited to MATCHED
    files: candidate files come from footer min/max ∩ the batch's key
    set (exact keys, collected — an update batch is bounded by
    contract; corpus-scale restatements are a rewrite job, not a
    merge), only those files are read/anti-joined/rewritten, every
    untouched file is re-listed verbatim in the next manifest.

    Returns the new manifest (also records files_rewritten /
    files_untouched so the no-table-rewrite property is observable)."""
    man = read_manifest(table_dir)
    keys = [r[0] for r in updates.select(key).distinct().collect()]
    if not keys:
        raise ValueError("mtable_merge: empty update batch")
    kmin, kmax = min(keys), max(keys)
    kset = set(keys)
    ranges = _file_key_ranges(table_dir, man["files"], key)
    matched = [
        f
        for f, rng in ranges.items()
        if rng is None
        or (rng[0] <= kmax and kmin <= rng[1] and any(rng[0] <= k <= rng[1] for k in kset))
    ]
    untouched = [f for f in man["files"] if f not in set(matched)]

    new_files: list[str] = []
    if matched:
        old = spark.read.parquet(*[os.path.join(table_dir, f) for f in matched])
        survivors = old.join(
            F.broadcast(updates.select(key).distinct()), key, "left_anti"
        )
        combined = survivors.unionByName(updates)
    else:
        combined = updates
    new_files = _new_data_files(table_dir, combined)

    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        untouched + new_files,
        {
            "op": "merge",
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_update_keys": len(kset),
        },
    )
    return read_manifest(table_dir)


def mtable_vacuum(table_dir: str, retain_versions: int = 1) -> dict:
    """Delete data files unreferenced by the ``retain_versions`` most
    recent manifests (and drop the older manifests). Time travel
    shrinks to the retained window; the current version is always
    retained."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")
    )
    keep_versions = versions[-max(1, retain_versions):]
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
    spark: SparkSession, table_dir: str, keys: DataFrame, key: str
) -> dict:
    """DELETE by key set — the MERGE machinery minus the insert: only
    files whose footer range intersects the key set are read and
    rewritten without the deleted rows; everything else is re-listed
    verbatim. A key that matches nothing still commits a (no-op-ish)
    version — deletes are idempotent by construction."""
    man = read_manifest(table_dir)
    kvals = [r[0] for r in keys.select(key).distinct().collect()]
    if not kvals:
        raise ValueError("mtable_delete: empty key set")
    kmin, kmax = min(kvals), max(kvals)
    kset = set(kvals)
    ranges = _file_key_ranges(table_dir, man["files"], key)
    matched = [
        f
        for f, rng in ranges.items()
        if rng is None
        or (rng[0] <= kmax and kmin <= rng[1] and any(rng[0] <= k <= rng[1] for k in kset))
    ]
    untouched = [f for f in man["files"] if f not in set(matched)]
    new_files: list[str] = []
    if matched:
        old = spark.read.parquet(*[os.path.join(table_dir, f) for f in matched])
        survivors = old.join(
            F.broadcast(keys.select(key).distinct()), key, "left_anti"
        )
        if survivors.limit(1).count():
            new_files = _new_data_files(table_dir, survivors)
    version = man["version"] + 1
    _write_manifest(
        table_dir,
        version,
        untouched + new_files,
        {
            "op": "delete",
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_delete_keys": len(kset),
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
    function that APPENDS each micro-batch (or MERGES it by ``key``)
    as one table version, with Spark's documented idempotent-sink
    contract implemented on the manifest — every commit records the
    epoch id it came from, and a REPLAYED epoch (post-crash recovery
    re-delivers the last uncommitted batch) is recognized and skipped,
    so at-least-once delivery × idempotent commit = exactly-once table
    contents.

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
) -> dict:
    """Incremental AGGREGATE maintenance — the materialized-view
    refresh: the table holds per-``key`` aggregates, ``delta`` holds
    the new batch's partial aggregates for the same columns, and the
    commit COMBINES matched keys instead of replacing them
    (``combine``: column → 'sum' | 'max' | 'min' — the decomposable
    aggregates; avg ships as sum+count, distinct as a KMV column).

    Same copy-on-write discipline as ``mtable_merge``: footer pruning
    picks the files whose key ranges intersect the delta, ONLY those
    are read; their matched rows re-aggregate together with the delta
    (one groupBy over matched-rows ∪ delta — both are per-key
    aggregates, so the combined groupBy is exact for decomposable
    functions), unmatched rows pass through, new keys insert. At
    100 TB this is how a per-entity profile table absorbs a day's
    events without rescanning history: the delta is aggregated
    upstream (map-side, corpus-scale), the table touch is
    footer-pruned."""
    for col, fn in combine.items():
        if fn not in _COMBINE_FNS:
            raise ValueError(f"unsupported combine fn {fn!r} for {col!r}")
    man = read_manifest(table_dir)
    keys = [r[0] for r in delta.select(key).distinct().collect()]
    if not keys:
        raise ValueError("mtable_merge_agg: empty delta")
    kmin, kmax = min(keys), max(keys)
    kset = set(keys)
    ranges = _file_key_ranges(table_dir, man["files"], key)
    matched = [
        f
        for f, rng in ranges.items()
        if rng is None
        or (rng[0] <= kmax and kmin <= rng[1] and any(rng[0] <= k <= rng[1] for k in kset))
    ]
    untouched = [f for f in man["files"] if f not in set(matched)]

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
            "files_rewritten": len(matched),
            "files_untouched": len(untouched),
            "n_delta_keys": len(kset),
            **(extra_meta or {}),
        },
    )
    return read_manifest(table_dir)
