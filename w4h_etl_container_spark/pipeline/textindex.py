"""Materialized inverted text index — the artifact that turns BM25 from
a corpus scan into a file-pruned lookup (SURVEY §2.11 / §4 extension:
the same publish-an-artifact architecture as the curation job, applied
to retrieval).

``build_text_index`` writes three parquet artifacts under ``out_dir``:

* ``postings/``   — (token, doc_id, k): the per-document term counts,
                    laid out with ``cluster_by(token)`` so a scan
                    filtered to a query's terms touches only the files
                    whose token range can contain them (min/max
                    skipping — verified on real footer metadata in
                    tests);
* ``doc_lengths/`` — (doc_id, dl);
* ``stats/``       — one row: (n_docs, total_tokens).

``bm25_topk_from_index`` then scores a query set WITHOUT touching the
corpus: the postings read carries a pushed ``token IN (...)`` filter
(pruned at file level by the clustered layout), document frequencies
come from the pruned slice itself, and the arithmetic is expression-
for-expression the one ``plans/retrieval.py::q_bm25`` declares — so the
two paths are provably result-identical (pinned in tests), which is the
index-consistency property a real engine must maintain.

At 100 TB: the index build is the SAME one-explode + map-side-combined
aggregate every text operator already pays, plus one range shuffle for
the layout; the query path reads q·df(term) posting rows instead of the
corpus — sub-linear in corpus size for any fixed query set.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.layout import cluster_by
from w4h_etl_container_spark.plans.retrieval import BM25_B, BM25_K1, BM25_TOP_K
from w4h_etl_container_spark.plans.textops import _tokens
from w4h_etl_container_spark.session import read_table


def _write_index_manifest(index_dir: str, man: dict) -> None:
    """Atomically publish MANIFEST.json (tmp + rename): the manifest is
    the index's VISIBILITY SWITCH (tombstone gating) and its stats
    authority (n_docs / total_tokens feed idf and avgdl), so a torn
    half-written manifest must be impossible."""
    import uuid as _uuid

    path = os.path.join(index_dir, "MANIFEST.json")
    tmp = path + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.rename(tmp, path)


def _stats_df(spark: SparkSession, man: dict) -> DataFrame:
    """The 1-row (n_docs, avgdl) input to BM25 scoring, derived from
    the MANIFEST — the single atomically-written artifact — never from
    the stats parquet. The parquet stats file remains as a derived
    cache (rebuilt by build/compact, refreshed after deletes/appends),
    so a crash between the manifest commit and the cache refresh can
    never serve stale idf/avgdl: scores always reflect exactly the
    corpus the manifest declares."""
    return spark.createDataFrame(
        [(man["n_docs"], man["total_tokens"])], "n_docs long, total_tokens long"
    ).select(
        "n_docs",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("avgdl"),
    )


def build_text_index(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> dict:
    """Build the inverted index artifacts; returns the manifest dict
    (also written to ``out_dir/MANIFEST.json``)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    postings_path = os.path.join(out_dir, "postings")
    cluster_by(tf, ["token", "doc_id"], n_files=n_files).write.mode(
        "overwrite"
    ).parquet(postings_path)

    dl = tf.groupBy("doc_id").agg(F.sum("k").alias("dl"))
    dl_path = os.path.join(out_dir, "doc_lengths")
    dl.write.mode("overwrite").parquet(dl_path)

    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    stats_path = os.path.join(out_dir, "stats")
    stats.write.mode("overwrite").parquet(stats_path)

    row = spark.read.parquet(stats_path).collect()[0]
    manifest = {
        "n_docs": row["n_docs"],
        "total_tokens": row["total_tokens"],
        "artifacts": {
            "postings": postings_path,
            "doc_lengths": dl_path,
            "stats": stats_path,
        },
    }
    _write_index_manifest(out_dir, manifest)
    return manifest


def bm25_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    queries: tuple[tuple[int, tuple[str, ...]], ...],
    top_k: int = BM25_TOP_K,
) -> DataFrame:
    """BM25 top-k against the materialized index — result-identical to
    the direct ``q_bm25`` plan (same expressions over the same numbers;
    the only difference is WHERE the (doc, token, k) rows come from).

    The postings scan is filtered to the query terms BEFORE anything
    else — with the clustered layout that filter prunes at file level,
    so the touched bytes scale with Σ df(term), not the corpus."""
    from pyspark.sql import Window

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    terms = sorted({t for _, ts in queries for t in ts})
    postings = spark.read.parquet(os.path.join(index_dir, "postings")).where(
        F.col("token").isin(*terms)
    )
    postings = _without_tombstones(spark, index_dir, postings, man)
    dl = spark.read.parquet(os.path.join(index_dir, "doc_lengths"))
    stats = _stats_df(spark, man)
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in ts],
        "query_id int, term string",
    )
    df_t = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qidf = (
        qterms.join(df_t, qterms.term == df_t.token)
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "term",
            F.floor(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("idf_e6"),
        )
    )
    tf_norm = (
        F.col("k").cast("double") * F.lit(BM25_K1 + 1.0)
    ) / (
        F.col("k").cast("double")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        postings.join(F.broadcast(qidf), postings.token == qidf.term)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.floor(
                (F.col("idf_e6").cast("double") / F.lit(1000000.0))
                * tf_norm
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("c_e6"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_e6").alias("bm25_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_e6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select("query_id", "doc_id", "bm25_e6", "rnk")
    )


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _tombstones_df(
    spark: SparkSession, index_dir: str, man: dict
) -> DataFrame | None:
    """The ACKNOWLEDGED tombstone set: only files the manifest lists.
    A crashed delete's unreferenced tombstone file (written, never
    committed) is invisible — exactly the mtable orphan-data rule —
    so visibility and the manifest's corpus stats can never disagree."""
    files = man.get("tombstone_files", [])
    if not files:
        return None
    return spark.read.parquet(
        *[os.path.join(index_dir, f) for f in files]
    ).select("doc_id")


def _without_tombstones(
    spark: SparkSession, index_dir: str, df: DataFrame, man: dict | None = None
) -> DataFrame:
    """Anti-join ``df`` (any doc_id-keyed artifact slice) against the
    pending tombstone set — the single filter every read path goes
    through, so a deleted document can never score. The MANIFEST gates
    visibility (see ``_tombstones_df``): debris from a crashed delete
    filters nothing, matching the stats the manifest still declares.
    The tombstone set is delete-batch-sized (broadcast); with none
    pending this is the plain read."""
    if man is None:
        with open(os.path.join(index_dir, "MANIFEST.json")) as f:
            man = json.load(f)
    tomb = _tombstones_df(spark, index_dir, man)
    if tomb is None:
        return df
    return df.join(F.broadcast(tomb), "doc_id", "left_anti")


def delete_from_text_index(
    spark: SparkSession,
    index_dir: str,
    doc_ids: DataFrame,
    extra_meta: dict | None = None,
) -> dict:
    """DELETE documents from a published inverted index — the vector
    index's tombstone discipline, plus the twist lexical scoring
    demands: corpus statistics participate in every BM25 score (idf's
    n_docs, tf-normalization's avgdl), so the delete shifts
    (n_docs, total_tokens) in the same commit. Scores therefore
    reflect the shrunken corpus immediately and exactly — pinned in
    tests against a full rebuild on the surviving documents. Document
    frequencies come from the tombstone-filtered postings slice at
    query time, so they shrink consistently too.

    Crash-atomic in ONE artifact — the write-ahead-of-publish story:
    (1) the dead ids land in a FRESH tombstone file set under
    ``tombstones/`` that nothing references yet (a crash here leaves
    invisible debris, and a retry writes its own fresh set — no
    double-count possible); (2) the atomic manifest rename flips
    visibility (``tombstone_files`` gains the new set) AND the corpus
    stats together — scoring derives (n_docs, avgdl) from the
    manifest, see ``_stats_df``; (3) the stats parquet refreshes as a
    derived cache (a crash before it changes nothing readers use). A
    crash at any point leaves either the exact pre-delete index or
    the exact post-delete index, never a mix.

    O(batch) + one pruned doc_lengths aggregate; no posting file is
    touched (``compact_text_index_deletes`` is the physical purge).
    Ids not present (or already dead) are idempotent no-ops; a batch
    with NO live ids returns the manifest unchanged (true idempotent
    replay, matching ``mtable_delete``)."""
    import uuid as _uuid

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    dl = spark.read.parquet(man["artifacts"]["doc_lengths"])
    live = _without_tombstones(spark, index_dir, dl, man)
    dead = live.join(
        F.broadcast(doc_ids.select("doc_id").distinct()), "doc_id", "left_semi"
    ).persist()
    try:
        row = dead.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        if not row["n"]:
            return man  # nothing live to delete: idempotent no-op
        batch_rel = os.path.join("tombstones", f"batch-{_uuid.uuid4().hex}")
        dead.select("doc_id").write.parquet(os.path.join(index_dir, batch_rel))
    finally:
        dead.unpersist()
    man["n_docs"] -= row["n"]
    man["total_tokens"] -= row["t"]
    man["n_tombstones"] = man.get("n_tombstones", 0) + row["n"]
    man.setdefault("tombstone_files", []).append(batch_rel)
    man.setdefault("deletes", []).append({"n_docs": row["n"]})
    man.update(extra_meta or {})
    _write_index_manifest(index_dir, man)  # THE commit point
    spark.createDataFrame(
        [(man["n_docs"], man["total_tokens"])], "n_docs long, total_tokens long"
    ).write.mode("overwrite").parquet(man["artifacts"]["stats"])
    return man


def compact_text_index_deletes(
    spark: SparkSession,
    index_dir: str,
    n_files: int = 8,
    extra_meta: dict | None = None,
) -> dict:
    """Physically purge tombstoned documents. Unlike the vector index
    (cell-partitioned on the probe key, so deletes rewrite only
    affected partitions), postings are clustered by TOKEN while
    deletes are keyed by DOCUMENT — every posting file can hold a
    deleted doc's rows, so the purge is a full postings rewrite
    (re-clustered, so file-level token pruning is restored fresh).
    That asymmetry is inherent to inverted layouts (Lucene pays it as
    segment merges); the tombstone phase is what keeps individual
    deletes O(batch)."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    if man.get("n_tombstones", 0) == 0:
        return man
    import shutil
    import uuid as _uuid

    tomb = _tombstones_df(spark, index_dir, man)
    for art, cluster in (("postings", True), ("doc_lengths", False)):
        path = man["artifacts"][art]
        survivors = spark.read.parquet(path).join(
            F.broadcast(tomb), "doc_id", "left_anti"
        )
        tmp = path + f".compact-{_uuid.uuid4().hex}"
        if cluster:
            cluster_by(survivors, ["token", "doc_id"], n_files=n_files).write.parquet(tmp)
        else:
            survivors.write.parquet(tmp)
        old = path + f".old-{_uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    man["n_tombstones"] = 0
    man["tombstone_files"] = []
    man.setdefault("compactions", []).append({"op": "purge-deletes"})
    man.update(extra_meta or {})
    _write_index_manifest(index_dir, man)
    # drop the whole tombstones/ tree AFTER the commit — this also
    # sweeps any unreferenced debris a crashed delete left behind
    if os.path.isdir(_tombstone_path(index_dir)):
        shutil.rmtree(_tombstone_path(index_dir))
    return man


def compact_text_index_files(
    spark: SparkSession, index_dir: str, n_files: int = 8
) -> dict:
    """Recluster the postings into ``n_files`` token-ordered files and
    coalesce doc_lengths — the small-file repair for append churn.
    Every ``append_to_text_index`` lands its batch as ADDITIONAL
    posting files, so a probe's file-level token pruning degrades from
    one generation's tight ranges to touching every generation's
    matching files; reclustering restores build-fresh pruning. Rows
    are rewritten verbatim (tombstoned docs included — visibility
    stays with the anti-join until a deletes purge), so this composes
    with pending tombstones. Same tmp-write → rename-swap discipline
    as the deletes purge."""
    import shutil
    import uuid as _uuid

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    for art, cluster in (("postings", True), ("doc_lengths", False)):
        path = man["artifacts"][art]
        rows = spark.read.parquet(path)
        tmp = path + f".recluster-{_uuid.uuid4().hex}"
        if cluster:
            cluster_by(rows, ["token", "doc_id"], n_files=n_files).write.parquet(tmp)
        else:
            rows.repartition(1).write.parquet(tmp)
        old = path + f".old-{_uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    man.setdefault("compactions", []).append({"op": "recluster-files"})
    _write_index_manifest(index_dir, man)
    return man


def maintain_text_index(
    spark: SparkSession,
    index_dir: str,
    *,
    tombstone_max_docs: int = 1024,
    postings_files_max: int = 64,
    dry_run: bool = False,
) -> dict:
    """Maintenance POLICY for the inverted index — the WHEN layer over
    the existing primitives, mirroring ``mtable_maintain``: measure
    with driver metadata only (manifest counts, a directory listing,
    the 1-row stats cache), fire what is over threshold, report what
    was seen and done.

    Triggers:

    * ``purge-deletes``: pending tombstones exceed
      ``tombstone_max_docs`` — every query is paying the anti-join;
      the purge also reclusters, so it subsumes the small-file repair.
    * ``recluster-postings``: append churn fragmented the postings
      past ``postings_files_max`` files (file-level token pruning
      degrades with generations); fires alone only when no purge ran.
    * ``refresh-stats-cache``: the derived (n_docs, total_tokens)
      parquet disagrees with the manifest (a crash between manifest
      commit and cache refresh) — rewritten from the manifest, the
      source of truth."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    postings_files = [
        f
        for f in os.listdir(man["artifacts"]["postings"])
        if f.endswith(".parquet")
    ]
    srow = spark.read.parquet(man["artifacts"]["stats"]).collect()[0]
    cache_fresh = (
        srow["n_docs"] == man["n_docs"]
        and srow["total_tokens"] == man["total_tokens"]
    )
    triggers = []
    if man.get("n_tombstones", 0) > tombstone_max_docs:
        triggers.append("purge-deletes")
    if len(postings_files) > postings_files_max:
        triggers.append("recluster-postings")
    if not cache_fresh:
        triggers.append("refresh-stats-cache")
    report = {
        "measured": {
            "n_tombstones": man.get("n_tombstones", 0),
            "n_postings_files": len(postings_files),
            "n_appends": len(man.get("appends", [])),
            "stats_cache_fresh": cache_fresh,
        },
        "triggers": triggers,
        "actions": [],
        "dry_run": dry_run,
    }
    if dry_run:
        return report
    # rewrite into at most the policy's own threshold so one pass
    # CONVERGES (a purge that re-fragmented past postings_files_max
    # would re-trigger forever)
    out_files = max(1, min(8, postings_files_max))
    if "purge-deletes" in triggers:
        compact_text_index_deletes(spark, index_dir, n_files=out_files)
        report["actions"].append("purge-deletes")
    elif "recluster-postings" in triggers:
        compact_text_index_files(spark, index_dir, n_files=out_files)
        report["actions"].append("recluster-postings")
    if "refresh-stats-cache" in triggers:
        spark.createDataFrame(
            [(man["n_docs"], man["total_tokens"])],
            "n_docs long, total_tokens long",
        ).write.mode("overwrite").parquet(man["artifacts"]["stats"])
        report["actions"].append("refresh-stats-cache")
    return report


def append_to_text_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    n_files: int = 2,
    extra_meta: dict | None = None,
) -> dict:
    """Incrementally index a new document batch: the batch's term
    counts land as ADDITIONAL token-clustered posting files (file-level
    pruning still holds — every file, old or new, carries its own
    token min/max; a probe simply touches the new generation's
    matching files too), doc_lengths appends, and the 1-row stats
    table is REWRITTEN with the updated (n_docs, total_tokens) —
    BM25's idf/avgdl terms read stats at query time, so scores
    reflect the grown corpus immediately, exactly as a full rebuild
    would (pinned in tests: append == rebuild-from-union,
    row-identical through the query path).

    Contract: new doc_ids must be fresh — a replayed batch would
    double its postings; ``audit_text_index`` makes that loud
    (doc_lengths doc_id uniqueness + stats consistency), the same
    at-least-once posture as the vector index's append."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    toks = new_docs.where(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    dl = tf.groupBy("doc_id").agg(F.sum("k").alias("dl"))
    dl.cache()
    try:
        row = dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        if not row["n"]:
            raise ValueError("append_to_text_index: empty document batch")
        tomb = _tombstones_df(spark, index_dir, man)
        if tomb is not None:
            # a tombstone would silently hide a re-indexed doc — refuse
            # loudly; compact_text_index_deletes first, then re-append
            n_dead = dl.join(F.broadcast(tomb), "doc_id", "left_semi").count()
            if n_dead:
                raise ValueError(
                    f"append_to_text_index: {n_dead} doc_ids in the batch "
                    "are tombstoned; run compact_text_index_deletes before "
                    "re-indexing them"
                )
        cluster_by(tf, ["token", "doc_id"], n_files=n_files).write.mode(
            "append"
        ).parquet(man["artifacts"]["postings"])
        dl.write.mode("append").parquet(man["artifacts"]["doc_lengths"])
        man["n_docs"] += row["n"]
        man["total_tokens"] += row["t"]
        man.setdefault("appends", []).append({"n_docs": row["n"]})
        man.update(extra_meta or {})
        _write_index_manifest(index_dir, man)
        spark.createDataFrame(
            [(man["n_docs"], man["total_tokens"])], "n_docs long, total_tokens long"
        ).write.mode("overwrite").parquet(man["artifacts"]["stats"])
        return man
    finally:
        dl.unpersist()


def sync_text_index(
    spark: SparkSession,
    index_dir: str,
    table_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> dict:
    """CDC from a documents MTABLE into the serving index: apply the
    row-level change feed between two table versions
    (``pipeline.mtable.mtable_changes`` — O(churned files), keyed on
    ``doc_id``) so the index converges to the table's new snapshot
    WITHOUT re-indexing the corpus. Deletes and update pre-images
    tombstone (stats shift exactly); a purge compaction clears the
    tombstones (appending a tombstoned doc_id is refused by contract —
    an update IS delete + re-add, so the purge runs whenever updates
    or deletes exist, the Lucene segment-merge cost this layout pays
    by design); inserts and update post-images append as a fresh
    posting generation. Pinned in tests: sync == full rebuild on the
    new snapshot, row-identical through the BM25 query path.

    At corpus scale: the churn-sized delete/append batches are the
    cheap part; the purge is the postings rewrite every inverted
    layout amortizes (skip updates/deletes → tombstones pend, query
    path stays exact, purge later).

    RESUMABLE: every sync records its endpoint as
    ``synced_table_version`` in the index manifest — folded into the
    SAME atomic manifest publish as the last mutation it applies
    (extra_meta on the final delete/compact/append), so a crash at any
    point leaves either an un-advanced watermark with only idempotent
    deletes applied (replay converges) or the fully-applied sync with
    its watermark — never an applied append the resume would re-append.
    ``from_version=None`` resumes from the last sync (the first sync
    after an index built outside this loop must pass it explicitly —
    the index cannot know which table snapshot it was built from). A
    sync with nothing new is a no-op. Returns
    {inserted, updated, deleted, table_version} counts."""
    from w4h_etl_container_spark.pipeline.mtable import mtable_changes
    from w4h_etl_container_spark.pipeline.mtable import (
        read_manifest as _table_manifest,
    )

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        iman = json.load(f)
    if from_version is None:
        from_version = iman.get("synced_table_version")
        if from_version is None:
            raise ValueError(
                "sync_text_index: no synced_table_version recorded yet — "
                "pass from_version explicitly on the first sync (the table "
                "snapshot this index was built from)"
            )
    to_v = _table_manifest(table_dir, to_version)["version"]
    if to_v == from_version:
        return {"inserted": 0, "updated": 0, "deleted": 0, "table_version": to_v}
    # the watermark rides the LAST mutation's atomic manifest publish
    # (extra_meta): a crash anywhere inside the sync leaves the
    # watermark at the OLD version with at most a prefix of the
    # mutations applied — the replayed prefix is deletes/compaction
    # (idempotent no-ops) — never an applied-append with an
    # un-advanced watermark, which is the window that double-appended
    # postings before round 13
    wm = {
        "synced_table_version": to_v,
        "synced_table_dir": os.path.abspath(table_dir),
    }
    ch = mtable_changes(
        spark, table_dir, from_version, to_v, key="doc_id"
    ).persist()
    try:
        counts = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        dead = ch.where(F.col("_change_type").isin("delete", "update"))
        fresh = ch.where(
            F.col("_change_type").isin("insert", "update")
            & (F.length(F.trim("text")) > 0)  # empty docs are never indexed
        )
        has_fresh = bool(fresh.limit(1).count())
        if counts.get("delete", 0) or counts.get("update", 0):
            delete_from_text_index(spark, index_dir, dead.select("doc_id"))
            compact_text_index_deletes(
                spark, index_dir, extra_meta=None if has_fresh else wm
            )
        if has_fresh:
            append_to_text_index(
                spark, index_dir, fresh.select("doc_id", "text"),
                extra_meta=wm,
            )
    finally:
        ch.unpersist()
    if not has_fresh and not (counts.get("delete", 0) or counts.get("update", 0)):
        # empty feed across a committed-but-rowless window: nothing was
        # applied, so a standalone watermark bump is replay-safe
        with open(os.path.join(index_dir, "MANIFEST.json")) as f:
            iman = json.load(f)
        iman.update(wm)
        _write_index_manifest(index_dir, iman)
    return {
        "inserted": counts.get("insert", 0),
        "updated": counts.get("update", 0),
        "deleted": counts.get("delete", 0),
        "table_version": to_v,
    }


def audit_text_index(spark: SparkSession, index_dir: str) -> dict:
    """One-pass consistency audit: manifest counts vs LIVE doc_lengths
    rows (tombstone-filtered — the audit counts what queries can score)
    vs distinct doc_ids vs recomputed token total. A replayed append
    (duplicate doc_ids) shows up here; a pending delete batch is
    visible as n_tombstones > 0 but never breaks consistency. The
    stats parquet is a derived CACHE (scoring reads the manifest, see
    ``_stats_df``), so its freshness is reported separately — a stale
    cache (crash between manifest commit and cache refresh) degrades
    nothing and never flips ``consistent``."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    dl = _without_tombstones(
        spark, index_dir, spark.read.parquet(man["artifacts"]["doc_lengths"]), man
    )
    row = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("nd"),
        F.sum("dl").alias("t"),
    ).collect()[0]
    srow = spark.read.parquet(man["artifacts"]["stats"]).collect()[0]
    return {
        "manifest_docs": man["n_docs"],
        "doc_lengths_rows": row["n"],
        "distinct_doc_ids": row["nd"],
        "manifest_tokens": man["total_tokens"],
        "recomputed_tokens": row["t"],
        "stats_docs": srow["n_docs"],
        "n_tombstones": man.get("n_tombstones", 0),
        "stats_cache_fresh": srow["n_docs"] == man["n_docs"]
        and srow["total_tokens"] == man["total_tokens"],
        "consistent": man["n_docs"] == row["n"] == row["nd"]
        and man["total_tokens"] == row["t"],
    }


def rrf_fusion_indexed(
    spark: SparkSession,
    sf_dir: str,
    text_index_dir: str,
    vector_index_dir: str,
    queries=None,
    top_k: int = BM25_TOP_K,
    nprobe: int = 2,
    rerank: int | None = 40,
    rrf_k: int = 60,
    rrf_scale: int = 1_000_000_000,
) -> DataFrame:
    """The PRODUCTION hybrid-retrieval serving path: reciprocal-rank
    fusion over MATERIALIZED artifacts — the lexical arm reads the
    token-clustered inverted index (``bm25_topk_from_index``, pinned
    row-identical to the declared q_bm25) and the vector arm probes
    the IVF-PQ index with exact re-rank
    (``pipeline.vectorindex.search_index``, the IVFADC+R path whose
    recall curve PERF.md measures). Fusion arithmetic is the declared
    q_rrf_fusion contract verbatim: integer points
    ``rrf_scale div (rrf_k + rank)`` per arm, summed, doc_id
    tie-break — so the composed path differs from the declared query
    ONLY by where each arm's candidates come from (index probes vs
    corpus scans), which is the entire point of the artifacts.

    At 100 TB: the lexical arm reads Σ df(term) pruned posting rows,
    the vector arm reads nprobe/k of the corpus as 8-byte codes plus
    an R-row exact re-rank — neither arm scans the corpus, and the
    fusion itself touches ≤ 2·queries·top_k rows."""
    from pyspark.sql import Window

    from w4h_etl_container_spark.pipeline.vectorindex import search_index
    from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES

    queries = BM25_QUERIES if queries is None else queries
    lex = bm25_topk_from_index(spark, text_index_dir, queries, top_k).select(
        "query_id", "doc_id", F.col("rnk").alias("lex_rnk")
    )
    qids = [qid for qid, _ in queries]
    vec_raw = search_index(
        spark,
        sf_dir,
        vector_index_dir,
        n_queries=max(qids) + 1,
        nprobe=nprobe,
        top_k=top_k,
        rerank=rerank,
    ).where(F.col("query_id").isin(qids))
    # search_index ranks within its own query set; re-rank within ours
    order_col = "dist2_e6" if rerank is not None else "adc_e6"
    wv = Window.partitionBy("query_id").orderBy(
        F.col(order_col).asc_nulls_last(), "cand_id"
    )
    vec = (
        vec_raw.withColumn("vec_rnk", F.row_number().over(wv))
        .where(F.col("vec_rnk") <= top_k)
        .select("query_id", F.col("cand_id").alias("doc_id"), "vec_rnk")
    )
    pts = lambda rnk: F.expr(f"{rrf_scale}L div ({rrf_k} + {rnk})")  # noqa: E731
    contribs = lex.select(
        "query_id", "doc_id", pts("lex_rnk").alias("pts"),
        F.lit(1).alias("lex"), F.lit(0).alias("vec"),
    ).unionByName(
        vec.select(
            "query_id", "doc_id", pts("vec_rnk").alias("pts"),
            F.lit(0).alias("lex"), F.lit(1).alias("vec"),
        )
    )
    fused = contribs.groupBy("query_id", "doc_id").agg(
        F.sum("pts").cast("long").alias("rrf_e9"),
        (F.sum("lex") > 0).alias("in_lexical"),
        (F.sum("vec") > 0).alias("in_vector"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf_e9").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= top_k)
        .select("query_id", "doc_id", "rrf_e9", "in_lexical", "in_vector", "rnk")
    )
