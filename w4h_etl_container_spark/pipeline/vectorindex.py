"""Materialized ANN index — the vector twin of the text index
(pipeline/textindex.py): train the coarse quantizer and the PQ
codebooks, encode the corpus ONCE, and publish the cell-partitioned
artifact a serving tier probes — so queries touch nprobe cells of
8-byte codes instead of scanning floats.

Artifacts under ``out_dir``:

* ``cells/``     — (vec_id, centroid_id, code): every vector's IVF cell
                   assignment and packed PQ code, written partitioned by
                   ``centroid_id`` so a probe reads only its cells'
                   directories (partition pruning — verified in tests);
* ``centroids/`` — the trained (k, d) coarse centroids, one row per
                   (centroid_id, dim, value) — tiny, broadcast at load;
* ``codebooks/`` — the trained (m, k, dsub) PQ codebooks in the same
                   long form;
* ``MANIFEST.json`` — counts + training distortion history, so a rerun
                   is verifiable without re-reading the data.

``search_index`` then answers top-k: load the tiny model artifacts,
probe the query's nearest cells (the q_ann_probe restriction), and rank
by ADC over the stored codes (the q_pq_adc scoring) — pinned in tests
to agree with computing the same thing directly from the raw vectors
(the index-consistency property).

At 10^10 vectors: the build is one training sample + two kernel passes
+ one partitioned write; the read path is nprobe/k of the corpus at
8 B/vector. Rebuild = rerun (overwrite-idempotent, deterministic).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.functions.vectorkernels import (
    make_ivf_assign_udf,
    make_ivf_probe_udf,
    make_pq_adc_udf,
    make_pq_encode_udf,
)
from w4h_etl_container_spark.operators.ivfindex import pq_train, train_ivf_centroids
from w4h_etl_container_spark.session import read_embeddings


def _write_index_manifest(index_dir: str, man: dict) -> None:
    """Atomically publish MANIFEST.json (tmp + rename): the manifest
    gates tombstone visibility and carries the live count, so a torn
    half-written manifest must be impossible."""
    import uuid as _uuid

    path = os.path.join(index_dir, "MANIFEST.json")
    tmp = path + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.rename(tmp, path)


def _matrix_to_df(spark: SparkSession, name: str, arr: np.ndarray) -> DataFrame:
    rows = [
        (int(i), int(j), float(v))
        for i, row in enumerate(arr.reshape(arr.shape[0], -1))
        for j, v in enumerate(row)
    ]
    return spark.createDataFrame(rows, f"{name}_id int, flat_dim int, value double")


def _df_to_matrix(df: DataFrame, name: str, shape: tuple) -> np.ndarray:
    arr = np.zeros((shape[0], int(np.prod(shape[1:]))), dtype=np.float64)
    for r in df.collect():
        arr[r[f"{name}_id"], r["flat_dim"]] = r["value"]
    return arr.reshape(shape)


def build_vector_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_centroids: int = 4,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
) -> dict:
    """Train, encode, publish; returns the manifest dict."""
    emb = read_embeddings(spark, sf_dir)
    centroids, ivf_hist = train_ivf_centroids(emb, k=n_centroids, iters=iters)
    codebooks, pq_hist = pq_train(emb, m=m, k=k, iters=iters)

    assign_udf = make_ivf_assign_udf(centroids)
    bits = max(1, (k - 1).bit_length())
    encode_udf = make_pq_encode_udf(codebooks, bits)
    cells = emb.select(
        "vec_id",
        assign_udf("embedding")["centroid_id"].alias("centroid_id"),
        encode_udf("embedding").alias("code"),
    )
    cells_path = os.path.join(out_dir, "cells")
    cells.write.mode("overwrite").partitionBy("centroid_id").parquet(cells_path)

    cent_path = os.path.join(out_dir, "centroids")
    _matrix_to_df(spark, "centroid", centroids).write.mode("overwrite").parquet(cent_path)
    cb_path = os.path.join(out_dir, "codebooks")
    _matrix_to_df(spark, "codebook", codebooks.reshape(m, -1)).write.mode(
        "overwrite"
    ).parquet(cb_path)

    # training-time cell occupancy: the drift baseline audit_index
    # compares live occupancy against (a frozen model assigns drifted
    # data into ever-fewer cells — the silent recall killer of
    # append_to_index; see audit_index's needs_retrain)
    occupancy = {
        str(r["centroid_id"]): r["n"]
        for r in spark.read.parquet(cells_path)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    manifest = {
        "n_vectors": emb.count(),
        "training_occupancy": occupancy,
        "n_centroids": n_centroids,
        "pq": {"m": m, "k": k, "bits": bits},
        "dim": int(centroids.shape[1]),
        "ivf_distortion": ivf_hist,
        "pq_distortion": pq_hist,
        "artifacts": {
            "cells": cells_path,
            "centroids": cent_path,
            "codebooks": cb_path,
        },
    }
    _write_index_manifest(out_dir, manifest)
    return manifest


def search_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    n_queries: int = 8,
    nprobe: int = 2,
    top_k: int = 5,
    rerank: int | None = None,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k from the published artifacts: probe the query's
    ``nprobe`` nearest cells (partition-pruned read of ``cells/``),
    rank by ADC over the stored codes. Self-matches excluded.

    ``allowed_ids`` (a DataFrame with a ``vec_id`` column) turns this
    into FILTERED ANN — the production shape where a metadata
    predicate (language, license, date range) restricts the candidate
    pool: the filter applies as a semi-join on the cell scan BEFORE
    any distance work, so excluded vectors cost nothing downstream and
    the top-k is exact over the allowed set within the probed cells
    (pre-filtering, not post-filtering — a post-filter of an
    unfiltered top-k can return fewer than k). Broadcast when small;
    a corpus-scale allow-set shuffles on vec_id like any semi-join.

    ``rerank=R`` adds the IVFADC+R refinement (Jégou et al. 2011 §V):
    the ADC pass shortlists R candidates per query, which join back to
    their raw vectors (an equi-join on vec_id over R·n_queries rows —
    a point-lookup's worth of float reads, not a corpus scan) and the
    final top_k ranks by EXACT squared L2. This is the production
    serving path: ADC's 8-byte-code scan does the corpus-scale
    winnowing, exact distances fix its quantization-error rank flips,
    and recall is then bounded by cell coverage (nprobe) alone — the
    property ``plans.vectors.ann_recall`` measures. Output gains the
    exact ``dist2_e6`` next to the shortlist's ``adc_e6``."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    m, k, bits = man["pq"]["m"], man["pq"]["k"], man["pq"]["bits"]
    d = man["dim"]
    centroids = _df_to_matrix(
        spark.read.parquet(man["artifacts"]["centroids"]),
        "centroid",
        (man["n_centroids"], d),
    )
    codebooks = _df_to_matrix(
        spark.read.parquet(man["artifacts"]["codebooks"]), "codebook", (m, k, d // m)
    )
    probe_udf = make_ivf_probe_udf(centroids, nprobe)
    adc_udf = make_pq_adc_udf(codebooks, bits)

    queries = (
        read_embeddings(spark, sf_dir)
        .where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(probe_udf("embedding")).alias("centroid_id"),
        )
    )
    live = _live_cells(spark, index_dir, man)
    if allowed_ids is not None:
        live = live.join(
            allowed_ids.select("vec_id").distinct(), "vec_id", "left_semi"
        )
    cells = live.select(
        F.col("vec_id").alias("cand_id"), "code", "centroid_id"
    )
    scored = (
        cells.join(F.broadcast(queries), "centroid_id")
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", adc_udf("qe", "code").alias("adc_e6"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_e6").asc_nulls_last(), "cand_id"
    )
    if rerank is None:
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= top_k)
            .select("query_id", "cand_id", "adc_e6", "rnk")
        )
    from w4h_etl_container_spark.functions.vectorkernels import make_dist2_e6_udf

    shortlist = (
        scored.withColumn("arnk", F.row_number().over(w))
        .where(F.col("arnk") <= max(rerank, top_k))
        .drop("arnk")
    )
    raw = read_embeddings(spark, sf_dir).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    )
    qvec = read_embeddings(spark, sf_dir).where(
        F.col("vec_id") < n_queries
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    exact = (
        shortlist.join(raw, "cand_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "cand_id",
            "adc_e6",
            make_dist2_e6_udf()("qe", "ce").alias("dist2_e6"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("dist2_e6").asc_nulls_last(), "cand_id"
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= top_k)
        .select("query_id", "cand_id", "adc_e6", "dist2_e6", "rnk")
    )


def append_to_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    extra_meta: dict | None = None,
) -> dict:
    """Incrementally add vectors to a published index WITHOUT
    retraining: assign each new vector to its cell with the index's
    OWN centroids and encode it with the index's OWN codebooks (the
    standard IVF maintenance contract — the model is frozen between
    rebuilds, so old and new codes stay mutually comparable under
    ADC), then append to ``cells/`` — new parquet files land inside
    the existing ``centroid_id=`` partition directories, so probes
    stay partition-pruned with zero rewrite of existing data.

    At 10^10 vectors this is the ingestion path: a rebuild re-encodes
    the corpus (two kernel passes); an append touches only the new
    batch. Drift caveat (documented, audited): appended vectors were
    not in the training sample, so distortion degrades as the
    distribution moves — MANIFEST records per-append counts so an
    operator can schedule retrains; ``audit_index`` checks
    manifest-vs-cells consistency and vec_id uniqueness (appends are
    at-least-once only if the caller replays a batch — the audit
    makes that loud rather than silent).

    Returns the updated manifest."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    m, k, bits = man["pq"]["m"], man["pq"]["k"], man["pq"]["bits"]
    d = man["dim"]
    centroids = _df_to_matrix(
        spark.read.parquet(man["artifacts"]["centroids"]),
        "centroid",
        (man["n_centroids"], d),
    )
    codebooks = _df_to_matrix(
        spark.read.parquet(man["artifacts"]["codebooks"]), "codebook", (m, k, d // m)
    )
    assign_udf = make_ivf_assign_udf(centroids)
    encode_udf = make_pq_encode_udf(codebooks, bits)
    batch = new_vectors.select(
        "vec_id",
        assign_udf("embedding")["centroid_id"].alias("centroid_id"),
        encode_udf("embedding").alias("code"),
    )
    n_new = batch.count()
    if n_new == 0:
        raise ValueError("append_to_index: empty vector batch")
    tomb = _tombstones_df(spark, index_dir, man)
    if tomb is not None:
        # a tombstone would silently hide a re-appended id — refuse
        # loudly; compact_index_deletes first, then re-append
        n_dead = batch.join(F.broadcast(tomb), "vec_id", "left_semi").count()
        if n_dead:
            raise ValueError(
                f"append_to_index: {n_dead} vec_ids in the batch are "
                "tombstoned; run compact_index_deletes before re-appending"
            )
    batch.write.mode("append").partitionBy("centroid_id").parquet(
        man["artifacts"]["cells"]
    )
    man["n_vectors"] = man["n_vectors"] + n_new
    man.setdefault("appends", []).append({"n": n_new})
    man.update(extra_meta or {})
    _write_index_manifest(index_dir, man)
    return man


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _tombstones_df(
    spark: SparkSession, index_dir: str, man: dict
) -> DataFrame | None:
    """The ACKNOWLEDGED tombstone set: only files the manifest lists
    (``tombstone_files``). A crashed delete's unreferenced batch dir
    (written, never committed) is invisible — the mtable orphan-data
    rule — so visibility and the manifest's live count can never
    disagree."""
    files = man.get("tombstone_files", [])
    if not files:
        return None
    return spark.read.parquet(
        *[os.path.join(index_dir, f) for f in files]
    ).select("vec_id")


def _visible_cells(spark: SparkSession, man: dict):
    """The cells scan restricted to partitions the MANIFEST acknowledges:
    ``centroid_id < n_centroids`` hides fresh partitions a crashed
    ``retrain_cells`` renamed in before its commit point (their ids are
    allocated only by the manifest flip), and ``dead_centroids`` hides
    split cells whose replacement committed but whose old directory has
    not been swept yet. Both are partition-column predicates — Spark
    prunes the directories, so the guard costs no I/O. Every consumer
    (search, audit, compaction, retrain itself) reads through here; a
    crash at ANY point in a retrain therefore leaves the served index
    exactly at one of the two manifest states, never a mix."""
    cells = spark.read.parquet(man["artifacts"]["cells"]).where(
        F.col("centroid_id") < man["n_centroids"]
    )
    dead = man.get("dead_centroids", [])
    if dead:
        cells = cells.where(~F.col("centroid_id").isin(dead))
    return cells


def _live_cells(spark: SparkSession, index_dir: str, man: dict):
    """The cells table minus tombstoned vec_ids — the single read path
    every consumer (search, audit, compaction) goes through, so a
    deleted vector can never leak back into a result. The tombstone
    set is delete-batch-sized (broadcast anti-join); when no deletes
    are pending the read is the plain partition-pruned scan."""
    cells = _visible_cells(spark, man)
    tomb = _tombstones_df(spark, index_dir, man)
    if tomb is not None:
        cells = cells.join(F.broadcast(tomb), "vec_id", "left_anti")
    return cells


def delete_from_index(
    spark: SparkSession,
    index_dir: str,
    vec_ids: DataFrame,
    extra_meta: dict | None = None,
) -> dict:
    """DELETE vectors from a published index — the mtable DELETE
    discipline composed with the IVF layout. Phase 1 (this call) is a
    TOMBSTONE append: O(batch) work, zero touch of the cell files;
    ``search_index`` / ``audit_index`` anti-join the tombstones so a
    deleted vec_id is immediately unservable. Phase 2
    (``compact_index_deletes``) physically rewrites ONLY the affected
    ``centroid_id=`` partitions and clears the tombstones — exactly
    the copy-on-write footprint mtable_delete has on its matched
    files. Ids not present (or already dead) are idempotent no-ops; a
    batch with NO live ids returns the manifest unchanged (true
    idempotent replay, matching ``mtable_delete`` — a crashed-then-
    retried delete whose first attempt committed succeeds silently).
    The manifest's n_vectors tracks LIVE vectors throughout.

    Crash-atomic: the dead ids land in a FRESH batch dir under
    ``tombstones/`` that nothing references, then the atomic manifest
    rename flips visibility (``tombstone_files``) and the live count
    together — a crash between the two leaves invisible debris that
    the next compaction sweeps, never a half-applied delete.

    At 10^10 vectors: deletes are a streamed tombstone append; the
    partition rewrite amortizes over many delete batches and touches
    nprobe-style slices of the corpus, never the whole index."""
    import uuid as _uuid

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    # only ids that are actually live become tombstones (idempotence)
    live = _live_cells(spark, index_dir, man).select("vec_id")
    dead = vec_ids.select("vec_id").distinct().join(live, "vec_id", "left_semi")
    n_dead = dead.count()
    if n_dead == 0:
        return man  # nothing live to delete: idempotent no-op
    batch_rel = os.path.join("tombstones", f"batch-{_uuid.uuid4().hex}")
    dead.write.parquet(os.path.join(index_dir, batch_rel))
    man["n_vectors"] = man["n_vectors"] - n_dead
    man["n_tombstones"] = man.get("n_tombstones", 0) + n_dead
    man.setdefault("tombstone_files", []).append(batch_rel)
    man.setdefault("deletes", []).append({"n": n_dead})
    man.update(extra_meta or {})
    _write_index_manifest(index_dir, man)  # THE commit point
    return man


def compact_index_deletes(
    spark: SparkSession, index_dir: str, extra_meta: dict | None = None
) -> dict:
    """Physically purge tombstoned vectors: rewrite ONLY the
    ``centroid_id=`` partitions that contain a tombstoned row (dynamic
    partition overwrite — untouched cells' files are never read or
    rewritten), drop partition directories the purge fully emptied,
    then clear the tombstone set. ``audit_index`` is consistent before
    and after; ``search_index`` results are identical across the
    compaction (the anti-join and the rewrite remove the same rows)."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    if man.get("n_tombstones", 0) == 0:
        return man  # nothing pending
    cells_path = man["artifacts"]["cells"]
    cells = _visible_cells(spark, man)
    tomb = _tombstones_df(spark, index_dir, man)
    affected = sorted(
        r["centroid_id"]
        for r in cells.join(F.broadcast(tomb), "vec_id", "left_semi")
        .select("centroid_id")
        .distinct()
        .collect()
    )
    survivors = (
        cells.where(F.col("centroid_id").isin(affected))
        .join(F.broadcast(tomb), "vec_id", "left_anti")
        .select("vec_id", "code", "centroid_id")
    )
    kept_cids = {
        r["centroid_id"]
        for r in survivors.select("centroid_id").distinct().collect()
    }
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("centroid_id")
        .parquet(cells_path)
    )
    # dynamic overwrite can't clear a partition that produced NO rows —
    # fully-emptied cells are removed directly (same POSIX-artifact
    # contract as the mtable layout)
    import shutil

    for cid in affected:
        if cid not in kept_cids:
            sub = os.path.join(cells_path, f"centroid_id={cid}")
            if os.path.isdir(sub):
                shutil.rmtree(sub)
    man["n_tombstones"] = 0
    man["tombstone_files"] = []
    man.setdefault("compactions", []).append({"partitions_rewritten": len(affected)})
    man.update(extra_meta or {})
    _write_index_manifest(index_dir, man)
    # drop the whole tombstones/ tree AFTER the commit — this also
    # sweeps any unreferenced debris a crashed delete left behind
    if os.path.isdir(_tombstone_path(index_dir)):
        shutil.rmtree(_tombstone_path(index_dir))
    return man


def sync_vector_index(
    spark: SparkSession,
    index_dir: str,
    table_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> dict:
    """CDC from an embeddings MTABLE into the ANN index: apply the
    row-level change feed between two table versions
    (``pipeline.mtable.mtable_changes`` — O(churned files), keyed on
    ``vec_id``). Deletes and update pre-images tombstone; a purge
    compaction clears them (re-appending a tombstoned id is refused
    by contract — an update IS delete + re-add, and the compaction
    rewrites ONLY the affected ``centroid_id=`` partitions, the
    cheap half of this layout's maintenance); inserts and update
    post-images encode with the index's FROZEN model and append
    inside the existing partitions. The index therefore converges to
    exactly what frozen-model maintenance defines: live cells equal
    the new snapshot assigned+encoded under the training-time
    centroids/codebooks (pinned in tests). Model drift from the
    appended batch is ``audit_index``'s ``needs_retrain`` job, not
    this one's. RESUMABLE like ``sync_text_index``: each sync records
    ``synced_table_version`` in the index manifest and
    ``from_version=None`` resumes from it (explicit on the first
    sync). Returns {inserted, updated, deleted, table_version}."""
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
                "sync_vector_index: no synced_table_version recorded yet — "
                "pass from_version explicitly on the first sync"
            )
    to_v = _table_manifest(table_dir, to_version)["version"]
    if to_v == from_version:
        return {"inserted": 0, "updated": 0, "deleted": 0, "table_version": to_v}
    # the watermark rides the LAST mutation's atomic manifest publish
    # (see sync_text_index): the replayable crash prefix is then only
    # the idempotent delete/compact half — never an applied append the
    # resume would re-append
    wm = {
        "synced_table_version": to_v,
        "synced_table_dir": os.path.abspath(table_dir),
    }
    ch = mtable_changes(
        spark, table_dir, from_version, to_v, key="vec_id"
    ).persist()
    try:
        counts = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        has_dead = bool(counts.get("delete", 0) or counts.get("update", 0))
        has_fresh = bool(counts.get("insert", 0) or counts.get("update", 0))
        if has_dead:
            delete_from_index(
                spark,
                index_dir,
                ch.where(F.col("_change_type").isin("delete", "update")).select(
                    "vec_id"
                ),
            )
            compact_index_deletes(
                spark, index_dir, extra_meta=None if has_fresh else wm
            )
        if has_fresh:
            append_to_index(
                spark,
                index_dir,
                ch.where(F.col("_change_type").isin("insert", "update")).select(
                    "vec_id", "embedding"
                ),
                extra_meta=wm,
            )
    finally:
        ch.unpersist()
    if not has_dead and not has_fresh:
        # empty feed: nothing applied, standalone bump is replay-safe
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


def audit_index(
    spark: SparkSession, index_dir: str, drift_tv_threshold: float = 0.25
) -> dict:
    """Index consistency + DRIFT audit, one pass over the
    (tombstone-filtered) cells table.

    Consistency: manifest LIVE count vs live cells rows vs distinct
    vec_ids. A replayed append or a torn write shows up as
    n_cells ≠ n_distinct or n_cells ≠ manifest n_vectors; a pending
    delete batch is visible as n_tombstones > 0 but never breaks
    consistency (the audit counts what search can serve).

    Drift: ``append_to_index`` encodes with the FROZEN training-time
    model, so a distribution shift concentrates appended vectors into
    ever-fewer cells — recall degrades silently while every
    consistency check stays green (the documented failure mode of
    frozen-model appends). The audit makes it loud: the live per-cell
    occupancy distribution is compared against the manifest's
    ``training_occupancy`` baseline by total-variation distance
    (``occupancy_tv`` = half the L1 gap between the two probability
    vectors, 0 = identical, 1 = disjoint); ``needs_retrain`` flips
    when it exceeds ``drift_tv_threshold``. A rebuild
    (``build_vector_index``) resets the baseline. Legacy manifests
    without a baseline report ``occupancy_tv=None`` and never flip."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    live = _live_cells(spark, index_dir, man)
    per_cell = (
        live.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_cells = sum(r["n"] for r in per_cell)
    # GLOBAL distinct, not a sum of per-cell distincts: a vec_id
    # replayed into a DIFFERENT cell (re-appended after its embedding
    # moved under a frozen model) is unique within each cell but
    # duplicated across them — exactly the corruption this audit
    # exists to catch; the per-cell sum would count it twice and keep
    # 'consistent' green
    n_distinct = live.select(F.count_distinct("vec_id")).collect()[0][0]
    baseline = man.get("training_occupancy")
    tv = None
    if baseline and n_cells:
        base_total = sum(baseline.values())
        live = {str(r["centroid_id"]): r["n"] for r in per_cell}
        cids = set(baseline) | set(live)
        tv = 0.5 * sum(
            abs(live.get(c, 0) / n_cells - baseline.get(c, 0) / base_total)
            for c in cids
        )
    return {
        "manifest_n": man["n_vectors"],
        "cells_n": n_cells,
        "distinct_vec_ids": n_distinct,
        "n_tombstones": man.get("n_tombstones", 0),
        "occupancy_tv": tv,
        "needs_retrain": tv is not None and tv > drift_tv_threshold,
        "consistent": man["n_vectors"] == n_cells == n_distinct,
    }


def maintain_vector_index(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame | None = None,
    *,
    tombstone_max_rows: int = 1024,
    drift_tv_threshold: float = 0.25,
    dry_run: bool = False,
) -> dict:
    """Maintenance POLICY for the ANN index — the WHEN layer over the
    primitives, mirroring ``mtable_maintain``: the tombstone shadow
    and routing drift each have a fix (``compact_index_deletes``,
    ``retrain_cells``), but nothing decided when to run them, so an
    index under streamed CDC churn degrades silently (tombstone
    anti-join on every search; frozen-model appends concentrating into
    ever-fewer cells). Measurements: tombstone count from the manifest
    (metadata-only) and the occupancy-TV drift audit (one scan of the
    8-byte-code cells table — the drift signal is inherently a data
    property; raw vectors are never read).

    Triggers, fired in dependency order:

    * ``purge-deletes``: pending tombstones exceed
      ``tombstone_max_rows`` — also a precondition for retraining
      (``retrain_cells`` refuses a shadowed index).
    * ``retrain-drift``: ``audit_index`` flips ``needs_retrain`` at
      ``drift_tv_threshold``. Needs the raw ``embeddings`` source
      (cells hold lossy PQ codes); when drift fires without one, the
      report says so (``retrain-needed-no-source``) instead of
      silently skipping — the operator learns the index wants a
      retrain it cannot run."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    audit = audit_index(spark, index_dir, drift_tv_threshold=drift_tv_threshold)
    triggers = []
    if man.get("n_tombstones", 0) > tombstone_max_rows:
        triggers.append("purge-deletes")
    if audit["needs_retrain"]:
        triggers.append("retrain-drift")
    report = {
        "measured": {
            "n_tombstones": man.get("n_tombstones", 0),
            "occupancy_tv": audit["occupancy_tv"],
            "consistent": audit["consistent"],
            "n_vectors": man["n_vectors"],
        },
        "triggers": triggers,
        "actions": [],
        "dry_run": dry_run,
    }
    if dry_run:
        return report
    if "retrain-drift" in triggers and man.get("n_tombstones", 0):
        # a retrain needs a clean shadow regardless of the row threshold
        compact_index_deletes(spark, index_dir)
        report["actions"].append("purge-deletes")
    elif "purge-deletes" in triggers:
        compact_index_deletes(spark, index_dir)
        report["actions"].append("purge-deletes")
    if "retrain-drift" in triggers:
        if embeddings is None:
            report["actions"].append("retrain-needed-no-source")
        else:
            retrain_cells(spark, index_dir, embeddings)
            report["actions"].append("retrain-drift")
    return report


def retrain_cells(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame,
    cells: list[int] | None = None,
    split_per_cell: int = 2,
    overload_factor: float = 2.0,
    iters: int = 3,
) -> dict:
    """CELL-LOCAL retrain — the remedy ``audit_index``'s
    ``needs_retrain`` calls for, without the full rebuild's two corpus
    kernel passes: SPLIT only the over-occupied cells (where a frozen
    model funneled drifted appends), reassign ONLY their vectors among
    fresh sub-centroids trained on exactly those vectors, and leave
    every other partition's files inode-untouched (pinned in tests at
    the os.stat level).

    Mechanics:

    * target cells = explicit ``cells`` list, or auto-picked as every
      cell whose live occupancy exceeds ``overload_factor`` × the
      training-baseline expectation (the cells driving the TV drift);
    * each target cell's LIVE vectors (joined back to ``embeddings``
      by vec_id — cells hold lossy PQ codes, raw floats live in the
      source table) train up to ``split_per_cell`` sub-centroids by
      the same Lloyd's kernel the full build uses, restricted to the
      cell (a cell holding fewer vectors than ``split_per_cell``
      trains fewer — ids derive from the ACTUAL trained count, so the
      matrix row index always equals the id written into partitions);
    * every sub-centroid gets a FRESH id appended at the end of the
      (n_centroids, d) matrix; the split cell's own id joins the
      manifest's ``dead_centroids`` list and its matrix row is
      poisoned (1e30 per dim) so no probe or frozen-model assign ever
      routes to it — the dense row-index-equals-id layout every
      kernel assumes keeps holding, dead rows included;
    * PQ codebooks are untouched and codes are NOT re-encoded — PQ
      encodes the raw vector independently of its cell, so the stored
      codes remain exact under ADC; only the coarse routing improves;
    * the manifest's ``training_occupancy`` baseline drops the split
      ids and adds the fresh ids' post-split live counts (the new
      normal), so the drift audit measures future drift against the
      repaired routing.

    Crash-atomic, mirroring the tombstone/compact discipline: fresh
    sub-cell partitions land inside ``cells/`` FIRST under ids the
    current manifest does not acknowledge (``_visible_cells`` prunes
    ``centroid_id >= n_centroids``, so they are unservable debris),
    the new centroid matrix lands at a FRESH versioned path the old
    manifest never references, and the single atomic manifest rename
    — new matrix path, grown ``n_centroids``, split ids onto
    ``dead_centroids`` — flips the whole repair at once. Old split
    directories and the old matrix are swept only AFTER the commit
    (``dead_centroids`` keeps them invisible in the window); a crash
    anywhere leaves the index serving exactly one of the two manifest
    states, and the next retrain sweeps any unacknowledged debris
    before reusing ids.

    Contract: refuse when tombstones are pending (run
    ``compact_index_deletes`` first — the rewrite would otherwise need
    per-cell tombstone bookkeeping), and refuse when ``embeddings``
    is missing any affected vec_id (a partial source would silently
    drop indexed vectors). Cost: O(vectors in split cells), never
    O(corpus). Returns the updated manifest."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    if man.get("n_tombstones", 0):
        raise ValueError(
            "retrain_cells: tombstones pending — run compact_index_deletes "
            "first, then retrain"
        )
    if split_per_cell < 2:
        raise ValueError("retrain_cells: split_per_cell must be >= 2")
    cells_path = man["artifacts"]["cells"]
    import shutil
    import uuid as _uuid

    # sweep unacknowledged debris a crashed retrain left behind: fresh
    # partition dirs whose commit never happened (ids >= n_centroids are
    # about to be reallocated) and dead dirs whose post-commit sweep was
    # interrupted — both invisible to every reader via _visible_cells,
    # both unsafe to leave once their ids come back into play
    dead_ids = set(man.get("dead_centroids", []))
    for entry in os.listdir(cells_path):
        if not entry.startswith("centroid_id="):
            continue
        try:
            cid = int(entry.split("=", 1)[1])
        except ValueError:
            continue
        if cid >= man["n_centroids"] or cid in dead_ids:
            shutil.rmtree(os.path.join(cells_path, entry))

    live = _visible_cells(spark, man)
    occ = {
        int(r["centroid_id"]): r["n"]
        for r in live.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if cells is None:
        baseline = man.get("training_occupancy")
        if not baseline:
            raise ValueError(
                "retrain_cells: no training_occupancy baseline recorded — "
                "pass cells= explicitly"
            )
        base_total = sum(baseline.values()) or 1
        total = sum(occ.values())
        cells = sorted(
            c
            for c, n in occ.items()
            if n > overload_factor * max(1.0, baseline.get(str(c), 0) / base_total * total)
        )
        if not cells:
            return man  # nothing over-occupied: no-op
    cells = sorted(set(int(c) for c in cells))
    bad = [c for c in cells if c not in occ]
    if bad:
        raise ValueError(f"retrain_cells: cells {bad} are empty or unknown")

    d = man["dim"]
    centroids = _df_to_matrix(
        spark.read.parquet(man["artifacts"]["centroids"]),
        "centroid",
        (man["n_centroids"], d),
    )
    next_id = man["n_centroids"]
    new_rows_parts = []
    retrain_meta = []
    for c in cells:
        rows_c = live.where(F.col("centroid_id") == c).select("vec_id", "code")
        src_c = rows_c.join(embeddings.select("vec_id", "embedding"), "vec_id")
        n_rows = rows_c.count()
        n_src = src_c.count()
        if n_src != n_rows:
            raise ValueError(
                f"retrain_cells: cell {c} has {n_rows} indexed vectors but "
                f"the embeddings source covers only {n_src} — a partial "
                "source would drop indexed vectors; pass the full table"
            )
        sub, hist = train_ivf_centroids(src_c, k=split_per_cell, iters=iters)
        # ids derive from the ACTUAL trained count (a cell with fewer
        # live vectors than split_per_cell trains fewer centroids) —
        # matrix row index therefore always equals the id written into
        # the partitions, and n_centroids always equals the matrix rows
        k_actual = int(sub.shape[0])
        ids = list(range(next_id, next_id + k_actual))
        next_id += k_actual
        assign_udf = make_ivf_assign_udf(sub)
        id_map = F.array(*[F.lit(i) for i in ids])
        assigned = src_c.select(
            "vec_id",
            "code",
            id_map[assign_udf("embedding")["centroid_id"]].alias("centroid_id"),
        )
        new_rows_parts.append(assigned)
        # the split cell's row is POISONED, not reused: no query or
        # frozen-model assign can ever be nearer to 1e30-per-dim than
        # to a real centroid, and _visible_cells hard-filters the id —
        # so the dense row-index layout survives without reshuffling ids
        centroids[c] = 1e30
        centroids = np.vstack([centroids, sub])
        retrain_meta.append(
            {"cell": c, "new_ids": ids, "n": n_rows, "distortion": hist}
        )

    batch = new_rows_parts[0]
    for p in new_rows_parts[1:]:
        batch = batch.unionByName(p)

    # ---- staging (pre-commit: everything below is invisible debris) ----
    tmp = cells_path + f".retrain-{_uuid.uuid4().hex}"
    batch.select("vec_id", "code", "centroid_id").write.partitionBy(
        "centroid_id"
    ).parquet(tmp)
    # fresh sub-cell dirs move INTO cells/ under ids the live manifest
    # does not acknowledge (_visible_cells prunes >= n_centroids); the
    # old split dirs stay in place and keep serving
    for entry in os.listdir(tmp):
        if not entry.startswith("centroid_id="):
            continue
        os.rename(os.path.join(tmp, entry), os.path.join(cells_path, entry))
    shutil.rmtree(tmp)
    # new matrix at a fresh versioned path — the live manifest keeps
    # pointing at the old one until the flip
    seq = len(man.get("retrains", [])) + 1
    old_cent = man["artifacts"]["centroids"]
    new_cent = os.path.join(index_dir, f"centroids-r{seq}")
    _matrix_to_df(spark, "centroid", centroids).write.mode("overwrite").parquet(
        new_cent
    )
    new_occ = {
        str(r["centroid_id"]): r["n"]
        for r in spark.read.parquet(cells_path)
        .where(
            F.col("centroid_id").isin(
                [i for m in retrain_meta for i in m["new_ids"]]
            )
        )
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # ---- commit: one atomic manifest rename flips the whole repair ----
    man["artifacts"]["centroids"] = new_cent
    man["n_centroids"] = int(centroids.shape[0])
    man["dead_centroids"] = sorted(dead_ids | set(cells))
    base = man.setdefault("training_occupancy", {})
    for c in cells:
        base.pop(str(c), None)
    base.update(new_occ)
    man.setdefault("retrains", []).append({"cells": retrain_meta})
    _write_index_manifest(index_dir, man)

    # ---- post-commit sweep: dead_centroids keeps these unservable, so
    # a crash mid-sweep is harmless (next retrain finishes the job) ----
    for c in cells:
        old = os.path.join(cells_path, f"centroid_id={c}")
        if os.path.isdir(old):
            shutil.rmtree(old)
    if old_cent != new_cent and os.path.isdir(old_cent):
        shutil.rmtree(old_cent)
    return man
