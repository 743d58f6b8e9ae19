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

    manifest = {
        "n_vectors": emb.count(),
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
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def search_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    n_queries: int = 8,
    nprobe: int = 2,
    top_k: int = 5,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ top-k from the published artifacts: probe the query's
    ``nprobe`` nearest cells (partition-pruned read of ``cells/``),
    rank by ADC over the stored codes. Self-matches excluded.

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
    cells = spark.read.parquet(man["artifacts"]["cells"]).select(
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
    spark: SparkSession, index_dir: str, new_vectors: DataFrame
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
    batch.write.mode("append").partitionBy("centroid_id").parquet(
        man["artifacts"]["cells"]
    )
    man["n_vectors"] = man["n_vectors"] + n_new
    man.setdefault("appends", []).append({"n": n_new})
    with open(os.path.join(index_dir, "MANIFEST.json"), "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    return man


def audit_index(spark: SparkSession, index_dir: str) -> dict:
    """Index consistency audit: manifest count vs cells rows vs
    distinct vec_ids — one aggregate over the cells table. A replayed
    append or a torn write shows up as n_cells ≠ n_distinct or
    n_cells ≠ manifest n_vectors."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    row = (
        spark.read.parquet(man["artifacts"]["cells"])
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count_distinct("vec_id").alias("n_distinct"),
        )
        .collect()[0]
    )
    return {
        "manifest_n": man["n_vectors"],
        "cells_n": row["n_cells"],
        "distinct_vec_ids": row["n_distinct"],
        "consistent": man["n_vectors"] == row["n_cells"] == row["n_distinct"],
    }
