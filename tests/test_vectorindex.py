"""Materialized ANN index (pipeline/vectorindex.py): index-consistency
(search over published artifacts == the same computation from raw
vectors), partition pruning on the cell key, and manifest integrity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vindex(spark, sf_dir, tmp_path_factory):
    from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index

    out = str(tmp_path_factory.mktemp("vindex"))
    manifest = build_vector_index(spark, sf_dir, out, n_centroids=4, iters=2)
    return out, manifest


class TestVectorIndex:
    def test_search_matches_direct_computation(self, spark, sf_dir, vindex):
        """The index-consistency property: searching the published
        artifacts returns exactly what the same IVF-PQ computation
        yields from raw vectors (trained models reloaded from the
        long-form parquet round-trip bit-exactly)."""
        import numpy as np

        from w4h_etl_container_spark.functions.vectorkernels import (
            make_ivf_assign_udf,
            make_ivf_probe_udf,
            make_pq_adc_udf,
            make_pq_encode_udf,
        )
        from w4h_etl_container_spark.pipeline.vectorindex import (
            _df_to_matrix,
            search_index,
        )
        from w4h_etl_container_spark.session import read_embeddings

        out, man = vindex
        got = {
            (r["query_id"], r["rnk"]): (r["cand_id"], r["adc_e6"])
            for r in search_index(spark, sf_dir, out, nprobe=2, top_k=5).collect()
        }

        # direct: same reloaded models over the raw vectors
        m, k, bits = man["pq"]["m"], man["pq"]["k"], man["pq"]["bits"]
        d = man["dim"]
        cents = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["centroids"]),
            "centroid",
            (man["n_centroids"], d),
        )
        cbs = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["codebooks"]), "codebook", (m, k, d // m)
        )
        emb = read_embeddings(spark, sf_dir)
        sig = emb.select(
            "vec_id",
            "embedding",
            make_ivf_assign_udf(cents)("embedding")["centroid_id"].alias("cell"),
            make_pq_encode_udf(cbs, bits)("embedding").alias("code"),
        )
        q = sig.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(make_ivf_probe_udf(cents, 2)("embedding")).alias("cell"),
        )
        scored = (
            sig.select(F.col("vec_id").alias("cand_id"), "code", "cell")
            .join(F.broadcast(q), "cell")
            .where(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id",
                "cand_id",
                make_pq_adc_udf(cbs, bits)("qe", "code").alias("adc_e6"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_e6").asc_nulls_first(), "cand_id"
        )
        want = {
            (r["query_id"], r["rnk"]): (r["cand_id"], r["adc_e6"])
            for r in scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5)
            .collect()
        }
        assert got == want and got

    def test_cells_are_partition_pruned(self, spark, vindex):
        out, man = vindex
        # physical layout: one directory per cell
        dirs = [
            e for e in os.listdir(man["artifacts"]["cells"]) if e.startswith("centroid_id=")
        ]
        assert len(dirs) >= 2
        # a single-cell read plans a pruned scan (partition filter, not
        # a full-directory scan)
        df = spark.read.parquet(man["artifacts"]["cells"]).where(
            F.col("centroid_id") == 0
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "centroid_id" in plan

    def test_manifest_counts_and_distortion(self, spark, sf_dir, vindex):
        from w4h_etl_container_spark.session import read_embeddings

        out, man = vindex
        assert man["n_vectors"] == read_embeddings(spark, sf_dir).count()
        cells = spark.read.parquet(man["artifacts"]["cells"])
        assert cells.count() == man["n_vectors"]
        # training histories recorded and monotone (Lloyd's)
        for hist in (man["ivf_distortion"], man["pq_distortion"]):
            assert len(hist) >= 2
            assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))

    def test_rebuild_is_deterministic(self, spark, sf_dir, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index

        out = str(tmp_path / "v2")
        m1 = build_vector_index(spark, sf_dir, out, n_centroids=4, iters=1)
        m2 = build_vector_index(spark, sf_dir, out, n_centroids=4, iters=1)
        assert m1 == m2
