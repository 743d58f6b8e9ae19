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
            F.col("adc_e6").asc_nulls_last(), "cand_id"
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


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Planted-neighborhood fixture + a trained 16-cell index over it
    (k=64 PQ codebooks — 6-bit codes, enough capacity to resolve the
    planted geometry; the declared q_pq_* queries keep their literal
    4-bit stand-ins and are untouched by this test)."""
    from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index
    from w4h_etl_container_spark.testing import write_planted_embeddings

    d = str(tmp_path_factory.mktemp("planted"))
    truth = write_planted_embeddings(d, n_clusters=16, per_cluster=30)
    out = str(tmp_path_factory.mktemp("planted_index"))
    man = build_vector_index(spark, d, out, n_centroids=16, m=8, k=64, iters=3)
    return d, out, man, truth


class TestAnnRecall:
    """The r9 verdict's #1 task: retrieval QUALITY of the trained
    end-to-end index, measured as recall@10 against exact brute force
    on ground truth that exists by construction."""

    def test_recall_at_small_nprobe(self, spark, planted):
        from w4h_etl_container_spark.plans.vectors import ann_recall

        d, out, man, truth = planted
        curve = ann_recall(
            spark, d, out, nprobes=(1, 2, 16), n_queries=8, top_k=10,
            rerank=40,
        )
        by_np = {r["nprobe"]: r for r in curve}
        # the promise: high recall probing FAR fewer cells than exist
        assert by_np[1]["recall"] >= 0.9, curve
        assert by_np[2]["recall"] >= 0.9, curve
        # full probe + exact re-rank must be perfect: every true
        # neighbor is in some cell, and the re-rank is exact L2
        assert by_np[16]["recall"] == 1.0, curve
        # monotone: a larger probe set is a superset of cells
        rs = [r["recall"] for r in curve]
        assert rs == sorted(rs), curve

    def test_adc_only_recall(self, spark, planted):
        """Raw ADC ranking (no exact re-rank): the planted NEAR/FAR
        margin dwarfs PQ reconstruction error, so even approximate
        distances must recover the true neighbors — this isolates
        codebook quality from cell coverage."""
        from w4h_etl_container_spark.plans.vectors import ann_recall

        d, out, man, truth = planted
        curve = ann_recall(
            spark, d, out, nprobes=(2,), n_queries=8, top_k=10, rerank=None
        )
        assert curve[0]["recall"] >= 0.9, curve

    def test_exact_topk_is_the_planted_truth(self, spark, planted):
        """The brute-force yardstick itself recovers the construction's
        known neighbor sets — recall is measured against a verified
        ground truth, not against another approximation."""
        from w4h_etl_container_spark.plans.vectors import exact_topk

        d, out, man, truth = planted
        got = exact_topk(spark, d, n_queries=8, top_k=10).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        for q in range(8):
            assert by_q[q] == set(truth["true_neighbors"][q])

    def test_trained_cells_recover_planted_clusters(self, spark, planted):
        """The trained coarse quantizer's cells coincide with the
        planted clusters (anchor-seeded Lloyd's on well-separated
        blobs) — the geometric reason the nprobe=1 recall holds."""
        d, out, man, truth = planted
        cells = spark.read.parquet(man["artifacts"]["cells"])
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "label"
        )
        joined = cells.join(emb, "vec_id")
        n_pure = (
            joined.groupBy("label")
            .agg(F.count_distinct("centroid_id").alias("k"))
            .where(F.col("k") == 1)
            .count()
        )
        assert n_pure == 16


class TestIndexAppend:
    def test_append_matches_full_rebuild_encoding(self, spark, tmp_path):
        """Appending a batch with the index's frozen model must leave
        cells/ row-identical to encoding the union corpus with the SAME
        model — and the appended files land inside existing
        centroid_id= partitions (probe pruning intact)."""
        import os

        from w4h_etl_container_spark.functions.vectorkernels import (
            make_ivf_assign_udf,
            make_pq_encode_udf,
        )
        from w4h_etl_container_spark.pipeline.vectorindex import (
            _df_to_matrix,
            append_to_index,
            audit_index,
            build_vector_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "base")
        write_planted_embeddings(d, n_clusters=8, per_cluster=20, seed=3)
        out = str(tmp_path / "idx")
        man = build_vector_index(spark, d, out, n_centroids=8, m=8, k=16, iters=2)
        n0 = man["n_vectors"]

        # the new batch: fresh ids, vectors near existing clusters
        d2 = str(tmp_path / "newbatch")
        write_planted_embeddings(d2, n_clusters=8, per_cluster=5, seed=9)
        new = (
            spark.read.parquet(f"{d2}/embeddings.parquet")
            .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        )
        man2 = append_to_index(spark, out, new)
        assert man2["n_vectors"] == n0 + 40
        assert man2["appends"] == [{"n": 40}]

        audit = audit_index(spark, out)
        assert audit["consistent"], audit

        # row-identity vs encoding the union with the frozen model
        cents = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["centroids"]), "centroid", (8, 64)
        )
        cbs = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["codebooks"]), "codebook", (8, 16, 8)
        )
        union = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).unionByName(new)
        want = {
            (r["vec_id"], r["centroid_id"], r["code"])
            for r in union.select(
                "vec_id",
                make_ivf_assign_udf(cents)("embedding")["centroid_id"].alias(
                    "centroid_id"
                ),
                make_pq_encode_udf(cbs, 4)("embedding").alias("code"),
            ).collect()
        }
        got = {
            (r["vec_id"], r["centroid_id"], r["code"])
            for r in spark.read.parquet(man["artifacts"]["cells"]).collect()
        }
        assert got == want
        # no new partition directories beyond the trained cells
        dirs = {
            e for e in os.listdir(man["artifacts"]["cells"])
            if e.startswith("centroid_id=")
        }
        assert dirs <= {f"centroid_id={c}" for c in range(8)}

    def test_replayed_append_is_loud_in_audit(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            append_to_index,
            audit_index,
            build_vector_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "base2")
        write_planted_embeddings(d, n_clusters=4, per_cluster=10, seed=5)
        out = str(tmp_path / "idx2")
        build_vector_index(spark, d, out, n_centroids=4, m=8, k=16, iters=1)
        new = spark.read.parquet(f"{d}/embeddings.parquet").select(
            (F.col("vec_id") + 500).alias("vec_id"), "embedding"
        ).limit(5)
        append_to_index(spark, out, new)
        assert audit_index(spark, out)["consistent"]
        append_to_index(spark, out, new)  # the replay
        audit = audit_index(spark, out)
        assert not audit["consistent"]
        assert audit["cells_n"] == audit["distinct_vec_ids"] + 5


class TestRerankHostileVectors:
    def test_nonfinite_candidate_sorts_last_in_both_stages(self, spark, tmp_path):
        """ADVICE r9 follow-through for the NEW rerank path: a candidate
        whose embedding contains a non-finite component yields NULL
        distance in BOTH the ADC shortlist and the exact re-rank — it
        must never displace a genuine neighbor at either stage."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.vectorindex import (
            build_vector_index,
            search_index,
        )

        d = str(tmp_path / "hostile")
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((30, 64)).astype(np.float32)
        vecs[7] = vecs[0] + rng.normal(0, 0.01, 64).astype(np.float32)  # true nn of 0
        bad = vecs[9].copy()
        bad[3] = np.inf  # the hostile candidate
        vecs[9] = bad
        import os

        os.makedirs(d)
        pq.write_table(
            pa.table({
                "vec_id": pa.array(range(30), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                "label": pa.array([0] * 30, type=pa.int32()),
            }),
            os.path.join(d, "embeddings.parquet"),
        )
        out = str(tmp_path / "hidx")
        build_vector_index(spark, d, out, n_centroids=1, m=8, k=16, iters=1)
        got = search_index(
            spark, d, out, n_queries=1, nprobe=1, top_k=29, rerank=29
        ).collect()
        by_rank = sorted(got, key=lambda r: r["rnk"])
        # the true neighbor leads; the hostile vector is ranked LAST
        assert by_rank[0]["cand_id"] == 7
        assert by_rank[-1]["cand_id"] == 9
        assert by_rank[-1]["dist2_e6"] is None


class TestIndexDeletes:
    """Round-11: ANN index deletes — tombstone phase makes a deleted
    vec_id immediately unservable; the compaction phase physically
    rewrites only affected centroid_id= partitions. audit_index stays
    consistent through the whole cycle."""

    def _build(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "delbase")
        write_planted_embeddings(d, n_clusters=8, per_cluster=20, seed=11)
        out = str(tmp_path / "delidx")
        build_vector_index(spark, d, out, n_centroids=8, m=8, k=16, iters=2)
        return d, out

    def test_delete_search_audit_cycle(self, spark, tmp_path):
        import os

        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            compact_index_deletes,
            delete_from_index,
            search_index,
        )

        d, out = self._build(spark, tmp_path)
        before = search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5)
        victims = sorted({r["cand_id"] for r in before.collect()})[:6]
        assert victims
        a0 = audit_index(spark, out)
        assert a0["consistent"] and a0["n_tombstones"] == 0

        man = delete_from_index(
            spark, out, spark.createDataFrame([(v,) for v in victims], "vec_id long")
        )
        assert man["n_vectors"] == a0["manifest_n"] - len(victims)
        # tombstoned: never served, audit still consistent (live counts)
        after = search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5)
        served = {r["cand_id"] for r in after.collect()}
        assert served.isdisjoint(victims)
        a1 = audit_index(spark, out)
        assert a1["consistent"] and a1["n_tombstones"] == len(victims)
        assert a1["cells_n"] == a0["cells_n"] - len(victims)

        # rerank serving path also never returns a deleted id
        rr = search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5, rerank=10)
        assert {r["cand_id"] for r in rr.collect()}.isdisjoint(victims)

        # physical compaction: same results, tombstones gone
        man2 = compact_index_deletes(spark, out)
        assert man2["n_tombstones"] == 0
        assert not os.path.exists(os.path.join(out, "tombstones"))
        post = search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5)
        assert sorted(map(tuple, post.collect())) == sorted(map(tuple, after.collect()))
        a2 = audit_index(spark, out)
        assert a2["consistent"] and a2["cells_n"] == a1["cells_n"]

    def test_compaction_rewrites_only_affected_partitions(self, spark, tmp_path):
        """Files in partitions untouched by the delete keep their
        inode-level mtimes (the mtable copy-on-write property on the
        IVF layout); a fully-emptied partition directory disappears."""
        import json as _json
        import os

        from w4h_etl_container_spark.pipeline.vectorindex import (
            compact_index_deletes,
            delete_from_index,
        )

        d, out = self._build(spark, tmp_path)
        with open(os.path.join(out, "MANIFEST.json")) as f:
            cells_path = _json.load(f)["artifacts"]["cells"]
        cells = spark.read.parquet(cells_path)
        by_cell = {
            r["centroid_id"]: r["n"]
            for r in cells.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
        }
        # empty one whole cell, leave every other partition untouched
        victim_cid = min(by_cell, key=by_cell.get)
        victims = cells.where(F.col("centroid_id") == victim_cid).select("vec_id")
        n_victims = victims.count()
        def _mtimes():
            t = {}
            for entry in os.listdir(cells_path):
                sub = os.path.join(cells_path, entry)
                if entry.startswith("centroid_id=") and os.path.isdir(sub):
                    for fn in os.listdir(sub):
                        if fn.endswith(".parquet"):
                            rel = os.path.join(entry, fn)
                            t[rel] = os.stat(os.path.join(cells_path, rel)).st_mtime_ns
            return t
        t0 = _mtimes()
        delete_from_index(spark, out, victims)
        man = compact_index_deletes(spark, out)
        assert man["compactions"][-1]["partitions_rewritten"] == 1
        assert not os.path.isdir(os.path.join(cells_path, f"centroid_id={victim_cid}"))
        t1 = _mtimes()
        untouched = {k: v for k, v in t0.items() if not k.startswith(f"centroid_id={victim_cid}")}
        assert untouched == t1  # byte-identical survivors, inode-level
        assert spark.read.parquet(cells_path).count() == sum(by_cell.values()) - n_victims

    def test_dead_batch_noop_and_append_guard(self, spark, tmp_path):
        """Round-12 (ADVICE): a batch of absent/already-dead ids is a
        TRUE idempotent no-op — a crashed-then-retried delete whose
        first attempt committed succeeds silently, never raises."""
        import json as _json
        import os

        from w4h_etl_container_spark.pipeline.vectorindex import (
            append_to_index,
            delete_from_index,
        )

        d, out = self._build(spark, tmp_path)
        man0 = _json.load(open(os.path.join(out, "MANIFEST.json")))
        got = delete_from_index(
            spark, out, spark.createDataFrame([(10**9,)], "vec_id long")
        )
        assert got == man0  # absent ids: manifest unchanged
        man1 = delete_from_index(
            spark, out, spark.createDataFrame([(0,)], "vec_id long")
        )
        # replay of the SAME batch post-commit: no-op, no drift
        man2 = delete_from_index(
            spark, out, spark.createDataFrame([(0,)], "vec_id long")
        )
        assert man2 == man1 and man2["n_tombstones"] == 1
        # deleting then re-appending the same id without compaction is loud
        emb = spark.read.parquet(f"{d}/embeddings.parquet").where(F.col("vec_id") == 0)
        with pytest.raises(ValueError, match="tombstoned"):
            append_to_index(spark, out, emb)

    def test_crash_debris_tombstone_file_is_invisible(self, spark, tmp_path):
        """Round-12: the delete's commit point is the atomic manifest
        rename — a tombstone batch dir with no manifest reference
        (crash between write and rename) filters nothing, and the
        retried delete commits exactly once."""
        import os

        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            delete_from_index,
            search_index,
        )

        d, out = self._build(spark, tmp_path)
        before = sorted(
            map(tuple, search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5).collect())
        )
        victim = before[0][1]
        spark.createDataFrame([(victim,)], "vec_id long").write.parquet(
            os.path.join(out, "tombstones", "batch-debris")
        )
        assert sorted(
            map(tuple, search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5).collect())
        ) == before  # debris invisible
        a = audit_index(spark, out)
        assert a["consistent"] and a["n_tombstones"] == 0
        man = delete_from_index(
            spark, out, spark.createDataFrame([(victim,)], "vec_id long")
        )
        assert man["n_tombstones"] == 1
        assert len(man["tombstone_files"]) == 1
        assert "batch-debris" not in man["tombstone_files"][0]
        served = {
            r["cand_id"]
            for r in search_index(spark, d, out, n_queries=4, nprobe=8, top_k=5).collect()
        }
        assert victim not in served
        assert audit_index(spark, out)["consistent"]


class TestIndexDriftAccounting:
    """Round-12: frozen-model appends degrade recall silently as the
    data distribution moves — the audit compares live per-cell
    occupancy against the manifest's training-time baseline (total
    variation distance) and flips needs_retrain when appended batches
    concentrate into few cells; a rebuild resets the baseline."""

    def _build(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "drbase")
        write_planted_embeddings(d, n_clusters=8, per_cluster=20, seed=21)
        out = str(tmp_path / "dridx")
        build_vector_index(spark, d, out, n_centroids=8, m=8, k=16, iters=3)
        return d, out

    def test_same_distribution_append_stays_green(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            append_to_index,
            audit_index,
        )

        d, out = self._build(spark, tmp_path)
        a0 = audit_index(spark, out)
        assert a0["occupancy_tv"] == 0.0 and not a0["needs_retrain"]
        # a same-distribution batch: the corpus itself under fresh ids
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        clone = emb.select(
            (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
        )
        append_to_index(spark, out, clone)
        a1 = audit_index(spark, out)
        assert a1["consistent"]
        assert a1["occupancy_tv"] < 0.05 and not a1["needs_retrain"]

    def test_drifted_append_flips_needs_retrain_and_rebuild_clears(
        self, spark, tmp_path
    ):
        import numpy as np

        from w4h_etl_container_spark.pipeline.vectorindex import (
            append_to_index,
            audit_index,
            build_vector_index,
        )
        from w4h_etl_container_spark.plans.vectors import ann_recall

        d, out = self._build(spark, tmp_path)
        # drift: a whole new batch concentrated at ONE existing
        # point's neighborhood — the frozen model funnels all of it
        # into one cell
        anchor = np.array(
            spark.read.parquet(f"{d}/embeddings.parquet")
            .where(F.col("vec_id") == 0)
            .collect()[0]["embedding"]
        )
        rng = np.random.default_rng(33)
        drifted = [
            (int(200_000 + i), (anchor + rng.normal(0, 0.01, anchor.shape)).tolist())
            for i in range(160)
        ]
        append_to_index(
            spark,
            out,
            spark.createDataFrame(drifted, "vec_id long, embedding array<double>"),
        )
        a1 = audit_index(spark, out)
        assert a1["consistent"]  # counts are fine — that's the point
        assert a1["occupancy_tv"] > 0.25 and a1["needs_retrain"]

        # retrain on the drifted corpus: baseline resets, recall is
        # re-measured on the planted structure
        import os
        import shutil

        d2 = str(tmp_path / "drifted-corpus")
        os.makedirs(d2)
        spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).unionByName(
            spark.createDataFrame(drifted, "vec_id long, embedding array<double>")
        ).coalesce(1).write.parquet(str(tmp_path / "dcpq"))
        for f in os.listdir(str(tmp_path / "dcpq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "dcpq" / f),
                    os.path.join(d2, "embeddings.parquet"),
                )
        out2 = str(tmp_path / "dridx2")
        build_vector_index(spark, d2, out2, n_centroids=8, m=8, k=16, iters=3)
        a2 = audit_index(spark, out2)
        assert a2["occupancy_tv"] == 0.0 and not a2["needs_retrain"]
        # shortlist wider than the 160-clone tie plateau: near-identical
        # vectors share PQ codes, so only the exact re-rank can order them
        rec = ann_recall(
            spark, d2, out2, nprobes=(8,), n_queries=4, top_k=5, rerank=200
        )
        assert rec[-1]["recall"] == 1.0  # full-probe recall restored


class TestFilteredSearch:
    """Round-11: metadata-filtered ANN — allowed_ids pre-filters the
    cell scan, so the top-k is exact over the allowed set (never the
    fewer-than-k trap of post-filtering an unfiltered top-k)."""

    def test_filtered_equals_bruteforce_on_allowed_set(self, spark, tmp_path):
        import numpy as np

        from w4h_etl_container_spark.pipeline.vectorindex import (
            build_vector_index,
            search_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "fbase")
        write_planted_embeddings(d, n_clusters=6, per_cluster=15, seed=5)
        out = str(tmp_path / "fidx")
        build_vector_index(spark, d, out, n_centroids=6, m=8, k=16, iters=2)

        emb = {r["vec_id"]: np.array(r["embedding"]) for r in
               spark.read.parquet(f"{d}/embeddings.parquet").collect()}
        allowed = sorted(v for v in emb if v % 3 == 0)
        allowed_df = spark.createDataFrame([(v,) for v in allowed], "vec_id long")

        got = search_index(
            spark, d, out, n_queries=4, nprobe=6, top_k=4,
            rerank=len(emb), allowed_ids=allowed_df,
        )
        res = {}
        for r in got.collect():
            res.setdefault(r["query_id"], []).append((r["rnk"], r["cand_id"]))
        for qid in range(4):
            q = emb[qid]
            cands = [(float(((q - emb[v]) ** 2).sum()), v)
                     for v in allowed if v != qid]
            want = [v for _, v in sorted(cands)[:4]]
            gotq = [v for _, v in sorted(res[qid])]
            assert gotq == want, qid
            assert set(gotq) <= set(allowed)

    def test_filter_composes_with_tombstones(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            build_vector_index,
            delete_from_index,
            search_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "ftbase")
        write_planted_embeddings(d, n_clusters=4, per_cluster=10, seed=8)
        out = str(tmp_path / "ftidx")
        build_vector_index(spark, d, out, n_centroids=4, m=8, k=16, iters=1)
        allowed = spark.range(0, 40).select(F.col("id").alias("vec_id"))
        first = search_index(spark, d, out, n_queries=2, nprobe=4, top_k=3,
                             allowed_ids=allowed).collect()
        victim = first[0]["cand_id"]
        delete_from_index(spark, out,
                          spark.createDataFrame([(victim,)], "vec_id long"))
        after = search_index(spark, d, out, n_queries=2, nprobe=4, top_k=3,
                             allowed_ids=allowed).collect()
        assert victim not in {r["cand_id"] for r in after}


class TestVectorIndexSync:
    """Round-12: CDC from an embeddings mtable into the ANN index —
    after applying a version diff, the live cells equal the new
    snapshot assigned+encoded under the index's FROZEN training-time
    model (the exact frozen-maintenance contract)."""

    def test_sync_converges_to_frozen_model_encoding(self, spark, tmp_path):
        import json as _json
        import os

        import numpy as np

        from w4h_etl_container_spark.functions.vectorkernels import (
            make_ivf_assign_udf,
            make_pq_encode_udf,
        )
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_merge,
            mtable_read,
        )
        from w4h_etl_container_spark.pipeline.vectorindex import (
            _df_to_matrix,
            audit_index,
            build_vector_index,
            search_index,
            sync_vector_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "vsbase")
        write_planted_embeddings(d, n_clusters=6, per_cluster=15, seed=9)
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        tdir = str(tmp_path / "vs-table")
        mtable_create(spark, emb, tdir)
        out = str(tmp_path / "vs-idx")
        build_vector_index(spark, d, out, n_centroids=6, m=8, k=16, iters=2)

        # churn: move two vectors to new positions, insert two fresh
        # ones, delete two
        rng = np.random.default_rng(4)
        dim = len(emb.first()["embedding"])
        upd = [(0, rng.normal(0, 1, dim).tolist()),
               (1, rng.normal(0, 1, dim).tolist()),
               (900, rng.normal(0, 1, dim).tolist()),
               (901, rng.normal(0, 1, dim).tolist())]
        # match the table's stored element type exactly — the round-12
        # schema check refuses silent float/double coercion
        etype = dict(
            (f.name, f.dataType.simpleString()) for f in emb.schema.fields
        )["embedding"]
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(upd, f"vec_id long, embedding {etype}"),
            "vec_id",
        )  # v1
        mtable_delete(
            spark, tdir,
            spark.createDataFrame([(2,), (3,)], "vec_id long"),
            "vec_id",
        )  # v2

        res = sync_vector_index(spark, out, tdir, 0, 2)
        assert res == {"inserted": 2, "updated": 2, "deleted": 2, "table_version": 2}
        a = audit_index(spark, out)
        assert a["consistent"] and a["n_tombstones"] == 0

        # exact frozen-model contract: live cells == snapshot encoded
        # with the index's own artifacts
        with open(os.path.join(out, "MANIFEST.json")) as f:
            man = _json.load(f)
        m, k, bits = man["pq"]["m"], man["pq"]["k"], man["pq"]["bits"]
        cents = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["centroids"]),
            "centroid", (man["n_centroids"], man["dim"]),
        )
        cbs = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["codebooks"]),
            "codebook", (m, k, man["dim"] // m),
        )
        def _c(v):
            return tuple(v) if isinstance(v, (list, bytearray, bytes)) else v

        want = {
            (r["vec_id"], r["centroid_id"], _c(r["code"]))
            for r in mtable_read(spark, tdir).select(
                "vec_id",
                make_ivf_assign_udf(cents)("embedding")["centroid_id"].alias(
                    "centroid_id"
                ),
                make_pq_encode_udf(cbs, bits)("embedding").alias("code"),
            ).collect()
        }
        got = {
            (r["vec_id"], r["centroid_id"], _c(r["code"]))
            for r in spark.read.parquet(man["artifacts"]["cells"]).collect()
        }
        assert got == want
        # deleted ids unservable, inserted servable
        served = {
            r["cand_id"]
            for r in search_index(spark, d, out, n_queries=4, nprobe=6, top_k=20).collect()
        }
        assert served.isdisjoint({2, 3})


class TestCellLocalRetrain:
    """Round-13: needs_retrain's remedy without a full rebuild —
    split only the over-occupied cells, reassign only their vectors,
    leave every other partition inode-untouched."""

    def _drifted(self, spark, tmp_path):
        import shutil

        import numpy as np

        from w4h_etl_container_spark.pipeline.vectorindex import (
            append_to_index,
            audit_index,
            build_vector_index,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        d = str(tmp_path / "base")
        write_planted_embeddings(d, n_clusters=8, per_cluster=20, seed=21)
        out = str(tmp_path / "idx")
        build_vector_index(spark, d, out, n_centroids=8, m=8, k=16, iters=3)
        anchor = np.array(
            spark.read.parquet(f"{d}/embeddings.parquet")
            .where(F.col("vec_id") == 0)
            .collect()[0]["embedding"]
        )
        rng = np.random.default_rng(33)
        drifted = [
            (int(200_000 + i), (anchor + rng.normal(0, 0.01, anchor.shape)).tolist())
            for i in range(160)
        ]
        ddf = spark.createDataFrame(drifted, "vec_id long, embedding array<double>")
        append_to_index(spark, out, ddf)
        assert audit_index(spark, out)["needs_retrain"]
        # the full corpus (base + drift) — the retrain's raw-float source,
        # also written as a corpus dir for recall measurement
        full = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).unionByName(ddf)
        d2 = str(tmp_path / "full")
        os.makedirs(d2)
        full.coalesce(1).write.parquet(str(tmp_path / "fpq"))
        for f in os.listdir(str(tmp_path / "fpq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "fpq" / f),
                    os.path.join(d2, "embeddings.parquet"),
                )
        return d2, out, full

    def test_retrain_repairs_drift_cell_locally(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            retrain_cells,
        )
        from w4h_etl_container_spark.plans.vectors import ann_recall

        d2, out, full = self._drifted(spark, tmp_path)
        tv_before = audit_index(spark, out)["occupancy_tv"]
        cells_path = os.path.join(out, "cells")

        def snap():
            st = {}
            for e in os.listdir(cells_path):
                if e.startswith("centroid_id="):
                    sub = os.path.join(cells_path, e)
                    st[e] = sorted(
                        (f, os.stat(os.path.join(sub, f)).st_mtime_ns)
                        for f in os.listdir(sub)
                    )
            return st

        before = snap()
        man = retrain_cells(spark, out, full)
        assert man["retrains"], "auto-pick must have split the hot cell"
        split = {m["cell"] for m in man["retrains"][-1]["cells"]}
        assert split, "the drifted cell should be over-occupied"
        after = snap()
        # untouched partitions byte-identical (same files, same mtimes)
        new_ids = {
            i for m in man["retrains"][-1]["cells"] for i in m["new_ids"]
        }
        for e, files in before.items():
            cid = int(e.split("=")[1])
            if cid not in split and cid not in new_ids:
                assert after[e] == files, f"partition {e} was touched"
        # drift accounting repaired
        a = audit_index(spark, out)
        assert a["consistent"]
        assert a["occupancy_tv"] < tv_before
        assert not a["needs_retrain"]
        # recall: at full probe of the GROWN index, the exact re-rank
        # restores the planted truth, matching what a rebuild achieves
        rec = ann_recall(
            spark, d2, out,
            nprobes=(man["n_centroids"],), n_queries=4, top_k=5, rerank=200,
        )
        assert rec[-1]["recall"] == 1.0

    def test_retrain_commit_is_the_manifest_flip(self, spark, tmp_path):
        """Advisor r13 (medium): the old sequence rmtree'd split cells
        BEFORE renaming replacements in — a crash in between dropped
        vectors permanently. Now every pre-commit artifact is invisible
        debris (fresh ids the manifest doesn't acknowledge), the
        atomic manifest rename flips the repair, and dead split dirs
        stay unservable (dead_centroids) until the post-commit sweep."""
        import json as _json
        import shutil

        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            retrain_cells,
            search_index,
        )

        d2, out, full = self._drifted(spark, tmp_path)
        cells_path = os.path.join(out, "cells")
        with open(os.path.join(out, "MANIFEST.json")) as f:
            man0 = _json.load(f)
        baseline = audit_index(spark, out)

        # simulate a crash BETWEEN staging and commit: fresh partition
        # dirs exist under unacknowledged ids, manifest unchanged
        src_part = next(
            e for e in os.listdir(cells_path) if e.startswith("centroid_id=")
        )
        debris = os.path.join(
            cells_path, f"centroid_id={man0['n_centroids'] + 5}"
        )
        shutil.copytree(os.path.join(cells_path, src_part), debris)
        a = audit_index(spark, out)
        assert a["consistent"], "pre-commit debris must be unservable"
        assert a["cells_n"] == baseline["cells_n"]

        # the next retrain sweeps the debris before reusing ids, then
        # commits; post-commit the split cells are on dead_centroids
        man = retrain_cells(spark, out, full)
        assert not os.path.isdir(debris) or man["n_centroids"] > (
            man0["n_centroids"] + 5
        )
        split = {m["cell"] for m in man["retrains"][-1]["cells"]}
        assert split and set(man["dead_centroids"]) >= split
        # fresh matrix lives at a versioned path the old manifest never
        # referenced; the superseded matrix dir is swept
        assert man["artifacts"]["centroids"].endswith("-r1")
        assert not os.path.isdir(man0["artifacts"]["centroids"])
        assert audit_index(spark, out)["consistent"]

        # simulate a crash AFTER commit but BEFORE the sweep: resurrect
        # a dead split dir with stale rows — dead_centroids must keep
        # it unservable for every reader
        dead_id = sorted(split)[0]
        dead_dir = os.path.join(cells_path, f"centroid_id={dead_id}")
        live_part = next(
            e
            for e in os.listdir(cells_path)
            if e.startswith("centroid_id=")
        )
        shutil.copytree(os.path.join(cells_path, live_part), dead_dir)
        a2 = audit_index(spark, out)
        assert a2["consistent"], "dead-dir debris must stay invisible"
        served = search_index(
            spark, d2, out, n_queries=4, nprobe=man["n_centroids"], top_k=5
        )
        assert served.count() > 0  # search runs clean over the debris

    def test_retrain_ids_align_when_cell_smaller_than_split(
        self, spark, tmp_path
    ):
        """Advisor r13 (low): explicit cells= on a cell holding fewer
        live vectors than split_per_cell used to append fewer matrix
        rows than the ids it advanced — later cells' rows then sat at
        the wrong indices and probes routed to wrong cells. Ids now
        derive from the ACTUAL trained count: matrix rows, n_centroids,
        and partition ids must all agree, and full-probe recall must
        hold."""
        from w4h_etl_container_spark.pipeline.vectorindex import (
            _df_to_matrix,
            audit_index,
            retrain_cells,
        )
        from w4h_etl_container_spark.plans.vectors import ann_recall

        d2, out, full = self._drifted(spark, tmp_path)
        # every base cell holds ~20 vectors; ask for a 50-way split of
        # TWO cells — each trains at most 20 sub-centroids, so the old
        # id arithmetic would have misaligned the second cell's rows
        man = retrain_cells(
            spark, out, full, cells=[0, 1], split_per_cell=50
        )
        cents = _df_to_matrix(
            spark.read.parquet(man["artifacts"]["centroids"]),
            "centroid",
            (man["n_centroids"], man["dim"]),
        )
        assert cents.shape[0] == man["n_centroids"]
        metas = man["retrains"][-1]["cells"]
        assert {m["cell"] for m in metas} == {0, 1}
        for m in metas:
            assert len(m["new_ids"]) <= 50
            assert max(m["new_ids"]) < man["n_centroids"]
        # ids written into partitions ⊆ acknowledged ids, none dead
        cells_path = os.path.join(out, "cells")
        on_disk = {
            int(e.split("=")[1])
            for e in os.listdir(cells_path)
            if e.startswith("centroid_id=")
        }
        assert on_disk <= set(range(man["n_centroids"]))
        assert on_disk.isdisjoint(set(man["dead_centroids"]))
        assert audit_index(spark, out)["consistent"]
        rec = ann_recall(
            spark, d2, out,
            nprobes=(man["n_centroids"],), n_queries=4, top_k=5, rerank=200,
        )
        assert rec[-1]["recall"] == 1.0

    def test_retrain_refuses_partial_source_and_tombstones(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            delete_from_index,
            retrain_cells,
        )

        d2, out, full = self._drifted(spark, tmp_path)
        with pytest.raises(ValueError, match="covers only"):
            retrain_cells(spark, out, full.where(F.col("vec_id") % 2 == 0))
        delete_from_index(
            spark, out, spark.createDataFrame([(0,)], "vec_id long")
        )
        with pytest.raises(ValueError, match="tombstones pending"):
            retrain_cells(spark, out, full)


class TestVectorIndexMaintain:
    """Round-14: the ANN maintenance policy — tombstone purge +
    drift retrain fired from measurements, in dependency order."""

    def test_drift_and_tombstones_fire_in_order(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            delete_from_index,
            maintain_vector_index,
        )

        d2, out, full = TestCellLocalRetrain._drifted(
            TestCellLocalRetrain(), spark, tmp_path
        )
        delete_from_index(
            spark, out, spark.createDataFrame([(2,)], "vec_id long")
        )
        dry = maintain_vector_index(
            spark, out, tombstone_max_rows=0, dry_run=True
        )
        assert set(dry["triggers"]) == {"purge-deletes", "retrain-drift"}
        assert dry["actions"] == []
        # drift without a raw-vector source: loud, not silent
        rep0 = maintain_vector_index(spark, out, tombstone_max_rows=0)
        assert rep0["actions"][0] == "purge-deletes"
        assert rep0["actions"][1] == "retrain-needed-no-source"
        # with the source: retrain runs (purge already happened)
        full_live = full.where(F.col("vec_id") != 2)
        rep = maintain_vector_index(
            spark, out, full_live, tombstone_max_rows=0
        )
        assert rep["actions"] == ["retrain-drift"]
        a = audit_index(spark, out)
        assert a["consistent"] and not a["needs_retrain"]
        rep2 = maintain_vector_index(
            spark, out, full_live, tombstone_max_rows=0
        )
        assert rep2["triggers"] == [] and rep2["actions"] == []

    def test_retrain_purges_shadow_below_threshold_first(
        self, spark, tmp_path
    ):
        """Even when the tombstone count is under its own threshold, a
        drift retrain must purge first — retrain_cells refuses a
        shadowed index."""
        from w4h_etl_container_spark.pipeline.vectorindex import (
            delete_from_index,
            maintain_vector_index,
        )

        d2, out, full = TestCellLocalRetrain._drifted(
            TestCellLocalRetrain(), spark, tmp_path
        )
        delete_from_index(
            spark, out, spark.createDataFrame([(3,)], "vec_id long")
        )
        full_live = full.where(F.col("vec_id") != 3)
        rep = maintain_vector_index(
            spark, out, full_live, tombstone_max_rows=10_000
        )
        assert rep["triggers"] == ["retrain-drift"]
        assert rep["actions"] == ["purge-deletes", "retrain-drift"]
