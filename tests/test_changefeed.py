"""Streaming change-feed source (streaming/changefeed.py): the
mtable version stream delivers each commit exactly once through
Structured Streaming's checkpoint, per-version diffs match the batch
``mtable_changes``, restarts resume after the last committed batch,
and the end-to-end serving loop (stream → sync_text_index) lands
row-identical to a full rebuild."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from w4h_etl_container_spark.pipeline.mtable import (
    mtable_changes,
    mtable_create,
    mtable_delete,
    mtable_merge,
    mtable_read,
)
from w4h_etl_container_spark.streaming.changefeed import (
    MtableVersionsDataSource,
    apply_changes,
    sync_index_on_changes,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i * 10, "orig") for i in range(100)], "k long, v long, tag string"
    )
    d = str(tmp_path / "t")
    mtable_create(spark, df, d)
    return d


def _register(spark):
    # idempotent across tests sharing the session
    spark.dataSource.register(MtableVersionsDataSource)


def _run_available(spark, table_dir, ckpt, fb, starting_version=None):
    reader = (
        spark.readStream.format("mtable_versions").option("table_dir", table_dir)
    )
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
    q = (
        reader.load()
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


class TestVersionStream:
    def test_per_version_diffs_match_batch_feed(self, spark, tmp_path, table):
        _register(spark)
        mtable_merge(
            spark, table,
            spark.createDataFrame(
                [(5, -1, "upd"), (500, -2, "new")], "k long, v long, tag string"
            ),
            "k",
        )  # v1
        mtable_delete(
            spark, table, spark.createDataFrame([(7,)], "k long"), "k", mode="mor"
        )  # v2 — a merge-on-read delete must stream too (file list unchanged)

        got: dict[int, set] = {}

        def process(df, v):
            got[v] = {(r["k"], r["_change_type"]) for r in df.collect()}

        _run_available(
            spark, table, str(tmp_path / "ck"),
            apply_changes(spark, table, key="k", process=process),
            starting_version=0,
        )
        assert sorted(got) == [1, 2]
        for v in (1, 2):
            want = {
                (r["k"], r["_change_type"])
                for r in mtable_changes(spark, table, v - 1, v, key="k").collect()
            }
            assert got[v] == want
        assert got[2] == {(7, "delete")}

    def test_restart_resumes_after_checkpoint(self, spark, tmp_path, table):
        _register(spark)
        seen: list[int] = []

        def process(df, v):
            seen.append(v)

        ck = str(tmp_path / "ck")
        fb = apply_changes(spark, table, key="k", process=process)
        mtable_merge(
            spark, table,
            spark.createDataFrame([(1, -1, "a")], "k long, v long, tag string"),
            "k",
        )  # v1
        _run_available(spark, table, ck, fb, starting_version=0)
        assert seen == [1]
        # new commits while the stream is down
        mtable_merge(
            spark, table,
            spark.createDataFrame([(2, -2, "b")], "k long, v long, tag string"),
            "k",
        )  # v2
        mtable_merge(
            spark, table,
            spark.createDataFrame([(3, -3, "c")], "k long, v long, tag string"),
            "k",
        )  # v3
        _run_available(spark, table, ck, fb)  # same checkpoint
        # versions 2 and 3 delivered exactly once; v1 never re-delivered
        assert seen == [1, 2, 3]
        # idle restart delivers nothing
        _run_available(spark, table, ck, fb)
        assert seen == [1, 2, 3]

    def test_default_start_skips_history(self, spark, tmp_path, table):
        _register(spark)
        mtable_merge(
            spark, table,
            spark.createDataFrame([(1, -1, "a")], "k long, v long, tag string"),
            "k",
        )  # v1 — committed BEFORE the stream starts
        seen: list[int] = []

        def process(df, v):
            seen.append(v)

        ck = str(tmp_path / "ck")
        fb = apply_changes(spark, table, key="k", process=process)
        _run_available(spark, table, ck, fb)  # default: current version
        assert seen == []
        mtable_merge(
            spark, table,
            spark.createDataFrame([(2, -2, "b")], "k long, v long, tag string"),
            "k",
        )  # v2
        _run_available(spark, table, ck, fb)
        assert seen == [2]


class TestStreamedIndexSync:
    def test_serving_loop_stream_vs_batch_parity(self, spark, tmp_path):
        import shutil

        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
        )

        _register(spark)
        docs = spark.createDataFrame(
            [(i, f"document {i} about topic {['alpha','beta','gamma'][i % 3]}")
             for i in range(30)],
            "doc_id long, text string",
        )
        tdir = str(tmp_path / "docs")
        mtable_create(spark, docs, tdir)
        src = str(tmp_path / "src")
        os.makedirs(src)
        docs.coalesce(1).write.parquet(str(tmp_path / "pq"))
        for f in os.listdir(str(tmp_path / "pq")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pq" / f),
                            os.path.join(src, "documents.parquet"))
        idx = str(tmp_path / "idx")
        build_text_index(spark, src, idx)
        import json as _json
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        man["synced_table_version"] = 0
        from w4h_etl_container_spark.pipeline.textindex import (
            _write_index_manifest,
        )
        _write_index_manifest(idx, man)

        # churn across THREE commits, then one availableNow pass
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(
                [(3, "rewritten three about delta"),
                 (400, "brand new four hundred about alpha")],
                "doc_id long, text string",
            ),
            "doc_id",
        )  # v1
        mtable_delete(
            spark, tdir, spark.createDataFrame([(9,)], "doc_id long"),
            "doc_id", mode="mor",
        )  # v2
        mtable_merge(
            spark, tdir,
            spark.createDataFrame([(401, "new doc about beta")],
                                  "doc_id long, text string"),
            "doc_id",
        )  # v3
        ck = str(tmp_path / "ck")
        _run_available(
            spark, tdir, ck,
            sync_index_on_changes(spark, tdir, idx, kind="text"),
            starting_version=0,
        )
        assert audit_text_index(spark, idx)["consistent"]
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            assert _json.load(f)["synced_table_version"] == 3

        # ground truth: rebuild from the v3 snapshot
        v3 = str(tmp_path / "v3")
        os.makedirs(v3)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "pq3"))
        for f in os.listdir(str(tmp_path / "pq3")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pq3" / f),
                            os.path.join(v3, "documents.parquet"))
        rebuilt = str(tmp_path / "rebuilt")
        build_text_index(spark, v3, rebuilt)
        queries = ((1, ("alpha",)), (2, ("beta",)), (3, ("delta", "topic")))
        got = sorted(map(tuple, bm25_topk_from_index(spark, idx, queries).collect()))
        want = sorted(map(tuple, bm25_topk_from_index(spark, rebuilt, queries).collect()))
        assert got == want and got

        # replay safety: wipe the checkpoint (forces full re-delivery
        # from starting_version) — the sync watermark makes it a no-op
        _run_available(
            spark, tdir, str(tmp_path / "ck2"),
            sync_index_on_changes(spark, tdir, idx, kind="text"),
            starting_version=0,
        )
        assert audit_text_index(spark, idx)["consistent"]
        got2 = sorted(map(tuple, bm25_topk_from_index(spark, idx, queries).collect()))
        assert got2 == want


class TestStreamedVectorSync:
    def test_vector_kind_serving_loop(self, spark, tmp_path):
        import json as _json
        import shutil

        import numpy as np

        from w4h_etl_container_spark.pipeline.vectorindex import (
            audit_index,
            build_vector_index,
            search_index,
            _write_index_manifest,
        )
        from w4h_etl_container_spark.testing import write_planted_embeddings

        _register(spark)
        base = str(tmp_path / "base")
        write_planted_embeddings(base, n_clusters=4, per_cluster=10, seed=3)
        emb = spark.read.parquet(f"{base}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        tdir = str(tmp_path / "vtab")
        mtable_create(spark, emb, tdir)
        idx = str(tmp_path / "vidx")
        build_vector_index(spark, base, idx, n_centroids=4, m=8, k=16, iters=2)
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        man["synced_table_version"] = 0
        _write_index_manifest(idx, man)

        # churn: delete two vectors (one MOR), insert two fresh ones
        mtable_delete(
            spark, tdir, spark.createDataFrame([(0,)], "vec_id long"), "vec_id"
        )  # v1 cow
        mtable_delete(
            spark, tdir, spark.createDataFrame([(1,)], "vec_id long"),
            "vec_id", mode="mor",
        )  # v2 mor
        anchor = np.array(
            emb.where(F.col("vec_id") == 5).collect()[0]["embedding"]
        )
        fresh = [
            (int(900 + i), (anchor + 0.001 * i).tolist()) for i in range(2)
        ]
        fresh_df = spark.createDataFrame(
            fresh, "vec_id long, embedding array<double>"
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        mtable_merge(spark, tdir, fresh_df, "vec_id")  # v3

        ck = str(tmp_path / "ck")
        _run_available(
            spark, tdir, ck,
            sync_index_on_changes(spark, tdir, idx, kind="vector"),
            starting_version=0,
        )
        a = audit_index(spark, idx)
        assert a["consistent"]
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            assert _json.load(f)["synced_table_version"] == 3
        # the index serves the new snapshot: deleted ids gone, fresh in
        served = {
            r["cand_id"]
            for r in search_index(
                spark, base, idx, n_queries=4, nprobe=4, top_k=40
            ).collect()
        }
        assert 0 not in served and 1 not in served
        assert {900, 901} <= served
