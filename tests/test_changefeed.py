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


def _run_available(spark, table_dir, ckpt, fb, starting_version=None, **opts):
    reader = (
        spark.readStream.format("mtable_versions").option("table_dir", table_dir)
    )
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
    for k, v in opts.items():
        reader = reader.option(k, str(v))
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


class TestVersionStreamEdges:
    """Advisor r13 + verdict missing-#5: full replay from -1 must work
    (v0 has no parent manifest — it renders as snapshot inserts), a
    catch-up over a long history must checkpoint progress in bounded
    micro-batches, and a window spanning a schema evolution must
    deliver per-version diffs under each commit's own schema."""

    def test_full_replay_from_minus_one_delivers_v0_as_inserts(
        self, spark, tmp_path, table
    ):
        _register(spark)
        mtable_merge(
            spark, table,
            spark.createDataFrame(
                [(5, -1, "upd"), (500, -2, "new")], "k long, v long, tag string"
            ),
            "k",
        )  # v1
        got: dict[int, set] = {}

        def process(df, v):
            got[v] = {(r["k"], r["_change_type"]) for r in df.collect()}

        _run_available(
            spark, table, str(tmp_path / "ck"),
            apply_changes(spark, table, key="k", process=process),
            starting_version=-1,
        )
        assert sorted(got) == [0, 1]
        assert got[0] == {(k, "insert") for k in range(100)}
        assert got[1] == {(5, "update"), (500, "insert")}

    def test_starting_version_below_minus_one_rejected(self, spark, table):
        _register(spark)
        with pytest.raises(Exception, match="starting_version"):
            (
                spark.readStream.format("mtable_versions")
                .option("table_dir", table)
                .option("starting_version", "-2")
                .load()
                .writeStream.format("noop")
                .trigger(availableNow=True)
                .start()
                .awaitTermination(60)
            )

    def test_max_versions_per_batch_bounds_catchup(self, spark, tmp_path, table):
        _register(spark)
        for i in range(5):  # v1..v5 committed before the stream starts
            mtable_merge(
                spark, table,
                spark.createDataFrame(
                    [(i, -i, "x")], "k long, v long, tag string"
                ),
                "k",
            )
        batches: list[list[int]] = []

        def fb(batch_df, epoch_id):
            vs = sorted(r["version"] for r in batch_df.collect())
            if vs:
                batches.append(vs)

        # the Python data source runs ONE micro-batch per availableNow
        # trigger (no AvailableNow support — Spark logs the fallback),
        # so drive repeated runs against one checkpoint: each advances
        # by at most max_versions_per_batch and commits its progress
        for _ in range(5):
            _run_available(
                spark, table, str(tmp_path / "ck"), fb,
                starting_version=0, max_versions_per_batch=2,
            )
        assert [v for b in batches for v in b] == [1, 2, 3, 4, 5]
        assert all(len(b) <= 2 for b in batches)
        assert len(batches) >= 3  # the backlog really was split up

    def test_window_spanning_schema_evolution(self, spark, tmp_path, table):
        _register(spark)
        # v1 under the original 3-column schema; v2 ADDS a column; v3
        # writes under the evolved schema — one catch-up window spans
        # all three
        mtable_merge(
            spark, table,
            spark.createDataFrame([(1, -1, "a")], "k long, v long, tag string"),
            "k",
        )  # v1
        mtable_merge(
            spark, table,
            spark.createDataFrame(
                [(2, -2, "b", 0.5)], "k long, v long, tag string, score double"
            ),
            "k", schema_evolution=True,
        )  # v2
        mtable_merge(
            spark, table,
            spark.createDataFrame(
                [(3, -3, "c", 0.9)], "k long, v long, tag string, score double"
            ),
            "k",
        )  # v3
        got: dict[int, dict] = {}

        def process(df, v):
            got[v] = {
                r["k"]: (set(df.columns), r["_change_type"]) for r in df.collect()
            }

        _run_available(
            spark, table, str(tmp_path / "ck"),
            apply_changes(spark, table, key="k", process=process),
            starting_version=0,
        )
        assert sorted(got) == [1, 2, 3]
        # pre-evolution diff carries the old schema; evolved diffs the new
        assert got[1][1][0] == {"k", "v", "tag", "_change_type"}
        for v, k in ((2, 2), (3, 3)):
            cols, ctype = got[v][k]
            assert cols == {"k", "v", "tag", "score", "_change_type"}
            assert ctype == "update"


class TestPartitionedTableFeed:
    def test_stream_diffs_partitioned_commits(self, spark, tmp_path):
        """Round-14 partition spec composed with the change feed: diffs
        over a hive-partitioned mtable must carry the partition column
        (it lives in directory names, re-attached through basePath) and
        classify updates/inserts across partition boundaries."""
        _register(spark)
        df = spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(60)], "k long, p int, v long"
        )
        d = str(tmp_path / "ptab")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(3, 0, -1), (100, 2, -2)], "k long, p int, v long"
            ),
            "k",
        )  # v1: one update (k=3 stays in p=0), one insert into p=2
        got: dict[int, set] = {}

        def process(diff, v):
            got[v] = {
                (r["k"], r["p"], r["v"], r["_change_type"])
                for r in diff.collect()
            }

        _run_available(
            spark, d, str(tmp_path / "ck"),
            apply_changes(spark, d, key="k", process=process),
            starting_version=0,
        )
        assert got[1] == {
            (3, 0, -1, "update"),
            (100, 2, -2, "insert"),
        }


class TestRateLimitedSync:
    def test_bounded_catchup_drives_index_to_head(self, spark, tmp_path):
        """max_versions_per_batch composed with sync_index_on_changes:
        a backlog of commits applies in bounded micro-batches, each
        advancing the index watermark monotonically, converging to the
        same head state an unbounded catch-up reaches."""
        import json as _json
        import os as _os
        import shutil

        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            build_text_index,
            _write_index_manifest,
        )

        _register(spark)
        docs = spark.createDataFrame(
            [(i, f"doc {i} alpha") for i in range(20)], "doc_id long, text string"
        )
        tdir = str(tmp_path / "docs")
        mtable_create(spark, docs, tdir)
        src = str(tmp_path / "src")
        _os.makedirs(src)
        docs.coalesce(1).write.parquet(str(tmp_path / "pq"))
        for f in _os.listdir(str(tmp_path / "pq")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pq" / f),
                            _os.path.join(src, "documents.parquet"))
        idx = str(tmp_path / "idx")
        build_text_index(spark, src, idx)
        with open(_os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        man["synced_table_version"] = 0
        _write_index_manifest(idx, man)

        for v in range(1, 5):  # 4-commit backlog while the stream is down
            mtable_merge(
                spark, tdir,
                spark.createDataFrame(
                    [(100 + v, f"new doc {v} beta")], "doc_id long, text string"
                ),
                "doc_id",
            )
        ck = str(tmp_path / "ck")
        watermarks = []
        for _ in range(4):  # one micro-batch per availableNow run
            _run_available(
                spark, tdir, ck,
                sync_index_on_changes(spark, tdir, idx, kind="text"),
                starting_version=0, max_versions_per_batch=1,
            )
            with open(_os.path.join(idx, "MANIFEST.json")) as f:
                watermarks.append(_json.load(f)["synced_table_version"])
        assert watermarks == [1, 2, 3, 4]  # monotone, one version per batch
        assert audit_text_index(spark, idx)["consistent"]


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


class TestOperationalSoak:
    def test_fifty_commit_trickle_loop_stays_bounded(self, spark, tmp_path):
        """Round-15: the OPERATIONAL story end to end instead of
        per-feature — 50 trickle commits stream through the versions
        source into the text index with periodic mtable_maintain +
        maintain_text_index, a sink table rides along, and at the end:
        manifest descriptor bytes are bounded (segmented manifests),
        the segment cache is bounded, sink epoch metadata is bounded,
        and the served index is row-identical to a from-scratch
        rebuild of the final snapshot."""
        import json as _json
        import shutil

        from w4h_etl_container_spark.pipeline import mtable as M
        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
            maintain_text_index,
            _write_index_manifest,
        )

        _register(spark)
        words = ["alpha", "beta", "gamma", "delta", "omega"]
        docs = spark.createDataFrame(
            [(i, f"document {i} about {words[i % 5]}") for i in range(40)],
            "doc_id long, text string",
        )
        tdir = str(tmp_path / "docs")
        M.mtable_create(spark, docs, tdir)
        src = str(tmp_path / "src")
        os.makedirs(src)
        docs.coalesce(1).write.parquet(str(tmp_path / "pq"))
        for f in os.listdir(str(tmp_path / "pq")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pq" / f),
                            os.path.join(src, "documents.parquet"))
        idx = str(tmp_path / "idx")
        build_text_index(spark, src, idx)
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            iman = _json.load(f)
        iman["synced_table_version"] = 0
        _write_index_manifest(idx, iman)

        sink_dir = str(tmp_path / "sink")
        sink = M.mtable_sink(spark, sink_dir)
        ck = str(tmp_path / "ck")
        desc_sizes = []
        next_id = 1000
        for c in range(50):
            kind = c % 3
            if kind == 0:  # update an existing doc
                M.mtable_merge(
                    spark, tdir,
                    spark.createDataFrame(
                        [(c % 40, f"rewritten {c} about {words[c % 5]}")],
                        "doc_id long, text string",
                    ),
                    "doc_id",
                )
            elif kind == 1:  # insert a fresh doc (MOR upsert)
                M.mtable_merge(
                    spark, tdir,
                    spark.createDataFrame(
                        [(next_id, f"new {c} about {words[(c + 1) % 5]}")],
                        "doc_id long, text string",
                    ),
                    "doc_id", mode="mor",
                )
                next_id += 1
            else:  # MOR-delete a previously inserted doc
                M.mtable_delete(
                    spark, tdir,
                    spark.createDataFrame([(1000 + c % 5,)], "doc_id long"),
                    "doc_id", mode="mor",
                )
            sink(
                spark.createDataFrame([(c, c * 2)], "k long, v long"), c
            )
            man = M.read_manifest(tdir)
            desc_sizes.append(
                os.path.getsize(M._manifest_path(tdir, man["version"]))
            )
            if c % 10 == 9:
                _run_available(
                    spark, tdir, ck,
                    sync_index_on_changes(spark, tdir, idx, kind="text"),
                    starting_version=0,
                )
                M.mtable_maintain(spark, tdir)
                maintain_text_index(spark, idx)
                assert audit_text_index(spark, idx)["consistent"]

        # final catch-up (maintain commits moved the table past the
        # last sync) and the serving-parity check
        _run_available(
            spark, tdir, ck,
            sync_index_on_changes(spark, tdir, idx, kind="text"),
            starting_version=0,
        )
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            assert (_json.load(f)["synced_table_version"]
                    == M.read_manifest(tdir)["version"])

        # 1. manifest descriptor bytes bounded: the tail of a 50-commit
        # trickle must not carry O(all files ever) inline — segmented
        # manifests keep the descriptor at O(churn + segment refs)
        assert max(desc_sizes[-5:]) < 64 * 1024
        assert max(desc_sizes[-5:]) < 4 * max(desc_sizes[:5])
        # 2. segment cache FIFO-bounded
        assert len(M._SEG_CACHE) <= M._SEG_CACHE_MAX
        # 3. sink epoch metadata bounded + exactly-once intact
        sman = M.read_manifest(sink_dir)
        assert len(sman.get("epochs", [])) <= M._SINK_EPOCHS_KEPT
        assert sman["epoch_watermark"] == 49
        assert M.mtable_read(spark, sink_dir).count() == 50
        # 4. serving parity: CDC-synced index == rebuild of the final
        # snapshot, through the BM25 query path
        v_final = str(tmp_path / "vf")
        os.makedirs(v_final)
        M.mtable_read(spark, tdir).coalesce(1).write.parquet(
            str(tmp_path / "pqf")
        )
        for f in os.listdir(str(tmp_path / "pqf")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pqf" / f),
                            os.path.join(v_final, "documents.parquet"))
        rebuilt = str(tmp_path / "rebuilt")
        build_text_index(spark, v_final, rebuilt)
        queries = tuple((i + 1, (w,)) for i, w in enumerate(words))
        got = sorted(map(tuple, bm25_topk_from_index(spark, idx, queries).collect()))
        want = sorted(map(tuple, bm25_topk_from_index(spark, rebuilt, queries).collect()))
        assert got == want and got
