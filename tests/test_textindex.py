"""Materialized inverted text index (pipeline/textindex.py): the
index-consistency property (BM25 from the index == BM25 from the
corpus, row for row) and the layout property that makes the index an
index (query-term scans prune postings files via min/max skipping)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    from w4h_etl_container_spark.pipeline.textindex import build_text_index

    out = str(tmp_path_factory.mktemp("txtidx"))
    manifest = build_text_index(spark, sf_dir, out, n_files=8)
    return out, manifest


def _file_ranges(path: str, col: str):
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


class TestTextIndex:
    def test_bm25_from_index_identical_to_direct(self, spark, sf_dir, index_dir):
        from w4h_etl_container_spark.pipeline.textindex import bm25_topk_from_index
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES, q_bm25

        out, _ = index_dir
        direct = {
            (r["query_id"], r["doc_id"]): (r["bm25_e6"], r["rnk"])
            for r in q_bm25(spark, sf_dir).collect()
        }
        via_index = {
            (r["query_id"], r["doc_id"]): (r["bm25_e6"], r["rnk"])
            for r in bm25_topk_from_index(spark, out, BM25_QUERIES).collect()
        }
        assert via_index == direct

    def test_postings_files_prune_on_token(self, index_dir):
        out, _ = index_dir
        ranges = sorted(_file_ranges(os.path.join(out, "postings"), "token"))
        assert len(ranges) >= 2
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # disjoint token ranges = file-level skip
        # a single-term probe touches a strict subset of files
        probe = ranges[0][1]
        touching = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        assert touching < len(ranges)

    def test_manifest_counts_agree(self, spark, sf_dir, index_dir):
        out, manifest = index_dir
        dl = spark.read.parquet(os.path.join(out, "doc_lengths"))
        assert dl.count() == manifest["n_docs"]
        total = dl.groupBy().sum("dl").collect()[0][0]
        assert total == manifest["total_tokens"]

    def test_pushed_filter_reaches_postings_scan(self, spark, index_dir):
        from w4h_etl_container_spark.pipeline.textindex import bm25_topk_from_index
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES

        out, _ = index_dir
        plan = (
            bm25_topk_from_index(spark, out, BM25_QUERIES)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan and "In(token" in plan


class TestTextIndexAppend:
    def test_append_equals_rebuild_through_query_path(self, spark, tmp_path, sf_dir):
        """Index half the corpus, append the other half: BM25 through
        the appended index is row-identical to BM25 through an index
        rebuilt from the full corpus — idf/avgdl pick up the new stats,
        postings prune across both file generations."""
        import os
        import shutil

        from w4h_etl_container_spark.pipeline.textindex import (
            append_to_text_index,
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
        )
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        half_dir = str(tmp_path / "half")
        os.makedirs(half_dir)
        docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
            str(tmp_path / "halfpq")
        )
        for f in os.listdir(str(tmp_path / "halfpq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "halfpq" / f),
                    os.path.join(half_dir, "documents.parquet"),
                )
        idx = str(tmp_path / "idx")
        build_text_index(spark, half_dir, idx)
        append_to_text_index(
            spark, idx, docs.where(F.col("doc_id") % 2 == 1)
        )
        assert audit_text_index(spark, idx)["consistent"]

        full_idx = str(tmp_path / "fullidx")
        build_text_index(spark, sf_dir, full_idx)

        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES

        got = sorted(
            tuple(r)
            for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        want = sorted(
            tuple(r)
            for r in bm25_topk_from_index(spark, full_idx, BM25_QUERIES).collect()
        )
        assert got == want and got

    def test_replayed_batch_is_loud(self, spark, tmp_path, sf_dir):
        from w4h_etl_container_spark.pipeline.textindex import (
            append_to_text_index,
            audit_text_index,
            build_text_index,
        )
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        idx = str(tmp_path / "idx2")
        build_text_index(spark, sf_dir, idx)
        batch = docs.limit(5)
        append_to_text_index(spark, idx, batch)
        audit = audit_text_index(spark, idx)
        assert not audit["consistent"]  # replay: duplicate doc_ids
        assert audit["doc_lengths_rows"] == audit["distinct_doc_ids"] + 5


class TestIndexedHybridRetrieval:
    def test_lexical_arm_identical_and_fusion_arithmetic_exact(
        self, spark, tmp_path, sf_dir, index_dir
    ):
        """The composed serving path: its lexical arm must equal the
        declared q_bm25 rows exactly (index consistency), and every
        fused score must recompute from the two arm rank tables via
        the integer RRF formula — so the composition adds no
        arithmetic of its own."""
        from w4h_etl_container_spark.pipeline.textindex import (
            bm25_topk_from_index,
            rrf_fusion_indexed,
        )
        from w4h_etl_container_spark.pipeline.vectorindex import (
            build_vector_index,
            search_index,
        )
        from w4h_etl_container_spark.plans.retrieval import (
            BM25_QUERIES,
            q_bm25,
        )

        tidx, _ = index_dir
        vidx = str(tmp_path / "vidx")
        build_vector_index(spark, sf_dir, vidx, n_centroids=4, iters=2)

        fused = rrf_fusion_indexed(spark, sf_dir, tidx, vidx).collect()
        assert fused

        lex = {
            (r["query_id"], r["doc_id"]): r["rnk"]
            for r in q_bm25(spark, sf_dir).collect()
        }
        lex_idx = {
            (r["query_id"], r["doc_id"]): r["rnk"]
            for r in bm25_topk_from_index(
                spark, tidx, BM25_QUERIES
            ).collect()
        }
        assert lex == lex_idx  # index consistency through the arm

        # vector arm ranks, recomputed independently
        from pyspark.sql import Window as W
        from pyspark.sql import functions as FF

        qids = [q for q, _ in BM25_QUERIES]
        raw = search_index(
            spark, sf_dir, vidx, n_queries=max(qids) + 1, nprobe=2,
            top_k=10, rerank=40,
        ).where(FF.col("query_id").isin(qids))
        wv = W.partitionBy("query_id").orderBy(
            FF.col("dist2_e6").asc_nulls_last(), "cand_id"
        )
        vec = {
            (r["query_id"], r["cand_id"]): r["vr"]
            for r in raw.withColumn("vr", FF.row_number().over(wv))
            .where(FF.col("vr") <= 10)
            .collect()
        }
        for r in fused:
            key = (r["query_id"], r["doc_id"])
            want = 0
            if r["in_lexical"]:
                want += 1_000_000_000 // (60 + lex[key])
            if r["in_vector"]:
                want += 1_000_000_000 // (60 + vec[key])
            assert r["rrf_e9"] == want, (key, r["rrf_e9"], want)
            assert r["in_lexical"] == (key in lex)
            assert r["in_vector"] == (key in vec)


class TestTextIndexDeletes:
    """Round-11: document deletes on the inverted index — tombstones
    make a deleted doc immediately unscorable AND shift the corpus
    statistics (idf/avgdl) exactly as a rebuild on the survivors
    would; compaction physically purges and restores fresh clustering."""

    def test_delete_equals_rebuild_through_query_path(self, spark, tmp_path, sf_dir):
        import os
        import shutil

        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
            compact_text_index_deletes,
            delete_from_text_index,
        )
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents")
        idx = str(tmp_path / "idx")
        build_text_index(spark, sf_dir, idx)
        before = bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        # delete every doc the queries currently retrieve, plus a swath
        victims = sorted({r["doc_id"] for r in before})[:8]
        man = delete_from_text_index(
            spark, idx,
            spark.createDataFrame([(v,) for v in victims], "doc_id long"),
        )
        assert man["n_tombstones"] == len(victims)
        a1 = audit_text_index(spark, idx)
        assert a1["consistent"] and a1["n_tombstones"] == len(victims)

        got = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        assert not ({r[1] for r in got} & set(victims))

        # ground truth: rebuild on the surviving documents only —
        # scores must match EXACTLY (df, n_docs, avgdl all shifted)
        surv_dir = str(tmp_path / "surv")
        os.makedirs(surv_dir)
        docs.where(~F.col("doc_id").isin(victims)).coalesce(1).write.parquet(
            str(tmp_path / "survpq")
        )
        for f in os.listdir(str(tmp_path / "survpq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "survpq" / f),
                    os.path.join(surv_dir, "documents.parquet"),
                )
        rebuilt = str(tmp_path / "rebuilt")
        build_text_index(spark, surv_dir, rebuilt)
        want = sorted(
            tuple(r)
            for r in bm25_topk_from_index(spark, rebuilt, BM25_QUERIES).collect()
        )
        assert got == want and got

        # compaction: same results, tombstones gone, audit green
        man2 = compact_text_index_deletes(spark, idx)
        assert man2["n_tombstones"] == 0
        assert not os.path.exists(os.path.join(idx, "tombstones"))
        post = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        assert post == want
        a2 = audit_text_index(spark, idx)
        assert a2["consistent"] and a2["n_tombstones"] == 0

    def test_dead_batch_noop_and_append_guard(self, spark, tmp_path, sf_dir):
        """Round-12 (ADVICE): a batch of absent/already-dead ids is a
        TRUE idempotent no-op — the crashed-then-retried delete whose
        first attempt committed must succeed silently, not raise."""
        from w4h_etl_container_spark.pipeline.textindex import (
            append_to_text_index,
            build_text_index,
            delete_from_text_index,
        )
        from w4h_etl_container_spark.session import read_table

        idx = str(tmp_path / "gidx")
        build_text_index(spark, sf_dir, idx)
        man0 = json.load(open(os.path.join(idx, "MANIFEST.json")))
        # absent ids: manifest unchanged, nothing raised
        out = delete_from_text_index(
            spark, idx, spark.createDataFrame([(10**9,)], "doc_id long")
        )
        assert out == man0
        assert json.load(open(os.path.join(idx, "MANIFEST.json"))) == man0

        man1 = delete_from_text_index(
            spark, idx, spark.createDataFrame([(0,)], "doc_id long")
        )
        # replay of the SAME batch (post-commit retry): no-op, no drift
        man2 = delete_from_text_index(
            spark, idx, spark.createDataFrame([(0,)], "doc_id long")
        )
        assert man2 == man1
        assert man2["n_tombstones"] == 1
        back = read_table(spark, sf_dir, "documents").where(F.col("doc_id") == 0)
        with pytest.raises(ValueError, match="tombstoned"):
            append_to_text_index(spark, idx, back)

    def test_crash_debris_tombstone_file_is_invisible(self, spark, tmp_path, sf_dir):
        """Round-12 (ADVICE): the delete's commit point is the atomic
        manifest rename. A tombstone file written WITHOUT a manifest
        reference (crash between the two) filters nothing and shifts
        no stats — readers see the exact pre-delete index — and the
        retried delete commits cleanly without double-counting."""
        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
            delete_from_text_index,
        )
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES

        idx = str(tmp_path / "cidx")
        build_text_index(spark, sf_dir, idx)
        man0 = json.load(open(os.path.join(idx, "MANIFEST.json")))
        before = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        victim = before[0][1]
        # the "crash": tombstone rows on disk, manifest never flipped
        spark.createDataFrame([(victim,)], "doc_id long").write.parquet(
            os.path.join(idx, "tombstones", "batch-debris")
        )
        assert sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        ) == before  # debris invisible: scores identical
        a = audit_text_index(spark, idx)
        assert a["consistent"] and a["n_tombstones"] == 0

        # the retry: commits once, exactly
        man1 = delete_from_text_index(
            spark, idx, spark.createDataFrame([(victim,)], "doc_id long")
        )
        assert man1["n_tombstones"] == 1
        assert man1["n_docs"] == man0["n_docs"] - 1
        assert len(man1["tombstone_files"]) == 1
        assert "batch-debris" not in man1["tombstone_files"][0]
        got = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        assert victim not in {r[1] for r in got}
        assert audit_text_index(spark, idx)["consistent"]

    def test_stale_stats_cache_never_serves(self, spark, tmp_path, sf_dir):
        """Round-12 (ADVICE): scoring derives (n_docs, avgdl) from the
        manifest, so a crash AFTER the manifest commit but BEFORE the
        stats-parquet refresh degrades nothing — the cache is flagged
        stale by the audit, scores match a full rebuild regardless."""
        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
            delete_from_text_index,
        )
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES

        idx = str(tmp_path / "sidx")
        build_text_index(spark, sf_dir, idx)
        man0 = json.load(open(os.path.join(idx, "MANIFEST.json")))
        before = bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        victim = sorted({r["doc_id"] for r in before})[0]
        delete_from_text_index(
            spark, idx, spark.createDataFrame([(victim,)], "doc_id long")
        )
        scored = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        # simulate the crash window: restore the PRE-delete stats cache
        spark.createDataFrame(
            [(man0["n_docs"], man0["total_tokens"])],
            "n_docs long, total_tokens long",
        ).write.mode("overwrite").parquet(os.path.join(idx, "stats"))
        a = audit_text_index(spark, idx)
        assert a["consistent"] and not a["stats_cache_fresh"]
        # scores are identical: nothing reads the stale cache
        assert sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        ) == scored


class TestTextIndexSync:
    """Round-12: CDC from a documents mtable into the serving index —
    apply the version-diff change feed (deletes/updates tombstone +
    purge, inserts/update-post-images append) and land row-identical
    to a full rebuild on the new snapshot, through the BM25 query
    path."""

    def test_sync_equals_rebuild_through_query_path(self, spark, tmp_path, sf_dir):
        import shutil

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_merge,
            mtable_read,
        )
        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            bm25_topk_from_index,
            build_text_index,
            sync_text_index,
        )
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        ).select("doc_id", "text")
        tdir = str(tmp_path / "docs-table")
        mtable_create(spark, docs, tdir)
        # the index over snapshot v0 (the mtable's own content)
        v0dir = str(tmp_path / "v0docs")
        os.makedirs(v0dir)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "v0pq"))
        for f in os.listdir(str(tmp_path / "v0pq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "v0pq" / f), os.path.join(v0dir, "documents.parquet")
                )
        idx = str(tmp_path / "syncidx")
        build_text_index(spark, v0dir, idx)

        # churn: rewrite two docs' texts, insert two fresh docs,
        # delete two docs the queries can see
        before = bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        seen = sorted({r["doc_id"] for r in before})
        upd_ids, del_ids = seen[:2], seen[2:4]
        updates = docs.where(F.col("doc_id").isin(upd_ids)).select(
            "doc_id", F.concat(F.lit("fresh rewrite of "), "text").alias("text")
        ).unionByName(
            spark.createDataFrame(
                [
                    (10_000_001, "brand new document about regional supply"),
                    (10_000_002, "another new document mentioning nation keys"),
                ],
                "doc_id long, text string",
            )
        )
        mtable_merge(spark, tdir, updates, "doc_id")  # v1
        mtable_delete(
            spark, tdir,
            spark.createDataFrame([(i,) for i in del_ids], "doc_id long"),
            "doc_id",
        )  # v2

        out = sync_text_index(spark, idx, tdir, 0, 2)
        assert out["inserted"] == 2 and out["updated"] == 2 and out["deleted"] == 2
        assert audit_text_index(spark, idx)["consistent"]

        # ground truth: rebuild from the v2 snapshot
        v2dir = str(tmp_path / "v2docs")
        os.makedirs(v2dir)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "v2pq"))
        for f in os.listdir(str(tmp_path / "v2pq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "v2pq" / f), os.path.join(v2dir, "documents.parquet")
                )
        rebuilt = str(tmp_path / "rebuiltidx")
        build_text_index(spark, v2dir, rebuilt)
        got = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, BM25_QUERIES).collect()
        )
        want = sorted(
            tuple(r)
            for r in bm25_topk_from_index(spark, rebuilt, BM25_QUERIES).collect()
        )
        assert got == want and got
        assert not ({r[1] for r in got} & set(del_ids))

    def test_sync_resumes_from_recorded_watermark(self, spark, tmp_path, sf_dir):
        import shutil

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_read,
        )
        from w4h_etl_container_spark.pipeline.textindex import (
            bm25_topk_from_index,
            build_text_index,
            sync_text_index,
        )
        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        ).select("doc_id", "text")
        tdir = str(tmp_path / "rw-table")
        mtable_create(spark, docs, tdir)
        v0dir = str(tmp_path / "rw-v0")
        os.makedirs(v0dir)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "rw-pq"))
        for f in os.listdir(str(tmp_path / "rw-pq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "rw-pq" / f), os.path.join(v0dir, "documents.parquet")
                )
        idx = str(tmp_path / "rw-idx")
        build_text_index(spark, v0dir, idx)

        # first sync must name its baseline; watermark unknown
        with pytest.raises(ValueError, match="from_version explicitly"):
            sync_text_index(spark, idx, tdir)
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(
                [(20_000_001, "resumable watermark document one")],
                "doc_id long, text string",
            ),
            "doc_id",
        )  # v1
        out1 = sync_text_index(spark, idx, tdir, from_version=0)
        assert out1 == {"inserted": 1, "updated": 0, "deleted": 0, "table_version": 1}

        # second commit; the sync RESUMES without being told from where
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(
                [(20_000_002, "resumable watermark document two")],
                "doc_id long, text string",
            ),
            "doc_id",
        )  # v2
        out2 = sync_text_index(spark, idx, tdir)
        assert out2 == {"inserted": 1, "updated": 0, "deleted": 0, "table_version": 2}
        # nothing new: no-op
        assert sync_text_index(spark, idx, tdir) == {
            "inserted": 0, "updated": 0, "deleted": 0, "table_version": 2
        }
        served = {
            r["doc_id"]
            for r in bm25_topk_from_index(
                spark, idx, ((0, ("resumable", "watermark")),), top_k=5
            ).collect()
        }
        assert {20_000_001, 20_000_002} <= served


class TestStreamingTableToIndex:
    def test_stream_merge_then_sync_serves_latest(self, spark, tmp_path, sf_dir):
        """The full serving loop a real deployment runs: a document
        stream lands in the mtable through the exactly-once merge sink
        (two micro-batches, the second REWRITING a doc), then the CDC
        sync carries the table's net change into the BM25 index —
        which must serve exactly what a rebuild on the final snapshot
        serves."""
        import shutil

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_read,
            mtable_sink,
            read_manifest,
        )
        from w4h_etl_container_spark.pipeline.textindex import (
            bm25_topk_from_index,
            build_text_index,
            sync_text_index,
        )
        from w4h_etl_container_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        ).select("doc_id", "text")
        tdir = str(tmp_path / "st-table")
        mtable_create(spark, docs, tdir)

        # index over the initial snapshot (v0)
        v0dir = str(tmp_path / "st-v0")
        os.makedirs(v0dir)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "st-pq"))
        for f in os.listdir(str(tmp_path / "st-pq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "st-pq" / f), os.path.join(v0dir, "documents.parquet")
                )
        idx = str(tmp_path / "st-idx")
        build_text_index(spark, v0dir, idx)

        # the stream: two micro-batch files — an insert, then a rewrite
        src = str(tmp_path / "st-src")
        spark.createDataFrame(
            [(30_000_001, "streamed document about nation regions")],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(30_000_001, "streamed document rewritten entirely different")],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
        ckpt = str(tmp_path / "st-ckpt")
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(mtable_sink(spark, tdir, key="doc_id"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        v_now = read_manifest(tdir)["version"]
        assert v_now >= 2  # two merge commits landed

        out = sync_text_index(spark, idx, tdir, from_version=0)
        assert out["table_version"] == v_now
        assert out["inserted"] == 1 and out["deleted"] == 0
        # ground truth: rebuild on the final snapshot
        v2dir = str(tmp_path / "st-v2")
        os.makedirs(v2dir)
        mtable_read(spark, tdir).coalesce(1).write.parquet(str(tmp_path / "st-pq2"))
        for f in os.listdir(str(tmp_path / "st-pq2")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "st-pq2" / f), os.path.join(v2dir, "documents.parquet")
                )
        rebuilt = str(tmp_path / "st-rebuilt")
        build_text_index(spark, v2dir, rebuilt)
        probe = ((0, ("streamed", "rewritten")),)
        got = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, idx, probe, top_k=5).collect()
        )
        want = sorted(
            tuple(r) for r in bm25_topk_from_index(spark, rebuilt, probe, top_k=5).collect()
        )
        assert got == want
        assert 30_000_001 in {r[1] for r in got}


class TestSyncWatermarkAtomicity:
    """Round-13 (advice fix): the sync watermark rides the LAST
    mutation's atomic manifest publish instead of a separate trailing
    write — a crash can no longer leave an applied append with an
    un-advanced watermark (the state whose replay double-appended
    postings)."""

    def _table_and_index(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create
        from w4h_etl_container_spark.pipeline.textindex import build_text_index

        docs = spark.createDataFrame(
            [(i, f"document number {i} about topic {i % 3}") for i in range(20)],
            "doc_id long, text string",
        )
        tdir = str(tmp_path / "t")
        mtable_create(spark, docs, tdir)
        src = str(tmp_path / "src")
        os.makedirs(src)
        docs.coalesce(1).write.parquet(str(tmp_path / "pq"))
        import shutil
        for f in os.listdir(str(tmp_path / "pq")):
            if f.endswith(".parquet"):
                shutil.copy(
                    str(tmp_path / "pq" / f), os.path.join(src, "documents.parquet")
                )
        idx = str(tmp_path / "idx")
        build_text_index(spark, src, idx)
        return tdir, idx

    def test_watermark_rides_append_publish(self, spark, tmp_path):
        import json as _json

        from w4h_etl_container_spark.pipeline.mtable import mtable_merge
        from w4h_etl_container_spark.pipeline.textindex import sync_text_index

        tdir, idx = self._table_and_index(spark, tmp_path)
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(
                [(100, "a brand new doc"), (101, "another brand new doc")],
                "doc_id long, text string",
            ),
            "doc_id",
        )
        sync_text_index(spark, idx, tdir, from_version=0)
        # ONE read of the manifest shows the append AND the watermark
        # together — they were published in the same atomic rename
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        assert man["synced_table_version"] == 1
        assert man.get("appends") and man["n_docs"] == 22

    def test_crash_before_any_publish_replays_clean(
        self, spark, tmp_path, monkeypatch
    ):
        import json as _json

        from w4h_etl_container_spark.pipeline import textindex as ti
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_merge,
        )

        tdir, idx = self._table_and_index(spark, tmp_path)
        mtable_merge(
            spark, tdir,
            spark.createDataFrame(
                [(5, "rewritten five"), (200, "fresh two hundred")],
                "doc_id long, text string",
            ),
            "doc_id",
        )
        mtable_delete(
            spark, tdir, spark.createDataFrame([(7,)], "doc_id long"), "doc_id"
        )
        # crash the FIRST manifest publish inside the sync (the delete
        # commit): nothing is visible, the watermark stays at 0
        real = ti._write_index_manifest
        calls = {"n": 0}

        def boom(index_dir, man):
            calls["n"] += 1
            raise OSError("injected crash at the delete commit point")

        monkeypatch.setattr(ti, "_write_index_manifest", boom)
        with pytest.raises(OSError):
            ti.sync_text_index(spark, idx, tdir, from_version=0)
        monkeypatch.setattr(ti, "_write_index_manifest", real)
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        assert "synced_table_version" not in man  # watermark un-advanced
        # resume: the full sync replays (its applied prefix was nothing
        # visible) and converges — doc 7 gone, 5 rewritten, 200 added
        out = ti.sync_text_index(spark, idx, tdir, from_version=0)
        assert out == {
            "inserted": 1, "updated": 1, "deleted": 1, "table_version": 2,
        }
        assert ti.audit_text_index(spark, idx)["consistent"]
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        assert man["synced_table_version"] == 2


class TestTextIndexMaintain:
    """Round-14: the maintenance policy — driver-metadata measurement,
    threshold triggers, actions through the existing primitives."""

    def _fresh(self, spark, tmp_path):
        import shutil

        from w4h_etl_container_spark.pipeline.textindex import build_text_index

        docs = spark.createDataFrame(
            [(i, f"doc {i} alpha beta") for i in range(40)],
            "doc_id long, text string",
        )
        src = str(tmp_path / "src")
        os.makedirs(src)
        docs.coalesce(1).write.parquet(str(tmp_path / "pq"))
        for f in os.listdir(str(tmp_path / "pq")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "pq" / f),
                            os.path.join(src, "documents.parquet"))
        idx = str(tmp_path / "idx")
        build_text_index(spark, src, idx, n_files=2)
        return idx

    def test_fragmentation_and_tombstones_fire_and_converge(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.textindex import (
            append_to_text_index,
            audit_text_index,
            delete_from_text_index,
            maintain_text_index,
        )

        idx = self._fresh(spark, tmp_path)
        for i in range(3):  # fragment: each append lands 2 more files
            append_to_text_index(
                spark, idx,
                spark.createDataFrame(
                    [(1000 + 10 * i + j, f"new doc gamma {i} {j}")
                     for j in range(3)],
                    "doc_id long, text string",
                ),
            )
        delete_from_text_index(
            spark, idx, spark.createDataFrame([(0,), (1,)], "doc_id long")
        )
        dry = maintain_text_index(
            spark, idx, tombstone_max_docs=1, postings_files_max=4,
            dry_run=True,
        )
        assert set(dry["triggers"]) == {"purge-deletes", "recluster-postings"}
        assert dry["actions"] == []
        assert dry["measured"]["n_postings_files"] > 4
        rep = maintain_text_index(
            spark, idx, tombstone_max_docs=1, postings_files_max=4
        )
        # the purge subsumes the recluster (it rewrites clustered)
        assert rep["actions"] == ["purge-deletes"]
        a = audit_text_index(spark, idx)
        assert a["consistent"] and a["n_tombstones"] == 0
        rep2 = maintain_text_index(
            spark, idx, tombstone_max_docs=1, postings_files_max=4
        )
        assert rep2["triggers"] == [] and rep2["actions"] == []

    def test_recluster_alone_restores_pruning(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.textindex import (
            append_to_text_index,
            bm25_topk_from_index,
            maintain_text_index,
        )

        idx = self._fresh(spark, tmp_path)
        for i in range(4):
            append_to_text_index(
                spark, idx,
                spark.createDataFrame(
                    [(2000 + i, f"appended delta {i}")],
                    "doc_id long, text string",
                ),
            )
        queries = ((1, ("alpha",)), (2, ("delta",)))
        before = sorted(map(tuple, bm25_topk_from_index(spark, idx, queries).collect()))
        rep = maintain_text_index(spark, idx, postings_files_max=4)
        assert rep["actions"] == ["recluster-postings"]
        import json as _json

        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        n_after = len([
            f for f in os.listdir(man["artifacts"]["postings"])
            if f.endswith(".parquet")
        ])
        assert n_after <= 8
        after = sorted(map(tuple, bm25_topk_from_index(spark, idx, queries).collect()))
        assert after == before  # scores identical across the recluster

    def test_stale_stats_cache_repaired(self, spark, tmp_path):
        import json as _json

        from w4h_etl_container_spark.pipeline.textindex import (
            audit_text_index,
            maintain_text_index,
        )

        idx = self._fresh(spark, tmp_path)
        with open(os.path.join(idx, "MANIFEST.json")) as f:
            man = _json.load(f)
        # simulate the crash window: stats cache lags the manifest
        spark.createDataFrame(
            [(1, 1)], "n_docs long, total_tokens long"
        ).write.mode("overwrite").parquet(man["artifacts"]["stats"])
        assert not audit_text_index(spark, idx)["stats_cache_fresh"]
        rep = maintain_text_index(spark, idx)
        assert rep["actions"] == ["refresh-stats-cache"]
        assert audit_text_index(spark, idx)["stats_cache_fresh"]
