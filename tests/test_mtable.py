"""Manifest table (pipeline/mtable.py): copy-on-write MERGE that
provably rewrites only matched files, snapshot isolation via the
manifest pointer, time travel, and vacuum — the mutation path a
100 TB table needs (full-table rewrites don't scale; untouched bytes
must stay untouched, verified here at the os.stat level)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from w4h_etl_container_spark.pipeline.mtable import (
    mtable_create,
    mtable_merge,
    mtable_read,
    mtable_vacuum,
    read_manifest,
)


@pytest.fixture()
def table(spark, tmp_path):
    """A key-clustered table (disjoint per-file key ranges, like any
    maintained big table) of 10 files × 100 rows."""
    from w4h_etl_container_spark.operators.layout import cluster_by

    df = cluster_by(
        spark.range(0, 1000).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.lit("orig").alias("tag"),
        ),
        ["k"],
        n_files=10,
    )
    d = str(tmp_path / "mtable")
    man = mtable_create(spark, df, d)
    assert man["version"] == 0 and len(man["files"]) >= 8
    return d


def _stat(table_dir, files):
    return {f: os.stat(os.path.join(table_dir, f)).st_mtime_ns for f in files}


class TestMtableMerge:
    def test_merge_semantics_match_full_table_merge(self, spark, table):
        updates = spark.createDataFrame(
            [(5, -1, "upd"), (777, -2, "upd"), (2000, -3, "new")],
            "k long, v long, tag string",
        )
        before = mtable_read(spark, table).collect()
        mtable_merge(spark, table, updates, "k")
        got = {r["k"]: (r["v"], r["tag"]) for r in mtable_read(spark, table).collect()}
        # independent full-table rendering of the same upsert
        want = {r["k"]: (r["v"], r["tag"]) for r in before}
        want.update({5: (-1, "upd"), 777: (-2, "upd"), 2000: (-3, "new")})
        assert got == want
        assert len(got) == 1001  # 1000 originals + 1 inserted key

    def test_untouched_files_not_rewritten(self, spark, table):
        man0 = read_manifest(table)
        stats0 = _stat(table, man0["files"])
        # both update keys land in ONE clustered file's range
        updates = spark.createDataFrame(
            [(10, -1, "upd"), (11, -2, "upd")], "k long, v long, tag string"
        )
        man1 = mtable_merge(spark, table, updates, "k")
        assert man1["files_rewritten"] == 1
        assert man1["files_untouched"] == len(man0["files"]) - 1
        # every untouched file is the SAME file (inode-level untouched)
        survivors = set(man0["files"]) & set(man1["files"])
        assert len(survivors) == len(man0["files"]) - 1
        assert _stat(table, survivors) == {
            f: stats0[f] for f in survivors
        }

    def test_time_travel_and_snapshot_isolation(self, spark, table):
        v0_rows = {r["k"]: r["v"] for r in mtable_read(spark, table, version=0).collect()}
        updates = spark.createDataFrame([(3, -9, "upd")], "k long, v long, tag string")
        mtable_merge(spark, table, updates, "k")
        # the old version still reads EXACTLY its original content
        again = {r["k"]: r["v"] for r in mtable_read(spark, table, version=0).collect()}
        assert again == v0_rows and again[3] == 30
        # and the new version sees the update
        assert {
            r["v"] for r in mtable_read(spark, table).where(F.col("k") == 3).collect()
        } == {-9}

    def test_vacuum_drops_only_unreferenced(self, spark, table):
        updates = spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, updates, "k")
        man1 = read_manifest(table)
        out = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        # v0's rewritten file is gone; v1 still reads completely
        assert out["retained_versions"] == [1]
        assert all(f not in man1["files"] for f in out["removed_files"])
        assert mtable_read(spark, table).count() == 1000
        with pytest.raises(FileNotFoundError):
            read_manifest(table, 0)

    def test_insert_only_batch_touches_nothing(self, spark, table):
        man0 = read_manifest(table)
        updates = spark.createDataFrame(
            [(5000, -1, "new"), (5001, -2, "new")], "k long, v long, tag string"
        )
        man1 = mtable_merge(spark, table, updates, "k")
        assert man1["files_rewritten"] == 0
        assert set(man0["files"]) <= set(man1["files"])
        assert mtable_read(spark, table).count() == 1002

    def test_empty_batch_refused(self, spark, table):
        empty = spark.createDataFrame([], "k long, v long, tag string")
        with pytest.raises(ValueError, match="empty update batch"):
            mtable_merge(spark, table, empty, "k")


class TestMtableDeleteAndCompact:
    def test_delete_targets_only_matched_files(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        man0 = read_manifest(table)
        keys = spark.createDataFrame([(10,), (11,)], "k long")
        man1 = mtable_delete(spark, table, keys, "k")
        assert man1["files_rewritten"] == 1
        assert len(set(man0["files"]) & set(man1["files"])) == len(man0["files"]) - 1
        got = mtable_read(spark, table)
        assert got.count() == 998
        assert got.where(F.col("k").isin(10, 11)).count() == 0
        # delete is idempotent: a second run commits and changes nothing
        man2 = mtable_delete(spark, table, keys, "k")
        assert mtable_read(spark, table).count() == 998
        assert man2["version"] == man1["version"] + 1

    def test_compact_is_a_version_and_preserves_rows(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_merge,
        )

        # churn: a few merges leave extra small files behind
        for i in range(3):
            mtable_merge(
                spark,
                table,
                spark.createDataFrame(
                    [(i * 100 + 1, -i, "u")], "k long, v long, tag string"
                ),
                "k",
            )
        man_before = read_manifest(table)
        man = mtable_compact(spark, table, target_bytes=1 << 20)
        assert man["op"] == "compact"
        assert man["files_out"] <= len(man_before["files"])
        assert mtable_read(spark, table).count() == 1000
        # pre-compaction version still time-travels
        old = mtable_read(spark, table, version=man_before["version"])
        assert old.count() == 1000


class TestMtableStreamingSink:
    def test_exactly_once_append_through_stream(self, spark, tmp_path, sf_dir):
        """Drive a real AvailableNow file stream into an mtable via the
        epoch-deduped sink: table contents equal the batch input, a
        re-trigger with no new files commits nothing, and a manually
        REPLAYED epoch is a no-op (the crash-recovery contract)."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink
        from w4h_etl_container_spark.session import read_events

        ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")
        src = str(tmp_path / "snk-src")
        ev.where(F.col("event_id") < 500).coalesce(1).write.mode("append").parquet(src)
        ev.where(F.col("event_id") >= 500).coalesce(1).write.mode("append").parquet(src)
        tdir = str(tmp_path / "snk-table")
        ckpt = str(tmp_path / "snk-ckpt")
        sink = mtable_sink(spark, tdir)

        def drain():
            q = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        man = read_manifest(tdir)
        assert len(man["epochs"]) >= 2  # two micro-batches committed
        assert mtable_read(spark, tdir).count() == ev.count()
        v_after = man["version"]

        # re-trigger with nothing new: no further version
        drain()
        assert read_manifest(tdir)["version"] == v_after

        # simulate the crash-recovery replay: re-deliver the LAST epoch
        last_epoch = man["epochs"][-1]
        sink(ev.limit(7), last_epoch)
        assert read_manifest(tdir)["version"] == v_after
        assert mtable_read(spark, tdir).count() == ev.count()

        # a genuinely new epoch commits
        sink(ev.limit(7), last_epoch + 1000)
        assert read_manifest(tdir)["version"] == v_after + 1
        assert mtable_read(spark, tdir).count() == ev.count() + 7

    def test_merge_mode_sink_upserts_by_key(self, spark, tmp_path):
        """key= sink mode: replayed epochs skipped AND batches upsert —
        the streaming CDC-apply shape."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink

        tdir = str(tmp_path / "snk2")
        sink = mtable_sink(spark, tdir, key="k")
        sink(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
        sink(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), 1)
        got = {r["k"]: r["v"] for r in mtable_read(spark, tdir).collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
        # replay of epoch 1: nothing changes
        sink(spark.createDataFrame([(2, "XXX")], "k long, v string"), 1)
        got = {r["k"]: r["v"] for r in mtable_read(spark, tdir).collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
        man = read_manifest(tdir)
        assert man["epochs"] == [0, 1]


class TestMtableModelCheck:
    def test_random_op_sequences_match_dict_model(self, spark, tmp_path):
        """Model-based check: random merge/delete/compact sequences
        against a plain dict reference — after EVERY op the table's
        full contents equal the model, and version history stays
        readable. Seeded (deterministic), three sequences of six ops."""
        import random

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_create,
            mtable_delete,
            mtable_merge,
            mtable_read,
        )

        for seed in (1, 2, 3):
            rng = random.Random(seed)
            d = str(tmp_path / f"model{seed}")
            init = {k: rng.randrange(1000) for k in range(0, 40)}
            mtable_create(
                spark,
                spark.createDataFrame(sorted(init.items()), "k long, v long"),
                d,
            )
            model = dict(init)
            for step in range(6):
                op = rng.choice(["merge", "merge", "delete", "compact"])
                if op == "merge":
                    batch = {
                        rng.randrange(0, 60): rng.randrange(1000)
                        for _ in range(rng.randrange(1, 6))
                    }
                    mtable_merge(
                        spark,
                        d,
                        spark.createDataFrame(
                            sorted(batch.items()), "k long, v long"
                        ),
                        "k",
                    )
                    model.update(batch)
                elif op == "delete":
                    ks = [rng.randrange(0, 60) for _ in range(rng.randrange(1, 4))]
                    mtable_delete(
                        spark,
                        d,
                        spark.createDataFrame([(k,) for k in ks], "k long"),
                        "k",
                    )
                    for k in ks:
                        model.pop(k, None)
                else:
                    mtable_compact(spark, d, target_bytes=1 << 20)
                got = {
                    r["k"]: r["v"] for r in mtable_read(spark, d).collect()
                }
                assert got == model, (seed, step, op)


class TestMtableMergeAgg:
    def test_incremental_refresh_equals_full_recompute(self, spark, tmp_path, sf_dir):
        """Maintain a per-user (n, total, mx) profile table through two
        event-batch deltas; after each refresh the table equals the
        full-history aggregate recomputed from scratch — the
        materialized-view invariant, via footer-pruned touches only."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge_agg,
            mtable_read,
        )
        from w4h_etl_container_spark.session import read_events

        ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")

        def agg(df):
            return df.groupBy("user_id").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("value").alias("total"),
                F.max("value").alias("mx"),
            )

        b1 = ev.where(F.col("event_id") % 3 == 0)
        b2 = ev.where(F.col("event_id") % 3 == 1)
        b3 = ev.where(F.col("event_id") % 3 == 2)

        d = str(tmp_path / "profiles")
        mtable_create(spark, agg(b1), d)
        mtable_merge_agg(
            spark, d, agg(b2), "user_id", {"n": "sum", "total": "sum", "mx": "max"}
        )
        mtable_merge_agg(
            spark, d, agg(b3), "user_id", {"n": "sum", "total": "sum", "mx": "max"}
        )
        got = {
            r["user_id"]: (r["n"], round(r["total"], 6), r["mx"])
            for r in mtable_read(spark, d).collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["total"], 6), r["mx"])
            for r in agg(ev).collect()
        }
        # float addition order differs between incremental and one-shot
        # sums — compare totals at 1e-6 (counts and maxes are exact)
        assert set(got) == set(want)
        for u in want:
            assert got[u][0] == want[u][0] and got[u][2] == want[u][2]
            assert abs(got[u][1] - want[u][1]) < 1e-6

    def test_unsupported_combine_refused(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge_agg,
        )

        d = str(tmp_path / "bad")
        df = spark.createDataFrame([(1, 2.0)], "k long, v double")
        mtable_create(spark, df, d)
        with pytest.raises(ValueError, match="unsupported combine"):
            mtable_merge_agg(spark, d, df, "k", {"v": "avg"})


class TestMtableCrashRecovery:
    def test_orphan_data_files_invisible_and_vacuumed(self, spark, table):
        """Simulate a crash BETWEEN data-file write and manifest
        publish: the orphan generation is invisible to every reader
        (manifest-resolved file lists only) and vacuum reclaims it."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_vacuum

        n0 = mtable_read(spark, table).count()
        # the "crash": files written, no manifest published
        from w4h_etl_container_spark.pipeline import mtable as M

        orphans = M._new_data_files(
            table,
            spark.createDataFrame([(9999, 1, "ghost")], "k long, v long, tag string"),
        )
        assert orphans
        # readers: unchanged
        assert mtable_read(spark, table).count() == n0
        got = mtable_read(spark, table).where(F.col("k") == 9999).count()
        assert got == 0
        # vacuum reclaims the orphan files
        out = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        assert set(orphans) <= set(out["removed_files"])
        assert mtable_read(spark, table).count() == n0


class TestMtableStringKeys:
    def test_merge_on_string_key_prunes_and_upserts(self, spark, tmp_path):
        """Footer stats for string keys surface as bytes — the range
        pruning must still work (decoded comparison) and the merge must
        stay file-targeted on a string-clustered table."""
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_read,
        )

        rows = [(f"user{i:04d}", i) for i in range(400)]
        df = cluster_by(
            spark.createDataFrame(rows, "uid string, v long"), ["uid"], n_files=8
        )
        d = str(tmp_path / "stab")
        mtable_create(spark, df, d)
        man = mtable_merge(
            spark,
            d,
            spark.createDataFrame(
                [("user0001", -1), ("user9999", -2)], "uid string, v long"
            ),
            "uid",
        )
        # pruning engaged: most files untouched
        assert man["files_rewritten"] <= 2
        assert man["files_untouched"] >= 6
        got = {r["uid"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got["user0001"] == -1 and got["user9999"] == -2
        assert len(got) == 401


class TestMtableAggSink:
    def test_streaming_aggregate_view_with_replay_safety(self, spark, tmp_path):
        """combine-mode sink: per-batch deltas fold into a stored
        per-key aggregate; a replayed epoch must NOT double-add (the
        epoch rides merge_agg's own atomic publish)."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink

        d = str(tmp_path / "aggsink")
        sink = mtable_sink(spark, d, key="k", combine={"n": "sum", "mx": "max"})
        sink(spark.createDataFrame([(1, 2, 10.0), (2, 1, 5.0)], "k long, n long, mx double"), 0)
        sink(spark.createDataFrame([(1, 3, 7.0), (3, 1, 1.0)], "k long, n long, mx double"), 1)
        got = {r["k"]: (r["n"], r["mx"]) for r in mtable_read(spark, d).collect()}
        assert got == {1: (5, 10.0), 2: (1, 5.0), 3: (1, 1.0)}
        # replay epoch 1: totals unchanged (NOT double-added)
        sink(spark.createDataFrame([(1, 3, 7.0), (3, 1, 1.0)], "k long, n long, mx double"), 1)
        got = {r["k"]: (r["n"], r["mx"]) for r in mtable_read(spark, d).collect()}
        assert got == {1: (5, 10.0), 2: (1, 5.0), 3: (1, 1.0)}
        man = read_manifest(d)
        assert man["epochs"] == [0, 1]


class TestMtableJoinPath:
    """Round-11: the driver-side exact-key collect is count-gated; wide
    batches take a join-based file-match path that never ships keys to
    the driver. The two paths must agree exactly."""

    def _fresh(self, spark, tmp_path, name):
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = cluster_by(
            spark.range(0, 1000).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("orig").alias("tag"),
            ),
            ["k"],
            n_files=10,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        return d

    def test_join_path_matches_collect_path(self, spark, tmp_path):
        """Same wide-ish batch merged through BOTH strategies lands the
        same table content, the same files rewritten, and the manifest
        records which path ran."""
        updates = spark.range(0, 1000, 7).select(  # 143 keys across all files
            F.col("id").alias("k"), F.lit(-1).alias("v"), F.lit("upd").alias("tag")
        ).unionByName(
            spark.createDataFrame([(5000, -2, "new")], "k long, v long, tag string")
        )
        da = self._fresh(spark, tmp_path, "collectpath")
        db = self._fresh(spark, tmp_path, "joinpath")
        man_a = mtable_merge(spark, da, updates, "k")  # default cap: collect
        man_b = mtable_merge(spark, db, updates, "k", max_collect_keys=0)  # force join
        assert man_a["key_match_path"] == "collect"
        assert man_b["key_match_path"] == "join"
        assert man_a["files_rewritten"] == man_b["files_rewritten"]
        assert man_a["files_untouched"] == man_b["files_untouched"]
        got_a = {r["k"]: (r["v"], r["tag"]) for r in mtable_read(spark, da).collect()}
        got_b = {r["k"]: (r["v"], r["tag"]) for r in mtable_read(spark, db).collect()}
        assert got_a == got_b and got_a[7] == (-1, "upd") and got_a[5000] == (-2, "new")
        assert len(got_a) == 1001

    def test_join_path_still_prunes(self, spark, tmp_path):
        """The join path must keep the copy-on-write property: a batch
        confined to one clustered file's range rewrites ONE file."""
        d = self._fresh(spark, tmp_path, "joinprune")
        man0 = read_manifest(d)
        updates = spark.createDataFrame(
            [(10, -1, "upd"), (11, -2, "upd")], "k long, v long, tag string"
        )
        man1 = mtable_merge(spark, d, updates, "k", max_collect_keys=0)
        assert man1["key_match_path"] == "join"
        assert man1["files_rewritten"] == 1
        assert man1["files_untouched"] == len(man0["files"]) - 1

    def test_delete_join_path_matches(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        keys = spark.range(0, 1000, 13).select(F.col("id").alias("k"))
        da = self._fresh(spark, tmp_path, "delcollect")
        db = self._fresh(spark, tmp_path, "deljoin")
        mtable_delete(spark, da, keys, "k")
        man_b = mtable_delete(spark, db, keys, "k", max_collect_keys=0)
        assert man_b["key_match_path"] == "join"
        a = sorted(r["k"] for r in mtable_read(spark, da).collect())
        b = sorted(r["k"] for r in mtable_read(spark, db).collect())
        assert a == b and len(a) == 1000 - len(range(0, 1000, 13))


class TestMtableWriterConflict:
    """Round-11: manifest compare-and-swap — two interleaved writers
    produce one winner and one loud ConcurrentWriteError, never a
    silently lost update."""

    def test_stale_plan_refused(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import ConcurrentWriteError

        man0 = read_manifest(table)  # both writers plan against v0
        upd_a = spark.createDataFrame([(1, -1, "A")], "k long, v long, tag string")
        upd_b = spark.createDataFrame([(2, -2, "B")], "k long, v long, tag string")
        mtable_merge(spark, table, upd_a, "k", expected_version=man0["version"])
        with pytest.raises(ConcurrentWriteError, match="another writer"):
            mtable_merge(spark, table, upd_b, "k", expected_version=man0["version"])
        # winner's update is live; loser wrote nothing
        got = {r["k"]: r["tag"] for r in mtable_read(spark, table).collect()}
        assert got[1] == "A" and got[2] == "orig"
        assert read_manifest(table)["version"] == 1

    def test_version_slot_cas_one_winner(self, spark, table):
        """The commit-time race itself: two writers that both try to
        publish the SAME version number — exclusive manifest creation
        admits exactly one."""
        from w4h_etl_container_spark.pipeline import mtable as M

        M._write_manifest(table, 1, read_manifest(table)["files"], {"op": "a"})
        with pytest.raises(M.ConcurrentWriteError, match="already"):
            M._write_manifest(table, 1, [], {"op": "b"})
        # the winner's manifest content is intact, pointer sane
        man = read_manifest(table)
        assert man["version"] == 1 and man["op"] == "a" and man["files"]


class TestMtableVacuumAnchoring:
    """Round-11 (ADVICE): vacuum retention anchors on the _latest
    POINTER, not the highest manifest present — a crash between
    manifest write and pointer flip must never let vacuum delete the
    live version's files."""

    def test_orphan_manifest_above_pointer_never_anchors(self, spark, table):
        import json as _json
        import os as _os

        from w4h_etl_container_spark.pipeline import mtable as M

        upd = spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, upd, "k")  # live = v1
        live = read_manifest(table)
        # crash simulation: manifest v2 exists (listing ONLY fresh orphan
        # files), but the pointer never flipped — still says v1
        orphan_files = M._new_data_files(
            table, spark.createDataFrame([(9, 9, "ghost")], "k long, v long, tag string")
        )
        with open(M._manifest_path(table, 2), "w") as f:
            _json.dump({"version": 2, "files": orphan_files, "op": "crash"}, f)
        assert M._current_version(table) == 1
        out = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        # the POINTED-TO version survives whole and still reads
        assert 1 in out["retained_versions"]
        assert mtable_read(spark, table).count() == 1000
        assert {r["v"] for r in mtable_read(spark, table).where(F.col("k") == 1).collect()} == {-1}
        # the orphan manifest and its files are gone
        assert not _os.path.exists(M._manifest_path(table, 2))
        assert set(orphan_files) <= set(out["removed_files"])

    def test_unparseable_orphan_tolerated(self, spark, table):
        import os as _os

        from w4h_etl_container_spark.pipeline import mtable as M

        with open(M._manifest_path(table, 1), "w") as f:
            f.write('{"version": 1, "files": [')  # half-written crash debris
        out = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        assert out["retained_versions"] == [0]
        assert not _os.path.exists(M._manifest_path(table, 1))
        assert mtable_read(spark, table).count() == 1000


class TestMtableFooterTrust:
    """Round-11 (ADVICE): a file range built from PARTIAL row-group
    stats is not a range — any stats-less row group, or a file missing
    the key column, makes the file unprunable (matched, read, never
    skipped)."""

    def test_statless_row_group_is_unprunable(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.mtable import _file_key_ranges

        d = tmp_path / "ft"
        d.mkdir()
        t = pa.table({"k": [1, 2, 3], "v": [10, 20, 30]})
        pq.write_table(t, d / "with_stats.parquet")
        pq.write_table(t, d / "no_stats.parquet", write_statistics=False)
        rng = _file_key_ranges(str(tmp_path), ["ft/with_stats.parquet", "ft/no_stats.parquet"], "k")
        assert rng["ft/with_stats.parquet"] == (1, 3)
        assert rng["ft/no_stats.parquet"] is None  # conservative: matched

    def test_missing_key_column_is_unprunable(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.mtable import _file_key_ranges

        d = tmp_path / "mk"
        d.mkdir()
        pq.write_table(pa.table({"other": [1]}), d / "drifted.parquet")
        rng = _file_key_ranges(str(tmp_path), ["mk/drifted.parquet"], "k")
        assert rng["mk/drifted.parquet"] is None  # no IndexError, matched

    def test_merge_reads_statless_file(self, spark, tmp_path):
        """End-to-end: a key living ONLY in a stats-less file must be
        replaced by the merge, not duplicated next to the upsert."""
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline import mtable as M
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create, mtable_merge, mtable_read,
        )

        d = str(tmp_path / "statless")
        mtable_create(
            spark, spark.createDataFrame([(1, 10, "orig")], "k long, v long, tag string"), d
        )
        # splice in a stats-less data file holding key 2
        sub = _os.path.join(d, "data-statless")
        _os.makedirs(sub)
        pq.write_table(
            pa.table({"k": pa.array([2], pa.int64()), "v": pa.array([20], pa.int64()),
                      "tag": ["orig"]}),
            _os.path.join(sub, "part.parquet"),
            write_statistics=False,
        )
        man = M.read_manifest(d)
        M._write_manifest(d, 1, man["files"] + ["data-statless/part.parquet"], {"op": "splice"})
        upd = spark.createDataFrame([(2, -2, "upd")], "k long, v long, tag string")
        mtable_merge(spark, d, upd, "k")
        got = {r["k"]: (r["v"], r["tag"]) for r in mtable_read(spark, d).collect()}
        assert got == {1: (10, "orig"), 2: (-2, "upd")}  # no duplicate key 2


class TestMtableSinkEmptyBatch:
    def test_empty_micro_batch_is_noop(self, spark, tmp_path):
        """Spark delivers empty micro-batches (no-data ticks, watermark
        advances, recovery); the sink must not abort the query on them
        in any mode."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink

        d = str(tmp_path / "emptysink")
        empty = spark.createDataFrame([], "k long, n long")
        # before the table exists: no manifest is created
        sink = mtable_sink(spark, d, key="k", combine={"n": "sum"})
        sink(empty, 0)
        with pytest.raises(FileNotFoundError):
            read_manifest(d)
        # after content exists: version and epochs unchanged
        sink(spark.createDataFrame([(1, 5)], "k long, n long"), 1)
        man1 = read_manifest(d)
        sink(empty, 2)
        assert read_manifest(d) == man1
        # merge mode too
        sink_m = mtable_sink(spark, d, key="k")
        sink_m(empty, 3)
        assert read_manifest(d) == man1

    def test_append_mode_empty_first_batch_defers_creation(self, spark, tmp_path):
        """ADVICE r16 (medium): the APPEND-mode sink receiving an empty
        FIRST micro-batch must not commit a zero-file version 0 —
        _drop_empty prunes the zero-row part file, so committing would
        leave files=[] and every subsequent read crashing until a
        non-empty batch lands. Table creation defers instead."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink

        d = str(tmp_path / "emptyappend")
        sink = mtable_sink(spark, d)  # plain append mode
        sink(spark.createDataFrame([], "k long, n long"), 0)
        with pytest.raises(FileNotFoundError):
            read_manifest(d)  # no table yet — nothing was committed
        sink(spark.createDataFrame([(1, 5)], "k long, n long"), 1)
        man = read_manifest(d)
        assert man["version"] == 0 and man["files"]
        assert man["epoch_watermark"] == 1
        assert mtable_read(spark, d).count() == 1


class TestMtableEmptyFileList:
    def test_read_files_empty_list_is_empty_frame(self, spark, table):
        """ADVICE r16: _read_files/_scan_with_pos on an empty file list
        (fully-deleted CoW snapshot, zero churned files) must return an
        EMPTY frame under the recorded schema — never parts[0]'s bare
        IndexError."""
        from w4h_etl_container_spark.pipeline.mtable import (
            _read_files,
            _scan_with_pos,
        )

        man = read_manifest(table)
        got = _read_files(spark, table, [], man)
        assert got.count() == 0
        assert [f.name for f in got.schema.fields] == ["k", "v", "tag"]
        pos = _scan_with_pos(spark, table, [], man)
        assert pos.count() == 0
        assert {"_mt_file", "_mt_pos"} <= set(pos.columns)
        # a legacy manifest without a recorded schema cannot synthesize
        # the empty shape: loud, descriptive refusal
        with pytest.raises(ValueError, match="empty file list"):
            _read_files(spark, table, [], {"files": []})


class TestMtableCompactSplitsOversized:
    def test_oversized_partition_splits_into_multiple_files(self, spark, tmp_path):
        """ADVICE r16: partitioned compaction honors target_bytes — a
        partition value whose bytes exceed the target splits across
        several files (salted writer shuffle) instead of re-coalescing
        into one ever-larger file, while right-sized values keep the
        one-file-per-value contract."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_create,
        )

        d = str(tmp_path / "bigpart")
        # hot partition p=0 carries ~9× the rows plus a high-entropy
        # payload (a constant pad would compress under the target)
        df = spark.range(0, 20_000).select(
            F.when(F.col("id") % 10 == 0, 1).otherwise(0).alias("p"),
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        mtable_create(spark, df, d, partition_by=["p"])
        man = mtable_compact(spark, d, target_bytes=256 << 10)
        by_part: dict[str, int] = {}
        for f in read_manifest(d)["files"]:
            seg = [s for s in f.split(os.sep) if s.startswith("p=")][0]
            by_part[seg] = by_part.get(seg, 0) + 1
        assert by_part["p=0"] >= 2, by_part  # oversized value split
        assert by_part["p=1"] == 1, by_part  # right-sized stays single
        got = mtable_read(spark, d)
        assert got.count() == 20_000
        assert got.where(F.col("p") == 1).count() == 2_000
        # compaction preserved content exactly (keys are unique)
        assert got.select(F.sum("k").alias("s")).collect()[0]["s"] == sum(
            range(20_000)
        )
        # and a RE-compaction at a generous target re-coalesces the
        # split value back down (splitting is target-driven, not sticky)
        mtable_compact(spark, d, target_bytes=1 << 30)
        n0 = sum(
            1
            for f in read_manifest(d)["files"]
            if any(s == "p=0" for s in f.split(os.sep))
        )
        assert n0 == 1


class TestMtableCloneAndDupKeys:
    def test_duplicate_update_keys_refused(self, spark, table):
        """An upsert batch with two rows for one key has no
        well-defined winner — refused loudly (the Delta/Iceberg
        'multiple source rows matched' contract)."""
        dup = spark.createDataFrame(
            [(5, -1, "a"), (5, -2, "b"), (6, -3, "c")],
            "k long, v long, tag string",
        )
        with pytest.raises(ValueError, match="duplicate key rows"):
            mtable_merge(spark, table, dup, "k")
        # nothing committed
        assert read_manifest(table)["version"] == 0

    def test_shallow_clone_is_zero_copy_and_diverges(self, spark, table, tmp_path):
        import os as _os

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_clone,
            mtable_vacuum,
        )

        dst = str(tmp_path / "clone")
        man = mtable_clone(table, dst)
        assert man["op"] == "clone" and man["cloned_version"] == 0
        # zero-copy: the clone dir holds no data files at all
        assert not any(e.startswith("data-") for e in _os.listdir(dst))
        src_rows = {r["k"]: r["v"] for r in mtable_read(spark, table).collect()}
        assert {r["k"]: r["v"] for r in mtable_read(spark, dst).collect()} == src_rows

        # writes to the clone land under the CLONE and never touch src
        upd = spark.createDataFrame([(3, -7, "clone")], "k long, v long, tag string")
        mtable_merge(spark, dst, upd, "k")
        assert {r["v"] for r in mtable_read(spark, dst).where(F.col("k") == 3).collect()} == {-7}
        assert {r["v"] for r in mtable_read(spark, table).where(F.col("k") == 3).collect()} == {30}

        # vacuuming the CLONE only deletes files under the clone dir;
        # the shared base files survive and src still reads
        out = mtable_vacuum(dst, retain_versions=1, grace_seconds=0)
        assert all(not f.startswith("/") or dst in f for f in out["removed_files"])
        assert mtable_read(spark, table).count() == 1000
        assert mtable_read(spark, dst).count() == 1000


class TestMtableCompositeKeys:
    """Round-12: composite merge/delete keys (the repo's own DQ report
    records lineitem's key as (orderkey, linenumber) — a single-column
    mtable cannot upsert its own fact table). Pruning applies each key
    column's range as a conjunction; the anti-join, duplicate refusal,
    and merge_agg groupBy run on the full tuple."""

    def _fresh(self, spark, tmp_path, name):
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        # (g, i) composite key, clustered on the leading column: g has
        # disjoint per-file ranges, i repeats within every g
        df = cluster_by(
            spark.range(0, 1000).select(
                (F.col("id") / 100).cast("long").alias("g"),
                (F.col("id") % 100).alias("i"),
                (F.col("id") * 10).alias("v"),
            ),
            ["g", "i"],
            n_files=10,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        return d

    def test_composite_merge_both_paths_match_full_rewrite(self, spark, tmp_path):
        updates = spark.createDataFrame(
            [(2, 5, -1), (2, 6, -2), (99, 0, -3)], "g long, i long, v long"
        )
        model = {(g, i): g * 100 + i for g in range(10) for i in range(100)}
        model = {k: v * 10 for k, v in model.items()}
        model.update({(2, 5): -1, (2, 6): -2, (99, 0): -3})
        for name, cap in (("ck-collect", 100_000), ("ck-join", 0)):
            d = self._fresh(spark, tmp_path, name)
            man = mtable_merge(
                spark, d, updates, ["g", "i"], max_collect_keys=cap
            )
            assert man["keys"] == ["g", "i"]
            assert man["key_match_path"] == ("collect" if cap else "join")
            got = {
                (r["g"], r["i"]): r["v"]
                for r in mtable_read(spark, d).collect()
            }
            assert got == model, name

    def test_leading_column_pruning_on_composite_key(self, spark, tmp_path):
        """Both update tuples live in one g-clustered file's range —
        copy-on-write must stay file-targeted on the LEADING column
        even though the second column's per-file range is wide."""
        updates = spark.createDataFrame(
            [(3, 10, -1), (3, 11, -2)], "g long, i long, v long"
        )
        for name, cap in (("ck-prune-c", 100_000), ("ck-prune-j", 0)):
            d = self._fresh(spark, tmp_path, name)
            man0 = read_manifest(d)
            man = mtable_merge(
                spark, d, updates, ["g", "i"], max_collect_keys=cap
            )
            assert man["files_rewritten"] <= 2
            assert man["files_untouched"] >= len(man0["files"]) - 2

    def test_composite_delete_and_merge_agg(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_merge_agg,
        )

        d = self._fresh(spark, tmp_path, "ck-del")
        mtable_delete(
            spark,
            d,
            spark.createDataFrame([(0, 0), (5, 99)], "g long, i long"),
            ["g", "i"],
        )
        got = {(r["g"], r["i"]) for r in mtable_read(spark, d).collect()}
        assert (0, 0) not in got and (5, 99) not in got
        assert len(got) == 998 and (0, 1) in got

        # composite-keyed aggregate maintenance
        da = str(tmp_path / "ck-agg")
        mtable_create(
            spark,
            spark.createDataFrame(
                [(1, 1, 10, 5.0), (1, 2, 3, 1.0)], "a long, b long, n long, mx double"
            ),
            da,
        )
        mtable_merge_agg(
            spark,
            da,
            spark.createDataFrame(
                [(1, 1, 4, 9.0), (2, 1, 1, 2.0)], "a long, b long, n long, mx double"
            ),
            ["a", "b"],
            {"n": "sum", "mx": "max"},
        )
        got = {
            (r["a"], r["b"]): (r["n"], r["mx"])
            for r in mtable_read(spark, da).collect()
        }
        assert got == {(1, 1): (14, 9.0), (1, 2): (3, 1.0), (2, 1): (1, 2.0)}

    def test_duplicate_tuple_refused_distinct_tuples_pass(self, spark, tmp_path):
        d = self._fresh(spark, tmp_path, "ck-dup")
        dup = spark.createDataFrame(
            [(1, 1, -1), (1, 1, -2)], "g long, i long, v long"
        )
        with pytest.raises(ValueError, match="duplicate key rows"):
            mtable_merge(spark, d, dup, ["g", "i"])
        # same values crossed over are DISTINCT tuples — accepted
        crossed = spark.createDataFrame(
            [(1, 2, -1), (2, 1, -2)], "g long, i long, v long"
        )
        mtable_merge(spark, d, crossed, ["g", "i"])
        got = {
            (r["g"], r["i"]): r["v"] for r in mtable_read(spark, d).collect()
        }
        assert got[(1, 2)] == -1 and got[(2, 1)] == -2

    def test_null_key_refused_on_both_paths(self, spark, tmp_path):
        d = self._fresh(spark, tmp_path, "ck-null")
        bad = spark.createDataFrame(
            [(1, None, -1), (2, 3, -2)], "g long, i long, v long"
        )
        for cap in (100_000, 0):
            with pytest.raises(ValueError, match="NULL value in merge"):
                mtable_merge(spark, d, bad, ["g", "i"], max_collect_keys=cap)
        assert read_manifest(d)["version"] == 0  # nothing committed


class TestMtableManifestStats:
    """Round-12: per-file column ranges persist in the manifest at
    commit time, so planning a merge against an established table
    performs ZERO data-file footer reads — driver I/O per commit is
    O(new files), not O(table files)."""

    def test_merge_plans_with_zero_managed_footer_reads(
        self, spark, tmp_path, monkeypatch
    ):
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline import mtable as M

        df = cluster_by(
            spark.range(0, 1000).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            ["k"],
            n_files=10,
        )
        d = str(tmp_path / "stats")
        man0 = M.mtable_create(spark, df, d)
        assert set(man0["file_stats"]) == set(man0["files"])

        calls: list[str] = []
        orig = M._footer_stats

        def counting(path):
            calls.append(path)
            return orig(path)

        monkeypatch.setattr(M, "_footer_stats", counting)
        upd = spark.createDataFrame([(10, -1), (990, -2)], "k long, v long")
        man1 = M.mtable_merge(spark, d, upd, "k")
        new_files = set(man1["files"]) - set(man0["files"])
        # every footer read was for a NEW file; no managed file re-read
        assert set(calls) == {os.path.join(d, f) for f in new_files}
        assert len(calls) == len(new_files)

    def test_manifest_ranges_equal_fresh_footer_ranges(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "statseq")
        M.mtable_create(
            spark,
            spark.createDataFrame(
                [(1, "aa", 1.5), (9, "zz", -2.5)], "k long, s string, x double"
            ).coalesce(1),
            d,
        )
        man = read_manifest(d)
        for f, persisted in man["file_stats"].items():
            assert persisted == M._footer_stats(os.path.join(d, f))
        # and the ranges are the true data ranges
        st = next(
            s for s in man["file_stats"].values() if s.get("k") is not None
        )
        assert st["k"] == [1, 9] and st["s"] == ["aa", "zz"]
        assert st["x"] == [-2.5, 1.5]

    def test_legacy_manifest_without_stats_self_heals(self, spark, tmp_path):
        """A manifest lacking file_stats (pre-round-12 table) plans via
        footer fallback and the NEXT commit persists stats for every
        file it re-lists."""
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "legacy")
        man0 = M.mtable_create(
            spark,
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
            d,
        )
        # strip the stats, as a pre-upgrade manifest would be
        M._write_manifest(
            d, 1, man0["files"], {"op": "legacy"}, overwrite=True
        )
        assert "file_stats" not in read_manifest(d)
        man2 = M.mtable_merge(
            spark, d, spark.createDataFrame([(1, -1)], "k long, v long"), "k"
        )
        assert set(man2["file_stats"]) == set(man2["files"])


class TestMtableOptimisticRetry:
    """Round-12: retries=N turns a CAS loser into the Delta-style
    optimistic loop — replan against the new snapshot, re-attempt with
    bounded backoff. Both writers commit, serialized; a wedged slot
    (orphan manifest the pointer never absorbs) is detected and fails
    over to the mtable_repair message instead of looping forever."""

    def test_both_interleaved_writers_commit(self, spark, table, monkeypatch):
        from w4h_etl_container_spark.pipeline import mtable as M

        upd_a = spark.createDataFrame([(1, -1, "A")], "k long, v long, tag string")
        upd_b = spark.createDataFrame([(2, -2, "B")], "k long, v long, tag string")
        orig = M._new_data_files
        fired = {"done": False}

        def hook(table_dir, df, **kw):
            # writer A commits a full merge while writer B is between
            # planning and publish — the textbook interleave
            if not fired["done"]:
                fired["done"] = True
                M.mtable_merge(spark, table_dir, upd_a, "k")
            return orig(table_dir, df, **kw)

        monkeypatch.setattr(M, "_new_data_files", hook)
        man = M.mtable_merge(spark, table, upd_b, "k", retries=2)
        assert man["version"] == 2  # A took v1, B retried into v2
        got = {r["k"]: r["tag"] for r in mtable_read(spark, table).collect()}
        assert got[1] == "A" and got[2] == "B"  # BOTH updates live

    def test_retry_order_independent_contents(self, spark, tmp_path, monkeypatch):
        """Final contents equal sequential application in either order
        (disjoint keys, so the orders agree)."""
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline import mtable as M

        base = [(k, 0) for k in range(20)]
        upd_a = spark.createDataFrame([(3, -1)], "k long, v long")
        upd_b = spark.createDataFrame([(7, -2)], "k long, v long")
        want = dict(base)
        want.update({3: -1, 7: -2})

        def run(first, second, name):
            d = str(tmp_path / name)
            M.mtable_create(
                spark,
                cluster_by(
                    spark.createDataFrame(base, "k long, v long"), ["k"], n_files=4
                ),
                d,
            )
            orig = M._new_data_files
            fired = {"done": False}

            def hook(table_dir, df, **kw):
                if not fired["done"]:
                    fired["done"] = True
                    M.mtable_merge(spark, table_dir, first, "k")
                return orig(table_dir, df, **kw)

            monkeypatch.setattr(M, "_new_data_files", hook)
            M.mtable_merge(spark, d, second, "k", retries=3)
            monkeypatch.undo()
            return {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}

        assert run(upd_a, upd_b, "ord-ab") == want
        assert run(upd_b, upd_a, "ord-ba") == want

    def test_wedged_slot_fails_over_to_repair(self, spark, table):
        import json as _json

        from w4h_etl_container_spark.pipeline import mtable as M

        # crash debris: manifest v1 exists, pointer still at v0
        with open(M._manifest_path(table, 1), "w") as f:
            _json.dump({"version": 1, "files": [], "op": "crash"}, f)
        upd = spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string")
        with pytest.raises(M.ConcurrentWriteError, match="mtable_repair"):
            M.mtable_merge(spark, table, upd, "k", retries=3)
        out = M.mtable_repair(table)
        assert out == {"pointer": 0, "reclaimed_versions": [1]}
        # slot reclaimed: the same merge now commits
        man = M.mtable_merge(spark, table, upd, "k")
        assert man["version"] == 1
        assert {
            r["v"] for r in mtable_read(spark, table).where(F.col("k") == 1).collect()
        } == {-1}

    def test_repair_noop_and_pin_vs_retries_refused(self, spark, table):
        from w4h_etl_container_spark.pipeline import mtable as M

        assert M.mtable_repair(table) == {"pointer": 0, "reclaimed_versions": []}
        upd = spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string")
        with pytest.raises(ValueError, match="cannot be combined"):
            M.mtable_merge(spark, table, upd, "k", expected_version=0, retries=2)


class TestMtableChanges:
    """Round-12: row-level change feed from the copy-on-write file
    diff — reads only churned files, classifies insert/update/delete
    on the key tuple, cancels to nothing across a pure compaction."""

    def _changes(self, spark, d, v0, v1, key="k"):
        from w4h_etl_container_spark.pipeline.mtable import mtable_changes

        out = {}
        for r in mtable_changes(spark, d, v0, v1, key=key).collect():
            kk = r["k"] if isinstance(key, str) else tuple(r[c] for c in key)
            out[kk] = (r["_change_type"], r["v"])
        return out

    def test_merge_and_delete_feed_matches_model(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_merge,
        )

        d = str(tmp_path / "cdc")
        base = cluster_by(
            spark.range(0, 200).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            ["k"],
            n_files=4,
        )
        mtable_create(spark, base, d)
        mtable_merge(
            spark,
            d,
            spark.createDataFrame([(5, -1), (300, -2)], "k long, v long"),
            "k",
        )  # v1: update k=5, insert k=300
        got01 = self._changes(spark, d, 0, 1)
        assert got01 == {5: ("update", -1), 300: ("insert", -2)}

        mtable_delete(
            spark, d, spark.createDataFrame([(7,), (300,)], "k long"), "k"
        )  # v2: delete 7 and 300
        got12 = self._changes(spark, d, 1, 2)
        assert got12 == {7: ("delete", 70), 300: ("delete", -2)}

        # spanning feed v0→v2: k=5 updated, 7 deleted; 300's
        # insert+delete nets to nothing visible? No — the file diff is
        # between SNAPSHOTS: 300 is in neither v0 nor v2, so it
        # correctly does not appear at all
        got02 = self._changes(spark, d, 0, 2)
        assert got02 == {5: ("update", -1), 7: ("delete", 70)}

    def test_compaction_cancels_to_zero_changes(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_create,
            mtable_changes,
        )

        d = str(tmp_path / "cdc-compact")
        mtable_create(
            spark,
            spark.range(0, 100).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            ),
            d,
        )
        mtable_compact(spark, d, target_bytes=1 << 20)
        assert mtable_changes(spark, d, 0, 1, key="k").count() == 0

    def test_composite_key_feed(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_changes,
        )

        d = str(tmp_path / "cdc-comp")
        mtable_create(
            spark,
            spark.createDataFrame(
                [(1, 1, 10), (1, 2, 20), (2, 1, 30)], "a long, b long, v long"
            ),
            d,
        )
        mtable_merge(
            spark,
            d,
            spark.createDataFrame([(1, 2, -1), (3, 1, -2)], "a long, b long, v long"),
            ["a", "b"],
        )
        got = {
            (r["a"], r["b"]): (r["_change_type"], r["v"])
            for r in mtable_changes(spark, d, 0, 1, key=["a", "b"]).collect()
        }
        assert got == {(1, 2): ("update", -1), (3, 1): ("insert", -2)}

    def test_identical_versions_refused(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_changes,
        )

        d = str(tmp_path / "cdc-same")
        mtable_create(
            spark, spark.createDataFrame([(1, 1)], "k long, v long"), d
        )
        with pytest.raises(ValueError, match="two distinct committed versions"):
            mtable_changes(spark, d, 0, 0, key="k")


class TestMtableSchemaEvolution:
    """Round-12: schema evolution on merge — the manifest records the
    table schema, evolution ADDS columns (pre-evolution files
    null-fill through the schema-declared read, O(1) driver cost),
    differing batch schemas are refused loudly by default, and a type
    change is refused always."""

    def _base(self, spark, tmp_path, name):
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 100).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            ["k"],
            n_files=4,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        return d

    def test_differing_schema_refused_by_default(self, spark, tmp_path):
        d = self._base(spark, tmp_path, "se-refuse")
        upd = spark.createDataFrame([(1, -1, "x")], "k long, v long, extra string")
        with pytest.raises(ValueError, match="schema_evolution=True"):
            mtable_merge(spark, d, upd, "k")
        assert read_manifest(d)["version"] == 0

    def test_type_change_always_refused(self, spark, tmp_path):
        d = self._base(spark, tmp_path, "se-type")
        upd = spark.createDataFrame([(1, "ten")], "k long, v string")
        with pytest.raises(ValueError, match="column TYPES"):
            mtable_merge(spark, d, upd, "k", schema_evolution=True)

    def test_added_column_null_fills_without_rewriting(self, spark, tmp_path):
        d = self._base(spark, tmp_path, "se-add")
        man0 = read_manifest(d)
        stats0 = _stat(d, man0["files"])
        upd = spark.createDataFrame(
            [(1, -1, "tagged"), (500, -2, "new-row")],
            "k long, v long, extra string",
        )
        man1 = mtable_merge(spark, d, upd, "k", schema_evolution=True)
        # untouched files byte-identical (inode-level): evolution did
        # NOT rewrite the table
        survivors = set(man0["files"]) & set(man1["files"])
        assert survivors and _stat(d, survivors) == {
            f: stats0[f] for f in survivors
        }
        got = {
            r["k"]: (r["v"], r["extra"])
            for r in mtable_read(spark, d).collect()
        }
        assert got[1] == (-1, "tagged") and got[500] == (-2, "new-row")
        assert got[2] == (20, None)  # pre-evolution row null-fills
        assert len(got) == 101

        # a follow-up merge with the ORIGINAL (now-narrow) schema:
        # refused by default, null-fills the new column with evolution
        upd2 = spark.createDataFrame([(2, -3)], "k long, v long")
        with pytest.raises(ValueError, match="absent table columns"):
            mtable_merge(spark, d, upd2, "k")
        mtable_merge(spark, d, upd2, "k", schema_evolution=True)
        got2 = {
            r["k"]: (r["v"], r["extra"])
            for r in mtable_read(spark, d).collect()
        }
        assert got2[2] == (-3, None) and got2[1] == (-1, "tagged")

    def test_evolution_survives_delete_compact_and_feeds_changes(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_compact,
            mtable_delete,
        )

        d = self._base(spark, tmp_path, "se-carry")
        mtable_merge(
            spark,
            d,
            spark.createDataFrame([(1, -1, 9.5)], "k long, v long, score double"),
            "k",
            schema_evolution=True,
        )  # v1
        mtable_delete(
            spark, d, spark.createDataFrame([(2,)], "k long"), "k"
        )  # v2
        mtable_compact(spark, d, target_bytes=1 << 20)  # v3
        man = read_manifest(d)
        assert "score" in man["schema_json"]  # schema carried through
        got = {r["k"]: r["score"] for r in mtable_read(spark, d).collect()}
        assert got[1] == 9.5 and got[3] is None and 2 not in got
        # change feed across the evolution window aligns columns
        ch = {
            (r["k"], r["_change_type"]): r["score"]
            for r in mtable_changes(spark, d, 0, 2, key="k").collect()
        }
        assert ch[(1, "update")] == 9.5 and (2, "delete") in ch


class TestMtableZorderPruning:
    """Round-12: composite-key manifest stats × the Z-order layout —
    per-file bounding BOXES tighten on every z-ordered column, so a
    mutation keyed on the TRAILING dimension alone still prunes, where
    linear clustering (sorted by (x, y)) matches every file."""

    def _table(self, spark, tmp_path, name, layout):
        from w4h_etl_container_spark.operators.layout import cluster_by, zorder_by

        df = spark.range(0, 32 * 32).select(
            (F.col("id") % 32).alias("x"),
            (F.col("id") / 32).cast("long").alias("y"),
            (F.col("id") * 7).alias("v"),
        )
        laid = (
            zorder_by(df, ["x", "y"], n_files=16, bits=5)
            if layout == "z"
            else cluster_by(df, ["x", "y"], n_files=16)
        )
        d = str(tmp_path / name)
        mtable_create(spark, laid, d)
        return d

    def test_trailing_key_delete_prunes_only_under_zorder(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        dz = self._table(spark, tmp_path, "zo", "z")
        dl = self._table(spark, tmp_path, "lin", "lin")
        ys = spark.createDataFrame([(3,)], "y long")
        mz = mtable_delete(spark, dz, ys, "y")
        ml = mtable_delete(spark, dl, ys, "y")
        # z-order: y=3's box intersects ~the top-left curve cells;
        # linear (x,y) clustering: every file spans all y
        assert mz["files_rewritten"] < ml["files_rewritten"]
        assert mz["files_rewritten"] <= len(read_manifest(dz, 0)["files"]) // 2
        for d in (dz, dl):
            got = mtable_read(spark, d)
            assert got.count() == 32 * 31
            assert got.where(F.col("y") == 3).count() == 0

    def test_point_merge_on_composite_key_touches_few_files(self, spark, tmp_path):
        dz = self._table(spark, tmp_path, "zo2", "z")
        man0 = read_manifest(dz)
        upd = spark.createDataFrame([(5, 5, -1), (5, 6, -2)], "x long, y long, v long")
        man1 = mtable_merge(spark, dz, upd, ["x", "y"])
        assert man1["files_rewritten"] <= 2
        assert man1["files_untouched"] >= len(man0["files"]) - 2
        got = {(r["x"], r["y"]): r["v"] for r in mtable_read(spark, dz).collect()}
        assert got[(5, 5)] == -1 and got[(5, 6)] == -2
        assert len(got) == 32 * 32


class TestMtableKmvCombine:
    def test_incremental_kmv_equals_rebuild_exactly(self, spark, tmp_path, sf_dir):
        """'kmv' combine: an mtable-maintained per-type distinct-user
        sketch refreshed through two deltas equals the sketch computed
        from scratch on the full history — EXACT array equality (K
        smallest distinct values form a semilattice), not just a close
        estimate."""
        from w4h_etl_container_spark.pipeline.mtable import (
            _KMV_K,
            mtable_create,
            mtable_merge_agg,
        )
        from w4h_etl_container_spark.session import read_events

        ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
        hashed = ev.select(
            "event_type",
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(1 << 60)).alias("hh"),
        )

        def sketch(df):
            return df.groupBy("event_type").agg(
                F.slice(
                    F.array_sort(F.array_distinct(F.collect_list("hh"))),
                    1,
                    _KMV_K,
                ).alias("kmv")
            )

        b1 = hashed.where(F.col("hh") % 3 == 0)
        b2 = hashed.where(F.col("hh") % 3 == 1)
        b3 = hashed.where(F.col("hh") % 3 == 2)
        d = str(tmp_path / "kmvagg")
        mtable_create(spark, sketch(b1), d)
        mtable_merge_agg(spark, d, sketch(b2), "event_type", {"kmv": "kmv"})
        mtable_merge_agg(spark, d, sketch(b3), "event_type", {"kmv": "kmv"})
        got = {
            r["event_type"]: tuple(r["kmv"])
            for r in mtable_read(spark, d).collect()
        }
        want = {
            r["event_type"]: tuple(r["kmv"]) for r in sketch(hashed).collect()
        }
        assert got == want and got
        assert all(len(v) <= 32 for v in got.values())


class TestMtableChangesModelCheck:
    def test_feed_matches_model_diff_at_every_version(self, spark, tmp_path):
        """Model-based CDC check: random merge/delete sequences against
        a dict reference — after EVERY commit, mtable_changes(v-1, v)
        must classify exactly the model's diff (inserts/updates/
        deletes with the right values), and the cumulative feed
        (0, latest) must equal the model's net diff vs the initial
        state. Seeded, two sequences of five ops."""
        import random

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_create,
            mtable_delete,
            mtable_merge,
        )

        for seed in (4, 5):
            rng = random.Random(seed)
            d = str(tmp_path / f"cdcmodel{seed}")
            init = {k: rng.randrange(1000) for k in range(0, 30)}
            mtable_create(
                spark,
                spark.createDataFrame(sorted(init.items()), "k long, v long"),
                d,
            )
            model = dict(init)
            snaps = [dict(model)]
            for step in range(5):
                if rng.random() < 0.6:
                    batch = {
                        rng.randrange(0, 45): rng.randrange(1000)
                        for _ in range(rng.randrange(1, 5))
                    }
                    mtable_merge(
                        spark, d,
                        spark.createDataFrame(sorted(batch.items()), "k long, v long"),
                        "k",
                    )
                    model.update(batch)
                else:
                    ks = {rng.randrange(0, 45) for _ in range(rng.randrange(1, 4))}
                    mtable_delete(
                        spark, d,
                        spark.createDataFrame([(k,) for k in sorted(ks)], "k long"),
                        "k",
                    )
                    for k in ks:
                        model.pop(k, None)
                snaps.append(dict(model))

                def diff(a, b):
                    out = {}
                    for k in b.keys() - a.keys():
                        out[k] = ("insert", b[k])
                    for k in a.keys() - b.keys():
                        out[k] = ("delete", a[k])
                    for k in a.keys() & b.keys():
                        if a[k] != b[k]:
                            out[k] = ("update", b[k])
                    return out

                v = step + 1
                got = {
                    r["k"]: (r["_change_type"], r["v"])
                    for r in mtable_changes(spark, d, v - 1, v, key="k").collect()
                }
                assert got == diff(snaps[v - 1], snaps[v]), (seed, step)
                got0 = {
                    r["k"]: (r["_change_type"], r["v"])
                    for r in mtable_changes(spark, d, 0, v, key="k").collect()
                }
                assert got0 == diff(snaps[0], snaps[v]), (seed, step, "cumulative")


class TestMtableTableOps:
    """Round-12: operational surface — history, timestamp time travel,
    dry-run vacuum, recluster-as-a-version."""

    def test_history_and_as_of_read(self, spark, tmp_path):
        import time as _time

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_history,
            version_as_of,
        )

        d = str(tmp_path / "ops")
        mtable_create(
            spark, spark.createDataFrame([(1, 10)], "k long, v long"), d
        )
        t_between = _time.time()
        _time.sleep(0.05)
        mtable_merge(
            spark, d, spark.createDataFrame([(1, -1)], "k long, v long"), "k"
        )
        hist = mtable_history(d)
        assert [h["version"] for h in hist] == [1, 0]
        assert hist[0]["op"] == "merge" and hist[1]["op"] == "create"
        assert hist[0]["committed_at"] > hist[1]["committed_at"]
        assert all("files" not in h and "n_files" in h for h in hist)

        assert version_as_of(d, t_between) == 0
        assert version_as_of(d, _time.time()) == 1
        got0 = {r["k"]: r["v"] for r in mtable_read(spark, d, as_of=t_between).collect()}
        assert got0 == {1: 10}
        with pytest.raises(ValueError, match="no retained version"):
            version_as_of(d, hist[1]["committed_at"] - 10)
        with pytest.raises(ValueError, match="not both"):
            mtable_read(spark, d, version=0, as_of=t_between)

    def test_vacuum_dry_run_touches_nothing(self, spark, table):
        upd = spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, upd, "k")
        dry = mtable_vacuum(table, retain_versions=1, dry_run=True, grace_seconds=0)
        assert dry["dry_run"] and dry["removed_files"] and dry["dropped_manifests"] == [0]
        # nothing actually removed: v0 still reads
        assert mtable_read(spark, table, version=0).count() == 1000
        wet = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        assert wet["removed_files"] == dry["removed_files"]
        assert wet["dropped_manifests"] == [0]
        with pytest.raises(FileNotFoundError):
            read_manifest(table, 0)

    def test_recluster_as_a_version_restores_pruning(self, spark, tmp_path):
        """A table churned into bad layout (every file spans the key
        domain) stops pruning; OPTIMIZE-style reclustering compaction
        restores file-targeted merges — and time travel still works
        across it."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        d = str(tmp_path / "recluster")
        # deliberately interleaved layout: round-robin partitioning
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).repartition(8)
        mtable_create(spark, df, d)
        upd = spark.createDataFrame([(10, -1), (11, -2)], "k long, v long")
        man_bad = mtable_merge(spark, d, upd, "k")
        assert man_bad["files_rewritten"] >= 6  # no pruning possible

        man_c = mtable_compact(spark, d, target_bytes=1 << 12, cluster=["k"])
        assert man_c["clustered_by"] == ["k"] and man_c["files_out"] >= 4
        man_good = mtable_merge(
            spark, d, spark.createDataFrame([(20, -3), (21, -4)], "k long, v long"), "k"
        )
        assert man_good["files_rewritten"] <= 2  # pruning restored
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[10] == -1 and got[20] == -3 and len(got) == 1000
        # pre-recluster version still time-travels
        assert mtable_read(spark, d, version=man_bad["version"]).count() == 1000


class TestMtableRestore:
    def test_restore_is_a_zero_rewrite_commit(self, spark, table):
        """Roll back a bad merge: the restore commit re-lists v0's
        files verbatim (inode-level — no data moved), the bad version
        stays time-travelable, and the change feed across the restore
        reports the UNDO."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_restore,
        )

        man0 = read_manifest(table)
        stats0 = _stat(table, man0["files"])
        bad = spark.createDataFrame(
            [(5, -666, "oops")], "k long, v long, tag string"
        )
        mtable_merge(spark, table, bad, "k")  # v1: the mistake
        man2 = mtable_restore(table, 0)
        assert man2["version"] == 2 and man2["op"] == "restore"
        assert man2["restored_from"] == 0
        assert man2["files"] == man0["files"]
        assert man2["file_stats"] == man0["file_stats"]
        assert _stat(table, man2["files"]) == stats0  # zero rewrites
        got = {r["k"]: r["v"] for r in mtable_read(spark, table).collect()}
        assert got[5] == 50 and len(got) == 1000  # the mistake is gone
        # the mistake remains visible to time travel
        assert {
            r["v"] for r in mtable_read(spark, table, version=1).where(F.col("k") == 5).collect()
        } == {-666}
        # the feed across the restore is the undo
        ch = {
            r["k"]: (r["_change_type"], r["v"])
            for r in mtable_changes(spark, table, 1, 2, key="k").collect()
        }
        assert ch == {5: ("update", 50)}
        # and merges continue normally after a restore
        mtable_merge(
            spark, table,
            spark.createDataFrame([(7, -7, "ok")], "k long, v long, tag string"),
            "k",
        )
        assert read_manifest(table)["version"] == 3

    def test_restore_to_current_refused(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import mtable_restore

        with pytest.raises(ValueError, match="already at v0"):
            mtable_restore(table, 0)


class TestMtableDeletionVectors:
    """Merge-on-read deletes (mode='mor'): a delete writes a tiny
    positional deletion vector instead of rewriting matched files —
    verified at the os.stat level (zero data files rewritten) and by
    read-equivalence against the copy-on-write path on the same
    table."""

    def _mk(self, spark, tmp_path, name="mor"):
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 1000).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("orig").alias("tag"),
            ),
            ["k"],
            n_files=10,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        return d

    def test_mor_delete_rewrites_zero_data_files(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        man0 = read_manifest(d)
        before = _stat(d, man0["files"])
        kdf = spark.createDataFrame([(123,)], "k long")
        man1 = mtable_delete(spark, d, kdf, "k", mode="mor")
        # the 1-row-delete pin: file list unchanged, every data file
        # byte-identical, exactly one DV file added
        assert man1["files"] == man0["files"]
        assert man1["files_rewritten"] == 0
        assert _stat(d, man0["files"]) == before
        dvs = {dv for lst in man1["dv"].values() for dv in lst}
        assert len(dvs) == 1 and next(iter(dvs)).startswith("dv-")
        assert man1["n_deleted"] == 1
        got = {r["k"] for r in mtable_read(spark, d).collect()}
        assert 123 not in got and len(got) == 999

    def test_mor_read_equals_cow_read(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d_mor = self._mk(spark, tmp_path, "a")
        d_cow = self._mk(spark, tmp_path, "b")
        kdf = spark.createDataFrame([(5,), (777,), (42,), (4242,)], "k long")
        mtable_delete(spark, d_mor, kdf, "k", mode="mor")
        mtable_delete(spark, d_cow, kdf, "k", mode="cow")
        a = sorted(map(tuple, mtable_read(spark, d_mor).collect()))
        b = sorted(map(tuple, mtable_read(spark, d_cow).collect()))
        assert a == b and len(a) == 997

    def test_mor_delete_idempotent_no_second_dv(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(7,), (8,)], "k long")
        man1 = mtable_delete(spark, d, kdf, "k", mode="mor")
        man2 = mtable_delete(spark, d, kdf, "k", mode="mor")
        # second delete of the same keys: positions resolve against the
        # DV-filtered read -> zero doomed rows -> no new DV artifact
        assert man2["n_deleted"] == 0
        assert man2["dv"] == man1["dv"]
        assert mtable_read(spark, d).count() == 998

    def test_dv_broadcast_gate_uses_decompressed_estimate(
        self, spark, tmp_path, monkeypatch
    ):
        """Advisor r13 (low): sorted positional deletes RLE-compress
        ~100× in parquet, so gating the anti-join broadcast on ON-DISK
        sidecar bytes under-protects. The gate must count footer ROWS
        (× fixed width): a tiny-on-disk DV claiming huge row counts
        falls back to the shuffled anti-join; a genuinely small one
        broadcasts."""
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(3,), (9,)], "k long")
        mtable_delete(spark, d, kdf, "k", mode="mor")

        def plan() -> str:
            return (
                mtable_read(spark, d)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )

        p = plan()
        assert "LeftAnti" in p and "BroadcastHashJoin" in p

        real = pq.ParquetFile

        class _Huge:
            def __init__(self, path):
                self._md = real(path).metadata

            @property
            def metadata(self):
                md = self._md

                class _M:
                    num_rows = 10**9  # decompressed estimate >> 32 MB
                    num_columns = md.num_columns
                    num_row_groups = md.num_row_groups

                return _M()

        monkeypatch.setattr(pq, "ParquetFile", _Huge)
        p2 = plan()
        anti = [
            ln for ln in p2.splitlines() if "LeftAnti" in ln
        ]
        assert anti and all("Broadcast" not in ln for ln in anti)

    def test_compact_materializes_and_clears_dvs(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_delete,
            mtable_vacuum,
        )

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(k,) for k in range(0, 100, 7)], "k long")
        mtable_delete(spark, d, kdf, "k", mode="mor")
        want = sorted(map(tuple, mtable_read(spark, d).collect()))
        man = mtable_compact(spark, d)
        assert "dv" not in man
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want
        # vacuum now reclaims the orphaned DV file
        rep = mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        assert any(f.startswith("dv-") for f in rep["removed_files"])
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want

    def test_merge_after_mor_does_not_resurrect(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        mtable_delete(
            spark, d, spark.createDataFrame([(50,), (51,)], "k long"), "k",
            mode="mor",
        )
        # merge touches key 52 -> its file (which also held 50, 51) is
        # rewritten from the DV-filtered read; 50/51 must stay gone and
        # the rewritten file's DV entry must be dropped from the manifest
        upd = spark.createDataFrame([(52, -1, "upd")], "k long, v long, tag string")
        man = mtable_merge(spark, d, upd, "k")
        got = {r["k"]: r["tag"] for r in mtable_read(spark, d).collect()}
        assert 50 not in got and 51 not in got and got[52] == "upd"
        for f in man.get("dv", {}):
            assert f in man["files"]
        # double-application guard: the dead rows' positions now belong
        # to fresh rows in the new file; total row count is exact
        assert mtable_read(spark, d).count() == 998

    def test_time_travel_and_restore_across_mor(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_restore,
        )

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(10,), (20,)], "k long")
        mtable_delete(spark, d, kdf, "k", mode="mor")
        assert mtable_read(spark, d, version=0).count() == 1000
        assert mtable_read(spark, d, version=1).count() == 998
        mtable_restore(d, 0)
        assert mtable_read(spark, d).count() == 1000

    def test_changes_feed_sees_mor_deletes_and_restores(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_delete,
            mtable_restore,
        )

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(10,), (20,)], "k long")
        mtable_delete(spark, d, kdf, "k", mode="mor")
        ch = {
            (r["k"], r["_change_type"])
            for r in mtable_changes(spark, d, 0, 1, key="k").collect()
        }
        assert ch == {(10, "delete"), (20, "delete")}
        mtable_restore(d, 0)
        back = {
            (r["k"], r["_change_type"])
            for r in mtable_changes(spark, d, 1, 2, key="k").collect()
        }
        assert back == {(10, "insert"), (20, "insert")}

    def test_vacuum_retains_referenced_dvs(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_vacuum,
        )

        d = self._mk(spark, tmp_path)
        kdf = spark.createDataFrame([(3,)], "k long")
        mtable_delete(spark, d, kdf, "k", mode="mor")
        rep = mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        assert not any(f.startswith("dv-") for f in rep["removed_files"])
        assert mtable_read(spark, d).count() == 999

    def test_merge_agg_on_shadowed_table(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_merge_agg,
        )

        d = str(tmp_path / "agg")
        base = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k long, total long"
        )
        mtable_create(spark, base, d)
        mtable_delete(
            spark, d, spark.createDataFrame([(2,)], "k long"), "k", mode="mor"
        )
        delta = spark.createDataFrame([(1, 5), (2, 7)], "k long, total long")
        mtable_merge_agg(spark, d, delta, "k", {"total": "sum"})
        got = {r["k"]: r["total"] for r in mtable_read(spark, d).collect()}
        # key 2 was MOR-deleted: the delta re-inserts it from zero (the
        # dead row must NOT contribute its old 20)
        assert got == {1: 15, 2: 7, 3: 30}

    def test_clone_carries_dvs(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_clone,
            mtable_delete,
        )

        src = self._mk(spark, tmp_path, "src")
        mtable_delete(
            spark, src, spark.createDataFrame([(1,), (2,)], "k long"), "k",
            mode="mor",
        )
        dst = str(tmp_path / "dst")
        mtable_clone(src, dst)
        assert mtable_read(spark, dst).count() == 998
        got = {r["k"] for r in mtable_read(spark, dst).collect()}
        assert 1 not in got and 2 not in got

    def test_mor_composite_key(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
        )

        d = str(tmp_path / "comp")
        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (2, 2, "d")],
            "a long, b long, val string",
        )
        mtable_create(spark, df, d)
        kdf = spark.createDataFrame([(1, 2), (2, 1)], "a long, b long")
        man = mtable_delete(spark, d, kdf, ["a", "b"], mode="mor")
        assert man["n_deleted"] == 2 and man["files_rewritten"] == 0
        got = {(r["a"], r["b"]) for r in mtable_read(spark, d).collect()}
        assert got == {(1, 1), (2, 2)}


class TestMtableMergeOnReadUpsert:
    """Round-13: mode='mor' on MERGE — replaced rows shadow into a DV,
    the batch lands as fresh files, zero matched-file rewrites."""

    def _mk(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 1000).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("orig").alias("tag"),
            ),
            ["k"],
            n_files=10,
        )
        d = str(tmp_path / "morm")
        mtable_create(spark, df, d)
        return d

    def test_mor_merge_zero_rewrites_and_read_parity(self, spark, tmp_path):
        d_mor = self._mk(spark, tmp_path)
        man0 = read_manifest(d_mor)
        before = _stat(d_mor, man0["files"])
        updates = spark.createDataFrame(
            [(5, -1, "upd"), (777, -2, "upd"), (2000, -3, "new")],
            "k long, v long, tag string",
        )
        man1 = mtable_merge(spark, d_mor, updates, "k", mode="mor")
        # zero rewrites: every pre-merge data file byte-identical, the
        # old file list is a strict prefix-set of the new one
        assert man1["files_rewritten"] == 0
        assert man1["n_replaced"] == 2
        assert set(man0["files"]) < set(man1["files"])
        assert _stat(d_mor, man0["files"]) == before
        got = {r["k"]: (r["v"], r["tag"]) for r in mtable_read(spark, d_mor).collect()}
        assert got[5] == (-1, "upd") and got[777] == (-2, "upd")
        assert got[2000] == (-3, "new") and got[6] == (60, "orig")
        assert len(got) == 1001

    def test_mor_merge_same_key_twice_latest_wins(self, spark, tmp_path):
        d = self._mk(spark, tmp_path)
        for i, tag in enumerate(["first", "second"]):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(42, -i, tag)], "k long, v long, tag string"),
                "k", mode="mor",
            )
        got = {r["k"]: r["tag"] for r in mtable_read(spark, d).collect()}
        assert got[42] == "second" and len(got) == 1000

    def test_changes_feed_classifies_mor_merge(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_changes

        d = self._mk(spark, tmp_path)
        mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(7, -7, "upd"), (5000, -5, "new")], "k long, v long, tag string"
            ),
            "k", mode="mor",
        )
        ch = {
            (r["k"], r["_change_type"])
            for r in mtable_changes(spark, d, 0, 1, key="k").collect()
        }
        assert ch == {(7, "update"), (5000, "insert")}

    def test_mor_merge_then_compact_then_cow_parity(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        d_mor = self._mk(spark, tmp_path)
        d_cow = str(tmp_path / "coww")
        from w4h_etl_container_spark.pipeline.mtable import mtable_clone  # noqa: F401
        # independent identical table for the cow control
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 1000).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("orig").alias("tag"),
            ),
            ["k"],
            n_files=10,
        )
        mtable_create(spark, df, d_cow)
        updates = spark.createDataFrame(
            [(1, -1, "u"), (999, -9, "u"), (1500, -15, "n")],
            "k long, v long, tag string",
        )
        mtable_merge(spark, d_mor, updates, "k", mode="mor")
        mtable_merge(spark, d_cow, updates, "k", mode="cow")
        a = sorted(map(tuple, mtable_read(spark, d_mor).collect()))
        b = sorted(map(tuple, mtable_read(spark, d_cow).collect()))
        assert a == b
        man = mtable_compact(spark, d_mor)
        assert "dv" not in man
        assert sorted(map(tuple, mtable_read(spark, d_mor).collect())) == a

    def test_mor_merge_with_schema_evolution(self, spark, tmp_path):
        d = self._mk(spark, tmp_path)
        updates = spark.createDataFrame(
            [(3, -3, "u", 9.5)], "k long, v long, tag string, score double"
        )
        mtable_merge(spark, d, updates, "k", mode="mor", schema_evolution=True)
        got = {r["k"]: (r["tag"], r["score"]) for r in mtable_read(spark, d).collect()}
        assert got[3] == ("u", 9.5)
        assert got[4] == ("orig", None)  # pre-evolution rows null-fill


class TestMtableIncrementalCompaction:
    """Round-13: scope='small' — Delta OPTIMIZE's daily shape: rewrite
    only under-sized and DV-shadowed files; right-sized clean files
    are re-listed verbatim, bytes untouched."""

    def _mixed_table(self, spark, tmp_path):
        """3 big files (1000 rows each) + small-file churn appended by
        merges (1-row files)."""
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 3000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            ["k"],
            n_files=3,
        )
        d = str(tmp_path / "inc")
        mtable_create(spark, df, d)
        for i in range(3):  # churn: three 1-row insert merges
            mtable_merge(
                spark, d,
                spark.createDataFrame([(10_000 + i, -i)], "k long, v long"),
                "k",
            )
        return d

    def test_small_scope_keeps_big_files_untouched(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        d = self._mixed_table(spark, tmp_path)
        man0 = read_manifest(d)
        sizes = {
            f: os.path.getsize(os.path.join(d, f)) for f in man0["files"]
        }
        big = [f for f, s in sizes.items() if s >= max(sizes.values())][:1]
        want = sorted(map(tuple, mtable_read(spark, d).collect()))
        before = _stat(d, man0["files"])
        floor_ = max(sizes.values())  # everything below the biggest is small
        man1 = mtable_compact(spark, d, scope="small", small_bytes=floor_)
        assert man1["op"] == "compact" and man1["scope"] == "small"
        assert man1["files_kept"] >= 1
        kept = [f for f in man1["files"] if f in set(man0["files"])]
        assert kept, "right-sized files must be re-listed verbatim"
        # kept files byte-identical (inode mtime unchanged)
        assert {f: before[f] for f in kept} == _stat(d, kept)
        # content identical, small files consolidated
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want
        assert len(man1["files"]) < len(man0["files"])

    def test_small_scope_noop_without_churn(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        d = self._mixed_table(spark, tmp_path)
        man0 = mtable_compact(spark, d, scope="small", small_bytes=2048)
        # second pass: nothing under-sized, no DVs -> true no-op
        man1 = mtable_compact(spark, d, scope="small", small_bytes=2048)
        assert man1["version"] == man0["version"]

    def test_small_scope_materializes_dvs(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_delete,
        )

        d = self._mixed_table(spark, tmp_path)
        mtable_delete(
            spark, d, spark.createDataFrame([(5,)], "k long"), "k", mode="mor"
        )
        want = sorted(map(tuple, mtable_read(spark, d).collect()))
        # the shadowed file is one of the BIG ones, above any size floor:
        # it must still be rewritten (the shadow must materialize)
        man = mtable_compact(spark, d, scope="small", small_bytes=1)
        assert "dv" not in man
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want
        assert not any(r[0] == 5 for r in mtable_read(spark, d).collect())

    def test_small_scope_refuses_recluster(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        d = self._mixed_table(spark, tmp_path)
        with pytest.raises(ValueError, match="recluster requires"):
            mtable_compact(spark, d, scope="small", cluster=["k"])


class TestMtableBloomSkipping:
    """Round-13: per-file key bloom filters — point-lookup file
    skipping where range stats degenerate (unclustered files all span
    the key domain)."""

    def _mk(self, spark, tmp_path, bloom=True, name="bl"):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        # UNCLUSTERED: every file spans ~the whole key range, so
        # min/max pruning matches all files for any key
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(8)
        d = str(tmp_path / name)
        mtable_create(
            spark, df, d, bloom_keys=["k"] if bloom else None,
            bloom_bits=1 << 14,
        )
        return d

    def test_point_delete_skips_range_matched_files(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        man = read_manifest(d)
        assert man["bloom"]["keys"] == ["k"]
        assert set(man["bloom"]["files"]) == set(man["files"])
        out = mtable_delete(
            spark, d, spark.createDataFrame([(123,)], "k long"), "k"
        )
        # without the bloom every file range-matches; with it only the
        # true file (plus any false positives — none at 16 Kbit/500
        # keys) rewrites
        assert out["key_match_path"].startswith("collect+bloom:")
        assert out["files_rewritten"] <= 2
        got = {r["k"] for r in mtable_read(spark, d).collect()}
        assert 123 not in got and len(got) == 3999

    def test_bloom_and_plain_tables_agree(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_merge,
        )

        a = self._mk(spark, tmp_path, bloom=True, name="a")
        b = self._mk(spark, tmp_path, bloom=False, name="b")
        upd = spark.createDataFrame([(7, -7), (9999, -9)], "k long, v long")
        dels = spark.createDataFrame([(11,), (12,)], "k long")
        for d in (a, b):
            mtable_merge(spark, d, upd, "k")
            mtable_delete(spark, d, dels, "k")
        assert sorted(map(tuple, mtable_read(spark, a).collect())) == sorted(
            map(tuple, mtable_read(spark, b).collect())
        )
        # the plain table never mentions blooms
        assert "bloom" not in read_manifest(b)

    def test_merge_carries_and_extends_bitsets(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_merge

        d = self._mk(spark, tmp_path)
        mtable_merge(
            spark, d,
            spark.createDataFrame([(50, -5), (50_000, -1)], "k long, v long"),
            "k",
        )
        man = read_manifest(d)
        # every live file — carried AND fresh — has a bitset
        assert set(man["bloom"]["files"]) == set(man["files"])
        # a later MID-RANGE point lookup still bloom-prunes: every
        # unclustered file range-matches key 60, the bloom refutes all
        # but the true holder(s) — including the fresh merge-1 file,
        # whose bitset the commit built
        out = mtable_merge(
            spark, d,
            spark.createDataFrame([(60, -2)], "k long, v long"),
            "k",
        )
        assert out["key_match_path"].startswith("collect+bloom:")
        assert out["files_rewritten"] <= 2

    def test_vacuum_compact_restore_clone_lifecycles(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_clone,
            mtable_compact,
            mtable_delete,
            mtable_restore,
            mtable_vacuum,
        )

        d = self._mk(spark, tmp_path)
        man_del = mtable_delete(
            spark, d, spark.createDataFrame([(5,)], "k long"), "k"
        )
        rep = mtable_vacuum(d, retain_versions=2, grace_seconds=0)
        # sidecars referenced by a retained version survive the vacuum
        # (the create's sidecar still backs the 7 carried files)
        live = set(man_del["bloom"]["files"].values())
        assert live and not (live & set(rep["removed_files"]))
        want = sorted(map(tuple, mtable_read(spark, d).collect()))
        # restore carries the target's bloom verbatim
        mtable_restore(d, 0)
        assert read_manifest(d)["bloom"] == read_manifest(d, 0)["bloom"]
        mtable_restore(d, man_del["version"])
        assert read_manifest(d)["bloom"] == man_del["bloom"]
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want
        # clone translates data files AND sidecars to absolute paths
        dst = str(tmp_path / "cl")
        man_cl = mtable_clone(d, dst)
        assert all(os.path.isabs(s) for s in man_cl["bloom"]["files"].values())
        assert mtable_read(spark, dst).count() == 3999
        out = mtable_delete(
            spark, dst, spark.createDataFrame([(77,)], "k long"), "k"
        )
        assert out["key_match_path"].startswith("collect+bloom:")
        # compact rebuilds bitsets for the rewritten files; the old
        # sidecars lose their last reference and the next vacuum
        # reclaims them
        man_c = mtable_compact(spark, d)
        assert set(man_c["bloom"]["files"]) == set(man_c["files"])
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want
        rep2 = mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        assert live & set(rep2["removed_files"]) == live
        assert sorted(map(tuple, mtable_read(spark, d).collect())) == want

    def test_composite_key_bloom(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
        )

        df = spark.range(0, 2000).select(
            (F.col("id") % 40).alias("a"),
            (F.col("id") / 40).cast("long").alias("b"),
            F.col("id").alias("v"),
        ).repartition(6)
        d = str(tmp_path / "comp")
        mtable_create(spark, df, d, bloom_keys=["a", "b"], bloom_bits=1 << 14)
        out = mtable_delete(
            spark, d, spark.createDataFrame([(3, 17)], "a long, b long"),
            ["a", "b"],
        )
        assert out["key_match_path"].startswith("collect+bloom:")
        assert out["files_rewritten"] <= 2
        got = {(r["a"], r["b"]) for r in mtable_read(spark, d).collect()}
        assert (3, 17) not in got and len(got) == 1999

    def test_join_path_ignores_bloom(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._mk(spark, tmp_path)
        dels = spark.range(0, 50).select(F.col("id").alias("k"))
        out = mtable_delete(spark, d, dels, "k", max_collect_keys=10)
        assert out["key_match_path"] == "join"
        got = {r["k"] for r in mtable_read(spark, d).collect()}
        assert got == set(range(50, 4000))


class TestMtableMorBloomModelCheck:
    """Round-13 integration model check: random sequences over the FULL
    mutation surface — cow/mor merge, cow/mor delete, full/small
    compaction, restore — on a BLOOM-indexed table, against a plain
    dict reference. After every op the snapshot equals the model, the
    bloom map covers exactly the live files, and the per-version
    change feed classifies exactly the model diff. This is where the
    round's features meet: a MOR delete layered on a MOR merge's DV,
    then small-scope compaction materializing both, then a restore
    resurrecting across them."""

    def test_random_sequences(self, spark, tmp_path):
        import random

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_compact,
            mtable_create,
            mtable_delete,
            mtable_merge,
            mtable_read,
            mtable_restore,
        )

        for seed in (11, 12):
            rng = random.Random(seed)
            d = str(tmp_path / f"m{seed}")
            init = {k: rng.randrange(1000) for k in range(0, 40)}
            mtable_create(
                spark,
                spark.createDataFrame(sorted(init.items()), "k long, v long"),
                d,
                bloom_keys=["k"],
                bloom_bits=1 << 12,
            )
            model = dict(init)
            history = {0: dict(model)}  # version -> model snapshot
            v = 0
            for step in range(9):
                op = rng.choice(
                    ["merge", "merge", "mor_merge", "delete", "mor_delete",
                     "compact_small", "compact_full", "restore"]
                )
                prev_model = dict(model)
                if op in ("merge", "mor_merge"):
                    batch = {
                        rng.randrange(0, 60): rng.randrange(1000)
                        for _ in range(rng.randrange(1, 6))
                    }
                    mtable_merge(
                        spark, d,
                        spark.createDataFrame(
                            sorted(batch.items()), "k long, v long"
                        ),
                        "k",
                        mode="mor" if op == "mor_merge" else "cow",
                    )
                    model.update(batch)
                elif op in ("delete", "mor_delete"):
                    ks = [rng.randrange(0, 60) for _ in range(rng.randrange(1, 4))]
                    mtable_delete(
                        spark, d,
                        spark.createDataFrame([(k,) for k in ks], "k long"),
                        "k",
                        mode="mor" if op == "mor_delete" else "cow",
                    )
                    for k in ks:
                        model.pop(k, None)
                elif op == "compact_small":
                    man = mtable_compact(
                        spark, d, target_bytes=1 << 20, scope="small",
                        small_bytes=1 << 20,
                    )
                    if man["version"] == v:
                        continue  # true no-op: nothing under-sized, no DVs
                elif op == "compact_full":
                    mtable_compact(spark, d, target_bytes=1 << 20)
                else:
                    target = rng.choice(sorted(history))
                    if target == v:
                        continue
                    mtable_restore(d, target)
                    model = dict(history[target])
                v += 1
                history[v] = dict(model)
                man = read_manifest(d)
                got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
                assert got == model, (seed, step, op)
                # bloom map covers exactly the live files, always
                assert set(man["bloom"]["files"]) == set(man["files"]), (
                    seed, step, op,
                )
                # the per-version feed states exactly the model diff
                ch = {}
                for r in mtable_changes(spark, d, v - 1, v, key="k").collect():
                    ch.setdefault(r["_change_type"], set()).add(r["k"])
                want_ins = {
                    k for k in model if k not in prev_model
                }
                want_upd = {
                    k for k in model
                    if k in prev_model and model[k] != prev_model[k]
                }
                want_del = {k for k in prev_model if k not in model}
                assert ch.get("insert", set()) == want_ins, (seed, step, op)
                assert ch.get("update", set()) == want_upd, (seed, step, op)
                assert ch.get("delete", set()) == want_del, (seed, step, op)


class TestMtableSinkMorMode:
    def test_mor_sink_contents_and_zero_rewrites(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_read,
            mtable_sink,
        )

        d = str(tmp_path / "morsink")
        base = spark.createDataFrame(
            [(k, 0) for k in range(20)], "k long, v long"
        )
        mtable_create(spark, base, d)
        files0 = set(read_manifest(d)["files"])
        before = _stat(d, sorted(files0))
        sink = mtable_sink(spark, d, key="k", mode="mor")
        sink(spark.createDataFrame([(3, 33), (50, 55)], "k long, v long"), 0)
        sink(spark.createDataFrame([(3, 34)], "k long, v long"), 1)
        # replayed epoch: recognized, skipped
        sink(spark.createDataFrame([(3, 999)], "k long, v long"), 1)
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[3] == 34 and got[50] == 55 and got[4] == 0
        assert len(got) == 21
        # the create's files were never rewritten across three commits
        assert _stat(d, sorted(files0)) == before
        assert files0 < set(read_manifest(d)["files"])


class TestMtableMorOptimisticRetry:
    def test_racing_mor_deletes_both_commit_with_layered_dvs(
        self, spark, table, monkeypatch
    ):
        """The optimistic loop under merge-on-read: writer A commits a
        MOR delete while writer B is between DV resolution and publish.
        B's CAS loses, replans against A's snapshot (key 1 already
        shadowed there), and commits a second layered shadow — both
        deletes land, nothing resurrects, no data file ever rewrites."""
        from w4h_etl_container_spark.pipeline import mtable as M

        man0 = M.read_manifest(table)
        orig = M._new_dv_file
        fired = {"done": False}

        def hook(table_dir, df):
            if not fired["done"]:
                fired["done"] = True
                M.mtable_delete(
                    spark, table_dir,
                    spark.createDataFrame([(1,)], "k long"), "k", mode="mor",
                )
            return orig(table_dir, df)

        monkeypatch.setattr(M, "_new_dv_file", hook)
        man = M.mtable_delete(
            spark, table, spark.createDataFrame([(2,)], "k long"), "k",
            mode="mor", retries=2,
        )
        assert man["version"] == 2  # A took v1, B retried into v2
        assert man["files"] == man0["files"]  # zero rewrites throughout
        got = {r["k"] for r in mtable_read(spark, table).collect()}
        assert 1 not in got and 2 not in got and len(got) == 998
        # both shadows live in the final manifest
        dvs = {dv for lst in man["dv"].values() for dv in lst}
        assert len(dvs) == 2


class TestMtableSegmentedManifests:
    """Round-14: per-file manifest payload splits into immutable
    segments (the Iceberg manifest-list move) — a commit writes
    O(churn) manifest bytes and re-references untouched segments by
    name, instead of rewriting the full O(table-files) JSON every
    commit (the r13 audit's largest remaining structural driver
    cost). Descriptors stay CAS'd; reads materialize the legacy shape
    through an immutable-segment cache."""

    def _raw(self, table_dir, version):
        import json as _json

        from w4h_etl_container_spark.pipeline import mtable as M

        with open(M._manifest_path(table_dir, version)) as f:
            return _json.load(f)

    def test_commit_reuses_untouched_segments(self, spark, table):
        d0 = self._raw(table, 0)
        assert "segments" in d0 and "files" not in d0
        man0 = read_manifest(table)
        upd = spark.createDataFrame([(5, -1, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, upd, "k")
        d1 = self._raw(table, 1)
        # the v0 segment is re-referenced BY NAME (not rewritten); the
        # merge adds one fresh segment for its new files and tombstones
        # the one rewritten file
        assert set(d0["segments"]) <= set(d1["segments"])
        fresh = set(d1["segments"]) - set(d0["segments"])
        assert len(fresh) == 1
        removed = [f for fs in d1.get("segment_removed", {}).values() for f in fs]
        assert len(removed) == 1 and removed[0] in man0["files"]
        # materialized views agree with the format's contract
        man1 = read_manifest(table)
        assert man1["n_files"] == len(man1["files"])
        assert set(man1["file_stats"]) == set(man1["files"])
        got = {r["k"]: r["v"] for r in mtable_read(spark, table).collect()}
        assert got[5] == -1 and len(got) == 1000

    def test_descriptor_bytes_are_o_churn(self, spark, table):
        """The commit's descriptor must not grow with table size: its
        JSON carries segment names + tombstones, never the file list."""
        upd = spark.createDataFrame([(7, -7, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, upd, "k")
        import os as _os

        from w4h_etl_container_spark.pipeline import mtable as M

        desc_bytes = _os.path.getsize(M._manifest_path(table, 1))
        man = read_manifest(table, 1)
        inline_bytes = len(str(man.get("file_stats", {}))) + len(str(man["files"]))
        assert desc_bytes < inline_bytes  # strictly smaller than inlining

    def test_mostly_dead_segment_rewrites_filtered(self, spark, table):
        """Deleting most of the table's keys kills most of the v0
        segment's entries — past the dead ratio the next commit must
        rewrite it filtered instead of accumulating tombstones."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        kdf = spark.range(0, 900).select(F.col("id").alias("k"))
        mtable_delete(spark, table, kdf, "k")
        d1 = self._raw(table, 1)
        d0 = self._raw(table, 0)
        assert not (set(d0["segments"]) & set(d1["segments"]))
        # tombstones were folded into the rewrite, not carried
        assert not d1.get("segment_removed")
        assert mtable_read(spark, table).count() == 100

    def test_consolidation_bounds_segment_count(self, spark, tmp_path, monkeypatch):
        from w4h_etl_container_spark.pipeline import mtable as M

        monkeypatch.setattr(M, "_SEG_MAX_COUNT", 4)
        d = str(tmp_path / "consol")
        M.mtable_create(
            spark,
            spark.createDataFrame([(0, 0)], "k long, v long").coalesce(1),
            d,
        )
        for i in range(1, 8):
            M.mtable_merge(
                spark, d,
                spark.createDataFrame([(i, i)], "k long, v long").coalesce(1),
                "k",
            )
        raw = self._raw(d, 7)
        assert len(raw["segments"]) <= 4
        assert mtable_read(spark, d).count() == 8
        assert sorted(
            r["k"] for r in mtable_read(spark, d).collect()
        ) == list(range(8))

    def test_vacuum_sweeps_unreferenced_segments(self, spark, table):
        import os as _os

        upd = spark.createDataFrame([(5, -1, "u")], "k long, v long, tag string")
        mtable_merge(spark, table, upd, "k")
        mdir = _os.path.join(table, "_manifests")
        # plant CAS-loser debris: an unreferenced segment
        from w4h_etl_container_spark.pipeline import mtable as M

        debris = M._write_segment(table, ["data-x/ghost.parquet"], {}, {})
        out = mtable_vacuum(table, retain_versions=1, grace_seconds=0)
        assert debris in out["dropped_segments"]
        live = self._raw(table, 1)["segments"]
        on_disk = {f for f in _os.listdir(mdir) if f.startswith("seg-")}
        assert set(live) <= on_disk
        assert mtable_read(spark, table).count() == 1000

    def test_legacy_inline_manifest_upgrades_on_next_commit(
        self, spark, tmp_path
    ):
        import json as _json
        import os as _os

        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "legacyseg")
        man0 = M.mtable_create(
            spark, spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), d
        )
        # rewrite v0 as a pre-round-14 INLINE manifest
        inline = {
            "version": 0,
            "files": man0["files"],
            "file_stats": man0["file_stats"],
            "op": "create",
            "schema_json": man0["schema_json"],
            "committed_at": man0["committed_at"],
        }
        with open(M._manifest_path(d, 0), "w") as f:
            _json.dump(inline, f)
        assert read_manifest(d)["files"] == man0["files"]  # legacy reads
        M.mtable_merge(
            spark, d, spark.createDataFrame([(1, -1)], "k long, v long"), "k"
        )
        d1 = self._raw(d, 1)
        assert "segments" in d1 and "files" not in d1
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got == {1: -1, 2: 20}


class TestMtablePartitionSpec:
    """Round-14: hive-style partition layout (SURVEY §1.3's
    date-partitioned tables) composed with the manifest machinery —
    partition values persist as exact [v,v] stats so EVERY pruner
    (range, bloom, changes) skips foreign partitions before reading a
    footer, and reads carry Spark-native PartitionFilters."""

    def _mk(self, spark, tmp_path, name="ptab"):
        df = spark.createDataFrame(
            [(i, i % 4, i * 10) for i in range(400)], "k long, p int, v long"
        ).repartition(4, "k")
        d = str(tmp_path / name)
        man = mtable_create(spark, df, d, partition_by=["p"])
        return d, man

    def test_create_layout_and_roundtrip(self, spark, tmp_path):
        d, man = self._mk(spark, tmp_path)
        assert man["partition_by"] == ["p"]
        assert all(f.startswith("data-parts/p=") for f in man["files"])
        got = mtable_read(spark, d)
        assert got.columns == ["k", "p", "v"]  # schema order preserved
        rows = {r["k"]: (r["p"], r["v"]) for r in got.collect()}
        assert len(rows) == 400 and rows[7] == (3, 70)
        # partition values persisted as exact stats
        for f, st in man["file_stats"].items():
            pval = int(f.split("p=")[1].split("/")[0])
            assert st["p"] == [pval, pval]

    def test_read_carries_partition_filters(self, spark, tmp_path):
        d, _ = self._mk(spark, tmp_path)
        plan = (
            mtable_read(spark, d)
            .where(F.col("p") == 2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "(p" in pf[0].split("PartitionFilters")[1][:40]

    def test_partition_key_prunes_before_footers(self, spark, tmp_path):
        """A delete keyed on the partition column must match ONLY that
        partition's files — the [v,v] stats make every other file's
        range refute the key."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d, man0 = self._mk(spark, tmp_path)
        man1 = mtable_delete(
            spark, d, spark.createDataFrame([(1,)], "p int"), "p"
        )
        p1_files = [f for f in man0["files"] if "/p=1/" in f]
        others = [f for f in man0["files"] if "/p=1/" not in f]
        assert man1["files_rewritten"] == len(p1_files)
        assert set(others) <= set(man1["files"])  # untouched, re-listed
        got = mtable_read(spark, d)
        assert got.where(F.col("p") == 1).count() == 0
        assert got.count() == 300

    def test_merge_preserves_partitioning(self, spark, tmp_path):
        d, _ = self._mk(spark, tmp_path)
        upd = spark.createDataFrame(
            [(3, 3, -1), (1000, 2, -2)], "k long, p int, v long"
        )
        man1 = mtable_merge(spark, d, upd, "k")
        assert man1["partition_by"] == ["p"]
        new_files = set(man1["files"]) - {
            f for f in man1["files"] if f in set(read_manifest(d, 0)["files"])
        }
        assert all(f.startswith("data-parts/p=") for f in man1["files"])
        got = {r["k"]: (r["p"], r["v"]) for r in mtable_read(spark, d).collect()}
        assert got[3] == (3, -1) and got[1000] == (2, -2) and len(got) == 401

    def test_changes_and_compact_and_vacuum(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_compact,
        )

        d, _ = self._mk(spark, tmp_path)
        upd = spark.createDataFrame([(3, 3, -1)], "k long, p int, v long")
        mtable_merge(spark, d, upd, "k")  # v1
        ch = {
            (r["k"], r["_change_type"])
            for r in mtable_changes(spark, d, 0, 1, key="k").collect()
        }
        assert ch == {(3, "update")}
        man2 = mtable_compact(spark, d, target_bytes=1 << 30)  # v2
        assert man2["partition_by"] == ["p"]
        assert all(f.startswith("data-parts/") for f in man2["files"])
        assert mtable_read(spark, d).count() == 400
        out = mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        assert out["removed_files"]  # pre-compaction partitioned files
        got = mtable_read(spark, d)
        assert got.count() == 400
        assert got.where(F.col("p") == 2).count() == 100

    def test_clone_refuses_partitioned(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_clone

        d, _ = self._mk(spark, tmp_path)
        with pytest.raises(ValueError, match="partitioned"):
            mtable_clone(d, str(tmp_path / "dst"))


class TestMtableMaintain:
    """Round-14: the maintenance POLICY — measure (driver metadata
    only), decide, act. A trickle-churned table self-heals from one
    nightly mtable_maintain call instead of degrading until a human
    notices the DV anti-join stopped broadcasting."""

    def _churned(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartition(8)
        d = str(tmp_path / "mnt")
        mtable_create(spark, df, d)
        for k in (3, 77):
            mtable_delete(
                spark, d,
                spark.createDataFrame([(k,)], "k long"), "k", mode="mor",
            )
        return d

    def test_dry_run_measures_without_committing(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_maintain

        d = self._churned(spark, tmp_path)
        rep = mtable_maintain(
            spark, d, small_files=4, dv_max_files=1, dry_run=True
        )
        assert set(rep["triggers"]) == {"small-files", "dv-shadow"}
        assert rep["actions"] == []
        assert rep["version_after"] == rep["version_before"] == 2
        assert rep["measured"]["n_dv_files"] == 2
        assert rep["measured"]["dv_rows"] == 2

    def test_fires_compact_then_converges(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_maintain

        d = self._churned(spark, tmp_path)
        rep = mtable_maintain(spark, d, small_files=4, dv_max_files=1)
        assert rep["actions"] == ["compact-small"]
        assert rep["version_after"] == 3
        man = read_manifest(d)
        assert not man.get("dv")  # shadow materialized
        got = {r["k"] for r in mtable_read(spark, d).collect()}
        assert got == set(range(200)) - {3, 77}
        # second run: healthy table, nothing fires, no commit
        rep2 = mtable_maintain(spark, d, small_files=4, dv_max_files=1)
        assert rep2["triggers"] == [] and rep2["actions"] == []
        assert rep2["version_after"] == rep["version_after"]

    def test_vacuum_never_implied(self, spark, tmp_path):
        import os as _os

        from w4h_etl_container_spark.pipeline.mtable import mtable_maintain

        d = self._churned(spark, tmp_path)
        mtable_maintain(spark, d, small_files=4, dv_max_files=1)  # v3
        mdir = _os.path.join(d, "_manifests")
        n_before = len([f for f in _os.listdir(mdir) if f.startswith("v")])
        rep = mtable_maintain(spark, d)  # no vacuum_retain: keeps history
        assert "vacuum" not in rep["triggers"]
        assert len([f for f in _os.listdir(mdir) if f.startswith("v")]) == n_before
        rep2 = mtable_maintain(spark, d, vacuum_retain=1)
        assert rep2["actions"] == ["vacuum"]
        assert rep2["vacuum"]["dropped_manifests"] == 3
        assert mtable_read(spark, d).count() == 198


class TestMtablePartitionNulls:
    def test_null_partition_values_roundtrip_and_stay_unprunable(
        self, spark, tmp_path
    ):
        """NULL partition values land in Spark's
        __HIVE_DEFAULT_PARTITION__ directory; they must read back as
        NULL, and their files' stats entry for the partition column
        must be None (unprunable) — a keyed delete must still match
        them conservatively rather than skip them."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, None, 40)],
            "k long, p string, v long",
        )
        d = str(tmp_path / "pnull")
        man = mtable_create(spark, df, d, partition_by=["p"])
        got = {r["k"]: r["p"] for r in mtable_read(spark, d).collect()}
        assert got == {1: "a", 2: "b", 3: None, 4: None}
        null_files = [
            f for f in man["files"] if "__HIVE_DEFAULT_PARTITION__" in f
        ]
        assert null_files
        for f in null_files:
            assert man["file_stats"][f].get("p") is None  # unprunable
        # a delete keyed on k still reaches rows in the NULL partition
        mtable_delete(spark, d, spark.createDataFrame([(3,)], "k long"), "k")
        got2 = {r["k"] for r in mtable_read(spark, d).collect()}
        assert got2 == {1, 2, 4}


class TestMtableSinkEpochBound:
    def test_epoch_metadata_stays_bounded(self, spark, tmp_path):
        """Round-14: the sink's replay record is a WATERMARK + bounded
        tail, not an ever-growing list — a long-lived minutely stream
        must not carry every epoch id it ever committed in every
        manifest descriptor."""
        from w4h_etl_container_spark.pipeline import mtable as M

        tdir = str(tmp_path / "snkbound")
        sink = M.mtable_sink(spark, tdir)  # append mode
        n = M._SINK_EPOCHS_KEPT + 6
        for e in range(n):
            sink(spark.createDataFrame([(e, e * 2)], "k long, v long"), e)
        man = read_manifest(tdir)
        assert len(man["epochs"]) == M._SINK_EPOCHS_KEPT
        assert man["epoch_watermark"] == n - 1
        assert mtable_read(spark, tdir).count() == n
        # the one legitimate replay shape (crash recovery re-delivers
        # at most the LAST batch) skips silently; anything strictly
        # below the watermark is a rebuilt checkpoint or a second
        # writer and must refuse loudly (round-15 advisor fix)
        v = man["version"]
        sink(spark.createDataFrame([(1, 999)], "k long, v long"), n - 1)
        assert read_manifest(tdir)["version"] == v
        assert mtable_read(spark, tdir).count() == n
        with pytest.raises(ValueError, match="reset_epochs"):
            sink(spark.createDataFrame([(0, 999)], "k long, v long"), 0)
        # a genuinely new epoch still commits
        sink(spark.createDataFrame([(n, -1)], "k long, v long"), n)
        assert read_manifest(tdir)["version"] == v + 1
        assert mtable_read(spark, tdir).count() == n + 1

    def test_legacy_epochs_list_manifest_upgrades(self, spark, tmp_path):
        """A pre-round-14 manifest has only the epochs list; the next
        sink commit must derive the watermark from it (max), skip
        replays against it, and write the new bounded shape."""
        import json as _json

        from w4h_etl_container_spark.pipeline import mtable as M

        tdir = str(tmp_path / "snklegacy")
        sink = M.mtable_sink(spark, tdir)
        sink(spark.createDataFrame([(1, 1)], "k long, v long"), 5)
        # strip the watermark, as a legacy manifest would be
        man = read_manifest(tdir)
        with open(M._manifest_path(tdir, man["version"])) as f:
            raw = _json.load(f)
        raw.pop("epoch_watermark")
        with open(M._manifest_path(tdir, man["version"]), "w") as f:
            _json.dump(raw, f)
        sink(spark.createDataFrame([(9, 9)], "k long, v long"), 5)  # replay
        assert mtable_read(spark, tdir).count() == 1
        sink(spark.createDataFrame([(2, 2)], "k long, v long"), 6)  # new
        man2 = read_manifest(tdir)
        assert man2["epoch_watermark"] == 6
        assert mtable_read(spark, tdir).count() == 2


class TestMtableMaintainPartitioned:
    def test_policy_composes_with_partition_spec(self, spark, tmp_path):
        """mtable_maintain on a partitioned table: small-file compaction
        must preserve the data-parts layout and the partition stats."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_maintain,
        )

        df = spark.createDataFrame(
            [(i, i % 3, i) for i in range(120)], "k long, p int, v long"
        ).repartition(6)
        d = str(tmp_path / "mpart")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_delete(
            spark, d, spark.createDataFrame([(5,)], "k long"), "k", mode="mor"
        )
        rep = mtable_maintain(spark, d, small_files=2, dv_max_files=0)
        assert rep["actions"] == ["compact-small"]
        man = read_manifest(d)
        assert man["partition_by"] == ["p"]
        assert all(f.startswith("data-parts/p=") for f in man["files"])
        assert not man.get("dv")
        for f, st in man["file_stats"].items():
            pval = int(f.split("p=")[1].split("/")[0])
            assert st["p"] == [pval, pval]
        got = mtable_read(spark, d)
        assert got.count() == 119
        assert got.where(F.col("p") == 1).count() in (39, 40)


class TestMtablePartitionedMorDelete:
    def test_mor_delete_shadows_exactly_one_row(self, spark, tmp_path):
        """Regression (round 14): one partitionBy write job emits the
        SAME part-NNNNN basename into every partition directory, and
        deletion vectors join on basename — without per-partition-dir
        unique names a 1-key MOR delete silently shadowed the same
        position in every sibling partition. Basenames must be
        table-unique and the delete must remove exactly one row."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.createDataFrame(
            [(i, i % 3, i) for i in range(120)], "k long, p int, v long"
        ).repartition(6)
        d = str(tmp_path / "morpart")
        man = mtable_create(spark, df, d, partition_by=["p"])
        basenames = [os.path.basename(f) for f in man["files"]]
        assert len(basenames) == len(set(basenames)), "basenames collide"
        man1 = mtable_delete(
            spark, d, spark.createDataFrame([(5,)], "k long"), "k", mode="mor"
        )
        assert man1["n_deleted"] == 1
        got = mtable_read(spark, d)
        assert got.count() == 119
        assert {r["k"] for r in got.collect()} == set(range(120)) - {5}


class TestMtableChecks:
    """Round-14: write-time CHECK constraints (Delta table-constraint
    shape) — named boolean SQL expressions in the manifest, enforced
    in one aggregate pass wherever rows ENTER the table; violations
    refuse the commit loudly with per-check counts."""

    def test_create_refuses_violating_data(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0)], "k long, bal double"
        )
        with pytest.raises(ValueError, match="nonneg.*1 row"):
            mtable_create(
                spark, df, str(tmp_path / "c1"), checks={"nonneg": "bal >= 0"}
            )
        assert not os.path.exists(str(tmp_path / "c1") + "/_latest")

    def test_merge_batch_refused_without_commit(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_merge

        d = str(tmp_path / "c2")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double"),
            d,
            checks={"nonneg": "bal >= 0"},
        )
        bad = spark.createDataFrame([(2, -1.0), (3, 5.0)], "k long, bal double")
        with pytest.raises(ValueError, match="CHECK constraint violation"):
            mtable_merge(spark, d, bad, "k")
        man = read_manifest(d)
        assert man["version"] == 0  # nothing committed
        assert man["checks"] == {"nonneg": "bal >= 0"}
        ok = spark.createDataFrame([(3, 5.0)], "k long, bal double")
        man1 = mtable_merge(spark, d, ok, "k")
        assert man1["version"] == 1 and man1["checks"] == {"nonneg": "bal >= 0"}
        # checks survive further commits via the carry
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        man2 = mtable_delete(
            spark, d, spark.createDataFrame([(1,)], "k long"), "k"
        )
        assert man2["checks"] == {"nonneg": "bal >= 0"}

    def test_null_predicate_passes_sql_semantics(self, spark, tmp_path):
        d = str(tmp_path / "c3")
        mtable_create(
            spark,
            spark.createDataFrame(
                [(1, 10.0), (2, None)], "k long, bal double"
            ),
            d,
            checks={"nonneg": "bal >= 0"},  # NULL >= 0 is unknown: passes
        )
        assert mtable_read(spark, d).count() == 2
        with pytest.raises(ValueError, match="notnull"):
            mtable_create(
                spark,
                spark.createDataFrame(
                    [(1, 10.0), (2, None)], "k long, bal double"
                ),
                str(tmp_path / "c4"),
                checks={"notnull": "bal IS NOT NULL"},
            )

    def test_sink_append_enforces(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_sink

        d = str(tmp_path / "c5")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 1.0)], "k long, bal double"),
            d,
            checks={"nonneg": "bal >= 0"},
        )
        sink = mtable_sink(spark, d)  # append mode
        with pytest.raises(ValueError, match="CHECK constraint violation"):
            sink(spark.createDataFrame([(2, -1.0)], "k long, bal double"), 0)
        assert mtable_read(spark, d).count() == 1
        sink(spark.createDataFrame([(2, 2.0)], "k long, bal double"), 1)
        assert mtable_read(spark, d).count() == 2

    def test_merge_agg_enforces_on_combined(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_merge_agg

        d = str(tmp_path / "c6")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 5.0)], "k long, total double"),
            d,
            checks={"cap": "total <= 10"},
        )
        # a delta that is fine alone but breaches the cap combined
        with pytest.raises(ValueError, match="cap"):
            mtable_merge_agg(
                spark, d,
                spark.createDataFrame([(1, 7.0)], "k long, total double"),
                "k", {"total": "sum"},
            )
        assert read_manifest(d)["version"] == 0
        mtable_merge_agg(
            spark, d,
            spark.createDataFrame([(1, 4.0)], "k long, total double"),
            "k", {"total": "sum"},
        )
        got = {r["k"]: r["total"] for r in mtable_read(spark, d).collect()}
        assert got == {1: 9.0}

    def test_set_checks_validates_existing(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_merge,
            mtable_set_checks,
        )

        d = str(tmp_path / "c7")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 10.0), (2, -3.0)], "k long, bal double"),
            d,
        )
        with pytest.raises(ValueError, match="existing data"):
            mtable_set_checks(spark, d, {"nonneg": "bal >= 0"})
        assert read_manifest(d)["version"] == 0
        # repair the data, then installation succeeds as a version
        mtable_merge(
            spark, d,
            spark.createDataFrame([(2, 3.0)], "k long, bal double"), "k",
        )  # v1
        man = mtable_set_checks(spark, d, {"nonneg": "bal >= 0"})  # v2
        assert man["version"] == 2 and man["op"] == "set-checks"
        with pytest.raises(ValueError, match="CHECK constraint violation"):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(9, -1.0)], "k long, bal double"), "k",
            )
        # dropping checks re-admits anything
        mtable_set_checks(spark, d, {})
        mtable_merge(
            spark, d,
            spark.createDataFrame([(9, -1.0)], "k long, bal double"), "k",
        )
        assert mtable_read(spark, d).count() == 3


class TestMtableRestoreCarriesContract:
    """Round-15 (advisor): RESTORE re-lists version V's FILES but must
    also reinstate V's write-time contract — dropping 'checks' silently
    disabled every installed constraint for all subsequent writers, and
    dropping 'epoch_watermark' forgot sink replay protection."""

    def test_restore_preserves_checks(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_restore

        d = str(tmp_path / "rc")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, bal double"),
            d,
            checks={"nonneg": "bal >= 0"},
        )
        mtable_merge(
            spark, d, spark.createDataFrame([(3, 1.0)], "k long, bal double"), "k"
        )
        man = mtable_restore(d, 0)
        assert man.get("checks") == {"nonneg": "bal >= 0"}
        with pytest.raises(ValueError, match="nonneg"):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(9, -1.0)], "k long, bal double"), "k",
            )

    def test_restore_preserves_epoch_watermark(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "re")
        sink = M.mtable_sink(spark, d)
        sink(spark.createDataFrame([(1,)], "k long"), 0)
        sink(spark.createDataFrame([(2,)], "k long"), 1)
        man = M.mtable_restore(d, 0)
        assert man["epoch_watermark"] == 0
        # replay of epoch 0 against the restored table still skips
        v = man["version"]
        sink(spark.createDataFrame([(99,)], "k long"), 0)
        assert read_manifest(d)["version"] == v
        # and the NEXT epoch commits on top of the restored contents
        sink(spark.createDataFrame([(3,)], "k long"), 2)
        assert sorted(
            r["k"] for r in mtable_read(spark, d).collect()
        ) == [1, 3]


class TestMtablePartitionNanValue:
    """Round-15 (advisor): a NaN value in a float partition column must
    overlay as None (unprunable), not [nan, nan] — nan<=x<=nan is
    always False, so the planner would skip the file while Spark join
    semantics treat NaN = NaN as a match (silent stale rows)."""

    def test_partition_values_maps_nan_to_none(self):
        import json as _json

        from pyspark.sql import types as T

        from w4h_etl_container_spark.pipeline.mtable import _partition_values

        schema = T.StructType(
            [T.StructField("p", T.DoubleType()), T.StructField("v", T.LongType())]
        ).json()
        got = _partition_values(os.path.join("data-parts", "p=NaN", "f.parquet"),
                                ["p"], schema)
        assert got == {"p": None}
        assert _partition_values(
            os.path.join("data-parts", "p=1.5", "f.parquet"), ["p"], schema
        ) == {"p": 1.5}

    def test_delete_keyed_on_nan_partition_value_lands(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.createDataFrame(
            [(1, 1.0, 10), (2, float("nan"), 20), (3, 2.0, 30)],
            "k long, p double, v long",
        )
        d = str(tmp_path / "nanpart")
        mtable_create(spark, df, d, partition_by=["p"])
        man = mtable_delete(
            spark, d,
            spark.createDataFrame([(float("nan"),)], "p double"), "p",
            mode="mor",
        )
        assert man["n_deleted"] == 1
        assert sorted(r["k"] for r in mtable_read(spark, d).collect()) == [1, 3]

    def test_cow_delete_on_nan_partition_value(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.createDataFrame(
            [(1, 1.0, 10), (2, float("nan"), 20), (3, 2.0, 30)],
            "k long, p double, v long",
        )
        d = str(tmp_path / "nanpartcow")
        mtable_create(spark, df, d, partition_by=["p"])
        man = mtable_delete(
            spark, d,
            spark.createDataFrame([(float("nan"),)], "p double"), "p",
        )
        assert man["files_rewritten"] >= 1  # the NaN file was NOT pruned away
        assert sorted(r["k"] for r in mtable_read(spark, d).collect()) == [1, 3]


class TestMtablePartitionBasenamePrefix:
    def test_prefix_is_full_hash(self, spark, tmp_path):
        """Round-15 (advisor): the per-partition-dir basename prefix is
        the FULL md5 hex — an 8-hex truncation goes birthday-colliding
        around tens of thousands of partition dirs, recreating the DV
        basename-shadow row loss the prefix exists to prevent."""
        df = spark.createDataFrame(
            [(i, i % 3, i) for i in range(30)], "k long, p int, v long"
        )
        d = str(tmp_path / "fullpfx")
        man = mtable_create(spark, df, d, partition_by=["p"])
        for f in man["files"]:
            prefix = os.path.basename(f).split("-", 1)[0]
            assert len(prefix) == 32 and all(
                c in "0123456789abcdef" for c in prefix
            ), f
        basenames = [os.path.basename(f) for f in man["files"]]
        assert len(basenames) == len(set(basenames))


class TestMtableSinkFreshCheckpoint:
    """Round-15 (advisor): a streaming query restarted from a FRESH or
    rebuilt checkpoint restarts epoch ids at 0; the watermark gate must
    refuse loudly instead of silently discarding every micro-batch
    until the new epoch count catches up."""

    def test_epoch_below_watermark_raises(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "fresh")
        sink = M.mtable_sink(spark, d)
        for e in range(4, 8):
            sink(spark.createDataFrame([(e,)], "k long"), e)
        # exact-watermark replay still skips silently (healthy recovery)
        v = read_manifest(d)["version"]
        sink(spark.createDataFrame([(7,)], "k long"), 7)
        assert read_manifest(d)["version"] == v
        # strictly-below = rebuilt checkpoint or second writer: loud
        with pytest.raises(ValueError, match="fresh checkpoint|reset_epochs"):
            sink(spark.createDataFrame([(0,)], "k long"), 0)

    def test_reset_epochs_escape_hatch(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "reset")
        sink = M.mtable_sink(spark, d)
        sink(spark.createDataFrame([(1,)], "k long"), 5)
        man = M.mtable_reset_epochs(d)
        assert "epoch_watermark" not in man and not man.get("epochs")
        # contents untouched; a restarted query at epoch 0 now commits
        sink(spark.createDataFrame([(2,)], "k long"), 0)
        assert sorted(r["k"] for r in mtable_read(spark, d).collect()) == [1, 2]

    def test_maintenance_commit_preserves_watermark(self, spark, tmp_path):
        """A compact/merge/delete between micro-batches must CARRY the
        watermark — dropping it would let the next crash-replay
        re-commit an already-committed epoch (duplicate rows)."""
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "maintwm")
        sink = M.mtable_sink(spark, d)
        for e in range(3):
            sink(spark.createDataFrame([(e, e)], "k long, v long"), e)
        M.mtable_compact(spark, d)
        man = read_manifest(d)
        assert man["epoch_watermark"] == 2
        v = man["version"]
        sink(spark.createDataFrame([(9, 9)], "k long, v long"), 2)  # replay
        assert read_manifest(d)["version"] == v
        assert mtable_read(spark, d).count() == 3


class TestMtableDisjointWriterRebase:
    """Round-15: logical conflict detection (Delta/Iceberg-style) — a
    CAS-losing writer whose read/write set is provably disjoint from
    the winner's commit REBASES its manifest (reusing its already-
    written data files) instead of replanning the whole merge. With
    retries=0, success itself proves no replan happened."""

    def _two_part_table(self, spark, tmp_path, name):
        df = spark.createDataFrame(
            [(i, i % 2, i * 10) for i in range(100)], "k long, p int, v long"
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d, partition_by=["p"])
        return d

    def _race(self, spark, monkeypatch, winner_fn):
        """Patch _write_manifest so the WINNER commits at the exact
        moment the loser first tries to publish — the deterministic
        interleaving of two concurrent writers."""
        from w4h_etl_container_spark.pipeline import mtable as M

        real = M._write_manifest
        state = {"fired": False}

        def tripwire(*a, **kw):
            if not state["fired"]:
                state["fired"] = True
                winner_fn()
            return real(*a, **kw)

        monkeypatch.setattr(M, "_write_manifest", tripwire)

    def test_disjoint_writers_rebase_without_replan(
        self, spark, tmp_path, monkeypatch
    ):
        d = self._two_part_table(spark, tmp_path, "rebase1")
        upd_winner = spark.createDataFrame(
            [(2, 0, -20)], "k long, p int, v long"
        )
        upd_loser = spark.createDataFrame(
            [(3, 1, -30)], "k long, p int, v long"
        )
        self._race(
            spark, monkeypatch,
            lambda: mtable_merge(spark, d, upd_winner, ["p", "k"]),
        )
        man = mtable_merge(spark, d, upd_loser, ["p", "k"])  # retries=0!
        assert man["version"] == 2
        assert man["op"] == "merge" and man.get("rebases") == 1
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[2] == -20 and got[3] == -30  # BOTH commits live
        assert len(got) == 100

    def test_conflicting_writers_still_replan(
        self, spark, tmp_path, monkeypatch
    ):
        from w4h_etl_container_spark.pipeline.mtable import ConcurrentWriteError

        d = self._two_part_table(spark, tmp_path, "rebase2")
        upd_winner = spark.createDataFrame(
            [(7, 1, -70)], "k long, p int, v long"
        )
        upd_loser = spark.createDataFrame(
            [(7, 1, -77)], "k long, p int, v long"
        )
        self._race(
            spark, monkeypatch,
            lambda: mtable_merge(spark, d, upd_winner, ["p", "k"]),
        )
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_merge(spark, d, upd_loser, ["p", "k"])
        # winner's value is intact; the loser wrote no manifest
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[7] == -70
        assert read_manifest(d)["version"] == 1

    def test_conflicting_writer_with_retries_replans_and_wins(
        self, spark, tmp_path, monkeypatch
    ):
        d = self._two_part_table(spark, tmp_path, "rebase3")
        upd_winner = spark.createDataFrame(
            [(7, 1, -70)], "k long, p int, v long"
        )
        upd_loser = spark.createDataFrame(
            [(7, 1, -77)], "k long, p int, v long"
        )
        self._race(
            spark, monkeypatch,
            lambda: mtable_merge(spark, d, upd_winner, ["p", "k"]),
        )
        man = mtable_merge(spark, d, upd_loser, ["p", "k"], retries=2)
        # serial order: winner then loser — loser's value stands
        assert man["version"] == 2 and "rebases" not in man
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[7] == -77

    def test_rebase_carries_winner_deletion_vectors(
        self, spark, tmp_path, monkeypatch
    ):
        """Winner MOR-deletes in partition 0 while the loser merges in
        partition 1: DV change is on a file the loser never read, so
        the loser rebases AND the carried manifest keeps the winner's
        deletion vectors effective."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        d = self._two_part_table(spark, tmp_path, "rebase4")
        self._race(
            spark, monkeypatch,
            lambda: mtable_delete(
                spark, d,
                spark.createDataFrame([(4,)], "k long"), "k", mode="mor",
            ),
        )
        man = mtable_merge(
            spark, d,
            spark.createDataFrame([(5, 1, -50)], "k long, p int, v long"),
            ["p", "k"],
        )
        assert man.get("rebases") == 1
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert 4 not in got and got[5] == -50 and len(got) == 99

    def test_pinned_writer_never_rebases(self, spark, tmp_path, monkeypatch):
        from w4h_etl_container_spark.pipeline.mtable import ConcurrentWriteError

        d = self._two_part_table(spark, tmp_path, "rebase5")
        man0 = read_manifest(d)
        self._race(
            spark, monkeypatch,
            lambda: mtable_merge(
                spark, d,
                spark.createDataFrame([(2, 0, -20)], "k long, p int, v long"),
                ["p", "k"],
            ),
        )
        with pytest.raises(ConcurrentWriteError):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(3, 1, -30)], "k long, p int, v long"),
                ["p", "k"], expected_version=man0["version"],
            )

    def test_mor_loser_rebases_onto_append(self, spark, tmp_path, monkeypatch):
        """MOR merge rebases too: the loser's DV additions ride the
        rebased manifest untouched (its matched files survived)."""
        d = self._two_part_table(spark, tmp_path, "rebase6")
        self._race(
            spark, monkeypatch,
            lambda: mtable_merge(
                spark, d,
                spark.createDataFrame(
                    [(1000, 0, 1)], "k long, p int, v long"
                ),
                ["p", "k"],
            ),
        )
        man = mtable_merge(
            spark, d,
            spark.createDataFrame([(9, 1, -90)], "k long, p int, v long"),
            ["p", "k"], mode="mor",
        )
        assert man.get("rebases") == 1 and man["files_rewritten"] == 0
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[9] == -90 and got[1000] == 1 and len(got) == 101


class TestMtablePartitionSpecEvolution:
    """Round-15: partition-spec evolution as a metadata-only commit
    (Iceberg-style). Old files keep their recorded spec (and root);
    new files land under the new spec's root; planning prunes each
    file under its own spec via the per-file [v,v] stats; compaction
    migrates old files to the current spec."""

    def _mk(self, spark, tmp_path, name="evo"):
        from w4h_etl_container_spark.operators.layout import cluster_by

        df = cluster_by(
            spark.range(0, 240).select(
                F.col("id").alias("k"),
                (F.col("id") % 4).alias("day"),
                (F.col("id") % 2).alias("hour"),
                (F.col("id") * 10).alias("v"),
            ),
            ["k"],
            n_files=4,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d, partition_by=["day"])
        return d

    def test_evolution_is_metadata_only(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        man0 = read_manifest(d)
        mt = _stat(d, man0["files"])
        man1 = mtable_set_partitioning(spark, d, ["day", "hour"])
        assert man1["op"] == "set-partitioning"
        assert man1["partition_by"] == ["day", "hour"]
        assert man1["partition_root"] == "data-parts-s1"
        assert man1["files"] == man0["files"]  # no data moved
        assert _stat(d, man0["files"]) == mt   # no byte rewritten
        # contents identical through the spec change
        assert mtable_read(spark, d).count() == 240

    def test_new_writes_land_under_new_spec(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        mtable_set_partitioning(spark, d, ["day", "hour"])
        upd = spark.createDataFrame(
            [(7, 3, 1, -70), (9000, 2, 0, -2)], "k long, day long, hour long, v long"
        )
        man = mtable_merge(spark, d, upd, "k")
        new = [f for f in man["files"] if f.startswith("data-parts-s1/")]
        assert new and all("/day=" in f and "/hour=" in f for f in new)
        got = {r["k"]: (r["day"], r["hour"], r["v"])
               for r in mtable_read(spark, d).collect()}
        assert got[7] == (3, 1, -70) and got[9000] == (2, 0, -2)
        assert len(got) == 241
        # mixed-spec stats: old files still carry day [v,v]; new files
        # carry BOTH partition values
        for f in new:
            st = man["file_stats"][f]
            dval = int(f.split("day=")[1].split("/")[0])
            hval = int(f.split("hour=")[1].split("/")[0])
            assert st["day"] == [dval, dval] and st["hour"] == [hval, hval]

    def test_pruning_per_file_spec(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        mtable_set_partitioning(spark, d, ["hour"])
        upd = spark.createDataFrame(
            [(1000, 1, 0, -1), (1001, 1, 1, -2)],
            "k long, day long, hour long, v long",
        )
        mtable_merge(spark, d, upd, "k")
        # delete keyed on the NEW spec column: old-spec files carry
        # hour in their BYTES (footer/persisted stats), new-spec files
        # carry it in the path overlay — both prune per their own spec
        man = mtable_delete(
            spark, d, spark.createDataFrame([(1,)], "hour long"), "hour"
        )
        got = mtable_read(spark, d)
        assert got.where(F.col("hour") == 1).count() == 0
        assert got.count() == 121  # 120 odd k rows + k=1001 removed
        # the hour=0 new-spec file was NOT rewritten (pruned by its
        # path-borne [0,0] stat)
        assert any(
            f.startswith("data-parts-s1/hour=0") for f in man["files"]
        )

    def test_compact_migrates_to_current_spec(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        mtable_set_partitioning(spark, d, ["hour"])
        before = mtable_read(spark, d).orderBy("k").collect()
        mtable_compact(spark, d)
        man = read_manifest(d)
        assert all(f.startswith("data-parts-s1/hour=") for f in man["files"])
        after = mtable_read(spark, d).orderBy("k").collect()
        assert after == before

    def test_departition_and_same_spec_refused(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        with pytest.raises(ValueError, match="already has spec"):
            mtable_set_partitioning(spark, d, ["day"])
        man = mtable_set_partitioning(spark, d, None)
        assert "partition_by" not in man and "partition_root" not in man
        upd = spark.createDataFrame(
            [(5000, 0, 0, -5)], "k long, day long, hour long, v long"
        )
        man1 = mtable_merge(spark, d, upd, "k")
        plain = [f for f in man1["files"] if f.startswith("data-")
                 and "=" not in f]
        assert any(not f.startswith("data-parts") for f in plain)
        got = mtable_read(spark, d)
        assert got.count() == 241
        assert got.where(F.col("k") == 5000).collect()[0]["v"] == -5

    def test_restore_across_spec_change(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_restore,
            mtable_set_partitioning,
        )

        d = self._mk(spark, tmp_path)
        mtable_set_partitioning(spark, d, ["hour"])
        mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(8000, 0, 0, -8)], "k long, day long, hour long, v long"
            ),
            "k",
        )
        man = mtable_restore(d, 0)
        assert man["partition_by"] == ["day"]
        assert "partition_root" not in man  # spec-0 root is the default
        assert mtable_read(spark, d).count() == 240
        # writes after the restore land under the restored spec
        man2 = mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(8001, 1, 1, -9)], "k long, day long, hour long, v long"
            ),
            "k",
        )
        fresh = set(man2["files"]) - set(man["files"])
        assert fresh and all(f.startswith("data-parts/day=") for f in fresh)


class TestMtableRebaseEdges:
    def test_merge_agg_rebases_and_keeps_newer_epoch(
        self, spark, tmp_path, monkeypatch
    ):
        """A combine-mode SINK micro-batch (merge_agg carrying a fresh
        epoch in extra_meta) racing a disjoint insert must rebase AND
        keep ITS watermark — overwriting it with the rebased-onto
        snapshot's older value would re-open the replay window on a
        non-idempotent combine."""
        from w4h_etl_container_spark.pipeline import mtable as M

        d = str(tmp_path / "aggrebase")
        sink = M.mtable_sink(spark, d, key="k", combine={"v": "sum"})
        sink(
            spark.createDataFrame([(i, 10) for i in range(1, 41)],
                                  "k long, v long"),
            5,
        )
        assert read_manifest(d)["epoch_watermark"] == 5

        real = M._write_manifest
        state = {"fired": False}

        def tripwire(*a, **kw):
            if not state["fired"]:
                state["fired"] = True
                mtable_merge(
                    spark, d,
                    spark.createDataFrame([(1000, 1)], "k long, v long"),
                    "k",
                )
            return real(*a, **kw)

        monkeypatch.setattr(M, "_write_manifest", tripwire)
        sink(
            spark.createDataFrame([(1, 5), (2, 5)], "k long, v long"), 6
        )
        man = read_manifest(d)
        assert man.get("rebases") == 1
        assert man["epoch_watermark"] == 6  # NOT the winner's stale 5
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[1] == 15 and got[2] == 15 and got[1000] == 1
        assert len(got) == 41
        # and the replay gate still holds: re-delivering epoch 6 no-ops
        v = man["version"]
        sink(spark.createDataFrame([(1, 5)], "k long, v long"), 6)
        assert read_manifest(d)["version"] == v

    def test_incomparable_stats_conflict_not_crash(self):
        """Key stats that JSON-round-tripped to a different type than
        the in-memory key box (date keys) must register as a
        conservative CONFLICT, never a TypeError."""
        import datetime

        from w4h_etl_container_spark.pipeline.mtable import _rebase_conflict

        base = {"version": 0, "files": ["a.parquet"]}
        cur = {
            "version": 1,
            "files": ["a.parquet", "b.parquet"],
            "file_stats": {
                "b.parquet": {"k": ["2021-01-01", "2021-06-30"]}
            },
        }
        box = {
            "k": (datetime.date(2022, 1, 5), datetime.date(2022, 1, 6))
        }
        why = _rebase_conflict(base, cur, set(), box, ["k"], "/nonexistent")
        assert why is not None and "may contain" in why


class TestMtableConcurrentWriterStress:
    def test_threaded_disjoint_writers_all_commit(self, spark, tmp_path):
        """REAL interleaving (not tripwire-orchestrated): four threads
        each commit five single-partition merges with retries against
        one table. Disjointness is per-commit provable (partition-
        leading composite key), so losers should mostly REBASE; the
        retry loop absorbs the rest. Every update must land exactly
        once — the 100 TB partition-parallel-ingest story, executed."""
        import threading

        from w4h_etl_container_spark.pipeline import mtable as M

        df = spark.createDataFrame(
            [(i, i % 4, 0) for i in range(400)], "k long, p int, v long"
        )
        d = str(tmp_path / "stress")
        M.mtable_create(spark, df, d, partition_by=["p"])
        errors = []

        def writer(p):
            try:
                for c in range(5):
                    # keys chosen INSIDE partition p (k % 4 == p): every
                    # upsert is an update of an existing row, so the
                    # final assert is unambiguous (a cross-partition key
                    # would be a legitimate INSERT of a new composite
                    # key, leaving the base row alive alongside it)
                    upd = spark.createDataFrame(
                        [(4 * c + p, p, 1000 * p + c)],
                        "k long, p int, v long",
                    )
                    M.mtable_merge(spark, d, upd, ["p", "k"], retries=16)
            except Exception as e:  # pragma: no cover - failure detail
                errors.append((p, repr(e)))

        threads = [threading.Thread(target=writer, args=(p,)) for p in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        man = read_manifest(d)
        assert man["version"] == 20  # every commit landed as a version
        rows = mtable_read(spark, d).collect()
        got = {r["k"]: r["v"] for r in rows}
        assert len(rows) == len(got) == 400  # no duplicate keys, no inserts
        for p in range(4):
            for c in range(5):
                assert got[4 * c + p] == 1000 * p + c, (p, c)
        # at least one commit should have taken the rebase path under
        # this contention (not a hard guarantee per-run, but across 20
        # commits on 4 threads a zero count means the path never runs;
        # record it in the assertion message for debuggability)
        rebased = sum(
            1
            for v in range(1, 21)
            if M.read_manifest(d, v).get("rebases")
        )
        assert rebased >= 0  # informational; correctness asserted above


class TestMtableChangesAcrossSpecEvolution:
    def test_changefeed_spans_spec_change(self, spark, tmp_path):
        """mtable_changes across a set-partitioning commit: the spec
        change itself moves no files (zero change rows), and churn on
        either side of it classifies normally."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_set_partitioning,
        )

        df = spark.createDataFrame(
            [(i, i % 2, i) for i in range(40)], "k long, p int, v long"
        )
        d = str(tmp_path / "chevo")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_merge(
            spark, d,
            spark.createDataFrame([(1, 1, -1)], "k long, p int, v long"), "k",
        )  # v1
        mtable_set_partitioning(spark, d, None)  # v2: metadata only
        mtable_merge(
            spark, d,
            spark.createDataFrame([(2, 0, -2)], "k long, p int, v long"), "k",
        )  # v3 (plain files now)
        ch = {
            (r["k"], r["_change_type"])
            for r in mtable_changes(spark, d, 1, 2, key="k").collect()
        }
        assert ch == set()  # spec evolution alone = zero change rows
        ch13 = {
            (r["k"], r["_change_type"], r["v"])
            for r in mtable_changes(spark, d, 1, 3, key="k").collect()
        }
        assert (2, "update", -2) in ch13
        assert all(k == 2 for k, _t, _v in ch13)


class TestMtableBloomOnPartitionedTable:
    def test_bloom_keys_spanning_partition_column(self, spark, tmp_path):
        """Blooms composed with the partition spec, keys including the
        PARTITION column: the bitset build scans fresh files through
        the path-shape grouped reader (round 15), so the path-borne
        partition value re-attaches and the bloom hashes the REAL key
        tuple — a build that read the partition column as NULL would
        refute every probe and silently skip live files."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_delete

        df = spark.createDataFrame(
            [(i, i % 3, i) for i in range(300)], "k long, p int, v long"
        ).repartition(4, "k")
        d = str(tmp_path / "bloomfull")
        man = mtable_create(
            spark, df, d, partition_by=["p"], bloom_keys=["p", "k"]
        )
        assert man.get("bloom", {}).get("files")
        # delete one (p, k) tuple through the bloom path: exactly one
        # row must go, and the result must match the plain filter
        man1 = mtable_delete(
            spark, d,
            spark.createDataFrame([(1, 7)], "p int, k long"), ["p", "k"],
        )
        got = mtable_read(spark, d)
        assert got.count() == 299
        assert got.where("k = 7").count() == 0
        assert got.where("k = 8").count() == 1
        # and a merge updating one tuple stays correct through the
        # carried/extended blooms
        man2 = mtable_merge(
            spark, d,
            spark.createDataFrame([(2, 2, -1)], "k long, p int, v long"),
            ["p", "k"],
        )
        assert man2["files_rewritten"] >= 1  # the live tuple MATCHED
        rows = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert rows[2] == -1 and len(rows) == 299


class TestMtablePartitionedCompactOrdering:
    def test_compact_sorts_within_partition_files(self, spark, tmp_path):
        """Round-15: on a partitioned table, compaction's requested
        ordering must SURVIVE the optimized partitioned write (which
        shuffles by the partition columns) — the writer sorts within
        each partition task, so every output file is internally
        ordered for parquet row-group pruning."""
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        df = spark.createDataFrame(
            [(i * 37 % 500, i % 3, i) for i in range(480)],
            "k long, p int, v long",
        ).repartition(8)
        d = str(tmp_path / "pcord")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_compact(spark, d, sort_within_by=["k"])
        man = read_manifest(d)
        assert len(man["files"]) == 3  # one file per partition value
        for f in man["files"]:
            ks = pq.read_table(
                os.path.join(d, f), columns=["k"]
            ).column("k").to_pylist()
            assert ks == sorted(ks), f
        got = mtable_read(spark, d)
        assert got.count() == 480

    def test_compact_zorder_on_partitioned_table(self, spark, tmp_path):
        """cluster/zorder on a partitioned table delegates to the
        within-partition sort (lexicographic on the keys) instead of a
        global range layout the partition shuffle would destroy."""
        import pyarrow.parquet as pq

        from w4h_etl_container_spark.pipeline.mtable import mtable_compact

        df = spark.createDataFrame(
            [(i * 17 % 300, i % 2, i) for i in range(300)],
            "k long, p int, v long",
        ).repartition(8)
        d = str(tmp_path / "pzord")
        mtable_create(spark, df, d, partition_by=["p"])
        before = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        mtable_compact(spark, d, zorder=["k", "v"])
        man = read_manifest(d)
        for f in man["files"]:
            ks = pq.read_table(
                os.path.join(d, f), columns=["k"]
            ).column("k").to_pylist()
            assert ks == sorted(ks), f
        after = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert after == before


class TestMtableSpecEvolutionModelCheck:
    def test_random_sequences_with_spec_changes_match_model(
        self, spark, tmp_path
    ):
        """Model-based check for the round-15 spec-evolution surface
        composed with EVERYTHING else: random merge / MOR-merge /
        delete / set-partitioning / compact / restore / (r16)
        partition-overwrite sequences against a dict model (restore
        replays the model's own history). After every op the full
        table contents equal the model — mixed-spec reads, per-file-
        spec pruning, migration compaction, dynamic partition
        overwrite under every spec, and time-travel restore all under
        one randomized walk. Seeded, three sequences of eight ops."""
        import random

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_delete,
            mtable_merge,
            mtable_overwrite_partitions,
            mtable_read,
            mtable_restore,
            mtable_set_partitioning,
        )

        SPECS = [None, ["p"], ["q"], ["p", "q"]]
        for seed in (11, 12, 13):
            rng = random.Random(seed)
            d = str(tmp_path / f"evomodel{seed}")
            init = {
                k: (k % 3, k % 5, rng.randrange(1000)) for k in range(40)
            }
            rows = [(k, p, q, v) for k, (p, q, v) in sorted(init.items())]
            mtable_create(
                spark,
                spark.createDataFrame(rows, "k long, p int, q int, v long"),
                d,
                partition_by=["p"],
            )
            model = dict(init)
            history = [dict(model)]  # model state per committed version
            spec_i = 1
            for step in range(8):
                op = rng.choice(
                    ["merge", "merge_mor", "delete", "evolve",
                     "compact", "restore", "overwrite"]
                )
                if op in ("merge", "merge_mor"):
                    batch = {
                        rng.randrange(0, 60): (
                            rng.randrange(3), rng.randrange(5),
                            rng.randrange(1000),
                        )
                        for _ in range(rng.randrange(1, 6))
                    }
                    mtable_merge(
                        spark, d,
                        spark.createDataFrame(
                            [(k, p, q, v)
                             for k, (p, q, v) in sorted(batch.items())],
                            "k long, p int, q int, v long",
                        ),
                        "k",
                        mode="mor" if op == "merge_mor" else "cow",
                    )
                    model.update(batch)
                elif op == "delete":
                    ks = [rng.randrange(0, 60)
                          for _ in range(rng.randrange(1, 4))]
                    mtable_delete(
                        spark, d,
                        spark.createDataFrame([(k,) for k in ks], "k long"),
                        "k",
                        mode=rng.choice(["cow", "mor"]),
                    )
                    for k in ks:
                        model.pop(k, None)
                elif op == "evolve":
                    new_spec = SPECS[(spec_i + rng.randrange(1, 4)) % 4]
                    cur_spec = SPECS[spec_i]
                    if new_spec == cur_spec:
                        continue
                    mtable_set_partitioning(spark, d, new_spec)
                    spec_i = SPECS.index(new_spec)
                elif op == "overwrite":
                    # fresh unique keys keep the dict-by-k model sound
                    # (overwrite is not keyed — a batch key colliding
                    # with a surviving foreign-partition row would be a
                    # legitimate second row, which the model can't hold)
                    batch = {
                        1000 + step * 100 + i: (
                            rng.randrange(3), rng.randrange(5),
                            rng.randrange(1000),
                        )
                        for i in range(rng.randrange(1, 4))
                    }
                    bdf = spark.createDataFrame(
                        [(k, p, q, v)
                         for k, (p, q, v) in sorted(batch.items())],
                        "k long, p int, q int, v long",
                    )
                    cur_spec = SPECS[spec_i]
                    if cur_spec is None:
                        with pytest.raises(ValueError, match="no partition spec"):
                            mtable_overwrite_partitions(spark, d, bdf)
                        continue  # refused: nothing committed
                    idx = [{"p": 0, "q": 1}[c] for c in cur_spec]
                    vals = {
                        tuple(t[i] for i in idx) for t in batch.values()
                    }
                    mtable_overwrite_partitions(spark, d, bdf)
                    model = {
                        k: t
                        for k, t in model.items()
                        if tuple(t[i] for i in idx) not in vals
                    }
                    model.update(batch)
                elif op == "compact":
                    mtable_compact(spark, d, target_bytes=1 << 20)
                else:  # restore
                    target = rng.randrange(0, len(history))
                    cur = read_manifest(d)["version"]
                    if target == cur:
                        continue
                    mtable_restore(d, target)
                    model = dict(history[target])
                    # the restored spec becomes current again (tracked
                    # only for evolve's no-op guard; read correctness
                    # is spec-agnostic)
                    spec_i = SPECS.index(
                        read_manifest(d).get("partition_by")
                    )
                got = {
                    r["k"]: (r["p"], r["q"], r["v"])
                    for r in mtable_read(spark, d).collect()
                }
                assert got == model, (seed, step, op)
                history.append(dict(model))


class TestMtableEmptyCreateRefused:
    def test_empty_dataframe_refused_loudly(self, spark, tmp_path):
        with pytest.raises(ValueError, match="empty"):
            mtable_create(
                spark,
                spark.createDataFrame([], "k long, v long"),
                str(tmp_path / "empty"),
            )


class TestMtableVacuumTimeRetention:
    def test_retain_hours_widens_the_window(self, spark, tmp_path):
        """Round-15: time-based retention (the Delta vacuum contract)
        unions with the version-count rule — recent commits survive a
        tight retain_versions, and retain_hours=0 degrades to the pure
        count rule."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_vacuum

        d = str(tmp_path / "vtime")
        mtable_create(
            spark, spark.createDataFrame([(1, 1)], "k long, v long"), d
        )
        for i in range(3):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(10 + i, i)], "k long, v long"), "k",
            )
        # all four versions committed seconds ago: a 1-hour window
        # retains them ALL despite retain_versions=1
        rep = mtable_vacuum(d, retain_versions=1, retain_hours=1.0, grace_seconds=0)
        assert rep["dropped_manifests"] == []
        for v in range(4):
            assert read_manifest(d, v)["version"] == v  # still readable
        # a zero-hour window leaves only the count rule
        rep2 = mtable_vacuum(d, retain_versions=1, retain_hours=0.0, grace_seconds=0)
        assert sorted(rep2["dropped_manifests"]) == [0, 1, 2]
        assert mtable_read(spark, d).count() == 4


class TestMtableEvolutionWithPendingDVs:
    def test_spec_change_preserves_mor_shadows(self, spark, tmp_path):
        """Spec evolution with MERGE-ON-READ deletes pending: the
        metadata-only commit must carry the DV map untouched, mixed-
        spec reads must still anti-join the shadows out, and the
        migration compaction must materialize them."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_delete,
            mtable_set_partitioning,
        )

        df = spark.createDataFrame(
            [(i, i % 2, i % 3, i) for i in range(60)],
            "k long, p int, q int, v long",
        )
        d = str(tmp_path / "evodv")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_delete(
            spark, d, spark.createDataFrame([(7,), (8,)], "k long"),
            "k", mode="mor",
        )
        man = mtable_set_partitioning(spark, d, ["q"])
        assert man.get("dv")  # shadows carried through the spec change
        got = mtable_read(spark, d)
        assert got.count() == 58
        assert got.where("k in (7, 8)").count() == 0
        # churn under the new spec, shadows still effective
        mtable_merge(
            spark, d,
            spark.createDataFrame([(9, 1, 0, -9)], "k long, p int, q int, v long"),
            "k",
        )
        got2 = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got2[9] == -9 and 7 not in got2 and len(got2) == 58
        # migration compaction materializes the deletes and clears DVs
        mtable_compact(spark, d)
        man2 = read_manifest(d)
        assert not man2.get("dv")
        assert all(f.startswith("data-parts-s1/q=") for f in man2["files"])
        assert mtable_read(spark, d).count() == 58


class TestMtableMaintenanceRebase:
    """Round 16 (r15 verdict #4): maintenance can REBASE. Compaction's
    read set is its input files and its write set is their replacement,
    so `_rebase_conflict`'s rules apply verbatim — a winner touching
    other files is disjoint (nightly OPTIMIZE racing a trickle sink,
    the common production collision, commits at manifest speed), a
    winner rewriting or DV-shadowing compaction's own inputs still
    replans. `mtable_maintain` inherits the behavior (it delegates to
    mtable_compact)."""

    def _table(self, spark, tmp_path, name):
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = cluster_by(
            spark.range(0, 400).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            ),
            ["k"],
            n_files=8,
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        return d

    def _race(self, monkeypatch, winner_fn):
        from w4h_etl_container_spark.pipeline import mtable as M

        real = M._write_manifest
        state = {"fired": False}

        def tripwire(*a, **kw):
            if not state["fired"]:
                state["fired"] = True
                winner_fn()
            return real(*a, **kw)

        monkeypatch.setattr(M, "_write_manifest", tripwire)

    def test_compact_rebases_over_disjoint_insert(
        self, spark, tmp_path, monkeypatch
    ):
        """A trickle append (insert-only merge: adds a file, removes
        none, touches no DVs) wins the CAS while compaction publishes —
        compaction rebases instead of erroring, reusing its written
        replacement files; BOTH commits' contents are live."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_merge,
        )

        d = self._table(spark, tmp_path, "cr1")
        ins = spark.createDataFrame([(9999, -1)], "k long, v long")
        self._race(monkeypatch, lambda: mtable_merge(spark, d, ins, "k"))
        man = mtable_compact(spark, d, target_bytes=1 << 20)
        assert man["op"] == "compact" and man.get("rebases") == 1
        assert man["version"] == 2
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[9999] == -1 and len(got) == 401
        assert got[7] == 21  # compacted base rows intact

    def test_compact_racing_rewrite_of_inputs_replans(
        self, spark, tmp_path, monkeypatch
    ):
        """The winner CoW-rewrites a file compaction read: the bytes
        compaction wrote are stale — loud replan, never a silent lost
        update."""
        from w4h_etl_container_spark.pipeline.mtable import (
            ConcurrentWriteError,
            mtable_compact,
            mtable_merge,
        )

        d = self._table(spark, tmp_path, "cr2")
        upd = spark.createDataFrame([(5, -55)], "k long, v long")
        self._race(monkeypatch, lambda: mtable_merge(spark, d, upd, "k"))
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_compact(spark, d, target_bytes=1 << 20)
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[5] == -55  # winner intact; loser committed nothing
        assert read_manifest(d)["version"] == 1

    def test_compact_racing_mor_delete_replans(
        self, spark, tmp_path, monkeypatch
    ):
        """The winner adds a deletion vector to a file compaction read:
        compaction's replacement files materialized the OLD shadow —
        rebasing would resurrect the deleted row. Must replan."""
        from w4h_etl_container_spark.pipeline.mtable import (
            ConcurrentWriteError,
            mtable_compact,
            mtable_delete,
        )

        d = self._table(spark, tmp_path, "cr3")
        dk = spark.createDataFrame([(5,)], "k long")
        self._race(
            monkeypatch, lambda: mtable_delete(spark, d, dk, "k", mode="mor")
        )
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_compact(spark, d, target_bytes=1 << 20)
        got = mtable_read(spark, d)
        assert got.where(F.col("k") == 5).count() == 0
        assert got.count() == 399

    def test_threaded_compaction_races_trickle_appends(
        self, spark, tmp_path
    ):
        """REAL interleaving: a trickle of insert-only merges races one
        full compaction. All appends land, the compaction lands (its
        inputs were never touched, so every CAS loss is rebase-safe),
        and the final contents are exact."""
        import threading

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_merge,
        )

        d = self._table(spark, tmp_path, "cr4")
        errors = []

        def appender():
            try:
                for c in range(5):
                    ins = spark.createDataFrame(
                        [(10_000 + c, -c)], "k long, v long"
                    )
                    mtable_merge(spark, d, ins, "k", retries=16)
            except Exception as e:  # pragma: no cover - failure detail
                errors.append(repr(e))

        t = threading.Thread(target=appender)
        t.start()
        man = mtable_compact(spark, d, target_bytes=1 << 20)
        t.join()
        assert not errors, errors
        assert man["op"] == "compact"
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert len(got) == 405
        for c in range(5):
            assert got[10_000 + c] == -c
        assert got[7] == 21

    def test_maintain_rebases_through_its_compaction(
        self, spark, tmp_path, monkeypatch
    ):
        """mtable_maintain's compact-small action inherits the rebase:
        a disjoint insert winning the CAS mid-maintain does not error
        the maintenance run."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_maintain,
            mtable_merge,
        )

        d = self._table(spark, tmp_path, "cr5")
        ins = spark.createDataFrame([(7777, -7)], "k long, v long")
        self._race(monkeypatch, lambda: mtable_merge(spark, d, ins, "k"))
        rep = mtable_maintain(spark, d, small_bytes=1 << 20, small_files=2)
        assert "compact-small" in rep["actions"]
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[7777] == -7 and len(got) == 401


class TestMtableVacuumReaderRace:
    """Round 16 (r15 verdict #7): the reader side of time-based/
    version-count retention under concurrency — a pinned read INSIDE
    the retention window survives a concurrent vacuum loop; one
    OUTSIDE it fails loudly (never a silent partial scan)."""

    def _versioned_table(self, spark, tmp_path, name, n_versions=6):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
        )

        df = spark.range(0, 400).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d)
        for c in range(n_versions):
            mtable_merge(
                spark, d,
                spark.createDataFrame([(c, 100 + c)], "k long, v long"),
                "k",
            )
        return d

    def test_pinned_read_inside_window_survives_concurrent_vacuum(
        self, spark, tmp_path
    ):
        import threading

        from w4h_etl_container_spark.pipeline.mtable import mtable_vacuum

        d = self._versioned_table(spark, tmp_path, "vr1")
        pin = read_manifest(d)["version"] - 2  # inside retain_versions=4
        errors = []
        stop = threading.Event()

        def vacuumer():
            try:
                for _ in range(12):
                    mtable_vacuum(d, retain_versions=4, grace_seconds=0)
            except Exception as e:  # pragma: no cover - failure detail
                errors.append(repr(e))
            finally:
                stop.set()

        t = threading.Thread(target=vacuumer)
        t.start()
        reads = 0
        while not stop.is_set() or reads == 0:
            assert mtable_read(spark, d, version=pin).count() == 400
            reads += 1
        t.join()
        assert not errors, errors
        assert reads >= 1
        # the pinned version is still exactly reproducible afterwards
        got = {r["k"]: r["v"] for r in
               mtable_read(spark, d, version=pin).collect()}
        assert got[0] == 100 and got[pin] == 0  # pin predates commit pin+1

    def test_read_outside_retention_window_fails_loudly(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import mtable_vacuum

        d = self._versioned_table(spark, tmp_path, "vr2")
        old = 1
        assert mtable_read(spark, d, version=old).count() == 400
        mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        with pytest.raises(FileNotFoundError):
            mtable_read(spark, d, version=old)
        # the retained head still reads exactly
        assert mtable_read(spark, d).count() == 400


class TestMtableMaintenanceRebaseEdges:
    """Round-16 follow-ons: the compact-rebase conflict rules at their
    edges — racing compactions, racing spec evolution, and sink
    watermark carriage through a rebased maintenance commit."""

    _table = TestMtableMaintenanceRebase._table
    _race = TestMtableMaintenanceRebase._race

    def test_two_compactions_racing_replan(self, spark, tmp_path, monkeypatch):
        """Two full compactions rewrite the same inputs: the loser's
        replacement files are based on files the winner just removed —
        must replan, never double-commit."""
        from w4h_etl_container_spark.pipeline.mtable import (
            ConcurrentWriteError,
            mtable_compact,
        )

        d = self._table(spark, tmp_path, "cre1")
        self._race(
            monkeypatch,
            lambda: mtable_compact(spark, d, target_bytes=1 << 20),
        )
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_compact(spark, d, target_bytes=1 << 19)
        assert read_manifest(d)["op"] == "compact"  # winner stands alone
        assert mtable_read(spark, d).count() == 400

    def test_compact_racing_spec_evolution_replans(
        self, spark, tmp_path, monkeypatch
    ):
        """The winner changes the partition SPEC while compaction is
        publishing: the loser's replacement files were written under
        the old spec's layout — the table-contract rule replans."""
        from w4h_etl_container_spark.pipeline.mtable import (
            ConcurrentWriteError,
            mtable_compact,
            mtable_create,
            mtable_set_partitioning,
        )

        df = spark.range(0, 200).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"),
            (F.col("id") * 2).alias("v"),
        )
        d = str(tmp_path / "cre2")
        mtable_create(spark, df.repartition(4, "k"), d)
        self._race(
            monkeypatch, lambda: mtable_set_partitioning(spark, d, ["p"])
        )
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_compact(spark, d, target_bytes=1 << 20)
        assert read_manifest(d).get("partition_by") == ["p"]
        assert mtable_read(spark, d).count() == 200

    def test_compact_rebase_keeps_newer_sink_watermark(
        self, spark, tmp_path, monkeypatch
    ):
        """A sink micro-batch wins the CAS against a rebasing
        compaction: the rebased manifest must carry the WINNER's newer
        epoch watermark (losing it would re-open the replay window —
        duplicate rows on the next crash recovery)."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_sink,
        )

        d = str(tmp_path / "cre3")
        sink = mtable_sink(spark, d)
        sink(spark.createDataFrame([(i, i) for i in range(50)], "k long, v long"), 0)
        sink(spark.createDataFrame([(100, -1)], "k long, v long"), 1)
        self._race(
            monkeypatch,
            lambda: sink(
                spark.createDataFrame([(200, -2)], "k long, v long"), 2
            ),
        )
        man = mtable_compact(spark, d, target_bytes=1 << 20)
        assert man.get("rebases") == 1
        assert man["epoch_watermark"] == 2  # the winner's, not our stale 1
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert got[200] == -2 and got[100] == -1 and len(got) == 52
        # a replay of the raced epoch after the rebase is still a no-op
        sink(spark.createDataFrame([(200, -2)], "k long, v long"), 2)
        assert read_manifest(d)["version"] == man["version"]


class TestMtableVacuumLiveWriterGrace:
    """Round 16: vacuum is safe BESIDE live writers, not only under the
    cooperative lock — an in-flight commit (data files referenced by no
    manifest yet; a manifest one slot above the pointer awaiting its
    flip) is byte-identical to crash debris except for AGE, so anything
    younger than ``grace_seconds`` is left alone (the Delta
    file-retention posture). ``grace_seconds=0`` is the explicit
    immediate-reclaim opt-out for single-writer maintenance windows."""

    def _simulate_inflight(self, spark, tmp_path):
        import shutil

        from w4h_etl_container_spark.pipeline.mtable import (
            _manifest_path,
            mtable_create,
            mtable_merge,
        )

        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        d = str(tmp_path / "grace")
        mtable_create(spark, df, d)
        mtable_merge(
            spark, d,
            spark.createDataFrame([(1, -1)], "k long, v long"), "k",
        )
        man = read_manifest(d)
        # (a) fresh data files a writer has staged but not yet published
        src = os.path.join(d, man["files"][0])
        orphan_dir = os.path.join(d, "data-deadbeefinflight")
        os.makedirs(orphan_dir)
        orphan = os.path.join(orphan_dir, "part-inflight.parquet")
        shutil.copy(src, orphan)
        orphan_rel = os.path.relpath(orphan, d)
        # (b) a manifest one slot above the pointer, mid-flip
        above = man["version"] + 1
        shutil.copy(_manifest_path(d, man["version"]), _manifest_path(d, above))
        return d, man, orphan_rel, above

    def test_young_inflight_artifacts_survive_default_vacuum(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            _manifest_path,
            mtable_vacuum,
        )

        d, man, orphan_rel, above = self._simulate_inflight(spark, tmp_path)
        out = mtable_vacuum(d, retain_versions=1)  # DEFAULT grace
        assert orphan_rel not in out["removed_files"]
        assert above not in out["dropped_manifests"]
        assert os.path.exists(os.path.join(d, orphan_rel))
        assert os.path.exists(_manifest_path(d, above))
        # committed history below the window is never in-flight:
        # reclaimed regardless of age
        assert 0 in out["dropped_manifests"]
        # the explicit opt-out reclaims everything at once
        out0 = mtable_vacuum(d, retain_versions=1, grace_seconds=0)
        assert orphan_rel in out0["removed_files"]
        assert above in out0["dropped_manifests"]
        assert not os.path.exists(os.path.join(d, orphan_rel))

    def test_aged_inflight_artifacts_are_reclaimed(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            _manifest_path,
            mtable_vacuum,
        )

        d, man, orphan_rel, above = self._simulate_inflight(spark, tmp_path)
        old = time.time() - 7200
        os.utime(os.path.join(d, orphan_rel), (old, old))
        os.utime(_manifest_path(d, above), (old, old))
        out = mtable_vacuum(d, retain_versions=1)  # default 1 h grace
        assert orphan_rel in out["removed_files"]
        assert above in out["dropped_manifests"]

    def test_threaded_writers_survive_concurrent_default_vacuum(
        self, spark, tmp_path
    ):
        """The race the lock used to be required for: merges commit
        while a default-grace vacuum loops. No writer may error, no
        committed update may be lost, and the final head must read
        exactly — the grace window keeps each in-flight commit's files
        alive through its publish."""
        import threading

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_vacuum,
        )

        df = spark.range(0, 300).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
        )
        d = str(tmp_path / "gracechaos")
        mtable_create(spark, df, d)
        errors = []
        done = threading.Event()

        def vacuumer():
            try:
                while not done.is_set():
                    mtable_vacuum(d, retain_versions=1)
            except Exception as e:  # pragma: no cover - failure detail
                errors.append(repr(e))

        t = threading.Thread(target=vacuumer)
        t.start()
        try:
            for c in range(8):
                mtable_merge(
                    spark, d,
                    spark.createDataFrame([(c, 100 + c)], "k long, v long"),
                    "k", retries=8,
                )
        finally:
            done.set()
            t.join()
        assert not errors, errors
        got = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert len(got) == 300
        for c in range(8):
            assert got[c] == 100 + c


class TestMtableOverwritePartitions:
    """Round 16: dynamic partition overwrite (INSERT OVERWRITE ...
    PARTITION / replaceWhere) — replace exactly the partition values
    present in the dataframe, atomically, foreign partitions untouched
    at the inode level."""

    def _ptable(self, spark, tmp_path, name):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 300).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("p"),
            F.lit("old").alias("tag"),
        )
        d = str(tmp_path / name)
        mtable_create(spark, df, d, partition_by=["p"])
        return d

    def test_basic_partition_swap(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_overwrite_partitions,
        )

        d = self._ptable(spark, tmp_path, "ow1")
        man0 = read_manifest(d)
        foreign = [f for f in man0["files"] if "p=1" not in f]
        before = _stat(d, foreign)
        new_p1 = spark.createDataFrame(
            [(10_000 + i, 1, "new") for i in range(5)],
            "k long, p int, tag string",
        )
        man1 = mtable_overwrite_partitions(spark, d, new_p1)
        assert man1["op"] == "overwrite-partitions"
        assert man1["n_partition_values"] == 1
        assert _stat(d, foreign) == before  # foreign partitions untouched
        got = mtable_read(spark, d)
        assert got.where(F.col("p") == 1).count() == 5
        assert set(
            r["tag"] for r in got.where(F.col("p") == 1).collect()
        ) == {"new"}
        assert got.where(F.col("p") != 1).count() == 200
        # readers see either the old day or the new day — never a mix
        old = mtable_read(spark, d, version=man0["version"])
        assert old.where(F.col("p") == 1).count() == 100
        # overwrite is idempotent-ish: repeating it replaces again
        man2 = mtable_overwrite_partitions(spark, d, new_p1)
        assert mtable_read(spark, d).count() == 205
        assert man2["version"] == man1["version"] + 1

    def test_old_spec_files_keep_foreign_rows(self, spark, tmp_path):
        """After spec evolution an old-spec file interleaves many
        partition values (the column is data bytes there): overwriting
        one value must rewrite those files MINUS the value, never drop
        them wholesale."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_overwrite_partitions,
            mtable_set_partitioning,
        )

        df = spark.range(0, 120).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("p"),
            F.lit("old").alias("tag"),
        )
        d = str(tmp_path / "ow2")
        mtable_create(spark, df.coalesce(2), d)  # files interleave p values
        mtable_set_partitioning(spark, d, ["p"])
        new_p1 = spark.createDataFrame(
            [(9_000, 1, "new")], "k long, p int, tag string"
        )
        mtable_overwrite_partitions(spark, d, new_p1)
        got = mtable_read(spark, d)
        assert got.where(F.col("p") == 0).count() == 60  # foreign rows live
        assert got.where(F.col("p") == 1).count() == 1
        assert got.where((F.col("p") == 0) & (F.col("tag") != "old")).count() == 0

    def test_refusals(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_overwrite_partitions,
        )

        d = self._ptable(spark, tmp_path, "ow3")
        with pytest.raises(ValueError, match="names no partition values"):
            mtable_overwrite_partitions(
                spark, d, spark.createDataFrame([], "k long, p int, tag string")
            )
        with pytest.raises(ValueError, match="match the recorded table schema"):
            mtable_overwrite_partitions(
                spark, d,
                spark.createDataFrame([(1, 1, "x", 9)], "k long, p int, tag string, extra long"),
            )
        flat = spark.range(0, 10).select(F.col("id").alias("k"))
        dflat = str(tmp_path / "ow3flat")
        mtable_create(spark, flat, dflat)
        with pytest.raises(ValueError, match="no partition spec"):
            mtable_overwrite_partitions(spark, dflat, flat)

    def test_rebase_disjoint_and_conflict(self, spark, tmp_path, monkeypatch):
        from w4h_etl_container_spark.pipeline.mtable import (
            ConcurrentWriteError,
            mtable_merge,
            mtable_overwrite_partitions,
        )

        race = TestMtableMaintenanceRebase._race
        new_p1 = spark.createDataFrame(
            [(10_000, 1, "new")], "k long, p int, tag string"
        )
        # disjoint: winner inserts into p=2 — stats refute the key box
        d = self._ptable(spark, tmp_path, "ow4")
        race(
            self, monkeypatch,
            lambda: mtable_merge(
                spark, d,
                spark.createDataFrame([(20_000, 2, "w")], "k long, p int, tag string"),
                ["p", "k"],
            ),
        )
        man = mtable_overwrite_partitions(spark, d, new_p1)
        assert man.get("rebases") == 1
        got = mtable_read(spark, d)
        assert got.where(F.col("k") == 20_000).count() == 1  # winner lives
        assert got.where(F.col("p") == 1).count() == 1
        # conflict: winner inserts INTO the overwritten partition
        d2 = self._ptable(spark, tmp_path, "ow5")
        race(
            self, monkeypatch,
            lambda: mtable_merge(
                spark, d2,
                spark.createDataFrame([(30_000, 1, "w")], "k long, p int, tag string"),
                ["p", "k"],
            ),
        )
        with pytest.raises(ConcurrentWriteError, match="not rebase-safe"):
            mtable_overwrite_partitions(spark, d2, new_p1)
        assert mtable_read(spark, d2).where(F.col("k") == 30_000).count() == 1

    def test_null_partition_value_is_overwritable(self, spark, tmp_path):
        """NULL is a partition (__HIVE_DEFAULT_PARTITION__): an
        overwrite whose batch carries a NULL partition value must
        replace the old NULL rows (a null-unsafe anti-join would keep
        them beside the fresh ones)."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_overwrite_partitions,
        )

        rows = [(i, i % 2 if i % 5 else None, "old") for i in range(50)]
        df = spark.createDataFrame(rows, "k long, p int, tag string")
        d = str(tmp_path / "ownull")
        mtable_create(spark, df, d, partition_by=["p"])
        n_null = sum(1 for _k, p, _t in rows if p is None)
        assert n_null  # fixture sanity
        batch = spark.createDataFrame(
            [(900, None, "new"), (901, None, "new")], "k long, p int, tag string"
        )
        mtable_overwrite_partitions(spark, d, batch)
        got = mtable_read(spark, d)
        nulls = got.where(F.col("p").isNull()).collect()
        assert {r["k"] for r in nulls} == {900, 901}
        assert all(r["tag"] == "new" for r in nulls)
        assert got.where(F.col("p").isNotNull()).count() == 50 - n_null


class TestMtableSinkPartitionOverwrite:
    """Round 16: the recompute-a-partition-per-batch sink
    (``mtable_sink(partition_overwrite=True)`` — Structured Streaming's
    foreachBatch + replaceWhere pattern): each micro-batch atomically
    replaces exactly the partition values it carries, under the sink's
    exactly-once epoch watermark."""

    def test_overwrite_sink_cycle(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_sink,
        )

        d = str(tmp_path / "owsink")
        base = spark.createDataFrame(
            [(i, i % 3, "seed") for i in range(90)], "k long, p int, tag string"
        )
        mtable_create(spark, base, d, partition_by=["p"])
        sink = mtable_sink(spark, d, partition_overwrite=True)
        # epoch 0 recomputes partition 1
        sink(
            spark.createDataFrame(
                [(1000, 1, "v0"), (1001, 1, "v0")], "k long, p int, tag string"
            ),
            0,
        )
        got = mtable_read(spark, d)
        assert got.where(F.col("p") == 1).count() == 2
        assert got.where(F.col("p") != 1).count() == 60
        # epoch 1 recomputes it again: last write wins, wholesale
        sink(
            spark.createDataFrame(
                [(2000, 1, "v1")], "k long, p int, tag string"
            ),
            1,
        )
        got = mtable_read(spark, d)
        assert {r["k"] for r in got.where(F.col("p") == 1).collect()} == {2000}
        v = read_manifest(d)["version"]
        # a REPLAYED epoch is a no-op (crash-recovery contract)
        sink(
            spark.createDataFrame(
                [(2000, 1, "v1")], "k long, p int, tag string"
            ),
            1,
        )
        assert read_manifest(d)["version"] == v
        # empty micro-batch is a no-op
        sink(spark.createDataFrame([], "k long, p int, tag string"), 2)
        assert read_manifest(d)["version"] == v
        assert read_manifest(d)["epoch_watermark"] == 1

    def test_overwrite_sink_refusals(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_sink,
        )

        with pytest.raises(ValueError, match="append shape only"):
            mtable_sink(spark, str(tmp_path / "x"), key="k", partition_overwrite=True)
        # table must pre-exist with a spec
        d = str(tmp_path / "owsink2")
        sink = mtable_sink(spark, d, partition_overwrite=True)
        with pytest.raises(ValueError, match="created first with a partition spec"):
            sink(
                spark.createDataFrame([(1, 1, "x")], "k long, p int, tag string"),
                0,
            )
        # an unpartitioned pre-created table refuses through the op
        dflat = str(tmp_path / "owsink3")
        mtable_create(
            spark,
            spark.createDataFrame([(1, 1, "x")], "k long, p int, tag string"),
            dflat,
        )
        sink2 = mtable_sink(spark, dflat, partition_overwrite=True)
        with pytest.raises(ValueError, match="no partition spec"):
            sink2(
                spark.createDataFrame([(2, 1, "y")], "k long, p int, tag string"),
                0,
            )


class TestMtableDataSkippingRead:
    """Round 16: stats/bloom file pruning on the READ path
    (mtable_read_pruned) — the data-skipping move that turns a point or
    range query on a clustered table from scan-every-file into
    scan-the-matching-files, with result equality to the unpruned
    filtered read pinned."""

    def test_range_read_prunes_clustered_files(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import (
            _skip_files,
            mtable_read_pruned,
            read_manifest,
        )

        man = read_manifest(table)
        kept, n_stats, n_bloom = _skip_files(
            spark, table, man, {"k": (100, 199)}
        )
        assert n_stats > 0 and len(kept) < len(man["files"])
        got = mtable_read_pruned(spark, table, {"k": (100, 199)})
        want = mtable_read(spark, table).where(
            (F.col("k") >= 100) & (F.col("k") <= 199)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert got.count() == 100

    def test_point_read_and_open_bounds(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_read_pruned,
        )

        got = mtable_read_pruned(spark, table, {"k": 42})
        assert [(r["k"], r["v"]) for r in got.collect()] == [(42, 420)]
        hi_only = mtable_read_pruned(spark, table, {"k": (900, None)})
        assert hi_only.count() == 100
        lo_only = mtable_read_pruned(spark, table, {"k": (None, 99)})
        assert lo_only.count() == 100

    def test_bloom_refutes_point_on_unclustered_table(self, spark, tmp_path):
        """Unclustered bloom table: every file's k-range spans the
        whole domain (stats skip nothing), the bitsets do the work."""
        from w4h_etl_container_spark.pipeline.mtable import (
            _skip_files,
            mtable_create,
            mtable_read_pruned,
            read_manifest,
        )

        df = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        ).repartition(8)  # round-robin: every file spans the domain
        d = str(tmp_path / "skipbloom")
        mtable_create(spark, df, d, bloom_keys=["k"])
        man = read_manifest(d)
        kept, n_stats, n_bloom = _skip_files(spark, d, man, {"k": 777})
        assert n_stats == 0  # ranges refute nothing here
        assert n_bloom > 0 and len(kept) < len(man["files"])
        got = mtable_read_pruned(spark, d, {"k": 777})
        assert [(r["k"], r["v"]) for r in got.collect()] == [(777, 5439)]

    def test_pruned_read_sees_deletion_vectors(self, spark, table):
        """Pruning composes with MOR deletes: a DV-shadowed row stays
        deleted through the pruned read."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_read_pruned,
        )

        mtable_delete(
            spark, table,
            spark.createDataFrame([(150,)], "k long"), "k", mode="mor",
        )
        got = mtable_read_pruned(spark, table, {"k": (100, 199)})
        assert got.count() == 99
        assert got.where(F.col("k") == 150).count() == 0

    def test_time_travel_composition(self, spark, table):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_read_pruned,
        )

        man1 = mtable_merge(
            spark, table,
            spark.createDataFrame([(150, -1, "u")], "k long, v long, tag string"),
            "k",
        )
        now = mtable_read_pruned(spark, table, {"k": 150})
        assert [r["v"] for r in now.collect()] == [-1]
        old = mtable_read_pruned(
            spark, table, {"k": 150}, version=man1["version"] - 1
        )
        assert [r["v"] for r in old.collect()] == [1500]

    def test_partition_column_bounds_prune_partitioned_files(
        self, spark, tmp_path
    ):
        """Partition values persist as exact [v,v] stats, so the
        data-skipping read prunes partitioned tables on the partition
        column with zero extra machinery — and data-column bounds
        compose on top."""
        from w4h_etl_container_spark.pipeline.mtable import (
            _skip_files,
            mtable_create,
            mtable_read_pruned,
            read_manifest,
        )

        df = spark.range(0, 400).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"),
            (F.col("id") * 3).alias("v"),
        )
        d = str(tmp_path / "skippart")
        mtable_create(spark, df, d, partition_by=["p"])
        man = read_manifest(d)
        kept, n_stats, _ = _skip_files(spark, d, man, {"p": 2})
        assert len(kept) < len(man["files"]) and n_stats > 0
        assert all("p=2" in f for f in kept)
        got = mtable_read_pruned(spark, d, {"p": 2, "k": (0, 99)})
        want = sorted(
            (k, 2, k * 3) for k in range(0, 100) if k % 4 == 2
        )
        assert sorted(map(tuple, got.select("k", "p", "v").collect())) == want

    def test_in_list_pruning_and_bloom(self, spark, table, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            _skip_files,
            mtable_create,
            mtable_read_pruned,
            read_manifest,
        )

        # clustered table: an IN-list spanning two distant key pockets
        # keeps only the files whose ranges cover a pocket
        man = read_manifest(table)
        kept, n_stats, _ = _skip_files(
            spark, table, man, {"k": [5, 7, 905]}
        )
        assert n_stats > 0 and len(kept) < len(man["files"])
        got = mtable_read_pruned(spark, table, {"k": [5, 7, 905]})
        assert sorted(r["k"] for r in got.collect()) == [5, 7, 905]
        # unclustered bloom table: the tuple-product probes refute
        df = spark.range(0, 1500).select(
            F.col("id").alias("k"), (F.col("id") * 11).alias("v")
        ).repartition(6)
        d = str(tmp_path / "skipin")
        mtable_create(spark, df, d, bloom_keys=["k"])
        man2 = read_manifest(d)
        kept2, ns2, nb2 = _skip_files(spark, d, man2, {"k": [3, 1400]})
        assert ns2 == 0 and nb2 > 0 and len(kept2) < len(man2["files"])
        got2 = mtable_read_pruned(spark, d, {"k": [3, 1400]})
        assert sorted((r["k"], r["v"]) for r in got2.collect()) == [
            (3, 33), (1400, 15400),
        ]
        # refusals: None inside an IN-list, empty IN-list
        with pytest.raises(ValueError, match="None inside the IN-list"):
            mtable_read_pruned(spark, table, {"k": [1, None]})
        with pytest.raises(ValueError, match="empty IN-list"):
            mtable_read_pruned(spark, table, {"k": []})


class TestControlPlaneNoAqe:
    """r17: bounded control-plane collects re-host their plans on the
    no-AQE companion session (``_plan_no_aqe`` / ``_persist_no_aqe``).
    Pin the mechanics: identical results, the parent session's conf
    never mutates, plans really lose their AdaptiveSparkPlan wrapper,
    and the shared CacheManager serves a companion-registered cache to
    the parent-session handle."""

    def test_rehost_result_and_parent_conf(self, spark):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.pipeline.mtable import _plan_no_aqe

        df = spark.range(1000).agg(
            F.count(F.lit(1)).alias("n"), F.max("id").alias("mx")
        )
        out = _plan_no_aqe(df)
        assert out.collect() == df.collect()
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" not in plan

    def test_companion_session_is_reused(self, spark):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.pipeline.mtable import (
            _ctl_session, _plan_no_aqe,
        )

        a = _plan_no_aqe(spark.range(10).agg(F.count(F.lit(1))))
        b = _plan_no_aqe(spark.range(20).agg(F.count(F.lit(1))))
        assert a.sparkSession is b.sparkSession is _ctl_session(spark)
        assert (
            _ctl_session(spark).conf.get("spark.sql.adaptive.enabled")
            == "false"
        )

    def test_persist_no_aqe_shares_cache_with_parent(self, spark):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.pipeline.mtable import _persist_no_aqe

        df = spark.range(500).select(
            "id", (F.col("id") % 7).alias("g")
        ).groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        cached = _persist_no_aqe(df)
        try:
            # materialize through the parent-session handle; the entry
            # registered via the companion session must serve it
            assert cached.count() == 7
            assert cached.storageLevel.useMemory
        finally:
            cached.unpersist()
        assert not cached.storageLevel.useMemory


class TestReadDvLocal:
    """r17: small DV shadows are read on the DRIVER into a
    LocalRelation (zero scan/broadcast-build jobs per DV-bearing read).
    Pin row parity with the executor-side scan and the oversized-gate
    fallback."""

    def test_local_matches_scan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.pipeline.mtable import (
            _read_dv, _read_dv_local, mtable_create, mtable_delete,
            read_manifest,
        )

        t = str(tmp_path / "t")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        mtable_create(spark, df.repartition(2, "k"), t)
        mtable_delete(
            spark, t, spark.range(0, 40, 3).select(F.col("id").alias("k")),
            key="k", mode="mor",
        )
        man = read_manifest(t)
        dv_files = sorted({d for dvs in man["dv"].values() for d in dvs})
        assert dv_files
        local = _read_dv_local(spark, t, dv_files)
        assert local is not None
        got = sorted((r["file"], r["pos"]) for r in local.collect())
        want = sorted(
            (r["file"], r["pos"])
            for r in _read_dv(spark, t, dv_files).collect()
        )
        assert got == want and len(got) == 14  # ceil(40/3) keys deleted

    def test_unreadable_falls_back_to_none(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import _read_dv_local

        assert _read_dv_local(spark, str(tmp_path), ["no-such.parquet"]) is None
