"""Incremental materialized views (pipeline/mview.py) and the merge
extensions they ride on (mtable_merge ``deletes=``/``extra_meta=``,
mtable_changes ``pre_images=``).

The contract under test everywhere: after ANY base-table mutation
sequence, ``mv_refresh`` + ``mv_read`` equals a from-scratch groupBy
over the base's current snapshot — while the refresh itself reads only
the change feed (plus the base for min/max dirty groups)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from w4h_etl_container_spark.pipeline.mtable import (
    mtable_changes,
    mtable_compact,
    mtable_create,
    mtable_delete,
    mtable_merge,
    mtable_read,
    mtable_restore,
    read_manifest,
)
from w4h_etl_container_spark.pipeline.mview import mv_create, mv_read, mv_refresh

AGGS = {
    "n": ("count", "*"),
    "nx": ("count", "x"),
    "sx": ("sum", "x"),
    "ax": ("avg", "x"),
    "mn": ("min", "x"),
    "mx": ("max", "x"),
}


def _base_df(spark, n=1000, null_every=17):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        F.when(F.col("id") % null_every == 0, F.lit(None))
        .otherwise(F.col("id") * 1.0)
        .alias("x"),
    )


def _expected(spark, base_dir, where=None):
    cur = mtable_read(spark, base_dir)
    if where:
        cur = cur.where(where)
    rows = (
        cur.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("x").alias("nx"),
            F.sum("x").alias("sx"),
            F.avg("x").alias("ax"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    )
    return {r["g"]: {k: r[k] for k in AGGS} for r in rows}


def _got(spark, mv_dir):
    return {
        r["g"]: {k: r[k] for k in AGGS} for r in mv_read(spark, mv_dir).collect()
    }


def _assert_parity(spark, base_dir, mv_dir, where=None):
    exp, got = _expected(spark, base_dir, where), _got(spark, mv_dir)
    assert set(exp) == set(got), (sorted(exp), sorted(got))
    for g in exp:
        for k in AGGS:
            e, a = exp[g][k], got[g][k]
            if isinstance(e, float) and isinstance(a, float):
                assert a == pytest.approx(e, rel=1e-12), (g, k, e, a)
            else:
                assert a == e, (g, k, e, a)


class TestMviewBasics:
    def test_create_matches_full_groupby(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark), base)
        rep = mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        assert rep["mv"]["base_version"] == 0
        _assert_parity(spark, base, mv)
        # declared column order survives the manifest JSON round-trip
        assert mv_read(spark, mv).columns == ["g"] + list(AGGS)

    def test_refresh_after_updates_inserts_deletes(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        upd = spark.range(0, 120).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 3.0).alias("x"),
        )
        ins = spark.range(5000, 5040).select(
            F.col("id").alias("k"),
            F.lit(11).cast("long").alias("g"),
            (F.col("id") * 1.0).alias("x"),
        )
        mtable_merge(spark, base, upd.unionByName(ins), key="k")
        rep = mv_refresh(spark, mv)
        assert rep["refreshed"] and rep["base_version"] == 1
        _assert_parity(spark, base, mv)
        # CoW delete wipes the new group entirely; MOR delete clips others
        mtable_delete(
            spark, base, spark.range(5000, 5040).select(F.col("id").alias("k")),
            key="k",
        )
        mtable_delete(
            spark,
            base,
            spark.createDataFrame([(999,), (1,)], "k long"),
            key="k",
            mode="mor",
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_deleted"] == 1
        _assert_parity(spark, base, mv)
        assert 11 not in _got(spark, mv)

    def test_noop_and_metadata_only_refresh(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=300), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        assert mv_refresh(spark, mv) == {"refreshed": False, "base_version": 0}
        # a pure compaction changes files but no rows: the refresh must
        # advance the watermark (metadata-only commit) so the next
        # refresh does not re-diff the compacted snapshot forever
        mtable_compact(spark, base, target_bytes=1 << 30)
        rep = mv_refresh(spark, mv)
        assert rep["refreshed"] and rep["groups_upserted"] == 0
        assert read_manifest(mv)["mv"]["base_version"] == 1
        assert mv_refresh(spark, mv) == {"refreshed": False, "base_version": 1}
        _assert_parity(spark, base, mv)

    def test_sum_count_avg_never_recompute(self, spark, tmp_path):
        """Self-maintainable aggregates must never touch the base: the
        dirty-recompute count stays zero through updates AND deletes."""
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark), base)
        aggs = {"n": ("count", "*"), "sx": ("sum", "x"), "ax": ("avg", "x")}
        mv_create(spark, mv, base, group_by="g", aggs=aggs, key="k")
        upd = spark.range(0, 200).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 5.0).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        mtable_delete(
            spark, base, spark.range(900, 950).select(F.col("id").alias("k")),
            key="k",
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 0
        exp = _expected(spark, base)
        got = {
            r["g"]: r.asDict() for r in mv_read(spark, mv).collect()
        }
        for g, e in exp.items():
            assert got[g]["n"] == e["n"]
            assert got[g]["sx"] == pytest.approx(e["sx"], rel=1e-12)
            assert got[g]["ax"] == pytest.approx(e["ax"], rel=1e-12)

    def test_minmax_dirty_only_on_extremum_removal(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, null_every=10**9), base)
        mv_create(
            spark, mv, base, group_by="g",
            aggs={"mn": ("min", "x"), "mx": ("max", "x")}, key="k",
        )
        # insert-only churn: new values extend extrema, zero recompute
        ins = spark.range(10000, 10070).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.0).alias("x"),
        )
        mtable_merge(spark, base, ins, key="k")
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 0
        _got_mm = {r["g"]: (r["mn"], r["mx"]) for r in mv_read(spark, mv).collect()}
        # delete an interior value (not an extremum of its group): no
        # recompute either — the removal refutation is range-based
        mtable_delete(
            spark, base, spark.createDataFrame([(500,)], "k long"), key="k"
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 0
        # delete the global max: its group must recompute
        mtable_delete(
            spark, base, spark.createDataFrame([(10069,)], "k long"), key="k"
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 1
        _assert_mm = {r["g"]: (r["mn"], r["mx"]) for r in mv_read(spark, mv).collect()}
        exp = _expected(spark, base)
        for g, e in exp.items():
            assert _assert_mm[g] == (e["mn"], e["mx"])

    def test_where_filter(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark), base)
        mv_create(
            spark, mv, base, group_by="g", aggs=AGGS, key="k", where="k % 2 = 0"
        )
        upd = spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 9.0).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv, where="k % 2 = 0")

    def test_refusals(self, spark, tmp_path):
        base = str(tmp_path / "b")
        df = spark.createDataFrame(
            [(1, None, 1.0), (2, 5, 2.0)], "k long, g long, x double"
        )
        mtable_create(spark, df, base)
        with pytest.raises(ValueError, match="NULL in group"):
            mv_create(
                spark, str(tmp_path / "v1"), base, group_by="g",
                aggs={"n": ("count", "*")}, key="k",
            )
        with pytest.raises(ValueError, match="unsupported aggregate"):
            mv_create(
                spark, str(tmp_path / "v2"), base, group_by="k",
                aggs={"n": ("median", "x")}, key="k",
            )
        with pytest.raises(ValueError, match="not an aggregate"):
            mv_create(
                spark, str(tmp_path / "v3"), base, group_by="k",
                aggs={"n": ("sum", "*")}, key="k",
            )
        with pytest.raises(ValueError, match="not a materialized view"):
            mv_refresh(spark, base)

    def test_base_restored_past_watermark_fails_loudly(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=100), base)
        upd = spark.range(0, 10).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.lit(0.5).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        # restore publishes a NEW higher version (v2 = v0's content), so
        # the watermark stays valid and refresh applies the diff back
        mtable_restore(base, 0)
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv)


class TestMviewModelCheck:
    def test_randomized_mutations_stay_parity(self, spark, tmp_path):
        rng = random.Random(20260816)
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=400), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        live_hint = 400
        for step in range(8):
            op = rng.choice(["merge", "delete_cow", "delete_mor", "compact"])
            if op == "merge":
                lo = rng.randrange(0, 600)
                upd = spark.range(lo, lo + rng.randrange(20, 80)).select(
                    F.col("id").alias("k"),
                    (F.col("id") % rng.choice([5, 7, 9])).alias("g"),
                    F.when(F.col("id") % 13 == 0, F.lit(None))
                    .otherwise(F.col("id") * rng.choice([0.5, 1.0, 2.0]))
                    .alias("x"),
                )
                mtable_merge(spark, base, upd, key="k")
                live_hint += 80
            elif op in ("delete_cow", "delete_mor") and live_hint > 100:
                lo = rng.randrange(0, 500)
                keys = spark.range(lo, lo + rng.randrange(5, 40)).select(
                    F.col("id").alias("k")
                )
                # deleting keys that don't exist is a no-op commit
                mtable_delete(
                    spark, base, keys, key="k",
                    mode="cow" if op == "delete_cow" else "mor",
                )
                live_hint -= 40
            else:
                mtable_compact(spark, base, target_bytes=1 << 30)
            if rng.random() < 0.7:
                mv_refresh(spark, mv)
                _assert_parity(spark, base, mv)
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv)


class TestMergeDeletes:
    """mtable_merge(deletes=) — full MERGE INTO in one commit."""

    def test_upsert_and_delete_one_commit(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        upd = spark.createDataFrame([(1, 10.0), (200, 20.0)], "k long, v double")
        dels = spark.createDataFrame([(2,), (3,)], "k long")
        man = mtable_merge(spark, t, upd, key="k", deletes=dels)
        assert man["version"] == 1
        assert man["n_update_keys"] == 2
        assert man["n_delete_keys"] == 2
        out = {r["k"]: r["v"] for r in mtable_read(spark, t).collect()}
        assert out[1] == 10.0 and out[200] == 20.0
        assert 2 not in out and 3 not in out
        assert len(out) == 99  # 100 - 2 deleted + 1 inserted

    def test_mor_mode_shadows_deleted_rows(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        upd = spark.createDataFrame([(1, 10.0)], "k long, v double")
        dels = spark.createDataFrame([(2,)], "k long")
        man = mtable_merge(spark, t, upd, key="k", deletes=dels, mode="mor")
        assert man["files_rewritten"] == 0 and man.get("dv")
        out = {r["k"]: r["v"] for r in mtable_read(spark, t).collect()}
        assert out[1] == 10.0 and 2 not in out and len(out) == 99

    def test_deletes_only_empty_updates(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        empty = df.limit(0)
        dels = spark.createDataFrame([(7,), (8,)], "k long")
        man = mtable_merge(spark, t, empty, key="k", deletes=dels)
        assert man["n_update_keys"] == 0 and man["n_delete_keys"] == 2
        assert mtable_read(spark, t).count() == 48

    def test_overlapping_key_refused(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        upd = spark.createDataFrame([(7, 1.0)], "k long, v double")
        dels = spark.createDataFrame([(7,)], "k long")
        with pytest.raises(ValueError, match="both updates and deletes"):
            mtable_merge(spark, t, upd, key="k", deletes=dels)
        # the refused commit left no version behind
        assert read_manifest(t)["version"] == 0

    def test_deletes_missing_key_column_refused(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        with pytest.raises(ValueError, match="missing key column"):
            mtable_merge(
                spark, t, df.limit(1), key="k",
                deletes=spark.createDataFrame([(1.0,)], "z double"),
            )

    def test_extra_meta_lands_and_reserved_refused(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t, extra_meta={"owner": "mv-suite"})
        assert read_manifest(t)["owner"] == "mv-suite"
        upd = spark.createDataFrame([(1, 9.0)], "k long, v double")
        man = mtable_merge(
            spark, t, upd, key="k", extra_meta={"watermark": 42}
        )
        assert man["watermark"] == 42
        with pytest.raises(ValueError, match="reserved"):
            mtable_merge(spark, t, upd, key="k", extra_meta={"files": []})
        with pytest.raises(ValueError, match="reserved"):
            mtable_create(spark, df, str(tmp_path / "t2"), extra_meta={"op": "x"})


class TestChangesPreImages:
    def test_update_emits_pre_and_post(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(0, 30).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        upd = spark.createDataFrame(
            [(5, 50.0), (100, 1.0)], "k long, v double"
        )
        mtable_merge(spark, t, upd, key="k", deletes=spark.createDataFrame([(6,)], "k long"))
        feed = mtable_changes(spark, t, 0, 1, key="k", pre_images=True)
        rows = {(r["k"], r["_change_type"]): r["v"] for r in feed.collect()}
        assert rows[(5, "update_preimage")] == 5.0
        assert rows[(5, "update_postimage")] == 50.0
        assert rows[(100, "insert")] == 1.0
        assert rows[(6, "delete")] == 6.0
        assert len(rows) == 4
        # default vocabulary unchanged: post-image only
        legacy = mtable_changes(spark, t, 0, 1, key="k")
        lr = {(r["k"], r["_change_type"]): r["v"] for r in legacy.collect()}
        assert lr == {
            (5, "update"): 50.0,
            (100, "insert"): 1.0,
            (6, "delete"): 6.0,
        }

    def test_signed_feed_replays_any_aggregate(self, spark, tmp_path):
        """The property that makes pre-images matter: SUM over
        (sign × value) of the feed equals the between-version delta of
        SUM over the table — for any window."""
        t = str(tmp_path / "t")
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        mtable_create(spark, df, t)
        mtable_merge(
            spark, t,
            spark.range(0, 50).select(
                F.col("id").alias("k"), (F.col("id") * -2.0).alias("v")
            ),
            key="k",
        )
        mtable_delete(
            spark, t, spark.range(150, 180).select(F.col("id").alias("k")),
            key="k", mode="mor",
        )
        feed = mtable_changes(spark, t, 0, 2, key="k", pre_images=True)
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(-1)
        delta = feed.agg(F.sum(sign * F.col("v"))).collect()[0][0]
        s0 = mtable_read(spark, t, version=0).agg(F.sum("v")).collect()[0][0]
        s2 = mtable_read(spark, t, version=2).agg(F.sum("v")).collect()[0][0]
        assert delta == pytest.approx(s2 - s0, rel=1e-12)


class TestMviewStreaming:
    def test_mv_follows_trickling_base(self, spark, tmp_path):
        """The streaming tie-in: an mtable-versions stream drives
        mv_sync_on_changes; after several trickle commits and
        availableNow passes the view equals a full recompute, and a
        replayed pass is a no-op (watermark already advanced)."""
        from w4h_etl_container_spark.streaming.changefeed import (
            MtableVersionsDataSource,
            mv_sync_on_changes,
        )

        spark.dataSource.register(MtableVersionsDataSource)
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        ckpt = str(tmp_path / "ckpt")
        mtable_create(spark, _base_df(spark, n=200), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")

        def run_pass():
            # starting_version=0: the default initial offset is the
            # version current at checkpoint creation, which would skip
            # the first commit (same option every index-sync test uses)
            q = (
                spark.readStream.format("mtable_versions")
                .option("table_dir", base)
                .option("starting_version", "0")
                .load()
                .writeStream.foreachBatch(mv_sync_on_changes(spark, mv))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert not q.isActive

        rng = random.Random(7)
        for i in range(3):
            lo = rng.randrange(0, 300)
            upd = spark.range(lo, lo + 30).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("g"),
                (F.col("id") * (i + 2.0)).alias("x"),
            )
            mtable_merge(spark, base, upd, key="k")
            run_pass()
            _assert_parity(spark, base, mv)
        v_before = read_manifest(mv)["version"]
        run_pass()  # no new base commits: the view must not move
        assert read_manifest(mv)["version"] == v_before
        _assert_parity(spark, base, mv)


class TestMviewPrunedRecompute:
    def test_dirty_recompute_prunes_clustered_base(self, spark, tmp_path):
        """min/max dirty recompute goes through the data-skipping read
        when the dirty set is small: on a base clustered by the group
        column the IN-list bound refutes files at planning (asserted
        via _skip_files), and the refreshed state stays parity."""
        from w4h_etl_container_spark.operators.layout import cluster_by
        from w4h_etl_container_spark.pipeline.mtable import _skip_files

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        df = _base_df(spark, n=2000, null_every=10**9)
        mtable_create(spark, cluster_by(df, ["g"], n_files=7), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        # delete group 3's maximum: exactly one dirty group
        gmax = (
            mtable_read(spark, base)
            .where("g = 3")
            .orderBy(F.col("x").desc())
            .limit(1)
            .collect()[0]["k"]
        )
        mtable_delete(
            spark, base, spark.createDataFrame([(gmax,)], "k long"), key="k"
        )
        # the pruning premise: the dirty group's IN-list refutes files
        man = read_manifest(base)
        kept, n_stats, _nb = _skip_files(spark, base, man, {"g": [3]})
        assert n_stats > 0 and len(kept) < len(man["files"])
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 1
        _assert_parity(spark, base, mv)

    def test_above_cap_falls_back_to_full_scan(self, spark, tmp_path, monkeypatch):
        import w4h_etl_container_spark.pipeline.mview as mview_mod

        monkeypatch.setattr(mview_mod, "_DIRTY_PRUNE_CAP", 0)
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=500, null_every=10**9), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        # delete every group's minimum (k = g for g in 0..6); k=0's x
        # is NULL (0 % null_every == 0 whatever the modulus), and
        # removing a NULL value never dirties min/max — so 6 groups
        # recompute, not 7
        mtable_delete(
            spark, base,
            spark.createDataFrame([(g,) for g in range(7)], "k long"),
            key="k",
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 6
        _assert_parity(spark, base, mv)


class TestMviewComposition:
    def test_mv_over_mv(self, spark, tmp_path):
        """Views compose: a view IS an mtable keyed on its group
        columns, so a second-level rollup can materialize against the
        first view's change feed — base churn flows through refresh
        chains with no special casing."""
        base = str(tmp_path / "b")
        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        df = spark.range(0, 800).select(
            F.col("id").alias("k"),
            (F.col("id") % 40).alias("g"),           # fine grain
            ((F.col("id") % 40) % 5).alias("g5"),    # coarse grain
            (F.col("id") * 1.0).alias("x"),
        )
        mtable_create(spark, df, base)
        # level 1: per-(g, g5) count/sum — its merge key IS (g, g5);
        # level 2: per-g5 rollup of the level-1 STORED sum column,
        # maintained from the level-1 table's own change feed
        mv_create(
            spark, v1, base, group_by=["g", "g5"],
            aggs={"n1": ("count", "*"), "s1": ("sum", "x")}, key="k",
        )
        mv_create(
            spark, v2, v1, group_by="g5",
            aggs={"n2": ("count", "*"), "s2": ("sum", "__s_s1")},
            key=["g", "g5"],
        )
        upd = spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 40).alias("g"),
            ((F.col("id") % 40) % 5).alias("g5"),
            (F.col("id") * 2.0).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, v1)
        rep = mv_refresh(spark, v2)
        assert rep["refreshed"]
        # level-2 parity against a from-scratch rollup of the BASE
        exp = {
            r["g5"]: (r["n2"], r["s2"])
            for r in mtable_read(spark, base)
            .groupBy("g5")
            .agg(
                F.count_distinct("g").alias("n2"), F.sum("x").alias("s2")
            )
            .collect()
        }
        got = {
            r["g5"]: (r["n2"], r["s2"]) for r in mv_read(spark, v2).collect()
        }
        assert set(exp) == set(got)
        for g5, (n2, s2) in exp.items():
            assert got[g5][0] == n2
            assert got[g5][1] == pytest.approx(s2, rel=1e-12)

    def test_maintain_on_view_preserves_definition(self, spark, tmp_path):
        """Compacting the VIEW table must not orphan it from its base:
        the mv metadata rides _carry_schema through maintenance, and a
        post-compaction refresh still applies base churn."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_maintain

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=600), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        for i in range(3):  # a few refresh commits → small files
            upd = spark.range(i * 50, i * 50 + 50).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("g"),
                (F.col("id") * (i + 2.0)).alias("x"),
            )
            mtable_merge(spark, base, upd, key="k")
            mv_refresh(spark, mv)
        mtable_compact(spark, mv, target_bytes=1 << 30)
        assert read_manifest(mv)["mv"]["base_version"] == 3
        upd = spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.lit(123.0).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        rep = mv_refresh(spark, mv)
        assert rep["refreshed"] and rep["base_version"] == 4
        _assert_parity(spark, base, mv)
        mtable_maintain(spark, mv)
        assert read_manifest(mv)["mv"]["base_version"] == 4
        _assert_parity(spark, base, mv)


class TestMergeDeletesConcurrency:
    def test_threaded_disjoint_merge_deletes_rebase(self, spark, tmp_path):
        """mtable_merge(deletes=) under REAL thread interleaving: four
        partition-disjoint writers each commit update+delete batches
        with retries; every update lands exactly once and every delete
        removes exactly its keys — the rebase key box spans BOTH key
        sets, so disjoint writers serialize at manifest speed and no
        delete resurrects or update vanishes."""
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
                for c in range(4):
                    # update one in-partition key, delete another
                    # (both ≡ p mod 4, disjoint from other writers and
                    # from each other across iterations)
                    upd = spark.createDataFrame(
                        [(8 * c + p, p, 1000 * p + c)], "k long, p int, v long"
                    )
                    dels = spark.createDataFrame(
                        [(8 * c + 4 + p, p)], "k long, p int"
                    )
                    M.mtable_merge(
                        spark, d, upd, ["p", "k"], deletes=dels, retries=16
                    )
            except Exception as e:  # pragma: no cover - failure detail
                errors.append((p, repr(e)))

        threads = [threading.Thread(target=writer, args=(p,)) for p in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        out = {r["k"]: r["v"] for r in mtable_read(spark, d).collect()}
        assert len(out) == 400 - 16  # 4 writers × 4 deletes
        for p in range(4):
            for c in range(4):
                assert out[8 * c + p] == 1000 * p + c  # update landed
                assert 8 * c + 4 + p not in out        # delete landed


class TestMviewRobustness:
    def test_base_schema_evolution_mid_view(self, spark, tmp_path):
        """A base column ADDED after the view exists must not disturb
        refresh: the feed reads both sides under the newer schema and
        the delta aggregates touch only the view's declared columns."""
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=300), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        evolved = spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 4.0).alias("x"),
            F.lit("tagged").alias("note"),   # NEW column
        )
        mtable_merge(spark, base, evolved, key="k", schema_evolution=True)
        rep = mv_refresh(spark, mv)
        assert rep["refreshed"]
        _assert_parity(spark, base, mv)

    def test_base_vacuumed_past_watermark_fails_loudly(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_vacuum

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=200), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        for i in range(3):
            upd = spark.range(i * 20, i * 20 + 20).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("g"),
                (F.col("id") * (i + 2.0)).alias("x"),
            )
            mtable_merge(spark, base, upd, key="k")
        # drop everything but the newest version: the watermark (v0) is
        # no longer diffable — the refresh must fail loudly, not apply
        # a partial window
        mtable_vacuum(base, retain_versions=1, grace_seconds=0)
        v_before = read_manifest(mv)["version"]
        with pytest.raises(Exception):
            mv_refresh(spark, mv)
        assert read_manifest(mv)["version"] == v_before  # nothing committed


class TestMviewKmv:
    """Approximate count-distinct as a maintainable aggregate: the
    stored k-min state must equal a from-scratch sketch BIT FOR BIT
    after any refresh (k-min sets are union-maintainable over a
    deterministic hash), and removals dirty a group only when the
    removed hash could sit inside the state."""

    @staticmethod
    def _state(spark, mv_dir):
        return {
            r["g"]: tuple(r["__kmv_du"])
            for r in mtable_read(spark, mv_dir).select("g", "__kmv_du").collect()
        }

    @staticmethod
    def _recompute(spark, base_dir):
        from w4h_etl_container_spark.pipeline.mview import (
            _KMV_K,
            _kmv_hash,
        )

        rows = (
            mtable_read(spark, base_dir)
            .groupBy("g")
            .agg(
                F.slice(
                    F.array_sort(F.collect_set(_kmv_hash("val"))), 1, _KMV_K
                ).alias("s")
            )
            .collect()
        )
        return {r["g"]: tuple(r["s"]) for r in rows}

    def _base(self, spark, n=2000):
        return spark.range(0, n).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") % 97).alias("val"),   # heavy value duplication
        )

    def test_state_equals_recompute_through_churn(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, self._base(spark), base)
        mv_create(
            spark, mv, base, group_by="g", aggs={"du": ("kmv", "val")}, key="k"
        )
        assert self._state(spark, mv) == self._recompute(spark, base)
        # insert-only churn: fresh values extend the sketch, no dirty
        ins = spark.range(10000, 10200).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") % 397 + 1000).alias("val"),
        )
        mtable_merge(spark, base, ins, key="k")
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 0
        assert self._state(spark, mv) == self._recompute(spark, base)
        # removals: values are heavily duplicated, so a deleted row's
        # value usually survives in other rows — the sketch must NOT
        # change for those, and must recompute when an in-state hash's
        # last holder goes away; state-vs-recompute equality covers both
        mtable_delete(
            spark, base, spark.range(0, 300, 3).select(F.col("id").alias("k")),
            key="k", mode="mor",
        )
        mv_refresh(spark, mv)
        assert self._state(spark, mv) == self._recompute(spark, base)
        # update churn (pre-image removal + post-image insert)
        upd = spark.range(300, 500).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") % 53 + 5000).alias("val"),
        )
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, mv)
        assert self._state(spark, mv) == self._recompute(spark, base)

    def test_estimate_quality_and_exact_below_k(self, spark, tmp_path):
        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        # group 0: 10 distinct values (< K=32, estimate must be EXACT);
        # group 1: 500 distinct values (~±20% at K=32)
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            (F.col("id") < 500).cast("long").alias("g"),
            F.when(F.col("id") < 500, F.col("id") % 10)
            .otherwise(500 + F.col("id"))
            .alias("val"),
        )
        mtable_create(spark, df, base)
        mv_create(
            spark, mv, base, group_by="g", aggs={"du": ("kmv", "val")}, key="k"
        )
        got = {r["g"]: r["du"] for r in mv_read(spark, mv).collect()}
        assert got[1] == 10.0   # g=1 ⇔ id<500 ⇔ val = id % 10
        assert 500 * 0.5 < got[0] < 500 * 2.0


class TestMviewZeroJobStamp:
    def test_metadata_only_base_commit_skips_the_feed(
        self, spark, tmp_path, monkeypatch
    ):
        """A base commit that moved no bytes (set-checks here; spec
        changes and empty-feed commits likewise) must advance the
        view's watermark WITHOUT reading a feed — manifest identity is
        decidable on the driver. The monkeypatch makes any feed read
        loud."""
        from w4h_etl_container_spark.pipeline.mtable import mtable_set_checks
        import w4h_etl_container_spark.pipeline.mtable as mtable_mod

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=200), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        mtable_set_checks(spark, base, {"key_pos": "k >= 0"})

        def _no_feed(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("metadata-only window read the feed")

        # the refresh consumes the counted feed from the mtable module
        # (r17) — make any feed construction loud
        monkeypatch.setattr(mtable_mod, "_changes_counted", _no_feed)
        rep = mv_refresh(spark, mv)
        assert rep == {
            "refreshed": True,
            "base_version": 1,
            "groups_upserted": 0,
            "groups_deleted": 0,
            "groups_recomputed": 0,
        }
        assert read_manifest(mv)["mv"]["base_version"] == 1
        monkeypatch.undo()
        _assert_parity(spark, base, mv)

    def test_row_preserving_op_chain_skips_the_feed(
        self, spark, tmp_path, monkeypatch
    ):
        """A refresh window containing ONLY row-preserving ops
        (compaction here — rewritten files, identical logical rows)
        must stamp the watermark from the op chain alone (r17): no
        feed plan is built, no Spark job diffs the rewritten files.
        A window that also contains a row-changing op must still take
        the real feed path."""
        import w4h_etl_container_spark.pipeline.mtable as mtable_mod
        from w4h_etl_container_spark.pipeline.mtable import mtable_merge

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=200), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        # churn so the compaction below actually rewrites (files differ)
        upd = _base_df(spark, n=40)
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, mv)
        mtable_compact(spark, base, target_bytes=1 << 30)

        def _no_feed(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("row-preserving window read the feed")

        monkeypatch.setattr(mtable_mod, "_changes_counted", _no_feed)
        rep = mv_refresh(spark, mv)
        assert rep["refreshed"] and rep["groups_upserted"] == 0
        assert read_manifest(mv)["mv"]["base_version"] == read_manifest(
            base
        )["version"]
        monkeypatch.undo()
        _assert_parity(spark, base, mv)
        # mixed window (compact + merge): the real feed must run
        mtable_compact(spark, base, target_bytes=1 << 30)
        upd2 = _base_df(spark, n=60)
        mtable_merge(spark, base, upd2, key="k")
        rep2 = mv_refresh(spark, mv)
        assert rep2["refreshed"]
        _assert_parity(spark, base, mv)


class TestMviewPartitionedBase:
    def test_refresh_over_partitioned_base(self, spark, tmp_path):
        """A hive-partitioned base (partition col = the group col) is
        the best case for the MV: the feed diffs only churned files,
        and a dirty recompute's IN-list bound is refuted by the
        path-borne [v,v] partition stats before any footer read."""
        from w4h_etl_container_spark.pipeline.mtable import _skip_files

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        df = _base_df(spark, n=1200, null_every=10**9)
        mtable_create(spark, df, base, partition_by=["g"])
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        man = read_manifest(base)
        kept, n_stats, _ = _skip_files(spark, base, man, {"g": [3]})
        assert n_stats > 0 and len(kept) < len(man["files"])
        # delete group 3's max (dirty) and some interior keys
        gmax = (
            mtable_read(spark, base)
            .where("g = 3")
            .orderBy(F.col("x").desc())
            .limit(1)
            .collect()[0]["k"]
        )
        mtable_delete(
            spark, base,
            spark.createDataFrame([(gmax,), (10,), (11,)], "k long"),
            key="k",
        )
        rep = mv_refresh(spark, mv)
        assert rep["groups_recomputed"] == 1
        _assert_parity(spark, base, mv)
        # and a plain update pass stays parity too
        upd = spark.range(100, 160).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 9.0).alias("x"),
        )
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv)


class TestMviewConcurrentBaseWriters:
    def test_refresh_loop_beside_live_writers_converges(self, spark, tmp_path):
        """REAL interleaving: two threads churn the base (partition-
        disjoint keys, retries on) while a third refreshes the view in
        a loop. Mid-flight refreshes see consistent snapshots (feed
        endpoints are pinned versions), and once the writers stop, one
        final refresh lands exact parity."""
        import threading

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=400), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        errors = []
        stop = threading.Event()

        def writer(side):
            try:
                for c in range(5):
                    lo = side * 1000 + c * 40
                    upd = spark.range(lo, lo + 40).select(
                        F.col("id").alias("k"),
                        (F.col("id") % 7).alias("g"),
                        (F.col("id") * (c + 1.5)).alias("x"),
                    )
                    mtable_merge(spark, base, upd, key="k", retries=16)
            except Exception as e:  # pragma: no cover
                errors.append(("writer", side, repr(e)))

        def refresher():
            try:
                while not stop.is_set():
                    mv_refresh(spark, mv)
            except Exception as e:  # pragma: no cover
                errors.append(("refresher", repr(e)))

        threads = [
            threading.Thread(target=writer, args=(s,)) for s in (1, 2)
        ] + [threading.Thread(target=refresher)]
        for t in threads:
            t.start()
        for t in threads[:2]:
            t.join()
        stop.set()
        threads[2].join()
        assert not errors, errors
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv)
        assert read_manifest(mv)["mv"]["base_version"] == read_manifest(base)[
            "version"
        ]


class TestMviewUnderBaseAlters:
    def test_rename_of_unused_column_is_invisible(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_rename_column,
        )

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=300), base)
        mtable_add_columns(spark, base, {"note": ("string", "n/a")})
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        mtable_rename_column(spark, base, "note", "remark")
        upd = spark.range(0, 40).selectExpr(
            "id AS k", "id % 7 AS g", "CAST(id * 2 AS DOUBLE) AS x",
            "'real' AS remark",
        )
        mtable_merge(spark, base, upd, key="k")
        mv_refresh(spark, mv)
        _assert_parity(spark, base, mv)

    def test_rename_of_view_column_fails_loudly_not_silently(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_rename_column,
        )

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        mtable_create(spark, _base_df(spark, n=300), base)
        mv_create(spark, mv, base, group_by="g", aggs=AGGS, key="k")
        mtable_rename_column(spark, base, "x", "y")
        upd = spark.range(0, 20).selectExpr(
            "id AS k", "id % 7 AS g", "CAST(id * 3 AS DOUBLE) AS y"
        )
        mtable_merge(spark, base, upd, key="k")
        v_before = read_manifest(mv)["version"]
        with pytest.raises(Exception):
            mv_refresh(spark, mv)   # the view's spec names 'x'
        assert read_manifest(mv)["version"] == v_before  # nothing committed

    def test_widen_of_view_column_refused_no_silent_truncation(
        self, spark, tmp_path
    ):
        """The silent-corruption hole this check closes: base widens a
        summed int column to double, churn adds FRACTIONAL values; an
        unchecked refresh would cast the widened delta back to the
        stored long state and truncate. The refresh must refuse."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_widen_column,
        )

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        df = spark.range(0, 200).selectExpr(
            "id AS k", "id % 7 AS g", "CAST(id AS INT) AS v"
        )
        mtable_create(spark, df, base)
        mv_create(
            spark, mv, base, group_by="g",
            aggs={"sv": ("sum", "v")}, key="k",
        )
        mtable_widen_column(spark, base, "v", "double")
        upd = spark.createDataFrame([(5, 5, 5.5)], "k long, g long, v double")
        mtable_merge(spark, base, upd, key="k")
        v_before = read_manifest(mv)["version"]
        with pytest.raises(ValueError, match="changed from"):
            mv_refresh(spark, mv)
        assert read_manifest(mv)["version"] == v_before
