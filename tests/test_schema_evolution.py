"""Schema evolution at the parquet boundary (session.read_table_evolved):
a long-lived table accumulates files written by different pipeline
generations; reads must see the union schema deterministically, with
pre-evolution files NULL-filling the added columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def evolved_dir(spark, tmp_path):
    d = str(tmp_path / "evolved")
    # generation 1: no 'lang' column
    spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(d)
    # generation 2: 'lang' added
    spark.createDataFrame(
        [(3, "gamma doc", "en"), (4, "delta doc", "de")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.mode("append").parquet(d)
    return d


class TestSchemaEvolution:
    def test_union_schema_with_null_fill(self, spark, evolved_dir):
        from w4h_etl_container_spark.session import read_table_evolved

        df = read_table_evolved(spark, evolved_dir)
        assert set(df.columns) == {"doc_id", "text", "lang"}
        rows = {r["doc_id"]: r["lang"] for r in df.collect()}
        assert rows == {1: None, 2: None, 3: "en", 4: "de"}

    def test_widening_also_fails_loudly(self, spark, tmp_path):
        # Spark's parquet merge refuses ANY changed column type — even
        # int32 → int64 widening (a drifted history needs an explicit
        # migration rewrite, not a silent cast)
        from w4h_etl_container_spark.session import read_table_evolved

        d = str(tmp_path / "widen")
        spark.createDataFrame([(1, 10)], "doc_id long, n int").coalesce(1).write.mode(
            "append"
        ).parquet(d)
        spark.createDataFrame([(2, 2**40)], "doc_id long, n long").coalesce(
            1
        ).write.mode("append").parquet(d)
        with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS|[Mm]erg"):
            read_table_evolved(spark, d).collect()

    def test_incompatible_types_fail_loudly(self, spark, tmp_path):
        from w4h_etl_container_spark.session import read_table_evolved

        d = str(tmp_path / "clash")
        spark.createDataFrame([(1, 5)], "doc_id long, v int").coalesce(1).write.mode(
            "append"
        ).parquet(d)
        spark.createDataFrame([(2, "five")], "doc_id long, v string").coalesce(
            1
        ).write.mode("append").parquet(d)
        with pytest.raises(Exception, match="[Mm]erge|[Ss]chema|incompatible|Failed"):
            read_table_evolved(spark, d).collect()

    def test_unmerged_read_drops_column_silently(self, spark, evolved_dir):
        # the hazard read_table_evolved exists to prevent: a plain read
        # takes ONE footer's schema — whether 'lang' survives depends on
        # file order. Assert the union is NOT guaranteed without merge
        # (either outcome may occur; what must hold is that the merged
        # read is a superset of the plain read)
        from w4h_etl_container_spark.session import read_table_evolved

        plain_cols = set(spark.read.parquet(evolved_dir).columns)
        merged_cols = set(read_table_evolved(spark, evolved_dir).columns)
        assert plain_cols <= merged_cols
        assert "lang" in merged_cols


class TestMigrateTable:
    """migrate_table: the explicit rewrite read_table_evolved's
    type-change refusal prescribes — declared casts, loud lossiness."""

    def _drifted(self, spark, tmp_path):
        """Two generations: v is int32 in gen A, string in gen B (the
        drift mergeSchema refuses), and gen B adds a column."""
        d = str(tmp_path / "drifted")
        import os

        os.makedirs(d)
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k long, v int"
        ).coalesce(1).write.parquet(str(tmp_path / "genA"))
        spark.createDataFrame(
            [(3, "30", "x"), (4, "oops", "y")], "k long, v string, extra string"
        ).coalesce(1).write.parquet(str(tmp_path / "genB"))
        import shutil

        i = 0
        for g in ("genA", "genB"):
            for f in os.listdir(str(tmp_path / g)):
                if f.endswith(".parquet"):
                    shutil.copy(str(tmp_path / g / f), os.path.join(d, f"part-{i}.parquet"))
                    i += 1
        return d

    def test_merged_read_refuses_then_migration_fixes(self, spark, tmp_path):
        from w4h_etl_container_spark.session import migrate_table, read_table_evolved

        d = self._drifted(spark, tmp_path)
        with pytest.raises(Exception):
            read_table_evolved(spark, d).collect()
        out = str(tmp_path / "migrated")
        # "oops" cannot cast to bigint → strict refuses with the count
        with pytest.raises(ValueError, match="lossy"):
            migrate_table(spark, d, out, {"v": "bigint"})
        # opt in to the lossy cast
        man = migrate_table(spark, d, out, {"v": "bigint"}, strict=False)
        assert man["rows"] == 4 and man["lossy_nulls"] == {"v": 1}
        back = spark.read.parquet(out)
        got = {r["k"]: (r["v"], r["extra"]) for r in back.collect()}
        assert got == {1: (10, None), 2: (20, None), 3: (30, "x"), 4: (None, "y")}
        # and the migrated table now merges cleanly
        assert read_table_evolved(spark, out).count() == 4

    def test_lossless_migration_strict_passes(self, spark, tmp_path):
        from w4h_etl_container_spark.session import migrate_table

        d = self._drifted(spark, tmp_path)
        out = str(tmp_path / "m2")
        # cast to string loses nothing in either generation
        man = migrate_table(spark, d, out, {"v": "string"})
        assert man["lossy_nulls"] == {"v": 0}
        vs = {r["v"] for r in spark.read.parquet(out).collect()}
        assert vs == {"10", "20", "30", "oops"}


class TestDropColumns:
    """mtable_drop_columns — metadata-only ALTER TABLE DROP COLUMN."""

    def _table(self, spark, tmp_path, **kw):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 200).selectExpr(
            "id AS k", "id % 7 AS g", "CAST(id AS DOUBLE) AS x",
            "CONCAT('v', id) AS note",
        )
        d = str(tmp_path / "t")
        mtable_create(spark, df, d, **kw)
        return d

    def test_drop_is_metadata_only_and_time_travel_correct(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_drop_columns,
            mtable_read,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        files_before = read_manifest(d)["files"]
        man = mtable_drop_columns(spark, d, "note")
        assert man["files"] == files_before            # zero data motion
        assert man["dropped"] == ["note"]
        assert mtable_read(spark, d).columns == ["k", "g", "x"]
        # era-correct time travel: the pre-drop version still sees it
        assert "note" in mtable_read(spark, d, version=0).columns
        # stats for the dropped column were shed
        for st in (man.get("file_stats") or {}).values():
            assert "note" not in (st or {})

    def test_post_drop_write_paths_work(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_drop_columns,
            mtable_merge,
            mtable_read,
        )
        from pyspark.sql import functions as F

        d = self._table(spark, tmp_path)
        mtable_drop_columns(spark, d, ["note"])
        upd = spark.createDataFrame(
            [(5, 5, 500.0), (1000, 1, 1.5)], "k long, g long, x double"
        )
        mtable_merge(spark, d, upd, key="k")
        out = {r["k"]: r["x"] for r in mtable_read(spark, d).collect()}
        assert out[5] == 500.0 and out[1000] == 1.5 and len(out) == 201
        # compaction rewrites under the narrowed schema: the dropped
        # column's bytes physically disappear from the new files
        mtable_compact(spark, d, target_bytes=1 << 30)
        import pyarrow.parquet as pq
        import os as _os

        from w4h_etl_container_spark.pipeline.mtable import read_manifest

        for f in read_manifest(d)["files"]:
            cols = pq.ParquetFile(_os.path.join(d, f)).schema_arrow.names
            assert "note" not in cols

    def test_changefeed_across_drop_is_empty(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_drop_columns,
        )

        d = self._table(spark, tmp_path)
        mtable_drop_columns(spark, d, "note")
        # the drop changed no ROW facts: both sides read under the new
        # schema and cancel to an empty feed
        assert mtable_changes(spark, d, 0, 1, key="k").count() == 0

    def test_refusals(self, spark, tmp_path):
        import pytest as _pytest

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_drop_columns,
            mtable_set_checks,
        )

        d = self._table(spark, tmp_path, partition_by=["g"], bloom_keys=["k"])
        with _pytest.raises(ValueError, match="partition"):
            mtable_drop_columns(spark, d, "g")
        with _pytest.raises(ValueError, match="bloom"):
            mtable_drop_columns(spark, d, "k")
        with _pytest.raises(ValueError, match="not in the table schema"):
            mtable_drop_columns(spark, d, "nope")
        with _pytest.raises(ValueError, match="every column"):
            mtable_drop_columns(spark, d, ["k", "g", "x", "note"])
        mtable_set_checks(spark, d, {"x_pos": "x >= 0"})
        with _pytest.raises(ValueError, match="CHECK"):
            mtable_drop_columns(spark, d, "x")
        # and the allowed one still goes through on this guarded table
        man = mtable_drop_columns(spark, d, "note")
        assert man["dropped"] == ["note"]


class TestAddColumnsWithDefaults:
    """mtable_add_columns — metadata-only ADD COLUMN ... DEFAULT with
    era-correct fills (only files that predate the column take the
    default; later files' bytes — including real NULLs — are law)."""

    def _table(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 150).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x")
        d = str(tmp_path / "t")
        mtable_create(spark, df, d)
        return d

    def test_era_fill_real_null_and_materialization(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_changes,
            mtable_compact,
            mtable_merge,
            mtable_read,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        man = mtable_add_columns(
            spark, d, {"tier": ("string", "bronze"), "score": ("double", 0.5)}
        )
        assert man["files"] == read_manifest(d, 0)["files"]  # zero motion
        assert mtable_changes(spark, d, 0, 1, key="k").count() == 0
        got = {r["k"]: (r["tier"], r["score"]) for r in mtable_read(spark, d).collect()}
        assert got[7] == ("bronze", 0.5)
        # post-add write: real values and a REAL NULL both survive
        upd = spark.createDataFrame(
            [(7, 7.0, None, 9.9), (500, 1.0, "gold", 1.0)],
            "k long, x double, tier string, score double",
        )
        mtable_merge(spark, d, upd, key="k")
        got = {r["k"]: (r["tier"], r["score"]) for r in mtable_read(spark, d).collect()}
        assert got[7] == (None, 9.9)
        assert got[500] == ("gold", 1.0)
        assert got[8] == ("bronze", 0.5)
        # rewrite materializes the default; the era list empties
        mtable_compact(spark, d, target_bytes=1 << 30)
        m = read_manifest(d)
        live = set(m["files"])
        for cd in (m.get("column_defaults") or {}).values():
            assert not (set(cd["files"]) & live)
        got = {r["k"]: (r["tier"], r["score"]) for r in mtable_read(spark, d).collect()}
        assert got[7] == (None, 9.9) and got[8] == ("bronze", 0.5)
        # time travel: pre-add era reads pre-add schema
        assert mtable_read(spark, d, version=0).columns == ["k", "x"]

    def test_fill_through_deletion_vectors(self, spark, tmp_path):
        """The _mt_file-conditional fill path: a MOR delete shadows rows
        of a pre-add file; the surviving rows still take the default."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_delete,
            mtable_read,
        )

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        mtable_delete(
            spark, d, spark.createDataFrame([(3,), (4,)], "k long"),
            key="k", mode="mor",
        )
        got = {r["k"]: r["tier"] for r in mtable_read(spark, d).collect()}
        assert 3 not in got and 4 not in got
        assert got[5] == "bronze" and len(got) == 148

    def test_multi_generation_eras(self, spark, tmp_path):
        """Two adds with a write in between: three eras, each file
        filling exactly the columns it predates."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_merge,
            mtable_read,
        )

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"a": ("long", 1)})
        mtable_merge(
            spark, d,
            spark.createDataFrame([(1000, 1.0, 77)], "k long, x double, a long"),
            key="k",
        )
        mtable_add_columns(spark, d, {"b": ("string", "bee")})
        mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(2000, 2.0, 88, "real")], "k long, x double, a long, b string"
            ),
            key="k",
        )
        got = {r["k"]: (r["a"], r["b"]) for r in mtable_read(spark, d).collect()}
        assert got[5] == (1, "bee")        # predates both
        assert got[1000] == (77, "bee")    # predates b only
        assert got[2000] == (88, "real")   # predates neither

    def test_defaults_in_aggregates_and_mv(self, spark, tmp_path):
        """The fill is plan-level, so every consumer sees it — incl. a
        materialized view built after the add."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_merge,
            mtable_read,
        )
        from w4h_etl_container_spark.pipeline.mview import (
            mv_create,
            mv_read,
            mv_refresh,
        )
        from pyspark.sql import functions as F

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        v = str(tmp_path / "v")
        mv_create(
            spark, v, d, group_by="tier",
            aggs={"n": ("count", "*"), "sx": ("sum", "x")}, key="k",
        )
        mtable_merge(
            spark, d,
            spark.createDataFrame(
                [(9000, 4.0, "gold"), (3, 3.0, "gold")],
                "k long, x double, tier string",
            ),
            key="k",
        )
        mv_refresh(spark, v)
        exp = {
            r["tier"]: (r["n"], r["sx"])
            for r in mtable_read(spark, d)
            .groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
            .collect()
        }
        got = {r["tier"]: (r["n"], r["sx"]) for r in mv_read(spark, v).collect()}
        assert got == exp and set(got) == {"bronze", "gold"}

    def test_drop_of_default_column_sheds_the_era(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_drop_columns,
            mtable_read,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        mtable_drop_columns(spark, d, "tier")
        assert not read_manifest(d).get("column_defaults")
        assert mtable_read(spark, d).columns == ["k", "x"]

    def test_refusals(self, spark, tmp_path):
        import pytest as _pytest

        from w4h_etl_container_spark.pipeline.mtable import mtable_add_columns

        d = self._table(spark, tmp_path)
        with _pytest.raises(ValueError, match="already exists"):
            mtable_add_columns(spark, d, {"x": ("double", 0.0)})
        with _pytest.raises(ValueError, match="cannot parse type"):
            mtable_add_columns(spark, d, {"y": ("no_such_type", 0)})
        with _pytest.raises(ValueError, match="does not cast"):
            mtable_add_columns(spark, d, {"y": ("double", "not-a-number")})
        with _pytest.raises(ValueError, match="JSON-storable"):
            mtable_add_columns(spark, d, {"y": ("double", object())})
        with _pytest.raises(ValueError, match="no columns"):
            mtable_add_columns(spark, d, {})

    def test_partitioned_base_and_skipread_with_default(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_create,
            mtable_read,
            mtable_read_pruned,
        )
        from pyspark.sql import functions as F

        df = spark.range(0, 120).selectExpr(
            "id AS k", "id % 4 AS p", "CAST(id AS DOUBLE) AS x"
        )
        d = str(tmp_path / "tp")
        mtable_create(spark, df, d, partition_by=["p"])
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        got = mtable_read(spark, d).where("p = 2").collect()
        assert got and all(r["tier"] == "bronze" for r in got)
        # data-skipping read on the partition column composes with the
        # era fill (old files have no stats for tier — unprunable on it,
        # but the partition bound prunes and the fill still applies)
        pruned = mtable_read_pruned(spark, d, {"p": 2}).collect()
        assert sorted(r["k"] for r in pruned) == sorted(r["k"] for r in got)
        assert all(r["tier"] == "bronze" for r in pruned)

    def test_feed_preimages_carry_the_era_default(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_changes,
            mtable_merge,
        )

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        upd = spark.createDataFrame(
            [(5, 5.5, "gold")], "k long, x double, tier string"
        )
        mtable_merge(spark, d, upd, key="k")
        feed = {
            (r["k"], r["_change_type"]): r["tier"]
            for r in mtable_changes(spark, d, 1, 2, key="k", pre_images=True)
            .collect()
        }
        # the replaced row lived in a pre-add file: its PRE-image must
        # read the era default, its post-image the real value
        assert feed[(5, "update_preimage")] == "bronze"
        assert feed[(5, "update_postimage")] == "gold"


class TestRenameColumn:
    """mtable_rename_column — metadata-only RENAME with rename eras."""

    def _table(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 150).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS amount", "id % 5 AS g"
        )
        d = str(tmp_path / "t")
        mtable_create(spark, df, d)
        return d

    def test_rename_reads_merges_and_time_travel(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_merge,
            mtable_read,
            mtable_rename_column,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        man = mtable_rename_column(spark, d, "amount", "value")
        assert man["files"] == read_manifest(d, 0)["files"]
        assert mtable_read(spark, d).columns == ["k", "value", "g"]
        assert mtable_changes(spark, d, 0, 1, key="k").count() == 0
        upd = spark.createDataFrame(
            [(5, 555.0, 0), (900, 9.0, 1)], "k long, value double, g long"
        )
        mtable_merge(spark, d, upd, key="k")
        got = {r["k"]: r["value"] for r in mtable_read(spark, d).collect()}
        assert got[5] == 555.0 and got[900] == 9.0 and got[6] == 6.0
        assert mtable_read(spark, d, version=0).columns == ["k", "amount", "g"]
        # stats translated in the same commit: planning on the NEW name
        # still prunes pre-rename files (skip-read proves it end to end)
        from w4h_etl_container_spark.pipeline.mtable import mtable_read_pruned

        assert mtable_read_pruned(spark, d, {"k": (10, 19)}).count() == 10

    def test_chained_rename_and_mor_path(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_delete,
            mtable_merge,
            mtable_read,
            mtable_rename_column,
        )

        d = self._table(spark, tmp_path)
        mtable_rename_column(spark, d, "amount", "value")
        mtable_merge(
            spark, d,
            spark.createDataFrame([(1000, 1.0, 2)], "k long, value double, g long"),
            key="k",
        )
        mtable_rename_column(spark, d, "value", "v2")
        got = {r["k"]: r["v2"] for r in mtable_read(spark, d).collect()}
        assert got[3] == 3.0 and got[1000] == 1.0   # both physical eras
        # deletion-vector scan path on a file still carrying 'amount'
        mtable_delete(
            spark, d, spark.createDataFrame([(3,)], "k long"),
            key="k", mode="mor",
        )
        got = {r["k"]: r["v2"] for r in mtable_read(spark, d).collect()}
        assert 3 not in got and got[4] == 4.0

    def test_compaction_materializes_and_eras_die(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_compact,
            mtable_read,
            mtable_rename_column,
            read_manifest,
        )
        import os as _os
        import pyarrow.parquet as pq

        d = self._table(spark, tmp_path)
        mtable_rename_column(spark, d, "amount", "value")
        mtable_compact(spark, d, target_bytes=1 << 30)
        m = read_manifest(d)
        live = set(m["files"])
        for eras in (m.get("column_renames") or {}).values():
            for e in eras:
                assert not (set(e["files"]) & live)
        for f in m["files"]:
            assert "value" in pq.ParquetFile(
                _os.path.join(d, f)
            ).schema_arrow.names
        assert {r["k"]: r["value"] for r in mtable_read(spark, d).collect()}[
            9
        ] == 9.0

    def test_compose_with_add_default_and_drop(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_drop_columns,
            mtable_read,
            mtable_rename_column,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        mtable_add_columns(spark, d, {"tier": ("string", "bronze")})
        mtable_rename_column(spark, d, "tier", "grade")   # default translates
        got = mtable_read(spark, d).limit(3).collect()
        assert all(r["grade"] == "bronze" for r in got)
        mtable_rename_column(spark, d, "amount", "value")
        mtable_drop_columns(spark, d, "value")            # eras die with it
        m = read_manifest(d)
        assert "value" not in (m.get("column_renames") or {})
        assert mtable_read(spark, d).columns == ["k", "g", "grade"]

    def test_refusals(self, spark, tmp_path):
        import pytest as _pytest

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_create,
            mtable_rename_column,
            mtable_set_checks,
        )

        d = self._table(spark, tmp_path)
        with _pytest.raises(ValueError, match="not in the table schema"):
            mtable_rename_column(spark, d, "nope", "x2")
        with _pytest.raises(ValueError, match="already exists"):
            mtable_rename_column(spark, d, "amount", "g")
        with _pytest.raises(ValueError, match="same name"):
            mtable_rename_column(spark, d, "amount", "amount")
        mtable_set_checks(spark, d, {"amt_pos": "amount >= 0"})
        with _pytest.raises(ValueError, match="CHECK"):
            mtable_rename_column(spark, d, "amount", "value")
        mtable_set_checks(spark, d, {})
        # a historical physical name cannot be resurrected while files
        # still carry it — by rename OR by add
        mtable_rename_column(spark, d, "amount", "value")
        with _pytest.raises(ValueError, match="PHYSICAL name"):
            mtable_rename_column(spark, d, "value", "amount")
        with _pytest.raises(ValueError, match="PHYSICAL name"):
            mtable_add_columns(spark, d, {"amount": ("double", 1.0)})
        # partitioned table: partition column rename refused
        df = spark.range(0, 40).selectExpr("id AS k", "id % 4 AS p", "id AS x")
        d2 = str(tmp_path / "tp")
        mtable_create(spark, df, d2, partition_by=["p"])
        with _pytest.raises(ValueError, match="partition"):
            mtable_rename_column(spark, d2, "p", "p2")

    def test_bloom_keys_translate(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_read,
            mtable_rename_column,
            read_manifest,
        )

        df = spark.range(0, 200).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x")
        d = str(tmp_path / "tb")
        mtable_create(spark, df, d, bloom_keys=["k"])
        mtable_rename_column(spark, d, "k", "key_id")
        assert read_manifest(d)["bloom"]["keys"] == ["key_id"]
        upd = spark.createDataFrame([(5, 50.0)], "key_id long, x double")
        mtable_merge(spark, d, upd, key="key_id")
        got = {r["key_id"]: r["x"] for r in mtable_read(spark, d).collect()}
        assert got[5] == 50.0 and got[6] == 6.0 and len(got) == 200


class TestWidenColumn:
    """mtable_widen_column — metadata-only, widening-only type change."""

    def test_widen_reads_merges_compaction_time_travel(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_compact,
            mtable_create,
            mtable_merge,
            mtable_read,
            mtable_widen_column,
            read_manifest,
        )

        df = spark.range(0, 120).selectExpr(
            "id AS k", "CAST(id AS INT) AS n", "CAST(id AS FLOAT) AS f"
        )
        d = str(tmp_path / "t")
        mtable_create(spark, df, d)
        man = mtable_widen_column(spark, d, "n", "bigint")
        mtable_widen_column(spark, d, "f", "double")
        assert man["files"] == read_manifest(d, 0)["files"]
        sch = {x.name: x.dataType.simpleString() for x in mtable_read(spark, d).schema}
        assert sch["n"] == "bigint" and sch["f"] == "double"
        assert mtable_changes(spark, d, 0, 1, key="k").count() == 0
        # a value only the WIDE type can hold lands via merge
        upd = spark.createDataFrame(
            [(5, 10_000_000_000, 1.5)], "k long, n long, f double"
        )
        mtable_merge(spark, d, upd, key="k")
        got = {r["k"]: (r["n"], r["f"]) for r in mtable_read(spark, d).collect()}
        assert got[5] == (10_000_000_000, 1.5) and got[6] == (6, 6.0)
        mtable_compact(spark, d, target_bytes=1 << 30)
        m = read_manifest(d)
        live = set(m["files"])
        for eras in (m.get("column_widenings") or {}).values():
            for e in eras:
                assert not (set(e["files"]) & live)
        v0 = {x.name: x.dataType.simpleString() for x in mtable_read(spark, d, version=0).schema}
        assert v0["n"] == "int" and v0["f"] == "float"

    def test_widen_mor_and_rename_composition(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_delete,
            mtable_read,
            mtable_rename_column,
            mtable_widen_column,
        )

        df = spark.range(0, 80).selectExpr("id AS k", "CAST(id AS INT) AS n")
        d = str(tmp_path / "t")
        mtable_create(spark, df, d)
        mtable_widen_column(spark, d, "n", "bigint")
        mtable_delete(
            spark, d, spark.createDataFrame([(3,)], "k long"),
            key="k", mode="mor",
        )
        mtable_rename_column(spark, d, "n", "num")  # widen era translates
        got = {r["k"]: r["num"] for r in mtable_read(spark, d).collect()}
        assert 3 not in got and got[4] == 4 and len(got) == 79

    def test_refusals(self, spark, tmp_path):
        import pytest as _pytest

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_widen_column,
        )

        df = spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id AS INT) AS n", "CAST(id % 4 AS INT) AS p"
        )
        d = str(tmp_path / "t")
        mtable_create(spark, df, d, partition_by=["p"])
        with _pytest.raises(ValueError, match="not a safe widening"):
            mtable_widen_column(spark, d, "k", "double")   # long→double lossy
        with _pytest.raises(ValueError, match="not a safe widening"):
            mtable_widen_column(spark, d, "n", "string")
        with _pytest.raises(ValueError, match="not a safe widening"):
            mtable_widen_column(spark, d, "n", "short")    # narrowing
        with _pytest.raises(ValueError, match="already"):
            mtable_widen_column(spark, d, "n", "int")
        with _pytest.raises(ValueError, match="not in the table schema"):
            mtable_widen_column(spark, d, "zz", "bigint")
        with _pytest.raises(ValueError, match="partition column"):
            mtable_widen_column(spark, d, "p", "bigint")
        mtable_widen_column(spark, d, "n", "bigint")  # allowed one works

    def test_bloom_key_widening_refused(self, spark, tmp_path):
        """xxhash64 hashes the TYPED value — widening a bloom key would
        make old bitsets falsely refute; the op must refuse."""
        import pytest as _pytest

        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_widen_column,
        )

        df = spark.range(0, 60).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS DOUBLE) AS x"
        )
        d = str(tmp_path / "tb")
        mtable_create(spark, df, d, bloom_keys=["k"])
        with _pytest.raises(ValueError, match="bloom key"):
            mtable_widen_column(spark, d, "k", "bigint")

    def test_feed_spans_rename_mor_delete_and_merge(self, spark, tmp_path):
        """One feed window covering a rename, a MOR delete of a
        pre-rename row, and a CoW update: pre-images surface under the
        NEW name with the old files' bytes read through their era."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_changes,
            mtable_create,
            mtable_delete,
            mtable_merge,
            mtable_rename_column,
        )
        from pyspark.sql import functions as F

        d = str(tmp_path / "tf")
        df = spark.range(0, 50).selectExpr("id AS k", "CAST(id AS DOUBLE) AS amount")
        mtable_create(spark, df, d)
        mtable_rename_column(spark, d, "amount", "value")
        mtable_delete(
            spark, d, spark.createDataFrame([(3,)], "k long"),
            key="k", mode="mor",
        )
        mtable_merge(
            spark, d,
            spark.createDataFrame([(4, 44.0)], "k long, value double"),
            key="k",
        )
        feed = mtable_changes(spark, d, 0, 3, key="k", pre_images=True)
        rows = sorted((r["k"], r["_change_type"], r["value"]) for r in feed.collect())
        assert rows == [
            (3, "delete", 3.0),
            (4, "update_postimage", 44.0),
            (4, "update_preimage", 4.0),
        ]


class TestZombieColumnAndCloneEras:
    """ADVICE r17: (1) drop-then-re-add must never resurrect pre-drop
    bytes; (2) schema-evolution merges refuse live rename-physical and
    live dropped names; (3) mtable_clone translates ALTER-era file
    lists to the clone's absolute paths (alter-THEN-clone reads)."""

    def _table(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 100).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS x", "CONCAT('v', id) AS note"
        )
        d = str(tmp_path / "zt")
        mtable_create(spark, df, d)
        return d

    def test_drop_then_readd_null_default_masks_old_bytes(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_drop_columns,
            mtable_read,
            read_manifest,
        )

        d = self._table(spark, tmp_path)
        mtable_drop_columns(spark, d, "note")
        assert set(read_manifest(d)["dropped_columns"]) == {"note"}
        # re-add with default=None: old files still carry 'v<id>' bytes,
        # which must NOT resurface
        mtable_add_columns(spark, d, {"note": ("string", None)})
        vals = {r["note"] for r in mtable_read(spark, d).collect()}
        assert vals == {None}
        # a NULL-default era was recorded to mask the zombie bytes
        assert "note" in read_manifest(d)["column_defaults"]

    def test_drop_then_readd_with_default_takes_default(self, spark, tmp_path):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_drop_columns,
            mtable_read,
        )

        d = self._table(spark, tmp_path)
        mtable_drop_columns(spark, d, "note")
        mtable_add_columns(spark, d, {"note": ("string", "fresh")})
        vals = {r["note"] for r in mtable_read(spark, d).collect()}
        assert vals == {"fresh"}

    def test_evolve_refuses_dropped_and_rename_physical_names(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_drop_columns,
            mtable_merge,
            mtable_rename_column,
        )

        d = self._table(spark, tmp_path)
        mtable_drop_columns(spark, d, "note")
        upd = spark.createDataFrame(
            [(1, 1.0, "zombie")], "k long, x double, note string"
        )
        with pytest.raises(ValueError, match="previously DROPPED"):
            mtable_merge(spark, d, upd, "k", schema_evolution=True)
        # rename-era physical name: old files still carry 'x' bytes
        mtable_rename_column(spark, d, "x", "amount")
        upd2 = spark.createDataFrame(
            [(1, 1.0, 2.0)], "k long, amount double, x double"
        )
        with pytest.raises(ValueError, match="PHYSICAL name"):
            mtable_merge(spark, d, upd2, "k", schema_evolution=True)

    def test_alter_then_clone_reads_through_translated_eras(
        self, spark, tmp_path
    ):
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_add_columns,
            mtable_clone,
            mtable_read,
            mtable_rename_column,
            mtable_widen_column,
            read_manifest,
        )

        src = str(tmp_path / "src")
        from w4h_etl_container_spark.pipeline.mtable import mtable_create

        df = spark.range(0, 60).selectExpr(
            "id AS k", "CAST(id AS INT) AS n", "CAST(id AS DOUBLE) AS amount"
        )
        mtable_create(spark, df, src)
        # live eras of all three kinds, all BEFORE the clone
        mtable_rename_column(spark, src, "amount", "value")
        mtable_widen_column(spark, src, "n", "long")
        mtable_add_columns(spark, src, {"tag": ("string", "era")})
        dst = str(tmp_path / "dst")
        mtable_clone(src, dst)
        man = read_manifest(dst)
        # era file lists reference the clone's (absolute) files
        files = set(man["files"])
        for e in man["column_renames"]["value"]:
            assert set(e["files"]) <= files
        for e in man["column_widenings"]["n"]:
            assert set(e["files"]) <= files
        assert set(man["column_defaults"]["tag"]["files"]) <= files
        got = sorted(
            (r["k"], r["n"], r["value"], r["tag"])
            for r in mtable_read(spark, dst).collect()
        )
        want = sorted((i, i, float(i), "era") for i in range(60))
        assert got == want


class TestMviewWhereColumnFingerprint:
    def test_where_only_column_alter_refuses_refresh(self, spark, tmp_path):
        """ADVICE r17 (low): a base rename of a column referenced ONLY
        by the view's WHERE filter must hit the deliberate
        'recreate the view' refusal, not a cryptic analysis error."""
        from w4h_etl_container_spark.pipeline.mtable import (
            mtable_create,
            mtable_merge,
            mtable_rename_column,
        )
        from w4h_etl_container_spark.pipeline.mview import mv_create, mv_refresh

        base, mv = str(tmp_path / "b"), str(tmp_path / "v")
        df = spark.range(0, 100).selectExpr(
            "id AS k", "id % 5 AS g", "CAST(id AS DOUBLE) AS val",
            "id % 2 AS flag",
        )
        mtable_create(spark, df, base)
        mv_create(
            spark, mv, base, group_by="g",
            aggs={"s": ("sum", "val")}, key="k", where="flag = 1",
        )
        mtable_rename_column(spark, base, "flag", "is_odd")
        upd = spark.createDataFrame(
            [(1, 1, 10.0, 1)], "k long, g long, val double, is_odd long"
        )
        mtable_merge(spark, base, upd, "k")
        with pytest.raises(ValueError, match="recreate the view"):
            mv_refresh(spark, mv)
