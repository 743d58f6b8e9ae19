"""Data-layout operator (operators/layout.py): the written files must
actually be skippable — disjoint leading-key ranges across files and
ordered row groups inside them, verified on real parquet metadata."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

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
