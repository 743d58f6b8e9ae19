from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from w4h_etl_container_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def grid_dir(tmp_path_factory) -> str:
    """Family-2 weather-grid fixtures (FIXTURES.md), generated once."""
    from w4h_etl_container_spark.sources.gridgen import write_all

    out = tmp_path_factory.mktemp("grid")
    write_all(str(out))
    return str(out)
