"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-highs/lows pipeline (SURVEY.md §7
Phase A) at sf0.001. ``queries()`` / ``oracle_sql()`` expose the declared
operator inventory from ``w4h_etl_container_spark/plans`` (SURVEY.md §2 IDs
noted on each query's docstring).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from w4h_etl_container_spark.plans.registry import load_all

    q = load_all()["q_daily_highlow"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from w4h_etl_container_spark.plans.registry import load_all

    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-able declared query."""
    from w4h_etl_container_spark.plans.registry import load_all

    return {name: q.sql for name, q in load_all().items() if q.sql is not None}
