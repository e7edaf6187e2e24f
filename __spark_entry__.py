"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``ariadne_cartograph_spark``; this module is a
thin adapter over its query catalog (``plans.catalog.REGISTRY``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ariadne_cartograph_spark.plans.catalog import get_oracles, get_queries
from ariadne_cartograph_spark.session import apply_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the TPC-H Q5-style star join
    (multi-way join + broadcast dims + hash aggregate + ordered output).
    """
    apply_runtime_confs(spark)
    from ariadne_cartograph_spark.plans import relational

    return relational.q5_region_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return get_oracles()
