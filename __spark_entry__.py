"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operator implementations live in :mod:`filefilter_spark`; this
module only delegates to the query registry
(``filefilter_spark/queries/registry.py``), where every SURVEY.md §2
operator id is declared as a (Spark builder, DuckDB oracle) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (OP-B12, TPC-H Q1 shape) on sf0.001 lineitem."""
    from filefilter_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    return REGISTRY["OP-B12"].builder(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from filefilter_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    from filefilter_spark.queries.registry import all_oracles

    return all_oracles()
