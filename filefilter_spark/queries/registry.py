"""Query registry backing ``__spark_entry__.queries()/oracle_sql()``.

Every operator from SURVEY.md §2 is declared here as a QuerySpec:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent DuckDB-runnable oracle SQL string. The
driver hash-compares both at sf0.01 (CORRECTNESS_r{N}.json).

Float determinism contract (why the SQL below looks the way it does):
the driver's value-hash is order-insensitive but exact, and summing
doubles is order-DEPENDENT. All money-ish columns in the testdata are
exact 2-decimal doubles, so we aggregate via
``SUM(CAST(x AS DECIMAL(18,2)))`` — decimal addition is exact and
order-independent in both engines — and cast the final result back to
DOUBLE. Per-row double arithmetic (same IEEE ops, same operand order)
is bit-identical across engines, so computed columns are safe; only
*reductions* need the decimal detour. Derived per-row expressions are
CAST to a decimal of the right scale before summing (a double is never
exactly on a decimal midpoint for scale ≥ 1, so round-to-nearest agrees
across engines regardless of tie-break rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (idempotent, lazy)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a DataFrame-API query builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def sql_query(name: str, sql: str, oracle: str | None = None, doc: str = "") -> None:
    """Register a query whose Spark and DuckDB SQL are identical (or
    nearly — pass ``oracle`` when the dialects differ)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    REGISTRY[name] = QuerySpec(name, fn, oracle if oracle is not None else sql, doc)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # Import for registration side effects.
        from filefilter_spark.queries import inventory  # noqa: F401
        from filefilter_spark.queries import extensions  # noqa: F401

        _loaded = True
