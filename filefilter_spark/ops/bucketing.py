"""Bucketed-table helpers — shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle of both sides on every run. Bucketing pays that shuffle ONCE at
write time: both tables are hash-partitioned into the same number of
buckets on the join key, so Catalyst plans later joins as bucket-local
sort-merge joins with NO Exchange on either side (verified in
tests/test_ops.py by asserting the physical plan is exchange-free).

This is the Spark analog of "pre-partition your fact tables on the join
key" — the single highest-leverage layout decision for a recurring
pipeline over the same tables.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally removes the Sort from later
    sort-merge joins, leaving pure streamed merges.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — plans with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
