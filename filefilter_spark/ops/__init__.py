"""Library operators the reference lacks a Spark primitive for
(SURVEY.md §4.2) plus the 100 TB-pipeline extensions (§2.D)."""

from filefilter_spark.ops.asof import asof_join

__all__ = ["asof_join"]
