"""Data-quality expectations — the gate a production pipeline runs
between stages (Deequ/Great-Expectations shape, reference has no
analog: its pipeline trusts every stage's output blindly).

One aggregation pass computes every requested metric (row count,
per-column null counts, distinct counts, numeric ranges); the report is
exploded from that single row, so a gate costs one job regardless of
how many expectations it carries. ``enforce`` raises on any failure —
the fail-fast behavior a scheduled 100 TB pipeline needs (a silent
half-empty output is worse than a red run).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def expectation_report(
    df: DataFrame,
    min_rows: int | None = None,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Evaluate expectations in ONE aggregation; returns
    ``(check, passed, observed)`` — ``observed`` is a string so
    heterogeneous metrics share a schema.

    Checks: ``min_rows`` (count >= n); ``not_null:col`` (zero nulls);
    ``unique:col`` (no duplicate values, nulls ignored);
    ``range:col`` (min/max within [lo, hi], nulls ignored).
    """
    not_null = not_null or []
    unique = unique or []
    ranges = ranges or {}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in not_null:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
    for c in unique:
        aggs.append(F.count(c).alias(f"__cnt_{c}"))
        aggs.append(F.count_distinct(c).alias(f"__dst_{c}"))
    for c in ranges:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs)

    checks = []
    if min_rows is not None:
        checks.append(
            F.struct(
                F.lit("min_rows").alias("check"),
                (F.col("__n") >= min_rows).alias("passed"),
                F.col("__n").cast("string").alias("observed"),
            )
        )
    for c in not_null:
        checks.append(
            F.struct(
                F.lit(f"not_null:{c}").alias("check"),
                (F.col(f"__null_{c}") == 0).alias("passed"),
                F.col(f"__null_{c}").cast("string").alias("observed"),
            )
        )
    for c in unique:
        checks.append(
            F.struct(
                F.lit(f"unique:{c}").alias("check"),
                (F.col(f"__cnt_{c}") == F.col(f"__dst_{c}")).alias("passed"),
                (F.col(f"__cnt_{c}") - F.col(f"__dst_{c}"))
                .cast("string")
                .alias("observed"),
            )
        )
    for c, (lo, hi) in ranges.items():
        checks.append(
            F.struct(
                F.lit(f"range:{c}").alias("check"),
                # vacuously true over zero rows / all-null columns
                # (min/max are NULL there) — emptiness is min_rows' job
                F.coalesce(
                    (F.col(f"__min_{c}") >= F.lit(lo))
                    & (F.col(f"__max_{c}") <= F.lit(hi)),
                    F.lit(True),
                ).alias("passed"),
                F.concat_ws(
                    "..",
                    F.col(f"__min_{c}").cast("string"),
                    F.col(f"__max_{c}").cast("string"),
                ).alias("observed"),
            )
        )
    if not checks:
        raise ValueError("no expectations given")
    return row.select(F.explode(F.array(*checks)).alias("r")).select(
        "r.check", "r.passed", "r.observed"
    )


def enforce(df: DataFrame, **expectations) -> DataFrame:
    """Gate: evaluate :func:`expectation_report` eagerly and raise
    listing every failed check; returns ``df`` unchanged on success so
    the gate drops into any stage chain."""
    failed = [
        f"{r['check']} (observed {r['observed']})"
        for r in expectation_report(df, **expectations).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError("expectations failed: " + "; ".join(failed))
    return df
