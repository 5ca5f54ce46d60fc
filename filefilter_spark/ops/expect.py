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
    # De-duplicate (a repeated column would alias-collide in the
    # aggregation) and validate names up front — a typo should read
    # "unknown column", not an AnalysisException from deep inside the
    # agg. Input columns are referenced backtick-escaped so names
    # containing dots are taken literally instead of being parsed as
    # struct paths, and every metric alias is positional (__m0, __m1,
    # …) so no generated name ever embeds user text.
    not_null = list(dict.fromkeys(not_null or []))
    unique = list(dict.fromkeys(unique or []))
    ranges = ranges or {}
    # Membership check with the SESSION's case sensitivity, matching
    # what the analyzer will actually do with these names: under the
    # default (caseSensitive=false) a config saying Doc_ID against a
    # doc_id column resolves and must keep doing so; under an explicit
    # caseSensitive=true session the guard must flag it instead of
    # letting the agg throw UNRESOLVED_COLUMN later.
    case_sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )
    fold = (lambda c: c) if case_sensitive else str.lower
    known = {fold(c) for c in df.columns}
    missing = [
        c for c in (*not_null, *unique, *ranges) if fold(c) not in known
    ]
    if missing:
        raise ValueError(
            f"unknown column(s) {missing}; expected one of {df.columns}"
        )

    def col(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__m0")]
    metric: dict = {("rows", None): "__m0"}

    def add(kind: str, c: str, expr) -> None:
        name = f"__m{len(aggs)}"
        metric[(kind, c)] = name
        aggs.append(expr.alias(name))

    for c in not_null:
        # coalesce: sum over ZERO rows is NULL, which enforce() would
        # read as a failure — zero rows contain zero nulls (emptiness
        # is min_rows' job, same convention as the range check below).
        add("null", c, F.coalesce(
            F.sum(F.when(col(c).isNull(), 1).otherwise(0)), F.lit(0)
        ))
    for c in unique:
        add("cnt", c, F.count(col(c)))
        add("dst", c, F.count_distinct(col(c)))
    for c in ranges:
        add("min", c, F.min(col(c)))
        add("max", c, F.max(col(c)))
    row = df.agg(*aggs)

    def m(kind: str, c: str | None):
        return row[metric[(kind, c)]]

    checks = []
    if min_rows is not None:
        checks.append(
            F.struct(
                F.lit("min_rows").alias("check"),
                (m("rows", None) >= min_rows).alias("passed"),
                m("rows", None).cast("string").alias("observed"),
            )
        )
    for c in not_null:
        checks.append(
            F.struct(
                F.lit(f"not_null:{c}").alias("check"),
                (m("null", c) == 0).alias("passed"),
                m("null", c).cast("string").alias("observed"),
            )
        )
    for c in unique:
        checks.append(
            F.struct(
                F.lit(f"unique:{c}").alias("check"),
                (m("cnt", c) == m("dst", c)).alias("passed"),
                (m("cnt", c) - m("dst", c)).cast("string").alias("observed"),
            )
        )
    for c, (lo, hi) in ranges.items():
        checks.append(
            F.struct(
                F.lit(f"range:{c}").alias("check"),
                # vacuously true over zero rows / all-null columns
                # (min/max are NULL there) — emptiness is min_rows' job
                F.coalesce(
                    (m("min", c) >= F.lit(lo)) & (m("max", c) <= F.lit(hi)),
                    F.lit(True),
                ).alias("passed"),
                F.concat_ws(
                    "..",
                    m("min", c).cast("string"),
                    m("max", c).cast("string"),
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
