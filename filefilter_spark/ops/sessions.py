"""Batch sessionization (OP-B19-sessions) — gap-based session ids over
an event log, the batch counterpart of the streaming session windows in
``streaming/jobs.py`` (reference surface: time-ordered event queries;
the reference reaches these only through its SQL tier).

The classic two-window formulation, Spark-first:

1. ``brk`` = 1 where the gap to the previous event of the same user
   exceeds the threshold (or there is no previous event) — ``lag``
   over (user, ts, id).
2. ``session_id`` = running sum of ``brk`` over the SAME window spec.

Both windows share one partitioning (user) and one ordering (ts, id),
so Catalyst plans a SINGLE Exchange + Sort for the whole step — the
event log shuffles once, however many sessions emerge. Session stats
are a groupBy on (user, session_id) whose clustering is already
satisfied by the window's hash-partitioning on user, so the aggregate
adds NO second exchange (plan-pinned in tests/test_sessions.py):
sessionize + stats is one shuffle end to end.

Determinism: time arithmetic runs on integer MICROSECONDS
(``unix_micros`` here, ``epoch_us`` in the DuckDB oracle) — no float
seconds, no rounding mode to disagree on; ties within one timestamp
break on the event id.

At 100 TB: one shuffle keyed by user. A power-law user (one key holding
a measurable fraction of all events) is the classic skew case — AQE
skew-split does not apply to window exchanges, so pre-filter bots or
bucket the event table by user for repeated sessionization runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _us(c: Column) -> Column:
    """Integer microseconds since epoch. Parquet event logs read as
    TIMESTAMP_NTZ; the engine pins the session timezone to UTC
    (session.py), so the cast to TIMESTAMP reinterprets the same wall
    clock with zero offset — matching DuckDB's naive ``epoch_us``."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Tag every event with a per-user 1-based ``session_id``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _us(F.col(ts_col))
    brk = (
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))
        .when(
            us - _us(F.lag(ts_col).over(w))
            > F.lit(int(gap_seconds) * 1_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(brk).over(run).cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user, session_id, n_events, start_ts, end_ts, duration_us) per
    gap-delimited session. duration is integer microseconds (exact)."""
    tagged = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    return tagged.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            _us(F.max(ts_col)) - _us(F.min(ts_col))
        ).alias("duration_us"),
    )
