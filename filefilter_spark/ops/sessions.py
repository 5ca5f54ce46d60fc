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
skew-split does not apply to window exchanges, so a bot user holding
10% of the log lands on one task. :func:`sessionize_skewed` is the
mitigation op: the ``ops/skew.py`` two-phase pattern applied to
windows — sessionize within (user, coarse time-chunk), then merge
chunk-boundary sessions via a per-chunk summary window that is
|chunks|-sized, never |events|-sized. Results are EXACTLY equal to
:func:`sessionize` for every input with non-null timestamps (oracled
as OP-B19-sessions-skew); see :func:`sessionize_skewed` for the
null-timestamp caveat.
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


def sessionize_skewed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """:func:`sessionize` for POWER-LAW user keys — identical output,
    skew-proof plan (the ``ops/skew.py`` two-phase pattern applied to
    a window: salt = a coarse, order-preserving time chunk).

    Three steps, exact for ANY chunk size (chunking only has to yield
    contiguous, monotone time intervals — integer ``div`` does):

    1. **Within-chunk pass** — the :func:`sessionize` lag + running-sum
       windows, but partitioned by (user, chunk): the hot user's events
       spread over all their chunks instead of one task. Every chunk's
       first event opens a provisional session (``local_sid`` is
       1-based per chunk).
    2. **Chunk-summary window** — per (user, chunk): session count,
       first/last event time (a groupBy whose clustering the window
       already satisfied — no second exchange). A window over these
       summary rows, partitioned by user and ordered by chunk, decides
       for each chunk whether its first session BRIDGES the previous
       non-empty chunk (boundary gap <= threshold) and converts local
       ids to global ones:
       ``offset(c) = Σ_{c'<c} n_sessions − Σ_{c'<=c} bridge``. This
       window is |user's non-empty chunks| rows — bounded by the time
       range over ``chunk_seconds``, NEVER by event count, so the hot
       key is harmless here.
    3. **Re-join** — offsets join back on (user, chunk): phase 1's
       hash partitioning is reusable on the big side and the summary
       side is tiny (AQE broadcasts it), so the events still shuffle
       ONCE end-to-end (plan-pinned in tests/test_sessions.py).

    ``session_id`` equals :func:`sessionize`'s for every event with a
    NON-NULL timestamp — exact-oracled against the same DuckDB SQL
    (OP-B19-sessions-skew). ``chunk_seconds`` trades skew spread
    (smaller = more salt) against summary-row count; exactness never
    depends on it.

    **Null-timestamp caveat**: the two forms diverge on null ``ts``.
    :func:`sessionize`'s gap comparison folds a null gap into "no
    break" (nulls sort first and never open a session of their own),
    while chunking isolates the null-us rows into their own chunk,
    which opens one. Sessionizing a null timestamp is meaningless
    either way — filter them upstream before relying on either form.
    """
    if chunk_seconds <= 0:
        raise ValueError(
            f"sessionize_skewed: chunk_seconds must be positive: {chunk_seconds}"
        )
    chunk_us = int(chunk_seconds) * 1_000_000
    gap_us = int(gap_seconds) * 1_000_000
    US, CH, LS = "__sess_us", "__sess_chunk", "__sess_local"
    work = df.withColumn(US, _us(F.col(ts_col))).withColumn(
        CH, F.expr(f"{US} div {chunk_us}")
    )

    wl = Window.partitionBy(user_col, CH).orderBy(ts_col, id_col)
    brk = (
        F.when(F.lag(US).over(wl).isNull(), F.lit(1))
        .when(F.col(US) - F.lag(US).over(wl) > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    run = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = work.withColumn(LS, F.sum(brk).over(run))

    summary = tagged.groupBy(user_col, CH).agg(
        F.max(LS).alias("__n_sess"),
        F.min(US).alias("__first_us"),
        F.max(US).alias("__last_us"),
    )
    wu = Window.partitionBy(user_col).orderBy(CH)
    bridge = F.when(
        F.lag("__last_us").over(wu).isNotNull()
        & (F.col("__first_us") - F.lag("__last_us").over(wu) <= F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    offsets = summary.select(
        user_col,
        CH,
        (
            F.coalesce(
                F.sum("__n_sess").over(
                    wu.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.sum(bridge).over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("__offset"),
    )
    # NULL-SAFE re-join: a null user key is a real partition in the
    # plain window form (anonymous events), and a plain equality join
    # here would silently DROP those rows — eqNullSafe keeps parity.
    # (Null ts is different: sessionize's gap comparison folds a
    # null-gap into "no break" while chunking separates the null-us
    # chunk — sessionizing null timestamps is meaningless, clean them
    # upstream.)
    off = offsets.select(
        F.col(user_col).alias("__off_u"),
        F.col(CH).alias("__off_c"),
        "__offset",
    )
    return (
        tagged.join(
            off,
            F.col(user_col).eqNullSafe(F.col("__off_u"))
            & F.col(CH).eqNullSafe(F.col("__off_c")),
        )
        .withColumn(
            "session_id", (F.col("__offset") + F.col(LS)).cast("long")
        )
        .drop(US, CH, LS, "__offset", "__off_u", "__off_c")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    skewed: bool = False,
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """(user, session_id, n_events, start_ts, end_ts, duration_us) per
    gap-delimited session. duration is integer microseconds (exact).
    ``skewed=True`` routes through :func:`sessionize_skewed` (identical
    sessions, skew-proof plan); the stats groupBy itself is
    map-combinable, so partial aggregation absorbs the hot key there."""
    tagged = (
        sessionize_skewed(df, user_col, ts_col, id_col, gap_seconds,
                          chunk_seconds)
        if skewed
        else sessionize(df, user_col, ts_col, id_col, gap_seconds)
    )
    return tagged.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            _us(F.max(ts_col)) - _us(F.min(ts_col))
        ).alias("duration_us"),
    )
