"""Batch sessionization (ops/sessions.py). Values are cross-engine
oracled (OP-B19-sessions, exact at sf0.001/sf0.01); these pin the
library semantics and the one-shuffle window plan."""

import datetime
import re

import pytest

from tests.test_plans import _plan, _shuffle_count


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1, 0, 0, 0)
          + datetime.timedelta(seconds=s), u) for i, s, u in rows],
        "event_id long, ts timestamp, user_id long",
    )


def test_sessionize_splits_on_gap(spark):
    from filefilter_spark.ops.sessions import sessionize

    ev = _ev(spark, [
        (1, 0, 7), (2, 100, 7), (3, 2000, 7),   # 1900s gap > 1800 → new
        (4, 2100, 7), (5, 0, 8),                 # other user independent
    ])
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_gap_boundary_is_exclusive(spark):
    """gap == threshold stays in-session; threshold+1µs starts a new
    one — pinned at microsecond resolution (integer time arithmetic)."""
    from filefilter_spark.ops.sessions import sessionize

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 1),
            (2, base + datetime.timedelta(seconds=1800), 1),
            (3, base + datetime.timedelta(seconds=3600, microseconds=1), 1),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_session_stats_counts_and_duration(spark):
    from filefilter_spark.ops.sessions import session_stats

    ev = _ev(spark, [(1, 0, 7), (2, 100, 7), (3, 5000, 7)])
    rows = {(r["user_id"], r["session_id"]): r
            for r in session_stats(ev, gap_seconds=1800).collect()}
    assert rows[(7, 1)]["n_events"] == 2
    assert rows[(7, 1)]["duration_us"] == 100_000_000
    assert rows[(7, 2)]["n_events"] == 1
    assert rows[(7, 2)]["duration_us"] == 0


def test_sessionize_plan_single_window_shuffle(spark, sf_dir):
    """lag + running sum share one partitioning/ordering → ONE
    Exchange and ONE Sort feed both Window nodes (they stay separate
    operators because the sum consumes lag's output, but the data
    never re-shuffles or re-sorts); session_stats' aggregate REUSES
    that partitioning (grouping on (user, session_id) is clustered by
    user already), so the whole stats pipeline is ONE shuffle."""
    from filefilter_spark.ops.sessions import sessionize, session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(sessionize(ev))
    tree = plan.split("\n\n")[0]
    assert _shuffle_count(plan) == 1
    assert len(re.findall(r"\bSort\b", tree)) == 1
    assert len(re.findall(r"\bWindow\b", tree)) == 2
    plan2 = _plan(session_stats(ev))
    assert _shuffle_count(plan2) == 1
    assert len(re.findall(r"HashAggregate", plan2.split("\n\n")[0])) >= 2
