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


def test_sessionize_skewed_equals_plain_for_any_chunk_size(spark):
    """The two-phase salted form must emit EXACTLY sessionize's ids —
    including chunk sizes SMALLER than the gap (bridges across empty
    chunks), duplicate timestamps (id tiebreak), and a hot user."""
    import random

    from filefilter_spark.ops.sessions import sessionize, sessionize_skewed

    random.seed(7)
    rows, eid = [], 0
    for u in (1, 2, 3):
        t = 0
        for _ in range(120 if u == 1 else 25):
            t += random.choice([1, 100, 1799, 1800, 1801, 5000, 90000])
            rows.append((eid, t, u))
            eid += 1
    rows += [(eid, rows[0][1], 1), (eid + 1, rows[0][1], 1)]  # ts ties
    ev = _ev(spark, [(i, s, u) for i, s, u in rows])
    want = {r["event_id"]: r["session_id"]
            for r in sessionize(ev, gap_seconds=1800).collect()}
    for chunk_s in (1000, 3600, 86_400):  # < gap, ~gap, >> gap
        got = {r["event_id"]: r["session_id"]
               for r in sessionize_skewed(
                   ev, gap_seconds=1800, chunk_seconds=chunk_s).collect()}
        assert got == want, f"chunk_seconds={chunk_s}"


def test_sessionize_skewed_keeps_null_user_rows(spark):
    """A null user key is a real partition in the plain window form
    (anonymous events) — the chunked form's null-safe re-join must
    keep those rows with identical session ids (a plain equality join
    silently dropped them)."""
    import datetime

    from filefilter_spark.ops.sessions import sessionize, sessionize_skewed

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base, None), (2, base + datetime.timedelta(seconds=100), None),
         (3, base + datetime.timedelta(seconds=5000), None),
         (4, base, 7)],
        "event_id long, ts timestamp, user_id long",
    )
    want = {r["event_id"]: r["session_id"]
            for r in sessionize(ev, gap_seconds=1800).collect()}
    got = {r["event_id"]: r["session_id"]
           for r in sessionize_skewed(ev, gap_seconds=1800,
                                      chunk_seconds=600).collect()}
    assert got == want and len(got) == 4


def test_sessionize_skewed_rejects_bad_chunk(spark):
    from filefilter_spark.ops.sessions import sessionize_skewed

    ev = _ev(spark, [(1, 0, 7)])
    with pytest.raises(ValueError, match="chunk_seconds"):
        sessionize_skewed(ev, chunk_seconds=0)


def test_sessionize_skewed_plan_salts_the_event_shuffle(spark, sf_dir):
    """The skew contract in the plan: every event-scale exchange
    partitions on (user, chunk) — the salt — and the ONLY bare-user
    exchange carries per-chunk SUMMARY rows (its input is the
    aggregated (__n_sess, first/last) schema), never events. AQE
    skew-split doesn't apply to window exchanges; this shape is the
    mitigation."""
    from filefilter_spark.ops.sessions import sessionize_skewed

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(sessionize_skewed(ev))
    salted = re.findall(
        r"hashpartitioning\(user_id#\d+L?, __sess_chunk#\d+L?", plan
    )
    assert len(salted) >= 1
    bare = re.findall(
        r"Input \[\d+\]: \[([^\]]*)\]\s*\nArguments: hashpartitioning"
        r"\(user_id#\d+L?, \d+\)",
        plan,
    )
    assert len(bare) == 1, plan
    assert "__n_sess" in bare[0]


def test_session_stats_skewed_matches_plain(spark):
    from filefilter_spark.ops.sessions import session_stats

    ev = _ev(spark, [(1, 0, 7), (2, 100, 7), (3, 5000, 7), (4, 0, 8)])
    want = sorted(tuple(r) for r in session_stats(ev).collect())
    got = sorted(
        tuple(r)
        for r in session_stats(ev, skewed=True, chunk_seconds=600).collect()
    )
    assert got == want


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
