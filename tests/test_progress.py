"""Status line tests (filefilter_spark/progress.py): rolling-rate math
against hand-computed values, line format, and a live poll of a real
Spark job via the StatusTracker."""

import io
import time

from filefilter_spark.progress import RollingRate, StatusLine, render_line


def test_rolling_rate_avg_and_eta():
    r = RollingRate(maxlen=100)
    r.observe(0, 0.0)      # baseline
    r.observe(10, 1.0)     # 10 tasks in 1s → 0.1 s/task
    assert abs(r.avg_time() - 0.1) < 1e-9
    # 30 pending over 4 workers at 0.1 s/task → 0.75 s
    assert abs(r.eta_seconds(30, 4) - 0.75) < 1e-9
    assert r.eta_hms(30, 4) == "00:00:00"
    assert r.eta_hms(400_000, 1) == "11:06:40"


def test_rolling_rate_window_rolls():
    r = RollingRate(maxlen=4)
    r.observe(0, 0.0)
    r.observe(2, 2.0)   # 1.0 s/task, twice
    r.observe(6, 2.4)   # 0.1 s/task, four times → fills the window
    assert abs(r.avg_time() - 0.1) < 1e-9  # old 1.0s samples evicted


def test_rolling_rate_no_signal_yet():
    r = RollingRate()
    assert r.avg_time() == 0.0
    assert r.eta_hms(100, 4) == "00:00:00"  # zero avg → zero eta, not crash


def test_render_line_fields():
    r = RollingRate()
    r.observe(0, 0.0)
    r.observe(5, 1.0)  # 200 ms/task
    line = render_line("stage 7", 5, 20, 4, r, 123.4)
    assert line == "stage 7: tasks 5/20 active:4 avgT:200ms ETA:00:00:00 mem:123MB"


def test_status_line_live_poll(spark):
    """Run a real (slow enough) job under the poller and assert the
    stream saw at least one repaint with task progress."""
    buf = io.StringIO()
    with StatusLine(spark, stream=buf, interval=0.02):
        spark.range(0, 200, 1, 8).selectExpr(
            "aggregate(sequence(1, 20000), 0L, (a, x) -> a + x) AS s"
        ).write.format("noop").mode("overwrite").save()
        time.sleep(0.1)  # give the poller a beat on fast machines
    out = buf.getvalue()
    assert "\r" in out and "tasks" in out and "ETA:" in out
    assert out.endswith("\n")  # stop() leaves the cursor on a fresh line
