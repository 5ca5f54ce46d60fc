"""Interactive status line — the Spark-native analog of the reference's
rolling stats/ETA display (``StatsManager.py:10-34`` keeps a
deque(maxlen=100) of per-row times and renders
``avgT:… ETA:HH:MM:SS …`` through ``printStatus``,
``filefilter.py:116-141``, throttled to one repaint per 100 ms with a
``\\r`` carriage return).

The unit of progress on Spark is the TASK, not the row: rows stream
through executors without per-row driver callbacks (that absence is
exactly why the engine scales), so the rolling window tracks task
completions from ``SparkContext.statusTracker()`` instead. Semantics
kept from the reference: window of the last 100 completions, ETA =
pending × rolling-avg ÷ active-parallelism, memory usage appended,
100 ms repaint throttle, ``\\r`` single-line repaint in interactive
mode. The poller is a daemon thread reading only driver-local state —
it costs no Spark jobs and nothing at executor scale.
"""

from __future__ import annotations

import sys
import threading
import time
from collections import deque


class RollingRate:
    """Rolling per-unit processing time over the last ``maxlen``
    completions (reference ``StatsManager.register/avg_time/get_eta``).
    Pure arithmetic — unit-tested separately from the poller thread."""

    def __init__(self, maxlen: int = 100):
        self.times: deque[float] = deque(maxlen=maxlen)
        self._last_count = 0
        self._last_t: float | None = None

    def observe(self, completed: int, now: float) -> None:
        """Feed a monotonic completed-unit counter; records one interval
        per newly completed unit (evenly split across the poll gap)."""
        if self._last_t is None:
            self._last_count, self._last_t = completed, now
            return
        done = completed - self._last_count
        if done < 0:
            # Counter regressed: the tracked stage changed under us (new
            # stage starts from a smaller completed count). Re-baseline —
            # otherwise the rate freezes on the old stage's timestamp and
            # the first eventual update spans both stages' wall time.
            self._last_count, self._last_t = completed, now
            return
        if done > 0:
            per_unit = (now - self._last_t) / done
            for _ in range(min(done, self.times.maxlen or done)):
                self.times.append(per_unit)
            self._last_count, self._last_t = completed, now

    def avg_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def eta_seconds(self, pending: int, workers: int) -> float:
        return self.avg_time() * pending / max(1, workers)

    def eta_hms(self, pending: int, workers: int) -> str:
        secs = self.eta_seconds(pending, workers)
        if secs >= 86400 * 99:  # no signal yet / absurd — render dashes
            return "--:--:--"
        # manual H:M:S — gmtime wraps at 24h and would render a 25-hour
        # ETA as 01:00:00
        h, rem = divmod(int(secs), 3600)
        m, sec = divmod(rem, 60)
        return f"{h:02d}:{m:02d}:{sec:02d}"


def _rss_mb() -> float:
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:  # pragma: no cover - non-POSIX
        return 0.0


def render_line(
    stage_name: str,
    completed: int,
    total: int,
    active: int,
    rate: RollingRate,
    rss_mb: float,
) -> str:
    """One status line, same fields as the reference's printStatus
    message (task-denominated): progress, parallelism, rolling avg,
    ETA, memory."""
    avg_ms = rate.avg_time() * 1000.0
    eta = rate.eta_hms(total - completed, active or 1)
    return (
        f"{stage_name}: tasks {completed}/{total} "
        f"active:{active} avgT:{int(avg_ms)}ms ETA:{eta} "
        f"mem:{rss_mb:.0f}MB"
    )


class StatusLine:
    """Context manager: start a daemon poller that repaints one
    ``\\r``-terminated line while Spark jobs run.

    ``interval`` mirrors the reference's 100 ms repaint throttle. The
    stream defaults to stderr (stdout may be the data sink). Safe with
    no active stages (idles quietly) and with concurrent jobs (tracks
    the most recently launched stage, which is what a user watches).
    """

    def __init__(self, spark, stream=None, interval: float = 0.1):
        self._tracker = spark.sparkContext.statusTracker()
        self._stream = stream if stream is not None else sys.stderr
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._rate = RollingRate()
        self._wrote = False

    def _poll_once(self, now: float) -> None:
        try:
            ids = self._tracker.getActiveStageIds()
        except Exception:  # pragma: no cover - context shutting down
            return
        if not ids:
            return
        info = self._tracker.getStageInfo(max(ids))
        if info is None or info.numTasks == 0:
            return
        self._rate.observe(info.numCompletedTasks, now)
        line = render_line(
            f"stage {info.stageId}",
            info.numCompletedTasks,
            info.numTasks,
            info.numActiveTasks,
            self._rate,
            _rss_mb(),
        )
        self._stream.write("\r" + line.ljust(79))
        self._stream.flush()
        self._wrote = True

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            self._poll_once(time.monotonic())

    def __enter__(self) -> "StatusLine":
        self._thread = threading.Thread(
            target=self._run, name="ffspark-status", daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._wrote:  # leave the last line visible, move to a new one
            self._stream.write("\n")
            self._stream.flush()
