"""Straggler-collapse evidence for the window-skew tier (r14).

``sessionize`` partitions its window by user; ``keep_top_fraction``
ranks every group's rows in one task — both are scale-killers on a
power-law key, and AQE's skew handling does not apply to window
exchanges. This probe builds the adversarial inputs and times each op
against its skew-proof twin:

* events: 75% of all rows on ONE bot user (rest uniform over 20k
  users), timestamps spread over 60 days → ``sessionize`` vs
  ``sessionize_skewed`` (daily chunks: the bot's events spread over
  ~60 salted partitions).
* documents: 90% of rows in ONE source with a CONSTANT score (the
  degenerate case where even a boundary-class window would re-hot) →
  ``keep_top_fraction`` vs ``keep_top_fraction_skewed``.

Results are asserted identical (full-output checksums), wall clock is
best-of-2, and the hottest stage's max/median task duration comes from
the UI REST API (``tools/skew_probe.py`` machinery).

Usage: python tools/window_skew_probe.py [n_events]
Writes the ``window-skew`` section of SCALING.md, prints JSON lines.
Scratch: /tmp/spark_graft_wskew (reused across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.skew_probe import hottest_stage_tasks  # noqa: E402

SCRATCH = "/tmp/spark_graft_wskew"


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from filefilter_spark.ops.corpus import (
        keep_top_fraction,
        keep_top_fraction_skewed,
    )
    from filefilter_spark.ops.sessions import sessionize, sessionize_skewed
    from filefilter_spark.session import get_spark

    spark = get_spark("window_skew_probe", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    ev_path = f"{SCRATCH}/events_{n_events}.parquet"
    doc_path = f"{SCRATCH}/docs_{n_events}.parquet"
    if not (os.path.exists(f"{ev_path}/_SUCCESS")
            and os.path.exists(f"{doc_path}/_SUCCESS")):
        os.makedirs(SCRATCH, exist_ok=True)
        (
            spark.range(n_events)
            .select(
                F.col("id").alias("event_id"),
                F.when(F.rand(7) < 0.75, F.lit(0))
                .otherwise((F.rand(11) * 20_000).cast("long") + 1)
                .alias("user_id"),
                # 60 days of microsecond-spaced activity
                F.timestamp_micros(
                    (F.rand(13) * 60 * 86_400_000_000).cast("long")
                    + 1_700_000_000_000_000
                ).alias("ts"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(ev_path)
        )
        (
            spark.range(n_events // 4)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.rand(5) < 0.9, F.lit("crawl"))
                .otherwise(
                    F.concat(F.lit("src"), (F.rand(3) * 50).cast("int"))
                )
                .alias("source"),
                # constant score inside the hot source → the whole hot
                # group is one straddling class (worst case)
                F.when(F.rand(5) < 0.9, F.lit(0.5))
                .otherwise(F.round(F.rand(17), 6))
                .alias("s"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(doc_path)
        )
    ev = spark.read.parquet(ev_path)
    docs = spark.read.parquet(doc_path)

    def chk_sessions(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("session_id") * F.col("event_id")).alias("chk"),
            F.max("session_id").alias("mx"),
        ).collect()[0]

    variants = {
        "sessionize": lambda: chk_sessions(sessionize(ev, gap_seconds=1800)),
        "sessionize_skewed": lambda: chk_sessions(
            sessionize_skewed(ev, gap_seconds=1800, chunk_seconds=86_400)
        ),
        "gate": lambda: keep_top_fraction(
            docs, F.col("s"), 0.3
        ).agg(F.count(F.lit(1)).alias("n"),
              F.sum("doc_id").alias("chk")).collect()[0],
        "gate_skewed": lambda: keep_top_fraction_skewed(
            docs, F.col("s"), 0.3
        ).agg(F.count(F.lit(1)).alias("n"),
              F.sum("doc_id").alias("chk")).collect()[0],
    }

    results, vals = {}, {}
    for label, fn in variants.items():
        best, tasks, val = float("inf"), (0.0, 0.0), None
        for _ in range(2):
            t0_ms = int(time.time() * 1000)
            t0 = time.time()
            val = fn()
            dt_s = time.time() - t0
            if dt_s < best:
                best = dt_s
                tasks = hottest_stage_tasks(spark, t0_ms)
        results[label] = {"sec": round(best, 3),
                          "max_task_s": round(tasks[0], 3),
                          "median_task_s": round(tasks[1], 3)}
        vals[label] = tuple(val)
        print(f"{label:<18} wall {best:6.2f}s  max task {tasks[0]:6.2f}s  "
              f"median task {tasks[1]:6.3f}s", flush=True)
    assert vals["sessionize"] == vals["sessionize_skewed"], (
        vals["sessionize"], vals["sessionize_skewed"])
    assert vals["gate"] == vals["gate_skewed"], (
        vals["gate"], vals["gate_skewed"])

    out = {"n_events": n_events, "hot_share": 0.75, **results}
    print(json.dumps(out), flush=True)

    s0, s1 = results["sessionize"], results["sessionize_skewed"]
    g0, g1 = results["gate"], results["gate_skewed"]

    def row(name, r):
        ratio = r["max_task_s"] / max(r["median_task_s"], 1e-9)
        return (f"| {name} | {r['sec']:.2f}s | {r['max_task_s']:.2f}s "
                f"| {r['median_task_s']:.3f}s | {ratio:.0f}× |")

    lines = [
        "## Window-skew tier: sessionize + percentile gate on power-law keys (r14)",
        "",
        f"Adversarial inputs ({n_events:,} events / {n_events // 4:,} docs,",
        "`tools/window_skew_probe.py`): one bot user holds 75% of all",
        "events; one source holds 90% of all docs AT ONE SCORE VALUE (the",
        "degenerate straddling-class case). Outputs asserted identical",
        "(checksums over the full result); task times are the hottest",
        "stage's max/median from the UI API.",
        "",
        "| variant | wall | max task | median task | max/median |",
        "|---|---|---|---|---|",
        row("sessionize (one user window)", s0),
        row("sessionize_skewed (daily chunks)", s1),
        row("keep_top_fraction (group window)", g0),
        row("keep_top_fraction_skewed (count+radix)", g1),
        "",
        f"The bot user's window task is the unsalted max "
        f"({s0['max_task_s']:.2f}s vs {s0['median_task_s']:.3f}s median); "
        f"chunk-salting spreads it over ~60 daily chunks "
        f"(max {s1['max_task_s']:.2f}s). The gate's one-window rank "
        f"concentrates the hot source the same way "
        f"({g0['max_task_s']:.2f}s max); the count-based cutoff + radix "
        f"select never ranks corpus rows (max {g1['max_task_s']:.2f}s). "
        "As with the join probe, the max/median collapse — not the",
        "absolute seconds — is what survives the 1000-executor scale-up:",
        "the unsalted shapes leave the fleet idle behind one task.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "window-skew",
                    "\n".join(lines))
    print("wrote SCALING.md (window-skew section)")


if __name__ == "__main__":
    main()
