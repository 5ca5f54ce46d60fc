"""Wall-clock + max-task-time evidence for the salting helpers.

The salted join/agg (``ops/skew.py``) carry exact oracles and plan
tests, but plan shape alone doesn't prove the straggler collapses —
this probe does. It builds a zipf-keyed fact table (50% of rows on ONE
hot key, the rest uniform over 10k keys), joins it to a key dim with
the join strategy pinned to shuffle_hash (the shape AQE's skew-join
splitting does NOT mitigate — that optimization only splits sort-merge
partitions), and times the unsalted join against ``salted_join``.
Broadcast is disabled in the probe session so the join genuinely
shuffles on the key — the regime salting exists for.

Reported per variant: best-of-2 wall clock AND the hottest stage's
max/median task duration from the UI REST API. The unsalted run's max
task is the hot-key reducer (≈ half the fact table in one task); the
salted run spreads it across ``n_salts`` tasks. Results are verified
identical via a checksum aggregate.

Usage: python tools/skew_probe.py [n_rows]
Writes the ``skew`` section of SCALING.md, prints JSON lines.
Scratch: /tmp/spark_graft_skew (reused across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/spark_graft_skew"


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def hottest_stage_tasks(spark, t0_ms: int) -> tuple[float, float]:
    """(max, median) task duration in seconds of the heaviest stage
    submitted after ``t0_ms`` (epoch millis)."""
    app = spark.sparkContext.applicationId
    # uiWebUrl, not a hardcoded :4040 — another Spark app on the box
    # pushes this session's UI to 4041+ and the probe would query (or
    # crash against) the WRONG application
    ui = spark.sparkContext.uiWebUrl
    base = f"{ui}/api/v1/applications/{app}"
    stages = _get(f"{base}/stages?status=complete")
    import datetime as dt

    def sub_ms(s):
        ts = s.get("submissionTime")
        if not ts:
            return 0
        # "2026-08-14T12:00:00.000GMT"
        return int(
            dt.datetime.strptime(ts.replace("GMT", "+0000"),
                                 "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000
        )

    recent = [s for s in stages if sub_ms(s) >= t0_ms]
    best = (0.0, 0.0)
    # The straggler stage is the one with the largest SINGLE task, not
    # the largest total runtime (a wide scan out-sums a one-hot-task
    # reducer) — fetch each recent stage's task summary and keep the
    # worst max.
    for s in recent:
        try:
            summ = _get(
                f"{base}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,1.0"
            )
        except Exception:
            continue
        lo, med, hi = summ["duration"]
        if hi / 1000.0 > best[0]:
            best = (hi / 1000.0, med / 1000.0)
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    from pyspark.sql import functions as F

    from filefilter_spark.ops.skew import salted_join
    from filefilter_spark.session import get_spark

    spark = get_spark(
        "skew_probe",
        **{
            "spark.ui.enabled": "true",
            # force a real shuffle join: broadcast would hide the skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # scratch keyed on n_rows: a cached 8M-row fact must never be
    # silently reused for (and labeled as) a different requested size
    fact_path = f"{SCRATCH}/fact_{n_rows}.parquet"
    dim_path = f"{SCRATCH}/dim.parquet"
    if not (os.path.exists(f"{fact_path}/_SUCCESS")
            and os.path.exists(f"{dim_path}/_SUCCESS")):
        os.makedirs(SCRATCH, exist_ok=True)
        (
            spark.range(n_rows)
            .select(
                F.when(F.rand(7) < 0.5, F.lit(0))
                .otherwise((F.rand(11) * 10_000).cast("int"))
                .alias("k"),
                (F.col("id") % 997).cast("double").alias("v"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(fact_path)
        )
        (
            spark.range(10_000)
            .select(F.col("id").cast("int").alias("k"),
                    (F.col("id") * 3 % 101).cast("double").alias("w"))
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(dim_path)
        )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)

    def unsalted():
        return (
            fact.hint("shuffle_hash")
            .join(dim, "k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("chk"),
                 F.count("*").alias("n"))
        )

    def salted():
        return salted_join(
            fact, dim, ["k"], n_salts=32, strategy="shuffle_hash"
        ).agg(F.sum(F.col("v") * F.col("w")).alias("chk"),
              F.count("*").alias("n"))

    chk_a = unsalted().collect()[0]
    chk_b = salted().collect()[0]
    assert chk_a["n"] == chk_b["n"] and abs(chk_a["chk"] - chk_b["chk"]) < 1e-3 * abs(chk_a["chk"]), (chk_a, chk_b)

    results = {}
    for label, fn in (("unsalted", unsalted), ("salted", salted)):
        best, tasks = float("inf"), (0.0, 0.0)
        for _ in range(2):
            t0_ms = int(time.time() * 1000)
            t0 = time.time()
            fn().collect()
            dt_s = time.time() - t0
            if dt_s < best:
                best = dt_s
                tasks = hottest_stage_tasks(spark, t0_ms)
        results[label] = {"sec": round(best, 3),
                          "max_task_s": round(tasks[0], 3),
                          "median_task_s": round(tasks[1], 3)}
        print(f"{label:<9} wall {best:6.2f}s  max task {tasks[0]:6.2f}s  "
              f"median task {tasks[1]:6.3f}s", flush=True)
    out = {"n_rows": n_rows, "hot_share": 0.5, "n_salts": 32, **results}
    print(json.dumps(out), flush=True)

    u, s = results["unsalted"], results["salted"]
    lines = [
        "## Salted join straggler collapse (zipf keys, pinned shuffle join)",
        "",
        f"{n_rows:,}-row fact table, 50% of rows on ONE hot key (rest",
        "uniform over 10k keys), joined to a 10k-key dim with the join",
        "pinned to shuffle_hash and broadcast disabled — the shape AQE's",
        "skew-join splitting does not cover. Unsalted vs",
        "`salted_join(n_salts=32)`; identical checksums asserted",
        "(`tools/skew_probe.py`). Task times are the hottest stage's",
        "max/median from the UI API.",
        "",
        "| variant | wall | max task | median task | max/median |",
        "|---|---|---|---|---|",
        f"| unsalted | {u['sec']:.2f}s | {u['max_task_s']:.2f}s "
        f"| {u['median_task_s']:.3f}s "
        f"| {u['max_task_s'] / max(u['median_task_s'], 1e-9):.0f}× |",
        f"| salted ×32 | {s['sec']:.2f}s | {s['max_task_s']:.2f}s "
        f"| {s['median_task_s']:.3f}s "
        f"| {s['max_task_s'] / max(s['median_task_s'], 1e-9):.0f}× |",
        "",
        f"The hot-key reducer is the unsalted max task "
        f"({u['max_task_s']:.2f}s vs a {u['median_task_s']:.3f}s median); "
        f"salting spreads it across 32 tasks, collapsing the max to "
        f"{s['max_task_s']:.2f}s and wall clock to "
        f"{s['sec']:.2f}s ({u['sec'] / max(s['sec'], 1e-9):.1f}× faster). "
        "On a 1000-executor cluster the unsalted shape leaves 999",
        "executors idle behind that one task — the ratio, not the",
        "absolute seconds, is the 100 TB story.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "skew",
                    "\n".join(lines))
    print("wrote SCALING.md (skew section)")


if __name__ == "__main__":
    main()
