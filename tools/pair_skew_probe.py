"""Task-time evidence that the pair kernel's HYBRID branch spreads a
hot posting list's quadratic pair stage (VERDICT r16 #7).

sf0.1 never routes the hybrid branch in the bench (every list fits a
few chunks and the explosion is modest), so until now its only
evidence was plan pins + unit-level exactness tests. This probe forces
the regime the branch exists for: a corpus of healthy posting lists
plus ONE hot list at ``xN`` times the healthy p90, pushed through

- the IN-PLACE shape (the r13 two-chained-explodes — what every
  near-dup tier would run without the r16 kernel), and
- the mode-routed kernel (which routes the hot list through chunked
  (slice_i, slice_j) work units spread round-robin),

and reports wall clock + the hottest stage's max/median task duration
from the UI REST API. Pair multisets are verified equal via count +
checksum. The in-place shape's max task holds the whole n²/2 hot-list
emission; the hybrid spreads it over ceil(n/C)·(ceil(n/C)+1)/2 units.

Usage: python tools/pair_skew_probe.py [hot_multiplier ...]
Defaults: 16 64. Writes the ``pair-skew`` section of SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEALTHY_LISTS = 400
HEALTHY_SIZE = 550  # the sf0.1 fuzzy p90 posting-list size


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [16, 64]
    from pyspark.sql import functions as F

    from filefilter_spark.ops.dedup import (
        _chunked_list_pairs,
        _inplace_list_pairs,
    )
    from filefilter_spark.session import get_spark
    from tools.skew_probe import hottest_stage_tasks

    spark = get_spark("pair_skew_probe", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    rows_out = []
    for mult in mults:
        hot = HEALTHY_SIZE * mult
        # healthy lists: ids disjoint per list; hot list: its own range.
        # Built deterministically and written to parquet so both
        # variants read identical input through a real scan.
        path = f"/tmp/spark_graft_pair_skew/lists_{mult}.parquet"
        if not os.path.exists(f"{path}/_SUCCESS"):
            (
                spark.range(HEALTHY_LISTS)
                .select(
                    F.col("id").alias("k"),
                    F.expr(
                        f"sequence(id * {HEALTHY_SIZE * 10}, "
                        f"id * {HEALTHY_SIZE * 10} + {HEALTHY_SIZE - 1})"
                    ).alias("ds"),
                )
                .unionByName(
                    spark.range(1).select(
                        F.lit(-1).alias("k"),
                        F.expr(
                            f"sequence({10**12}, {10**12 + hot - 1})"
                        ).alias("ds"),
                    )
                )
                .repartition(8)
                .write.mode("overwrite")
                .parquet(path)
            )
        grouped = spark.read.parquet(path).select("ds")

        def chk(df):
            return df.agg(
                F.count("*").alias("n"),
                F.sum(F.col("a") + F.col("b")).alias("s"),
            ).collect()[0]

        # hybrid FIRST (checksum reference + timing); the in-place
        # attempt runs LAST because past ~x32 the single task holding
        # the hot list's n²/2 emission OOMs the whole JVM — that
        # failure IS the result, and nothing must depend on the
        # session surviving it.
        ref = None
        res = {}
        for label, fn in (
            ("hybrid", lambda: _chunked_list_pairs(grouped, "ds")),
            ("in-place", lambda: _inplace_list_pairs(grouped, "ds")),
        ):
            try:
                c = chk(fn())
                if ref is None:
                    ref = c
                assert (c["n"], c["s"]) == (ref["n"], ref["s"]), (
                    label, c, ref)
                best, tasks = float("inf"), (0.0, 0.0)
                for _ in range(2):
                    t0_ms = int(time.time() * 1000)
                    t0 = time.time()
                    fn().write.format("noop").mode("overwrite").save()
                    dt_s = time.time() - t0
                    if dt_s < best:
                        best = dt_s
                        tasks = hottest_stage_tasks(spark, t0_ms)
                res[label] = {
                    "sec": round(best, 3),
                    "max_task_s": round(tasks[0], 3),
                    "median_task_s": round(tasks[1], 3),
                }
                print(
                    f"x{mult} {label:<9} wall {best:6.2f}s  "
                    f"max task {tasks[0]:6.2f}s  median {tasks[1]:6.3f}s",
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 - OOM IS the result
                res[label] = {"failed": f"{type(exc).__name__}"}
                print(f"x{mult} {label:<9} FAILED ({type(exc).__name__}) "
                      "— single-task quadratic emission", flush=True)
        rows_out.append(
            {"mult": mult, "hot_list": hot,
             "n_pairs": int(ref["n"]) if ref is not None else None, **res}
        )
        print(json.dumps(rows_out[-1]), flush=True)
        if any("failed" in v for v in res.values() if isinstance(v, dict)):
            break  # the JVM is gone; report what we have

    lines = [
        "## Pair-kernel hybrid branch: hot posting list straggler collapse",
        "",
        f"{HEALTHY_LISTS} healthy posting lists of {HEALTHY_SIZE} ids (the",
        "sf0.1 fuzzy p90) plus ONE hot list at xN of that, through the",
        "r13 in-place chained-explode vs the mode-routed kernel",
        "(`tools/pair_skew_probe.py`; pair count + id-sum checksums",
        "asserted equal). Task times are the hottest stage's max/median",
        "from the UI API — the in-place max task holds the entire hot",
        "list's n²/2 emission, the hybrid spreads it round-robin in",
        "bounded (slice_i, slice_j) units.",
        "",
        "| hot xN | hot list | pairs | shape | wall | max task "
        "| median task | max/median |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows_out:
        for label in ("in-place", "hybrid"):
            v = r[label]
            n_pairs = f"{r['n_pairs']:,}" if r["n_pairs"] else "—"
            if "failed" in v:
                lines.append(
                    f"| x{r['mult']} | {r['hot_list']:,} | {n_pairs} "
                    f"| {label} | **JVM OOM** | — | — | — |"
                )
                continue
            lines.append(
                f"| x{r['mult']} | {r['hot_list']:,} | {n_pairs} "
                f"| {label} | {v['sec']:.2f}s | {v['max_task_s']:.2f}s "
                f"| {v['median_task_s']:.3f}s "
                f"| {v['max_task_s'] / max(v['median_task_s'], 1e-9):.0f}x |"
            )
    lines += [
        "",
        "The wall-clock crossover is wherever one list's n²/2 exceeds a",
        "core's share of the total — the ratio row is the 100 TB story:",
        "on a wide cluster the in-place shape leaves every other core",
        "idle behind the one hot task, while the hybrid's max task stays",
        "bounded by C² pair emissions regardless of list size.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(
        os.path.join(repo, "SCALING.md"), "pair-skew", "\n".join(lines)
    )
    print("wrote SCALING.md (pair-skew section)")


if __name__ == "__main__":
    main()
