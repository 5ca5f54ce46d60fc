"""Bounded-memory stress for the driver fan-ins (1 GiB heap, high P).

Round-6 ask #7 / round-7 verdict ask #5: the fan-in designs CLAIM
driver traffic bounded regardless of partition count — bloom collects
only final bitmap slices (≤ m/8 bytes total), frequent_tokens collects
O(√P × capacity) Misra-Gries partials, BPE's driver mode collects a
cap-bounded histogram. A claim about bounded memory is only evidence
once the ops have actually run under a driver heap that an unbounded
fan-in would blow. This probe pins ``SPARK_GRAFT_DRIVER_MEM=1g``
(must be set BEFORE the JVM launches — the probe re-execs itself if
the env var is absent) and runs each fan-in at 2,048 partitions —
32-64× this box's natural partitioning — then reports the JVM heap
peak from the MemoryPoolMXBeans next to the 1 GiB ceiling.

For the bloom build this doubles as the acceptance test of the r8
sparse-slice fan-in: the r7 persist-based shape held P dense m/8-byte
partials in block storage — at P=2,048 × m/8=1.5 MB that is ~3 GiB of
partials which MEMORY_AND_DISK would push through a 1 GiB heap's
storage fraction; the sparse path's driver+storage footprint is the
bitmap itself.

Writes the ``fanin_stress`` marker section of SCALING.md.

Usage: python tools/fanin_stress_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAP = "1g"
N_PARTS = 2048


def heap_peak_mb(spark) -> float:
    """Sum of per-pool peak usage across JVM HEAP pools (resettable
    high-water mark — reset at the start of each op)."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    total = 0
    for pool in mf.getMemoryPoolMXBeans():
        if pool.getType().toString() == "Heap memory":
            total += pool.getPeakUsage().getUsed()
    return total / (1 << 20)


def reset_peaks(spark) -> None:
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    for pool in mf.getMemoryPoolMXBeans():
        pool.resetPeakUsage()


def main() -> None:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM") != HEAP:
        # the driver heap is fixed at JVM launch; re-exec with it pinned
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=HEAP)
        os.execve(sys.executable, [sys.executable, *sys.argv], env)

    import pyspark.sql.functions as F

    from filefilter_spark.ops.bpe import train_bpe
    from filefilter_spark.ops.dedup import _bloom_params, _build_bloom
    from filefilter_spark.ops.sketch import frequent_tokens
    from filefilter_spark.queries.registry import load_table
    from filefilter_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fanin_stress_probe")
    spark.sparkContext.setLogLevel("ERROR")
    heap_max = (
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        / (1 << 20)
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = []

    def run(name, detail, fn):
        reset_peaks(spark)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        peak = heap_peak_mb(spark)
        rows.append((name, detail, dt, peak))
        print(json.dumps({
            "op": name, "detail": detail, "wall_s": round(dt, 2),
            "driver_heap_peak_mb": round(peak, 1),
            "heap_max_mb": round(heap_max, 1), "result": out,
        }), flush=True)

    # Bloom build: m sized for 10 M docs @ 1% fpp (m/8 ≈ 12 MB) over
    # 2,048 partitions — the r7 dense-partial shape would materialize
    # 2,048 × 12 MB ≈ 24 GiB of block storage against this 1 GiB heap.
    m, k = _bloom_params(10_000_000, 0.01)
    run(
        "bloom_build",
        f"m/8={m // 8 // (1 << 20)}MB, k={k}, P={N_PARTS}",
        lambda: int(
            _build_bloom(
                docs.repartition(N_PARTS).select(
                    F.xxhash64("text").cast("string").alias("fp")
                ),
                "fp", m, k,
            ).sum()
        ),
    )

    run(
        "frequent_tokens",
        f"capacity=256, P={N_PARTS}",
        lambda: frequent_tokens(
            docs.repartition(N_PARTS), k=10, tree_threshold=64
        ).count(),
    )

    run(
        "bpe_driver_mode",
        f"auto mode, P={N_PARTS}",
        lambda: len(train_bpe(docs.repartition(N_PARTS), num_merges=10)),
    )

    lines = [
        "## Fan-ins under a 1 GiB driver heap at P=2,048",
        "",
        f"`SPARK_GRAFT_DRIVER_MEM={HEAP}`, every input repartitioned to "
        f"{N_PARTS}",
        "partitions (32-64× this box's natural partitioning), sf0.1 "
        "documents.",
        "Peak = resettable JVM heap-pool high-water mark around each op",
        "(`tools/fanin_stress_probe.py`). The evidence is COMPLETION "
        "under a",
        "heap an unbounded fan-in would blow: driver traffic is bounded "
        "by",
        "design (bloom: final bitmap slices ≤ m/8; frequent_tokens: "
        "√P ×",
        "capacity partials; BPE: cap-bounded histogram), so raising P "
        "cannot",
        "push the driver over. (Peak-used approaches the ceiling on "
        "the later",
        "ops because a JVM only collects when pressed — it tracks "
        "allocation",
        "pressure, not live set.) For bloom this is the",
        "acceptance run for the r8 sparse-slice fan-in: the r7 shape "
        "would have",
        "pushed ~24 GiB of dense partials (P × m/8) through this heap's",
        "storage fraction.",
        "",
        f"| op | shape | wall | driver heap peak (of {heap_max:.0f} MB "
        "max) |",
        "|---|---|---|---|",
    ]
    for name, detail, dt, peak in rows:
        lines.append(f"| {name} | {detail} | {dt:.1f}s | {peak:.0f} MB |")

    from tools.mdsect import replace_section

    replace_section(os.path.join(REPO, "SCALING.md"), "fanin_stress",
                    "\n".join(lines))
    print("wrote SCALING.md (fanin_stress section)")


if __name__ == "__main__":
    main()
