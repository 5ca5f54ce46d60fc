"""Bloom-vs-anti-join probe in the regime bloom dedup was built for:
a FIXED small daily batch against a GROWING history.

Every other probe (scale_probe, crossover_probe) grows batch and
history together — a regime where the bloom path loses by design (its
fixed bitmap-build jobs dominate at toy scale, and the anti-join's
shuffle is tiny when the batch is the same size as the history). The
operator's actual target is the ingest loop: history ≫ batch, where
``dedup_against`` must shuffle EVERY history fingerprint on every
batch while ``bloom_dedup_against`` folds history into a broadcast
bitmap shuffle-free and shuffles only the bloom HITS.

This probe measures both ops at history × {1, 8, 32} (sf0.1 documents
replicated with id offsets + per-copy character rotation, so every
copy is distinct content) against a fixed 1000-doc batch (500 true
dups of history, 500 fresh), and records BOTH wall time and the
Spark-reported shuffle-write bytes per run — the bytes are the
mechanism: on this 32-thread single box the wall-clock gap is mostly
job-floor noise, but the anti-join's shuffled bytes grow linearly
with history while the bloom path's stay flat at the hit set.

Usage: python tools/bloom_regime_probe.py [max_multiplier]
Writes the ``bloom_regime`` section of SCALING.md, prints JSON lines.
Scratch: /tmp/spark_graft_bloomreg (reused across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/spark_graft_bloomreg"
BASE = "/root/testdata/sf0.1/documents.parquet"
ALPHA = "abcdefghijklmnop"
STEP = 1_000_000_000


def build_history(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = f"{SCRATCH}/hx{mult}/history.parquet"
    if os.path.exists(f"{out}/_SUCCESS"):
        return out
    base = spark.read.parquet(BASE)
    parts = []
    for k in range(mult):
        rot = ALPHA[k % len(ALPHA):] + ALPHA[: k % len(ALPHA)]
        parts.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(k * STEP))
            .withColumn("text", F.translate(F.col("text"), ALPHA, rot))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(8, 4 * mult)).write.mode("overwrite").parquet(out)
    return out


def build_batch(spark) -> str:
    """Fixed 1000-doc batch: 500 dups of history copy k=0 (identical
    text, new ids) + 500 fresh (a token no rotation produces)."""
    from pyspark.sql import functions as F

    out = f"{SCRATCH}/batch.parquet"
    if os.path.exists(f"{out}/_SUCCESS"):
        return out
    base = spark.read.parquet(BASE).orderBy("doc_id").limit(1000)
    dup = (
        base.limit(500)
        .withColumn("doc_id", F.col("doc_id") + F.lit(900 * STEP))
    )
    fresh = (
        base.orderBy(F.desc("doc_id")).limit(500)
        .withColumn("doc_id", F.col("doc_id") + F.lit(901 * STEP))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzfreshzz")))
    )
    dup.unionByName(fresh).coalesce(4).write.mode("overwrite").parquet(out)
    return out


def shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across completed stages, from the
    UI REST API (the probe session enables spark.ui)."""
    app = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl  # see skew_probe: never hardcode 4040
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mults = [m for m in (1, 8, 32) if m <= max_mult]

    from filefilter_spark.ops.dedup import bloom_dedup_against, dedup_against
    from filefilter_spark.session import get_spark

    spark = get_spark("bloom_regime_probe", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SCRATCH, exist_ok=True)
    batch = spark.read.parquet(build_batch(spark))
    n_batch = batch.count()

    results = []
    for m in mults:
        seen = spark.read.parquet(build_history(spark, m))
        n_seen = seen.count()
        row: dict = {"mult": m, "n_seen": n_seen, "n_batch": n_batch}
        for label, fn in (
            ("antijoin", lambda: dedup_against(batch, seen)),
            ("bloom", lambda: bloom_dedup_against(batch, seen)),
        ):
            fn().write.format("noop").mode("overwrite").save()  # warm
            best, rows_out, sbytes = float("inf"), None, None
            for _ in range(2):
                b0 = shuffle_write_bytes(spark)
                t0 = time.time()
                out = fn()
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                sbytes = shuffle_write_bytes(spark) - b0
                best = min(best, dt)
            rows_out = fn().count()
            row[label] = {"sec": round(best, 3), "shuffle_bytes": sbytes,
                          "rows": rows_out}
            print(f"x{m:<3} {label:<9} {best:6.2f}s  "
                  f"shuffle {sbytes/1e6:8.2f} MB  rows {rows_out}",
                  flush=True)
        assert row["antijoin"]["rows"] == row["bloom"]["rows"], row
        results.append(row)
        print(json.dumps(row), flush=True)

    lines = [
        "## Bloom dedup in its target regime (fixed batch, growing history)",
        "",
        "`dedup_against` (plain anti-join) vs `bloom_dedup_against`,",
        "fixed 1000-doc batch (500 dups / 500 fresh) against history ×"
        f"{{{', '.join(map(str, mults))}}}",
        "(sf0.1 documents, id-offset + rotated copies). Wall time is",
        "best-of-2 warm; `shuffle` is Spark-reported shuffle-write bytes",
        "for one run (`tools/bloom_regime_probe.py`). Both ops return",
        "identical row counts (asserted). The BYTES column is the",
        "mechanism: the anti-join shuffles every history fingerprint per",
        "batch (grows with history), the bloom path shuffles only the",
        "bloom-hit sliver (flat) — on a real cluster that byte ratio is",
        "network traffic per ingest batch; on this single box the",
        "wall-clock gap sits under the per-job floor.",
        "",
        "| history | docs | anti-join s / shuffle MB | bloom s / shuffle MB | out rows |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        a, b = r["antijoin"], r["bloom"]
        lines.append(
            f"| ×{r['mult']} | {r['n_seen']:,} "
            f"| {a['sec']:.2f}s / {a['shuffle_bytes']/1e6:.2f} "
            f"| {b['sec']:.2f}s / {b['shuffle_bytes']/1e6:.2f} "
            f"| {a['rows']} |"
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "bloom_regime",
                    "\n".join(lines))
    print("wrote SCALING.md (bloom_regime section)")


if __name__ == "__main__":
    main()
