"""Per-batch cost curve for the streaming near-dedup (OP-D5-neardup).

The scaling question for any streaming dedup is whether per-batch cost
grows with the SURVIVOR STORE (bad: each day slower than the last) or
stays flat in batch size (good: the store is touched only through the
band-table equi-join and the candidate-id lookup). This probe feeds a
fixed-size micro-batch stream — sf0.1's 5,000 documents split into N
equal hash-batches — through ``minhash_stream_dedup`` with the
``on_batch`` metrics hook and prints one JSON line per batch:
``{"batch_id", "seconds", "n_in", "n_survived", "store_docs"}``.

A flat ``seconds`` series while ``store_docs`` grows N× is the
evidence the SCALING.md section cites; a rising series would flag a
store-proportional term (e.g. the hot-bucket count agg, which scans
the band table — bounded-size rows, but O(store) of them; at 100 TB
that agg rides a bucketed layout instead).

Usage: python tools/neardup_stream_probe.py [n_batches] [sf_dir] [maintain_every] [op]
(pass a third arg N > 0 to run the in-stream store compaction every
N batches — the r13 maintenance loop — and price it inside the same
per-batch series; fourth arg ``semdedup`` probes the embedding mirror
``semdedup_stream_dedup`` over the embeddings table instead)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    maintain_every = int(sys.argv[3]) if len(sys.argv) > 3 else None
    op = sys.argv[4] if len(sys.argv) > 4 else "minhash"

    from pyspark.sql import functions as F

    from filefilter_spark.queries.registry import load_table
    from filefilter_spark.session import get_spark
    from filefilter_spark.streaming.jobs import (
        minhash_stream_dedup,
        semdedup_stream_dedup,
    )

    spark = get_spark("neardup_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")

    if op == "semdedup":
        rows = load_table(spark, sf_dir, "embeddings")
        split_col = "vec_id"
    else:
        rows = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        split_col = "doc_id"
    base = tempfile.mkdtemp(prefix="ffspark_neardup_probe_")
    src = f"{base}/arrivals"
    try:
        # one file per hash-batch, written oldest-first so the file
        # source processes them in batch order
        for i in range(n_batches):
            rows.filter(F.col(split_col) % n_batches == i).coalesce(
                1
            ).write.mode("append").parquet(src)
            time.sleep(1.05)  # distinct mtimes -> deterministic order

        stats: list[dict] = []

        def record(s: dict) -> None:
            stats.append(s)

        if op == "semdedup":
            from filefilter_spark.ops.similarity import build_ivf_index

            _, cents = build_ivf_index(rows, n_lists=16, method="lloyd")
            out = semdedup_stream_dedup(
                spark, src, cents, threshold=0.45,
                max_files_per_trigger=1, out_dir=f"{base}/store",
                on_batch=record, timeout_sec=1200,
                maintain_every=maintain_every or None,
                max_files_per_store=4,
            )
        else:
            out = minhash_stream_dedup(
                spark, src, threshold=0.5, shingle_n=3,
                max_files_per_trigger=1, out_dir=f"{base}/store",
                on_batch=record, timeout_sec=1200,
                maintain_every=maintain_every or None,
                max_files_per_store=4,
            )
        total_survived = out.count()
        store = 0
        for s in stats:
            store += s["n_survived"]
            print(json.dumps({**s, "store_docs": store}))
        n = len(stats)
        first = sum(s["seconds"] for s in stats[: n // 4]) / max(n // 4, 1)
        last = sum(s["seconds"] for s in stats[-(n // 4):]) / max(n // 4, 1)
        print(json.dumps({
            "n_batches": n,
            "total_survived": total_survived,
            "mean_first_quarter_s": round(first, 3),
            "mean_last_quarter_s": round(last, 3),
            "last_over_first": round(last / first, 2) if first else None,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
