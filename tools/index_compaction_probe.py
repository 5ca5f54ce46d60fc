"""Streaming-index fragmentation: probe cost before/after compaction.

`ivfpq_stream_ingest` appends one parquet file set per cell per
micro-batch, so a long-lived index accumulates small files and every
probe pays file listing + one task + one footer per file. This probe
builds a deliberately fragmented index (64 single-file micro-batches
over the sf0.1 embeddings), compacts it with
`ops.layout.compact_partitioned` (cell= layout preserved), and times
an identical IVF×PQ top-10 probe (4/16 cells, refine=5) on both
layouts — best-of-3 warm, plus the file counts that explain the gap.

Usage: python tools/index_compaction_probe.py
Writes the ``compaction`` section of SCALING.md and prints JSON.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def cell_files(d: str) -> int:
    return len(glob.glob(f"{d}/cell=*/*.parquet"))


def main() -> None:
    from filefilter_spark.ops.layout import compact_partitioned
    from filefilter_spark.ops.pq import (
        build_ivfpq_index, fit_pq_codebooks, ivfpq_topk,
    )
    from filefilter_spark.ops.similarity import build_ivf_index
    from filefilter_spark.session import get_spark

    spark = get_spark("index_compaction_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = fit_pq_codebooks(emb, m=8, k=16, iters=0)
    _, cents = build_ivf_index(emb, n_lists=16, method="lloyd")
    query = [float(x) for x in emb.filter("vec_id = 0")
             .collect()[0]["embedding"]]

    base = tempfile.mkdtemp(prefix="ffspark_compact_probe_")
    try:
        # fragmented: 64 single-file micro-batches, one file set per
        # cell per batch — the long-lived streaming shape
        src = f"{base}/arrivals"
        emb.repartition(64).write.parquet(src)
        from filefilter_spark.streaming.jobs import ivfpq_stream_ingest

        frag = f"{base}/frag"
        ivfpq_stream_ingest(spark, src, books, cents,
                            max_files_per_trigger=1, out_dir=frag)
        comp = f"{base}/comp"
        t0 = time.time()
        compact_partitioned(spark, frag, comp, "cell", ["vec_id"])
        compact_sec = time.time() - t0

        def probe(d: str) -> float:
            idx = spark.read.parquet(d)
            best = float("inf")
            for i in range(4):
                t0 = time.time()
                ivfpq_topk(idx, books, cents, query, topk=10, n_probe=4,
                           refine=5, vectors=emb).collect()
                if i:  # first run warms
                    best = min(best, time.time() - t0)
            return best

        res = {
            "files_fragmented": cell_files(frag),
            "files_compacted": cell_files(comp),
            "probe_fragmented_sec": round(probe(frag), 3),
            "probe_compacted_sec": round(probe(comp), 3),
            "compact_sec": round(compact_sec, 2),
        }
        print(json.dumps(res), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    from tools.mdsect import replace_section

    lines = [
        "## Streaming-index compaction: probe cost vs fragmentation",
        "",
        "64 single-file micro-batches of the sf0.1 embeddings ingested",
        "into the cell-partitioned IVF×PQ code table, then",
        "`compact_partitioned` (cell= layout preserved, vec_id-sorted).",
        "Probe = top-10, 4/16 cells, refine=5, best-of-3 warm",
        "(`tools/index_compaction_probe.py`; codes proven identical",
        "pre/post by the OP-D5-ivfpq-compact exact oracle).",
        "",
        "| layout | files | probe |",
        "|---|---|---|",
        f"| fragmented (per-batch appends) | {res['files_fragmented']} "
        f"| {res['probe_fragmented_sec']}s |",
        f"| compacted | {res['files_compacted']} "
        f"| {res['probe_compacted_sec']}s |",
        "",
        f"Compaction itself: one range-shuffle job, "
        f"{res['compact_sec']}s here. The probe reads n_probe/n_lists",
        "of the files either way (partition pruning survives — the",
        "partition column leads the range keys and write.partitionBy",
        "keeps the dirs); fragmentation multiplies per-file fixed costs",
        "(listing, footer, task) by the micro-batch count, and at a",
        "real ingest cadence (thousands of batches) that term dominates",
        "the probe. Run it on the cadence the file-count curve",
        "suggests, not per-batch.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(os.path.join(repo, "SCALING.md"), "compaction",
                    "\n".join(lines))
    print("wrote SCALING.md (compaction section)")


if __name__ == "__main__":
    main()
