"""Build-vs-probe decomposition for the r14 persisted-index entries.

The registry rows OP-D4-bm25-indexed/-batch-indexed, OP-A8-annindex,
and OP-D3-hybrid-indexed REBUILD their index every invocation (the
oracle harness needs self-contained builders), so their bench ratios
are build-dominated — the same shape OP-D4-qualityclf had before its
r12 fit/score decomposition. This probe splits the lifecycle the way
a deployment actually runs it: build ONCE, then probe repeatedly.

Prints one line per phase (min of 3 for probes, single shot for
builds) and writes the ``index-lifecycle`` section of SCALING.md.

Usage: python tools/index_lifecycle_probe.py [sf_dir]
Scratch: /tmp/spark_graft_ixlife (rebuilt each run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/spark_graft_ixlife"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from filefilter_spark.ops.pq import ann_topk_indexed, build_ann_index
    from filefilter_spark.ops.retrieval import (
        bm25_batch_topk_indexed,
        bm25_topk,
        bm25_topk_indexed,
        build_text_index,
        ranked,
        rrf_fuse,
    )
    from filefilter_spark.queries.extensions import (
        _BM25_BATCH_QUERIES,
        _BM25_TERMS,
        _query_vec,
    )
    from filefilter_spark.queries.registry import load_table
    from filefilter_spark.session import get_spark

    spark = get_spark("index_lifecycle_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    tix, aix = f"{SCRATCH}/text", f"{SCRATCH}/ann"

    def once(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    def probe(fn, reps: int = 3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn().collect()
            best = min(best, time.time() - t0)
        return best

    r = {}
    r["text_build"] = once(lambda: build_text_index(docs, tix, n_buckets=64))
    r["ann_build"] = once(
        lambda: build_ann_index(emb, aix, n_lists=16, m=8, k=16, iters=1)
    )
    r["bm25_scan"] = probe(lambda: bm25_topk(docs, list(_BM25_TERMS), k=10))
    r["bm25_probe"] = probe(
        lambda: bm25_topk_indexed(spark, tix, list(_BM25_TERMS), k=10)
    )
    r["batch_probe"] = probe(
        lambda: bm25_batch_topk_indexed(spark, tix, _BM25_BATCH_QUERIES, k=5)
    )
    r["ann_probe"] = probe(
        lambda: ann_topk_indexed(spark, aix, qv, topk=10, n_probe=4,
                                 vectors=emb)
    )

    def hybrid():
        bm = ranked(
            bm25_topk_indexed(spark, tix, list(_BM25_TERMS), k=20),
            "bm25", "doc_id",
        )
        import pyspark.sql.functions as F

        nn = ann_topk_indexed(spark, aix, qv, topk=20, n_probe=4,
                              vectors=emb).select(
            F.col("vec_id").alias("doc_id"), "dist2"
        )
        return rrf_fuse(bm, ranked(nn, "dist2", "doc_id", ascending=True),
                        id_col="doc_id", k=10)

    r["hybrid_probe"] = probe(hybrid)
    out = {k: round(v, 3) for k, v in r.items()}
    print(json.dumps({"sf_dir": sf_dir, **out}), flush=True)

    lines = [
        "## Index lifecycle: build once, probe repeatedly (r14)",
        "",
        f"The persisted-index registry rows rebuild per invocation (the",
        "oracle harness needs self-contained builders), so their bench",
        "ratios are BUILD-dominated — the qualityclf shape, decomposed",
        f"here the way a deployment runs it (`tools/index_lifecycle_probe.py`,",
        f"{sf_dir}, builds single-shot, probes min-of-3):",
        "",
        "| phase | cost | amortization |",
        "|---|---|---|",
        f"| inverted-index build | {out['text_build']:.2f}s | once per corpus (re)build |",
        f"| IVF×PQ build (16 cells, m=8) | {out['ann_build']:.2f}s | once per corpus (re)build |",
        f"| BM25 corpus scan (baseline) | {out['bm25_scan']:.2f}s | every query |",
        f"| BM25 indexed probe | {out['bm25_probe']:.2f}s | every query — pruned bucket read |",
        f"| batch BM25 indexed probe (3 queries) | {out['batch_probe']:.2f}s | one pruned read per BATCH |",
        f"| ANN indexed probe (+exact rerank) | {out['ann_probe']:.2f}s | every query — pruned cell read |",
        f"| hybrid probe (both indexes, RRF) | {out['hybrid_probe']:.2f}s | every query, zero corpus scans |",
        "",
        "At sf0.1 the corpus is small enough that a scan rivals the probe",
        "— the scheduler floor dominates both. The structural claim is",
        "what scales: the probe reads |query terms| buckets / n_probe",
        "cells (plan-pinned partition pruning, tests/test_retrieval.py",
        "and test_ops.py) while the scan reads the corpus, so at 100 TB",
        "the probe cost is unchanged and the scan is off the table. The",
        "registry rows' ratios price build+probe together; this table is",
        "the per-query cost a deployment pays after amortizing the build.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "index-lifecycle",
                    "\n".join(lines))
    print("wrote SCALING.md (index-lifecycle section)")


if __name__ == "__main__":
    main()
