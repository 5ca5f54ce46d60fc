"""Text-index growth probe (r16): measure probe cost vs corpus growth
over a FIXED n_buckets layout — the curve TEXT_GROWTH_REBUCKET encodes.

The BM25 layout has no frozen model (scores stay exact at any growth);
what freezes is the bucket SIZING: a probe reads its terms' whole
buckets, each holding 1/n_buckets of the entire corpus's postings, so
per-term probe cost grows ~linearly with n_docs/built_n_docs. This
probe builds on the sf0.1 documents table (n_buckets=64, sized for
it), streams scaled copies in to 4x/8x/16x growth, times
``bm25_topk_indexed`` at each point, then REBUCKETS (rebuild at the
grown size with n_buckets scaled to match) and times again — the
recovery the ``action="rebucket"`` recommendation promises.

Timing discipline: run on a quiet box; each point is the mean of
QUERIES warm reps after one discarded cold rep.
Usage: python tools/text_index_growth_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [["data", "system"], ["model", "training"], ["query", "engine"]]
N_BUCKETS = 64


def probe_seconds(spark, ix) -> float:
    from filefilter_spark.ops.retrieval import bm25_topk_indexed

    # one discarded cold rep (file listing, codegen), then timed reps
    bm25_topk_indexed(spark, ix, QUERIES[0], k=10).collect()
    t0 = time.time()
    for terms in QUERIES:
        bm25_topk_indexed(spark, ix, terms, k=10).collect()
    return (time.time() - t0) / len(QUERIES)


def main() -> None:
    import pyspark.sql.functions as F

    from filefilter_spark.ops.retrieval import (
        build_text_index,
        text_index_growth,
    )
    from filefilter_spark.session import get_spark
    from filefilter_spark.streaming.jobs import text_index_stream_ingest

    spark = get_spark("text_index_growth_probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="text_growth_")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    n1 = docs.count()
    ix = f"{root}/ix"
    build_text_index(docs, ix, n_buckets=N_BUCKETS)

    print(f"growth  n_docs    action     probe_s")
    base_s = probe_seconds(spark, ix)
    print(f"x1      {n1:<9} ok         {base_s:.2f}")

    results = [(1, base_s)]
    grown = 1
    signals = []
    src = f"{root}/src"  # ONE source dir: the durable checkpoint pins
    # the stream's base path, so growth arrives as appended files
    for target in (4, 8, 16):
        for k in range(grown, target):
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                "text",
            ).coalesce(4).write.mode("append").parquet(src)
        text_index_stream_ingest(
            spark, src, ix, max_files_per_trigger=8,
            on_batch=signals.append,
        )
        grown = target
        s = probe_seconds(spark, ix)
        act = signals[-1]["action"] if signals else "?"
        print(f"x{target:<6} {signals[-1]['n_docs']:<9} {act:<10} {s:.2f}")
        results.append((target, s))

    # REBUCKET: rebuild at the grown size with n_buckets scaled to the
    # growth — per-term bucket share returns to the build's intent
    all_docs = spark.read.parquet(src).unionByName(docs)
    ix2 = f"{root}/ix_rebucketed"
    build_text_index(all_docs, ix2, n_buckets=N_BUCKETS * 16)
    s2 = probe_seconds(spark, ix2)
    print(f"x16-rebucketed (n_buckets {N_BUCKETS}->{N_BUCKETS * 16})"
          f"          {s2:.2f}")

    print(f"\nsignal at x16: {text_index_growth(grown * n1, n1)}")
    print(f"probe-cost growth x1->x16 (fixed buckets): "
          f"{results[-1][1] / results[0][1]:.2f}x; rebucketed: "
          f"{s2 / results[0][1]:.2f}x of baseline")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
