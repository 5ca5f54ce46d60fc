"""Fuzzy staleness calibration probe (r16, VERDICT r15 #3): measure
unseen_gram_frac → candidates-per-batch blowup, the curve the
``fuzzy_index_staleness`` thresholds encode.

Method (the ANN drift probe's applied to ``fuzzy_index_stream_ingest``):
build an Ed-Join layout on a corpus drawn from vocabulary A, then for
each drift level p stream TWO batches whose strings draw each word
from a SMALL zipf-weighted NEW vocabulary with probability p (small +
zipf because that is what real vocabulary drift looks like — a few
now-common new tokens — and common unseen grams are exactly what kills
prefix selectivity; rare unseen grams would collide with nothing and
hide the effect). Batch 1 populates drifted postings; batch 2's
metrics are the measurement: its prefixes collide against a store that
already carries the drifted vocabulary.

Per level we record batch 2's (unseen_gram_frac, candidates/row,
seconds). The REBUILD row repeats the worst drift level against an
index rebuilt on corpus ∪ batch-1 — the frozen order re-learns the new
vocabulary's rarities, so candidates/row must fall back toward the
fresh-build baseline, proving the signal's recommended action works.

Exactness is NOT at stake anywhere here (the frozen order stays total;
pairs are exact at every drift level — the r15 suite pins that); this
probe prices the cost curve and checks the shipped thresholds split it.
Usage: python tools/fuzzy_drift_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CORPUS = 3000
N_BATCH = 600
WORDS_PER_STRING = 6
VOCAB_A = 400  # build-time vocabulary
VOCAB_B = 50   # drift vocabulary: small => its grams are COMMON


def make_vocab(rng, n, alphabet):
    return [
        "".join(rng.choice(list(alphabet), size=rng.integers(4, 8)))
        for _ in range(n)
    ]


def zipf_weights(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def make_strings(rng, n, vocab_a, vocab_b, p_drift, wa, wb):
    out = []
    for _ in range(n):
        words = []
        for _ in range(WORDS_PER_STRING):
            if rng.random() < p_drift:
                words.append(vocab_b[rng.choice(len(vocab_b), p=wb)])
            else:
                words.append(vocab_a[rng.choice(len(vocab_a), p=wa)])
        out.append(" ".join(words))
    return out


def main() -> None:
    from filefilter_spark.ops.dedup import build_fuzzy_index
    from filefilter_spark.session import get_spark
    from filefilter_spark.streaming.jobs import (
        FUZZY_UNSEEN_REBUILD,
        FUZZY_UNSEEN_WARN,
        fuzzy_index_stream_ingest,
    )

    spark = get_spark("fuzzy_drift_probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fuzzy_drift_")
    rng = np.random.default_rng(17)

    vocab_a = make_vocab(rng, VOCAB_A, "abcdefghijklmnopqrstuvwxyz")
    vocab_b = make_vocab(rng, VOCAB_B, "0123456789")
    wa, wb = zipf_weights(VOCAB_A), zipf_weights(VOCAB_B)

    corpus = make_strings(rng, N_CORPUS, vocab_a, vocab_b, 0.0, wa, wb)
    corpus_rows = [(i, s) for i, s in enumerate(corpus)]
    df_corpus = spark.createDataFrame(corpus_rows, "doc_id long, s string")

    def run_level(p_drift: float, ix: str, batch1_extra=None):
        """Build (or reuse) the index at ``ix``, stream 2 drift-p
        batches, return batch 2's metrics."""
        b1 = make_strings(rng, N_BATCH, vocab_a, vocab_b, p_drift, wa, wb)
        b2 = make_strings(rng, N_BATCH, vocab_a, vocab_b, p_drift, wa, wb)
        src = f"{ix}__src"
        spark.createDataFrame(
            [(100_000 + i, s) for i, s in enumerate(b1)],
            "doc_id long, s string",
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(200_000 + i, s) for i, s in enumerate(b2)],
            "doc_id long, s string",
        ).coalesce(1).write.mode("append").parquet(src)
        batches = []
        fuzzy_index_stream_ingest(
            spark, src, ix, max_files_per_trigger=1,
            on_batch=batches.append,
        )
        applied = [b for b in batches if b["applied"] and b["n_in"]]
        last = applied[-1]
        return {
            "unseen_frac": last["unseen_gram_frac"],
            "cands_per_row": last["n_candidates"] / last["n_in"],
            "action": last["action"],
            "seconds": last["seconds"],
        }, b1

    print("drift_p  unseen_frac  cands/row  action                 sec")
    rows = []
    worst_b1 = None
    for p in (0.0, 0.25, 0.5, 0.75, 1.0):
        ix = f"{root}/ix_p{int(p * 100)}"
        build_fuzzy_index(df_corpus, ix, max_dist=2, q=2, n_buckets=16)
        m, b1 = run_level(p, ix)
        rows.append((p, m))
        if p == 1.0:
            worst_b1 = b1
        print(f"{p:<8} {m['unseen_frac']:<12} {m['cands_per_row']:<10.2f} "
              f"{m['action']:<22} {m['seconds']:.1f}")

    # REBUILD at the worst drift: index rebuilt on corpus ∪ the drifted
    # batch-1 (the new vocabulary enters the frozen order), then stream
    # a fresh drift-1.0 batch — candidates/row must fall back toward
    # the p=0 baseline.
    ix_rb = f"{root}/ix_rebuilt"
    df_rb = df_corpus.unionByName(spark.createDataFrame(
        [(100_000 + i, s) for i, s in enumerate(worst_b1)],
        "doc_id long, s string",
    ))
    build_fuzzy_index(df_rb, ix_rb, max_dist=2, q=2, n_buckets=16)
    b3 = make_strings(rng, N_BATCH, vocab_a, vocab_b, 1.0, wa, wb)
    src_rb = f"{ix_rb}__src"
    spark.createDataFrame(
        [(300_000 + i, s) for i, s in enumerate(b3)],
        "doc_id long, s string",
    ).coalesce(1).write.parquet(src_rb)
    batches = []
    fuzzy_index_stream_ingest(
        spark, src_rb, ix_rb, on_batch=batches.append,
    )
    last = [b for b in batches if b["applied"] and b["n_in"]][-1]
    print(f"rebuilt  {last['unseen_gram_frac']:<12} "
          f"{last['n_candidates'] / last['n_in']:<10.2f} "
          f"{last['action']:<22} {last['seconds']:.1f}"
          f"   <- worst drift after rebuild")

    # SELF-HEAL (r16): same worst-drift stream against the ORIGINAL
    # stale index, but the loop acts on its own signal
    # (rebuild_on_drift=True): the drift batch triggers an in-loop
    # gramdf+postings re-derivation at its boundary, so the NEXT
    # drift-1.0 batch probes under the refreshed order and its
    # cands/row must fall back toward baseline with no operator.
    ix_sh = f"{root}/ix_selfheal"
    build_fuzzy_index(df_corpus, ix_sh, max_dist=2, q=2, n_buckets=16)
    src_sh = f"{ix_sh}__src"
    b4 = make_strings(rng, N_BATCH, vocab_a, vocab_b, 1.0, wa, wb)
    b5 = make_strings(rng, N_BATCH, vocab_a, vocab_b, 1.0, wa, wb)
    for base_id, b in ((400_000, b4), (500_000, b5)):
        spark.createDataFrame(
            [(base_id + i, s) for i, s in enumerate(b)],
            "doc_id long, s string",
        ).coalesce(1).write.mode("append").parquet(src_sh)
    sh = []
    fuzzy_index_stream_ingest(
        spark, src_sh, ix_sh, max_files_per_trigger=1,
        on_batch=sh.append, rebuild_on_drift=True,
    )
    sh_applied = [b for b in sh if b["applied"] and b["n_in"]]
    sh_first, sh_last = sh_applied[0], sh_applied[-1]
    print(f"selfheal batch1: unseen={sh_first['unseen_gram_frac']} "
          f"cands/row={sh_first['n_candidates'] / sh_first['n_in']:.2f} "
          f"rebuilt={sh_first['rebuilt']}")
    print(f"selfheal batch2: unseen={sh_last['unseen_gram_frac']} "
          f"cands/row={sh_last['n_candidates'] / sh_last['n_in']:.2f} "
          f"action={sh_last['action']} rebuilt={sh_last['rebuilt']}")

    base = rows[0][1]["cands_per_row"]
    print(f"\nbaseline (p=0) cands/row: {base:.2f}; "
          f"thresholds WARN={FUZZY_UNSEEN_WARN} "
          f"REBUILD={FUZZY_UNSEEN_REBUILD}")
    below = [m for _, m in rows if m["unseen_frac"] < FUZZY_UNSEEN_WARN]
    above = [m for _, m in rows
             if m["unseen_frac"] >= FUZZY_UNSEEN_REBUILD]
    ok = (
        below and above
        and max(m["cands_per_row"] for m in below) <= 2.0 * base
        and min(m["cands_per_row"] for m in above) >= 2.0 * base
        and last["n_candidates"] / last["n_in"] <= 2.0 * base
        and sh_first["rebuilt"]
        and not sh_last["rebuilt"]
        and sh_last["n_candidates"] / sh_last["n_in"] <= 2.0 * base
    )
    print(f"calibration: below-WARN blowup <= 2x base, above-REBUILD "
          f">= 2x base, rebuild restores (offline AND in-loop): "
          f"{'OK' if ok else 'CHECK'}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
