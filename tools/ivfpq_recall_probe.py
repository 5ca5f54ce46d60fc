"""IVF×PQ recall@10 vs n_probe at scale — the n_probe sizing table.

The committed recall evidence for OP-D3-ivfpq (0.9) is sf0.001/sf0.01
with 16 coarse cells — small enough that 4 probed cells hold most of
the corpus. This probe measures how recall@10 actually degrades with
n_probe ∈ {1, 2, 4, 8} when the corpus grows to ×8 and ×64 of sf0.1
(16k / 128k vectors) while the index keeps its registry shape
(n_lists=16, m=8, k=16, 1 Lloyd round, refine=5 exact rerank), plus
one ×64 row with n_lists=64 — the sqrt(n)-ish cell count a deployment
would choose — so the table shows both "what happens if you freeze the
index and grow the data" and "what the right-sized index buys".

Recall is averaged over 8 query vectors (vec_id 0..7 of the base
corpus) against each scale's EXACT L2 top-10 (DuckDB list_distance on
the same parquet — the same ground truth the registry's recall oracle
uses). Scaled fixtures come verbatim from tools/scale_probe.py
(id-offset copies, norm-preserving cyclic vector shifts — so copies
are decorrelated, not duplicate mass).

Usage: python tools/ivfpq_recall_probe.py
Writes the ``ivfpq_recall`` section of SCALING.md and prints one JSON
line per (scale, n_lists, n_probe) cell.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import build_scaled  # noqa: E402

N_QUERIES = 8
N_PROBES = [1, 2, 4, 8]
# (multiplier, n_lists): the frozen registry shape at both scales,
# plus the right-sized index at the largest
CONFIGS = [(8, 16), (64, 16), (64, 64)]
# refine (shortlist = refine x topk) sweep at the largest scale: the
# first sweep showed recall FALLING with n_probe at fixed refine=5 —
# more probed cells contaminate a fixed-size ADC shortlist — so the
# lever that matters at scale is shortlist size, measured here.
REFINES = [5, 20, 50]
REFINE_PROBES = [4, 8]


def exact_top10(path: str, qv: list[float]) -> list[int]:
    import duckdb

    glob = f"{path}/*.parquet" if os.path.isdir(path) else path
    lit = "[" + ",".join(repr(float(x)) for x in qv) + "]::DOUBLE[]"
    rows = duckdb.sql(
        f"SELECT vec_id FROM read_parquet('{glob}') "
        f"ORDER BY list_distance(embedding::DOUBLE[], {lit}), vec_id "
        f"LIMIT 10"
    ).fetchall()
    return [r[0] for r in rows]


def main() -> None:
    from filefilter_spark.ops.pq import build_ivfpq_index, ivfpq_topk
    from filefilter_spark.session import get_spark

    spark = get_spark("ivfpq_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # query vectors: base-corpus rows, present identically at every
    # scale (copy k=0 is the untouched base)
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in base.filter(f"vec_id < {N_QUERIES}").collect()
    }

    results: dict[tuple[int, int], dict[int, float]] = {}
    refine_rows: list[tuple[int, int, float]] = []
    for mult, n_lists in CONFIGS:
        path = build_scaled(spark, "embeddings", "vec_id", mult)
        emb = spark.read.parquet(path)
        indexed, books, cents = build_ivfpq_index(
            emb, n_lists=n_lists, m=8, k=16, iters=1
        )
        indexed = indexed.cache()
        indexed.count()
        truth = {vid: set(exact_top10(path, qv))
                 for vid, qv in queries.items()}

        def recall_at(n_probe: int, refine: int) -> float:
            hits = 0
            for vid, qv in queries.items():
                got = {
                    r["vec_id"]
                    for r in ivfpq_topk(
                        indexed, books, cents, qv,
                        topk=10, n_probe=n_probe, refine=refine,
                        vectors=emb,
                    ).collect()
                }
                hits += len(got & truth[vid])
            return hits / (10 * N_QUERIES)

        for n_probe in N_PROBES:
            recall = recall_at(n_probe, 5)
            results[(mult, n_lists)] = results.get((mult, n_lists), {})
            results[(mult, n_lists)][n_probe] = recall
            print(json.dumps({
                "mult": mult, "n_vectors": 2000 * mult,
                "n_lists": n_lists, "n_probe": n_probe, "refine": 5,
                "recall_at_10": round(recall, 4),
            }), flush=True)
        if (mult, n_lists) == CONFIGS[-1]:
            for refine in REFINES:
                for n_probe in REFINE_PROBES:
                    recall = recall_at(n_probe, refine)
                    refine_rows.append((refine, n_probe, recall))
                    print(json.dumps({
                        "mult": mult, "n_lists": n_lists,
                        "n_probe": n_probe, "refine": refine,
                        "recall_at_10": round(recall, 4),
                    }), flush=True)
        indexed.unpersist()

    lines = [
        "## IVF×PQ recall@10 vs n_probe / refine at scale",
        "",
        "Average over 8 base-corpus query vectors vs each scale's exact",
        "L2 top-10 (DuckDB ground truth); index m=8, k=16, 1 Lloyd",
        "round, refine=5 exact rerank — the OP-D3-ivfpq registry shape.",
        "Fixtures: ×8/×64 of sf0.1 embeddings (16k/128k vectors, 64-d),",
        "decorrelated copies (`tools/ivfpq_recall_probe.py`). NB the",
        "synthetic embeddings carry little cluster structure, so these",
        "are pessimistic floors; the RELATIVE effects are the guidance.",
        "",
        "| corpus | n_lists | " + " | ".join(
            f"n_probe={p}" for p in N_PROBES) + " |",
        "|---|---|" + "---|" * len(N_PROBES),
    ]
    for (mult, n_lists), recs in results.items():
        cells = " | ".join(f"{recs[p]:.2f}" for p in N_PROBES)
        lines.append(f"| ×{mult} ({2000 * mult // 1000}k) | {n_lists} "
                     f"| {cells} |")
    lines += [
        "",
        "Recall FALLS with n_probe at fixed refine=5 and falls with",
        "corpus size: the ADC shortlist (refine×topk candidates) is the",
        "binding constraint — extra probed cells add coarse-ADC",
        "near-misses that crowd true neighbors out of a fixed-size",
        "shortlist before the exact rerank sees them. The lever at",
        "scale is the shortlist, not the probe count:",
        "",
        f"| ×{CONFIGS[-1][0]} n_lists={CONFIGS[-1][1]} | "
        + " | ".join(f"refine={r}" for r in REFINES) + " |",
        "|---|" + "---|" * len(REFINES),
    ]
    for n_probe in REFINE_PROBES:
        cells = " | ".join(
            f"{rec:.2f}" for r in REFINES
            for rf, np_, rec in refine_rows if rf == r and np_ == n_probe
        )
        lines.append(f"| n_probe={n_probe} | {cells} |")
    lines += [
        "",
        "Guidance (OP-D3-ivfpq): keep n_probe modest (2–4 of 16, or",
        "4–8 of 64) and SCALE refine with corpus size — refine≈50 at",
        "128k vectors restores recall@10 to 0.9 (the sf0.01 level) at",
        "the cost of refine×topk point lookups, still O(k) per query.",
    ]
    from tools.mdsect import replace_section

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(os.path.join(repo, "SCALING.md"), "ivfpq_recall",
                    "\n".join(lines))
    print("wrote SCALING.md (ivfpq_recall section)")


if __name__ == "__main__":
    main()
