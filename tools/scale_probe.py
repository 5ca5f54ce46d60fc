"""Empirical scaling probe: how do the headline ops grow with data?

Builds ×1/×2/×4/×8 copies of the sf0.1 corpora (id-offset unions, so
near-dup structure is preserved within each copy and introduced across
copies), times the scale-sensitive operators at each size, and fits a
log-log slope: slope ≈ 1 means linear scaling, ≈ 2 means quadratic —
the thing that decides whether an operator survives 100 TB.

Usage: python tools/scale_probe.py [max_multiplier]
Writes one JSON line per op and a Markdown summary to SCALING.md.
Scratch data goes to /tmp/spark_graft_scale (regenerated on demand).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_scale"


ALPHA = "abcdefghijklmnop"


def build_scaled(spark, table: str, id_col: str, mult: int) -> str:
    """Union `mult` id-offset copies of a base table, written once.

    Text columns get a per-copy bijective character rotation so copies
    are textually independent: within-copy near-dup structure (and so
    pair density) is preserved, but no cross-copy similarity is
    introduced. Without this, ×m duplication gives every doc m-1 exact
    twins and the *output* of every near-dup op grows ~m² — the slope
    would measure output explosion, not operator scaling."""
    out = f"{SCRATCH}/{table}_x{mult}.parquet"
    if os.path.exists(f"{out}/_SUCCESS"):  # not bare exists(): a killed
        # run leaves a partial dir that would silently poison every
        # published slope
        return out
    from pyspark.sql import functions as F

    from filefilter_spark.queries.registry import load_table

    base = load_table(spark, BASE_SF, table)
    text_cols = [f.name for f, t in zip(base.schema.fields, base.dtypes)
                 if t[1] == "string" and f.name == "text"]
    vec_cols = [f.name for f in base.schema.fields
                if f.dataType.simpleString().startswith("array")]
    parts = []
    for k in range(mult):
        p = base.withColumn(id_col, F.col(id_col) + F.lit(k * 1_000_000_000))
        rot = ALPHA[k % len(ALPHA):] + ALPHA[: k % len(ALPHA)]
        for c in text_cols:
            p = p.withColumn(c, F.translate(F.col(c), ALPHA, rot))
        for c in vec_cols:
            if k:  # cyclic shift: norm-preserving, decorrelates copies
                p = p.withColumn(
                    c,
                    F.concat(F.slice(F.col(c), k + 1, 10_000),
                             F.slice(F.col(c), 1, k)),
                )
        parts.append(p)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # Spread over enough files that every scale point starts from a
    # parallel scan (the testdata's single-row-group layout would
    # otherwise serialize the map side and muddy the slope).
    df.repartition(8 * mult).write.mode("overwrite").parquet(out)
    return out


def timed(fn, warm: bool = True, reps: int = 2) -> float:
    """Warm once, report best-of-``reps`` — a single timed shot is too
    exposed to transient scheduler/GC noise and one bad sample poisons
    a log-log slope (a 4x outlier at x2 reads as a fake quadratic)."""
    if warm:
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mults = [m for m in (1, 2, 4, 8, 16) if m <= max_mult]

    from filefilter_spark.ops.corpus import (
        chunk_documents,
        contamination,
        decontaminate,
        pack_sequences,
        quota_sample,
        temperature_sample,
    )
    from filefilter_spark.ops.bpe import char_pair_counts, word_histogram
    from filefilter_spark.ops.dedup import (
        bloom_dedup_against,
        boilerplate_ratio,
        dedup_against,
        duplicate_spans,
        edit_distance_pairs,
        exact_dedup,
        keep_best,
        line_dedup,
        minhash_near_dup,
        token_jaccard_pairs,
    )
    from filefilter_spark.ops.similarity import lsh_cosine_pairs, quantize_embeddings
    from filefilter_spark.ops.retrieval import bm25_topk
    from filefilter_spark.ops.sessions import session_stats
    from filefilter_spark.ops.sketch import frequent_tokens
    from filefilter_spark.ops.text import (
        bigram_nll,
        gopher_repetition,
        quality_score,
        tfidf_top_terms,
    )
    from filefilter_spark.session import get_spark

    from pyspark.sql import functions as _F

    # The OP-D2-lines registry fixture itself — imported, not copied,
    # so the probe measures exactly the corpus shape the correctness
    # gate verifies.
    from filefilter_spark.queries.extensions import multiline_of as _multiline

    def _seen_new(d):
        # Daily-ingest shape at every scale: evens are history, odds +
        # re-ingested evens are the batch (~33% of the batch are dups).
        seen = d.filter(_F.col("doc_id") % 2 == 0)
        new = d.filter(_F.col("doc_id") % 2 == 1).unionByName(
            d.filter((_F.col("doc_id") % 4 == 0)).selectExpr(
                "doc_id + 7000000000 AS doc_id", "upper(text) AS text",
                "lang", "source", "n_chars",
            )
        )
        return new, seen

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[int, float]] = {}
    rows: dict[str, dict[int, int]] = {}

    for m in mults:
        docs_path = build_scaled(spark, "documents", "doc_id", m)
        line_path = build_scaled(spark, "lineitem", "l_orderkey", m)
        emb_path = build_scaled(spark, "embeddings", "vec_id", m)
        ev_path = build_scaled(spark, "events", "event_id", m)
        docs = spark.read.parquet(docs_path)
        line = spark.read.parquet(line_path)
        emb = spark.read.parquet(emb_path)
        events = spark.read.parquet(ev_path)
        n_docs = docs.count()

        from pyspark.sql import functions as F

        # Same configurations as the registered OP-D* entries, so the
        # slopes describe exactly what the correctness gate verifies.
        ops = {
            "exact_dedup": lambda d=docs: noop_write(
                exact_dedup(d, id_col="doc_id", text_col="text")
            ),
            "minhash_lsh": lambda d=docs: noop_write(
                minhash_near_dup(d, id_col="doc_id", text_col="text",
                                 threshold=0.5, shingle_n=3)
            ),
            "jaccard_pairs": lambda d=docs: noop_write(
                token_jaccard_pairs(d, id_col="doc_id", text_col="text",
                                    threshold=0.5, shingle_n=3)
            ),
            # fixed r: the documented QUADRATIC contrast (occupancy
            # grows with n once n > 2^r * target) — kept to show why
            # auto sizing exists
            "embed_lsh_fixed_r": lambda d=emb: noop_write(
                lsh_cosine_pairs(d, threshold=0.45, n_planes=4, n_tables=12)
            ),
            # auto at a loose threshold: n^(1+rho) with rho ~ 0.5 —
            # the LSH similarity-join law, not an implementation bug
            "embed_lsh_auto_t45": lambda d=emb: noop_write(
                lsh_cosine_pairs(d, threshold=0.45, n_planes="auto")
            ),
            # auto at a production near-dup threshold: rho -> 0,
            # near-linear
            "embed_lsh_auto_t85": lambda d=emb: noop_write(
                lsh_cosine_pairs(d, threshold=0.85, n_planes="auto")
            ),
            "q1_aggregate": lambda d=line: noop_write(
                d.filter(F.col("l_shipdate") <= "1998-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0
                     ).alias("sum_base"),
                    F.count("*").alias("cnt"),
                )
            ),
            # corpus-assembly tier: contamination is a postings
            # broadcast-semi-join (benchmark side constant-size);
            # tf-idf shuffles postings once then windows over the
            # (groups x vocab)-bounded tf rows; packing is one
            # per-shard window shuffle. All expected ~linear.
            "contamination": lambda d=docs: noop_write(
                contamination(d, d.filter(F.col("doc_id") % 50 == 0))
            ),
            "tfidf_top_terms": lambda d=docs: noop_write(tfidf_top_terms(d)),
            "pack_sequences": lambda d=docs: noop_write(
                pack_sequences(d, "n_chars", 4096)
            ),
            # round-5 additions. line_dedup: two line-granularity
            # shuffles, expected linear. bigram_nll: two count aggs +
            # a model join bounded by observed-bigram count. bloom vs
            # plain incremental dedup: same output, different physics —
            # the bloom line should stay at/below the anti-join line
            # as the seen side grows.
            "line_dedup": lambda d=docs: noop_write(
                line_dedup(_multiline(d))
            ),
            "bigram_nll": lambda d=docs: noop_write(bigram_nll(d)),
            "incremental_anti": lambda d=docs: noop_write(
                dedup_against(*_seen_new(d))
            ),
            "incremental_bloom": lambda d=docs: noop_write(
                bloom_dedup_against(*_seen_new(d))
            ),
            "quota_sample": lambda d=docs: noop_write(
                quota_sample(d, quota=max(1, n_docs // 20))
            ),
            # newest round-5 ops: chunking and quantization are
            # shuffle-free projections (expected flat/linear);
            # decontaminate is the contamination broadcast-semi plus an
            # id anti-join; heavy-hitters is the sketch + bounded
            # recount (per-partition summaries, expected flat).
            "chunk_documents": lambda d=docs: noop_write(
                chunk_documents(d, chunk_tokens=64, overlap=16)
            ),
            "quantize_embeddings": lambda d=emb: noop_write(
                quantize_embeddings(d)
            ),
            "decontaminate": lambda d=docs: noop_write(
                decontaminate(d, d.filter(_F.col("doc_id") % 50 == 0),
                              max_contamination=0.1)
            ),
            "heavy_hitters": lambda d=docs: frequent_tokens(
                d, k=10, capacity=1024
            ).count(),
            # round-6 additions: substring-level duplication. The span
            # report is one explode + one map-combining groupBy whose
            # output is bounded by distinct repeated spans; the
            # boilerplate ratio adds a join back to its own span-level
            # aggregate plus a doc_id groupBy — both expected ~linear.
            "duplicate_spans": lambda d=docs: noop_write(
                duplicate_spans(d)
            ),
            "boilerplate_ratio": lambda d=docs: noop_write(
                boilerplate_ratio(d)
            ),
            # round-6 additions: keep_best is the exact-dedup shuffle
            # shape plus a narrow argmax window (WindowGroupLimit) and
            # an id semi-join — expected to track exact_dedup.
            # temperature_sample is one tiny count agg + a shuffle-free
            # filter (expected flat). bpe_pair_counts is the BPE
            # trainer's corpus-sized stage: word histogram + pair agg,
            # both map-side combined (expected ~linear in text bytes).
            "keep_best": lambda d=docs: noop_write(
                keep_best(d, quality_score("text"))
            ),
            "temperature_sample": lambda d=docs: noop_write(
                temperature_sample(d, group_col="lang")
            ),
            "bpe_pair_counts": lambda d=docs: noop_write(
                char_pair_counts(word_histogram(d))
            ),
            # round-11 addition: the Gopher char-fraction repetition
            # battery — two tiered gram streams into map-combining
            # aggregations with doc-scoped keys, coverage dedup as a
            # per-(doc, n) array expression. Gram generation is
            # ~9 n-values x tokens per doc, so expected ~linear in
            # text bytes with a visible constant factor.
            "gopher_repetition": lambda d=docs: noop_write(
                gopher_repetition(d)
            ),
            # round-13 additions. bm25: stats agg (eager, inside the
            # lambda) + scoring projection — expected ~linear in text
            # bytes. fuzzy join: postings bounded at q*d+1 per string
            # by the rarity prefix; copies are char-rotated so posting
            # lists stay per-copy-sized — expected ~linear in docs,
            # and the slope is the check on that claim. sessionize:
            # one window shuffle + reused-partitioning agg; user_id is
            # NOT offset, so copies densify each user's timeline ×m —
            # the hot-user stress, expected ~linear.
            "bm25_topk": lambda d=docs: noop_write(
                bm25_topk(d, ["spark", "shuffle", "merge"], k=10)
            ),
            "fuzzy_pairs": lambda d=docs: noop_write(
                edit_distance_pairs(
                    d.select("doc_id",
                             _F.expr("substring(text, 1, 24)").alias("s")),
                    max_dist=4, q=3)
            ),
            "sessionize_stats": lambda d=events: noop_write(
                session_stats(d)
            ),
        }
        for name, fn in ops.items():
            sec = timed(fn)
            results.setdefault(name, {})[m] = sec
            rows.setdefault(name, {})[m] = n_docs
            print(f"x{m:<3} {name:<14} {sec:7.2f}s", flush=True)

    # log-log slope between smallest and largest multiplier
    lines = [
        "# SCALING — measured growth of the headline operators",
        "",
        f"Corpora: sf0.1 × {{{', '.join(map(str, mults))}}} (id-offset unions,",
        "8·m input files each; see `tools/scale_probe.py`). `slope` is the",
        "log-log growth rate of wall time between the smallest and largest",
        "size: 1.0 = perfectly linear, 2.0 = quadratic. Sub-linear slopes",
        "mean fixed per-job overhead still dominates at these sizes.",
        "",
        "The `pairwise` column lists the slope of each consecutive step",
        "(×1→×2, ×2→×4, …): a superlinear TAIL (last step ≫ 1) flags an",
        "operator whose cost curve is bending upward even when the",
        "end-to-end fit looks linear — the end-to-end number averages the",
        "overhead-dominated small sizes against the data-dominated large",
        "ones and can hide exactly that bend.",
        "",
        "| op | " + " | ".join(f"×{m}" for m in mults) + " | slope | pairwise |",
        "|---|" + "---|" * (len(mults) + 2),
    ]
    summary = {}
    for name, times in results.items():
        lo, hi = mults[0], mults[-1]
        slope = (math.log(times[hi] / times[lo]) / math.log(hi / lo)) if hi > lo else float("nan")
        pairwise = {
            str(b): round(math.log(times[b] / times[a]) / math.log(b / a), 2)
            for a, b in zip(mults, mults[1:])
        }
        summary[name] = {"times": times, "slope": round(slope, 2), "pairwise": pairwise}
        cells = " | ".join(f"{times[m]:.2f}s" for m in mults)
        pw = ", ".join(f"{v:.2f}" for v in pairwise.values())
        lines.append(f"| {name} | {cells} | {slope:.2f} | {pw} |")
        print(json.dumps({"op": name, **summary[name]}), flush=True)

    lines += [
        "",
        "Reading the embedding-LSH lines: `embed_lsh_fixed_r` is the",
        "documented QUADRATIC contrast — with r fixed, bucket occupancy",
        "grows with n and pair emission is O(occupancy²) per bucket.",
        "`embed_lsh_auto_*` size r from log2(n) so occupancy stays flat;",
        "the residual growth is the table count b ~ a^-r needed to hold",
        "recall, giving the classic LSH similarity-join law n^(1+ρ):",
        "ρ ≈ 0.5 at a loose threshold (0.45) and ρ → 0 at a production",
        "near-dup threshold (0.85). The text/minhash operators are",
        "inverted-index / banded-bucket joins with bounded posting",
        "lists — linear by construction, confirmed above.",
        "",
        "Corpus-assembly tier: `contamination` explodes corpus shingles",
        "against a CONSTANT-size broadcast benchmark set (the benchmark",
        "here grows with the corpus only as a probe artifact — in",
        "production it is a fixed eval suite, so the true law is the",
        "posting-explode, linear). `tfidf_top_terms` shuffles postings",
        "once; its window runs over tf rows bounded by groups × vocab,",
        "which saturates. `pack_sequences` is one per-shard window",
        "shuffle — linear with shard-count parallelism.",
    ]
    if max_mult < 8:
        print("partial run (max_mult < 8): NOT rewriting SCALING.md — "
              "the section is replaced wholesale and a partial table "
              "would clobber published columns")
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(
        os.path.join(repo, "SCALING.md"), "scale_probe", "\n".join(lines)
    )
    print("wrote SCALING.md (scale_probe section)")


if __name__ == "__main__":
    main()
