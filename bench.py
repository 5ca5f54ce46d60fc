"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the FULL result as one JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"OP-B12": sec, ...}, "sf": 0.1}
then a FINAL compact JSON line (r13) with the headline scalars only
(total, sf, estimator, load, added/missing) — guaranteed <= 1,000
chars — so any tail capture of bounded size still lands on valid,
parseable JSON (the driver's 2,000-char tail has held only fragments
of the full line since r9). The full payload is also written to
BENCH_LOCAL.json ($SPARK_GRAFT_BENCH_OUT overrides) so per-query
round-over-round comparisons never depend on captured stdout.

One shared SparkSession across all queries (fixed JVM/session startup is
paid once, as it would be on a real cluster); each query is forced to
full execution with the noop sink — no driver-side collect, so what's
timed is the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship aggregate, joins, window, top-k, as-of,
# and the LLM-pipeline tier (dedup exact/fuzzy, similarity, text).
HEADLINE = [
    "OP-B12",        # TPC-H Q1 aggregate
    "OP-B5",         # broadcast equi-join
    "OP-B9",         # banded range join (full tables)
    "OP-B11",        # 4-way join + agg
    "OP-B18",        # ranking window
    "OP-B22",        # top-k
    "OP-B10",        # as-of join
    "OP-D1",         # exact dedup
    "OP-D2",         # jaccard near-dup self-join
    "OP-D2-minhash", # minhash LSH near-dup
    "OP-D3",         # cosine top-k
    "OP-D4",         # text stats battery
    "OP-D5",         # streaming windowed agg
    "OP-D5-session", # streaming session windows
    # Added in r5 (new operators — total is NOT comparable to r4's
    # unless these two are subtracted; see "added_queries" in the JSON)
    "OP-D2-lines",   # C4-style line-level dedup + reassembly
    "OP-D4-perplexity",  # bigram-LM scoring
    # Added in r6
    "OP-D2-spans",   # cross-doc repeated-span report (substring dedup)
    "OP-D4-bpe",     # BPE trainer's corpus stage (histogram + pair agg)
    "OP-D1-keepbest",  # quality-argmax dedup survivor selection
    # Added in r9 (the r8 operators join the committed perf series;
    # see "added_queries" in the JSON for total comparability)
    # SETTLED series member (r13 adjudication — keep HEADLINE, read
    # via the settlement): the sf0.1 ratio is a flat two-job floor
    # over a ~0.4 s DuckDB denominator; the x8->x32 deep tail
    # converges 2.92 -> 1.29x with Spark growing 0.04 s/double vs
    # DuckDB 0.5 s/double (SCALING.md "dsir deep tail"). Do NOT
    # re-flag on the raw sf0.1 multiple.
    "OP-D7-dsir",    # DSIR importance weights (per-byte corpus cost)
    "OP-D7-safesplit",  # leakage-safe split (jaccard pairs + CC + hash)
    "OP-D4-qualityclf",  # learned quality filter (train + native score)
    # New in r9
    "OP-D3-kmeans",  # deterministic Lloyd k-means (3 corpus passes)
    "OP-A9-zorder",  # Z-order layout sink + box-filtered round-trip
    # Added in r11 (the two r9-tail ops with real per-row fold cost —
    # PQ encode/ADC and the Gopher projection battery; the remaining
    # r9 tail ops are sub-second scheduler-floor singles, excluded
    # per SCALING.md "bench exclusions")
    "OP-D3-pq",      # PQ codebooks + encode + ADC top-k
    "OP-D4-gopher",  # Gopher quality-rule battery (pure projection)
    # Added in r12: the char-fraction repetition tier, now a
    # shuffle-free in-row sort/scan battery — the series should track
    # the rewrite (r11: exploded groupBys, 4.4x DuckDB at sf0.1;
    # r12: 0.67x)
    "OP-D4-gopher-rep",
    # Added in r13: BM25 keyword retrieval — two tokenize passes over
    # the corpus (stats + scoring), real per-row fold cost like gopher
    "OP-D4-bm25",
    # Added in r14: the exact Ed-Join fuzzy self-join — the heaviest
    # oracled row on both engines (already 0.7x DuckDB at sf0.1,
    # crossing to 0.12x at x2); joins the committed series after the
    # r14 ids-only-postings rewrite so regressions in the posting /
    # verify shape surface here, not only in tools/bench_compare.py
    "OP-D2-fuzzy",
]


def main() -> None:
    # Defer-while-loaded (r12, VERDICT r11 bench-hygiene step 2): a
    # loaded box at launch produced the r11 noise round — annotating
    # after the fact (load_note) keeps the series honest but still
    # accumulates noise captures. Now the bench WAITS for quiet first:
    # if load1 > 2 at launch, sleep 30 s and re-check, up to 10 times
    # (~5 min); only an exhausted retry budget proceeds loaded, and
    # the note then says so explicitly.
    retries_exhausted = False
    try:
        load_launch = os.getloadavg()[0]
        for i in range(10):
            if load_launch <= 2.0:
                break
            if i == 0:
                # r13 (ADVICE r12): tell a watcher the bench is
                # deferring, not hung — stderr so stdout stays JSON
                print(
                    f"bench: load1 {load_launch:.1f} > 2.0 at launch; "
                    "deferring up to 10x30s for a quiet box",
                    file=sys.stderr,
                )
            time.sleep(30)
            load_launch = os.getloadavg()[0]
        else:
            retries_exhausted = True
    except OSError:  # pragma: no cover - non-unix
        load_launch = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from filefilter_spark.session import get_spark

    spark = get_spark("filefilter_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()

    # Warm pass: run every headline query once so the timed pass
    # measures the steady-state plan (JIT'd codegen, loaded classes,
    # page-cached input) rather than first-job classloading — the state
    # a long-lived cluster session is actually in. The timed pass still
    # builds each plan from scratch (no caching of data or results).
    for name in HEADLINE:
        builder = qs.get(name)
        if builder is not None:
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Best-of-2 per query: single-shot timings at sub-second scale swing
    # ±50% with GC/scheduler noise on a shared box (the r2->r3 "+5.7%
    # regression" was exactly this); the min of two runs is the standard
    # steady-state estimator and stays honest — each rep still builds
    # the plan from scratch and executes the full distributed job.
    # Noise escalation (r7): when the two warm reps disagree by >15%,
    # the box is loud for that query — take a third rep and keep the
    # min of all three (min is the estimator the whole series uses; a
    # third sample only sharpens it, so escalated and quiet rows stay
    # mutually comparable). The JSON reports which queries escalated
    # and the worst rep spread, so a drifted total self-describes as
    # noise instead of burning adjudication time every round.
    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    escalated: list[str] = []
    missing = [n for n in HEADLINE if n not in qs]
    for name in HEADLINE:
        builder = qs.get(name)
        if builder is None:
            continue

        def rep() -> float:
            t0 = time.time()
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        reps = [rep(), rep()]
        if (max(reps) - min(reps)) / max(min(reps), 1e-9) > 0.15:
            escalated.append(name)
            reps.append(rep())
        # Spread over ALL reps that produced the published min (the
        # escalation rep included) — the reported "worst rep spread"
        # must describe the same sample set as the estimate.
        spread = (max(reps) - min(reps)) / max(min(reps), 1e-9)
        times[name] = round(min(reps), 3)
        spreads[name] = round(spread, 3)

    # Load marker: scheduler pressure at measurement time. loadavg is
    # the 1/5/15-min runnable-task average — on this 32-cpu box a
    # load1 far above the bench's own footprint means timings carry
    # someone else's noise and a round-over-round drift is suspect.
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:  # pragma: no cover - non-unix
        load1 = load5 = load15 = None

    # Adjudicating note when the box is loud at LAUNCH (r9 and r10
    # were both captured under load1 ~8-10 with nothing in the JSON
    # saying so — the reader had to dig it out of load_avg). The
    # report-time load is recorded but does NOT trigger the note: the
    # bench's own 32-thread work always drives load1 up mid-run, so a
    # report-time threshold would flag every clean run as loaded.
    load_note = None
    if load_launch is not None and load_launch > 2.0:
        # reaching here with load1 > 2.0 means the defer loop ran out —
        # the only other exit is the break at <= 2.0 (ADVICE r12: the
        # old "no retries?" alternative was unreachable)
        assert retries_exhausted
        fmt = lambda v: "?" if v is None else f"{v:.1f}"  # noqa: E731
        load_note = (
            f"load1 {fmt(load_launch)} at launch (after exhausting "
            "10x30s defer retries) "
            f"/ {fmt(load1)} at report on {os.cpu_count()} cpus — "
            "timings captured under external load; round-over-round "
            "drift in this file is suspect (the min-of-warm-reps "
            "estimator absorbs most of it, not all)"
        )

    payload = {
        "metric": "total_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # Self-describing timing methodology so round-over-round
        # comparisons are honest: warm pass first, then min of 2 timed
        # reps (each building + executing the full plan from scratch),
        # escalating to min of 3 for queries whose 2 reps spread >15%.
        # r1-r3 used single_shot_warm; the series changed at r4; r7
        # added the noise escalation (min-estimator unchanged).
        "estimator": "min_of_2_warm_plus_noise_rep",
        "n_runs": {n: (3 if n in escalated else 2) for n in times},
        "rep_spread": spreads,
        "escalated_queries": escalated,
        "load_avg": [load1, load5, load15],
        "load1_at_launch": load_launch,
        "load_note": load_note,
        "cpus": os.cpu_count(),
        # Queries first present in this series at r5/r6/r9/r11 —
        # subtract these from "value" to compare totals against r4 and
        # earlier (the r6 names for r5 comparisons; the r9 names for
        # r6-r8; the r11 names for r9-r10).
        "added_queries": ["OP-D2-lines", "OP-D4-perplexity",
                          "OP-D2-spans", "OP-D4-bpe", "OP-D1-keepbest",
                          "OP-D7-dsir", "OP-D7-safesplit",
                          "OP-D4-qualityclf", "OP-D3-kmeans",
                          "OP-A9-zorder",
                          "OP-D3-pq", "OP-D4-gopher",
                          "OP-D2-fuzzy"],  # r14
        # non-empty => a registry rename silently shrank the suite;
        # totals are NOT comparable until fixed
        "missing_queries": missing,
    }
    print(json.dumps(payload))

    # Full per-query payload on disk (r13): the committed local
    # artifact the round series compares against, independent of any
    # stdout capture window.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")

    # FINAL compact line — the one a bounded tail capture must land
    # on. Headline scalars only; per-query dicts live in the full
    # line above and in BENCH_LOCAL.json.
    print(json.dumps(compact_line(payload)))


def compact_line(payload: dict) -> dict:
    """Tail-safe summary of a full bench payload: <= 1,900 chars
    serialized (pinned in tests) even with every current headline
    query escalated and missing — the driver's bounded tail capture
    is 2,000 chars, so the FINAL line must fit inside it whole.

    r17 (VERDICT r16 #1): the per-query seconds dict now rides the
    compact line too. The r16 driver's PERF comparison came back
    empty (`per_query: {}`, `now_bench_ok: false`) because its tail
    capture parses only this final line and the full payload line
    scrolls out of the window — 29 rounded floats are ~700 chars,
    which still fits. If a future headline set ever pushes the line
    past the window, the dict is dropped (old r13 behavior) rather
    than overflowing the capture; BENCH_LOCAL.json always has it.
    """
    out = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "n_queries": len(payload["queries"]),
        "queries": payload["queries"],
        "estimator": payload["estimator"],
        "load1_at_launch": payload["load1_at_launch"],
        "loaded": payload["load_note"] is not None,
        "n_escalated": len(payload["escalated_queries"]),
        "added_queries": payload["added_queries"],
        "missing_queries": payload["missing_queries"],
        "full": "BENCH_LOCAL.json",
    }
    if len(json.dumps(out)) > 1900:
        out = {k: v for k, v in out.items() if k != "queries"}
    return out


if __name__ == "__main__":
    main()
