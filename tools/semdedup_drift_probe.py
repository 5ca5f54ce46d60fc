"""SemDeDup staleness probe (r16): calibrate the frozen-centroid
signal against what it predicts — SILENT dup-catch loss in the
streaming loop — and record the negative result that shaped it.

Mechanism under test: `semdedup_stream_dedup` assigns vectors to
FROZEN centroid cells; cross-batch candidates come from a cell join
against stored members, with cells past `max_cell` dropped (the
SemDeDup cap, also the join-fan-out bound). When drifted ingest
COLLAPSES many true modes onto few frozen cells, those cells cross
the cap, their stored members leave candidate generation, and true
near-dups are missed with no error anywhere. The direct predictor is
`capped_mass_frac` — the share of a batch's memberships landing in
capped cells — which is what `ops.similarity.semdedup_cell_drift`
keys its action off.

Design note (measured in this probe's first iteration, kept as the
rebuilt scenario's assertion): histogram TV against the fit baseline
CANNOT drive the action — a regionally focused ingest (all-B batches
against a fresh A∪B fit) reads TV ~0.8 with perfect recall, while a
mild shift (B at offset +3, spread over many frozen cells) reads TV
~0.27 with recall intact. TV ships as a trend field only.

Scenarios (fit on 16 A-modes, dim 32; stream seed → fresh batch →
near-copies of that batch; dup-catch = fraction of planted
near-copies killed):

* SAME      — A-like ingest. capped_mass_frac 0, catch 1.00.
* SHIFT-HARD — 16 new modes PACKED around one A mode (same norm
  scale, so the cosine bands hold: copy ~0.9999 > 0.999 threshold >
  same-mode ~0.9975): all shifted mass collapses onto the few
  frozen cells of that region, caps engage after the seed batch,
  and the planted dups (cross-batch by construction) are MISSED.
* REBUILT   — refit on A ∪ the B seed (kmeanspar, 2× lists), same
  shifted streams, max_cell unchanged: caps disengage, catch
  restored; TV vs the union baseline stays HIGH (focused ingest) —
  the false positive the action must not key off.
* SELF-HEAL — shift-hard again but `rebuild_on_drift=True`: the loop
  acts on its own rebuild action at the batch boundary (refit over
  the survivor store, re-sized ~√n lists, cells table remapped
  temp+swap, baseline re-frozen), so the dup batch that follows is
  assigned under fresh centroids and catch returns to ~1.0 with no
  operator in the loop.

Usage: python tools/semdedup_drift_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
N_MODES = 16
PER_MODE = 150
SIGMA = 0.05
N_BATCH = 600
N_DUPS = 200
N_ASSIGN = 1  # top-1: occupancy skew from shared 2nd/3rd memberships
# would growth-cap even same-dist ingest at probe scale
MAX_CELL = 150
THRESHOLD = 0.999


def make_points(rng, centers, n_per, id_base):
    pts, ids = [], []
    for ci, c in enumerate(centers):
        pts.append(c + rng.normal(0.0, SIGMA, size=(n_per, DIM)))
        ids.append(id_base + ci * n_per + np.arange(n_per))
    return np.vstack(pts), np.concatenate(ids)


def to_df(spark, mat, ids):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    )


def run_scenario(spark, root, tag, cents, baseline, seed_mat, seed_ids,
                 b1_mat, b1_ids, rng, rebuild_on_drift=False):
    """Seed the store, stream batch1 (fresh) + batch2 (near-copies of
    batch1 rows); return (per-batch signals, dup-catch recall)."""
    from filefilter_spark.streaming.jobs import semdedup_stream_dedup

    pick = rng.choice(len(b1_ids), N_DUPS, replace=False)
    dup_mat = b1_mat[pick] + rng.normal(0, 1e-3, size=(N_DUPS, DIM))
    dup_ids = 9_000_000 + np.arange(N_DUPS)

    src = f"{root}/src_{tag}"
    for mat, ids in ((seed_mat, seed_ids), (b1_mat, b1_ids),
                     (dup_mat, dup_ids)):
        to_df(spark, mat, ids).coalesce(1).write.mode(
            "append").parquet(src)
    sig = []
    survivors = semdedup_stream_dedup(
        spark, src, cents, threshold=THRESHOLD, n_assign=N_ASSIGN,
        max_cell=MAX_CELL, max_files_per_trigger=1,
        out_dir=f"{root}/store_{tag}", on_batch=sig.append,
        built_cell_counts=baseline, rebuild_on_drift=rebuild_on_drift,
    )
    alive = {int(r["vec_id"]) for r in survivors.collect()}
    caught = sum(1 for i in dup_ids if int(i) not in alive)
    return sig, caught / N_DUPS


def main() -> None:
    from filefilter_spark.ops.similarity import (
        SEMDEDUP_CAP_REBUILD,
        SEMDEDUP_CAP_WARN,
        build_ivf_index,
        membership_histogram,
    )
    from filefilter_spark.session import get_spark

    spark = get_spark("semdedup_drift_probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="semdd_drift_")
    rng = np.random.default_rng(23)

    centers_a = rng.normal(0, 1, size=(N_MODES, DIM))
    # packed near A-mode-0: collapse without changing vector norms
    # (an additive offset inflates norms and closes the cosine gap
    # between a planted copy and a same-mode neighbour - measured
    # in this probe's second iteration)
    centers_b = centers_a[0] + rng.normal(0, 0.3, size=(N_MODES, DIM))
    fit_mat, fit_ids = make_points(rng, centers_a, PER_MODE, 0)
    df_fit = to_df(spark, fit_mat, fit_ids)
    _, cents = build_ivf_index(df_fit, n_lists=N_MODES, method="lloyd",
                               coarse_iters=6, seeding="kmeanspar")
    baseline = membership_histogram(df_fit, cents, n_assign=N_ASSIGN)

    a2 = make_points(rng, centers_a, N_BATCH // N_MODES, 1_000_000)
    a3 = make_points(rng, centers_a, N_BATCH // N_MODES, 2_000_000)
    sig_same, catch_same = run_scenario(
        spark, root, "same", cents, baseline, *a2, *a3, rng)

    b1 = make_points(rng, centers_b, N_BATCH // N_MODES, 3_000_000)
    b2 = make_points(rng, centers_b, N_BATCH // N_MODES, 4_000_000)
    sig_shift, catch_shift = run_scenario(
        spark, root, "shift-hard", cents, baseline, *b1, *b2, rng)

    union = df_fit.unionByName(to_df(spark, *b1))
    _, cents2 = build_ivf_index(
        union, n_lists=2 * N_MODES, method="lloyd", coarse_iters=8,
        seeding="kmeanspar")
    baseline2 = membership_histogram(union, cents2, n_assign=N_ASSIGN)
    sig_rb, catch_rb = run_scenario(
        spark, root, "rebuilt", cents2, baseline2, *b1, *b2, rng)

    sig_heal, catch_heal = run_scenario(
        spark, root, "self-heal", cents, baseline, *b1, *b2, rng,
        rebuild_on_drift=True)

    print("\nscenario    cap_frac(max)  tv(max)  actions            catch")
    rows = (("same", sig_same, catch_same),
            ("shift-hard", sig_shift, catch_shift),
            ("rebuilt", sig_rb, catch_rb),
            ("self-heal", sig_heal, catch_heal))
    for name, sig, catch in rows:
        cf = max(s["capped_mass_frac"] for s in sig)
        tv = max(s["tv_distance"] for s in sig)
        acts = sorted({s["action"] for s in sig})
        rb = [s["batch_id"] for s in sig if s.get("rebuilt")]
        print(f"{name:<11} {cf:<14} {tv:<8} {acts}  catch={catch:.2f}"
              + (f"  rebuilt@{rb} n_lists={sig[-1]['n_lists']}"
                 if rb else ""))

    cf_same = max(s["capped_mass_frac"] for s in sig_same)
    cf_shift = max(s["capped_mass_frac"] for s in sig_shift)
    cf_rb = max(s["capped_mass_frac"] for s in sig_rb)
    tv_rb = max(s["tv_distance"] for s in sig_rb)
    healed = any(s.get("rebuilt") for s in sig_heal)
    ok = (cf_same < SEMDEDUP_CAP_WARN
          and cf_shift >= SEMDEDUP_CAP_REBUILD
          and cf_rb < SEMDEDUP_CAP_WARN
          and catch_same >= 0.95 and catch_rb >= 0.95
          and catch_shift <= 0.5
          and tv_rb >= 0.5  # the TV false positive, pinned
          and healed and catch_heal >= 0.95
          and sig_heal[-1]["action"] == "ok")
    print(f"\ncalibration: cap_frac same/shift/rebuilt = {cf_same}/"
          f"{cf_shift}/{cf_rb} vs WARN={SEMDEDUP_CAP_WARN} "
          f"REBUILD={SEMDEDUP_CAP_REBUILD}; catch = {catch_same:.2f}/"
          f"{catch_shift:.2f}/{catch_rb:.2f}; rebuilt TV={tv_rb} "
          f"(focused-ingest false positive, trend-only); self-heal "
          f"catch={catch_heal:.2f} rebuilt={healed}: "
          f"{'OK' if ok else 'CHECK'}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
