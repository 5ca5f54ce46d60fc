"""Deep-tail extension of the Spark-vs-DuckDB crossover probe.

The main crossover table (``tools/crossover_probe.py``, ×1→×8) leaves
two kinds of unfinished rows, and this probe measures both instead of
extrapolating:

- the data-heavy rows that were still >3× at ×8 with falling ratios
  (OP-D2-lines, OP-D4-perplexity, OP-D2-spans) — extended to ×16/×32,
  and perplexity to ×64 (round 7: the last headline ratio above the 2×
  contract line at every measured size; the trend 2.39@×32-and-falling
  predicted ≤2× at ×64, so measure it);
- the floor-bound rows (OP-B11, OP-B12, OP-B22, OP-D1, OP-D3,
  OP-D4-bpe, OP-D7-temperature) whose ×8 ratios are Spark's fixed job
  floor over a tiny-but-growing DuckDB denominator — round 6
  *extrapolated* "each crosses parity within another ~8-32×"; round 7
  measures ×16/×32 so the claim is a table, not a paragraph.

It reuses the main probe's scaled-corpus builder and estimator
verbatim and writes its own ``deep_crossover`` marker section of
SCALING.md so neither generated table can clobber the other.

Honesty note on ×32/×64: the per-copy text rotation alphabet has 16
rotations, so copies k and k+16 carry identical text under different
ids — from ×32 on, cross-copy duplicate groups appear (4 identical
copies of each text at ×64). Both engines see the identical files, so
the RATIO (the metric here) stays an engine-vs-engine comparison;
absolute times from ×32 include that extra duplicate mass.

Usage: python tools/deep_crossover_probe.py [queries...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.crossover_probe import build_scaled_dir, timed  # noqa: E402

# data-heavy tail rows (round 6) — still converging at ×32
# (+ r9: OP-D7-dsir, 4.66@×8 and falling in the main table — the one
# r8 op with per-byte corpus cost and an exact oracle; + r12:
# OP-D4-gopher-rep so full reruns keep the rewritten projection's row
# — measured 0.43/0.31/0.19 at ×8/×16/×32 in the r12 session)
TAIL = ["OP-D2-lines", "OP-D4-perplexity", "OP-D2-spans", "OP-D7-dsir",
        "OP-D4-gopher-rep",
        # r13: the inverted-index Jaccard row — flat ~2.2× in the ×1-×8
        # table; deep tail measured 2.09/1.70/1.81 pre-rewrite, under
        # the bar from ×16 on (see SCALING.md "OP-D2 settled")
        "OP-D2"]
# floor-bound rows (round 7) — ×8 ratio = job floor / small denominator
FLOOR = ["OP-B11", "OP-B12", "OP-B22", "OP-D1", "OP-D3",
         "OP-D4-bpe", "OP-D7-temperature"]
QUERIES = TAIL + FLOOR
MULTS = [8, 16, 32]
# per-query extra sizes beyond MULTS
EXTRA_MULTS = {"OP-D4-perplexity": [64]}


def main() -> None:
    names = sys.argv[1:] or QUERIES

    import duckdb

    import __spark_entry__ as E
    from filefilter_spark.queries.registry import TABLES
    from filefilter_spark.session import get_spark

    spark = get_spark("deep_crossover_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    oracles = E.oracle_sql()

    mults_for = {n: MULTS + EXTRA_MULTS.get(n, []) for n in names}
    all_mults = sorted({m for ms in mults_for.values() for m in ms})

    spark_t: dict[str, dict[int, float]] = {}
    duck_t: dict[str, dict[int, float]] = {}
    for m in all_mults:
        sf_dir = build_scaled_dir(spark, m)
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            glob = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
            )
        for name in names:
            if m not in mults_for[name]:
                continue
            s = timed(lambda: qs[name](spark, sf_dir)
                      .write.format("noop").mode("overwrite").save())
            d = timed(lambda: con.execute(oracles[name]).fetchall())
            spark_t.setdefault(name, {})[m] = s
            duck_t.setdefault(name, {})[m] = d
            print(f"x{m:<3} {name:<18} spark {s:6.2f}s  duck {d:6.2f}s  "
                  f"ratio {s / d:5.2f}", flush=True)
        con.close()

    lines = [
        "### Deep tail: measured ×8→×32 (×64 for perplexity) — no more",
        "extrapolated rows",
        "",
        "Same builder/estimator as the table above. Two groups: the",
        "data-heavy tail rows (>3× at ×8, falling) and the floor-bound",
        "rows whose ×8 ratio was round 6's 'crosses parity within",
        "another ~8-32×' *extrapolation* — now measured. From ×32 the",
        "16-entry rotation alphabet repeats, so cross-copy duplicate",
        "groups appear — identically in both engines; the ratio remains",
        "the engine-vs-engine metric. `tools/deep_crossover_probe.py`.",
        "",
        "| query | " + " | ".join(
            f"×{m} spark / duck / ratio" for m in all_mults) + " |",
        "|---|" + "---|" * len(all_mults),
    ]
    for name in names:
        cells = []
        for m in all_mults:
            if m in spark_t.get(name, {}):
                s, d = spark_t[name][m], duck_t[name][m]
                cells.append(f"{s:.2f}s / {d:.2f}s / {s / d:.2f}")
            else:
                cells.append("—")
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
        print(json.dumps({
            "op": name,
            "ratio": {str(m): round(spark_t[name][m] / duck_t[name][m], 2)
                      for m in sorted(spark_t.get(name, {}))},
        }), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    if set(names) >= set(QUERIES):
        replace_section(os.path.join(repo, "SCALING.md"), "deep_crossover",
                        "\n".join(lines))
        print("wrote SCALING.md (deep_crossover section)")
    else:
        print("filtered run: NOT rewriting SCALING.md (partial table); "
              "rerun with no args to refresh the committed section")


if __name__ == "__main__":
    main()
