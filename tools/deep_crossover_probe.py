"""Deep-tail extension of the Spark-vs-DuckDB crossover probe.

The main crossover table (``tools/crossover_probe.py``, ×1→×8) left
three data-heavy rows still above 3× at ×8 — OP-D2-lines,
OP-D4-perplexity, OP-D2-spans — with falling ratios; the question this
probe answers is whether they keep converging or flatten. It reuses
the main probe's scaled-corpus builder and estimator verbatim and
times ONLY the tail rows at ×{8, 16, 32}, writing its own
``deep_crossover`` marker section of SCALING.md so neither generated
table can clobber the other.

Honesty note on ×32: the per-copy text rotation alphabet has 16
rotations, so copies k and k+16 carry identical text under different
ids — from ×32 on, cross-copy duplicate groups appear. Both engines
see the identical files, so the RATIO (the metric here) stays an
engine-vs-engine comparison; absolute times at ×32 include that extra
duplicate mass.

Usage: python tools/deep_crossover_probe.py [queries...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.crossover_probe import build_scaled_dir, timed  # noqa: E402

QUERIES = ["OP-D2-lines", "OP-D4-perplexity", "OP-D2-spans"]
MULTS = [8, 16, 32]


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

    spark_t: dict[str, dict[int, float]] = {}
    duck_t: dict[str, dict[int, float]] = {}
    for m in MULTS:
        sf_dir = build_scaled_dir(spark, m)
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            glob = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
            )
        for name in names:
            s = timed(lambda: qs[name](spark, sf_dir)
                      .write.format("noop").mode("overwrite").save())
            d = timed(lambda: con.execute(oracles[name]).fetchall())
            spark_t.setdefault(name, {})[m] = s
            duck_t.setdefault(name, {})[m] = d
            print(f"x{m:<3} {name:<18} spark {s:6.2f}s  duck {d:6.2f}s  "
                  f"ratio {s / d:5.2f}", flush=True)
        con.close()

    lines = [
        "### Deep tail: do the last >3× rows keep converging? (×8→×32)",
        "",
        "Same builder/estimator as the table above, extended to ×16/×32",
        "for the three rows still above 3× at ×8 (from ×32 the 16-entry",
        "rotation alphabet repeats, so cross-copy duplicate groups",
        "appear — identically in both engines; the ratio remains the",
        "engine-vs-engine metric). `tools/deep_crossover_probe.py`.",
        "",
        "| query | " + " | ".join(
            f"×{m} spark / duck / ratio" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name in names:
        cells = []
        for m in MULTS:
            s, d = spark_t[name][m], duck_t[name][m]
            cells.append(f"{s:.2f}s / {d:.2f}s / {s / d:.2f}")
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
        print(json.dumps({
            "op": name,
            "ratio": {str(m): round(spark_t[name][m] / duck_t[name][m], 2)
                      for m in MULTS},
        }), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "deep_crossover",
                    "\n".join(lines))
    print("wrote SCALING.md (deep_crossover section)")


if __name__ == "__main__":
    main()
