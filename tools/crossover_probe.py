"""Spark-vs-DuckDB crossover probe for the relational flagships.

Round-4 finding: at sf0.1 several headline queries are sub-second in
BOTH engines and the Spark/DuckDB ratio mostly measures Spark's fixed
per-job floor (~0.2-0.4 s scheduler + codegen) against DuckDB's ~10-90
ms — plan-reading said the ratios would converge once data cost exceeds
the floor. This probe turns that judgment into data: it scales the
inputs sf0.1 × {1,2,4,8} and times EACH flagship in both engines on
the IDENTICAL files, publishing ratio-vs-size curves.

Design choices that keep the comparison honest:
- The Spark side runs the exact registered ``queries()`` builders and
  the DuckDB side the exact registered ``oracle_sql()`` strings —
  nothing is re-implemented for the benchmark.
- Scaled inputs are id-offset copies with ALL key columns (primary and
  foreign) offset consistently per copy, so every copy is a closed
  universe: join/group cardinalities grow linearly and neither engine
  gets cross-copy matches the other wouldn't see. Text gets a per-copy
  character rotation and embeddings a cyclic shift (same device as
  tools/scale_probe.py) so dedup/similarity outputs also stay linear.
  Exception: OP-B9 joins on price PROXIMITY, and copies share the
  price distribution, so its true match count grows ~m² — identically
  in both engines; the ratio remains the metric.
- Same estimator both sides: one warm run, then best-of-2. DuckDB uses
  all cores (its default), Spark local[32] — each engine at its own
  best configuration on the same box.
- Timing forces full execution but not result transfer where the
  engine allows it: Spark writes to the noop sink; DuckDB must
  materialize (fetchall) — its results are final aggregates, at most
  a few hundred KB, so transfer is noise.

Usage: python tools/crossover_probe.py [max_multiplier] [only...]
Writes the ``crossover`` section of SCALING.md and prints JSON lines.
Scratch: /tmp/spark_graft_xover (reused across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_xover"

# Flagships: the headline relational set from the round-4 review plus
# the extension-tier entries whose sf0.1 ratios were overhead-dominated.
# OP-D2/OP-D4 put the LLM-pipeline tier on the same footing: their
# oracles are real DuckDB implementations of the same algorithm
# (inverted-index Jaccard join / regex+list token stats), so the ratio
# compares engines, not algorithms.
QUERIES = [
    "OP-B5", "OP-B9", "OP-B10", "OP-B11", "OP-B12",
    "OP-B18", "OP-B22", "OP-D1", "OP-D2", "OP-D3", "OP-D4",
    # round-5 exact-oracle pipeline ops whose sf0.1 ratios sit above
    # the job floor (2.4x / 2.9x) — the curve shows where they cross
    "OP-D2-lines", "OP-D4-perplexity",
    # round-6: substring-dedup span report, keep-best dedup, BPE pair
    # counts (all exact-oracle, data-heavy)
    "OP-D2-spans", "OP-D1-keepbest", "OP-D4-bpe",
    # round-9: DSIR importance weights — the one r8 op with per-byte
    # corpus cost AND an exact oracle (qualityclf is recall-oracled;
    # safesplit's cost is jaccard_pairs + CC, both already tabled)
    "OP-D7-dsir",
    # round-11: the Gopher char-fraction repetition battery — per-byte
    # gram materialization cost, exact oracle; the heaviest r11 row in
    # bench_compare (~4x at sf0.1), so its curve belongs here
    "OP-D4-gopher-rep",
    # round-13: edit-distance fuzzy join — Spark's prefix-filtered
    # q-gram index vs DuckDB's quadratic oracle; the DuckDB side grows
    # ~m^2 (like OP-B9's match count), so probe it at small multipliers
    # only (x1/x2 via the `only` filter) and read the trend, not x8
    "OP-D2-fuzzy",
    # round-13: BM25 — two tokenize passes, per-byte cost both engines
    "OP-D4-bm25",
    # round-13: sessionization — one window shuffle vs DuckDB's
    # in-memory windows; user_id offsetting keeps sessions closed
    "OP-B19-sessions",
]

# Per-table columns that must be offset per copy so each copy is a
# closed universe (primary keys AND the foreign keys that reference
# them). Tables not listed are small dims replicated as-is at x1.
OFFSET_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

ALPHA = "abcdefghijklmnop"
STEP = 1_000_000_000


def build_scaled_dir(spark, mult: int) -> str:
    """Materialize a complete scaled SF directory: every registry table
    present, so the registered queries/oracles run on it unchanged."""
    from pyspark.sql import functions as F

    from filefilter_spark.queries.registry import TABLES, load_table

    out = f"{SCRATCH}/sfx{mult}"
    marker = f"{out}/_DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        dst = f"{out}/{table}.parquet"
        base = load_table(spark, BASE_SF, table)
        cols = OFFSET_COLS.get(table)
        if not cols or mult == 1:
            # dims (and x1 of everything): byte-identical copy, but
            # written through Spark so the file layout (row groups,
            # timestamp units) matches the scaled tables'.
            base.repartition(8).write.mode("overwrite").parquet(dst)
            continue
        text_cols = [f.name for f in base.schema.fields
                     if f.name == "text"]
        vec_cols = [f.name for f in base.schema.fields
                    if f.dataType.simpleString().startswith("array")]
        parts = []
        for k in range(mult):
            p = base
            for c in cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * STEP))
            rot = ALPHA[k % len(ALPHA):] + ALPHA[: k % len(ALPHA)]
            for c in text_cols:
                p = p.withColumn(c, F.translate(F.col(c), ALPHA, rot))
            for c in vec_cols:
                if k:
                    p = p.withColumn(
                        c,
                        F.concat(F.slice(F.col(c), k + 1, 10_000),
                                 F.slice(F.col(c), 1, k)),
                    )
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(8 * mult).write.mode("overwrite").parquet(dst)
    open(marker, "w").close()
    return out


def timed(fn, reps: int = 2) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2:]
    mults = [m for m in (1, 2, 4, 8, 16) if m <= max_mult]
    names = [q for q in QUERIES if not only or q in only]

    import duckdb

    import __spark_entry__ as E
    from filefilter_spark.queries.registry import TABLES
    from filefilter_spark.session import get_spark

    spark = get_spark("crossover_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    oracles = E.oracle_sql()

    spark_t: dict[str, dict[int, float]] = {}
    duck_t: dict[str, dict[int, float]] = {}
    for m in mults:
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
            print(f"x{m:<3} {name:<8} spark {s:6.2f}s  duck {d:6.2f}s  "
                  f"ratio {s / d:5.2f}", flush=True)
        con.close()

    lines = [
        "## Spark-vs-DuckDB crossover (relational flagships)",
        "",
        "Same inputs, same registered query/oracle pair, same best-of-2",
        "warm estimator in both engines, sf0.1 × "
        f"{{{', '.join(map(str, mults))}}} (closed-universe id-offset",
        "copies — see `tools/crossover_probe.py`). `ratio` = Spark /",
        "DuckDB wall time; the question from round 4 was whether the",
        "overhead-dominated sub-second ratios converge once data cost",
        "exceeds Spark's fixed per-job floor.",
        "",
        "| query | " + " | ".join(
            f"×{m} spark / duck / ratio" for m in mults) + " |",
        "|---|" + "---|" * len(mults),
    ]
    for name in names:
        cells = []
        for m in mults:
            s, d = spark_t[name][m], duck_t[name][m]
            cells.append(f"{s:.2f}s / {d:.2f}s / {s / d:.2f}")
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
        print(json.dumps({
            "op": name,
            "spark": {str(m): round(v, 3) for m, v in spark_t[name].items()},
            "duck": {str(m): round(v, 3) for m, v in duck_t[name].items()},
            "ratio": {str(m): round(spark_t[name][m] / duck_t[name][m], 2)
                      for m in mults},
        }), flush=True)

    if only or max_mult < 8:
        print("filtered/partial run: NOT rewriting SCALING.md — the "
              "crossover section is replaced wholesale and a filtered "
              "table would clobber the published rows")
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "crossover",
                    "\n".join(lines))
    print("wrote SCALING.md (crossover section)")


if __name__ == "__main__":
    main()
