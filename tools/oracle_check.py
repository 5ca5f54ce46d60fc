"""Local mirror of the driver's correctness gate, plus recall oracles.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB equivalent at a given SF dir and compares
row count + column names + order-insensitive canonicalized values.

Probabilistic candidate-generation entries (no value oracle) may carry
a ``RecallSpec`` in the registry: DuckDB computes the EXACT reference
set and the check asserts the Spark result recovers >= min_recall of
it (and, for ops that exact-verify their candidates, emits nothing
outside it — precision 1.0). Entries with neither get the driver's
weaker rows-only (runs, rowcount >= 0) check.

Usage: python tools/oracle_check.py [sf_dir] [--json out.json] [only_prefix...]
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 10))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, str)):
        return str(v)
    # timestamps/dates/decimals/bytes → str is stable enough locally
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x00".join(canon(r[i]) for i in order) for r in rows)


def key_set(cols, rows, keys):
    idx = [cols.index(k) for k in keys]
    return {tuple(canon(r[i]) for i in idx) for r in rows}


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires an output filename")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:]

    import duckdb

    import __spark_entry__ as E
    from filefilter_spark.queries.registry import TABLES, all_specs
    from filefilter_spark.session import get_spark

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    specs = all_specs()
    results: list[dict] = []
    n_pass = n_fail = n_err = 0
    for name, builder in sorted(qs.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        rec = {"name": name, "sf_dir": sf_dir}
        try:
            sdf = builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            err = traceback.format_exc(limit=3).splitlines()[-1]
            print(f"ERR  {name}  (spark)  {err}")
            n_err += 1
            results.append({**rec, "status": "error", "detail": f"spark: {err}"})
            continue
        rec["n_rows"] = len(s_rows)
        oracle = oracles.get(name)
        spec = specs.get(name)
        if oracle is None and spec is not None and spec.recall is not None:
            r = spec.recall
            try:
                rel = con.execute(r.sql)
                d_cols = [d[0] for d in rel.description]
                exact = key_set(d_cols, rel.fetchall(), list(r.keys))
            except Exception as e:
                print(f"ERR  {name}  (duckdb recall)  {e}")
                n_err += 1
                results.append({**rec, "status": "error", "detail": f"duckdb: {e}"})
                continue
            approx = key_set(s_cols, s_rows, list(r.keys))
            recall = len(approx & exact) / len(exact) if exact else 1.0
            extra = approx - exact
            problems = []
            if recall < r.min_recall:
                problems.append(f"recall {recall:.3f} < {r.min_recall}")
            if r.exact_precision and extra:
                problems.append(
                    f"{len(extra)} pairs outside exact set, e.g. {sorted(extra)[:3]}"
                )
            rec.update(
                mode="recall", recall=round(recall, 4), n_exact=len(exact),
                min_recall=r.min_recall, exact_precision=r.exact_precision,
            )
            if problems:
                print(f"FAIL {name}  {'; '.join(problems)}")
                n_fail += 1
                results.append({**rec, "status": "fail", "detail": "; ".join(problems)})
            else:
                print(
                    f"pass {name}  recall={recall:.3f} (>= {r.min_recall},"
                    f" {len(exact)} exact"
                    f"{', precision exact' if r.exact_precision else ''})"
                    f"  {time.time() - t0:.1f}s"
                )
                n_pass += 1
                results.append({**rec, "status": "pass"})
            continue
        if oracle is None:
            print(f"pass {name}  rows-only n={len(s_rows)}  {time.time()-t0:.1f}s")
            n_pass += 1
            results.append({**rec, "status": "pass", "mode": "rows-only"})
            continue
        try:
            rel = con.execute(oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"ERR  {name}  (duckdb)  {e}")
            n_err += 1
            results.append({**rec, "status": "error", "detail": f"duckdb: {e}"})
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems and df_multiset(s_cols, s_rows) != df_multiset(d_cols, d_rows):
            sm, dm = df_multiset(s_cols, s_rows), df_multiset(d_cols, d_rows)
            diff = next((i for i, (a, b) in enumerate(zip(sm, dm)) if a != b), -1)
            problems.append(
                f"values differ (first at sorted idx {diff}):\n"
                f"  spark: {sm[diff][:200]!r}\n  duck:  {dm[diff][:200]!r}"
            )
        rec["mode"] = "exact"
        if problems:
            print(f"FAIL {name}  {'; '.join(problems)}")
            n_fail += 1
            results.append({**rec, "status": "fail", "detail": "; ".join(problems)})
        else:
            print(f"pass {name}  n={len(s_rows)}  {time.time()-t0:.1f}s")
            n_pass += 1
            results.append({**rec, "status": "pass"})
    print(f"\n== {n_pass} pass / {n_fail} fail / {n_err} err ==")
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_err": n_err,
            "n_exact": sum(1 for r in results if r.get("mode") == "exact"),
            "n_recall": sum(1 for r in results if r.get("mode") == "recall"),
            "n_rows_only": sum(1 for r in results if r.get("mode") == "rows-only"),
            "entries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
