"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB equivalent at a given SF dir and compares
row count + column names + order-insensitive canonicalized values.
Entries without an oracle get a rows-only (runs, rowcount >= 0) check.

Usage: python tools/oracle_check.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, ".")


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import duckdb

    import __spark_entry__ as E
    from filefilter_spark.queries.registry import TABLES
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
    n_pass = n_fail = n_err = 0
    for name, builder in sorted(qs.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"ERR  {name}  (spark)  {traceback.format_exc(limit=3).splitlines()[-1]}")
            n_err += 1
            continue
        oracle = oracles.get(name)
        if oracle is None:
            print(f"pass {name}  rows-only n={len(s_rows)}  {time.time()-t0:.1f}s")
            n_pass += 1
            continue
        try:
            rel = con.execute(oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"ERR  {name}  (duckdb)  {e}")
            n_err += 1
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
        if problems:
            print(f"FAIL {name}  {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass {name}  n={len(s_rows)}  {time.time()-t0:.1f}s")
            n_pass += 1
    print(f"\n== {n_pass} pass / {n_fail} fail / {n_err} err ==")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
