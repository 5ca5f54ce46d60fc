"""Z-order layout payoff, measured from parquet footers.

Writes sf0.1 lineitem two ways with IDENTICAL file/row-group sizing —
(a) globally sorted by l_partkey alone (the best single-column layout)
and (b) Z-ordered on (l_partkey, l_suppkey) via
``ops.layout.write_zordered`` — then evaluates a grid of 2-D predicate
boxes the way a stats-pruning scan does: a row group must be read iff
its (min, max) box intersects the predicate box. Row groups to read
come straight from the parquet footer metadata (pyarrow), so the
number is engine-independent physics, not a wall-clock sample; Spark
scan wall time over each layout is reported alongside as
confirmation.

Expected shape: on partkey-only predicates the linear sort wins
slightly (its partkey runs are perfectly tight); on suppkey-only and
2-D box predicates the linear sort reads EVERY row group (suppkey
min/max spans the whole domain in every group) while the Z-order
tiles prune — the multi-dimensional trade the layout exists for.

Writes the ``zorder`` marker section of SCALING.md.
Usage: python tools/zorder_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 64


def groups_to_read(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(row groups whose stats intersect the box, total row groups) —
    footer metadata only."""
    import pyarrow.parquet as pq

    must, total = 0, 0
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            total += 1
            rg = md.row_group(g)
            hit = True
            for col, (lo, hi) in box.items():
                st = rg.column(names[col]).statistics
                if st.min > hi or st.max < lo:
                    hit = False
                    break
            if hit:
                must += 1
    return must, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from filefilter_spark.io import scratch_root
    from filefilter_spark.ops.layout import column_bounds, write_zordered
    from filefilter_spark.queries.registry import load_table
    from filefilter_spark.session import get_spark

    spark = get_spark("zorder_probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    root = scratch_root("ffspark_zprobe_")
    linear, zordered = f"{root}/linear", f"{root}/zorder"
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(linear)
    )
    b = column_bounds(li, ["l_partkey", "l_suppkey"])
    write_zordered(li, zordered, ["l_partkey", "l_suppkey"], bits=16,
                   num_files=N_FILES, bounds=b)
    (plo, phi), (slo, shi) = b["l_partkey"], b["l_suppkey"]
    pw, sw = (phi - plo) // 10, (shi - slo) // 10  # decile boxes
    mid_p, mid_s = plo + (phi - plo) // 2, slo + (shi - slo) // 2
    boxes = {
        "partkey decile": {"l_partkey": (mid_p, mid_p + pw)},
        "suppkey decile": {"l_suppkey": (mid_s, mid_s + sw)},
        "2-D decile box": {"l_partkey": (mid_p, mid_p + pw),
                           "l_suppkey": (mid_s, mid_s + sw)},
    }

    def scan_time(path: str, box) -> float:
        import pyspark.sql.functions as F

        df = spark.read.parquet(path)
        cond = F.lit(True)
        for col, (lo, hi) in box.items():
            cond = cond & F.col(col).between(lo, hi)
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            df.filter(cond).groupBy().count().collect()
            best = min(best, time.monotonic() - t0)
        return best

    lines = [
        "## Z-order layout: row-group pruning measured from footers",
        "",
        f"sf0.1 lineitem, {N_FILES} files per layout, identical sizing;",
        "linear = global sort by l_partkey, zorder =",
        "`write_zordered(bits=16)` on (l_partkey, l_suppkey). 'groups'",
        "= row groups a stats-pruning scan MUST read (footer min/max",
        "intersection — engine-independent); wall = Spark filtered-scan",
        "best-of-2 (`tools/zorder_probe.py`).",
        "",
        "| predicate | linear groups | zorder groups | linear s | zorder s |",
        "|---|---|---|---|---|",
    ]
    for name, box in boxes.items():
        lm, lt = groups_to_read(linear, box)
        zm, zt = groups_to_read(zordered, box)
        ls, zs = scan_time(linear, box), scan_time(zordered, box)
        row = (f"| {name} | {lm}/{lt} | {zm}/{zt} "
               f"| {ls:.2f}s | {zs:.2f}s |")
        lines.append(row)
        print(row, flush=True)

    lines += [
        "",
        "Reading it: the single-column sort is unbeatable on its own",
        "column (tight partkey runs) and BLIND on the other — every",
        "group spans the full suppkey domain, so a suppkey predicate",
        "reads the whole table; the Z-order tiles pay ~3x looser",
        "partkey bounds for pruning on BOTH columns (the suppkey row",
        "is the headline: full scan vs ~1/3). On the 2-D box the two",
        "layouts land close because the box includes the linear",
        "layout's own sort column — Z-order's case is secondary-column",
        "and mixed predicates, not beating a dedicated sort at its own",
        "game. Tile sharpness here is partitioner-limited: 64",
        "quantile splits of the zkey don't align with z-block",
        "boundaries, so tiles straddle; more files (or row groups per",
        "file) tighten it. At 100 TB the 'groups' ratio IS the",
        "bytes-read ratio for stats-pruned scans — the wall clocks",
        "here sit under the per-job floor; the footer counts are the",
        "story.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tools.mdsect import replace_section

    replace_section(os.path.join(repo, "SCALING.md"), "zorder",
                    "\n".join(lines))
    print("wrote SCALING.md (zorder section)")


if __name__ == "__main__":
    main()
