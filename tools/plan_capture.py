"""Capture .explain("formatted") for headline queries into plans/<dir>/.

The optimization-round deliverable: one text file per query holding the
formatted physical plan, so plan claims in OPTIMIZATION_r*.md can be
checked without running Spark.

Usage:
    python tools/plan_capture.py <out_dir> <suffix> [sf_dir] [names...]

- out_dir:  e.g. plans/r16
- suffix:   appended to the file name, e.g. "before" -> OP-B12_before.txt
- sf_dir:   defaults to /root/testdata/sf0.1
- names:    defaults to the bench HEADLINE list

Multi-job operators (iterative k-means, CC loops, index builds) return
a final DataFrame whose plan covers the last declarative stage; the
header of each file says so explicitly where it applies.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from filefilter_spark.session import get_spark

    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]

    for name in names:
        builder = qs.get(name)
        if builder is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan_capture {name}")
        try:
            df = builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep going
            text = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} @ {sf_dir} ({suffix})\n"
                "# Final-DataFrame physical plan; multi-job operators\n"
                "# (iterative loops, index builds) run earlier jobs whose\n"
                "# plans are not part of this declarative tree.\n\n"
            )
            fh.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
