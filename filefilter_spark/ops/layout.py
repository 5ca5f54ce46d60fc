"""Z-order (Morton) data layout for multi-dimensional scan pruning
(OP-A9 sink tier).

A 100 TB table is read through parquet row-group min/max statistics:
a scan with a predicate skips every row group whose stats exclude it.
Sorting the write by ONE column makes that column's stats tight and
every other column's stats useless — a predicate on a second
dimension still reads the whole table. Interleaving the bits of k
normalized columns into a single sort key (the Z-order curve — the
layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`) makes row
groups into k-dimensional tiles: EVERY interleaved column's min/max
range within a row group is narrow, so selective predicates on any of
them (or any combination) prune.

Everything here is exact integer arithmetic — no floats anywhere —
so the key is bit-identical across engines, partitionings and
retries:

- normalization: ``u = (v − min) · (2^bits − 1) DIV (max − min)``
  (integer floor division; all inputs are BIGINT, and both engines'
  integer division agree on non-negative operands);
- interleave: the bit-shift/mask sum unrolled over ``bits × k``
  literal terms — plain ``&``/``>>``/``*`` on BIGINT, identical in
  Spark SQL and DuckDB, and fully inside whole-stage codegen.

The column min/max bounds come from one map-combined aggregate
(2k scalars to the driver) unless the caller passes known bounds.

Scale shape of :func:`write_zordered`:
``repartitionByRange(zkey)`` — one range-exchange shuffle (AQE-sized,
the same cost any global sort pays) — then ``sortWithinPartitions``
so parquet row groups inherit contiguous z-ranges. The probe
(``tools/zorder_probe.py``) measures the payoff directly from parquet
footers: row groups whose min/max box intersects a 2-D predicate box,
z-ordered vs single-column-sorted.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def normalize_expr(col: Column, lo: int, hi: int, bits: int) -> Column:
    """``(v−lo)·(2^bits−1) DIV (hi−lo)`` as exact BIGINT math; constant
    0 when the column has no range. Values outside [lo, hi] are
    clamped first (callers passing static bounds on drifting data get
    edge cells, not corrupt keys).

    The floor division is spelled ``(s − pmod(s, d)) / d``: s−pmod is
    exactly divisible, and IEEE double division of exactly-divisible
    longs whose quotient (< 2^bits) is representable returns the exact
    quotient — pure Column API, no SQL-string splicing, same result as
    DuckDB's ``//`` on the non-negative operands this produces."""
    if hi <= lo:
        return F.lit(0).cast("long")
    top = (1 << bits) - 1
    d = hi - lo
    c = F.greatest(F.least(col.cast("long"), F.lit(hi)), F.lit(lo))
    s = (c - F.lit(lo)) * F.lit(top).cast("long")
    return ((s - F.pmod(s, F.lit(d))) / F.lit(d)).cast("long")


def _interleave(us: Sequence[Column], bits: int) -> Column:
    """Morton interleave, unrolled to ``bits × len(us)`` literal
    shift/mask terms (column shift amounts are not portable; literal
    unrolling is, and keeps the whole key in codegen)."""
    n = len(us)
    terms = []
    for i in range(bits):
        for c, u in enumerate(us):
            terms.append(
                (F.shiftright(u, i).bitwiseAND(F.lit(1)))
                * F.lit(1 << (i * n + c)).cast("long")
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def column_bounds(
    df: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[int, int]]:
    """One aggregate pass → {col: (min, max)}. 2·k scalars of driver
    traffic regardless of table size."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "zkey",
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Attach the Z-order key for ``cols`` (integral columns; cast
    dates/decimals to long upstream). ``bounds`` skips the min/max
    pass when the caller already knows the ranges (static partition
    bounds, catalog stats)."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    us = [
        normalize_expr(F.col(c), bounds[c][0], bounds[c][1], bits)
        for c in cols
    ]
    return df.withColumn(key_col, _interleave(us, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``cols``: range-partition by the key (one shuffle; explicit file
    count when ``num_files`` is given, else AQE-coalesced), sort
    within partitions, drop the key from the stored schema (it is
    derivable; storing it would change the logical schema)."""
    keyed = with_zorder(df, cols, bits=bits)
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "zkey")
    else:
        keyed = keyed.repartitionByRange("zkey")
    (
        keyed.sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
