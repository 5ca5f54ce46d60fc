"""As-of join (OP-B10) — DuckDB ``ASOF JOIN`` re-expressed Spark-first.

DuckDB exposes ``ASOF JOIN`` as a physical operator; Spark has no SQL
surface for it, so this is the library pattern from SURVEY.md §4.2:
**union + partitioned window + last(ignorenulls)** — one shuffle on the
join key, no range-explosion, no per-key collect. This is the standard
scalable formulation: both sides are tagged and unioned, sorted within
each key partition by (ts, side), and every left row picks up the most
recent right payload via ``last(..., ignorenulls=True)`` over an
unbounded-preceding frame.

Scale properties: cost is one shuffle of |L|+|R| rows on the key plus a
per-partition sort — the same shape as a regular sort-merge join, and
AQE skew-split applies to hot keys. Compare: the naive
``JOIN ... ON l.ts >= r.ts`` + row_number formulation explodes to
O(|matches|) intermediate rows; this stays linear.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key group (backward as-of,
    inclusive — DuckDB's default ``ON l.ts >= r.ts`` semantics).

    ``payload``: right columns to carry (default: all non-key, non-ts).
    ``how``: 'inner' drops unmatched left rows (DuckDB default), 'left'
    keeps them with null payload.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]
    pay_out = {c: (c + suffix if c in left.columns else c) for c in payload}

    # One struct per right row: a single last(ignorenulls) carries ALL
    # payload columns from the SAME right row — filling each payload
    # column independently would mix values across right rows whenever a
    # matching right row holds a legitimate NULL in one payload column.
    right_struct = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c).alias(pay_out[c]) for c in payload],
    )
    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(_TS, F.col(left_ts))
    # A NULL right_ts can never satisfy ts <= left_ts, but its payload
    # struct is non-null and NULLs sort FIRST ascending — last(ignorenulls)
    # would hand its payload to left rows with no real match. Drop them.
    right = right.filter(F.col(right_ts).isNotNull())
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        right_struct.alias("__asof_payload"),
    )

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # Right rows (side=0) sort before left rows at equal ts → inclusive.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__asof_payload", ignorenulls=True).over(w).alias("__f_payload"),
    )
    out = (
        filled.filter(F.col(_SIDE) == 1)
        .select(
            *left.columns,
            *[F.col("__f_payload")[pay_out[c]].alias(pay_out[c]) for c in payload],
            F.col("__f_payload")["__matched_ts"].alias("matched_ts"),
        )
    )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out
