"""Exact money arithmetic on double columns.

The engine sums money as INTEGER CENTS: per-row ``round(x*100)`` then a
long sum — exact, associative/commutative (order-independent across
partitions and retries), and ~2x faster than decimal aggregation (see
``queries/registry.py`` module docstring for the design note).

``F.round`` on a double routes through ``BigDecimal`` per value in the
JVM (HALF_UP semantics) — measured ~0.5 s over 2.4 M values on one core.
``sign(x) * floor(abs(x)*100 + 0.5)`` is value-identical to HALF_UP
for both signs (away-from-zero ties, e.g. -100.005 -> -10001 cents,
where a bare ``floor(x*100+0.5)`` would give -10000) and stays in pure
double arithmetic inside whole-stage codegen, ~2.3x faster end-to-end
on the Q1 aggregate than the BigDecimal route.

Known FP-carry edge (diagnosability note): ``floor(v + 0.5)`` deviates
from true decimal HALF_UP when the ``+ 0.5`` addition itself rounds up
in binary — the classic ``v = 0.49999999999999994`` gives
``floor(v + 0.5) = 1`` but ``HALF_UP(v) = 0``. Such values cannot arise
from money columns written as ``cents/100`` doubles (the domain here),
but if an oracle ever feeds an adversarial raw double and a 1-cent
mismatch appears against DuckDB ``round()``, this is the first place to
look.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_cents(expr: Column) -> Column:
    """Double money -> exact integer cents (long), HALF_UP both signs.

    ``signum`` folds the sign out so the half-up bias is applied away
    from zero, matching ``ROUND_HALF_UP``/DuckDB ``round()`` for
    negative amounts (refunds, adjustments) as well as positive ones.
    """
    return (F.signum(expr) * F.floor(F.abs(expr) * 100 + F.lit(0.5))).cast("long")


def sum_cents(expr: Column) -> Column:
    """Exact long sum of cents; divide by 100.0 at the end for display."""
    return F.sum(to_cents(expr))


def to_cents_sql(expr: str) -> str:
    """SQL-string twin of :func:`to_cents` for ``F.expr`` callers.

    Plan-identical to the Column form, but the whole expression tree is
    parsed JVM-side in ONE Py4J round trip instead of one per node —
    measured ~0.1 s of driver latency per six-aggregate build (same
    motivation as dedup._bucket_pairs)."""
    return f"CAST(signum({expr}) * floor(abs({expr}) * 100 + 0.5d) AS BIGINT)"


def sum_money_sql(expr: str) -> str:
    """``SUM`` of integer cents, rescaled to a double for display —
    the standard money-aggregate shape as a single SQL string (append
    your own ``AS alias``)."""
    return f"CAST(SUM({to_cents_sql(expr)}) AS DOUBLE) / 100.0"
