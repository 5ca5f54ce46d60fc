"""Skew mitigation helpers — salting patterns for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew, but two shapes still need explicit salting at 100 TB:

- ``salted_agg``: a groupBy whose hottest key holds a large fraction of
  all rows. Spark's partial (map-side) aggregation already absorbs most
  of this for algebraic aggregates; salting matters for holistic ones
  (``collect_list``, exact percentiles) where every value must travel.
  Two-phase: aggregate on (key, salt) — spreading one hot key over
  ``n_salts`` reducers — then combine the partials per key.
- ``salted_join``: a shuffle join with a hot key on the big side.
  The big side gets a random salt in [0, n_salts); the SMALL side is
  replicated ``n_salts``× (explode) so every salted big-side row still
  finds its match. Total small-side inflation = n_salts× — chosen
  per-key in production (salt only the measured-hot keys); uniform here
  for clarity.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: dict[str, Column],
    combine: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial``: alias → aggregate expression for phase 1 (per key+salt).
    ``combine``: alias → aggregate over the phase-1 columns for phase 2.

    Example — skew-proof exact count + sum:
        salted_agg(df, ["k"],
                   partial={"c": F.count("*"), "s": F.sum("v")},
                   combine={"c": F.sum("c"), "s": F.sum("s")})
    """
    salted = df.withColumn(SALT, (F.rand(seed=13) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, SALT).agg(
        *[expr.alias(name) for name, expr in partial.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in combine.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    strategy: str | None = None,
) -> DataFrame:
    """Skew-resistant shuffle join: salt the big side, replicate the
    small side across all salts, join on keys+salt, drop the salt.

    The salt only matters when the join actually SHUFFLES on the keys
    — if Catalyst broadcasts the (replicated) small side the hot key
    never concentrates in one task and the salt is a harmless no-op.
    Pass ``strategy="shuffle_hash"`` (or ``"merge"``) to pin the
    shuffle plan, as a caller with a just-above-broadcast-threshold
    small side would; output rows are identical to the unsalted join
    for every BIG-side-preserving join type (each big row carries one
    salt and the small side covers all of them).

    Only ``inner``/``left``/``left_semi``/``left_anti`` are accepted:
    a ``right``/``full`` join against the REPLICATED small side would
    emit every unmatched small row once per salt (and spurious
    null-extended rows for salts the big side never drew) — for those,
    salt the other side or use AQE's skew-join handling.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"(got {how!r}): the salt-replicated small side would "
            "duplicate unmatched small rows under right/full"
        )
    keys = list(on)
    big_s = big.withColumn(SALT, (F.rand(seed=13) * n_salts).cast("int"))
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if strategy:
        big_s = big_s.hint(strategy)
    return big_s.join(small_s, keys + [SALT], how).drop(SALT)


def top_key_shares(
    df: DataFrame,
    keys: Sequence[str] | str,
    n: int = 10,
) -> list[tuple[tuple, int, float]]:
    """Skew DETECTOR: the ``n`` hottest key values and the fraction of
    all rows each holds — ``[(key_tuple, count, share), ...]``,
    hottest first (count desc, key asc for determinism).

    One map-combined groupBy + TakeOrderedAndProject (n rows to the
    driver) + one count — cheap enough to run ad hoc before choosing
    a plan. Routing rule of thumb from the measured crossovers
    (SCALING.md "skew" and "window-skew"): a top share ≳0.05 on a
    join/window key is straggler territory on a large cluster — route
    joins through :func:`salted_join`, aggregations through
    :func:`salted_agg`, sessionization through
    ``ops.sessions.sessionize_skewed``, and percentile gates through
    ``ops.corpus.keep_top_fraction_skewed`` (the gate's two-phase form
    pays off when one group holds ≳30% of rows)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(*key_list)
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), *[F.asc(k) for k in key_list])
        .limit(n)
        .collect()
    )
    return [
        (tuple(r[k] for k in key_list), int(r["__n"]),
         float(r["__n"]) / total)
        for r in rows
    ]


# Auto-routing threshold, from the measured crossovers (SCALING.md
# "Window-skew tier" and "Salted join straggler collapse"): the
# two-phase/salted forms pay a constant overhead below the skew regime
# and win past roughly one key holding ~30% of rows — below it the
# plain single-window/join form is faster AND simpler.
SKEW_AUTO_THRESHOLD = 0.30


def max_key_share(
    df: DataFrame, keys: Sequence[str] | str
) -> float:
    """Fraction of all rows held by the HOTTEST key — the one number
    the ``skewed: auto`` routing needs, in ONE job: groupBy count with
    map-side combine (shuffle bounded by distinct keys), then a
    single-row max/sum fan-in. Unlike :func:`top_key_shares` it skips
    the separate total count and never materializes key identities.
    Returns 0.0 for an empty frame."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    row = (
        df.groupBy(*key_list)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__mx"), F.sum("__n").alias("__tot"))
        .first()
    )
    if row is None or row["__tot"] is None or int(row["__tot"]) == 0:
        return 0.0
    return float(row["__mx"]) / float(row["__tot"])


def should_route_skewed(
    df: DataFrame,
    keys: Sequence[str] | str,
    threshold: float = SKEW_AUTO_THRESHOLD,
) -> tuple[bool, float]:
    """The ``skewed: auto`` decision (r15, mechanizing the SCALING.md
    rule of thumb): ``(route_to_skewed_form, measured_max_share)``.
    One bounded detector job (:func:`max_key_share`) — at 100 TB
    that's one extra map-combined pass, the price of not having to
    know your key distribution in advance; callers who DO know pass
    ``skewed: true/false`` and skip it."""
    share = max_key_share(df, keys)
    return share >= float(threshold), share
