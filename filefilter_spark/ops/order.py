"""Deterministic global ordering without a global sort bottleneck
(OP-D7): reproducible corpus shuffle and curriculum ordering.

Two operators every large-scale pretraining pipeline needs and Spark
users routinely get wrong by writing
``row_number() OVER (ORDER BY …)`` — a window with no PARTITION BY,
which Catalyst executes as a **single-partition sort**: one task sorts
the whole corpus.

The shared primitive here (:func:`ranked_by`) assigns exact,
consecutive 1-based global positions with NO single-partition pass
over the data:

1. pick a **bucket** expression that is monotone non-decreasing along
   the desired sort order (a prefix of the sort key: leading hex chars
   of an md5 key, a clamped range of a score). Monotonicity means
   ordering by ``(bucket, key)`` IS the global order.
2. one small aggregation counts rows per bucket; a window over that
   ≤``buckets``-row frame (tiny — the only "global" sort is over bucket
   ids, not rows) turns counts into cumulative start offsets.
3. ``position = offset[bucket] + row_number() OVER (PARTITION BY
   bucket ORDER BY key)`` — the per-bucket window shuffles once on
   bucket and sorts only bucket-local runs; the offsets join is a
   broadcast.

Cost at scale: one data shuffle + one ≤buckets-row agg, vs. the naive
form's all-rows-to-one-task sort. Output positions are identical to
the naive form's (the oracle for both registry entries IS the plain
global ``row_number`` — DuckDB can afford it at oracle scale).

- :func:`deterministic_shuffle` — the reproducible pre-training
  shuffle: position by ``md5(seed:id)``. Same seed → same permutation
  on any cluster size, partitioning, or engine; changing the seed
  reshuffles. This is how a 100 TB corpus gets "shuffled once,
  globally, reproducibly" before sequence packing — no RNG state, no
  ``orderBy(rand())`` (nondeterministic under retry!).
- :func:`curriculum_order` — curriculum learning order (Bengio et al.
  2009): documents ranked by a difficulty/quality score, split into
  ``phases`` contiguous equal-size phases (easy → hard), then
  deterministically shuffled WITHIN each phase (training wants
  curriculum at the macro scale but i.i.d. order inside a phase).
  Phase assignment is exact integer arithmetic on the global score
  rank — no approximate quantiles, so the DuckDB oracle matches
  bit-for-bit.

Reference parity: the reference engine has no ordering tier beyond
ORDER BY (filefilter.py sorts via DuckDB); both ops are
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def md5_key(id_col: str | Column, seed: str = "") -> Column:
    """Deterministic per-row shuffle key: lowercase-hex
    ``md5(seed || ':' || id)`` — identical in Spark and DuckDB
    (``md5('s' || ':' || CAST(id AS VARCHAR))``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))


def hex_prefix_bucket(key: Column, hex_chars: int = 3) -> Column:
    """Bucket = integer value of the key's first ``hex_chars`` hex
    digits (16^hex_chars buckets, uniform for hash keys). A string
    PREFIX is monotone in the string order, so this is a valid
    :func:`ranked_by` bucket for md5-keyed sorts."""
    return F.conv(F.substring(key, 1, hex_chars), 16, 10).cast("int")


def _check_reserved(df: DataFrame, names: Sequence[str], op: str) -> None:
    """Raise instead of silently overwriting: these operators stage
    internal working columns (and outputs) via ``withColumn``, which
    REPLACES an existing column of the same name — an input frame
    already carrying one would come back corrupted with no warning."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {clash} — these names "
            "are reserved (internal working/output columns); rename "
            "them before calling"
        )


def ranked_by(
    df: DataFrame,
    bucket: Column,
    order_by: Sequence[Column],
    pos_col: str = "pos",
) -> DataFrame:
    """Exact consecutive 1-based global rank along ``order_by``,
    computed bucket-parallel (see module docstring). CONTRACT:
    ``bucket`` must be monotone non-decreasing along ``order_by`` —
    i.e. sorting by ``(bucket, *order_by)`` equals sorting by
    ``order_by`` alone. Callers own that invariant (prefix buckets
    and clamped score ranges satisfy it by construction). Raises if
    the input already carries ``__bucket``/``__offset``/``pos_col``."""
    _check_reserved(df, ["__bucket", "__offset", pos_col], "ranked_by")
    with_bucket = df.withColumn("__bucket", bucket)
    counts = with_bucket.groupBy("__bucket").agg(F.count("*").alias("__cnt"))
    # ≤`buckets` rows: the unpartitioned window here sorts bucket IDS,
    # never data rows.
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__cnt").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__bucket", "__offset")
    local = F.row_number().over(
        Window.partitionBy("__bucket").orderBy(*order_by)
    )
    return (
        with_bucket.join(F.broadcast(offsets), "__bucket")
        .withColumn(pos_col, (F.col("__offset") + local).cast("bigint"))
        .drop("__bucket", "__offset")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "",
    hex_chars: int = 3,
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global shuffle: append ``pos_col`` = the row's
    1-based position in the permutation ordered by
    ``md5(seed:id), id`` (the id tiebreak makes even an md5 collision
    deterministic). ``16^hex_chars`` buckets (default 4096); raise
    ``hex_chars`` so a bucket's rows fit one task's sort at the
    target scale. Raises if the input already carries ``__key`` (or
    any :func:`ranked_by` reserved name)."""
    _check_reserved(df, ["__key"], "deterministic_shuffle")
    key = md5_key(id_col, seed)
    out = df.withColumn("__key", key)
    return ranked_by(
        out,
        hex_prefix_bucket(F.col("__key"), hex_chars),
        [F.col("__key"), F.col(id_col)],
        pos_col=pos_col,
    ).drop("__key")


def range_bucket(
    score: Column, lo: float, hi: float, buckets: int = 1024
) -> Column:
    """Monotone score bucket: ``clamp(floor((s − lo)/(hi − lo)·B))``.
    Values outside [lo, hi) clamp to the edge buckets (still monotone,
    so ranks stay exact — only balance degrades). Balance depends on
    the score distribution; pick bounds covering the bulk of it."""
    b = F.floor(
        (score - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(buckets))
    ).cast("int")
    return F.least(F.greatest(b, F.lit(0)), F.lit(buckets - 1))


def curriculum_order(
    df: DataFrame,
    score_col: str | Column,
    id_col: str = "doc_id",
    phases: int = 4,
    seed: str = "",
    lo: float = 0.0,
    hi: float = 1.0,
    score_buckets: int = 1024,
    hex_chars: int = 2,
) -> DataFrame:
    """Curriculum ordering: rank by ``(score, id)`` ascending (easy →
    hard by convention — pass a negated score for the reverse), split
    the rank range into ``phases`` contiguous phases of near-equal
    size (``phase = ((rank−1)·phases) div n`` — exact integers), then
    position rows by a deterministic md5 shuffle WITHIN each phase.

    Returns the input plus ``phase`` (0-based int) and ``pos``
    (1-based global position in curriculum order). Two bucket-parallel
    rank passes + one tiny count — no global sort, no approximate
    quantiles (approx cutoffs would make phase boundaries
    partition-dependent; rank arithmetic keeps them exact and the
    cross-engine oracle bit-stable).

    ``lo``/``hi``/``score_buckets`` tune the internal score bucketing
    only (see :func:`range_bucket`) — they affect balance, never
    values. Raises if the input already carries any of the working
    or output names (``__score``/``__rank``/``__key``/``__n``/
    ``phase``/``pos``).
    """
    _check_reserved(
        df,
        ["__score", "__rank", "__key", "__n", "phase", "pos"],
        "curriculum_order",
    )
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    ranked = ranked_by(
        df.withColumn("__score", s.cast("double")),
        range_bucket(F.col("__score"), lo, hi, score_buckets),
        [F.col("__score"), F.col(id_col)],
        pos_col="__rank",
    )
    n1 = df.agg(F.count("*").alias("__n"))
    phased = ranked.crossJoin(F.broadcast(n1)).withColumn(
        "phase",
        F.expr(f"CAST(((__rank - 1) * {int(phases)}) DIV __n AS INT)"),
    )
    key = md5_key(id_col, seed)
    out = phased.withColumn("__key", key)
    # bucket = (phase, key-prefix) packed into one int: monotone along
    # (phase, key) because phase is its high-order digits.
    bucket = F.col("phase") * (16**hex_chars) + hex_prefix_bucket(
        F.col("__key"), hex_chars
    )
    return (
        ranked_by(
            out,
            bucket,
            [F.col("phase"), F.col("__key"), F.col(id_col)],
            pos_col="pos",
        )
        .drop("__key", "__rank", "__n", "__score")
    )
