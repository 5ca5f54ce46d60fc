"""Distributed PCA / whitening over embedding columns (OP-D3).

The standard preprocessing step before embedding-space curation:
SemDeDup (Abbas et al. 2023) and DataComp-style filtering both run
clustering/near-dup logic on PCA-reduced, whitened embeddings, and a
decorrelated basis is what makes a per-dimension quantizer (IVF/PQ)
competitive. The reference engine has no linear-algebra tier — this
is part of the beyond-reference LLM-pipeline surface, same family as
``ops/cluster.py`` / ``ops/similarity.py``.

Design — one pass, exact-integer moments, driver-side eigh:

- **Covariance never touches a d×n matrix and never shuffles rows.**
  Each partition folds its Arrow batches into a single d×d int64 Gram
  matrix + d-vector column sums with one ``numpy`` matmul per batch
  (``mapInPandas`` — this is the documented "genuinely can't express"
  case: a per-row JVM explode would emit n·d(d+1)/2 product rows
  through codegen, ~2e12 at 1e9×64; the numpy fold does the same
  arithmetic at BLAS-loop speed and emits **d(d+1)/2 + d + 1 rows per
  partition, independent of n**). One tiny shuffle
  (``groupBy(i, j).sum``) merges the partials.
- **Exact under any partitioning.** Components are quantized once to
  an integer grid (``floor(x·scale + 0.5)``, the same recipe as
  ``ops/cluster.quantize_to_grid``); all cross-row sums are then
  int64 — associative, commutative, identical under any retry or
  repartition, and reproduced exactly by the DuckDB oracle. Overflow
  bound: with ``|x| ≤ xmax`` the Gram sum needs
  ``n·(scale·xmax)² < 2^63`` — at the default ``scale=1e4`` and
  unit-normalized embeddings that is n ≲ 9e10 rows. Enforced TWICE
  at runtime: per batch inside the fold (partition-local n — keeps
  the numpy accumulators exact) and, because partition-local checks
  cannot see global n, again with the GLOBAL row count where it is
  visible — ``fit_pca`` checks the collected moments, ``covariance``
  carries an ``assert_true`` in its plan; both use the merged
  cross-partition grid peak the moments frame now ships.
- **Covariance from moments** is a fixed-shape double expression over
  exact integers — ``(S_ij − m_i·m_j/n) / ((n−1)·scale²)`` with an
  explicit cast/operation order — so the float result is
  bit-identical cross-engine (same trick as ``cluster._sq_dist``).
- **eigh on the driver**: the d×d covariance (64² doubles here) is
  collected and decomposed with ``numpy.linalg.eigh`` — O(d³) on one
  machine, the right place for it; no distributed eigensolver
  at d ≤ a few thousand. Component sign is fixed deterministically
  (largest-|component| entry made positive).
- **Projection/whitening is pure JVM column algebra**: the k×d
  component matrix rides into codegen as a literal; per row one
  left-to-right fold per component — no UDF, no shuffle.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_MOMENT_SCHEMA = "i int, j int, s long"


def quantized_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: float = 1e4,
) -> DataFrame:
    """Exact-integer second moments of a vector column, one pass.

    Returns ``(i, j, s)`` with four row kinds:

    - ``i ≥ 0, j ≥ i``: ``s = Σ_rows q_i·q_j`` (upper-triangle Gram),
    - ``i ≥ 0, j = -1``: ``s = Σ_rows q_i`` (column sums),
    - ``i = -1, j = -1``: ``s = n`` (row count),
    - ``i = -2, j = -2``: ``s = max_rows |q|`` (grid-value peak —
      merged with MAX, not SUM; consumers use it to enforce the
      GLOBAL overflow bound ``n·peak² < 2^62``, which the
      partition-local check inside ``fold`` cannot see),

    where ``q = floor(x·scale + 0.5)`` per component. Per-partition
    partials are merged by one ``groupBy(i, j)`` agg — shuffle traffic
    is ``partitions × (d(d+1)/2 + d + 2)`` rows of three ints,
    independent of row count.
    """
    sc = float(scale)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        col_sum = None
        n = 0
        peak = 0.0  # running max |q| across ALL batches seen so far
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * sc + 0.5).astype(np.int64)
            # int64 overflow guard — PARTITION-LOCAL only (n here is
            # this partition's running count): it keeps the numpy
            # accumulators exact. `peak` is a running max across
            # batches so an early large-|q| batch still bounds later
            # growth. The cross-partition (global-n) bound is enforced
            # where global n is visible: fit_pca / covariance.
            peak = max(peak, float(np.abs(q).max(initial=0.0)))
            if gram is None:
                d = q.shape[1]
                gram = np.zeros((d, d), dtype=np.int64)
                col_sum = np.zeros(d, dtype=np.int64)
            if (n + len(q)) * peak * peak >= 2**62:
                raise OverflowError(
                    "quantized_moments: n·(scale·|x|max)² approaches "
                    "2^63 — lower `scale` (grid error is 0.5/scale per "
                    "component; cross-engine exactness holds at any "
                    "scale)"
                )
            gram += q.T @ q
            col_sum += q.sum(axis=0)
            n += len(q)
        if n == 0:
            return
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        out_i = np.concatenate([iu, np.arange(d), [-1], [-2]])
        out_j = np.concatenate([ju, np.full(d, -1), [-1], [-2]])
        out_s = np.concatenate([gram[iu, ju], col_sum, [n], [int(peak)]])
        yield pd.DataFrame({"i": out_i, "j": out_j, "s": out_s})

    partials = df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
    return (
        partials.mapInPandas(fold, _MOMENT_SCHEMA)
        .groupBy("i", "j")
        # peak rows (i = -2) merge with MAX (a max of maxes); every
        # other row kind is an exact int64 SUM.
        .agg(
            F.when(F.col("i") == -2, F.max("s"))
            .otherwise(F.sum("s"))
            .alias("s")
        )
    )


_GLOBAL_BOUND_MSG = (
    "quantized_moments: GLOBAL n·(scale·|x|max)² ≥ 2^62 — every "
    "partition passed its local check but the merged Gram sums can "
    "exceed int64; lower `scale` (grid error is 0.5/scale per "
    "component; cross-engine exactness holds at any scale)"
)


def covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: float = 1e4,
) -> DataFrame:
    """Sample covariance matrix as ``(i, j, cov)`` rows (upper
    triangle, ``i ≤ j``, 0-based), from :func:`quantized_moments`.

    ``cov = (S_ij − m_i·m_j/n) / ((n−1)·scale²)`` evaluated in a fixed
    cast/op order over exact integers — bit-identical cross-engine.
    The moments frame is d²-bounded, so every join below is a
    broadcast over a few thousand rows no matter how large ``df`` is.
    """
    mom = quantized_moments(df, vec_col=vec_col, scale=scale)
    n_row = mom.filter(F.col("i") == -1).select(F.col("s").alias("n"))
    peak_row = mom.filter(F.col("i") == -2).select(
        F.col("s").alias("__peak")
    )
    means = mom.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("mi_pos"), F.col("s").alias("m")
    )
    pairs = mom.filter(F.col("j") >= 0)
    scale2 = float(scale) * float(scale)
    out = (
        pairs.join(
            F.broadcast(means.withColumnRenamed("m", "mi")),
            pairs["i"] == F.col("mi_pos"),
        )
        .drop("mi_pos")
        .join(
            F.broadcast(
                means.select(
                    F.col("mi_pos").alias("mj_pos"), F.col("m").alias("mj")
                )
            ),
            F.col("j") == F.col("mj_pos"),
        )
        .drop("mj_pos")
        .crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(peak_row))
    )
    nd = F.col("n").cast("double")
    # Global overflow bound (the partition-local check in
    # quantized_moments cannot see global n): evaluated per output row
    # (d² rows — trivial) via assert_true, which raises loudly if the
    # merged moments could have wrapped int64. The isNull() filter
    # forces evaluation so column pruning can't drop the assert.
    pk = F.col("__peak").cast("double")
    guard = F.assert_true(
        nd * pk * pk < F.lit(float(2**62)), F.lit(_GLOBAL_BOUND_MSG)
    )
    cov = (
        F.col("s").cast("double")
        - F.col("mi").cast("double") * F.col("mj").cast("double") / nd
    ) / ((nd - F.lit(1.0)) * F.lit(scale2))
    return out.filter(guard.isNull()).select("i", "j", cov.alias("cov"))


class PCAModel(NamedTuple):
    """Driver-side PCA result: ``mean`` (d,), ``eigenvalues`` (k,)
    descending, ``components`` (k, d) rows = principal axes,
    deterministically sign-fixed."""

    mean: list[float]
    eigenvalues: list[float]
    components: list[list[float]]


def fit_pca(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    scale: float = 1e4,
) -> PCAModel:
    """Fit PCA: one distributed pass (:func:`quantized_moments`), then
    ``numpy.linalg.eigh`` on the collected d×d covariance (the only
    collect — d² doubles). Sign convention: each component's
    largest-|entry| coordinate is made positive (ties → lowest index),
    so the basis is unique and reproducible."""
    rows = quantized_moments(df, vec_col=vec_col, scale=scale).collect()
    n = 0
    peak = 0
    sums: dict[int, int] = {}
    grams: dict[tuple[int, int], int] = {}
    for r in rows:
        if r["i"] == -2:
            peak = r["s"]
        elif r["i"] == -1:
            n = r["s"]
        elif r["j"] == -1:
            sums[r["i"]] = r["s"]
        else:
            grams[(r["i"], r["j"])] = r["s"]
    if n < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    # Global overflow bound: the per-partition check inside
    # quantized_moments sees only its partition's n, so P partitions
    # can each pass while the merged Gram wraps. Here global n and the
    # global grid peak are both visible — enforce the documented
    # n·(scale·|x|max)² < 2^62 bound before trusting the moments.
    if n * peak * peak >= 2**62:
        raise OverflowError(_GLOBAL_BOUND_MSG)
    d = max(sums) + 1
    m = np.array([sums[i] for i in range(d)], dtype=np.float64)
    g = np.zeros((d, d), dtype=np.float64)
    for (i, j), s in grams.items():
        g[i, j] = s
        g[j, i] = s
    cov = (g - np.outer(m, m) / n) / ((n - 1) * scale * scale)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        vec = v[:, idx]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    return PCAModel(
        mean=[float(x) for x in m / (n * scale)],
        eigenvalues=[float(w[i]) for i in order],
        components=comps,
    )


def project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Append ``out_col = array<double>`` of the k component scores
    ``vᵀ(x − μ)`` (whitened: ``/√(max(λ,0)+eps)`` — eigh on a
    near-singular covariance returns tiny NEGATIVE eigenvalues, which
    unclamped would make the sqrt NaN and poison the whitened column).
    Pure column algebra — the k×d matrix and mean ride as literals
    into whole-stage codegen; one left-to-right fold per component, no
    UDF, no shuffle."""
    emb = F.col(vec_col).cast("array<double>")
    mean_lit = F.array(*[F.lit(v) for v in model.mean])
    centered = F.zip_with(emb, mean_lit, lambda x, mu: x - mu)
    scores = []
    for ci, comp in enumerate(model.components):
        comp_lit = F.array(*[F.lit(v) for v in comp])
        s = F.aggregate(
            F.zip_with(centered, comp_lit, lambda x, v: x * v),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        if whiten:
            ev = max(float(model.eigenvalues[ci]), 0.0)
            s = s / F.lit(float(np.sqrt(ev + eps)))
        scores.append(s)
    return df.withColumn(out_col, F.array(*scores))
