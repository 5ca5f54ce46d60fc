"""Similarity search over embedding columns (OP-D3).

Brute-force cosine is the correctness baseline (exact, one pass, no
shuffle when the query vector is a literal); the scale path is
random-hyperplane LSH bucketing (cosine LSH) that prunes the candidate
set before exact re-ranking. Dot products run JVM-side via
``zip_with`` + ``aggregate`` higher-order functions — no Python UDF in
the hot path.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def topk_cosine(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    Plan shape: narrow map (cosine per row) + TakeOrderedAndProject —
    per-partition heaps, no global sort, no shuffle of vectors. This is
    the right baseline even at 100 TB: it reads every vector once.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = _as_double_array(vec_col)
    return (
        df.select(F.col(id_col), cosine(emb, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).
    Exact O(n²) formulation — use :func:`lsh_topk_cosine`'s bucketing at
    scale."""
    from filefilter_spark.ops.text import _bind

    emb = _as_double_array(vec_col)
    # let-bind the norm: computing it inside the transform lambda would
    # re-run the O(d) aggregate once per element (O(d²) per row).
    unit = _bind(norm(emb), lambda nn: F.transform(emb, lambda v: v / nn))
    n = df.select(F.col(id_col).alias("id"), unit.alias("unit"))
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dot(F.col("a.unit"), F.col("b.unit")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Sub-quadratic embedding near-dup: candidate pairs share an LSH
    bucket in ≥1 of ``n_tables`` tables (union via explode + self-join
    per bucket), then exact cosine verifies ≥ threshold — same
    bucket-then-verify shape as MinHash LSH, so precision is exact and
    only recall is probabilistic (measured vs :func:`cosine_pairs` in
    tests). This is the scale path; ``cosine_pairs`` is the O(n²)
    oracle baseline.

    Tuning is the classic r×b banding curve with per-plane agreement
    a = 1-θ/π: pair recall = 1-(1-a^r)^b. Defaults (r=6, b=8) give
    ~0.97 at cosine 0.9; for looser thresholds use fewer planes and
    more tables (e.g. r=4, b=12 → ~0.9 recall at cosine 0.45)."""
    from filefilter_spark.ops.text import _bind

    emb = _as_double_array(vec_col)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    # Bucket membership carries only (id, table, bucket) — candidate
    # generation and dedup shuffle narrow id pairs, never vectors.
    buckets = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), lsh_signature(emb, planes).alias("b"))
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "tb.t", "tb.b")
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    unit = _bind(norm(emb), lambda nn: F.transform(emb, lambda v: v / nn))
    units = df.select(F.col(id_col).alias("id"), unit.alias("unit"))
    return (
        candidates.join(units.select(F.col("id").alias("id_a"), F.col("unit").alias("ua")), "id_a")
        .join(units.select(F.col("id").alias("id_b"), F.col("unit").alias("ub")), "id_b")
        .withColumn("cos_sim", dot(F.col("ua"), F.col("ub")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def build_ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """IVF (inverted-file) coarse quantizer: KMeans the corpus into
    ``n_lists`` centroid cells; every vector is assigned to its nearest
    cell. Returns (assigned DataFrame with a ``cell`` column, centroid
    list). At scale the assigned table is written partitioned by
    ``cell`` so probes are partition-pruned reads — the same storage
    trick as the LSH buckets, with data-adaptive cells instead of
    random hyperplanes."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        F.col(id_col),
        _as_double_array(vec_col).alias("__arr"),
    ).withColumn("__vec", array_to_vector("__arr"))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__vec", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, "__arr", "cell")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk_cosine(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """IVF ANN top-k: score the query against the (driver-side, tiny)
    centroid table, probe the ``n_probe`` nearest cells, exact-rerank
    only those vectors. Complements :func:`lsh_topk_cosine` — IVF cells
    adapt to the data distribution, LSH needs no training pass."""
    import math

    assigned, centroids = build_ivf_index(df, n_lists, vec_col, id_col, seed)

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe_cells = sorted(
        range(len(centroids)), key=lambda i: -cos(query_vec, centroids[i])
    )[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), cosine(F.col("__arr"), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random as _random

    rng = _random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (cosine) LSH: one sign bit per plane, packed to
    a BIGINT bucket id."""
    sig = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(dot(vec, p) > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
    return sig


def lsh_topk_cosine(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    multiprobe_bits: int = 2,
) -> DataFrame:
    """ANN top-k: probe only rows whose LSH bucket is within Hamming
    distance ``multiprobe_bits`` of the query's bucket in any of
    ``n_tables`` hash tables, then exact-rerank the candidates.

    Multi-probe is what makes the recall/selectivity tradeoff work: a
    single-bucket probe at 8 planes catches only ~(1-θ/π)^8 of true
    neighbors per table (~15% over 4 tables at cosine 0.5), while
    probing the 1+8+28=37 buckets within Hamming ≤2 lifts that to ~90%
    and still prunes to 37/256 of each table. At scale the bucketed
    table is written partitioned by (table, bucket) so every probed
    bucket is a pruned partition read; tests measure recall against the
    exact baseline.
    """
    emb = _as_double_array(vec_col)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    sig_cols = [lsh_signature(emb, planes).alias(f"sig{t}") for t, planes in enumerate(tables)]
    with_sigs = df.select(F.col(id_col), emb.alias("__emb"), *sig_cols)

    q_sigs = []
    for planes in tables:
        s = 0
        for j, plane in enumerate(planes):
            if sum(p * x for p, x in zip(plane, query_vec)) > 0:
                s |= 1 << j
        q_sigs.append(s)

    def probe_set(qs: int) -> list[int]:
        probes = {qs}
        if multiprobe_bits >= 1:
            probes |= {qs ^ (1 << i) for i in range(n_planes)}
        if multiprobe_bits >= 2:
            probes |= {
                qs ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            }
        return sorted(probes)

    cond = F.lit(False)
    for t, qs in enumerate(q_sigs):
        cond = cond | F.col(f"sig{t}").isin(probe_set(qs))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        with_sigs.filter(cond)
        .select(F.col(id_col), cosine(F.col("__emb"), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
