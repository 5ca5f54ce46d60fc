"""Keyword retrieval and rank fusion (OP-D4-bm25 / OP-D3-hybrid).

The reference's engine answers similarity queries only through its SQL
tier (reference ``Database.py:64-92`` delegates everything relational to
embedded DuckDB); a training-data pipeline at 100 TB also needs the
retrieval primitives on top — BM25 keyword search over the corpus and
reciprocal-rank fusion of keyword + embedding rankings (the standard
hybrid-retrieval shape for dataset curation: find-docs-like-this with
both lexical and semantic evidence).

Spark-first design, both operators:

* ``bm25_topk`` is TWO corpus passes and ZERO wide shuffles. The query
  term list is tiny and rides into both passes as literals (never a
  join): pass 1 computes per-doc (dl, tf per term) IN-ROW — no explode,
  ``F.size(F.filter(tokens, t == term))`` per term — and folds them
  through one map-combined global aggregate into a single stats row
  (N, Σdl, df per term). The driver turns that row into idf literals;
  pass 2 scores each doc as a pure projection (whole-stage codegen,
  fixed left-to-right term order) and takes top-k via
  TakeOrderedAndProject — per-partition heaps, no global sort. At
  100 TB: two scans, one single-row fan-in, k rows to the driver.
* ``rrf_fuse`` joins two SMALL ranked lists (top-n each) — a
  broadcast-sized full outer join, never a corpus-scale operation.

Cross-engine determinism: ranks are taken on the 6dp-ROUNDED score with
an id tiebreak (the topk_cosine / tfidf guard — raw doubles from two
engines' fold orders can differ in the last ulp), idf uses
``math.log(1.0 + x)`` to match SQL ``ln(1 + x)`` operand-for-operand
(NOT ``log1p``, which is a different float function), and every scoring
expression fixes the same operand order the DuckDB oracle spells out.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from filefilter_spark.ops.text import _bind, tokens


def _per_term_tf(tok: Column, term: str) -> Column:
    """Occurrences of ``term`` in a token array — in-row, no explode."""
    return F.size(F.filter(tok, lambda t: t == F.lit(term)))


def _normalize_terms(query_terms: Sequence[str], lowercase: bool) -> list[str]:
    """Lowercase (when asked) then DEDUPE preserving first-occurrence
    order. Every retrieval entry point normalizes through here so a
    duplicated query term ('spark spark') scores identically on the
    scan, batch, and indexed paths: without the dedupe the scan path
    would sum the term's contribution once per occurrence while the
    indexed path's (doc, term) postings count it once — divergent
    top-k membership from user YAML (ADVICE r13). BM25's classic
    per-term form treats the query as a term SET; the dedupe makes
    that the contract everywhere."""
    normed = [t.lower() for t in query_terms] if lowercase else list(query_terms)
    seen: set[str] = set()
    out: list[str] = []
    for t in normed:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


@dataclass(frozen=True)
class Bm25Stats:
    """:func:`bm25_corpus_stats` result. Iterates as the legacy
    ``(n, avgdl, dfs)`` triple; additionally carries the NORMALIZED
    term list the dfs were computed for, so :func:`bm25_topk` can
    verify a precomputed stats object actually belongs to the query
    (a same-length df list from a different term list would silently
    produce wrong idf weights — ADVICE r13)."""

    n: int
    avgdl: float
    dfs: list[int]
    terms: tuple[str, ...]

    def __iter__(self):
        return iter((self.n, self.avgdl, self.dfs))


def bm25_corpus_stats(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    lowercase: bool = True,
) -> Bm25Stats:
    """One map-combined pass → :class:`Bm25Stats` (N, avgdl, df per
    NORMALIZED query term — lowercased when asked, duplicates removed
    first-occurrence order; ``.terms`` records exactly which list the
    dfs align with).

    The aggregate is a single row regardless of corpus size: partial
    aggregation happens map-side per partition, the fan-in is one
    grouped row. ``avgdl`` is Σdl/N on exact int64 inputs, so the same
    IEEE division reproduces bit-identically in any engine."""
    query_terms = _normalize_terms(query_terms, lowercase)
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    per_doc = df.select(
        _bind(
            tokens(src),
            lambda tok: F.struct(
                F.size(tok).alias("dl"),
                *[
                    (_per_term_tf(tok, t) > 0).cast("long").alias(f"hit_{i}")
                    for i, t in enumerate(query_terms)
                ],
            ),
        ).alias("s")
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s.dl").alias("sum_dl"),
        *[
            F.sum(f"s.hit_{i}").alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    ).first()
    n = int(row["n"])
    avgdl = float(row["sum_dl"]) / n if n else 0.0
    dfs = [int(row[f"df_{i}"] or 0) for i in range(len(query_terms))]
    return Bm25Stats(n, avgdl, dfs, tuple(query_terms))


def bm25_idf(n: int, df_t: int) -> float:
    """Robertson-Sparck Jones idf with the +1 floor (the Lucene/BM25+
    form, always positive): ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    stats: tuple[int, float, list[int]] | None = None,
) -> DataFrame:
    """BM25 top-k over a document table for a literal query.

    Returns (id_col, bm25) with bm25 rounded to 6dp; ordering and
    top-k membership are decided on the rounded score (id tiebreak).
    Score per doc, summed left-to-right in query-term order:

        Σ_t idf_t * (tf_t * (k1+1)) / (tf_t + k1 * (1 - b + b*dl/avgdl))

    Query terms are normalized (lowercased, then deduped preserving
    first-occurrence order) so duplicated terms score identically on
    the scan, batch, and indexed paths — BM25 treats the query as a
    term set.

    ``stats`` accepts a precomputed :func:`bm25_corpus_stats` result
    (for the SAME term list) so repeated queries against an unchanged
    corpus skip the stats pass and pay only the scoring scan; a
    :class:`Bm25Stats` is verified term-for-term against the query,
    not just by length.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = _normalize_terms(query_terms, lowercase)
    n, avgdl, dfs = (
        stats
        if stats is not None
        else bm25_corpus_stats(df, terms, text_col, lowercase=lowercase)
    )
    if isinstance(stats, Bm25Stats) and list(stats.terms) != terms:
        raise ValueError(
            f"bm25_topk: stats was computed for terms {list(stats.terms)} "
            f"but the query normalizes to {terms} — stats must come from "
            "bm25_corpus_stats over the same term list"
        )
    if len(dfs) != len(terms):
        raise ValueError(
            f"bm25_topk: stats carries {len(dfs)} df values for "
            f"{len(terms)} query terms — stats must come from "
            "bm25_corpus_stats over the same term list"
        )
    if n == 0 or avgdl == 0.0:
        return df.select(F.col(id_col), F.lit(0.0).alias("bm25")).limit(0)
    idfs = [bm25_idf(n, d) for d in dfs]

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)

    def score(tok: Column) -> Column:
        dl = F.size(tok).cast("double")
        norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
        total = F.lit(0.0)
        for term, idf in zip(terms, idfs):
            tf = _per_term_tf(tok, term).cast("double")
            total = total + F.lit(idf) * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        return total

    return (
        df.select(
            F.col(id_col),
            F.round(_bind(tokens(src), score), 6).alias("bm25"),
        )
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def ranked(
    df: DataFrame, score_col: str, id_col: str, ascending: bool = False
) -> DataFrame:
    """Attach dense 1-based ranks to an ALREADY-SMALL ranked list
    (top-n output). Single-partition window by construction — the
    input is k rows, never corpus-scale. ``ascending=True`` ranks
    smallest-first (distance metrics: L2 ``dist2``), default ranks
    largest-first (similarity scores: bm25, cosine)."""
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.orderBy(order, F.asc(id_col))
    return df.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al. 2009):
    score(d) = 1/(k_rrf + rank_a(d)) + 1/(k_rrf + rank_b(d)), missing
    ranks contribute 0. Inputs are top-n lists (small); the full outer
    join is broadcast-sized. Fixed two-operand addition keeps the
    score bit-deterministic; membership/order decided on the rounded
    score with id tiebreak."""
    ra = a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    rb = b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = ra.join(rb, on=id_col, how="full_outer").select(
        F.col(id_col),
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("rrf_score"),
        "rank_a",
        "rank_b",
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)


def rrf_fuse_batch(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    q_col: str = "q_id",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """:func:`rrf_fuse` for a BATCH of queries: fuse two per-query
    ranked tables (q_col, id_col, ..., rank) — e.g.
    ``bm25_batch_topk_indexed`` × ``pq.ivfpq_batch_topk`` — into
    per-query top-k fusions, all queries in one plan. Inputs are
    top-n·|queries| rows (small), so the full outer join is
    broadcast-scale; the per-query top-k rank window rewrites to
    WindowGroupLimit. Same score recipe and determinism contract as
    :func:`rrf_fuse` (fixed two-operand addition, 6dp round, id
    tiebreak). Returns (q_col, id_col, rrf_score, rank_a, rank_b,
    rank)."""
    ra = a.select(
        F.col(q_col), F.col(id_col), F.col("rank").alias("rank_a")
    )
    rb = b.select(
        F.col(q_col), F.col(id_col), F.col("rank").alias("rank_b")
    )
    fused = ra.join(rb, on=[q_col, id_col], how="full_outer").select(
        F.col(q_col),
        F.col(id_col),
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("rrf_score"),
        "rank_a",
        "rank_b",
    )
    w = Window.partitionBy(q_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_col, id_col, "rrf_score", "rank_a", "rank_b", "rank")
    )


def bm25_batch_topk(
    df: DataFrame,
    queries: dict[str, Sequence[str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """BM25 top-k for EACH of a batch of term queries in ONE corpus
    scan — the retrieval-evaluation shape (N eval queries against the
    full corpus), the lexical twin of ``similarity.batch_topk_cosine``.

    Returns (q_id, id_col, bm25, rank). Shape: one stats pass for the
    UNION of all query terms (still a single map-combined one-row
    aggregate — per-term hits are in-row), then one scoring scan that
    computes every query's score from a per-row tf array bound ONCE
    (the ``_bind`` let-binding: tokenize once, tf per union-term once,
    each query's score indexes into that array), explodes to
    (q_id, score) rows, and takes per-query top-k through a
    rank-over-window that Spark rewrites to WindowGroupLimit — partial
    per-partition top-k map-side, so the single shuffle carries at most
    k·|queries| rows per partition, never the corpus.

    Determinism contract matches :func:`bm25_topk`: rounded-score
    ranking with id tiebreaks, fixed per-query term order.
    """
    if not queries:
        raise ValueError("bm25_batch_topk: queries must be non-empty")
    qids = list(queries)
    # same normalization contract as bm25_topk: lowercase, then dedupe
    # per query preserving first-occurrence order (dup terms count once)
    norm_terms = {
        q: _normalize_terms(ts, lowercase) for q, ts in queries.items()
    }
    for q, ts in norm_terms.items():
        if not ts:
            raise ValueError(f"bm25_batch_topk: query {q!r} has no terms")
    union_terms: list[str] = []
    for ts in norm_terms.values():
        for t in ts:
            if t not in union_terms:
                union_terms.append(t)
    term_idx = {t: i for i, t in enumerate(union_terms)}

    n, avgdl, dfs = bm25_corpus_stats(df, union_terms, text_col,
                                      lowercase=lowercase)
    if n == 0 or avgdl == 0.0:
        return df.select(
            F.lit("").alias("q_id"), F.col(id_col),
            F.lit(0.0).alias("bm25"), F.lit(0).alias("rank"),
        ).limit(0)
    idf_by_term = {t: bm25_idf(n, d) for t, d in zip(union_terms, dfs)}

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)

    def scores(tok: Column) -> Column:
        dl = F.size(tok).cast("double")
        norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))

        def per_query(tfs: Column) -> Column:
            structs = []
            for q in qids:
                total = F.lit(0.0)
                for t in norm_terms[q]:
                    tf = F.get(tfs, term_idx[t])
                    total = total + F.lit(idf_by_term[t]) * (
                        (tf * F.lit(k1 + 1.0)) / (tf + norm)
                    )
                structs.append(
                    F.struct(
                        F.lit(q).alias("q_id"),
                        F.round(total, 6).alias("bm25"),
                    )
                )
            return F.array(*structs)

        return _bind(
            F.array(*[
                _per_term_tf(tok, t).cast("double") for t in union_terms
            ]),
            per_query,
        )

    exploded = (
        df.select(F.col(id_col), _bind(tokens(src), scores).alias("qs"))
        .select(F.col(id_col), F.explode("qs").alias("q"))
        .select(F.col(id_col), F.col("q.q_id"), F.col("q.bm25"))
        .filter(F.col("bm25") > 0.0)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "bm25", "rank")
    )


def _hadoop_dir_exists(spark, p: str) -> bool:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(p)
    return hp.getFileSystem(conf).exists(hp)


def _read_index_stats(
    spark, path: str, n_buckets: int | None, caller: str
) -> tuple[int, float, int]:
    """(n_docs, avgdl, n_buckets) from a text-index ``stats/`` sidecar.

    The sidecar's recorded ``n_buckets`` is AUTHORITATIVE: the probe's
    ``pmod(xxhash64(term), n_buckets)`` must replay the build's hash or
    it prunes to the WRONG buckets and the term's postings are silently
    filtered out — partial/empty results with no error (ADVICE r14).
    Callers therefore default ``n_buckets=None`` (use the sidecar) and
    an explicitly passed value that contradicts the sidecar raises
    instead of misprobing. Layouts written before the sidecar carried
    the field fall back to the caller's value (or the build default
    64) — the old trust-the-parameter contract, now legacy-only."""
    srow = spark.read.parquet(f"{path}/stats").first()
    n = int(srow["n_docs"])
    if n == 0:
        raise ValueError(f"{caller}: empty index at {path!r}")
    avgdl = float(int(srow["sum_dl"])) / n
    # passive half of the growth wire (the ANN _warn_if_stale analog):
    # a probe against a layout grown far past its bucket sizing finds
    # the rebucket recommendation next to its slow query
    bnd = (
        int(srow["built_n_docs"])
        if "built_n_docs" in srow.__fields__
        and srow["built_n_docs"] is not None
        else None
    )
    g = text_index_growth(n, bnd)
    if g["action"] == "rebucket":
        import logging

        logging.getLogger("filefilter_spark").warning(
            "text index at %s has grown %.1fx past its bucket sizing "
            "(built_n_docs=%s): buckets hold ~that multiple of their "
            "intended postings share — rebuild with a re-sized "
            "n_buckets at the next maintenance window (results stay "
            "exact meanwhile); see SCALING.md 'Text-index growth "
            "signal'",
            path, g["growth_factor"], bnd,
        )
    stored = (
        int(srow["n_buckets"])
        if "n_buckets" in srow.__fields__ and srow["n_buckets"] is not None
        else None
    )
    if stored is not None:
        if n_buckets is not None and int(n_buckets) != stored:
            raise ValueError(
                f"{caller}: n_buckets={int(n_buckets)} contradicts the "
                f"index's stats sidecar (built with n_buckets={stored}) "
                f"— probing with a mismatched bucket count silently "
                f"misses postings; omit the parameter to use the "
                f"recorded value"
            )
        return n, avgdl, stored
    return n, avgdl, 64 if n_buckets is None else int(n_buckets)


# Text-index growth threshold (SCALING.md "Text-index growth signal",
# r16). The BM25 layout has NO frozen model — stats and postings merge
# exactly forever — but n_buckets is a frozen SIZING decision: past
# growth, each bucket holds that multiple of its intended postings
# share. Measured (tools/text_index_growth_probe.py): probe LATENCY
# stays flat to ×16 at probe scale — term-sorted buckets row-group-skip
# the grown mass — so this is a LAYOUT maintenance signal, not a
# latency alarm: compaction units, per-bucket file counts, and
# footer/listing overhead drift from what n_buckets was sized to
# bound, and streaming appends between compactions skip worse than the
# compacted ideal. Rebucket at the next rebuild; results stay exact at
# any growth.
TEXT_GROWTH_REBUCKET = 8.0


def text_index_growth(
    n_docs: int, built_n_docs: int | None
) -> dict:
    """Growth signal for a text-index layout — driver arithmetic over
    the stats sidecar (the ANN drift / fuzzy staleness analog, with
    the honest difference that nothing DEGRADES here except probe
    cost: scores stay exact at any growth). Returns ``{growth_factor,
    action}``: ``"ok"`` below :data:`TEXT_GROWTH_REBUCKET`,
    ``"rebucket"`` past it (rebuild with n_buckets re-sized for the
    grown corpus), ``"unknown"`` for layouts whose sidecar predates
    ``built_n_docs``."""
    if not built_n_docs:
        return {"growth_factor": None, "action": "unknown"}
    g = float(n_docs) / float(built_n_docs)
    return {
        "growth_factor": round(g, 6),
        "action": "rebucket" if g >= TEXT_GROWTH_REBUCKET else "ok",
    }


def _indexed_term_dfs(
    spark, path: str, terms: Sequence[str], buckets: Sequence[int],
    id_col: str,
) -> dict[str, int]:
    """Per-term document frequency from an index layout: the batch
    build's ``terms/`` table when present (pruned tiny read), else a
    distinct-doc count over the same pruned postings — exact under
    at-least-once streaming replays (the streaming ingest maintains no
    terms table: a cached df would go stale between micro-batches),
    cost bounded by the matching postings."""
    if _hadoop_dir_exists(spark, f"{path}/terms"):
        rows = (
            spark.read.parquet(f"{path}/terms")
            .filter(F.col("bucket").isin(list(buckets))
                    & F.col("term").isin(list(terms)))
            .collect()
        )
    else:
        rows = (
            spark.read.parquet(f"{path}/postings")
            .filter(F.col("bucket").isin(list(buckets))
                    & F.col("term").isin(list(terms)))
            .groupBy("term")
            .agg(F.count_distinct(F.col(id_col)).alias("df"))
            .collect()
        )
    return {r["term"]: int(r["df"]) for r in rows}


def bm25_batch_topk_indexed(
    spark,
    path: str,
    queries: dict[str, Sequence[str]],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """:func:`bm25_batch_topk` against a :func:`build_text_index`
    layout — the retrieval-evaluation shape on the 100 TB query path:
    ONE partition-pruned read of the union terms' buckets serves every
    query (no corpus scan at all), per-doc contributions pivot into
    fixed-order per-union-term columns exactly like
    :func:`bm25_topk_indexed`, and each query sums ITS terms'
    columns in its own term order before the 6dp round — so results
    equal :func:`bm25_batch_topk` bit-for-bit (same normalization
    including dup-term dedupe, same operand order, same rounded-score
    rank with id tiebreak). Per-query top-k goes through the same
    rank window Spark rewrites to WindowGroupLimit.

    ``n_buckets=None`` (default) reads the bucket count the build
    recorded in the stats sidecar — the only value that replays the
    build's term→bucket hash; an explicit mismatching value raises
    (see :func:`_read_index_stats`).

    Returns (q_id, id_col, bm25, rank).
    """
    if not queries:
        raise ValueError("bm25_batch_topk_indexed: queries must be non-empty")
    qids = list(queries)
    norm_terms = {
        q: _normalize_terms(ts, lowercase) for q, ts in queries.items()
    }
    for q, ts in norm_terms.items():
        if not ts:
            raise ValueError(
                f"bm25_batch_topk_indexed: query {q!r} has no terms"
            )
    union_terms: list[str] = []
    for ts in norm_terms.values():
        for t in ts:
            if t not in union_terms:
                union_terms.append(t)

    n, avgdl, n_buckets = _read_index_stats(
        spark, path, n_buckets, "bm25_batch_topk_indexed"
    )

    brow = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)).alias(f"b{i}")
            for i, t in enumerate(union_terms)
        ]
    ).first()
    buckets = sorted({int(brow[f"b{i}"]) for i in range(len(union_terms))})

    df_by_term = _indexed_term_dfs(spark, path, union_terms, buckets, id_col)
    idf_by_term = {t: bm25_idf(n, df_by_term.get(t, 0)) for t in union_terms}

    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(union_terms)
    ).dropDuplicates([id_col, "term"])
    idf_expr = F.lit(0.0)
    for t in union_terms:
        idf_expr = F.when(F.col("term") == t, F.lit(idf_by_term[t])).otherwise(
            idf_expr
        )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    contrib = idf_expr * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
    per_term = post.select(
        F.col(id_col), F.col("term"), contrib.alias("c")
    ).groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"c_{i}")
            for i, t in enumerate(union_terms)
        ]
    )
    structs = []
    for q in qids:
        total = F.lit(0.0)
        for t in norm_terms[q]:
            total = total + F.coalesce(
                F.col(f"c_{union_terms.index(t)}"), F.lit(0.0)
            )
        structs.append(
            F.struct(F.lit(q).alias("q_id"), F.round(total, 6).alias("bm25"))
        )
    exploded = (
        per_term.select(F.col(id_col), F.explode(F.array(*structs)).alias("q"))
        .select(F.col(id_col), F.col("q.q_id"), F.col("q.bm25"))
        .filter(F.col("bm25") > 0.0)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "bm25", "rank")
    )


def build_text_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    lowercase: bool = True,
) -> None:
    """Persist an inverted index for BM25 so queries stop re-scanning
    the corpus — the text twin of the IVF×PQ layout (``ops/pq.py``):
    build once, then every query is a PARTITION-PRUNED read of only the
    buckets its terms hash into.

    Layout under ``path``:

    * ``postings/`` — (doc id, dl, term, tf) rows, written
      ``partitionBy(bucket)`` with ``bucket = pmod(xxhash64(term),
      n_buckets)``; dl rides on every posting so scoring needs no doc
      join.
    * ``terms/``    — (term, df) per distinct term, same bucketing, so
      the idf lookup is an equally pruned tiny read.
    * ``stats/``    — one row (n_docs, sum_dl, n_buckets): exact
      int64s, from which any engine reproduces avgdl bit-identically;
      ``n_buckets`` records the bucket count the postings were hashed
      with, so probes replay the SAME term→bucket hash without the
      caller having to remember it (a mismatched count would silently
      prune to the wrong buckets — ADVICE r14).

    Build cost: one tokenize scan + one (id, term) aggregation — the
    same postings shuffle tf-idf already pays. ``n_buckets`` bounds
    file counts (the small-files maintenance loop — ``maybe_compact``
    in ops/layout.py — applies to ``postings/`` unchanged).

    Rebuilding over an EXISTING layout stages every table in temp dirs
    and swaps them in (the streaming maintenance protocol — same
    contract as ``pq.build_ann_index``, r15): a crash mid-rebuild
    leaves the old index intact and concurrent probes never see a
    half-written store.
    """
    spark = df.sparkSession
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    # stats FIRST: an empty corpus must refuse loudly here — an empty
    # partitioned postings write is unreadable (no schema to infer),
    # which would surface later as an inscrutable read error.
    stats = df.select(
        _bind(tokens(src), lambda t: F.size(t)).alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.lit(int(n_buckets)).cast("long").alias("n_buckets"),
        # frozen at build (r16): the growth signal's baseline — the
        # bucket count was SIZED for this corpus, and probe cost per
        # term grows ~linearly with n_docs/built_n_docs (the bucket's
        # share of the whole vocabulary's postings); see
        # text_index_growth
        F.count(F.lit(1)).alias("built_n_docs"),
    )
    if int(stats.first()["n_docs"]) == 0:
        raise ValueError("build_text_index: empty corpus — nothing to index")

    live = any(
        _hadoop_dir_exists(spark, f"{path}/{d}")
        for d in ("stats", "postings", "terms")
    )
    sfx = "__build" if live else ""
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats{sfx}")
    toks = df.select(
        F.col(id_col),
        tokens(src).alias("toks"),
    ).select(
        id_col,
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    )
    postings = (
        toks.groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    # sort by term within each bucket file: the probe's term IN (...)
    # filter pushes to the parquet scan, and term-clustered row groups
    # turn it into row-group skipping — without this the probe reads
    # every row of its buckets (a bucket holds 1/n_buckets of the WHOLE
    # vocabulary's postings, not just the query terms')
    postings.repartition("bucket").sortWithinPartitions(
        "term", id_col
    ).write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings{sfx}"
    )
    pread = spark.read.parquet(f"{path}/postings{sfx}")
    # count DISTINCT docs, not rows: under the streaming ingest
    # (text_index_stream_ingest) an at-least-once replay can append a
    # batch's postings twice, and df must not inflate
    terms = pread.groupBy("bucket", "term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    terms.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/terms{sfx}"
    )
    if live:
        from filefilter_spark.streaming.jobs import _dir_exists, _swap_dirs

        # postings first, stats LAST: probes read stats (n_buckets,
        # avgdl) before pruning, so the crash window between renames
        # serves old-stats + new-postings for at most two renames —
        # atomic-as-the-store-allows, the maintenance-swap contract
        for d in ("postings", "terms", "stats"):
            if _dir_exists(spark, f"{path}/{d}"):
                _swap_dirs(spark, f"{path}/{d}", f"{path}/{d}__build",
                           "rebuild")
            else:  # pragma: no cover - half-written layout repair
                jvm = spark._jvm
                hconf = spark._jsc.hadoopConfiguration()
                sp = jvm.org.apache.hadoop.fs.Path(f"{path}/{d}__build")
                sp.getFileSystem(hconf).rename(
                    sp, jvm.org.apache.hadoop.fs.Path(f"{path}/{d}")
                )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """BM25 top-k against a :func:`build_text_index` layout — the
    100 TB query path: instead of two corpus scans, read ONLY the
    postings buckets the query terms hash into (partition pruning,
    plan-tested) plus a same-pruned df lookup and a one-row stats read.

    Scoring: every posting row carries (tf, dl), so each term
    contribution is row-local; per-doc scores are one map-combinable
    groupBy(doc) pivot into one column PER QUERY TERM (max of the
    single matching posting's contribution), summed left-to-right in
    query-term order before the 6dp round — the SAME fixed operand
    order as the scan path, so a score on a rounding boundary cannot
    flip between paths however the postings were partitioned (ADVICE
    r13; a bare groupBy().sum() would add in partition order). Then
    TakeOrderedAndProject. Result semantics match :func:`bm25_topk`
    exactly (same formula, same normalization including dup-term
    dedupe, same rounding) — the index is an access path, not a
    different operator.

    ``n_buckets=None`` (default) reads the bucket count the build
    recorded in the stats sidecar — the only value that replays the
    build's term→bucket hash; an explicit mismatching value raises
    (see :func:`_read_index_stats`).
    """
    if not query_terms:
        raise ValueError("bm25_topk_indexed: query_terms must be non-empty")
    terms = _normalize_terms(query_terms, lowercase)
    import pyspark.sql.functions as _F  # local alias for lambda clarity

    n, avgdl, n_buckets = _read_index_stats(
        spark, path, n_buckets, "bm25_topk_indexed"
    )

    # term -> bucket must use the engine's own xxhash64 (there is no
    # python twin of Spark's seed-42 xxhash64): one driver-local
    # 1-row job hashes all query terms at once.
    brow = spark.range(1).select(
        *[
            _F.pmod(_F.xxhash64(_F.lit(t)), _F.lit(n_buckets)).alias(f"b{i}")
            for i, t in enumerate(terms)
        ]
    ).first()
    buckets = sorted({int(brow[f"b{i}"]) for i in range(len(terms))})

    df_by_term = _indexed_term_dfs(spark, path, terms, buckets, id_col)
    idf_by_term = {t: bm25_idf(n, df_by_term.get(t, 0)) for t in terms}

    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        # replay shield: duplicate (doc, term) rows from an
        # at-least-once streaming append carry identical tf/dl — keep
        # one, or the per-doc sum double-counts. Runs on the PRUNED
        # read, so the dedup cost is |matching postings|, not the index
    ).dropDuplicates([id_col, "term"])
    idf_expr = F.lit(0.0)
    for t in terms:
        idf_expr = F.when(F.col("term") == t, F.lit(idf_by_term[t])).otherwise(
            idf_expr
        )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    contrib = idf_expr * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
    # pivot the <=|query| contributions into one column per term (each
    # (doc, term) posting is unique post-dedup, so max() is "the"
    # contribution; still map-combinable), then sum left-to-right in
    # query-term order — bit-identical to the scan path, where an
    # absent term contributes an exact +0.0
    per_term = post.select(
        F.col(id_col), F.col("term"), contrib.alias("c")
    ).groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"c_{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
    return (
        per_term.select(
            F.col(id_col), F.round(total, 6).alias("bm25")
        )
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
