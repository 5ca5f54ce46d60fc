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
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from filefilter_spark.ops.text import _bind, tokens


def _per_term_tf(tok: Column, term: str) -> Column:
    """Occurrences of ``term`` in a token array — in-row, no explode."""
    return F.size(F.filter(tok, lambda t: t == F.lit(term)))


def bm25_corpus_stats(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    lowercase: bool = True,
) -> tuple[int, float, list[int]]:
    """One map-combined pass → (N, avgdl, df per query term).

    The aggregate is a single row regardless of corpus size: partial
    aggregation happens map-side per partition, the fan-in is one
    grouped row. ``avgdl`` is Σdl/N on exact int64 inputs, so the same
    IEEE division reproduces bit-identically in any engine."""
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
    return n, avgdl, dfs


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

    ``stats`` accepts a precomputed :func:`bm25_corpus_stats` result
    (for the SAME term list/order) so repeated queries against an
    unchanged corpus skip the stats pass and pay only the scoring scan.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = [t.lower() for t in query_terms] if lowercase else list(query_terms)
    n, avgdl, dfs = (
        stats
        if stats is not None
        else bm25_corpus_stats(df, terms, text_col, lowercase=lowercase)
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


def ranked(df: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """Attach dense 1-based ranks to an ALREADY-SMALL ranked list
    (top-n output). Single-partition window by construction — the
    input is k rows, never corpus-scale."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
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
