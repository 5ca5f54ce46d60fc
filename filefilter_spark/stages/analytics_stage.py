"""Zero-code analytics stages: sessionization and keyword search.

The reference's whole interaction model is YAML actionTypes
(reference ``filefilter.py:306``); these expose the r13 event/retrieval
operators declaratively, same contract as the corpus stages:

.. code-block:: yaml

    filters:
      - name: tag_sessions
        actionType: sessionize
        actionConfig: {userField: user_id, tsField: ts, gapSeconds: 1800}
      - name: keep_matches
        actionType: search
        actionConfig:
          terms: [spark, shuffle]
          k: 100
          textField: text
          idField: doc_id

``sessionize`` is a pure DataFrame transform (folds into the lazy
plan); ``search`` runs the BM25 stats job eagerly at ``apply()`` time
by design — the idf literals must exist before the scoring plan is
built (the same model-before-plan contract as ``perplexity``/``bpe``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.stages.base import Stage


class SessionizeStage(Stage):
    """Attach a per-user gap-based ``session_id``
    (``ops.sessions.sessionize``). actionConfig: ``userField``
    (default user_id), ``tsField`` (ts), ``idField`` (event_id,
    the within-timestamp tiebreak), ``gapSeconds`` (1800).
    ``session_id`` is reserved on the input (raises on collision)."""

    def apply(self, df: DataFrame) -> DataFrame:
        from filefilter_spark.ops.order import _check_reserved
        from filefilter_spark.ops.sessions import sessionize

        cfg = self.cfg.action_config
        _check_reserved(df, ["session_id"], "sessionize")
        return sessionize(
            df,
            user_col=cfg.get("userField", "user_id"),
            ts_col=cfg.get("tsField", "ts"),
            id_col=cfg.get("idField", "event_id"),
            gap_seconds=int(cfg.get("gapSeconds", 1800)),
        )


class SearchStage(Stage):
    """Keep the BM25 top-k documents for a literal term query
    (``ops.retrieval.bm25_topk``): rows arrive back via a semi-join on
    ``idField`` with the score attached (``scoreField``, default
    ``bm25``, reserved on the input). actionConfig: ``terms``
    (required, non-empty list), ``k`` (10), ``textField`` (text),
    ``idField`` (doc_id), ``k1``/``b`` (1.2/0.75). With ``indexPath``
    (+ ``nBuckets``, default 64) the query runs against a persisted
    ``build_text_index`` layout instead — a partition-pruned read of
    the terms' buckets, never a corpus scan; the caller owns keeping
    the index in sync with the incoming table."""

    def apply(self, df: DataFrame) -> DataFrame:
        import pyspark.sql.functions as F

        from filefilter_spark.ops.order import _check_reserved
        from filefilter_spark.ops.retrieval import bm25_topk, bm25_topk_indexed

        cfg = self.cfg.action_config
        terms = cfg.get("terms")
        if not terms or not isinstance(terms, (list, tuple)):
            raise ValueError(
                "search stage: actionConfig.terms must be a non-empty list"
            )
        id_col = cfg.get("idField", "doc_id")
        score_col = cfg.get("scoreField", "bm25")
        _check_reserved(df, [score_col], "search")
        if cfg.get("indexPath"):
            top = bm25_topk_indexed(
                self.spark,
                cfg["indexPath"],
                [str(t) for t in terms],
                k=int(cfg.get("k", 10)),
                id_col=id_col,
                k1=float(cfg.get("k1", 1.2)),
                b=float(cfg.get("b", 0.75)),
                n_buckets=int(cfg.get("nBuckets", 64)),
            )
        else:
            top = bm25_topk(
                df,
                [str(t) for t in terms],
                k=int(cfg.get("k", 10)),
                text_col=cfg.get("textField", "text"),
                id_col=id_col,
                k1=float(cfg.get("k1", 1.2)),
                b=float(cfg.get("b", 0.75)),
            )
        if score_col != "bm25":
            top = top.withColumnRenamed("bm25", score_col)
        # top-k is tiny → broadcast hash semi-shape join, bodies never
        # shuffle; score rides in from the broadcast side
        return df.join(F.broadcast(top), id_col, "inner")
