"""Zero-code pipeline stages over the corpus-ops library.

The reference's YAML surface reaches only code-bearing stages
(python/sql/rest); these stages expose the corpus-assembly operators
(``ops/corpus.py``, ``ops/dedup.py``) as declarative ``actionType``s so
a config author gets exact dedup, deterministic splits, and data-mixing
sampling without writing code:

.. code-block:: yaml

    filters:
      - name: drop_dupes
        actionType: dedup
        actionConfig: {textField: text, idField: doc_id}
      - name: assign_split
        actionType: split
        actionConfig:
          idField: doc_id
          weights: {train: 0.9, val: 0.05, test: 0.05}
      - name: downweight_web
        actionType: sample
        actionConfig:
          groupField: source
          rates: {web: 0.1}

All three are pure DataFrame transforms (no driver-side sampling pass,
unlike the code-bearing stages — the output schema is statically
known), so they fold into the surrounding lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.stages.base import Stage


class DedupStage(Stage):
    """Exact dedup, min-id survivor (``ops.dedup.keep_survivors``)."""

    def apply(self, df: DataFrame) -> DataFrame:
        from filefilter_spark.ops.dedup import keep_survivors

        cfg = self.cfg.action_config
        return keep_survivors(
            df,
            text_col=cfg.get("textField", "text"),
            id_col=cfg.get("idField", "doc_id"),
        )


class SplitStage(Stage):
    """Deterministic hash split column (``ops.corpus.hash_split``)."""

    def apply(self, df: DataFrame) -> DataFrame:
        from filefilter_spark.ops.corpus import hash_split

        cfg = self.cfg.action_config
        weights = cfg.get("weights")
        if weights is not None:
            weights = {str(k): float(v) for k, v in weights.items()}
        return hash_split(
            df,
            id_col=cfg.get("idField", "doc_id"),
            weights=weights,
            seed=int(cfg.get("seed", 42)),
            split_col=cfg.get("splitField", "split"),
        )


class SampleStage(Stage):
    """Per-group keep-rate sampling (``ops.corpus.weighted_sample``)."""

    def apply(self, df: DataFrame) -> DataFrame:
        from filefilter_spark.ops.corpus import weighted_sample

        cfg = self.cfg.action_config
        rates = {str(k): float(v) for k, v in (cfg.get("rates") or {}).items()}
        return weighted_sample(
            df,
            rates,
            default_rate=float(cfg.get("defaultRate", 1.0)),
            group_col=cfg.get("groupField", "source"),
            id_col=cfg.get("idField", "doc_id"),
            seed=int(cfg.get("seed", 42)),
        )
