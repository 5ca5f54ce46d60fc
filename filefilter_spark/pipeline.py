"""Pipeline runner — OP-A8 stage composition.

Reference behavior (``filefilter.py:306-372``): iterate the YAML
``filters:`` list in order; skip ``disabled``; each enabled stage
consumes the current dataset (view ``df``) and its output becomes the
new dataset; after each stage the view is repointed (``:352``), the
table is recounted (``:355``, OP-A10) and optionally sampled
(``:361-368``, OP-A11); the final stage is exported to CSV.

Spark-first: the "current dataset" is just a DataFrame variable; stages
fold over it lazily, so the whole pipeline is ONE logical plan and
Catalyst optimizes across stage boundaries (filter pushdown through
earlier sql stages into the file scan — impossible in the reference,
which materializes every stage into DuckDB).

Divergences (documented, SURVEY.md §7 non-goals): per-stage recounts
are opt-in (``collect_metrics=True``) because a count() per stage
forces N extra jobs; per-row thread micro-management + config hot
reload (OP-A13) are replaced by Spark parallelism; the persistent
``data/*.db`` workspace is replaced by opt-in ``checkpoint_dir``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from filefilter_spark.config import PipelineConfig, StageConfig, load_config
from filefilter_spark.io import read_input, write_csv
from filefilter_spark.stages import STAGE_TYPES

log = logging.getLogger("filefilter_spark")


@dataclass
class StageMetrics:
    name: str
    action_type: str
    rows_out: int | None = None
    errors: int | None = None
    http_status: dict[str, int] = field(default_factory=dict)


@dataclass
class PipelineResult:
    df: DataFrame
    metrics: list[StageMetrics]


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        collect_metrics: bool = False,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.config = config
        self.collect_metrics = collect_metrics
        self.checkpoint_dir = checkpoint_dir
        if checkpoint_dir:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)

    @classmethod
    def from_yaml(cls, spark: SparkSession, path: str, **kw: Any) -> "Pipeline":
        return cls(spark, load_config(path), **kw)

    def _build_stage(self, cfg: StageConfig):
        return STAGE_TYPES[cfg.action_type](self.spark, cfg)

    def run(self, df: DataFrame) -> PipelineResult:
        """Fold the enabled stages over the input DataFrame (OP-A8)."""
        metrics: list[StageMetrics] = []
        for cfg in self.config.enabled_stages:
            stage = self._build_stage(cfg)
            df = stage.apply(df)
            m = StageMetrics(cfg.name, cfg.action_type)
            if self.collect_metrics:
                m.rows_out = df.count()  # OP-A10 per-stage recount
                acc = getattr(df, "_filefilter_error_acc", None)
                if acc is not None:
                    m.errors = acc.value
                accs = getattr(df, "_filefilter_status_accs", None)
                if accs is not None:
                    m.http_status = {k: a.value for k, a in accs.items()}
                log.info("stage %s (%s): %s rows", cfg.name, cfg.action_type, m.rows_out)
            if cfg.show_sample or (self.collect_metrics and self.config.show_sample_on_finish):
                df.show(5, truncate=False)  # OP-A11 head sample
            metrics.append(m)
        return PipelineResult(df=df, metrics=metrics)

    def run_file(self, input_path: str, output_path: str | None = None) -> PipelineResult:
        """End-to-end: source → stages → optional CSV sink.

        Mirrors the reference CLI contract
        (``python3 filefilter.py IN CONFIG.yml OUT``).
        """
        df = read_input(
            self.spark,
            input_path,
            delimiter=self.config.in_delimiter,
            sample_lines=self.config.sample_lines,
        )
        result = self.run(df)
        if output_path:
            write_csv(result.df, output_path, delimiter=self.config.out_delimiter,
                      single_file=True)
        return result
