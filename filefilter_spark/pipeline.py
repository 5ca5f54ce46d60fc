"""Pipeline runner — OP-A8 stage composition, OP-A10/11/14 metrics,
resume workspace.

Reference behavior (``filefilter.py:306-372``): iterate the YAML
``filters:`` list in order; skip ``disabled``; each enabled stage
consumes the current dataset (view ``df``) and its output becomes the
new dataset; after each stage the view is repointed (``:352``), the
table is recounted (``:355``, OP-A10) and optionally sampled
(``:361-368``, OP-A11); the final stage is exported to CSV. The DuckDB
workspace ``data/<input>.db`` persists across runs (``Database.py:19-29``)
— rerunning resumes from materialized ``filter<N>`` tables — and the
``-d`` flag deletes it.

Spark-first: the "current dataset" is just a DataFrame variable; stages
fold over it lazily, so the whole pipeline is ONE logical plan and
Catalyst optimizes across stage boundaries — impossible in the
reference, which materializes every stage into DuckDB. Exactly how far
cross-stage optimization goes depends on the metrics mode, and both
halves are plan-tested (tests/test_plans.py, cross-stage section):

- Column pruning crosses stage boundaries in EVERY mode: a late
  projection prunes the scan's ReadSchema, and computed columns a later
  stage drops are never evaluated — the free per-stage ``observe()``
  counters are ``count(1)`` and need no columns, so CollectMetrics
  nodes are transparent to pruning.
- Filter pushdown to the scan's ``PushedFilters`` is fenced by the
  default per-stage counters: the observed row counts semantically pin
  "how many rows left stage N", so Catalyst correctly refuses to move a
  stage-2 filter below stage 1's CollectMetrics (the count would
  silently change). With ``observe_metrics=False`` there is nothing to
  pin: the late filter reaches the file scan and the whole multi-stage
  pipeline fuses into one WholeStageCodegen span over the pruned,
  filtered scan. That is the mode a 100 TB run wants; per-stage counts
  are the reference-parity default.

Metrics (OP-A10/A14) ride on ``df.observe``: per-stage row counts are
collected by the SAME action that materializes the result — zero extra
jobs — exactly what the reference's free-rolling counters wanted to be.
``collect_metrics=True`` additionally forces an eager count per stage
(the reference's literal behavior, N extra jobs; off by default).

Resume (workspace analog): with ``checkpoint_dir`` set, each stage's
output is materialized to ``<dir>/stage_<N>/`` parquet; a later run
with ``resume=True`` fast-forwards past every stage whose config hash
matches the materialized manifest — the Spark analog of the
``filter<N>`` tables surviving in ``data/<input>.db``. ``-d`` (CLI)
clears the dir, like the reference's delete flag.
"""

from __future__ import annotations

import hashlib
import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from filefilter_spark.config import PipelineConfig, StageConfig, load_config
from filefilter_spark.io import read_input, write_csv_file
from filefilter_spark.stages import STAGE_TYPES

log = logging.getLogger("filefilter_spark")


@dataclass
class StageMetrics:
    name: str
    action_type: str
    rows_out: int | None = None
    errors: int | None = None
    http_status: dict[str, int] = field(default_factory=dict)
    resumed: bool = False
    _observation: Observation | None = None
    _error_acc: Any = None
    _status_accs: dict[str, Any] | None = None

    def harvest(self) -> None:
        """Pull observed/accumulated values after an action has run."""
        if self._observation is not None and self.rows_out is None:
            try:
                self.rows_out = self._observation.get.get("rows")
            except Exception:  # pragma: no cover - no action ran
                pass
        if self._error_acc is not None:
            self.errors = self._error_acc.value
        if self._status_accs:
            self.http_status = {k: a.value for k, a in self._status_accs.items()}


@dataclass
class PipelineResult:
    df: DataFrame
    metrics: list[StageMetrics]

    def harvest_metrics(self) -> list[StageMetrics]:
        """Call after an action on ``df`` — fills observe()-based counts."""
        for m in self.metrics:
            m.harvest()
        return self.metrics


def _stage_fingerprint(cfg: StageConfig, input_token: str = "") -> str:
    # input_token ties the fingerprint to the INPUT's analyzed plan
    # (paths + schema via semanticHash): without it, --resume against a
    # different input silently replays the previous input's materialized
    # stages. (mtime is not captured — same-path in-place rewrites still
    # require --delete, documented CLI behavior.)
    payload = json.dumps(
        [cfg.index, cfg.action_type, cfg.code, sorted(cfg.action_config.items()),
         input_token],
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        collect_metrics: bool = False,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        observe_metrics: bool | None = None,
    ):
        self.spark = spark
        self.config = config
        self.collect_metrics = collect_metrics
        self.checkpoint_dir = checkpoint_dir
        self.resume = resume
        # Per-stage observe() counters (OP-A10/A14 parity) pin each
        # stage's row count and therefore fence filter pushdown at
        # stage boundaries — see the module docstring. False trades
        # the free counters for full cross-stage Catalyst optimization.
        # None defers to the YAML's top-level `observeMetrics:` key
        # (default true), so the 100 TB mode is reachable from configs
        # and the CLI, not just the Python API.
        self.observe_metrics = (
            config.observe_metrics if observe_metrics is None
            else observe_metrics
        )

    @classmethod
    def from_yaml(cls, spark: SparkSession, path: str, **kw: Any) -> "Pipeline":
        return cls(spark, load_config(path), **kw)

    def _build_stage(self, cfg: StageConfig):
        return STAGE_TYPES[cfg.action_type](self.spark, cfg)

    def _stage_path(self, cfg: StageConfig) -> Path:
        return Path(self.checkpoint_dir) / f"stage_{cfg.index}"

    def _try_resume(self, cfg: StageConfig) -> DataFrame | None:
        """Load a stage's materialized output when its fingerprint
        matches (config unchanged) — the reference's persisted
        ``filter<N>`` semantics (``Database.py:19-29``)."""
        if not (self.resume and self.checkpoint_dir):
            return None
        p = self._stage_path(cfg)
        manifest = p / "_ffspark_manifest.json"
        if not manifest.exists():
            return None
        try:
            meta = json.loads(manifest.read_text())
        except Exception:
            return None
        if meta.get("fingerprint") != _stage_fingerprint(cfg, self._input_token):
            return None
        return self.spark.read.parquet(str(p / "data"))

    def _materialize(self, cfg: StageConfig, df: DataFrame) -> DataFrame:
        p = self._stage_path(cfg)
        # Invalidate the manifest BEFORE overwriting the data: a crash
        # between the two must leave a missing manifest (stage re-runs),
        # never an old fingerprint attached to new data that a later
        # --resume would accept.
        manifest = p / "_ffspark_manifest.json"
        manifest.unlink(missing_ok=True)
        df.write.mode("overwrite").parquet(str(p / "data"))
        p.mkdir(parents=True, exist_ok=True)
        manifest.write_text(
            json.dumps({"fingerprint": _stage_fingerprint(cfg, self._input_token),
                        "name": cfg.name})
        )
        return self.spark.read.parquet(str(p / "data"))

    def run(self, df: DataFrame) -> PipelineResult:
        """Fold the enabled stages over the input DataFrame (OP-A8).

        Two twin chains are threaded: the *observed* chain (returned,
        carries one Observation per stage so the caller's action fills
        the row counts) and an *observation-free* chain used only for
        row-stage schema-inference sampling — PySpark Observations
        capture the FIRST completed action, so the limit-sample job must
        never run on the observed plan or it would record the sample
        size as the stage's row count.
        """
        metrics: list[StageMetrics] = []
        try:
            self._input_token = str(df.semanticHash())
        except Exception:  # pragma: no cover - developer API moved
            self._input_token = ""
        resuming = True  # leading prefix of resumable stages
        plain = df  # observation-free twin
        for cfg in self.config.enabled_stages:
            m = StageMetrics(cfg.name, cfg.action_type)
            resumed_df = self._try_resume(cfg) if resuming else None
            if resumed_df is not None:
                df = resumed_df
                plain = resumed_df
                m.resumed = True
                log.info("stage %s: resumed from %s", cfg.name, self._stage_path(cfg))
            else:
                resuming = False
                stage = self._build_stage(cfg)
                # Plain chain first: schema inference samples HERE (and
                # caches), so the observed apply below is action-free.
                plain = stage.apply(plain)
                df = stage.apply(df)
                m._error_acc = getattr(df, "_filefilter_error_acc", None)
                m._status_accs = getattr(df, "_filefilter_status_accs", None)
                if self.observe_metrics:
                    # OP-A10/A14: row count observed for free on the
                    # next action — at the cost of fencing filter
                    # pushdown at this stage boundary (module docstring).
                    obs = Observation(f"ffspark_{cfg.index}_{cfg.name[:20]}")
                    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                    m._observation = obs
                if self.checkpoint_dir:
                    df = self._materialize(cfg, df)
                    plain = df
                    m.harvest()  # the write was an action; counts are in
            if self.collect_metrics and m.rows_out is None:
                m.rows_out = df.count()
                m.harvest()
                log.info("stage %s (%s): %s rows", cfg.name, cfg.action_type, m.rows_out)
            if cfg.show_sample or (self.collect_metrics and self.config.show_sample_on_finish):
                # Show on the observation-FREE twin: a limit-5 job on the
                # observed chain would be the first completed action and
                # permanently record ~5-row partial counts (the invariant
                # in this docstring).
                plain.show(5, truncate=False)  # OP-A11 head sample
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
            # Single local FILE, matching the CLI sink exactly — the two
            # entry points must not diverge in output layout.
            write_csv_file(result.df, output_path,
                           delimiter=self.config.out_delimiter)
            result.harvest_metrics()
        return result
