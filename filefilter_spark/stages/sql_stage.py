"""``sql`` stage — OP-A7, the flagship relational stage.

Reference behavior (``filefilter.py:340-342``): run one arbitrary
DuckDB SQL statement with the current dataset visible as view ``df``;
the result becomes the new dataset. That single delegation line is what
makes the whole SURVEY.md §2.B surface reachable.

Spark-first realization: register the current DataFrame as temp view
``df`` and run ``spark.sql`` on the dialect-translated statement. No
per-stage materialization (the reference's ``CREATE OR REPLACE TABLE
filterN`` is an implementation detail) — the result is a lazy plan, so
Catalyst optimizes *across* stage boundaries: a later stage's filter
pushes down through this stage's projection into the file scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.dialect import translate
from filefilter_spark.stages.base import Stage


class SqlStage(Stage):
    def apply(self, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView("df")
        # Use the DataFrame's OWN session: inside foreachBatch the batch
        # DataFrame belongs to a micro-batch-cloned session whose temp
        # views are isolated from the outer one.
        return df.sparkSession.sql(translate(self.cfg.code))
