"""``pandas`` whole-DataFrame stage — OP-C1.

Declared in the reference but unimplemented: the actionType is
documented (``examples/fullExample/fullExample.yml:15``, ``.old:26-49``)
and its dispatch just logs "PENDING" (reference ``filefilter.py:344-346``;
dead impl ``filters.py:111-117``). We implement it properly.

User code receives a pandas DataFrame named ``df`` and leaves the
result in ``df`` (the ``.old`` example's shape: add columns via
``df.apply``). Spark-first realization: ``mapInPandas`` — the code runs
**per Arrow batch / partition**, so it must be row-local (maps,
column adds, filters). Cross-row global operations (sorts, global aggs)
belong in a ``sql`` stage where Catalyst can distribute them; this is a
documented semantic of the engine, not a limitation of the reference
(which never ran this stage type at all).

Schema is inferred by running the user code on a driver-side sample,
same mechanism as the ``python`` stage (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from filefilter_spark.stages.base import SAMPLE_ROWS_FOR_SCHEMA, Stage, schema_from_rows


def _exec_on_pdf(code_obj, pdf: pd.DataFrame) -> pd.DataFrame:
    scope = {"df": pdf, "pd": pd}
    exec(code_obj, scope)
    out = scope["df"]
    if not isinstance(out, pd.DataFrame):
        raise TypeError("pandas stage code must leave a pandas DataFrame in `df`")
    return out


class PandasStage(Stage):
    def infer_schema(self, df: DataFrame) -> StructType:
        sample = pd.DataFrame([r.asDict() for r in df.limit(SAMPLE_ROWS_FOR_SCHEMA).collect()],
                              columns=list(df.columns))
        code_obj = compile(self.cfg.code, f"<pandas-stage:{self.cfg.name}>", "exec")
        out = _exec_on_pdf(code_obj, sample)
        rows = out.to_dict(orient="records")
        if not rows:
            return df.schema
        return schema_from_rows(rows, list(df.columns), base_schema=df.schema)

    def apply(self, df: DataFrame) -> DataFrame:
        schema = self.infer_schema(df)
        code_str = self.cfg.code
        name = self.cfg.name
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            code_obj = compile(code_str, f"<pandas-stage:{name}>", "exec")
            for pdf in batches:
                out = _exec_on_pdf(code_obj, pdf)
                missing = [c for c in out_cols if c not in out.columns]
                for c in missing:
                    out[c] = None
                yield out[out_cols]

        return df.mapInPandas(run, schema=schema)
