"""``udf`` registration stage — OP-C2.

The reference only TODO'd this ("Run python code as UDF functions",
``readme.md:72-76``; dispatch stub ``filefilter.py:344``). We implement
it as Arrow-vectorized ``pandas_udf`` registration: the stage declares a
SQL-callable function and passes the dataset through unchanged; later
``sql`` stages call it.

actionConfig:
    name:        SQL function name
    returnType:  Spark DDL type string ("double", "string", ...)
    vectorized:  bool (default True) — pandas_udf (Arrow batches,
                 10-100× faster than row-at-a-time) vs plain udf
    code:        python defining `def fn(...)` — vectorized fns receive
                 pandas Series and must return a Series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.stages.base import Stage


class UdfStage(Stage):
    def apply(self, df: DataFrame) -> DataFrame:
        ac = self.cfg.action_config
        fn_name = ac["name"]
        return_type = ac.get("returnType", "string")
        vectorized = bool(ac.get("vectorized", True))
        code = ac.get("code") or self.cfg.code
        scope: dict = {}
        exec(compile(code, f"<udf-stage:{self.cfg.name}>", "exec"), scope)
        fn = scope.get("fn") or next(
            v for k, v in scope.items() if callable(v) and not k.startswith("__")
        )
        if vectorized:
            from pyspark.sql.functions import pandas_udf

            self.spark.udf.register(fn_name, pandas_udf(fn, return_type))
        else:
            from pyspark.sql.functions import udf

            self.spark.udf.register(fn_name, udf(fn, return_type))
        return df  # pass-through: registration is the side effect
