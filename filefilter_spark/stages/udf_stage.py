"""``udf`` registration stage — OP-C2 (+ UDAF/UDTF, SURVEY.md §2.7).

The reference only TODO'd this ("Run python code as UDF functions",
``readme.md:72-76``; dispatch stub ``filefilter.py:344``). We implement
the full user-function surface: the stage declares a SQL-callable
function and passes the dataset through unchanged; later ``sql`` stages
call it.

actionConfig:
    name:        SQL function name
    kind:        scalar (default) | grouped_agg | table
    returnType:  Spark DDL type string — a scalar type for
                 scalar/grouped_agg ("double"), a struct DDL for table
                 ("i bigint, s string")
    vectorized:  bool (default True, scalar only) — pandas_udf (Arrow
                 batches, 10-100× faster than row-at-a-time) vs plain udf
    code:        python source:
                 - scalar: `def fn(x)` — vectorized fns receive pandas
                   Series and return a Series
                 - grouped_agg (UDAF): `def fn(v)` receiving a pandas
                   Series per group, returning one scalar
                 - table (UDTF): `class fn` with an `eval(self, ...)`
                   generator yielding output tuples
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.stages.base import Stage


class UdfStage(Stage):
    def apply(self, df: DataFrame) -> DataFrame:
        ac = self.cfg.action_config
        fn_name = ac["name"]
        kind = ac.get("kind", "scalar")
        return_type = ac.get("returnType", "string")
        vectorized = bool(ac.get("vectorized", True))
        code = ac.get("code") or self.cfg.code
        scope: dict = {}
        exec(compile(code, f"<udf-stage:{self.cfg.name}>", "exec"), scope)
        fn = scope.get("fn")
        if fn is None:
            # Fall back to the LAST function DEFINED by the user code
            # (its __code__ carries our synthetic filename) — "first
            # callable in the scope" would happily pick an imported
            # helper (`from math import ceil` precedes the user's def
            # in insertion order) and silently register the wrong fn.
            import types

            defined = [
                v for v in scope.values()
                if isinstance(v, types.FunctionType)
                and v.__code__.co_filename.startswith("<udf-stage:")
            ]
            if not defined:
                raise ValueError(
                    f"udf stage {self.cfg.name!r}: code defines no "
                    "function (define `fn` or any `def ...`)"
                )
            fn = defined[-1]
        # Register on the DataFrame's own session (works inside
        # foreachBatch's micro-batch-cloned sessions; see sql_stage).
        session = df.sparkSession
        if kind == "scalar":
            if vectorized:
                from pyspark.sql.functions import pandas_udf

                session.udf.register(fn_name, pandas_udf(fn, return_type))
            else:
                from pyspark.sql.functions import udf

                session.udf.register(fn_name, udf(fn, return_type))
        elif kind == "grouped_agg":
            # UDAF: Arrow-batched grouped aggregation — one Python call
            # per group, usable anywhere SQL expects an aggregate.
            from pyspark.sql.functions import PandasUDFType, pandas_udf

            session.udf.register(
                fn_name,
                pandas_udf(fn, return_type, functionType=PandasUDFType.GROUPED_AGG),
            )
        elif kind == "table":
            # UDTF: one input row → N output rows, lateral-joinable.
            from pyspark.sql.functions import udtf

            session.udtf.register(fn_name, udtf(fn, returnType=return_type))
        else:
            raise ValueError(f"udf stage {self.cfg.name}: unknown kind {kind!r}")
        return df  # pass-through: registration is the side effect
