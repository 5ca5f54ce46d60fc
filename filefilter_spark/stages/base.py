"""Stage base class + shared schema-inference helpers.

The reference learns a row-stage's output schema from its first output
chunk (``CREATE TABLE filterN AS SELECT * FROM newPd``, reference
``filefilter.py:248``) and coerces dtypes on every chunk re-registration
(floats → float64, objects → string; reference ``Database.py:102-103``).

Spark's ``mapInPandas`` needs the schema *before* execution, so row
stages run the user code on a small driver-side sample first and derive
a StructType from it (SURVEY.md §1.3) — the exact analogue of
chunk-0 schema discovery, moved to plan time.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from filefilter_spark.config import StageConfig

SAMPLE_ROWS_FOR_SCHEMA = 100


class Stage:
    def __init__(self, spark: SparkSession, cfg: StageConfig):
        self.spark = spark
        self.cfg = cfg

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"<{type(self).__name__} {self.cfg.name!r}>"


def infer_type(values: list[Any]) -> DataType:
    """Reference coercion contract (``Database.py:102-103``): ints stay
    integral, any float → double, bools stay bool, everything else
    (str, dict, list, None-only) → string."""
    saw_int = saw_float = saw_bool = saw_other = False
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            saw_bool = True
        elif isinstance(v, int):
            saw_int = True
        elif isinstance(v, float):
            saw_float = True
        else:
            saw_other = True
    if saw_other:
        return StringType()
    if saw_float:
        return DoubleType()
    if saw_int:
        return LongType()
    if saw_bool:
        return BooleanType()
    return StringType()


def schema_from_rows(rows: list[dict[str, Any]], base_order: list[str]) -> StructType:
    """Build a StructType from sample output dicts.

    Column order: original columns first (in input order), then new
    columns in first-seen order — matching how the reference's first
    chunk defines ``filterN``'s layout.
    """
    ordered: list[str] = [c for c in base_order if any(c in r for r in rows)]
    for r in rows:
        for k in r:
            if k not in ordered:
                ordered.append(k)
    fields = []
    for col in ordered:
        fields.append(StructField(col, infer_type([r.get(col) for r in rows]), True))
    return StructType(fields)


def coerce_cell(v: Any, dt: DataType) -> Any:
    """Coerce one python value to the declared stage-output type."""
    if v is None:
        return None
    if isinstance(dt, StringType):
        if isinstance(v, str):
            return v
        import json

        if isinstance(v, (dict, list)):
            # JSON payloads land as string columns (reference
            # filters.py:78: json.dumps(response.json())).
            return json.dumps(v)
        return str(v)
    if isinstance(dt, DoubleType):
        return float(v)
    if isinstance(dt, LongType):
        return int(v)
    if isinstance(dt, BooleanType):
        return bool(v)
    return v
