"""Streaming jobs (OP-D5): windowed event-time aggregation.

``windowed_counts_available_now`` runs the canonical Structured
Streaming shape — watermark → tumbling event-time window → aggregate —
over the static ``events`` parquet with ``Trigger.AvailableNow``, which
drains all available input in (possibly several) micro-batches and then
stops. Because the input is bounded we emit in ``complete`` mode to an
in-memory sink, so every window is present in the result and the batch
oracle (the same windowed aggregate as plain SQL) applies exactly.

On an unbounded source the identical plan runs in ``append`` mode with
the watermark closing windows; nothing in the aggregation changes —
that is the point of writing it as a streaming plan.

Scale notes: the shuffle key is (window, event_type) — time-bucketed,
so naturally balanced; state store size is bounded by
windows-in-watermark × event types. At 100 TB/day the same plan runs
with a real sink (kafka/delta) and checkpointing; nothing here is
local-mode-only except the memory sink chosen for test determinism.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _static_schema_and_ts_fix(spark: SparkSession, path: str):
    """Streaming file sources need an explicit schema. Derive it from a
    static read (which also handles the nanos-timestamp normalization
    contract — see queries.registry.load_table)."""
    from filefilter_spark.queries.registry import _nanos_timestamp_columns

    nanos_cols = _nanos_timestamp_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    return schema, nanos_cols


def windowed_counts_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
) -> DataFrame:
    """Tumbling-window counts + sums per event_type, run to completion.

    Returns a static DataFrame (win_start, event_type, n, sum_value)
    read back from the finished in-memory sink.
    """
    schema, nanos_cols = _static_schema_and_ts_fix(spark, path)
    # File-stream sources require a directory basePath; a single-file
    # input is expressed as its parent dir + a glob filter.
    import os

    if path.endswith(".parquet"):
        base, fname = os.path.dirname(path) or ".", os.path.basename(path)
        reader = spark.readStream.schema(schema).option("pathGlobFilter", fname)
        stream = reader.parquet(base)
    else:
        stream = spark.readStream.schema(schema).parquet(path)
    if ts_col in nanos_cols:
        stream = stream.withColumn(
            ts_col, F.expr(f"timestamp_micros(`{ts_col}` div 1000)")
        )

    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )

    qname = "ffspark_d5_" + uuid.uuid4().hex[:8]
    query = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_sec)
    finally:
        if query.isActive:  # pragma: no cover - timeout safety
            query.stop()
    return spark.table(qname)
