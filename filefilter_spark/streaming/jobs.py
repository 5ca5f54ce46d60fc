"""Streaming jobs (OP-D5): windows, state, and continuous ingest.

Three tiers, all drained to completion on static data via
``Trigger.AvailableNow`` so batch oracles apply exactly:

- **Windowed/stateful analytics** — watermark → tumbling/sliding/
  session event-time windows, ``dropDuplicatesWithinWatermark``
  dedup, ``applyInPandasWithState`` custom state, stream-static and
  watermarked stream-stream joins. ``windowed_counts_available_now``
  is the canonical shape: because the test input is bounded we emit
  ``complete`` mode to a memory sink and the batch SQL oracle matches
  row for row; an unbounded deployment runs the identical plan in
  ``append`` mode with the watermark closing windows.
- **foreachBatch pipelines** — ``pipeline_foreach_batch`` applies the
  zero-code YAML pipeline per micro-batch, re-reading the config at
  every batch boundary (the reference's hot-reload, OP-A13).
- **Continuous ingest with persistent stores** (r12-r13) —
  ``ivfpq_stream_ingest`` (frozen-index encode + cell-partitioned
  appends), ``minhash_stream_dedup`` and ``semdedup_stream_dedup``
  (arrival-order-greedy near-dedup against persisted band/membership
  survivor stores; history never re-hashed/re-scored), and
  ``text_index_stream_ingest`` (per-batch postings appends to the
  bucket-partitioned BM25 inverted index, batch-id-idempotent stats
  merging; queries over the growing index equal the corpus-scan BM25
  exactly). All four self-maintain against small-files drift
  (``maintain_every`` → threshold-gated compaction + ``_swap_dirs``
  atomic-as-the-store-allows swap with path-cache invalidation),
  check paths through the Hadoop FS API (store-agnostic), and the
  dedup/index loops are replay-idempotent under foreachBatch's
  at-least-once contract.

Scale notes: windowed shuffle keys are time-bucketed (balanced);
state is bounded by the watermark horizon; ingest per-batch cost is
measured FLAT in store size (SCALING.md). At 100 TB/day the same
plans run with real sinks (kafka/delta) and durable checkpoints;
nothing here is local-mode-only except the memory sink chosen for
test determinism.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import TimestampNTZType

from filefilter_spark.ops.money import sum_cents


def _static_schema_and_ts_fix(spark: SparkSession, path: str):
    """Streaming file sources need an explicit schema. Derive it from a
    static read (which also handles the nanos-timestamp normalization
    contract — see queries.registry.load_table)."""
    from filefilter_spark.queries.registry import (
        _nanos_timestamp_columns,
        _schema_cache,
    )

    nanos_cols = _nanos_timestamp_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (id(spark.sparkContext), path)
    schema = _schema_cache.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _schema_cache[key] = schema
    return schema, nanos_cols


def _events_stream(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
):
    schema, nanos_cols = _static_schema_and_ts_fix(spark, path)
    import os

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # Bounds each micro-batch to N input files — the knob that makes
        # an availableNow drain process a directory in several batches
        # (and the hot-reload boundary observable in tests).
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet") and not _is_directory(spark, path):
        # Single-FILE dataset: stream-read its parent with a glob on
        # the file name. A Spark-written DIRECTORY named *.parquet must
        # NOT take this branch — the glob is matched against the leaf
        # part-*.parquet names and would silently select zero files —
        # so the test is the Hadoop-FS one (store-agnostic), not
        # os.path.isdir.
        base, fname = os.path.dirname(path) or ".", os.path.basename(path)
        stream = reader.option("pathGlobFilter", fname).parquet(base)
    else:
        stream = reader.parquet(path)
    if ts_col in nanos_cols:
        stream = stream.withColumn(
            ts_col, F.expr(f"timestamp_micros(`{ts_col}` div 1000)")
        )
    elif isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        # Parquet timestamp[us] without timezone reads as TIMESTAMP_NTZ,
        # which withWatermark rejects (event time must be TIMESTAMP).
        # The session TZ is pinned to UTC, so this cast is wall-clock
        # preserving — same values the batch oracle computes on the NTZ
        # column.
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def _run_to_memory(
    agg, output_mode: str, timeout_sec: int, state_partitions: int | None = None
) -> tuple[str, object]:
    """Start an availableNow run to a memory sink and drain it.

    ``state_partitions`` sizes the stateful shuffle: a streaming query
    freezes its state-store partition count at the first checkpoint, so
    it must be an explicit sizing decision, not an inherited batch
    default. Each state partition costs a store instance + per-batch
    snapshot files, so oversizing (e.g. 32 partitions for a bounded
    drain of one small file) measurably dominates small jobs — sized to
    load, the same plan scales to real streams by raising the number.
    The session's batch conf is restored after the query starts.
    """
    import os
    import shutil
    import tempfile

    spark = agg.sparkSession
    qname = "ffspark_stream_" + uuid.uuid4().hex[:8]
    # Checkpoint on tmpfs when available: a bounded drain to a memory
    # sink is ephemeral by definition, so its state snapshots don't
    # need to survive a crash — put them on RAM, not disk (~0.2 s per
    # run of state-store file IO at 8 partitions). A real deployment
    # with a durable sink MUST checkpoint to durable shared storage
    # instead; this shortcut is coupled to the memory sink only.
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    ckpt = os.path.join(ckpt_base, "ffspark_ckpt_" + qname)
    conf_key = "spark.sql.shuffle.partitions"
    # A bounded availableNow drain doesn't need the trailing no-data
    # micro-batch (it only advances the watermark for append-mode
    # window finalization) — skipping it saves one full batch round per
    # run. Gated on output mode: an append-mode windowed aggregate
    # NEEDS that batch to emit its final watermark-closed windows, so
    # the skip applies only to complete/update/on-arrival jobs.
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    overrides = {}
    if output_mode != "append":
        overrides[nodata_key] = "false"
    if state_partitions is not None:
        overrides[conf_key] = str(state_partitions)
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        query = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                # conf.get(key, None) returns None when the key was never
                # EXPLICITLY set (it does not surface the SQLConf
                # default) — unset rather than skip, or the streaming
                # override would leak into the session's batch queries.
                spark.conf.unset(k)
    try:
        query.awaitTermination(timeout_sec)
    finally:
        if query.isActive:  # pragma: no cover - timeout safety
            query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return qname, query


def windowed_counts_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Tumbling-window counts + sums per event_type, run to completion.

    Returns a static DataFrame (win_start, event_type, n, sum_value)
    read back from the finished in-memory sink.
    """
    stream = _events_stream(spark, path, ts_col)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (sum_cents(F.col("value")) / 100.0).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )
    qname, _ = _run_to_memory(agg, "complete", timeout_sec, state_partitions)
    return spark.table(qname)


def stream_static_join_available_now(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    join_key: tuple[str, str] = ("user_id", "c_custkey"),
    group_cols: tuple[str, str] = ("c_mktsegment", "event_type"),
    ts_col: str = "ts",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Stream-static (dimension-enrichment) join: the unbounded event
    stream joins a static dimension table, then aggregates — the
    canonical streaming-enrichment shape. The static side re-resolves
    per micro-batch (Spark's stream-static contract), and being a
    dimension it broadcasts: no state is kept for the join itself, only
    for the downstream aggregation.

    Returns (group_cols..., n, sum_value) from the drained memory sink.
    """
    stream = _events_stream(spark, events_path, ts_col)
    left_key, right_key = join_key
    joined = stream.join(
        F.broadcast(dim), stream[left_key] == dim[right_key], "inner"
    )
    agg = joined.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        (sum_cents(F.col("value")) / 100.0).alias("sum_value"),
    )
    qname, _ = _run_to_memory(agg, "complete", timeout_sec, state_partitions)
    return spark.table(qname)


def stream_stream_join_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    lookback: str = "2 hours",
    watermark: str = "4 hours",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Stream-stream inner join with watermarks + an event-time range
    condition: each click joins the same user's views in the preceding
    ``lookback`` — the attribution-join shape. BOTH sides carry
    watermarks and the join condition bounds event-time distance, which
    is exactly what lets Spark evict join state (without it, state
    grows forever); state is bounded by events-in-(watermark+lookback)
    per user.

    Returns (click_id, view_id, user_id, click_ts, view_ts).
    """
    clicks = (
        _events_stream(spark, path, ts_col)
        .filter(F.col("event_type") == "click")
        .selectExpr("event_id AS click_id", "user_id", f"{ts_col} AS click_ts")
        .withWatermark("click_ts", watermark)
    )
    views = (
        _events_stream(spark, path, ts_col)
        .filter(F.col("event_type") == "view")
        .selectExpr("event_id AS view_id", "user_id AS v_user", f"{ts_col} AS view_ts")
        .withWatermark("view_ts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            "user_id = v_user AND "
            f"view_ts BETWEEN click_ts - INTERVAL {lookback} AND click_ts"
        ),
        "inner",
    ).select("click_id", "view_id", "user_id", "click_ts", "view_ts")
    # Stream-stream joins emit in append mode only; the trailing
    # no-data micro-batch stays ON here (see _run_to_memory's gate) so
    # the final watermark advance flushes any held rows.
    qname, _ = _run_to_memory(joined, "append", timeout_sec, state_partitions)
    return spark.table(qname)


def sliding_window_counts_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (2 here), the standard shape for
    smoothed rolling metrics. Same watermark/state mechanics as the
    tumbling job — state is bounded by windows-in-watermark x key
    cardinality x overlap factor.

    Returns (win_start, event_type, n) read back from the drained
    in-memory sink.
    """
    stream = _events_stream(spark, path, ts_col)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
    qname, _ = _run_to_memory(agg, "complete", timeout_sec, state_partitions)
    return spark.table(qname)


def session_window_counts_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (``F.session_window`` — dynamic, data-driven windows, the
    canonical stateful-streaming shape). Batch-SQL oracle: classic
    gaps-and-islands (lag > gap starts a new island).

    Returns (user_id, session_start, n_events).
    """
    stream = _events_stream(spark, path, ts_col)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )
    qname, _ = _run_to_memory(agg, "complete", timeout_sec, state_partitions)
    return spark.table(qname)


def stateful_dedup_available_now(
    spark: SparkSession,
    path: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Streaming dedup on ``keys`` with watermarked state
    (``dropDuplicatesWithinWatermark`` — state is bounded by the
    watermark horizon instead of growing forever, the production shape
    for at-least-once sources). Emits the key columns only, so the
    result is exactly DISTINCT keys regardless of which duplicate
    arrived first.
    """
    keys = keys or ["user_id", "event_type"]
    stream = _events_stream(spark, path, ts_col)
    dedup = (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
    qname, _ = _run_to_memory(dedup, "append", timeout_sec, state_partitions)
    return spark.table(qname)


def stateful_user_stats_available_now(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Arbitrary stateful processing via ``applyInPandasWithState``
    (SURVEY §2.6): per-user running aggregates kept in explicit state
    across micro-batches — the escape hatch when built-in windows can't
    express the operator (custom sessionization, CEP, counters with
    business rules).

    Emits one row per user at the end of input: (user_id, n_events,
    total_value). With bounded input + availableNow the final state
    equals the batch GROUP BY, which is the oracle.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, path, ts_col)
    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total_cents bigint"

    def update(key, pdfs, state: GroupState):
        # Accumulate integer cents (values are exact 2-decimal doubles)
        # so the running total is fold-order independent and matches the
        # oracle's decimal SUM exactly.
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(pdf["value"].mul(100).round().sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    result = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    qname, _ = _run_to_memory(result, "update", timeout_sec, state_partitions)
    # "update" mode re-emits per batch; the last row per user is final.
    snap = spark.table(qname)
    return (
        snap.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )


def _fb_scratch() -> str:
    """Fresh per-invocation output dir under the shared atexit-cleaned
    root (:func:`filefilter_spark.io.scratch_root`)."""
    from filefilter_spark.io import scratch_root

    return f"{scratch_root('ffspark_fb_')}/{uuid.uuid4().hex[:8]}"


def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Store-agnostic existence check via the Hadoop FileSystem API —
    ``os.path.isdir`` is silently False for every scheme-qualified or
    remote URI (file:, s3a://, hdfs://), the exact bug class
    ``ops.layout.maybe_compact`` shipped with in r12. Any output-table
    existence gate in this module must go through here."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _is_directory(spark: SparkSession, path: str) -> bool:
    """Store-agnostic directory test (False for files AND missing
    paths) — the single-file-vs-Spark-written-directory dispatch in
    the stream readers must not rely on ``os.path.isdir`` (see
    :func:`_dir_exists`)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def _n_data_files(spark: SparkSession, path: str) -> int:
    """Count visible data files directly under ``path`` (Hadoop FS —
    any store Spark can read; hidden _SUCCESS/.crc excluded)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0
    return sum(
        1
        for st in fs.listStatus(p)
        if st.isFile() and not st.getPath().getName()[0] in "._"
    )


def _swap_dirs(spark: SparkSession, live: str, tmp: str, tag) -> None:
    """Atomically-as-the-store-allows replace ``live`` with ``tmp`` via
    two Hadoop ``FileSystem.rename`` calls, keeping the old table aside
    until the new one is in place (a crash between renames leaves the
    ``__old`` copy intact). foreachBatch bodies run serially, so a swap
    never races an append. On an object store the rename tier is a
    copy — real deployments point a delta/iceberg catalog entry at the
    compacted location instead; the gate and rewrite are the same."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(live)
    fs = p.getFileSystem(hconf)
    old = jvm.org.apache.hadoop.fs.Path(f"{live.rstrip('/')}__old{tag}")
    if not fs.rename(p, old):  # pragma: no cover - fs race
        raise IOError(f"maintain: could not move {live} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p):  # pragma: no cover
        fs.rename(old, p)  # restore; old table was never touched
        raise IOError(f"maintain: could not swap {tmp} into place")
    fs.delete(old, True)
    # Spark's shared FileStatusCache serves the PRE-swap listing to the
    # next read of this path — later batches would then chase deleted
    # part files (FAILED_READ_FILE.FILE_NOT_EXIST, caught live by
    # tools/neardup_stream_probe.py). Invalidate both the listing and
    # any cached data keyed on the path.
    spark.catalog.refreshByPath(live)


# Replay-guard horizon for the file-keyed idempotence below: how many
# recently ingested FILE keys the sidecar remembers (16-hex-char keys →
# the full horizon is ~128 KB of sidecar). Under a durable checkpoint
# (the ingest default) a replay only redelivers the in-flight batch,
# so any bound over one batch's file count suffices; the margin covers
# manual checkpoint-loss reruns of a recent window. A rerun reaching
# files older than the horizon (e.g. a full re-drain of months of
# input after deleting the checkpoint) is a REBUILD decision, not a
# replay — the sidecar cannot arbitrate it.
_APPLIED_KEYS_HORIZON = 4096


def _file_key(name: str) -> str:
    """16-hex-char content key for one ingested file name."""
    import hashlib

    return hashlib.md5(name.encode("utf-8")).hexdigest()[:16]


def _batch_files(batch_df: DataFrame) -> list[str]:
    """Sorted distinct input file names of a foreachBatch micro-batch
    (empty for non-file sources). The FILE — not the batch — is the
    unit of replay identity for a file-source ingest: ``batch_id``
    renumbers from 0 when a checkpoint is lost, and a re-drain can
    REGROUP the same files into differently-shaped batches, so any
    batch-level key (id or file-set hash) misidentifies a regrouped
    replay (ADVICE r14). Per-file keys let the ingest drop exactly the
    already-committed files from a batch and process the rest. Cost:
    one tiny distinct over the batch's partitions."""
    rows = (
        batch_df.select(F.input_file_name().alias("f")).distinct().collect()
    )
    return sorted({r["f"] for r in rows if r["f"]})


def pipeline_foreach_batch(
    spark: SparkSession,
    path: str,
    config_yaml: str | None = None,
    ts_col: str = "ts",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
    config_path: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run a batch Pipeline (sql/python/rest stages) per micro-batch via
    ``foreachBatch`` — the streaming reincarnation of the reference's
    chunked execution loop (``filefilter.py:195-276``): each micro-batch
    plays the role of one chunk, and the same YAML stages the reference
    applies per chunk are applied per batch (SURVEY.md §2.6).

    ``config_path`` (exclusive with ``config_yaml``) re-reads the YAML
    file at the START of every micro-batch — the reference's
    ``reloadConfigEverySeconds`` hot-reload semantics
    (``filefilter.py:160-170``) on the one Spark surface where a
    mid-job stage swap is expressible: edits to the file take effect on
    the next batch, with the micro-batch as the consistency boundary
    (a batch never sees half-old, half-new stages). ``config_yaml``
    pins one config for the whole run.

    Results accumulate in a parquet dir; on a real deployment the
    writer would be delta/kafka.
    """
    from filefilter_spark.config import load_config_str
    from filefilter_spark.pipeline import Pipeline

    if (config_yaml is None) == (config_path is None):
        raise ValueError("pass exactly one of config_yaml / config_path")

    stream = _events_stream(spark, path, ts_col, max_files_per_trigger)
    # Unique dir per invocation (append-mode batches within ONE run must
    # not mix with a previous run's rows), under a shared root removed
    # at interpreter exit — repeated bench/correctness runs no longer
    # accumulate orphan temp dirs. The dir must outlive the returned
    # lazy DataFrame, hence atexit, not per-call cleanup.
    out_dir = _fb_scratch() + "/data"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if config_path is not None:
            with open(config_path) as fh:
                yaml_str = fh.read()
        else:
            yaml_str = config_yaml
        pipe = Pipeline(spark, load_config_str(yaml_str))
        pipe.run(batch_df).df.write.mode("append").parquet(out_dir)

    import os
    import shutil
    import tempfile
    import uuid as _uuid

    # Same tmpfs-checkpoint shortcut as _run_to_memory (bounded drain,
    # ephemeral output — durable deployments checkpoint durably).
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    ckpt = os.path.join(ckpt_base, "ffspark_ckpt_fb_" + _uuid.uuid4().hex[:8])
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_sec)
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    if not os.path.isdir(out_dir):
        # Zero micro-batches ran (empty/non-matching input): the handle
        # never wrote, so read.parquet would raise PATH_NOT_FOUND at an
        # internal scratch path — masking the real cause. Surface it.
        raise ValueError(
            "pipeline_foreach_batch: the availableNow run produced no "
            "micro-batches (no matching input files?) — nothing to read"
        )
    return spark.read.parquet(out_dir)


def rate_soak(
    spark: SparkSession,
    num_batches: int = 55,
    rows_per_sec: int = 20_000,
    trigger: str = "200 milliseconds",
    window: str = "1 second",
    watermark: str = "2 seconds",
    timeout_sec: int = 120,
    state_partitions: int | None = 4,
) -> list[dict]:
    """Long-lived micro-batch soak on the unbounded ``rate`` source —
    the amortization evidence the availableNow profiles can't give.

    Runs watermark → tumbling window → count over a continuous
    rate stream until ``num_batches`` data-carrying micro-batches have
    completed, then returns one dict per batch: ``batch_id``,
    ``input_rows``, ``add_batch_ms`` (the execution component of the
    trigger), ``state_rows`` (live aggregation state after the batch).

    What a healthy long-running query shows — and the soak test
    asserts: per-batch addBatch time FLAT (no per-batch cost growing
    with total rows processed), and state rows BOUNDED (watermark
    eviction holds live state at ~(watermark+window)/window windows ×
    key cardinality, independent of how long the query has run). A
    state-leak bug (watermark not applied, wrong output mode) shows up
    here as monotonic state growth even though every individual batch
    is correct.
    """
    import json as _json
    import os
    import shutil
    import tempfile
    import time as _time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )
    agg = (
        stream.withWatermark("timestamp", watermark)
        .groupBy(
            F.window("timestamp", window).alias("win"),
            (F.col("value") % 10).alias("k"),
        )
        .agg(F.count("*").alias("n"))
    )
    qname = "soak_" + uuid.uuid4().hex[:8]
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    ckpt = os.path.join(ckpt_base, "ffspark_ckpt_" + qname)
    # Same conf discipline as _run_to_memory: the state-partition count
    # freezes at the first checkpoint, so set it for start() and restore
    # the session's batch default right after.
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key, None)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    try:
        query = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=trigger)
            .start()
        )
    finally:
        if state_partitions is not None:
            if prev is not None:
                spark.conf.set(conf_key, prev)
            else:
                # Same contract as _run_to_memory above: get(key, None)
                # is None when the key was never explicitly set — unset
                # rather than skip, or the soak's tiny partition count
                # would leak into the session's batch queries.
                spark.conf.unset(conf_key)
    out: dict[int, dict] = {}
    deadline = _time.time() + timeout_sec
    try:
        while len(out) < num_batches and _time.time() < deadline:
            _time.sleep(0.2)
            for p in query.recentProgress:
                d = _json.loads(p.json) if hasattr(p, "json") else p
                if d.get("numInputRows", 0) <= 0:
                    continue
                ops = d.get("stateOperators") or [{}]
                out[d["batchId"]] = {
                    "batch_id": d["batchId"],
                    "input_rows": d["numInputRows"],
                    "add_batch_ms": (d.get("durationMs") or {}).get(
                        "addBatch", 0
                    ),
                    "state_rows": ops[0].get("numRowsTotal", 0),
                }
    finally:
        # Best-effort cleanup: none of these may mask a timeout/error
        # raised by the soak body (stop can throw if the query already
        # died; the memory sink never registers its view when stop()
        # lands before batch 0 on some Spark versions).
        try:
            query.stop()
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
        try:
            spark.catalog.dropTempView(qname)
        except Exception:
            pass
    return [out[b] for b in sorted(out)][:num_batches]


def ivfpq_stream_ingest(
    spark: SparkSession,
    path: str,
    codebooks,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    residual: bool = False,
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    out_dir: str | None = None,
    maintain_every: int | None = None,
    max_files_per_partition: int = 16,
) -> DataFrame:
    """Continuous IVF×PQ index maintenance (OP-D5 × OP-D3): each
    micro-batch of newly arrived embeddings is assigned + encoded
    against a FROZEN index (``ops.pq.ivfpq_encode_batch`` — pure
    grid-exact projections, so a vector gets the same codes no matter
    which batch delivered it) and appended to the cell-partitioned
    code table at ``out_dir`` (default: session scratch — pass a real
    path for a persistent index). Existing data never reshuffles;
    probes over the growing table stay partition-pruned reads.
    ``availableNow`` drains the bounded test input; an unbounded
    deployment runs the identical plan with a durable checkpoint and
    a delta/iceberg sink.

    Per-batch appends accumulate small files per cell.
    ``maintain_every=N`` (r13) closes that loop IN-STREAM: after
    every Nth micro-batch the threshold gate
    (``ops.layout.maybe_compact`` — store-agnostic Hadoop-FS listing,
    fires only past ``max_files_per_partition`` data files in some
    ``cell=`` dir) rewrites the table via ``compact_partitioned``
    into a sibling directory and swaps it in with Hadoop
    ``FileSystem.rename`` (old table kept aside until the new one is
    in place, then deleted — a crash between renames leaves the
    ``__old`` copy intact). foreachBatch bodies run serially, so the
    swap never races an append. On an object store the rename tier
    is a copy — real deployments point a delta/iceberg catalog entry
    at the compacted location instead; the gate and rewrite are the
    same. Left unset, run ``compact_partitioned(..., "cell",
    [id_col])`` on your own cadence."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from filefilter_spark.ops.pq import ivfpq_encode_batch

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        # single-FILE dataset: stream its parent with a name glob
        # (same contract as _events_stream — a directory named
        # *.parquet must not take this branch; Hadoop-FS test so the
        # dispatch works on any store Spark can read)
        base = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base)
    else:
        stream = reader.parquet(path)
    if out_dir is None:
        out_dir = _fb_scratch() + "/codes"

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import maybe_compact

        base = out_dir.rstrip("/")
        tmp = f"{base}__compact{batch_id}"
        try:
            ran = maybe_compact(
                spark, out_dir, tmp, "cell", [id_col],
                max_files_per_partition=max_files_per_partition,
            )
        except ValueError:
            # out_dir has no cell= dirs yet (every batch so far was
            # empty) — nothing to maintain; the loud contract exists
            # for user-pointed paths, and this one is internal
            return
        if not ran:
            return
        _swap_dirs(spark, out_dir, tmp, batch_id)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            ivfpq_encode_batch(
                batch_df, codebooks, centroids,
                vec_col=vec_col, id_col=id_col, residual=residual,
            )
            .write.partitionBy("cell")
            .mode("append")
            .parquet(out_dir)
        )
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            maintain(batch_id)

    ckpt_base = (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    ckpt = os.path.join(
        ckpt_base, "ffspark_ckpt_ivfpq_" + _uuid.uuid4().hex[:8]
    )
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # Unlike the windowed-aggregation helpers (whose partial
        # results are legitimately useful), the output here is a
        # PERSISTENT INDEX — returning a partially-ingested code
        # table as if complete would silently lose vectors, so a
        # timeout is an error, not a shrug.
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"ivfpq_stream_ingest: availableNow drain did not "
                f"finish within {timeout_sec}s — the code table at "
                f"{out_dir} is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    if not _dir_exists(spark, out_dir):
        raise ValueError(
            "ivfpq_stream_ingest: the availableNow run produced no "
            "micro-batches (no matching input files?) — nothing to read"
        )
    return spark.read.parquet(out_dir)


def minhash_stream_dedup(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 1,
    max_bucket: int = 4096,
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    out_dir: str | None = None,
    on_batch=None,
    maintain_every: int | None = None,
    max_files_per_store: int = 64,
) -> DataFrame:
    """Streaming NEAR-dedup (OP-D5 × OP-D2): continuously ingest
    documents, keep only those with no MinHash-LSH-verified near-dup
    (exact Jaccard ≥ ``threshold``) among previously ACCEPTED
    survivors — the arrival-order-greedy policy every streaming dedup
    implements (first copy wins; later paraphrases drop), composed
    from the batch tier's own pieces so the two agree parameter for
    parameter.

    Per micro-batch (foreachBatch, bodies serial):

    1. band the batch (``ops.dedup.minhash_band_buckets``) — history
       is NEVER re-hashed: the survivor store persists its band table,
       so cross-batch candidates are one equi-join of batch bands
       against stored bands on (band, bucket). Hot store buckets past
       ``max_bucket`` are dropped first (the same degenerate-bucket
       bound as the batch op, here also capping the join fan-out).
    2. exact-verify candidates (``_verify_jaccard``) reading ONLY the
       candidate survivors' texts (id-semi-join into the store) —
       batch docs matching history drop.
    3. near-dup the remainder within-batch (``_bucket_pairs`` over the
       SAME banding pass + exact verify + ``keep_neardup_survivors`` —
       CC min-id representative, the batch tier's deterministic rule;
       the composition is plan-identical to ``minhash_near_dup``).
    4. append survivors' rows to ``<out_dir>/docs`` and their bands to
       ``<out_dir>/bands`` — again filters of the step-1 banding.

    The batch is banded (signatures + tokenize) exactly ONCE; steps
    1/3/4 reuse the persisted band frame through id filters — at
    100 TB the MinHash fold is the dominant per-batch cost, so the
    single-pass shape is the difference between 1× and 3× ingest cost.

    ``on_batch`` (opt-in metrics hook) is called after each micro-batch
    with ``{"batch_id", "seconds", "n_in", "n_survived"}`` — the
    counts cost extra jobs, so leave it unset in production unless the
    numbers feed a dashboard; SCALING.md's per-batch cost curve was
    measured through it.

    Replay-safe under foreachBatch's at-least-once contract: a
    replayed (or re-ingested) document shares every band with its
    stored self, surfaces as a self-pair in the candidate join, and is
    killed on id equality — so reprocessing a batch appends nothing
    (pinned in tests by running the same arrivals through one store
    twice). The uncovered window is a crash between the docs and bands
    appends of ONE batch; a transactional table format (delta/iceberg)
    closes it.

    ``maintain_every=N``: per-batch appends leave 2 files per batch
    (docs + bands) forever — the same small-files drift
    ``ivfpq_stream_ingest`` maintains against. After every Nth batch,
    any store dir past ``max_files_per_store`` data files (Hadoop-FS
    listing) is rewritten by ``ops.layout.compact_files`` (docs ordered
    by id for tight row-group stats; bands by (band, bucket) so the
    candidate equi-join's probe side row-group-prunes) and swapped in
    via :func:`_swap_dirs`. Left unset, compact on your own cadence.

    Returns the survivor table. Cost per batch is O(batch + matching
    buckets + candidates): the store is touched only through the
    (band, bucket) join and the candidate-id lookup — at 100 TB both
    store tables would be bucketed by their join key so the probe
    reads shrink to the touched buckets; the scan-based form here is
    plan-identical above the exchange. The survivor set depends on
    arrival order ACROSS batches (inherent to any streaming dedup —
    the stream defines who arrived first) but is deterministic within
    a batch; a single-batch drain (``max_files_per_trigger=None``)
    equals the batch pipeline exactly (pinned in tests).
    ``availableNow`` drains the bounded test input; an unbounded
    deployment runs the identical plan with a durable checkpoint.
    """
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.storagelevel import StorageLevel

    from filefilter_spark.ops.dedup import (
        _bucket_pairs,
        _doc_tokens,
        _verify_jaccard,
        keep_neardup_survivors,
        minhash_band_buckets,
    )

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        base = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base)
    else:
        stream = reader.parquet(path)
    if out_dir is None:
        out_dir = _fb_scratch() + "/neardup"
    docs_dir = f"{out_dir}/docs"
    bands_dir = f"{out_dir}/bands"

    def band(df: DataFrame) -> DataFrame:
        return minhash_band_buckets(
            df, id_col, text_col, num_hashes, bands, seed, shingle_n
        )

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import compact_files

        for d, order in (
            (docs_dir, [id_col]),
            (bands_dir, ["band", "bucket", "doc_id"]),
        ):
            if _n_data_files(spark, d) <= max_files_per_store:
                continue
            tmp = f"{d}__compact{batch_id}"
            compact_files(spark, d, tmp, order)
            _swap_dirs(spark, d, tmp, batch_id)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        new = batch_df.select(F.col(id_col), F.col(text_col))
        # ONE banding (hence one signature/tokenize) pass per batch —
        # the cross-store probe, the within-batch candidates, and the
        # survivors' band append all reuse it via id filters.
        new_banded = band(new).persist(StorageLevel.MEMORY_AND_DISK)
        # bounded-lifetime pair-kernel cache (r17, ADVICE r16): the
        # kernel persists into this scope instead of localCheckpoint,
        # so long streams free each batch's blocks deterministically
        pair_scope: list = []
        try:
            remaining = new
            if _dir_exists(spark, docs_dir):
                seen_bands = spark.read.parquet(bands_dir)
                if max_bucket is not None:
                    hot = (
                        seen_bands.groupBy("band", "bucket")
                        .agg(F.count("*").alias("__n"))
                        .filter(F.col("__n") > max_bucket)
                        .select("band", "bucket")
                    )
                    seen_bands = seen_bands.join(
                        F.broadcast(hot), ["band", "bucket"], "left_anti"
                    )
                cross = (
                    new_banded.join(
                        seen_bands.withColumnRenamed("doc_id", "__seen"),
                        ["band", "bucket"],
                    )
                    .select(
                        F.col("doc_id").alias("id_a"),
                        F.col("__seen").alias("id_b"),
                    )
                    .distinct()
                )
                # Replay idempotence for free: foreachBatch is
                # at-least-once, and a REPLAYED document shares every
                # band with its stored self, so it surfaces here as the
                # self-pair (x, x) — kill it on id equality without any
                # Jaccard read (the verify path would silently drop
                # self-pairs: the melted side-join sees 4 rows for one
                # doc_id and its n_sides == 2 guard rejects them). A
                # replayed batch thus re-kills its own survivors and
                # appends nothing; only docs whose every bucket is
                # hot-capped escape (the standing LSH recall caveat).
                killed_replay = cross.filter(
                    F.col("id_a") == F.col("id_b")
                ).select(F.col("id_a").alias(id_col))
                cross = cross.filter(F.col("id_a") != F.col("id_b"))
                cand_seen = spark.read.parquet(docs_dir).join(
                    cross.select(F.col("id_b").alias(id_col)).distinct(),
                    id_col,
                    "left_semi",
                )
                toks = _doc_tokens(
                    new, id_col, text_col, shingle_n
                ).unionByName(
                    _doc_tokens(cand_seen, id_col, text_col, shingle_n)
                )
                killed = (
                    _verify_jaccard(cross, toks, threshold)
                    .select(F.col("id_a").alias(id_col))
                    .unionByName(killed_replay)
                    .distinct()
                )
                remaining = new.join(killed, id_col, "left_anti")
            rem_ids = remaining.select(F.col(id_col).alias("doc_id"))
            pairs_in = _verify_jaccard(
                _bucket_pairs(
                    new_banded.join(rem_ids, "doc_id", "left_semi"),
                    ["band", "bucket"],
                    max_bucket=max_bucket,
                    scope=pair_scope,
                ),
                _doc_tokens(remaining, id_col, text_col, shingle_n),
                threshold,
            )
            survivors = keep_neardup_survivors(
                remaining, pairs_in, id_col=id_col
            )
            stats = None
            if on_batch is not None:
                # Counts BEFORE the store writes: appending to docs_dir
                # invalidates any cached plan that reads it (Spark
                # recacheByPath), so a post-write survivors.count()
                # would recompute against the just-appended store —
                # where every survivor now self-pairs and "dies".
                survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
                stats = {
                    "batch_id": batch_id,
                    "n_in": new.count(),
                    "n_survived": survivors.count(),
                }
            survivors.write.mode("append").parquet(docs_dir)
            (
                new_banded.join(
                    survivors.select(F.col(id_col).alias("doc_id")),
                    "doc_id",
                    "left_semi",
                )
                .write.mode("append")
                .parquet(bands_dir)
            )
            if maintain_every and (batch_id + 1) % maintain_every == 0:
                maintain(batch_id)
            if stats is not None:
                survivors.unpersist()
                # seconds covers the WHOLE batch body, maintenance
                # included — the probe's flatness claim must price it
                stats["seconds"] = _time.time() - t0
                on_batch(stats)
        finally:
            new_banded.unpersist()
            for h in pair_scope:
                h.unpersist()

    ckpt_base = (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    ckpt = os.path.join(
        ckpt_base, "ffspark_ckpt_neardup_" + _uuid.uuid4().hex[:8]
    )
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # Same contract as ivfpq_stream_ingest: the output is a
        # PERSISTENT survivor corpus — a partial drain would silently
        # admit documents whose earlier near-dup never got processed.
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"minhash_stream_dedup: availableNow drain did not "
                f"finish within {timeout_sec}s — the survivor store at "
                f"{out_dir} is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    if not _dir_exists(spark, docs_dir):
        raise ValueError(
            "minhash_stream_dedup: the availableNow run produced no "
            "micro-batches (no matching input files?) — nothing to read"
        )
    return spark.read.parquet(docs_dir)


def semdedup_stream_dedup(
    spark: SparkSession,
    path: str,
    centroids,
    threshold: float = 0.45,
    n_assign: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = 4096,
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    out_dir: str | None = None,
    on_batch=None,
    maintain_every: int | None = None,
    max_files_per_store: int = 64,
    built_cell_counts: dict | None = None,
    rebuild_on_drift: bool = False,
) -> DataFrame:
    """Streaming SEMANTIC near-dedup (OP-D5 × OP-D3 — SemDeDup's
    production shape, Abbas et al. 2023): continuously ingest
    embeddings, keep only vectors with no exact-cosine near-dup
    (≥ ``threshold``) among previously ACCEPTED survivors. The exact
    structural mirror of :func:`minhash_stream_dedup` with KMeans
    cells in place of LSH bands:

    - ``centroids`` are FROZEN (fit offline or on the first corpus via
      ``ops.similarity.build_ivf_index`` — ``method="lloyd"`` for a
      bit-stable fit), so membership assignment is a zero-shuffle
      literal expression and a vector gets the same cells no matter
      which batch delivered it.
    - the store persists ``<out_dir>/vecs`` (id + embedding) and
      ``<out_dir>/cells`` (the top-``n_assign`` membership table,
      ``ops.similarity.cell_memberships``) — history is never
      re-scored: cross-batch candidates are one equi-join of batch
      memberships against stored memberships on ``cell``, hot cells
      past ``max_cell`` stored members dropped first (the SemDeDup
      boundary-recall tradeoff, here also capping join fan-out).
    - candidates are verified by EXACT cosine
      (``ops.similarity._pair_cosine_verify``) reading only candidate
      survivors' vectors; a replayed/re-ingested vector surfaces as
      its own self-pair and is killed on id equality — replay-safe
      under foreachBatch's at-least-once contract, like the minhash
      loop.
    - the within-batch remainder near-dups via the same
      memberships → ``_bucket_pairs`` → cosine-verify →
      ``keep_neardup_survivors`` (CC min-id) pieces as the batch op,
      so a single-batch drain equals batch ``semantic_dedup`` +
      survivor materialization exactly (pinned in tests).
    - ``maintain_every=N`` compacts both store dirs past
      ``max_files_per_store`` files and swaps them in
      (:func:`_swap_dirs`, path caches invalidated).
    - ``on_batch`` is the same opt-in metrics hook as the minhash
      loop: ``{"batch_id", "seconds", "n_in", "n_survived"}`` per
      micro-batch (counts taken BEFORE the store writes — see the
      recacheByPath note there), feeding SCALING.md's cost curve.
      r16 adds the staleness wire
      (:func:`ops.similarity.semdedup_cell_drift`, thresholds
      calibrated by ``tools/semdedup_drift_probe.py``):
      ``capped_mass_frac`` — the share of the batch's memberships
      landing in cells the ``max_cell`` cap has dropped, the DIRECT
      predictor of silent dup-catch loss — drives ``action`` (ok →
      degraded → rebuild: refit the centroids ``seeding="kmeanspar"``
      with re-sized ``n_lists``/``max_cell`` and re-baseline);
      ``n_capped_cells`` and, when ``built_cell_counts`` is passed
      (the fit corpus's :func:`ops.similarity.membership_histogram`),
      the ``tv_distance`` TREND field ride along. TV does not drive
      the action — measured, a regionally focused ingest reads high
      TV with perfect recall.
    - ``rebuild_on_drift=True`` CLOSES the loop (the
      ``ann_index_stream_ingest`` ``rebuild_source`` twin — here the
      survivor store IS the full corpus, so no source argument is
      needed): when a batch's action reads ``rebuild``, the loop
      refits the centroids over ``<out_dir>/vecs`` at the batch
      boundary — ``seeding="kmeanspar"``, RE-SIZED to
      ``max(built, round(sqrt(n_store)))`` lists per SCALING.md's
      rebuild rule — recomputes the WHOLE cells table under the new
      model (temp+swap, so a crash mid-rebuild leaves the old layout
      intact), re-baselines the TV trend from the new store
      histogram, and assigns every subsequent batch under the fresh
      centroids. Dup-catch on post-rebuild arrivals returns to
      baseline (``tools/semdedup_drift_probe.py``'s self-heal
      scenario). Already-missed pairs are NOT retroactively killed —
      history is never re-scored, same contract as every other loop.
      Stats gain ``rebuilt`` and ``n_lists``.

    Returns the survivor table ``(vec_id, embedding)``. Arrival order
    across batches decides who survives (first copy wins) —
    deterministic within a batch."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.storagelevel import StorageLevel

    from filefilter_spark.ops.dedup import (
        _bucket_pairs,
        keep_neardup_survivors,
    )
    from filefilter_spark.ops.similarity import (
        _as_double_array,
        _pair_cosine_verify,
        cell_memberships,
    )

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        base = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base)
    else:
        stream = reader.parquet(path)
    if out_dir is None:
        out_dir = _fb_scratch() + "/semdedup"
    vecs_dir = f"{out_dir}/vecs"
    cells_dir = f"{out_dir}/cells"

    # live model state: rebuild_on_drift swaps in refit centroids (and
    # a re-read TV baseline) at a batch boundary, so membership
    # assignment must read through this holder, not the arguments
    state = {"cents": centroids, "baseline": built_cell_counts}

    def member(df: DataFrame) -> DataFrame:
        return cell_memberships(
            df, state["cents"], n_assign, vec_col, id_col
        )

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import compact_files

        for d, order in (
            (vecs_dir, [id_col]),
            (cells_dir, ["cell", "id"]),
        ):
            if _n_data_files(spark, d) <= max_files_per_store:
                continue
            tmp = f"{d}__compact{batch_id}"
            compact_files(spark, d, tmp, order)
            _swap_dirs(spark, d, tmp, batch_id)

    def do_rebuild(batch_id: int) -> None:
        """Act on the staleness signal: refit the frozen centroids
        over the survivor store (``seeding="kmeanspar"`` — O(log k)
        passes — RE-SIZED to ``max(built, round(sqrt(n_store)))``
        lists), recompute the WHOLE cells table under the new model
        via temp+swap (a crash mid-rebuild leaves the old layout
        readable), and re-baseline the TV trend from the new store
        histogram (n_lists-bounded collect)."""
        import math as _math

        from filefilter_spark.ops.similarity import build_ivf_index

        store = spark.read.parquet(vecs_dir)
        n_store = store.count()
        n_new = max(
            len(state["cents"]),
            int(round(_math.sqrt(max(1, n_store)))),
        )
        _, cents2 = build_ivf_index(
            store, n_lists=n_new, vec_col=vec_col, id_col=id_col,
            method="lloyd", coarse_iters=8, seeding="kmeanspar",
        )
        tmp = f"{cells_dir}__rebuild{batch_id}"
        cell_memberships(
            store, cents2, n_assign, vec_col, id_col
        ).write.parquet(tmp)
        _swap_dirs(spark, cells_dir, tmp, batch_id)
        state["cents"] = cents2
        state["baseline"] = {
            int(r["cell"]): int(r["n"])
            for r in spark.read.parquet(cells_dir)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        new = batch_df.select(F.col(id_col), F.col(vec_col))
        new_cells = member(new).persist()
        capped_ids: list[int] = []
        # bounded-lifetime pair-kernel cache (r17, ADVICE r16) — see
        # the minhash loop's pair_scope note
        pair_scope: list = []
        try:
            remaining = new
            if _dir_exists(spark, vecs_dir):
                seen_cells = spark.read.parquet(cells_dir)
                if max_cell is not None:
                    hot = (
                        seen_cells.groupBy("cell")
                        .agg(F.count("*").alias("__n"))
                        .filter(F.col("__n") > max_cell)
                        .select("cell")
                    )
                    if on_batch is not None or rebuild_on_drift:
                        # cap-engagement wire: members of these cells
                        # are OUT of candidate generation — the
                        # silent-recall-loss mechanism the staleness
                        # signal keys off (n_lists-bounded collect)
                        capped_ids = [
                            int(r["cell"]) for r in hot.collect()
                        ]
                    seen_cells = seen_cells.join(
                        F.broadcast(hot), ["cell"], "left_anti"
                    )
                cross = (
                    new_cells.join(
                        seen_cells.withColumnRenamed("id", "__seen"),
                        ["cell"],
                    )
                    .select(
                        F.col("id").alias("id_a"),
                        F.col("__seen").alias("id_b"),
                    )
                    .distinct()
                )
                killed_replay = cross.filter(
                    F.col("id_a") == F.col("id_b")
                ).select(F.col("id_a").alias(id_col))
                cross = cross.filter(F.col("id_a") != F.col("id_b"))
                cand_seen = spark.read.parquet(vecs_dir).join(
                    cross.select(F.col("id_b").alias(id_col)).distinct(),
                    id_col,
                    "left_semi",
                )
                both = new.unionByName(cand_seen)
                killed = (
                    _pair_cosine_verify(
                        cross, both, _as_double_array(vec_col),
                        id_col, threshold,
                    )
                    .select(F.col("id_a").alias(id_col))
                    .unionByName(killed_replay)
                    .distinct()
                )
                remaining = new.join(killed, id_col, "left_anti")
            rem_cells = new_cells.join(
                remaining.select(F.col(id_col).alias("id")), "id",
                "left_semi",
            )
            pairs_in = _pair_cosine_verify(
                _bucket_pairs(rem_cells, ["cell"], id_col="id",
                              max_bucket=max_cell, scope=pair_scope),
                remaining, _as_double_array(vec_col), id_col, threshold,
            )
            survivors = keep_neardup_survivors(
                remaining, pairs_in, id_col=id_col
            )
            stats = None
            drift = None
            if on_batch is not None or rebuild_on_drift:
                from filefilter_spark.ops.similarity import (
                    semdedup_cell_drift,
                )

                batch_hist = {
                    int(r["cell"]): int(r["n"])
                    for r in new_cells.groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                drift = semdedup_cell_drift(
                    state["baseline"], batch_hist, capped_ids
                )
            if on_batch is not None:
                # counts BEFORE the store writes — see the minhash
                # loop's recacheByPath note
                survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
                stats = {
                    "batch_id": batch_id,
                    "n_in": new.count(),
                    "n_survived": survivors.count(),
                    "n_capped_cells": len(capped_ids),
                    **drift,
                }
            survivors.write.mode("append").parquet(vecs_dir)
            (
                new_cells.join(
                    survivors.select(F.col(id_col).alias("id")),
                    "id",
                    "left_semi",
                )
                .write.mode("append")
                .parquet(cells_dir)
            )
            if maintain_every and (batch_id + 1) % maintain_every == 0:
                maintain(batch_id)
            rebuilt = False
            if (
                rebuild_on_drift
                and drift is not None
                and drift["action"] == "rebuild"
            ):
                do_rebuild(batch_id)
                rebuilt = True
            if stats is not None:
                survivors.unpersist()
                stats["rebuilt"] = rebuilt
                stats["n_lists"] = len(state["cents"])
                stats["seconds"] = _time.time() - t0
                on_batch(stats)
        finally:
            new_cells.unpersist()
            for h in pair_scope:
                h.unpersist()

    ckpt_base = (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    ckpt = os.path.join(
        ckpt_base, "ffspark_ckpt_semdedup_" + _uuid.uuid4().hex[:8]
    )
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"semdedup_stream_dedup: availableNow drain did not "
                f"finish within {timeout_sec}s — the survivor store at "
                f"{out_dir} is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    if not _dir_exists(spark, vecs_dir):
        raise ValueError(
            "semdedup_stream_dedup: the availableNow run produced no "
            "micro-batches (no matching input files?) — nothing to read"
        )
    return spark.read.parquet(vecs_dir)


def text_index_stream_ingest(
    spark: SparkSession,
    path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    maintain_every: int | None = None,
    max_files_per_partition: int = 16,
    checkpoint_dir: str | None = None,
    on_batch=None,
    rebucket_on_growth: bool = False,
) -> DataFrame:
    """Continuous inverted-index maintenance (OP-D5 × OP-D4-bm25): the
    text twin of :func:`ivfpq_stream_ingest`. Each micro-batch of
    newly arrived documents is tokenized into (doc, dl, term, tf)
    postings and APPENDED to the bucket-partitioned layout of
    ``ops.retrieval.build_text_index`` at ``out_dir`` — existing
    postings never reshuffle, and ``bm25_topk_indexed`` queries over
    the growing index stay partition-pruned reads at every point.

    Correctness under streaming semantics:

    * **stats** (n_docs, Σdl) are merged ADDITIVELY per batch from
      exact int64s, guarded by PER-FILE keys (:func:`_batch_files`):
      already-committed files are dropped from a replayed batch before
      anything is computed, so an at-least-once replay is a no-op even
      after checkpoint loss — where batch ids renumber from 0 AND the
      rerun regroups files into differently-shaped batches, the case a
      batch-level guard misidentifies (ADVICE r14; ``last_batch_id``
      remains as the legacy-layout guard and an observability field).
    * **postings** can still double-append in the crash window between
      a batch's append and its stats commit; the query path dedupes
      (doc, term) on its pruned read and counts df as DISTINCT docs,
      so scores are exact regardless.
    * **no terms/ table is maintained** — a cached df would go stale
      the moment the next batch lands; ``bm25_topk_indexed`` detects
      the missing table and computes df from the pruned postings
      instead (exact, always fresh). When the layout came from the
      BATCH build (which does cache ``terms/``), the first applied
      append DELETES that cache before writing (r16): leaving it
      would keep probes scoring with build-era dfs — measured
      silently wrong on a built-then-grown layout (idf inflation;
      regression-pinned). The delete-then-append order keeps every
      crash point exact — the fallback recomputes the same dfs the
      cache held.
    * **n_buckets comes from the stats sidecar** when ``out_dir``
      already holds an index (a mismatched explicit value raises —
      appending postings hashed with a different bucket count would
      silently corrupt every probe); on a fresh dir the parameter
      (default 64) is used and recorded.
    * **the checkpoint is durable by default** (``checkpoint_dir=None``
      → ``out_dir/_checkpoint``): a crash-and-rerun resumes batch
      numbering and never redelivers committed input files. Pass an
      explicit ephemeral dir only to simulate checkpoint loss.

    ``maintain_every=N`` closes the small-files loop in-stream, same
    as the IVF×PQ and near-dup stores: every Nth batch the
    threshold gate (``ops.layout.maybe_compact``, store-agnostic
    Hadoop-FS listing) rewrites fragmented buckets sorted by
    (term, id) and swaps the table in atomically.

    ``on_batch`` (opt-in, r16) fires after each APPLIED micro-batch
    with ``{batch_id, n_docs}`` plus the
    :func:`ops.retrieval.text_index_growth` signal (``growth_factor``,
    ``action``): this layout has no frozen model — scores stay exact
    at any growth — but ``n_buckets`` is a frozen SIZING decision;
    past ``TEXT_GROWTH_REBUCKET``× the build size each bucket holds
    that multiple of its intended postings share (a layout-maintenance
    drift, not a latency alarm — measured flat probe latency to ×16,
    SCALING.md); ``action="rebucket"`` says re-size the bucket count
    at the next rebuild.

    ``rebucket_on_growth=True`` makes the loop ACT on that signal
    (r16 — completing the self-acting set: ANN rebuilds, SemDeDup
    refits, fuzzy re-derives, text REBUCKETS): at the triggering
    batch's boundary the postings store is rewritten with
    ``n_buckets × 2^⌈log₂ growth⌉`` buckets (term hashing restored to
    its intended per-bucket share) and the sidecar re-freezes
    ``built_n_docs`` at the current size, so the signal resets to ok.
    A probe under the old sidecar against new-bucketed postings would
    prune the WRONG partitions silently, so the postings and stats
    swaps are fenced by a ``rebucket_pending`` marker CARRYING the
    target bucket count: a crash at any point between them heals by
    an idempotent re-derivation (bucket is a pure function of term)
    before the next batch; finding the marker with
    ``rebucket_on_growth=False`` raises rather than probe a
    possibly-mixed layout. Stats gain ``rebucketed``/``n_buckets``.

    ``availableNow`` drains the bounded test input; an unbounded
    deployment runs the identical plan with a durable checkpoint.
    Returns the postings table at ``out_dir`` after the drain.
    """
    import os

    import pyspark.sql.functions as F

    from filefilter_spark.ops.text import tokens

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        base = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base)
    else:
        stream = reader.parquet(path)

    post_dir = f"{out_dir}/postings"
    stats_dir = f"{out_dir}/stats"

    # the layout's recorded bucket count is authoritative: appending
    # postings hashed with a different n_buckets would scatter a term
    # across buckets and silently break every probe's pruning
    if _dir_exists(spark, stats_dir):
        cur0 = spark.read.parquet(stats_dir).first()
        if (
            cur0 is not None
            and "n_buckets" in cur0.__fields__
            and cur0["n_buckets"] is not None
        ):
            stored_nb = int(cur0["n_buckets"])
            if n_buckets is not None and int(n_buckets) != stored_nb:
                raise ValueError(
                    f"text_index_stream_ingest: n_buckets="
                    f"{int(n_buckets)} contradicts the index's stats "
                    f"sidecar (built with n_buckets={stored_nb}); omit "
                    f"the parameter to append with the recorded value"
                )
            n_buckets = stored_nb
    # mutable: rebucket_on_growth swaps in a larger bucket count at a
    # batch boundary; later batches must hash with the live value
    nb = {"v": 64 if n_buckets is None else int(n_buckets)}

    def _stats_row():
        if not _dir_exists(spark, stats_dir):
            return None
        return spark.read.parquet(stats_dir).first()

    def _seen_keys(cur) -> list[str]:
        if (
            cur is not None
            and "applied_keys" in cur.__fields__
            and cur["applied_keys"] is not None
        ):
            return list(cur["applied_keys"])
        return []

    def merge_stats(
        batch_df: DataFrame, batch_id: int, new_keys: list[str]
    ) -> tuple[int, int | None]:
        src = F.lower(F.col(text_col))
        row = (
            batch_df.select(F.size(tokens(src)).alias("dl"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
            .first()
        )
        bn, bs = int(row["n"]), int(row["s"] or 0)
        cur = _stats_row()
        if bn == 0 and cur is None:
            return 0, None  # empty first batch: nothing to record yet
        n0 = int(cur["n_docs"]) if cur is not None else 0
        s0 = int(cur["sum_dl"]) if cur is not None else 0
        # growth-signal baseline (r16): frozen by the batch build (or
        # at this layout's FIRST stream write for stream-created
        # layouts); legacy sidecars carry None → action "unknown"
        if cur is None:
            built = n0 + bn
        elif (
            "built_n_docs" in cur.__fields__
            and cur["built_n_docs"] is not None
        ):
            built = int(cur["built_n_docs"])
        else:
            built = None
        keys = (_seen_keys(cur) + new_keys)[-_APPLIED_KEYS_HORIZON:]
        # write-to-temp + swap, NOT overwrite-in-place: a crash mid
        # overwrite would leave stats/ empty — losing the cumulative
        # (n_docs, sum_dl) AND the replay guard, so a restart would
        # rebuild stats from only the replayed batches and silently
        # skew avgdl/idf for every later query (ADVICE r13). Same
        # atomic-as-the-store-allows contract as the postings
        # compaction.
        tmp = f"{stats_dir.rstrip('/')}__tmp{batch_id}"
        spark.createDataFrame(
            [(n0 + bn, s0 + bs, int(nb["v"]), batch_id, keys, built)],
            "n_docs long, sum_dl long, n_buckets long, "
            "last_batch_id long, applied_keys array<string>, "
            "built_n_docs long",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        if _dir_exists(spark, stats_dir):
            _swap_dirs(spark, stats_dir, tmp, batch_id)
        else:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            src_p = jvm.org.apache.hadoop.fs.Path(tmp)
            if not src_p.getFileSystem(hconf).rename(
                src_p, jvm.org.apache.hadoop.fs.Path(stats_dir)
            ):  # pragma: no cover - fs race
                raise IOError(f"merge_stats: could not move {tmp} into place")
            spark.catalog.refreshByPath(stats_dir)
        return n0 + bn, built

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import maybe_compact

        tmp = f"{post_dir.rstrip('/')}__compact{batch_id}"
        try:
            ran = maybe_compact(
                spark, post_dir, tmp, "bucket", ["term", id_col],
                max_files_per_partition=max_files_per_partition,
            )
        except ValueError:
            return  # no bucket= dirs yet (all batches empty so far)
        if ran:
            _swap_dirs(spark, post_dir, tmp, batch_id)

    marker_dir = f"{out_dir}/rebucket_pending"

    def _mark_pending(on: bool) -> None:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(marker_dir)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if on:
            fs.mkdirs(p)
        else:
            fs.delete(p, True)

    def _rewrite_postings(batch_id: int, target: int) -> None:
        """Re-hash the WHOLE postings store to ``target`` buckets
        (bucket is a pure function of term — idempotent from any
        current physical layout), temp+swap."""
        tmp = f"{post_dir.rstrip('/')}__rebuckettmp"
        (
            spark.read.parquet(post_dir)
            .drop("bucket")
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(int(target)))
            )
            .repartition("bucket")
            .sortWithinPartitions("term", id_col)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp)
        )
        _swap_dirs(spark, post_dir, tmp, batch_id)

    def do_rebucket(batch_id: int, target: int) -> None:
        """Act on the growth signal: re-size the frozen bucket count.
        Stats swap FIRST (``n_buckets`` is authoritative and
        ``built_n_docs`` re-freezes at the current size, resetting the
        signal), postings rewrite second — a crash anywhere in between
        leaves the ``rebucket_pending`` marker, and healing simply
        re-derives the postings bucketing FROM the stats sidecar
        (idempotent), so no crash point can leave probes pruning the
        wrong partitions silently."""
        _mark_pending(True)
        cur = _stats_row()
        tmp = f"{stats_dir.rstrip('/')}__rebuckettmp"
        spark.createDataFrame(
            [(int(cur["n_docs"]), int(cur["sum_dl"]), int(target),
              int(cur["last_batch_id"]), _seen_keys(cur),
              int(cur["n_docs"]))],
            "n_docs long, sum_dl long, n_buckets long, "
            "last_batch_id long, applied_keys array<string>, "
            "built_n_docs long",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        _swap_dirs(spark, stats_dir, tmp, batch_id)
        _rewrite_postings(batch_id, target)
        _mark_pending(False)
        nb["v"] = int(target)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if _dir_exists(spark, marker_dir):
            if not rebucket_on_growth:
                raise RuntimeError(
                    "text_index_stream_ingest: rebucket_pending marker "
                    f"found at {marker_dir!r} — a prior rebucket "
                    "crashed between its stats/postings swaps and "
                    "probes may prune the wrong partitions. Rerun with "
                    "rebucket_on_growth=True to heal (postings are "
                    "re-derived from the authoritative stats sidecar)."
                )
            cur0 = _stats_row()
            tgt = int(cur0["n_buckets"])
            _rewrite_postings(batch_id, tgt)
            _mark_pending(False)
            nb["v"] = tgt
        files = _batch_files(batch_df)
        cur = _stats_row()
        seen = _seen_keys(cur)
        if files:
            if not seen and cur is not None and (
                "last_batch_id" in cur.__fields__
                and cur["last_batch_id"] is not None
                and batch_id <= int(cur["last_batch_id"])
            ):
                return  # legacy layout (no keys yet): batch-id guard
            new = [f for f in files if _file_key(f) not in seen]
            if not new:
                return  # every file already committed: replay no-op
            if len(new) < len(files):
                # partial replay (checkpoint loss regrouped batches):
                # process only the files the sidecar has not committed
                batch_df = batch_df.filter(F.input_file_name().isin(new))
            new_keys = [_file_key(f) for f in new]
        else:
            # non-file source: fall back to batch-id keying
            bk = f"batch:{batch_id}"
            if bk in seen:
                return
            if not seen and cur is not None and (
                "last_batch_id" in cur.__fields__
                and cur["last_batch_id"] is not None
                and batch_id <= int(cur["last_batch_id"])
            ):
                return
            new_keys = [bk]
        src = F.lower(F.col(text_col))
        postings = (
            batch_df.select(
                F.col(id_col), tokens(src).alias("toks")
            )
            .select(
                id_col,
                F.size("toks").alias("dl"),
                F.explode("toks").alias("term"),
            )
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(nb["v"]))
            )
        )
        if _dir_exists(spark, f"{out_dir}/terms"):
            # the BATCH build caches per-term dfs in terms/; an append
            # makes that cache stale and a probe would keep scoring
            # with build-era dfs — measured silently wrong (idf
            # inflation, r16 regression test). The streaming design
            # computes df fresh from the pruned postings
            # (_indexed_term_dfs' fallback), so drop the cache BEFORE
            # the append that would invalidate it: a crash in between
            # leaves the index exact either way (the fallback returns
            # the same dfs the cache held).
            jvm = spark._jvm
            tp = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/terms")
            tp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(
                tp, True
            )
            spark.catalog.refreshByPath(f"{out_dir}/terms")
        postings.write.partitionBy("bucket").mode("append").parquet(post_dir)
        n_total, built = merge_stats(batch_df, batch_id, new_keys)
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            maintain(batch_id)
        growth = None
        if on_batch is not None or rebucket_on_growth:
            from filefilter_spark.ops.retrieval import text_index_growth

            growth = text_index_growth(n_total, built)
        rebucketed = False
        if (
            rebucket_on_growth
            and growth is not None
            and growth["action"] == "rebucket"
        ):
            import math as _math

            target = int(nb["v"]) * (
                1 << max(1, _math.ceil(_math.log2(
                    max(2.0, growth["growth_factor"])
                )))
            )
            do_rebucket(batch_id, target)
            rebucketed = True
        if on_batch is not None:
            on_batch({
                "batch_id": batch_id,
                "n_docs": n_total,
                **growth,
                "rebucketed": rebucketed,
                "n_buckets": int(nb["v"]),
            })

    # durable by default, co-located with the index (ADVICE r14): the
    # file source then tracks committed input across restarts, so a
    # crash-and-rerun resumes instead of renumbering batches from 0
    ckpt = checkpoint_dir or f"{out_dir}/_checkpoint"
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"text_index_stream_ingest: availableNow drain did not "
                f"finish within {timeout_sec}s — the index at {out_dir} "
                f"is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    if not _dir_exists(spark, post_dir):
        raise ValueError(
            "text_index_stream_ingest: the availableNow run produced no "
            "micro-batches (no matching input files?) — nothing to read"
        )
    return spark.read.parquet(post_dir)


def ann_index_stream_ingest(
    spark: SparkSession,
    path: str,
    index_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    maintain_every: int | None = None,
    max_files_per_partition: int = 16,
    checkpoint_dir: str | None = None,
    on_batch=None,
    rebuild_source: str | list[str] | None = None,
    rebuild_kwargs: dict | None = None,
) -> DataFrame:
    """Continuous maintenance of a PERSISTED :func:`ops.pq.build_ann_index`
    layout (OP-D5 × OP-A8-annindex) — the lifecycle twin of
    :func:`text_index_stream_ingest`: each micro-batch of newly arrived
    embeddings is assigned + encoded against the layout's FROZEN model
    (``ivfpq_encode_batch`` over the meta sidecar's codebooks/centroids
    — grid-exact, so a vector gets the same codes no matter which batch
    delivered it) and appended to the cell-partitioned ``codes/``
    table; ``ann_topk_indexed`` probes the growing layout unchanged.

    Correctness under streaming semantics:

    * **meta cell_counts** (the auto-refine sizing histogram) merge
      additively per batch, guarded by PER-FILE keys
      (:func:`_batch_files`): already-committed files are dropped from
      a replayed batch before encoding, so an at-least-once replay is
      a no-op even after checkpoint loss — where batch ids renumber
      from 0 AND the rerun regroups files into differently-shaped
      batches, the case a batch-level guard misidentifies (ADVICE r14;
      ``last_batch_id`` remains for legacy layouts/observability) —
      and the meta rewrite goes through a temp dir +
      atomic-as-the-store-allows swap (the merge_stats contract): a
      crash mid-update cannot lose the model.
    * **the checkpoint is durable by default** (``checkpoint_dir=None``
      → ``index_path/_checkpoint``): a crash-and-rerun resumes batch
      numbering and never redelivers committed input files. Pass an
      explicit ephemeral dir only to simulate checkpoint loss.
    * **codes** can still double-append in the crash window between a
      batch's append and its meta commit; the probe path dedupes ids
      on its PRUNED read (``ann_topk_indexed`` passes
      ``dedup_ids=True``), so results are exact regardless.
    * the model itself (codebooks/centroids) is FROZEN — growing a
      corpus far past its fit distribution is a rebuild decision, the
      same contract as the batch layout.

    ``maintain_every=N`` threshold-compacts fragmented cells in-stream
    (``ops.layout.maybe_compact`` + swap), same as every other store.
    ``on_batch`` (opt-in metrics hook, the minhash/semdedup contract)
    is called after each applied micro-batch with ``{batch_id, n_in,
    seconds}`` plus the :func:`ops.pq.ann_index_drift` staleness
    signal computed from the just-merged meta (driver-side arithmetic,
    zero extra jobs) — the operational wire for the widen-probe /
    rebuild policy: a deployment alerts on ``action != "ok"`` instead
    of learning about drift from falling recall. The merged meta also
    persists the verdict (``last_drift``/``recommended_n_probe``), so
    external probers read the widened width from the sidecar without
    recomputing (``n_probe="auto"`` already derives it live).

    **Auto-rebuild (r16 — the drift signal's ACTIVE half, VERDICT r15
    #2):** pass ``rebuild_source`` (path or list of parquet paths that
    together hold the FULL current corpus of raw vectors — the
    canonical vectors table a real deployment keeps; the frozen codes
    are lossy, so a refit cannot come from the index itself) and the
    loop acts on its own ``action == "rebuild"`` signal at the batch
    boundary where it fires: a crash-safe temp+swap
    :func:`ops.pq.build_ann_index` re-fit over the whole source,
    RE-SIZED (``n_lists = max(built, round(sqrt(n)))`` — SCALING.md's
    rebuild rule) and RE-SEEDED (``seeding="kmeanspar"`` — the
    O(log k)-pass initializer; both overridable via
    ``rebuild_kwargs``), after which the signal re-freezes at ~0 and
    probes re-prune. Every file currently in ``rebuild_source`` is
    marked applied post-rebuild, so a file the rebuild already indexed
    never double-ingests even if the stream delivers it later; the
    rebuild runs inside ``foreachBatch``, serialized with ingest.
    Without ``rebuild_source`` the signal stays alert-only.
    ``availableNow`` drains the bounded test input; an unbounded
    deployment runs the identical plan with a durable checkpoint.
    Returns the codes table at ``index_path`` after the drain.
    """
    import json as _json
    import os
    import time as _time

    from filefilter_spark.ops.pq import ivfpq_encode_batch, load_ann_meta

    meta = load_ann_meta(spark, index_path)
    codes_dir = f"{index_path}/codes"
    meta_dir = f"{index_path}/meta"

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        base = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base)
    else:
        stream = reader.parquet(path)

    def merge_meta(
        cell_adds: dict[int, int],
        batch_id: int,
        cur: dict,
        new_keys: list[str],
    ) -> dict:
        keys = list(cur.get("applied_keys") or [])
        counts = dict(cur["cell_counts"])
        for c, n in cell_adds.items():
            counts[c] = counts.get(c, 0) + n
        cur = dict(cur)
        cur["cell_counts"] = {str(c): n for c, n in counts.items()}
        built = cur.get("built_cell_counts")
        if built:
            cur["built_cell_counts"] = {
                str(c): int(n) for c, n in built.items()
            }
        cur["last_batch_id"] = batch_id
        cur["applied_keys"] = (keys + new_keys)[-_APPLIED_KEYS_HORIZON:]
        # persist the drift verdict next to the histograms it is
        # computed from (VERDICT r15 #2): external probers read the
        # recommendation from the sidecar; n_probe="auto" derives the
        # same width live either way. Driver arithmetic, zero jobs.
        from filefilter_spark.ops.pq import ann_index_drift, auto_n_probe

        probe_view = {**cur, "cell_counts": counts}
        cur["last_drift"] = ann_index_drift(probe_view)
        cur["recommended_n_probe"] = auto_n_probe(probe_view)
        out = {
            **cur,
            "cell_counts": {int(c): n for c, n in counts.items()},
            "built_cell_counts": (
                {int(c): int(n) for c, n in built.items()} if built else built
            ),
        }
        tmp = f"{meta_dir.rstrip('/')}__tmp{batch_id}"
        spark.createDataFrame(
            [(_json.dumps(cur),)], "meta string"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        _swap_dirs(spark, meta_dir, tmp, batch_id)
        return out

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import maybe_compact

        tmp = f"{codes_dir.rstrip('/')}__compact{batch_id}"
        try:
            ran = maybe_compact(
                spark, codes_dir, tmp, "cell", [id_col],
                max_files_per_partition=max_files_per_partition,
            )
        except ValueError:
            return
        if ran:
            _swap_dirs(spark, codes_dir, tmp, batch_id)

    def do_rebuild(batch_id: int, merged: dict) -> dict:
        """Act on the drift signal: temp+swap re-fit over the full
        ``rebuild_source`` corpus, RE-SIZED and RE-SEEDED per the
        SCALING.md rebuild rule, then mark every source file applied
        (the rebuild indexed them — the stream must not re-ingest
        one it later delivers) and re-freeze the signal."""
        import math as _math

        from filefilter_spark.ops.pq import build_ann_index

        srcs = (
            [rebuild_source]
            if isinstance(rebuild_source, str)
            else list(rebuild_source)
        )
        full = spark.read.parquet(*srcs)
        n_total = full.count()
        kw = dict(
            n_lists=max(
                int(merged["n_lists"]),
                int(round(_math.sqrt(max(1, n_total)))),
            ),
            m=int(merged["m"]),
            k=int(merged["k"]),
            iters=max(int(merged.get("iters", 1)), 1),
            vec_col=vec_col,
            id_col=id_col,
            scale=float(merged["scale"]),
            residual=bool(merged["residual"]),
            fit_frac=float(merged.get("fit_frac", 1.0)),
            # a rebuild must CONVERGE (the drift probe's measured
            # floor), whatever the original build economized on
            coarse_iters=max(int(merged.get("coarse_iters", 2)), 8),
            seeding="kmeanspar",
        )
        if rebuild_kwargs:
            kw.update(rebuild_kwargs)
        build_ann_index(full, index_path, **kw)
        files = sorted({
            r["f"]
            for r in full.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
            if r["f"]
        })
        keys = [_file_key(f) for f in files]
        fresh = load_ann_meta(spark, index_path)
        return merge_meta({}, batch_id, fresh, keys)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        t0 = _time.time() if on_batch is not None else 0.0
        files = _batch_files(batch_df)
        cur = load_ann_meta(spark, index_path)
        seen = list(cur.get("applied_keys") or [])
        applied = True
        new: list[str] = []
        if files:
            if not seen and batch_id <= int(cur.get("last_batch_id", -1)):
                applied = False  # legacy layout (no keys): batch-id guard
            else:
                new = [f for f in files if _file_key(f) not in seen]
                if not new:
                    applied = False  # every file committed: replay no-op
                elif len(new) < len(files):
                    # partial replay (checkpoint loss regrouped
                    # batches): encode only the uncommitted files
                    batch_df = batch_df.filter(
                        F.input_file_name().isin(new)
                    )
            new_keys = [_file_key(f) for f in new]
        else:
            bk = f"batch:{batch_id}"
            if bk in seen or (
                not seen and batch_id <= int(cur.get("last_batch_id", -1))
            ):
                applied = False
            new_keys = [bk]
        merged = None
        if applied:
            enc = ivfpq_encode_batch(
                batch_df,
                meta["codebooks"],
                meta["centroids"],
                vec_col=vec_col,
                id_col=id_col,
                scale=meta["scale"],
                residual=meta["residual"],
            )
            # cell histogram BEFORE the append (n_lists-bounded collect)
            adds = {
                int(r["cell"]): int(r["n"])
                for r in enc.groupBy("cell").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            if not adds:
                return  # empty batch: nothing to append or merge
            enc.write.partitionBy("cell").mode("append").parquet(codes_dir)
            merged = merge_meta(adds, batch_id, cur, new_keys)
            if maintain_every and (batch_id + 1) % maintain_every == 0:
                maintain(batch_id)
        rebuilt = False
        if (
            merged is not None
            and rebuild_source is not None
            and merged["last_drift"]["action"] == "rebuild"
        ):
            merged = do_rebuild(batch_id, merged)
            rebuilt = True
        if on_batch is not None:
            from filefilter_spark.ops.pq import ann_index_drift

            on_batch({
                "batch_id": batch_id,
                "n_in": sum(adds.values()) if merged is not None else 0,
                "applied": merged is not None,
                "rebuilt": rebuilt,
                "n_lists": int(
                    (merged if merged is not None else cur).get(
                        "n_lists", 0
                    )
                ),
                "seconds": _time.time() - t0,
                **ann_index_drift(merged if merged is not None else cur),
            })

    # durable by default, co-located with the index (ADVICE r14): see
    # text_index_stream_ingest — committed input never redelivers
    ckpt = checkpoint_dir or f"{index_path}/_checkpoint"
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"ann_index_stream_ingest: availableNow drain did not "
                f"finish within {timeout_sec}s — the index at "
                f"{index_path} is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.read.parquet(codes_dir)


# Fuzzy-index staleness thresholds, calibrated by
# tools/fuzzy_drift_probe.py (SCALING.md "Fuzzy staleness signal",
# r16): unseen_gram_frac is the fraction of a batch's PREFIX entries
# ordered by the unseen-at-build sentinel. Exactness never depends on
# it; what degrades is prefix SELECTIVITY — unseen grams carry no
# rarity information, so drifted batches collide on now-common new
# grams and the candidate count per row blows up. On the measured
# curve (zipf new-vocabulary drift): candidates/row holds near the
# fresh-build baseline through ~0.2, roughly doubles by ~0.5, and
# runs multiples of baseline at ≥0.8 — while a REBUILD at the same
# drift restores the baseline (the frozen order re-learns the new
# vocabulary's rarities).
FUZZY_UNSEEN_WARN = 0.30
FUZZY_UNSEEN_REBUILD = 0.60


def fuzzy_index_staleness(unseen_gram_frac: float | None) -> str:
    """The fuzzy lifecycle's action rule (the ANN ``ann_index_drift``
    twin, VERDICT r15 #3): ``"ok"`` below ``FUZZY_UNSEEN_WARN``,
    ``"selectivity_degraded"`` past it (expect growing per-batch
    candidate cost; plan a rebuild), ``"rebuild"`` at
    ``FUZZY_UNSEEN_REBUILD`` (the frozen rarity order is mostly blind
    to the batch's vocabulary — rebuild restores selectivity; results
    stay EXACT either way). ``None`` (signal not computed) maps to
    ``"unknown"``."""
    if unseen_gram_frac is None:
        return "unknown"
    if unseen_gram_frac >= FUZZY_UNSEEN_REBUILD:
        return "rebuild"
    if unseen_gram_frac >= FUZZY_UNSEEN_WARN:
        return "selectivity_degraded"
    return "ok"


def fuzzy_index_stream_ingest(
    spark: SparkSession,
    path: str,
    index_path: str,
    id_col: str = "doc_id",
    str_col: str = "s",
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
    maintain_every: int | None = None,
    max_files_per_partition: int = 16,
    checkpoint_dir: str | None = None,
    on_batch=None,
    rebuild_on_drift: bool = False,
) -> DataFrame:
    """Continuous fuzzy-join maintenance over a persisted
    :func:`ops.dedup.build_fuzzy_index` layout (OP-D5 × OP-D2-fuzzy) —
    the last batch-tier dedup to get a streaming mirror (VERDICT r14
    #4). Each micro-batch of newly arrived strings is prefix-indexed
    under the layout's FROZEN gram order and joined against the store:
    candidate pairs are (new × corpus-so-far) ∪ (new × new) — history
    is never re-paired against itself — verified with the thresholded
    ``levenshtein(l, r, d)``, and the EXACT new pairs append to
    ``pairs/``; the batch's prefix entries, strings, and short subset
    append to their stores. After any drain, ``pairs/`` equals
    ``edit_distance_pairs`` over the union corpus EXACTLY:

    * the frozen total order keeps prefix filtering LOSSLESS (any
      fixed order shared by both sides satisfies the prefix-filter
      theorem; build-time rarity only buys selectivity, and grams
      unseen at build sort after all frozen ones via the
      ``FUZZY_UNSEEN_GDF`` sentinel — deterministic, still total);
    * every pair has a later-arriving side, and that side's batch
      generates it: new-vs-store collisions ride a broadcast join of
      the batch's prefix against the bucketed postings (DPP-prunable
      on ``bucket``), new-vs-new reuses the batch op's self-group, and
      the short block length-bands the batch's short strings against
      the (tiny) short store in both length directions;
    * the verify is exact, so losing NO candidates means the pair set
      is the batch op's, bit for bit.

    Replay contract matches the text/ANN loops: durable default
    checkpoint under ``index_path``, per-FILE key guard in the stats
    sidecar (already-committed files drop out of a replayed batch
    before anything is computed), and the only crash window —
    between a batch's appends and its stats commit — can at worst
    double-append rows whose duplicates the read path drops
    (the returned pairs frame dedups (id_a, id_b)).

    Scale shape per batch: tagging is batch-sized; the gramdf join
    and the postings probe broadcast the BATCH side (candidate cost
    bounded by the batch's prefix entries × matching postings, the
    Ed-Join bound); strings come back only for surviving candidates
    (id join against the sbucket-partitioned strings store). The
    growth curve is measured by ``tools/index_lifecycle_probe.py``.
    ``on_batch`` (opt-in metrics hook) receives {batch_id, n_in,
    n_new_pairs, n_candidates, n_buckets_probed, applied,
    unseen_gram_frac, action, seconds} — ``unseen_gram_frac`` is this index's staleness signal
    (the ANN drift twin): the fraction of the batch's prefix entries
    ordered by the unseen-at-build sentinel. Exactness never depends
    on it, but a rising fraction means the frozen rarity order has
    lost selectivity — ``n_candidates`` (the per-batch cost the signal
    predicts) blows up, and ``action`` applies the measured thresholds
    (:func:`fuzzy_index_staleness`: ok → selectivity_degraded →
    rebuild; calibrated by ``tools/fuzzy_drift_probe.py``). Rebuild to
    restore selectivity.

    ``rebuild_on_drift=True`` makes the loop ACT on its own rebuild
    action (r16 — the ANN/SemDeDup self-acting twin): at the
    triggering batch's boundary it re-derives the two ORDER-DEPENDENT
    dirs — ``gramdf`` (the frozen rarity order, which absorbs the
    accumulated new vocabulary) and ``postings`` (every string's
    rarest-prefix entries under the new order) — from the strings
    store via :func:`ops.dedup.write_fuzzy_gram_layout`, temp+swap.
    ``strings``/``short``/``pairs`` are order-INDEPENDENT and carry
    over untouched (the pairs store stays the exact union-corpus pair
    set — a rebuild changes candidate GENERATION cost, never results),
    as do ``stats``/``applied_keys``. The two swaps are not jointly
    atomic and a mixed order would be SILENTLY lossy, so they are
    fenced by a ``rebuild_pending`` marker: a crash between them
    forces a (cheap, idempotent) re-derivation before the next batch;
    if the marker is found with ``rebuild_on_drift=False`` the loop
    refuses loudly rather than run on a possibly-mixed layout. Stats
    gain ``rebuilt``. Returns the deduped pairs table.
    """
    import os
    import time as _time

    from filefilter_spark.ops.dedup import (
        FUZZY_UNSEEN_GDF,
        _fuzzy_tagged,
        _reduced_prefix_expr,
    )

    stats_dir = f"{index_path}/stats"
    post_dir = f"{index_path}/postings"
    strings_dir = f"{index_path}/strings"
    short_dir = f"{index_path}/short"
    pairs_dir = f"{index_path}/pairs"

    srow = spark.read.parquet(stats_dir).first()
    if srow is None:
        raise ValueError(
            f"fuzzy_index_stream_ingest: empty stats at {index_path!r}"
        )
    q = int(srow["q"])
    d = int(srow["max_dist"])
    n_buckets = int(srow["n_buckets"])
    T = q * (d + 1)

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger))
        )
    if path.endswith(".parquet") and not _is_directory(spark, path):
        base_dir = os.path.dirname(path) or "."
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(base_dir)
    else:
        stream = reader.parquet(path)

    def commit_stats(cur, batch_id: int, new_keys: list[str],
                     n_added: int) -> None:
        keys = (list(cur["applied_keys"] or []) + new_keys)[
            -_APPLIED_KEYS_HORIZON:
        ]
        tmp = f"{stats_dir.rstrip('/')}__tmp{batch_id}"
        spark.createDataFrame(
            [(q, d, n_buckets, int(cur["n_strings"]) + n_added, keys)],
            "q long, max_dist long, n_buckets long, n_strings long, "
            "applied_keys array<string>",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        _swap_dirs(spark, stats_dir, tmp, batch_id)

    def maintain(batch_id: int) -> None:
        from filefilter_spark.ops.layout import maybe_compact

        for dpath, pcol, sort_cols in (
            (post_dir, "bucket", ["g", "occ", "id"]),
            (strings_dir, "sbucket", ["id"]),
        ):
            tmp = f"{dpath.rstrip('/')}__compact{batch_id}"
            try:
                ran = maybe_compact(
                    spark, dpath, tmp, pcol, sort_cols,
                    max_files_per_partition=max_files_per_partition,
                )
            except ValueError:
                continue
            if ran:
                _swap_dirs(spark, dpath, tmp, batch_id)

    pending_path = f"{index_path}/rebuild_pending"

    def _mark_pending(on: bool) -> None:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(pending_path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if on:
            fs.mkdirs(p)
        else:
            fs.delete(p, True)

    def do_rebuild(batch_id: int) -> None:
        """Act on the staleness signal: re-derive gramdf (frozen
        rarity, now absorbing the accumulated vocabulary) + postings
        (prefixes under the new order) from the strings store,
        temp+swap each, fenced by the ``rebuild_pending`` marker (the
        two swaps are not jointly atomic and a mixed order is
        SILENTLY lossy — the marker forces an idempotent re-derivation
        if a crash lands between them). strings/short/pairs/stats are
        order-independent and untouched."""
        from filefilter_spark.ops.dedup import write_fuzzy_gram_layout

        sall = spark.read.parquet(strings_dir).select("id", "s")
        # fixed tmp names: a crashed attempt's leftovers are simply
        # overwritten by the healing re-derivation
        tmp_g = f"{index_path}/gramdf__rebuildtmp"
        tmp_p = f"{post_dir.rstrip('/')}__rebuildtmp"
        write_fuzzy_gram_layout(sall, tmp_g, tmp_p, q, d, n_buckets)
        _mark_pending(True)
        _swap_dirs(spark, f"{index_path}/gramdf", tmp_g, batch_id)
        _swap_dirs(spark, post_dir, tmp_p, batch_id)
        _mark_pending(False)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        t0 = _time.time() if on_batch is not None else 0.0
        unseen_frac = None
        rebuilt = False
        if _dir_exists(spark, pending_path):
            if not rebuild_on_drift:
                raise RuntimeError(
                    "fuzzy_index_stream_ingest: rebuild_pending marker "
                    f"found at {pending_path!r} — a prior rebuild "
                    "crashed between its gramdf/postings swaps and the "
                    "layout may mix two gram orders (silently lossy). "
                    "Rerun with rebuild_on_drift=True to heal, or "
                    "re-run build_fuzzy_index offline."
                )
            do_rebuild(batch_id)  # crashed mid-swap: re-derive first
            rebuilt = True
        files = _batch_files(batch_df)
        cur = spark.read.parquet(stats_dir).first()
        seen = list(cur["applied_keys"] or [])
        applied = True
        new_files: list[str] = []
        if files:
            new_files = [f for f in files if _file_key(f) not in seen]
            if not new_files:
                applied = False
            elif len(new_files) < len(files):
                batch_df = batch_df.filter(
                    F.input_file_name().isin(new_files)
                )
            new_keys = [_file_key(f) for f in new_files]
        else:
            bk = f"batch:{batch_id}"
            if bk in seen:
                applied = False
            new_keys = [bk]
        n_in = 0
        n_new_pairs = 0
        n_cands = 0
        n_bkts_probed = 0
        if applied:
            from pyspark.storagelevel import StorageLevel

            base_b = batch_df.select(
                F.col(id_col).alias("id"), F.col(str_col).alias("s")
            ).filter(F.col("s").isNotNull()).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            try:
                n_in = base_b.count()
                if n_in == 0:
                    commit_stats(cur, batch_id, new_keys, 0)
                else:
                    gramdf = spark.read.parquet(f"{index_path}/gramdf")
                    tagged_b = _fuzzy_tagged(base_b, q)
                    prefix_b = (
                        tagged_b.join(
                            gramdf.select("g", "occ", "gdf"),
                            [F.expr("t.g = g"), F.expr("t.occ = occ")],
                            "left",
                        )
                        .groupBy("doc")
                        .agg(F.collect_list(F.struct(
                            F.coalesce(
                                F.col("gdf"), F.lit(FUZZY_UNSEEN_GDF)
                            ).alias("gdf"),
                            F.col("t.g").alias("g"),
                            F.col("t.occ").alias("occ"),
                            F.col("t.pos").alias("pos"),
                        )).alias("gl"))
                        .select(
                            "doc",
                            # location-reduced prefix (r17) — same
                            # lossless cut as the batch op; the frozen
                            # order (unseen grams on the sentinel) stays
                            # the sort key, so build- and probe-side
                            # prefixes share one total order
                            F.explode(F.expr(
                                _reduced_prefix_expr("gl", q, d)
                            )).alias("t"),
                        )
                        .select(
                            F.col("t.g").alias("g"),
                            F.col("t.occ").alias("occ"),
                            F.col("t.gdf").alias("gdf"),
                            F.col("doc.id").alias("id"),
                            F.col("doc.l").alias("l"),
                        )
                        .withColumn("bucket", F.pmod(
                            F.xxhash64("g", "occ"), F.lit(n_buckets)
                        ))
                        .persist(StorageLevel.MEMORY_AND_DISK)
                    )
                    prefix_full = prefix_b  # persisted handle (w/ gdf)
                    if on_batch is not None or rebuild_on_drift:
                        # the fuzzy index's staleness signal (the ANN
                        # drift twin): fraction of the batch's PREFIX
                        # entries carrying the unseen-at-build sentinel
                        # order key. Unseen grams stay LOSSLESS (the
                        # frozen order is still total) but sort last,
                        # i.e. the prefixes lose their rarity
                        # selectivity — a rising fraction means more
                        # candidates per batch; rebuild to restore it.
                        row = prefix_b.agg(
                            F.avg(
                                (F.col("gdf") == F.lit(FUZZY_UNSEEN_GDF))
                                .cast("double")
                            ).alias("f")
                        ).first()
                        unseen_frac = (
                            round(float(row["f"]), 6)
                            if row["f"] is not None else 0.0
                        )
                    prefix_b = prefix_b.drop("gdf")
                    # explicit bucket-set partition filter on the
                    # postings read (r16, VERDICT r15 #5): the batch's
                    # distinct buckets are a <= n_buckets collect over
                    # the persisted prefix frame; when the batch
                    # touches FEWER buckets than the store has (small
                    # or vocabulary-narrow batches), the literal IN
                    # filter statically prunes the postings partitions
                    # instead of relying on DPP firing across the
                    # broadcast join. Measured (SCALING.md "fuzzy
                    # postings-scan term"): a default-shaped batch
                    # covers every bucket, so this prunes nothing
                    # there — the lever that moves the O(store) term
                    # is batch size — but it makes the narrow-batch
                    # case (the streaming steady state at higher
                    # n_buckets) a partition-pruned read for free.
                    # r17: the collect itself is one job per batch, so
                    # it only runs when the batch CAN be narrow — with
                    # E = n_in * (q*d+1) hashed prefix entries, a batch
                    # with E >= 8 * n_buckets covers every bucket with
                    # near-certainty (coupon collector needs ~ln(n)+4
                    # draws per bucket), so a default-shaped batch
                    # skips straight to the full postings read.
                    store_post = spark.read.parquet(post_dir)
                    n_bkts_probed = n_buckets
                    if n_in * (q * d + 1) < 8 * n_buckets:
                        bkts = sorted(
                            r["bucket"]
                            for r in prefix_b.select(
                                "bucket"
                            ).distinct().collect()
                        )
                        n_bkts_probed = len(bkts)
                        if len(bkts) < n_buckets:
                            store_post = store_post.filter(
                                F.col("bucket").isin(bkts)
                            )
                    cross = (
                        F.broadcast(
                            prefix_b.select(
                                "bucket", "g", "occ",
                                F.col("id").alias("id_n"),
                                F.col("l").alias("l_n"),
                            )
                        )
                        .join(store_post, ["bucket", "g", "occ"])
                        .filter(
                            (F.col("id") != F.col("id_n"))
                            & (F.abs(F.col("l") - F.col("l_n")) <= d)
                            & (F.greatest(F.col("l"), F.col("l_n")) >= T)
                        )
                        .select(
                            F.least("id", "id_n").alias("id_a"),
                            F.greatest("id", "id_n").alias("id_b"),
                        )
                    )
                    within = (
                        prefix_b.groupBy("g", "occ")
                        .agg(F.collect_list(
                            F.struct("id", "l")
                        ).alias("ds"))
                        .filter(F.size("ds") >= 2)
                        .select(F.explode("ds").alias("a"), "ds")
                        .select("a", F.explode("ds").alias("b"))
                        .filter(
                            F.expr("a.id < b.id")
                            & (F.abs(F.expr("a.l - b.l")) <= d)
                            & (F.greatest(
                                F.expr("a.l"), F.expr("b.l")) >= T)
                        )
                        .select(
                            F.expr("a.id").alias("id_a"),
                            F.expr("b.id").alias("id_b"),
                        )
                    )
                    short_b = base_b.select(
                        "id", "s", F.length("s").alias("l")
                    ).filter(F.col("l") < T)
                    short_store = spark.read.parquet(short_dir)
                    all_short = short_store.unionByName(short_b)
                    # both length directions, disjoint by the strict
                    # (len, id) canonicalization (module docstring of
                    # edit_distance_pairs): batch→all covers
                    # l_b <= l_other, all→batch covers l_other < l_b
                    def banded(lhs, rhs):
                        L = lhs.select(
                            F.col("id").alias("id_l"),
                            F.col("l").alias("l_l"),
                            F.explode(F.sequence(
                                F.col("l"), F.col("l") + F.lit(d)
                            )).alias("bkt"),
                        )
                        R = rhs.select(
                            F.col("id").alias("id_r"),
                            F.col("l").alias("l_r"),
                            F.col("l").alias("bkt"),
                        )
                        return (
                            L.join(R, "bkt")
                            .filter(
                                (F.col("l_l") < F.col("l_r"))
                                | ((F.col("l_l") == F.col("l_r"))
                                   & (F.col("id_l") < F.col("id_r")))
                            )
                            .select(
                                F.least("id_l", "id_r").alias("id_a"),
                                F.greatest("id_l", "id_r").alias("id_b"),
                            )
                        )
                    short_pairs = banded(short_b, all_short).unionByName(
                        banded(short_store, short_b)
                    )
                    # candidate dedup moved AFTER the verify (r17 —
                    # the same change the r16 batch op made, same
                    # proof: dist is a pure function of the pair, so
                    # multi-gram collisions are exact row duplicates
                    # and the pre-verify distinct pushed the whole
                    # candidate set through an exchange for a handful
                    # of survivors; the re-verified duplicates are
                    # early-exit thresholded levenshteins). The three
                    # blocks are pairwise disjoint by construction
                    # (cross: one side stored; within: both new;
                    # short: both below T with strict (len, id)
                    # canonicalization), so dedup only collapses
                    # same-block multi-gram collisions.
                    cands = (
                        cross.unionByName(within)
                        .unionByName(short_pairs)
                    )
                    if on_batch is not None:
                        # candidate-ROW cost per batch — what the
                        # staleness signal predicts (raw collision
                        # rows since r17; the verify tier reuses this
                        # persisted frame)
                        cands = cands.persist(
                            StorageLevel.MEMORY_AND_DISK
                        )
                        n_cands = cands.count()
                    strings_all = (
                        spark.read.parquet(strings_dir)
                        .select("id", "s")
                        .unionByName(base_b.select("id", "s"))
                    )
                    verified = (
                        cands.join(
                            strings_all.select(
                                F.col("id").alias("id_a"),
                                F.col("s").alias("s_a"),
                            ),
                            "id_a",
                        )
                        .join(
                            strings_all.select(
                                F.col("id").alias("id_b"),
                                F.col("s").alias("s_b"),
                            ),
                            "id_b",
                        )
                        .withColumn(
                            "dist", F.levenshtein("s_a", "s_b", d)
                        )
                        .filter(F.col("dist") >= 0)
                        .select(
                            F.col("id_a").cast("long"),
                            F.col("id_b").cast("long"),
                            F.col("dist").cast("int").alias("dist"),
                        )
                        # survivor-count dedup (see the candidate
                        # comment above)
                        .distinct()
                    )
                    if on_batch is not None:
                        verified = verified.persist(
                            StorageLevel.MEMORY_AND_DISK
                        )
                        n_new_pairs = verified.count()

                    # The four store appends are independent of one
                    # another (their input frames are persisted or
                    # snapshot-listed at batch start, and the crash
                    # contract only requires ALL of them to precede
                    # the stats commit) — overlap them so each
                    # append's task tail back-fills with the next
                    # append's work (guide §2.6).
                    from concurrent.futures import ThreadPoolExecutor

                    def _w_pairs() -> None:
                        verified.write.mode("append").parquet(pairs_dir)

                    def _w_postings() -> None:
                        prefix_b.repartition("bucket").write.partitionBy(
                            "bucket"
                        ).mode("append").parquet(post_dir)

                    def _w_strings() -> None:
                        base_b.select(
                            "id", "s", F.length("s").alias("l")
                        ).withColumn(
                            "sbucket",
                            F.pmod(F.xxhash64("id"), F.lit(n_buckets)),
                        ).repartition("sbucket").write.partitionBy(
                            "sbucket"
                        ).mode("append").parquet(strings_dir)

                    def _w_short() -> None:
                        short_b.write.mode("append").parquet(short_dir)

                    with ThreadPoolExecutor(max_workers=3) as pool:
                        for fut in [pool.submit(w) for w in
                                    (_w_pairs, _w_postings,
                                     _w_strings, _w_short)]:
                            fut.result()
                    commit_stats(cur, batch_id, new_keys, n_in)
                    if on_batch is not None:
                        verified.unpersist()
                        cands.unpersist()
                    prefix_full.unpersist()
                    if maintain_every and (
                        batch_id + 1
                    ) % maintain_every == 0:
                        maintain(batch_id)
                    if (
                        rebuild_on_drift
                        and fuzzy_index_staleness(unseen_frac)
                        == "rebuild"
                    ):
                        # the batch's own entries were appended under
                        # the stale order; the re-derivation replaces
                        # the WHOLE postings store, this batch included
                        do_rebuild(batch_id)
                        rebuilt = True
            finally:
                base_b.unpersist()
        if on_batch is not None:
            on_batch({
                "batch_id": batch_id,
                "n_in": n_in,
                "n_new_pairs": n_new_pairs,
                "n_candidates": n_cands,
                "n_buckets_probed": n_bkts_probed,
                "applied": applied,
                "unseen_gram_frac": unseen_frac,
                "action": fuzzy_index_staleness(unseen_frac),
                "rebuilt": rebuilt,
                "seconds": _time.time() - t0,
            })

    ckpt = checkpoint_dir or f"{index_path}/_checkpoint"
    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_sec):  # pragma: no cover
            raise TimeoutError(
                f"fuzzy_index_stream_ingest: availableNow drain did not "
                f"finish within {timeout_sec}s — the index at "
                f"{index_path} is PARTIAL; raise timeout_sec and rerun"
            )
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.read.parquet(pairs_dir).dropDuplicates(["id_a", "id_b"])
