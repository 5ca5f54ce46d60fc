"""Sources and sinks — OP-A1..A4, OP-A9.

Reference loads one input file into DuckDB (``Database.py:64-92``: csv
branch 77-78, parquet 79-80, s3 72-75) and exports the final stage with
``COPY ... TO ... (FORMAT CSV, DELIMITER ...)`` (``filefilter.py:374-379``).

Spark-first: ``spark.read`` with format dispatch on extension; the
``sampleLines`` dev cap (OP-A4, ``filefilter.py:283-284``) becomes
``df.limit(n)`` which Catalyst pushes into the scan (GlobalLimit over
the file source — only the needed splits are read).

Scale notes: CSV schema inference reads the file once extra — callers
on 100 TB inputs should pass an explicit ``schema``; parquet needs no
inference. S3 paths map to ``s3a://`` (hadoop-aws connector; credential
chain is the standard AWS provider chain, same idea as DuckDB httpfs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TEXT_EXTS = {".csv", ".tsv", ".txt"}
_JSON_EXTS = {".json", ".jsonl", ".ndjson"}
# Compression suffixes are transparent: Spark's text-based sources
# (csv/json) decompress by codec extension automatically, so dispatch
# looks through them to the inner extension. Note gzip/bzip2 text files
# are NOT splittable — one task per file regardless of size; at scale
# prefer many modest files (or zstd/parquet) over one huge .gz.
_COMPRESSION_EXTS = {".gz", ".bz2", ".zst", ".zstd", ".deflate"}


_SCRATCH_ROOTS: dict[str, str] = {}


def scratch_root(prefix: str) -> str:
    """One lazily-created temp root per prefix, removed at interpreter
    exit — the shared cleanup policy for sink outputs that must outlive
    the lazy DataFrames reading them (callers: sink round-trip queries,
    the foreachBatch runner). Per-call uniqueness, when needed, is the
    caller's job via a subpath."""
    root = _SCRATCH_ROOTS.get(prefix)
    if root is None:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH_ROOTS[prefix] = root
    return root


def _normalize_path(path: str) -> str:
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def _fetch_s3_to_local(path: str) -> str:
    """Driver-side boto3 fallback for ``s3://`` inputs when the s3a
    connector jars are absent: download the object — or every object
    under the prefix — into a local scratch dir and return the local
    path (named after the last path segment, so extension dispatch in
    :func:`read_input` still works on it).

    Deliberately a CONVENIENCE tier: the bytes flow through the driver,
    so it is right for the CLI's modest inputs and wrong for cluster
    reads — a deployment reading TBs installs hadoop-aws (see
    ``session.require_s3a``) and Spark's executors then pull their own
    splits. Credentials/endpoint come from the standard boto3 chain
    (env vars, profile, IMDS; ``AWS_ENDPOINT_URL`` honored) — the same
    sources ``session.s3_conf`` maps into s3a, so the two paths share
    one credential story.
    """
    import uuid
    from pathlib import Path as _P
    from urllib.parse import urlparse

    try:
        import boto3
        from botocore.exceptions import ClientError
    except ImportError as e:  # pragma: no cover - boto3 is an extra
        raise RuntimeError(
            f"cannot read {path!r}: neither the s3a connector jars nor "
            "boto3 are available — install hadoop-aws for cluster reads "
            "or boto3 for the driver-side fallback"
        ) from e

    import os

    u = urlparse(path if path.startswith("s3://") else "s3://" + path.split("://", 1)[1])
    bucket, key = u.netloc, u.path.lstrip("/")
    dest_root = _P(scratch_root("ffspark_s3_")) / uuid.uuid4().hex[:8]
    dest = dest_root / (_P(key.rstrip("/")).name or bucket)
    s3 = boto3.client("s3")
    # Driver-disk guard: this tier funnels every byte through the
    # driver's scratch dir, so a multi-TB dataset pointed here (where
    # the jarful path would stream splits to executors) must fail fast
    # with the real remedy, not silently fill the local disk.
    max_bytes = int(
        os.environ.get("FFSPARK_S3_FETCH_MAX_BYTES", str(32 << 30))
    )

    def _check_size(total: int) -> None:
        if total > max_bytes:
            raise ValueError(
                f"{path!r} is {total / (1 << 30):.1f} GiB — beyond the "
                f"{max_bytes / (1 << 30):.1f} GiB driver-side fetch cap. "
                "This jarless fallback downloads through the driver; for "
                "inputs this size install hadoop-aws so executors read "
                "s3a:// splits directly, or raise "
                "FFSPARK_S3_FETCH_MAX_BYTES explicitly."
            )

    try:
        head = s3.head_object(Bucket=bucket, Key=key)
        _check_size(int(head.get("ContentLength", 0)))
        dest.parent.mkdir(parents=True, exist_ok=True)
        s3.download_file(bucket, key, str(dest))
        return str(dest)
    except ClientError as e:
        # Only a definite "no such object" means "try the prefix
        # instead". Anything else (AccessDenied, throttling, a
        # mid-download failure) must surface as itself — falling
        # through would misreport it as FileNotFoundError and mask the
        # actual cause. head_object reports a missing key as plain 404.
        code = str(
            (getattr(e, "response", None) or {}).get("Error", {}).get("Code", "")
        )
        if code not in ("404", "NoSuchKey", "NotFound"):
            raise
    prefix = key.rstrip("/") + "/" if key else ""
    # Stream the listing page-by-page, accumulating sizes as we go: a
    # prefix with millions of keys must trip the size cap after the
    # first over-cap page, not after the driver has materialized the
    # whole listing in memory.
    objs = []
    total_size = 0
    for page in s3.get_paginator("list_objects_v2").paginate(
        Bucket=bucket, Prefix=prefix
    ):
        for obj in page.get("Contents", []):
            # skip the zero-byte "directory marker" object
            if not obj["Key"][len(prefix):]:
                continue
            objs.append(obj)
            total_size += int(obj.get("Size", 0))
        _check_size(total_size)
    found = False
    for obj in objs:
        rel = obj["Key"][len(prefix):]
        target = dest / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        s3.download_file(bucket, obj["Key"], str(target))
        found = True
    if not found:
        raise FileNotFoundError(f"no S3 object or prefix at {path!r}")
    return str(dest)


def _apply_schema_select(df: DataFrame, schema: StructType | str) -> DataFrame:
    """Apply an explicit schema to a self-describing source via
    ``select`` + ``cast`` — NOT ``reader.schema()``.

    Spark's vectorized parquet/ORC readers do not cast mismatched
    physical types: reading a bigint column with a declared ``int``
    schema fails at execution (FAILED_READ_FILE.PARQUET_COLUMN_DATA_
    TYPE_MISMATCH), and the failure is invisible until an action runs.
    Casting after the read is always safe, and column pruning still
    reaches the scan because Catalyst prunes through the projection
    (the ReadSchema in the plan lists only the selected columns).
    Columns requested but absent from the file come back as typed
    nulls — the mergeSchema-style semantics a schema-evolution caller
    expects.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    if isinstance(schema, str):
        schema = _parse_datatype_string(schema)
    # Fold names with the SESSION's case sensitivity: under an explicit
    # caseSensitive=true session a case-mismatched name must be treated
    # as absent (typed null) — the lowercased membership test alone
    # would emit F.col() for it and fail analysis later.
    cs = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )
    fold = (lambda c: c) if cs else str.lower
    have = {fold(f) for f in df.columns}
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if fold(f.name) in have
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def read_input(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    sample_lines: int = 0,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Load an input file, dispatching on extension (``Database.py:77-80``).

    Unlike the reference (which crashes when ``inDelimiter`` is absent —
    quirk 2 in SURVEY.md §2.A) the delimiter is optional: ``.tsv``
    defaults to tab, everything else to comma (the reference's orphan
    loader auto-sniffed; explicit-default is deterministic at scale).
    """
    from filefilter_spark.config import normalize_delimiter

    p = _normalize_path(path)
    if p.startswith("s3a://"):
        from filefilter_spark.session import s3a_available

        # Two-tier S3 (status re-checked 2026-08-14, round 7): with the
        # hadoop-aws jars on the classpath, executors read s3a://
        # splits directly (the cluster path — still untestable in this
        # jarless sandbox beyond the fail-fast probe; its conf surface
        # IS contract-tested: session.s3_conf_from_env pins the
        # boto3-env-chain → fs.s3a.* mapping, so a deployment's first
        # validation is only the jar itself). Without them, fall back
        # to a driver-side boto3
        # fetch into local scratch — a REAL, moto-tested S3 ingestion
        # path (protocol, credentials, object/prefix handling), sized
        # for CLI inputs, not cluster reads (_fetch_s3_to_local).
        if not s3a_available(spark):
            p = _fetch_s3_to_local(path)
    name = Path(p).name.lower()
    ext = Path(name).suffix
    if ext in _COMPRESSION_EXTS:
        ext = Path(Path(name).stem).suffix
    if ext == ".parquet":
        # Self-describing format: an explicit schema still applies —
        # via select+cast after the read (see _apply_schema_select for
        # why reader.schema() would crash on mismatched types).
        df = spark.read.parquet(p)
        if schema is not None:
            df = _apply_schema_select(df, schema)
    elif ext == ".orc":
        df = spark.read.orc(p)
        if schema is not None:
            df = _apply_schema_select(df, schema)
    elif ext in _JSON_EXTS:
        # JSON Lines (one object per line — the splittable layout;
        # multiline JSON arrays are NOT splittable and are rejected by
        # default). Beyond the reference's surface (Database.py:77-80
        # handles csv/parquet only) but table stakes for LLM-corpus
        # inputs, which ship overwhelmingly as .jsonl.
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.json(p)
    elif ext in _TEXT_EXTS:
        delimiter = normalize_delimiter(delimiter)
        sep = delimiter if delimiter is not None else ("\t" if ext == ".tsv" else ",")
        reader = spark.read.options(header=True, sep=sep)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        df = reader.csv(p)
    else:
        raise ValueError(f"unsupported input extension {ext!r} for {path!r}")
    if sample_lines and sample_lines > 0:
        df = df.limit(sample_lines)  # OP-A4 dev cap, pushed into the scan
    return df


def write_csv(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    single_file: bool = False,
    compression: str | None = None,
) -> None:
    """CSV sink (OP-A9; reference ``filefilter.py:374-379``).

    ``single_file=True`` coalesces to 1 partition for byte-parity with
    the reference's single-file ``COPY`` — only for small outputs; at
    scale leave it off and let each task write its own part file.
    ``compression`` ("gzip", "bzip2", "zstd", ...) trades CPU for
    storage/network; remember gzip parts are not splittable on re-read.
    """
    out = df.coalesce(1) if single_file else df
    w = (
        out.write.mode("overwrite")
        .option("header", True)
        .option("sep", delimiter)
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(_normalize_path(path))


def write_csv_file(df: DataFrame, path: str, delimiter: str = ",") -> None:
    """Write ONE local CSV file at ``path`` — byte-parity with the
    reference's single-file ``COPY ... TO`` sink (``filefilter.py:374-379``).

    Spark's csv writer emits a directory of part files; this coalesces
    to one part and renames it to the target. Local-filesystem CLI
    convenience only — at scale use :func:`write_csv` and let every
    task write its own part. An ``s3://`` target takes the same
    driver-side boto3 tier as the read side when the s3a jars are
    absent: write locally, upload the one file.
    """
    import shutil
    import tempfile
    from pathlib import Path as _P

    tmp = tempfile.mkdtemp(prefix="ffspark_csv_")
    try:
        out_dir = str(_P(tmp) / "out")
        write_csv(df, out_dir, delimiter=delimiter, single_file=True)
        parts = sorted(_P(out_dir).glob("part-*.csv"))
        if not parts:
            raise RuntimeError(
                f"csv write produced no part file under {out_dir} "
                "(empty input with a writer that skips empty parts?)"
            )
        if path.startswith(("s3://", "s3a://")):
            from filefilter_spark.session import s3a_available

            if s3a_available(df.sparkSession):  # pragma: no cover - jars
                raise ValueError(
                    "with the s3a connector present, write to s3a:// via "
                    "write_csv (distributed parts), not the single-file sink"
                )
            from urllib.parse import urlparse

            import boto3

            u = urlparse("s3://" + path.split("://", 1)[1])
            boto3.client("s3").upload_file(
                str(parts[0]), u.netloc, u.path.lstrip("/")
            )
        else:
            _P(path).parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(parts[0]), path)
    finally:
        # failed writes must not accumulate ffspark_csv_* scratch dirs
        shutil.rmtree(tmp, ignore_errors=True)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(_normalize_path(path))


def compact_parquet(
    df: DataFrame,
    path: str,
    rows_per_file: int,
    order_col: str | None = None,
) -> None:
    """Rewrite a dataset as parquet files of a TARGET SIZE — the
    small-files compaction every long-lived 100 TB corpus needs
    (ingest leaves thousands of KB-sized parts per batch; scans then
    pay per-file open/footer cost and the driver pays per-file
    listing).

    ``maxRecordsPerFile`` caps each task's output file; the partition
    count is sized so tasks receive ~``rows_per_file`` rows and emit
    ~one file each, not a directory of capped fragments. With
    ``order_col`` the data is range-repartitioned on it, so files
    carry disjoint sorted key ranges and parquet min/max stats prune
    file scans for key-range queries — the cheap, format-native cousin
    of Z-ordering. Row count drives the sizing via a fast count()
    (metadata-only on parquet sources).
    """
    if rows_per_file <= 0:
        raise ValueError(f"rows_per_file must be positive: {rows_per_file}")
    n = df.count()
    n_files = max(1, -(-n // rows_per_file))  # ceil
    # Range boundaries come from sampling, so partitions are only
    # approximately equal — maxRecordsPerFile still hard-caps any
    # oversampled partition (at the cost of an extra file there), and
    # the within-partition sort makes every file's min/max stats tight
    # and globally disjoint.
    part = (
        df.repartitionByRange(n_files, order_col).sortWithinPartitions(order_col)
        if order_col
        else df.repartition(n_files)
    )
    (
        part.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(_normalize_path(path))
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a BUCKETED managed table: rows are hash-distributed
    into ``n_buckets`` files per partition on ``bucket_cols``, and the
    bucketing metadata travels with the table — so a later join or
    aggregation on the bucket key reads co-located data and skips its
    shuffle entirely (the plan-level lever for repeated joins on one
    key, e.g. doc_id enrichment passes over a 100 TB corpus; asserted
    in tests/test_plans.py).

    Bucketing requires the table-metadata path (``saveAsTable``) —
    plain ``.parquet(path)`` writes carry no bucket spec. Sorted
    buckets (``sort_cols``) additionally enable merge-join without a
    sort step.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink — the other mainstream columnar interchange format
    (Hive/Trino ecosystems); Spark's writer is built in, same predicate
    pushdown + column pruning on re-read as parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(_normalize_path(path))


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON Lines sink: one object per line, one part file per task —
    the standard interchange layout for LLM-corpus pipelines. As with
    :func:`write_csv`, ``single_file`` is a small-output convenience."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(_normalize_path(path))
