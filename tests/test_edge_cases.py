"""Edge cases: empty inputs through row stages (Arrow's classic crash
vector), unusual CSV content round-trips, null handling in stages."""

import pytest

from filefilter_spark.config import load_config_str
from filefilter_spark.pipeline import Pipeline


def test_empty_input_through_python_stage(spark):
    df = spark.createDataFrame([], "id int, s string")
    out = Pipeline(spark, load_config_str("""
filters:
  - name: tag
    actionType: python
    code: |
      row['t'] = row['id'] * 2
""")).run(df).df
    assert out.count() == 0
    # No sample rows → no new columns discoverable; schema passes through
    # (the reference's filterN schema comes from chunk 0, which never
    # exists on empty input — same contract).
    assert out.columns == ["id", "s"]


def test_empty_input_through_pandas_and_sql(spark):
    df = spark.createDataFrame([], "a int, b double")
    out = Pipeline(spark, load_config_str("""
filters:
  - name: p
    actionType: pandas
    code: |
      df = df.assign(c=df['a'] + 1)
  - name: s
    actionType: sql
    code: SELECT a, c FROM df
""")).run(df).df
    assert out.count() == 0


def test_all_rows_error_keeps_all_rows(spark):
    """keep-on-error: even when user code fails on EVERY row, the
    dataset passes through unchanged (reference filefilter.py:56-65)."""
    df = spark.createDataFrame([(1,), (2,)], "id int")
    out = Pipeline(spark, load_config_str("""
filters:
  - name: boom
    actionType: python
    code: |
      raise RuntimeError('always')
""")).run(df).df
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_csv_roundtrip_quotes_delimiters_newlines(spark, tmp_path):
    """Strings containing the delimiter, quotes, and embedded newlines
    survive a CSV write→read round trip (Spark quotes on write; the
    reader needs multiLine for embedded newlines)."""
    from filefilter_spark.io import write_csv_file

    rows = [
        (1, 'plain'),
        (2, 'with;delimiter'),
        (3, 'with "quotes"'),
        (4, 'with\nnewline'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    out = tmp_path / "round.csv"
    write_csv_file(df, str(out), delimiter=";")
    # Spark's writer backslash-escapes embedded quotes by default; the
    # reader must use the matching default escape (multiLine for the
    # embedded newline).
    back = (
        spark.read.options(header=True, sep=";", multiLine=True)
        .schema("id int, s string")
        .csv(str(out))
    )
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {i: s for i, s in rows}


def test_python_stage_nulls_in_new_column(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    out = Pipeline(spark, load_config_str("""
filters:
  - name: partial
    actionType: python
    code: |
      row['maybe'] = float(row['id']) if row['id'] > 1 else None
""")).run(df).df
    vals = {r["id"]: r["maybe"] for r in out.collect()}
    assert vals == {1: None, 2: 2.0, 3: 3.0}
    assert dict(out.dtypes)["maybe"] == "double"


def test_sample_lines_cap(spark, tmp_path):
    from filefilter_spark.io import read_input

    src = tmp_path / "x.csv"
    src.write_text("a\n" + "\n".join(str(i) for i in range(100)))
    df = read_input(spark, str(src), sample_lines=7)
    assert df.count() == 7


def test_to_cents_sign_safe(spark):
    """HALF_UP for both signs: -100.005 must round away from zero
    (-10001 cents), matching DuckDB/BigDecimal ROUND on refunds."""
    from filefilter_spark.ops.money import to_cents

    df = spark.createDataFrame(
        [(100.005,), (-100.005,), (-0.004,), (0.0,), (-2.5,), (2.5,)],
        "x double",
    )
    got = {r[0] for r in df.select(to_cents(df.x).alias("c")).collect()}
    # abs(±100.005)*100 lands exactly on 10000.5 in double arithmetic, a
    # true tie: HALF_UP away from zero must give ±10001 (a bare
    # floor(x*100+0.5) would give -10000 for the negative). -2.5 dollars
    # is exactly representable and must give -250, not -249.
    assert got == {10001, -10001, 0, -250, 250}


def test_bucket_pairs_quotes_identifier(spark):
    from filefilter_spark.ops.dedup import _bucket_pairs

    df = spark.createDataFrame(
        [(1, "b1"), (2, "b1"), (3, "b2")], "`doc id` int, bucket string"
    )
    pairs = _bucket_pairs(df, ["bucket"], id_col="doc id").collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    with pytest.raises(ValueError, match="backtick"):
        _bucket_pairs(df, ["bucket"], id_col="doc`id")


def test_read_input_applies_schema_to_parquet(spark, tmp_path):
    from filefilter_spark.io import read_input

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.parquet(p)
    # Narrowing cast (bigint file -> int schema): reader.schema() would
    # crash at scan time on Spark's vectorized reader; the select+cast
    # path must both retype AND execute.
    df = read_input(spark, p, schema="id int, s string")
    assert dict(df.dtypes)["id"] == "int"
    assert [(r.id, r.s) for r in df.collect()] == [(1, "a")]
    # Schema-evolution shape: a column absent from the file comes back
    # as a typed null instead of erroring; pruning drops the rest.
    df2 = read_input(spark, p, schema="id int, extra double")
    rows = df2.collect()
    assert df2.columns == ["id", "extra"]
    assert [(r.id, r.extra) for r in rows] == [(1, None)]


def test_s3_conf_mapping():
    from filefilter_spark.session import s3_conf

    out = s3_conf({
        "access_key": "AK", "secret_key": "SK", "endpoint": "http://minio:9000",
        "fs.s3a.connection.maximum": "64",
        "spark.hadoop.fs.s3a.fast.upload": "true",
    })
    assert out["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert out["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert out["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert out["spark.hadoop.fs.s3a.connection.maximum"] == "64"
    assert out["spark.hadoop.fs.s3a.fast.upload"] == "true"
    with pytest.raises(ValueError, match="unknown s3 option"):
        s3_conf({"acess_key": "typo"})


def test_elastic_conf_dynamic_allocation_keys():
    # OP-A13's worker-scaling half: the reference grows/shrinks
    # per-filter threads on a YAML edit (filefilter.py:143-154); the
    # Spark analog is dynamic executor allocation, driven by task
    # backlog instead of a config edit. elastic_conf() is that knob —
    # shuffleTracking on so it works without an external shuffle
    # service, and maxExecutors only when bounded.
    from filefilter_spark.session import elastic_conf

    c = elastic_conf()
    assert c["spark.dynamicAllocation.enabled"] == "true"
    assert c["spark.dynamicAllocation.shuffleTracking.enabled"] == "true"
    assert c["spark.dynamicAllocation.minExecutors"] == "0"
    assert c["spark.dynamicAllocation.schedulerBacklogTimeout"] == "1s"
    assert "spark.dynamicAllocation.maxExecutors" not in c

    c = elastic_conf(min_executors=2, max_executors=64, idle_timeout="120s")
    assert c["spark.dynamicAllocation.minExecutors"] == "2"
    assert c["spark.dynamicAllocation.maxExecutors"] == "64"
    assert c["spark.dynamicAllocation.executorIdleTimeout"] == "120s"


def test_s3_no_jars_no_boto3_fails_fast(spark, monkeypatch):
    """With neither the s3a jars nor boto3, an s3 path must fail at
    read_input time with an actionable message — not minutes later
    inside Py4J at the first action."""
    import sys

    from filefilter_spark.io import read_input
    from filefilter_spark.session import s3a_available

    if s3a_available(spark):  # pragma: no cover - env with jars
        pytest.skip("hadoop-aws present; fallback path not reachable")
    monkeypatch.setitem(sys.modules, "boto3", None)  # import -> ImportError
    with pytest.raises(RuntimeError, match="hadoop-aws"):
        read_input(spark, "s3://bucket/key.parquet")


def test_s3_boto3_fallback_reads_object_and_prefix(spark, monkeypatch, tmp_path):
    """OP-A3 driver-side tier, end-to-end against moto's in-process S3:
    a single CSV object AND a Spark-written parquet dataset uploaded
    under a prefix both round-trip through read_input('s3://...')."""
    import boto3
    from moto import mock_aws

    from filefilter_spark.io import read_input
    from filefilter_spark.session import s3a_available

    if s3a_available(spark):  # pragma: no cover - env with jars
        pytest.skip("hadoop-aws present; s3a tier would win")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    with mock_aws():
        s3 = boto3.client("s3")
        s3.create_bucket(Bucket="corpus")
        s3.put_object(
            Bucket="corpus", Key="in/docs.csv",
            Body=b"id;name\n1;alpha\n2;beta\n",
        )
        got = read_input(spark, "s3://corpus/in/docs.csv", delimiter=";")
        assert sorted((r["id"], r["name"]) for r in got.collect()) == [
            (1, "alpha"), (2, "beta"),
        ]

        local = tmp_path / "events.parquet"
        spark.createDataFrame(
            [(i, f"e{i}") for i in range(50)], "event_id int, kind string"
        ).repartition(3).write.parquet(str(local))
        for f in local.rglob("*"):
            if f.is_file():
                s3.upload_file(
                    str(f), "corpus", f"ds/events.parquet/{f.name}"
                )
        got2 = read_input(spark, "s3://corpus/ds/events.parquet")
        assert got2.count() == 50 and set(got2.columns) == {"event_id", "kind"}

        with pytest.raises(FileNotFoundError, match="no S3 object"):
            read_input(spark, "s3://corpus/missing/nothing.parquet")

        # and the single-file CSV sink round-trips back UP to S3
        from filefilter_spark.io import write_csv_file

        write_csv_file(got, "s3://corpus/out/result.csv", delimiter=";")
        body = s3.get_object(Bucket="corpus", Key="out/result.csv")[
            "Body"
        ].read().decode()
        lines = sorted(body.strip().splitlines())
        assert lines == ["1;alpha", "2;beta", "id;name"]


def test_s3_fallback_error_and_size_guards(spark, monkeypatch, tmp_path):
    """The jarless fetch tier's failure modes (hardened round 7):

    - a non-404 ClientError on the object probe (AccessDenied, throttle)
      surfaces AS ITSELF — falling through to the prefix listing would
      misreport it as FileNotFoundError and mask the actual cause;
    - an object/prefix larger than FFSPARK_S3_FETCH_MAX_BYTES fails
      fast naming the cap and the hadoop-aws remedy, instead of
      silently pulling a cluster-sized dataset through driver disk.
    """
    import boto3
    from moto import mock_aws

    from filefilter_spark.io import _fetch_s3_to_local
    from filefilter_spark.session import s3a_available

    if s3a_available(spark):  # pragma: no cover - env with jars
        pytest.skip("hadoop-aws present; fallback path not reachable")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    with mock_aws():
        s3 = boto3.client("s3")
        s3.create_bucket(Bucket="corpus")
        s3.put_object(Bucket="corpus", Key="big/blob.bin", Body=b"x" * 4096)

        # size cap: single object over the cap -> ValueError, not a
        # download and not FileNotFoundError
        monkeypatch.setenv("FFSPARK_S3_FETCH_MAX_BYTES", "1024")
        with pytest.raises(ValueError, match="hadoop-aws"):
            _fetch_s3_to_local("s3://corpus/big/blob.bin")
        # size cap: prefix total over the cap (two 4k objects, 6k cap)
        s3.put_object(Bucket="corpus", Key="big/blob2.bin", Body=b"y" * 4096)
        monkeypatch.setenv("FFSPARK_S3_FETCH_MAX_BYTES", "6144")
        with pytest.raises(ValueError, match="FFSPARK_S3_FETCH_MAX_BYTES"):
            _fetch_s3_to_local("s3://corpus/big")
        # under the cap the same prefix fetch succeeds
        monkeypatch.setenv("FFSPARK_S3_FETCH_MAX_BYTES", str(32 << 30))
        out = _fetch_s3_to_local("s3://corpus/big")
        import pathlib

        assert sorted(p.name for p in pathlib.Path(out).iterdir()) == [
            "blob.bin", "blob2.bin",
        ]

    # non-404 ClientError must re-raise, not fall through to the
    # prefix path (moto can't mint AccessDenied on demand, so stub the
    # client at the boto3 seam the function uses)
    from botocore.exceptions import ClientError

    class _DeniedClient:
        def head_object(self, **kw):
            raise ClientError(
                {"Error": {"Code": "AccessDenied", "Message": "nope"}},
                "HeadObject",
            )

    class _FakeBoto3:
        @staticmethod
        def client(name):
            assert name == "s3"
            return _DeniedClient()

    import sys

    monkeypatch.setitem(sys.modules, "boto3", _FakeBoto3())
    with pytest.raises(ClientError, match="AccessDenied"):
        _fetch_s3_to_local("s3://corpus/secret/key.csv")


def test_s3_conf_from_env_boto3_chain_parity():
    """OP-A3 credential contract: every AWS_* env var the boto3 tier
    honors lands on its exact fs.s3a.* key, with boto3's own precedence
    (service-specific endpoint over generic, AWS_REGION over
    AWS_DEFAULT_REGION) — the two tiers provably share one credential
    story rather than agreeing by convention."""
    from filefilter_spark.session import s3_conf_from_env

    env = {
        "AWS_ACCESS_KEY_ID": "AK",
        "AWS_SECRET_ACCESS_KEY": "SK",
        "AWS_SESSION_TOKEN": "TOK",
        "AWS_ENDPOINT_URL": "http://generic:9000",
        "AWS_ENDPOINT_URL_S3": "http://s3specific:9000",
        "AWS_DEFAULT_REGION": "us-east-1",
        "AWS_REGION": "eu-west-1",
        "HOME": "/root",  # unrelated vars must be ignored
    }
    assert s3_conf_from_env(env) == {
        "spark.hadoop.fs.s3a.access.key": "AK",
        "spark.hadoop.fs.s3a.secret.key": "SK",
        "spark.hadoop.fs.s3a.session.token": "TOK",
        "spark.hadoop.fs.s3a.endpoint": "http://s3specific:9000",
        "spark.hadoop.fs.s3a.endpoint.region": "eu-west-1",
    }
    # fallback precedence: generic endpoint / default region apply when
    # the specific ones are absent; empty values are treated as unset
    assert s3_conf_from_env({
        "AWS_ENDPOINT_URL": "http://generic:9000",
        "AWS_DEFAULT_REGION": "us-east-1",
        "AWS_REGION": "",
    }) == {
        "spark.hadoop.fs.s3a.endpoint": "http://generic:9000",
        "spark.hadoop.fs.s3a.endpoint.region": "us-east-1",
    }
    assert s3_conf_from_env({}) == {}
