"""Resume-workspace (reference data/<input>.db analog) and
observe()-based metrics (OP-A10/A14)."""

from filefilter_spark.config import load_config_str
from filefilter_spark.pipeline import Pipeline

YAML = """
filters:
  - name: filt
    actionType: sql
    code: SELECT * FROM df WHERE id % 2 = 0
  - name: tag
    actionType: python
    code: |
      row['tag'] = 'x' * 3
"""


def test_observe_metrics_no_extra_jobs(spark):
    df = spark.range(100).withColumnRenamed("id", "id")
    result = Pipeline(spark, load_config_str(YAML)).run(df)
    result.df.write.format("noop").mode("overwrite").save()  # ONE action
    metrics = result.harvest_metrics()
    assert [m.rows_out for m in metrics] == [50, 50]
    assert metrics[1].errors == 0


def test_resume_skips_unchanged_stages(spark, tmp_path):
    df = spark.range(10)
    ck = str(tmp_path / "ws")

    r1 = Pipeline(spark, load_config_str(YAML), checkpoint_dir=ck).run(df)
    assert r1.df.count() == 5
    assert not any(m.resumed for m in r1.metrics)

    # second run resumes every stage from the materialized workspace
    r2 = Pipeline(spark, load_config_str(YAML), checkpoint_dir=ck, resume=True).run(df)
    assert [m.resumed for m in r2.metrics] == [True, True]
    assert r2.df.count() == 5
    assert sorted(r.tag for r in r2.df.collect()) == ["xxx"] * 5

    # changing a stage's config invalidates it (fingerprint mismatch)
    changed = YAML.replace("'x' * 3", "'y' * 2")
    r3 = Pipeline(spark, load_config_str(changed), checkpoint_dir=ck, resume=True).run(df)
    assert [m.resumed for m in r3.metrics] == [True, False]
    assert sorted(r.tag for r in r3.df.collect()) == ["yy"] * 5
