"""``rest`` row-enrichment stage — OP-A6.

Reference behavior (``filters.py:17-89``): per-row HTTP GET/POST with
URL path, query string, and POST body templated from row values via
``str.format(**row)`` (OP-A16); a 2xx response's JSON is re-serialized
and appended as a new *string* column (``newField``, default
``response`` — ``filters.py:78``); non-2xx / failed request drops the
row (``filters.py:83-89``; drop at ``filefilter.py:110-113``); unfillable
``{param}`` template → that request part is skipped
(``filters.py:31-33``); per-status-class counters ``20X/30X/40X/50X``
(``filefilter.py:73-80``).

We implement the *intended* semantics: the reference only sends POST
bodies when ``logHttpRequests`` is on (quirk — ``filters.py:65-71``);
we always send.

Spark-first realization: ``mapInPandas`` with a per-partition
``requests.Session`` (connection reuse — the reference built a thread
pool for the same reason). Engine-added operational layer the reference
lacks, mandatory at scale (SURVEY.md §4.2): bounded retries with
exponential backoff, a per-executor token-bucket rate limiter
(``ratePerSecond``), and a request timeout — 100 TB × per-row HTTP
without client-side rate limiting would melt any endpoint.

Testing: ``actionConfig.mockTemplate`` substitutes a deterministic
local transport (``str.format`` over the row → response text), so
pipelines are testable with no network; live calls require ``host``.
"""

from __future__ import annotations

import json
import string
import time
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from filefilter_spark.stages.base import Stage

_FORMATTER = string.Formatter()


def render_template(template: str, row: dict[str, Any]) -> str | None:
    """``str.format(**row)`` templating (reference ``filters.py:22-39``).

    Returns None when a referenced field is missing — callers skip that
    request part (reference ``filters.py:31-33``).
    """
    try:
        return template.format(**row)
    except (KeyError, IndexError):
        return None


class _TokenBucket:
    """Per-executor client-side rate limiter (engine-added)."""

    def __init__(self, rate_per_sec: float):
        self.rate = rate_per_sec
        self.allowance = rate_per_sec
        self.last = time.monotonic()

    def acquire(self) -> None:
        if self.rate <= 0:
            return
        while True:
            now = time.monotonic()
            self.allowance = min(self.rate, self.allowance + (now - self.last) * self.rate)
            self.last = now
            if self.allowance >= 1.0:
                self.allowance -= 1.0
                return
            time.sleep((1.0 - self.allowance) / self.rate)


class RestStage(Stage):
    def apply(self, df: DataFrame) -> DataFrame:
        ac = self.cfg.action_config
        new_field = ac.get("newField", "response")
        schema = StructType(
            list(df.schema.fields) + [StructField(new_field, StringType(), True)]
        )
        sc = self.spark.sparkContext
        acc_2xx, acc_3xx = sc.accumulator(0), sc.accumulator(0)
        acc_4xx, acc_5xx = sc.accumulator(0), sc.accumulator(0)
        acc_err = sc.accumulator(0)

        host = ac.get("host", "")
        path_t = ac.get("path", "")
        method = str(ac.get("method", "GET")).upper()
        query_params: dict[str, str] = dict(ac.get("queryParams") or {})
        post_body_t = ac.get("postBody")
        urlencode_params = set(ac.get("urlencodeParams") or [])
        mock_template = ac.get("mockTemplate")
        max_retries = int(ac.get("maxRetries", 2))
        backoff = float(ac.get("backoff", 0.5))
        rate_per_sec = float(ac.get("ratePerSecond", 0))
        if rate_per_sec > 0:
            # The token bucket lives per TASK (instantiated inside the
            # partition fn — there is no cheap cross-executor limiter),
            # so the configured rate must be divided by the number of
            # buckets that can be draining at once, or the endpoint
            # sees ratePerSecond x task-parallelism. At most
            # min(partitions, total cores) tasks run simultaneously.
            n_concurrent = max(
                1,
                min(df.rdd.getNumPartitions(), sc.defaultParallelism),
            )
            rate_per_sec = rate_per_sec / n_concurrent
        timeout = float(ac.get("timeout", 30))
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            session = None
            if mock_template is None:
                import requests

                session = requests.Session()
            bucket = _TokenBucket(rate_per_sec)

            def call(row: dict[str, Any]) -> str | None:
                """Return response text for the row, or None → drop."""
                if mock_template is not None:
                    rendered = render_template(mock_template, row)
                    return rendered  # None (unfillable) drops the row
                from urllib.parse import quote

                path = render_template(path_t, row)
                if path is None:
                    return None
                qparts = []
                for name, tmpl in query_params.items():
                    val = render_template(str(tmpl), row)
                    if val is None:
                        continue  # unfillable param skipped (filters.py:31-33)
                    if name in urlencode_params:
                        val = quote(val)
                    qparts.append(f"{name}={val}")
                url = host.rstrip("/") + "/" + path.lstrip("/")
                if qparts:
                    url += "?" + "&".join(qparts)
                body = None
                if post_body_t is not None:
                    rendered = render_template(str(post_body_t), row)
                    if rendered is not None:
                        body = rendered
                for attempt in range(max_retries + 1):
                    bucket.acquire()
                    try:
                        resp = session.request(
                            method, url, data=body, timeout=timeout
                        )
                    except Exception:
                        if attempt == max_retries:
                            acc_err.add(1)
                            return None
                        time.sleep(backoff * (2**attempt))
                        continue
                    code = resp.status_code
                    if 200 <= code < 300:
                        acc_2xx.add(1)
                        try:
                            # JSON re-serialized to a string column
                            # (reference filters.py:78).
                            return json.dumps(resp.json())
                        except ValueError:
                            return resp.text
                    if 300 <= code < 400:
                        acc_3xx.add(1)
                    elif 400 <= code < 500:
                        acc_4xx.add(1)
                    else:
                        acc_5xx.add(1)
                        if attempt < max_retries:
                            time.sleep(backoff * (2**attempt))
                            continue
                    return None  # non-2xx → drop (filters.py:83-89)
                return None

            for pdf in batches:
                kept: list[dict[str, Any]] = []
                for rec in pdf.to_dict(orient="records"):
                    text = call(rec)
                    if text is None:
                        continue  # drop-on-error (filefilter.py:110-113)
                    rec[new_field] = text
                    kept.append(rec)
                if kept:
                    yield pd.DataFrame(kept, columns=out_cols)
                else:
                    yield pd.DataFrame({c: [] for c in out_cols})

        result = df.mapInPandas(run, schema=schema)
        result._filefilter_status_accs = {
            "20X": acc_2xx, "30X": acc_3xx, "40X": acc_4xx, "50X": acc_5xx,
            "errors": acc_err,
        }
        return result
