"""Learned quality classification — the GPT-3-style data filter.

Beyond-reference training-pipeline tier: alongside the generative
scorers already in the engine (CCNet-style perplexity =
``ops/text.py bigram_nll``; DSIR importance ratios =
``ops/corpus.py dsir_logweights``), this module adds the
DISCRIMINATIVE recipe from the GPT-3/PaLM lineage (Brown et al. 2020
§A; also WebText's original filter): train a linear classifier to
distinguish a high-quality reference corpus from the raw crawl, score
every crawl document, keep high scorers.

Spark shape (all public pyspark.ml — the same building blocks the
IVF index already uses for k-means):

- features: engine tokenization (``ops/text.tokens``, lowercased) →
  ``HashingTF`` sparse term-frequency vectors (2^18 buckets default —
  the hashing trick keeps the feature space fixed regardless of
  vocabulary, exactly like DSIR's hashed n-grams);
- model: ``LogisticRegression`` (distributed L-BFGS; each iteration
  is one tree-aggregated gradient pass over the hashed vectors — no
  per-row Python, no driver-sized state beyond the coefficient
  vector);
- scoring: one ``model.transform`` projection; the probability column
  is extracted JVM-side via ``vector_to_array``.

At 100 TB the standard deployment trains on a SAMPLE (reference corpus
vs a few-million-doc crawl sample — the coefficient vector only needs
enough data to estimate 2^18 weights) and scores the full corpus with
the one-pass transform; both halves of that split are this module's
two functions.

Determinism note: L-BFGS over tree-aggregated float sums is
reproducible only up to aggregation order; scores are therefore NOT
bit-stable across partitionings (unlike the md5-keyed ops). The
registry entry carries a recall oracle on a separable construct
rather than a value hash for exactly this reason.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from filefilter_spark.ops.text import tokens


@dataclass
class QualityModel:
    """A trained quality filter: the fitted LR model plus the
    featurization parameters scoring must replay identically."""

    model: object  # pyspark.ml LogisticRegressionModel
    n_features: int


def _featurize(df: DataFrame, text_col: str, n_features: int,
               extra_cols: list) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(inputCol="__tk", outputCol="features",
                   numFeatures=n_features)
    toks = df.select(
        *extra_cols, tokens(F.lower(F.col(text_col))).alias("__tk")
    )
    return tf.transform(toks).drop("__tk")


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 50,
    reg_param: float = 1e-3,
) -> QualityModel:
    """Fit the reference-vs-crawl classifier. ``positive`` is the
    high-quality reference sample, ``negative`` the raw-crawl sample;
    class balance is the caller's choice (GPT-3 used ~1:1)."""
    from pyspark.ml.classification import LogisticRegression

    train = _featurize(
        positive.select(F.col(text_col)), text_col, n_features,
        [F.lit(1.0).alias("label")],
    ).unionByName(_featurize(
        negative.select(F.col(text_col)), text_col, n_features,
        [F.lit(0.0).alias("label")],
    ))
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    return QualityModel(lr.fit(train), n_features)


def quality_scores(
    df: DataFrame,
    qm: QualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a trained filter: ``(id_col, score_col)``
    with score = P(reference | doc). One featurize + transform
    projection — no shuffle, no Python in the row path."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(df, text_col, qm.n_features, [F.col(id_col)])
    return qm.model.transform(feats).select(
        F.col(id_col),
        F.element_at(vector_to_array("probability"), 2).alias(score_col),
    )
