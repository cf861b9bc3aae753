"""Distributed quality-classifier training: logistic regression over
dense feature vectors (the GPT-3 / LLaMA-pipeline pattern — train a
small linear model on labeled good/bad documents, score the whole
corpus, keep the high-probability tail).

Spark-first shape, sharing the kmeans_centroids discipline in
``operators/similarity.py``:

  * training is full-batch gradient descent; each iteration is ONE
    map-only pass over the persisted feature table via mapInPandas —
    every Arrow batch computes its partial gradient with one numpy
    matmul (``X^T (σ(Xw) − y)``) and emits a single row, so the
    driver collects ≤ #batches rows of dim+2 doubles per iteration
    and holds only the weight vector;
  * no shuffle anywhere in training — partials go straight to the
    driver (the same contract as the k-means partial sums);
  * scoring is pure Column algebra: the learned weights ride as an
    array literal into a dot-product fold, so classifying 100 TB is
    one codegen'd scan (same shape as DSIR scoring).

Features come from :func:`~rialto_airflow_spark.operators.vectorize.
hashed_tfidf` or any ``array<double>`` column. Deterministic: zero
init, fixed iteration count, float64 partials (summation order across
batches is the only float nondeterminism; partials are batch-count
bounded so drift stays ~1e-12).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def train_logreg(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    iterations: int = 60,
    lr: float = 1.0,
    reg: float = 0.0,
) -> np.ndarray:
    """Learn ``[w_0..w_{dim-1}, bias]`` by full-batch gradient descent
    with learning rate ``lr`` and L2 strength ``reg`` (bias excluded
    from regularization, the standard convention). Labels are 0/1.

    Returns the weight vector (numpy, driver-side — the MODEL is
    driver-small by definition; the DATA never is).
    """
    feats = df.select(
        F.col(vec_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).persist()
    n = feats.count()
    w = np.zeros(dim + 1, dtype=np.float64)
    out_schema = f"g array<double>, m bigint"

    try:
        for _ in range(iterations):
            cur = w.copy()

            def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                g = np.zeros(dim + 1, dtype=np.float64)
                m = 0
                for pdf in it:
                    if not len(pdf):
                        continue
                    X = np.array(pdf["x"].tolist(), dtype=np.float64)
                    y = pdf["y"].to_numpy(dtype=np.float64)
                    err = _sigmoid(X @ cur[:dim] + cur[dim]) - y
                    g[:dim] += X.T @ err
                    g[dim] += float(err.sum())
                    m += len(pdf)
                yield pd.DataFrame({"g": [g.tolist()], "m": [m]})

            rows = feats.mapInPandas(partials, schema=out_schema).collect()
            grad = np.sum(
                [np.array(r["g"], dtype=np.float64) for r in rows], axis=0
            )
            grad /= n
            grad[:dim] += reg * w[:dim]
            w = w - lr * grad
    finally:
        feats.unpersist()
    return w


def logreg_score(vec_col: Column | str, weights: np.ndarray) -> Column:
    """σ(w·x + b) as a pure Column expression — the weights array is a
    literal, the dot product a zip_with/aggregate fold; map-only,
    joins nothing."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dim = len(weights) - 1
    wlit = F.lit([float(v) for v in weights[:dim]])
    z = F.aggregate(
        F.zip_with(c, wlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) + F.lit(float(weights[dim]))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_filter(
    df: DataFrame,
    vec_col: str,
    weights: np.ndarray,
    threshold: float = 0.5,
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score and gate the corpus with a trained classifier — one
    codegen'd scan, the deployment half of the GPT-3-style quality
    pipeline."""
    scored = df.withColumn(score_col, logreg_score(vec_col, weights))
    return scored.where(F.col(score_col) >= threshold)
