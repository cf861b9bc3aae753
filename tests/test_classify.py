"""Distributed logistic regression vs a numpy full-batch reference,
separable-accuracy, and the map-only scoring contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rialto_airflow_spark.operators import classify as CL
from rialto_airflow_spark.operators import vectorize as V
from rialto_airflow_spark.session import load_tables


def _np_train(X, y, iterations, lr, reg=0.0):
    n, dim = X.shape
    w = np.zeros(dim + 1)
    for _ in range(iterations):
        err = 1.0 / (1.0 + np.exp(-(X @ w[:dim] + w[dim]))) - y
        g = np.concatenate([X.T @ err, [err.sum()]]) / n
        g[:dim] += reg * w[:dim]
        w = w - lr * g
    return w


def _labeled_corpus(spark, sf_dir, dim=32, l2=True):
    """Synthetic quality labels: docs containing the token 'slow' are
    'bad' — linearly separable in hashed TF-IDF space as long as the
    'slow' bucket isn't aliased (dim >= 256 keeps it clean; l2=False
    keeps the margin constant so GD converges fast)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    labeled = docs.withColumn(
        "label", (~F.col("text").contains("slow")).cast("int")
    )
    return V.hashed_tfidf(labeled, dim=dim, l2_normalize=l2).select(
        "doc_id", "tfidf", "label"
    )


def test_train_logreg_matches_numpy(spark, sf_dir):
    dim = 32
    feats = _labeled_corpus(spark, sf_dir, dim).repartition(6)
    got = CL.train_logreg(feats, "tfidf", "label", dim, iterations=25, lr=0.8)
    rows = feats.collect()
    X = np.array([list(r["tfidf"]) for r in rows])
    y = np.array([r["label"] for r in rows], dtype=float)
    want = _np_train(X, y, 25, 0.8)
    assert np.allclose(got, want, atol=1e-9)


def test_classifier_separates_and_scores_matmap(spark, sf_dir):
    dim = 256
    feats = _labeled_corpus(spark, sf_dir, dim, l2=False)
    w = CL.train_logreg(feats, "tfidf", "label", dim, iterations=100, lr=1.0)
    scored = feats.withColumn("p", CL.logreg_score("tfidf", w))
    rows = scored.select("label", "p").collect()
    acc = sum(1 for r in rows if (r["p"] >= 0.5) == (r["label"] == 1)) / len(rows)
    assert acc >= 0.99, acc
    # scoring alone is map-only: no exchange, no join, no python
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    d = emb.select(F.size("embedding")).first()[0]
    we = np.zeros(d + 1)
    plain = emb.withColumn(
        "p", CL.logreg_score(F.col("embedding").cast("array<double>"), we)
    )
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "Python" not in plan
    # column scores must equal numpy sigmoid on the same vectors
    X = np.array([list(r["tfidf"]) for r in feats.collect()])
    p_np = 1.0 / (1.0 + np.exp(-(X @ w[:dim] + w[dim])))
    p_sp = np.array([r["p"] for r in scored.collect()])
    assert np.allclose(np.sort(p_sp), np.sort(p_np), atol=1e-9)


def test_quality_filter_threshold(spark, sf_dir):
    dim = 256
    feats = _labeled_corpus(spark, sf_dir, dim, l2=False)
    w = CL.train_logreg(feats, "tfidf", "label", dim, iterations=60, lr=1.0)
    kept = CL.quality_filter(feats, "tfidf", w, threshold=0.5)
    assert 0 < kept.count() < feats.count()
    assert kept.where(F.col("quality_prob") < 0.5).count() == 0


def test_logreg_l2_shrinks_weights(spark, sf_dir):
    dim = 32
    feats = _labeled_corpus(spark, sf_dir, dim)
    w0 = CL.train_logreg(feats, "tfidf", "label", dim, iterations=20, lr=1.0)
    w1 = CL.train_logreg(
        feats, "tfidf", "label", dim, iterations=20, lr=1.0, reg=0.5
    )
    assert np.linalg.norm(w1[:dim]) < np.linalg.norm(w0[:dim])
