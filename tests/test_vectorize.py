"""Hashed TF-IDF vectorizer: python-model parity (Spark supplies the
bucket hashing, the model checks the tf/idf/normalize arithmetic) and
retrieval integration with the similarity stack."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from rialto_airflow_spark.operators import similarity as S
from rialto_airflow_spark.operators import vectorize as V
from rialto_airflow_spark.session import load_tables


def _model(bucket_lists: dict, dim: int, l2: bool = True) -> dict:
    n = len(bucket_lists)
    dfreq = [0] * dim
    for bs in bucket_lists.values():
        for b in set(bs):
            dfreq[b] += 1
    idf = [math.log((1 + n) / (1 + d)) + 1.0 for d in dfreq]
    out = {}
    for i, bs in bucket_lists.items():
        vec = [0.0] * dim
        for b in bs:
            vec[b] += 1.0
        vec = [v * w for v, w in zip(vec, idf)]
        if l2:
            nrm = math.sqrt(sum(v * v for v in vec))
            if nrm > 0:
                vec = [v / nrm for v in vec]
        out[i] = vec
    return out


def test_hashed_tfidf_matches_model(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(60)
    dim = 64
    buckets = {
        r["doc_id"]: list(r["b"])
        for r in docs.select(
            "doc_id", V.token_buckets("text", dim).alias("b")
        ).collect()
    }
    got = {
        r["doc_id"]: list(r["tfidf"])
        for r in V.hashed_tfidf(docs, dim=dim).select("doc_id", "tfidf").collect()
    }
    want = _model(buckets, dim)
    for i in want:
        assert np.allclose(got[i], want[i], atol=1e-12), i
        assert abs(np.linalg.norm(got[i]) - 1.0) < 1e-9  # l2-normalized


def test_hashed_tfidf_unnormalized_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: list(r["tfidf"])
        for r in V.hashed_tfidf(df, dim=8, l2_normalize=False)
        .select("doc_id", "tfidf")
        .collect()
    }
    assert sum(1 for v in out[1] if v > 0) == 2  # two distinct tokens
    assert out[2] == [0.0] * 8
    assert out[3] == [0.0] * 8


def test_tfidf_retrieval_finds_duplicate(spark, sf_dir):
    """A near-verbatim copy of a document must be its top-1 neighbor
    under TF-IDF cosine — the vectorizer composes with the ANN stack
    unchanged."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(50)
    copy = docs.where(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    vecs = V.hashed_tfidf(docs.unionByName(copy), dim=128)
    queries = vecs.where(F.col("doc_id") == 100007)
    top = S.brute_force_topk(vecs, queries, "doc_id", "tfidf", k=1).collect()
    assert top[0]["neighbor_id"] == 7
    assert top[0]["score"] > 0.9
