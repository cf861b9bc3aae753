"""Text → dense-vector featurization: the hashing-trick TF-IDF
vectorizer that bridges the text operators to the similarity/ANN
stack (brute_force_topk, IVF/LSH indexes, semantic_decontaminate) on
corpora that arrive without embeddings.

Design (the scikit-learn HashingVectorizer + TfidfTransformer
composition, re-expressed for Spark):

  * the feature space is FIXED at ``dim`` hashed buckets —
    ``pmod(xxhash64(token), dim)`` — so there is no vocabulary to
    build, ship, or grow: the only corpus statistic is the per-bucket
    document frequency, a bounded aggregation whose output is ≤ dim
    rows regardless of corpus size;
  * IDF (smoothed, sklearn-style: ``log((1+N)/(1+df)) + 1``) rides
    into the scoring UDF as a dim-sized closure array — a broadcast
    in all but name (2 KB at dim=256);
  * vectorization is an Arrow-batched pandas UDF over the PRE-HASHED
    bucket arrays (hashing stays JVM-side Column algebra;
    Python only does the np.bincount + idf multiply a dense vector
    genuinely needs). No shuffle, no join — scoring 100 TB is one
    map-only pass.

The count() for N reads parquet footer metadata only (zero-column
scan), the same deliberate trade q47 documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_buckets(col: Column | str, dim: int) -> Column:
    """Hashed-trick feature ids for whitespace tokens: array<int> of
    ``pmod(xxhash64(token), dim)``. Pure Column algebra."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    return F.transform(
        F.filter(toks, lambda t: t != ""),
        lambda t: F.pmod(F.xxhash64(t), F.lit(dim)).cast("int"),
    )


def hashed_tfidf(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 256,
    l2_normalize: bool = True,
    out_col: str = "tfidf",
) -> DataFrame:
    """Attach a dense ``array<double>`` TF-IDF vector per document.

    Two corpus passes: one bounded document-frequency aggregation
    (≤ dim rows shuffle), one map-only scoring pass. The result
    column feeds every vector operator in ``operators/similarity.py``
    unchanged (cast to float for the int8/PQ quantizers).
    """
    n_docs = df.count()
    with_b = df.withColumn("__buckets", token_buckets(text_col, dim))
    dfreq = dict(
        with_b.select(
            F.explode(F.array_distinct("__buckets")).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    idf = np.log(
        (1.0 + n_docs) / (1.0 + np.array([dfreq.get(b, 0) for b in range(dim)]))
    ) + 1.0

    @F.pandas_udf("array<double>")
    def score(bucket_lists: pd.Series) -> pd.Series:
        def one(buckets) -> list:
            if buckets is None or len(buckets) == 0:
                return [0.0] * dim
            vec = np.bincount(
                np.asarray(buckets, dtype=np.int64), minlength=dim
            ).astype(np.float64)
            vec *= idf
            if l2_normalize:
                nrm = float(np.linalg.norm(vec))
                if nrm > 0:
                    vec /= nrm
            return vec.tolist()

        return bucket_lists.map(one)

    return with_b.withColumn(out_col, score(F.col("__buckets"))).drop(
        "__buckets"
    )
