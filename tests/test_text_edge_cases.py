"""Edge-case tests for the text operators: short/degenerate documents
through shingling, fingerprints, and winnowing. (The driver corpus
has no short docs, so these paths are invisible to the oracle gate —
an unguarded sequence(0, size-n) used to throw on them.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import text as T


def _one(spark, text, expr, alias="o"):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias(alias)).collect()[0][alias]


def test_ngram_strings_short_docs(spark):
    assert _one(spark, "one two three four", T.ngram_strings("text", 3)) == [
        "one two three",
        "two three four",
    ]
    assert _one(spark, "one two three", T.ngram_strings("text", 3)) == [
        "one two three"
    ]
    # fewer tokens than n -> empty, not junk windows / runtime error
    assert _one(spark, "one two", T.ngram_strings("text", 3)) == []
    assert _one(spark, "one", T.ngram_strings("text", 3)) == []
    assert _one(spark, "", T.ngram_strings("text", 3)) == []


def test_fingerprint_short_docs(spark):
    assert _one(spark, "a b", T.fingerprint("text", n=3, k=4)) == ""
    fp = _one(spark, "a b c d e f", T.fingerprint("text", n=3, k=4))
    assert fp.count("|") == 3  # 4 shingles -> 4 hashes, k=4


def test_winnow_fingerprint_windows(spark):
    # 7 tokens -> 5 shingles -> 2 windows of 4; each emits its min
    text = "t1 t2 t3 t4 t5 t6 t7"
    wfp = _one(spark, text, T.winnow_fingerprint("text", n=3, window=4, k=8))
    assert 1 <= len(wfp.split("|")) <= 2
    # fewer shingles than the window -> single global-min window
    short = _one(spark, "a b c d", T.winnow_fingerprint("text", n=3, window=4))
    assert len(short.split("|")) == 1 and short != ""
    # shorter than n -> empty fingerprint
    assert _one(spark, "a b", T.winnow_fingerprint("text", n=3, window=4)) == ""


def test_winnow_positional_coverage(spark):
    """An inserted passage ALWAYS perturbs the winnow sketch of the
    region, while a k-min sketch can miss it: every window of the
    modified doc still contributes a min, so sketches of doc vs
    doc-with-insertion share most-but-not-all hashes."""
    base = " ".join(f"w{i}" for i in range(40))
    edited = " ".join(
        [f"w{i}" for i in range(20)] + ["INS1 INS2 INS3"] + [f"w{i}" for i in range(20, 40)]
    )
    a = set(_one(spark, base, T.winnow_fingerprint("text", k=64)).split("|"))
    b = set(_one(spark, edited, T.winnow_fingerprint("text", k=64)).split("|"))
    assert a != b
    overlap = len(a & b) / len(a | b)
    assert overlap > 0.5  # still recognizably the same document
