"""Distributed BPE trainer vs a pure-Python Sennrich reference, and
encoder equivalence against rank-order merge application."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import bpe as B
from rialto_airflow_spark.session import load_tables

END = B.END


def _py_apply(sym: tuple, a: str, b: str) -> tuple:
    out: list = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def _py_train(texts, num_merges, min_pair_freq=2):
    """Sennrich learn_bpe over word counts, with the engine's stated
    tie-break (count desc, then lexicographic pair)."""
    wc = Counter(w for t in texts for w in t.split() if w)
    words = {tuple(list(w) + [END]): c for w, c in wc.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for j in range(len(sym) - 1):
                pairs[(sym[j], sym[j + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append((a, b))
        words = {_py_apply(s, a, b): c for s, c in words.items()}
    return merges


def _py_encode_rank_order(text: str, merges) -> list:
    """Independent encoder: apply merges in TRAINING order (the
    subword-nmt formulation) — equivalent to the engine's greedy
    lowest-rank loop, so agreement cross-checks both."""
    out = []
    for w in text.split():
        sym = tuple(list(w) + [END])
        for a, b in merges:
            sym = _py_apply(sym, a, b)
        out.extend(sym)
    return out


def test_train_bpe_matches_reference_fixture(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = B.train_bpe(df, num_merges=12, checkpoint_every=4)
    assert got == _py_train(texts, 12)
    assert len(got) == 12


def test_train_bpe_matches_reference_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(60)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = B.train_bpe(docs, num_merges=25, checkpoint_every=8)
    assert got == _py_train(texts, 25)


def test_train_bpe_stops_below_min_freq(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once → below the default min_pair_freq=2
    assert B.train_bpe(df, num_merges=5) == []


def test_bpe_encode_matches_rank_order_and_roundtrips(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(40)
    merges = B.train_bpe(docs, num_merges=20)
    out = B.bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens")
    for r in out.collect():
        toks = list(r["bpe_tokens"])
        assert toks == _py_encode_rank_order(r["text"], merges), r["doc_id"]
        # lossless: stripping END markers reconstructs the words
        rebuilt = "".join(toks).replace(END, " ").split()
        assert rebuilt == r["text"].split()


def test_bpe_encode_empty_and_unseen(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "zzz unseen"), (3, None)], "doc_id long, text string"
    )
    merges = [("a", "b")]
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in B.bpe_encode(df, merges).collect()
    }
    assert got[1] == []
    assert got[2] == ["z", "z", "z", END, "u", "n", "s", "e", "e", "n", END]
    assert got[3] == []


def test_bpe_model_roundtrip(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(30)
    merges = B.train_bpe(docs, num_merges=10)
    path = str(tmp_path / "bpe_model")
    B.save_bpe(spark, merges, path)
    assert B.load_bpe(spark, path) == merges


def test_bpe_encode_precompute_top_is_equivalent(spark, sf_dir):
    """Seeding the batch caches with the broadcast top-k word
    encodings must not change a single token — it only moves where
    the head of the Zipf curve gets encoded."""
    from rialto_airflow_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    merges = B.train_bpe(docs.limit(50), num_merges=12)
    plain = {
        r["doc_id"]: r["bpe_tokens"]
        for r in B.bpe_encode(docs, merges).collect()
    }
    seeded = {
        r["doc_id"]: r["bpe_tokens"]
        for r in B.bpe_encode(docs, merges, precompute_top=100).collect()
    }
    assert plain == seeded


def test_bpe_encode_rejects_absurd_merge_table(spark):
    import pytest

    df = spark.createDataFrame([("hi",)], "text string")
    fake = [(str(i), str(i + 1)) for i in range(1_000_001)]
    with pytest.raises(ValueError, match="merge table"):
        B.bpe_encode(df, fake)
