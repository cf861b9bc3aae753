"""Chunking + sequence-packing tests: DuckDB oracle for the Column
chunker, packing invariants for the per-partition FFD packer."""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import packing as P
from rialto_airflow_spark.session import load_tables
from tests.oracle_util import compare


def test_chunk_documents_oracle_disjoint(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = P.chunk_documents(docs, "doc_id", "text", chunk_tokens=16)
    sql = r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      FROM documents
    ),
    st AS (
      SELECT doc_id, t,
             unnest(range(0, ((len(t) - 1) // 16) * 16 + 1, 16)) AS s
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           (s // 16)::INT AS chunk_idx,
           least(16, len(t) - s)::INT AS n_tokens,
           array_to_string(t[s + 1 : s + 16], ' ') AS chunk_text
    FROM st
    """
    compare(out, sql, str(sf_dir), "chunk_documents")


def test_chunk_documents_overlap_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, ""), (4, "   ")],
        ["doc_id", "text"],
    )
    # chunk 4, stride 2 -> starts 0,2,4,6 for 7 tokens
    rows = sorted(
        P.chunk_documents(df, "doc_id", "text", 4, 2).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [(r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text) for r in rows]
    assert got == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "c d e f"),
        (1, 2, 3, "e f g"),
        (1, 3, 1, "g"),
        (2, 0, 1, "x"),
    ]
    # every token of doc 1 appears in at least one chunk
    toks = set("a b c d e f g".split())
    covered = set(
        " ".join(t for d, _, _, t in got if d == 1).split()
    )
    assert toks <= covered


def test_pack_sequences_invariants(spark, sf_dir):
    """Every chunk packed exactly once, bins never exceed the budget,
    offsets tile each bin without overlap, deterministic under a
    fixed partitioning."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    chunks = P.chunk_documents(docs, "doc_id", "text", chunk_tokens=32)
    items = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("cid"),
        "n_tokens",
    ).repartition(4, "cid")
    out = P.pack_sequences(items, "cid", "n_tokens", budget=128).collect()

    ids = [r.cid for r in out]
    assert sorted(ids) == sorted(r.cid for r in items.collect())  # exactly once

    bins: dict = {}
    for r in out:
        bins.setdefault(r.bin_id, []).append((r.offset, r.n_tokens))
    for b, members in bins.items():
        assert sum(n for _, n in members) <= 128
        members.sort()
        end = 0
        for off, n in members:
            assert off >= end  # no overlap
            end = off + n
        assert end <= 128

    again = P.pack_sequences(items, "cid", "n_tokens", budget=128).collect()
    assert {(r.cid, r.bin_id, r.offset) for r in out} == {
        (r.cid, r.bin_id, r.offset) for r in again
    }


def test_pack_sequences_rejects_oversized(spark):
    df = spark.createDataFrame([(1, 10), (2, 999)], ["cid", "n"])
    try:
        P.pack_sequences(df, "cid", "n", budget=100).collect()
        raise AssertionError("expected failure for oversized item")
    except Exception as exc:  # Py4J wraps the executor ValueError
        assert "exceeds budget" in str(exc)


def test_chunk_documents_plan_has_no_python(spark, sf_dir):
    """The 1->N chunk fan-out must stay whole-stage-codegen Column
    algebra — no Python evaluation node anywhere in the plan."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    plan = (
        P.chunk_documents(docs, "doc_id", "text", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, node
