"""PageRank vs a pure-Python power iteration (same dangling-mass
treatment), plus the probability-mass invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.operators.graph import pagerank


def _py_pagerank(edges, iterations=10, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in out)
        new = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for s, ts in out.items():
            share = rank[s] / len(ts)
            for t in ts:
                new[t] += d * share
        rank = new
    return rank


GRAPH = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (5, 3), (6, 5),
    (7, 1),  # 7 dangles into 1; node 8 below is pure-dangling via (3, 8)
    (3, 8),
]


def test_pagerank_matches_python_model(spark):
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(edges, iterations=12, checkpoint_every=4).collect()
    }
    want = _py_pagerank(GRAPH, iterations=12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_hub_highest(spark):
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}
    # node 3 receives links from 1,2,4,5 — must outrank everything
    assert max(got, key=got.get) == 3


def test_pagerank_uniform_on_cycle(spark):
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    got = [r["rank"] for r in pagerank(edges, iterations=10).collect()]
    assert all(r == pytest.approx(0.2, abs=1e-12) for r in got)
