"""Iterative graph operators on DataFrames: PageRank.

Web-scale corpus curation uses link-graph centrality as a document
quality prior (the original PageRank use, and the harmonic-centrality
ranking behind Common Crawl's host-level quality lists). Spark has no
built-in graph engine exposed to PySpark, but PageRank's power
iteration is exactly a repeated join+aggregate — the canonical
iterative-DataFrame pattern, sharing the connected-components loop
discipline in ``operators/dedup.py`` (persist + localCheckpoint so
the plan and lineage stay bounded).

Per iteration: one join of ranks to edges on src (both sides
hash-partitioned on the same key — AQE reuses the exchange), one
aggregation shuffling contributions on dst, and a ONE-ROW driver
collect for the dangling-node mass. State never leaves the cluster;
the driver holds two scalars (N, dangling mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Power-iteration PageRank over an edge list. Returns
    ``(id, rank)`` with Σ rank = 1 (dangling mass redistributed
    uniformly — the standard stochastic-matrix completion).

    Duplicate edges count as parallel links (weight 2); pre-
    ``distinct()`` the edge list for simple-graph semantics.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    ranks.count()
    for i in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks["id"] == out_deg["src"], "left"
        ).select("id", "rank", "out_deg")
        # rank mass sitting on dangling nodes (no out-edges) spreads
        # uniformly; ONE scalar to the driver per iteration
        dangling = (
            with_deg.where(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            with_deg.where(F.col("out_deg").isNotNull())
            .join(e, with_deg["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    nodes.unpersist()
    out_deg.unpersist()
    return ranks
