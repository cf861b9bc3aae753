"""The LLM-pretraining curation pipeline as a task graph — the
beyond-reference operator families (dedup, curation, text analysis,
vectorization, classifier, splits) wired into ONE orchestrated run
with versioned TableStore handoffs, reusing the same ``Dag`` runner
the reference-shaped DAGs use (``dag.py``).

Stage layout (the Gopher/C4/RefinedWeb ordering — cheap map-only
gates first so the expensive corpus-wide stages see fewer rows):

  clean → c4_gate → gopher_gate → signals → exact_dedup → near_dedup
  (LSH → connected components → survivors) → span_dedup (ExactSubstr)
  → decontaminate → classify (TF-IDF + logistic regression on weak
  labels) → budget_sample (quality-weighted, optional) → split →
  report

(q47 in the driver registry composes the same chain as one oracle-
checked lineage; this graph is the OPERATIONAL form — checkpointed
stages, resumable, auditable.)

Each stage writes its output table to the TableStore, so a failed run
resumes from the last published version and every intermediate is
auditable — the operational property the reference gets from Postgres
tables, provided here by the pointer-swap parquet store.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.dag import Dag
from rialto_airflow_spark.operators import classify as CL
from rialto_airflow_spark.operators import curation as CUR
from rialto_airflow_spark.operators import dedup as D
from rialto_airflow_spark.operators import sampling as SA
from rialto_airflow_spark.operators import text as T
from rialto_airflow_spark.operators import vectorize as V
from rialto_airflow_spark.session import load_tables
from rialto_airflow_spark.storage import TableStore


def build_curation_dag() -> Dag:
    """Context keys: ``spark``, ``sf_dir``, ``store_root``; produces
    TableStore tables ``docs_clean``, ``docs_gated``, ``docs_gopher``,
    ``docs_dedup``, ``docs_final``, and a ``curation_report`` summary
    table."""
    dag = Dag("llm_curation")

    @dag.task("setup")
    def setup(ctx):
        ctx["store"] = TableStore(ctx["store_root"])

    @dag.task("clean", upstream=("setup",))
    def clean(ctx):
        docs = load_tables(ctx["spark"], ctx["sf_dir"], "documents")[
            "documents"
        ]
        out = docs.select(
            "doc_id",
            "source",
            "lang",
            T.clean_text("text", form=None).alias("text"),
        )
        ctx["store"].write(out, "docs_clean")

    @dag.task("c4_gate", upstream=("clean",))
    def c4_gate(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_clean")
        # the synthetic corpus is unpunctuated word soup, so the gate
        # parameters come from the context (real deployments keep the
        # C4 defaults)
        gated = CUR.c4_line_filter(
            docs, **ctx.get("c4_params", {})
        ).where(F.col("keep"))
        kept = docs.join(gated.select("doc_id"), "doc_id", "left_semi")
        ctx["store"].write(kept, "docs_gated")

    @dag.task("gopher_gate", upstream=("c4_gate",))
    def gopher_gate(ctx):
        """Document-level Gopher rule set after the line-level C4
        gate — both map-only, so running them before the
        shuffle-bearing dedup stages shrinks that work. Parameters
        come from the context for the same reason c4_gate's do (the
        synthetic corpus is word soup); real deployments keep the
        published Rae et al. defaults."""
        docs = ctx["store"].read(ctx["spark"], "docs_gated")
        kept = (
            CUR.gopher_quality_filter(
                docs, passthrough=True, **ctx.get("gopher_params", {})
            )
            .where(F.col("keep"))
            .select(*docs.columns)
        )
        ctx["store"].write(kept, "docs_gopher")

    @dag.task("signals", upstream=("gopher_gate",))
    def signals(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_gopher")
        out = docs.select(
            "*",
            F.round(T.quality_score("text"), 4).alias("q_score"),
            T.char_entropy("text").alias("entropy"),
            T.token_count("text").alias("n_tokens"),
        )
        ctx["store"].write(out, "docs_signals")

    @dag.task("exact_dedup", upstream=("signals",))
    def exact(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_signals")
        ctx["store"].write(
            D.exact_dedup(docs, "text", "doc_id"), "docs_exact"
        )

    @dag.task("near_dedup", upstream=("exact_dedup",))
    def near(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_exact")
        pairs = D.minhash_near_dups(docs, "doc_id", "text")
        comps = D.connected_components(pairs, assume_canonical=True)
        survivors = D.cluster_survivors(docs, comps, "doc_id")
        ctx["store"].write(survivors, "docs_dedup")

    @dag.task("span_dedup", upstream=("near_dedup",))
    def span_dedup(ctx):
        """ExactSubstr duplicate-span removal over the near-dedup
        survivors (the Lee et al. ordering q47 replays): repeated
        ≥window-token spans keep only their first occurrence
        corpus-wide. The operator projects (id, clean_text,
        n_removed); the survivors' metadata joins back by id."""
        docs = ctx["store"].read(ctx["spark"], "docs_dedup")
        span = CUR.remove_duplicate_spans(
            docs, "doc_id", "text", window=ctx.get("span_window", 10)
        ).select(
            "doc_id",
            F.col("clean_text").alias("text"),
            F.col("n_removed").alias("span_removed"),
        )
        out = docs.drop("text").join(span, "doc_id")
        ctx["store"].write(out, "docs_span")

    @dag.task("decontaminate", upstream=("span_dedup",))
    def decon(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_span")
        bench = ctx.get("benchmark_df")
        if bench is None:  # no eval set supplied — pass-through
            ctx["store"].write(docs, "docs_decon")
            return
        flagged = CUR.decontaminate(docs, bench, "doc_id", "text")
        ctx["store"].write(
            docs.join(
                flagged.where(F.col("contaminated")).select("doc_id"),
                "doc_id",
                "left_anti",
            ),
            "docs_decon",
        )

    @dag.task("classify", upstream=("decontaminate",))
    def classify(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_decon")
        dim = ctx.get("clf_dim", 256)
        feats = V.hashed_tfidf(docs, dim=dim, l2_normalize=False)
        # weak labels from the heuristic score — the bootstrap every
        # real pipeline uses before human labels exist
        labeled = feats.withColumn(
            "label", (F.col("q_score") >= 0.5).cast("int")
        )
        w = CL.train_logreg(
            labeled, "tfidf", "label", dim, iterations=ctx.get("clf_iters", 40)
        )
        scored = feats.withColumn(
            "quality_prob", F.round(CL.logreg_score("tfidf", w), 6)
        ).drop("tfidf")
        ctx["store"].write(scored, "docs_scored")

    @dag.task("budget_sample", upstream=("classify",))
    def budget_sample(ctx):
        """Optional fixed-budget cut: when the context carries
        ``sample_docs``, keep that many documents drawn WITHOUT
        replacement with inclusion ∝ classifier quality
        (Efraimidis–Spirakis, deterministic under ``sample_salt``) —
        the quality-weighted downsample real pipelines apply when
        the cleaned corpus still exceeds the training budget.
        Pass-through otherwise, like the decontaminate stage."""
        docs = ctx["store"].read(ctx["spark"], "docs_scored")
        n = ctx.get("sample_docs")
        if n:
            docs = SA.weighted_sample(
                docs,
                "doc_id",
                "quality_prob",
                n,
                salt=ctx.get("sample_salt", "budget"),
            )
        ctx["store"].write(docs, "docs_sampled")

    @dag.task("split", upstream=("budget_sample",))
    def split(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_sampled")
        ctx["store"].write(
            SA.hash_split(docs, "doc_id", {"train": 0.95, "eval": 0.05}),
            "docs_final",
        )

    @dag.task("export_shards", upstream=("split",))
    def export_shards(ctx):
        """Optional terminal handoff to the training data loader
        (opt-in via ``shards_dir``, pass-through otherwise — the
        decontaminate/budget_sample pattern): the train split lands
        as ``shard_id=N`` parquet dirs in a deterministic global
        shuffle order plus a JSON manifest
        (``operators.sampling.write_training_shards``). This is where
        a pretraining pipeline actually ENDS — curated docs are no
        use to a loader until they're sharded and order-randomized;
        ``n_shards`` (default 64) sizes shards to loader workers,
        ``shard_seed`` fixes the epoch-0 order."""
        out = ctx.get("shards_dir")
        if out:
            docs = ctx["store"].read(ctx["spark"], "docs_final")
            ctx["shards_manifest"] = SA.write_training_shards(
                docs.where(F.col("split") == "train"),
                out,
                "doc_id",
                n_shards=ctx.get("n_shards", 64),
                seed=ctx.get("shard_seed", ""),
                # docs_final carries per-doc token counts (the signals
                # stage) — the manifest's per-shard token totals are
                # what a loader schedules epochs by
                token_col="n_tokens" if "n_tokens" in docs.columns else None,
            )

    @dag.task("report", upstream=("export_shards",))
    def report(ctx):
        docs = ctx["store"].read(ctx["spark"], "docs_final")
        ctx["store"].write(
            docs.groupBy("split", "lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.round(F.avg("quality_prob"), 4).alias("avg_quality"),
            ),
            "curation_report",
        )

    return dag
