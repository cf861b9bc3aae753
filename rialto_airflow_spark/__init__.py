"""rialto_airflow_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of sul-dlss/rialto-airflow (see SURVEY.md) on top of the
Spark DataFrame API: declarative plans optimized by Catalyst, set-based
MERGE instead of row-at-a-time upserts, broadcast dimension joins
instead of memoized per-row lookups, and window-function survivor
selection instead of imperative dedup loops.

Layout:
    session    — tuned SparkSession builder
    schemas    — StructTypes for the harvest/report data model
    functions/ — normalizers (Column fns) + the distiller rule cascade
    operators/ — merge, dedup (exact/minhash/simhash/jaccard), similarity,
                 text analysis, multimodal plumbing
    sources/   — CSV/JSONL readers + broadcast dims
    plans/     — report-mart pipelines and the CLI query
    streaming/ — availableNow incremental ingest
"""

__version__ = "0.1.0"
