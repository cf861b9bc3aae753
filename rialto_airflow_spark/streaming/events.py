"""Structured Streaming incremental ingest (SURVEY §2.11 stretch
goal): the harvest watermark pattern (`updated_at >=
harvest.created_at`, P3) re-expressed as an availableNow stream, plus
a stateful windowed aggregation with late-data watermarking.

The reference's incrementality is batch + a watermark table; this
module shows the same pipeline shape running as a stream so new
payload batches landing in a directory are ingested exactly-once via
the checkpoint, with no reprocessing of old files — the Spark-native
replacement for the harvest bookkeeping at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (schema fixed up
    front — streaming sources cannot infer)."""
    return spark.readStream.schema(EVENTS_DDL).parquet(path)


def windowed_counts(events: DataFrame, window: str = "1 hour", late: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type: late rows
    beyond `late` are dropped, state is bounded (the streaming analog
    of the A5 scope-count aggregation)."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of windowed_counts (same keys/aggregates, no
    watermark) — used to verify the stream's emitted rows."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame, id_cols: list[str] | None = None, late: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once dedup: drop rows whose ``id_cols`` were
    already seen, with state bounded by the event-time watermark
    (entries older than ``late`` are evicted — the streaming twin of
    exact_dedup). Input batches that re-deliver the same events (the
    at-least-once delivery every real bus has) come out exactly
    once."""
    return events.withWatermark("ts", late).dropDuplicates(
        (id_cols or ["event_id"]) + ["ts"]
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running event count that survives across micro-batches
    (state = one long per user). The Arrow-batched state API is the
    escape hatch for aggregations Spark's built-ins can't express —
    this one is deliberately simple so the state plumbing (schema,
    update, timeout) is the thing under test."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_fn(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now_memory(
    agg: DataFrame, checkpoint: str, query_name: str
) -> None:
    """Drain an update-mode stream into an in-memory table (update
    sinks can't write parquet; memory is the verification sink)."""
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    agg: DataFrame, checkpoint: str, out_path: str
) -> None:
    """Drain everything currently available, then stop — the
    incremental-batch execution mode (one harvest run). Re-running
    with the same checkpoint processes only NEW files: the
    watermark-table semantics without the table."""
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
