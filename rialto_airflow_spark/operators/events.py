"""Event-stream batch operators: sessionization, as-of join, and
interval range join.

None exist in the reference (its incrementality is a batch
watermark, SURVEY §2.11), but all are core event-pipeline operators
a training-data platform needs, and all are expressed as
compositions of built-in operators — no UDFs, no custom physical
operator.

Scale design:
  * ``sessionize`` is one shuffle on the entity key; the gap detection
    and session numbering are a lag + running sum inside the same
    window partition, so skewed users are bounded by AQE and the
    per-partition work is a single sorted pass.
  * ``asof_join`` uses the union-and-carry-forward factorization
    instead of a range join: tag both sides, union, sort within the
    key partition once, carry the right side's values forward with
    ``last(ignorenulls)``. Cost is O((|L|+|R|) log) per key with ONE
    shuffle — a naive range join is O(|L|·|R|) per key and needs a
    range-join physical strategy Spark lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-key session sequence number: a new session starts
    when the gap to the previous event exceeds ``gap_seconds``.

    Adds columns ``is_session_start`` (boolean) and ``session_seq``
    (1-based within the key). Deterministic given a unique
    (key, ts, *order_cols) ordering.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = prev_ts.isNull() | (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
        > gap_seconds
    )
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", new_sess).withColumn(
        "session_seq", F.sum(new_sess.cast("int")).over(run)
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregates: event count, start/end timestamps,
    duration in seconds. One extra map-side-combinable groupBy on the
    (key, session_seq) pair — same partitioning as the sessionize
    shuffle, so AQE can often avoid a second exchange."""
    # project before the window: the session boundaries need only
    # (key, ts, order cols), and dropping payload columns here cuts
    # the shuffle + sort bytes by the payload width (events' `props`
    # string dominates the row otherwise)
    slim = df.select(key_col, ts_col, *(order_cols or []))
    s = sessionize(slim, key_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "asof_ts",
    dedup_right: bool = False,
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the right
    row's ``value_cols`` from the latest right timestamp ≤ the left
    timestamp, per key. Left rows with no prior right row keep nulls.

    Semantics match DuckDB/pandas ``ASOF JOIN`` with a ``>=``
    condition. The right side must be unique per (key, ts) — enforce
    upstream (e.g. aggregate), pass ``dedup_right=True`` to have the
    operator keep the greatest ``value_cols`` tuple per (key, ts)
    (deterministic up to ties in the values themselves), or accept
    that ties resolve arbitrarily.

    Implementation: union-and-carry-forward (see module docstring).
    Right rows sort BEFORE left rows at an equal timestamp so equality
    matches, mirroring the ``>=`` bound.
    """
    if dedup_right:
        wdup = Window.partitionBy(key_col, ts_col).orderBy(
            *[F.col(c).desc_nulls_last() for c in value_cols]
        )
        right = (
            right.withColumn("__dup_rn", F.row_number().over(wdup))
            .where(F.col("__dup_rn") == 1)
            .drop("__dup_rn")
        )
    lcols = left.columns
    # Carry ONE struct per right row (never null for a right row, even
    # when every value inside it is NULL) so a single
    # last(ignorenulls) returns the matched row WHOLESALE — a NULL
    # value in the matched row stays NULL instead of being replaced by
    # an older row's value, matching DuckDB/pandas ASOF exactly.
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts_col).alias("__ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__r_row"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r_row"].dataType).alias("__r_row"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r_row", ignorenulls=True).over(w)
    carried = u.select(
        *lcols,
        F.col("__side"),
        matched["__ts"].alias(right_ts_alias),
        *[matched[c].alias(c) for c in value_cols],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval containment join: every left row pairs with the right
    rows whose ``[start, end]`` window contains its timestamp, per
    key — the point-in-interval join behind promo attribution,
    maintenance-window filtering, validity-interval lookups.

    Spark has no range-join physical strategy, so the naive
    formulation is a per-key theta join: O(|L|·|R|) comparisons per
    key. This factorization BUCKETIZES time instead: left rows key to
    their one ``bucket_seconds`` bucket, right intervals explode to
    every bucket they overlap, and the join becomes an EQUI-join on
    (key, bucket) that Spark hash-partitions like any other, with the
    exact containment predicate as a post-join filter. A left row has
    exactly one bucket and an interval's exploded buckets are
    distinct, so a (row, interval) pair can match at most once — no
    dedup needed.

    Cost: candidates per left row are bounded by the intervals
    overlapping ONE bucket; right fan-out is interval_length /
    bucket_seconds rows per interval. Tune ``bucket_seconds`` toward
    the typical interval length (fan-out ~2 buckets); pathological
    long intervals fan out proportionally — split those upstream or
    raise the bucket size.
    """
    ts_s = F.unix_timestamp(F.col(ts_col))
    lb = left.withColumn("__b", F.floor(ts_s / bucket_seconds))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    lcols = [F.col(f"l.{c}") for c in left.columns]
    rcols = [F.col(f"r.{c}") for c in right.columns if c != key_col]
    out = (
        lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
            & (F.col("l.__b") == F.col("r.__b")),
        )
        .where(
            (F.col(f"l.{ts_col}") >= F.col(f"r.{start_col}"))
            & (F.col(f"l.{ts_col}") <= F.col(f"r.{end_col}"))
        )
        .select(*lcols, *rcols)
    )
    return out


def rolling_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    prefix: str = "roll",
) -> DataFrame:
    """Trailing time-window aggregates per key: for every event, the
    count / sum / mean of ``value_col`` over the preceding
    ``window_seconds`` (inclusive of the current row) — the moving
    baseline behind rate limiting, anomaly scoring, and feature
    engineering on event streams.

    One shuffle on the key; the frame is a RANGE window over epoch
    seconds (``rangeBetween(-window, 0)``), so each partition is one
    sorted pass with a sliding aggregate — no self-join, no explode,
    O(n log n) per key regardless of window length. Equivalent SQL
    (``RANGE BETWEEN x PRECEDING AND CURRENT ROW``) runs unchanged in
    DuckDB, which the tests exploit as the oracle.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-window_seconds, 0)
    )
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias(f"{prefix}_n"),
        F.round(F.sum(value_col).over(w), 6).alias(f"{prefix}_sum"),
        F.round(F.avg(value_col).over(w), 6).alias(f"{prefix}_mean"),
    )


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) lookup: attach the dimension
    attributes whose validity interval covers each fact's timestamp —
    the warehouse pattern behind "what was this customer's segment
    WHEN the order happened".

    Composition, not a new operator: an :func:`asof_join` on
    ``valid_from`` (backward, per key) followed by an expiry check
    against the matched version's ``valid_to`` (NULL = current, open
    interval; expired matches null out their attributes). Inherits
    the as-of join's single-shuffle union-and-carry shape — no range
    join, no per-key theta join. For a CORRECT SCD2 history
    (non-overlapping intervals per key), interval membership and
    latest-``valid_from``-at-or-before are equivalent, which is what
    makes the cheap as-of factorization valid.
    """
    attr_cols = attr_cols or [
        c for c in dim.columns if c not in (key_col, valid_from, valid_to)
    ]
    # asof_join keys both sides on the SAME ts column name; align the
    # dim's validity start under the fact's ts column name
    d = dim.select(
        F.col(key_col),
        F.col(valid_from).alias(ts_col),
        F.col(valid_to).alias("__vt"),
        *[F.col(c) for c in attr_cols],
    )
    out = asof_join(
        facts, d, key_col, ts_col, value_cols=attr_cols + ["__vt"],
        right_ts_alias="__version_start",
    )
    live = F.col("__vt").isNull() | (F.col(ts_col) < F.col("__vt"))
    cleaned = out.select(
        *facts.columns,
        *[
            F.when(live, F.col(c)).alias(c)
            for c in attr_cols
        ],
        F.when(live, F.col("__version_start")).alias("version_start"),
    )
    return cleaned
