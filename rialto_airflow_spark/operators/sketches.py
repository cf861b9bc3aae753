"""Mergeable-summary operators: HLL cardinality sketches and
Misra–Gries heavy hitters.

The 100-TB motivation is *mergeability* (Agarwal et al., "Mergeable
Summaries", PODS 2012): a sketch computed per partition / per day /
per source can be unioned later without rescanning the data, so
incremental pipelines keep one tiny sketch row per group instead of
re-aggregating history.

  * distinct_sketches / merge_distinct_sketches — Apache DataSketches
    HLL via the Spark 3.5+ built-ins (`hll_sketch_agg`,
    `hll_union_agg`, `hll_sketch_estimate`). The sketch column is a
    few KB per group regardless of cardinality; the union is an
    ordinary aggregation, so rolling a year of daily sketches into a
    yearly distinct count is |days| rows of input, not 100 TB.
  * heavy_hitters — frequent items without a full groupBy on a
    high-cardinality key. Pass 1 runs Misra–Gries summaries
    per physical partition (mapInPandas, zero shuffle; per-Arrow-batch
    `value_counts` keeps the Python work vectorized — the counter
    dict never exceeds ~k + batch-distinct entries). The MG guarantee
    composes across partitions: if an item's global count exceeds
    n/k, then in at least one partition its local count exceeds
    n_p/k (else summing the per-partition bounds contradicts the
    global count), and MG retains every such item — so the union of
    per-partition candidates contains every global heavy hitter.
    Pass 2 recounts ONLY the candidate set exactly (broadcast semi
    join + groupBy over ≤ partitions×k values), removing MG's
    undercount so reported counts are exact.

The count-min sketch (point frequencies) and the log-bucketed
histogram sketch (quantiles with bounded RELATIVE error) round out
the family below — each a sparse counter DataFrame whose merge is
exact addition. No operator here ships data to the driver beyond the
group/candidate rows the caller asked for. The reference has no sketch surface; this
extends SURVEY §2.4's aggregation family the way a training-data
pipeline needs (url/domain/license cardinality tracking, hot-token
audits) at corpus scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + point estimate of distinct ``value_col``.

    Output: ``group_cols + [hll_sketch (binary), approx_distinct]``.
    ``lgk`` is the DataSketches log2(registers) knob: relative
    standard error ≈ 1.04 / sqrt(2^lgk) (~1.6% at the default 12),
    sketch size ≈ 2^lgk bytes. The aggregation is map-side
    combinable — partial sketches merge in the combiner like any
    algebraic agg, so the shuffle carries one sketch per
    (partition, group), never raw values.

    Persist the sketch column (parquet binary) to make later windows
    incremental: tomorrow's rollup unions today's stored sketch with
    the new day's sketch via :func:`merge_distinct_sketches`.
    """
    sk = F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    out = df.groupBy(*group_cols).agg(sk)
    return out.withColumn(
        "approx_distinct", F.hll_sketch_estimate("hll_sketch")
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union stored HLL sketches (optionally rolled up to coarser
    groups) and re-estimate — the incremental path: input is sketch
    ROWS (one per fine group), not data.

    ``allowDifferentLgConfigK=True`` so sketches built at different
    lgk (e.g. a config change mid-history) still union, degrading to
    the smaller register set as DataSketches specifies.
    """
    agg = F.hll_union_agg(sketch_col, F.lit(True)).alias(sketch_col)
    if group_cols:
        out = sketches.groupBy(*group_cols).agg(agg)
    else:
        out = sketches.agg(agg)
    return out.withColumn(
        "approx_distinct", F.hll_sketch_estimate(sketch_col)
    )


def _mg_merge(counters: dict, batch: pd.Series, k: int) -> dict:
    """Merge one Arrow batch's exact value_counts into a Misra–Gries
    summary, then shrink back to ≤ k counters by subtracting the
    (k+1)-th largest count from every counter and dropping the
    non-positive ones (the mergeable-summaries MG reduction — it
    preserves the count-undercount bound n/ (k+1) ≤ n/k)."""
    for v, c in batch.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k:
        # (k+1)-th largest value is the decrement
        cuts = sorted(counters.values(), reverse=True)
        dec = cuts[k]
        counters = {v: c - dec for v, c in counters.items() if c > dec}
    return counters


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 50,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Top-``k`` most frequent values of ``value_col`` with EXACT
    counts, without shuffling the full distinct-value space.

    Two passes (see module docstring for the guarantee):

      1. mapInPandas Misra–Gries per partition with
         ``candidates_per_partition`` counters (default ``4·k`` for
         slack against near-threshold items) → candidate values.
         Zero shuffle; Python work is per-batch ``value_counts`` +
         a bounded dict merge.
      2. Exact recount of candidates only: the candidate set
         (≤ partitions × counters rows) broadcasts into a semi join,
         then an ordinary groupBy over the filtered rows. Both the
         join and the agg touch only rows whose value is a candidate.

    Output: ``value_col, freq`` — top-k by exact frequency,
    descending, ties broken by value for determinism. Exactness
    caveat: an item whose true count ≤ n/counters may be missed (the
    MG bound); raise ``candidates_per_partition`` to push that
    threshold down.
    """
    counters_k = candidates_per_partition or 4 * k

    def mg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            counters = _mg_merge(
                counters, pdf[value_col].dropna().value_counts(), counters_k
            )
        yield pd.DataFrame({value_col: list(counters.keys())})

    field = df.schema[value_col]
    cand = (
        df.select(value_col)
        .mapInPandas(mg, schema=f"{value_col} {field.dataType.simpleString()}")
        .distinct()
    )
    exact = (
        df.join(F.broadcast(cand), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # top-k via TakeOrderedAndProject — no global sort
    return exact.orderBy(F.col("freq").desc(), F.col(value_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cm_pos(key, depth_idx, width: int):
    """Row ``depth_idx``'s bucket for ``key``: xxhash64 with the depth
    index as an extra hashed column = an independent seed per row."""
    return F.pmod(F.xxhash64(key, depth_idx), F.lit(width))


def cm_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of
    ``key_col``'s frequency distribution, as a sparse
    ``(depth_idx, pos, cnt)`` DataFrame of ≤ depth×width rows —
    the point-query complement to the HLL (how many DISTINCT) and
    Misra–Gries (which are the TOP) sketches above, answering "about
    how often does key X occur" without a full groupBy on a
    high-cardinality key.

    Guarantees (standard CM): estimates never undercount; overcount
    ≤ (e/width)·N total weight with probability ≥ 1 − e^(−depth).
    Null keys are excluded (SQL semantics: a null key has no
    identity to count).

    Distributed shape: each row explodes to ``depth`` (row, bucket)
    increments MAP-SIDE, and the groupBy's partial aggregation
    collapses them before the exchange — the shuffle carries at most
    tasks × depth × width tiny rows, never the input. Merging two
    sketches is exact (counter addition), so per-day / per-source
    sketches roll up without rescanning — the mergeable-summaries
    contract this module exists for.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias(
                "depth_idx"
            ),
            _cm_pos(F.col(key_col), F.col("depth_idx"), width).alias("pos"),
            w.alias("__w"),
        )
        .groupBy("depth_idx", "pos")
        .agg(F.sum("__w").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Exact union of count-min sketches built with the SAME
    (width, depth): element-wise counter addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth_idx", "pos").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query a count-min sketch: for each key, the minimum over
    the ``depth`` rows of its bucket counters (absent bucket = 0).

    ``sketch`` is ≤ depth×width rows by construction → broadcast; the
    probe side explodes to ``depth`` rows per key, joins map-side,
    and the min aggregates back on the key — one keyed shuffle on the
    probe side only, proportional to |keys|·depth. NULL probe keys
    are excluded, mirroring the build side (the sketch never counted
    them, so reporting a colliding bucket's count would be wrong).
    """
    probes = keys.where(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias(
            "depth_idx"
        ),
    ).withColumn("pos", _cm_pos(F.col(key_col), F.col("depth_idx"), width))
    return (
        probes.join(F.broadcast(sketch), ["depth_idx", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


# ---------------------------------------------------------------------------
# log-bucketed histogram sketch (mergeable quantiles)
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bins_per_decade: int = 10,
) -> DataFrame:
    """Mergeable quantile summary via logarithmic bucketing (the
    HDR-histogram / DDSketch idea): positive values map to bucket
    ``floor(log10(v) · bins_per_decade)``, so each bucket spans a
    fixed RATIO (10^(1/bins_per_decade)) and any quantile read back
    from the sketch carries a bounded RELATIVE error of at most that
    ratio − 1 (~26% at 10 bins/decade, ~4.7% at 50) — the guarantee
    latency/size distributions actually want, where absolute-error
    sketches waste resolution on the tail.

    Output: ``group_cols + [bin, cnt]``, one sparse row per occupied
    bucket (≤ bins_per_decade × decades-spanned rows per group —
    ~400 for float64's full positive range). Zero, negative, NaN,
    and ±inf values land in the reserved underflow bucket (bin =
    NULL) — NaN would otherwise pass ``> 0`` under Spark's
    NaN-is-greatest ordering and bin as a real value, and +inf would
    bin to 2^63−1 and break the bounded-rows contract. NULL values
    are EXCLUDED entirely, matching ``percentile``/
    ``percentile_approx`` semantics (absent ≠ observed-as-zero), so
    sketch quantiles cross-check against the SQL functions. The
    aggregation is an ordinary map-side-combinable groupBy; merging
    sketches is exact counter addition
    (:func:`merge_histogram_sketches`), so per-day partial sketches
    roll up without rescanning — same contract as the HLL and
    count-min rows of this module.
    """
    v = F.col(value_col).cast("double")
    finite_pos = (v > 0) & ~F.isnan(v) & (v != F.lit(float("inf")))
    bin_ = F.when(
        finite_pos, F.floor(F.log10(v) * bins_per_decade).cast("long")
    )
    return (
        df.where(v.isNotNull())
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_sketches(*sketches: DataFrame) -> DataFrame:
    """Exact union of histogram sketches built with the SAME
    ``bins_per_decade``: counter addition per (group, bin)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    group_cols = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*group_cols).agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    q: float,
    bins_per_decade: int = 10,
) -> DataFrame:
    """Read quantile ``q`` out of a histogram sketch: per group, the
    smallest bin whose cumulative count reaches ``q · total``
    (underflow rows participate in the totals and rank below every
    positive bin, matching their ≤ 0 values), reported as the bin's
    geometric midpoint — relative error ≤ the bucket ratio − 1.

    One window pass over the sketch rows themselves (≤ a few hundred
    per group), never over the data: reading quantiles from a rolled-
    up year of daily sketches costs |bins| rows per group. Groups
    whose chosen quantile falls in the underflow bucket report NULL
    (no positive value to interpolate).
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("bin").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    ranked = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wall).alias("__tot"),
    )
    hit = (
        ranked.where(F.col("__cum") >= q * F.col("__tot"))
        .groupBy(*group_cols)
        .agg(
            F.min_by(F.col("bin"), F.col("__cum")).alias("bin"),
        )
    )
    mid = F.pow(
        F.lit(10.0), (F.col("bin") + 0.5) / F.lit(float(bins_per_decade))
    )
    # %g rounds instead of truncating (int(0.57*100) is 56) and keeps
    # q99.9 distinct from q99; dots become underscores for a plain
    # column name
    label = ("q%g" % (q * 100)).replace(".", "_")
    return hit.select(
        *group_cols,
        F.when(F.col("bin").isNotNull(), F.round(mid, 6)).alias(label),
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) theta sketch — distinct-count SET ALGEBRA
# ---------------------------------------------------------------------------
#
# HLL answers |A|, |A ∪ B|; it cannot intersect. The KMV/theta sketch
# (Bar-Yossef et al. 2002; Beyer et al. 2007 "On Synopses for
# Distinct-Value Estimation") keeps the k SMALLEST hash values of the
# distinct set — a uniform sample of the hash space — so two groups'
# sketches support union, intersection, and Jaccard estimates: the
# audience-overlap questions (users on source A AND source B) that
# every analytics deployment eventually asks of its distinct counts.
# Bottom-k is EXACTLY mergeable (bottom-k of unions of bottom-k's ==
# bottom-k of the union), unlike MG's lossy reduction.


def _kmv_u(value_col) -> "F.Column":
    """Deterministic uniform in [0, 1): xxhash64 mapped from signed
    long to the unit interval. No RNG — the same value always lands
    at the same point, which is what makes sketches of overlapping
    sets comparable.

    Known precision fold: the 64-bit hash is divided into a double,
    whose 53-bit mantissa collapses hashes that differ only in the
    bottom ~11 bits onto the same unit-interval point. Distinct
    values can therefore collide post-fold with probability ~2^-53
    per pair, deduplicating inside the sketch and biasing estimates
    FRACTIONALLY low — the effect scales with k (more retained
    points, more collision chances) but stays orders of magnitude
    inside the 1/sqrt(k-2) RSE envelope for any k a double-typed
    sketch can hold; the error-bound tests pin 4*RSE with margin.
    If exactness at extreme k ever matters, store the sorted signed
    longs themselves (bottom-k under long ordering is the same
    sketch, no fold) — the estimate arithmetic then divides at read
    time."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.xxhash64(c).cast("double") / F.lit(float(2**64)) + F.lit(0.5)


def _kmv_estimate(arr, k: int):
    """len(arr) < k → the sketch IS the distinct set (exact count);
    otherwise the classic (k-1)/theta with theta = k-th smallest."""
    n = F.size(arr)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(arr, k)
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch + distinct estimate. Output: group_cols +
    ``[kmv (array<double>, ascending, ≤ k), approx_distinct]``.
    Relative standard error ≈ 1/sqrt(k−2) (~6% at k=256); below k
    distinct values the count is EXACT (the sketch holds the whole
    hashed set).

    Two-phase shape (the Misra–Gries discipline): per-(group,
    input-partition) partials of ≤ k sorted distinct hashes, then a
    per-group merge whose input is ≤ partitions·k doubles — the
    shuffle never carries raw values, and no task ever materializes
    a group's full distinct set. NULL values are excluded (the
    ``countDistinct`` convention)."""
    u = _kmv_u(value_col)
    partials = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.spark_partition_id().alias("__p"))
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.collect_list(u))), 1, k
            ).alias("__part")
        )
    )
    merged = partials.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("__part")))),
            1,
            k,
        ).alias("kmv")
    )
    return merged.withColumn("approx_distinct", _kmv_estimate(F.col("kmv"), k))


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Union stored KMV sketch rows (optionally rolled up to coarser
    groups) — bottom-k of the concatenated sketches, which equals the
    sketch of the unioned data EXACTLY (pinned by test). Incremental
    path: input is sketch rows, never raw data."""
    agg = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
        1,
        k,
    ).alias(sketch_col)
    out = sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    return out.withColumn("approx_distinct", _kmv_estimate(F.col(sketch_col), k))


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    on: list[str] | None = None,
    k: int = 256,
    sketch_col: str = "kmv",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Union / intersection / Jaccard estimates from two sketch
    tables (Beyer et al. §4): take L = bottom-k of the two sketches'
    union, ρ = |L ∩ SA ∩ SB|; then Jaccard ≈ ρ/|L|, |A ∪ B| ≈
    (|L|−1)/θ_L, |A ∩ B| ≈ Jaccard · |A ∪ B|. Pure array algebra on
    ≤ k-element arrays — no raw data, no shuffle beyond the join on
    ``on`` (or a 1×1 crossJoin when ``on`` is None for whole-table
    sketches)."""
    ka, kb = f"{sketch_col}{suffixes[0]}", f"{sketch_col}{suffixes[1]}"
    sa = a.select(*(on or []), F.col(sketch_col).alias(ka))
    sb = b.select(*(on or []), F.col(sketch_col).alias(kb))
    joined = sa.join(sb, on) if on else sa.crossJoin(sb)
    both = F.array_sort(
        F.array_distinct(F.concat(F.col(ka), F.col(kb)))
    )
    L = F.slice(both, 1, k)
    nL = F.size(L)
    in_both = F.size(
        F.filter(
            L,
            lambda h: F.array_contains(F.col(ka), h)
            & F.array_contains(F.col(kb), h),
        )
    )
    union_est = F.when(
        F.size(both) < k, F.size(both).cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.element_at(L, k))
    jacc = F.when(nL > 0, in_both / nL.cast("double")).otherwise(F.lit(0.0))
    return joined.select(
        *(on or []),
        F.round(union_est, 4).alias("union_est"),
        F.round(jacc * union_est, 4).alias("intersection_est"),
        F.round(jacc, 6).alias("jaccard_est"),
    )
