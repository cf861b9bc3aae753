"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime
(session.py enables it); these explicit helpers cover the two shapes
AQE cannot fix:

  * a grouped aggregation where one key dominates (AQE cannot split
    a single group) — ``salted_agg`` runs a two-phase aggregate:
    partial per (key, salt), then final per key. Works for any
    algebraic aggregate list.
  * a join where one probe-side key floods a task — ``salted_join``
    explodes the build side R ways and salts the probe side, so the
    hot key spreads over R tasks. Only worth it when the build side
    is small enough to replicate (it usually is: dims).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets): derived from a
    stable hash of the whole row (no RNG — replayable)."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: Callable[[], list[Column]],
    final: Callable[[], list[Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with ``partial``
    aggregates, then groupBy(keys) with ``final`` aggregates over the
    partials. The hot key's rows spread over ``buckets`` tasks in
    phase one; phase two only sees ``buckets`` rows per key.

    partial/final are factories returning aliased aggregate Columns;
    final's inputs are partial's output aliases.
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(*partial())
    return phase1.groupBy(*keys).agg(*final())


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the build side once per
    salt bucket, salt the probe side, join on (key, salt). Build-side
    rows multiply by ``buckets`` — use only when build is dim-sized.

    The probe salt is CONTENT-derived (xxhash64 over all probe
    columns, the same recipe as ``with_salt``), not
    ``monotonically_increasing_id`` — mii changes across task
    retries and repartitioning, violating this module's no-RNG
    replayability rule (round-6 verdict). Correctness never depended
    on the salt value (the build side is replicated across ALL
    salts), but replayable plans must hash content. Fully identical
    probe rows share a salt bucket; that's bounded residual skew by
    the duplicate count, not a correctness issue.
    """
    build_rep = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    probe_s = probe.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(buckets)
        ).cast("int"),
    )
    out = probe_s.join(build_rep, [on, "__salt"], how)
    return out.drop("__salt")


def skew_stats(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 5,
) -> DataFrame:
    """Key-distribution profile for a prospective groupBy/join on
    ``keys`` — the measurement that decides BETWEEN the plain
    operator, AQE's runtime splitting, and the explicit salting
    helpers above (guessing a salt factor without this is cargo
    culting).

    ONE row out: ``(n_rows, n_keys, max_key_rows, top_share,
    topN_share, mean_key_rows, p99_key_rows, skew_ratio,
    suggested_buckets)`` where ``skew_ratio = max_key_rows /
    mean_key_rows`` (1 = perfectly uniform) and ``suggested_buckets``
    is the power of two that would spread the hottest key to roughly
    mean-sized slices (capped at 64; 1 = salting buys nothing).

    Cost shape: one map-side-combinable count per key, then (a) a
    single-row algebraic reduction over the per-key counts (max /
    avg / approx-percentile — all sketch- or scalar-state, NEVER a
    collect of the key table) and (b) a TakeOrdered(top_n) for the
    top-N mass — bounded work regardless of key cardinality. Read
    the row, then: skew_ratio ≲ 4 → do nothing (AQE handles it);
    hot key in a JOIN → ``salted_join`` with ``suggested_buckets``;
    hot key in an AGG → ``salted_agg`` (AQE cannot split a single
    group)."""
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_total = F.sum("__n")
    totals = per_key.agg(
        w_total.alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_key_rows"),
        F.round(F.avg("__n"), 2).alias("mean_key_rows"),
        F.percentile_approx("__n", 0.99).alias("p99_key_rows"),
    )
    top = (
        per_key.select("__n")
        .orderBy(F.col("__n").desc())
        .limit(top_n)  # TakeOrderedAndProject: bounded, no global sort
        .agg(F.sum("__n").alias("__top_sum"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(F.col("max_key_rows") / F.col("n_rows"), 6).alias("top_share"),
        F.round(F.col("__top_sum") / F.col("n_rows"), 6).alias(
            f"top{top_n}_share"
        ),
        "mean_key_rows",
        "p99_key_rows",
        F.round(
            F.col("max_key_rows") / F.col("mean_key_rows"), 2
        ).alias("skew_ratio"),
        F.least(
            F.lit(64),
            F.pow(
                F.lit(2.0),
                F.ceil(
                    F.log2(
                        F.greatest(
                            F.col("max_key_rows") / F.col("mean_key_rows"),
                            F.lit(1.0),
                        )
                    )
                ),
            ).cast("int"),
        ).alias("suggested_buckets"),
    )
