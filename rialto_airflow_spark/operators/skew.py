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
    """
    build_rep = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    probe_s = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)).cast("int"),
    )
    out = probe_s.join(build_rep, [on, "__salt"], how)
    return out.drop("__salt")
