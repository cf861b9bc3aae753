"""Declarative data-quality constraints (the Deequ/Great-Expectations
pattern, re-expressed as ONE Spark aggregation): a pipeline gate that
validates a table before publishing — the engine-side counterpart of
the reference's schema constraints (unique DOI, non-null keys,
approved-flag domains) that Postgres enforced per-row.

Design: every columnar check compiles to an aggregate EXPRESSION, and
``run_checks`` evaluates all of them in a single ``agg()`` — one scan
of the table regardless of how many checks, with map-side partial
aggregation (the single-pass property is what makes a 100-TB gate
affordable; per-check scans are the naive N-pass trap). Referential
checks (`foreign_key`) need a second table and run as LEFT ANTI
joins — one each, broadcast when the parent's key set is small.

Each check yields (name, passed, observed) where ``observed`` is the
violation count (or observed fraction for ``completeness``), so a
report is actionable, not just red/green.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    observed: Any


def not_null(col: str) -> tuple[str, Column, Any]:
    """Violations = rows where ``col`` is NULL."""
    return (
        f"not_null({col})",
        F.count_if(F.col(col).isNull()),
        lambda v: v == 0,
    )


def completeness(col: str, at_least: float) -> tuple[str, Column, Any]:
    """Fraction of non-null values must be ≥ ``at_least``."""
    return (
        f"completeness({col}>={at_least})",
        F.round(
            F.count_if(F.col(col).isNotNull()) / F.count(F.lit(1)), 6
        ),
        lambda v: v is not None and v >= at_least,
    )


def unique(*cols: str) -> tuple[str, Column, Any]:
    """Violations = rows beyond the first per key (NULL keys are
    exempt, matching SQL UNIQUE semantics)."""
    key_ok = F.lit(True)
    for c in cols:
        key_ok = key_ok & F.col(c).isNotNull()
    keyed = F.when(key_ok, F.struct(*[F.col(c) for c in cols]))
    return (
        f"unique({','.join(cols)})",
        F.count(keyed) - F.count_distinct(keyed),
        lambda v: v == 0,
    )


def in_range(col: str, lo, hi) -> tuple[str, Column, Any]:
    """Violations = non-null values outside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col},[{lo},{hi}])",
        F.count_if(c.isNotNull() & ((c < lo) | (c > hi))),
        lambda v: v == 0,
    )


def accepted_values(col: str, values: tuple) -> tuple[str, Column, Any]:
    """Violations = non-null values outside the accepted set."""
    c = F.col(col)
    return (
        f"accepted_values({col})",
        F.count_if(c.isNotNull() & ~c.isin(*values)),
        lambda v: v == 0,
    )


def matches(col: str, pattern: str) -> tuple[str, Column, Any]:
    """Violations = non-null values not fully matching ``pattern``."""
    c = F.col(col)
    return (
        f"matches({col})",
        F.count_if(c.isNotNull() & ~c.rlike(pattern)),
        lambda v: v == 0,
    )


def run_checks(df: DataFrame, checks: list[tuple]) -> list[CheckResult]:
    """Evaluate all columnar checks in ONE aggregation pass."""
    if not checks:
        return []
    aggs = [expr.alias(f"__c{i}") for i, (_, expr, _) in enumerate(checks)]
    row = df.agg(*aggs).collect()[0]
    return [
        CheckResult(name, bool(ok(row[f"__c{i}"])), row[f"__c{i}"])
        for i, (name, _, ok) in enumerate(checks)
    ]


def foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> CheckResult:
    """Referential integrity: non-null child keys must exist in the
    parent's key set. One LEFT ANTI join (broadcast by default —
    parent key dims are small by contract; disable for fact-to-fact
    checks)."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.where(F.col(child_col).isNotNull())
        .join(keys, child_col, "left_anti")
        .count()
    )
    return CheckResult(
        f"foreign_key({child_col}->{parent_col})", orphans == 0, orphans
    )


def profile_columns(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """ANALYZE-style column profile in ONE aggregation pass (the same
    single-scan discipline as ``run_checks``): for every column one
    output row ``(column, dtype, n_rows, n_nulls, null_frac,
    approx_distinct, min_value, max_value)``.

    All per-column statistics compile into one ``agg()`` — null
    counts are ``count_if``, distincts are HLL
    (``approx_count_distinct`` at ``rsd`` relative error), min/max
    cast to string for a uniform report schema (complex types —
    arrays/maps/structs — profile nulls and distincts but skip
    min/max, which aren't ordered). The wide one-row result unpivots
    driver-side: #columns cells, metadata-sized.

    Use it for ingest drift review (yesterday's profile vs today's),
    picking broadcast candidates (approx_distinct · row size), and
    choosing range-partition/Z-order columns (min/max spread)."""
    from rialto_airflow_spark.functions.perf import local_df

    return local_df(df.sparkSession, profile_rows(df, rsd), PROFILE_SCHEMA)


PROFILE_SCHEMA = (
    "column string, dtype string, n_rows long, n_nulls long, "
    "null_frac double, approx_distinct long, "
    "min_value string, max_value string"
)


def profile_rows(df: DataFrame, rsd: float = 0.02) -> list[tuple]:
    """The driver-side rows behind :func:`profile_columns` (schema
    ``PROFILE_SCHEMA``): ONE distributed aggregation pass, then a
    metadata-sized unpivot in the driver. Exposed so callers composing
    the profile with other driver-small frames (q52's exact-distinct
    gate) can assemble the final rows without paying extra Spark jobs
    for joins of a handful of metadata rows."""
    simple = {
        c: t
        for c, t in df.dtypes
        if not t.startswith(("array", "map", "struct", "binary"))
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__null_{c}"))
        aggs.append(
            F.approx_count_distinct(c, rsd).alias(f"__dist_{c}")
        )
        if c in simple:
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0]  # ONE row: #columns · 4 cells

    dtypes = dict(df.dtypes)
    return [
        (
            c,
            dtypes[c],
            row["__n"],
            row[f"__null_{c}"],
            round(row[f"__null_{c}"] / row["__n"], 6) if row["__n"] else 0.0,
            row[f"__dist_{c}"],
            row[f"__min_{c}"] if c in simple else None,
            row[f"__max_{c}"] if c in simple else None,
        )
        for c in df.columns
    ]
