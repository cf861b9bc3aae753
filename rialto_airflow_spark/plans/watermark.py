"""Harvest watermark semantics (SURVEY §1.1, §2.4 A4, §2.2 P3/P9) and
the M1 author upsert with its conflict rules.

The `harvest` table is tiny bookkeeping — driver-side operations on a
DataFrame are fine (orderBy desc limit 1 over a handful of rows); the
predicates it parameterizes (P3) push down into the big scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rialto_airflow_spark.operators.merge import merge_on_key


def latest_harvest(harvests: DataFrame) -> Row | None:
    """A4 — newest harvest by created_at
    (publish/publication.py:360-364)."""
    rows = harvests.orderBy(F.col("created_at").desc()).limit(1).collect()
    return rows[0] if rows else None


def previous_harvest(harvests: DataFrame, current: Row) -> Row | None:
    """schema/rialto.py:218-239: latest FINISHED harvest strictly
    older than the current one; a full harvest has no previous (no
    date limit applies)."""
    if current["is_full"]:
        return None
    rows = (
        harvests.where(F.col("finished_at").isNotNull())
        .where(F.col("created_at") < F.lit(current["created_at"]))
        .orderBy(F.col("created_at").desc())
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def harvest_complete(harvests: DataFrame) -> bool:
    """P9 — publish short-circuit (publish/publication.py:355-379):
    the newest harvest must be finished."""
    newest = latest_harvest(harvests)
    return newest is not None and newest["finished_at"] is not None


def fill_in_predicate(source: str, watermark: Column | None) -> Column:
    """P3 — incremental fill-in scope (openalex.py:161-173 et al.):
    full harvest: doi present and never harvested from this source;
    incremental: doi present, touched since the watermark, and this
    source's payload still missing."""
    if watermark is None:
        return F.col("doi").isNotNull() & F.col(f"{source}_harvested").isNull()
    return (
        F.col("doi").isNotNull()
        & (F.col("updated_at") >= watermark)
        & F.col(f"{source}_json").isNull()
    )


def needs_distillation() -> Column:
    """P5 — conditional re-distillation predicate
    (schema/rialto.py:116-126, applied per-row by
    harvest_incremental/distill.py:17-65): a publication is
    (re-)distilled when it has never been distilled, or when an
    upsert touched it since (``updated_at > distilled_at`` — the
    MERGE refreshes ``updated_at`` only on actual change, so an
    untouched pub keeps its watermark and is skipped).

    NULL-safe by construction: a NULL ``updated_at`` must mean SKIP
    for an already-distilled row, not a NULL predicate (which would
    drop the row from BOTH the distill and the keep branch of a
    where/where-not split)."""
    return F.col("distilled_at").isNull() | (
        F.col("updated_at").isNotNull()
        & (F.col("updated_at") > F.col("distilled_at"))
    )


def clear_author_links(author_edges: DataFrame, is_full: bool) -> DataFrame:
    """M5 — full harvests reset all pub↔author edges
    (authors.py:176-189)."""
    if not is_full:
        return author_edges
    return author_edges.limit(0)


def upsert_authors(
    existing: DataFrame, incoming: DataFrame, now: Column | None = None
) -> DataFrame:
    """M1 — author upsert by sunet with the reference's conflict
    rules (authors.py:87-139), re-expressed set-based:

      * new sunet → insert;
      * same sunet, all values equal → noop (updated_at preserved —
        handled by merge_on_key's only-update-on-change? the
        reference's noop guard exists to protect updated_at; we
        replicate by refreshing updated_at only for changed rows);
      * ORCID conflict with a DIFFERENT existing sunet → incoming row
        skipped (authors.py:55-60);
      * cap_profile_id conflict → incoming row overwrites the
        existing author row, keeping its id and edges
        (authors.py:115-139).
    """
    now = now if now is not None else F.current_timestamp()
    data_cols = [
        c
        for c in incoming.columns
        if c not in ("id", "created_at", "updated_at")
    ]

    # --- cap_profile_id conflict: re-key the incoming row to the
    # existing author (it keeps that author's id/edges)
    cap_owner = existing.where(F.col("cap_profile_id").isNotNull()).select(
        F.col("cap_profile_id").alias("__cap"), F.col("sunet").alias("__cap_sunet")
    )
    inc = incoming.alias("i").join(
        F.broadcast(cap_owner),
        F.col("i.cap_profile_id") == F.col("__cap"),
        "left",
    )
    inc = inc.select(
        *[
            F.coalesce(F.col("__cap_sunet"), F.col("i.sunet")).alias("sunet")
            if c == "sunet"
            else F.col(f"i.{c}").alias(c)
            for c in data_cols
        ]
    )

    # --- ORCID conflict: drop incoming rows whose orcid belongs to a
    # different existing sunet (skip + warn in the reference)
    orcid_owner = existing.where(F.col("orcid").isNotNull()).select(
        F.col("orcid").alias("__oo"), F.col("sunet").alias("__oo_sunet")
    )
    inc = (
        inc.alias("i")
        .join(F.broadcast(orcid_owner), F.col("i.orcid") == F.col("__oo"), "left")
        .where(F.col("__oo_sunet").isNull() | (F.col("__oo_sunet") == F.col("i.sunet")))
        .select(*[F.col(f"i.{c}").alias(c) for c in data_cols])
    )

    # --- last row per sunet wins within the batch (file order is the
    # reference's loop order; we use a deterministic stand-in)
    w = Window.partitionBy("sunet").orderBy(*[F.col(c) for c in data_cols])
    inc = inc.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    ).drop("__rn")

    # --- noop detection: only refresh updated_at when a value changed
    merged = merge_on_key(
        existing, inc, "sunet", update_cols=data_cols, updated_at_col=None
    )
    e = existing.select(
        F.col("sunet").alias("__s"),
        F.col("updated_at").alias("__old_updated"),
        F.struct(*[F.col(c) for c in data_cols if c != "sunet"]).alias("__old_vals"),
    )
    out = merged.join(F.broadcast(e), merged["sunet"] == F.col("__s"), "left")
    changed = F.col("__old_vals").isNull() | (
        F.struct(*[F.col(c) for c in data_cols if c != "sunet"]) != F.col("__old_vals")
    )
    return (
        out.withColumn(
            "updated_at",
            F.when(changed, now).otherwise(F.col("__old_updated")),
        )
        .withColumn(
            "created_at",
            F.coalesce(F.col("created_at"), now),
        )
        .drop("__s", "__old_updated", "__old_vals")
    )
