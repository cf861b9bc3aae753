"""S1/S2 — authors CSV sources.

Reference: harvest_incremental/authors.py:19-66 (full load),
publish/orcid.py:17-52 (active authors). Row-at-a-time DictReader +
per-row coercion becomes one declarative CSV scan + Column casts; the
header contract (authors.py:142-164) is enforced before any job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rialto_airflow_spark.functions.normalize import to_array, to_boolean

REQUIRED_HEADERS = (
    "sunetid",
    "first_name",
    "last_name",
    "orcidid",
    "role",
    "academic_council",
    "primary_school",
    "primary_department",
    "primary_division",
    "all_schools",
    "all_departments",
    "active",
)


def check_headers(df: DataFrame, path: str) -> None:
    """authors.py:142-164: required headers must be a subset of the
    file's headers."""
    missing = set(REQUIRED_HEADERS) - set(df.columns)
    if missing:
        raise ValueError(
            f"Headers in {path} are {df.columns}, expected to include "
            f"{list(REQUIRED_HEADERS)}"
        )


def load_authors(spark: SparkSession, path: str) -> DataFrame:
    """CSV → author rows with the reference's column mapping and
    coercions (authors.py:70-86): empty string → null for
    cap_profile_id/orcid, strict booleans, pipe-split arrays."""
    raw = spark.read.csv(path, header=True)
    check_headers(raw, path)
    blank_null = lambda c: F.when(F.col(c) != "", F.col(c))  # noqa: E731
    return raw.select(
        F.col("sunetid").alias("sunet"),
        blank_null("cap_profile_id").alias("cap_profile_id")
        if "cap_profile_id" in raw.columns
        else F.lit(None).cast("string").alias("cap_profile_id"),
        blank_null("orcidid").alias("orcid"),
        F.col("first_name"),
        F.col("last_name"),
        to_boolean("active").alias("status"),
        to_boolean("academic_council").alias("academic_council"),
        F.col("role"),
        to_array("all_schools").alias("schools"),
        to_array("all_departments").alias("departments"),
        F.col("primary_school"),
        F.col("primary_department").alias("primary_dept"),
        F.col("primary_division"),
    )


def load_active_authors(spark: SparkSession, path: str) -> DataFrame:
    """S2 — publish/orcid.py:17-52: the author-orcids report rows."""
    raw = spark.read.csv(path, header=True)
    check_headers(raw, path)
    return raw.select(
        F.col("sunetid").alias("sunetid"),
        F.col("first_name"),
        F.col("last_name"),
        F.when(F.col("orcidid") != "", F.col("orcidid")).alias("orcidid"),
        F.col("orcid_update_scope")
        if "orcid_update_scope" in raw.columns
        else F.lit(None).cast("string").alias("orcid_update_scope"),
        F.col("role"),
        F.col("primary_affiliation")
        if "primary_affiliation" in raw.columns
        else F.lit(None).cast("string").alias("primary_affiliation"),
        F.col("primary_school"),
        F.col("primary_department"),
        F.col("primary_division"),
    )
