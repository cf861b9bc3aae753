"""Tests for the ORCID stats/adoption operators (A5/A6/A10)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rialto_airflow_spark.plans import orcid as O


def test_latest_record_and_scope_stats(spark):
    users = spark.createDataFrame(
        [
            (1, "0-1", json.dumps(["/read-limited", "/activities/update"])),
            (2, "0-1", json.dumps(["/read-limited"])),       # later wins
            (3, "0-2", "/read-limited"),                      # scalar scope
            (4, "0-3", json.dumps(["/read-limited", "/activities/update"])),
            (5, None, "/read-limited"),                       # no orcid_id
        ],
        "ingest_order bigint, orcid_id string, scope string",
    )
    latest = O.latest_orcid_records(users)
    assert latest.count() == 3
    kept = {r["orcid_id"]: r["ingest_order"] for r in latest.collect()}
    assert kept["0-1"] == 2

    stats = O.orcid_stats(latest, today=F.lit("04/23/2024")).collect()[0]
    # scopes: 0-1 read-limited; 0-2 read-limited; 0-3 both
    assert stats["date_label"] == "04/23/2024"
    assert stats["read_only_scope"] == 2   # 3 limited - 1 write
    assert stats["read_write_scope"] == 1


def test_orcid_adoption(spark):
    authors = spark.createDataFrame(
        [
            ("a", "faculty", "Eng", "CS", "0-1"),
            ("b", "faculty", "Eng", "CS", None),
            ("c", "faculty", "Med", "Bio", "0-2"),
            ("d", "msstudent", "Eng", "CS", None),
        ],
        "sunet string, role string, primary_school string, primary_dept string, orcid string",
    )
    r = O.orcid_adoption(authors, "faculty").collect()[0]
    assert (r["n"], r["percent"]) == (3, 66.7)
    r2 = O.orcid_adoption(authors, "faculty", school="Eng").collect()[0]
    assert (r2["n"], r2["percent"]) == (2, 50.0)
    r3 = O.orcid_adoption(authors, "msstudent", present=False).collect()[0]
    assert (r3["n"], r3["percent"]) == (1, 100.0)
