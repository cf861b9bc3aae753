"""Coverage for the remaining source/dim operators: S2 active-authors
CSV scan, S15 ROR↔GRID dim, and the J8 broadcast-map usage shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rialto_airflow_spark.sources.authors_csv import (
    load_active_authors,
    load_authors,
)
from rialto_airflow_spark.sources.dims import ror_grid


def _write_csv(tmp_path, name, header, rows):
    p = tmp_path / name
    p.write_text("\n".join([header] + rows) + "\n")
    return str(p)


def test_load_active_authors(spark, tmp_path):
    path = _write_csv(
        tmp_path,
        "authors_active.csv",
        "sunetid,first_name,last_name,orcidid,role,academic_council,"
        "primary_school,primary_department,primary_division,"
        "all_schools,all_departments,active",
        [
            "jdoe,Jane,Doe,https://orcid.org/0000-0001-2345-6789,faculty,true,"
            "Engineering,CS,Sciences,Engineering,CS,true",
            "asmith,Al,Smith,,staff,false,Medicine,Surgery,,Medicine,Surgery,true",
        ],
    )
    rows = {r.sunetid: r for r in load_active_authors(spark, path).collect()}
    assert rows["jdoe"].orcidid == "https://orcid.org/0000-0001-2345-6789"
    assert rows["asmith"].orcidid is None  # blank → null (orcid.py:29-35)
    assert rows["jdoe"].primary_school == "Engineering"


def test_active_authors_header_contract(spark, tmp_path):
    path = _write_csv(
        tmp_path, "bad.csv", "sunetid,first_name", ["x,Y"]
    )
    with pytest.raises(ValueError, match="expected to include"):
        load_active_authors(spark, path)


def test_load_authors_coercions(spark, tmp_path):
    path = _write_csv(
        tmp_path,
        "authors.csv",
        "sunetid,cap_profile_id,first_name,last_name,orcidid,role,"
        "academic_council,primary_school,primary_department,primary_division,"
        "all_schools,all_departments,active",
        [
            'jdoe,123,Jane,Doe,0000-0001-2345-6789,faculty,true,'
            "Engineering,CS,Sciences,Engineering|Medicine,CS|Surgery,true",
            "blank,,B,Lank,,staff,false,,,,,,false",
        ],
    )
    rows = {r.sunet: r for r in load_authors(spark, path).collect()}
    assert rows["jdoe"].schools == ["Engineering", "Medicine"]
    assert rows["jdoe"].academic_council is True
    assert rows["blank"].cap_profile_id is None  # blank → null
    assert rows["blank"].orcid is None
    assert rows["blank"].status is False


def test_ror_grid_broadcast_map(spark):
    raw = spark.createDataFrame(
        [("https://ror.org/01abc", "grid.1.2"), ("https://ror.org/02def", "grid.3.4")],
        ["rorId", "gridId"],
    )
    dim = ror_grid(raw)
    assert dim.columns == ["ror_id", "grid_id"]
    # J8 usage shape: broadcast map ror -> grid resolves funder rows
    funders = spark.createDataFrame(
        [("https://ror.org/01abc", "NSF"), ("https://ror.org/09zzz", "Unknown")],
        ["ror_id", "name"],
    )
    resolved = funders.join(F.broadcast(dim), "ror_id", "left").collect()
    got = {r.name: r.grid_id for r in resolved}
    assert got == {"NSF": "grid.1.2", "Unknown": None}
