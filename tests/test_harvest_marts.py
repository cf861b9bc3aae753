"""Tests for the harvest post-processing plans and report marts,
mirroring the reference's end-to-end task tests
(test/harvest_incremental/test_deduplicate.py, test/publish/
test_publication.py) over an in-memory dataset."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.plans import harvest as H
from rialto_airflow_spark.plans import marts as M
from rialto_airflow_spark.plans.cli import publications_for_author
from rialto_airflow_spark.sources.dims import federal_funders

# slow integration battery — excluded from the default lane (see
# pyproject.toml); run with: pytest tests/ -m slowlane
pytestmark = pytest.mark.slowlane

TS = datetime.datetime


def ts(day):
    return TS(2024, 1, day)


PUB_SCHEMA = (
    "id bigint, doi string, title string, pub_year int, open_access string, "
    "apc int, publisher string, journal_name string, types array<string>, "
    "abstract string, citation_count int, "
    "author_list_names array<string>, author_list_orcids array<string>, "
    "first_author_name string, first_author_orcid string, "
    "last_author_name string, last_author_orcid string, "
    "pages string, issue string, volume string, "
    "academic_council_authored boolean, faculty_authored boolean, "
    "openalex_json string, dim_json string, sulpub_json string, "
    "wos_json string, pubmed_json string, crossref_json string, "
    "wos_id string, pubmed_id string, "
    "openalex_harvested timestamp, dim_harvested timestamp, "
    "sulpub_harvested timestamp, wos_harvested timestamp, "
    "pubmed_harvested timestamp, distilled_at timestamp, "
    "created_at timestamp, updated_at timestamp"
)


def mkpub(i, doi=None, openalex_id=None, wos_id=None, updated=1, dim=False, **kw):
    base = {c.split()[0]: None for c in PUB_SCHEMA.split(", ")}
    base.update(
        id=i,
        doi=doi,
        title=f"T{i}",
        types=["Article"],
        openalex_json=json.dumps({"id": openalex_id}) if openalex_id else None,
        dim_json=json.dumps(kw.pop("dim_json")) if "dim_json" in kw else (json.dumps({"id": f"pub.{i}"}) if dim else None),
        wos_id=wos_id,
        updated_at=ts(updated),
        created_at=ts(1),
    )
    base.update(kw)
    return base


@pytest.fixture(scope="module")
def dataset(spark):
    pubs = spark.createDataFrame(
        [
            # W1 duplicate group: 1 (older) and 2 (newer survivor)
            mkpub(1, openalex_id="W1", updated=1, dim_harvested=ts(1)),
            mkpub(2, openalex_id="W1", updated=5, dim_harvested=ts(1)),
            # distinct pub with doi (not in dedup scope despite same id)
            mkpub(3, doi="10.1/a", openalex_id="W1", updated=3,
                  sulpub_harvested=ts(1),
                  dim_json={"id": "pub.3", "funders": [
                      {"id": "grid.1", "name": "National Institutes of Health (NIH)"},
                      {"id": "grid.2", "name": "Acme Foundation"}]}),
            # wos_id duplicate group: 4 survives (newer)
            mkpub(4, wos_id="000A", updated=9, wos_harvested=ts(1)),
            mkpub(5, wos_id="000A", updated=2),
            # orphan candidate (no author edge)
            mkpub(6, doi="10.1/orphan", pubmed_harvested=ts(1)),
            # openalex-only (dropped by marts' P2 filter)
            mkpub(7, doi="10.1/oaonly", openalex_harvested=ts(1)),
        ],
        PUB_SCHEMA,
    )
    authors = spark.createDataFrame(
        [
            (10, "ada", None, "0-0-0-1", "Ada", "L", True, True, "faculty",
             ["Eng"], ["CS"], "Eng", "CS", None, ts(1), ts(1)),
            (11, "gho", None, None, "Grace", "H", True, False, "staff",
             ["Med"], ["Bio"], "Med", "Bio", None, ts(1), ts(1)),
        ],
        "id bigint, sunet string, cap_profile_id string, orcid string, "
        "first_name string, last_name string, status boolean, "
        "academic_council boolean, role string, schools array<string>, "
        "departments array<string>, primary_school string, primary_dept string, "
        "primary_division string, created_at timestamp, updated_at timestamp",
    )
    author_edges = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 10), (3, 11), (4, 10), (5, 11), (7, 10)],
        "publication_id bigint, author_id bigint",
    )
    funder_edges = spark.createDataFrame(
        [], "publication_id bigint, funder_id bigint"
    )
    funders = spark.createDataFrame(
        [],
        "grid_id string, name string, federal boolean, ror_id string, "
        "openalex_id string, id bigint",
    )
    federal = federal_funders(
        spark.createDataFrame(
            [("National Institutes of Health (NIH)", "grid.1")],
            "name string, id string",
        )
    )
    return pubs, authors, author_edges, funder_edges, funders, federal


def test_dedup_survivors_and_edges(spark, dataset):
    pubs, authors, author_edges, funder_edges, *_ = dataset
    out_pubs, out_ae, out_fe = H.remove_duplicates(pubs, author_edges, funder_edges)
    ids = {r["id"] for r in out_pubs.select("id").collect()}
    # 1 loses to 2 (newer), 5 loses to 4; doi'd pub 3 not in scope
    assert ids == {2, 3, 4, 6, 7}
    edges = {(r[0], r[1]) for r in out_ae.collect()}
    # pub 1's edge to ada re-pointed to survivor 2; pub 5's to 4
    assert (2, 10) in edges and (1, 10) not in edges
    assert (4, 11) in edges and (5, 11) not in edges


def test_orphan_removal(spark, dataset):
    pubs, authors, author_edges, funder_edges, *_ = dataset
    out_pubs, out_ae, _ = H.remove_duplicates(pubs, author_edges, funder_edges)
    kept = H.remove_orphans(out_pubs, out_ae)
    ids = {r["id"] for r in kept.select("id").collect()}
    assert 6 not in ids  # no author edge -> deleted
    assert ids == {2, 3, 4, 7}


def test_link_funders_dim_leg(spark, dataset):
    pubs, authors, author_edges, funder_edges, funders, federal = dataset
    funders_out, edges_out = H.link_funders(
        pubs, funders, funder_edges, federal
    )
    fs = {r["grid_id"]: (r["name"], r["federal"]) for r in funders_out.collect()}
    assert fs["grid.1"] == ("National Institutes of Health (NIH)", True)
    assert fs["grid.2"] == ("Acme Foundation", False)
    # edges land on pub 3 only (the one with dim funders)
    eps = {r["publication_id"] for r in edges_out.collect()}
    assert eps == {3}
    assert edges_out.count() == 2


def test_author_flags(spark, dataset):
    pubs, authors, author_edges, *_ = dataset
    out = H.author_flags(pubs, author_edges, authors)
    rows = {r["id"]: (r["academic_council_authored"], r["faculty_authored"])
            for r in out.collect()}
    assert rows[3] == (True, True)     # ada is council+faculty
    assert rows[2] == (False, False)   # only gho (staff)
    assert rows[6] == (False, False)   # no authors at all


def test_upsert_source_batch(spark, dataset):
    pubs, *_ = dataset
    batch = spark.createDataFrame(
        [("10.1/a", json.dumps({"id": "W9"}), ts(9)),
         ("10.1/new", json.dumps({"id": "W10"}), ts(9)),
         (None, json.dumps({"id": "W11"}), ts(9))],
        "doi string, openalex_json string, openalex_harvested timestamp",
    )
    merged = H.upsert_source_batch(pubs, batch, "openalex", now=F.lit(ts(9)))
    rows = {r["doi"]: r for r in merged.where(F.col("doi").isNotNull()).collect()}
    # matched: openalex cols updated, other cols kept
    assert json.loads(rows["10.1/a"]["openalex_json"])["id"] == "W9"
    assert rows["10.1/a"]["title"] == "T3"
    assert rows["10.1/a"]["updated_at"] == ts(9)
    # unmatched batch row inserted
    assert rows["10.1/new"]["openalex_harvested"] == ts(9)
    # null-doi batch row always inserts; existing null-doi rows kept
    assert merged.where(F.col("doi").isNull()).count() == 4 + 1
    # untouched rows keep their updated_at
    assert rows["10.1/orphan"]["updated_at"] == ts(1)
    # existing null-doi rows are NOT treated as inserts: payloads and
    # updated_at survive untouched (regression: presence-marker bug)
    nulls = {r["id"]: r for r in merged.where(F.col("doi").isNull()).collect()}
    assert json.loads(nulls[1]["openalex_json"])["id"] == "W1"
    assert nulls[2]["updated_at"] == ts(5)
    assert nulls[5]["updated_at"] == ts(2)


@pytest.fixture(scope="module")
def linked(spark, dataset):
    pubs, authors, author_edges, funder_edges, funders, federal = dataset
    pubs2, ae, fe = H.remove_duplicates(pubs, author_edges, funder_edges)
    pubs2 = H.remove_orphans(pubs2, ae)
    funders2, fe2 = H.link_funders(pubs2, funders, fe, federal)
    pubs3 = H.author_flags(pubs2, ae, authors)
    return pubs3, authors, ae, fe2, funders2


def test_mart_publications(spark, linked):
    pubs, authors, ae, fe, funders = linked
    m = M.mart_publications(pubs, fe, funders)
    rows = {r["doi"]: r for r in m.collect()}
    # P2: openalex-only pub 7 dropped; survivors 2 (null doi), 3, 4 kept
    assert set(rows) == {"10.1/a", None}  # pubs 2 and 4 share doi=None
    assert rows["10.1/a"]["federally_funded"] is True
    assert rows["10.1/a"]["types"] == "Article"
    assert rows[None]["federally_funded"] is False
    assert m.count() == 3


def test_mart_by_school_grain(spark, linked):
    pubs, authors, ae, fe, funders = linked
    m = M.mart_publications_by_school(pubs, ae, authors, fe, funders)
    rows = [(r["doi"], r["primary_school"]) for r in m.collect()]
    # pub 3 has authors in Eng and Med -> two rows
    assert ("10.1/a", "Eng") in rows and ("10.1/a", "Med") in rows
    assert len(rows) == 4  # pub2/Med, pub3/Eng, pub3/Med, pub4/Eng


def test_mart_by_author_unique(spark, linked):
    pubs, authors, ae, fe, funders = linked
    m = M.mart_publications_by_author(pubs, ae, authors, fe, funders)
    assert m.count() == 4
    r = m.where(F.col("doi") == "10.1/a").orderBy("sunet").collect()
    assert [x["sunet"] for x in r] == ["ada", "gho"]
    assert r[0]["grant_ids"] is None
    assert r[0]["federally_funded"] is True


def test_download_format(spark, linked):
    pubs, authors, ae, fe, funders = linked
    m = M.format_for_download(M.mart_publications(pubs, fe, funders))
    r = m.where(F.col("doi") == "10.1/a").collect()[0]
    assert r["federally_funded"] == "true"
    assert r["academic_council_authored"] == "true"


def test_cli_publications(spark, linked):
    pubs, authors, ae, fe, funders = linked
    out = publications_for_author("ada", pubs, ae, authors, fe, funders)
    rows = {r["doi"]: r for r in out.collect()}
    # ada: pub 3, pub 4 (via repointed edge), pub 2 (edge repointed from
    # 1), pub 7 — the CLI applies no source-coverage filter (cli.py)
    assert set(rows) == {"10.1/a", "10.1/oaonly", None}
    r = rows["10.1/a"]
    assert set(r["authors"].split("|")) == {"ada", "gho"}
    assert set(r["funders"].split("|")) == {
        "National Institutes of Health (NIH)", "Acme Foundation"}
    assert r["sources"] == "dim|openalex"


def test_cli_from_store_prunes_to_author_buckets(spark, linked, tmp_path):
    """K4 against a persisted manifest pubs table: the store-backed
    CLI variant path-selects only the author's publications' buckets
    (read_keys) instead of scanning the table, and its output equals
    the plain-path CLI bit-for-bit."""
    import glob as _glob

    from rialto_airflow_spark.plans.cli import (
        publications_for_author_from_store,
    )
    from rialto_airflow_spark.storage import TableStore

    pubs, authors, ae, fe, funders = linked
    store = TableStore(str(tmp_path))
    # pad the table with filler ids so the bucket spread is real (the
    # fixture alone fills ~4 of 32 buckets); no edges point at filler,
    # so the CLI result is unchanged
    many = pubs
    for off in (1000, 2000, 3000, 4000, 5000):
        many = many.unionByName(pubs.withColumn("id", F.col("id") + off))
    store.write_manifest(many, "publications", "id", n_buckets=32)

    out = publications_for_author_from_store(
        "ada", spark, store, "publications", ae, authors, fe, funders
    )
    want = publications_for_author(
        "ada", store.read(spark, "publications"), ae, authors, fe, funders
    )
    assert sorted(
        map(tuple, out.collect()), key=str
    ) == sorted(map(tuple, want.collect()), key=str)
    # plan evidence: the pubs scan touched <= (author's pubs) bucket
    # dirs, a sliver of the 32-bucket table
    n_ids = ae.join(
        authors.where(F.col("sunet") == "ada").select(
            F.col("id").alias("aid")
        ),
        F.col("author_id") == F.col("aid"),
    ).select("publication_id").distinct().count()
    touched = {p.rsplit("/", 2)[-2] for p in out.inputFiles()}
    total_leaves = len(
        _glob.glob(store.current_info("publications")["path"] + "/__bucket=*")
    )
    assert len(touched) <= n_ids < total_leaves
