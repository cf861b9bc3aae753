"""Golden tests for the distiller library (D1-D18).

Fixtures are original JSON payloads shaped per FIXTURES.md §3 (the
reference's payload shapes); expected values follow the reference's
documented precedence/normalization semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.functions.distill import distill
from rialto_airflow_spark.sources.dims import apc_lookup, issn_source

OPENALEX = {
    "id": "https://openalex.org/W1",
    "title": "OpenAlex Title",
    "type": "article",
    "publication_year": 2019,
    "biblio": {"issue": "2", "first_page": "10", "last_page": "20", "volume": "7"},
    "primary_location": {
        "source": {
            "type": "journal",
            "display_name": "Primary Journal",
            "host_organization_name": "Big Publisher",
            "issn_l": "1111-2222",
            "issn": ["1111-2222", "3333-444X"],
        }
    },
    "locations": [
        {"source": {"display_name": "Repo", "type": "repository"}},
        {"source": {"display_name": "The Journal", "type": "journal"}},
    ],
    "authorships": [
        {"author": {"display_name": "Ada Lovelace", "orcid": "https://orcid.org/0000-0001-0000-0001"}},
        {"author": {"display_name": "Grace Hopper", "orcid": None}},
        {"author": {"display_name": "Alan Turing", "orcid": "https://orcid.org/0000-0001-0000-0003"}},
    ],
    "abstract_inverted_index": {"Deep": [0], "learning": [1], "wins": [2], "again": [3]},
    "cited_by_count": 41,
    "apc_paid": {"value_usd": 1500},
    "apc_list": {"value_usd": 2000},
    "open_access": {"oa_status": "gold"},
    "grants": [{"funder": "https://openalex.org/F4320306076"}],
}

DIM = {
    "id": "pub.100",
    "type": "article",
    "title": "Dim Title",
    "year": 2020,
    "journal": {"title": "Dim Journal"},
    "issue": "3",
    "pages": "100-110",
    "volume": "9",
    "issn": ["5555-6666", "1111-2222"],
    "abstract": "Dim abstract.",
    "recent_citations": 12,
    "open_access": ["oa_all", "green"],
    "authors": [
        {"first_name": "Ada", "last_name": "Lovelace", "orcid": ["0000-0001-0000-0001"]},
        {"first_name": "Alan", "last_name": "Turing", "orcid": []},
    ],
    "funders": [{"id": "grid.1.1", "name": "NSF"}],
}

SULPUB = {
    "sulpubid": "42",
    "title": "SulPub Title",
    "type": "article",
    "year": "2018",
    "journal": {"name": "Sul Journal", "issue": "4", "pages": "5-6", "volume": "11", "year": "2017"},
    "issn": "7777-8888",
    "author": [{"name": "Stanford, L. D."}, {"name": "Hopper, G."}],
    "authorship": [{"cap_profile_id": "cap1", "status": "approved"}],
}

WOS_LIST = {
    "UID": "WOS:000123",
    "static_data": {
        "summary": {
            "pub_info": {"pubyear": 2021, "issue": "6", "vol": "3",
                         "page": {"begin": "1", "end": "9"}},
            "titles": {"title": [
                {"type": "source", "content": "Wos Journal"},
                {"type": "item", "content": "Wos Item Title"},
            ]},
            "names": {"name": [
                {"display_name": "Lovelace, Ada", "orcid_id": "0000-0001-0000-0001"},
                {"display_name": "Turing, Alan", "orcid_id": None},
            ]},
        },
        "fullrecord_metadata": {"normalized_doctypes": {"doctype": ["Article", "Review"]}},
    },
    "dynamic_data": {
        "cluster_related": {"identifiers": {"identifier": [
            {"type": "doi", "value": "10.1/wos"}, {"type": "pmid", "value": "999"}]}},
        "citation_related": {"tc_list": {"silo_tc": [
            {"coll_id": "WOS", "local_count": 77}]}},
    },
}

WOS_SINGLETON = {
    "UID": "WOS:000124",
    "static_data": {
        "summary": {
            "titles": {"title": {"type": "item", "content": "Singleton Title"}},
            "names": {"name": {"display_name": "Solo, Han", "orcid_id": "0000-0002-0000-0002"}},
        },
        "fullrecord_metadata": {"normalized_doctypes": {"doctype": "Editorial"}},
    },
}

PUBMED = {
    "MedlineCitation": {
        "Article": {
            "ArticleTitle": "PubMed Title",
            "Journal": {
                "Title": "PM Journal",
                "ISSN": {"@IssnType": "Print", "#text": "9999-000X"},
                "JournalIssue": {"Volume": "5", "Issue": "1"},
            },
            "Abstract": {"AbstractText": [
                {"@Label": "BG", "#text": "Background text."},
                "Plain segment.",
                {"@Label": "E", "#text": ""},
            ]},
            "PublicationTypeList": {"PublicationType": [
                {"#text": "Journal Article"}, {"#text": "Review"}]},
            "AuthorList": {"Author": [
                {"ForeName": "Ada", "LastName": "Lovelace",
                 "Identifier": {"@Source": "ORCID", "#text": "https://orcid.org/0000-0001-0000-0001"}},
                {"ForeName": "Grace", "LastName": "Hopper"},
            ]},
        }
    },
    "PubmedData": {"ArticleIdList": {"ArticleId": [
        {"@IdType": "pubmed", "#text": "12345"},
        {"@IdType": "doi", "#text": "10.1/pm"}]}},
}

CROSSREF = {
    "DOI": "10.1/cr",
    "type": "journal-article",
    "title": ["Crossref Title"],
    "abstract": "<jats:title>Abstract</jats:title><jats:p>Crossref <jats:italic>text</jats:italic> here.</jats:p>",
    "author": [
        {"given": "Ada", "family": "Lovelace", "ORCID": "https://orcid.org/0000-0001-0000-0001"},
        {"given": "Grace", "family": "Hopper"},
    ],
    "container-title": ["CR Journal"],
    "ISSN": ["1234-5678"],
}


def make_pub(spark, **payloads):
    row = {f"{s}_json": None for s in
           ("openalex", "dim", "sulpub", "wos", "pubmed", "crossref")}
    for k, v in payloads.items():
        row[f"{k}_json"] = json.dumps(v)
    return spark.createDataFrame(
        [(1, *[row[f"{s}_json"] for s in
               ("openalex", "dim", "sulpub", "wos", "pubmed", "crossref")])],
        "id bigint, openalex_json string, dim_json string, sulpub_json string, "
        "wos_json string, pubmed_json string, crossref_json string",
    )


@pytest.fixture(scope="module")
def dims(spark):
    apc = apc_lookup(
        spark.createDataFrame(
            [
                ("5555-6666", None, "2020", "1200"),
                (None, "1111-2222", "2020", "900"),
                ("5555-6666", None, "2019", "-5"),
            ],
            "ISSN_1 string, ISSN_2 string, APC_year string, APC_USD string",
        )
    )
    issn = issn_source(
        spark.createDataFrame(
            [
                ("1111-2222", "Looked Up Journal", "Looked Up Publisher"),
                ("7777-8888", "Sul Looked Up", "Sul Pub House"),
            ],
            "issn string, display_name string, host_organization_name string",
        )
    )
    return apc, issn


def run(spark, dims, **payloads):
    apc, issn = dims
    df = distill(make_pub(spark, **payloads), apc_dim=apc, issn_source_dim=issn)
    return df.collect()[0]


def test_full_precedence(spark, dims):
    r = run(spark, dims, openalex=OPENALEX, dim=DIM, sulpub=SULPUB,
            wos=WOS_LIST, pubmed=PUBMED, crossref=CROSSREF)
    assert r["title"] == "SulPub Title"           # sulpub first (D1)
    assert r["pub_year"] == 2020                  # dim first (D2)
    assert r["types"] == ["Article"]              # dim 'article' -> Article (D4)
    assert r["open_access"] == "green"            # dim, 'oa_all' skipped (D3)
    assert r["citation_count"] == 77              # max(41, 12, 77) (D10)
    assert r["pages"] == "10-20"                  # openalex join (D15)
    assert r["issue"] == "2"                      # openalex (D16)
    assert r["volume"] == "7"                     # openalex (D17)
    assert r["publisher"] == "Big Publisher"      # openalex host org (D5)
    assert r["journal_name"] == "The Journal"     # type=='journal' leg (D6)
    # D7: union of all sources' valid ISSNs, sorted, piped
    assert r["journal_issn"] == "1111-2222|1234-5678|3333-444X|5555-6666|7777-8888|9999-000X"
    assert r["abstract"] == "Deep learning wins again"   # openalex rebuild (D9)
    assert r["author_list_names"] == ["Ada Lovelace", "Grace Hopper", "Alan Turing"]
    assert r["first_author_name"] == "Ada Lovelace"
    assert r["last_author_name"] == "Alan Turing"
    assert r["author_list_orcids"] == ["0000-0001-0000-0001", "0000-0001-0000-0003"]
    assert r["first_author_orcid"] == "0000-0001-0000-0001"
    # openalex authorships[-1] has an orcid
    assert r["last_author_orcid"] == "0000-0001-0000-0003"
    assert r["apc"] == 1500                       # apc_paid positive (D8)


def test_wos_fallbacks(spark, dims):
    r = run(spark, dims, wos=WOS_LIST)
    assert r["title"] == "Wos Item Title"         # type=='item' filter
    assert r["pub_year"] == 2021
    assert r["types"] == ["Article"]              # ['article','review'] -> sorted distinct
    assert r["author_list_names"] == ["Lovelace, Ada", "Turing, Alan"]
    assert r["author_list_orcids"] == ["0000-0001-0000-0001"]
    assert r["citation_count"] == 77


def test_wos_singleton_shapes(spark, dims):
    r = run(spark, dims, wos=WOS_SINGLETON)
    assert r["title"] == "Singleton Title"        # dict-not-list titles.title
    assert r["author_list_names"] == ["Solo, Han"]
    assert r["first_author_orcid"] == "0000-0002-0000-0002"
    assert r["types"] == ["Editorial Material "]  # trailing space preserved


def test_pubmed_fallbacks(spark, dims):
    r = run(spark, dims, pubmed=PUBMED)
    assert r["types"] == ["Article"]              # journal article + review -> Article
    assert r["abstract"] == "Background text. Plain segment."
    assert r["author_list_names"] == ["Ada Lovelace", "Grace Hopper"]
    assert r["author_list_orcids"] == ["0000-0001-0000-0001"]
    assert r["first_author_orcid"] == "0000-0001-0000-0001"
    assert r["last_author_orcid"] is None         # last author has no ORCID
    assert r["issue"] == "1"
    assert r["volume"] == "5"
    assert r["journal_issn"] == "9999-000X"


def test_crossref_and_sulpub(spark, dims):
    r = run(spark, dims, sulpub=SULPUB, crossref=CROSSREF)
    assert r["title"] == "SulPub Title"
    assert r["pub_year"] == 2018                  # sulpub year beats journal.year
    assert r["abstract"] == "Crossref text here."  # JATS stripped
    # sulpub reorder: "Stanford, L. D." -> "L. D. Stanford" — but
    # crossref precedes sulpub for names
    assert r["author_list_names"] == ["Ada Lovelace", "Grace Hopper"]
    r2 = run(spark, dims, sulpub=SULPUB)
    assert r2["author_list_names"] == ["L. D. Stanford", "G. Hopper"]
    # sulpub-only publisher/journal via ISSN dim lookup (S10 fallback)
    assert r2["publisher"] == "Sul Pub House"
    assert r2["journal_name"] == "Sul Looked Up"


def test_invalid_year_guard(spark, dims):
    dim = dict(DIM, year=2999)                     # future year -> skip to openalex
    r = run(spark, dims, dim=dim, openalex=OPENALEX)
    assert r["pub_year"] == 2019


def test_apc_ladder(spark, dims):
    # no apc_paid, dataset hit on dim issn 5555-6666 @2020 -> 1200
    oa = {k: v for k, v in OPENALEX.items() if k not in ("apc_paid", "apc_list")}
    r = run(spark, dims, openalex=oa, dim=DIM)
    assert r["apc"] == 1200
    # closed access zeroes an APC int (post-rule)
    oa2 = dict(oa, open_access={"oa_status": "closed"})
    dim2 = {k: v for k, v in DIM.items() if k != "open_access"}
    r2 = run(spark, dims, openalex=oa2, dim=dim2)
    assert r2["apc"] == 0
    # preprint types -> 0 regardless
    oa3 = dict(OPENALEX, type="preprint")
    r3 = run(spark, dims, openalex=oa3)
    assert r3["types"] == ["Preprint"] and r3["apc"] == 0
    # no dataset/openalex info: oa status fallbacks
    r4 = run(spark, dims, openalex={"open_access": {"oa_status": "hybrid"}, "type": "article"})
    assert r4["apc"] == 3600
    r5 = run(spark, dims, openalex={"open_access": {"oa_status": "gold"}, "type": "article"})
    assert r5["apc"] == 2450
    # negative dataset APC -> treated as missing (apc/__init__.py:25)
    dim3 = dict(DIM, issn=["5555-6666"], year=2019)
    oa4 = {"type": "article"}
    r6 = run(spark, dims, openalex=oa4, dim=dict(dim3, open_access=["closed"]))
    # negative dataset value is no-match; 'closed' only zeroes an int
    # match, so the whole ladder falls through (apc.py:31-42)
    assert r6["apc"] is None


def test_types_default_capitalize(spark, dims):
    r = run(spark, dims, dim={"type": "weird-NEW-thing"})
    assert r["types"] == ["Weird-new-thing"]      # Python capitalize semantics


def test_empty_everything(spark, dims):
    r = run(spark, dims)
    assert r["title"] is None
    assert r["types"] == []
    assert r["author_list_names"] == []
    assert r["author_list_orcids"] == []
    assert r["journal_issn"] is None
    assert r["apc"] is None
