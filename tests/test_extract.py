"""Golden tests for the cross-source ID extractors (N11-N13) and the
P6/P8 filters."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rialto_airflow_spark.functions import extract as X


def _one(spark, payload, fn):
    df = spark.createDataFrame([(json.dumps(payload),)], "j string")
    return df.select(fn(F.col("j")).alias("out")).collect()[0]["out"]


def test_sulpub_extractors(spark):
    top = {"doi": "https://doi.org/10.1/TOP", "wos_uid": "WOS:000X",
           "pmid": 123, "identifier": []}
    assert _one(spark, top, X.sulpub_extract_doi) == "10.1/top"
    assert _one(spark, top, X.sulpub_extract_wos_uid) == "000X"
    assert _one(spark, top, X.sulpub_extract_pmid) == "123"

    fb = {"identifier": [
        {"type": "PMID", "id": "MEDLINE:99"},
        {"type": "WosItemID", "id": "000Y"},
        {"type": "doi", "id": "10.2/fb"},
    ]}
    assert _one(spark, fb, X.sulpub_extract_doi) == "10.2/fb"
    assert _one(spark, fb, X.sulpub_extract_wos_uid) == "000Y"
    assert _one(spark, fb, X.sulpub_extract_pmid) == "99"

    # singleton identifier dict (dict-or-list shape)
    single = {"identifier": {"type": "doi", "id": "10.3/one"}}
    assert _one(spark, single, X.sulpub_extract_doi) == "10.3/one"


def test_wos_extractors(spark):
    pub = {"UID": "WOS:000123", "dynamic_data": {"cluster_related": {
        "identifiers": {"identifier": [
            {"type": "doi", "value": "10.4/WOS"},
            {"type": "pmid", "value": "MEDLINE:555"},
        ]}}}}
    assert _one(spark, pub, X.wos_uid) == "000123"
    assert _one(spark, pub, X.wos_get_doi) == "10.4/wos"
    assert _one(spark, pub, X.wos_get_pmid) == "555"
    # singleton identifier
    single = {"dynamic_data": {"cluster_related": {
        "identifiers": {"identifier": {"type": "doi", "value": "10.5/x"}}}}}
    assert _one(spark, single, X.wos_get_doi) == "10.5/x"
    # identifiers as empty string (observed payload quirk) -> null
    weird = {"dynamic_data": {"cluster_related": {"identifiers": ""}}}
    assert _one(spark, weird, X.wos_get_doi) is None


def test_pubmed_extractors(spark):
    pub = {"PubmedData": {"ArticleIdList": {"ArticleId": [
        {"@IdType": "pubmed", "#text": "777"},
        {"@IdType": "doi", "#text": "10.6/pm"},
    ]}}, "MedlineCitation": {"PMID": {"#text": "777"}}}
    assert _one(spark, pub, X.pubmed_get_doi) == "10.6/pm"
    assert _one(spark, pub, X.pubmed_pmid) == "777"
    # ELocationID fallback, singleton dict
    fb = {"MedlineCitation": {"Article": {"ELocationID":
          {"@EIdType": "doi", "#text": "10.7/eloc"}}}}
    assert _one(spark, fb, X.pubmed_get_doi) == "10.7/eloc"


def test_approved_filter(spark):
    yes = {"authorship": [{"status": "denied"}, {"status": "approved"}]}
    no = {"authorship": [{"status": "denied"}]}
    none = {}
    assert _one(spark, yes, X.sulpub_approved) is True
    assert _one(spark, no, X.sulpub_approved) is False
    assert _one(spark, none, X.sulpub_approved) is False


def test_doi_queryability(spark):
    df = spark.createDataFrame(
        [("10.1/ok",), ("10.1/a,b",), ("doi:10.1/x",), ("10.1/pmcid:9",), (None,)],
        "doi string",
    )
    kept = [r["doi"] for r in df.where(X.openalex_queryable_doi(F.col("doi"))).collect()]
    assert kept == ["10.1/ok"]
    df2 = spark.createDataFrame(
        [("doi:10.1234/good",), ("doi:10.123/short",), ("10.1234/noprefix",)],
        "d string",
    )
    kept2 = [r["d"] for r in df2.where(X.crossref_queryable_doi(F.col("d"))).collect()]
    assert kept2 == ["doi:10.1234/good"]
