"""Cross-source ID extractors — SURVEY §2.9 N11-N13 and the P6/P8
filters, as Column expressions over raw JSON payload strings.

These are what populate the publication table's doi/wos_id/pubmed_id
columns at merge time (K1/M2) — the reference calls them per row
inside its upsert loops; here they run once, set-based, at landing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rialto_airflow_spark.functions.normalize import (
    normalize_doi,
    normalize_pmid,
    normalize_wos_id,
)
from rialto_airflow_spark.functions.rules import dict_or_list


def _first_typed(ids: Column, type_field: str, want, value_field: str) -> Column:
    """First element whose type matches (case handling per caller)."""
    return F.get(F.filter(ids, want), 0)[value_field]


# --- N13: SUL-Pub (sul_pub.py:132-173) --------------------------------------


def _sulpub_identifiers(json_col: Column) -> Column:
    return dict_or_list(
        F.get_json_object(json_col, "$.identifier"), "type: string, id: string"
    )


def sulpub_extract_doi(json_col: Column) -> Column:
    """Top-level doi (truthy) else identifier[type=='doi'].id,
    normalized."""
    top = F.get_json_object(json_col, "$.doi")
    ids = _sulpub_identifiers(json_col)
    fallback = _first_typed(
        ids, "type", lambda i: (i["type"] == "doi") & i["id"].isNotNull(), "id"
    )
    return normalize_doi(F.when(top.isNotNull() & (top != ""), top).otherwise(fallback))


def sulpub_extract_wos_uid(json_col: Column) -> Column:
    """Top-level wos_uid else identifier type in WoSItemID/WosItemID/
    WosUID, normalized."""
    top = F.get_json_object(json_col, "$.wos_uid")
    ids = _sulpub_identifiers(json_col)
    fallback = _first_typed(
        ids,
        "type",
        lambda i: i["type"].isin("WoSItemID", "WosItemID", "WosUID"),
        "id",
    )
    return normalize_wos_id(
        F.when(top.isNotNull() & (top != ""), top).otherwise(fallback)
    )


def sulpub_extract_pmid(json_col: Column) -> Column:
    """Top-level pmid else identifier type 'pmid' (case-insensitive),
    normalized."""
    top = F.get_json_object(json_col, "$.pmid")
    ids = _sulpub_identifiers(json_col)
    fallback = _first_typed(
        ids, "type", lambda i: F.lower(F.coalesce(i["type"], F.lit(""))) == "pmid", "id"
    )
    return normalize_pmid(
        F.when(top.isNotNull() & (top != ""), top).otherwise(fallback)
    )


# --- N11: WoS (wos.py:399-445) ----------------------------------------------


def _wos_identifiers(json_col: Column) -> Column:
    """dynamic_data.cluster_related.identifiers is dict-or-STRING; its
    identifier child is dict-or-list."""
    raw = F.get_json_object(
        json_col, "$.dynamic_data.cluster_related.identifiers.identifier"
    )
    return dict_or_list(raw, "type: string, value: string")


def wos_get_doi(json_col: Column) -> Column:
    ids = _wos_identifiers(json_col)
    return normalize_doi(
        _first_typed(ids, "type", lambda i: i["type"] == "doi", "value")
    )


def wos_get_pmid(json_col: Column) -> Column:
    ids = _wos_identifiers(json_col)
    return normalize_pmid(
        _first_typed(ids, "type", lambda i: i["type"] == "pmid", "value")
    )


def wos_uid(json_col: Column) -> Column:
    return normalize_wos_id(F.get_json_object(json_col, "$.UID"))


# --- N12: PubMed (pubmed.py:340-381) ----------------------------------------


def pubmed_get_identifier(json_col: Column, id_type: str) -> Column:
    ids = dict_or_list(
        F.get_json_object(json_col, "$.PubmedData.ArticleIdList.ArticleId"),
        "`@IdType`: string, `#text`: string",
    )
    return _first_typed(
        ids, "@IdType", lambda i: i["@IdType"] == id_type, "#text"
    )


def pubmed_get_doi(json_col: Column) -> Column:
    """ArticleIdList doi, else ELocationID[@EIdType=='doi'] fallback."""
    eloc = dict_or_list(
        F.get_json_object(json_col, "$.MedlineCitation.Article.ELocationID"),
        "`@EIdType`: string, `#text`: string",
    )
    fallback = _first_typed(
        eloc, "@EIdType", lambda i: i["@EIdType"] == "doi", "#text"
    )
    return F.coalesce(pubmed_get_identifier(json_col, "doi"), fallback)


def pubmed_pmid(json_col: Column) -> Column:
    """MedlineCitation.PMID — xmltodict emits {'#text': ..} or a bare
    string depending on attributes."""
    raw = F.get_json_object(json_col, "$.MedlineCitation.PMID")
    texted = F.get_json_object(json_col, "$.MedlineCitation.PMID['#text']")
    return normalize_pmid(
        F.coalesce(texted, F.when(~raw.startswith("{"), raw))
    )


# --- P6: approved-publication filter (sul_pub.py:176-183) -------------------


def sulpub_approved(json_col: Column) -> Column:
    """≥1 authorship with status == 'approved'."""
    auth = F.from_json(
        F.get_json_object(json_col, "$.authorship"),
        "array<struct<status: string>>",
    )
    return F.coalesce(
        F.exists(auth, lambda a: a["status"] == "approved"), F.lit(False)
    )


# --- P8: DOI queryability filters (openalex.py:212-255, crossref.py:66-95) --


def openalex_queryable_doi(doi: Column) -> Column:
    """Drop DOIs with commas, a 'doi:' prefix, or an embedded
    'pmcid:' (reserved/confusing in OpenAlex filter queries)."""
    return (
        doi.isNotNull()
        & ~doi.contains(",")
        & ~doi.startswith("doi:")
        & ~doi.contains("pmcid:")
    )


def crossref_queryable_doi(doi_with_prefix: Column) -> Column:
    """Crossref batch lookups require 'doi:10.NNNN/suffix' format
    (crossref.py:66-95)."""
    return doi_with_prefix.rlike(r"^doi:10\.\d{4,}/\S+$")
