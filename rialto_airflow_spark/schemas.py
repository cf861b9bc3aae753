"""Schemas for the harvest data model and the six per-source JSON
payloads (SURVEY.md §1; shapes specified by the reference's golden
fixtures, /root/reference/test/conftest.py:184-437).

Payload parsing strategy: every stable path is typed; every node the
reference treats as dict-OR-list (XML-derived WoS/PubMed payloads) is
declared ``STRING`` so from_json captures the raw JSON subtree, and
``functions.rules.dict_or_list`` normalizes it to an array downstream
— all JVM-side, no Python in the loop.
"""

from __future__ import annotations

# --- core tables (SURVEY §1.2) --------------------------------------------

# Columns ADDED by functions.distill.distill() beyond what a caller
# must supply (the reference writes them to the same pubs row at
# distill time, harvest_incremental/distill.py:36-70).  Split out so
# dag.distill_task can normalize a narrow input frame — the
# where/where-not incremental split unions the untouched slice with
# the distilled slice, and both branches must carry the SAME columns
# for the distill-derived values to survive the union.
DISTILL_OUTPUT_DDL = """
    journal_issn STRING,
    abstract STRING,
    citation_count INT,
    author_list_names ARRAY<STRING>,
    author_list_orcids ARRAY<STRING>,
    first_author_name STRING,
    first_author_orcid STRING,
    last_author_name STRING,
    last_author_orcid STRING,
    pages STRING,
    issue STRING,
    volume STRING
"""

# De-facto wide contract: what the marts read (plans/marts.py:157-195
# selects abstract/citation_count/author lists/pages/issue/volume
# straight off the pubs frame), i.e. the caller-supplied core PLUS
# every distill output.
PUBLICATION_DDL = f"""
    id BIGINT,
    doi STRING,
    title STRING,
    pub_year INT,
    open_access STRING,
    apc INT,
    publisher STRING,
    journal_name STRING,
    types ARRAY<STRING>,
    {DISTILL_OUTPUT_DDL.strip()},
    academic_council_authored BOOLEAN,
    faculty_authored BOOLEAN,
    dim_json STRING,
    openalex_json STRING,
    sulpub_json STRING,
    wos_json STRING,
    pubmed_json STRING,
    crossref_json STRING,
    wos_id STRING,
    pubmed_id STRING,
    openalex_harvested TIMESTAMP,
    dim_harvested TIMESTAMP,
    sulpub_harvested TIMESTAMP,
    wos_harvested TIMESTAMP,
    pubmed_harvested TIMESTAMP,
    distilled_at TIMESTAMP,
    created_at TIMESTAMP,
    updated_at TIMESTAMP
"""

AUTHOR_DDL = """
    id BIGINT,
    sunet STRING,
    cap_profile_id STRING,
    orcid STRING,
    first_name STRING,
    last_name STRING,
    status BOOLEAN,
    academic_council BOOLEAN,
    role STRING,
    schools ARRAY<STRING>,
    departments ARRAY<STRING>,
    primary_school STRING,
    primary_dept STRING,
    primary_division STRING,
    created_at TIMESTAMP,
    updated_at TIMESTAMP
"""

FUNDER_DDL = """
    id BIGINT,
    name STRING,
    grid_id STRING,
    ror_id STRING,
    openalex_id STRING,
    federal BOOLEAN,
    created_at TIMESTAMP,
    updated_at TIMESTAMP
"""

HARVEST_DDL = "id BIGINT, created_at TIMESTAMP, finished_at TIMESTAMP, is_full BOOLEAN"

PUB_AUTHOR_DDL = "publication_id BIGINT, author_id BIGINT"
PUB_FUNDER_DDL = "publication_id BIGINT, funder_id BIGINT"

# --- payload structs (FIXTURES.md §3) --------------------------------------

OPENALEX_DDL = """
    id STRING,
    doi STRING,
    ids STRUCT<doi: STRING, pmid: STRING>,
    title STRING,
    type STRING,
    publication_year STRING,
    biblio STRUCT<issue: STRING, first_page: STRING, last_page: STRING, volume: STRING>,
    primary_location STRUCT<source: STRUCT<
        type: STRING, display_name: STRING, host_organization_name: STRING,
        issn_l: STRING, issn: ARRAY<STRING>>>,
    locations ARRAY<STRUCT<is_oa: BOOLEAN, source: STRUCT<
        id: STRING, display_name: STRING, issn_l: STRING,
        issn: ARRAY<STRING>, type: STRING>>>,
    authorships ARRAY<STRUCT<author: STRUCT<display_name: STRING, orcid: STRING>>>,
    abstract_inverted_index MAP<STRING, ARRAY<INT>>,
    cited_by_count INT,
    apc_paid STRUCT<value_usd: STRING>,
    apc_list STRUCT<value_usd: STRING>,
    open_access STRUCT<oa_status: STRING>,
    grants ARRAY<STRUCT<funder: STRING>>
"""

DIM_DDL = """
    id STRING,
    doi STRING,
    type STRING,
    title STRING,
    year STRING,
    journal STRUCT<title: STRING>,
    issue STRING,
    pages STRING,
    volume STRING,
    issn ARRAY<STRING>,
    abstract STRING,
    recent_citations INT,
    pmid STRING,
    open_access ARRAY<STRING>,
    authors ARRAY<STRUCT<first_name: STRING, last_name: STRING, orcid: ARRAY<STRING>>>,
    funders ARRAY<STRUCT<id: STRING, name: STRING>>
"""

# WoS is XML-derived: `titles.title`, `names.name`, doctype, identifier
# and silo_tc may each be dict OR list — kept as raw-captured STRING.
WOS_DDL = """
    UID STRING,
    static_data STRUCT<
        summary: STRUCT<
            pub_info: STRUCT<pubyear: STRING, issue: STRING, vol: STRING,
                             page: STRUCT<begin: STRING, `end`: STRING>>,
            titles: STRING,
            names: STRUCT<name: STRING>>,
        fullrecord_metadata: STRUCT<normalized_doctypes: STRUCT<doctype: STRING>>>,
    dynamic_data STRUCT<
        cluster_related: STRUCT<identifiers: STRING>,
        citation_related: STRUCT<tc_list: STRUCT<silo_tc: STRING>>>
"""

# PubMed is xmltodict output: @attr/#text conventions, dict-or-list
# everywhere (AbstractText, PublicationType, Author, Identifier,
# ELocationID, ArticleId, ISSN).
PUBMED_DDL = """
    MedlineCitation STRUCT<
        Article: STRUCT<
            ArticleTitle STRING,
            Journal: STRUCT<Title: STRING, ISSN: STRING,
                            JournalIssue: STRUCT<Volume: STRING, Issue: STRING>>,
            Abstract: STRUCT<AbstractText: STRING>,
            PublicationTypeList: STRUCT<PublicationType: STRING>,
            AuthorList: STRUCT<Author: STRING>,
            ELocationID: STRING>>,
    PubmedData STRUCT<ArticleIdList: STRUCT<ArticleId: STRING>>
"""

SULPUB_DDL = """
    sulpubid STRING,
    title STRING,
    booktitle STRING,
    type STRING,
    year STRING,
    doi STRING,
    issn STRING,
    journal STRUCT<name: STRING, issue: STRING, pages: STRING,
                   volume: STRING, year: STRING>,
    pmid STRING,
    wos_uid STRING,
    identifier STRING,
    authorship ARRAY<STRUCT<cap_profile_id: STRING, status: STRING>>,
    author STRING
"""

CROSSREF_DDL = """
    DOI STRING,
    type STRING,
    title ARRAY<STRING>,
    abstract STRING,
    author ARRAY<STRUCT<given: STRING, family: STRING, ORCID: STRING>>,
    `container-title` ARRAY<STRING>,
    ISSN ARRAY<STRING>,
    issued STRUCT<`date-parts`: ARRAY<ARRAY<INT>>>
"""

PAYLOAD_DDL = {
    "openalex": OPENALEX_DDL,
    "dim": DIM_DDL,
    "wos": WOS_DDL,
    "pubmed": PUBMED_DDL,
    "sulpub": SULPUB_DDL,
    "crossref": CROSSREF_DDL,
}
