"""Golden tests for the normalizer Column library.

Expected values mirror the reference's behavior spec
(/root/reference/test/test_utils.py and utils.py:88-223), evaluated
here through Spark Column expressions over a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.functions import normalize as N

DOI_CASES = [
    ("https://doi.org/10.1234/5678", "10.1234/5678"),
    ("https://dx.doi.org/10.1234/5678", "10.1234/5678"),
    ("10.1103/PhysRevLett.96.07390", "10.1103/physrevlett.96.07390"),
    (" 10.1234/5678 ", "10.1234/5678"),
    (" doi: 10.1234/5678 ", "10.1234/5678"),
    ("doi:10.1234/5678", "10.1234/5678"),
    ("doi:10.1234/ 56 78", "10.1234/5678"),
    (
        "10.1016.12.31/nature.S0735-1097(98)2000/12/31/34:7-7",
        "10.1016.12.31/nature.s0735-1097(98)2000/12/31/34:7-7",
    ),
    ("07390710.1103/physrevlett.96.073907", "10.1103/physrevlett.96.073907"),
    ("fooooooo10.1016/j.juro.2018.10.006", "10.1016/j.juro.2018.10.006"),
    ("11.0000/this.doi.goes.to.11", None),
    ("arXiv:2202.01037", "10.48550/arxiv.2202.01037"),
    ("https://doi.org/10.48550/arXiv.2202.01037", "10.48550/arxiv.2202.01037"),
    (None, None),
    ("", None),
    ("   ", None),
    ("10.1007/978-3-030-46640-4\\_21", "10.1007/978-3-030-46640-4_21"),
    ("10.1562/0031-8655(2004)79&lt;76:aocrtt&gt;2.0.co;2", None),
    ('10.1562/0031-8655(2004)"79', None),
]

PMID_CASES = [
    ("https://pubmed.ncbi.nlm.nih.gov/3685741", "3685741"),
    ("MEDLINE:3685741", "3685741"),
    (" 3685741 ", "3685741"),
    ("3685741", "3685741"),
    ("", ""),
    (None, None),
]

WOS_CASES = [
    (None, None),
    ("", None),
    ("   ", None),
    ("WOS:001008232900698", "001008232900698"),
    ("wos:001008232900698", "001008232900698"),
    ("001008232900698", "001008232900698"),
    ("MEDLINE:29780978", None),
    ("medline:29780978", None),
]

ORCID_CASES = [
    ("https://orcid.org/0000-0002-7262-6251", "0000-0002-7262-6251"),
    ("https://sandbox.orcid.org/0000-0002-7262-6251", "0000-0002-7262-6251"),
    ("0000-0002-7262-6251", "0000-0002-7262-6251"),
    (" HTTPS://ORCID.org/0000-0002-7262-6251 ", "0000-0002-7262-6251"),
]


def _run_cases(spark, cases, fn):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i int, v string"
    )
    got = {r["i"]: r["out"] for r in df.select("i", fn("v").alias("out")).collect()}
    for i, (inp, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {inp!r} -> {got[i]!r}, want {want!r}"


def test_normalize_doi(spark):
    _run_cases(spark, DOI_CASES, N.normalize_doi)


def test_normalize_pmid(spark):
    _run_cases(spark, PMID_CASES, N.normalize_pmid)


def test_normalize_wos_id(spark):
    _run_cases(spark, WOS_CASES, N.normalize_wos_id)


def test_normalize_orcid(spark):
    _run_cases(spark, ORCID_CASES, N.normalize_orcid)


def test_piped(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", None, "c", None, "d"]), (3, None), (4, [])],
        "i int, v array<string>",
    )
    got = {r["i"]: r["out"] for r in df.select("i", N.piped("v").alias("out")).collect()}
    assert got == {1: "a|b|c", 2: "a|c|d", 3: None, 4: ""}


def test_to_boolean_and_array(spark):
    df = spark.createDataFrame(
        [(1, "True", "a|b"), (2, " FALSE ", ""), (3, "yes", None)],
        "i int, b string, arr string",
    )
    rows = {
        r["i"]: (r["b2"], r["a2"])
        for r in df.select(
            "i", N.to_boolean("b").alias("b2"), N.to_array("arr").alias("a2")
        ).collect()
    }
    assert rows[1] == (True, ["a", "b"])
    assert rows[2] == (False, [])
    assert rows[3] == (None, [])


def test_funder_name_and_csv_bool(spark):
    df = spark.createDataFrame(
        [
            (1, "National Institutes of Health (NIH)", True),
            (2, "Department of Energy", False),
            (3, "Some Funder (ABC) (DEF)", None),
        ],
        "i int, name string, b boolean",
    )
    rows = {
        r["i"]: (r["n2"], r["b2"])
        for r in df.select(
            "i",
            N.normalize_funder_name("name").alias("n2"),
            N.bool_to_csv("b").alias("b2"),
        ).collect()
    }
    assert rows[1] == ("national institutes of health", "true")
    assert rows[2] == ("department of energy", "false")
    assert rows[3] == ("some funder (abc)", "")
