"""Data-quality constraint gate: results vs DuckDB-computed truths,
and the one-pass plan property."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from rialto_airflow_spark.operators import quality as Q
from rialto_airflow_spark.session import load_tables


def test_checks_against_duckdb_truths(spark, sf_dir):
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    results = {
        r.name: r
        for r in Q.run_checks(
            orders,
            [
                Q.not_null("o_orderkey"),
                Q.unique("o_orderkey"),
                Q.completeness("o_custkey", 0.99),
                Q.in_range("o_totalprice", 0, 1e9),
                Q.accepted_values("o_orderstatus", ("O", "F", "P")),
            ],
        )
    }
    n, nn, du, bad_status = duckdb.sql(
        f"""SELECT count(*),
                   count(*) - count(o_orderkey),
                   count(o_orderkey) - count(DISTINCT o_orderkey),
                   count_if(o_orderstatus NOT IN ('O','F','P'))
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchall()[0]
    assert results["not_null(o_orderkey)"].observed == nn
    assert results["unique(o_orderkey)"].observed == du
    assert results["accepted_values(o_orderstatus)"].observed == bad_status
    assert results["completeness(o_custkey>=0.99)"].passed
    assert results["in_range(o_totalprice,[0,1000000000.0])"].passed


def test_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (1, "b", -2.0),   # dup key, out-of-range
            (None, "a", 3.0),  # null key
            (2, "zz", 1.0),    # bad accepted value
            (3, None, 2.0),
        ],
        "k long, s string, v double",
    )
    res = {
        r.name: r
        for r in Q.run_checks(
            df,
            [
                Q.not_null("k"),
                Q.unique("k"),
                Q.in_range("v", 0, 10),
                Q.accepted_values("s", ("a", "b")),
                Q.completeness("s", 0.9),
                Q.matches("s", "[ab]"),
            ],
        )
    }
    assert res["not_null(k)"] == Q.CheckResult("not_null(k)", False, 1)
    assert res["unique(k)"].observed == 1 and not res["unique(k)"].passed
    assert res["in_range(v,[0,10])"].observed == 1
    assert res["accepted_values(s)"].observed == 1
    assert not res["completeness(s>=0.9)"].passed
    assert res["completeness(s>=0.9)"].observed == 0.8
    assert res["matches(s)"].observed == 1  # 'zz'


def test_checks_single_pass_plan(spark, sf_dir):
    """However many checks, ONE aggregation over ONE scan."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    checks = [
        Q.not_null("o_orderkey"),
        Q.unique("o_orderkey"),
        Q.in_range("o_totalprice", 0, 1e9),
        Q.completeness("o_custkey", 0.5),
    ]
    aggs = [e.alias(f"__c{i}") for i, (_, e, _) in enumerate(checks)]
    plan = orders.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_foreign_key_check(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders", "customer")
    ok = Q.foreign_key(t["orders"], "o_custkey", t["customer"], "c_custkey")
    assert ok.passed and ok.observed == 0
    # break it: drop half the parents
    half = t["customer"].where(F.col("c_custkey") % 2 == 0)
    bad = Q.foreign_key(t["orders"], "o_custkey", half, "c_custkey")
    assert not bad.passed and bad.observed > 0


def test_profile_columns_single_pass_and_values(spark, sf_dir):
    """Column profile vs exact per-column facts, and the single-scan
    pin: one FileScan in the aggregation plan no matter how many
    columns are profiled."""
    from rialto_airflow_spark.operators.quality import profile_columns
    from rialto_airflow_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    prof = {r["column"]: r for r in profile_columns(docs).collect()}
    assert set(prof) == set(docs.columns)
    n = docs.count()
    for c, r in prof.items():
        assert r["n_rows"] == n
        exact_nulls = docs.where(F.col(c).isNull()).count()
        assert r["n_nulls"] == exact_nulls
        exact_distinct = docs.select(c).distinct().count()
        # HLL rsd=0.02 → generous 10% envelope at this scale
        assert abs(r["approx_distinct"] - exact_distinct) <= max(
            2, 0.1 * exact_distinct
        ), c
    # min/max spot check on a numeric column
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert prof["n_chars"]["min_value"] == str(lo)
    assert prof["n_chars"]["max_value"] == str(hi)


def test_profile_columns_nulls_and_complex_types(spark):
    from rialto_airflow_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, None, [1, 2]), (2, "x", None), (None, "x", [3])],
        "a int, b string, c array<int>",
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["a"]["n_nulls"] == 1 and prof["b"]["n_nulls"] == 1
    assert prof["b"]["approx_distinct"] == 1
    assert prof["c"]["min_value"] is None  # complex type: no ordering
    assert prof["a"]["min_value"] == "1" and prof["a"]["max_value"] == "2"
    assert prof["b"]["null_frac"] == round(1 / 3, 6)


def test_table_store_compact_reduces_files_preserves_rows(spark, tmp_path):
    """compact() rewrites a many-small-files version into few files,
    repoints atomically, keeps content identical, and vacuum can then
    reclaim the fragmented version."""
    from rialto_airflow_spark.storage import TableStore

    store = TableStore(str(tmp_path / "t"))
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    store.write(df.repartition(40), "frag")  # 40 tiny files
    import glob

    before = len(glob.glob(store.current_version("frag") + "/part-*"))
    assert before >= 40
    store.compact(spark, "frag", target_mb=128)
    after_dir = store.current_version("frag")
    after = len(glob.glob(after_dir + "/part-*"))
    assert after < before and after <= 2
    got = store.read(spark, "frag")
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
