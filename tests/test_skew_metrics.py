"""Tests for the skew operators and merge metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators.merge import merge_metrics
from rialto_airflow_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark, sf_dir):
    from rialto_airflow_spark.session import load_tables

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    plain = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in salted_agg(
            li.select("l_returnflag", "l_quantity"),
            ["l_returnflag"],
            partial=lambda: [
                F.count(F.lit(1)).alias("pn"),
                F.sum("l_quantity").alias("ps"),
            ],
            final=lambda: [
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
            ],
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    from rialto_airflow_spark.session import load_tables

    t = load_tables(spark, sf_dir, "customer", "nation")
    plain = (
        t["customer"]
        .withColumnRenamed("c_nationkey", "n_nationkey")
        .join(t["nation"], "n_nationkey")
        .count()
    )
    salted = salted_join(
        t["customer"].withColumnRenamed("c_nationkey", "n_nationkey"),
        t["nation"],
        "n_nationkey",
        buckets=4,
    ).count()
    assert salted == plain


def test_merge_metrics(spark):
    existing = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    batch = spark.createDataFrame(
        [("a", 1), ("b", 9), ("c", 3), (None, 4)], "k string, v int"
    )
    m = merge_metrics(existing, batch, "k")
    assert m == {"new": 2, "updated": 1, "noop": 1, "processed": 4}
