"""Tests for the versioned parquet table store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.storage import TableStore


def test_write_read_swap_vacuum(spark, tmp_path):
    store = TableStore(str(tmp_path / "tables"))
    df1 = spark.range(10).withColumn("pub_year", F.lit(2020) + (F.col("id") % 3))
    p1 = store.write(df1, "publication", partition_by=["pub_year"])
    assert store.read(spark, "publication").count() == 10

    df2 = spark.range(5).withColumn("pub_year", F.lit(2021))
    p2 = store.write(df2, "publication", partition_by=["pub_year"])
    assert p1 != p2
    assert store.read(spark, "publication").count() == 5  # pointer swapped

    removed = store.vacuum("publication", keep=1)
    assert p1 in removed and p2 not in removed
    assert store.read(spark, "publication").count() == 5


def test_partition_pruning(spark, tmp_path):
    store = TableStore(str(tmp_path / "tables"))
    df = spark.range(100).withColumn("pub_year", 2000 + (F.col("id") % 10))
    store.write(df, "pubs", partition_by=["pub_year"])
    pruned = store.read(spark, "pubs").where(F.col("pub_year") == 2003)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 10
    # only one partition directory participates in the scan
    assert "pub_year=2003" in plan or "PartitionFilters" in plan


def test_missing_table(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        store.read(spark, "nope")


def test_jsonpath_fallback_optional(spark):
    from rialto_airflow_spark.functions import jsonpath as JP

    if not JP.HAVE_JSONPATH:
        with pytest.raises(ImportError):
            JP.jsonpath_eval(F.col("j"), "$.a")
    else:  # pragma: no cover - container lacks jsonpath_ng
        df = spark.createDataFrame([('{"a": {"b": 2}}',)], "j string")
        got = df.select(JP.jsonpath_eval(F.col("j"), "a.b").alias("o")).collect()
        assert got[0]["o"] == "2"
