"""Query registry: every operator claimed in SURVEY.md §2 gets a
(spark_fn, oracle_sql) pair runnable on the driver testdata tables
(region nation customer supplier part orders lineitem events documents
embeddings).

Design rules (driver contract):
  * every computed column is aliased IDENTICALLY in the Spark plan and
    the DuckDB oracle SQL — the driver sorts columns by name and hashes
    values;
  * floating-point aggregates are rounded in BOTH engines so the hash
    is insensitive to summation order;
  * each query is a pure function (spark, sf_dir) -> DataFrame with no
    driver-side collect in the hot path.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rialto_airflow_spark.session import load_tables


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Relational core — parity with the reference's operator inventory
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→groupBy→agg (TPC-H Q1 shape).

    Parity target: the reference's mart aggregations (SURVEY §2.4
    A1/A9, publish/publication.py:52-89) — grouped aggregates over a
    filtered fact table. Filter + column pruning push to the parquet
    scan; partial aggregation is map-side so the shuffle carries only
    group keys.
    """
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].where(F.col("l_shipdate") <= F.lit("2024-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in REGISTRY.items() if s.headline}
