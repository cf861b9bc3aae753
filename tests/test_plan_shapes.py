"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast, top-k, codegen) must be
visible in the executed plan, not just assumed. These guard against
silent plan regressions — a refactor that breaks pushdown would still
pass value checks while 100×ing the bytes scanned at real scale."""

from __future__ import annotations

from rialto_airflow_spark.plans.queries import REGISTRY, queries

queries()  # load extension registries


def _plan(spark, sf_dir, name: str) -> str:
    return (
        REGISTRY[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q01_scan_prunes_and_pushes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: only the 7 referenced columns reach the scan
    assert "l_shipdate" in scan and "l_comment" not in scan
    # the shipdate predicate is evaluated at the scan, not post-scan
    assert "l_shipdate" in scan.split("DataFilters")[1]
    # partial (map-side) aggregation before the shuffle: the exchange
    # carries one row per group per task, not the filtered fact rows
    agg_idx = plan.index("HashAggregate")
    assert "Exchange" in plan[agg_idx:]


def test_q02_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_mn_join_revenue")
    # nation + region (and the filtered customer side under AQE
    # thresholds) join as broadcasts: no shuffle on the fact side for
    # the dim joins
    assert plan.count("BroadcastHashJoin") >= 2
    # the mktsegment filter reaches the customer scan
    cust = next(
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "c_mktsegment" in l
    )
    assert "BUILDING" in cust


def test_q13_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q13_topk")
    assert "TakeOrderedAndProject" in plan  # no global Sort node


def test_q16_filters_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_watermark_filter")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    filters = scan.split("DataFilters")[1]
    # both the watermark predicate and the type filter are scan-level
    assert "ts" in filters
    assert "event_type" in filters


def test_q24_queries_broadcast_not_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q24_embed_topk")
    assert "BroadcastExchange" in plan
    # the broadcast side is the filtered query set, never the corpus
    bc_idx = plan.index("BroadcastExchange")
    assert "vec_id" in plan[bc_idx : bc_idx + 600]


def test_q38_ivf_assignment_is_map_only(spark, sf_dir):
    """IVF list assignment must not shuffle the corpus: centroids are
    a literal array scored per row (argmax via array_sort), so the
    ONLY Window/shuffles in the plan are the probe join, the candidate
    dedup, and the final per-query rank — no crossJoin, no Exchange
    keyed on a unique row id (round-1 verdict #4)."""
    plan = _plan(spark, sf_dir, "q38_ann_ivf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one window operator: the final rank (assignment uses none)
    assert plan.count("row_number()") == 1
    # join + dedup + rank-window shuffles only
    assert plan.count("Exchange") <= 4
