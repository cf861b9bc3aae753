"""Mergeable-summary operators: HLL sketches vs exact DuckDB
cardinalities, union-vs-whole identity, Misra–Gries heavy hitters vs
exact top-k."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.operators.sketches import (
    distinct_sketches,
    heavy_hitters,
    merge_distinct_sketches,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_hll_estimate_within_error(spark, sf_dir):
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in distinct_sketches(
            _lineitem(spark, sf_dir), ["l_returnflag"], "l_orderkey"
        ).collect()
    }
    exact = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""SELECT l_returnflag, count(DISTINCT l_orderkey)
                FROM read_parquet('{sf_dir}/lineitem.parquet')
                GROUP BY 1"""
        ).fetchall()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        # lgk=12 → rse ≈ 1.6%; 5% is the 3σ bound
        assert est == pytest.approx(exact[k], rel=0.05)


def test_hll_union_equals_whole(spark, sf_dir):
    """The incremental contract: sketch halves independently (two
    'days'), union the stored sketches — the estimate must equal the
    single-pass whole-table sketch (HLL registers are max-merged, so
    union-of-sketches ≡ sketch-of-union)."""
    docs = _docs(spark, sf_dir).withColumn(
        "word", F.explode(F.split("text", r"\s+"))
    )
    whole = {
        r["lang"]: r["approx_distinct"]
        for r in distinct_sketches(docs, ["lang"], "word").collect()
    }
    halves = [
        distinct_sketches(
            docs.where(F.col("doc_id") % 2 == i), ["lang"], "word"
        ).select("lang", "hll_sketch")
        for i in (0, 1)
    ]
    merged = {
        r["lang"]: r["approx_distinct"]
        for r in merge_distinct_sketches(
            halves[0].unionByName(halves[1]), ["lang"]
        ).collect()
    }
    assert merged == whole


def test_merge_without_groups_gives_global(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    per_lang = distinct_sketches(docs, ["lang"], "doc_id")
    row = merge_distinct_sketches(per_lang).collect()[0]
    exact = docs.select("doc_id").distinct().count()
    assert row["approx_distinct"] == pytest.approx(exact, rel=0.05)


def test_heavy_hitters_match_exact_topk(spark, sf_dir):
    words = _docs(spark, sf_dir).select(
        F.explode(F.split("text", r"\s+")).alias("word")
    )
    got = [(r["word"], r["freq"]) for r in heavy_hitters(words, "word", k=10).collect()]
    want = duckdb.sql(
        f"""SELECT w AS word, count(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{sf_dir}/documents.parquet'))
            GROUP BY 1 ORDER BY freq DESC, word ASC LIMIT 10"""
    ).fetchall()
    assert got == want


def test_heavy_hitters_skewed_partitions(spark):
    """The MG-across-partitions guarantee: a 30%-hot key spread over
    many partitions with tiny per-partition counters is still found,
    with its exact count."""
    n = 4000
    rows = [(i, "hot" if i % 10 < 3 else f"cold{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "i long, v string").repartition(8)
    got = heavy_hitters(df, "v", k=1, candidates_per_partition=4).collect()
    assert got[0]["v"] == "hot"
    assert got[0]["freq"] == sum(1 for i in range(n) if i % 10 < 3)


def test_heavy_hitters_null_safe(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "v string"
    )
    got = heavy_hitters(df, "v", k=2).collect()
    assert [(r["v"], r["freq"]) for r in got] == [("a", 2), ("b", 1)]


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cm_sketch_never_undercounts_and_is_exact_when_wide(spark, sf_dir):
    """CM law: estimate >= true count always; with width far above
    the distinct-key count, collisions are rare enough that most
    estimates are exact (and the hot key's estimate is tight)."""
    from rialto_airflow_spark.operators.sketches import cm_estimate, cm_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    sk = cm_sketch(docs, "source", width=4096, depth=4)
    keys = docs.select("source").distinct()
    est = {
        r["source"]: r["cm_count"]
        for r in cm_estimate(sk, keys, "source", width=4096, depth=4).collect()
    }
    assert set(est) == set(truth)
    for k, n in truth.items():
        assert est[k] >= n, k  # the one-sided CM guarantee
    # wide sketch, few keys -> everything exact
    assert est == truth


def test_cm_merge_equals_sketch_of_union(spark):
    """Mergeability is exact: counter addition of two sketches equals
    the sketch of the concatenated input, row for row."""
    from rialto_airflow_spark.operators.sketches import cm_merge, cm_sketch

    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(100)], "v string")
    b = spark.createDataFrame([(f"k{i % 11}",) for i in range(80)], "v string")
    merged = cm_merge(
        cm_sketch(a, "v", width=64, depth=3),
        cm_sketch(b, "v", width=64, depth=3),
    )
    whole = cm_sketch(a.unionByName(b), "v", width=64, depth=3)
    m = {(r["depth_idx"], r["pos"]): r["cnt"] for r in merged.collect()}
    w = {(r["depth_idx"], r["pos"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_cm_sketch_bounds_and_weights(spark):
    """Narrow sketch under heavy collision pressure: estimates still
    never undercount, the epsilon*N overcount bound holds for every
    key, and weight_col drives weighted counts."""
    from rialto_airflow_spark.operators.sketches import cm_estimate, cm_sketch

    import math

    n = 2000
    rows = [(f"k{i % 400}", 2) for i in range(n)]
    df = spark.createDataFrame(rows, "v string, wt int")
    width, depth = 32, 4
    sk = cm_sketch(df, "v", width=width, depth=depth, weight_col="wt")
    keys = df.select("v").distinct()
    est = {
        r["v"]: r["cm_count"]
        for r in cm_estimate(sk, keys, "v", width=width, depth=depth).collect()
    }
    total = 2 * n
    true_each = 2 * (n // 400)
    bound = true_each + math.e / width * total  # eps*N with eps=e/w
    for k, e in est.items():
        assert e >= true_each
        assert e <= bound * 3  # slack: bound holds w.h.p., not surely
    # nulls excluded
    df2 = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    sk2 = cm_sketch(df2, "v", width=16, depth=2)
    est2 = cm_estimate(
        sk2, df2.where(F.col("v").isNotNull()).distinct(), "v",
        width=16, depth=2,
    ).collect()
    assert est2[0]["cm_count"] == 2


def test_cm_estimate_excludes_null_probe_keys(spark):
    """Review regression: the sketch never counts NULL keys, so a
    NULL probe must not report a colliding bucket's count."""
    from rialto_airflow_spark.operators.sketches import cm_estimate, cm_sketch

    df = spark.createDataFrame([("a",), ("a",), (None,)], "v string")
    sk = cm_sketch(df, "v", width=8, depth=2)
    got = cm_estimate(
        sk, spark.createDataFrame([("a",), (None,)], "v string"), "v",
        width=8, depth=2,
    ).collect()
    assert [(r["v"], r["cm_count"]) for r in got] == [("a", 2)]


# ---------------------------------------------------------------------------
# log-bucketed histogram sketch
# ---------------------------------------------------------------------------


def test_histogram_quantile_within_relative_error(spark, sf_dir):
    """Quantiles read from the sketch stay within the bucket-ratio
    relative error of the exact quantile, per group."""
    from rialto_airflow_spark.operators.sketches import (
        histogram_quantile,
        histogram_sketch,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("value") > 0
    )
    bpd = 20
    sk = histogram_sketch(ev, ["event_type"], "value", bins_per_decade=bpd)
    for q in (0.5, 0.95):
        got = {
            r["event_type"]: r[f"q{int(q * 100)}"]
            for r in histogram_quantile(
                sk, ["event_type"], q, bins_per_decade=bpd
            ).collect()
        }
        exact = {
            r["event_type"]: r["x"]
            for r in ev.groupBy("event_type")
            .agg(F.expr(f"percentile(value, {q})").alias("x"))
            .collect()
        }
        ratio = 10 ** (1 / bpd)
        for g, x in exact.items():
            assert got[g] is not None
            # the sketch answer is a bucket midpoint whose bucket
            # contains a value within one rank of the exact quantile:
            # allow one full bucket ratio each way
            assert x / ratio**2 <= got[g] <= x * ratio**2, (g, q, got[g], x)


def test_histogram_merge_equals_sketch_of_union(spark):
    from rialto_airflow_spark.operators.sketches import (
        histogram_sketch,
        merge_histogram_sketches,
    )

    a = spark.createDataFrame(
        [("g", float(i % 17 + 1)) for i in range(300)], "g string, v double"
    )
    b = spark.createDataFrame(
        [("g", float(i % 5 + 1) * 100) for i in range(200)],
        "g string, v double",
    )
    m = merge_histogram_sketches(
        histogram_sketch(a, ["g"], "v"), histogram_sketch(b, ["g"], "v")
    )
    whole = histogram_sketch(a.unionByName(b), ["g"], "v")
    mm = {(r["g"], r["bin"]): r["cnt"] for r in m.collect()}
    ww = {(r["g"], r["bin"]): r["cnt"] for r in whole.collect()}
    assert mm == ww


def test_histogram_underflow_nonfinite_and_labels(spark):
    """Zero/negative/NaN/inf values count in the underflow bucket
    (bin NULL) — NaN would otherwise bin as ~1 under Spark's
    NaN-is-greatest ordering and +inf as 2^63-1; NULL values are
    EXCLUDED entirely (percentile semantics: absent != observed);
    a group that is ALL underflow reports a NULL quantile; and
    quantile column labels round instead of truncating (q57 not
    q56), keeping q99.9 distinct from q99."""
    from rialto_airflow_spark.operators.sketches import (
        histogram_quantile,
        histogram_sketch,
    )

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [("pos", 10.0), ("pos", 0.0), ("pos", -3.0), ("pos", nan),
         ("pos", inf), ("neg", -1.0), ("neg", None)],
        "g string, v double",
    )
    sk = histogram_sketch(df, ["g"], "v")
    rows = {(r["g"], r["bin"]): r["cnt"] for r in sk.collect()}
    assert rows[("pos", None)] == 4  # zero, negative, NaN, inf
    assert rows[("neg", None)] == 1  # the NULL row is excluded
    assert max(b for g, b in rows if g == "pos" and b is not None) == 10
    got = {
        r["g"]: r["q99"]
        for r in histogram_quantile(sk, ["g"], 0.99).collect()
    }
    assert got["neg"] is None
    assert got["pos"] is not None and got["pos"] > 0
    assert histogram_quantile(sk, ["g"], 0.57).columns[-1] == "q57"
    assert histogram_quantile(sk, ["g"], 0.999).columns[-1] == "q99_9"


# ---------------------------------------------------------------------------
# KMV (bottom-k) theta sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k_and_error_bound(spark, sf_dir):
    """Below k distinct values the estimate is EXACT; above, within
    ~4 relative standard errors (RSE ≈ 1/sqrt(k−2)) of truth."""
    from rialto_airflow_spark.operators.sketches import kmv_sketch
    from rialto_airflow_spark.session import load_tables

    ev = load_tables(spark, sf_dir, "events")["events"]
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # big k: every group is below k → exact
    for r in kmv_sketch(ev, ["event_type"], "user_id", k=100000).collect():
        assert r["approx_distinct"] == exact[r["event_type"]]
        assert len(r["kmv"]) == exact[r["event_type"]]
    # small k: estimation regime, bounded error
    k = 128
    rse = 1.0 / (k - 2) ** 0.5
    for r in kmv_sketch(ev, ["event_type"], "user_id", k=k).collect():
        n = exact[r["event_type"]]
        if n >= k:
            assert abs(r["approx_distinct"] - n) <= 4 * rse * n, (
                r["event_type"], r["approx_distinct"], n,
            )


def test_kmv_merge_equals_sketch_of_union_exactly(spark, sf_dir):
    """Bottom-k mergeability is EXACT (unlike MG's lossy reduction):
    merging per-source sketches equals sketching the unioned data —
    same arrays, not just close estimates. Also partition-invariant."""
    from rialto_airflow_spark.operators.sketches import kmv_merge, kmv_sketch
    from rialto_airflow_spark.session import load_tables

    ev = load_tables(spark, sf_dir, "events")["events"]
    k = 64
    fine = kmv_sketch(ev, ["event_type"], "user_id", k=k)
    rolled = kmv_merge(fine, None, k=k).collect()[0]
    direct = kmv_sketch(ev.repartition(7), [], "user_id", k=k).collect()[0]
    assert list(rolled["kmv"]) == list(direct["kmv"])
    assert rolled["approx_distinct"] == direct["approx_distinct"]


def test_kmv_set_estimates_overlap(spark):
    """Constructed overlap: A = 0..3999, B = 2000..5999 (overlap
    2000, union 6000, jaccard 1/3). Exact when k exceeds the sets;
    within estimator error at small k."""
    from rialto_airflow_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    a = spark.range(0, 4000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))
    big_a = kmv_sketch(a, [], "v", k=10000)
    big_b = kmv_sketch(b, [], "v", k=10000)
    exact = kmv_set_estimates(big_a, big_b, None, k=10000).collect()[0]
    assert exact["union_est"] == 6000.0
    assert exact["intersection_est"] == 2000.0
    assert abs(exact["jaccard_est"] - 1 / 3) < 1e-4

    k = 256
    sa = kmv_sketch(a, [], "v", k=k)
    sb = kmv_sketch(b, [], "v", k=k)
    est = kmv_set_estimates(sa, sb, None, k=k).collect()[0]
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(est["union_est"] - 6000) <= 5 * rse * 6000
    assert abs(est["intersection_est"] - 2000) <= 8 * rse * 2000
    assert abs(est["jaccard_est"] - 1 / 3) <= 8 * rse
