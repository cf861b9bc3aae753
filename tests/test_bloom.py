"""Bloom join-pruning: the no-false-negative guarantee, a
false-positive rate near theory, and semi-join equivalence after the
exact join."""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import bloom as B
from rialto_airflow_spark.session import load_tables


def test_bloom_no_false_negatives(spark, sf_dir):
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    cohort = cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey")
    bf = B.build_bloom(cohort, "c_custkey", m_bits=1 << 14, k=5)
    # every build-side key must test positive
    missed = B.bloom_prefilter(cohort, bf, "c_custkey")
    assert missed.count() == cohort.count()


def test_bloom_fp_rate_near_theory(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    probes = spark.range(10_000, 60_000).select(F.col("id").alias("k"))
    bf = B.build_bloom(keys, "k", m_bits=1 << 13, k=5)
    fp = B.bloom_prefilter(probes, bf, "k").count() / 50_000
    assert bf.fp_rate < 0.1
    # observed within 3x of theory and never catastrophic
    assert fp <= max(3 * bf.fp_rate, 0.01), (fp, bf.fp_rate)


def test_bloom_prefilter_preserves_join(spark, sf_dir):
    """prefilter → exact semi join ≡ plain semi join, while passing
    only a small superset of the matching rows through."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    orders, cust = t["orders"], t["customer"]
    cohort = cust.where(F.col("c_nationkey") == 3).select(
        F.col("c_custkey").alias("o_custkey")
    )
    bf = B.build_bloom(cohort, "o_custkey", m_bits=1 << 16, k=5)
    pre = B.bloom_prefilter(orders, bf, "o_custkey")
    exact = orders.join(cohort, "o_custkey", "left_semi")
    via_bloom = pre.join(cohort, "o_custkey", "left_semi")
    assert (
        via_bloom.exceptAll(exact).unionAll(exact.exceptAll(via_bloom)).count()
        == 0
    )
    n_orders, n_pre, n_exact = orders.count(), pre.count(), exact.count()
    assert n_exact <= n_pre < n_orders
    # the prefilter should remove the vast majority of non-matches
    assert (n_pre - n_exact) <= 0.05 * (n_orders - n_exact)


def test_bloom_membership_column_matches_python(spark):
    """Cross-check the Column bit probes against a driver-side python
    evaluation of the same words/positions."""
    keys = spark.range(0, 64).select(F.col("id").alias("k"))
    bf = B.build_bloom(keys, "k", m_bits=1 << 10, k=3)
    probes = spark.range(0, 200).select(F.col("id").alias("k"))
    got = {
        r["k"]: r["hit"]
        for r in probes.select(
            "k", B.bloom_contains("k", bf).alias("hit")
        ).collect()
    }
    pos = {
        r["k"]: list(r["p"])
        for r in probes.select(
            "k", B._positions("k", bf.m_bits, bf.k).alias("p")
        ).collect()
    }
    unsigned = [w + (1 << 64) if w < 0 else w for w in bf.words]
    for kk, ps in pos.items():
        want = all((unsigned[p // 64] >> (p % 64)) & 1 for p in ps)
        assert got[kk] == want, kk
