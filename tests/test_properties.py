"""Property-based tests (hypothesis) for engine invariants the
example-based tests can't sweep: MERGE key algebra and normalizer
idempotence."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rialto_airflow_spark.functions.normalize import normalize_doi
from rialto_airflow_spark.operators.merge import merge_on_key

KEYS = st.one_of(st.none(), st.sampled_from(["k1", "k2", "k3", "k4"]))
VALS = st.integers(min_value=0, max_value=9)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    existing=st.lists(st.tuples(KEYS, VALS), max_size=6),
    batch=st.lists(st.tuples(KEYS, VALS), max_size=6),
)
def test_merge_key_algebra(spark, existing, batch):
    """Invariants of merge_on_key for any key multiset:
    - output row count = |existing| + |batch null-key rows| +
      |batch keys not present in existing| (existing may hold
      duplicate/null keys; each existing row survives exactly once);
    - matched keys carry the batch value; untouched keys keep theirs.
    """
    # de-dup batch keys (MERGE semantics assume unique batch keys)
    seen: set = set()
    b_rows = []
    for k, v in batch:
        if k is None or k not in seen:
            b_rows.append((k, v))
            if k is not None:
                seen.add(k)
    e_df = spark.createDataFrame(existing or [(None, None)], "k string, v int")
    if not existing:
        e_df = e_df.limit(0)
    b_df = spark.createDataFrame(b_rows or [(None, None)], "k string, v int")
    if not b_rows:
        b_df = b_df.limit(0)

    out = merge_on_key(e_df, b_df, "k").collect()

    e_keys = [k for k, _ in existing if k is not None]
    b_keyed = {k: v for k, v in b_rows if k is not None}
    b_nulls = sum(1 for k, _ in b_rows if k is None)
    expected_n = len(existing) + b_nulls + len(set(b_keyed) - set(e_keys))
    assert len(out) == expected_n

    for r in out:
        if r["k"] in b_keyed:
            assert r["v"] == b_keyed[r["k"]]
    # rows whose key is untouched by the batch survive as an exact
    # multiset (existing may legally carry duplicate keys)
    got = sorted(
        (r["k"], r["v"]) for r in out if r["k"] is not None and r["k"] not in b_keyed
    )
    want = sorted(
        (k, v) for k, v in existing if k is not None and k not in b_keyed
    )
    assert got == want


DOI_ALPHABET = string.ascii_letters + string.digits + "./:-_ "


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=DOI_ALPHABET, max_size=40))
def test_normalize_doi_idempotent(spark, s):
    """normalize(normalize(x)) == normalize(x): a normalized DOI must
    survive re-normalization unchanged (the engine normalizes at
    landing AND the reference re-normalizes at upsert)."""
    df = spark.createDataFrame([(s,)], "v string")
    once = df.select(normalize_doi("v").alias("o")).collect()[0]["o"]
    twice = df.select(
        normalize_doi(normalize_doi("v")).alias("o")
    ).collect()[0]["o"]
    assert once == twice
    if once is not None:
        assert once.startswith("10.")
        assert once == once.lower()
        assert " " not in once
