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

    # the broadcast decomposition (round 10) is a pure physical-plan
    # change — identical output multiset for ANY key layout, including
    # null/duplicate existing keys and null batch keys
    out_bc = merge_on_key(e_df, b_df, "k", broadcast_batch=True).collect()
    assert sorted(map(tuple, out), key=repr) == sorted(map(tuple, out_bc), key=repr)

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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), max_size=30, unique=True),
    cut=st.floats(min_value=0.05, max_value=0.95),
)
def test_hash_split_total_partition(spark, ids, cut):
    """Every row lands in exactly one split for ANY fraction layout,
    and assignment is a pure function of (id, salt) — recomputing
    yields the identical mapping."""
    from rialto_airflow_spark.operators.sampling import hash_split

    if not ids:
        return
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    splits = {"a": cut, "b": round(1.0 - cut, 6)}
    once = {r.k: r.split for r in hash_split(df, "k", splits).collect()}
    again = {r.k: r.split for r in hash_split(df, "k", splits).collect()}
    assert set(once) == set(ids)  # total: every id assigned
    assert once == again  # pure
    assert set(once.values()) <= {"a", "b"}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 100),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        max_size=12,
    ),
)
def test_asof_join_matches_reference_model(spark, left, right):
    """asof_join output equals the O(n²) reference model (latest right
    ts ≤ left ts per key) and always preserves left cardinality.

    Right values may be NULL: true ASOF semantics return the matched
    row WHOLESALE, so a NULL value in the latest at-or-before right
    row must come back as NULL — not an older row's non-null value.
    Asserting ``asof_ts`` alongside ``v`` distinguishes
    matched-with-NULL from no-match."""
    import datetime

    from rialto_airflow_spark.operators.events import asof_join

    base = datetime.datetime(2024, 1, 1)
    t = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    # unique right (key, ts) — the operator's documented precondition
    r_dedup = {(k, ts): v for k, ts, v in right}
    l_rows = [(k, t(ts), i) for i, (k, ts) in enumerate(left)]
    r_rows = [(k, t(ts), v) for (k, ts), v in r_dedup.items()]
    ldf = spark.createDataFrame(l_rows, "k int, ts timestamp, lid int")
    rdf = spark.createDataFrame(
        r_rows or [(0, t(0), 0)], "k int, ts timestamp, v int"
    )
    if not r_rows:
        rdf = rdf.limit(0)
    out = {
        r.lid: (r.v, r.asof_ts)
        for r in asof_join(ldf, rdf, "k", "ts", ["v"]).collect()
    }
    assert len(out) == len(l_rows)
    for k, lts, lid in l_rows:
        cands = [
            (rts, v) for (rk, rts), v in r_dedup.items()
            if rk == k and rts <= (lts - base).total_seconds()
        ]
        if cands:
            wts, wv = max(cands, key=lambda p: p[0])
            assert out[lid] == (wv, t(wts)), (lid, k, lts)
        else:
            assert out[lid] == (None, None), (lid, k, lts)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5000)), min_size=1, max_size=15
    ),
    gap=st.integers(min_value=1, max_value=600),
)
def test_sessionize_invariants(spark, events, gap):
    """Per key: session_seq starts at 1, never decreases in time
    order, increments exactly at gaps > gap_seconds."""
    import datetime

    from rialto_airflow_spark.operators.events import sessionize

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (k, base + datetime.timedelta(seconds=s), i)
        for i, (k, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int")
    out = sessionize(df, "k", "ts", gap, ["eid"]).collect()
    by_key: dict = {}
    for r in sorted(out, key=lambda r: (r.k, r.ts, r.eid)):
        by_key.setdefault(r.k, []).append(r)
    for k, seq in by_key.items():
        assert seq[0].session_seq == 1
        for prev, cur in zip(seq, seq[1:]):
            delta = (cur.ts - prev.ts).total_seconds()
            expected = prev.session_seq + (1 if delta > gap else 0)
            assert cur.session_seq == expected


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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 4)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 5),
)
def test_cap_per_group_exact_count_law(spark, rows, k):
    """cap_per_group keeps EXACTLY min(k, |group|) rows per group, a
    subset of the input, identically across partitionings — for any
    ids, group assignment, and k."""
    from collections import Counter

    from rialto_airflow_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "rid int, grp int")
    out = cap_per_group(df, "rid", ["grp"], k).collect()
    sizes = Counter(g for _, g in rows)
    got = Counter(r.grp for r in out)
    assert got == Counter({g: min(k, n) for g, n in sizes.items()})
    assert {(r.rid, r.grp) for r in out} <= set(rows)
    again = cap_per_group(df.repartition(3, "rid"), "rid", ["grp"], k).collect()
    assert {r.rid for r in again} == {r.rid for r in out}
