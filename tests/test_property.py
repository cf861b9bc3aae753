"""Property-based tests (hypothesis) for the custom operators whose
semantics have a clean independent reference: as-of join vs pandas
``merge_asof``, sessionization vs a pure-Python fold, hash_split's
partition-of-input law, repetition_stats vs a Counter-based oracle.

The reference has no property tests (SURVEY §5 'not present'); these
cover the randomized-input gap its golden fixtures leave — each
example is tiny (Spark round-trip per example), so example counts
stay low and deadlines are disabled.
"""

from __future__ import annotations

import datetime
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rialto_airflow_spark.operators import curation as C
from rialto_airflow_spark.operators import events as E
from rialto_airflow_spark.operators import sampling as SA

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EPOCH = datetime.datetime(2024, 1, 1)


def _dt(s: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=s)


# (key, ts-seconds) event streams: few keys so sequences share keys
_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 10000)),
    min_size=1,
    max_size=40,
)


# right rows carry an is_null flag so the generator exercises the
# input class round 4 got wrong: a MATCHED right row whose value is
# NULL must surface as NULL, never fall back to an earlier non-null
_right_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 10000), st.booleans()),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(left=_events, right=_right_events)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join ≡ pandas merge_asof(direction='backward',
    allow_exact_matches=True) for any unique-right input — including
    right rows whose value column is NULL (the matched row's NULL must
    be carried, not skipped for an older non-null row)."""
    # unique (key, ts) on the right — the operator's contract
    rseen = {}
    for i, (k, t, is_null) in enumerate(right):
        rseen[(k, t)] = None if is_null else float(i)
    ldf = spark.createDataFrame(
        [(i, k, _dt(t)) for i, (k, t) in enumerate(left)],
        ["row_id", "k", "ts"],
    )
    rdf = spark.createDataFrame(
        [(k, _dt(t), v) for (k, t), v in rseen.items()],
        "k long, ts timestamp, v double",
    )
    got = {
        r.row_id: (r.v, r.asof_ts)
        for r in E.asof_join(ldf, rdf, "k", "ts", ["v"]).collect()
    }

    lp = pd.DataFrame(
        [(i, k, _dt(t)) for i, (k, t) in enumerate(left)],
        columns=["row_id", "k", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, _dt(t), v) for (k, t), v in rseen.items()],
        columns=["k", "ts", "v"],
    ).sort_values("ts", kind="stable")
    # rts = the matched right row's own ts: lets the oracle tell
    # "no match" (rts NaN) apart from "matched a NULL-valued row"
    rp["rts"] = rp["ts"]
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    assert len(got) == len(left)
    for _, row in want.iterrows():
        gv, gts = got[row.row_id]
        if pd.isna(row.rts):
            assert gv is None and gts is None
        else:
            assert gts == row.rts.to_pydatetime()
            if pd.isna(row.v):
                assert gv is None  # matched row with NULL value
            else:
                assert gv == row.v


@settings(**_SETTINGS)
@given(events=_events, gap=st.integers(1, 3600))
def test_sessionize_matches_python_fold(spark, events, gap):
    """Session count and numbering per key equal a pure-Python fold
    with the same strict-> gap rule on whole seconds."""
    rows = [(k, _dt(t), i) for i, (k, t) in enumerate(events)]
    df = spark.createDataFrame(rows, ["k", "ts", "event_id"])
    got = {
        r.event_id: r.session_seq
        for r in E.sessionize(df, "k", "ts", gap, ["event_id"]).collect()
    }

    by_key: dict[int, list[tuple[int, int]]] = {}
    for i, (k, t) in enumerate(events):
        by_key.setdefault(k, []).append((t, i))
    for k, seq in by_key.items():
        seq.sort()  # (ts, event_id) — same order the operator uses
        sess, prev = 0, None
        for t, i in seq:
            if prev is None or t - prev > gap:
                sess += 1
            assert got[i] == sess, (k, i, t)
            prev = t


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 200),
    weights=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=4),
)
def test_hash_split_partitions_input(spark, n, weights):
    """hash_split is a partition of its input for any weights: every
    row lands in exactly one split, and the same row always lands in
    the same split."""
    total = sum(weights)
    shares = {f"s{i}": w / total for i, w in enumerate(weights)}
    df = spark.range(0, n).withColumnRenamed("id", "k")
    out = SA.hash_split(df, "k", shares, salt="prop")
    got = [(r.k, r.split) for r in out.collect()]
    assert len(got) == n
    assert {k for k, _ in got} == set(range(n))
    again = {
        r.k: r.split
        for r in SA.hash_split(df.repartition(3), "k", shares, salt="prop").collect()
    }
    assert dict(got) == again


@settings(**_SETTINGS)
@given(
    toks=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=30
    )
)
def test_repetition_stats_matches_counter(spark, toks):
    """dup/top n-gram fractions equal a Counter-based oracle on any
    token sequence, and both stay within [0, 1]."""
    text = " ".join(toks)
    row = (
        spark.createDataFrame([(text,)], ["text"])
        .select(C.repetition_stats("text", n=2).alias("r"))
        .select("r.dup_ngram_frac", "r.top_ngram_frac")
        .first()
    )
    grams = [
        f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
    ] if len(toks) >= 2 else []
    if not grams:
        assert row.dup_ngram_frac == 0.0 and row.top_ngram_frac == 0.0
        return
    cnt = Counter(grams)
    dup = round(1.0 - len(cnt) / len(grams), 6)
    top = round(max(cnt.values()) / len(grams), 6)
    assert abs(row.dup_ngram_frac - dup) < 1e-9
    assert abs(row.top_ngram_frac - top) < 1e-9
    assert 0.0 <= row.dup_ngram_frac <= 1.0
    assert 0.0 <= row.top_ngram_frac <= 1.0


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label + pointer-jumping CC equals a pure-Python union-find
    with min-id labels on any random edge set (self-loops included)."""
    from rialto_airflow_spark.operators import dedup as D

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.id: r.cluster_id for r in D.connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # normalize: label every node by the min id in its component
    comp: dict[int, int] = {}
    for x, r in want.items():
        comp[r] = min(comp.get(r, x), x)
    want = {x: comp[find(x)] for x in parent}
    assert got == want


@settings(**_SETTINGS)
@given(
    existing=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 99)),
        min_size=0,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    batch=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 99)),
        min_size=0,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_on_key_idempotent(spark, existing, batch):
    """Applying the same (null-key-free, unique-keyed) batch twice is
    a no-op: merge(merge(E,B),B) == merge(E,B), and the once-merged
    result contains exactly keys(E) ∪ keys(B) with batch values
    winning on overlap."""
    from rialto_airflow_spark.operators.merge import merge_on_key

    schema = "k long, v long"
    e = spark.createDataFrame(existing, schema)
    b = spark.createDataFrame(batch, schema)
    once = merge_on_key(e, b, "k")
    rows1 = {(r.k, r.v) for r in once.collect()}
    want = dict(existing)
    want.update(dict(batch))
    assert rows1 == set(want.items())
    twice = merge_on_key(once, b, "k")
    assert {(r.k, r.v) for r in twice.collect()} == rows1


@given(
    keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
    probes=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_bloom_never_false_negative(spark, keys, probes):
    from rialto_airflow_spark.operators import bloom as B

    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    pdf = spark.createDataFrame([(p,) for p in probes], "k long")
    bf = B.build_bloom(kdf, "k", m_bits=1 << 12, k=3)
    hits = {
        r["k"]
        for r in pdf.select("k", B.bloom_contains("k", bf).alias("h"))
        .where("h")
        .collect()
    }
    # every probe that IS a key must test positive, always
    assert (probes & keys) <= hits


@given(
    old=st.dictionaries(
        st.integers(0, 20), st.one_of(st.none(), st.integers(0, 3)), max_size=12
    ),
    new=st.dictionaries(
        st.integers(0, 20), st.one_of(st.none(), st.integers(0, 3)), max_size=12
    ),
)
@settings(**_SETTINGS)
def test_snapshot_diff_matches_dict_model(spark, old, new):
    from rialto_airflow_spark.operators.merge import snapshot_diff

    def mk(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [(None, None)], "k long, v long"
        ).where(F.col("k").isNotNull())

    got = {
        r["k"]: (r["op"], tuple(r["changed_cols"]))
        for r in snapshot_diff(mk(old), mk(new), "k").collect()
    }
    want = {}
    for k in old.keys() | new.keys():
        if k not in old:
            want[k] = ("insert", ())
        elif k not in new:
            want[k] = ("delete", ())
        elif old[k] != new[k]:
            want[k] = ("update", ("v",))
    assert got == want


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(1, 8),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_training_matches_reference_on_random_corpora(
    spark, texts, n_merges
):
    from rialto_airflow_spark.operators import bpe as B
    from tests.test_bpe import _py_train

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert B.train_bpe(
        df, num_merges=n_merges, checkpoint_every=3
    ) == _py_train(texts, n_merges)


# small-alphabet word-soup docs: tiny vocab maximizes accidental
# cross-doc window collisions, the interesting regime for span removal
_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


def _py_remove_spans_prop(rows, window):
    toks = {i: (t.strip().split() if t.strip() else [""]) for i, t in rows}
    first, count = {}, {}
    for i in sorted(toks):
        w = toks[i]
        for s in range(len(w) - window + 1):
            key = tuple(w[s : s + window])
            count[key] = count.get(key, 0) + 1
            first.setdefault(key, (i, s))
    out = {}
    for i in sorted(toks):
        w = toks[i]
        marked = [False] * len(w)
        for s in range(len(w) - window + 1):
            key = tuple(w[s : s + window])
            if count[key] >= 2 and first[key] != (i, s):
                for p in range(s, s + window):
                    marked[p] = True
        kept = [w[p] for p in range(len(w)) if not marked[p]]
        out[i] = (
            " ".join(kept),
            sum(1 for t in w if t != ""),
            len(w) - len(kept),
        )
    return out


@settings(**_SETTINGS)
@given(texts=_docs, window=st.integers(2, 4))
def test_remove_duplicate_spans_matches_model(spark, texts, window):
    """remove_duplicate_spans ≡ the pure-Python keep-first window
    model on random tiny-vocabulary corpora — every doc, every
    column, any window size."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in C.remove_duplicate_spans(df, window=window).collect()
    }
    assert got == _py_remove_spans_prop(rows, window)


@settings(**_SETTINGS)
@given(
    values=st.lists(st.integers(0, 500), min_size=1, max_size=120),
    cut=st.integers(0, 119),
    k=st.sampled_from([4, 16, 64]),
)
def test_kmv_merge_identity_under_random_splits(spark, values, cut, k):
    """Bottom-k mergeability law on random multisets: splitting the
    data at ANY point and merging the two sketches yields the exact
    sketch of the whole — array-identical, not approximately — and
    the estimate is exact whenever distinct(values) < k."""
    from rialto_airflow_spark.operators.sketches import kmv_merge, kmv_sketch

    cut = min(cut, len(values) - 1)
    left = values[: cut + 1]
    right = values[cut + 1 :]
    df_all = spark.createDataFrame([(v,) for v in values], "v long")
    whole = kmv_sketch(df_all, [], "v", k=k).collect()[0]

    parts = [
        kmv_sketch(spark.createDataFrame([(v,) for v in part], "v long"), [], "v", k=k)
        for part in (left, right)
        if part
    ]
    merged_in = parts[0]
    for p in parts[1:]:
        merged_in = merged_in.unionByName(p)
    merged = kmv_merge(merged_in.select("kmv"), None, k=k).collect()[0]

    assert list(merged["kmv"]) == list(whole["kmv"])
    assert merged["approx_distinct"] == whole["approx_distinct"]
    if len(set(values)) < k:
        assert whole["approx_distinct"] == len(set(values))
