"""Tests for watermark semantics, the M1 author upsert conflict
rules, and the file-backed ingest connector layer."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.plans import watermark as W
from rialto_airflow_spark.sources import ingest as I

TS = datetime.datetime


def ts(day, hour=0):
    return TS(2024, 1, day, hour)


@pytest.fixture()
def harvests(spark):
    return spark.createDataFrame(
        [
            (1, ts(1), ts(1, 2), False),
            (2, ts(5), ts(5, 2), True),
            (3, ts(9), None, False),
        ],
        "id bigint, created_at timestamp, finished_at timestamp, is_full boolean",
    )


def test_latest_and_previous(spark, harvests):
    newest = W.latest_harvest(harvests)
    assert newest["id"] == 3
    prev = W.previous_harvest(harvests, newest)
    assert prev["id"] == 2            # latest FINISHED older harvest
    full = harvests.where(F.col("id") == 2).collect()[0]
    assert W.previous_harvest(harvests, full) is None  # full -> no watermark
    assert W.harvest_complete(harvests) is False       # newest unfinished


def test_fill_in_predicate(spark):
    pubs = spark.createDataFrame(
        [
            (1, "10.1/a", None, None, ts(8)),
            (2, "10.1/b", None, ts(2), ts(2)),
            (3, None, None, None, ts(8)),
            (4, "10.1/c", '{"x":1}', None, ts(8)),
        ],
        "id bigint, doi string, crossref_json string, "
        "crossref_harvested timestamp, updated_at timestamp",
    )
    full = {r["id"] for r in pubs.where(W.fill_in_predicate("crossref", None)).collect()}
    assert full == {1, 4}  # doi present, never harvested (4 has json but no ts)
    inc = {
        r["id"]
        for r in pubs.where(
            W.fill_in_predicate("crossref", F.lit(ts(5)))
        ).collect()
    }
    assert inc == {1}      # touched since watermark, json missing, doi present


AUTHOR_DDL = (
    "sunet string, cap_profile_id string, orcid string, first_name string, "
    "created_at timestamp, updated_at timestamp"
)


def test_upsert_authors_rules(spark):
    existing = spark.createDataFrame(
        [
            ("ada", "cap1", "0-1", "Ada", ts(1), ts(1)),
            ("gho", "cap2", "0-2", "Grace", ts(1), ts(1)),
        ],
        AUTHOR_DDL,
    )
    incoming = spark.createDataFrame(
        [
            ("ada", "cap1", "0-1", "Ada", None, None),       # identical -> noop
            ("new1", "cap9", "0-9", "New", None, None),      # insert
            ("thief", None, "0-2", "Thief", None, None),     # orcid conflict -> skipped
            ("gho2", "cap2", "0-8", "Grace2", None, None),   # cap conflict -> overwrites gho
        ],
        AUTHOR_DDL,
    )
    out = W.upsert_authors(existing, incoming, now=F.lit(ts(9)))
    rows = {r["sunet"]: r for r in out.collect()}
    assert rows["ada"]["updated_at"] == ts(1)          # noop preserves updated_at
    assert rows["new1"]["updated_at"] == ts(9)         # insert stamped
    assert "thief" not in rows                         # orcid conflict skipped
    # cap conflict: incoming overwrote the existing row (same sunet key)
    assert rows["gho"]["first_name"] == "Grace2"
    assert rows["gho"]["orcid"] == "0-8"
    assert rows["gho"]["updated_at"] == ts(9)
    assert set(rows) == {"ada", "gho", "new1"}


def test_read_payload_batch(spark, tmp_path):
    lines = [
        json.dumps({"UID": "WOS:000111", "dynamic_data": {"cluster_related": {
            "identifiers": {"identifier": [
                {"type": "doi", "value": "https://doi.org/10.1/X"}]}}}}),
        json.dumps({"UID": "MEDLINE:222"}),
    ]
    p = tmp_path / "wos.jsonl"
    p.write_text("\n".join(lines))
    out = I.read_payload_batch(spark, "wos", str(p), harvested_at="2024-01-05")
    rows = sorted(out.collect(), key=lambda r: (r["doi"] is None, str(r["doi"])))
    assert rows[0]["doi"] == "10.1/x"
    assert rows[0]["wos_id"] == "000111"
    assert rows[1]["doi"] is None
    assert rows[1]["wos_id"] is None  # MEDLINE uid normalized to null
    assert rows[0]["wos_harvested"] == ts(5)


def test_batched_and_fetch(spark):
    ids = spark.createDataFrame([(f"10.1/{i:03d}",) for i in range(10)], "doi string")
    b = I.batched(ids, "doi", 4)
    rows = b.collect()
    # partition-of-input: every id in exactly one batch, none invented
    got = sorted(d for r in rows for d in r["ids"])
    assert got == sorted(f"10.1/{i:03d}" for i in range(10))
    assert all(1 <= len(r["ids"]) <= 4 for r in rows)
    # deterministic: same input -> identical batches (keys and members)
    again = {r["batch_idx"]: list(r["ids"]) for r in I.batched(ids, "doi", 4).collect()}
    assert {r["batch_idx"]: list(r["ids"]) for r in rows} == again

    def fake_fetch(batch):
        return [json.dumps({"doi": d}) for d in batch]

    fetched = I.fetch_batches(b, fake_fetch)
    assert fetched.count() == 10


def test_batched_has_no_single_partition_sort(spark):
    """The batching window is keyed per hash-partition — the plan must
    not move all ids to one task (no Exchange SinglePartition), the
    round-4 scale wart this operator had with a global orderBy."""
    ids = spark.createDataFrame([(f"d{i}",) for i in range(50)], "doi string")
    plan = (
        I.batched(ids, "doi", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_format_wos_timespan():
    assert I.format_wos_timespan(6) == "6D"
    assert I.format_wos_timespan(7) == "1W"
    assert I.format_wos_timespan(8) == "2W"
    assert I.format_wos_timespan(364) == "52W"
    assert I.format_wos_timespan(365) == "1Y"
    assert I.format_wos_timespan(366) == "2Y"


def test_retrying_fetch_backoff_and_rate_limit():
    """Two failures then success: backoff sleeps 2s, 4s; the polite
    inter-call sleep follows success; attempts beyond max_retries
    re-raise."""
    from rialto_airflow_spark.sources.ingest import (
        RetryPolicy,
        TransientFetchError,
        retrying_fetch,
    )

    calls, naps = [], []

    def flaky(ids):
        calls.append(list(ids))
        if len(calls) < 3:
            raise TransientFetchError("503")
        return [f"payload:{i}" for i in ids]

    fetch = retrying_fetch(
        flaky, RetryPolicy(page_size=10, sleep_seconds=0.5), sleep=naps.append
    )
    assert fetch(["a", "b"]) == ["payload:a", "payload:b"]
    assert len(calls) == 3
    assert naps == [2.0, 4.0, 0.5]

    def always_down(ids):
        raise TransientFetchError("504")

    hard = retrying_fetch(
        always_down,
        RetryPolicy(page_size=10, max_retries=2),
        sleep=naps.append,
    )
    try:
        hard(["x"])
        raise AssertionError("expected TransientFetchError")
    except TransientFetchError:
        pass


def test_retrying_fetch_fails_fast_on_non_transient():
    """Deterministic errors (bad auth, programming bugs) must NOT
    retry — one attempt, zero sleeps, exception propagates."""
    from rialto_airflow_spark.sources.ingest import RetryPolicy, retrying_fetch

    calls, naps = [], []

    def broken(ids):
        calls.append(list(ids))
        raise ValueError("401 bad token")

    fetch = retrying_fetch(broken, RetryPolicy(page_size=10), sleep=naps.append)
    try:
        fetch(["a"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert calls == [["a"]]
    assert naps == []


def test_paged_fetch_drains_cursor():
    from rialto_airflow_spark.sources.ingest import RetryPolicy, paged_fetch

    pages = {None: (["p1", "p2"], "c1"), "c1": (["p3"], "c2"), "c2": ([], None)}
    sizes = []

    def transport(cursor, page_size):
        sizes.append(page_size)
        return pages[cursor]

    run = paged_fetch(transport, RetryPolicy(page_size=2))
    assert list(run()) == ["p1", "p2", "p3"]
    assert sizes == [2, 2, 2]


def test_fetch_batches_with_retrying_transport(spark):
    """End-to-end executor-side loop: id batches -> retrying fetch
    (fails once per batch) -> payload rows."""
    from rialto_airflow_spark.sources import ingest as I

    ids = spark.createDataFrame([(f"d{i}",) for i in range(7)], ["doi"])
    b = I.batched(ids, "doi", batch_size=3)

    seen = set()

    def flaky_once(batch):
        key = tuple(batch)
        if key not in seen:
            seen.add(key)
            raise I.TransientFetchError("first try fails")
        return [f"json:{d}" for d in batch]

    out = I.fetch_batches(
        b,
        I.retrying_fetch(
            flaky_once,
            I.POLICIES["openalex"],
            sleep=lambda s: None,
        ),
    )
    got = sorted(r.json for r in out.collect())
    assert got == sorted(f"json:d{i}" for i in range(7))
