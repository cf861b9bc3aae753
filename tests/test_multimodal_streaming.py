"""Tests for the multimodal binary plumbing and the availableNow
streaming ingest."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.operators import multimodal as MM
from rialto_airflow_spark.session import load_tables
from rialto_airflow_spark.streaming import events as SE


def test_attach_and_extract_features(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(50)
    media = MM.attach_binary(docs, "doc_id", "text", "image")
    feats = MM.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(src)
    for i, text in src.items():
        b = text.encode("utf-8")
        r = rows[i]
        assert r["n_bytes"] == len(b)
        assert r["content_md5"] == hashlib.md5(b).hexdigest()
        assert r["magic_int"] == (
            int.from_bytes(b[:8].ljust(8, b"\0"), "big") >> 1
        )
        assert r["feature"] == f"image:{hashlib.md5(b).hexdigest()[:8]}"


def test_decode_stub_rejects_unknown_kind():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"xx", "hologram")


def test_sample_frames(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(5)
    media = MM.attach_binary(docs, "doc_id", "text", "video")
    frames = MM.sample_frames(media, every_n_bytes=64)
    got = frames.groupBy("media_id").count().collect()
    want = {r["media_id"]: max(1, r["n_bytes"] // 64) for r in media.collect()}
    assert {r["media_id"]: r["count"] for r in got} == want


def test_streaming_available_now(spark, sf_dir):
    workdir = tempfile.mkdtemp(prefix="rspark_stream_")
    in_dir, ckpt, out_dir = (
        f"{workdir}/in",
        f"{workdir}/ckpt",
        f"{workdir}/out",
    )
    # stage input as micros-timestamp parquet (the engine's own format)
    ev = load_tables(spark, sf_dir, "events")["events"]
    ev.write.parquet(in_dir)

    stream = SE.read_event_stream(spark, in_dir)
    SE.run_available_now(SE.windowed_counts(stream), ckpt, out_dir)
    out1 = spark.read.parquet(out_dir)
    n1 = out1.count()
    assert n1 > 0

    # emitted rows must agree with the batch computation of the same
    # windows (append mode only finalizes windows past the watermark)
    batch = SE.windowed_counts_batch(ev)
    joined = out1.alias("s").join(
        batch.alias("b"),
        (F.col("s.window_start") == F.col("b.window_start"))
        & (F.col("s.event_type") == F.col("b.event_type")),
    )
    assert joined.count() == n1
    mismatch = joined.where(
        (F.col("s.n") != F.col("b.n"))
        | (F.col("s.total_value") != F.col("b.total_value"))
    )
    assert mismatch.count() == 0

    # re-run with no new files: exactly-once, nothing appended
    stream2 = SE.read_event_stream(spark, in_dir)
    SE.run_available_now(SE.windowed_counts(stream2), ckpt, out_dir)
    assert spark.read.parquet(out_dir).count() == n1
    shutil.rmtree(workdir, ignore_errors=True)


def test_demux_frames_matches_builtin_fanout(spark, sf_dir):
    """The vectorized mapInPandas demux path (the shape a real frame
    decoder needs) must emit the identical row set as the built-in
    explode fan-out."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(50)
    media = MM.attach_binary(docs, "doc_id", "text", "video")
    a = MM.sample_frames(media, every_n_bytes=64)
    b = MM.demux_frames(media, every_n_bytes=64)
    # same names and types (nullability flags differ: codegen proves
    # explode output non-null, mapInPandas can't)
    assert [(f.name, f.dataType) for f in a.schema] == [
        (f.name, f.dataType) for f in b.schema
    ]
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0


def test_streaming_sessionization_matches_batch(spark, sf_dir):
    """session_window over a stream (complete-mode drain, no
    watermark) must emit exactly the batch session_window aggregation
    — the streaming sessionization twin of q34/q51."""
    workdir = tempfile.mkdtemp(prefix="rspark_sess_")
    in_dir, ckpt = f"{workdir}/in", f"{workdir}/ckpt"
    ev = load_tables(spark, sf_dir, "events")["events"]
    ev.write.parquet(in_dir)

    stream = SE.read_event_stream(spark, in_dir)
    SE.run_available_now_memory(
        SE.session_counts_stream(stream, "30 minutes", late=None),
        ckpt,
        "sess_drain",
        mode="complete",
    )
    got = spark.table("sess_drain")
    want = SE.session_counts_batch(ev, "30 minutes")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).unionAll(want.exceptAll(got)).count() == 0
    shutil.rmtree(workdir, ignore_errors=True)


def test_stateful_sessionizer_matches_batch_minus_tails(spark, sf_dir):
    """The applyInPandasWithState sessionizer emits exactly the batch
    operator's sessions MINUS each user's final (still-open) one —
    same strict-> floor-seconds gap rule as operators.events."""
    from rialto_airflow_spark.operators import events as EV

    workdir = tempfile.mkdtemp(prefix="rspark_sess_state_")
    in_dir, ckpt = f"{workdir}/in", f"{workdir}/ckpt"
    ev = load_tables(spark, sf_dir, "events")["events"]
    ev.write.parquet(in_dir)

    stream = SE.read_event_stream(spark, in_dir)
    SE.run_available_now_memory(
        SE.sessionize_stateful(stream, gap_seconds=1800),
        ckpt,
        "sess_state",
        mode="append",
    )
    got = {
        (r.user_id, r.start_s, r.end_s, r.n_events)
        for r in spark.table("sess_state").collect()
    }

    stats = EV.session_stats(ev, "user_id", "ts", 1800)
    last = stats.groupBy("user_id").agg(
        F.max("session_seq").alias("last_seq")
    )
    want = {
        (r.user_id, r.start_s, r.end_s, r.n_events)
        for r in stats.join(last, "user_id")
        .where(F.col("session_seq") < F.col("last_seq"))
        .select(
            "user_id",
            F.unix_timestamp("session_start").alias("start_s"),
            F.unix_timestamp("session_end").alias("end_s"),
            "n_events",
        )
        .collect()
    }
    assert len(got) > 0
    assert got == want
    shutil.rmtree(workdir, ignore_errors=True)
