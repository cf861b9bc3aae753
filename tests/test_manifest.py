"""Bucketed manifest versions — the O(changes) WRITE path (round 10).

A plain TableStore.write materializes the whole table per version;
manifest versions rewrite only dirty key-buckets and carry clean ones
by reference. These tests pin the three contracts that matter at
100 TB: (1) value semantics identical to the full-rewrite paths,
(2) bytes written proportional to the change set, with clean buckets
literally the same files across versions, (3) maintenance — time
travel, restore, vacuum, compaction — still correct when a version's
data spans several carrier dirs.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from rialto_airflow_spark.storage import TableStore

# slow integration battery — excluded from the default lane (see
# pyproject.toml); run with: pytest tests/ -m slowlane
pytestmark = pytest.mark.slowlane


def _bytes(vdir: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(vdir + "/**/*.parquet", recursive=True)
    )


def _files(vdir: str) -> set[str]:
    return set(glob.glob(vdir + "/**/*.parquet", recursive=True))


def _base(spark, n=2000):
    return (
        spark.range(n)
        .withColumn("v", F.col("id") * 2)
        .withColumn("grp", (F.col("id") % 7).cast("int"))
    )


def test_write_and_read_round_trip(spark, tmp_path):
    st = TableStore(str(tmp_path))
    df = _base(spark)
    st.write_manifest(df, "t", "id", n_buckets=16)
    got = st.read(spark, "t")
    assert got.exceptAll(df).unionAll(df.exceptAll(got)).count() == 0
    # the synthetic bucket column never leaks into the table schema
    assert got.columns == df.columns


def test_upsert_rewrites_only_dirty_buckets(spark, tmp_path):
    """Bytes written per upsert ~ dirty buckets, clean buckets carried
    as the SAME files; values equal a full-table merge oracle."""
    from rialto_airflow_spark.operators.merge import merge_on_key

    st = TableStore(str(tmp_path))
    df = _base(spark)
    v1 = st.write_manifest(df, "t", "id", n_buckets=16)
    before = _files(v1)

    batch = spark.createDataFrame(
        [(5, 999, 0), (9999, 1, 1), (None, 7, 2)],
        "id long, v long, grp int",
    )
    v2 = st.upsert_manifest(spark, "t", batch)

    # oracle: the plain full-table MERGE over the same inputs
    want = merge_on_key(df, batch, "id")
    got = st.read(spark, "t")
    assert got.exceptAll(want).unionAll(want.exceptAll(got)).count() == 0

    # O(changes): the new version holds only the touched buckets
    m = st.current_info("t")["manifest"]
    dirty = [k for k, vd in m.items() if vd == v2]
    assert 1 <= len(dirty) <= 3  # ≤ one bucket per batch key
    assert _bytes(v2) < _bytes(v1) / 4
    # clean buckets: same files, untouched (carried by reference)
    assert before <= _files(v1) | _files(v2)
    carried = [k for k, vd in m.items() if vd == v1]
    assert len(carried) == 16 - len(dirty)


def test_upsert_semantics_match_plain_stream_shape(spark, tmp_path):
    """update_cols / updated_at_col behave exactly like merge_on_key's
    M2 contract through the manifest path."""
    import datetime

    t0 = datetime.datetime(2020, 1, 1)
    st = TableStore(str(tmp_path))
    df = (
        spark.range(100)
        .withColumn("a", F.lit(1))
        .withColumn("b", F.lit("keep"))
        .withColumn("updated_at", F.lit(t0).cast("timestamp"))
    )
    st.write_manifest(df, "t", "id", n_buckets=8)
    batch = spark.createDataFrame([(3, 42, "new")], "id long, a int, b string")
    st.upsert_manifest(
        spark, "t", batch, update_cols=["a"], updated_at_col="updated_at"
    )
    row = st.read(spark, "t").where(F.col("id") == 3).first()
    assert row["a"] == 42 and row["b"] == "keep"
    assert row["updated_at"] != t0
    untouched = st.read(spark, "t").where(F.col("id") == 4).first()
    assert untouched["updated_at"] == t0


def test_replace_keys_is_delete_then_insert(spark, tmp_path):
    """The incremental-mart write shape: affected keys' rows vanish,
    the fragment lands, everything else carries — equal to the
    full delete+insert oracle, written O(dirty buckets)."""
    st = TableStore(str(tmp_path))
    df = _base(spark)
    v1 = st.write_manifest(df, "t", "id", n_buckets=16)

    affected = spark.createDataFrame([(5,), (6,), (7777,)], "id long")
    fragment = spark.createDataFrame(
        [(5, -1, 0), (7777, -2, 1)], "id long, v long, grp int"
    )
    v2 = st.replace_keys_manifest(spark, "t", affected, fragment)

    want = df.join(affected, "id", "left_anti").unionByName(fragment)
    got = st.read(spark, "t")
    assert got.exceptAll(want).unionAll(want.exceptAll(got)).count() == 0
    assert _bytes(v2) < _bytes(v1) / 4
    # id=6 was deleted with no replacement
    assert got.where(F.col("id") == 6).count() == 0


def test_replace_can_empty_a_bucket(spark, tmp_path):
    """Deleting every row of a bucket drops it from the manifest —
    reads stay consistent, no dangling reference."""
    st = TableStore(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    st.write_manifest(df, "t", "id", n_buckets=4)
    st.replace_keys_manifest(
        spark,
        "t",
        spark.createDataFrame([(1,)], "id long"),
        spark.createDataFrame([], "id long, v string"),
    )
    got = st.read(spark, "t")
    assert [r["id"] for r in got.collect()] == [2]


def test_time_travel_and_restore_over_manifest_versions(spark, tmp_path):
    st = TableStore(str(tmp_path))
    df = _base(spark, 500)
    st.write_manifest(df, "t", "id", n_buckets=8)
    batch = spark.createDataFrame([(0, -5, 0)], "id long, v long, grp int")
    st.upsert_manifest(spark, "t", batch)

    vs = st.versions("t")
    assert len(vs) == 2 and vs[1]["current"]
    old = st.read_version(spark, "t", vs[0]["version"])
    assert old.where(F.col("id") == 0).first()["v"] == 0  # pre-upsert
    assert st.read(spark, "t").where(F.col("id") == 0).first()["v"] == -5

    # restore re-commits the old manifest: reads resolve carried buckets
    st.restore("t", vs[0]["version"])
    assert st.read(spark, "t").where(F.col("id") == 0).first()["v"] == 0
    assert st.read(spark, "t").count() == 500


def test_vacuum_keeps_carrier_dirs_and_reclaims_dead_buckets(
    spark, tmp_path
):
    """A version dir beyond retention whose buckets a KEPT manifest
    still references survives as a carrier; its superseded bucket
    dirs are reclaimed; a dir nothing references is deleted whole;
    and time travel to a torn version raises loudly."""
    st = TableStore(str(tmp_path))
    df = _base(spark)
    v1 = st.write_manifest(df, "t", "id", n_buckets=8)

    mk = lambda i: spark.createDataFrame(
        [(i, i, 0)], "id long, v long, grp int"
    )
    v2 = st.upsert_manifest(spark, "t", mk(10_001))
    v3 = st.upsert_manifest(spark, "t", mk(10_001))  # re-dirty v2's bucket
    vs_before = st.versions("t")

    removed = st.vacuum("t", keep=1, orphan_grace_s=0)
    # v2's only bucket was superseded by v3 → v2 deleted whole;
    # v1 carries the 7 clean buckets → survives
    assert removed == [v2]
    assert os.path.isdir(v1) and os.path.isdir(v3)
    got = st.read(spark, "t")
    assert got.count() == 2001
    assert got.where(F.col("id") == 10_001).first()["v"] == 10_001

    # time travel to the vacuumed middle version is gone, loudly
    middle = next(v for v in vs_before if v["path"] == v2)
    with pytest.raises(FileNotFoundError):
        st.read_version(spark, "t", middle["version"])
    # ... but the oldest version's data it still shares is intact:
    # v1 remains fully readable (all 8 of its buckets still exist —
    # 7 referenced + its own copy of the dirty one only if retained)
    first = next(v for v in vs_before if v["path"] == v1)
    try:
        old = st.read_version(spark, "t", first["version"])
        assert old.count() == 2000
    except FileNotFoundError:
        pass  # acceptable: v1's dirty-bucket leaf was reclaimed


def test_vacuum_fully_reclaims_after_compaction(spark, tmp_path):
    """compact_buckets(max_files=1) re-homes every bucket; the next
    vacuum deletes all old carriers outright."""
    st = TableStore(str(tmp_path))
    df = _base(spark, 300)
    v1 = st.write_manifest(df, "t", "id", n_buckets=4)
    for i in range(3):
        st.upsert_manifest(
            spark,
            "t",
            spark.createDataFrame([(i, -i, 0)], "id long, v long, grp int"),
        )
    vc = st.compact_buckets(spark, "t", max_carriers=1)
    assert set(st.current_info("t")["manifest"].values()) == {vc}
    removed = st.vacuum("t", keep=1, orphan_grace_s=0)
    assert v1 in removed and len(removed) == 4
    assert st.read(spark, "t").count() == 300
    assert st.read(spark, "t").where(F.col("id") == 1).first()["v"] == -1


def test_compact_buckets_cost_proportional_to_fragmentation(
    spark, tmp_path
):
    """Carrier consolidation: upserts scatter the manifest across one
    dir per batch; compaction folds the single-bucket tail together
    while the big bootstrap carrier (the cold majority of the data)
    is carried untouched — bytes rewritten track the fragmentation,
    not the table."""
    st = TableStore(str(tmp_path))
    df = _base(spark)
    v1 = st.write_manifest(df, "t", "id", n_buckets=16)
    # six upserts to distinct keys → up to six single-bucket carriers
    for i in range(6):
        st.upsert_manifest(
            spark,
            "t",
            spark.createDataFrame(
                [(10_000 + i, i, 0)], "id long, v long, grp int"
            ),
        )
    m = st.current_info("t")["manifest"]
    spread = len(set(m.values()))
    assert spread >= 5  # the fragmentation really built up

    vc = st.compact_buckets(spark, "t", max_carriers=3)
    assert vc is not None
    m2 = st.current_info("t")["manifest"]
    assert len(set(m2.values())) <= 3
    # the bootstrap carrier survives untouched (largest, so kept) and
    # its files are byte-identical — carried, never copied
    assert v1 in set(m2.values())
    # only the fragmented tail rewrote: the new dir is small
    assert _bytes(vc) < _bytes(v1) / 2
    # idempotent under the same threshold
    assert st.compact_buckets(spark, "t", max_carriers=3) is None
    got = st.read(spark, "t")
    assert got.count() == 2006
    assert got.where(F.col("id") == 10_005).first()["v"] == 5


def test_stream_upsert_with_manifest_buckets_converges(spark, tmp_path):
    """The streaming MERGE sink over manifest versions: same replay
    convergence as the plain path, but each micro-batch's version
    dir holds ONLY the buckets the batch touched."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    mk([
        (i, t0, i, "view", float(i), "{}") for i in range(200)
    ]).coalesce(1).write.parquet(in_dir)
    SE.stream_upsert(
        SE.read_event_stream(spark, in_dir),
        st, "ev", "event_id", ckpt, manifest_buckets=16,
    )
    assert st.read(spark, "ev").count() == 200
    v_boot = st.current_version("ev")

    mk([
        (3, t0 + datetime.timedelta(minutes=1), 3, "click", 99.0, "{}"),
        (500, t0 + datetime.timedelta(minutes=1), 5, "view", 1.0, "{}"),
    ]).coalesce(1).write.parquet(in_dir, mode="append")
    SE.stream_upsert(
        SE.read_event_stream(spark, in_dir),
        st, "ev", "event_id", ckpt, manifest_buckets=16,
    )
    got = st.read(spark, "ev")
    assert got.count() == 201
    assert got.where(F.col("event_id") == 3).first()["value"] == 99.0
    # the batch version holds only dirty buckets — O(batch) bytes
    v2 = st.current_version("ev")
    assert _bytes(v2) < _bytes(v_boot) / 3
    m = st.current_info("ev")["manifest"]
    assert sum(1 for vd in m.values() if vd == v_boot) >= 13


def test_stream_upsert_manifest_mart_writes_only_affected_groups(
    spark, tmp_path
):
    """mart={"manifest_buckets": N}: the mart itself becomes a
    manifest table and each refresh lands as a keyed REPLACE — the
    per-batch mart version holds only the affected groups' buckets,
    while values still equal a full recompute after every drain."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    store = TableStore(str(tmp_path / "store"))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    mart = {
        "table": "by_type",
        "group_col": "event_type",
        "agg_exprs": [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        ],
        "manifest_buckets": 8,
    }

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            store, "ev", "event_id", ckpt, mart=mart,
        )

    def mart_rows():
        return {
            r["event_type"]: (r["n"], r["total"])
            for r in store.read(spark, "by_type").collect()
        }

    # batch 1: five groups bootstrap the manifest mart
    mk([
        (i, t0, i, f"t{i % 5}", float(i), "{}") for i in range(50)
    ]).coalesce(1).write.parquet(in_dir)
    drain()
    info1 = store.current_info("by_type")
    assert "manifest" in info1 and info1["built_from"]

    # batch 2 touches ONE group
    mk([
        (100, t0 + datetime.timedelta(minutes=1), 1, "t3", 7.5, "{}"),
    ]).coalesce(1).write.parquet(in_dir, mode="append")
    drain()
    info2 = store.current_info("by_type")
    v2 = info2["path"]
    # the refresh version carries every untouched bucket by reference
    dirty = [k for k, vd in info2["manifest"].items() if vd == v2]
    assert len(dirty) <= 1
    final = store.read(spark, "ev")
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in final.groupBy("event_type").agg(*mart["agg_exprs"]).collect()
    }
    assert mart_rows() == want
    assert want["t3"] == (11, 7.5 + sum(float(i) for i in range(3, 50, 5)))


def test_upsert_into_brand_new_buckets_only(spark, tmp_path):
    """A batch whose keys all hash into buckets the table has never
    populated exercises the empty-slice path: schema comes from the
    manifest read, every batch row inserts, no existing bucket is
    touched."""
    st = TableStore(str(tmp_path))
    # two rows → at most two occupied buckets out of 64
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    v1 = st.write_manifest(df, "t", "id", n_buckets=64)
    occupied = set(st.current_info("t")["manifest"])

    # find keys hashing into unoccupied buckets
    cand = spark.range(3, 300).select(
        F.col("id"),
        TableStore._bucket_expr("id", 64).alias("b"),
    ).collect()
    fresh = [r["id"] for r in cand if str(r["b"]) not in occupied][:3]
    assert len(fresh) == 3
    batch = spark.createDataFrame(
        [(k, f"new{k}") for k in fresh], "id long, v string"
    )
    v2 = st.upsert_manifest(spark, "t", batch)
    got = st.read(spark, "t")
    assert got.count() == 5
    assert {r["v"] for r in got.collect()} == {"a", "b"} | {
        f"new{k}" for k in fresh
    }
    m = st.current_info("t")["manifest"]
    # old buckets untouched, new buckets homed in v2
    assert all(m[k] == v1 for k in occupied)
    assert all(vd in (v1, v2) for vd in m.values())


def test_concurrent_upserts_never_lose_each_others_buckets(
    spark, tmp_path, monkeypatch
):
    """Lost-update race (the index-marker lesson applied to tables):
    writer A resolves the manifest, writer B commits an upsert to a
    DIFFERENT bucket before A's commit lands. An unconditional commit
    from A would re-point B's bucket at pre-B data — both callers
    succeed, B's row silently vanishes. With the CAS, A conflicts,
    retries against B's manifest, and BOTH changes survive."""
    st = TableStore(str(tmp_path))
    df = _base(spark)
    st.write_manifest(df, "t", "id", n_buckets=16)

    batch_a = spark.createDataFrame([(10_001, 1, 0)], "id long, v long, grp int")
    batch_b = spark.createDataFrame([(20_002, 2, 0)], "id long, v long, grp int")
    # distinct buckets — otherwise the race isn't the dangerous one
    ba, bb = [
        spark.createDataFrame([(k,)], "id long")
        .select(TableStore._bucket_expr("id", 16))
        .first()[0]
        for k in (10_001, 20_002)
    ]
    assert ba != bb

    real_store = TableStore._store
    fired = {"n": 0}

    class CommitRaces:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def commit(self, *a, **kw):
            if (kw.get("extra") or {}).get("manifest") and fired["n"] == 0:
                fired["n"] += 1
                # writer B lands first, in the window between A's
                # manifest resolution and A's commit
                st.upsert_manifest(spark, "t", batch_b)
            return self._inner.commit(*a, **kw)

    monkeypatch.setattr(
        TableStore, "_store", lambda self, name: CommitRaces(real_store(self, name))
    )
    st.upsert_manifest(spark, "t", batch_a)
    monkeypatch.setattr(TableStore, "_store", real_store)

    assert fired["n"] == 1  # the race really ran
    got = st.read(spark, "t")
    assert got.count() == 2002
    assert got.where(F.col("id") == 10_001).first()["v"] == 1
    assert got.where(F.col("id") == 20_002).first()["v"] == 2  # B survived


def test_stream_upsert_compaction_cadence_bounds_carrier_spread(
    spark, tmp_path
):
    """compact_every on a manifest-table stream: carriers are folded
    on cadence so an indefinite stream's manifest spread stays
    bounded; values keep converging, and a manifest-shaped mart's
    built_from provenance survives compaction (the next refresh stays
    incremental, not a silent full repair)."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    mart = {
        "table": "by_type",
        "group_col": "event_type",
        "agg_exprs": [F.count(F.lit(1)).alias("n")],
        "manifest_buckets": 8,
    }

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            st, "ev", "event_id", ckpt,
            manifest_buckets=16, mart=mart, compact_every=2,
            compact_max_carriers=2,
        )

    mk([
        (i, t0, i, f"t{i % 3}", 1.0, "{}") for i in range(60)
    ]).coalesce(1).write.parquet(in_dir)
    drain()
    for b in range(3):
        mk([
            (1000 + b, t0 + datetime.timedelta(minutes=b + 1), b,
             f"t{b % 3}", 1.0, "{}"),
        ]).coalesce(1).write.parquet(in_dir, mode="append")
        drain()

    # 4 batches, compacted at batches 2 and 4 → spread stays small
    spread = len(set(st.current_info("ev")["manifest"].values()))
    assert spread <= 3
    got = st.read(spark, "ev")
    assert got.count() == 63

    # mart: still incremental-capable (built_from survived the
    # compaction) and equal to the full recompute
    minfo = st.current_info("by_type")
    assert "manifest" in minfo and minfo.get("built_from")
    want = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(*mart["agg_exprs"]).collect()
    }
    have = {
        r["event_type"]: r["n"] for r in st.read(spark, "by_type").collect()
    }
    assert have == want


def test_empty_bootstrap_then_upsert(spark, tmp_path):
    """A zero-row bootstrap (e.g. a stream whose first micro-batch
    filtered to nothing) must not wedge the table: the empty manifest
    head reads as an empty table and takes upserts — without the
    recorded-schema payload this raised FileNotFoundError forever."""
    st = TableStore(str(tmp_path))
    empty = spark.createDataFrame([], "id long, v long")
    st.write_manifest(empty, "t", "id", n_buckets=8)
    assert st.read(spark, "t").count() == 0
    st.upsert_manifest(
        spark, "t", spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    )
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    assert got == {1: 10, 2: 20}


def test_upsert_schema_evolution_adds_column(spark, tmp_path):
    """A batch adding a column (the M2 contract allows it — a new
    harvest source brings its own columns) must surface on EVERY read,
    with carried buckets reading it as null. Without the recorded
    schema, reads inferred from one arbitrary file footer and the new
    column silently vanished (or flickered with listing order)."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=200)
    st.write_manifest(df, "t", "id", n_buckets=8)
    batch = spark.createDataFrame(
        [(5, 999, 0, "x")], "id long, v long, grp int, extra string"
    )
    st.upsert_manifest(spark, "t", batch)
    got = st.read(spark, "t")
    assert "extra" in got.columns
    assert got.where(F.col("id") == 5).first()["extra"] == "x"
    # carried rows: column present, null
    assert got.where(F.col("extra").isNull()).count() == 199
    # the widened schema survives compaction of old carriers
    st.compact_buckets(spark, "t", max_carriers=1)
    got2 = st.read(spark, "t")
    assert got2.where(F.col("id") == 5).first()["extra"] == "x"
    assert got2.where(F.col("extra").isNull()).count() == 199


def test_upsert_type_change_fails_loudly(spark, tmp_path):
    """A TYPE change can't ride the O(changes) path (carried files
    keep the old physical type) — it must raise with the rebuild
    pointer, not corrupt reads later."""
    st = TableStore(str(tmp_path))
    st.write_manifest(
        spark.createDataFrame([(1, 10)], "id long, v int"), "t", "id",
        n_buckets=4,
    )
    batch = spark.createDataFrame([(2, "oops")], "id long, v string")
    with pytest.raises(ValueError, match="type change"):
        st.upsert_manifest(spark, "t", batch)


def test_replace_fragment_schema_evolution(spark, tmp_path):
    """A mart fragment gaining a column (mart definition evolved) is
    kept, nulled on carried rows — previously the select(*slice.cols)
    silently DROPPED it from the fragment."""
    st = TableStore(str(tmp_path))
    st.write_manifest(_base(spark, n=100), "m", "grp", n_buckets=8)
    frag = spark.createDataFrame(
        [(0, 0, 1, 7.5)], "id long, v long, grp int, score double"
    )
    keys = spark.createDataFrame([(1,)], "grp int")
    st.replace_keys_manifest(spark, "m", keys, frag)
    got = st.read(spark, "m")
    assert got.where(F.col("grp") == 1).first()["score"] == 7.5
    assert got.where(F.col("score").isNull()).count() == got.count() - 1


def test_restore_carries_schema_and_checks_buckets(spark, tmp_path):
    """Restore of a manifest version re-commits the FULL creating
    payload (schema included), so a post-restore read still resolves
    added columns; restoring a version whose carried bucket was
    vacuumed fails loudly instead of re-pointing at torn data."""
    import os as _os

    st = TableStore(str(tmp_path))
    v1 = st.write_manifest(_base(spark, n=100), "t", "id", n_buckets=8)
    batch = spark.createDataFrame(
        [(5, 1, 0, "x")], "id long, v long, grp int, extra string"
    )
    st.upsert_manifest(spark, "t", batch)
    # restore to v1: schema payload carried, reads work
    st.restore("t", _os.path.basename(v1))
    got = st.read(spark, "t")
    assert "extra" not in got.columns and got.count() == 100
    info = st.current_info("t")
    assert info.get("restored") and "schema" in info


def test_read_keys_prunes_to_matching_buckets(spark, tmp_path):
    """Point lookup reads ONLY the requested keys' bucket dirs (path
    selection — Spark can't derive bucket=f(key) pruning itself on a
    path-selected read), returns exactly the matching rows, handles a
    requested null key, and misses cleanly on absent keys."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=500).unionByName(
        spark.createDataFrame([(None, -1, 0)], "id long, v long, grp int")
    )
    st.write_manifest(df, "t", "id", n_buckets=32)

    got = st.read_keys(spark, "t", [7, 401, None])
    rows = {r["id"]: r["v"] for r in got.collect()}
    assert rows == {7: 14, 401: 802, None: -1}
    # plan touches ≤3 bucket leaf dirs, not all 32
    scan = got._jdf.queryExecution().executedPlan().toString()
    import re as _re

    n_paths = int(_re.search(r"InMemoryFileIndex\((\d+) paths?\)", scan).group(1))
    assert 0 < n_paths <= 3  # path-pruned, not a 32-bucket scan

    # absent key: empty, schema intact
    miss = st.read_keys(spark, "t", [99999])
    assert miss.count() == 0 and miss.columns == ["id", "v", "grp"]

    # plain head: loud error pointing at the filtered-read shape
    st.write(_base(spark, n=10), "plain")
    with pytest.raises(ValueError, match="not a manifest"):
        st.read_keys(spark, "plain", [1])


def test_read_buckets_slices_versions_without_full_scans(spark, tmp_path):
    """read_buckets + batch_buckets: the bucket-pruned slice read
    behind O(changes) streaming change detection. Requested buckets of
    a NAMED version resolve under its own manifest (time-travel-aware:
    the same bucket id yields different rows before/after an upsert),
    the plan touches only the requested leaf dirs, absent buckets
    contribute nothing, and a plain version raises."""
    import re as _re

    st = TableStore(str(tmp_path))
    df = _base(spark, n=500)
    v1 = st.write_manifest(df, "t", "id", n_buckets=16)

    batch = spark.createDataFrame([(5, 999, 0)], "id long, v long, grp int")
    bks = st.batch_buckets("t", batch)
    assert len(bks) == 1
    st.upsert_manifest(spark, "t", batch)

    old_slice = st.read_buckets(spark, "t", bks, version=os.path.basename(v1))
    new_slice = st.read_buckets(spark, "t", bks)
    assert old_slice.where(F.col("id") == 5).collect()[0]["v"] == 10
    assert new_slice.where(F.col("id") == 5).collect()[0]["v"] == 999
    # both slices hold EXACTLY bucket 5's rows of their version —
    # same membership (the upsert changed a value, not the key set)
    assert old_slice.count() == new_slice.count() > 0
    for sl in (old_slice, new_slice):
        scan = sl._jdf.queryExecution().executedPlan().toString()
        n_paths = int(
            _re.search(r"InMemoryFileIndex\((\d+) paths?\)", scan).group(1)
        )
        assert n_paths == 1  # one leaf dir, not a 16-bucket scan
        assert sl.columns == ["id", "v", "grp"]  # recorded schema

    # a bucket id with no manifest entry contributes nothing
    assert st.read_buckets(spark, "t", [9999]).count() == 0
    # plain versions have no bucket metadata
    st.write(_base(spark, n=10), "plain")
    with pytest.raises(ValueError, match="not a manifest"):
        st.read_buckets(spark, "plain", [0])


def test_sort_cols_survive_every_writer(spark, tmp_path):
    """sort_cols declared at bootstrap: every data file any writer
    lands (bootstrap, upsert, replace, compaction) is sorted on the
    sort columns within its bucket, and the payload keeps declaring
    them — row-group min/max pruning survives the table's whole
    incremental life."""
    import pyarrow.parquet as _pq

    st = TableStore(str(tmp_path))

    def all_sorted() -> bool:
        info = st.current_info("t")
        ok = True
        for vd in set(info["manifest"].values()):
            for f in _glob_files(vd):
                col = _pq.read_table(f, columns=["v"]).column("v").to_pylist()
                ok = ok and col == sorted(col)
        return ok

    def _glob_files(vd):
        return glob.glob(vd + "/**/*.parquet", recursive=True)

    df = _base(spark, n=400).withColumn(
        "v", (F.col("id") * 7919 % 1000).cast("long")  # scrambled
    )
    st.write_manifest(df, "t", "id", n_buckets=8, sort_cols=["v"])
    assert st.current_info("t")["sort_cols"] == ["v"] and all_sorted()

    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(5, 999, 0), (9, 1, 1)], "id long, v long, grp int"),
    )
    assert st.current_info("t")["sort_cols"] == ["v"] and all_sorted()

    st.replace_keys_manifest(
        spark, "t",
        spark.createDataFrame([(7,)], "id long"),
        spark.createDataFrame([(7, 500, 0)], "id long, v long, grp int"),
    )
    assert st.current_info("t")["sort_cols"] == ["v"] and all_sorted()

    st.compact_buckets(spark, "t", max_carriers=1)
    assert st.current_info("t")["sort_cols"] == ["v"] and all_sorted()


def test_vacuum_bounds_the_commit_log_despite_permanent_carriers(
    spark, tmp_path
):
    """The streaming profile: bootstrap + many upserts + per-batch
    vacuum. The bootstrap dir survives forever as a carrier (every
    head references its cold buckets), but the LOG must not anchor on
    its seq — entries for reclaimed upsert versions prune away, so
    head() resolution stays O(retention), not O(batches). Demoted
    carriers then read as 'gone' loudly (a plain parquet read of a
    carrier would silently return a partial table)."""
    import os as _os

    st = TableStore(str(tmp_path))
    st.write_manifest(_base(spark, n=400), "t", "id", n_buckets=8)
    versions = []
    for i in range(6):
        versions.append(
            st.upsert_manifest(
                spark, "t",
                spark.createDataFrame([(i, 111, 0)], "id long, v long, grp int"),
            )
        )
        st.vacuum("t", keep=2, orphan_grace_s=0)
    log_len = len(list(st._store("t").log.history()))
    assert log_len <= 4  # keep=2 window + slack, NOT 7 (bootstrap-anchored)
    # table still reads correctly through the carried bootstrap
    assert st.read(spark, "t").count() == 400
    # a demoted (carrier or reclaimed) old upsert version refuses to
    # serve a partial read
    old = versions[0]
    if st._backend().data_exists(old):
        with pytest.raises(FileNotFoundError):
            st.read_version(spark, "t", _os.path.basename(old))


def test_stream_mart_manifest_compacts_over_plain_table(spark, tmp_path):
    """compact_every must bound the MART's carrier spread even when
    the TABLE itself is plain (manifest_buckets=None): every batch's
    keyed REPLACE adds one mart carrier, and the old gate skipped the
    whole compaction block unless the table was manifest-shaped."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    mart = {
        "table": "by_type",
        "group_col": "event_type",
        "agg_exprs": [F.count(F.lit(1)).alias("n")],
        "manifest_buckets": 8,
    }

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            st, "ev", "event_id", ckpt,
            mart=mart, compact_every=2, compact_max_carriers=2,
        )

    mk([(i, t0, i, f"t{i % 3}", 1.0, "{}") for i in range(30)]).coalesce(
        1
    ).write.parquet(in_dir)
    drain()
    for b in range(3):
        mk([
            (1000 + b, t0, b, f"t{b % 3}", 1.0, "{}"),
        ]).coalesce(1).write.parquet(in_dir, mode="append")
        drain()
    spread = len(set(st.current_info("by_type")["manifest"].values()))
    assert spread <= 2
    got = {
        r["event_type"]: r["n"] for r in st.read(spark, "by_type").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in st.read(spark, "ev")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_manifest_lifecycle_model(spark, tmp_path):
    """Model-based sweep: random interleavings of upsert (with
    round-12 TOMBSTONES) / keyed replace / compaction / vacuum /
    incremental SPLIT and MERGE rebucketing against a plain dict
    model of key→value. After EVERY op the store must read back
    exactly the model — the whole carrier/manifest/remnant machinery
    is invisible to values by contract, no matter the op order. (The
    example tests pin each op in isolation; this pins their
    COMPOSITIONS, where round-10's defects actually lived — and
    where a crossing split/merge migration could shadow or duplicate
    rows.)"""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    KEY = st.integers(min_value=0, max_value=30)
    OP = st.one_of(
        st.tuples(
            st.just("upsert"),
            st.lists(KEY, min_size=1, max_size=4),  # merged keys
            st.lists(KEY, max_size=2),              # tombstoned keys
        ),
        st.tuples(
            st.just("replace"),
            st.lists(KEY, min_size=1, max_size=4),  # affected
            st.lists(KEY, max_size=3),              # re-inserted subset
        ),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("vacuum"), st.just(None)),
        st.tuples(st.just("split"), st.integers(1, 2)),   # factor
        st.tuples(st.just("merge"), st.integers(1, 2)),   # factor
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ops=st.lists(OP, min_size=1, max_size=5), file_cow=st.booleans())
    def run(ops, file_cow):
        import shutil
        import uuid

        root = str(tmp_path / uuid.uuid4().hex[:12])
        st_ = TableStore(root)
        model = {k: k * 10 for k in range(8)}
        # file_cow=True exercises the round-11 file-granular entries
        # end to end (sort_cols leading with the key + small files);
        # False keeps the original whole-bucket dir entries covered
        kw = (
            {"sort_cols": ["id"], "max_file_rows": 3,
             "auto_compact_files": 4}
            if file_cow
            else {}
        )
        st_.write_manifest(
            spark.createDataFrame(
                [(k, v) for k, v in model.items()], "id long, v long"
            ),
            "t", "id", n_buckets=4, **kw,
        )
        n_now = 4  # tracked modulus for split/merge legality
        step = 0
        for op in ops:
            step += 1
            if op[0] == "upsert":
                rows = [(k, k * 100 + step) for k in sorted(set(op[1]))]
                dels = sorted(set(op[2]))
                st_.upsert_manifest(
                    spark, "t",
                    spark.createDataFrame(rows, "id long, v long"),
                    delete_keys=spark.createDataFrame(
                        [(k,) for k in dels], "id long"
                    )
                    if dels
                    else None,
                )
                model.update(dict(rows))
                for k in dels:  # tombstone is the batch's final word
                    model.pop(k, None)
            elif op[0] == "replace":
                affected = sorted(set(op[1]))
                frag_keys = sorted(set(op[2]) & set(affected))
                frag = [(k, k * 1000 + step) for k in frag_keys]
                st_.replace_keys_manifest(
                    spark, "t",
                    spark.createDataFrame([(k,) for k in affected], "id long"),
                    spark.createDataFrame(frag, "id long, v long"),
                )
                for k in affected:
                    model.pop(k, None)
                model.update(dict(frag))
            elif op[0] == "compact":
                st_.compact_buckets(
                    spark, "t", max_carriers=2,
                    max_files_per_bucket=4 if file_cow else None,
                )
            elif op[0] == "vacuum":
                st_.vacuum("t", keep=1, orphan_grace_s=0)
            elif op[0] == "split":
                if n_now * op[1] <= 16:
                    st_.split_buckets(
                        spark, "t", factor=op[1], max_splits=1
                    )
                    n_now *= op[1]
            elif op[0] == "merge":
                if op[1] > 1 and n_now % op[1] == 0 and n_now > 1:
                    st_.merge_buckets(
                        spark, "t", factor=op[1], max_merges=1
                    )
                    n_now //= op[1]
            got = {
                r["id"]: r["v"] for r in st_.read(spark, "t").collect()
            }
            assert got == model, f"step {step} ({op[0]}): {got} != {model}"
        shutil.rmtree(root, ignore_errors=True)

    run()


def _cow_table(spark, tmp_path, n=2000, n_buckets=4, max_file_rows=100):
    """A file-COW manifest table: sort_cols leads with the key and
    max_file_rows splits each bucket into ~n/(n_buckets·mfr) files."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=n)
    v1 = st.write_manifest(
        df, "t", "id", n_buckets=n_buckets,
        sort_cols=["id"], max_file_rows=max_file_rows,
    )
    return st, df, v1


def test_file_cow_upsert_rewrites_only_matching_files(spark, tmp_path):
    """Round-11 headline: inside a DIRTY bucket only the files whose
    key range covers a batch key rewrite; the bucket's other files
    carry by reference. Bytes written per upsert ≈ O(files containing
    matched keys), not O(bucket); values equal the full MERGE oracle;
    entries are file-form with ranges."""
    from rialto_airflow_spark.operators.merge import merge_on_key

    st, df, v1 = _cow_table(spark, tmp_path)
    info1 = st.current_info("t")
    e0 = info1["manifest"]
    assert all(not isinstance(e, str) for e in e0.values())
    files_per_bucket = {k: len(e["files"]) for k, e in e0.items()}
    assert all(n >= 4 for n in files_per_bucket.values()), files_per_bucket

    batch = spark.createDataFrame(
        [(5, 999, 0), (9999, 1, 1)], "id long, v long, grp int"
    )
    v2 = st.upsert_manifest(spark, "t", batch)

    want = merge_on_key(df, batch, "id")
    got = st.read(spark, "t")
    assert got.exceptAll(want).unionAll(want.exceptAll(got)).count() == 0

    # the new version holds ~2 small files (one matched file rewritten
    # + one insert file), a sliver of even ONE bucket's bytes
    bucket_bytes = _bytes(v1) / 4
    assert _bytes(v2) < bucket_bytes / 2, (_bytes(v2), bucket_bytes)

    # dirty buckets' entries mix carried old-version files with new
    # ones; clean buckets' entries untouched
    info2 = st.current_info("t")
    changed = {
        k for k in info2["manifest"]
        if info2["manifest"][k] != e0.get(k)
    }
    assert 1 <= len(changed) <= 2
    for k in changed:
        dirs = {
            os.path.dirname(os.path.dirname(p))
            for p, _mn, _mx in info2["manifest"][k]["files"]
        }
        if k in e0:  # the update bucket: carried + new files
            assert v1 in dirs and v2 in dirs, dirs

    # old files referenced by the new manifest are literally the same
    # paths (carry-by-reference down to the file)
    carried = {
        p
        for e in info2["manifest"].values()
        for p, _mn, _mx in e["files"]
        if p.startswith(v1)
    }
    assert carried and carried <= _files(v1)


def test_file_cow_point_reads_prune_to_files(spark, tmp_path):
    """read_keys on a file-COW table touches only the files whose
    range can hold the requested values — file-level pruning on top
    of bucket-level path selection."""
    st, df, v1 = _cow_table(spark, tmp_path)
    got = st.read_keys(spark, "t", [7])
    assert {r["v"] for r in got.collect()} == {14}
    files = got.inputFiles()
    assert len(files) == 1, files  # ONE file, not one bucket
    # and the whole-bucket contrast reads more
    info = st.current_info("t")
    b = st.batch_buckets(
        "t", spark.createDataFrame([(7,)], "id long")
    )
    assert len(info["manifest"][str(b[0])]["files"]) > 1


def test_point_probe_fast_path_matches_join_path(spark, tmp_path):
    """The literal-array point-probe fast path (round-12) returns the
    EXACT hit set of the general _rewrite_files join path for the
    same probe, and declines (None) for oversized probes so the
    caller falls back."""
    st, df, v1 = _cow_table(spark, tmp_path)
    info = st.current_info("t")
    st_schema = st._schema_of(info)
    ktype = st_schema["id"].dataType
    n = info["n_buckets"]
    entries = [
        (int(b), e["files"]) for b, e in info["manifest"].items()
    ]
    for probe in ([7], [5, 900, 1999], [123456789], list(range(50))):
        fast = st._probe_files_point(spark, probe, "id", ktype, n, entries)
        probe_df = spark.createDataFrame(
            [(v,) for v in probe], schema="`id` bigint"
        )
        slow = st._rewrite_files(spark, probe_df, "id", ktype, n, entries)
        assert fast == slow, probe
    # oversized probe → decline (caller falls back to the join path)
    assert (
        st._probe_files_point(
            spark, list(range(1001)), "id", ktype, n, entries
        )
        is None
    )
    # the public API end-to-end on the fast path: same rows, 1 file
    got = st.read_keys(spark, "t", [7])
    assert {r["v"] for r in got.collect()} == {14}
    assert len(got.inputFiles()) == 1


def test_file_cow_replace_and_emptied_buckets(spark, tmp_path):
    """Keyed REPLACE under file COW: affected keys' files rewrite,
    fragment rows land as new files, an entry whose rows all vanish
    drops out of the manifest."""
    st, df, v1 = _cow_table(spark, tmp_path, n=40, max_file_rows=5)
    # wipe every key of one bucket (no fragment): entry must vanish
    b0 = st.batch_buckets("t", df.select("id"))
    info = st.current_info("t")
    victims = [
        r["id"]
        for r in st.read_buckets(spark, "t", [b0[0]]).select("id").collect()
    ]
    st.replace_keys_manifest(
        spark, "t",
        spark.createDataFrame([(k,) for k in victims], "id long"),
        spark.createDataFrame([], st.read(spark, "t").schema).limit(0),
    )
    info2 = st.current_info("t")
    assert str(b0[0]) not in info2["manifest"]
    assert st.read(spark, "t").count() == 40 - len(victims)
    # untouched buckets carried bit-for-bit
    for k, e in info2["manifest"].items():
        assert e == info["manifest"][k]


def test_file_cow_vacuum_reclaims_unreferenced_files_only(
    spark, tmp_path
):
    """File-granular vacuum: after upserts + vacuum(keep=1), an old
    version dir survives as a carrier holding ONLY the files the head
    manifest still references — rewritten files are physically gone,
    carried ones remain, and the head reads back intact."""
    st, df, v1 = _cow_table(spark, tmp_path)
    before = _files(v1)
    batch = spark.createDataFrame([(5, 999, 0)], "id long, v long, grp int")
    st.upsert_manifest(spark, "t", batch)
    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(5, 1000, 0)], "id long, v long, grp int"),
    )
    st.vacuum("t", keep=1, orphan_grace_s=0)
    head = st.current_info("t")
    referenced = {
        p for e in head["manifest"].values() for p, _mn, _mx in e["files"]
    }
    remaining_v1 = _files(v1)
    assert remaining_v1 == {p for p in referenced if p.startswith(v1)}
    assert remaining_v1 < before  # something WAS reclaimed
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    assert got[5] == 1000 and len(got) == 2000


def test_file_cow_compact_folds_file_tail(spark, tmp_path):
    """max_files_per_bucket: a bucket that accreted files over many
    upserts folds back to max_file_rows-sized files; values and the
    file-form entries survive."""
    st, df, v1 = _cow_table(spark, tmp_path, n=200, max_file_rows=50)
    for i in range(6):
        st.upsert_manifest(
            spark, "t",
            spark.createDataFrame(
                [(10_000 + i, i, 0)], "id long, v long, grp int"
            ),
        )
    info = st.current_info("t")
    worst = max(len(e["files"]) for e in info["manifest"].values())
    assert worst >= 3
    out = st.compact_buckets(
        spark, "t", max_carriers=64, max_files_per_bucket=2
    )
    assert out is not None
    info2 = st.current_info("t")
    assert all(
        len(e["files"]) <= 2 or k not in _frag_keys(info)
        for k, e in info2["manifest"].items()
        for _ in [0]
    )
    assert max(
        len(e["files"])
        for k, e in info2["manifest"].items()
        if k in _frag_keys(info)
    ) <= 2 + 200 // 50  # folded to ~max_file_rows-sized files
    assert st.read(spark, "t").count() == 206
    # time travel across the compaction boundary still resolves
    got5 = st.read_keys(spark, "t", [10_000])
    assert got5.collect()[0]["v"] == 0


def _frag_keys(info):
    return {
        k
        for k, e in info["manifest"].items()
        if not isinstance(e, str) and len(e["files"]) > 2
    }


def test_migrate_plain_head_to_manifest(spark, tmp_path):
    """The one-call plain→manifest upgrade: history and snapshot pins
    survive, time travel across the boundary works, the migrated head
    takes O(changes) upserts, and a stream configured with
    manifest_buckets against a pre-existing plain table upgrades it on
    first contact instead of raising per batch."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    st = TableStore(str(tmp_path / "store"))
    df1 = _base(spark, n=300)
    st.write(df1, "t")
    df2 = _base(spark, n=300).withColumn("v", F.col("v") + 1)
    v2 = st.write(df2, "t")
    st.publish_snapshot({"t": None})  # pin the plain head
    pre = [os.path.basename(v["path"]) for v in st.versions("t")]

    out = st.migrate_to_manifest(
        spark, "t", "id", n_buckets=8, sort_cols=["id"], max_file_rows=64
    )
    info = st.current_info("t")
    assert "manifest" in info and info.get("migrated_from") == v2
    # idempotent ensure-manifest
    assert st.migrate_to_manifest(spark, "t", "id") == out

    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    assert got == {r["id"]: r["v"] for r in df2.collect()}
    # time travel across the boundary: both plain versions resolve
    for ver, src in zip(pre, (df1, df2)):
        old = st.read_version(spark, "t", ver)
        assert old.count() == 300
    # the pinned snapshot still reads the PLAIN version
    assert st.read_snapshot(spark, "t").count() == 300
    # O(changes) upsert works immediately, file-granular (sort_cols)
    v3 = st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(5, -1, 0)], "id long, v long, grp int"),
    )
    assert _bytes(v3) < _bytes(out) / 4
    assert st.read_keys(spark, "t", [5]).collect()[0]["v"] == -1

    # streaming sink against a plain head: upgrades, then upserts
    st2 = TableStore(str(tmp_path / "s2"))
    st2.write(
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), 10, "view", 1.0, "{}")],
            SE.EVENTS_DDL,
        ),
        "ev",
    )
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(2, datetime.datetime(2024, 1, 1, 1), 11, "click", 2.0, "{}")],
        SE.EVENTS_DDL,
    ).coalesce(1).write.parquet(in_dir)
    SE.stream_upsert(
        SE.read_event_stream(spark, in_dir),
        st2, "ev", "event_id", str(tmp_path / "ck"),
        manifest_buckets=4,
    )
    info2 = st2.current_info("ev")
    assert "manifest" in info2
    assert st2.read(spark, "ev").count() == 2


def test_split_buckets_incremental_rebucketing(spark, tmp_path):
    """Round-11 rebucketing: a table grown past its bucket sizing
    moves 8 → 32 buckets across a few bounded calls — never a
    full-table rewrite in one go. During the migration, reads /
    point reads / upserts against still-coarse remnants stay correct
    (and an upsert opportunistically dissolves the remnant it
    touches); after it, every entry is fine-moduled, point reads are
    back to per-bucket bounds, and time travel to a pre-split version
    still resolves."""
    from rialto_airflow_spark.operators.merge import merge_on_key

    st = TableStore(str(tmp_path))
    df = _base(spark, n=400)
    v1 = st.write_manifest(df, "t", "id", n_buckets=8)
    pre_split_version = os.path.basename(v1)

    def whole() -> dict:
        return {r["id"]: r["v"] for r in st.read(spark, "t").collect()}

    model = {r["id"]: r["v"] for r in df.collect()}

    # raise the modulus and split only 3 entries
    out = st.split_buckets(spark, "t", factor=4, max_splits=3)
    assert out is not None
    info = st.current_info("t")
    assert info["n_buckets"] == 32
    coarse = [k for k in info["manifest"] if "@" in k]
    fine = [k for k in info["manifest"] if "@" not in k]
    assert len(coarse) == 5 and all(k.endswith("@8") for k in coarse)
    assert fine and all(0 <= int(k) < 32 for k in fine)
    assert whole() == model

    # point read THROUGH a coarse remnant stays exact
    some_coarse_b = int(coarse[0].split("@")[0])
    probe_id = next(
        k for k in model if k % 1009 is not None
    )  # any key; exactness checked by value
    got = st.read_keys(spark, "t", [probe_id])
    assert {r["v"] for r in got.collect()} == {model[probe_id]}

    # read_buckets stays exact across the boundary: every returned
    # row hashes into a requested fine bucket (coarse neighbor rows
    # filtered out) and the probe key is present
    bks = st.batch_buckets(
        "t", spark.createDataFrame([(probe_id,)], "id long")
    )
    sl = st.read_buckets(spark, "t", bks)
    stray = sl.where(
        ~F.pmod(F.xxhash64(F.col("id")), F.lit(32)).cast("int").isin(bks)
    ).count()
    assert stray == 0
    assert probe_id in {r["id"] for r in sl.collect()}

    # an upsert touching a coarse remnant dissolves it
    victim = next(
        k for k in model
        if any(
            ck.endswith("@8")
            for ck in st._covering_keys(
                st.current_info("t")["manifest"],
                st._moduli(st.current_info("t")["manifest"]),
                bucket_of(spark, st, k),
                32,
            )
        )
    )
    batch = spark.createDataFrame(
        [(victim, -5, 0)], "id long, v long, grp int"
    )
    st.upsert_manifest(spark, "t", batch)
    model[victim] = -5
    assert whole() == model
    info = st.current_info("t")
    assert len([k for k in info["manifest"] if "@" in k]) == 4  # one gone

    # finish the migration with factor=1 calls
    steps = 0
    while st.split_buckets(spark, "t", max_splits=2) is not None:
        steps += 1
        assert whole() == model
    assert steps >= 2  # it really was incremental
    info = st.current_info("t")
    assert all("@" not in k for k in info["manifest"])
    assert info["n_buckets"] == 32

    # merge oracle still holds end-to-end after the whole dance
    want = merge_on_key(df, batch, "id")
    got_df = st.read(spark, "t")
    assert got_df.exceptAll(want).unionAll(want.exceptAll(got_df)).count() == 0

    # time travel to the pre-split version still resolves (8 buckets)
    old = st.read_version(spark, "t", pre_split_version)
    assert {r["id"]: r["v"] for r in old.collect()} == {
        r["id"]: r["v"] for r in df.collect()
    }

    # vacuum across the boundary: head + remnant-free reads intact
    st.vacuum("t", keep=1, orphan_grace_s=0)
    assert whole() == model


def bucket_of(spark, st, key_val) -> int:
    return st.batch_buckets(
        "t", spark.createDataFrame([(key_val,)], "id long")
    )[0]


def test_file_cow_replace_null_group(spark, tmp_path):
    """Self-review fix: REPLACE promises null-GROUP deletion
    (eqNullSafe), but file ranges ignore nulls — a null affected key
    must force the null bucket's files into the rewrite set or old
    null rows silently survive next to the fragment's replacements."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=60).unionByName(
        spark.createDataFrame(
            [(None, -1, 0), (None, -2, 1)], "id long, v long, grp int"
        )
    )
    st.write_manifest(
        df, "t", "id", n_buckets=8, sort_cols=["id"], max_file_rows=10
    )
    st.replace_keys_manifest(
        spark, "t",
        spark.createDataFrame([(None,)], "id long"),
        spark.createDataFrame([(None, -9, 9)], "id long, v long, grp int"),
    )
    nulls = st.read(spark, "t").where(F.col("id").isNull()).collect()
    assert [(r["v"], r["grp"]) for r in nulls] == [(-9, 9)]
    assert st.read(spark, "t").count() == 61


def test_file_cow_timestamp_key_immune_to_session_timezone(
    spark, tmp_path
):
    """Self-review fix: file ranges for temporal bucket keys are
    recorded as epoch numbers, not session-timezone strings — an
    upsert under a DIFFERENT spark.sql.session.timeZone must still
    hit the right files (a missed overlap would duplicate the key)."""
    import datetime

    st = TableStore(str(tmp_path))
    rows = [
        (datetime.datetime(2024, 6, 1, h), h) for h in range(24)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        st.write_manifest(
            df, "t", "ts", n_buckets=4, sort_cols=["ts"], max_file_rows=3
        )
        spark.conf.set(
            "spark.sql.session.timeZone", "America/Los_Angeles"
        )
        st.upsert_manifest(
            spark, "t",
            spark.createDataFrame(
                [(datetime.datetime(2024, 6, 1, 13), 999)],
                "ts timestamp, v int",
            ),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    got = st.read(spark, "t")
    assert got.count() == 24  # updated, NOT duplicated
    assert got.where(F.col("v") == 999).count() == 1


def test_file_cow_store_root_with_space(spark, tmp_path):
    """Self-review fix: input_file_name() returns percent-encoded
    URIs; recorded manifest paths must be store-rooted plain strings
    or existence checks and vacuum's needed-map silently break on a
    root containing a space."""
    root = str(tmp_path / "my tables")
    st = TableStore(root)
    df = _base(spark, n=100)
    st.write_manifest(
        df, "t", "id", n_buckets=4, sort_cols=["id"], max_file_rows=20
    )
    info = st.current_info("t")
    for e in info["manifest"].values():
        for p, _mn, _mx in e["files"]:
            assert "%20" not in p and os.path.isfile(p), p
    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(5, -1, 0)], "id long, v long, grp int"),
    )
    st.vacuum("t", keep=1, orphan_grace_s=0)
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    assert got[5] == -1 and len(got) == 100
    # time travel / restore checks resolve the decoded paths too
    assert st.read_keys(spark, "t", [7]).collect()[0]["v"] == 14


def test_read_buckets_of_n_buckets_across_split(spark, tmp_path):
    """Self-review fix: head-modulus bucket ids against an OLDER
    (coarser) version must refine onto that version's modulus — the
    streaming change-detection consumer reads built_from with ids
    computed at head after a split_buckets call in between."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=200)
    v1 = st.write_manifest(df, "t", "id", n_buckets=8)
    st.split_buckets(spark, "t", factor=4)  # head now 32, all fine
    head_n = st.current_info("t")["n_buckets"]
    assert head_n == 32

    probe = spark.createDataFrame([(7,), (123,)], "id long")
    bks = st.batch_buckets("t", probe)  # ids under 32
    old_slice = st.read_buckets(
        spark, "t", bks, version=os.path.basename(v1), of_n_buckets=head_n
    )
    got = {r["id"] for r in old_slice.collect()}
    assert {7, 123} <= got
    # exactness at the CALLER's modulus: every row hashes to a
    # requested fine bucket
    stray = old_slice.where(
        ~F.pmod(F.xxhash64(F.col("id")), F.lit(32)).cast("int").isin(bks)
    ).count()
    assert stray == 0
    # WITHOUT the modulus hint the coarse manifest can't resolve fine
    # ids — documented miss, which is why the consumer must pass it
    assert st.read_buckets(
        spark, "t", bks, version=os.path.basename(v1)
    ).count() >= 0


def test_stream_upsert_file_cow_layout_and_compaction(spark, tmp_path):
    """The streaming sink's file-COW opt-in: manifest_sort_cols +
    manifest_max_file_rows land file-form entries from the bootstrap
    batch on, per-trigger versions carry untouched files by
    reference, and the compaction cadence folds the per-bucket file
    tail via compact_max_files_per_bucket — all while converging to
    the same table as a plain merge."""
    import datetime

    from rialto_airflow_spark.streaming import events as SE

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            st, "ev", "event_id", ckpt,
            manifest_buckets=4,
            manifest_sort_cols=["event_id"],
            manifest_max_file_rows=8,
            compact_every=3,
            compact_max_carriers=64,
            compact_max_files_per_bucket=2,
        )

    mk([
        (i, t0, 10 + i, "view", float(i), "{}") for i in range(40)
    ]).coalesce(1).write.parquet(in_dir)
    drain()
    info = st.current_info("ev")
    assert all(not isinstance(e, str) for e in info["manifest"].values())
    assert info.get("sort_cols") == ["event_id"]

    # two more single-row triggers: file-form carry + the 3rd batch
    # trips the compaction cadence and folds any file tail
    for j, eid in enumerate((1, 2)):
        mk([
            (eid, t0 + datetime.timedelta(minutes=j + 1), 99, "click",
             -float(eid), "{}"),
        ]).coalesce(1).write.parquet(in_dir, mode="append")
        drain()
    info = st.current_info("ev")
    assert all(
        len(e["files"]) <= 2 for e in info["manifest"].values()
    ), {k: len(e["files"]) for k, e in info["manifest"].items()}
    got = {r["event_id"]: r["value"] for r in st.read(spark, "ev").collect()}
    assert len(got) == 40 and got[1] == -1.0 and got[2] == -2.0


def test_read_buckets_prune_keys_file_granular(spark, tmp_path):
    """prune_keys makes the slice read file-granular: on a file-COW
    table, reading one changed key's buckets touches ONE file, not
    the whole bucket — and the result still contains every requested
    key's rows (the streaming change-detector contract)."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=2000)
    st.write_manifest(
        df, "t", "id", n_buckets=4, sort_cols=["id"], max_file_rows=50
    )
    probe = spark.createDataFrame([(7,)], "id long")
    bks = st.batch_buckets("t", probe)
    pruned = st.read_buckets(spark, "t", bks, prune_keys=probe)
    assert {r["v"] for r in pruned.where(F.col("id") == 7).collect()} == {14}
    assert len(pruned.inputFiles()) == 1
    whole = st.read_buckets(spark, "t", bks)
    assert len(whole.inputFiles()) > 3  # the bucket really is multi-file
    # an inserted-later key absent from the version: empty, no error
    ghost = spark.createDataFrame([(999_999,)], "id long")
    gb = st.batch_buckets("t", ghost)
    assert st.read_buckets(
        spark, "t", gb, prune_keys=ghost
    ).where(F.col("id") == 999_999).count() == 0


def test_stream_mart_correct_across_split_between_triggers(
    spark, tmp_path, monkeypatch
):
    """The review's sharpest scenario: an operator runs split_buckets
    BETWEEN two triggers, so the next trigger's change detection holds
    head-modulus bucket ids against a coarser built_from version. The
    modulus translation in read_buckets must keep the mart exact —
    including re-pointing a row whose GROUP changed in that batch —
    with snapshot_diff still poisoned."""
    import datetime

    from rialto_airflow_spark.operators import merge as M
    from rialto_airflow_spark.streaming import events as SE

    monkeypatch.setattr(
        M, "snapshot_diff",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("diff ran")),
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))
    mart = {
        "table": "by_type",
        "group_col": "event_type",
        "agg_exprs": [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        ],
    }

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            st, "ev", "event_id", ckpt,
            mart=mart, manifest_buckets=4,
        )

    mk([
        (i, t0, 10 + i, "view" if i % 2 else "click", float(i), "{}")
        for i in range(30)
    ]).coalesce(1).write.parquet(in_dir)
    drain()

    # operator-initiated rebucketing between triggers: 4 -> 16, split
    # only half the entries so coarse remnants remain in play
    st.split_buckets(spark, "ev", factor=4, max_splits=2)
    assert st.current_info("ev")["n_buckets"] == 16
    assert any("@" in k for k in st.current_info("ev")["manifest"])

    # next trigger: event 3 migrates view->purchase (old group must
    # re-point through the COARSER built_from version), event 99 inserts
    mk([
        (3, t0 + datetime.timedelta(minutes=5), 13, "purchase", 9.0, "{}"),
        (99, t0 + datetime.timedelta(minutes=1), 99, "click", 4.0, "{}"),
    ]).coalesce(1).write.parquet(in_dir, mode="append")
    drain()

    final = st.read(spark, "ev")
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in final.groupBy("event_type").agg(*mart["agg_exprs"]).collect()
    }
    got = {
        r["event_type"]: (r["n"], r["total"])
        for r in st.read(spark, "by_type").collect()
    }
    assert got == want
    assert got["purchase"] == (1, 9.0)


def test_stream_mart_cluster_projection_refolds_without_table_scan(
    spark, tmp_path, monkeypatch
):
    """cluster_buckets: the fragment re-fold reads the fan-key
    clustered projection's pruned slice, never the table — proven by
    poisoning BOTH snapshot_diff AND the full-table read after
    bootstrap. Three drains (insert, cross-group migration, new
    group) converge to the full recompute; the projection table
    tracks the table's rows for every touched group."""
    import datetime

    from rialto_airflow_spark.operators import merge as M
    from rialto_airflow_spark.storage import TableStore
    from rialto_airflow_spark.streaming import events as SE

    monkeypatch.setattr(
        M, "snapshot_diff",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("diff ran")),
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    st = TableStore(str(tmp_path / "store"))
    mart = {
        "table": "by_type",
        "group_col": "event_type",
        "agg_exprs": [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        ],
        "manifest_buckets": 4,
        "cluster_buckets": 4,
    }

    def mk(rows):
        return spark.createDataFrame(rows, SE.EVENTS_DDL)

    def drain():
        SE.stream_upsert(
            SE.read_event_stream(spark, in_dir),
            st, "ev", "event_id", ckpt,
            mart=mart, manifest_buckets=8,
        )

    mk([
        (i, t0, 10 + i, "view" if i % 2 else "click", float(i), "{}")
        for i in range(20)
    ]).coalesce(1).write.parquet(in_dir)
    drain()
    assert "manifest" in (st.current_info("by_type__cluster") or {})

    # after bootstrap, no JOB may consume the full table: poison the
    # handle store.read builds for it — any action over it raises at
    # execution time (the lazy handle itself is built per trigger,
    # which is free; read_buckets does not go through TableStore.read)
    real_read = TableStore.read

    def poisoned_read(self, spark_, name):
        df = real_read(self, spark_, name)
        if name == "ev":
            return df.where(
                F.raise_error(F.lit("full-table scan on the ev read"))
                .cast("string").isNull()
            )
        return df

    monkeypatch.setattr(TableStore, "read", poisoned_read)

    mk([
        (3, t0 + datetime.timedelta(minutes=5), 13, "purchase", 9.0, "{}"),
        (99, t0 + datetime.timedelta(minutes=1), 99, "signup", 4.0, "{}"),
    ]).coalesce(1).write.parquet(in_dir, mode="append")
    drain()
    monkeypatch.setattr(TableStore, "read", real_read)
    final = st.read(spark, "ev")
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in final.groupBy("event_type").agg(*mart["agg_exprs"]).collect()
    }
    got = {
        r["event_type"]: (r["n"], r["total"])
        for r in st.read(spark, "by_type").collect()
    }
    assert got == want
    assert got["purchase"] == (1, 9.0) and got["signup"] == (1, 4.0)
    # the projection mirrors the table for touched groups (the
    # migrated-away 'view' group lost event 3)
    cl = st.read(spark, "by_type__cluster")
    assert cl.where(
        (F.col("event_type") == "view") & (F.col("event_id") == 3)
    ).count() == 0
    assert cl.where(F.col("event_type") == "purchase").count() == 1
    assert cl.count() == final.count()


def test_merge_buckets_incremental_shrink(spark, tmp_path):
    """Round-12 task #6: split_buckets' inverse — 32 → 8 buckets
    across bounded calls; reads / point reads / upserts stay correct
    MID-migration (finer remnants serve coverage), an upsert
    dissolves the finer remnants it touches, and time travel to a
    pre-merge version still resolves."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=400)
    v1 = st.write_manifest(df, "t", "id", n_buckets=32)
    pre_merge_version = os.path.basename(v1)

    def whole() -> dict:
        return {r["id"]: r["v"] for r in st.read(spark, "t").collect()}

    model = {r["id"]: r["v"] for r in df.collect()}

    # drop the modulus 32 -> 8, folding only 3 target buckets
    out = st.merge_buckets(spark, "t", factor=4, max_merges=3)
    assert out is not None
    info = st.current_info("t")
    assert info["n_buckets"] == 8
    finer = [k for k in info["manifest"] if "@" in k]
    fine = [k for k in info["manifest"] if "@" not in k]
    assert finer and all(k.endswith("@32") for k in finer)
    assert fine and all(0 <= int(k) < 8 for k in fine)
    assert whole() == model

    # point read THROUGH finer remnants stays exact
    probe_id = next(iter(model))
    got = st.read_keys(spark, "t", [probe_id])
    assert {r["v"] for r in got.collect()} == {model[probe_id]}

    # read_buckets at the new modulus returns exactly the requested
    # bucket's rows
    bks = st.batch_buckets(
        "t", spark.createDataFrame([(probe_id,)], "id long")
    )
    sl = st.read_buckets(spark, "t", bks)
    stray = sl.where(
        ~F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("int").isin(bks)
    ).count()
    assert stray == 0
    assert probe_id in {r["id"] for r in sl.collect()}

    # an upsert touching a finer remnant dissolves it (and every
    # other entry covering that coarse bucket)
    victim = next(
        k for k in model
        if any(
            ck.endswith("@32")
            for ck in st._covering_keys(
                st.current_info("t")["manifest"],
                st._moduli(st.current_info("t")["manifest"]),
                bucket_of(spark, st, k),
                8,
            )
        )
    )
    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(victim, -5, 0)], "id long, v long, grp int"),
    )
    model[victim] = -5
    assert whole() == model
    info = st.current_info("t")
    vb = bucket_of(spark, st, victim)
    assert st._covering_keys(
        info["manifest"], st._moduli(info["manifest"]), vb, 8
    ) == [str(vb)]

    # finish the migration
    while st.merge_buckets(spark, "t", max_merges=2) is not None:
        pass
    info = st.current_info("t")
    assert all("@" not in k for k in info["manifest"])
    assert info["n_buckets"] == 8
    assert whole() == model

    # time travel across the merge boundary
    old = st.read_version(spark, "t", pre_merge_version)
    assert {r["id"]: r["v"] for r in old.collect()} == {
        r["id"]: r["v"] for r in df.collect()
    }


def test_merge_buckets_file_cow_and_incompatible_moduli(spark, tmp_path):
    """merge_buckets under the file-COW layout keeps per-file ranges;
    a modulus from an unfinished SPLIT that doesn't divide the target
    is rejected loudly instead of corrupting coverage."""
    st = TableStore(str(tmp_path))
    st.write_manifest(
        _base(spark, n=300), "t", "id",
        n_buckets=16, sort_cols=["id"], max_file_rows=20,
    )
    st.merge_buckets(spark, "t", factor=2, max_merges=2)
    info = st.current_info("t")
    assert info["n_buckets"] == 8
    # fine entries are file-form with ranges
    assert all(
        not isinstance(e, str)
        for k, e in info["manifest"].items()
        if "@" not in k
    )
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    assert got == {i: i * 2 for i in range(300)}
    # point read stays file-pruned on the merged entries
    assert {r["v"] for r in st.read_keys(spark, "t", [7]).collect()} == {14}

    # a split to x3 leaves @8 remnants; merging to a modulus they
    # don't refine onto must raise
    st2 = TableStore(str(tmp_path / "b"))
    st2.write_manifest(_base(spark, n=100), "t", "id", n_buckets=8)
    st2.split_buckets(spark, "t", factor=3, max_splits=1)  # n=24, @8 left
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible"):
        st2.merge_buckets(spark, "t", factor=4)  # 24/4=6; 8 % 6 != 0


def test_upsert_manifest_delete_keys(spark, tmp_path):
    """Round-12 task #2 (storage layer): delete_keys removes rows in
    the same O(changes) version as the merge — dirty set includes the
    deletes' buckets/files, an emptied bucket drops from the manifest
    on BOTH entry forms, and replays are no-ops."""
    for layout in ({}, {"sort_cols": ["id"], "max_file_rows": 10}):
        st = TableStore(str(tmp_path / f"l{len(layout)}"))
        st.write_manifest(_base(spark, n=80), "t", "id", n_buckets=8, **layout)
        v1 = st.current_info("t")["path"]
        batch = spark.createDataFrame([(3, -3, 0)], "id long, v long, grp int")
        dels = spark.createDataFrame([(5,), (13,)], "id long")
        st.upsert_manifest(spark, "t", batch, delete_keys=dels)
        got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
        want = {i: i * 2 for i in range(80) if i not in (5, 13)}
        want[3] = -3
        assert got == want
        # carried entries still reference the bootstrap version
        info = st.current_info("t")
        assert any(
            (e == v1 if isinstance(e, str) else e["files"][0][0].startswith(v1))
            for e in info["manifest"].values()
        )
        # replayed delete converges (no row to delete -> same table)
        st.upsert_manifest(spark, "t", batch, delete_keys=dels)
        assert {r["id"]: r["v"] for r in st.read(spark, "t").collect()} == want

    # a delete set that EMPTIES a bucket pops its manifest entry
    st = TableStore(str(tmp_path / "empty"))
    one = spark.createDataFrame([(1, 2, 0), (2, 4, 0)], "id long, v long, grp int")
    st.write_manifest(one, "t", "id", n_buckets=8)
    n_entries = len(st.current_info("t")["manifest"])
    st.upsert_manifest(
        spark, "t",
        one.limit(0),
        delete_keys=spark.createDataFrame([(1,)], "id long"),
    )
    info = st.current_info("t")
    assert len(info["manifest"]) < n_entries or st.read(
        spark, "t"
    ).count() == 1
    assert {r["id"] for r in st.read(spark, "t").collect()} == {2}


def test_upsert_manifest_auto_compacts_file_tail(spark, tmp_path):
    """Round-12 task #8: with auto_compact_files recorded on the
    table, a long run of upserts holds every bucket's file count
    bounded with NO compaction cadence configured — the upsert itself
    folds the tail when pressure crosses the threshold."""
    st = TableStore(str(tmp_path))
    # floor: ~50 rows/bucket at max_file_rows=10 -> >=5 files/bucket;
    # the pressure threshold sits above the floor so folding can land
    st.write_manifest(
        _base(spark, n=100), "t", "id",
        n_buckets=2, sort_cols=["id"], max_file_rows=10,
        auto_compact_files=8,
    )
    for i in range(20):
        st.upsert_manifest(
            spark, "t",
            spark.createDataFrame(
                [(1000 + i, i, 0)], "id long, v long, grp int"
            ),
        )
        info = st.current_info("t")
        assert info.get("auto_compact_files") == 8  # carried
        assert all(
            len(e["files"]) <= 8
            for e in info["manifest"].values()
            if not isinstance(e, str)
        ), {k: len(e["files"]) for k, e in info["manifest"].items()}
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    want = {i: i * 2 for i in range(100)} | {1000 + i: i for i in range(20)}
    assert got == want


def test_read_buckets_prune_keys_null_reads_null_bucket_whole(
    spark, tmp_path
):
    """Round-11 ADVICE (low): a NULL in prune_keys no longer returns
    a silently-incomplete slice — the null bucket's files are read
    whole (ranges never cover a null), and the null rows come back."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=200).unionByName(
        spark.createDataFrame(
            [(None, -1, 0), (None, -2, 1)], "id long, v long, grp int"
        )
    )
    st.write_manifest(
        df, "t", "id", n_buckets=4, sort_cols=["id"], max_file_rows=20
    )
    nb = st.null_bucket(spark, "t")
    probe = spark.createDataFrame([(7,), (None,)], "id long")
    bks = sorted(set(st.batch_buckets("t", probe)) | {nb})
    sl = st.read_buckets(spark, "t", bks, prune_keys=probe)
    vals = {r["v"] for r in sl.where(F.col("id").isNull()).collect()}
    assert vals == {-1, -2}
    assert {r["v"] for r in sl.where(F.col("id") == 7).collect()} == {14}


def test_resharding_writer_interplay_preserves_rows(spark, tmp_path):
    """Round-12 review: compact/split/merge rewrite by bucket-sharing
    CLOSURE, so no writer can land a fine entry that shadows a
    carried entry covering the same bucket. Exercises the full
    interplay on one table: partial merge -> upsert through finer
    remnants -> auto-style compact -> split back -> merge again, with
    whole-table equality and point reads checked at every step; and a
    split onto a modulus incompatible with outstanding finer remnants
    is rejected up front (the guard merge_buckets already had)."""
    st = TableStore(str(tmp_path))
    df = _base(spark, n=320)
    st.write_manifest(
        df, "t", "id", n_buckets=16, sort_cols=["id"], max_file_rows=25
    )
    model = {r["id"]: r["v"] for r in df.collect()}

    def check():
        got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
        assert got == model, (
            len(got), len(model),
            {k: v for k, v in model.items() if k not in got},
        )
        some = sorted(model)[:3]
        pr = {r["id"]: r["v"] for r in st.read_keys(spark, "t", some).collect()}
        assert pr == {k: model[k] for k in some}

    # partial merge: 16 -> 8, fold only one target bucket
    st.merge_buckets(spark, "t", factor=2, max_merges=1)
    assert st.current_info("t")["n_buckets"] == 8
    assert any("@16" in k for k in st.current_info("t")["manifest"])
    check()

    # upsert THROUGH the finer remnants (dissolves every covering
    # entry of its dirty buckets together)
    batch = spark.createDataFrame(
        [(i, -i, 0) for i in (3, 77, 200)], "id long, v long, grp int"
    )
    st.upsert_manifest(spark, "t", batch)
    for i in (3, 77, 200):
        model[i] = -i
    check()

    # compaction (the auto-trigger's shape): closure keeps coexisting
    # coverage moving together
    st.compact_buckets(spark, "t", max_carriers=2)
    check()

    # split back up while finer remnants may still be outstanding
    st.split_buckets(spark, "t", factor=2, max_splits=2)
    assert st.current_info("t")["n_buckets"] == 16
    check()
    while st.split_buckets(spark, "t") is not None:
        pass
    check()

    # guard: a new modulus incompatible with outstanding remnants
    st2 = TableStore(str(tmp_path / "g"))
    st2.write_manifest(_base(spark, n=100), "t", "id", n_buckets=16)
    st2.merge_buckets(spark, "t", factor=2, max_merges=1)  # @16 remnants
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible"):
        st2.split_buckets(spark, "t", factor=3)  # n2=24; 16 ∤ 24


def test_replace_and_batch_buckets_cast_probe_to_recorded_key_type(
    spark, tmp_path
):
    """xxhash64 hashes int and bigint DIFFERENTLY: a caller handing a
    sibling-typed key frame to replace_keys_manifest / batch_buckets
    must still resolve the right buckets (the probe casts to the
    recorded key type), or rows would be 'replaced' in buckets they
    don't live in — silent duplication."""
    st = TableStore(str(tmp_path))
    st.write_manifest(
        _base(spark, n=100), "t", "id",
        n_buckets=8, sort_cols=["id"], max_file_rows=20,
    )
    # int-typed probe against the bigint-keyed table
    keys_int = spark.createDataFrame([(7,), (13,)], "id int")
    frag = spark.createDataFrame(
        [(7, -7, 0), (13, -13, 0)], "id long, v long, grp int"
    )
    st.replace_keys_manifest(spark, "t", keys_int, frag)
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    want = {i: i * 2 for i in range(100)}
    want[7], want[13] = -7, -13
    assert got == want  # no duplicates, both rows actually replaced
    bks_int = st.batch_buckets("t", keys_int)
    bks_long = st.batch_buckets(
        "t", spark.createDataFrame([(7,), (13,)], "id long")
    )
    assert bks_int == bks_long
    # upsert has the same hazard with a worse failure: union coercion
    # widens the MERGED rows to bigint, so an uncast int probe names
    # buckets the written rows don't land in and their files would
    # silently miss the manifest
    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([(21, -21, 0), (200, -200, 0)],
                              "id int, v int, grp int"),
        delete_keys=spark.createDataFrame([(13,)], "id int"),
    )
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    want[21], want[200] = -21, -200
    del want[13]
    assert got == want


def test_replace_fragment_only_sibling_typed_key_no_row_loss(
    spark, tmp_path
):
    """Round-12 review, the probe-cast fix's other half: the DIRTY
    set must name the buckets a sibling-typed fragment's rows LAND
    in (union coercion widens them to the recorded bigint). An
    uncast fragment probe names the int-hash buckets instead, and a
    landing bucket outside the dirty set gets its manifest entry
    REPLACED by just the new files — silent loss of its pre-existing
    rows."""
    st = TableStore(str(tmp_path))
    st.write_manifest(
        _base(spark, n=100), "t", "id",
        n_buckets=8, sort_cols=["id"], max_file_rows=20,
    )
    # a fragment-only key whose int-hash bucket differs from its
    # bigint-hash bucket (xxhash64 is type-sensitive)
    cand = (
        spark.range(100, 2000)
        .select(
            "id",
            F.pmod(
                F.xxhash64(F.col("id").cast("int")), F.lit(8)
            ).alias("bi"),
            F.pmod(F.xxhash64("id"), F.lit(8)).alias("bl"),
        )
        .where("bi <> bl")
        .limit(1)
        .collect()[0]
    )
    nk = cand["id"]
    st.replace_keys_manifest(
        spark, "t",
        spark.createDataFrame([(7,)], "id int"),
        spark.createDataFrame(
            [(7, -7, 0), (nk, -nk, 0)], "id int, v int, grp int"
        ),
    )
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    want = {i: i * 2 for i in range(100)}
    want[7], want[nk] = -7, -nk
    assert got == want


def test_auto_compact_floor_lifecycle(spark, tmp_path):
    """Round-12 review (two findings): (a) a floored bucket that
    accreted NOTHING is never rewritten when some other bucket's
    trigger fires — compact's frag selection is floor-aware, so the
    per-trigger cost is O(offending bucket), not O(all floored
    buckets); (b) floors REVALIDATE on every keyed rewrite — a
    delete-heavy upsert that shrinks a floored bucket to/below the
    threshold drops its floor instead of letting it re-fragment to
    thresh + stale-floor files unnoticed."""
    st = TableStore(str(tmp_path))
    st.write_manifest(
        _base(spark, n=200), "t", "id",
        n_buckets=2, sort_cols=["id"], max_file_rows=10,
        auto_compact_files=5,
    )
    # ~100 rows/bucket at 10 rows/file: both buckets sit legitimately
    # above the threshold, so the first compaction records floors
    st.compact_buckets(
        spark, "t", max_carriers=1 << 30, max_files_per_bucket=5
    )
    info = st.current_info("t")
    floor0 = dict(info.get("auto_compact_floor") or {})
    assert set(floor0) == {"0", "1"}

    def bucket_of(i):
        return st.batch_buckets(
            "t", spark.createDataFrame([(i,)], "id long")
        )[0]

    b_t = bucket_of(10_000)
    b_o = 1 - b_t
    files_before = [
        f[0] for f in info["manifest"][str(b_o)]["files"]
    ]
    new_ids = [
        i for i in range(10_000, 10_400) if bucket_of(i) == b_t
    ][:12]
    assert len(new_ids) == 12
    for i in new_ids:
        st.upsert_manifest(
            spark, "t",
            spark.createDataFrame(
                [(i, -i, 0)], "id long, v long, grp int"
            ),
        )
    info2 = st.current_info("t")
    # (a) the trigger fired for b_t (file tail stayed bounded) ...
    fl_t = (info2.get("auto_compact_floor") or {}).get(str(b_t), 0)
    assert len(info2["manifest"][str(b_t)]["files"]) <= 5 + fl_t
    # ... and the untouched floored bucket's files are IDENTICAL —
    # never read, never rewritten, across every trigger
    assert [
        f[0] for f in info2["manifest"][str(b_o)]["files"]
    ] == files_before
    # (b) shrink b_o under the threshold: its floor must drop
    del_ids = [i for i in range(200) if bucket_of(i) == b_o][:-3]
    st.upsert_manifest(
        spark, "t",
        spark.createDataFrame([], "id long, v long, grp int"),
        delete_keys=spark.createDataFrame(
            [(i,) for i in del_ids], "id long"
        ),
    )
    info3 = st.current_info("t")
    assert str(b_o) not in (info3.get("auto_compact_floor") or {})
    got = {r["id"]: r["v"] for r in st.read(spark, "t").collect()}
    want = {i: i * 2 for i in range(200) if i not in set(del_ids)}
    want |= {i: -i for i in new_ids}
    assert got == want
