"""Round-5 ADVICE regression tests: sidecar reads after vacuum return
None instead of PATH_NOT_FOUND, and the vacuum retention window
(``retain_superseded``) keeps concurrently-planned readers valid while
``purge_columns`` still forces full destruction."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from hermes_spark.tables import ParquetMergeTable


def _mk(spark, path, tombstone_mode="drop"):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    return ParquetMergeTable(
        spark, path, key=["id"], schema=schema,
        compact_every=None, tombstone_mode=tombstone_mode,
    )


DDL = "id int, v string, op string"
SIDE_DDL = "id int, err string"


def test_read_sidecar_of_vacuumed_commit_returns_none(spark, tmp_work):
    """vacuum(keep_sidecars=N) deletes sidecar dirs but the ledger
    still records their schema — the read must degrade to None (the
    replay is older than the retention window), not raise
    PATH_NOT_FOUND at action time."""
    t = _mk(spark, f"{tmp_work}/t")
    for b in range(3):
        t.merge(
            spark.createDataFrame([(b, f"v{b}", "insert")], DDL),
            batch_id=b,
            sidecar=spark.createDataFrame([(b, "queued")], SIDE_DDL),
        )
    versions = {b: t.version_of_batch(b) for b in range(3)}
    t.compact()
    t.vacuum(keep_sidecars=1)
    # oldest two sidecars are gone: None, not an exception
    assert t.read_sidecar(versions[0]) is None
    assert t.read_sidecar_of_batch(0) is None
    assert t.read_sidecar(versions[1]) is None
    # the newest survives and still reads its rows
    kept = t.read_sidecar_of_batch(2)
    assert kept is not None and kept.collect()[0].err == "queued"


def test_vacuum_retain_superseded_keeps_planned_reader_valid(spark, tmp_work):
    """A DataFrame planned over the pre-compact generation still
    collects after maintain-style vacuum(retain_superseded=1); with
    the default retain_superseded=0 the superseded dirs are destroyed
    (the purge_columns contract)."""
    t = _mk(spark, f"{tmp_work}/t")
    for b in range(4):
        t.merge(spark.createDataFrame([(b, f"v{b}", "insert")], DDL), batch_id=b)
    planned = t.read()  # file listing references the 4 delta dirs
    pre_versions = [c["version"] for c in t._read_commits()]
    t.compact()
    t.vacuum(retain_superseded=len(pre_versions))
    # every pre-compact dir was retained → the old plan still resolves
    assert sorted(r.id for r in planned.collect()) == [0, 1, 2, 3]
    for v in pre_versions:
        assert os.path.isdir(t._version_dir(v))
    # a second vacuum with the default destroys them all
    t.vacuum()
    for v in pre_versions:
        assert not os.path.isdir(t._version_dir(v))
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3]


def test_retain_superseded_keeps_only_newest_n(spark, tmp_work):
    t = _mk(spark, f"{tmp_work}/t")
    for b in range(3):
        t.merge(spark.createDataFrame([(b, f"v{b}", "insert")], DDL), batch_id=b)
    t.compact()  # supersedes versions 1..3 (base is version 4)
    t.vacuum(retain_superseded=1)
    assert not os.path.isdir(t._version_dir(1))
    assert not os.path.isdir(t._version_dir(2))
    assert os.path.isdir(t._version_dir(3))


def test_purge_columns_still_destroys_with_retention_feature(spark, tmp_work):
    """purge_columns must not be weakened by the retention window: it
    vacuums with the destroy-everything defaults."""
    t = _mk(spark, f"{tmp_work}/t")
    t.merge(
        spark.createDataFrame([(1, "SECRETVALUE42", "insert")], DDL), batch_id=0
    )
    t.purge_columns(["v"])
    needle = b"SECRETVALUE42"
    for root, _dirs, files in os.walk(t.path):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                assert needle not in f.read(), os.path.join(root, fn)


# -- incremental compaction (deltafold) ----------------------------------


def test_compact_deltas_preserves_state_with_extra_op_channel(spark, tmp_work):
    """compact_deltas folds the delta set only (O(churn)): state is
    identical before/after, deletes survive the fold as markers (the
    base's copy still drops at read), and vacuum removes the folded
    deltas so read amplification is base + 1 fold."""
    t = _mk(spark, f"{tmp_work}/t")
    # base generation: keys 0..4
    t.overwrite(spark.createDataFrame([(i, f"b{i}") for i in range(5)], "id int, v string"))
    # deltas: update 1, insert 5, delete 2, re-update 1
    t.merge(spark.createDataFrame([(1, "u1", "update")], DDL), batch_id=0)
    t.merge(spark.createDataFrame([(5, "n5", "insert")], DDL), batch_id=1)
    t.merge(spark.createDataFrame([(2, None, "delete")], DDL), batch_id=2)
    t.merge(spark.createDataFrame([(1, "u1b", "update")], DDL), batch_id=3)
    before = {(r.id, r.v) for r in t.read().collect()}
    assert before == {(0, "b0"), (1, "u1b"), (3, "b3"), (4, "b4"), (5, "n5")}

    v = t.compact_deltas()
    assert v is not None
    after = {(r.id, r.v) for r in t.read().collect()}
    assert after == before
    # ledger shape: one deltafold supersedes the four deltas
    base, deltas = t._live_commits()
    assert [d["kind"] for d in deltas] == ["deltafold"]
    # the fold is O(churn): it holds 3 keys (1, 2, 5), not the table
    import os

    t.vacuum()
    fold_df = spark.read.parquet(t._version_dir(v))
    assert fold_df.count() == 3
    # old delta dirs are gone, base + fold remain
    left = sorted(
        int(n[1:9]) for n in os.listdir(f"{t.path}/versions")
        if not n.endswith("-sidecar")
    )
    assert left == [1, v]
    # further deltas + a replay still behave
    assert t.merge(spark.createDataFrame([(1, "x", "update")], DDL), batch_id=0) is None
    t.merge(spark.createDataFrame([(6, "n6", "insert")], DDL), batch_id=4)
    assert {(r.id, r.v) for r in t.read().collect()} == after | {(6, "n6")}


def test_compact_deltas_in_schema_op_and_retain_mode(spark, tmp_work):
    from pyspark.sql import types as T

    # in-schema op (the CDC pipeline target shape)
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("op", T.StringType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = ParquetMergeTable(
        spark, f"{tmp_work}/t1", key=["id"], schema=schema, compact_every=None
    )
    ddl = "id int, op string, v string"
    t.merge(spark.createDataFrame([(1, "insert", "a"), (2, "insert", "b")], ddl), batch_id=0)
    t.merge(spark.createDataFrame([(2, "delete", None), (3, "insert", "c")], ddl), batch_id=1)
    before = {(r.id, r.v) for r in t.read().collect()}
    t.compact_deltas()
    assert {(r.id, r.v) for r in t.read().collect()} == before == {(1, "a"), (3, "c")}

    # retain mode: tombstones are state memory and survive the fold
    t2 = ParquetMergeTable(
        spark, f"{tmp_work}/t2", key=["id"], schema=schema,
        compact_every=None, tombstone_mode="retain",
    )
    t2.merge(spark.createDataFrame([(1, "insert", "a")], ddl), batch_id=0)
    t2.merge(spark.createDataFrame([(1, "delete", None)], ddl), batch_id=1)
    t2.merge(spark.createDataFrame([(2, "insert", "b")], ddl), batch_id=2)
    before2 = {(r.id, r.op) for r in t2.read().collect()}
    assert before2 == {(1, "delete"), (2, "insert")}
    t2.compact_deltas()
    assert {(r.id, r.op) for r in t2.read().collect()} == before2


def test_compact_deltas_nothing_to_fold(spark, tmp_work):
    t = _mk(spark, f"{tmp_work}/t")
    assert t.compact_deltas() is None
    t.merge(spark.createDataFrame([(1, "a", "insert")], DDL), batch_id=0)
    assert t.compact_deltas() is None  # a single delta folds to itself


def test_pipeline_incremental_maintain_equals_full(spark, tmp_work):
    """A stream maintained in-stream with mode='incremental' ends in
    the same state as an unmaintained run, with bounded live commits."""
    import datetime as dt

    from hermes_spark.schema import TRANSCRIPT_SCHEMA
    from hermes_spark.streaming.pipeline import CdcPipeline

    t0 = dt.datetime.fromisoformat("2026-01-01 00:00:00")
    rows = lambda b: [  # noqa: E731
        (f"c{c}", b, "user", f"c{c}-t{b}", None, t0 + dt.timedelta(minutes=b))
        for c in range(20)
    ]
    src, src2 = f"{tmp_work}/src", f"{tmp_work}/src2"
    for b in range(6):
        for s in (src, src2):
            spark.createDataFrame(rows(b), TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(s)
    plain = CdcPipeline(spark, src, f"{tmp_work}/plain", max_files_per_trigger=1)
    plain.run_available()
    inc = CdcPipeline(
        spark, src2, f"{tmp_work}/inc", max_files_per_trigger=1, maintain_every=2
    )
    inc.run_available()
    a = {(r.conv_id, r.turn_idx, r.text) for r in plain.target_live().collect()}
    b = {(r.conv_id, r.turn_idx, r.text) for r in inc.target_live().collect()}
    assert a == b
    _, deltas = inc.target._live_commits()
    # folds bound the live delta chain to < the batch count
    assert len(deltas) <= 3, [d["kind"] for d in deltas]
