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
