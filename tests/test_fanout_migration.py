"""Event fan-out (convertEventToLocal), quarantine cache-substitution
(replaceInconsistenciesByCachedValues), pkey migration, and
analyzed-plan required_columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.operators.merge import (
    MUST_EXIST_IN_BOTH,
    merge_sources,
    substitute_cached,
)
from hermes_spark.plans.mapping import (
    LocalTypeSpec,
    fanout_events,
    required_columns,
)
from hermes_spark.tables import ParquetMergeTable, scratch_dir


# ---- fan-out ----------------------------------------------------------------

def test_fanout_one_event_to_n_local_types(spark):
    ev = spark.createDataFrame(
        [
            # (key, op, ts, login, mail, building)
            (1, "insert", 10, "alice", "a@x", "B1"),
            (2, "update", 11, "bob", None, None),     # no content for 'badge'
            (3, "delete", 12, None, None, None),      # deletes always pass
        ],
        "uid int, op string, ts int, login string, mail string, building string",
    )
    out = fanout_events(
        ev,
        [
            LocalTypeSpec("account", {"username": "login", "email": "mail"}),
            LocalTypeSpec(
                "badge",
                {"label": {"expr": "concat(building, ':', login)"},
                 "site": "building"},
            ),
        ],
        key_cols=["uid"],
    )
    acc = {r["uid"]: r for r in out["account"].collect()}
    badge = {r["uid"]: r for r in out["badge"].collect()}

    # one remote event produced events for BOTH local types
    assert set(acc) == {1, 2, 3}
    assert acc[1]["username"] == "alice" and acc[1]["email"] == "a@x"
    # badge: uid=2 has no mapped content → dropped; delete passes
    assert set(badge) == {1, 3}
    assert badge[1]["label"] == "B1:alice" and badge[1]["site"] == "B1"
    assert badge[3]["op"] == "delete"


def test_fanout_allow_empty(spark):
    ev = spark.createDataFrame(
        [(1, "insert", 0, None)], "uid int, op string, ts int, x string"
    )
    out = fanout_events(
        ev, [LocalTypeSpec("t", {"y": "x"}, allow_empty=True)], key_cols=["uid"]
    )
    assert out["t"].count() == 1


# ---- required_columns via analyzed plan ------------------------------------

def test_required_columns_no_substring_false_positives(spark):
    # column named 'c' must NOT match unrelated exprs that contain the
    # letter c; referenced columns must all be found
    df = spark.createDataFrame(
        [(1, 2, 3, "x")], "c int, cc int, c_acctbal int, name string"
    )
    got = required_columns(
        df,
        {
            "a": {"expr": "concat(name, 'c')"},
            "b": {"expr": "c_acctbal * 2"},
            "plain": "cc",
        },
    )
    assert got == {"name", "c_acctbal", "cc"}


# ---- quarantine substitution ------------------------------------------------

def test_substitute_cached_rows(spark):
    a = spark.createDataFrame(
        [(1, "x", "m1"), (2, "y", "m2"), (3, "z", "m3")], "id int, v string, m string"
    )
    b = spark.createDataFrame(
        [(1, "x", "m1"), (2, "CONFLICT", "m2"), (3, "z", "m3")],
        "id int, v string, m string",
    )
    res = merge_sources(a, b, ["id"], MUST_EXIST_IN_BOTH, conflict_policy="quarantine")
    assert {r["id"] for r in res.conflicts.collect()} == {2}

    cache = spark.createDataFrame(
        [(2, "cached_v", "cached_m"), (9, "other", "o")], "id int, v string, m string"
    )
    final = substitute_cached(res.merged, res.conflicts, cache, ["id"])
    rows = {r["id"]: r for r in final.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["v"] == "cached_v" and rows[2]["m"] == "cached_m"

    # conflicted key absent from cache stays dropped
    empty_cache = cache.where(F.lit(False))
    final2 = substitute_cached(res.merged, res.conflicts, empty_cache, ["id"])
    assert {r["id"] for r in final2.collect()} == {1, 3}


# ---- pkey migration ----------------------------------------------------------

OLD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("val", T.StringType(), True),
    ]
)
NEW_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.IntegerType(), False),
        T.StructField("id_b", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("val", T.StringType(), True),
    ]
)


def test_pkey_migration_int_to_composite(spark):
    work = scratch_dir("migr")
    t = ParquetMergeTable(spark, work + "/t", key=["id"], schema=OLD_SCHEMA)

    b0 = spark.createDataFrame(
        [(10, "insert", "a"), (21, "insert", "b"), (32, "insert", "c")], OLD_SCHEMA
    )
    assert t.merge(b0, batch_id=0) is not None
    b1 = spark.createDataFrame([(21, "update", "b2")], OLD_SCHEMA)
    assert t.merge(b1, batch_id=1) is not None

    # int pkey → composite (id_a, id_b) = (id // 10, id % 10), live
    t.migrate_key(
        ["id_a", "id_b"],
        lambda df: df.select(
            (F.col("id") / 10).cast("int").alias("id_a"),
            (F.col("id") % 10).cast("int").alias("id_b"),
            "op",
            "val",
        ),
        NEW_SCHEMA,
    )

    rows = {(r["id_a"], r["id_b"]): r["val"] for r in t.read().collect()}
    assert rows == {(1, 0): "a", (2, 1): "b2", (3, 2): "c"}

    # replay of a pre-migration batch is still a no-op (ledger survives)
    assert t.merge(b1, batch_id=1) is None

    # post-migration merges key on the new composite pkey
    b2 = spark.createDataFrame(
        [(2, 1, "delete", None), (4, 4, "insert", "d")], NEW_SCHEMA
    )
    assert t.merge(b2, batch_id=2) is not None
    rows = {(r["id_a"], r["id_b"]): r["val"] for r in t.read().collect()}
    assert rows == {(1, 0): "a", (3, 2): "c", (4, 4): "d"}

    # the migration is auditable in the commit log
    audit = [r for r in t._read_log() if r.get("kind") == "migrate"]
    assert audit and audit[0]["info"]["old_key"] == ["id"]
    assert audit[0]["info"]["new_key"] == ["id_a", "id_b"]
    # the record carries the post-migration column set (logged_schema
    # folds it wholesale) and the table's folded disk-truth agrees
    assert [n for n, _ in audit[0]["info"]["schema"]] == [
        "id_a", "id_b", "op", "val"
    ]
    assert t.logged_key() == ["id_a", "id_b"]
    assert [f.name for f in t.logged_schema().fields] == [
        "id_a", "id_b", "op", "val"
    ]
    t.drop()


def test_pkey_migration_preserves_tombstones(spark):
    work = scratch_dir("migr2")
    t = ParquetMergeTable(
        spark, work + "/t", key=["id"], schema=OLD_SCHEMA, tombstone_mode="retain"
    )
    t.merge(
        spark.createDataFrame([(10, "insert", "a"), (21, "insert", "b")], OLD_SCHEMA),
        batch_id=0,
    )
    t.merge(spark.createDataFrame([(21, "delete", None)], OLD_SCHEMA), batch_id=1)

    t.migrate_key(
        ["id_a", "id_b"],
        lambda df: df.select(
            (F.col("id") / 10).cast("int").alias("id_a"),
            (F.col("id") % 10).cast("int").alias("id_b"),
            "op",
            "val",
        ),
        NEW_SCHEMA,
    )
    # tombstone memory migrated with the rows (state-table semantics)
    all_rows = {(r["id_a"], r["id_b"]): r["op"] for r in t.read().collect()}
    assert all_rows == {(1, 0): "insert", (2, 1): "delete"}
    t.drop()


def test_purge_secret_columns(spark):
    work = scratch_dir("purge")
    t = ParquetMergeTable(spark, work + "/t", key=["id"], schema=OLD_SCHEMA)
    t.merge(
        spark.createDataFrame([(1, "insert", "s3cret"), (2, "insert", "x")], OLD_SCHEMA),
        batch_id=0,
    )
    t.purge_columns(["val"])
    rows = t.read().collect()
    assert {r["id"] for r in rows} == {1, 2}
    assert "val" not in t.read().columns
    # audit record present; purging a key column refuses
    assert any(r.get("kind") == "purge" for r in t._read_log())
    with pytest.raises(ValueError):
        t.purge_columns(["id"])
    t.drop()


# ---- fan-out with cache re-render (modified events) -------------------------

def _cache_rig(spark):
    cache = spark.createDataFrame(
        [
            (1, "alice", "a@x", "B1"),
            (2, "bob", "b@x", "B2"),
            (3, "caro", "c@x", "B3"),
            (4, "dave", "d@x", None),
        ],
        "uid int, login string, mail string, building string",
    )
    ev = spark.createDataFrame(
        [
            # only building sent: the badge template references login,
            # which must render from the CACHED object, not NULL
            (1, "update", 10, None, None, "B9"),
            # mail sent but UNCHANGED vs cache → no local change
            (2, "update", 11, None, "b@x", None),
            # login changed → cascades into the multi-var template
            (3, "update", 12, "carol", None, None),
            # building appears on an object whose cache had none
            (4, "update", 13, None, None, "B4"),
        ],
        "uid int, op string, ts int, login string, mail string, building string",
    )
    return cache, ev


def test_fanout_modified_rerenders_against_cache(spark):
    """Reference clients/datamodel.py:550-596: a partial `modified`
    event is re-rendered against the full cached object and each
    rendered attr re-classified vs the cached local row."""
    cache, ev = _cache_rig(spark)
    out = fanout_events(
        ev,
        [
            LocalTypeSpec("account", {"email": "mail", "username": "login"}),
            LocalTypeSpec(
                "badge",
                {"tag": {"expr": "concat(building, ':', login)"},
                 "b": "building"},
            ),
        ],
        key_cols=["uid"],
        cache=cache,
    )
    badge = {r.uid: r for r in out["badge"].collect()}
    # unsent attr rendered from cache (the round-3 gap: was NULL)
    assert badge[1].tag == "B9:alice"
    assert badge[1].attrs_modified == ["b", "tag"]
    # nothing changed for this type → event dropped for it
    assert 2 not in badge
    assert badge[3].tag == "B3:carol" and badge[3].attrs_modified == ["tag"]
    # cache had no building: both rendered attrs classify as added
    assert badge[4].attrs_added == ["b", "tag"] and badge[4].tag == "B4:dave"

    acct = {r.uid: r for r in out["account"].collect()}
    assert 2 not in acct  # coalesced payload identical to cache
    assert 1 not in acct  # building-only event touches no account attr
    assert acct[3].username == "carol"
    assert acct[3].attrs_modified == ["username"] and acct[3].attrs_added == []


def test_fanout_cache_removed_classification(spark):
    """A re-render that nulls a previously-present local attr
    classifies as removed (reference 3-way re-classification)."""
    cache, ev = _cache_rig(spark)
    out = fanout_events(
        ev,
        [LocalTypeSpec("nb", {"x": {"expr": "nullif(building, 'B9')"}})],
        key_cols=["uid"],
        cache=cache,
    )
    rows = {r.uid: r for r in out["nb"].collect()}
    # uid 1: old x = B1, new render = nullif(B9) = NULL → removed
    assert rows[1].attrs_removed == ["x"] and rows[1].x is None
    # uid 4: old NULL, new B4 → added
    assert rows[4].attrs_added == ["x"]


def test_fanout_without_cache_unchanged(spark):
    """cache=None keeps the original projection-only behavior."""
    _cache, ev = _cache_rig(spark)
    out = fanout_events(
        ev,
        [LocalTypeSpec("account", {"v": "mail"})],
        key_cols=["uid"],
    )
    got = {r.uid: r.v for r in out["account"].collect()}
    assert got == {2: "b@x"}  # only the event with mail content survives
    assert "attrs_added" not in out["account"].columns
