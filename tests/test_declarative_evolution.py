"""Declarative datamodel EVOLUTION: re-declaring the YAML config over
an existing work_dir reconciles the new datamodel against the disk
truth at build time — the reference server's per-cycle schema-registry
diff (/root/reference/server/hermesserver.py:340-443) plus the
scenario-01 evolution steps (add/remove attribute, secret purge,
pkey migration — tests/functional/test_scenario_01_single_datasource
.py:206-1229), and the trashbin (tombstone-retain) pipeline mode
(reference trashbin_purgeInterval, clients/__init__.py:757-813)."""

import os

import pytest
from pyspark.sql import functions as F

from hermes_spark.config import ConfigError, build_pipeline, load_config
from hermes_spark.schema import TRANSCRIPT_SCHEMA


def _cfg(src, work, types_yaml, extra_pipeline="", key_yaml="", status=False):
    doc = f"""
hermes-spark:
  pipeline:
    source: {src}
    work_dir: {work}
    watermark: "10 minutes"
    max_files_per_trigger: 1
{extra_pipeline}
  datamodel:
    passthrough: [ts]
{key_yaml}
    types:
{types_yaml}
"""
    if status:
        doc += f"""
  status:
    path: {work}/status.jsonl
"""
    return doc


def _write_batch(spark, src, rows):
    """rows: (conv_id, turn_idx, role, text, tool, ts_str)"""
    df = spark.createDataFrame(
        [(c, i, r, t, tl, ts) for c, i, r, t, tl, ts in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.select([f.name for f in TRANSCRIPT_SCHEMA.fields]).coalesce(1).write.mode(
        "append"
    ).parquet(src)


# -- tombstone (trashbin) config validation ---------------------------------


def test_tombstone_retention_requires_retain_mode():
    with pytest.raises(ConfigError, match=r"tombstone\.retention"):
        load_config(
            {
                "hermes-spark": {
                    "pipeline": {
                        "source": "/s",
                        "work_dir": "/w",
                        "tombstone": {"mode": "drop", "retention": "30 days"},
                    }
                }
            }
        )


def test_tombstone_bad_mode_enum():
    with pytest.raises(ConfigError, match=r"tombstone\.mode"):
        load_config(
            {
                "hermes-spark": {
                    "pipeline": {
                        "source": "/s",
                        "work_dir": "/w",
                        "tombstone": {"mode": "keep"},
                    }
                }
            }
        )


def test_tombstone_retain_rejected_in_join_mode(spark, tmp_work):
    cfg = {
        "hermes-spark": {
            "pipeline": {
                "source": os.path.join(tmp_work, "s"),
                "work_dir": os.path.join(tmp_work, "w"),
                "mode": "join",
                "tombstone": {"mode": "retain"},
            }
        }
    }
    with pytest.raises(ConfigError, match=r"tombstone\.mode"):
        build_pipeline(spark, cfg)


# -- trashbin pipeline semantics --------------------------------------------


def test_trashbin_retain_delete_restore_and_retention(spark, tmp_work):
    """Retained tombstones: target_live hides them, trashbin() shows
    them, a re-delivered turn restores the key, and maintenance purges
    tombstones past the event-time retention window."""
    src = os.path.join(tmp_work, "src")
    cfg = {
        "hermes-spark": {
            "pipeline": {
                "source": src,
                "work_dir": os.path.join(tmp_work, "run"),
                "watermark": "10 minutes",
                "max_files_per_trigger": 1,
                "tombstone": {"mode": "retain", "retention": "1 day"},
            }
        }
    }
    _write_batch(
        spark, src,
        [
            ("c1", 0, "user", "hello", None, "2026-01-01 10:00:00"),
            ("c1", 1, "assistant", "world", "search", "2026-01-01 10:01:00"),
            ("c2", 0, "user", "x", None, "2026-01-01 10:02:00"),
        ],
    )
    # tombstones: text IS NULL deletes a live key
    _write_batch(
        spark, src,
        [
            ("c1", 1, "assistant", None, None, "2026-01-01 11:00:00"),
            ("c2", 0, "user", None, None, "2026-01-01 11:00:30"),
        ],
    )
    pipe = build_pipeline(spark, cfg)
    assert pipe.tombstone_mode == "retain"
    pipe.run_available()

    live = {(r.conv_id, r.turn_idx) for r in pipe.target_live().collect()}
    bin_ = {(r.conv_id, r.turn_idx) for r in pipe.trashbin().collect()}
    assert live == {("c1", 0)}
    assert bin_ == {("c1", 1), ("c2", 0)}

    # restore: a re-delivered turn brings the key back to life
    _write_batch(
        spark, src,
        [("c1", 1, "assistant", "world again", "search",
          "2026-01-01 12:00:00")],
    )
    pipe.run_available()
    live = {(r.conv_id, r.turn_idx) for r in pipe.target_live().collect()}
    bin_ = {(r.conv_id, r.turn_idx) for r in pipe.trashbin().collect()}
    assert ("c1", 1) in live and ("c1", 1) not in bin_
    assert bin_ == {("c2", 0)}
    restored = pipe.target_live().where(
        (F.col("conv_id") == "c1") & (F.col("turn_idx") == 1)
    ).first()
    assert restored.text == "world again"

    # retention: an event two days later moves the horizon past the
    # c2 tombstone (ts 11:00:30 + 1 day < max ts) -> purged on full
    # maintenance; live rows never expire
    _write_batch(
        spark, src,
        [("c3", 0, "user", "later", None, "2026-01-03 09:00:00")],
    )
    pipe.run_available()
    assert pipe.trashbin().count() == 1  # still visible pre-maintenance
    pipe.maintain(mode="full")
    assert pipe.trashbin().count() == 0
    live = {(r.conv_id, r.turn_idx) for r in pipe.target_live().collect()}
    assert live == {("c1", 0), ("c1", 1), ("c3", 0)}


# -- reconcile: schema evolution --------------------------------------------

TYPES_V1 = """
      user_turns:
        attrsmapping:
          login: text
"""

TYPES_V2 = """
      user_turns:
        attrsmapping:
          login: text
          mood: {expr: "upper(tool)"}
"""


def test_reconcile_added_attribute_publishes_dataschema(spark, tmp_work):
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    _write_batch(
        spark, src,
        [("c1", 0, "user", "hello", "grep", "2026-01-01 10:00:00")],
    )
    pipe = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    pipe.run_available()
    assert "mood" not in [f.name for f in pipe.target.schema.fields]

    # re-declare with the extra attribute over the SAME work_dir
    _write_batch(
        spark, src,
        [("c2", 0, "user", "hi", "sed", "2026-01-01 10:05:00")],
    )
    pipe2 = build_pipeline(spark, _cfg(src, work, TYPES_V2))
    events = pipe2.target.dataschema_events()
    assert len(events) == 1
    assert [s["name"] for s in events[0]["info"]["added"]] == ["mood"]
    pipe2.run_available()

    rows = {
        r.conv_id: r.mood for r in pipe2.target_live().collect()
    }
    # pre-evolution row conforms with NULL; new row carries the value
    assert rows == {"c1": None, "c2": "SED"}

    # idempotence: a third build with the same declaration publishes
    # nothing new
    pipe3 = build_pipeline(spark, _cfg(src, work, TYPES_V2))
    assert len(pipe3.target.dataschema_events()) == 1


def test_reconcile_removed_attribute_narrows_view_once(spark, tmp_work):
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    _write_batch(
        spark, src,
        [("c1", 0, "user", "hello", "grep", "2026-01-01 10:00:00")],
    )
    pipe = build_pipeline(spark, _cfg(src, work, TYPES_V2))
    pipe.run_available()

    pipe2 = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    # the view narrows; the disk truth still remembers the column
    # (its bytes persist until an explicit purge)
    assert "mood" not in pipe2.target_live().columns
    events = pipe2.target.dataschema_events()
    assert len(events) == 1 and events[0]["info"]["removed"] == ["mood"]
    logged = [f.name for f in pipe2.target.logged_schema().fields]
    assert "mood" in logged

    # rebuilding again must NOT republish the identical removal event
    pipe3 = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    assert len(pipe3.target.dataschema_events()) == 1


def test_reconcile_removed_secret_attr_is_physically_purged(spark, tmp_work):
    """secret: true attrs vanish from DISK when removed from the
    datamodel — the reference's attribute-became-secret cache purge
    (hermesserver.py:411-429): a byte-walk over every file under the
    target finds no trace of the secret values."""
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    types_secret = """
      user_turns:
        attrsmapping:
          login: text
          token: {col: tool, secret: true}
"""
    _write_batch(
        spark, src,
        [
            ("c1", 0, "user", "hello", "hunter2secret", "2026-01-01 10:00:00"),
            ("c2", 0, "user", "bye", "hunter2secret", "2026-01-01 10:01:00"),
        ],
    )
    pipe = build_pipeline(spark, _cfg(src, work, types_secret))
    pipe.run_available()
    tok = pipe.target_live().select("token").first()
    assert tok.token == "hunter2secret"

    pipe2 = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    assert "token" not in pipe2.target_live().columns
    target_dir = os.path.join(work, "target")
    for root, _dirs, files in os.walk(target_dir):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as fh:
                assert b"hunter2secret" not in fh.read(), (
                    f"secret bytes survive in {os.path.join(root, fn)}"
                )
    # the purge is also the disk truth: a third build reconciles clean
    pipe3 = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    assert "token" not in [
        f.name for f in pipe3.target.logged_schema().fields
    ]
    # login survived untouched
    assert {r.login for r in pipe3.target_live().collect()} == {
        "hello", "bye"
    }


# -- reconcile: live pkey migration -----------------------------------------

KEY_UKEY = """
    key:
      ukey: {expr: "concat(conv_id, '#', cast(turn_idx as string))"}
"""


def test_reconcile_live_pkey_migration_both_directions(spark, tmp_work):
    """tuple -> derived single key -> back to tuple, over LIVE data,
    with the batch ledger surviving (pre-migration replays stay
    no-ops) — the reference's int<->tuple pkey dataschema change
    (scenario-01 steps 301-307)."""
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    _write_batch(
        spark, src,
        [
            ("c1", 0, "user", "a", None, "2026-01-01 10:00:00"),
            ("c1", 1, "user", "b", None, "2026-01-01 10:01:00"),
        ],
    )
    pipe = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    pipe.run_available()
    assert pipe.target.key == ["_objtype", "conv_id", "turn_idx"]
    ledger_before = set(pipe.target.committed_batch_ids())
    assert ledger_before

    # -> derived single key (live migration at build time)
    pipe2 = build_pipeline(
        spark, _cfg(src, work, TYPES_V1, key_yaml=KEY_UKEY)
    )
    assert pipe2.target.key == ["_objtype", "ukey"]
    assert pipe2.target.logged_key() == ["_objtype", "ukey"]
    migrated = {r.ukey: r.login for r in pipe2.target_live().collect()}
    assert migrated == {"c1#0": "a", "c1#1": "b"}
    # ledger survived the migration: replays of pre-migration batches
    # stay no-ops
    assert ledger_before <= set(pipe2.target.committed_batch_ids())

    # stream more data under the NEW key: an update must merge onto
    # the migrated row, not duplicate it
    _write_batch(
        spark, src,
        [
            ("c1", 1, "user", "b2", None, "2026-01-01 10:30:00"),
            ("c2", 0, "user", "c", None, "2026-01-01 10:31:00"),
        ],
    )
    pipe2.run_available()
    rows = {r.ukey: r.login for r in pipe2.target_live().collect()}
    assert rows == {"c1#0": "a", "c1#1": "b2", "c2#0": "c"}
    assert pipe2.target_live().count() == 3

    # -> back to the tuple key (reverse migration drops ukey)
    pipe3 = build_pipeline(spark, _cfg(src, work, TYPES_V1))
    assert pipe3.target.key == ["_objtype", "conv_id", "turn_idx"]
    assert "ukey" not in pipe3.target_live().columns
    back = {
        (r.conv_id, r.turn_idx): r.login
        for r in pipe3.target_live().collect()
    }
    assert back == {("c1", 0): "a", ("c1", 1): "b2", ("c2", 0): "c"}


def test_reconcile_migration_blocked_on_nonempty_queue(spark, tmp_work):
    validator = (
        '    validator: {expr: "coalesce(length(login) < 3, true)"}\n'
    )
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    _write_batch(
        spark, src,
        [
            ("c1", 0, "user", "ok", None, "2026-01-01 10:00:00"),
            ("c1", 1, "user", "too-long", None, "2026-01-01 10:01:00"),
        ],
    )
    pipe = build_pipeline(
        spark, _cfg(src, work, TYPES_V1, extra_pipeline=validator)
    )
    pipe.run_available()
    assert pipe.dlq.read().count() == 1

    with pytest.raises(ConfigError, match="drain the error queue"):
        build_pipeline(
            spark,
            _cfg(src, work, TYPES_V1, extra_pipeline=validator,
                 key_yaml=KEY_UKEY),
        )


def test_reconcile_empty_table_redeclare_is_not_a_migration(spark, tmp_work):
    """Re-declaring over a work_dir that never saw data replaces the
    disk truth instead of migrating zero rows — and the stale create
    record must not poison a later build after data lands."""
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    build_pipeline(spark, _cfg(src, work, TYPES_V1))
    pipe2 = build_pipeline(
        spark, _cfg(src, work, TYPES_V2, key_yaml=KEY_UKEY)
    )
    log = pipe2.target._read_log()
    assert not [r for r in log if r.get("kind") == "migrate"]
    assert pipe2.target.logged_key() == ["_objtype", "ukey"]

    _write_batch(
        spark, src, [("c1", 0, "user", "a", "t", "2026-01-01 10:00:00")]
    )
    pipe3 = build_pipeline(
        spark, _cfg(src, work, TYPES_V2, key_yaml=KEY_UKEY)
    )
    assert not [
        r for r in pipe3.target._read_log() if r.get("kind") == "migrate"
    ]
    pipe3.run_available()
    assert {r.ukey for r in pipe3.target_live().collect()} == {"c1#0"}
