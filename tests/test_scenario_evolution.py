"""The scenario-01 composition: datamodel evolution MID-STREAM, one
ordered run.

The reference's flagship functional test drives 120+ ordered steps
against a live server+client — type add, attribute add/remove, secret
purge, int<->tuple pkey migration, trashbin restore/purge, and the
error-queue matrix — asserting object-count deltas after every step
(/root/reference/tests/functional/test_scenario_01_single_datasource
.py:108-2529; count-delta helpers
tests/functional/hermesintegrationtestcase.py:831-852).

Here the same semantic composition runs against ONE live pipeline
work_dir: each step re-declares the YAML datamodel (the engine's user
surface), streams a new micro-batch, and asserts per-type live /
trashbin count deltas plus the step's own semantics.  The soak test
proved the *operational* features compose; this proves the
*datamodel-evolution* features do."""

import os

import pytest
from pyspark.sql import functions as F

from hermes_spark.config import ConfigError, build_pipeline
from hermes_spark.schema import TRANSCRIPT_SCHEMA


def _write_batch(spark, src, rows):
    """rows: (conv_id, turn_idx, role, text, tool, ts_str)"""
    df = spark.createDataFrame(
        list(rows),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.select([f.name for f in TRANSCRIPT_SCHEMA.fields]).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _counts(pipe):
    """Per-objtype (live, trashbin) counts — the reference's
    count-delta oracle (hermesintegrationtestcase.py:831-852)."""
    live = {
        r["_objtype"]: r["n"]
        for r in pipe.target_live().groupBy("_objtype").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    bin_ = {
        r["_objtype"]: r["n"]
        for r in pipe.trashbin().groupBy("_objtype").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    return live, bin_


def _cfg(src, work, *, tool_calls=False, mood=False, token=False,
         ukey=False, validator=False):
    """The scenario's config generations, one flag per evolution step."""
    doc = f"""
hermes-spark:
  pipeline:
    source: {src}
    work_dir: {work}
    watermark: "10 minutes"
    max_files_per_trigger: 1
    tombstone: {{mode: retain, retention: "1 day"}}
"""
    if validator:
        doc += (
            "    validator: "
            "{expr: \"coalesce(login != 'FORBIDDEN', true)\"}\n"
        )
    doc += """
  datamodel:
    passthrough: [ts]
"""
    if ukey:
        doc += """
    key:
      ukey: {expr: "concat(conv_id, '#', cast(turn_idx as string))"}
"""
    doc += """
    types:
      user_turns:
        attrsmapping:
          login: text
"""
    if mood:
        doc += "          mood: {expr: \"upper(role)\"}\n"
    if token:
        doc += "          token: {expr: \"concat('sk-', tool)\", secret: true}\n"
    if tool_calls:
        doc += """
      tool_calls:
        attrsmapping:
          tool_name: tool
"""
    return doc


def test_scenario_datamodel_evolution_one_ordered_run(spark, tmp_work):
    src = os.path.join(tmp_work, "src")
    work = os.path.join(tmp_work, "run")
    U, TC = "user_turns", "tool_calls"

    # ---- step 0: initial datamodel, first data ----------------------
    _write_batch(spark, src, [
        ("c1", 0, "user", "alpha", None, "2026-01-01 10:00:00"),
        ("c1", 1, "assistant", "beta", None, "2026-01-01 10:01:00"),
        ("c2", 0, "user", "gamma", None, "2026-01-01 10:02:00"),
        ("c2", 1, "assistant", "delta", None, "2026-01-01 10:03:00"),
    ])
    pipe = build_pipeline(spark, _cfg(src, work))
    pipe.run_available()
    assert _counts(pipe) == ({U: 4}, {})

    # ---- step 1: ADD A TYPE (scenario-01 "add objtype") -------------
    # the new type starts empty and fills from subsequent events only
    _write_batch(spark, src, [
        ("c3", 0, "assistant", "eps", "grep", "2026-01-01 10:10:00"),
        ("c3", 1, "assistant", "zeta", "sed", "2026-01-01 10:11:00"),
        ("c1", 0, "user", "alpha2", None, "2026-01-01 10:12:00"),
    ])
    pipe = build_pipeline(spark, _cfg(src, work, tool_calls=True))
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 6, TC: 2} and bin_ == {}     # +2 new, 1 updated
    assert pipe.target_live().where(
        (F.col("_objtype") == U) & (F.col("conv_id") == "c1")
        & (F.col("turn_idx") == 0)
    ).first().login == "alpha2"

    # ---- step 2: ADD an attribute AND a SECRET attribute ------------
    _write_batch(spark, src, [
        ("c4", 0, "user", "eta", "awk999", "2026-01-01 10:20:00"),
        ("c2", 0, "user", "gamma2", "jq777", "2026-01-01 10:21:00"),
    ])
    pipe = build_pipeline(
        spark, _cfg(src, work, tool_calls=True, mood=True, token=True)
    )
    ev = pipe.target.dataschema_events()
    assert [s["name"] for s in ev[-1]["info"]["added"]] == ["mood", "token"]
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 7, TC: 4} and bin_ == {}
    by_key = {
        (r.conv_id, r.turn_idx): (r.mood, r.token)
        for r in pipe.target_live().where(F.col("_objtype") == U).collect()
    }
    assert by_key[("c4", 0)] == ("USER", "sk-awk999")      # new-era row
    assert by_key[("c2", 0)] == ("USER", "sk-jq777")       # updated row
    assert by_key[("c1", 1)] == (None, None)               # pre-evolution

    # ---- step 3: REMOVE a plain attribute (view narrows, data keeps) -
    pipe = build_pipeline(
        spark, _cfg(src, work, tool_calls=True, token=True)
    )
    assert "mood" not in pipe.target_live().columns
    assert pipe.target.dataschema_events()[-1]["info"]["removed"] == ["mood"]
    assert _counts(pipe) == ({U: 7, TC: 4}, {})            # no data change

    # ---- step 4: REMOVE the SECRET attribute -> physical purge ------
    pipe = build_pipeline(spark, _cfg(src, work, tool_calls=True))
    assert "token" not in pipe.target_live().columns
    for root, _dirs, files in os.walk(os.path.join(work, "target")):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as fh:
                assert b"sk-" not in fh.read(), (
                    f"secret bytes survive in {os.path.join(root, fn)}"
                )
    assert _counts(pipe) == ({U: 7, TC: 4}, {})
    # non-secret payloads intact through the purge rewrite
    assert pipe.target_live().where(
        (F.col("_objtype") == TC) & (F.col("conv_id") == "c2")
    ).first().tool_name == "jq777"

    # ---- step 5: delete -> trashbin, then LIVE PKEY MIGRATION -------
    _write_batch(spark, src, [
        ("c3", 0, "assistant", None, None, "2026-01-01 10:30:00"),
    ])
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 6, TC: 3} and bin_ == {U: 1, TC: 1}

    ledger_before = set(pipe.target.committed_batch_ids())
    pipe = build_pipeline(spark, _cfg(src, work, tool_calls=True, ukey=True))
    assert pipe.target.key == ["_objtype", "ukey"]
    # every live row AND retained tombstone re-keyed, none dropped
    live, bin_ = _counts(pipe)
    assert live == {U: 6, TC: 3} and bin_ == {U: 1, TC: 1}
    assert {r.ukey for r in pipe.trashbin().collect()} == {"c3#0"}
    assert ledger_before <= set(pipe.target.committed_batch_ids())
    # an update under the new key MERGES onto the migrated row
    _write_batch(spark, src, [
        ("c1", 1, "assistant", "beta2", None, "2026-01-01 10:40:00"),
    ])
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 6, TC: 3} and bin_ == {U: 1, TC: 1}
    assert pipe.target_live().where(
        (F.col("_objtype") == U) & (F.col("ukey") == "c1#1")
    ).first().login == "beta2"

    # ---- step 6: trashbin RESTORE, then retention PURGE -------------
    _write_batch(spark, src, [
        ("c3", 0, "assistant", "eps-back", "grep", "2026-01-01 10:50:00"),
    ])
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 7, TC: 4} and bin_ == {}            # restored
    assert pipe.target_live().where(
        (F.col("_objtype") == U) & (F.col("ukey") == "c3#0")
    ).first().login == "eps-back"

    _write_batch(spark, src, [
        ("c4", 0, "user", None, None, "2026-01-01 11:00:00"),
    ])
    pipe.run_available()
    live, bin_ = _counts(pipe)
    assert live == {U: 6, TC: 3} and bin_ == {U: 1, TC: 1}
    # two days of event time later, the tombstones age past retention
    _write_batch(spark, src, [
        ("c9", 0, "user", "late", None, "2026-01-03 09:00:00"),
    ])
    pipe.run_available()
    pipe.maintain(mode="full")
    live, bin_ = _counts(pipe)
    assert live == {U: 7, TC: 3} and bin_ == {}            # purged for good

    # ---- step 7: validator quarantine BLOCKS migration until drained -
    pipe = build_pipeline(
        spark, _cfg(src, work, tool_calls=True, ukey=True, validator=True)
    )
    _write_batch(spark, src, [
        ("c5", 0, "user", "FORBIDDEN", None, "2026-01-03 09:10:00"),
    ])
    pipe.run_available()
    assert pipe.dlq.read().count() == 1
    live, _ = _counts(pipe)
    assert live == {U: 7, TC: 3}                           # quarantined

    with pytest.raises(ConfigError, match="drain the error queue"):
        build_pipeline(
            spark, _cfg(src, work, tool_calls=True, validator=True)
        )

    # heal: a corrected re-delivery queues behind the bad row (per-key
    # FIFO), and the scheduled drain applies the newest effective event
    _write_batch(spark, src, [
        ("c5", 0, "user", "allowed", None, "2026-01-03 09:20:00"),
    ])
    pipe.run_available()
    assert pipe.retry_queue(tag="scenario-heal") == 0
    live, bin_ = _counts(pipe)
    assert live == {U: 8, TC: 3} and bin_ == {}
    assert pipe.target_live().where(
        (F.col("_objtype") == U) & (F.col("ukey") == "c5#0")
    ).first().login == "allowed"

    # ---- step 8: MIGRATE BACK to the tuple key (reverse direction) --
    pipe = build_pipeline(
        spark, _cfg(src, work, tool_calls=True, validator=True)
    )
    assert pipe.target.key == ["_objtype", "conv_id", "turn_idx"]
    assert "ukey" not in pipe.target_live().columns
    final = {
        (r["_objtype"], r.conv_id, r.turn_idx): r.login
        for r in pipe.target_live().where(F.col("_objtype") == U).collect()
    }
    assert final == {
        (U, "c1", 0): "alpha2",
        (U, "c1", 1): "beta2",
        (U, "c2", 0): "gamma2",
        (U, "c2", 1): "delta",
        (U, "c3", 0): "eps-back",
        (U, "c3", 1): "zeta",
        (U, "c9", 0): "late",
        (U, "c5", 0): "allowed",
    }
    tools = {
        (r.conv_id, r.turn_idx): r.tool_name
        for r in pipe.target_live().where(F.col("_objtype") == TC).collect()
    }
    assert tools == {
        ("c3", 0): "grep", ("c3", 1): "sed", ("c2", 0): "jq777",
    }
