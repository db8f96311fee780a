"""Scheduled error-queue retry wired into the streaming pipeline — the
reference's ``errorQueue_retryInterval`` operational loop
(clients/__init__.py:640-755): transient failures heal WITHOUT operator
intervention, and exactly-once survives a crash inside a drain pass."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from hermes_spark.schema import TRANSCRIPT_SCHEMA
from hermes_spark.streaming.pipeline import CdcPipeline


def _row(conv, idx, text, t):
    return (conv, idx, "user", text, None, dt.datetime.fromisoformat(t))


def _write(spark, src, rows):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


VALIDATOR = lambda df: ~F.col("text").contains("POISON")  # noqa: E731

B0 = [
    _row("a", 0, "hello", "2026-01-01 00:00:00"),
    _row("b", 0, "POISON v1", "2026-01-01 00:00:01"),
]
B1 = [
    # a later UPDATE fixes the poisoned key: it gates into the queue
    # (per-key FIFO), compacts over the failed event, and the scheduled
    # drain then applies it — no operator touched anything
    _row("b", 0, "fixed v2", "2026-01-01 01:00:00"),
    _row("c", 0, "new conv", "2026-01-01 01:00:01"),
]

EXPECT = {("a", 0): "hello", ("b", 0): "fixed v2", ("c", 0): "new conv"}


def _target_state(pipe):
    return {
        (r.conv_id, r.turn_idx): r.text for r in pipe.target_live().collect()
    }


def test_transient_failure_heals_via_scheduled_drain(spark, tmp_work):
    src = f"{tmp_work}/src"
    _write(spark, src, B0)
    _write(spark, src, B1)
    pipe = CdcPipeline(
        spark, src, f"{tmp_work}/run", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=1,
    )
    pipe.run_available()
    assert _target_state(pipe) == EXPECT
    assert pipe.dlq.read().count() == 0  # queue drained itself


def test_crash_inside_drain_pass_resumes_exactly_once(spark, tmp_work):
    """foreachBatch = sink + drain; a crash inside the drain fails the
    micro-batch AFTER both sink ledgers committed.  On restart the
    batch replays: the sink no-ops on both ledgers, the drain re-runs
    (its target merges are (tag, pass)-ledgered), and the final state
    equals the uninterrupted run."""
    src = f"{tmp_work}/src"
    _write(spark, src, B0)
    _write(spark, src, B1)
    pipe = CdcPipeline(
        spark, src, f"{tmp_work}/run", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=1,
    )
    real_resolve = pipe.dlq.resolve
    calls = {"n": 0}

    def crashing_resolve(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash inside drain")
        return real_resolve(*a, **kw)

    pipe.dlq.resolve = crashing_resolve
    q = pipe.start()
    with pytest.raises(Exception):  # StreamingQueryException wrapping the crash
        q.processAllAvailable()
        q.awaitTermination(10)
    try:
        q.stop()
    except Exception:
        pass
    # the crash hit during batch 1's drain (batch 1 carries the fix
    # that makes the queued key pass validation)
    assert calls["n"] == 1

    # fresh process, same checkpoint/work dir
    pipe2 = CdcPipeline(
        spark, src, f"{tmp_work}/run", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=1,
    )
    pipe2.run_available()
    assert _target_state(pipe2) == EXPECT
    assert pipe2.dlq.read().count() == 0
    # no duplicate rows snuck in through the replayed drain
    assert pipe2.target.read().count() == len(EXPECT)


def test_retry_queue_is_idempotent_per_tag(spark, tmp_work):
    """Re-running a drain pass with the same tag (the replay case) must
    not re-apply: target merges are ledgered per (tag, pass)."""
    src = f"{tmp_work}/src"
    _write(spark, src, B0)
    _write(spark, src, B1)
    pipe = CdcPipeline(
        spark, src, f"{tmp_work}/run", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=None,   # no scheduled drain
    )
    pipe.run_available()
    assert pipe.dlq.read().count() == 1          # fix is queued, undrained
    assert pipe.retry_queue(tag="manual") == 0
    v = pipe.target.current_version()
    # same tag again: every merge no-ops, nothing to resolve
    assert pipe.retry_queue(tag="manual") == 0
    assert _target_state(pipe) == EXPECT
    # only the (empty) queue maintenance may move the queue table; the
    # TARGET must not have taken any new commit
    assert pipe.target.current_version() == v


def test_metrics_survive_string_drain_batch_ids(spark, tmp_work):
    """Drain merges carry string batch ids ('dlq-<tag>-p<n>'); the
    metrics surfaces must fold them verbatim instead of int-coercing
    (which raised ValueError after the first drain)."""
    src = f"{tmp_work}/src"
    _write(spark, src, B0)
    _write(spark, src, B1)
    pipe = CdcPipeline(
        spark, src, f"{tmp_work}/run", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=1,
    )
    pipe.run_available()
    m = pipe.sink.metrics()
    ids = {r.batch_id for r in m.select("batch_id").distinct().collect()}
    assert any(i.startswith("dlq-") for i in ids), ids
    assert pipe.sink.partition_lineage().count() >= 0  # folds without error


def test_drain_replay_with_shifted_passes_applies_all(spark, tmp_work):
    """Multi-pass drain with FK blocking, crashed between passes: the
    replay's pass-1 candidates are the OLD pass-2 rows.  Pass-number
    batch ids would no-op the merge against pass 1's ledger entry while
    resolve still removed the rows (silent loss); content-stable ids
    must apply them."""
    os.makedirs(f"{tmp_work}/src", exist_ok=True)
    pipe = CdcPipeline(
        spark, f"{tmp_work}/src", f"{tmp_work}/run",
        validator=VALIDATOR, retry_every=None,
        # an event whose conv_id equals a queued event's `tool` is that
        # event's FK-parent — it must wait for the child to drain
        fk_map=[("conv_id", "tool")], foreignkeys_policy="on_every_event",
    )
    ddl = ("conv_id string, turn_idx int, offset long, op string, "
           "role string, text string, tool string, ts string, cksum string")
    rows = [
        # child: names p1 as its parent via tool
        ("c1", 0, 1, "insert", "user", "child ok", "p1",
         "2026-01-01 00:00:00", "k1"),
        # parent: blocked from pass 1 while the child is queued
        ("p1", 0, 2, "insert", "user", "parent ok", None,
         "2026-01-01 00:00:01", "k2"),
    ]
    ev = spark.createDataFrame(rows, ddl).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    pipe.dlq.enqueue(ev, batch_id="seed")
    # sanity: FK blocking makes this a two-pass drain
    assert [r.conv_id for r in pipe.dlq.retry_candidates().collect()] == ["c1"]

    real_apply = pipe.sink._apply
    calls = {"n": 0}

    def crashing_apply(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash between passes")
        return real_apply(*a, **kw)

    pipe.sink._apply = crashing_apply
    with pytest.raises(RuntimeError, match="between passes"):
        pipe.retry_queue(tag="t")
    pipe.sink._apply = real_apply
    # pass 1 applied + resolved the child; the parent is still queued
    assert [r.conv_id for r in pipe.dlq.read().collect()] == ["p1"]

    assert pipe.retry_queue(tag="t") == 0  # replay with the SAME tag
    got = {(r.conv_id, r.turn_idx): r.text for r in pipe.target_live().collect()}
    assert got == {("c1", 0): "child ok", ("p1", 0): "parent ok"}
