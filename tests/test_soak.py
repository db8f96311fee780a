"""Operations-all-on soak: every operational feature composed in ONE
run — validator + scheduled DLQ drain, in-stream maintenance
(compact + vacuum with the retention window), status listener, a
sibling windowed query over the same source, and a mid-run kill/resume.

Each feature is tested in isolation elsewhere; the round-4 review
history shows the remaining bug class is cross-feature composition
(drain×replay, vacuum×lineage, latch×annotate were all found post-hoc).
Reference anchor: the server+client+bus functional scenario runs
everything at once (/root/reference/tests/functional/
test_scenario_01_single_datasource.py:108-336)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from hermes_spark.schema import TRANSCRIPT_SCHEMA
from hermes_spark.streaming.pipeline import CdcPipeline
from hermes_spark.streaming.status import attach_status

VALIDATOR = lambda df: ~F.col("text").contains("POISON")  # noqa: E731


def _batches():
    """6 micro-batches over ~40 conversations with churn, two poisoned
    rows that later heal (the transient-failure drain path), and
    re-deliveries (the replay path)."""
    t0 = dt.datetime.fromisoformat("2026-01-01 00:00:00")

    def row(conv, idx, text, minutes):
        return (conv, idx, "user", text, None, t0 + dt.timedelta(minutes=minutes))

    batches = []
    for b in range(6):
        rows = []
        for c in range(40):
            conv = f"c{c:02d}"
            # each batch appends a new turn to every conversation, and
            # rewrites one old turn (update churn)
            rows.append(row(conv, b, f"{conv}-t{b}", b * 60 + c))
            if b > 0:
                rows.append(row(conv, b - 1, f"{conv}-t{b-1}-rev{b}", b * 60 + c + 30))
        if b == 1:
            rows.append(row("c00", 0, "POISON bad payload", 95))
            rows.append(row("c01", 0, "POISON other bad", 96))
        if b == 3:
            # healing updates for the poisoned keys (newer event time
            # than the poison)
            rows.append(row("c00", 0, "healed payload", 200))
            rows.append(row("c01", 0, "healed other", 201))
        if b == 4:
            # re-deliver an old batch's rows verbatim (at-least-once)
            rows.extend(
                row(f"c{c:02d}", 1, f"c{c:02d}-t1", 60 + c) for c in range(10)
            )
        batches.append(rows)
    return batches


def _write(spark, src, rows):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _state(pipe):
    return {
        (r.conv_id, r.turn_idx): r.text for r in pipe.target_live().collect()
    }


def _disk_bytes(path):
    total = 0
    for root, _d, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_operations_all_on_soak(spark, tmp_work):
    batches = _batches()

    # -- reference: uninterrupted run, same operational config --------
    src_ref = f"{tmp_work}/src_ref"
    for rows in batches:
        _write(spark, src_ref, rows)
    ref = CdcPipeline(
        spark, src_ref, f"{tmp_work}/ref", max_files_per_trigger=1,
        validator=VALIDATOR, retry_every=1,
    )
    ref.run_available()

    # -- soak: everything on, kill/resume in the middle ---------------
    src = f"{tmp_work}/src"
    work = f"{tmp_work}/soak"
    for rows in batches[:3]:
        _write(spark, src, rows)
    kw = dict(
        max_files_per_trigger=1, validator=VALIDATOR,
        retry_every=1, maintain_every=2,
    )
    pipe = CdcPipeline(spark, src, work, **kw)
    status = attach_status(pipe, path=f"{tmp_work}/status.jsonl")
    # sibling windowed query over the SAME source, live alongside
    win_out = f"{tmp_work}/windows"
    wq = pipe.start_windowed(win_out, kind="tumbling", duration="1 hour")
    try:
        pipe.run_available()  # batches 0-2, in-stream maintain after b1
        wq.processAllAvailable()
    finally:
        wq.stop()
    # "kill": the first pipeline object is abandoned here.  Mid-downtime
    # maintenance runs while the stream is down (the operational case
    # vacuum(retain_superseded=1) exists for).
    pipe.maintain()
    disk_mid = _disk_bytes(f"{work}/target/versions")

    for rows in batches[3:]:
        _write(spark, src, rows)
    pipe2 = CdcPipeline(spark, src, work, **kw)
    wq2 = pipe2.start_windowed(win_out, kind="tumbling", duration="1 hour")
    try:
        pipe2.run_available()  # resumes from checkpoint: batches 3-5
        wq2.processAllAvailable()
    finally:
        wq2.stop()
    pipe2.maintain()

    # 1. target equals the uninterrupted run (exactly-once across the
    #    kill, the drains, and the maintenance cycles)
    assert _state(pipe2) == _state(ref)
    # the healed keys applied through the drain
    assert _state(pipe2)[("c00", 0)] == "healed payload"

    # 2. queue fully drained on both runs
    assert pipe2.dlq.read().count() == 0
    assert ref.dlq.read().count() == 0

    # 3. disk stays O(live state): post-maintenance footprint after 6
    #    batches is bounded by a small multiple of the mid-run one
    disk_end = _disk_bytes(f"{work}/target/versions")
    assert disk_end <= 3 * disk_mid, (disk_mid, disk_end)

    # 4. status surface consistent with the ledger fold: the applied
    #    counters equal a recount from the metrics() frame, and the
    #    listener saw live progress
    s = status.status()
    m = {
        r.op: r.total
        for r in pipe2.sink.metrics()
        .groupBy("op")
        .agg(F.sum("rows").alias("total"))
        .collect()
    }
    assert s["applied"]["inserts"] == m.get("insert", 0)
    assert s["applied"]["updates"] == m.get("update", 0)
    assert s["applied"]["deletes"] == m.get("delete", 0)
    assert s["applied"]["commits"] >= 6
    assert s["error_queue_depth"] == 0
    # net-rows invariant: every key appears via exactly one effective
    # insert (replays deduped), so inserts - deletes = live rows
    assert s["applied"]["inserts"] - s["applied"]["deletes"] == len(_state(pipe2))

    # 5. the sibling windowed query's finalized windows equal the
    #    uninterrupted run's windowed sibling — kill/resume plus
    #    concurrent maintenance must not perturb window contents
    ref_win_out = f"{tmp_work}/ref_windows"
    rq = ref.start_windowed(ref_win_out, kind="tumbling", duration="1 hour")
    try:
        rq.processAllAvailable()
    finally:
        rq.stop()
    got = spark.read.parquet(win_out)
    want = spark.read.parquet(ref_win_out)
    assert got.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # status JSONL audit parses line by line
    import json

    for line in open(f"{tmp_work}/status.jsonl"):
        json.loads(line)
