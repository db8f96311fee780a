"""Streaming windows + stream-stream join: stream results must equal
their batch twins on the same input (watermark large enough that
nothing is dropped; then a late-data test with a tight watermark)."""

import os

import pyspark.sql.functions as F
import pytest

from hermes_spark.fixtures import TranscriptConfig, generate_transcripts
from hermes_spark.operators.tooljoin import correlate_tool_calls
from hermes_spark.operators.windows import session_snapshots, tumbling_snapshots
from hermes_spark.schema import TRANSCRIPT_SCHEMA
from hermes_spark.streaming.join import stream_correlate_tool_calls


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    pdf = generate_transcripts(
        TranscriptConfig(n_convs=30, mega_len=200, late_frac=0.0)
    )
    d = str(tmp_path_factory.mktemp("winsrc"))
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(d)
    return d


def _run_stream(spark, df, checkpoint):
    q = (
        df.writeStream.format("memory")
        .queryName(os.path.basename(checkpoint))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(os.path.basename(checkpoint))


def test_tumbling_stream_equals_batch(spark, stream_src, tmp_work):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    # huge watermark: all windows close when the stream drains? No —
    # append-mode windows only emit once the watermark passes, so use a
    # tiny watermark and an input with no late data instead.
    agg = tumbling_snapshots(
        stream.withWatermark("ts", "0 seconds"), duration="1 hour"
    )
    got = _run_stream(spark, agg, os.path.join(tmp_work, "ck_tumble"))

    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    exp = tumbling_snapshots(batch, duration="1 hour")
    # append mode withholds windows not yet past the watermark (the
    # final windows of the stream) — got ⊆ exp, and every emitted
    # window must match the batch recomputation exactly.
    assert got.count() > 0
    assert got.exceptAll(exp).count() == 0
    missing = exp.exceptAll(got)
    # only the stream-tail windows (max event time per conv) may be missing
    assert missing.count() <= exp.select("conv_id").distinct().count() * 2


def test_session_stream_subset_of_batch(spark, stream_src, tmp_work):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    agg = session_snapshots(
        stream.withWatermark("ts", "0 seconds"), gap="30 minutes"
    )
    got = _run_stream(spark, agg, os.path.join(tmp_work, "ck_sess"))
    batch = session_snapshots(
        spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_src), gap="30 minutes"
    )
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_stream_join_matches_batch_join(spark, stream_src, tmp_work):
    turns = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    j = stream_correlate_tool_calls(turns, watermark="2 hours", max_lag_seconds=3600)
    got = _run_stream(spark, j, os.path.join(tmp_work, "ck_join"))

    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    exp_pairs = correlate_tool_calls(batch, max_lag_seconds=3600).where(
        F.col("resp_turn_idx").isNotNull()
    )
    # stream emits ALL in-window candidates; batch keeps first response.
    # check: every batch (call,first-response) pair appears in stream out.
    got_k = got.select("conv_id", "call_turn_idx", "resp_turn_idx")
    exp_k = exp_pairs.select("conv_id", "call_turn_idx", "resp_turn_idx")
    assert exp_k.exceptAll(got_k.distinct()).count() == 0
    assert got.count() >= exp_pairs.count()


def test_late_data_dropped_by_watermark(spark, tmp_work):
    """Turns later than the watermark are excluded from closed windows
    (the lateness contract W6)."""
    import pandas as pd

    rows = []
    base = pd.Timestamp("2026-01-01 10:00:00")
    for i in range(20):
        rows.append(("c1", i, "user", f"t{i}", None, base + pd.Timedelta(seconds=30 * i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    src = os.path.join(tmp_work, "late_src")
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    # batch 2: much later turns (advance watermark far past 10:00 window)
    pdf2 = pd.DataFrame(
        [("c1", 100, "user", "later", None, base + pd.Timedelta(hours=5))],
        columns=pdf.columns,
    )
    spark.createDataFrame(pdf2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    # batch 3: a very late turn for the already-closed 10:00 window
    pdf3 = pd.DataFrame(
        [("c1", 99, "user", "too late", None, base + pd.Timedelta(seconds=45))],
        columns=pdf.columns,
    )

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    agg = tumbling_snapshots(stream.withWatermark("ts", "10 minutes"), "1 hour")
    qname = "late_out"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_work, "ck_late"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf3, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table(qname).where(F.col("conv_id") == "c1").collect()
    ten = [r for r in out if r.window_start.hour == 10]
    assert len(ten) == 1
    assert ten[0].n_turns == 20  # late turn_idx=99 was NOT added


def test_pipeline_windowed_snapshots_over_change_stream(spark, stream_src, tmp_work):
    """Windowed snapshot digests computed over the classified change
    stream (pipeline sibling query) emit and are consistent with a
    batch recomputation over the same emitted events."""
    import os as _os

    from hermes_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(spark, stream_src, _os.path.join(tmp_work, "wq"),
                       watermark="0 seconds")
    out = _os.path.join(tmp_work, "win_out")
    q = pipe.start_windowed(out, kind="tumbling", duration="1 hour")
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert {"window_start", "conv_id", "n_turns", "conv_cksum"} <= set(got.columns)


def test_pipeline_sliding_snapshots_over_change_stream(spark, stream_src, tmp_work):
    """Sliding-window snapshot digests (1h window / 30min slide) over
    the classified change stream: every emitted event must appear in
    exactly duration/slide = 2 overlapping windows, and the per-window
    digests must equal a batch recomputation of the same operator."""
    import os as _os

    from hermes_spark.operators.windows import sliding_snapshots
    from hermes_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(spark, stream_src, _os.path.join(tmp_work, "swq"),
                       watermark="0 seconds")
    out = _os.path.join(tmp_work, "slide_out")
    q = pipe.start_windowed(out, kind="sliding", duration="1 hour",
                            slide="30 minutes")
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() > 0

    # stream_src is inserts-only, so the classified change stream equals
    # the raw turns — batch-recompute the same operator over the source
    changes = spark.read.parquet(stream_src)
    want = sliding_snapshots(changes, duration="1 hour", slide="30 minutes")
    got_rows = {
        (r["window_start"], r["conv_id"]): (r["n_turns"], r["conv_cksum"])
        for r in got.collect()
    }
    want_rows = {
        (r["window_start"], r["conv_id"]): (r["n_turns"], r["conv_cksum"])
        for r in want.collect()
    }
    # streaming emits only finalized windows; every emitted window must
    # match the batch recomputation exactly
    assert got_rows
    for k, v in got_rows.items():
        assert want_rows.get(k) == v, k
    # sliding property: total (window, conv, turn) memberships = 2x turns
    n_turns_total = changes.count()
    member_total = got.agg(F.sum("n_turns")).collect()[0][0] or 0
    assert member_total <= 2 * n_turns_total


# -- streaming exact dedup --------------------------------------------------

def test_stream_exact_dedup_matches_batch(spark, stream_src, tmp_work):
    """stream_exact_dedup over the whole history in one pass keeps
    exactly one row per distinct fingerprint — the same survivor SET
    a batch exact-dedup computes — and the kept row is a real input
    row for its fingerprint."""
    from hermes_spark.functions.text import normalized_fingerprint
    from hermes_spark.streaming.dedup import stream_exact_dedup

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    got = _run_stream(
        spark,
        stream_exact_dedup(stream, watermark="365 days"),
        os.path.join(tmp_work, "ck_dedup"),
    )

    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_src)
    bfp = batch.withColumn("_fp", normalized_fingerprint("text"))
    n_distinct = bfp.select("_fp").distinct().count()
    assert got.count() == n_distinct
    gfp = got.withColumn("_fp", normalized_fingerprint("text"))
    assert gfp.select("_fp").distinct().count() == n_distinct
    # every kept row is an actual input row (first-arrival semantics
    # can pick any copy, but never synthesizes)
    assert got.exceptAll(batch).count() == 0


def test_stream_exact_dedup_scoped_and_bounded_state(spark, tmp_work):
    """Scoped dedup (extra_key=[conv_id]) suppresses only same-conv
    copies; and a duplicate arriving AFTER the watermark horizon is
    re-emitted on a checkpoint-resumed run (state was evicted) — the
    bounded-state contract.  Parquet sink: file sinks support
    checkpoint recovery (memory sinks don't)."""
    import datetime as dt

    from hermes_spark.streaming.dedup import stream_exact_dedup

    t0 = dt.datetime(2026, 1, 1)
    rows1 = [
        ("a", 0, "user", "same text", None, t0),
        ("b", 0, "user", "same text", None, t0 + dt.timedelta(seconds=1)),
        ("a", 1, "user", "same text", None, t0 + dt.timedelta(seconds=2)),
    ]
    src = os.path.join(tmp_work, "dd_src")
    out = os.path.join(tmp_work, "dd_out")
    ck = os.path.join(tmp_work, "ck_dedup_scoped")
    spark.createDataFrame(rows1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
        q = (
            stream_exact_dedup(
                stream, watermark="10 seconds", extra_key=["conv_id"]
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .option("path", out)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(out).collect()

    got1 = run_once()
    # same text in conv a twice -> one kept; conv b's copy kept too
    assert sorted((r.conv_id, r.turn_idx) for r in got1) == [("a", 0), ("b", 0)]

    # second batch: unrelated row 5 minutes on — advances the
    # watermark to ~t0+5m−10s, which EVICTS the "same text" state
    # (expiry is computed against the watermark at the NEXT batch)
    rows2 = [("c", 0, "user", "other text", None, t0 + dt.timedelta(minutes=5))]
    spark.createDataFrame(rows2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    # third batch: the conv-a duplicate again, long past the horizon —
    # its state is gone, so it re-emits (bounded state, by design)
    rows3 = [("a", 2, "user", "same text", None, t0 + dt.timedelta(minutes=10))]
    spark.createDataFrame(rows3, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got3 = run_once()
    assert ("a", 2) in {(r.conv_id, r.turn_idx) for r in got3}


def test_stream_exact_dedup_null_text_passes_through(spark, tmp_work):
    """NULL-fingerprint rows (text-less events) are NOT keyed together
    — each passes through; and a pre-existing _fp column is rejected."""
    import datetime as dt

    from hermes_spark.streaming.dedup import stream_exact_dedup

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("a", 0, "tool", None, "search", t0),
        ("b", 0, "tool", None, "fetch", t0 + dt.timedelta(seconds=1)),
        ("c", 0, "user", "real text", None, t0 + dt.timedelta(seconds=2)),
        ("d", 0, "user", "real text", None, t0 + dt.timedelta(seconds=3)),
    ]
    src = os.path.join(tmp_work, "nulldd_src")
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    got = _run_stream(
        spark,
        stream_exact_dedup(stream, watermark="1 hour"),
        os.path.join(tmp_work, "ck_nulldd"),
    ).collect()
    kept = sorted(r.conv_id for r in got)
    # both NULL-text rows kept; one of the two identical texts kept
    assert "a" in kept and "b" in kept and len(kept) == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="_fp"):
        stream_exact_dedup(stream.withColumn("_fp", F.lit("x")))
