"""Replay-window selection + step-resume (reference
clients/__init__.py:831-874 and 466-505)."""

from __future__ import annotations

from pyspark.sql import types as T

from hermes_spark.operators.replay import StepwiseSink, select_replay_window
from hermes_spark.tables import ParquetMergeTable, scratch_dir

LOG_SCHEMA = "kind string, offset long"


def test_select_latest_complete_initsync(spark):
    log = spark.createDataFrame(
        [
            ("init_start", 0), ("event", 1), ("init_end", 2),   # complete #1
            ("event", 3),
            ("init_start", 10), ("event", 11), ("init_end", 14),  # complete #2
            ("event", 15),
            ("init_start", 20), ("event", 21),                  # INCOMPLETE tail
        ],
        LOG_SCHEMA,
    )
    # latest COMPLETE sequence is (10, 14); the trailing incomplete one
    # is ignored (the reference waits for a complete initsync)
    assert select_replay_window(log) == (10, 14)


def test_select_replay_window_none_when_incomplete(spark):
    log = spark.createDataFrame(
        [("event", 0), ("init_start", 1), ("event", 2)], LOG_SCHEMA
    )
    assert select_replay_window(log) is None
    empty = spark.createDataFrame([], LOG_SCHEMA)
    assert select_replay_window(empty) is None


def test_stepwise_sink_resumes_at_failed_step(spark):
    work = scratch_dir("steps")
    schema = T.StructType([T.StructField("id", T.IntegerType(), False)])
    progress = ParquetMergeTable(spark, work + "/p", key=["id"], schema=schema)

    calls: list[str] = []
    boom = {"armed": True}

    def step_a(df, bid):
        calls.append(f"a{bid}")

    def step_b(df, bid):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("crash mid-batch, after step a committed")
        calls.append(f"b{bid}")

    def step_c(df, bid):
        calls.append(f"c{bid}")

    sink = StepwiseSink(progress, [("a", step_a), ("b", step_b), ("c", step_c)])
    df = spark.createDataFrame([(1,)], schema)

    try:
        sink(df, batch_id=7)
    except RuntimeError:
        pass
    assert calls == ["a7"]

    # replay of the same batch (Spark restart semantics): step a is
    # skipped, b and c run
    sink(df, batch_id=7)
    assert calls == ["a7", "b7", "c7"]

    # a fresh batch runs everything
    sink(df, batch_id=8)
    assert calls == ["a7", "b7", "c7", "a8", "b8", "c8"]
    progress.drop()
