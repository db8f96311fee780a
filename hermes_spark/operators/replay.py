"""Replay-window selection + step-resume — joining an existing bus.

Reference: a client that starts with no local state must not consume
the bus from offset 0; it bootstraps from the latest COMPLETE initsync
sequence (init_start … init_end marker events) and replays from there
(/root/reference/clients/__init__.py:831-874).  Partially-processed
events resume at the step they failed on, not from scratch
(clients/__init__.py:466-505).

Spark restatement:

* ``select_replay_window`` — two tiny aggregates over the (pruned)
  marker columns of the event log pick the window; the result feeds
  the source as a starting offset (Kafka ``startingOffsets`` / file
  source path filter).  O(markers) work: the scan prunes to
  (kind, offset), and markers are a vanishing fraction of the bus.
* ``StepwiseSink`` — a foreachBatch body made of named ordered steps
  with per-(batch, step) progress recorded in the commit log; a
  replayed batch re-runs only the steps that had not committed.  This
  is the reference's ``currentStep`` resume at micro-batch
  granularity (each Spark retry unit is a batch, not a row)."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hermes_spark.tables import ParquetMergeTable


def select_replay_window(
    log: DataFrame,
    kind_col: str = "kind",
    offset_col: str = "offset",
    start_mark: str = "init_start",
    end_mark: str = "init_end",
) -> tuple[int, int] | None:
    """Offsets (start, end) of the LATEST complete initsync sequence,
    or None when no complete sequence exists (caller must then request
    a full initsync, exactly like the reference)."""
    marks = log.select(F.col(kind_col).alias("k"), F.col(offset_col).alias("o"))
    row = (
        marks.agg(
            F.max(F.when(F.col("k") == end_mark, F.col("o"))).alias("end_o"),
        )
        .collect()[0]
    )
    if row["end_o"] is None:
        return None
    end_o = row["end_o"]
    start_row = (
        marks.where((F.col("k") == start_mark) & (F.col("o") < end_o))
        .agg(F.max("o").alias("start_o"))
        .collect()[0]
    )
    if start_row["start_o"] is None:
        return None
    return int(start_row["start_o"]), int(end_o)


class StepwiseSink:
    """foreachBatch body composed of ordered named steps with
    per-(batch, step) resume.

    ``steps``: ordered (name, fn) pairs; each fn(df, batch_id) must be
    idempotent *within* itself (it may re-run after a crash mid-step —
    same contract as the reference's per-step handlers).  Completed
    steps of a replayed batch are skipped via ``step`` audit records
    in the progress table's commit log (one appended line per step,
    crash-safe)."""

    def __init__(
        self,
        progress: ParquetMergeTable,
        steps: Sequence[tuple[str, Callable[[DataFrame, int], None]]],
    ) -> None:
        self.progress = progress
        self.steps = list(steps)

    def _done(self, batch_id: int) -> set[str]:
        return {
            r["info"]["step"]
            for r in self.progress._read_log()
            if r.get("kind") == "step" and r.get("batch_id") == batch_id
        }

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        done = self._done(batch_id)
        for name, fn in self.steps:
            if name in done:
                continue  # resume-at-step: this one already committed
            fn(df, batch_id)
            self.progress._append_record(
                {"kind": "step", "batch_id": batch_id, "info": {"step": name}}
            )
