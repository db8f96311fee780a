"""Exactly-once sink: foreachBatch → idempotent MERGE + lineage metrics.

Reference anchors: the producer's synchronous ack with abort-and-retry
(at-least-once delivery made effectively-once by content dedup,
/root/reference/server/hermesserver.py:697-711), the client's
per-event offset commit (clients/__init__.py:113-120, 913-955), and the
write-if-changed atomic cache snapshot (lib/datamodel/serialization.py:
373-510).

Spark restatement: Structured Streaming replays an uncommitted
micro-batch after restart with the *same* batch_id; the sink MERGE is
keyed on (batch_id, pkey) — `ParquetMergeTable.merge` records batch_id
in its atomic commit log and no-ops on replay, yielding end-to-end
exactly-once on top of at-least-once delivery, the same trick as the
reference's content-dedup but transactional.

Per-batch lineage/metrics (the reference's diff counters + per-phase
timings surfaced over CLI/status, hermesserver.py:584-616,
dataobjectlist.py:313-321): a metrics table keyed
(batch_id, partition_id, op) with row counts and wall ms, appended in
the same foreachBatch (replay-safe: recomputed rows for an already-
committed batch are skipped together with the MERGE).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.operators.ordering import with_apply_order
from hermes_spark.tables import ParquetMergeTable

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)


def _latest_change_per_key(changes: DataFrame, key: list[str]) -> DataFrame:
    """Within one micro-batch, MERGE must see at most one row per key —
    keep the newest classification (max ts, then op rank so a delete
    re-delivered after an update wins deterministically)."""
    ordered = with_apply_order(changes)
    return (
        ordered.groupBy(*key)
        .agg(
            F.max_by(
                F.struct(*[c for c in ordered.columns if c not in key]),
                F.struct(F.col("ts"), F.col("_op_rank")),
            ).alias("_last")
        )
        .select(*key, "_last.*")
        .drop("_op_rank")
    )


class ExactlyOnceSink:
    """foreachBatch body: dedupe → deterministic order → idempotent
    MERGE → lineage metrics."""

    def __init__(
        self,
        target: ParquetMergeTable,
        metrics_dir: str | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        assume_unique_keys: bool = True,
    ) -> None:
        self.target = target
        self.metrics_dir = metrics_dir or os.path.join(target.path, "_metrics")
        self.transform = transform
        # the stateful classifier emits at most one compacted event per
        # key per batch, so the per-batch dedupe shuffle is skipped by
        # default; pass False when feeding raw (unclassified) changes.
        self.assume_unique_keys = assume_unique_keys

    def __call__(self, changes: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        spark = changes.sparkSession
        if batch_id in self.target.committed_batch_ids():
            return  # replayed batch — exactly-once no-op
        if self.transform is not None:
            changes = self.transform(changes)
        if self.assume_unique_keys:
            batch = changes.cache()
        else:
            batch = _latest_change_per_key(changes, self.target.key).cache()
        try:
            # lineage: per (partition, op) row counts of this batch
            lineage = (
                batch.withColumn("partition_id", F.spark_partition_id())
                .groupBy("partition_id", "op")
                .agg(F.count(F.lit(1)).cast("long").alias("rows"))
                .collect()
            )
            self.target.merge(batch, batch_id=batch_id)
            wall_ms = int((time.monotonic() - t0) * 1000)
            rows = [
                (int(batch_id), int(r["partition_id"]), r["op"], int(r["rows"]), wall_ms)
                for r in lineage
            ] or [(int(batch_id), None, None, 0, wall_ms)]
            spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(self.metrics_dir)
        finally:
            batch.unpersist()

    def metrics(self) -> DataFrame | None:
        spark = self.target.spark
        try:
            return spark.read.schema(METRICS_SCHEMA).parquet(self.metrics_dir)
        except Exception:
            return None
