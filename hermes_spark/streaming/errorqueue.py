"""Dead-letter queue with per-key ordering, FK dependency blocking and
enqueue-time compaction — the reference's error-queue machinery
(/root/reference/clients/errorqueue.py) as table operations.

Model: failed change events land in a dead-letter table
(key..., offset, op, payload..., err, enqueue_batch).  Retry passes
drain it in dependency order:

  1. candidates = oldest event per key (W3, errorqueue.py:611-641)
     minus keys that are FK-parents of other errored keys
     (errorqueue.py:700-711);
  2. the caller's apply function processes candidates; successes are
     removed, failures stay with an updated error;
  3. repeat while progress is made (the reference's multi-pass drain,
     clients/__init__.py:741-753).

Enqueue-time autoremediation: events for a key already in the queue
are compacted with the queued ones (first/last-state truth table —
``compact_events`` — the set-based restatement of pairwise
``_mergeEvents``, errorqueue.py:187-417).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.operators.compaction import compact_events
from hermes_spark.operators.ordering import unblocked_retry_candidates
from hermes_spark.tables import ParquetMergeTable


class DeadLetterQueue:
    def __init__(
        self,
        spark,
        path: str,
        key: Sequence[str],
        payload_schema: T.StructType,
        fk_map: Sequence[tuple[str, str]] | None = None,
    ) -> None:
        self.key = list(key)
        self.fk_map = list(fk_map or [])
        fields = (
            list(payload_schema.fields)
            + [
                T.StructField("offset", T.LongType(), False),
                T.StructField("op", T.StringType(), False),
                T.StructField("err", T.StringType(), True),
            ]
        )
        self.table = ParquetMergeTable(
            spark, path, key=self.key + ["offset"], schema=T.StructType(fields)
        )
        self.spark = spark

    def read(self) -> DataFrame:
        return self.table.read()

    def enqueue(
        self,
        failed: DataFrame,
        autoremediate: bool = True,
        field_level: bool = False,
        prior: DataFrame | None = None,
    ) -> None:
        """Append failed events; when a key already has queued events,
        compact the key's whole run to one effective event.

        ``field_level=True`` applies the reference's FULL ``_mergeEvents``
        semantics (errorqueue.py:187-417) instead of the op truth table:
        the payload schema must carry the four map columns
        (attrs, added, modified, removed), and ``prior`` (key → cached
        flat attrs map) finalizes removed+added runs into modified-diff
        events exactly like the reference reads its cache."""
        cur = self.read()
        fields = [f.name for f in self.table.schema.fields]
        merged = cur.unionByName(failed.select(*fields))
        if autoremediate and field_level:
            from hermes_spark.operators.eventmerge import compact_events_map

            # accept CDC op vocabulary too (insert/update/delete)
            tr = merged.withColumn(
                "op",
                F.when(F.col("op") == "insert", F.lit("added"))
                .when(F.col("op") == "update", F.lit("modified"))
                .when(F.col("op") == "delete", F.lit("removed"))
                .otherwise(F.col("op")),
            )
            folded = compact_events_map(
                tr, self.key, offset_col="offset", prior=prior
            )
            merged = folded.withColumn("err", F.lit(None).cast("string")).select(
                *[c for c in fields]
            )
        elif autoremediate:
            payload_cols = [
                c for c in fields if c not in (*self.key, "offset", "op")
            ]
            merged = compact_events(
                merged,
                self.key,
                op_col="op",
                offset_col="offset",
                payload_cols=payload_cols,
            ).select(*fields)
        self.table.overwrite(merged)

    def retry_candidates(self) -> DataFrame:
        return unblocked_retry_candidates(
            self.read(), self.key, parent_key_of=self.fk_map or None,
            order_col="offset",
        )

    def resolve(self, succeeded_keys: DataFrame) -> None:
        """Remove events whose key succeeded."""
        remaining = self.read().join(succeeded_keys, self.key, "left_anti")
        self.table.overwrite(remaining)

    def drain(
        self,
        apply_fn: Callable[[DataFrame], DataFrame],
        max_passes: int = 10,
    ) -> int:
        """Multi-pass dependency-ordered drain: each pass retries the
        unblocked head of every key; ``apply_fn`` returns the key rows
        that succeeded.  Stops when a pass makes no progress.  Returns
        rows remaining."""
        for _ in range(max_passes):
            cands = self.retry_candidates()
            if cands.isEmpty():
                break
            ok = apply_fn(cands).select(*self.key).distinct()
            n_ok = ok.count()
            if n_ok == 0:
                break
            self.resolve(ok)
        return self.read().count()
