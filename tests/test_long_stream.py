"""Long-stream behavior: per-batch driver cost must stay flat.

Round 1's commit log rewrote the whole JSON array per commit (O(n²)
driver bytes over a stream) and ran full-table compaction inside
foreachBatch.  The JSONL append-only log + out-of-band compaction make
per-commit driver work O(1); these tests pin that down."""

from __future__ import annotations

import time

from pyspark.sql import types as T

from hermes_spark.tables import ParquetMergeTable, scratch_dir

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def test_commit_log_flat_over_thousands_of_commits(spark):
    """Driver-side log ops (append, replay-check, annotate) at commit
    5000 must cost the same as at commit 1 — no O(n) rewrite."""
    work = scratch_dir("longlog")
    t = ParquetMergeTable(spark, work + "/t", key=["id"], schema=SCHEMA)

    def commit_block(start: int, n: int) -> float:
        t0 = time.monotonic()
        for i in range(start, start + n):
            assert i not in t.committed_batch_ids()
            t._append_commit(version=i + 1, batch_id=i, kind="delta")
            t.annotate_commit(i + 1, {"rows": 1})
        return time.monotonic() - t0

    first = commit_block(0, 500)
    for s in range(500, 4500, 500):
        commit_block(s, 500)
    last = commit_block(4500, 500)

    assert len(t.committed_batch_ids()) == 5000
    # flat within noise: last block may not cost more than 3x the first
    assert last < max(3 * first, first + 0.5), (first, last)
    t.drop()


def test_merge_stream_100_batches_flat(spark):
    """100 real MERGE commits: no in-loop compaction, wall per batch
    flat (merge itself is O(batch): one delta write + one log line)."""
    work = scratch_dir("longmerge")
    t = ParquetMergeTable(
        spark, work + "/t", key=["id"], schema=SCHEMA, compact_every=None
    )
    df = spark.createDataFrame([(1, "insert", "x")], SCHEMA).coalesce(1)
    df.cache()
    df.count()

    def run_block(start: int, n: int) -> float:
        t0 = time.monotonic()
        for i in range(start, start + n):
            assert t.merge(df, batch_id=i) is not None
        return time.monotonic() - t0

    first = run_block(0, 20)
    run_block(20, 60)
    last = run_block(80, 20)

    commits = t._read_commits()
    assert len([c for c in commits if c["kind"] == "delta"]) == 100
    # replay of an early batch is still a no-op after 100 commits
    assert t.merge(df, batch_id=0) is None
    # flat per-batch driver+job time (generous noise bound)
    assert last < 3 * first + 1.0, (first, last)

    # out-of-band compaction still folds the log when invoked explicitly
    t.compact()
    assert t.read().count() == 1
    t.drop()


def test_disk_bounded_with_periodic_maintenance(spark):
    """Over a long stream with periodic maintain() (compact+vacuum),
    on-disk bytes must stay O(live state) — bounded by a constant
    multiple of a single snapshot — instead of O(total data ever
    written) (round-3 verdict: versions/v* grew forever)."""
    import os

    work = scratch_dir("longdisk")
    t = ParquetMergeTable(
        spark, work + "/t", key=["id"], schema=SCHEMA, compact_every=None
    )

    def disk_bytes() -> int:
        total = 0
        for root, _d, files in os.walk(work + "/t/versions"):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    sizes = []
    for b in range(60):
        df = spark.createDataFrame(
            [(b % 7, "insert", f"v{b}")], SCHEMA
        ).coalesce(1)
        t.merge(df, batch_id=b)
        if b % 10 == 9:
            t.compact()
            t.vacuum()
            sizes.append(disk_bytes())

    # live state is 7 keys forever; post-maintenance footprint must be
    # flat (not growing with batches written)
    assert sizes[-1] <= 2 * sizes[0], sizes
    assert t.read().count() == 7
    # replay ledger survived all the vacuums
    assert t.merge(
        spark.createDataFrame([(0, "insert", "x")], SCHEMA), batch_id=0
    ) is None
    t.drop()
