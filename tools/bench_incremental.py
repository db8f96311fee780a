"""Incremental-vs-recompute dedup cost at sf0.1.

Feeds the documents corpus in K equal batches through
``incremental_minhash_dedup`` (persisted signature store) and, for
comparison, re-runs the batch ``minhash_dedup_pairs`` over the
CUMULATIVE corpus at each step — the cost a pipeline pays without the
store.  Prints one JSON line with per-step walls; the claim under
test: incremental marginal cost stays ~flat while recompute grows
with corpus size (the 100 TB argument for the signature store).

Usage: python tools/bench_incremental.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from hermes_spark import build_session
    from hermes_spark.functions.dedup import minhash_dedup_pairs
    from hermes_spark.functions.incremental import incremental_minhash_dedup

    spark = build_session(
        "bench-incremental", master="local[16]", shuffle_partitions=32
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    per = (n + k - 1) // k

    work = tempfile.mkdtemp(prefix="inc-bench-")
    store = os.path.join(work, "sigs")
    inc_walls, rec_walls, kept = [], [], 0
    try:
        for i in range(k):
            lo, hi = i * per, min((i + 1) * per, n)
            batch = docs.where(
                (docs.doc_id >= lo) & (docs.doc_id < hi)
            ).cache()
            batch.count()

            t = time.time()
            surv = incremental_minhash_dedup(spark, batch, store)
            kept += surv.count()
            inc_walls.append(round(time.time() - t, 3))

            cumulative = docs.where(docs.doc_id < hi)
            t = time.time()
            minhash_dedup_pairs(cumulative, verify_threshold=0.8).count()
            rec_walls.append(round(time.time() - t, 3))
            batch.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "incremental_vs_recompute_dedup",
        "sf_dir": sf_dir,
        "n_docs": n,
        "n_batches": k,
        "incremental_per_batch_sec": inc_walls,
        "recompute_cumulative_sec": rec_walls,
        "incremental_total_sec": round(sum(inc_walls), 3),
        "recompute_total_sec": round(sum(rec_walls), 3),
        "kept": kept,
        "inc_last_over_first": round(inc_walls[-1] / inc_walls[0], 2),
        "rec_last_over_first": round(rec_walls[-1] / rec_walls[0], 2),
    }))


if __name__ == "__main__":
    main()
