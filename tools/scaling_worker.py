"""spark-submit worker for the two-parallelism scaling benchmark.

Run via:  spark-submit --master local[N] --py-files hermes_spark.zip \
              tools/scaling_worker.py <src_dir> <work_dir> <shuffle_partitions>

The master comes from spark-submit (the cluster-size axis); everything
else — input, watermark, shuffle partitioning, micro-batch size — is
identical between runs, so the throughput ratio isolates parallelism.
Prints one JSON line: {"master", "turns", "wall_sec", "tps"}.
"""

import json
import os
import sys
import time

from hermes_spark import build_session
from hermes_spark.streaming.pipeline import CdcPipeline


def main() -> None:
    src, work, nshuffle = sys.argv[1], sys.argv[2], int(sys.argv[3])
    extra = {}
    elog = os.environ.get("HERMES_EVENTLOG_DIR")
    if elog:
        os.makedirs(elog, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": elog}
    spark = build_session(
        "hermes_scaling", master="inherit", shuffle_partitions=nshuffle,
        extra_conf=extra,
    )
    total = spark.read.parquet(src).count()
    n_buckets = int(os.environ.get("HERMES_N_BUCKETS", "0")) or None
    mft = int(os.environ.get("HERMES_FILES_PER_TRIGGER", "64"))
    if os.environ.get("HERMES_MODE") == "join":
        from hermes_spark.streaming.cdc_join import JoinCdcPipeline

        pipe = JoinCdcPipeline(
            spark, src, work, max_files_per_trigger=mft,
            **({"n_buckets": n_buckets} if n_buckets else {}),
        )
    else:
        pipe = CdcPipeline(
            spark, src, work, max_files_per_trigger=mft,
            **({"n_buckets": n_buckets} if n_buckets else {}),
        )
    t0 = time.monotonic()
    q = pipe.start()
    q.processAllAvailable()
    progress = [
        {
            "batch": p.batchId,
            **{k: int(v) for k, v in p.durationMs.items()},
            "rows": int(p.numInputRows),
        }
        for p in q.recentProgress
    ]
    q.stop()
    try:
        q.awaitTermination(30)
    except Exception:
        pass
    wall = time.monotonic() - t0
    out_rows = pipe.target_live().count()
    print(
        "SCALING_RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.master,
                "turns": total,
                "target_rows": out_rows,
                "wall_sec": round(wall, 2),
                "tps": round(total / wall, 1),
                "batches": progress,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
