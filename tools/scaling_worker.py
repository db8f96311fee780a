"""spark-submit worker for the two-parallelism scaling benchmark.

Run via:  spark-submit --master local[N] --py-files hermes_spark.zip \
              tools/scaling_worker.py <src_dir> <work_dir> <shuffle_partitions>

The master comes from spark-submit (the cluster-size axis); everything
else — input, watermark, shuffle partitioning, micro-batch size — is
identical between runs, so the throughput ratio isolates parallelism.
Prints one JSON line: {"master", "turns", "wall_sec", "tps"}.
"""

import json
import sys
import time

from hermes_spark import build_session
from hermes_spark.streaming.pipeline import CdcPipeline


def main() -> None:
    src, work, nshuffle = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = build_session("hermes_scaling", master="inherit", shuffle_partitions=nshuffle)
    total = spark.read.parquet(src).count()
    pipe = CdcPipeline(spark, src, work, max_files_per_trigger=64)
    t0 = time.monotonic()
    pipe.run_available()
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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
