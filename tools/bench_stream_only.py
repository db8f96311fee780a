"""Run ONLY the streaming CDC bench cells (plain / join / ops) and
print the one-line JSON — for iterating on sink/pipeline overhead
without paying for the query cells."""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CDC_BENCH_TURNS, bench_streaming_cdc  # noqa: E402
from hermes_spark import build_session  # noqa: E402


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    extra = {"spark.local.dir": os.path.join(shm, "hermes-spark-local")}
    spark = build_session(
        "hermes_spark_bench_stream", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus), extra_conf=extra,
    )
    work = os.path.join(shm, f"hermes-bench-stream-{os.getpid()}")
    os.makedirs(work, exist_ok=True)
    try:
        out = bench_streaming_cdc(spark, work, CDC_BENCH_TURNS)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
