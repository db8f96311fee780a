"""One-shot profiling run of the PLAIN streaming CDC cell with the
Spark event log on — attributes the trigger wall between stages (task
time) and driver gaps (micro-batch planning/commit).  Measurement
tooling only; not part of the frozen bench.

Usage: python tools/prof_cdc.py [--turns 1000000] [--reps 1]
Prints wall seconds and the event-log path for tools/parse_eventlog.py.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from hermes_spark import build_session
    from hermes_spark.fixtures import (
        TranscriptConfig,
        generate_change_batches,
        generate_transcripts,
    )
    from hermes_spark.schema import TRANSCRIPT_SCHEMA
    from hermes_spark.streaming.pipeline import CdcPipeline

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    evdir = os.path.join(shm, f"cdc-eventlog-{os.getpid()}")
    os.makedirs(evdir, exist_ok=True)
    extra = {
        "spark.local.dir": os.path.join(shm, "hermes-spark-local"),
    }
    if os.environ.get("PROF_CDC_EVENTLOG", "1") == "1":
        extra.update({
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        })
    # ad-hoc conf experiments: PROF_CDC_CONF="k=v;k2=v2"
    for kv in filter(None, os.environ.get("PROF_CDC_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = build_session(
        "cdc_prof", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus), extra_conf=extra,
    )
    work = os.path.join(shm, f"cdc-prof-{os.getpid()}")
    os.makedirs(work, exist_ok=True)
    try:
        n_convs = max(200, args.turns // 20)
        cfg = TranscriptConfig(n_convs=n_convs, n_mega=3, mega_len=4000)
        base = generate_transcripts(cfg)
        batches = generate_change_batches(base, n_batches=8)
        total = sum(len(b) for b in batches)
        src = os.path.join(work, "src")
        for b in batches:
            spark.createDataFrame(b, TRANSCRIPT_SCHEMA).repartition(64) \
                .write.mode("append").parquet(src)
        walls = []
        for r in range(args.reps):
            pipe = CdcPipeline(
                spark, src, os.path.join(work, f"run{r}"),
                max_files_per_trigger=64, n_buckets=64,
            )
            t0 = time.monotonic()
            pipe.run_available()
            walls.append(round(time.monotonic() - t0, 3))
        print({"turns": total, "walls": walls, "eventlog": evdir})
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
