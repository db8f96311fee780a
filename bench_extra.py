"""Extra measurement harness for the optimization round (guide §1).

NOT the frozen driver bench (bench.py) — this isolates individual
declared queries with the noop sink, reports per-cell seconds, and can
dump `.explain("formatted")` plans to plans/<tag>/<query>_{before,after}.txt.

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--plans-dir plans/r07 --plan-suffix before] [query ...]

Defaults: sf dir from $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1,
reps 1, all headline queries.  Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "cdc_diff", "merkle_events", "sessionize", "tumbling_hourly",
    "range_join", "star_join", "pricing_summary", "topk_per_group",
    "exact_dedup", "ngram_jaccard", "minhash_lsh", "simhash",
    "cosine_topk", "ann_lsh",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from hermes_spark import build_session

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": os.path.join(shm, "hermes-spark-local")} if shm else {}
    spark = build_session(
        "hermes_spark_bench_extra", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus), extra_conf=extra,
    )
    qs = entrymod.queries()
    names = args.queries or DEFAULT_QUERIES
    out: dict[str, float] = {}
    try:
        # one warmup on a cheap query (JVM/codegen warm, parquet footer cache)
        qs["topk_per_group"](spark, args.sf).write.format("noop").mode("overwrite").save()
        for name in names:
            df = qs[name](spark, args.sf)
            if args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans_dir, f"{name}_{args.plan_suffix}.txt"), "w") as f:
                    f.write(plan)
            best = float("inf")
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
                spark.sparkContext.setJobDescription(None)
            out[name] = round(best, 3)
            print(f"  {name}: {out[name]}s", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
