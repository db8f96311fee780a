"""Benchmark harness — prints ONE JSON line.

Headline operator queries run at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; the streaming CDC
pipeline throughput (turns/sec, the BASELINE.json primary metric) runs
on a deterministic synthetic transcript stream.  Every query is forced
end-to-end with a noop sink (full materialization, no driver collect).

Output: {"metric": "...", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "cdc_turns_per_sec": N, "cdc_turns": N}
"""

from __future__ import annotations

import json
import os
import tempfile
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "cdc_diff",
    "merkle_events",
    "sessionize",
    "tumbling_hourly",
    "range_join",
    "star_join",
    "pricing_summary",
    "topk_per_group",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "ann_lsh",
]

CDC_BENCH_TURNS = int(os.environ.get("BENCH_CDC_TURNS", "1000000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_near_dup(spark, sf_dir: str) -> dict[str, float]:
    """The near-dup duo with the exact-pair ground truth computed ONCE
    and shared (round-2 verdict: 45 of 82 bench seconds were this pair
    of queries, half of it the same exact-Jaccard computation twice).
    Phases report separately: the two *operators* as a user runs them
    (exact pairs; LSH candidates + candidate-only verify) and the
    *verdict* comparison against the cached exact set."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from hermes_spark.functions.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    both = entrymod._docs_plus_noisy(spark, sf_dir)
    mdf = entrymod.MAX_DOC_FREQ
    out: dict[str, float] = {}

    t0 = time.monotonic()
    exact = (
        ngram_jaccard_pairs(both, threshold=0.8, max_doc_freq=mdf)
        .select("doc_a", "doc_b")
        .persist()
    )
    exact.count()
    out["ngram_jaccard"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    lsh = (
        minhash_dedup_pairs(both, verify_threshold=0.8, max_doc_freq=mdf)
        .select("doc_a", "doc_b")
        .persist()
    )
    lsh.count()
    out["minhash_lsh"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    on = ["doc_a", "doc_b"]
    missed = exact.join(lsh, on, "left_anti").count()
    fp = lsh.join(exact, on, "left_anti").count()
    n_exact = exact.count()
    assert fp == 0 and missed * 20 <= n_exact, (n_exact, missed, fp)
    out["minhash_verdict_vs_exact"] = round(time.monotonic() - t0, 3)
    exact.unpersist()
    lsh.unpersist()
    return out


#: cells whose best-of-N still exceeds this many seconds get ONE extra
#: rep (round-5 verdict item 7: the longest cells are the most
#: noise-exposed — min-of-2 was not enough for them when the driver's
#: run is contended, while short cells converge in 2)
SLOW_CELL_SEC = float(os.environ.get("BENCH_SLOW_CELL_SEC", "5"))


def bench_queries(spark, sf_dir: str, reps: int | None = None) -> dict[str, float]:
    """Min-of-N per cell (BENCH_QUERY_REPS, default 2): this VM shows
    sustained ~2× hypervisor-steal windows, and round 4 produced three
    +13-26% readings on queries whose plans had not changed — a single
    rep is a coin flip on the round-over-round comparison.  The CDC
    streaming cells adopted the same protocol in round 4; cells still
    reading >SLOW_CELL_SEC after min-of-N take a third rep (min-of-3)
    since round 6."""
    import __spark_entry__ as entrymod

    if reps is None:
        reps = int(os.environ.get("BENCH_QUERY_REPS", "2"))
    qs = entrymod.queries()
    out: dict[str, float] = {}
    # warm the JVM/codegen once on the cheapest query
    _force(qs["topk_per_group"](spark, sf_dir))
    for name in HEADLINE:
        if name in ("ngram_jaccard", "minhash_lsh"):
            continue  # measured with shared ground truth below
        best = float("inf")
        n = reps
        r = 0
        while r < n:
            t0 = time.monotonic()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.monotonic() - t0)
            r += 1
            if r == n and n == reps and reps > 1 and best > SLOW_CELL_SEC:
                n += 1  # slow cell → one extra rep
        out[name] = round(best, 3)
    runs = [bench_near_dup(spark, sf_dir) for _ in range(reps)]
    agg = {k: min(r[k] for r in runs) for k in runs[0]}
    if reps > 1 and any(v > SLOW_CELL_SEC for v in agg.values()):
        extra = bench_near_dup(spark, sf_dir)
        agg = {k: min(agg[k], extra[k]) for k in agg}
    out.update(agg)
    return out


def bench_candidate_telemetry(spark, sf_dir: str) -> dict[str, int]:
    """Candidate-volume telemetry for the near-dup family (untimed).
    Run at two scale factors, this grounds the 'survives 100× data'
    claims in MEASURED candidate-count growth — the scale risk of every
    bucketed near-dup operator is quadratic candidate blowup inside a
    bucket, which plan shapes alone cannot show."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from hermes_spark.functions.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash,
        simhash128,
        simhash128_near_pairs,
        simhash_near_pairs,
    )
    from hermes_spark.functions.similarity import cosine_neardup_pairs

    both = em._docs_plus_noisy(spark, sf_dir)
    mdf = em.MAX_DOC_FREQ
    out: dict[str, int] = {"docs": both.count()}
    out["ngram_exact_pairs"] = ngram_jaccard_pairs(
        both, threshold=0.8, max_doc_freq=mdf
    ).count()
    out["minhash_lsh_candidates"] = minhash_dedup_pairs(
        both, verify_threshold=None, max_doc_freq=mdf
    ).count()
    sig = simhash(both).persist()
    # max_hamming=64 makes the popcount filter vacuous → pure band-join
    # candidate volume
    out["simhash_band_candidates"] = simhash_near_pairs(
        sig, max_hamming=64
    ).count()
    out["simhash_pairs"] = simhash_near_pairs(sig).count()
    sig.unpersist()
    # the 128-bit scale path: same corpus, 32-bit bands — candidate
    # volume should collapse from ~n²/2^16 to ~n²/2^32
    sig128 = simhash128(both).persist()
    out["simhash128_band_candidates"] = simhash128_near_pairs(
        sig128, max_hamming=128
    ).count()
    sig128.unpersist()
    emb = em._t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        em._twin(F.col("embedding")).alias("embedding"),
    )
    eboth = emb.unionByName(twins)
    out["embed_vecs"] = eboth.count()
    # threshold=-1 keeps every candidate the bucket join generates
    out["embed_lsh_candidates"] = cosine_neardup_pairs(
        eboth, dim=64, threshold=-1.0, n_planes=12
    ).count()
    out["embed_neardup_pairs"] = cosine_neardup_pairs(
        eboth, dim=64, threshold=0.999, n_planes=12
    ).count()
    return out


def bench_streaming_cdc(spark, work: str, n_turns: int) -> dict[str, float]:
    """End-to-end streaming CDC turns/sec on a synthetic stream
    (~n_turns turns, skewed, with re-deliveries), 8 micro-batches."""
    from hermes_spark.fixtures import (
        TranscriptConfig,
        generate_change_batches,
        generate_transcripts,
    )
    from hermes_spark.schema import TRANSCRIPT_SCHEMA
    from hermes_spark.streaming.pipeline import CdcPipeline

    # ~20 turns/conv on average at these settings (zipf + 3 mega-convs)
    n_convs = max(200, n_turns // 20)
    cfg = TranscriptConfig(n_convs=n_convs, n_mega=3, mega_len=4000)
    base = generate_transcripts(cfg)
    batches = generate_change_batches(base, n_batches=8)
    total_turns = sum(len(b) for b in batches)

    src = os.path.join(work, "src")
    for b in batches:
        spark.createDataFrame(b, TRANSCRIPT_SCHEMA).repartition(64).write.mode(
            "append"
        ).parquet(src)

    # 64 files per append → 8 genuine micro-batches (sustained cadence,
    # not one mega-batch).  Each streaming cell runs BENCH_CDC_REPS
    # times (fresh checkpoints, same input) and reports min wall: this
    # VM shows sustained windows of ~2× hypervisor steal, so a single
    # rep is a coin flip on the round-over-round comparison.
    reps = int(os.environ.get("BENCH_CDC_REPS", "2"))
    from pyspark.sql import functions as F

    from hermes_spark.streaming.cdc_join import JoinCdcPipeline
    from hermes_spark.streaming.status import attach_status

    wall = jwall = owall = float("inf")
    for r in range(reps):
        pipe = CdcPipeline(
            spark, src, os.path.join(work, f"run{r}"),
            max_files_per_trigger=64, n_buckets=64,
        )
        t0 = time.monotonic()
        pipe.run_available()
        wall = min(wall, time.monotonic() - t0)

        jpipe = JoinCdcPipeline(
            spark, src, os.path.join(work, f"join_run{r}"),
            max_files_per_trigger=64,
        )
        t0 = time.monotonic()
        jpipe.run_available()
        jwall = min(jwall, time.monotonic() - t0)

        # operations-all-on cell: the same stream with every
        # operational feature live — validator + DLQ gating plan,
        # scheduled drain passes, in-stream compact+vacuum
        # (maintain_every), and the status listener.  The delta vs the
        # plain cell is the measured price of running maintenance and
        # the error-path plumbing inside the stream.
        opipe = CdcPipeline(
            spark, src, os.path.join(work, f"ops_run{r}"),
            max_files_per_trigger=64, n_buckets=64,
            validator=lambda df: ~F.col("text").startswith("\x00"),
            retry_every=4, maintain_every=4,
        )
        st = attach_status(opipe)
        t0 = time.monotonic()
        try:
            opipe.run_available()
        finally:
            spark.streams.removeListener(st.listener)
        owall = min(owall, time.monotonic() - t0)
    return {
        "cdc_turns": float(total_turns),
        "cdc_reps_min_wall": reps,
        "cdc_wall_sec": round(wall, 3),
        "cdc_turns_per_sec": round(total_turns / wall, 1),
        "cdc_join_wall_sec": round(jwall, 3),
        "cdc_join_turns_per_sec": round(total_turns / jwall, 1),
        "cdc_ops_wall_sec": round(owall, 3),
        "cdc_ops_turns_per_sec": round(total_turns / owall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from hermes_spark import build_session

    # scratch (shuffle files, RocksDB working dirs, checkpoints) on
    # tmpfs when available: profiled round 2, the single shared disk is
    # a non-scaling resource that pollutes the parallelism measurement
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    extra = {"spark.local.dir": os.path.join(shm, "hermes-spark-local")}
    spark = build_session(
        "hermes_spark_bench", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus), extra_conf=extra,
    )
    def _sf_of(d: str):
        return float(d.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in d else None

    try:
        queries = bench_queries(spark, sf_dir)
        work = os.path.join(shm, f"hermes-bench-{os.getpid()}")
        os.makedirs(work, exist_ok=True)
        try:
            cdc = bench_streaming_cdc(spark, work, CDC_BENCH_TURNS)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        total = round(sum(queries.values()) + cdc["cdc_wall_sec"], 3)
        extras: dict = {}
        # scaling-with-data curve: the same headline queries at a second
        # SF, plus candidate-count telemetry for the near-dup family at
        # both SFs (untimed — the curve is the evidence, set
        # SPARK_GRAFT_SECOND_SF_DIR="" to disable)
        second = os.environ.get(
            "SPARK_GRAFT_SECOND_SF_DIR", "/root/testdata/sf0.01"
        )
        if second and os.path.isdir(second) and second.rstrip("/") != sf_dir.rstrip("/"):
            extras["second"] = {
                "sf": _sf_of(second),
                # single-rep: the second-SF pass is a growth-curve datum,
                # not a cross-round comparison cell
                "queries": bench_queries(spark, second, reps=1),
            }
            extras["candidates"] = {
                str(_sf_of(second)): bench_candidate_telemetry(spark, second),
                str(_sf_of(sf_dir)): bench_candidate_telemetry(spark, sf_dir),
            }
        print(
            json.dumps(
                {
                    "metric": "e2e_headline_plus_cdc_stream_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": queries,
                    "sf": _sf_of(sf_dir),
                    **cdc,
                    **extras,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
