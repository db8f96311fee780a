"""Serial-term amortization sweep (round-3: retake 4→16 scaling).

Round 2 fitted the stateful pipeline's per-batch cost as
T(n) = 1.58 + 21.6/n s/batch: a ~1.6 s serial term per micro-batch
(state-store commit awaits, source listing, offset WAL) that flattens
the 4→16 curve when batches are small.  A 10^12-turn stream runs
micro-batches of tens of millions of turns, where that term is noise —
this sweep demonstrates the amortization empirically by running the
SAME total input at several micro-batch sizes (maxFilesPerTrigger) and
input-file granularities, at local[4] and local[16], interleaved reps,
min wall per cell.

Usage: python tools/amortization_sweep.py [n_turns] [reps] [out_json]
Writes benchout/AMORTIZATION.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import make_zip, prepare_input, run_one  # noqa: E402

LEVELS = (4, 16)
if os.environ.get("AMORT_LEVELS"):  # e.g. "2,8" for the other N→4N pair
    LEVELS = tuple(int(x) for x in os.environ["AMORT_LEVELS"].split(","))
# (plan name, input files per change-batch, maxFilesPerTrigger) — the
# generator emits 8 change-batches, so n_micro_batches = 8*fpb/mft.
# A pilot sweep at 1.58M turns showed bigger batches lift ABSOLUTE
# throughput at every level (b8→b1: 31k→84k tps at local[4], 59k→116k
# at local[16]) but the e2e ratio stays fixed-cost-dominated at that
# input size — so the curve is measured at ~6M turns where the
# scalable work dominates the wall.
PLANS = [
    ("b8", 64, 64),    # 8 micro-batches (round-2 protocol shape)
    ("b2", 64, 256),   # 2 big micro-batches
    ("b1", 64, 512),   # 1 micro-batch = the whole input
]
if os.environ.get("AMORT_PLANS"):  # e.g. "b2" for the big-batch point
    keep = set(os.environ["AMORT_PLANS"].split(","))
    PLANS = [p for p in PLANS if p[0] in keep]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_800_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "benchout", "AMORTIZATION.json")
    )
    work = "/dev/shm/hermes-amort"
    os.makedirs(work, exist_ok=True)
    zip_path = os.path.join(work, "hermes_spark.zip")
    make_zip(zip_path)
    raw_dir = os.path.join(work, "raw")
    os.makedirs(raw_dir, exist_ok=True)

    srcs: dict[int, tuple[str, int]] = {}
    for fpb in sorted({p[1] for p in PLANS}):
        sub = os.path.join(work, f"in{fpb}")
        src = os.path.join(sub, "src")
        if os.path.isdir(src):  # reuse an input from a prior invocation
            from hermes_spark import build_session
            sp = build_session("amort_count", master="local[8]")
            srcs[fpb] = (src, sp.read.parquet(src).count())
            sp.stop()
        else:
            os.makedirs(sub, exist_ok=True)
            srcs[fpb] = prepare_input(sub, n_turns, files_per_batch=fpb)
        print(f"input fpb={fpb}: {srcs[fpb][1]} turns", flush=True)

    runs: dict[tuple[str, int], list[dict]] = {}
    run_id = 0
    for rep in range(reps):
        for name, fpb, mft in PLANS:
            for n in LEVELS:
                src, total = srcs[fpb]
                os.environ["HERMES_FILES_PER_TRIGGER"] = str(mft)
                os.environ["HERMES_N_BUCKETS"] = "64"
                wdir = os.path.join(work, f"run{run_id}")
                run_id += 1
                r = run_one(f"local[{n}]", src, wdir, zip_path)
                shutil.rmtree(wdir, ignore_errors=True)
                r["total"] = total
                # persist the full per-run record (incl. per-batch
                # triggerExecution) for steady-state folding
                with open(os.path.join(
                        raw_dir, f"{name}-n{n}-r{rep}.json"), "w") as fh:
                    json.dump(r, fh)
                runs.setdefault((name, n), []).append(r)
                print(
                    f"rep{rep} {name} local[{n}]: wall={r['wall_sec']} "
                    f"tps={r['tps']} batches={len(r['batches'])}",
                    flush=True,
                )

    cells = {}
    curve = []
    for name, fpb, mft in PLANS:
        row = {"plan": name, "input_files_per_batch": fpb,
               "max_files_per_trigger": mft}
        for n in LEVELS:
            rs = runs[(name, n)]
            best = min(rs, key=lambda r: r["wall_sec"])
            steady = [
                b["triggerExecution"] / 1000.0
                for b in best["batches"]
                if b["batch"] > 0 and b.get("rows")
            ]
            row[f"local{n}"] = {
                "wall_sec_min": best["wall_sec"],
                "tps": best["tps"],
                "n_micro_batches": len(best["batches"]),
                "steady_batch_sec": round(sum(steady) / len(steady), 2)
                if steady else None,
                "all_walls": sorted(r["wall_sec"] for r in rs),
            }
        lo, hi = row[f"local{LEVELS[0]}"], row[f"local{LEVELS[1]}"]
        ek = f"eff_{LEVELS[0]}_to_{LEVELS[1]}"
        row[ek] = round(
            (hi["tps"] / lo["tps"]) / (LEVELS[1] / LEVELS[0]), 3
        )
        if lo["steady_batch_sec"] and hi["steady_batch_sec"]:
            row[ek + "_steady_state"] = round(
                (lo["steady_batch_sec"] / hi["steady_batch_sec"])
                / (LEVELS[1] / LEVELS[0]), 3
            )
        cells[name] = row
        curve.append(
            {
                "n_micro_batches": lo["n_micro_batches"],
                "plan": name,
                ek: row[ek],
            }
        )

    result = {
        "protocol": (
            "same total input per cell; levels interleaved per rep; min "
            "wall over reps; tmpfs scratch; spark-submit --py-files; "
            "n_buckets=64, 64 shuffle partitions"
        ),
        "turns": srcs[64][1],
        "reps": reps,
        "cells": cells,
        "amortization_curve": sorted(
            curve, key=lambda c: -c["n_micro_batches"]
        ),
        "reading": (
            "eff_4_to_16 vs micro-batch count: the per-batch serial term "
            "(state-store commits, listing, offset WAL) divides out as "
            "batches grow — the 10^12-turn regime runs far bigger batches "
            "than the round-2 protocol's 8x354k"
        ),
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
