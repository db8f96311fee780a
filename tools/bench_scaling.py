"""Two-cluster-size scaling benchmark (BASELINE.md protocol).

Generates one deterministic transcript stream, then runs the identical
streaming CDC job twice via real ``spark-submit --py-files`` — at
``--master local[8]`` and ``--master local[32]`` — and reports
throughput at both plus scaling efficiency (tps_32/tps_8)/4.

Usage: python tools/bench_scaling.py [n_turns≈] [out_json]
Writes benchout/SCALING.json and prints the result JSON.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "hermes_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def prepare_input(work: str, n_turns: int) -> tuple[str, int]:
    from hermes_spark import build_session
    from hermes_spark.fixtures import (
        TranscriptConfig,
        generate_change_batches,
        generate_transcripts,
    )
    from hermes_spark.schema import TRANSCRIPT_SCHEMA

    src = os.path.join(work, "src")
    spark = build_session("scaling_gen", master="local[32]", shuffle_partitions=32)
    # ~35 turns/conv at default zipf settings
    base = generate_transcripts(
        TranscriptConfig(n_convs=max(200, n_turns // 35), n_mega=3, mega_len=4000)
    )
    batches = generate_change_batches(base, n_batches=8)
    total = sum(len(b) for b in batches)
    for b in batches:
        spark.createDataFrame(b, TRANSCRIPT_SCHEMA).repartition(64).write.mode(
            "append"
        ).parquet(src)
    spark.stop()
    return src, total


def run_one(master: str, src: str, work: str, zip_path: str) -> dict:
    env = dict(os.environ)
    cmd = [
        "spark-submit",
        "--master", master,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=16g",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_worker.py"),
        src, work, "64",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    m = re.search(r"SCALING_RESULT (\{.*\})", p.stdout + p.stderr)
    if not m:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"no result from {master}")
    return json.loads(m.group(1))


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "benchout", "SCALING.json")
    work = "/tmp/hermes-scaling"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    zip_path = os.path.join(work, "hermes_spark.zip")
    make_zip(zip_path)
    src, total = prepare_input(work, n_turns)
    print(f"input ready: {total} turns", flush=True)

    r8 = run_one("local[8]", src, os.path.join(work, "run8"), zip_path)
    print("local[8]:", r8, flush=True)
    r32 = run_one("local[32]", src, os.path.join(work, "run32"), zip_path)
    print("local[32]:", r32, flush=True)

    assert r8["target_rows"] == r32["target_rows"], "outputs diverge across parallelism"
    eff = (r32["tps"] / r8["tps"]) / 4.0
    result = {
        "job": "streaming CDC pipeline (classify + exactly-once MERGE sink)",
        "turns": total,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "criterion": "(tps_32/tps_8)/4 >= 0.8",
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
