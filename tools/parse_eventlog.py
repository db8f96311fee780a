"""Aggregate a Spark event log into per-stage task-time totals.

Usage: python tools/parse_eventlog.py <eventlog-file-or-dir> [more...]
Prints one line per stage: tasks, wall-clock span, summed run/CPU/GC
time, shuffle bytes — the raw material for scaling-efficiency
attribution (which stage's summed task time inflates with parallelism).
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def parse(path: str) -> None:
    stages: dict = defaultdict(lambda: {
        "tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
        "ser_ms": 0, "deser_ms": 0,
        "sh_read_mb": 0.0, "sh_write_mb": 0.0,
        "first": None, "last": None, "name": "",
    })
    app = ""
    if path.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-d", "-c", path], capture_output=True, check=True
        ).stdout
        fh = io.StringIO(raw.decode("utf-8", errors="replace"))
    else:
        fh = open(path)
    with fh as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app = e.get("App Name", "")
            elif ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                stages[si["Stage ID"]]["name"] = si.get("Stage Name", "")
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                s = stages[sid]
                ti = e.get("Task Info", {})
                tm = e.get("Task Metrics") or {}
                s["tasks"] += 1
                s["run_ms"] += tm.get("Executor Run Time", 0)
                s["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["ser_ms"] += tm.get("Result Serialization Time", 0)
                s["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                s["sh_read_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                s["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                t0, t1 = ti.get("Launch Time"), ti.get("Finish Time")
                if t0:
                    s["first"] = t0 if s["first"] is None else min(s["first"], t0)
                if t1:
                    s["last"] = t1 if s["last"] is None else max(s["last"], t1)

    print(f"== {os.path.basename(path)}  app={app}")
    tot_run = tot_cpu = 0
    by_name: dict = defaultdict(lambda: [0, 0, 0, 0])
    for sid in sorted(stages):
        s = stages[sid]
        if not s["tasks"]:
            continue
        span = (s["last"] - s["first"]) / 1000 if s["first"] else 0
        nm = s["name"].split("\n")[0][:60]
        print(
            f"stage {sid:>3} tasks={s['tasks']:>3} span={span:6.1f}s "
            f"run={s['run_ms']/1000:7.1f}s cpu={s['cpu_ms']/1000:7.1f}s "
            f"gc={s['gc_ms']/1000:5.1f}s shR={s['sh_read_mb']:7.1f}MB "
            f"shW={s['sh_write_mb']:7.1f}MB  {nm}"
        )
        tot_run += s["run_ms"]
        tot_cpu += s["cpu_ms"]
        key = nm.split(" at ")[0]
        agg = by_name[key]
        agg[0] += s["tasks"]
        agg[1] += s["run_ms"]
        agg[2] += s["cpu_ms"]
        agg[3] += span
    print(f"TOTAL run={tot_run/1000:.1f}s cpu={tot_cpu/1000:.1f}s")
    print("-- by stage kind --")
    for k, (n, run, cpu, span) in sorted(by_name.items(), key=lambda x: -x[1][1]):
        print(f"  {k:<40} tasks={n:>4} run={run/1000:8.1f}s cpu={cpu/1000:8.1f}s span={span:7.1f}s")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        if os.path.isdir(arg):
            for fn in sorted(os.listdir(arg)):
                if not fn.startswith("."):
                    parse(os.path.join(arg, fn))
        else:
            parse(arg)
