"""Host scaling ceiling probe: how much speedup can ANY workload get
from N→4N processes on this machine?

Runs two workload shapes at several process counts and reports the
N→4N ratio for each:

* ``reg``  — register-only arithmetic (no memory traffic): the pure
  CPU ceiling (hypervisor steal + scheduling only).
* ``mem``  — allocate-and-touch numpy arrays: the shared-memory-
  bandwidth ceiling (what byte-churning pipelines see).

The streaming CDC job can never scale better than these; SCALING.json
cites this probe when attributing the gap between measured pipeline
efficiency and 1.0.  Usage: python tools/cpu_probe.py [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def reg_work(n: int) -> float:
    x = 1.0
    for _ in range(n):
        x = x * 1.0000001 + 0.1
    return x


def mem_work(n: int) -> int:
    total = 0
    for _ in range(n):
        a = np.arange(2_000_000, dtype=np.int64)  # 16 MB alloc + touch
        total += int(a[::4096].sum() & 0xFF)
    return total


def bench(fn, arg, procs: int, jobs: int) -> float:
    t0 = time.monotonic()
    with mp.Pool(procs) as p:
        p.map(fn, [arg] * jobs)
    return time.monotonic() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = (2, 4, 8, 16)
    out: dict = {"levels": list(levels), "reps_min": reps}
    for kind, fn, arg in (("reg", reg_work, 3_000_000), ("mem", mem_work, 8)):
        walls = {
            n: min(bench(fn, arg, n, 64) for _ in range(reps)) for n in levels
        }
        out[kind] = {
            "wall_sec": {str(n): round(w, 3) for n, w in walls.items()},
            "eff_2_to_8": round(walls[2] / walls[8] / 4, 3),
            "eff_4_to_16": round(walls[4] / walls[16] / 4, 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
