"""Measure aggregate DRAM read bandwidth vs active-core count.

Purpose (VERDICT r2 #5): back the scaling-gate protocol with a number.
The 2→8-core pair is the primary N→4N proxy because all local cores
share ONE memory subsystem; the claim is that the 4→16 strong-scaling
deficit (~0.67) is a shared-DRAM ceiling a real 4N-node cluster (4× the
memory channels) does not have. If aggregate achievable bandwidth
plateaus well below 16× the single-core figure, a memory-bound stage
physically cannot scale 4→16 on this box regardless of code quality —
while the same job on 4× separately-provisioned nodes scales its
bandwidth 4×.

Protocol: P pinned worker processes (cores 0..P-1), each repeatedly
streaming a private 256 MiB float64 array through ``np.sum`` (pure
sequential reads, no allocator traffic in the loop). Aggregate GB/s =
P × passes × bytes / slowest-worker wall. Workers barrier-start so the
window is fully overlapped.

    python tools/membw_probe.py [--threads 1,2,4,8,16,32] [--mb 256]
                                [--passes 8] [--rounds 3]

Writes BENCH/membw.json; per-level maxima over rounds (transient host
load only ever lowers a sample).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(core: int, mb: int, passes: int, barrier, out):
    os.sched_setaffinity(0, {core})
    n = mb * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    float(a.sum())  # fault pages in before timing
    barrier.wait()
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(passes):
        s += float(a.sum())
    dt = time.perf_counter() - t0
    out.put((core, dt, s))


def measure(threads: int, mb: int, passes: int) -> dict:
    barrier = mp.Barrier(threads)
    out: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(c, mb, passes, barrier, out))
        for c in range(threads)
    ]
    for p in procs:
        p.start()
    walls = [out.get()[1] for _ in procs]
    for p in procs:
        p.join()
    bytes_each = mb * 1024 * 1024 * passes
    wall = max(walls)
    return {
        "threads": threads,
        "wall_sec": round(wall, 3),
        "aggregate_gb_s": round(threads * bytes_each / wall / 1e9, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,2,4,8,16,32")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    levels = [int(x) for x in args.threads.split(",")]
    best: dict[int, dict] = {}
    for _ in range(args.rounds):
        for t in levels:
            r = measure(t, args.mb, args.passes)
            print(json.dumps(r), flush=True)
            if (
                t not in best
                or r["aggregate_gb_s"] > best[t]["aggregate_gb_s"]
            ):
                best[t] = r
    base = best[levels[0]]["aggregate_gb_s"]
    summary = {
        "levels": [best[t] | {"speedup_vs_1": round(best[t]["aggregate_gb_s"] / base, 2)} for t in levels],
        "note": (
            "aggregate np.sum streaming read bandwidth; plateau = shared "
            "DRAM ceiling (see BENCH/BASELINE.md scaling protocol)"
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "membw.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["levels"]))


if __name__ == "__main__":
    main()
