#!/usr/bin/env python
"""Same-day host scaling ceiling: pure-CPU numpy work across N python
processes, no Spark. The shared hypervisor does NOT deliver 4x going
8 -> 32 vCPUs even for embarrassingly-parallel arithmetic; engine
scaling efficiency must be read against this ceiling (BENCH/BASELINE.md).

Usage: python BENCH/host_ceiling.py [--scales 8,32] [--reps 3]
Prints one JSON line: {"t8": ..., "t32": ..., "speedup": ..., "ceiling": ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

# one BLAS thread per worker process — otherwise 32 workers x N BLAS
# threads oversubscribe the box and the "ceiling" measures contention
# we created ourselves, not the hypervisor
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def _work(_):
    # ~0.25 s of dense arithmetic per task on an idle core
    rng = np.random.default_rng(0)
    a = rng.standard_normal((600, 600))
    s = 0.0
    for _ in range(12):
        s += float(np.abs(a @ a).sum())
    return s


def measure(workers: int, tasks: int = 64, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        with mp.Pool(workers) as pool:
            t0 = time.time()
            pool.map(_work, range(tasks))
            best = min(best, time.time() - t0)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scales", default="8,32")
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()
    small, big = [int(s) for s in args.scales.split(",")]
    t_small = measure(small, reps=args.reps)
    t_big = measure(big, reps=args.reps)
    speedup = t_small / t_big
    print(json.dumps({
        f"t{small}": round(t_small, 3), f"t{big}": round(t_big, 3),
        "speedup": round(speedup, 3),
        "ceiling": round(speedup / (big / small), 3),
    }))


if __name__ == "__main__":
    main()
