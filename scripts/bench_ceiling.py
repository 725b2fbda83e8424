#!/usr/bin/env python
"""Hardware parallel-scaling ceiling microbenchmark (no Spark).

Runs an identical CPU-bound kernel (numpy hash/sort mix, sized to a few
hundred ms) on 1, N and 4N concurrent processes and reports per-process
wall time at each width. The ratio per_proc(4N)/per_proc(N) bounds ANY
4N/N scaling measurement on this box — memory bandwidth and turbo
clocks degrade per-core throughput as more cores engage, so a Spark
job's efficiency must be judged against this ceiling, not against 1.0
(round-5 measured ~0.8 at 2→8 and ~0.77 at 8→32 implied ceilings).

Usage: python scripts/bench_ceiling.py [--widths 1,2,8,16,32]
Writes ceiling_result.json at the repo root.
"""

import argparse
import json
import multiprocessing as mp
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _kernel(_):
    import numpy as np
    rng = np.random.default_rng(42)
    t0 = time.time()
    x = rng.integers(0, 1 << 62, size=2_000_000, dtype=np.int64)
    for _ in range(6):
        x = (x * np.int64(0x9E3779B97F4A7C15)) ^ (x >> np.int64(29))
        x.sort()
        x = x[::-1].copy()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1,2,8,16,32")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    per_proc = {}
    for w in widths:
        medians = []
        for _ in range(args.rounds):
            with mp.Pool(w) as pool:
                times = pool.map(_kernel, range(w))
            times.sort()
            medians.append(times[len(times) // 2])
        medians.sort()
        per_proc[w] = round(medians[len(medians) // 2], 4)
        print(f"width {w}: per-proc {per_proc[w]}s", flush=True)

    out = {"method": ("pure-python/numpy multiprocessing microbench — "
                      "identical kernel per process, per-process wall "
                      "median of medians"),
           "per_proc_s": per_proc}
    for lo, hi in [(2, 8), (8, 32)]:
        if lo in per_proc and hi in per_proc:
            out[f"implied_max_efficiency_{lo}_to_{hi}"] = round(
                per_proc[lo] / per_proc[hi], 3)
    print(json.dumps(out))
    with open(os.path.join(REPO, "ceiling_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
