"""Same-window memory-bandwidth scaling control for the N->4N legs.

Aggregate memcpy GB/s with N worker processes confined to cores 0..N-1 —
the identical confinement bench_scaling.py uses — at N=2 and N=8.  The
ratio (agg8/agg2)/4 is the CURRENT window's memory-bandwidth scaling
ceiling: on this shared VM absolute bandwidth drifts by 10x across hours
(BENCH.md host-variance control), so the ceiling must be measured in the
same window as the pipeline legs it normalizes.

Usage: python scripts/membw_probe.py  -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

MB = 256


def worker(core: int, out):
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(MB * 1024 * 1024 // 8)
    # warm
    b = a.copy()
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        b = a.copy()
    dt = time.time() - t0
    del b
    out.put(reps * a.nbytes / dt / 1e9)


def agg_bw(n: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, q)) for i in range(n)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return round(sum(vals), 2)


def main():
    res = {}
    for n in (1, 2, 8):
        res[str(n)] = agg_bw(n)
    res["ceiling_2_to_8"] = round(res["8"] / res["2"] / 4, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
