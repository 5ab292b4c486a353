"""Back-to-back A/B bench: r2 commit vs HEAD, interleaved in one window.

VERDICT r3 "Next round #1": the r3 suite numbers drifted +10-25% vs r2 but no
same-window comparison existed, so host drift vs software regression was an
inference.  This script settles it: it runs each tree's own bench.py
alternately (A,B,A,B,...) inside a single measurement window so host drift
hits both legs equally, then reports per-query means, spreads, and the
HEAD/r2 ratio on the overlapping queries.

Usage: python scripts/ab_bench.py [reps]   (default 3 reps per leg)
Writes scripts/ab_bench_result.json; the BENCH.md table is authored from it.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGS = {"r2": os.path.join(REPO, ".worktrees", "r2"), "head": REPO}


def memcpy_probe() -> float:
    """Single-thread memcpy GB/s — the host-drift canary used in BENCH.md."""
    import numpy as np

    a = np.ones(64 * 1024 * 1024 // 8)
    t0 = time.time()
    for _ in range(8):
        b = a.copy()
    dt = time.time() - t0
    del b
    return round(8 * a.nbytes / dt / 1e9, 2)


def run_leg(tree: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_CPUS"] = os.environ.get("SPARK_GRAFT_CPUS", "32")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    wall = round(time.time() - t0, 1)
    if out.returncode != 0:
        raise RuntimeError(
            f"bench leg {tree!r} failed (rc={out.returncode}): {out.stderr[-2000:]}"
        )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench leg {tree!r} printed no JSON line; stderr: {out.stderr[-2000:]}"
        )
    line = lines[-1]
    rec = json.loads(line)
    rec["_wall_incl_startup"] = wall
    return rec


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: dict[str, list[dict]] = {"r2": [], "head": []}
    probes = [memcpy_probe()]
    t_start = time.time()
    for i in range(reps):
        # alternate leg order per rep: monotone host drift WITHIN a rep would
        # otherwise bias whichever leg always ran second
        order = ("r2", "head") if i % 2 == 0 else ("head", "r2")
        for name in order:
            rec = run_leg(LEGS[name])
            runs[name].append(rec)
            probes.append(memcpy_probe())
            print(f"[{i+1}/{reps}] {name}: suite={rec['value']}s "
                  f"n_triples={rec.get('n_triples')} probe={probes[-1]}GB/s",
                  flush=True)

    common = sorted(
        set(runs["r2"][0]["queries"]) & set(runs["head"][0]["queries"])
    )
    table = {}
    for q in common:
        a = [r["queries"][q] for r in runs["r2"]]
        b = [r["queries"][q] for r in runs["head"]]
        table[q] = {
            "r2_mean": round(statistics.mean(a), 3),
            "r2_spread": round(max(a) - min(a), 3),
            "head_mean": round(statistics.mean(b), 3),
            "head_spread": round(max(b) - min(b), 3),
            "ratio": round(statistics.mean(b) / statistics.mean(a), 3),
        }
    suite_a = [sum(r["queries"][q] for q in common) for r in runs["r2"]]
    suite_b = [sum(r["queries"][q] for q in common) for r in runs["head"]]
    result = {
        "window_sec": round(time.time() - t_start, 1),
        "reps": reps,
        "memcpy_probes_gbps": probes,
        "common_suite": {
            "r2_mean": round(statistics.mean(suite_a), 2),
            "r2_runs": [round(x, 2) for x in suite_a],
            "head_mean": round(statistics.mean(suite_b), 2),
            "head_runs": [round(x, 2) for x in suite_b],
            "ratio": round(statistics.mean(suite_b) / statistics.mean(suite_a), 3),
        },
        "per_query": table,
        "runs": runs,
    }
    out_path = os.path.join(REPO, "scripts", "ab_bench_result.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("common_suite", "memcpy_probes_gbps")}))


if __name__ == "__main__":
    main()
