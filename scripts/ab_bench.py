"""Interleaved A/B benchmark: r4-tag vs HEAD on the same host window.

Judge r5 #3: every r5 window was probe-unhealthy (0.3-2.4 GB/s vs the
20-41 GB/s band), so the 2.5x ann_ivf / ann_lsh_adaptive wall deltas in
BENCH_r05.json cannot be attributed to code from absolute numbers.  An
interleaved A/B cancels host drift by construction (the technique that
settled r2->r3): each repetition runs BOTH sides back-to-back in fresh
JVMs, alternating order, so slow windows hit both sides equally and the
per-pair RATIO is the statistic.

Usage:
  python scripts/ab_bench.py [A_dir] [B_dir] [reps] [query ...]
Defaults: A=/tmp/ndl-r4-ab (a `git worktree add <r4-sha>` checkout),
B=this repo, reps=3, queries = the disputed set.

Prints one JSON line with per-(query, side, rep) walls and the
median-of-ratios verdict per query.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
repo = sys.argv[1]; query = sys.argv[2]; sf = sys.argv[3]
sys.path.insert(0, repo)
os.chdir(repo)  # golden-path / fixture relative paths
from named_entity_discovery_and_linking_spark.session import get_spark
from named_entity_discovery_and_linking_spark.plans import driver_queries as DQ
lookup = {**getattr(DQ, "BENCH_COMPAT", {}), **DQ.QUERIES}
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
spark = get_spark("ab-bench", master=f"local[{cpus}]",
                  shuffle_partitions=2 * cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
fn = lookup[query]
# warm: full plan once at the smallest SF (codegen + analysis amortized)
fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
t0 = time.time()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print("WALL", time.time() - t0)
"""


def run_child(repo: str, query: str, sf: str) -> float:
    res = subprocess.run(
        [sys.executable, "-c", CHILD, repo, query, sf],
        capture_output=True, text=True, timeout=900,
    )
    for line in res.stdout.splitlines():
        if line.startswith("WALL"):
            return float(line.split()[1])
    raise RuntimeError(f"{query} in {repo} failed:\n{res.stderr[-2000:]}")


def main():
    a_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ndl-r4-ab"
    b_dir = sys.argv[2] if len(sys.argv) > 2 else REPO
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    queries = sys.argv[4:] or ["ann_ivf", "ann_lsh_adaptive", "kg_triples"]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    out = {"sf": sf, "a": a_dir, "b": b_dir, "pairs": {}, "verdict": {}}
    for q in queries:
        pairs = []
        for rep in range(reps):
            # alternate order within the pair to cancel slow-start bias
            order = [("A", a_dir), ("B", b_dir)] if rep % 2 == 0 else [
                ("B", b_dir), ("A", a_dir)]
            t = {}
            for side, repo in order:
                t[side] = run_child(repo, q, sf)
            pairs.append({"rep": rep, "A_sec": round(t["A"], 3),
                          "B_sec": round(t["B"], 3),
                          "ratio_B_over_A": round(t["B"] / t["A"], 4)})
            print(f"# {q} rep{rep}: A={t['A']:.2f}s B={t['B']:.2f}s "
                  f"ratio={t['B'] / t['A']:.3f}", file=sys.stderr)
        ratios = [p["ratio_B_over_A"] for p in pairs]
        out["pairs"][q] = pairs
        out["verdict"][q] = {
            "median_ratio_B_over_A": round(statistics.median(ratios), 4),
            "regressed": statistics.median(ratios) > 1.15,
        }
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
