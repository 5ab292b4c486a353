"""Diagnostic: attribute the serial component of a confined kg_pipeline run.

Runs the flagship pipeline at taskset-confined local[N] with the Spark event
log enabled, then parses the log into a task-concurrency timeline:

  - wall seconds with 0 running tasks (driver-only: planning, job gaps,
    Py4J round trips, probe jobs' latency)
  - wall seconds with < N/2 running tasks (under-parallel tail/skew)
  - per-job wall + the gap to the previous job's end, ranked

Usage: python scripts/serial_attribution.py [N] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); replicate = int(sys.argv[2]); logdir = sys.argv[3]
os.environ.setdefault("SPARK_DRIVER_MEM", str(6 * cpus) + "g")
from named_entity_discovery_and_linking_spark.session import get_spark
from named_entity_discovery_and_linking_spark.plans import driver_queries as DQ
spark = get_spark("serial-probe", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.eventLog.enabled": "true",
                               "spark.eventLog.dir": logdir}})
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
DQ.kg_pipeline(spark, sf, 2).count()      # warm every plan shape
marker = time.time() * 1000
t0 = time.time()
n = DQ.kg_pipeline(spark, sf, replicate).count()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "sec": round(dt, 2), "triples": n,
                   "marker_ms": marker, "app_id": spark.sparkContext.applicationId}}))
spark.stop()
"""


def run_leg(cpus: int, replicate: int, logdir: str) -> dict:
    os.makedirs(logdir, exist_ok=True)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
         CHILD.format(repo=REPO), str(cpus), str(replicate), logdir],
        capture_output=True, text=True, timeout=2400,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], out.stderr[-3000:])
        raise SystemExit(1)
    return json.loads(lines[-1])


def _open_event_log(logdir: str, app_id: str):
    """Handle both the flat file and the rolling v2 directory layout, with
    optional zstd compression (decoded via the zstd CLI)."""
    flat = os.path.join(logdir, app_id)
    if os.path.exists(flat):
        return open(flat)
    v2 = os.path.join(logdir, f"eventlog_v2_{app_id}")
    parts = sorted(p for p in os.listdir(v2) if p.startswith("events_"))
    assert parts, f"no event files in {v2}"
    import io
    chunks = []
    for p in parts:
        fp = os.path.join(v2, p)
        if p.endswith(".zstd"):
            chunks.append(subprocess.run(["zstd", "-dc", fp],
                                         capture_output=True, check=True).stdout)
        else:
            chunks.append(open(fp, "rb").read())
    return io.TextIOWrapper(io.BytesIO(b"".join(chunks)))


def analyze(logdir: str, app_id: str, marker_ms: float, cpus: int) -> None:
    task_iv = []          # (start_ms, end_ms)
    jobs = {}             # id -> {start, end, stages:[names]}
    stage_names = {}
    with _open_event_log(logdir, app_id) as f:
        for line in f:
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                if ti["Launch Time"] >= marker_ms:
                    task_iv.append((ti["Launch Time"], ti["Finish Time"]))
            elif t == "SparkListenerJobStart":
                if ev["Submission Time"] >= marker_ms:
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "stages": [s["Stage Name"] for s in ev["Stage Infos"]],
                    }
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si["Stage Name"]

    if not task_iv:
        print("no tasks after marker")
        return
    lo = min(s for s, _ in task_iv)
    hi = max(e for _, e in task_iv)
    # concurrency timeline via event sweep
    events = sorted([(s, 1) for s, _ in task_iv] + [(e, -1) for _, e in task_iv])
    cur = 0
    prev = events[0][0]
    by_level = {}
    for ts, d in events:
        by_level[cur] = by_level.get(cur, 0) + (ts - prev)
        cur += d
        prev = ts
    wall = (hi - lo) / 1000.0
    idle = by_level.get(0, 0) / 1000.0
    under = sum(v for k, v in by_level.items() if 0 < k < cpus / 2) / 1000.0
    full = sum(v for k, v in by_level.items() if k >= cpus / 2) / 1000.0
    print(f"wall {wall:.1f}s | 0 tasks running {idle:.1f}s | "
          f"1..{cpus//2 - 1} tasks {under:.1f}s | >={cpus//2} tasks {full:.1f}s")

    # rank jobs by (gap before job) and by under-parallel wall
    ordered = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    rows = []
    for jid, j in ordered:
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        rows.append((gap, (j["end"] - j["start"]) / 1000.0, jid,
                     j["stages"][-1][:70] if j["stages"] else "?"))
        prev_end = j["end"]
    print(f"\n{len(rows)} jobs after marker; top gaps before a job (driver-side serial):")
    for gap, dur, jid, name in sorted(rows, reverse=True)[:12]:
        print(f"  gap {gap:6.2f}s  then job {jid} ({dur:6.2f}s)  {name}")
    total_gap = sum(r[0] for r in rows)
    print(f"total inter-job gap: {total_gap:.1f}s across {len(rows)} jobs")


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    logdir = "/tmp/ndl-eventlog"
    res = run_leg(cpus, replicate, logdir)
    print(json.dumps(res))
    analyze(logdir, res["app_id"], res["marker_ms"], cpus)


if __name__ == "__main__":
    main()
