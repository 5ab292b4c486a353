#!/bin/sh
# Probe-gated scaling runner: the BENCH.md methodology says a scaling leg
# pair only counts when the same-window memcpy probe shows a healthy host
# (8-proc aggregate >= 20 GB/s).  This watcher polls the probe and fires
# scripts/bench_scaling.py the moment two consecutive probes are healthy,
# so a transient healthy window on the shared VM is not missed while other
# work is going on.  Logs every probe; exits after the run or the deadline.
#
#   sh scripts/watch_and_scale.sh [max_minutes] [N] > log 2>&1
set -u
cd "$(dirname "$0")/.."
# Single-instance lock: two concurrent watchers would both fire the scaling
# pair in the same healthy window and contaminate each other's legs.  mkdir
# is atomic on POSIX; the trap releases the lock on any exit.
LOCK=/tmp/watch_and_scale.lock
if ! mkdir "$LOCK" 2>/dev/null; then
    echo "$(date -u +%FT%TZ) another watcher holds $LOCK; exiting"
    exit 2
fi
trap 'rmdir "$LOCK"' EXIT
MAX_MIN=${1:-120}
N=${2:-2}
DEADLINE=$(( $(date +%s) + MAX_MIN * 60 ))
STREAK=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    P=$(python scripts/membw_probe.py 2>/dev/null | tail -1)
    BW=$(printf '%s' "$P" | python -c 'import json,sys; print(json.load(sys.stdin).get("8",0))')
    echo "$(date -u +%FT%TZ) probe $P"
    OK=$(python -c "print(1 if $BW >= 20.0 else 0)")
    if [ "$OK" = "1" ]; then
        STREAK=$((STREAK + 1))
    else
        STREAK=0
    fi
    if [ "$STREAK" -ge 2 ]; then
        echo "$(date -u +%FT%TZ) healthy x2 -> running scaling pair N=$N"
        python scripts/bench_scaling.py "$N"
        echo "$(date -u +%FT%TZ) post-run probe: $(python scripts/membw_probe.py 2>/dev/null | tail -1)"
        exit 0
    fi
    sleep 300
done
echo "$(date -u +%FT%TZ) deadline reached without a healthy window"
exit 3
