#!/bin/bash
# Round-5 phase 2: waits for the evidence queue to drain, then runs the
# remaining chip records: union memory profile (task 7), NIP study at the
# flagship corpus (task 8), and the full headline bench (writes
# BENCH_SELF.json).  Sequential — one TPU chip.
set -u
cd /root/repo
LOG=scripts/logs
mkdir -p "$LOG"

while ! grep -q "QUEUE DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done

stage() {
  local name="$1"; shift
  local to="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${to}s) ==="
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc ==="
  echo "$name rc=$rc $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
  return $rc
}

stage union_mem_profile 5400 python scripts/union_mem_profile.py
stage study_nip 10800 python scripts/study_nip_flagship.py
stage full_bench 10800 python bench.py

echo "PHASE2 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
