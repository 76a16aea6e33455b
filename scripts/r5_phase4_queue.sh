#!/bin/bash
# Round-5 phase 4: waits for phase 3, then retries the two crashed
# evidence runs with their fixes (OPQ grouped Lloyd for the parity gate;
# preallocate+donate packed planes for the 53M SAQ scan).
set -u
cd /root/repo
LOG=scripts/logs
mkdir -p "$LOG"

while ! grep -q "PHASE3 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
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

stage parity_check_retry 10800 python scripts/parity_check.py
stage scan53m_saq_smoke2 2400 python scripts/scan53m.py --n 4194304 --method saq
stage scan53m_saq_retry 10800 python scripts/scan53m.py --method saq

echo "PHASE4 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
