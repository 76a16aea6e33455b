#!/bin/bash
# Round-5 phase 3: waits for phase 2, then retries the per-cluster A/B
# (crashed on a transient tunnel RPC flake in the first attempt).
set -u
cd /root/repo
LOG=scripts/logs
mkdir -p "$LOG"

while ! grep -q "PHASE2 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done

echo "=== [$(date +%H:%M:%S)] START percluster_ab_retry ==="
timeout 9000 python scripts/percluster_ab.py >"$LOG/percluster_ab_retry.log" 2>&1
rc=$?
echo "percluster_ab_retry rc=$rc $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "PHASE3 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
