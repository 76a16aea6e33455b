#!/bin/bash
# Round-5 phase 5: waits for phase 4, then records the RankAware alpha
# ablation (BASELINE.md rankaware_sweep row).
set -u
cd /root/repo
LOG=scripts/logs
while ! grep -q "PHASE4 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] START rankaware_alpha ==="
timeout 7200 python scripts/rankaware_alpha_ab.py >"$LOG/rankaware_alpha.log" 2>&1
echo "rankaware_alpha rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "PHASE5 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
