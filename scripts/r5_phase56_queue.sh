#!/bin/bash
# Round-5 phase 5+6 (reordered): percluster A/B (VERDICT missing #1b,
# closure-constant fix) FIRST, then the RankAware alpha ablation.
set -u
cd /root/repo
LOG=scripts/logs
while ! grep -q "PHASE4 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] START percluster_ab_v3 ==="
timeout 9000 python scripts/percluster_ab.py >"$LOG/percluster_ab_v3.log" 2>&1
echo "percluster_ab_v3 rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "=== [$(date +%H:%M:%S)] START rankaware_alpha ==="
timeout 7200 python scripts/rankaware_alpha_ab.py >"$LOG/rankaware_alpha.log" 2>&1
echo "rankaware_alpha rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "PHASE56 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
