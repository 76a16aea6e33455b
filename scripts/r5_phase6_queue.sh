#!/bin/bash
# Round-5 phase 6: waits for phase 5, then re-runs the per-cluster A/B
# with the closure-constant fix (600 MB recon array rode every tunnel
# compile request and broke the pipe in both earlier attempts) and the
# unbiased fit subsample.
set -u
cd /root/repo
LOG=scripts/logs
while ! grep -q "PHASE5 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] START percluster_ab_v3 ==="
timeout 9000 python scripts/percluster_ab.py >"$LOG/percluster_ab_v3.log" 2>&1
echo "percluster_ab_v3 rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "PHASE6 DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
