#!/bin/bash
# Round-5 tail: waits for phase 4 (53M stages), then: parity gate fill
# (3 rows the OOM cut), percluster A/B v3, rankaware alpha ablation.
set -u
cd /root/repo
LOG=scripts/logs
while ! grep -q "PHASE4 DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done
for st in "parity_gate_fill 5400 python scripts/parity_gate_fill.py" \
          "percluster_ab_v3 9000 python scripts/percluster_ab.py" \
          "rankaware_alpha 7200 python scripts/rankaware_alpha_ab.py"; do
  set -- $st
  name=$1; to=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name ==="
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "$name rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
done
echo "TAIL DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
