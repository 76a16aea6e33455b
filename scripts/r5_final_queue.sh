#!/bin/bash
# Round-5 final: after the tail queue, retry the 53M SAQ scan with the
# prune-SMEM gate.
set -u
cd /root/repo
LOG=scripts/logs
while ! grep -q "TAIL DONE" "$LOG/queue_status.txt" 2>/dev/null; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] START scan53m_saq_v3 ==="
timeout 7200 python scripts/scan53m.py --method saq >"$LOG/scan53m_saq_v3.log" 2>&1
echo "scan53m_saq_v3 rc=$? $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
echo "FINAL DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
