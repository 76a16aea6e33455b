#!/bin/bash
# Round-5 evidence harvest: run the four staged scripts sequentially on the
# one TPU chip (processes serialize on it).  Smoke passes first to fail
# fast, then the full-size records.  Each stage logs to scripts/logs/.
set -u
cd /root/repo
mkdir -p scripts/logs
LOG=scripts/logs

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

: > "$LOG/queue_status.txt"

# --- smoke passes (fail fast; compile caches warm the full runs) ---
VQ_FAST=1 stage smoke_percluster 2400 python scripts/percluster_ab.py
stage smoke_scan53m_saq 2400 python scripts/scan53m.py --n 4194304 --method saq
VQ_FAST=1 stage smoke_bigbuild 3600 python scripts/ivf_bigbuild.py

# --- full records ---
stage percluster_ab 7200 python scripts/percluster_ab.py
stage parity_check 10800 python scripts/parity_check.py
stage scan53m_saq 10800 python scripts/scan53m.py --method saq
stage ivf_bigbuild 14400 python scripts/ivf_bigbuild.py

echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG/queue_status.txt"
