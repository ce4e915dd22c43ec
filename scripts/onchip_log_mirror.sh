#!/bin/bash
# Mirror the on-chip orchestrator's logs (scripts/onchip_pending.sh writes
# /tmp/onchip/logs/*.log + .done/.failed markers) into the repo, so the
# measurements survive even when no interactive session is around to
# transcribe them: anything here gets committed with the round.
#
# Usage: nohup scripts/onchip_log_mirror.sh & — exits by itself once the
# orchestrator reports ALL ITEMS PROCESSED (after one final sync).
set -u
SRC=/tmp/onchip/logs
DST=/root/repo/results/onchip
mkdir -p "$DST"
while true; do
  [ -d "$SRC" ] && cp -u "$SRC"/*.log "$DST"/ 2>/dev/null
  for m in /tmp/onchip/*.done /tmp/onchip/*.failed; do
    [ -f "$m" ] && cp -u "$m" "$DST/$(basename "$m")" 2>/dev/null
  done
  if grep -q "ALL ITEMS PROCESSED" "$SRC/orchestrator.log" 2>/dev/null; then
    cp -u "$SRC"/*.log "$DST"/ 2>/dev/null
    exit 0
  fi
  sleep 300
done
