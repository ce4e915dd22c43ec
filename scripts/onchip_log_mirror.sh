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
DST="$(cd "$(dirname "$0")/.." && pwd)/results/onchip"
mkdir -p "$DST"

sync_all() {
  [ -d "$SRC" ] && cp -u "$SRC"/*.log "$DST"/ 2>/dev/null
  for m in /tmp/onchip/*.done /tmp/onchip/*.failed; do
    [ -f "$m" ] && cp -u "$m" "$DST/$(basename "$m")" 2>/dev/null
  done
}

while true; do
  sync_all
  if grep -q "ALL ITEMS PROCESSED" "$SRC/orchestrator.log" 2>/dev/null; then
    sync_all   # logs AND markers written since this iteration's copy
    exit 0
  fi
  sleep 300
done
