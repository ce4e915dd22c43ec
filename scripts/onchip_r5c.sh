#!/bin/bash
# Round-5 closing sweep: the full pinned-band regression gate
# (quality_run --scene all @3k: checker, sphere_hi, llff_plane, llff_360
# vs results/psnr_bands.json) run ONCE after the r5b measurement queue
# drains — the end-of-round proof that the round's changes (EMA state
# plumbing, regularizer rescue paths, fractional anneal resolution)
# regressed nothing on-chip. ~15-20 min of chip.
#
# Same discipline as onchip_r5b.sh: combined tunnel+quiet-host readiness,
# start-deadline so nothing overlaps the end-of-round driver bench,
# self-sync into results/onchip.

set -u
REPO=/root/repo
MARK=/tmp/onchip
LOGD=/tmp/onchip/logs
mkdir -p "$MARK" "$LOGD"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x.ravel()[0])) == 256.0
" >/dev/null 2>&1
}

host_quiet() {
  ! { [ -f /tmp/suite.pid ] && kill -0 "$(cat /tmp/suite.pid)" 2>/dev/null; }
}

wait_ready() {
  until host_quiet && probe; do
    echo "$(date -u +%FT%TZ) r5c waiting (tunnel or CPU suite); sleeping 300" >> "$LOGD/orchestrator.log"
    sleep 300
  done
}

sync_repo() {
  cp -u "$LOGD"/*.log "$REPO/results/onchip/" 2>/dev/null
  for m in "$MARK"/*.done "$MARK"/*.failed; do
    [ -f "$m" ] && cp -u "$m" "$REPO/results/onchip/$(basename "$m")" 2>/dev/null
  done
  return 0
}

deadline_ok() {
  local tmo=$1 now
  now=$(( 10#$(date -u +%H) * 60 + 10#$(date -u +%M) ))
  [ $(( now + tmo / 60 )) -le 1230 ]
}

run_item() {
  local name=$1 tmo=$2; shift 2
  [ -f "$MARK/$name.done" ] && { sync_repo; return 0; }
  if ! deadline_ok "$tmo"; then
    echo "$(date -u +%FT%TZ) SKIP $name (start deadline)" >> "$LOGD/orchestrator.log"
    sync_repo
    return 0
  fi
  local attempt rc
  for attempt in 1 2 3; do
    wait_ready
    echo "$(date -u +%FT%TZ) START $name (attempt $attempt)" >> "$LOGD/orchestrator.log"
    timeout "$tmo" "$@" > "$LOGD/$name.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name" >> "$LOGD/orchestrator.log"
      sync_repo
      return 0
    fi
    if grep -q "band sweep FAILED" "$LOGD/$name.log"; then
      # A completed sweep with a below-band scene: measured REGRESSION —
      # mark done so ~20 chip-minutes are not burned twice, flag loudly.
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name (REGRESSION: a scene measured below its band — read the log)" >> "$LOGD/orchestrator.log"
      sync_repo
      return 0
    fi
    echo "$(date -u +%FT%TZ) FAIL $name rc=$rc (attempt $attempt)" >> "$LOGD/orchestrator.log"
  done
  touch "$MARK/$name.failed"
  sync_repo
}

cd "$REPO"

# Wait for r5b to drain (marker line in the shared orchestrator log).
waited=0
until grep -q "R5B ITEMS PROCESSED" "$LOGD/orchestrator.log" 2>/dev/null; do
  sleep 300
  waited=$((waited + 300))
  [ "$waited" -ge 43200 ] && break
done
echo "$(date -u +%FT%TZ) r5c queue starting" >> "$LOGD/orchestrator.log"

run_item band_sweep_r5 7200 python scripts/quality_run.py --scene all --iters 3000

echo "$(date -u +%FT%TZ) R5C ITEMS PROCESSED" >> "$LOGD/orchestrator.log"
sync_repo
