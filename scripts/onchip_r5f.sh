#!/bin/bash
# Round-5 final measurement queue: the two EMA questions the r5d/r5e
# results leave open, both recipe-relevant.
#   1. reflego_merge_ema_50k — does EMA stack with the DEFAULT
#      accelerated recipe (occ-train merge) on real content? merge alone
#      is pinned 26.95 @50k (+0.33 over plain 26.62); EMA alone measured
#      +0.48 @3k and is standalone-positive on every family. If the
#      composition clears 26.95, configs/lego_fast.txt earns
#      `ema_decay = 0.999`; the llff_360 compositions did NOT stack
#      (BASELINE.md), so this must be measured, not assumed.
#   2. shi_ema_50k — sphere_hi's +2.11 @3k is the largest EMA win; the
#      50k arm (pin 31.53) tests whether it survives a converged,
#      noise-free tail or was a short-horizon artifact.
# Gated on the r5e completion marker (one chip, strict queue ordering);
# same wipe-proof marker+log seeding and epoch deadline as r5d/r5e.
#
# Transcribe into BASELINE.md "EMA weight averaging" when read.

set -u
REPO=/root/repo
MARK=/tmp/onchip
LOGD=/tmp/onchip/logs
mkdir -p "$MARK" "$LOGD"

for m in "$REPO"/results/onchip/*.done; do
  [ -f "$m" ] && touch "$MARK/$(basename "$m")"
done
cp -n "$REPO"/results/onchip/*.log "$LOGD"/ 2>/dev/null

DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 7 * 3600 ))}

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
    echo "$(date -u +%FT%TZ) r5f waiting (tunnel or CPU suite); sleeping 300" >> "$LOGD/orchestrator.log"
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
  local tmo=$1
  [ $(( $(date +%s) + tmo )) -le "$DEADLINE_EPOCH" ]
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
    if [ "${EXP:-0}" = "1" ] && [ "$rc" -eq 3 ] \
        && grep -qE "^(PASS|FAIL) .*: test PSNR" "$LOGD/$name.log"; then
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name (below band, rc=3 — measured)" >> "$LOGD/orchestrator.log"
      sync_repo
      return 0
    fi
    echo "$(date -u +%FT%TZ) FAIL $name rc=$rc (attempt $attempt)" >> "$LOGD/orchestrator.log"
  done
  touch "$MARK/$name.failed"
  sync_repo
}

cd "$REPO"

waited=0
until grep -q "R5E ITEMS PROCESSED" "$LOGD/orchestrator.log" 2>/dev/null; do
  sleep 300
  waited=$((waited + 300))
  [ "$waited" -ge 36000 ] && break
done
echo "$(date -u +%FT%TZ) r5f queue starting (deadline epoch $DEADLINE_EPOCH)" >> "$LOGD/orchestrator.log"

# Timeouts are set to the MEASURED arm cost plus slack, not a generous
# 2 h: deadline_ok gates on start+timeout <= deadline, so an inflated
# timeout makes the guard skip arms that would in fact finish well
# before the end-of-round bench (reflego_ema_50k measured 31 min;
# sphere_hi 50k runs are shorter).
EXP=1 run_item reflego_merge_ema_50k 3600 python scripts/quality_run.py --scene ref_lego --iters 50000 --keep_artifacts --extra --occ_train --ema_decay 0.999
EXP=1 run_item shi_ema_50k           3000 python scripts/quality_run.py --scene sphere_hi --iters 50000 --keep_artifacts --extra --ema_decay 0.999

echo "$(date -u +%FT%TZ) R5F ITEMS PROCESSED" >> "$LOGD/orchestrator.log"
sync_repo
