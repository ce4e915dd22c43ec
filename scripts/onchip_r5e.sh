#!/bin/bash
# Round-5 generalization probe for the short-anneal-horizon rule. The
# l360_anneal4k_50k breakthrough (+1.53 dB) plus the refuted half-run
# horizon (−1.39) established that the horizon FRACTION (~8–10% of the
# run) decides the sign on the sparse llff_360 capture. FreeNeRF frames
# annealing as a few-shot regularizer, so the open question is whether
# the short-horizon recipe helps, is neutral, or hurts on the OTHER
# measured families — the answer decides whether configs beyond
# llff_360_sparse.txt should carry `freq_anneal = 0.08`:
#   sphere_hi  (dense synthetic, 40 views; pinned 30.24 @3k)
#   ref_lego   (real content, 32 ring views; pinned 22.89 @3k)
#   llff_plane (forward-facing NDC, dense; pinned 41.47 @3k)
# 3k direction checks only (~15 min of chip total); horizon 240 = 8% of
# the run. A 50k confirmation is only worth chip-hours on a family whose
# 3k delta is positive — decide from the logs, do not auto-queue.
#
# Runs strictly AFTER the r5d queue (compositions + EMA matrix): gated on
# its completion marker so two queues never contend for the one chip.
# Same wipe-proof markers + epoch deadline as r5d.
#
# Transcribe into BASELINE.md ("Sparse-capture regularizers" — a
# generalization paragraph) when read.

set -u
REPO=/root/repo
MARK=/tmp/onchip
LOGD=/tmp/onchip/logs
mkdir -p "$MARK" "$LOGD"

for m in "$REPO"/results/onchip/*.done; do
  [ -f "$m" ] && touch "$MARK/$(basename "$m")"
done
# Logs too: any PASS-gating reads them (see onchip_r5d.sh).
cp -n "$REPO"/results/onchip/*.log "$LOGD"/ 2>/dev/null

# Relative-to-launch default: a late relaunch must export the ORIGINAL
# DEADLINE_EPOCH (see onchip_r5d.sh).
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
    echo "$(date -u +%FT%TZ) r5e waiting (tunnel or CPU suite); sleeping 300" >> "$LOGD/orchestrator.log"
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

# Strict ordering: wait for r5d's completion marker (it is written even
# when r5d's arms are deadline-skipped). Give up after 10 h — the
# deadline guard still prevents any late start from overlapping the
# end-of-round bench.
waited=0
until grep -q "R5D ITEMS PROCESSED" "$LOGD/orchestrator.log" 2>/dev/null; do
  sleep 300
  waited=$((waited + 300))
  [ "$waited" -ge 36000 ] && break
done
echo "$(date -u +%FT%TZ) r5e queue starting (deadline epoch $DEADLINE_EPOCH)" >> "$LOGD/orchestrator.log"

EXP=1 run_item shi_anneal8_3k      3600 python scripts/quality_run.py --scene sphere_hi  --iters 3000 --keep_artifacts --extra --freq_anneal 240
EXP=1 run_item reflego_anneal8_3k  3600 python scripts/quality_run.py --scene ref_lego   --iters 3000 --keep_artifacts --extra --freq_anneal 240
EXP=1 run_item lplane_anneal8_3k   3600 python scripts/quality_run.py --scene llff_plane --iters 3000 --keep_artifacts --extra --freq_anneal 240

echo "$(date -u +%FT%TZ) R5E ITEMS PROCESSED" >> "$LOGD/orchestrator.log"
sync_repo
