#!/bin/bash
# Run every pending on-chip measurement, in priority order, as soon as the
# axon TPU tunnel is reachable — and survive it dropping mid-sequence.
#
# STATUS 2026-08-20 (round 5): queue REPOINTED at the regularizer RESCUE
# arms. The round-4 queue measured both sparse-capture regularizers
# refuted as shipped (transcribed: BASELINE.md "Sparse-capture
# regularizers"; distortion-from-0 collapses llff_360 to 9.01 dB, anneal
# −0.53/−1.39 dB). Round 5 ships the fixes — --distortion_start/
# --distortion_ramp (delay+warmup; the collapse and its rescue are
# pinned at micro scale in tests/test_convergence_guards.py) and the
# FreeNeRF occlusion penalty --occlusion_loss (its minimum is an empty
# NEAR REGION, not an empty ray) — and this queue measures them at
# scale against the pinned llff_360 bands (20.23 @3k / 20.56 @50k,
# best-val). 3k arms run first; each 50k arm is GATED on its 3k arm
# measuring PASS (>= band), per VERDICT r4 #4 — chip hours are scarce
# and a failing direction should cost 4 minutes, not 2 hours.
#
# The tunnel has multi-hour outages (CLAUDE.md), so chip evidence is
# gathered opportunistically: this script probes with a trivial matmul,
# waits while the tunnel is down, refuses to start while the CPU test
# suite is hammering the host (dispatch starvation skews TPU timings up
# to ~26x), and marks each item done in /tmp/onchip so re-runs are
# idempotent.
#
# Items (priority order; every 50k arm is gated on its 3k arm's PASS):
#   1. llff_360 3k  occlusion 0.01            (vs pinned 20.23 @3k)
#   2. llff_360 3k  distortion 0.01 ramped    (start 1000, ramp 2000 —
#      full weight by 3k so the 3k arm actually tests the weight)
#   3. llff_360 3k  occlusion 0.05            (weight direction probe)
#   4. llff_360 50k occlusion (best 3k weight: 0.01 arm gates it)
#   5. llff_360 50k distortion 0.01 start 1000 ramp 4000 (gated on 2)
#   6. llff_360 50k freq_anneal 4000 (VERDICT r4 #1: a 2.5k-5k horizon
#      touches only the first 8% of the run, unlike the refuted 25k;
#      UNGATED — its 3k analog 1500 measured 19.70, but a 3k horizon
#      inside a 3k run is a different regime than 4k inside 50k)
#   7. bench.py HEAD sanity (also re-pins the render headline with the
#      round-5 in-process interleaved median)

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

wait_for_tunnel() {
  until probe; do
    echo "$(date -u +%FT%TZ) tunnel down; sleeping 600" >> "$LOGD/orchestrator.log"
    sleep 600
  done
}

wait_for_quiet_host() {
  # Never bench the TPU while the CPU suite (or other heavy load) runs.
  while [ -f /tmp/suite.pid ] && kill -0 "$(cat /tmp/suite.pid)" 2>/dev/null; do
    echo "$(date -u +%FT%TZ) CPU suite running; sleeping 120" >> "$LOGD/orchestrator.log"
    sleep 120
  done
}

run_item() {
  local name=$1 tmo=$2; shift 2
  [ -f "$MARK/$name.done" ] && return 0
  local attempt rc
  for attempt in 1 2 3; do
    wait_for_quiet_host
    wait_for_tunnel
    echo "$(date -u +%FT%TZ) START $name (attempt $attempt)" >> "$LOGD/orchestrator.log"
    timeout "$tmo" "$@" > "$LOGD/$name.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name" >> "$LOGD/orchestrator.log"
      return 0
    fi
    # Experiment arms (EXP=1): a completed quality_run that lands BELOW
    # the pinned band exits 3 — that is a measured refutation, not a
    # failure to retry (the run is seeded; a retry reproduces it).
    # Double-check the verdict line is actually in the log (ADVICE r4:
    # rc alone once conflated a crash with a measurement); anything else
    # — tunnel death, OOM, argparse exit — falls through to the retry.
    if [ "${EXP:-0}" = "1" ] && [ "$rc" -eq 3 ] \
        && grep -qE "^(PASS|FAIL) .*: test PSNR" "$LOGD/$name.log"; then
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name (below band, rc=3 — measured)" >> "$LOGD/orchestrator.log"
      return 0
    fi
    echo "$(date -u +%FT%TZ) FAIL $name rc=$rc (attempt $attempt)" >> "$LOGD/orchestrator.log"
    # If the tunnel died mid-run, the next wait_for_tunnel blocks until it
    # is back; if the tunnel is fine, this was a real failure — retry once
    # more in case of a transient, then give up and move on.
  done
  touch "$MARK/$name.failed"
  return 1
}

cd "$REPO"

# "The 3k arm measured at-or-above its band" — the gate for spending a
# 50k chip-hour arm on the same direction (a PASS vs the 3k band means
# the lever is at worst ~1 dB below plain; anything FAIL already lost).
passed() { grep -qE "^PASS" "$LOGD/$1.log" 2>/dev/null; }

EXP=1 run_item l360_occl_3k      3600 python scripts/quality_run.py --scene llff_360 --iters 3000 --keep_artifacts --extra --occlusion_loss 0.01
EXP=1 run_item l360_distramp_3k  3600 python scripts/quality_run.py --scene llff_360 --iters 3000 --keep_artifacts --extra --distortion_loss 0.01 --distortion_start 1000 --distortion_ramp 2000
EXP=1 run_item l360_occl05_3k    3600 python scripts/quality_run.py --scene llff_360 --iters 3000 --keep_artifacts --extra --occlusion_loss 0.05
if passed l360_occl_3k || passed l360_occl05_3k; then
  # Carry the better-measuring 3k weight to 50k.
  OCCL_W=0.01
  if passed l360_occl05_3k && ! passed l360_occl_3k; then OCCL_W=0.05; fi
  EXP=1 run_item l360_occl_50k   7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --occlusion_loss "$OCCL_W"
else
  echo "$(date -u +%FT%TZ) SKIP l360_occl_50k (3k arms below band)" >> "$LOGD/orchestrator.log"
fi
if passed l360_distramp_3k; then
  EXP=1 run_item l360_distramp_50k 7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --distortion_loss 0.01 --distortion_start 1000 --distortion_ramp 4000
else
  echo "$(date -u +%FT%TZ) SKIP l360_distramp_50k (3k arm below band)" >> "$LOGD/orchestrator.log"
fi
EXP=1 run_item l360_anneal4k_50k 7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --freq_anneal 4000
EXP=0 run_item bench_head_r5     3600 python bench.py

echo "$(date -u +%FT%TZ) ALL ITEMS PROCESSED" >> "$LOGD/orchestrator.log"
