#!/bin/bash
# Run every pending on-chip measurement, in priority order, as soon as the
# axon TPU tunnel is reachable — and survive it dropping mid-sequence.
#
# STATUS 2026-08-20 (round 4, continuation session): queue REPOINTED at
# the sparse-capture regularizers landed this round (--freq_anneal /
# --distortion_loss, tests/test_anneal.py). Their target is the one scene
# family where accelerated recipes still lose quality: llff_360 (sparse
# 27-view 360°, pinned 20.56 dB @50k best-val; floor-64 −0.46, ray
# batching −1.2 there). Every arm is a quality_run.py invocation whose
# PSNR lands in the run's metrics log; transcribe into BASELINE.md
# ("sparse-capture regularizers") + ROADMAP when read. The round-3 queue
# this replaces is fully transcribed (results/onchip/, BASELINE.md).
#
# The tunnel has multi-hour outages (CLAUDE.md), so chip evidence is
# gathered opportunistically: this script probes with a trivial matmul,
# waits while the tunnel is down, refuses to start while the CPU test
# suite is hammering the host (dispatch starvation skews TPU timings up
# to ~26x), and marks each item done in /tmp/onchip so re-runs are
# idempotent.
#
# Items (priority order; 3k arms are cheap direction checks before the
# 50k horizon arms; horizons: anneal 25000 aligns with the scene's
# measured noise_decay=25000 schedule, 1500 is the 3k-scaled analog):
#   1. llff_360 3k  --freq_anneal 1500       (vs pinned 20.23 @3k)
#   2. llff_360 3k  --distortion_loss 0.01   (vs pinned 20.23 @3k)
#   3. llff_360 50k --freq_anneal 25000      (vs pinned 20.56 @50k)
#   4. llff_360 50k --distortion_loss 0.01   (vs pinned 20.56 @50k)
#   5. llff_360 50k both                     (compose only if 3+4 help)
#   6. bench.py HEAD sanity

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
    # the pinned band exits 1 — that is a measured refutation, not a
    # failure to retry (the run is seeded; a retry reproduces it).
    if [ "${EXP:-0}" = "1" ] && [ "$rc" -eq 1 ]; then
      touch "$MARK/$name.done"
      echo "$(date -u +%FT%TZ) DONE $name (below band, rc=1 — measured)" >> "$LOGD/orchestrator.log"
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

EXP=1 run_item l360_anneal_3k  3600 python scripts/quality_run.py --scene llff_360 --iters 3000 --keep_artifacts --extra --freq_anneal 1500
EXP=1 run_item l360_dist_3k    3600 python scripts/quality_run.py --scene llff_360 --iters 3000 --keep_artifacts --extra --distortion_loss 0.01
EXP=1 run_item l360_anneal_50k 7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --freq_anneal 25000
EXP=1 run_item l360_dist_50k   7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --distortion_loss 0.01
EXP=1 run_item l360_both_50k   7200 python scripts/quality_run.py --scene llff_360 --iters 50000 --keep_artifacts --extra --freq_anneal 25000 --distortion_loss 0.01
EXP=0 run_item bench_head      3600 python bench.py

echo "$(date -u +%FT%TZ) ALL ITEMS PROCESSED" >> "$LOGD/orchestrator.log"
