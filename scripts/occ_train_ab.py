#!/usr/bin/env python
"""Occupancy-accelerated training (--occ_train) step-throughput A/B.

Interleaved in-process windows (CLAUDE.md benchmarking rule): the
reference-semantics step and the occupancy step are both compiled up
front, then measurement windows alternate so tunnel-dispatch drift hits
both arms equally. Also times one grid bake, so the rebake cadence's
amortized overhead is a measured number.

The occupancy arm's work per ray: 64 grid probes + the fine net on 128
points, vs the reference arm's coarse net on 64 + fine net on 192 — half
the MLP evaluations (fwd AND bwd). The quality side of the pin comes from
`quality_run.py --scene sphere_hi --extra --occ_train ...` (same scene,
same seed); this script provides the speed side.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100,
                    help="steps per measurement window")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--n_rays", type=int, default=1024)
    ap.add_argument("--occ_res", type=int, default=192)
    ap.add_argument("--floor", type=int, default=0,
                    help="full-mode stratified coverage floor "
                         "(RenderConfig.occ_floor)")
    ap.add_argument("--mode", default="full", choices=["full", "merge"],
                    help="--occ_train sampling mode to measure (full: "
                         "n_fine MLP evals/ray; merge: n_coarse+n_fine "
                         "evals, only the coarse MLP saved)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.render.occupancy import bake_scene_occupancy
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, make_train_scan
    from cvnerf_tpu.train.state import create_train_state

    mlp = NerfMLPConfig()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 400, 400, 3), jnp.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 4)
    poses[:, 2, 3] = 4.0
    poses = jnp.asarray(poses)
    idx = jnp.arange(4, dtype=jnp.int32)
    block = 10

    cfg = TrainConfig(
        height=400, width=400, focal=555.0, near=2.0, far=6.0,
        n_rays=args.n_rays, lr=5e-4, lr_decay=500,
        render=RenderConfig(occ_floor=args.floor,
                            n_coarse=64, n_fine=128, perturb=True,
                            noise_std=0.0, white_bkg=True, mlp=mlp,
                            compute_dtype=jnp.bfloat16,
                            occupancy_mode=args.mode))

    def fresh_state():
        return create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=mlp)

    # Brief real training so the baked grid has trained-net structure
    # (speed is layout-independent, but keep the probe CDF realistic).
    scan_ref = make_train_scan(cfg, block, None)
    state = fresh_state()
    key = jax.random.PRNGKey(1)
    state, m = scan_ref(state, key, images, poses, idx, jnp.int32(1), False)
    np.asarray(m["loss"])

    def bake():
        g = bake_scene_occupancy(state.params, mlp, ndc=False, bound=6.0,
                                 n_fine=cfg.render.n_fine,
                                 resolution=args.occ_res,
                                 compute_dtype=jnp.bfloat16)
        np.asarray(g.values.ravel()[0])
        return g

    bake()                       # untimed: pays jit trace + XLA compile
    t0 = time.perf_counter()
    grid = bake()                # timed: the steady-state rebake cost
    bake_s = time.perf_counter() - t0
    print(f"grid bake ({args.occ_res}^3): {bake_s:.2f} s "
          f"(amortized over a 1000-step rebake cadence: "
          f"{1000 * bake_s / 1000:.2f} ms/step)")

    scan_occ = make_train_scan(cfg, block, None, with_occupancy=True)
    state_occ = fresh_state()
    state_occ, m = scan_occ(state_occ, grid, key, images, poses, idx,
                            jnp.int32(1), False)
    np.asarray(m["loss"])            # compile + settle

    arms = {"ref": [state, 1 + block], "occ": [state_occ, 1 + block]}
    rates = {"ref": [], "occ": []}
    for w in range(args.windows):
        for name in ("ref", "occ"):
            st, i = arms[name]
            t0 = time.perf_counter()
            steps = 0
            while steps < args.steps:
                if name == "occ":
                    st, m = scan_occ(st, grid, key, images, poses, idx,
                                     jnp.int32(i), False)
                else:
                    st, m = scan_ref(st, key, images, poses, idx,
                                     jnp.int32(i), False)
                i += block
                steps += block
            np.asarray(m["loss"])
            dt = time.perf_counter() - t0
            arms[name] = [st, i]
            rates[name].append(steps * args.n_rays / dt)

    out = {}
    for name in ("ref", "occ"):
        r = np.array(rates[name])
        out[name] = float(np.median(r))
        print(f"{name}: median {np.median(r):10,.0f} rays/s   "
              f"windows={np.round(r, 0)}")
    speed = out["occ"] / out["ref"]
    # Net speedup including a 1000-step rebake cadence at the measured
    # bake time.
    occ_ms = 1000.0 * args.n_rays / out["occ"]
    net = args.n_rays / (occ_ms / 1000.0 + bake_s / 1000.0) / out["ref"]
    print(f"occ_train speedup over reference step: {speed:.2f}x "
          f"(net of a 1000-step rebake cadence: {net:.2f}x)")


if __name__ == "__main__":
    main()
