#!/usr/bin/env python
"""bf16-vs-fp32 train-throughput A/B on the real chip (VERDICT r2 #3).

Interleaved in-process windows (CLAUDE.md benchmarking rule): both step
programs are compiled up front, then measurement windows alternate
bf16/fp32 so tunnel-dispatch drift hits both arms equally. The quality side
of the pin comes from `quality_run.py --fp32` (same scene, same seed, 3k
steps); this script provides the speed side.
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
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
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

    def make(dtype):
        cfg = TrainConfig(
            height=400, width=400, focal=555.0, near=2.0, far=6.0,
            n_rays=args.n_rays, lr=5e-4, lr_decay=500,
            render=RenderConfig(n_coarse=64, n_fine=128, perturb=True,
                                noise_std=0.0, white_bkg=True, mlp=mlp,
                                compute_dtype=dtype))
        scan = make_train_scan(cfg, block, None)
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=mlp)
        return scan, state

    arms = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        scan, state = make(dtype)
        key = jax.random.PRNGKey(1)
        state, m = scan(state, key, images, poses, idx, jnp.int32(1), False)
        np.asarray(m["loss"])            # compile + settle
        arms[name] = [scan, state, key, 1 + block]

    rates = {"bf16": [], "fp32": []}
    for w in range(args.windows):
        for name in ("bf16", "fp32"):
            scan, state, key, i = arms[name]
            t0 = time.perf_counter()
            steps = 0
            while steps < args.steps:
                state, m = scan(state, key, images, poses, idx,
                                jnp.int32(i), False)
                i += block
                steps += block
            np.asarray(m["loss"])
            dt = time.perf_counter() - t0
            arms[name][1], arms[name][3] = state, i
            rates[name].append(steps * args.n_rays / dt)

    out = {}
    for name in ("bf16", "fp32"):
        r = np.array(rates[name])
        out[name] = float(np.median(r))
        print(f"{name}: median {np.median(r):10,.0f} rays/s   "
              f"windows={np.round(r, 0)}")
    print(f"bf16 speedup over fp32: {out['bf16'] / out['fp32']:.2f}x")


if __name__ == "__main__":
    main()
