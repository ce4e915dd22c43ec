#!/usr/bin/env python
"""Standalone fused-kernel throughput: fwd and fwd+bwd TFLOP/s on the TPU.

Measures the Pallas encode→MLP kernel in isolation (the denominator for the
"speed-of-light" discussion in ROADMAP.md): forward at the full-size model
and the custom-VJP train path, reporting sustained TFLOP/s against the exact
per-point FLOP count.
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
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--tile", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
    from cvnerf_tpu.ops.pallas.fused_mlp import (_forward_flops,
                                                 fused_nerf_apply)
    from cvnerf_tpu.ops.pallas.fused_mlp_bwd import fused_nerf_train_apply

    cfg = NerfMLPConfig()
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    n = args.n
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (n, 3), jnp.float32) * 2.0
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (n, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flops_pt = _forward_flops(cfg)

    def sync(x):
        np.asarray(x.ravel()[0])

    # --- forward ---
    fwd = jax.jit(lambda p, x, d: fused_nerf_apply(
        p, x, d, cfg, compute_dtype=cdt, tile=args.tile))
    out = fwd(params, pts, dirs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(params, pts, dirs)
    sync(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"fwd : {n} pts, {dt*1e3:7.2f} ms, "
          f"{flops_pt * n / dt / 1e12:6.1f} TFLOP/s")

    # --- train (fwd + custom-VJP bwd); count 4x fwd FLOPs (fwd + recompute
    # + dgrad + wgrad) ---
    def loss(p, x, d):
        return jnp.sum(fused_nerf_train_apply(p, x, d, cfg, cdt, 2048,
                                              False) ** 2)

    grad = jax.jit(jax.grad(loss))
    g = grad(params, pts, dirs)
    sync(g["l2"]["w"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        g = grad(params, pts, dirs)
    sync(g["l2"]["w"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train: {n} pts, {dt*1e3:7.2f} ms, "
          f"{4 * flops_pt * n / dt / 1e12:6.1f} TFLOP/s (4x-fwd convention)")


if __name__ == "__main__":
    main()
