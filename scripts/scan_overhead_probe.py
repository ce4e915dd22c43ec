#!/usr/bin/env python
"""Isolate the train step's fixed per-scan-iteration cost (round 4).

The block-100 decomposition (scripts/train_decomp.py, results/
train_decomp.json) found the lego-shape train step is NOT stage-bound:
deleting the fused MLP outright moves the 8.64 ms step by 0.36%, and no
other stage moves it at all ("other" 99.1%). Something imposes a fixed
~8.6 ms per scan ITERATION regardless of the body. This probe separates
the candidates, interleaved in-process (CLAUDE.md benching rule):

  mesh_full    — the round-3 production program: shard_map over the
                 1-device ray mesh + per-leaf pmean grad allreduce
                 (~50 all_reduce launches per step)
  mesh_fused   — same, with TrainConfig.fused_allreduce: the grad tree
                 ravelled into ONE pmean (bitwise-identical math)
  nomesh_full  — identical step, mesh=None: plain jit, no shard_map, no
                 collectives
  nomesh_fake  — mesh=None AND the fused MLP replaced by a rank-1 affine
                 stand-in: the non-kernel residual, un-floored
  trivial      — lax.scan over the same TrainState carry with a
                 scale-by-constant body: the cost of scan carry handling
                 alone

Readout: if mesh_full >> nomesh_full, the 1-device shard_map/pmean path
is the overhead (collectives through the tunneled runtime); if
nomesh_full ~ mesh_full but >> nomesh_fake + kernel time, scan carry
handling is; if trivial ~ 8 ms/step, scan itself is.

Reference parity: none — this is a TPU-runtime diagnostic with no
reference counterpart (the reference has no compiled loop at all,
main.py:344-394 is eager per-step Python).
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
    ap.add_argument("--block", type=int, default=100)
    ap.add_argument("--calls", type=int, default=3,
                    help="scan calls per measurement window")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    if args.smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import cvnerf_tpu.render.renderer as renderer_mod
    from cvnerf_tpu.data.synthetic import bench_scene
    from cvnerf_tpu.parallel.mesh import make_mesh
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, make_train_scan
    from cvnerf_tpu.train.state import create_train_state

    if args.smoke:
        H = W = 32
        n_rays, n_coarse, n_fine = 64, 8, 8
        dtype = jnp.float32
        args.block = min(args.block, 3)
        args.windows = min(args.windows, 2)
    else:
        H = W = 400
        n_rays, n_coarse, n_fine = args.rays, 64, 128
        dtype = jnp.bfloat16

    images, poses = bench_scene(H, W)
    rcfg = RenderConfig(n_coarse=n_coarse, n_fine=n_fine, perturb=True,
                        noise_std=0.0, white_bkg=True, compute_dtype=dtype)
    cfg = TrainConfig(height=H, width=W, focal=555.0, near=2.0, far=6.0,
                      n_rays=n_rays, lr=5e-4, lr_decay=500, render=rcfg)
    images = jnp.asarray(images)
    poses = jnp.asarray(poses)
    train_idx = jnp.asarray([0, 1], jnp.int32)
    BLOCK = args.block

    real_query = renderer_mod._query_mlp

    def fake_query(params, points, viewdirs, cfg_):
        s = jnp.sum(points, -1, keepdims=True) + jnp.sum(
            viewdirs, -1, keepdims=True)[..., None, :]
        return jnp.concatenate([s, s, s, s], axis=-1)

    def sync(st):
        np.asarray(jax.tree.leaves(st.params)[0].ravel()[0])

    def build(mesh, fake, label, fused=False):
        import dataclasses
        renderer_mod._query_mlp = fake_query if fake else real_query
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=rcfg.mlp)
        scan = make_train_scan(
            dataclasses.replace(cfg, fused_allreduce=fused), BLOCK, mesh)

        def fn(st, i):
            st, _ = scan(st, jax.random.fold_in(jax.random.PRNGKey(1), i),
                         images, poses, train_idx, jnp.int32(i * BLOCK),
                         False)
            return st

        t0 = time.time()
        state = fn(state, 0)
        sync(state)
        print(f"# compiled {label}: {time.time() - t0:.1f}s", flush=True)
        renderer_mod._query_mlp = real_query
        return fn, state

    def build_trivial():
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=rcfg.mlp)

        @jax.jit
        def triv(st, key):
            def body(s, i):
                def scale(x):
                    if jnp.issubdtype(x.dtype, jnp.inexact):
                        return x * jnp.asarray(0.999999, x.dtype)
                    return x
                return jax.tree.map(scale, s), i

            st2, _ = jax.lax.scan(body, st,
                                  jnp.arange(BLOCK, dtype=jnp.int32))
            return st2

        def fn(st, i):
            return triv(st, jax.random.fold_in(jax.random.PRNGKey(1), i))

        t0 = time.time()
        state = fn(state, 0)
        sync(state)
        print(f"# compiled trivial: {time.time() - t0:.1f}s", flush=True)
        return fn, state

    mesh = make_mesh()
    arms = {
        "mesh_full": build(mesh, False, "mesh_full"),
        "mesh_fused": build(mesh, False, "mesh_fused", fused=True),
        "nomesh_full": build(None, False, "nomesh_full"),
        "nomesh_fake": build(None, True, "nomesh_fake"),
        "trivial": build_trivial(),
    }
    times = {k: [] for k in arms}
    for _ in range(args.windows):
        for name, (fn, st) in arms.items():
            t0 = time.perf_counter()
            for i in range(1, args.calls + 1):
                st = fn(st, i)
            sync(st)
            times[name].append(
                (time.perf_counter() - t0) / args.calls / BLOCK)
            arms[name] = (fn, st)
    for name, ts in times.items():
        med = float(np.median(ts)) * 1e3
        print(f"{name:12s}: {med:8.3f} ms/step ({n_rays / med * 1e3:,.0f} "
              f"rays/s)  windows={[round(t * 1e3, 3) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
