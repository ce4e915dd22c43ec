#!/usr/bin/env python
"""Render-path decomposition on the real chip (VERDICT r2 #8).

The train step has a measured TF/s decomposition (ROADMAP "Remaining kernel
headroom"); this gives the render path one. Method: delta ablation at the
chunk level — jit `render_rays` on one 4096-ray eval chunk (the production
render chunk shape), then re-jit shape-identical variants with exactly one
pipeline stage replaced by a free stand-in (numerically wrong, cost-right):

  kernel    — fused MLP replaced by a rank-1 linear map of the inputs
  pdf       — sample_pdf replaced by a linspace resample (no CDF bracketing)
  merge     — merge_sorted replaced by plain concatenate (unsorted)
  composite — volume_render replaced by a mean over samples

The share of stage S is (t_full - t_without_S) / t_full. Interleaved
in-process windows per the repo benchmarking rule (CLAUDE.md); sync by
device-scalar pull.
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
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import cvnerf_tpu.ops.sampling as sampling_mod
    import cvnerf_tpu.render.renderer as renderer_mod
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
    from cvnerf_tpu.render.renderer import RenderConfig

    cfg = RenderConfig(n_coarse=64, n_fine=128, white_bkg=True,
                       compute_dtype=jnp.bfloat16).eval_mode()
    mlp = NerfMLPConfig()
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), mlp),
              "fine": init_nerf_params(jax.random.PRNGKey(1), mlp)}

    n = args.rays
    key = jax.random.PRNGKey(2)
    rays_o = jax.random.normal(jax.random.fold_in(key, 0), (n, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    viewdirs = rays_d
    near = jnp.full((n,), 2.0, jnp.float32)
    far = jnp.full((n,), 6.0, jnp.float32)

    def sync(out):
        np.asarray(out["rgb"].ravel()[0])

    def make_fn():
        rr = renderer_mod.render_rays

        def fn(params, rays_o, rays_d, viewdirs, near, far):
            return rr(jax.random.PRNGKey(3), params, rays_o, rays_d,
                      viewdirs, near, far, cfg)
        return jax.jit(fn)

    # --- stand-ins (cost-free, shape-identical) ---
    real = dict(
        query=renderer_mod._query_mlp,
        pdf=renderer_mod.sample_pdf,
        merge=sampling_mod.merge_sorted,
        comp=renderer_mod.volume_render,
    )

    def fake_query(params, points, viewdirs, cfg_):
        # rank-1 affine map touching both inputs; no encode, no MLP
        s = jnp.sum(points, -1, keepdims=True) + jnp.sum(
            viewdirs, -1, keepdims=True)[..., None, :]
        return jnp.concatenate([s, s, s, s], axis=-1)

    def fake_pdf(key_, mids, w, n_fine, deterministic=False, u=None):
        lo = mids[..., :1]
        hi = mids[..., -1:]
        t = jnp.linspace(0.0, 1.0, n_fine, dtype=mids.dtype)
        return lo + (hi - lo) * t

    def fake_merge(a, b):
        return jnp.concatenate([a, b], axis=-1)

    def fake_comp(raw, t, rays_d, noise_std=0.0, white_bkg=False,
                  noise=None):
        rgb = jnp.mean(raw[..., :3], axis=-2)
        acc = jnp.mean(raw[..., 3], axis=-1)
        w = jnp.ones(t.shape, t.dtype) / t.shape[-1]
        return {"rgb": rgb, "acc": acc, "depth": acc, "weights": w}

    def build(name):
        """jitted render_rays with stage `name` replaced (or none)."""
        renderer_mod._query_mlp = real["query"]
        renderer_mod.sample_pdf = real["pdf"]
        sampling_mod.merge_sorted = real["merge"]
        renderer_mod.volume_render = real["comp"]
        if name == "kernel":
            renderer_mod._query_mlp = fake_query
        elif name == "pdf":
            renderer_mod.sample_pdf = fake_pdf
        elif name == "merge":
            sampling_mod.merge_sorted = fake_merge
        elif name == "composite":
            renderer_mod.volume_render = fake_comp
        fn = make_fn()
        out = fn(params, rays_o, rays_d, viewdirs, near, far)  # compile
        sync(out)
        return fn

    names = ["full", "kernel", "pdf", "merge", "composite"]
    fns = {nm: build(nm) for nm in names}
    # restore the real pipeline for anything imported later
    build("full")

    times = {nm: [] for nm in names}
    for w in range(args.windows):
        for nm in names:
            fn = fns[nm]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(params, rays_o, rays_d, viewdirs, near, far)
            sync(out)
            times[nm].append((time.perf_counter() - t0) / args.iters)

    med = {nm: float(np.median(times[nm])) for nm in names}
    full = med["full"]
    print(f"chunk = {n} rays, 64+192 samples; full = {full*1e3:.3f} ms "
          f"({n / full:,.0f} rays/s)")
    for nm in names[1:]:
        share = (full - med[nm]) / full * 100
        print(f"  {nm:10s} without: {med[nm]*1e3:8.3f} ms   share: "
              f"{share:6.2f}%")
    other = full - sum(full - med[nm] for nm in names[1:])
    print(f"  {'other':10s} (raygen/rng/reshape/dispatch): "
          f"{other*1e3:8.3f} ms   share: {other/full*100:6.2f}%")


if __name__ == "__main__":
    main()
