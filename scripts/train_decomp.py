#!/usr/bin/env python
"""Train-step decomposition on the real chip (VERDICT r3 next-round #1).

The render path has a measured delta-ablation (scripts/render_decomp.py);
this gives the TRAIN step one. At the lego workload (1024 rays, 64+192
samples, bf16+Pallas) the step measures ~9.2 ms while the fused kernel's
own throughput accounts for ~6.4 ms — ~30% of the headline metric was
unattributed. Method: jit the production train step (the same
``make_train_step`` program bench.py measures, mesh and all), then re-jit
shape-identical variants with exactly ONE stage replaced by a free
stand-in (numerically wrong, cost-right):

  kernel    — fused MLP fwd+bwd replaced by a rank-1 affine map
  strat     — stratified_samples replaced by a broadcast linspace
  pdf       — sample_pdf replaced by a linspace resample
  merge     — merge_sorted replaced by plain concatenate
  composite — volume_render (×2, fwd+bwd) replaced by a mean
  rng       — per-ray threefry draws replaced by constant fills
  pixels    — Feistel PRP pixel draw replaced by iota
  raygen    — rays_for_pixels replaced by a broadcast
  optimizer — Adam replaced by optax.identity (grads pass through)
  gradnorm  — optax.global_norm metric replaced by a constant

The share of stage S is (t_full - t_without_S) / t_full. Every variant
runs as a 100-step lax.scan block (``--block``): per-CALL tunnel latency
is ~87 ms round-trip on this target, so any dispatch whose device time is
below that floor measures AT the floor — at the production block of 10
steps, a kernel-ablated step (the MLP deleted outright!) measured the
same 8.69 ms/step as the full program, and every stage share came back
~0% ("other" 99.4%). Only a block long enough that device time >> RTT
(100 steps ≈ 0.86 s/call) exposes the device-side composition. A
separate ``single`` arm prices the per-dispatch overhead explicitly.
Interleaved in-process windows per the repo benchmarking rule (CLAUDE.md);
sync by device-scalar pull. ``--smoke`` validates the harness on tiny CPU
shapes (the shares are meaningless there; it checks the plumbing only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=300,
                    help="train steps per measurement window")
    ap.add_argument("--block", type=int, default=100,
                    help="lax.scan block length (device time per call "
                         "must dominate the ~87 ms tunnel round-trip)")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--mesh", action="store_true",
                    help="build the steps under the 1-device shard_map "
                         "(floor study; INVALID for stage shares — see "
                         "the mesh comment below)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run: harness check only")
    ap.add_argument("--json_out", default=None)
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
    import optax

    import cvnerf_tpu.ops.rng as rng_mod
    import cvnerf_tpu.ops.sampling as sampling_mod
    import cvnerf_tpu.render.renderer as renderer_mod
    import cvnerf_tpu.train.loop as loop_mod
    import cvnerf_tpu.train.state as state_mod
    from cvnerf_tpu.data.synthetic import bench_scene
    from cvnerf_tpu.parallel.mesh import make_mesh
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, make_train_scan, \
        make_train_step
    from cvnerf_tpu.train.state import create_train_state

    if args.smoke:
        H = W = 32
        focal = 44.0
        n_rays = 64
        n_coarse, n_fine = 8, 8
        dtype = jnp.float32
        args.block = min(args.block, 3)
        args.iters = min(args.iters, 6)
        args.windows = min(args.windows, 2)
    else:
        # bench.py's exact headline workload (configs/lego.txt shape).
        H = W = 400
        focal = 555.0
        n_rays = args.rays
        n_coarse, n_fine = 64, 128
        dtype = jnp.bfloat16

    images, poses = bench_scene(H, W)
    rcfg = RenderConfig(n_coarse=n_coarse, n_fine=n_fine, perturb=True,
                        noise_std=0.0, white_bkg=True, compute_dtype=dtype)
    cfg = TrainConfig(height=H, width=W, focal=focal, near=2.0, far=6.0,
                      n_rays=n_rays, lr=5e-4, lr_decay=500, render=rcfg)
    # Mesh-free by default: stage ablation under the 1-device shard_map is
    # methodologically INVALID on this runtime — a degenerate (ablated)
    # scan body floors at ~8.6-8.8 ms/step under the mesh regardless of
    # which stage remains (even with EVERY stage faked), while meshless it
    # runs at its true ~0.45 ms; real production programs are unaffected
    # (mesh_full 8.695 vs nomesh_full 8.678 ms; the occ step measures its
    # true 5.3 ms WITH the mesh). Measured: scripts/scan_overhead_probe.py
    # + the fake-all bisect (ROADMAP round 4). --mesh restores the sharded
    # build for floor studies.
    mesh = make_mesh() if args.mesh else None
    images = jnp.asarray(images)
    poses = jnp.asarray(poses)
    train_idx = jnp.asarray([0, 1], jnp.int32)

    # --- real stage implementations ---
    real = dict(
        query=renderer_mod._query_mlp,
        strat=renderer_mod.stratified_samples,
        pdf=renderer_mod.sample_pdf,
        merge=sampling_mod.merge_sorted,
        comp=renderer_mod.volume_render,
        uni=renderer_mod._per_ray_uniform,
        nrm=renderer_mod._per_ray_normal,
        srt=rng_mod.ray_sorted_uniform,
        pix=loop_mod._sample_pixels,
        rays=loop_mod.rays_for_pixels,
        opt=loop_mod.make_optimizer,
        opt_state=state_mod.make_optimizer,
        gnorm=optax.global_norm,
    )

    # --- stand-ins (cost-free, shape-identical, differentiable) ---
    def fake_query(params, points, viewdirs, cfg_):
        s = jnp.sum(points, -1, keepdims=True) + jnp.sum(
            viewdirs, -1, keepdims=True)[..., None, :]
        return jnp.concatenate([s, s, s, s], axis=-1)

    def fake_strat(key_, near, far, n, n_rays_, perturb, u=None):
        t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
        return near[..., None] + (far - near)[..., None] * t

    def fake_pdf(key_, mids, w, n_fine_, deterministic=False, u=None):
        lo, hi = mids[..., :1], mids[..., -1:]
        t = jnp.linspace(0.0, 1.0, n_fine_, dtype=mids.dtype)
        return lo + (hi - lo) * t

    def fake_merge(a, b):
        return jnp.concatenate([a, b], axis=-1)

    def fake_comp(raw, t, rays_d, noise_std=0.0, white_bkg=False,
                  noise=None):
        rgb = jnp.mean(raw[..., :3], axis=-2)
        acc = jnp.mean(raw[..., 3], axis=-1)
        w = jnp.ones(t.shape, t.dtype) / t.shape[-1]
        return {"rgb": rgb, "acc": acc, "depth": acc, "weights": w}

    def fake_uni(key_, tag, ray_ids, n):
        return jnp.full((ray_ids.shape[0], n), 0.5, jnp.float32)

    def fake_nrm(key_, tag, ray_ids, n):
        return jnp.zeros((ray_ids.shape[0], n), jnp.float32)

    def fake_srt(key_, tag, ray_ids, n):
        t = jnp.linspace(0.01, 0.99, n, dtype=jnp.float32)
        return jnp.broadcast_to(t, (ray_ids.shape[0], n))

    def fake_pix(key_, cfg_, precrop):
        i = jnp.arange(cfg_.n_rays, dtype=jnp.int32)
        return i % cfg_.height, (i * 7) % cfg_.width

    def fake_rays(px, py, w_, h_, focal_, c2w):
        n = px.shape[0]
        o = jnp.broadcast_to(c2w[:3, -1], (n, 3))
        d = jnp.stack([px, py, px], -1).astype(jnp.float32) * 1e-6 + 1.0
        return o, d

    def fake_opt(lr, lr_decay):
        return optax.identity()

    def fake_gnorm(tree):
        return jnp.float32(0.0)

    patches = {
        "kernel": [(renderer_mod, "_query_mlp", fake_query)],
        "strat": [(renderer_mod, "stratified_samples", fake_strat)],
        "pdf": [(renderer_mod, "sample_pdf", fake_pdf)],
        "merge": [(sampling_mod, "merge_sorted", fake_merge)],
        "composite": [(renderer_mod, "volume_render", fake_comp)],
        "rng": [(renderer_mod, "_per_ray_uniform", fake_uni),
                (renderer_mod, "_per_ray_normal", fake_nrm),
                (rng_mod, "ray_sorted_uniform", fake_srt)],
        "pixels": [(loop_mod, "_sample_pixels", fake_pix)],
        "raygen": [(loop_mod, "rays_for_pixels", fake_rays)],
        "optimizer": [(loop_mod, "make_optimizer", fake_opt),
                      (state_mod, "make_optimizer", fake_opt)],
        "gradnorm": [(optax, "global_norm", fake_gnorm)],
    }
    restore = {
        "kernel": [(renderer_mod, "_query_mlp", real["query"])],
        "strat": [(renderer_mod, "stratified_samples", real["strat"])],
        "pdf": [(renderer_mod, "sample_pdf", real["pdf"])],
        "merge": [(sampling_mod, "merge_sorted", real["merge"])],
        "composite": [(renderer_mod, "volume_render", real["comp"])],
        "rng": [(renderer_mod, "_per_ray_uniform", real["uni"]),
                (renderer_mod, "_per_ray_normal", real["nrm"]),
                (rng_mod, "ray_sorted_uniform", real["srt"])],
        "pixels": [(loop_mod, "_sample_pixels", real["pix"])],
        "raygen": [(loop_mod, "rays_for_pixels", real["rays"])],
        "optimizer": [(loop_mod, "make_optimizer", real["opt"]),
                      (state_mod, "make_optimizer", real["opt_state"])],
        "gradnorm": [(optax, "global_norm", real["gnorm"])],
    }

    def reset_all():
        for plist in restore.values():
            for mod, name, fn in plist:
                setattr(mod, name, fn)

    def sync(state):
        np.asarray(jax.tree.leaves(state.params)[0].ravel()[0])

    def build(name):
        """(step_fn, fresh state) with stage `name` replaced (or none).

        Every variant (except the explicit "single" dispatch arm) runs as
        an ``args.block``-step lax.scan block. The block must be long
        enough that DEVICE time dominates the ~87 ms per-call tunnel
        round-trip: at block=10 (87 ms device for the full program —
        exactly at the floor) a kernel-ablated variant with the MLP
        deleted outright measured the SAME 8.69 ms/step as the full
        program, flattening every share to ~0%. At block=100 the full
        program is ~0.86 s/call and ablations are visible.
        """
        reset_all()
        for mod, attr, fn in patches.get(name, []):
            setattr(mod, attr, fn)
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=rcfg.mlp)
        if name == "single":
            step = make_train_step(cfg, mesh)

            def fn(st, i):
                st, _ = step(st, jax.random.fold_in(jax.random.PRNGKey(1),
                                                    i),
                             images, poses, train_idx, False)
                return st
        else:
            scan = make_train_scan(cfg, args.block, mesh)

            def fn(st, i):
                st, _ = scan(st, jax.random.fold_in(jax.random.PRNGKey(1),
                                                    i),
                             images, poses, train_idx,
                             jnp.int32(i * args.block), False)
                return st
        state = fn(state, 0)  # compile
        sync(state)
        return fn, state

    names = (["full", "single"] + list(patches.keys()))
    built = {}
    for nm in names:
        built[nm] = build(nm)
        print(f"# compiled: {nm}", flush=True)
    reset_all()

    times = {nm: [] for nm in names}
    for w in range(args.windows):
        for nm in names:
            fn, st = built[nm]
            n_calls = (min(args.iters, 30) if nm == "single"
                       else max(args.iters // args.block, 2))
            t0 = time.perf_counter()
            for i in range(1, n_calls + 1):
                st = fn(st, i)
            sync(st)
            dt = (time.perf_counter() - t0) / n_calls
            if nm != "single":
                dt /= args.block  # scan block -> per-step
            times[nm].append(dt)
            built[nm] = (fn, st)

    med = {nm: float(np.median(times[nm])) for nm in names}
    full = med["full"]
    result = {"n_rays": n_rays, "samples": f"{n_coarse}+{n_coarse+n_fine}",
              "full_scan_ms": full * 1e3, "rays_per_sec": n_rays / full,
              "single_dispatch_ms": med["single"] * 1e3,
              "dispatch_overhead_ms": (med["single"] - full) * 1e3,
              "stages": {}}
    print(f"step = {n_rays} rays, {n_coarse}+{n_coarse + n_fine} samples; "
          f"full (scan{args.block}) = {full*1e3:.3f} ms/step "
          f"({n_rays / full:,.0f} "
          f"rays/s); single-dispatch = {med['single']*1e3:.3f} ms "
          f"(+{max(med['single'] - full, 0)*1e3:.3f} ms tunnel dispatch)")
    attributed = 0.0
    for nm in patches:
        share = (full - med[nm]) / full * 100
        attributed += max(full - med[nm], 0.0)
        result["stages"][nm] = {"without_ms": med[nm] * 1e3,
                                "share_pct": share}
        print(f"  {nm:10s} without: {med[nm]*1e3:8.3f} ms   share: "
              f"{share:6.2f}%")
    other = full - attributed
    result["stages"]["other"] = {"without_ms": None,
                                 "share_pct": other / full * 100}
    print(f"  {'other':10s} (prep/reshape/dispatch):       share: "
          f"{other/full*100:6.2f}%")
    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump(result, fp, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "stages"}))


if __name__ == "__main__":
    main()
