#!/usr/bin/env python
"""Measure the in-kernel cost of the per-point VIEW-DIRECTION encoding.

VERDICT r2 weak #5: ~32 of the fused kernel's 96 trig rows re-encode the
view direction at every sample, although the direction is constant across a
ray's 192 samples (the per-sample expand is a reference implementation
artifact, reference model.py:114-117). Before surgically hoisting it, this
probe measures the *upper bound* of the possible win: variant B is the
production kernel with the dir phase-dot + trig deleted (the dir "encoding"
is a free reshuffle of already-loaded rows — numerically wrong, shape- and
cost-identical to a perfectly-free dir encoding). The measured A-vs-B gap is
the most any hoist could recover in kernel time; a real hoist additionally
pays wider HBM input rows ([ed,T] enc vs [16,T] mantissa slices).

Interleaved in-process A/B per the repo benchmarking rule (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--tile", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
    import cvnerf_tpu.ops.pallas.fused_mlp as fm

    cfg = NerfMLPConfig()
    cdt = jnp.bfloat16
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    n = args.n
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (n, 3), jnp.float32) * 2.0
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (n, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flops_pt = fm._forward_flops(cfg)

    # ---- variant B: dir encoding deleted from the kernel ----
    def _kernel_nodir(px, pd, x_ref, d_ref, *ops, compute_dtype, sx, sd):
        (w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
         w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
         wa, ba, w10a, w10b, b10, w11, b11, o_ref) = ops
        cdtk = compute_dtype
        f32 = jnp.float32

        def mm(a, b):
            return jnp.dot(a[:], b, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)

        def blocks(s, k):
            return jnp.concatenate(
                [s[0:8], jnp.sin(s[8:8 + k]), jnp.cos(s[8 + k:8 + 2 * k])],
                axis=0)

        enc_x = blocks(mm(px, x_ref[:]), sx)
        # "free" dir encoding: reshuffle the already-loaded 16 input rows
        # into an [ed, T] block — no phase dot, no trig (ed = 8 + 2*sd).
        d = d_ref[:].astype(f32)
        enc_d = jnp.concatenate([d, d, d[: (8 + 2 * sd) - 32]], axis=0)
        sigma, rgb = fm._forward_body(
            enc_x.astype(cdtk), enc_d.astype(cdtk),
            w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
            w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
            wa, ba, w10a, w10b, b10, w11, b11, cdtk,
            want_intermediates=False)
        row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
        o_ref[:] = jnp.where(row == 3, pltpu.roll(sigma, 3, 0), rgb)

    @functools.partial(jax.jit, static_argnames=("tile",))
    def fwd_nodir(params, points, viewdirs, tile=4096):
        tile = min(tile, 4096)
        n = points.shape[0]
        n_pad = fm._round_up(max(n, tile), tile)
        ex, sx, _ = fm._enc_layout(cfg.xyz_freqs)
        ed, sd, _ = fm._enc_layout(cfg.dir_freqs)

        def prep(a):
            a = a.astype(jnp.float32)
            a = jnp.pad(a, ((0, n_pad - n), (0, 1)))
            return fm._split_rows(a.T)

        x_t, d_t = prep(points), prep(viewdirs)
        px = fm._encoding_constants(cfg.xyz_freqs)
        pd = fm._encoding_constants(cfg.dir_freqs)
        wops = fm._pack_params(params, cfg, cdt)
        consts = [px, pd]

        def const_spec(a):
            return pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        grid = (n_pad // tile,)
        in_specs = ([const_spec(a) for a in consts]
                    + [pl.BlockSpec((16, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)] * 2
                    + [const_spec(a) for a in wops])
        out = pl.pallas_call(
            functools.partial(_kernel_nodir, compute_dtype=cdt, sx=sx,
                              sd=sd),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_pt * n_pad,
                bytes_accessed=n_pad * 80,
                transcendentals=2 * n_pad * sx,
            ),
        )(*consts, x_t, d_t, *wops)
        return out.T[:n, :4]

    def sync(x):
        np.asarray(x.ravel()[0])

    fwd_a = jax.jit(lambda p, x, d: fm.fused_nerf_apply(
        p, x, d, cfg, compute_dtype=cdt, tile=args.tile))
    fwd_b = jax.jit(lambda p, x, d: fwd_nodir(p, x, d, tile=args.tile))

    sync(fwd_a(params, pts, dirs))
    sync(fwd_b(params, pts, dirs))

    times = {"A": [], "B": []}
    for w in range(args.windows):
        for name, fn in (("A", fwd_a), ("B", fwd_b)):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(params, pts, dirs)
            sync(out)
            times[name].append((time.perf_counter() - t0) / args.iters)

    for name in ("A", "B"):
        ts = np.array(times[name]) * 1e3
        tf = flops_pt * n / (ts.min() / 1e3) / 1e12
        print(f"{name}: min {ts.min():7.3f} ms  median {np.median(ts):7.3f}"
              f" ms  ({tf:6.1f} TF/s at min)  windows={np.round(ts, 3)}")
    a, b = np.median(times["A"]), np.median(times["B"])
    print(f"dir-encoding share (upper bound on hoist win): "
          f"{(a - b) / a * 100:.2f}%  ({(a - b) * 1e3:.3f} ms of {a * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
