#!/usr/bin/env python
"""ICI scaling benchmark: train weak-scaling + render strong-scaling over
mesh sizes.

The sharded design (1-D ray mesh, replicated params, XLA-inserted gradient
psum over ICI — ``parallel/mesh.py``) is validated for *correctness* on the
virtual 8-device CPU mesh; this harness measures how it *scales* when more
than one chip is attached:

* **Train, weak scaling** — per-chip ray batch held constant
  (``--per_chip_rays``), global batch = N x per-chip; ideal scaling keeps
  step time flat as N grows, so efficiency(N) = rays/s(N) / (N x rays/s(1)).
  The only cross-chip traffic is the gradient allreduce (~2.4M params
  bf16/fp32), which ICI should hide behind the ~9 ms step.
* **Render, strong scaling** — one fixed frame's ray chunks split across the
  mesh (``render_image(mesh=...)``); ideal scaling divides frame latency
  by N. Speedup(N) = frame_ms(1) / frame_ms(N).

Measurement follows the repo benchmarking rule (CLAUDE.md): every mesh size
is compiled first, then measurement windows ALTERNATE across mesh sizes in
one process (same jitter regime, ±1%), medians over ``--windows`` windows,
device-sync by pulling one scalar to host.

On this machine only one real chip is reachable, so on TPU the table
degrades to the N=1 row; ``--cpu`` forces the virtual 8-device CPU platform,
which validates the harness itself end-to-end (CI does this —
``tests/test_driver_contract.py``) and is NOT a performance statement: CPU
"chips" share one socket, so weak-scaling efficiency there measures host
contention, not ICI. Run on a real multi-chip slice, the same command
produces the ROADMAP "multi-chip on hardware" evidence.

Prints one JSON line per mesh size plus a ``summary`` line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU platform (harness "
                         "validation; device count from --cpu_devices)")
    ap.add_argument("--cpu_devices", type=int, default=8)
    ap.add_argument("--devices", type=str, default=None,
                    help="comma-separated mesh sizes, e.g. 1,2,4,8 "
                         "(default: powers of 2 up to the device count)")
    ap.add_argument("--per_chip_rays", type=int, default=1024,
                    help="train rays per chip (weak scaling)")
    ap.add_argument("--steps", type=int, default=100,
                    help="train steps per measurement window")
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--hw", type=int, default=400,
                    help="render frame height=width (strong scaling)")
    ap.add_argument("--samples", type=str, default="64,128",
                    help="n_coarse,n_fine")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + --cpu (CI contract mode)")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.smoke:
        args.cpu = True
        args.per_chip_rays = 64
        args.steps = 5
        args.warmup = 2
        args.windows = 1
        args.hw = 24
        args.samples = "6,6"
    # Every trainer below uses scan blocks of this length; steps and warmup
    # must cover whole blocks or the scan program cold-compiles INSIDE a
    # measurement window (4-12 min through the remote-compile tunnel).
    spc = 5
    if args.steps % spc:
        args.steps = (args.steps // spc + 1) * spc
        print(f"# --steps rounded up to {args.steps} (multiple of the "
              f"steps_per_call={spc} scan block)", file=sys.stderr)
    warmup = max(args.warmup, spc)
    warmup = (warmup + spc - 1) // spc * spc

    import jax
    if args.cpu:
        # Post-import config updates are the only reliable path on this
        # platform (the site customization overrides JAX_PLATFORMS/XLA_FLAGS
        # env vars — CLAUDE.md); if a backend is already initialized in this
        # process, fall through to whatever devices exist.
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        except RuntimeError:
            pass
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from cvnerf_tpu.data.synthetic import bench_scene
    from cvnerf_tpu.parallel.mesh import make_mesh
    from cvnerf_tpu.render.frames import render_image
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, Trainer
    from cvnerf_tpu.train.state import create_train_state

    all_devices = jax.devices()
    if args.devices:
        sizes = [int(s) for s in args.devices.split(",")]
    else:
        sizes, n = [], 1
        while n <= len(all_devices):
            sizes.append(n)
            n *= 2
    bad = [n for n in sizes if n > len(all_devices)]
    if bad:
        print(f"# only {len(all_devices)} device(s) attached; "
              f"skipping mesh sizes {bad}", file=sys.stderr)
        sizes = [n for n in sizes if n <= len(all_devices)]
    if not sizes:
        print(json.dumps({"error": "no usable mesh sizes"}))
        return 1

    n_coarse, n_fine = (int(s) for s in args.samples.split(","))
    H = W = args.hw
    focal = H * 555.0 / 400.0
    dtype = jnp.float32 if args.cpu else jnp.bfloat16

    images, poses = bench_scene(H, W)

    rcfg = RenderConfig(n_coarse=n_coarse, n_fine=n_fine, perturb=True,
                        noise_std=0.0, white_bkg=True, compute_dtype=dtype)

    def sync(t):
        np.asarray(jax.tree.leaves(t.state.params)[0].ravel()[0])

    def median(xs):
        return sorted(xs)[len(xs) // 2]

    # Build one trainer + one sharded-render closure per mesh size; compile
    # everything BEFORE any measurement window (repo interleaving rule).
    arms = {}
    for n in sizes:
        mesh = make_mesh(all_devices[:n])
        cfg = TrainConfig(height=H, width=W, focal=focal, near=2.0, far=6.0,
                          n_rays=args.per_chip_rays * n, lr=5e-4,
                          lr_decay=500, render=rcfg)
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay)
        tr = Trainer(cfg, state, images, poses, [0, 1], seed=0, mesh=mesh,
                     steps_per_call=spc)
        rcfg_test = rcfg.eval_mode()
        c2w = jnp.asarray(poses[0])
        # The sharded chunker requires chunk % mesh size == 0.
        chunk = max(n, min(4096, H * W) // n * n)

        def do_render(t=tr, m=mesh, nn=n, rc=rcfg_test, c=c2w, ch=chunk):
            out = render_image(jax.random.PRNGKey(1), t.state.params, H, W,
                               focal, c, 2.0, 6.0, rc, chunk=ch,
                               mesh=m if nn > 1 else None)
            # Device-side scalar pull: never np.asarray the whole frame
            # inside a timed window (CLAUDE.md benchmarking rule).
            np.asarray(out["rgb"].ravel()[0])

        arms[n] = {"trainer": tr, "render": do_render, "cursor": 1}

    for n, arm in arms.items():
        t0 = time.perf_counter()
        arm["trainer"].run(1, warmup + 1)   # whole scan blocks only
        sync(arm["trainer"])
        arm["cursor"] = warmup + 1
        arm["render"]()
        print(f"# mesh={n}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

    train_times = {n: [] for n in sizes}
    render_times = {n: [] for n in sizes}
    for _ in range(args.windows):
        for n, arm in arms.items():           # alternate mesh sizes
            tr = arm["trainer"]
            t0 = time.perf_counter()
            tr.run(arm["cursor"], arm["cursor"] + args.steps)
            sync(tr)
            train_times[n].append(time.perf_counter() - t0)
            arm["cursor"] += args.steps
        for n, arm in arms.items():
            t0 = time.perf_counter()
            arm["render"]()
            render_times[n].append(time.perf_counter() - t0)

    # Ratios come from the raw medians; rounding is display-only.
    raw_rays = {n: args.steps * args.per_chip_rays * n / median(train_times[n])
                for n in sizes}
    raw_frame = {n: median(render_times[n]) for n in sizes}
    base_n = sizes[0]
    rows = {}
    for n in sizes:
        rows[n] = {
            "mesh": n,
            "train_rays_per_sec": round(raw_rays[n]),
            "train_step_ms": round(
                median(train_times[n]) / args.steps * 1e3, 3),
            "render_frame_ms": round(raw_frame[n] * 1e3, 1),
            "weak_scaling_eff": round(
                (raw_rays[n] / n) / (raw_rays[base_n] / base_n), 4),
            "render_speedup": round(raw_frame[base_n] / raw_frame[n], 3),
        }
        print(json.dumps(rows[n]), flush=True)
    print(json.dumps({
        "summary": "ici_scaling",
        "platform": jax.devices()[0].platform,
        "mesh_sizes": sizes,
        "per_chip_rays": args.per_chip_rays,
        "weak_scaling_eff": {str(n): rows[n]["weak_scaling_eff"]
                             for n in sizes},
        "render_speedup": {str(n): rows[n]["render_speedup"]
                           for n in sizes},
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
