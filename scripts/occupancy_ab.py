#!/usr/bin/env python
"""Occupancy-grid serving A/B: frame time + held-out PSNR, on-chip.

Protocol per CLAUDE.md benching rules: both variants (coarse-MLP path vs
baked-grid path) are compiled up front, then measured in interleaved
windows in ONE process (cross-process TPU timings jitter ±10%; interleaved
in-process is ±1%), synced by pulling a device scalar.

Usage:
    python scripts/occupancy_ab.py --run <train run dir> [--res 128]
        [--dilate 1] [--bound 1.5] [--windows 8] [--frames_per_window 2]

The run dir must hold scene.json + checkpoints (any cvnerf-train run);
when it came from scripts/quality_run.py the fixture dataset sits next to
it, so --data_dir defaults to auto-discovery for PSNR scoring.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--data_dir", default=None,
                    help="blender dataset for PSNR scoring (default: "
                         "sibling of the run dir's logs/, quality_run "
                         "layout); 'none' skips quality scoring")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--dilate", type=int, default=1)
    ap.add_argument("--bound", type=float, default=1.5)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--frames_per_window", type=int, default=2)
    ap.add_argument("--arms", nargs="*", default=None,
                    help="subset of arms to run (default: all). Known: "
                         "mlp merge full full_floor merge_tri full_tri term "
                         "full_term")
    ap.add_argument("--term_eps", type=float, default=1e-3)
    ap.add_argument("--term_coarse", type=int, default=None,
                    help="n_coarse for the 'term' arm (default: half the "
                         "run's)")
    ap.add_argument("--term_fine", type=int, default=None,
                    help="n_fine for the term arms (default: half)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.utils.image import psnr_images

    r = NerfRenderer.from_run_dir(args.run, use_mesh=False)
    print(f"run: step {r.step}, {r.height}x{r.width}, "
          f"n_fine={r.cfg.n_fine}, dtype={r.cfg.compute_dtype.__name__}")

    # --- test poses/images for quality scoring ---
    poses, images = [], []
    data_dir = args.data_dir
    if data_dir is None:
        workdir = os.path.dirname(os.path.dirname(os.path.abspath(args.run)))
        for name in os.listdir(workdir):
            cand = os.path.join(workdir, name)
            if os.path.exists(os.path.join(cand, "transforms_test.json")):
                data_dir = cand
                break
    if data_dir and data_dir != "none":
        from cvnerf_tpu.data import load_scene
        sc = load_scene(data_dir, "blender", testskip=1,
                        white_bkg=r.cfg.white_bkg)
        poses = [sc.poses[int(i)] for i in sc.test_idx]
        images = [sc.images[int(i)] for i in sc.test_idx]
        print(f"scoring {len(poses)} test views from {data_dir}")
    else:
        print("no dataset: timing only")
        poses = [np.eye(4, dtype=np.float32)]
        poses[0][2, 3] = 4.0

    import dataclasses as _dc
    t0 = time.time()
    r.enable_occupancy(resolution=args.res, dilate=args.dilate,
                       bound=args.bound)
    occ = r.occupancy
    base_cfg = _dc.replace(r.cfg, occupancy_mode="merge")
    print(f"bake: res {args.res} dilate {args.dilate} in "
          f"{time.time()-t0:.1f}s; occupied "
          f"{float(np.mean(np.asarray(occ.values) > 0)):.3f}")

    # Arm matrix (round 4): probe interpolation (nearest = production
    # default; trilinear = the opt-in continuous CDF, measured ~7x probe
    # cost) × early-termination with reduced sample budgets. "term" =
    # merge semantics + ray-interval tightening + half the samples;
    # "full_term" = full mode + tightening + half n_fine. The
    # termination march itself always probes nearest (renderer.py).
    tc = args.term_coarse or max(base_cfg.n_coarse // 2, 8)
    tf = args.term_fine or max(base_cfg.n_fine // 2, 8)
    ARM_DEFS = {
        "mlp": None,
        "merge": dict(occupancy_mode="merge",
                      occupancy_interp="nearest"),
        "full": dict(occupancy_mode="full", occupancy_interp="nearest"),
        "merge_tri": dict(occupancy_mode="merge",
                          occupancy_interp="trilinear"),
        "full_tri": dict(occupancy_mode="full",
                         occupancy_interp="trilinear"),
        "full_floor": dict(occupancy_mode="full",
                           occupancy_interp="nearest",
                           occ_floor=max(base_cfg.n_fine // 2, 1)),
        "term": dict(occupancy_mode="merge", occupancy_interp="nearest",
                     occupancy_termination=args.term_eps,
                     n_coarse=tc, n_fine=tf),
        "full_term": dict(occupancy_mode="full",
                          occupancy_interp="nearest",
                          occupancy_termination=args.term_eps,
                          n_fine=tf),
        "full_floor_term": dict(occupancy_mode="full",
                                occupancy_interp="nearest",
                                occupancy_termination=args.term_eps,
                                occ_floor=max(tf // 2, 1), n_fine=tf),
    }
    ARMS = tuple(args.arms) if args.arms else tuple(ARM_DEFS)
    unknown = set(ARMS) - set(ARM_DEFS)
    if unknown:
        raise SystemExit(f"unknown arms: {sorted(unknown)}")

    def set_arm(arm: str):
        over = ARM_DEFS[arm]
        r.occupancy = None if over is None else occ
        r.cfg = base_cfg if over is None else _dc.replace(base_cfg, **over)

    # Compile + quality pass (all arms).
    qual = {}
    for arm in ARMS:
        set_arm(arm)
        frames = [r.render_pose(p) for p in poses]
        if images:
            qual[arm] = float(np.mean(
                [psnr_images(f, g) for f, g in zip(frames, images)]))

    # Interleaved timing windows.
    def sync(x):
        np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)

    times = {arm: [] for arm in ARMS}
    for w in range(args.windows):
        order = ARMS if w % 2 == 0 else ARMS[::-1]
        for arm in order:
            set_arm(arm)
            t0 = time.time()
            for k in range(args.frames_per_window):
                r.render_pose_extras(poses[k % len(poses)],
                                     keys=())  # no host transfer
            # device-side sync: pull one scalar from the last dispatch
            out = r.render_pose_extras(poses[0], keys=("acc",))
            sync(out["acc"])
            times[arm].append(
                (time.time() - t0) / (args.frames_per_window + 1))

    med = {k: float(np.median(v)) for k, v in times.items()}
    result = {"res": args.res, "dilate": args.dilate,
              "windows": args.windows,
              "term": {"eps": args.term_eps, "n_coarse": tc, "n_fine": tf}}
    for arm in ARMS:
        result[f"frame_ms_{arm}"] = round(med[arm] * 1e3, 2)
        if arm != "mlp" and "mlp" in med:
            result[f"speedup_{arm}"] = round(med["mlp"] / med[arm], 4)
        if qual:
            result[f"psnr_{arm}"] = round(qual[arm], 3)
            if arm != "mlp" and "mlp" in qual:
                result[f"psnr_delta_{arm}"] = round(
                    qual[arm] - qual["mlp"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
