"""End-to-end serving A/B on a trained run: float vs int8 (vs +occupancy).

Measures frame time (interleaved in-process, device-scalar sync) and
held-out PSNR/SSIM per arm on the real chip. This is the evidence behind
the int8 rows in BASELINE.md.

Usage:
  python scripts/int8_ab.py --run <run_dir> --data <blender_scene_dir>
                            [--views 2] [--frames 6]
"""

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--views", type=int, default=2,
                    help="held-out views scored per arm")
    ap.add_argument("--frames", type=int, default=6,
                    help="frames per timing window")
    ap.add_argument("--occupancy", action="store_true",
                    help="add int8+occupancy(full) as a third arm")
    args = ap.parse_args()

    from cvnerf_tpu.data.blender import load_blender_data
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.utils.image import psnr_images, ssim_images

    imgs, poses, _, _, i_split, _ = load_blender_data(args.data, bkg=True)
    views = i_split[2][:args.views]

    def metrics(r):
        fr = [r.render_pose(poses[i]) for i in views]
        return (float(np.mean([psnr_images(f, imgs[i])
                               for f, i in zip(fr, views)])),
                float(np.mean([ssim_images(f, imgs[i])
                               for f, i in zip(fr, views)])))

    def frame_time(r, pose):
        r.render_pose(pose)                       # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.frames):
                r.render_pose(pose)
            best = min(best, (time.perf_counter() - t0) / args.frames)
        return best

    pose = poses[views[0]]

    arms = {}
    r_f = NerfRenderer.from_run_dir(args.run, use_mesh=False)
    arms["float"] = r_f

    r_q = NerfRenderer.from_run_dir(args.run, use_mesh=False)
    r_q.enable_int8(poses=poses)
    arms["int8"] = r_q

    if args.occupancy:
        r_qo = NerfRenderer.from_run_dir(args.run, use_mesh=False)
        r_qo.enable_occupancy(mode="full").enable_int8(poses=poses)
        arms["int8+occ_full"] = r_qo

    # Compile + quality first (quality is timing-insensitive).
    qual = {k: metrics(r) for k, r in arms.items()}
    # Interleaved timing windows across arms.
    times = {k: frame_time(r, pose) for k, r in arms.items()}
    for k, r in arms.items():          # second interleaved pass, keep min
        times[k] = min(times[k], frame_time(r, pose))

    t0 = times["float"]
    print(f"{'arm':14s} {'ms/frame':>9s} {'speedup':>8s} "
          f"{'PSNR dB':>8s} {'SSIM':>7s}")
    for k in arms:
        p, s = qual[k]
        print(f"{k:14s} {times[k]*1e3:9.1f} {t0/times[k]:8.2f} "
              f"{p:8.2f} {s:7.4f}")


if __name__ == "__main__":
    main()
