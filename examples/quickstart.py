#!/usr/bin/env python
"""Quickstart: generate a synthetic Blender-format scene, train briefly,
render a novel view — the whole pipeline in ~a minute (CPU) or seconds (TPU,
after the first compile).

Run from the repo root:  python examples/quickstart.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(out_dir: str = "/tmp/cvnerf_quickstart"):
    import jax
    import numpy as np
    from cvnerf_tpu.data import load_scene, make_blender_dataset
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.render.frames import render_image
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, Trainer
    from cvnerf_tpu.train.state import create_train_state
    from cvnerf_tpu.utils.image import psnr_images, write_png

    # 1. A tiny multi-view-consistent scene in the Blender on-disk format.
    scene_dir = os.path.join(out_dir, "scene")
    os.makedirs(scene_dir, exist_ok=True)
    make_blender_dataset(scene_dir, n_train=8, n_val=1, n_test=1,
                         h=48, w=48)
    scene = load_scene(scene_dir, "blender", testskip=1, white_bkg=True)
    print(f"scene: {scene.images.shape[0]} views "
          f"{scene.height}x{scene.width}")

    # 2. A small model + short training run.
    mlp = NerfMLPConfig(xyz_freqs=6, dir_freqs=2, trunk_width=96,
                        head_width=48)
    rcfg = RenderConfig(n_coarse=24, n_fine=24, perturb=True, noise_std=1.0,
                        white_bkg=True, mlp=mlp)
    tcfg = TrainConfig(height=scene.height, width=scene.width,
                       focal=scene.focal, near=scene.near, far=scene.far,
                       n_rays=256, lr=5e-3, lr_decay=500, render=rcfg)
    state = create_train_state(jax.random.PRNGKey(0), lr=tcfg.lr,
                               lr_decay=tcfg.lr_decay, mlp=mlp)
    trainer = Trainer(tcfg, state, scene.images, scene.poses,
                      scene.train_idx, seed=0)
    trainer.add_callback(100, lambda i, t, m: print(
        f"  step {i}: loss={m['loss']:.4f} psnr={m['psnr']:.1f}"))
    print("training 400 steps...")
    trainer.run(1, 401)

    # 3. Render the held-out view and compare.
    i = int(scene.test_idx[0])
    out = render_image(jax.random.PRNGKey(1), trainer.state.params,
                       scene.height, scene.width, scene.focal,
                       jax.numpy.asarray(scene.poses[i]), scene.near,
                       scene.far, rcfg.eval_mode(), chunk=2304)
    rgb = np.asarray(out["rgb"])
    path = os.path.join(out_dir, "novel_view.png")
    write_png(path, rgb)
    print(f"novel-view PSNR: {psnr_images(rgb, scene.images[i]):.1f} dB")
    print(f"wrote {path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
